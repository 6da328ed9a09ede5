"""Cross-document segment-level deduplication over ``(id, text)``
tables — the C4 / RefinedWeb "line dedup" curation step (Raffel et
al. 2020 §2.2 dedup of repeated lines; Penedo et al. 2023 §4.2): any
text unit whose exact content recurs across enough documents
(boilerplate, navigation chrome, license headers) is removed from
EVERY document it appears in, and the document is reassembled from
the surviving units.

The unit here is a fixed-width WORD segment (consecutive
non-overlapping ``seg_words``-word chunks, last chunk short) rather
than a newline-delimited line, so the operator is well-defined on
single-line corpora too; with newline-structured text the same kernel
applies per line.  No reference analogue — the reference dedups whole
documents only, via simhash (``/root/reference/include/Page/Page.hpp:94``).

100-TB shape — sketch-then-verify, the same split the repo's other
dedup stages use; document text never enters a wide exchange:

1. segment + hash per batch: each doc emits per-doc-DISTINCT
   ``(shash int64)`` rows — 8 B/row.  Hashing is the shared FNV-fold
   over fnv1a64 token hashes (``seg_words`` masked vector steps per
   batch, no per-segment loop).  Hashes are used only for GROUPING;
   correctness never depends on them (collisions verified away,
   step 3).
2. candidate hashes = native ``groupby(shash).count() >= min_docs``
   (per-batch per-doc-distinct rows; each doc lives wholly in one
   batch, so the count is distinct-docs).  Candidates are
   duplicate-rate-bounded and broadcast as one sorted array.
3. a second scan re-derives segment TEXT for candidate rows only and
   verifies exactly in ``shash``-bucketed groups: a segment is a
   duplicate iff its exact text occurs in >= ``min_docs`` distinct
   docs.  The verified dup-segment TEXT set (duplicate-rate-bounded,
   the bound every candidate stage in this repo documents) is
   broadcast once.
4. rebuild pass: per batch, drop dup segments (vectorized ``is_in``
   against the broadcast set) and re-join the survivors — offsets +
   ``binary_join``, no per-doc Python beyond the word split.

Scale note: if the corpus pushes the dup-segment set past broadcast
size (extreme boilerplate rates), step 3's per-bucket verdicts can
instead be hash-partition-joined back to the rebuild pass on
``shash`` — the partitioned-df shape ``sketches.distinctive_terms``
already implements — at the cost of one extra (shash, doc) exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _GRAM_INIT, _GRAM_PRIME, _sorted_member_mask
from .textstages import _ASCII_NONWS


def _segments(batch: pa.Table, id_col: str, text_col: str,
              seg_words: int):
    """Vectorized segment enumeration + hashing for one batch.

    Returns ``(keys int64, doc_idx, seg_idx, words, n_segs)`` where
    ``n_segs`` is the per-doc segment count and segment
    ``(doc_idx[i], seg_idx[i])`` covers
    ``words[doc_idx[i]][seg_idx[i]*seg_words : (seg_idx[i]+1)*seg_words]``
    and ``keys[i]`` is its FNV-fold hash over fnv1a64 word hashes.
    Tokenization is RE2-ASCII whitespace (``_ASCII_NONWS``) for exact
    parity with SQL ``string_split_regex(text, '\\s+')``.
    """
    from ..functions.hashing import fnv1a64
    texts = batch[text_col].to_pylist()
    n_docs = len(texts)
    words = [_ASCII_NONWS.findall(t) if t else [] for t in texts]
    counts = np.fromiter((len(w) for w in words), np.int64, n_docs)
    token_hash: dict = {}
    for wl in words:
        for t in wl:
            if t not in token_hash:
                token_hash[t] = fnv1a64(t)
    flat = np.fromiter((token_hash[t] for wl in words for t in wl),
                       np.uint64, int(counts.sum()))
    n_segs = -(-counts // seg_words)            # ceil; 0 for empty docs
    total = int(n_segs.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64), words, n_segs)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_segs)
    bases = np.concatenate([[0], np.cumsum(n_segs)])[:-1]
    seg_idx = np.arange(total, dtype=np.int64) - bases[doc_idx]
    row_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
    g0 = row_start[doc_idx] + seg_idx * seg_words
    seg_len = np.minimum(seg_words,
                         row_start[doc_idx] + counts[doc_idx] - g0)
    keys = np.full(total, _GRAM_INIT, np.uint64)
    with np.errstate(over="ignore"):
        for j in range(seg_words):
            m = j < seg_len
            keys[m] = (keys[m] ^ flat[g0[m] + j]) * _GRAM_PRIME
    return keys.view(np.int64), doc_idx, seg_idx, words, n_segs


def _seg_text(words: list, doc_idx: np.ndarray, seg_idx: np.ndarray,
              seg_words: int) -> list:
    return [" ".join(words[d][s * seg_words:(s + 1) * seg_words])
            for d, s in zip(doc_idx, seg_idx)]


def segment_dedup(ds: ray.data.Dataset, seg_words: int = 10,
                  min_docs: int = 2, id_col: str = "doc_id",
                  text_col: str = "text",
                  n_verify_buckets: int = 32) -> ray.data.Dataset:
    """(doc_id, clean_text, n_segs, n_removed): every doc with its
    cross-doc-duplicated segments removed.  A segment (consecutive
    ``seg_words``-word chunk) is a duplicate iff its exact text occurs
    in >= ``min_docs`` DISTINCT documents; duplicates are removed from
    every doc and ``clean_text`` re-joins the survivors with single
    spaces ('' when nothing survives).  Exact output (hash collisions
    verified away)."""
    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except AttributeError:
        id_type = pa.int64()
    ds = ds.select_columns([id_col, text_col])

    def pass1(batch: pa.Table) -> pa.Table:
        keys, doc_idx, _, _, _ = _segments(batch, id_col, text_col,
                                           seg_words)
        order = np.lexsort((doc_idx, keys))
        k, d = keys[order], doc_idx[order]
        first = np.ones(len(k), bool)
        first[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        return pa.table({"shash": pa.array(k[first], pa.int64())})

    cand_pdf = ds.map_batches(pass1, batch_format="pyarrow") \
        .groupby("shash").count() \
        .map_batches(lambda t: t.filter(
            pc.greater_equal(t["count()"], min_docs))
            .select(["shash"]), batch_format="pyarrow") \
        .to_pandas()
    cand = (cand_pdf["shash"].to_numpy() if "shash" in cand_pdf.columns
            else np.empty(0, np.int64))

    dup_texts = np.empty(0, object)
    if len(cand):
        cand_ref = ray.put(np.sort(cand))

        def pass2(batch: pa.Table, ref=None) -> pa.Table:
            cand_sorted = ray.get(ref)
            keys, doc_idx, seg_idx, words, _ = _segments(
                batch, id_col, text_col, seg_words)
            m = _sorted_member_mask(cand_sorted, keys)
            keys, doc_idx, seg_idx = keys[m], doc_idx[m], seg_idx[m]
            # within-doc repeats ship as-is; verify() counts DISTINCT
            # docs per segment text, so they cannot inflate the verdict
            segs = _seg_text(words, doc_idx, seg_idx, seg_words)
            ids = batch[id_col].take(pa.array(doc_idx)).combine_chunks()
            return pa.table({
                "bucket": pa.array(keys % np.int64(n_verify_buckets),
                                   pa.int64()),
                id_col: ids.cast(id_type),
                "seg": pa.array(segs, pa.string())})

        def verify(g: pd.DataFrame) -> pd.DataFrame:
            ndocs = g.groupby("seg")[id_col].nunique()
            dup = ndocs[ndocs >= min_docs].index.to_numpy(object)
            return pd.DataFrame({"seg": pd.Series(dup, dtype=object)})

        dup_pdf = ds.map_batches(pass2, fn_kwargs={"ref": cand_ref},
                                 batch_format="pyarrow") \
            .groupby("bucket").map_groups(verify, batch_format="pandas") \
            .to_pandas()
        if "seg" in dup_pdf.columns and len(dup_pdf):
            dup_texts = dup_pdf["seg"].to_numpy(object)

    dup_ref = ray.put(pa.array(dup_texts, pa.string()))

    def rebuild(batch: pa.Table, ref=None) -> pa.Table:
        dup_set = ray.get(ref)
        _, doc_idx, seg_idx, words, n_segs = _segments(
            batch, id_col, text_col, seg_words)
        n_docs = len(words)
        segs = pa.array(_seg_text(words, doc_idx, seg_idx, seg_words),
                        pa.string())
        removed = (pc.is_in(segs, value_set=dup_set).to_numpy(
            zero_copy_only=False) if len(segs) else np.empty(0, bool))
        keep = ~removed
        kept_per_doc = np.zeros(n_docs, np.int64)
        np.add.at(kept_per_doc, doc_idx[keep], 1)
        offsets = np.concatenate([[0], np.cumsum(kept_per_doc)])
        # doc_idx is non-decreasing, so kept segs are already grouped
        # by doc in order — one ListArray + binary_join per batch
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            segs.filter(pa.array(keep)) if len(segs) else segs)
        clean = pc.binary_join(lists, " ")
        n_removed = np.zeros(n_docs, np.int64)
        np.add.at(n_removed, doc_idx[removed], 1)
        return pa.table({
            id_col: batch[id_col],
            "clean_text": clean,
            "n_segs": pa.array(n_segs, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64())})

    return ds.map_batches(rebuild, fn_kwargs={"ref": dup_ref},
                          batch_format="pyarrow")




def source_overlap(ds: ray.data.Dataset, seg_words: int = 10,
                   group_col: str = "source", id_col: str = "doc_id",
                   text_col: str = "text",
                   n_verify_buckets: int = 32) -> ray.data.Dataset:
    """(src_a, src_b, n_shared): cross-source content-overlap matrix —
    for every pair of sources (src_a < src_b), the number of DISTINCT
    ``seg_words``-word segment texts that occur in both (the
    crawl-provenance diagnostic behind mirror/syndication detection in
    web curation).  Exact (hash collisions verified away).

    100-TB shape: pass 1 ships per-batch-distinct ``(shash, source)``
    rows (8 B + the source key); only hashes seen under >= 2 distinct
    sources survive to pass 2, which re-derives segment TEXT for those
    candidates only and pair-expands per verify bucket.  The final
    combine is a native groupby-sum over (src_a, src_b) — bounded by
    source pairs that actually share content, not by the corpus."""
    ds = ds.select_columns([id_col, group_col, text_col])

    def pass1(batch: pa.Table) -> pa.Table:
        keys, doc_idx, _, _, _ = _segments(batch, id_col, text_col,
                                           seg_words)
        src = batch[group_col].to_pandas().fillna("").to_numpy(object)
        s = src[doc_idx]
        df = pd.DataFrame({"shash": keys, "src": s})
        df = df.drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    cand_pdf = ds.map_batches(pass1, batch_format="pyarrow") \
        .groupby("shash").count() \
        .map_batches(lambda t: t.filter(pc.greater_equal(t["count()"], 2))
                     .select(["shash"]), batch_format="pyarrow") \
        .to_pandas()
    cand = (cand_pdf["shash"].to_numpy() if "shash" in cand_pdf.columns
            else np.empty(0, np.int64))
    empty = pa.table({"src_a": pa.array([], pa.string()),
                      "src_b": pa.array([], pa.string()),
                      "n_shared": pa.array([], pa.int64())})
    if not len(cand):
        return ray.data.from_arrow(empty)
    cand_ref = ray.put(np.sort(cand))

    def pass2(batch: pa.Table, ref=None) -> pa.Table:
        cand_sorted = ray.get(ref)
        keys, doc_idx, seg_idx, words, _ = _segments(
            batch, id_col, text_col, seg_words)
        m = _sorted_member_mask(cand_sorted, keys)
        keys, doc_idx, seg_idx = keys[m], doc_idx[m], seg_idx[m]
        segs = _seg_text(words, doc_idx, seg_idx, seg_words)
        src = batch[group_col].to_pandas().fillna("").to_numpy(object)
        return pa.table({
            "bucket": pa.array(keys % np.int64(n_verify_buckets),
                               pa.int64()),
            "seg": pa.array(segs, pa.string()),
            "src": pa.array(src[doc_idx], pa.string())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["seg", "src"]].drop_duplicates()
        rows_a, rows_b = [], []
        for _, grp in g.groupby("seg", sort=False):
            ss = np.sort(grp["src"].to_numpy(object))
            if len(ss) < 2:
                continue
            ia, ib = np.triu_indices(len(ss), k=1)
            rows_a.append(ss[ia]); rows_b.append(ss[ib])
        if not rows_a:
            return pd.DataFrame({"src_a": pd.Series([], dtype=object),
                                 "src_b": pd.Series([], dtype=object),
                                 "n_partial": pd.Series([],
                                                        dtype=np.int64)})
        a = np.concatenate(rows_a); b = np.concatenate(rows_b)
        out = pd.DataFrame({"src_a": a, "src_b": b}) \
            .groupby(["src_a", "src_b"], sort=False).size() \
            .reset_index(name="n_partial")
        out["n_partial"] = out["n_partial"].astype(np.int64)
        return out

    part = ds.map_batches(pass2, fn_kwargs={"ref": cand_ref},
                          batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas") \
        .to_pandas()
    if not len(part):
        return ray.data.from_arrow(empty)
    out = part.groupby(["src_a", "src_b"], as_index=False)["n_partial"] \
        .sum().rename(columns={"n_partial": "n_shared"})
    out["n_shared"] = out["n_shared"].astype(np.int64)
    out = out.sort_values(["src_a", "src_b"]).reset_index(drop=True)
    return ray.data.from_pandas(out)


__all__ = ["segment_dedup", "source_overlap"]

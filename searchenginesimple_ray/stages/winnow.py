"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
2003) — the position-robust fingerprint set MOSS uses: hash every
word ``n``-gram, slide a ``w``-wide window over the hash sequence and
select each window's minimum (rightmost position on ties).  The
guarantee: any shared run of ``w + n - 1`` words between two documents
yields at least one IDENTICAL selected fingerprint, at a density of
~2/(w+1) — the local, overlap-detecting alternative to the global
simhash fingerprint the engine already ships
(``functions/simhash.py``; reference analogue
``/root/reference/include/Page/Page.hpp:94`` is whole-doc only).

Gram hash = the low half of MD5 over the gram text, mapped to signed
int64 exactly like DuckDB's ``md5_number_lower`` — the one public
64-bit hash both numpy-side Python and ANSI SQL can compute
bit-identically, which is what makes the fingerprint VALUES (not just
their positions) ★-oracle-checkable.

100-TB shape: a pure streaming map — each batch hashes its unique
grams once (dict-bounded, the ``_flat_token_hashes`` pattern), runs a
vectorized ``w``-shift min-reduce over the flat hash array (no per-doc
loop), and emits (doc_id, pos, fp) rows.  No shuffle; downstream
overlap joins group on ``fp`` exactly like the dup_spans candidate
stage.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .textstages import _ASCII_NONWS


def _md5_low64(s: str) -> int:
    """Signed int64 view of DuckDB ``md5_number_lower`` (little-endian
    uint64 of MD5 digest bytes 8..16), verified bit-identical."""
    v = struct.unpack("<q", hashlib.md5(s.encode()).digest()[8:16])[0]
    return v


def _gram_hasher(hash_fn: str):
    """Per-gram 64-bit hash selector.  ``"md5"`` (default) is the
    DuckDB ``md5_number_lower`` identity — a hashlib call per UNIQUE
    gram per batch, the deliberate price of ★-oracle bit-parity and
    the only per-item Python loop on this path.  ``"fnv1a64"`` swaps
    in the repo's FNV-1a 64 (signed view) — markedly cheaper per gram
    for production runs that don't need SQL-checkable fingerprint
    VALUES; positions/counts/pairs keep identical semantics."""
    if hash_fn == "md5":
        return _md5_low64
    if hash_fn == "fnv1a64":
        from ..functions.hashing import fnv1a64

        def h(s: str) -> int:
            v = fnv1a64(s)
            return v - 0x1_0000_0000_0000_0000 \
                if v >= 0x8000_0000_0000_0000 else v
        return h
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def winnow_fingerprints(ds: ray.data.Dataset, n: int = 3, w: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        batch_size: int = 4096,
                        hash_fn: str = "md5") -> ray.data.Dataset:
    """(doc_id, pos, fp): winnowing fingerprint set per document —
    ``pos`` is the word-gram index (0-based) of each selected
    fingerprint, ``fp`` its signed-int64 md5 gram hash.  Docs with
    fewer than ``n + w - 1`` words have no full window and emit no
    rows (the paper's domain)."""
    hasher = _gram_hasher(hash_fn)

    def fps(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        words = [_ASCII_NONWS.findall(t) if t else [] for t in texts]
        counts = np.fromiter((len(x) for x in words), np.int64,
                             len(words))
        n_grams = np.maximum(counts - n + 1, 0)
        # flat gram-hash array with per-doc row ids (md5 once per
        # UNIQUE gram text in the batch)
        gcache: dict = {}
        flat = np.empty(int(n_grams.sum()), np.int64)
        rows = np.repeat(np.arange(len(words), dtype=np.int64), n_grams)
        o = 0
        for d, wl in enumerate(words):
            for i in range(int(n_grams[d])):
                g = " ".join(wl[i:i + n])
                h = gcache.get(g)
                if h is None:
                    h = hasher(g)
                    gcache[g] = h
                flat[o] = h
                o += 1
        m = flat.size - w + 1
        if m <= 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "fp": pa.array([], pa.int64())})
        # stack of w shifted views, offset 0 = the window's RIGHT edge:
        # np.argmin picks the FIRST minimal row = smallest offset =
        # rightmost minimal position (the paper's tie rule)
        stack = np.stack([flat[w - 1 - j: flat.size - j]
                          for j in range(w)])           # (w, m)
        off = np.argmin(stack, axis=0)
        minh = stack[off, np.arange(m)]
        wend = np.arange(w - 1, flat.size)              # window right edge
        ok = rows[wend] == rows[wend - w + 1]           # window inside doc
        sel = wend[ok] - off[ok]
        fp = minh[ok]
        r = rows[sel]
        # gram index within the doc + dedup of repeated selections
        bases = np.concatenate([[0], np.cumsum(n_grams)])[:-1]
        pos = sel - bases[r]
        order = np.lexsort((pos, r))
        r, pos, fp = r[order], pos[order], fp[order]
        first = np.ones(len(r), bool)
        first[1:] = (r[1:] != r[:-1]) | (pos[1:] != pos[:-1])
        r, pos, fp = r[first], pos[first], fp[first]
        return pa.table({id_col: pa.array(ids[r], pa.int64()),
                         "pos": pa.array(pos, pa.int64()),
                         "fp": pa.array(fp, pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        fps, batch_format="pyarrow", batch_size=batch_size)


def winnow_overlap_pairs(ds: ray.data.Dataset, n: int = 3, w: int = 4,
                         min_shared: int = 2, max_docs_per_fp: int = 32,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         hash_fn: str = "md5") -> "pd.DataFrame":
    """(doc_a, doc_b, n_shared): the MOSS overlap report — document
    pairs sharing >= ``min_shared`` DISTINCT selected fingerprint
    values.  Fingerprints selected by more than ``max_docs_per_fp``
    distinct docs are boilerplate and are DROPPED before pairing (the
    paper's common-code suppression; mirrored in the SQL oracle), which
    also bounds the per-fingerprint pair expansion at scale.

    Scale shape: the fingerprint map is the streaming
    ``winnow_fingerprints`` pass; pairing groups 16 B (fp, doc) rows by
    fingerprint value and expands within the capped groups only; the
    cross-bucket pair combine and the ``min_shared`` cut both run as
    NATIVE dataset operations (one (doc_a, doc_b) groupby-sum + a
    distributed filter) — the driver sees only the surviving report
    rows, never the unfiltered partials."""
    import pandas as pd
    import pyarrow.compute as pc

    fp = winnow_fingerprints(ds, n=n, w=w, id_col=id_col,
                             text_col=text_col, hash_fn=hash_fn)

    def distinct_pairs(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False)
        f = t["fp"].to_numpy(zero_copy_only=False)
        o = np.lexsort((d, f))
        d, f = d[o], f[o]
        first = np.ones(len(d), bool)
        first[1:] = (f[1:] != f[:-1]) | (d[1:] != d[:-1])
        return pa.table({"fp": pa.array(f[first], pa.int64()),
                         id_col: pa.array(d[first], pa.int64())})

    def expand(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd
        out_a, out_b = [], []
        for _, grp in g.groupby("fp", sort=False):
            docs = np.unique(grp[id_col].to_numpy())
            if len(docs) < 2 or len(docs) > max_docs_per_fp:
                continue
            ia, ib = np.triu_indices(len(docs), k=1)
            out_a.append(docs[ia]); out_b.append(docs[ib])
        if not out_a:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=np.int64),
                 "doc_b": pd.Series([], dtype=np.int64),
                 "n_partial": pd.Series([], dtype=np.int64)})
        a, b = np.concatenate(out_a), np.concatenate(out_b)
        out = pd.DataFrame({"doc_a": a, "doc_b": b}) \
            .groupby(["doc_a", "doc_b"], sort=False).size() \
            .reset_index(name="n_partial")
        out["n_partial"] = out["n_partial"].astype(np.int64)
        return out

    # bucket by fp so each expansion task sees whole fingerprint groups
    bucketed = fp.map_batches(distinct_pairs, batch_format="pyarrow") \
        .map_batches(lambda t: t.append_column(
            "bucket", pc.bit_wise_and(t["fp"], np.int64(63))),
            batch_format="pyarrow")
    part = bucketed.groupby("bucket").map_groups(
        expand, batch_format="pandas")
    # pair combine + threshold cut stay in the dataset: at web-scale
    # duplication rates the unfiltered partials exceed driver memory.
    # The combine re-buckets on a PAIR hash and reduces inside each
    # bucket task (vectorized pandas groupby) instead of a native
    # two-key groupby-sum — Ray's multi-key sort aggregate measured
    # ~300 s on 350k mostly-unique pandas-block pair rows vs ~1 s for
    # this shape (single int key, arrow blocks, 256 bounded cells).
    def pair_bucket(t: pa.Table) -> pa.Table:
        if "doc_a" not in t.column_names:      # schema-less empty
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "n_partial": pa.array([], pa.int64()),
                             "b2": pa.array([], pa.int64())})
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (a * np.uint64(0x9E3779B97F4A7C15)) ^ \
            (b * np.uint64(0xC2B2AE3D27D4EB4F))
        return t.append_column(
            "b2", pa.array((h & np.uint64(255)).astype(np.int64)))

    def combine(g: pd.DataFrame) -> pa.Table:
        agg = g.groupby(["doc_a", "doc_b"], sort=False)["n_partial"] \
            .sum().reset_index()
        agg = agg[agg["n_partial"] >= min_shared]
        return pa.table({
            "doc_a": pa.array(agg["doc_a"].to_numpy(np.int64)),
            "doc_b": pa.array(agg["doc_b"].to_numpy(np.int64)),
            "n_shared": pa.array(agg["n_partial"]
                                 .to_numpy(np.int64))})

    out = part.map_batches(pair_bucket, batch_format="pyarrow") \
        .groupby("b2").map_groups(combine, batch_format="pandas") \
        .to_pandas()
    if not len(out) or "doc_a" not in out.columns:
        return pd.DataFrame({"doc_a": pd.Series([], dtype=np.int64),
                             "doc_b": pd.Series([], dtype=np.int64),
                             "n_shared": pd.Series([], dtype=np.int64)})
    out["n_shared"] = out["n_shared"].astype(np.int64)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


__all__ = ["winnow_fingerprints", "winnow_overlap_pairs",
           "hashed_features", "ngram_novelty"]


def hashed_features(ds: ray.data.Dataset, n_buckets: int = 8,
                    id_col: str = "doc_id", text_col: str = "text",
                    batch_size: int = 4096,
                    hash_fn: str = "md5") -> ray.data.Dataset:
    """(doc_id, f_0..f_{n_buckets-1}): hashing-trick document feature
    vectors (Weinberger et al., "Feature Hashing for Large Scale
    Multitask Learning", ICML 2009) — each word increments bucket
    ``md5_low64(word) mod n_buckets`` (floored mod, so the SQL
    ``((h % n) + n) % n`` matches the signed hash exactly).  The
    "embedding for free": a fixed-width count vector per doc with no
    vocabulary table, the featurizer linear probes / n-gram LMs /
    dedup prefilters run at corpus scale.

    Streaming map: md5 once per unique word per batch, one bincount
    per doc via the flat (row, bucket) pair array — no shuffle."""
    hasher = _gram_hasher(hash_fn)

    def feats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        words = [_ASCII_NONWS.findall(t) if t else [] for t in texts]
        counts = np.fromiter((len(x) for x in words), np.int64,
                             len(words))
        wcache: dict = {}
        flat = np.empty(int(counts.sum()), np.int64)
        o = 0
        for wl in words:
            for t in wl:
                b = wcache.get(t)
                if b is None:
                    b = hasher(t) % n_buckets          # python %: floored
                    wcache[t] = b
                flat[o] = b
                o += 1
        rows = np.repeat(np.arange(len(words), dtype=np.int64), counts)
        mat = np.zeros((len(words), n_buckets), np.int64)
        np.add.at(mat, (rows, flat), 1)
        cols = {id_col: batch[id_col]}
        for j in range(n_buckets):
            cols[f"f_{j}"] = pa.array(mat[:, j])
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        feats, batch_format="pyarrow", batch_size=batch_size)


def ngram_novelty(ds: ray.data.Dataset, n: int = 3,
                  id_col: str = "doc_id", text_col: str = "text",
                  batch_size: int = 4096,
                  broadcast_limit: int = 2_000_000,
                  join_partitions: int = 32,
                  hash_fn: str = "md5") -> "pd.DataFrame":
    """(doc_id, n_grams, n_novel): per-document originality audit —
    how many of a doc's DISTINCT word ``n``-grams appear in no other
    document (the inverse view of decontaminate/dup_spans: high
    novelty = original text, low = boilerplate or near-copy).  Gram
    identity is the md5 low half (DuckDB parity), so the verdict is
    oracle-exact without a verify pass.

    Scale shape, two paths on one pass-1 groupby (the
    ``distinctive_terms`` gate): pass 1 ships per-doc-distinct 8 B
    gram-hash rows and counts distinct docs per gram natively; grams
    in >= 2 docs form the shared set.  Unlike 10-word segments or
    13-gram benchmark suites, word 3-grams shared by >= 2 docs are
    most of a natural corpus' distinct-trigram vocabulary, so the set
    is NOT duplicate-rate-bounded — when it exceeds
    ``broadcast_limit`` rows the probe switches to a gram-hash-
    PARTITIONED semi-join: (doc, gram) rows inner-join the shared set
    on ``g`` (one bucketed exchange of 16 B rows each side), matched
    counts aggregate per doc with a native groupby, and the driver
    only ever holds the per-doc report.  Below the gate the shared
    set broadcasts once (``ray.put``) and pass 2 is a streaming
    sorted-membership probe — faster, and the small-scale oracle
    path.  Both paths are exact and produce identical output."""
    import pandas as pd
    import pyarrow.compute as pc

    from .dedup import _sorted_member_mask
    hasher = _gram_hasher(hash_fn)

    def _doc_grams(batch: pa.Table):
        texts = batch[text_col].to_pylist()
        words = [_ASCII_NONWS.findall(t) if t else [] for t in texts]
        counts = np.fromiter((len(x) for x in words), np.int64,
                             len(words))
        n_grams = np.maximum(counts - n + 1, 0)
        gcache: dict = {}
        flat = np.empty(int(n_grams.sum()), np.int64)
        o = 0
        for wl in words:
            for i in range(max(len(wl) - n + 1, 0)):
                g = " ".join(wl[i:i + n])
                h = gcache.get(g)
                if h is None:
                    h = hasher(g)
                    gcache[g] = h
                flat[o] = h
                o += 1
        rows = np.repeat(np.arange(len(words), dtype=np.int64), n_grams)
        # per-doc distinct
        order = np.lexsort((flat, rows))
        f, r = flat[order], rows[order]
        first = np.ones(len(f), bool)
        first[1:] = (r[1:] != r[:-1]) | (f[1:] != f[:-1])
        return f[first], r[first], len(words)

    def pass1(batch: pa.Table) -> pa.Table:
        f, _, _ = _doc_grams(batch)
        return pa.table({"g": pa.array(f, pa.int64())})

    # materialized: both the size gate and the chosen probe path
    # consume it, and it must not recompute the pass-1 shuffle
    shared_ds = ds.select_columns([id_col, text_col]) \
        .map_batches(pass1, batch_format="pyarrow") \
        .groupby("g").count() \
        .map_batches(lambda t: t.filter(
            pc.greater_equal(t["count()"], 2)).select(["g"]),
            batch_format="pyarrow").materialize()
    n_shared = shared_ds.count()

    if n_shared <= broadcast_limit:
        # shared set fits a broadcast: one ray.put, streaming probe
        shared_pdf = shared_ds.to_pandas()
        shared = (np.sort(shared_pdf["g"].to_numpy())
                  if "g" in shared_pdf.columns
                  else np.empty(0, np.int64))
        shared_ref = ray.put(shared)

        def pass2(batch: pa.Table, ref=None) -> pa.Table:
            sh = ray.get(ref)
            f, r, n_docs = _doc_grams(batch)
            tot = np.zeros(n_docs, np.int64)
            nov = np.zeros(n_docs, np.int64)
            np.add.at(tot, r, 1)
            if len(f):
                novel = ~_sorted_member_mask(sh, f)
                np.add.at(nov, r[novel], 1)
            return pa.table({id_col: batch[id_col],
                             "n_grams": pa.array(tot),
                             "n_novel": pa.array(nov)})

        return ds.select_columns([id_col, text_col]).map_batches(
            pass2, fn_kwargs={"ref": shared_ref},
            batch_format="pyarrow", batch_size=batch_size).to_pandas() \
            .sort_values(id_col).reset_index(drop=True)

    # shared set past broadcast: gram-hash-partitioned semi-join.
    # n_novel = n_grams - |doc's grams ∩ shared|; the intersection is
    # an inner join on g (both sides exchange bucketed on hash(g)),
    # reduced to per-doc counts before anything leaves the tasks.
    # Per-doc totals derive from the SAME materialized (doc, g) rows
    # (one groupby-count of 16 B rows) plus an ids-only projection for
    # zero-gram docs — the text is tokenized and md5'd exactly ONCE on
    # this path (the md5 loop dominates, not the narrow exchanges).
    from .joins import shuffle_join

    def dg_rows(batch: pa.Table) -> pa.Table:
        f, r, _ = _doc_grams(batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(ids[r], pa.int64()),
                         "g": pa.array(f, pa.int64())})

    def match_partial(batch: pa.Table) -> pa.Table:
        if id_col not in batch.column_names:   # schema-less empty
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "n_matched": pa.array([], pa.int64())})
        ids, cnt = np.unique(
            batch[id_col].to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_grams": pa.array(
                             np.zeros(len(ids), np.int64)),
                         "n_matched": pa.array(cnt.astype(np.int64))})

    def tot_from_counts(t: pa.Table) -> pa.Table:
        return pa.table({id_col: t[id_col],
                         "n_grams": pc.cast(t["count()"], pa.int64()),
                         "n_matched": pa.array(
                             np.zeros(len(t), np.int64))})

    def zero_rows(t: pa.Table) -> pa.Table:
        z = np.zeros(len(t), np.int64)
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "n_grams": pa.array(z),
                         "n_matched": pa.array(z)})

    slim = ds.select_columns([id_col, text_col])
    dg = slim.map_batches(dg_rows, batch_format="pyarrow",
                          batch_size=batch_size).materialize()
    totals = dg.groupby(id_col).count() \
        .map_batches(tot_from_counts, batch_format="pyarrow")
    zeros_ds = slim.select_columns([id_col]) \
        .map_batches(zero_rows, batch_format="pyarrow")
    matched = shuffle_join(dg, shared_ds, on="g",
                           num_partitions=join_partitions) \
        .map_batches(match_partial, batch_format="pyarrow")
    comb = totals.union(zeros_ds, matched).groupby(id_col) \
        .sum(["n_grams", "n_matched"])

    def final(t: pa.Table) -> pa.Table:
        tot = pc.cast(t["sum(n_grams)"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        mat = pc.cast(t["sum(n_matched)"], pa.int64()) \
            .to_numpy(zero_copy_only=False)
        return pa.table({id_col: t[id_col],
                         "n_grams": pa.array(tot),
                         "n_novel": pa.array(tot - mat)})

    pdf = comb.map_batches(final, batch_format="pyarrow").to_pandas()
    if id_col not in pdf.columns:
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             "n_grams": pd.Series([], dtype=np.int64),
                             "n_novel": pd.Series([], dtype=np.int64)})
    return pdf.sort_values(id_col).reset_index(drop=True)

"""Substring-level duplicate-span detection over ``(id, text)`` tables.

Finds fixed-width character windows (``window`` chars, sampled every
``stride`` chars) whose text occurs in more than one document — the
practical, windowed form of suffix-array substring dedup for training
corpora (Lee et al., "Deduplicating Training Data Makes Language Models
Better", ACL 2022): exact long-substring overlap between documents is
detected by any shared aligned window once the overlap exceeds
``window + stride`` characters.

Part of the large-scale training-data operator suite (no reference
analogue — the reference dedups whole documents only, via simhash:
``/root/reference/include/Page/Page.hpp:94``).

100-TB shape — the usual sketch-then-verify split, text never enters
the wide exchange:

1. window + hash per batch: each doc emits ``(whash int64, doc_id,
   pos)`` rows — 24 B/row regardless of window width.  The hash is a
   position-independent polynomial over the doc's codepoints, computed
   from ONE prefix pass per batch (O(chars) time and memory, no
   per-window loop or gather matrix; see ``_window_keys``).  It is
   used only for GROUPING; correctness never depends on it (collisions
   are verified away, step 3).
2. candidate hashes = native ``groupby(whash).count() >= 2`` over
   per-batch-distinct ``(whash, doc_id)`` rows (each doc lives wholly
   in one batch, so per-batch distinct is globally distinct).  The
   candidate set is duplicate-rate-bounded — the same bound the
   minhash/ngram candidate stages already assume — and is broadcast
   as a sorted int64 array (``ray.put`` once, shared
   ``_sorted_member_mask`` membership per batch).
3. second windowing pass re-derives window TEXT for candidate rows
   only (recompute beats shipping every window body), then an exact
   vectorized verify per ``whash % n_buckets`` coarse group: a window
   is a duplicate span iff its exact text occurs in >= 2 distinct
   docs.  Only candidate windows' text moves, and only into the
   verify groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from .dedup import _sorted_member_mask

# polynomial base: odd (hence invertible mod 2^64) FNV-64 prime
_POLY_R = np.uint64(0x100000001B3)
_POLY_R_INV = np.uint64(pow(0x100000001B3, -1, 1 << 64))


def _window_keys(batch: pa.Table, window: int, stride: int,
                 id_col: str, text_col: str):
    """Vectorized window enumeration + hashing for one batch.

    Returns ``(keys int64, doc_idx int64, pos int64, texts list)``
    where row i is the window of ``texts[doc_idx[i]]`` at CHARACTER
    offset ``pos[i]`` (0-based, same arithmetic as SQL
    ``substr(text, pos+1, window)`` — unicode-safe) and ``keys[i]`` is
    its position-independent polynomial hash: with prefix sums
    ``P[k] = Σ_{j<k} c[j]·r^j (mod 2^64)`` over the batch's
    concatenated codepoints, the key at global offset g is
    ``(P[g+w] − P[g])·r^{−g} = Σ_{j<w} c[g+j]·r^j`` — equal window
    text ⇒ equal key, at any offset in any doc.  One cumsum + two
    cumprods per batch; the only per-doc Python is the utf-32 encode.
    """
    texts = batch[text_col].to_pylist()
    n_docs = len(texts)
    lens = np.fromiter((len(t) if t is not None else 0 for t in texts),
                       np.int64, n_docs)
    n_wins = np.where(lens >= window, (lens - window) // stride + 1, 0)
    total = int(n_wins.sum())
    if total == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.int64), texts)
    # one contiguous codepoint buffer for the whole batch (windows are
    # generated per doc, so none crosses a doc boundary)
    bufs = [np.frombuffer(t.encode("utf-32-le"), np.uint32)
            for t in texts if t]
    codes = (np.concatenate(bufs) if bufs
             else np.empty(0, np.uint32)).astype(np.uint64)
    nbuf = len(codes)
    doc_start = np.concatenate([[0], np.cumsum(lens)])[:-1]

    pw = np.empty(nbuf, np.uint64)          # pw[i] = r^i  (mod 2^64)
    pw[0] = 1
    np.cumprod(np.full(nbuf - 1, _POLY_R, np.uint64), out=pw[1:]) \
        if nbuf > 1 else None
    prefix = np.zeros(nbuf + 1, np.uint64)  # P[k] = Σ_{j<k} c[j]·r^j
    np.cumsum(codes * pw, out=prefix[1:])
    rinv_pow = np.empty(nbuf, np.uint64)    # r^{-i}  (mod 2^64)
    rinv_pow[0] = 1
    np.cumprod(np.full(nbuf - 1, _POLY_R_INV, np.uint64),
               out=rinv_pow[1:]) if nbuf > 1 else None

    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_wins)
    bases = np.concatenate([[0], np.cumsum(n_wins)])[:-1]
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(bases, n_wins)) * stride
    g = doc_start[doc_idx] + pos
    keys = ((prefix[g + window] - prefix[g]) * rinv_pow[g]) \
        .view(np.int64)                     # int64: uint64 > 2^63
    #                                         breaks Ray aggregates
    return keys, doc_idx, pos, texts


def dup_spans(ds: ray.data.Dataset, window: int = 40, stride: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              n_verify_buckets: int = 32) -> ray.data.Dataset:
    """(doc_id, pos) for every window whose exact text appears in >= 2
    distinct documents.  Exact output (hash collisions verified away)."""
    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except AttributeError:
        id_type = pa.int64()

    def pass1(batch: pa.Table) -> pa.Table:
        keys, doc_idx, _, _ = _window_keys(batch, window, stride,
                                           id_col, text_col)
        # distinct (whash, doc) per batch => downstream count() counts
        # DISTINCT docs per hash
        order = np.lexsort((doc_idx, keys))
        k, d = keys[order], doc_idx[order]
        first = np.ones(len(k), bool)
        first[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        return pa.table({"whash": pa.array(k[first], pa.int64())})

    import pyarrow.compute as pc
    cand_pdf = ds.map_batches(pass1, batch_format="pyarrow") \
        .groupby("whash").count() \
        .map_batches(lambda t: t.filter(pc.greater_equal(t["count()"], 2))
                     .select(["whash"]), batch_format="pyarrow") \
        .to_pandas()
    # to_pandas() on a fully-empty dataset drops the column schema
    cand = (cand_pdf["whash"].to_numpy() if "whash" in cand_pdf.columns
            else np.empty(0, np.int64))
    # candidate volume is duplicate-rate-bounded (one row per window
    # VALUE shared by >=2 docs), the same driver bound the minhash and
    # ngram candidate stages document
    if len(cand) == 0:
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], id_type),
             "pos": pa.array([], pa.int64())}))
    cand_ref = ray.put(np.sort(cand))

    def pass2(batch: pa.Table, ref=None) -> pa.Table:
        cand_sorted = ray.get(ref)   # repo convention: refs in
        # fn_kwargs are not auto-dereferenced; tiny, re-fetch is cheap
        keys, doc_idx, pos, texts = _window_keys(
            batch, window, stride, id_col, text_col)
        m = _sorted_member_mask(cand_sorted, keys)
        keys, doc_idx, pos = keys[m], doc_idx[m], pos[m]
        # window TEXT only for the surviving candidates
        wins = [texts[d][p:p + window] for d, p in zip(doc_idx, pos)]
        ids = batch[id_col].take(pa.array(doc_idx)).combine_chunks()
        return pa.table({
            "bucket": pa.array(keys % np.int64(n_verify_buckets),
                               pa.int64()),
            id_col: ids.cast(id_type),   # explicit: empty object
            #   arrays would infer `null` and flip the stream schema
            "pos": pa.array(pos, pa.int64()),
            "win": pa.array(wins, pa.string())})

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        # exact: a span is dup iff its TEXT occurs in >=2 distinct docs
        ndocs = g.groupby("win")[id_col].transform("nunique")
        out = g.loc[ndocs >= 2, [id_col, "pos"]]
        return out if len(out) else pd.DataFrame(
            {id_col: pd.Series([], dtype=g[id_col].dtype),
             "pos": pd.Series([], dtype=np.int64)})

    return ds.map_batches(pass2, fn_kwargs={"ref": cand_ref},
                          batch_format="pyarrow") \
        .groupby("bucket").map_groups(verify, batch_format="pandas")


__all__ = ["dup_spans"]

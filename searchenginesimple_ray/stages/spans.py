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
   process-stable string hash used only for GROUPING; correctness
   never depends on it (collisions are verified away, step 3).
2. candidate hashes = native ``groupby(whash).count() >= 2`` over
   per-batch-distinct ``(whash, doc_id)`` rows (each doc lives wholly
   in one batch, so per-batch distinct is globally distinct).  The
   candidate set is duplicate-rate-bounded — the same bound the
   minhash/ngram candidate stages already assume — and is broadcast
   as a sorted int64 array (``ray.put`` once, ``searchsorted``
   membership per batch).
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


def _window_rows(batch: pa.Table, window: int, stride: int,
                 id_col: str, text_col: str,
                 keep_text: bool) -> pd.DataFrame:
    """All full char windows of each doc: (whash, doc_id, pos[, win]).

    Positions are 0-based CHARACTER offsets (same arithmetic as SQL
    ``substr(text, pos+1, window)``), so the kernel is unicode-safe.
    """
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    texts = batch[text_col].to_pylist()
    out_ids: list = []
    out_pos: list[int] = []
    wins: list[str] = []
    for did, tx in zip(ids, texts):
        if tx is None:
            continue
        n = len(tx)
        for p in range(0, n - window + 1, stride):
            out_ids.append(did)
            out_pos.append(p)
            wins.append(tx[p:p + window])
    # stable across processes: pandas string hashing keys on hash_key
    # for object dtype (NB: numeric dtypes would IGNORE hash_key)
    whash = pd.util.hash_pandas_object(
        pd.Series(wins, dtype=object), index=False).to_numpy() \
        .view(np.int64)          # int64: uint64 > 2^63 breaks Ray aggs
    # dtype-stable on EMPTY batches too (np.asarray([]) is float64,
    # which would flip the block schema mid-stream)
    df = pd.DataFrame({"whash": whash,
                       "doc_id": np.asarray(out_ids, dtype=ids.dtype)
                       if len(out_ids) else np.empty(0, ids.dtype),
                       "pos": np.asarray(out_pos, dtype=np.int64)})
    if keep_text:
        df["win"] = wins
    return df


def dup_spans(ds: ray.data.Dataset, window: int = 40, stride: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              n_verify_buckets: int = 32) -> ray.data.Dataset:
    """(doc_id, pos) for every window whose exact text appears in >= 2
    distinct documents.  Exact output (hash collisions verified away)."""

    def pass1(batch: pa.Table) -> pa.Table:
        df = _window_rows(batch, window, stride, id_col, text_col,
                          keep_text=False)
        # distinct (whash, doc) per batch => downstream count() counts
        # DISTINCT docs per hash
        df = df.drop_duplicates(["whash", "doc_id"])
        return pa.table({"whash": pa.array(df["whash"].to_numpy())})

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
    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except AttributeError:
        id_type = pa.int64()
    if len(cand) == 0:
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], id_type),
             "pos": pa.array([], pa.int64())}))
    cand_ref = ray.put(np.sort(cand))

    def pass2(batch: pa.Table, ref=None) -> pa.Table:
        cand_sorted = ray.get(ref)   # repo convention: refs in
        # fn_kwargs are not auto-dereferenced; tiny, re-fetch is cheap
        df = _window_rows(batch, window, stride, id_col, text_col,
                          keep_text=True)
        if len(cand_sorted) == 0 or not len(df):
            df = df.iloc[0:0]
        else:
            idx = np.clip(np.searchsorted(cand_sorted,
                                          df["whash"].to_numpy()),
                          0, len(cand_sorted) - 1)
            df = df[cand_sorted[idx] == df["whash"].to_numpy()]
        df = df.copy()
        bucket = df["whash"].to_numpy() % np.int64(n_verify_buckets)
        # explicit types: from_pandas would infer `null` for an empty
        # object column and flip the stream schema
        return pa.table({
            "bucket": pa.array(bucket.astype(np.int64)),
            id_col: pa.array(df["doc_id"].to_numpy()),
            "pos": pa.array(df["pos"].to_numpy(), pa.int64()),
            "win": pa.array(df["win"].tolist(), pa.string())})

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

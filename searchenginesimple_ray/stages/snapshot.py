"""Snapshot diff: content-level comparison of two corpus snapshots.

An incrementally-maintained 100-TB corpus (the engine's own
``append_index`` path, or any periodically re-crawled dataset) needs a
cheap answer to "what changed between snapshot A and snapshot B?" —
added / removed / changed / unchanged document counts, keyed by a
stable id and compared by content digest.  This is the data-delta
audit that gates incremental index appends and retraining triggers.

Scale shape: text NEVER enters the exchange — each side streams
through one ``map_batches`` that reduces a row to (doc_id, side,
md5(text)) (~50 B/row; md5 is a per-row C call, the standard digest
cost any snapshot store already pays), both sides union into ONE
coarse ``doc_id % n_buckets`` shuffle, and a vectorized per-bucket
kernel lexsorts by id and classifies each id's (side, digest) group.
Output is 4 rows (status, n_docs) — per-bucket partial counts summed
driver-side, O(n_buckets) driver state.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

STATUSES = ("added", "removed", "changed", "unchanged")


def _digest_side(side: int, id_col: str, text_col: str, n_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        # md5 low 8 bytes as int64: the SQL oracle compares the texts
        # directly, so the digest only has to agree with *itself* on
        # equality — 64 bits keeps the exchange row at 20 B, and a
        # false "unchanged" needs a 2^-64 truncated-md5 collision
        dig = np.fromiter(
            (int.from_bytes(hashlib.md5(
                (t or "").encode("utf-8")).digest()[:8], "little",
                signed=True) for t in texts),
            dtype=np.int64, count=len(texts))
        return pa.table({
            "doc_id": pa.array(ids),
            "side": pa.array(np.full(len(ids), side, np.int8)),
            "digest": pa.array(dig),
            "bucket": pa.array((ids % n_buckets).astype(np.int32)),
        })
    return fn


def snapshot_diff(old: ray.data.Dataset, new: ray.data.Dataset,
                  id_col: str = "doc_id", text_col: str = "text",
                  n_buckets: int = 64) -> pd.DataFrame:
    """(status, n_docs) over the two snapshots: ``added`` (id only in
    new), ``removed`` (only in old), ``changed`` (both, digest
    differs), ``unchanged`` (both, digest equal).  Ids must be unique
    within each snapshot (duplicate ids in one side raise — a diff
    over a non-keyed table is ill-defined)."""
    tagged = old.select_columns([id_col, text_col]) \
        .map_batches(_digest_side(0, id_col, text_col, n_buckets),
                     batch_format="pyarrow") \
        .union(new.select_columns([id_col, text_col])
               .map_batches(_digest_side(1, id_col, text_col, n_buckets),
                            batch_format="pyarrow"))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"status": pd.Series([], dtype=object),
                                 "n_docs": pd.Series([], dtype=np.int64)})
        ids = g["doc_id"].to_numpy()
        side = g["side"].to_numpy()
        dig = g["digest"].to_numpy()
        order = np.lexsort((side, ids))
        ids, side, dig = ids[order], side[order], dig[order]
        starts = np.flatnonzero(
            np.concatenate(([True], ids[1:] != ids[:-1])))
        ends = np.append(starts[1:], len(ids))
        n = ends - starts
        if n.max(initial=0) > 2:
            raise ValueError("duplicate ids within one snapshot side")
        both = n == 2
        if (side[starts[both]] != 0).any() or \
           (side[ends[both] - 1] != 1).any():
            raise ValueError("duplicate ids within one snapshot side")
        only = ~both
        added = int((side[starts[only]] == 1).sum())
        removed = int((side[starts[only]] == 0).sum())
        eq = dig[starts[both]] == dig[ends[both] - 1]
        changed = int((~eq).sum())
        unchanged = int(eq.sum())
        return pd.DataFrame({
            "status": list(STATUSES),
            "n_docs": np.array([added, removed, changed, unchanged],
                               dtype=np.int64)})

    parts = tagged.groupby("bucket") \
        .map_groups(classify, batch_format="pandas").to_pandas()
    out = parts.groupby("status", as_index=False)["n_docs"].sum()
    # all four statuses always present (zero-filled) for schema stability
    out = out.set_index("status").reindex(list(STATUSES), fill_value=0) \
        .reset_index()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out

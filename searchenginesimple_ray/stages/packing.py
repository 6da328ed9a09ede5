"""Concat-and-chunk sequence packing over ``(id, text)`` tables.

Maps every document to its place in the packed training stream: all
docs' tokens are (conceptually) concatenated in ``id`` order and cut
into fixed ``seq_len``-token context windows — the standard
"concat-then-chunk" packing used for LM pretraining batches.  The
operator emits, per doc, its global token ``start_offset`` and the
first/last sequence index it lands in; a writer that materializes the
packed sequences needs exactly this map.

Part of the large-scale training-data operator suite (no reference
analogue).

100-TB shape: the global running sum uses the same two-level prefix
trick as A5 docid assignment (``stages/docids.py``) — per-RANGE-bucket
token totals (one tiny native ``groupby().sum()``), driver prefix-sums
the ``n_buckets`` totals, then one vectorized cumsum per bucket group.
The exchange carries 16 B ``(doc_id, n_tokens)`` rows only; text never
leaves the first map stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..functions.textstats import WS_TOKEN


def pack_sequences(ds: ray.data.Dataset, seq_len: int = 256,
                   id_col: str = "doc_id", text_col: str = "text",
                   n_buckets: int = 32) -> ray.data.Dataset:
    """(doc_id, n_tokens, start_offset, start_seq, end_seq) per doc
    with n_tokens > 0, tokens counted by whitespace split, docs packed
    in ``doc_id`` order."""

    def count_tokens(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = pa.array(np.fromiter(
            (len(WS_TOKEN.findall(t)) if t is not None else 0
             for t in texts), np.int64, len(texts)))
        t = pa.table({id_col: batch[id_col], "n_tokens": n})
        import pyarrow.compute as pc
        return t.filter(pc.greater(t["n_tokens"], 0))

    slim = ds.select_columns([id_col, text_col]) \
        .map_batches(count_tokens, batch_format="pyarrow").materialize()

    try:
        id_type = ds.schema().base_schema.field(id_col).type
    except AttributeError:
        id_type = pa.int64()
    from ray.data.aggregate import Max, Min
    mm = slim.aggregate(Min(id_col), Max(id_col)) or {}
    lo, hi = mm.get(f"min({id_col})"), mm.get(f"max({id_col})")
    if lo is None:        # empty input
        return ray.data.from_arrow(pa.table(
            {id_col: pa.array([], id_type),
             "n_tokens": pa.array([], pa.int64()),
             "start_offset": pa.array([], pa.int64()),
             "start_seq": pa.array([], pa.int64()),
             "end_seq": pa.array([], pa.int64())}))
    width = max(1, (int(hi) - int(lo) + n_buckets) // n_buckets)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = (t[id_col].to_numpy(zero_copy_only=False) - lo) // width
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    bucketed = slim.map_batches(add_bucket, batch_format="pyarrow") \
        .materialize()

    # driver prefix over n_buckets totals: per-batch PARTIAL sums
    # (<= n_buckets rows per block, no exchange at all — the
    # stages/docids.py conv_bases shape), merged with np.add.at
    def bucket_partials(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        s = np.zeros(n_buckets, np.int64)
        np.add.at(s, b, t["n_tokens"].to_numpy(zero_copy_only=False))
        nz = np.flatnonzero(s)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "partial": pa.array(s[nz], pa.int64())})

    parts = bucketed.map_batches(bucket_partials,
                                 batch_format="pyarrow").to_pandas()
    totals = np.zeros(n_buckets + 1, np.int64)
    np.add.at(totals, parts["bucket"].to_numpy(dtype=np.int64),
              parts["partial"].to_numpy(dtype=np.int64))
    bases = np.concatenate([[0], np.cumsum(totals)[:-1]])

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        start = bases[int(g["bucket"].iloc[0])] + np.cumsum(n) - n
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "n_tokens": n,
            "start_offset": start,
            "start_seq": start // seq_len,
            "end_seq": (start + n - 1) // seq_len})

    return bucketed.groupby("bucket").map_groups(
        pack_group, batch_format="pandas")


__all__ = ["pack_sequences"]

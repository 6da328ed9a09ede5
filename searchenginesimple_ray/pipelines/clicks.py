"""Click-event sink (S7 analogue).

The reference fire-and-forgets click records to a Kafka topic
(`src/Server/WebServer.cc:205-237`, topic ``SearchResultsJump``,
key=url, value=JSON).  The batch-engine equivalent is a ``clicks``
Parquet table written with Ray Data — partitioned by day so downstream
consumers prune by time range and a failed run can re-write one
partition idempotently.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

CLICK_SCHEMA = pa.schema([
    ("ts", pa.timestamp("us")),
    ("url", pa.string()),
    ("query", pa.string()),
    ("doc_id", pa.int64()),
    ("rank", pa.int32()),
])


def clicks_table(rows: list[dict]) -> pa.Table:
    """Build a clicks Arrow table from event dicts (ts in epoch-us)."""
    return pa.table({
        "ts": pa.array(np.asarray([r["ts"] for r in rows], dtype=np.int64),
                       pa.timestamp("us")),
        "url": pa.array([r.get("url", "") for r in rows], pa.string()),
        "query": pa.array([r.get("query", "") for r in rows], pa.string()),
        "doc_id": pa.array(np.asarray([r.get("doc_id", -1) for r in rows],
                                      dtype=np.int64)),
        "rank": pa.array(np.asarray([r.get("rank", -1) for r in rows],
                                    dtype=np.int32), pa.int32()),
    })


def write_clicks(ds_or_table, out_dir: str) -> None:
    """Append click events as day-partitioned Parquet."""
    if isinstance(ds_or_table, pa.Table):
        ds = ray.data.from_arrow(ds_or_table)
    else:
        ds = ds_or_table

    def add_day(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        return t.append_column("day", day)

    ds.map_batches(add_day, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["day"])

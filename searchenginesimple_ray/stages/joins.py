"""Generic relational joins for the training-data suite.

The reference engine has no joins (its only multi-table step is the
posting-dict lookup, `include/Dictionary/Dictionary.hpp`); a curation
pipeline at 100 TB constantly joins fact tables against metadata, so
the engine exposes the two shapes that matter at scale:

- ``broadcast_join``: the SMALL side (dimension tables: nations,
  licenses, source registries) is pinned in the object store ONCE via
  ``ray.put`` and every batch task runs a zero-copy Arrow (acero)
  hash join against it — no shuffle, the big side streams.  This is
  the map-side join; the small side must fit a worker heap and the
  guard below enforces an explicit row bound so a silently-huge
  "dimension" table fails loudly instead of OOMing the cluster.
- ``shuffle_join``: both sides hash-partitioned on the key via Ray
  Data's native ``Dataset.join`` — the reduce-side repartitioned join
  for large x large (fact x fact).  One all-to-all exchange per side;
  pre-aggregate or column-prune before calling it.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

# refuse to broadcast "small" sides above this many rows — at that
# point the caller wants shuffle_join (the bound is generous: 5M rows
# of packed int keys ~ 100s of MB, still sane to pin per node).
BROADCAST_MAX_ROWS = 5_000_000


def broadcast_join(ds: ray.data.Dataset, small: pa.Table,
                   keys, right_keys=None,
                   join_type: str = "inner") -> ray.data.Dataset:
    """Map-side join: stream ``ds`` through a per-batch Arrow hash
    join against the broadcast ``small`` table (put ONCE, read by
    every task — never re-shipped per batch)."""
    if join_type not in ("inner", "left outer", "left semi", "left anti"):
        # per-batch joins see only their slice of the big side, so any
        # right/full-outer emits unmatched small-side rows ONCE PER
        # BATCH — partitioning-dependent and wrong.  Use shuffle_join.
        raise ValueError(f"broadcast_join cannot express {join_type!r} "
                         "correctly per-batch; use shuffle_join")
    if isinstance(keys, str):
        keys = [keys]
    right_keys = keys if right_keys is None else (
        [right_keys] if isinstance(right_keys, str) else right_keys)
    if small.num_rows > BROADCAST_MAX_ROWS:
        raise ValueError(
            f"broadcast side has {small.num_rows} rows "
            f"(> {BROADCAST_MAX_ROWS}); use shuffle_join")
    small_ref = ray.put(small.combine_chunks())

    def join_batch(batch: pa.Table, ref=None) -> pa.Table:
        right = ray.get(ref)
        return batch.join(right, keys=list(keys),
                          right_keys=list(right_keys),
                          join_type=join_type)

    return ds.map_batches(join_batch, fn_kwargs={"ref": small_ref},
                          batch_format="pyarrow")


def shuffle_join(left: ray.data.Dataset, right: ray.data.Dataset,
                 on, right_on=None, num_partitions: int = 32,
                 join_type: str = "inner") -> ray.data.Dataset:
    """Reduce-side join: both inputs hash-partitioned on the key
    (one all-to-all exchange each), partition-wise hash join.  Thin
    wrapper over Ray Data's native ``Dataset.join`` so call sites
    document intent (and so the broadcast/shuffle choice is explicit
    and greppable)."""
    if isinstance(on, str):
        on = (on,)
    if right_on is not None and isinstance(right_on, str):
        right_on = (right_on,)
    return left.join(right, join_type, num_partitions=num_partitions,
                     on=tuple(on), right_on=right_on)


__all__ = ["broadcast_join", "shuffle_join", "BROADCAST_MAX_ROWS"]

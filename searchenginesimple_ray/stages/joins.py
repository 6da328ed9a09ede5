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
import pyarrow.compute as pc
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
    # cap partitions at 2x the cluster CPU count: Ray's hash-join
    # aggregator pool HANGS when far more aggregators than CPUs are
    # requested on a small cluster (observed: 32 partitions on a
    # 4-CPU session never completes; 8 finishes instantly).  On a
    # real cluster the requested value stands.
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or None
    except Exception:
        cpus = None
    if cpus:
        num_partitions = max(1, min(num_partitions, 2 * cpus))
    return left.join(right, join_type, num_partitions=num_partitions,
                     on=tuple(on), right_on=right_on)


def drop_empty_blocks(ds: ray.data.Dataset):
    """Scrub SCHEMA-LESS empty blocks from a dataset.

    Ray 2.49's hash ``Dataset.join`` emits one block per hash
    partition, and an EMPTY partition's block has no schema at all.
    Map stages skip empty blocks (the UDF never sees them), so these
    blocks survive any number of ``map_batches`` and then crash the
    NEXT join or acero consumer with ``No match or multiple matches
    for key field reference`` — the key column genuinely isn't there.
    Observed whenever a join's key space doesn't cover every hash
    partition (skewed or small inputs).

    Rebuilds the (materialized) dataset from its non-empty block refs
    — zero-copy, no exchange.  Returns ``None`` when every block is
    empty (caller supplies its own typed empty result)."""
    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows:
                refs.append(ref)
    if not refs:
        return None
    return ray.data.from_arrow_refs(refs)


__all__ = ["broadcast_join", "shuffle_join", "drop_empty_blocks",
           "BROADCAST_MAX_ROWS"]


def pricing_summary(lineitem: ray.data.Dataset,
                    cutoff_us: int) -> "pd.DataFrame":
    """TPC-H-Q1-shape pricing summary: per (returnflag, linestatus)
    exact integer aggregates over lineitems shipped at or before
    ``cutoff_us`` (epoch microseconds).

    Output columns (all int64, fixed-point so the value-hash is
    bit-stable regardless of partitioning — same floor(x*100 + 0.5)
    cent rule as nation_revenue and the SQL oracle):
      sum_qty_c       quantity cents
      sum_base_c      extendedprice cents
      sum_disc_c4     extendedprice*(1-discount), units 1e-4 dollars
      sum_charge_c6   ...*(1+tax), units 1e-6 dollars
      n_rows          count(*)

    Scale shape: the date filter and ALL arithmetic happen inside each
    batch, every batch pre-aggregates to <= |flags x statuses| partial
    rows (single Arrow group_by), and only those partials reach the
    driver — the classic combiner-then-tiny-reduce; rows never shuffle.
    Magnitude: charge_c6 <= ~1e11/row, so int64 holds > 9e7 rows per
    GROUP per BLOCK before partial sums could wrap; partials re-sum in
    int64 pandas where the same bound applies per group across blocks
    (~9e7 blocks) — far beyond any real layout.
    """
    import numpy as np
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy()
        sel = ship <= cutoff_us
        if not sel.any():
            return pa.table({
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty_c": pa.array([], pa.int64()),
                "sum_base_c": pa.array([], pa.int64()),
                "sum_disc_c4": pa.array([], pa.int64()),
                "sum_charge_c6": pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
            })
        batch = batch.filter(pa.array(sel))
        qty_c = np.floor(batch["l_quantity"].to_numpy() * 100
                         + 0.5).astype(np.int64)
        price_c = np.floor(batch["l_extendedprice"].to_numpy() * 100
                           + 0.5).astype(np.int64)
        disc_c = np.floor(batch["l_discount"].to_numpy() * 100
                          + 0.5).astype(np.int64)
        tax_c = np.floor(batch["l_tax"].to_numpy() * 100
                         + 0.5).astype(np.int64)
        disc_c4 = price_c * (100 - disc_c)
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty_c": pa.array(qty_c),
            "sum_base_c": pa.array(price_c),
            "sum_disc_c4": pa.array(disc_c4),
            "sum_charge_c6": pa.array(disc_c4 * (100 + tax_c)),
            "n_rows": pa.array(np.ones(len(qty_c), np.int64)),
        })
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("sum_qty_c", "sum"), ("sum_base_c", "sum"),
             ("sum_disc_c4", "sum"), ("sum_charge_c6", "sum"),
             ("n_rows", "sum")]).rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_c", "sum_base_c",
             "sum_disc_c4", "sum_charge_c6", "n_rows"])

    cols = ["l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate"]
    pdf = lineitem.select_columns(cols) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    out = pdf.groupby(["l_returnflag", "l_linestatus"],
                      as_index=False).sum()
    for c in out.columns[2:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["l_returnflag", "l_linestatus"]) \
        .reset_index(drop=True)


__all__.append("pricing_summary")


def shipping_priority_topk(customer: "ray.data.Dataset",
                           orders: "ray.data.Dataset",
                           lineitem: "ray.data.Dataset",
                           segment: str, cutoff_us: int,
                           k: int = 10) -> "pd.DataFrame":
    """TPC-H-Q3 shape (shipping priority): top-``k`` orders by open
    revenue — customers in ``segment``, orders placed before the
    cutoff, lineitems shipped after it.  Output: (l_orderkey,
    o_orderdate_us, o_orderpriority, revenue_c4) sorted by
    (revenue DESC, orderkey), revenue in exact 1e-4-dollar integer
    units (same floor(x*100 + 0.5) cent rule as nation_revenue).

    Plan (the canonical Q3 at scale):
    - the segment's custkey set rides a BROADCAST semi-join into the
      orders scan (dimension-sized side pinned once via ``ray.put``;
      the ``BROADCAST_MAX_ROWS`` guard fails loudly if a "segment"
      ever isn't) — orders are date-filtered AT THE READ side before
      any exchange;
    - lineitem is date-filtered and pre-aggregated to (orderkey,
      rev_c4) partials INSIDE each batch (combiner), so the one
      fact x fact shuffle join moves order-bounded partials, never
      raw lineitems;
    - final revenue needs each order's global sum, so top-k runs
      AFTER one order-bounded groupby-sum; per-block partial top-k
      bounds what the driver sees to k x blocks rows.
    """
    import numpy as np
    import pandas as pd

    cust_keys = customer.select_columns(["c_custkey", "c_mktsegment"]) \
        .map_batches(lambda b: b.filter(
            pc.equal(b["c_mktsegment"], segment))
            .select(["c_custkey"]), batch_format="pyarrow")
    cust_tbl = pa.Table.from_pandas(cust_keys.to_pandas())

    def orders_narrow(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.int64())
        t = pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "o_orderdate_us": od,
            "o_orderpriority": batch["o_orderpriority"]})
        return t.filter(pc.less(t["o_orderdate_us"], cutoff_us))

    orders_f = broadcast_join(
        orders.map_batches(orders_narrow, batch_format="pyarrow"),
        cust_tbl, keys="o_custkey", right_keys="c_custkey",
        join_type="left semi") \
        .select_columns(["o_orderkey", "o_orderdate_us", "o_orderpriority"])

    def li_partial(batch: pa.Table) -> pa.Table:
        ship = batch["l_shipdate"].cast(pa.int64()).to_numpy()
        sel = ship > cutoff_us
        if not sel.any():
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64())})
        batch = batch.filter(pa.array(sel))
        price_c = np.floor(batch["l_extendedprice"].to_numpy() * 100
                           + 0.5).astype(np.int64)
        disc_c = np.floor(batch["l_discount"].to_numpy() * 100
                          + 0.5).astype(np.int64)
        t = pa.table({"l_orderkey": batch["l_orderkey"],
                      "rev": pa.array(price_c * (100 - disc_c))})
        return t.group_by("l_orderkey").aggregate([("rev", "sum")]) \
            .rename_columns(["l_orderkey", "rev"])

    li_agg = lineitem.select_columns(
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]) \
        .map_batches(li_partial, batch_format="pyarrow")
    joined = shuffle_join(li_agg, orders_f, on="l_orderkey",
                          right_on="o_orderkey", num_partitions=8)
    rev = joined.groupby(
        ["l_orderkey", "o_orderdate_us", "o_orderpriority"]) \
        .sum("rev")

    def block_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["sum(rev)", "l_orderkey"],
                            ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = rev.map_batches(block_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["sum(rev)", "l_orderkey"],
                            ascending=[False, True]).head(k)
    return pd.DataFrame({
        "l_orderkey": cand["l_orderkey"].to_numpy(),
        "o_orderdate_us": cand["o_orderdate_us"].to_numpy(),
        "o_orderpriority": cand["o_orderpriority"].to_numpy(),
        "revenue_c4": cand["sum(rev)"].to_numpy().astype(np.int64),
    }).reset_index(drop=True)

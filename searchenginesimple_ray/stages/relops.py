"""Relational wide-table operators: pivot, distributed global rank,
bloom-prefiltered semi-join, grouped exact median.

No direct reference analogue (the reference engine is full-text only;
`/root/reference/include/MapReduce/Bolt.hpp` stops at per-key
aggregates) — these are the wide/relational steps a training-data
curation pipeline runs next to it, built on the repo's standard
shapes: per-batch Arrow combiners in front of every exchange, bucket
scans with O(B) driver state (the `watermark_late_events` Blelloch
pattern), broadcasts only for provably bounded sides, and
hash-partitioned joins otherwise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def pivot_counts(ds: ray.data.Dataset, row_col: str, col_col: str,
                 col_values: list[str],
                 other_name: str = "other") -> pd.DataFrame:
    """Wide count matrix: one output row per ``row_col`` value, one
    ``n_<v>`` column per entry of ``col_values`` (a FIXED, declared
    column dimension — the contract every pivot needs to be schema-
    stable), plus ``n_<other_name>`` for unlisted values and
    ``n_total``.  NULL ``row_col`` groups under the empty string.

    100-TB shape: each batch collapses to at most |rows-in-batch| x
    (|col_values|+1) partial rows via one Arrow group_by; the native
    (row, col) groupby-sum reduces those; only the (rows x cols)
    report — the pivot's own output size — reaches the driver, where
    widening is a single searchsorted scatter."""

    def partial(t: pa.Table) -> pa.Table:
        r = t[row_col].to_pandas().fillna("").to_numpy(object)
        c = t[col_col].to_pandas().fillna("").to_numpy(object)
        pdf = pd.DataFrame({"r": r, "c": c})
        pdf["c"] = np.where(pdf["c"].isin(col_values), pdf["c"],
                            "\x00other")
        agg = pdf.groupby(["r", "c"], sort=False).size() \
            .reset_index(name="cnt")
        return pa.Table.from_pandas(agg, preserve_index=False)

    comb = ds.select_columns([row_col, col_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["r", "c"]).sum("cnt").to_pandas()
    cols = [f"n_{v}" for v in col_values] + [f"n_{other_name}"]
    if not len(comb) or "r" not in comb.columns:
        out = pd.DataFrame({row_col: pd.Series([], dtype=object)})
        for c in cols + ["n_total"]:
            out[c] = pd.Series([], dtype=np.int64)
        return out
    rows = np.sort(comb["r"].unique())
    mat = np.zeros((len(rows), len(cols)), np.int64)
    ci = {v: i for i, v in enumerate(col_values)}
    ri = np.searchsorted(rows, comb["r"].to_numpy(object))
    cj = np.array([ci.get(c, len(cols) - 1)
                   for c in comb["c"].to_numpy(object)], np.int64)
    np.add.at(mat, (ri, cj), comb["sum(cnt)"].to_numpy(np.int64))
    out = pd.DataFrame({row_col: rows})
    for j, c in enumerate(cols):
        out[c] = mat[:, j]
    out["n_total"] = mat.sum(axis=1)
    return out.reset_index(drop=True)



def _value_bounds(narrow: ray.data.Dataset, value_col: str,
                  n_buckets: int):
    """Global (lo, bucket_width) of a value column, or None when the
    dataset is empty — the shared pass-0 of every bucket-cell op."""
    bounds = narrow.aggregate(
        ray.data.aggregate.Min(value_col),
        ray.data.aggregate.Max(value_col))
    lo, hi = bounds[f"min({value_col})"], bounds[f"max({value_col})"]
    if lo is None:
        return None
    lo, hi = float(lo), float(hi)
    return lo, (hi - lo) / n_buckets or 1.0


def _bucket_arr(v: np.ndarray, lo: float, width: float,
                n_buckets: int, opname: str) -> np.ndarray:
    """Fixed-width value-range bucket ids; equal values always share a
    bucket (pure function of the value), which is what makes tie
    ranks / quantile cells exact.  NaN refused — SQL NULL ordering is
    dialect-dependent."""
    if np.isnan(v).any():
        raise ValueError(f"{opname}: NULL/NaN values")
    return np.clip(((v - lo) / width).astype(np.int64), 0,
                   n_buckets - 1)


def global_rank(ds: ray.data.Dataset, id_col: str, value_col: str,
                n_buckets: int = 256) -> ray.data.Dataset:
    """(id, value_rank): SQL ``rank() OVER (ORDER BY value)`` — for
    each row, 1 + the number of rows with a strictly smaller value
    (ties share a rank) — WITHOUT a global sort.

    Distributed selection by value-range buckets (the Blelloch
    two-pass of ``watermark_late_events``, keyed on VALUE instead of
    stream offset): pass 1 buckets every row by fixed-width value
    range between the global min/max and reduces to per-bucket counts
    (B rows; driver takes the O(B) exclusive prefix sum); pass 2
    shuffles the narrow (id, value) rows once by bucket and ranks
    within each bucket by one vectorized searchsorted, seeded with
    the bucket's prefix.  Equal values always share a bucket (the
    bucket is a function of the value), so tie ranks are exact across
    the whole corpus.  Fixed-width buckets assume a roughly
    continuous value distribution; for adversarial skew substitute
    sampled (KLL) boundaries — same two passes.  NULL values are
    refused (SQL rank order with NULLs is dialect-dependent)."""
    narrow = ds.select_columns([id_col, value_col])
    bw = _value_bounds(narrow, value_col, n_buckets)
    if bw is None:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "value_rank": pa.array([], pa.int64())}))
    lo, width = bw

    def with_bucket(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        b = _bucket_arr(v, lo, width, n_buckets, "global_rank")
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "v": pa.array(v),
                         "bucket": pa.array(b)})

    keyed = narrow.map_batches(with_bucket,
                               batch_format="pyarrow").materialize()
    agg = keyed.groupby("bucket").count().to_pandas()
    cnt = np.zeros(n_buckets, np.int64)
    cnt[agg["bucket"].to_numpy(np.int64)] = \
        agg["count()"].to_numpy(np.int64)
    base = np.concatenate(([0], np.cumsum(cnt)))[:-1]
    base_ref = ray.put(base)

    def kernel(g: pd.DataFrame, ref=base_ref) -> pd.DataFrame:
        b = int(g["bucket"].iloc[0])
        v = g["v"].to_numpy(np.float64)
        sv = np.sort(v)
        rank = ray.get(ref)[b] + np.searchsorted(sv, v, side="left") + 1
        return pd.DataFrame({id_col: g[id_col].to_numpy(np.int64),
                             "value_rank": rank.astype(np.int64)})

    return keyed.groupby("bucket").map_groups(kernel,
                                              batch_format="pandas")


_BLOOM_BITS_DEFAULT = 1 << 20


def bloom_semi_join(left: ray.data.Dataset, right_keys: ray.data.Dataset,
                    on: str, right_on: str | None = None,
                    anti: bool = False, num_bits: int = _BLOOM_BITS_DEFAULT,
                    num_hashes: int = 4,
                    join_partitions: int = 32) -> ray.data.Dataset:
    """EXACT semi-join (``anti=False``: keep left rows whose key IS in
    ``right_keys``; ``anti=True``: keep rows whose key is NOT) with a
    Bloom-filter prefilter so the expensive exchange only carries the
    rows the filter cannot decide.

    Why: a broadcast semi-join needs the whole right key set on every
    worker (decontaminate's shape — valid only when that set is
    benchmark-bounded), and a shuffle semi-join exchanges EVERY left
    row.  A Bloom filter of the right keys is ``num_bits/8`` bytes no
    matter how many keys it holds; bloom-NEGATIVE left rows are
    certainly absent and never enter the exchange, so the
    hash-partitioned verify join (which makes the result exact — no
    false positives survive) touches only the candidate fraction
    (true matches + the ~(1-e^{-kn/m})^k false-positive rate).

    Build: per-batch int64-key hashing into k=``num_hashes`` indexes
    (double hashing off two fnv-style mixes), one packed-bit OR-reduce
    per batch, tree-OR on the driver (num_bits/8 bytes each), one
    ``ray.put``.  Keys must be integers (hash strings first)."""
    import pyarrow.compute as pc

    from .joins import shuffle_join
    right_on = right_on or on

    def _hash_idx(k: np.ndarray):
        # two independent 64-bit mixes -> k double-hashed bit indexes
        x = k.astype(np.uint64)
        h1 = (x * np.uint64(0x9E3779B97F4A7C15))
        h1 ^= h1 >> np.uint64(29)
        h1 *= np.uint64(0xBF58476D1CE4E5B9)
        h1 ^= h1 >> np.uint64(32)
        h2 = (x * np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
        h2 ^= h2 >> np.uint64(31)
        return h1, h2

    def build_partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(num_bits // 8, np.uint8)
        k = t[right_on].to_numpy(zero_copy_only=False).astype(np.int64)
        h1, h2 = _hash_idx(k)
        for i in range(num_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            np.bitwise_or.at(bits, (idx >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
        return pa.table({"bloom": pa.array([bits.tobytes()],
                                           pa.binary())})

    parts = right_keys.select_columns([right_on]) \
        .map_batches(build_partial, batch_format="pyarrow").to_pandas()
    bloom = np.zeros(num_bits // 8, np.uint8)
    if "bloom" in parts.columns:
        for b in parts["bloom"]:
            bloom |= np.frombuffer(b, np.uint8)
    if not bloom.any():                     # empty right side
        return left if anti else left.limit(0)
    bloom_ref = ray.put(bloom)

    def probe(t: pa.Table, ref=None) -> pa.Table:
        bl = ray.get(ref)
        k = t[on].to_numpy(zero_copy_only=False).astype(np.int64)
        h1, h2 = _hash_idx(k)
        maybe = np.ones(len(k), bool)
        for i in range(num_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(num_bits)
            maybe &= (bl[(idx >> np.uint64(3)).astype(np.int64)]
                      >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
        return t.append_column("_maybe",
                               pa.array(maybe.astype(np.int8)))

    probed = left.map_batches(probe, fn_kwargs={"ref": bloom_ref},
                              batch_format="pyarrow").materialize()

    def _take(val: int):
        def f(t: pa.Table) -> pa.Table:
            m = pc.equal(t["_maybe"], np.int8(val))
            return t.filter(m).drop_columns(["_maybe"])
        return f

    certain_out = probed.map_batches(_take(0), batch_format="pyarrow")
    candidates = probed.map_batches(_take(1), batch_format="pyarrow")
    # exact verify on candidates only: distinct right keys, inner join
    def distinct_keys(t: pa.Table) -> pa.Table:
        u = np.unique(t[right_on].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({on: pa.array(u, pa.int64()),
                         "_hit": pa.array(np.ones(len(u), np.int8))})

    rk = right_keys.select_columns([right_on]) \
        .map_batches(distinct_keys, batch_format="pyarrow") \
        .groupby(on).max("_hit")
    joined = shuffle_join(candidates, rk, on=on, join_type="left_outer",
                          num_partitions=join_partitions)
    want = 0 if anti else 1

    def cut(t: pa.Table) -> pa.Table:
        if "max(_hit)" not in t.column_names:  # schema-less empty
            return t
        hit = pc.fill_null(t["max(_hit)"], 0)
        keep = pc.equal(pc.cast(hit, pa.int8()), np.int8(want))
        return t.filter(keep).drop_columns(["max(_hit)"])

    verified = joined.map_batches(cut, batch_format="pyarrow")
    return verified.union(certain_out) if anti else verified


def group_median(ds: ray.data.Dataset, group_col: str, value_col: str,
                 n_buckets: int = 256, q_num: int = 1,
                 q_den: int = 2) -> pd.DataFrame:
    """(group, n, median): exact per-group ``quantile_disc(q)`` for
    the rational ``q = q_num/q_den`` (default the median) — the
    element at 0-based index ``ceil(q * n) - 1`` of the group's
    sorted values (DuckDB's discrete-quantile rule, pinned by
    ``value_quantiles``; the rational fraction keeps the index
    integer-exact) — without sorting or materializing any group.

    Two passes over (group, value-bucket) cells: pass 1 reduces to
    per-cell counts (groups x B ints on the driver — the
    ``stratified_sample`` driver bound); the driver locates each
    group's target bucket + within-bucket offset by an O(B) prefix
    walk; pass 2 revisits ONLY the target cells (one filtered
    map_groups over ~|groups| cells) and picks the offset element of
    the cell's sorted values.  Groups may be arbitrarily LARGE (a
    group never materializes in one task — only one value-range cell
    of it does); NULL groups rank under the empty string."""
    if not (0 < q_num <= q_den):
        raise ValueError(f"quantile must be in (0, 1]: {q_num}/{q_den}")
    narrow = ds.select_columns([group_col, value_col])
    bw = _value_bounds(narrow, value_col, n_buckets)
    if bw is None:
        return pd.DataFrame({"group": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "median": pd.Series([], dtype=np.float64)})
    lo, width = bw

    def with_bucket(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        b = _bucket_arr(v, lo, width, n_buckets, "group_median")
        g = t[group_col].to_pandas().fillna("").to_numpy(object)
        return pa.table({"g": pa.array(g, pa.string()),
                         "v": pa.array(v), "bucket": pa.array(b)})

    keyed = narrow.map_batches(with_bucket,
                               batch_format="pyarrow").materialize()
    cells = keyed.groupby(["g", "bucket"]).count().to_pandas()
    groups = np.sort(cells["g"].unique())
    gi = {g: i for i, g in enumerate(groups)}
    mat = np.zeros((len(groups), n_buckets), np.int64)
    mat[cells["g"].map(gi).to_numpy(np.int64),
        cells["bucket"].to_numpy(np.int64)] = \
        cells["count()"].to_numpy(np.int64)
    n_g = mat.sum(axis=1)
    target = -(-(q_num * n_g) // q_den) - 1   # ceil(q*n) - 1, 0-based
    csum = np.cumsum(mat, axis=1)
    excl = csum - mat
    # per group: first bucket whose cumulative count exceeds target
    tb = np.argmax(csum > target[:, None], axis=1)
    offset = target - excl[np.arange(len(groups)), tb]
    want = {(g, int(tb[i])): int(offset[i])
            for i, g in enumerate(groups)}
    want_ref = ray.put(want)

    def pick(g: pd.DataFrame, ref=None) -> pa.Table:
        w = ray.get(ref)
        key = (g["g"].iloc[0], int(g["bucket"].iloc[0]))
        off = w.get(key)
        if off is None:                     # not a target cell
            return pa.table({"group": pa.array([], pa.string()),
                             "median": pa.array([], pa.float64())})
        sv = np.sort(g["v"].to_numpy(np.float64))
        return pa.table({"group": pa.array([key[0]], pa.string()),
                         "median": pa.array([float(sv[off])],
                                            pa.float64())})

    med = keyed.groupby(["g", "bucket"]).map_groups(
        pick, fn_kwargs={"ref": want_ref},
        batch_format="pandas").to_pandas()
    out = pd.DataFrame({"group": groups, "n": n_g})
    med = med.set_index("group")["median"]
    out["median"] = out["group"].map(med).astype(np.float64)
    return out.sort_values("group").reset_index(drop=True)


__all__ = ["pivot_counts", "global_rank", "bloom_semi_join",
           "group_median", "group_rank", "global_order",
           "pivot_sum_cents", "dup_cluster_hist"]


def group_rank(ds: ray.data.Dataset, id_col: str, group_col: str,
               value_col: str, n_buckets: int = 256) -> ray.data.Dataset:
    """(id, group, value_rank): SQL ``rank() OVER (PARTITION BY group
    ORDER BY value)`` — within each group, 1 + the number of group
    rows with a strictly smaller value — without sorting or
    materializing any group (the windowed sibling of ``global_rank``,
    sharing ``group_median``'s (group, value-bucket) cell machinery).

    Pass 1 reduces to per-cell counts (groups x B ints on the driver,
    turned into per-group exclusive prefixes); pass 2 shuffles the
    narrow rows once by (group, bucket) and ranks each cell with one
    vectorized searchsorted seeded by its group-prefix.  Equal values
    share a bucket, so tie ranks are exact across the whole group.
    NULL groups rank together under the empty-string sentinel; NULL
    values are refused."""
    narrow = ds.select_columns([id_col, group_col, value_col])
    bw = _value_bounds(narrow, value_col, n_buckets)
    if bw is None:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            group_col: pa.array([], pa.string()),
            "value_rank": pa.array([], pa.int64())}))
    lo, width = bw

    def with_bucket(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        b = _bucket_arr(v, lo, width, n_buckets, "group_rank")
        g = t[group_col].to_pandas().fillna("").to_numpy(object)
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "g": pa.array(g, pa.string()),
                         "v": pa.array(v), "bucket": pa.array(b)})

    keyed = narrow.map_batches(with_bucket,
                               batch_format="pyarrow").materialize()
    cells = keyed.groupby(["g", "bucket"]).count().to_pandas()
    groups = np.sort(cells["g"].unique())
    gi = {g: i for i, g in enumerate(groups)}
    mat = np.zeros((len(groups), n_buckets), np.int64)
    mat[cells["g"].map(gi).to_numpy(np.int64),
        cells["bucket"].to_numpy(np.int64)] = \
        cells["count()"].to_numpy(np.int64)
    base = np.cumsum(mat, axis=1) - mat       # exclusive prefix
    state_ref = ray.put((gi, base))

    def kernel(g: pd.DataFrame, ref=None) -> pa.Table:
        gi_w, base_w = ray.get(ref)
        row = gi_w[g["g"].iloc[0]]
        b = int(g["bucket"].iloc[0])
        v = g["v"].to_numpy(np.float64)
        sv = np.sort(v)
        rank = base_w[row, b] + np.searchsorted(sv, v, side="left") + 1
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy(np.int64)),
            group_col: pa.array(g["g"].to_numpy(object), pa.string()),
            "value_rank": pa.array(rank.astype(np.int64))})

    return keyed.groupby(["g", "bucket"]).map_groups(
        kernel, fn_kwargs={"ref": state_ref}, batch_format="pandas")


def global_order(ds: ray.data.Dataset, id_col: str, value_col: str,
                 method: str = "row_number",
                 n_buckets: int = 256) -> ray.data.Dataset:
    """The other two SQL value-order windows, same two-pass bucket
    machinery as ``global_rank``:

    - ``method="dense_rank"`` -> (id, dense_rank): 1 + the number of
      DISTINCT values strictly smaller (no rank gaps after ties).
    - ``method="row_number"`` -> (id, row_num): position under the
      deterministic total order ``(value, id)`` — SQL
      ``row_number() OVER (ORDER BY value, id)``.

    Pass 1 reduces each value-range bucket to (n_rows, n_distinct)
    (B-row driver table, O(B) exclusive prefixes — dense ranks need
    the DISTINCT prefix, row numbers the row prefix); pass 2 ranks
    within each bucket with one vectorized unique/lexsort.  Equal
    values share a bucket, so both orders are exact corpus-wide."""
    if method not in ("dense_rank", "row_number"):
        raise ValueError(f"unknown method {method!r}")
    out_col = "dense_rank" if method == "dense_rank" else "row_num"
    narrow = ds.select_columns([id_col, value_col])
    bw = _value_bounds(narrow, value_col, n_buckets)
    if bw is None:
        return ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            out_col: pa.array([], pa.int64())}))
    lo, width = bw

    def with_bucket(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        b = _bucket_arr(v, lo, width, n_buckets, "global_order")
        return pa.table({id_col: t[id_col].cast(pa.int64()),
                         "v": pa.array(v), "bucket": pa.array(b)})

    keyed = narrow.map_batches(with_bucket,
                               batch_format="pyarrow").materialize()

    def stats(g: pd.DataFrame) -> pa.Table:
        v = g["v"].to_numpy(np.float64)
        return pa.table({
            "bucket": pa.array([int(g["bucket"].iloc[0])], pa.int64()),
            "n_rows": pa.array([len(v)], pa.int64()),
            "n_distinct": pa.array([len(np.unique(v))], pa.int64())})

    st = keyed.groupby("bucket").map_groups(
        stats, batch_format="pandas").to_pandas()
    rows = np.zeros(n_buckets, np.int64)
    dist = np.zeros(n_buckets, np.int64)
    bi = st["bucket"].to_numpy(np.int64)
    rows[bi] = st["n_rows"].to_numpy(np.int64)
    dist[bi] = st["n_distinct"].to_numpy(np.int64)
    base_rows = np.concatenate(([0], np.cumsum(rows)))[:-1]
    base_dist = np.concatenate(([0], np.cumsum(dist)))[:-1]
    base_ref = ray.put((base_rows, base_dist))

    def kernel(g: pd.DataFrame, ref=None) -> pa.Table:
        br, bd = ray.get(ref)
        b = int(g["bucket"].iloc[0])
        v = g["v"].to_numpy(np.float64)
        ids = g[id_col].to_numpy(np.int64)
        if method == "dense_rank":
            uniq = np.unique(v)
            out = bd[b] + np.searchsorted(uniq, v) + 1
        else:
            o = np.lexsort((ids, v))
            inv = np.empty(len(o), np.int64)
            inv[o] = np.arange(len(o), dtype=np.int64)
            out = br[b] + inv + 1
        return pa.table({id_col: pa.array(ids),
                         out_col: pa.array(out.astype(np.int64))})

    return keyed.groupby("bucket").map_groups(
        kernel, fn_kwargs={"ref": base_ref}, batch_format="pandas")


def pivot_sum_cents(ds: ray.data.Dataset, row_col: str, col_col: str,
                    col_values: list[str], val_col: str,
                    other_name: str = "other") -> pd.DataFrame:
    """Weighted pivot: like ``pivot_counts`` but each cell is the SUM
    of ``val_col`` in integer cents (``floor(x * 100 + 0.5)`` per row
    — the repo's exact-money rule shared with nation_revenue /
    pricing_summary, so the wide table is bit-stable under any
    partitioning and SQL-checkable with no float boundary).  Output
    columns ``c_<v>`` per declared column value, ``c_<other_name>``,
    and ``c_total``; NULL row values group under ''; NULL column
    values fold into other; NULL vals count as 0 cents (SQL
    ``sum(coalesce(...))``).

    Same 100-TB shape as ``pivot_counts``: per-batch Arrow combiner
    -> native (row, col) groupby-sum -> report-sized widening."""

    def partial(t: pa.Table) -> pa.Table:
        r = t[row_col].to_pandas().fillna("").to_numpy(object)
        c = t[col_col].to_pandas().fillna("").to_numpy(object)
        x = t[val_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cents = np.floor(np.nan_to_num(x) * 100.0 + 0.5) \
            .astype(np.int64)
        pdf = pd.DataFrame({"r": r, "c": c, "cnt": cents})
        pdf["c"] = np.where(pdf["c"].isin(col_values), pdf["c"],
                            "\x00other")
        agg = pdf.groupby(["r", "c"], sort=False)["cnt"].sum() \
            .reset_index()
        agg["cnt"] = agg["cnt"].astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False)

    comb = ds.select_columns([row_col, col_col, val_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["r", "c"]).sum("cnt").to_pandas()
    cols = [f"c_{v}" for v in col_values] + [f"c_{other_name}"]
    if not len(comb) or "r" not in comb.columns:
        out = pd.DataFrame({row_col: pd.Series([], dtype=object)})
        for c in cols + ["c_total"]:
            out[c] = pd.Series([], dtype=np.int64)
        return out
    rows = np.sort(comb["r"].unique())
    mat = np.zeros((len(rows), len(cols)), np.int64)
    ci = {v: i for i, v in enumerate(col_values)}
    ri = np.searchsorted(rows, comb["r"].to_numpy(object))
    cj = np.array([ci.get(c, len(cols) - 1)
                   for c in comb["c"].to_numpy(object)], np.int64)
    np.add.at(mat, (ri, cj), comb["sum(cnt)"].to_numpy(np.int64))
    out = pd.DataFrame({row_col: rows})
    for j, c in enumerate(cols):
        out[c] = mat[:, j]
    out["c_total"] = mat.sum(axis=1)
    return out.reset_index(drop=True)


def dup_cluster_hist(ds: ray.data.Dataset, text_col: str = "text",
                     n_buckets: int = 256) -> pd.DataFrame:
    """(cluster_size, n_clusters): the exact-duplicate cluster-size
    histogram — how many distinct texts occur once, twice, ... — the
    one-line dedup health report run before and after a curation pass
    (reference analogue: none; the counting inverse of
    ``stages/dedup.exact_dedup_first``).

    Scale shape: each batch hashes its unique texts once to a 128-bit
    md5 (collision-equivalent to grouping by the text itself; NULL
    text gets its own sentinel cluster) and ships 16 B (h_lo, h_hi)
    rows; clusters resolve inside hash buckets (bucket = f(h_lo), so
    every copy of a text lands in one bucket task) into per-bucket
    (size, n) partials; a size-keyed groupby-sum reduces those to the
    histogram — the driver holds only the (distinct sizes)-row
    report.  Text never enters an exchange."""
    import hashlib
    import struct

    def hash_rows(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        cache: dict = {}
        lo = np.empty(len(texts), np.int64)
        hi = np.empty(len(texts), np.int64)
        for i, s in enumerate(texts):
            k = "\x00null" if s is None else s
            h = cache.get(k)
            if h is None:
                d = hashlib.md5(k.encode()).digest()
                h = struct.unpack("<qq", d)
                cache[k] = h
            lo[i], hi[i] = h
        return pa.table({
            "h_lo": pa.array(lo), "h_hi": pa.array(hi),
            "bucket": pa.array((lo & (n_buckets - 1)).astype(np.int64))})

    def bucket_sizes(g: pd.DataFrame) -> pa.Table:
        lo = g["h_lo"].to_numpy(np.int64)
        hi = g["h_hi"].to_numpy(np.int64)
        o = np.lexsort((hi, lo))
        lo, hi = lo[o], hi[o]
        first = np.ones(len(lo), bool)
        first[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        sizes = np.diff(np.append(np.flatnonzero(first), len(lo)))
        uniq, cnt = np.unique(sizes, return_counts=True)
        return pa.table({"cluster_size": pa.array(uniq.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    hist = ds.select_columns([text_col]) \
        .map_batches(hash_rows, batch_format="pyarrow") \
        .groupby("bucket").map_groups(bucket_sizes,
                                      batch_format="pandas") \
        .groupby("cluster_size").sum("n").to_pandas()
    if not len(hist) or "cluster_size" not in hist.columns:
        return pd.DataFrame(
            {"cluster_size": pd.Series([], dtype=np.int64),
             "n_clusters": pd.Series([], dtype=np.int64)})
    out = pd.DataFrame({
        "cluster_size": hist["cluster_size"].to_numpy(np.int64),
        "n_clusters": hist["sum(n)"].to_numpy(np.int64)})
    return out.sort_values("cluster_size").reset_index(drop=True)

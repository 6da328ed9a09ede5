"""Deterministic splits & samples for training-data pipelines.

A 100-TB corpus is carved into train/val/test (and down-sampled) by a
pure function of each row's int64 key — no shuffle, no state, no RNG:
every worker computes the same assignment for the same row, so splits
are stable across runs, resumes and cluster sizes, and any engine
(including the DuckDB oracle) can reproduce them bit-for-bit.

Hash: ``h(k) = (((k + seed) % 2^31) * 2654435761) % 2^32`` — Knuth's
multiplicative hash (TAOCP vol. 3 §6.4, public domain constant
0x9E3779B1), with the pre-reduction mod 2^31 chosen so every
intermediate fits in a signed 64-bit integer: the SAME expression is
exact in numpy int64 and in ANSI-SQL BIGINT (DuckDB), which is what
makes the driver's value-hash oracle check possible.  Keys must be
non-negative (SQL ``%`` keeps the dividend's sign; numpy the
divisor's — they agree only for non-negative operands).

The unit interval is then cut at the cumulative split fractions:
``u = h / 2^32 in [0, 1)``; a row lands in the first split whose
cumulative bound exceeds ``u``.  A Bernoulli(p) sample is the special
case ``u < p``.  Per-row independence means a split is a pure
``map_batches`` filter — it streams, prunes at the read, and never
materializes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

_MULT = 2654435761          # 0x9E3779B1, Knuth multiplicative constant
_M31 = 2_147_483_648        # 2^31
_M32 = 4_294_967_296        # 2^32


def hash_u32(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized split hash; int64-exact (no wraparound anywhere)."""
    k = keys.astype(np.int64, copy=False)
    if k.size and k.min() < 0:
        raise ValueError("split keys must be non-negative")
    return ((k + int(seed)) % _M31) * _MULT % _M32


def split_thresholds(splits: dict[str, float]) -> list[tuple[str, int]]:
    """[(name, upper_bound_u32)] with the last bound forced to 2^32 so
    fractions that don't sum exactly to 1.0 can't orphan rows."""
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    names = list(splits)
    for i, name in enumerate(names):
        acc += splits[name]
        bound = _M32 if i == len(names) - 1 else int(acc * _M32)
        out.append((name, bound))
    return out


def assign_split_batch(batch: pa.Table, key: str, seed: int,
                       thresholds: list[tuple[str, int]]) -> pa.Table:
    h = hash_u32(batch[key].to_numpy(zero_copy_only=False), seed)
    bounds = np.array([b for _, b in thresholds], dtype=np.int64)
    idx = np.searchsorted(bounds, h, side="right")
    names = np.array([n for n, _ in thresholds], dtype=object)
    return batch.append_column("split", pa.array(names[idx], pa.string()))


def hash_split(ds: ray.data.Dataset, key: str = "doc_id",
               splits: dict[str, float] | None = None,
               seed: int = 0) -> ray.data.Dataset:
    """Append a ``split`` column; rows stream through untouched."""
    th = split_thresholds(splits or {"train": 0.8, "val": 0.1, "test": 0.1})
    return ds.map_batches(
        assign_split_batch,
        fn_kwargs={"key": key, "seed": seed, "thresholds": th},
        batch_format="pyarrow")


def split_datasets(ds: ray.data.Dataset, key: str = "doc_id",
                   splits: dict[str, float] | None = None,
                   seed: int = 0) -> dict[str, ray.data.Dataset]:
    """One filtered (lazy) Dataset per split — e.g. to ``write_parquet``
    each split to its own partition directory."""
    th = split_thresholds(splits or {"train": 0.8, "val": 0.1, "test": 0.1})
    out: dict[str, ray.data.Dataset] = {}
    lo = 0
    for name, hi in th:
        def keep(batch: pa.Table, key=key, seed=seed, lo=lo, hi=hi):
            h = hash_u32(batch[key].to_numpy(zero_copy_only=False), seed)
            return batch.filter(pa.array((h >= lo) & (h < hi)))
        out[name] = ds.map_batches(keep, batch_format="pyarrow")
        lo = hi
    return out


def bernoulli_sample(ds: ray.data.Dataset, frac: float,
                     key: str = "doc_id",
                     seed: int = 0) -> ray.data.Dataset:
    """Deterministic Bernoulli(frac) sample: keep rows with u < frac."""
    bound = int(frac * _M32)

    def keep(batch: pa.Table) -> pa.Table:
        h = hash_u32(batch[key].to_numpy(zero_copy_only=False), seed)
        return batch.filter(pa.array(h < bound))

    return ds.map_batches(keep, batch_format="pyarrow")


def quota_by_group(ds: ray.data.Dataset, group_col: str, quota: int,
                   key: str = "doc_id",
                   seed: int = 0) -> ray.data.Dataset:
    """Per-group quota sample: for each group keep the ``quota`` rows
    with the smallest ``(hash_u32(key), key)`` — the deterministic
    analogue of "at most K pages per domain" corpus balancing.

    Scale shape: a per-batch PARTIAL top-K per group first (each batch
    emits at most K rows per group it contains), so the exchange
    carries <= K x blocks rows per group instead of the full corpus;
    the exact per-group cut then runs in ``groupby().map_groups`` over
    those survivors.  Group count is assumed moderate (domains/sources,
    not unique keys); the selection is equivalent to SQL
    ``row_number() OVER (PARTITION BY group ORDER BY hv, key) <= K``.
    """

    def add_hv(batch: pa.Table) -> pa.Table:
        hv = hash_u32(batch[key].to_numpy(zero_copy_only=False), seed)
        return batch.append_column("_hv", pa.array(hv.astype(np.int64)))

    picked = topk_by_group(ds.map_batches(add_hv, batch_format="pyarrow"),
                           group_col, "_hv", quota, key=key,
                           descending=False)
    return picked.map_batches(lambda t: t.drop_columns(["_hv"]),
                              batch_format="pyarrow")


def topk_by_group(ds: ray.data.Dataset, group_col: str, order_col: str,
                  k: int, key: str = "doc_id",
                  descending: bool = True) -> ray.data.Dataset:
    """Per-group top-k by a score column ("best K docs per source"):
    SQL ``row_number() OVER (PARTITION BY group ORDER BY score DESC,
    key) <= k``, with ``key`` as the deterministic tiebreak.

    Same scale shape as ``quota_by_group``: a per-batch PARTIAL top-k
    per group cuts the exchange to <= k x blocks rows per group, then
    the exact cut runs per group over the survivors.
    """

    def local_topk(batch: pa.Table) -> pa.Table:
        # ALL columns ride along — the cut selects rows, not columns
        pdf = batch.to_pandas()
        pdf = pdf.sort_values([order_col, key],
                              ascending=[not descending, True]) \
            .groupby(group_col, sort=False).head(k)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def final_topk(pdf):
        return pdf.sort_values([order_col, key],
                               ascending=[not descending, True]).head(k)

    return (ds.map_batches(local_topk, batch_format="pyarrow")
            .groupby(group_col)
            .map_groups(final_topk, batch_format="pandas"))


# target rows per rank bucket: a group is one in-task lexsort, so cap
# its size well under worker heap (16 B/row -> ~32 MB per group)
_SHUFFLE_BUCKET_ROWS = 2_000_000


def global_shuffle_order(ds: ray.data.Dataset, key: str = "doc_id",
                         seed: int = 0,
                         n_buckets: int | None = None) -> ray.data.Dataset:
    """Deterministic global training-order shuffle: (key, shuffle_pos)
    where ``shuffle_pos`` is the row's rank under ``(hash_u32(key,
    seed), key)`` — the seeded full-corpus shuffle an epoch loader
    consumes, reproducible bit-for-bit by any engine (same hash as
    ``hash_split``, so it is exact in BIGINT SQL too).

    100-TB shape: the exchange carries 16 B ``(key, bucket)`` rows
    only (the hash is recomputed inside the rank task — it's a pure
    function of the key).  Global ranks use the two-level prefix
    pattern (A5 docid shape): ``bucket = h * n_buckets // 2^32`` is
    monotone in ``h``; ``n_buckets`` scales with the row count
    (~2M rows per bucket, floor 64) so each bucket group is one
    bounded in-task lexsort; per-batch partial bucket counts merge on
    the driver (O(n_buckets) ints) into exclusive bases — no global
    sort, no driver-side rank loop.  Keys must be unique (duplicate
    keys would get ambiguous ranks; raises if not)."""
    slim = ds.select_columns([key]).materialize()
    if n_buckets is None:
        n_buckets = max(64, -(-slim.count() // _SHUFFLE_BUCKET_ROWS))

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hash_u32(t[key].to_numpy(zero_copy_only=False), seed)
        return pa.table({key: t[key],
                         "bucket": pa.array(h * n_buckets // _M32,
                                            pa.int64())})

    bucketed = slim.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_partials(t: pa.Table) -> pa.Table:
        s = np.zeros(n_buckets, np.int64)
        np.add.at(s, t["bucket"].to_numpy(zero_copy_only=False),
                  np.int64(1))
        nz = np.flatnonzero(s)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "partial": pa.array(s[nz], pa.int64())})

    parts = bucketed.map_batches(bucket_partials,
                                 batch_format="pyarrow").to_pandas()
    totals = np.zeros(n_buckets + 1, np.int64)
    if "bucket" in parts.columns and len(parts):
        np.add.at(totals, parts["bucket"].to_numpy(dtype=np.int64),
                  parts["partial"].to_numpy(dtype=np.int64))
    bases = np.concatenate([[0], np.cumsum(totals)[:-1]])
    bases_ref = ray.put(bases)   # n_buckets scales with rows — ship
    #   via the object store, not closure capture per task

    import pandas as pd

    def rank_group(g: "pd.DataFrame") -> "pd.DataFrame":
        k = g[key].to_numpy()
        if len(np.unique(k)) != len(k):
            raise ValueError(
                f"global_shuffle_order requires unique '{key}' values")
        o = np.lexsort((k, hash_u32(k, seed)))
        pos = ray.get(bases_ref)[int(g["bucket"].iloc[0])] \
            + np.arange(len(k), dtype=np.int64)
        return pd.DataFrame({key: k[o], "shuffle_pos": pos})

    return bucketed.groupby("bucket").map_groups(
        rank_group, batch_format="pandas")


def token_budget_sample(ds: ray.data.Dataset, budget: int,
                        group_col: str = "source", key: str = "doc_id",
                        text_col: str = "text", seed: int = 0,
                        n_buckets: int = 1024) -> ray.data.Dataset:
    """Per-group token-budget carve (the LM data-mixing primitive):
    within each ``group_col`` value, documents are taken in
    deterministic hash-priority order ``(hash_u32(key, seed), key)``
    until the group's running token total reaches ``budget`` — a doc
    is kept iff the total BEFORE it is < budget (the crossing doc is
    included).  Tokens = RE2 ``\\S+`` runs, so the verdict is exact in
    SQL (window cumsum) too.

    100-TB shape (sketch + exact boundary, the KLL-recount pattern):

    1. one streaming pass stamps ``(group, key, n_tokens, h, bucket)``
       with ``bucket = h * n_buckets // 2^32`` (monotone in priority);
    2. per-batch PARTIAL (group, bucket) token sums merge on the
       driver — O(groups × n_buckets) ints, never row-proportional;
    3. cumulative bucket sums locate each group's BOUNDARY bucket
       (where the running total crosses the budget); whole buckets
       before it are kept outright, after it dropped outright;
    4. one exact pass over ONLY the boundary buckets (≈ group_rows /
       n_buckets rows per group) resolves the crossing doc set, and
       the kept boundary keys are broadcast as a sorted array;
    5. the final streaming filter keeps ``bucket < boundary`` or
       ``key ∈ boundary_keep`` — rows never shuffle.

    Driver state is O(groups × n_buckets) + boundary rows; assumes a
    moderate group count (data sources), the same assumption the
    quota/top-k samplers document.  ``group_col`` must be non-null and
    ``key`` unique (same contract as ``global_shuffle_order``; a
    duplicate key inside a boundary bucket raises — elsewhere the
    verdict is per-row-consistent anyway).  Output: (key, group,
    n_tokens)."""
    from ..functions.textstats import whitespace_token_count

    def stamp(t: pa.Table) -> pa.Table:
        if t[group_col].null_count:
            raise ValueError(
                f"token_budget_sample requires non-null '{group_col}'")
        texts = t[text_col].to_pylist()
        n = pa.array(np.fromiter(
            (whitespace_token_count(tx) if tx is not None else 0
             for tx in texts), np.int64, len(texts)))
        h = hash_u32(t[key].to_numpy(zero_copy_only=False), seed)
        return pa.table({
            key: t[key], group_col: t[group_col], "n_tokens": n,
            "bucket": pa.array(h * n_buckets // _M32, pa.int64())})

    slim = ds.select_columns([key, group_col, text_col]) \
        .map_batches(stamp, batch_format="pyarrow").materialize()

    def partials(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"g": t[group_col].to_pylist(),
                           "b": t["bucket"].to_numpy(zero_copy_only=False),
                           "n": t["n_tokens"].to_numpy(
                               zero_copy_only=False)})
        agg = df.groupby(["g", "b"], sort=False)["n"].sum().reset_index()
        return pa.table({group_col: pa.array(agg["g"], pa.string()),
                         "bucket": pa.array(agg["b"].to_numpy(np.int64)),
                         "partial": pa.array(agg["n"].to_numpy(np.int64))})

    import pandas as pd
    parts = slim.map_batches(partials, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return ray.data.from_arrow(pa.table(
            {key: pa.array([], pa.int64()),
             group_col: pa.array([], pa.string()),
             "n_tokens": pa.array([], pa.int64())}))
    sums = parts.groupby([group_col, "bucket"])["partial"].sum()
    # per group: first bucket where the cumulative total crosses the
    # budget; buckets strictly before it are kept outright
    boundary: dict[str, int] = {}       # group -> boundary bucket
    before: dict[str, int] = {}         # tokens in buckets before it
    for g, bsums in sums.groupby(level=0):
        cum = 0
        boundary[g], before[g] = n_buckets, 0   # budget never crossed
        for (_, b), v in bsums.items():
            if cum + v >= budget:
                boundary[g], before[g] = int(b), int(cum)
                break
            cum += int(v)

    def _group_boundaries(t: pa.Table) -> np.ndarray:
        """Vectorized per-row boundary-bucket lookup (factorize the
        group column once per batch, dict probe per UNIQUE group)."""
        codes, uniques = pd.factorize(
            np.asarray(t[group_col].to_pylist(), object))
        lut = np.fromiter((boundary.get(u, n_buckets) for u in uniques),
                          np.int64, len(uniques))
        return lut[codes] if len(uniques) else np.empty(0, np.int64)

    def is_boundary(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_group_boundaries(t) == b))

    bdf = slim.map_batches(is_boundary, batch_format="pyarrow") \
        .to_pandas()
    # per-GROUP sorted keep sets: membership is applied only to rows
    # sitting in their own group's boundary bucket, so a key duplicated
    # across groups can never borrow another group's keep verdict
    keep_map: dict[str, np.ndarray] = {}
    if len(bdf):
        bdf["h"] = hash_u32(bdf[key].to_numpy(), seed)
        for g, gdf in bdf.groupby(group_col, sort=False):
            k = gdf[key].to_numpy()
            if len(np.unique(k)) != len(k):
                raise ValueError(
                    f"duplicate '{key}' values in group {g!r} boundary "
                    "bucket — token_budget_sample requires unique keys")
            gdf = gdf.sort_values(["h", key], kind="mergesort")
            n = gdf["n_tokens"].to_numpy(np.int64)
            run_before = before[g] + np.cumsum(n) - n
            keep_map[g] = np.sort(gdf[key].to_numpy()[run_before < budget])
    keep_ref = ray.put(keep_map)

    def final_filter(t: pa.Table, ref=None) -> pa.Table:
        from ..stages.dedup import _sorted_member_mask
        km = ray.get(ref)
        b = t["bucket"].to_numpy(zero_copy_only=False)
        keys = t[key].to_numpy(zero_copy_only=False)
        bnd = _group_boundaries(t)
        m = b < bnd
        at_bnd = np.flatnonzero(b == bnd)
        if len(at_bnd):
            gs = np.asarray(t[group_col].to_pylist(), object)[at_bnd]
            codes, uniques = pd.factorize(gs)
            for ci, g in enumerate(uniques):
                rows = at_bnd[codes == ci]
                ks = km.get(g)
                if ks is not None and len(ks):
                    m[rows] |= _sorted_member_mask(ks, keys[rows])
        return t.filter(pa.array(m)).select([key, group_col, "n_tokens"])

    return slim.map_batches(final_filter, fn_kwargs={"ref": keep_ref},
                            batch_format="pyarrow")


def stratified_sample(ds: ray.data.Dataset, group_col: str,
                      num: int, den: int, key: str = "doc_id",
                      seed: int = 0,
                      n_buckets: int | None = None) -> ray.data.Dataset:
    """(key, group, keep): exact per-stratum sampling — within every
    group, the ``ceil(num/den * n_group)`` rows that rank FIRST under
    ``(hash_u32(key, seed), key)`` get ``keep = 1`` (SQL
    ``row_number() OVER (PARTITION BY group ORDER BY hv, key)
    <= ceil(num * n / den)``).  The fraction is a rational, so the
    boundary is integer-exact on both sides — no float cut.

    Unlike the Bernoulli ``hash_split`` (whose per-stratum yield only
    CONVERGES to the fraction), this is the exact-count stratified
    carve a data-mixing recipe needs: every stratum contributes
    precisely its quota, deterministically.

    100-TB shape: within-group ranks use the two-level prefix pattern
    of ``global_shuffle_order`` — the exchange carries (key, group,
    bucket) rows only; per-(group, bucket) partial counts merge on the
    driver into exclusive bases (O(groups x buckets) ints, the same
    driver bound ``token_budget_sample`` documents) and each
    (group, bucket) cell is one bounded in-task lexsort.  No global
    sort, no per-group materialization.  Keys must be unique and
    non-negative; uniqueness is enforced GLOBALLY (all copies of a
    key share a hash bucket, so the per-bucket check sees them even
    across strata); a null group is its own stratum
    (sentinel-mapped)."""
    if not (0 < num <= den):
        raise ValueError(f"fraction must be in (0, 1]: {num}/{den}")
    import pandas as pd
    slim = ds.select_columns([key, group_col]).materialize()
    if n_buckets is None:
        n_buckets = max(64, -(-slim.count() // _SHUFFLE_BUCKET_ROWS))

    def partials(t: pa.Table) -> pa.Table:
        h = hash_u32(t[key].to_numpy(zero_copy_only=False), seed)
        b = h * n_buckets // _M32
        g = t[group_col].to_pandas().fillna("\x00null")
        pdf = pd.DataFrame({"g": g, "bucket": b})
        agg = pdf.groupby(["g", "bucket"], sort=False).size()
        out = agg.reset_index(name="partial")
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = slim.map_batches(partials, batch_format="pyarrow") \
        .to_pandas()
    if len(parts):
        cnt = parts.groupby(["g", "bucket"], sort=True)["partial"] \
            .sum().reset_index()
    else:
        cnt = pd.DataFrame({"g": [], "bucket": [], "partial": []})
    groups = sorted(cnt["g"].unique().tolist())
    g_index = {g: i for i, g in enumerate(groups)}
    # per-(group, bucket) exclusive base within the group + per-group
    # keep quota k_g = ceil(num * n_g / den) (integer-exact)
    bases = np.zeros((len(groups), n_buckets), np.int64)
    if len(cnt):
        bases[cnt["g"].map(g_index).to_numpy(np.int64),
              cnt["bucket"].to_numpy(np.int64)] = \
            cnt["partial"].to_numpy(np.int64)
    n_g = bases.sum(axis=1)
    bases = np.cumsum(bases, axis=1) - bases       # exclusive prefix
    k_g = (num * n_g + den - 1) // den
    state_ref = ray.put((g_index, bases, k_g))

    def tag(t: pa.Table) -> pa.Table:
        h = hash_u32(t[key].to_numpy(zero_copy_only=False), seed)
        g = t[group_col].to_pandas().fillna("\x00null")
        return pa.table({key: t[key], group_col: t[group_col],
                         "_g": pa.array(g, pa.string()),
                         "bucket": pa.array(h * n_buckets // _M32,
                                            pa.int64())})

    def rank_bucket(g: pd.DataFrame, ref=None) -> pd.DataFrame:
        g_index_w, bases_w, k_w = ray.get(ref)
        # bucket = f(hash(key)), so EVERY copy of a duplicated key —
        # same stratum or not — lands in this one task: the uniqueness
        # precondition is enforced globally, not just per cell
        k_all = g[key].to_numpy()
        if len(np.unique(k_all)) != len(k_all):
            raise ValueError(
                f"stratified_sample requires unique '{key}' values")
        b = int(g["bucket"].iloc[0])
        outs = []
        for gv, sub in g.groupby("_g", sort=False):
            gi = g_index_w[gv]
            k = sub[key].to_numpy()
            o = np.lexsort((k, hash_u32(k, seed)))
            rank = bases_w[gi, b] + np.arange(len(k), dtype=np.int64)
            keep = np.zeros(len(k), np.int64)
            keep[o] = (rank < k_w[gi]).astype(np.int64)
            outs.append(pd.DataFrame(
                {key: k, group_col: sub[group_col].to_numpy(),
                 "keep": keep}))
        return pd.concat(outs, ignore_index=True)

    return slim.map_batches(tag, batch_format="pyarrow") \
        .groupby("bucket").map_groups(
            rank_bucket, fn_kwargs={"ref": state_ref},
            batch_format="pandas")

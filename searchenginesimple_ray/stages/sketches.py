"""Bounded-state summary operators over token streams: phi-heavy-
hitters via mergeable Misra-Gries summaries plus an exact second
pass, and grouped quantiles via a bounded-domain histogram combine.

The reference has no sketches at all (SURVEY.md §2.5: "no sketches,
no approximate aggregates anywhere"); this is a training-data-suite
addition.  Why a sketch when ``term_tf`` already computes exact
counts: the exact partial-count path carries O(vocab) state per block
into the combine, which is fine for a bounded index vocabulary but
not for an unbounded token stream (URLs, hashes, typos at 100 TB).
A Misra-Gries summary of capacity ``cap`` holds <= cap counters per
block NO MATTER the vocabulary, and summaries merge associatively
with total undercount <= N/(cap+1) (Misra & Gries 1982; mergeability
per Agarwal et al., PODS'12 "Mergeable Summaries").

Exactness contract: with ``cap + 1 >= den/num`` every term of true
frequency > N*num/den survives the sketch (undercount bound), so the
candidate set is a guaranteed superset of the phi-heavy terms.  The
second pass re-counts ONLY the <= cap candidates exactly (broadcast
set, vectorized membership, integer combine) and applies the integer
threshold ``count * den > total * num`` — output is therefore EXACT
(SQL-oracle-checkable), while the exchange stays at O(cap) rows per
block in both passes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _mg_compress(terms: np.ndarray, counts: np.ndarray, cap: int):
    """Reduce an exact (term, count) table to <= cap Misra-Gries
    counters: subtract the (cap+1)-th largest count from all and drop
    the non-positive (one decrement round; removes >= the excess).
    Undercount added per call is <= that pivot value."""
    if len(terms) <= cap:
        return terms, counts
    # (cap+1)-th largest in O(V) — this runs per batch
    pivot = np.partition(counts, -(cap + 1))[-(cap + 1)]
    keep = counts > pivot
    return terms[keep], counts[keep] - pivot


def heavy_hitters(ds: ray.data.Dataset, text_col: str = "text",
                  phi_num: int = 1, phi_den: int = 50,
                  cap: int | None = None) -> pd.DataFrame:
    """Exact phi-heavy-hitters of the whitespace-token stream:
    (term, n_occurrences) for every term with
    ``n_occurrences * phi_den > total_tokens * phi_num``.

    Pass 1 streams Misra-Gries summaries (<= cap counters/block) to
    the driver and merges them (sum, then one compress — the PODS'12
    merge); pass 2 broadcasts the candidate array and combines exact
    per-batch counts of candidates only.  Integer threshold — no
    float boundary cases against the DuckDB oracle.
    """
    if cap is None:
        cap = max(phi_den // max(phi_num, 1), 1)
    if cap * phi_num < phi_den:
        # cap >= den/num  =>  cap+1 > den/num  =>  superset guarantee;
        # a smaller cap silently loses true heavy hitters, so refuse
        raise ValueError(
            f"cap={cap} < phi_den/phi_num={phi_den}/{phi_num}: the "
            "Misra-Gries candidate set would not be a superset of the "
            "phi-heavy terms (exactness contract broken)")

    import pyarrow.compute as pc

    def mg_partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        toks: list[str] = []
        for t in texts:
            toks.extend(t.split())
        total = len(toks)
        if total:
            vc = pc.value_counts(pa.array(toks, pa.string()))
            # object dtype: no fixed-width padding blowup on long tokens
            terms = np.asarray(vc.field("values").to_pylist(), dtype=object)
            counts = vc.field("counts").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            terms, counts = _mg_compress(terms, counts, cap)
        else:
            terms = np.empty(0, object)
            counts = np.empty(0, np.int64)
        # one total-count row (term=None) rides along with the summary
        return pa.table({
            "term": pa.array(list(terms) + [None], pa.string()),
            "w": pa.array(np.concatenate([counts, [total]]), pa.int64()),
        })

    sel = ds.select_columns([text_col])
    part = sel.map_batches(mg_partial, batch_format="pyarrow").to_pandas()
    total = int(part.loc[part["term"].isna(), "w"].sum())
    summ = part.dropna(subset=["term"]).groupby("term", as_index=False)["w"] \
        .sum()
    cand_terms, _ = _mg_compress(summ["term"].to_numpy(),
                                 summ["w"].to_numpy().astype(np.int64), cap)
    if not len(cand_terms) or not total:
        return pd.DataFrame({"term": pd.Series([], dtype=str),
                             "n_occurrences": pd.Series([], dtype=np.int64)})
    # plain sorted python list: no numpy fixed-width padding
    cand_ref = ray.put(sorted(str(t) for t in cand_terms))

    def exact_counts(batch: pa.Table, ref=None) -> pa.Table:
        cand = ray.get(ref)
        texts = batch[text_col].to_pylist()
        toks: list[str] = []
        for t in texts:
            toks.extend(t.split())
        if toks:
            # Arrow hash membership: vectorized, variable-width strings
            idx = pc.index_in(pa.array(toks, pa.string()),
                              value_set=pa.array(cand, pa.string()))
            idx = idx.fill_null(-1).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            hit = idx >= 0
            counts = np.bincount(idx[hit], minlength=len(cand))
        else:
            counts = np.zeros(len(cand), np.int64)
        return pa.table({"term": pa.array(cand, pa.string()),
                         "c": pa.array(counts.astype(np.int64))})

    cnt = sel.map_batches(exact_counts, fn_kwargs={"ref": cand_ref},
                          batch_format="pyarrow").to_pandas() \
        .groupby("term", as_index=False)["c"].sum()
    out = cnt[cnt["c"] * phi_den > total * phi_num] \
        .rename(columns={"c": "n_occurrences"})
    out["n_occurrences"] = out["n_occurrences"].astype(np.int64)
    return out.sort_values("term").reset_index(drop=True)


def token_count_quantiles(ds: ray.data.Dataset, text_col: str = "text",
                          group_col: str = "source") -> pd.DataFrame:
    """Exact grouped quantiles of the per-doc whitespace-token count:
    (group, n_docs, min/p25/p50/p75/max of tokens), all int64.

    Distributed as a HISTOGRAM COMBINE: each batch emits per-(group,
    value) counts (vectorized ``\\S+`` match counting, Arrow group_by),
    so the exchange carries one row per distinct (group, token_count)
    — bounded by the max document length, NOT the corpus size.  The
    driver merges the bounded histogram and walks cumulative counts.
    Quantile rule matches DuckDB ``quantile_disc`` (= SQL
    percentile_disc): smallest value whose cumulative count reaches
    ``ceil(q*n)``.  Quartiles only — 0.25/0.5/0.75 are binary-exact
    doubles, so ceil(q*n) has no float boundary vs the oracle.

    Scale note: exactness relies on the value domain being bounded
    (token counts are; arbitrary doubles are not).  For unbounded
    domains the same two-pass shape would carry a mergeable KLL/
    t-digest summary instead, trading exactness for O(k) state.
    """
    import pyarrow.compute as pc

    def hist_partial(batch: pa.Table) -> pa.Table:
        n_tok = pc.count_substring_regex(batch[text_col], r"\S+")
        t = pa.table({"g": batch[group_col], "v": n_tok})
        return t.group_by(["g", "v"]).aggregate([("v", "count")]) \
            .rename_columns(["g", "v", "n"])

    part = ds.select_columns([group_col, text_col]) \
        .map_batches(hist_partial, batch_format="pyarrow").to_pandas()
    hist = part.groupby(["g", "v"], as_index=False)["n"].sum() \
        .sort_values(["g", "v"])

    rows = []
    for g, sub in hist.groupby("g", sort=True):
        v = sub["v"].to_numpy()
        cum = sub["n"].to_numpy().cumsum()
        n = int(cum[-1])
        qs = {}
        for name, q in [("p25", 0.25), ("p50", 0.5), ("p75", 0.75)]:
            k = max(int(np.ceil(q * n)), 1)        # 1-based rank
            qs[name] = int(v[np.searchsorted(cum, k)])
        rows.append({group_col: g, "n_docs": n,
                     "min_tokens": int(v[0]), **qs,
                     "max_tokens": int(v[-1])})
    out = pd.DataFrame(rows, columns=[group_col, "n_docs", "min_tokens",
                                      "p25", "p50", "p75", "max_tokens"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out


__all__ = ["heavy_hitters", "token_count_quantiles"]


def grouped_distinct_tokens(ds: ray.data.Dataset, text_col: str = "text",
                            group_col: str = "source") -> pd.DataFrame:
    """(group, n_distinct_terms): exact per-group distinct-token
    counts — SQL ``count(DISTINCT term) GROUP BY group``.

    Scale shape: each batch emits only its DISTINCT (group, term)
    pairs (a per-block dedup BEFORE any exchange), so the exchange is
    bounded by block vocabulary, not token count.  The final distinct
    runs on the combined pair table — vocab x groups bounded here;
    the documented scale path for unbounded vocabularies is
    hash-partitioning the pairs on term and summing per-partition
    distinct counts (exactly the term_df shuffle shape).
    """

    def pairs(batch: pa.Table) -> pa.Table:
        # vectorized: one polars extract_all over the whole batch,
        # explode, and a columnar distinct — no Python row loop
        import polars as pl
        df = pl.DataFrame({
            "g": pl.from_arrow(batch[group_col].combine_chunks()
                               if isinstance(batch[group_col],
                                             pa.ChunkedArray)
                               else batch[group_col]),
            "t": pl.from_arrow(batch[text_col].combine_chunks()
                               if isinstance(batch[text_col],
                                             pa.ChunkedArray)
                               else batch[text_col])
                .fill_null("").str.extract_all(r"\S+"),
        }).explode("t").drop_nulls("t").unique()
        return df.to_arrow()

    part = ds.select_columns([group_col, text_col]) \
        .map_batches(pairs, batch_format="pyarrow").to_pandas()
    out = part.drop_duplicates().groupby("g", as_index=False).size() \
        .rename(columns={"g": group_col, "size": "n_distinct_terms"})
    out["n_distinct_terms"] = out["n_distinct_terms"].astype(np.int64)
    return out.sort_values(group_col).reset_index(drop=True)


__all__.append("grouped_distinct_tokens")


# ------------------------------------------------ KLL exact quantiles

class KLLSketch:
    """KLL-style mergeable quantile sketch (Karnin-Lang-Liberty,
    FOCS'16 shape: levelled compactors, weight 2^i per level-i item,
    random-offset halving on overflow).  Per-level capacity is a flat
    ``k``, so memory is O(k log(n/k)) — the simpler MRL-style bound;
    the asymptotically tighter (2/3)^depth capacities don't matter
    here because the exact-recount pass below removes ALL dependence
    on the sketch's error: the sketch only PROPOSES rank windows.

    Determinism: offsets come from a seeded per-sketch RNG, so builds
    are reproducible block-for-block."""

    def __init__(self, k: int = 256, seed: int = 0):
        self.k = max(int(k), 8)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self.rng = np.random.RandomState(seed)

    def update(self, vals: np.ndarray) -> None:
        vals = np.asarray(vals, np.float64)
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return
        self.n += len(vals)
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        for i, lv in enumerate(other.levels):
            while len(self.levels) <= i:
                self.levels.append(np.empty(0, np.float64))
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                v = np.sort(self.levels[i])
                off = int(self.rng.randint(2))
                if len(self.levels) == i + 1:
                    self.levels.append(np.empty(0, np.float64))
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], v[off::2]])
                self.levels[i] = np.empty(0, np.float64)
            i += 1

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate(self.levels)
        w = np.concatenate(
            [np.full(len(lv), 1 << i, np.int64)
             for i, lv in enumerate(self.levels)])
        o = np.argsort(vals, kind="stable")
        return vals[o], np.cumsum(w[o])

    def value_at_rank(self, rank: int) -> float:
        """Estimated value at 1-based rank (clamped)."""
        vals, cw = self._weighted()
        if not len(vals):
            return float("nan")
        j = int(np.searchsorted(cw, max(int(rank), 1)))
        return float(vals[min(j, len(vals) - 1)])

    def est_rank(self, value: float) -> int:
        """Estimated # of items <= value."""
        vals, cw = self._weighted()
        if not len(vals):
            return 0
        j = int(np.searchsorted(vals, value, side="right"))
        return 0 if j == 0 else int(cw[j - 1])


def exact_quantiles_unbounded(ds: ray.data.Dataset, value_col: str,
                              qs: tuple[float, ...],
                              k: int = 256,
                              _initial_slack: int | None = None
                              ) -> pd.DataFrame:
    """EXACT ``quantile_disc`` (smallest value whose cumulative count
    >= ceil(q*n)) over an UNBOUNDED numeric column — the scale path
    the bounded-domain histogram of ``token_count_quantiles`` can't
    cover.  "Sketch for candidates, recount for exactness":

    1. one streaming pass builds mergeable KLL partials per block
       (O(k log n) state each), merged on the driver;
    2. each target rank gets a candidate value WINDOW from the sketch
       (rank +- slack);
    3. a second streaming pass counts, per window, the exact number of
       values below the window and the exact per-distinct-value counts
       inside it (window population is ~2*slack ranks, dup-collapsed);
    4. the exact answer is read off the cumulative walk.  If a window
       fails rank coverage (sketch error beyond slack), slack doubles
       and ONLY pass 3 re-runs — correctness never depends on the
       sketch's guarantee, termination is certain (slack >= n covers
       everything).

    NaN/null values are ignored (DuckDB quantile_disc semantics).
    Returns (q, value) sorted by q.
    """
    import pyarrow.compute as pc

    sel = ds.select_columns([value_col])

    def sketch_batch(t: pa.Table) -> pa.Table:
        import pickle
        s = KLLSketch(k=k, seed=17)
        s.update(t[value_col].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([pickle.dumps(s)],
                                            pa.binary())})

    import pickle
    parts = sel.map_batches(sketch_batch,
                            batch_format="pyarrow").to_pandas()
    sk = KLLSketch(k=k, seed=17)
    for b in parts["sketch"]:
        sk.merge(pickle.loads(b))
    n = sk.n
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=float),
                             "value": np.full(len(qs), np.nan)})
    import math
    targets = [max(1, math.ceil(q * n)) for q in qs]
    slack = _initial_slack or max(64, (4 * n) // max(sk.k, 1))

    while True:
        windows = []
        for r in targets:
            lo = -np.inf if r - slack < 1 else sk.value_at_rank(r - slack)
            hi = np.inf if r + slack > n else sk.value_at_rank(r + slack)
            windows.append((lo, hi))
        win_ref = ray.put(windows)

        def window_counts(t: pa.Table, ref=None) -> pa.Table:
            ws = ray.get(ref)
            v = t.column(0).to_numpy(zero_copy_only=False)
            v = v[~np.isnan(v)]
            widx_l, val_l, cnt_l, below_l = [], [], [], []
            for i, (lo, hi) in enumerate(ws):
                # below-window row carries an explicit FLAG, not a
                # value sentinel: real -inf data values must stay
                # distinguishable from the marker (the domain is
                # unbounded by contract)
                widx_l.append(i)
                val_l.append(0.0)
                below_l.append(True)
                cnt_l.append(int((v < lo).sum()) if lo != -np.inf else 0)
                inw = v[(v >= lo) & (v <= hi)]
                if len(inw):
                    u, c = np.unique(inw, return_counts=True)
                    widx_l.extend([i] * len(u))
                    val_l.extend(u.tolist())
                    below_l.extend([False] * len(u))
                    cnt_l.extend(c.tolist())
            return pa.table({
                "widx": pa.array(widx_l, pa.int32()),
                "below": pa.array(below_l, pa.bool_()),
                "value": pa.array(val_l, pa.float64()),
                "count": pa.array(cnt_l, pa.int64())})

        agg = sel.map_batches(window_counts, fn_kwargs={"ref": win_ref},
                              batch_format="pyarrow").to_pandas()
        agg = agg.groupby(["widx", "below", "value"],
                          as_index=False)["count"].sum()
        out_vals, covered = [], True
        for i, r in enumerate(targets):
            g = agg[agg["widx"] == i]
            below = int(g[g["below"]]["count"].sum())
            inw = g[~g["below"]].sort_values("value")
            cum = below + inw["count"].cumsum()
            hit = inw["value"].to_numpy()[(cum >= r).to_numpy()]
            if below >= r or (not len(hit) and r > below):
                covered = False       # window missed the target rank
                break
            out_vals.append(float(hit[0]))
        if covered:
            return pd.DataFrame({"q": pd.Series(qs, dtype=float),
                                 "value": out_vals})
        slack *= 2


__all__.append("KLLSketch")
__all__.append("exact_quantiles_unbounded")


# ---------------------------------------------------------- vocab build

def _vocab_df_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """One (term, partial_df) row per distinct term of this batch —
    each doc lives in exactly one batch, so per-batch distinct-doc
    counts sum to the true df."""
    import polars as pl
    s = pl.from_arrow(batch[text_col]).fill_null("")
    toks = s.str.extract_all(r"\S+")
    doc_idx = pl.DataFrame(
        {"d": pl.arange(0, len(s), eager=True), "t": toks}) \
        .explode("t").drop_nulls("t")
    dedup = doc_idx.to_arrow().group_by(["d", "t"]).aggregate([])
    return dedup.group_by("t").aggregate([("d", "count")]) \
        .rename_columns(["term", "partial_df"])


def _utf8_prefix8_u64(col) -> np.ndarray:
    """Big-endian uint64 of each string's first 8 UTF-8 bytes (zero
    padded) — a vectorized ORDER-PRESERVING COARSENING of byte-wise
    string order (if a < b byte-wise then prefix8(a) <= prefix8(b)),
    computed straight off the Arrow offsets/data buffers (no per-row
    Python)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_large_string(col.type) or pa.types.is_large_binary(
            col.type):
        off_dt = np.int64
    else:
        off_dt = np.int32
    bufs = col.buffers()
    off = np.frombuffer(bufs[1], off_dt)[col.offset: col.offset
                                         + len(col) + 1]
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None \
        else np.zeros(0, np.uint8)
    lens = np.minimum((off[1:] - off[:-1]).astype(np.int64), 8)
    m = np.zeros((len(col), 8), np.uint8)
    cols8 = np.arange(8, dtype=np.int64)
    mask = cols8[None, :] < lens[:, None]
    idx = off[:-1].astype(np.int64)[:, None] + cols8[None, :]
    m[mask] = data[idx[mask]]
    return np.ascontiguousarray(m).view(">u8").ravel()


def _vocab_rank_key_s16(df_vals: np.ndarray, term_col) -> np.ndarray:
    """16-byte sort key whose memcmp order == (df DESC, term-prefix8
    ASC): offset-binary big-endian (2^63 - df) ++ big-endian first 8
    term bytes.  The true rank order (df DESC, term ASC) REFINES this
    key's order (terms sharing df + first 8 bytes compare equal), so
    range-bucketing on it is order-consistent."""
    u_df = ((np.uint64(1) << np.uint64(63))
            - df_vals.astype(np.uint64)).astype(">u8")
    u_t8 = _utf8_prefix8_u64(term_col).astype(">u8")
    k = np.empty((len(u_df), 2), ">u8")
    k[:, 0] = u_df
    k[:, 1] = u_t8
    return np.ascontiguousarray(k).view("S16").ravel()


_VOCAB_BUCKET_ROWS = 1_000_000      # target vocab rows per rank bucket
_VOCAB_SAMPLES_PER_BUCKET = 64


def _vocab_rank_distributed(dfds: "ray.data.Dataset", n_vocab: int,
                            n_buckets: int | None = None
                            ) -> "ray.data.Dataset":
    """Distributed ROW_NUMBER() OVER (ORDER BY df DESC, term) over a
    (term, df) dataset — the TeraSort two-level-rank shape, no driver
    step scales with vocabulary:

    1. a deterministic term-hash sample (~64/bucket) comes to the
       driver; its sorted 16-byte rank keys yield ``n_buckets - 1``
       range splitters (driver holds O(n_buckets), never O(vocab));
    2. each batch stamps ``bucket = searchsorted(splitters, key)`` —
       monotone in the true (df DESC, term ASC) order because the key
       is an order-consistent coarsening (equal keys share a bucket);
    3. per-batch partial bucket counts merge into exclusive bases
       (O(n_buckets) ints on the driver);
    4. ``groupby(bucket).map_groups`` sorts each bounded bucket
       exactly and assigns ``token_id = base + arange``.
    """
    if n_buckets is None:
        n_buckets = max(16, -(-n_vocab // _VOCAB_BUCKET_ROWS))
    target = n_buckets * _VOCAB_SAMPLES_PER_BUCKET
    frac = min(1.0, target / max(1, n_vocab))
    cut = np.uint64(min(int(frac * float(2**64)), 2**64 - 1))

    def sample_keys(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            t["term"].to_pandas(), index=False,
            hash_key="se-ray-vocab-smp").to_numpy()
        sel = h <= cut
        if not sel.any():
            return pa.table({"df": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string())})
        return pa.table({"df": t["df"].filter(pa.array(sel)),
                         "term": t["term"].filter(pa.array(sel))})

    smp = dfds.map_batches(sample_keys, batch_format="pyarrow") \
        .to_pandas()
    if len(smp):
        keys = np.sort(_vocab_rank_key_s16(
            smp["df"].to_numpy(), pa.array(smp["term"], pa.string())))
        step = max(1, len(keys) // n_buckets)
        splitters = np.unique(keys[step::step])
    else:
        splitters = np.zeros(0, "S16")
    split_ref = ray.put(splitters)
    nb = len(splitters) + 1

    def stamp_bucket(t: pa.Table) -> pa.Table:
        sp = ray.get(split_ref)
        key = _vocab_rank_key_s16(
            t["df"].to_numpy(zero_copy_only=False), t["term"])
        b = np.searchsorted(sp, key, side="right") if len(sp) \
            else np.zeros(len(key), np.int64)
        return t.append_column("bucket", pa.array(b.astype(np.int64)))

    bucketed = dfds.map_batches(stamp_bucket,
                                batch_format="pyarrow").materialize()

    def bucket_partials(t: pa.Table) -> pa.Table:
        s = np.zeros(nb, np.int64)
        np.add.at(s, t["bucket"].to_numpy(zero_copy_only=False), 1)
        nz = np.flatnonzero(s)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "n": pa.array(s[nz], pa.int64())})

    totals = np.zeros(nb + 1, np.int64)
    pp = bucketed.map_batches(bucket_partials,
                              batch_format="pyarrow").to_pandas()
    if len(pp):
        np.add.at(totals, pp["bucket"].to_numpy() + 1,
                  pp["n"].to_numpy())
    bases = np.cumsum(totals)[:-1]
    bases_ref = ray.put(bases)

    def rank_group(g: "pd.DataFrame") -> "pd.DataFrame":
        srt = g.sort_values(["df", "term"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True)
        base = ray.get(bases_ref)[int(g["bucket"].iloc[0])]
        return pd.DataFrame({
            "term": srt["term"].to_numpy(),
            "token_id": base + np.arange(len(srt), dtype=np.int64),
            "df": srt["df"].to_numpy().astype(np.int64)})

    return bucketed.groupby("bucket").map_groups(
        rank_group, batch_format="pandas")


def vocab_build_ds(ds: "ray.data.Dataset", text_col: str = "text",
                   n_buckets: int | None = None) -> "ray.data.Dataset":
    """Distributed ``vocab_build``: returns the (term, token_id, df)
    table as a STREAMING dataset — rank assignment is the two-level
    sample-split shape of ``_vocab_rank_distributed`` and no driver
    step scales with vocabulary (consume with ``write_parquet``)."""
    dfds = _vocab_df_ds(ds, text_col)
    n_vocab = dfds.count()
    return _vocab_rank_distributed(dfds, n_vocab, n_buckets)


def _vocab_df_ds(ds: "ray.data.Dataset", text_col: str
                 ) -> "ray.data.Dataset":
    """(term, df) dataset: per-batch partials + ONE native
    groupby-sum exchange (bounded by block vocabulary, not tokens)."""
    import pyarrow.compute as pc

    def rename(t: pa.Table) -> pa.Table:
        dfc = [c for c in t.column_names if c != "term"][0]
        return pa.table({"term": t["term"],
                         "df": pc.cast(t[dfc], pa.int64())})

    return ds.select_columns([text_col]) \
        .map_batches(_vocab_df_partial, fn_kwargs={"text_col": text_col},
                     batch_format="pyarrow") \
        .groupby("term").sum("partial_df") \
        .map_batches(rename, batch_format="pyarrow").materialize()


def vocab_build(ds: "ray.data.Dataset", text_col: str = "text",
                driver_limit: int = 2_000_000,
                n_buckets: int | None = None) -> pd.DataFrame:
    """(term, token_id, df): frequency-ranked vocabulary over the
    whitespace-token stream — the id-assignment step of tokenizer /
    vocab training.  token_id is the 0-based rank under
    (df DESC, term ASC), i.e. ROW_NUMBER() OVER (ORDER BY df DESC,
    term) - 1: deterministic, no float anywhere.

    Scale shape: polars ``extract_all`` tokenizes each batch in one
    vectorized call, an Arrow group_by dedups (doc, term) WITHIN the
    batch, and the exchange carries one (term, partial_df) row per
    block — bounded by block vocabulary; a NATIVE groupby-sum merges
    the partials.  The rank runs on the driver below ``driver_limit``
    vocabulary rows; above it the distributed two-level sample-split
    rank of ``_vocab_rank_distributed`` assigns token ids with O(n_
    buckets) driver state (both paths pytest-asserted identical).
    Callers at true 100-TB vocabularies should use ``vocab_build_ds``
    and write the result out rather than collecting this frame."""
    dfds = _vocab_df_ds(ds, text_col)
    n_vocab = dfds.count()
    if n_vocab <= driver_limit:
        df_tab = dfds.to_pandas()
        if not len(df_tab):
            return pd.DataFrame({
                "term": pd.Series([], dtype=object),
                "token_id": pd.Series([], dtype=np.int64),
                "df": pd.Series([], dtype=np.int64)})
        df_tab = df_tab.sort_values(["df", "term"],
                                    ascending=[False, True],
                                    kind="mergesort") \
            .reset_index(drop=True)
        df_tab["token_id"] = np.arange(len(df_tab), dtype=np.int64)
        df_tab["df"] = df_tab["df"].astype(np.int64)
        out = df_tab[["term", "token_id", "df"]]
    else:
        out = _vocab_rank_distributed(dfds, n_vocab, n_buckets) \
            .to_pandas()
    return out.sort_values("term").reset_index(drop=True)


__all__ += ["vocab_build", "vocab_build_ds"]


# ----------------------------------------------------- co-occurrence

def _doc_term_distinct(batch: pa.Table, text_col: str):
    """Distinct (batch-row, \\S+ token) polars frame — the shared
    tokenization of the cooc/collocation family; keeping it in one
    place keeps pair counts and marginal counts consistent."""
    import polars as pl

    s = pl.from_arrow(batch[text_col]).fill_null("")
    return pl.DataFrame(
        {"d": pl.arange(0, len(s), eager=True),
         "t": s.str.extract_all(r"\S+")}) \
        .explode("t").drop_nulls("t").unique()


def _doc_pair_partial(batch: pa.Table, text_col: str,
                      max_doc_terms: int) -> pa.Table:
    """Per-batch distinct-(doc, term) unordered pair expansion +
    combiner — shared by ``cooc_pairs_topk`` and ``collocations``.
    Pure index arithmetic (repeat + cumsum-offset arange), no Python
    loop over docs; output one (term_a, term_b, n) row per distinct
    pair in the batch."""
    doc_term = _doc_term_distinct(batch, text_col)
    if not len(doc_term):
        return pa.table({"term_a": pa.array([], pa.string()),
                         "term_b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    # sort by (doc, term) so within-doc pairs come out a < b
    doc_term = doc_term.sort(["d", "t"])
    d = doc_term["d"].to_numpy()
    terms = doc_term["t"].to_numpy()
    # doc segment bounds
    new_doc = np.empty(len(d), dtype=bool)
    new_doc[:1] = True
    new_doc[1:] = d[1:] != d[:-1]
    starts = np.flatnonzero(new_doc)
    counts = np.diff(np.append(starts, len(d)))
    if counts.max() > max_doc_terms:
        raise ValueError(
            f"doc with {int(counts.max())} distinct terms exceeds "
            f"max_doc_terms={max_doc_terms}; raise the bound "
            "explicitly if the pair blowup is intended")
    # pair index arithmetic: for a segment [s, s+c), element at
    # local i pairs with every later local j.  a-index repeats
    # (c-1-i) times; b-indices are one arange per a, offset so it
    # starts at a+1.
    local = np.arange(len(d), dtype=np.int64) - np.repeat(
        starts, counts)
    reps = np.repeat(counts, counts) - 1 - local      # per-row b count
    a_idx = np.repeat(np.arange(len(d), dtype=np.int64), reps)
    # concatenated aranges: global position minus the cumulative
    # start of its own run, plus (a_idx + 1)
    run_starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
    pos = np.arange(int(reps.sum()), dtype=np.int64)
    b_idx = a_idx + 1 + (pos - np.repeat(run_starts, reps))
    t = pa.table({"term_a": pa.array(terms[a_idx], pa.string()),
                  "term_b": pa.array(terms[b_idx], pa.string())})
    return t.group_by(["term_a", "term_b"]).aggregate(
        [([], "count_all")]).rename_columns(
        ["term_a", "term_b", "n"])


def cooc_pairs_topk(ds: "ray.data.Dataset", text_col: str = "text",
                    k: int = 20, max_doc_terms: int = 4096) \
        -> pd.DataFrame:
    """(term_a, term_b, n_docs): the k most document-co-occurrent
    unordered token pairs (term_a < term_b; ties broken by the pair) —
    the counting core of PMI / collocation mining.

    Scale shape: per batch, docs tokenize vectorized (polars
    extract_all), dedup to distinct (doc, term) (so a pair counts once
    per doc), and the pair expansion is PURE INDEX ARITHMETIC (repeat
    + cumsum-offset arange — no Python loop over docs); each batch
    then pre-aggregates to one (pair, partial) row per distinct pair.
    The exchange is bounded by block-vocabulary^2 / 2, NOT token
    count; the documented path for vocabularies whose pair table
    exceeds the driver is pair-hash partitioning the partials (the
    term_df shuffle shape) and combining per-partition top-k with
    count cut-off certificates.  ``max_doc_terms`` bounds the O(k^2)
    per-doc blowup: a doc with more distinct terms than that raises
    loudly rather than silently exploding the exchange (at default
    4096 a single doc contributes <= 8.4M pair rows).
    """
    def partial(batch: pa.Table) -> pa.Table:
        return _doc_pair_partial(batch, text_col, max_doc_terms)

    pdf = ds.select_columns([text_col]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    agg = pdf.groupby(["term_a", "term_b"], as_index=False)["n"].sum()
    agg["n"] = agg["n"].astype(np.int64)
    agg = agg.sort_values(["n", "term_a", "term_b"],
                          ascending=[False, True, True],
                          kind="mergesort").head(k)
    return agg.rename(columns={"n": "n_docs"}) \
        .sort_values(["term_a", "term_b"]).reset_index(drop=True)


__all__.append("cooc_pairs_topk")


def distinctive_terms(ds: "ray.data.Dataset", group_col: str = "source",
                      text_col: str = "text", k: int = 10,
                      broadcast_limit: int = 2_000_000,
                      join_partitions: int = 32) -> pd.DataFrame:
    """c-TF-IDF distinctive terms per group (the BERTopic topic-label
    core): score(g, t) = tf(g, t) * floor(log2(n_groups / df(t))) with
    df = number of groups containing t — ALL integer arithmetic (the
    whole-bit log2 of ``stages/lm.surprisal_bits``), so the SQL oracle
    matches exactly.  Returns (group, rank, term, tf, score) rows for
    the top-k per group, ties (score desc, tf desc, term asc).

    100-TB shape: per-batch Arrow (group, term, count) partials, ONE
    native (group, term) groupby-sum, df reduced from that table
    (rows bounded by groups x vocab, not corpus).  Below
    ``broadcast_limit`` vocabulary rows the (term, idf_bits) model
    broadcasts as sorted arrays (one ``ray.put``, searchsorted per
    batch); above it NO driver step scales with vocabulary — the df
    table stays a dataset and a native term-hash-partitioned join
    stamps idf onto the (g, t) rows (both paths pytest-asserted
    identical).  The top-k runs per group in ``map_groups`` either
    way."""
    import pyarrow.compute as pc

    import ray as _ray

    from .lm import _flat_tokens, surprisal_bits  # noqa: F401 (kernel reuse)

    def partial(batch: pa.Table) -> pa.Table:
        flat, parents = _flat_tokens(batch, text_col)
        g = batch[group_col].take(parents)
        t = pa.table({"g": g, "t": flat})
        return t.group_by(["g", "t"]).aggregate([([], "count_all")]) \
            .rename_columns(["g", "t", "c"])

    gt = ds.select_columns([group_col, text_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["g", "t"]).sum("c").materialize()
    if not gt.count():
        return pd.DataFrame({"group": pd.Series([], dtype=object),
                             "rank": pd.Series([], dtype=np.int64),
                             "term": pd.Series([], dtype=object),
                             "tf": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.int64)})
    n_groups = int(gt.groupby("g").count().count())

    def norm_tf(batch: pa.Table) -> pa.Table:
        tf_col = [c for c in batch.column_names
                  if c not in ("g", "t")][0]
        return pa.table({"g": batch["g"], "t": batch["t"],
                         "tf": pc.cast(batch[tf_col], pa.int64())})

    gt = gt.map_batches(norm_tf, batch_format="pyarrow")
    # df(t) = distinct groups containing t, reduced from the (g, t)
    # table (one row per (g, t), so count == distinct-group count).
    # Materialized: n_vocab plus the consumer below would otherwise
    # run the vocabulary groupby shuffle twice.
    df_ds = gt.groupby("t").count().materialize()
    n_vocab = df_ds.count()

    if n_vocab <= broadcast_limit:
        # vocab-bounded driver model, broadcast once
        df_pdf = df_ds.to_pandas()
        cnt_col = [c for c in df_pdf.columns if c != "t"][0]
        terms = df_pdf["t"].to_numpy()
        order = np.argsort(terms)
        terms = terms[order]
        dfv = df_pdf[cnt_col].to_numpy()[order].astype(np.int64)
        # floor(log2(n_groups / df)) via the exact bit-length kernel:
        # surprisal_bits computes floor(log2(D / (c+1))), so pass df-1
        idf_bits = surprisal_bits(dfv - 1, n_groups)
        model = _ray.put((terms, idf_bits))

        def stamp(batch: pa.Table, ref=model) -> pa.Table:
            tv, ib = _ray.get(ref)
            t = batch["t"].to_numpy(zero_copy_only=False)
            tf = batch["tf"].to_numpy(zero_copy_only=False)
            bits = ib[np.searchsorted(tv, t)]
            return pa.table({"g": batch["g"], "t": batch["t"],
                             "tf": pa.array(tf),
                             "score": pa.array(tf * bits)})

        scored = gt.map_batches(stamp, batch_format="pyarrow")
    else:
        # vocabulary beyond broadcast: term-hash-partitioned join —
        # both sides exchange on hash(t), idf stamped partition-wise;
        # driver holds nothing vocabulary-sized
        def idf_of(batch: pa.Table) -> pa.Table:
            cnt_col = [c for c in batch.column_names if c != "t"][0]
            dfv = batch[cnt_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "t": batch["t"],
                "idf_bits": pa.array(surprisal_bits(dfv - 1, n_groups))})

        idf_ds = df_ds.map_batches(idf_of, batch_format="pyarrow")
        from .joins import shuffle_join
        joined = shuffle_join(gt, idf_ds, on="t",
                              num_partitions=join_partitions)

        def score_row(batch: pa.Table) -> pa.Table:
            tf = batch["tf"].to_numpy(zero_copy_only=False)
            bits = batch["idf_bits"].to_numpy(zero_copy_only=False)
            return pa.table({"g": batch["g"], "t": batch["t"],
                             "tf": pa.array(tf),
                             "score": pa.array(tf * bits)})

        scored = joined.map_batches(score_row, batch_format="pyarrow")

    def topk(grp: pd.DataFrame) -> pd.DataFrame:
        srt = grp.sort_values(["score", "tf", "t"],
                              ascending=[False, False, True],
                              kind="mergesort").head(k)
        return pd.DataFrame({
            "group": srt["g"].to_numpy(),
            "rank": np.arange(len(srt), dtype=np.int64),
            "term": srt["t"].to_numpy(),
            "tf": srt["tf"].to_numpy().astype(np.int64),
            "score": srt["score"].to_numpy().astype(np.int64)})

    pdf = scored.groupby("g").map_groups(topk, batch_format="pandas") \
        .to_pandas()
    return pdf.sort_values(["group", "rank"]).reset_index(drop=True)


def collocations(ds: "ray.data.Dataset", text_col: str = "text",
                 min_count: int = 5, lift_num: int = 2,
                 lift_den: int = 1, max_doc_terms: int = 4096,
                 max_vocab_broadcast: int = 50_000_000
                 ) -> pd.DataFrame:
    """Statistically-associated token pairs (collocation mining — the
    PMI-threshold step on top of the ``cooc_pairs_topk`` counting
    core): unordered pairs whose document-level lift clears a rational
    threshold,

        n_ab >= min_count  AND
        n_docs * n_ab * lift_den >= lift_num * n_a * n_b

    (lift = P(a,b) / (P(a) P(b)) >= lift_num / lift_den, cross-
    multiplied so the verdict is pure int64 — no log, no float
    boundary).  Output (term_a, term_b, n_ab, n_a, n_b) sorted by the
    pair.

    Scale shape: the pair side is the cooc partial (per-batch distinct
    (doc, term) + index-arithmetic pair expansion + per-batch
    combiner) combined by a NATIVE pair-key groupby-sum — the pair
    table never lands on the driver — and the lift verdict runs
    DISTRIBUTED inside the post-groupby map with the (vocab-bounded,
    ``max_vocab_broadcast``-guarded) marginal table broadcast once;
    the driver sees only surviving pairs.  Magnitude: n_docs * n_ab
    <= n_docs^2 -> int64 holds past 3e9 docs; past that, compare via
    Python ints on the (output-bounded) final table.
    """
    import functools

    def pair_partial(batch: pa.Table) -> pa.Table:
        return _doc_pair_partial(batch, text_col, max_doc_terms)

    def df_partial(batch: pa.Table) -> pa.Table:
        dt = _doc_term_distinct(batch, text_col)
        if not len(dt):
            return pa.table({"t": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        vc = dt["t"].value_counts()
        return pa.table({"t": pa.array(vc["t"].to_numpy(), pa.string()),
                         "c": pa.array(vc["count"].to_numpy()
                                       .astype(np.int64))})

    n_docs = int(ds.count())
    dfs = ds.select_columns([text_col]) \
        .map_batches(df_partial, batch_format="pyarrow").to_pandas()
    out_cols = ["term_a", "term_b", "n_ab", "n_a", "n_b"]
    empty = pd.DataFrame({c: pd.Series(
        [], dtype=object if c.startswith("term") else np.int64)
        for c in out_cols})
    if not len(dfs):
        return empty
    if len(dfs) > max_vocab_broadcast:
        raise ValueError(
            f"term-df partials ({len(dfs)} rows) exceed "
            f"max_vocab_broadcast={max_vocab_broadcast}; stamp "
            "marginals via a term-hash-partitioned join instead "
            "(distinctive_terms shape)")
    dfs = dfs.groupby("t", as_index=False)["c"].sum()
    vocab = dfs["t"].to_numpy().astype(object)
    counts = dfs["c"].to_numpy().astype(np.int64)
    order = np.argsort(vocab)
    marg_ref = ray.put((vocab[order].astype(str), counts[order]))

    def lift_filter(batch: pa.Table, ref=None) -> pa.Table:
        vocab, counts = ray.get(ref)
        n_ab = batch["sum(n)"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ta = batch["term_a"].to_numpy(zero_copy_only=False)
        tb = batch["term_b"].to_numpy(zero_copy_only=False)
        n_a = counts[np.searchsorted(vocab, ta)]
        n_b = counts[np.searchsorted(vocab, tb)]
        keep = (n_ab >= min_count) & (
            n_docs * n_ab * lift_den >= lift_num * n_a * n_b)
        return pa.table({
            "term_a": pa.array(ta[keep].astype(object), pa.string()),
            "term_b": pa.array(tb[keep].astype(object), pa.string()),
            "n_ab": pa.array(n_ab[keep]),
            "n_a": pa.array(n_a[keep]),
            "n_b": pa.array(n_b[keep])})

    out = ds.select_columns([text_col]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["term_a", "term_b"]).sum("n") \
        .map_batches(functools.partial(lift_filter, ref=marg_ref),
                     batch_format="pyarrow").to_pandas()
    if not len(out):
        return empty
    return out.sort_values(["term_a", "term_b"]).reset_index(drop=True)


def doc_tfidf_topk(ds: "ray.data.Dataset", id_col: str = "doc_id",
                   text_col: str = "text", k: int = 5,
                   max_vocab_broadcast: int = 50_000_000
                   ) -> "ray.data.Dataset":
    """Per-DOCUMENT top-k terms by whole-bit tf-idf (keyword
    extraction — the document-level sibling of the per-group
    ``distinctive_terms``): score(d, t) = tf(d, t) *
    floor(log2(N / df(t))), N = |docs|, df = docs containing t.
    The idf is the exact integer bit-log of ``stages/lm.
    surprisal_bits`` so the SQL oracle matches bit-for-bit.  Output
    (doc_id, rank, term, tf, score), ranks 1..k per doc under
    (score DESC, tf DESC, term ASC).

    Scale shape: PASS 1 reduces the corpus to (term, df) partials
    (per-batch distinct-(doc, term) value_counts — vocab-bounded
    exchange); the sorted (vocab, idf_bits) model broadcasts ONCE;
    PASS 2 is a pure streaming map — a document's tokens live in its
    own row, so tf, scoring AND the per-doc top-k all happen inside
    the batch with one lexsort.  No shuffle anywhere.
    """
    from .lm import _flat_tokens, surprisal_bits

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, parents = _flat_tokens(batch, text_col)
        if not len(flat):
            return pa.table({"t": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        # distinct (doc, term) inside the batch: docs are whole rows
        t = flat.to_numpy(zero_copy_only=False).astype(object)
        p = parents.to_numpy(zero_copy_only=False)
        order = np.lexsort((t, p))
        t, p = t[order], p[order]
        first = np.concatenate(([True],
                                (p[1:] != p[:-1]) | (t[1:] != t[:-1])))
        uniq, cnt = np.unique(t[first], return_counts=True)
        return pa.table({"t": pa.array(uniq, pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.select_columns([text_col]).map_batches(
        df_partial, batch_format="pyarrow").to_pandas()
    if len(parts) > max_vocab_broadcast:
        raise ValueError(
            f"df partials ({len(parts)} rows) exceed "
            f"max_vocab_broadcast={max_vocab_broadcast}; use the "
            "term-hash-partitioned join path (distinctive_terms shape)")
    dfs = parts.groupby("t", as_index=False)["c"].sum()
    n_docs = int(ds.count())
    vocab = dfs["t"].to_numpy().astype(object)
    dfv = dfs["c"].to_numpy().astype(np.int64)
    order = np.argsort(vocab)
    vocab, dfv = vocab[order], dfv[order]
    # floor(log2(N / df)) == surprisal_bits(df - 1, N)  (c+1 == df)
    idf_bits = surprisal_bits(dfv - 1, n_docs)
    model_ref = ray.put((pa.array(vocab.astype(str), pa.string()),
                         idf_bits))

    def score_topk(batch: pa.Table, ref=None) -> pa.Table:
        import pyarrow.compute as pc
        vocab_arr, idf = ray.get(ref)
        flat, parents = _flat_tokens(batch, text_col)
        ids = batch[id_col].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64())})
        if not len(flat):
            return empty
        tid = pc.index_in(flat, value_set=vocab_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        p = parents.to_numpy(zero_copy_only=False)
        order = np.lexsort((tid, p))
        tid, p = tid[order], p[order]
        first = np.concatenate(([True],
                                (p[1:] != p[:-1]) | (tid[1:] != tid[:-1])))
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(tid))
        tf = (ends - starts).astype(np.int64)
        gp, gt = p[starts], tid[starts]
        score = tf * idf[gt]
        # per-doc rank under (score desc, tf desc, term asc): terms
        # were already term-sorted within doc, lexsort is stable
        order2 = np.lexsort((-tf, -score, gp))
        gp, gt, tf, score = gp[order2], gt[order2], tf[order2], \
            score[order2]
        seg = np.concatenate(([True], gp[1:] != gp[:-1]))
        seg_start = np.maximum.accumulate(
            np.where(seg, np.arange(len(gp)), -1))
        rank = np.arange(len(gp)) - seg_start + 1
        keep = rank <= k
        return pa.table({
            id_col: pa.array(ids[gp[keep]]),
            "rank": pa.array(rank[keep].astype(np.int64)),
            "term": pc.take(vocab_arr, pa.array(gt[keep])),
            "tf": pa.array(tf[keep]),
            "score": pa.array(score[keep].astype(np.int64))})

    import functools
    return ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(score_topk, ref=model_ref),
        batch_format="pyarrow")

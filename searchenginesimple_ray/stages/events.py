"""Event-stream operators: tumbling-window aggregate, sessionization,
and as-of join over the ``events`` table.

These are the streaming/temporal operators a training-data pipeline
needs that Ray Data has no built-in for (the brief's "windowed
aggregate / as-of join" custom-operator class).  The reference engine
has no counterpart (its only event stream is the Kafka click sink,
``src/Server/WebServer.cc``); semantics here follow the standard
definitions and each operator has a DuckDB oracle in
``__ray_entry__.oracle_sql``.

Scale design (100 TB):

- ``event_window_agg`` is a PARTIAL aggregation: each Arrow batch is
  pre-aggregated to (window, type) rows inside ``map_batches``, so the
  global ``groupby`` shuffles only ``n_windows x n_types`` rows per
  block, never raw events.
- ``sessionize_events`` / ``asof_join_events`` need all of one user's
  rows co-located and time-sorted.  They hash-partition on a COARSE
  ``user_id % n_buckets`` key (one shuffle of narrow int64/float
  columns — text/props are never read) and run a fully vectorized
  kernel per bucket (lexsort + gap-diff / ``pd.merge_asof``), following
  the coarse-key pattern: per-user groups would be catastrophically
  small for ``map_groups``.  ``n_buckets`` should scale with the
  cluster so one bucket (~total/n_buckets rows) fits a worker's heap;
  user skew is bounded because a single user's events are tiny
  relative to a bucket.

Money values are carried as integer cents (``round(value * 100)``),
timestamps as int64 epoch-microseconds — every aggregate is
integer-exact, so oracle comparison is bit-stable.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _ts_us(batch: pa.Table, col: str = "ts") -> np.ndarray:
    return batch[col].cast(pa.int64()).to_numpy(zero_copy_only=False)


def _cents(batch: pa.Table, col: str = "value") -> np.ndarray:
    v = batch[col].to_numpy(zero_copy_only=False)
    # floor(x*100 + 0.5): the SAME IEEE ops as the SQL oracle — np.round
    # is half-to-even while DuckDB round() is half-away, so exact .5
    # cents (e.g. value=0.125) would diverge under either native round
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


# ------------------------------------------------- tumbling window agg

def event_window_agg(events: ray.data.Dataset,
                     window_sec: int = 3600) -> ray.data.Dataset:
    """(window_start_us, event_type) -> n_events, sum_value_cents.

    Tumbling windows of ``window_sec`` aligned to the epoch.  Partial
    per-batch combine; the global exchange carries only aggregate rows.
    """
    window_us = np.int64(window_sec) * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch)
        win = (ts // window_us) * window_us
        etype = batch["event_type"].to_numpy(zero_copy_only=False)
        cents = _cents(batch)
        # group within the batch on (win, etype)
        order = np.lexsort((win, etype))
        win, etype, cents = win[order], etype[order], cents[order]
        new = np.empty(len(win), dtype=bool)
        new[:1] = True
        new[1:] = (win[1:] != win[:-1]) | (etype[1:] != etype[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(win))
        csum = np.concatenate(([0], np.cumsum(cents)))
        return pa.table({
            "window_start_us": pa.array(win[starts], pa.int64()),
            "event_type": pa.array(etype[starts], pa.string()),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "sum_value_cents": pa.array(csum[ends] - csum[starts]),
        })

    agg = events.map_batches(partial, batch_format="pyarrow") \
        .groupby(["window_start_us", "event_type"]) \
        .sum(["n_events", "sum_value_cents"])

    def rename(batch: pa.Table) -> pa.Table:
        cols = {c: c.replace("sum(", "").replace(")", "")
                for c in batch.column_names}
        return batch.rename_columns([cols[c] for c in batch.column_names])

    return agg.map_batches(rename, batch_format="pyarrow")


# ------------------------------------------------------ sessionization

def sessionize_events(events: ray.data.Dataset, gap_sec: int = 1800,
                      n_buckets: int = 64) -> ray.data.Dataset:
    """Per-user sessions split at inactivity gaps > ``gap_sec``.

    Output: (user_id, session_idx, n_events, start_us, end_us,
    sum_value_cents); ``session_idx`` is the 0-based per-user session
    ordinal in time order.
    """
    gap_us = np.int64(gap_sec) * 1_000_000

    def with_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pa.array(_ts_us(batch)),
            "cents": pa.array(_cents(batch)),
            "bucket": pa.array((uid % n_buckets).astype(np.int32)),
        })

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        cents = g["cents"].to_numpy()
        order = np.lexsort((ts, uid))
        uid, ts, cents = uid[order], ts[order], cents[order]
        n = len(uid)
        new_sess = np.empty(n, dtype=bool)
        new_sess[:1] = True
        new_sess[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n)
        new_user = np.empty(len(starts), dtype=bool)
        new_user[:1] = True
        new_user[1:] = uid[starts[1:]] != uid[starts[:-1]]
        # per-user session ordinal: running count reset at user change
        run = np.arange(len(starts), dtype=np.int64)
        base = np.maximum.accumulate(np.where(new_user, run, 0))
        csum = np.concatenate(([0], np.cumsum(cents)))
        return pd.DataFrame({
            "user_id": uid[starts],
            "session_idx": run - base,
            "n_events": (ends - starts).astype(np.int64),
            "start_us": ts[starts],
            "end_us": ts[ends - 1],
            "sum_value_cents": csum[ends] - csum[starts],
        })

    return events.map_batches(with_bucket, batch_format="pyarrow") \
        .groupby("bucket") \
        .map_groups(kernel, batch_format="pandas")


# ----------------------------------------------------------- asof join

def asof_join_events(events: ray.data.Dataset,
                     left_type: str = "purchase",
                     right_type: str = "signup",
                     n_buckets: int = 64) -> ray.data.Dataset:
    """For each ``left_type`` event, the most recent ``right_type``
    event of the same user at or before its timestamp (ASOF backward
    join, exact matches allowed — DuckDB ``ASOF LEFT JOIN`` parity).

    Unmatched lefts get -1.  The right side is deduplicated to the max
    event_id per (user_id, ts) so tie order is deterministic.  Output:
    (event_id, user_id, ts_us, asof_event_id, asof_ts_us).
    """

    def with_bucket(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["event_type"],
                        value_set=pa.array([left_type, right_type]))
        batch = batch.filter(mask)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pa.array(_ts_us(batch)),
            "is_left": pc.equal(batch["event_type"], left_type),
            "bucket": pa.array((uid % n_buckets).astype(np.int32)),
        })

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["is_left"]].sort_values("ts_us", kind="stable")
        right = g[~g["is_left"]]
        if right.empty:
            out = left[["event_id", "user_id", "ts_us"]].copy()
            out["asof_event_id"] = np.int64(-1)
            out["asof_ts_us"] = np.int64(-1)
            return out
        right = (right.groupby(["user_id", "ts_us"], as_index=False)
                 ["event_id"].max().sort_values("ts_us", kind="stable")
                 .reset_index(drop=True))
        # merge_asof emits unmatched rows as float NaN, so never let
        # the int64 event_id round-trip through float64 (ids > 2^53
        # corrupt); carry the right ROW POSITION instead — bounded by
        # the bucket size, always float-exact
        right["_pos"] = np.arange(len(right), dtype=np.int64)
        m = pd.merge_asof(
            left[["event_id", "user_id", "ts_us"]],
            right[["user_id", "ts_us", "_pos"]],
            on="ts_us", by="user_id", direction="backward",
            allow_exact_matches=True, suffixes=("", "_r"))
        pos = m["_pos"].to_numpy()
        matched = ~np.isnan(pos)
        idx = pos[matched].astype(np.int64)
        r_ids = right["event_id"].to_numpy()
        r_ts = right["ts_us"].to_numpy()
        aid = np.full(len(m), -1, dtype=np.int64)
        ats = np.full(len(m), -1, dtype=np.int64)
        aid[matched] = r_ids[idx]
        ats[matched] = r_ts[idx]
        m["asof_event_id"] = aid
        m["asof_ts_us"] = ats
        return m[["event_id", "user_id", "ts_us",
                  "asof_event_id", "asof_ts_us"]]

    return events.map_batches(with_bucket, batch_format="pyarrow") \
        .groupby("bucket") \
        .map_groups(kernel, batch_format="pandas")


def json_props_agg(events: ray.data.Dataset, field: str = "k"):
    """Parse the JSON ``props`` column and aggregate the extracted
    integer field per event_type -> (event_type, n_events, sum_k).

    The record-parse step the reference does over its per-file JSON
    intermediates (`include/Page/Page.hpp:125-150` reduce parses the
    map output), generalized to a columnar stage: polars'
    vectorized ``str.json_decode`` parses the whole batch at native
    speed (fallback: stdlib json per row), and each batch is
    pre-aggregated to at most ``n_types`` partial rows, so the final
    combine is driver-trivial no matter the corpus size — raw events
    never shuffle.
    """
    def row_parse(props: list) -> np.ndarray:
        """Per-row fallback with try-cast semantics: malformed JSON,
        non-object values and non-integer fields degrade to NULL (NaN)
        instead of failing the batch task."""
        import json
        out = np.full(len(props), np.nan)
        for i, p in enumerate(props):
            if p is None:
                continue
            try:
                v = json.loads(p)
            except (ValueError, TypeError):
                continue
            k = v.get(field) if isinstance(v, dict) else None
            if k is None or isinstance(k, bool):
                continue
            try:
                out[i] = int(k)
            except (TypeError, ValueError):
                continue
        return out

    def partial(batch: pa.Table) -> pa.Table:
        try:
            import polars as pl
            s = pl.from_arrow(batch["props"]).str.json_decode() \
                .struct.field(field)
            if s.dtype == pl.Boolean:
                # row_parse (and the SQL oracle's string-cast) treat
                # JSON booleans as NULL; polars' Int64 cast would turn
                # true into 1, making sum_k depend on which rows share
                # a batch — keep the two paths value-identical
                ks = np.full(len(s), np.nan)
            else:
                ks = s.cast(pl.Int64) \
                    .to_numpy().astype(np.float64)   # nulls -> NaN
        except ImportError:      # pragma: no cover - polars is baked in
            ks = row_parse(batch["props"].to_pylist())
        except Exception:
            # polars raises ComputeError on ANY malformed props row,
            # failing the whole batch; degrade that batch to the
            # row-loop so malformed rows become NULL (the SQL oracle's
            # try-cast-style semantics)
            ks = row_parse(batch["props"].to_pylist())
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        uniq, inv, counts = np.unique(types, return_inverse=True,
                                      return_counts=True)
        sums = np.zeros(len(uniq), np.int64)
        # SQL semantics: count(*) counts every row, sum() skips NULLs
        ok = ~np.isnan(ks)
        np.add.at(sums, inv[ok], ks[ok].astype(np.int64))
        return pa.table({"event_type": pa.array(uniq, pa.string()),
                         "n_partial": pa.array(counts.astype(np.int64)),
                         "sum_partial": pa.array(sums)})

    pdf = events.select_columns(["event_type", "props"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    out = pdf.groupby("event_type", as_index=False).agg(
        n_events=("n_partial", "sum"), sum_k=("sum_partial", "sum"))
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_k"] = out["sum_k"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


# ------------------------------------------------------ funnel matching

def funnel_events(events: ray.data.Dataset, steps: tuple = (
        "view", "click", "purchase"), window_sec: int = 1800,
        n_buckets: int = 64) -> ray.data.Dataset:
    """First-touch funnel completion per user: the earliest greedy
    chain t1 < t2 < ... < tK where step i's event strictly follows
    step i-1's, anchored at the user's FIRST step-1 event (the
    deterministic "first-touch" semantics — t1 = min ts of step 1,
    t2 = min ts of step 2 after t1, and so on), kept iff
    ``tK - t1 <= window_sec``.  Output: (user_id, step1_us ...
    stepK_us) for completing users, timestamps as int64 epoch-us
    (bit-stable for the SQL oracle).

    100-TB shape: only rows whose type is one of the K steps enter the
    exchange, as (user_id, ts_us, step int8) — value/props/other types
    never move.  Users are co-located on a coarse ``user_id %
    n_buckets`` key (the sessionize/asof pattern) and the kernel is
    fully vectorized: per-user mins via sorted-unique searchsorted +
    ``np.minimum.at``, one pass per STEP (K passes), no per-user loop.
    """
    window_us = np.int64(window_sec) * 1_000_000
    step_idx = {s: i for i, s in enumerate(steps)}
    _missing = np.iinfo(np.int64).max

    def with_bucket(batch: pa.Table) -> pa.Table:
        types = batch["event_type"].to_numpy(zero_copy_only=False)
        st = np.full(len(types), -1, np.int8)
        for s, i in step_idx.items():      # K vectorized comparisons
            st[types == s] = i
        keep = st >= 0
        uid = batch["user_id"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "user_id": pa.array(uid),
            "ts_us": pa.array(_ts_us(batch)[keep]),
            "step": pa.array(st[keep]),
            "bucket": pa.array((uid % n_buckets).astype(np.int32))})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        st = g["step"].to_numpy()
        users = np.unique(uid)
        ui = np.searchsorted(users, uid)
        t_chain = np.full((len(steps), len(users)), _missing, np.int64)
        for k in range(len(steps)):
            m = st == k
            if k:
                # strictly after the user's step-(k-1) time (missing
                # sentinel = INT64_MAX, so incomplete users never match)
                m &= ts > t_chain[k - 1][ui]
            np.minimum.at(t_chain[k], ui[m], ts[m])
        done = (t_chain[-1] != _missing) & \
            (t_chain[-1] - t_chain[0] <= window_us)
        out = {"user_id": users[done]}
        for k in range(len(steps)):
            out[f"step{k + 1}_us"] = t_chain[k][done]
        return pd.DataFrame(out)

    return events.select_columns(["user_id", "ts", "event_type"]) \
        .map_batches(with_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kernel, batch_format="pandas")


# --------------------------------------------------------- lag deltas

def lag_deltas_events(events: ray.data.Dataset,
                      n_buckets: int = 64) -> ray.data.Dataset:
    """Per-user inter-event gap aggregate — the LAG()/LEAD() window
    primitive: for each user, gaps between consecutive events in
    (ts, event_id) order, reduced to (user_id, n_events, n_gaps,
    max_gap_us, sum_gap_us); single-event users get -1/-0 sentinels
    matching COALESCE(max(gap), -1) / COALESCE(sum(gap), 0).

    Scale shape: only (user_id, ts_us, event_id) enters the exchange
    (24 B/row), coarse user-bucket shuffle co-locates each user, and
    the kernel is ONE lexsort + vectorized diff per bucket — the same
    partitioning contract as sessionize_events (a user must fit a
    bucket; buckets scale with user count, not event count).
    """

    def with_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": pa.array(_ts_us(batch)),
            "bucket": pa.array((uid % n_buckets).astype(np.int32)),
        })

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "user_id": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "n_gaps": pd.Series([], dtype=np.int64),
                "max_gap_us": pd.Series([], dtype=np.int64),
                "sum_gap_us": pd.Series([], dtype=np.int64),
            })
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, ts = uid[order], ts[order]
        same = np.empty(len(uid), dtype=bool)
        same[:1] = False
        same[1:] = uid[1:] == uid[:-1]
        gaps = np.zeros(len(uid), np.int64)
        gaps[1:] = ts[1:] - ts[:-1]          # valid only where same[i]
        starts = np.flatnonzero(~same)
        ends = np.append(starts[1:], len(uid))
        n_ev = (ends - starts).astype(np.int64)
        # boundary rows (first of each user) masked to -1: real gaps
        # are >= 0, so the per-segment max is -1 exactly for
        # single-event users and the true max otherwise
        masked = np.where(same, gaps, np.int64(-1))
        csum = np.concatenate(([0], np.cumsum(np.where(same, gaps, 0))))
        sum_gap = csum[ends] - csum[starts]
        max_gap = np.maximum.reduceat(masked, starts)
        return pd.DataFrame({
            "user_id": uid[starts],
            "n_events": n_ev,
            "n_gaps": n_ev - 1,
            "max_gap_us": max_gap,
            "sum_gap_us": sum_gap,
        })

    return events.select_columns(["event_id", "ts", "user_id"]) \
        .map_batches(with_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kernel, batch_format="pandas")


# ------------------------------------------------- grouping-sets rollup

ROLLUP_ALL = "ALL"          # grain marker; no real event_type equals it
DAY_US = 86_400_000_000


def rollup_events(events: ray.data.Dataset) -> pd.DataFrame:
    """Multi-grain aggregate in ONE scan — SQL GROUPING SETS
    ((event_type, day), (event_type), (day), ()) over event count and
    exact cent sums.  Coarser grains use sentinel keys: event_type =
    'ALL', day_us = -1.

    Scale shape: sums are distributive, so only the FINEST grain
    (event_type x day) is ever exchanged — one partial row per
    (type, day) per block — and every coarser grain is derived from
    the combined finest table driver-side without touching the corpus
    again.  This is the canonical cube/rollup plan at 100 TB: N grains
    for the exchange cost of one.
    """

    def partial(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch)
        t = pa.table({
            "event_type": batch["event_type"],
            "day_us": pa.array((ts // DAY_US) * DAY_US),
            "cents": pa.array(_cents(batch)),
        })
        return t.group_by(["event_type", "day_us"]).aggregate(
            [("cents", "sum"), ([], "count_all")]).rename_columns(
            ["event_type", "day_us", "cents", "n"])

    part = events.select_columns(["event_type", "ts", "value"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    finest = part.groupby(["event_type", "day_us"], as_index=False) \
        .agg(n_events=("n", "sum"), sum_value_cents=("cents", "sum"))

    by_type = finest.groupby("event_type", as_index=False) \
        [["n_events", "sum_value_cents"]].sum()
    by_type["day_us"] = np.int64(-1)
    by_day = finest.groupby("day_us", as_index=False) \
        [["n_events", "sum_value_cents"]].sum()
    by_day["event_type"] = ROLLUP_ALL
    total = pd.DataFrame({
        "event_type": [ROLLUP_ALL], "day_us": [np.int64(-1)],
        "n_events": [finest["n_events"].sum()],
        "sum_value_cents": [finest["sum_value_cents"].sum()],
    })
    out = pd.concat([finest, by_type, by_day, total], ignore_index=True)
    cols = ["event_type", "day_us", "n_events", "sum_value_cents"]
    out = out[cols]
    for c in cols[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["event_type", "day_us"]) \
        .reset_index(drop=True)


# ------------------------------------------------------ retention cohorts

WEEK_US = 7 * DAY_US


def retention_cohorts(events: ray.data.Dataset,
                      n_buckets: int = 64) -> pd.DataFrame:
    """(cohort_week, weeks_since, n_users): weekly retention triangle —
    users grouped by the epoch-week of their FIRST event (the cohort);
    n_users = distinct users of that cohort active ``weeks_since``
    weeks later (0 = the cohort week itself, so every cohort's
    weeks_since=0 row equals its size).

    Scale shape: only (user_id, week) enters the exchange (16 B/row,
    pre-deduplicated per batch), the coarse user-bucket shuffle
    co-locates each user, and ONE kernel per bucket derives the
    per-user anchor (min week) AND the (cohort, delta) pairs — no
    self-join: the anchor broadcast the SQL formulation needs is free
    because the user's rows are already together.  The kernel emits
    per-bucket partial counts; buckets partition users, so partials
    sum to exact distinct-user counts.
    """

    def with_bucket(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch)
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "user_id": batch["user_id"],
            "week": pa.array(ts // WEEK_US),
            "bucket": pa.array((uid % n_buckets).astype(np.int32)),
        })
        # per-batch (user, week) dedup before the exchange
        return t.group_by(["user_id", "week", "bucket"]).aggregate([])

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy()
        wk = g["week"].to_numpy()
        order = np.lexsort((wk, uid))
        uid, wk = uid[order], wk[order]
        new_u = np.empty(len(uid), dtype=bool)
        new_u[:1] = True
        new_u[1:] = uid[1:] != uid[:-1]
        # cross-batch duplicates survive the per-batch dedup; drop them
        dup = np.zeros(len(uid), dtype=bool)
        dup[1:] = (~new_u[1:]) & (wk[1:] == wk[:-1])
        uid, wk, new_u = uid[~dup], wk[~dup], new_u[~dup]
        starts = np.flatnonzero(new_u)
        counts = np.diff(np.append(starts, len(uid)))
        cohort = np.repeat(wk[starts], counts)     # user's min week
        delta = wk - cohort
        key = pd.DataFrame({"cohort_week": cohort,
                            "weeks_since": delta})
        out = key.groupby(["cohort_week", "weeks_since"],
                          as_index=False).size() \
            .rename(columns={"size": "n_users"})
        return out

    part = events.select_columns(["user_id", "ts"]) \
        .map_batches(with_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kernel, batch_format="pandas") \
        .to_pandas()
    out = part.groupby(["cohort_week", "weeks_since"], as_index=False) \
        ["n_users"].sum()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["cohort_week", "weeks_since"]) \
        .reset_index(drop=True)


def watermark_late_events(events: ray.data.Dataset,
                          lateness_sec: int = 3600,
                          n_buckets: int = 64) -> ray.data.Dataset:
    """Streaming watermark / late-data detection as a DISTRIBUTED
    PREFIX SCAN: (event_id, ts_us, watermark_us, is_late) where
    arrival order := ``event_id`` (the stream offset),
    ``watermark_us(i) = max(ts_us[j] for j <= i) - lateness`` (the
    low-watermark rule every streaming engine applies before closing
    a window) and ``is_late = ts_us < watermark_us``.

    The running max over arrival order is the classic two-pass scan
    (Blelloch): PASS 1 reduces each contiguous event_id-range bucket
    to its max ts (one tiny groupby — B rows); the driver takes the
    EXCLUSIVE prefix max over bucket order (O(B)); PASS 2 shuffles
    rows once by bucket and runs a vectorized in-bucket cummax seeded
    with the bucket's exclusive prefix.  Only the B-row aggregate and
    one narrow (id, ts) exchange move; nothing is sequential over the
    corpus, which is how a watermark operator shards on a real
    cluster (per-partition scans + partition-offset merge)."""
    import ray as _ray

    sel = events.select_columns(["event_id", "ts"])

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"].cast(pa.int64()),
            "ts_us": pa.array(_ts_us(batch), pa.int64())})

    # bounds from the lazy projection (one streaming pass) — only the
    # bucket-keyed table is ever materialized, not a second full copy
    narrow = sel.map_batches(project, batch_format="pyarrow")
    bounds = narrow.aggregate(
        ray.data.aggregate.Min("event_id"),
        ray.data.aggregate.Max("event_id"))
    lo, hi = bounds["min(event_id)"], bounds["max(event_id)"]
    if lo is None:                          # empty input: typed frame
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array([], pa.int64()),
            "ts_us": pa.array([], pa.int64()),
            "watermark_us": pa.array([], pa.int64()),
            "is_late": pa.array([], pa.int64())}))
    # fixed bucket WIDTH (not multiply-then-divide, which overflows
    # int64 past a ~2^57 id span for sparse 64-bit stream offsets)
    width = max(-(-(int(hi) - int(lo) + 1) // n_buckets), 1)

    def with_bucket(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        b = np.minimum((eid - lo) // width, n_buckets - 1) \
            .astype(np.int32)
        return batch.append_column("bucket", pa.array(b))

    keyed = narrow.map_batches(with_bucket, batch_format="pyarrow") \
        .materialize()
    # PASS 1: per-bucket max ts (B rows to the driver)
    agg = keyed.groupby("bucket").max("ts_us").to_pandas()
    mx = np.full(n_buckets, np.iinfo(np.int64).min, np.int64)
    mx[agg["bucket"].to_numpy()] = agg["max(ts_us)"].to_numpy()
    # exclusive prefix max over bucket order
    prefix = np.empty(n_buckets, np.int64)
    prefix[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(mx[:-1], out=prefix[1:])
    prefix_ref = _ray.put(prefix)
    late_us = int(lateness_sec) * 1_000_000

    def kernel(g: pd.DataFrame, ref=prefix_ref) -> pd.DataFrame:
        pre = _ray.get(ref)
        b = int(g["bucket"].iloc[0])
        order = np.argsort(g["event_id"].to_numpy(), kind="mergesort")
        ts = g["ts_us"].to_numpy()[order]
        run = np.maximum.accumulate(ts)
        if pre[b] != np.iinfo(np.int64).min:
            run = np.maximum(run, pre[b])
        wm = run - late_us
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[order],
            "ts_us": ts,
            "watermark_us": wm,
            "is_late": (ts < wm).astype(np.int64)})

    return keyed.groupby("bucket").map_groups(kernel,
                                              batch_format="pandas")


def interval_join_events(events: ray.data.Dataset,
                         window_type: str = "purchase",
                         probe_type: str = "click",
                         lookback_sec: int = 3600,
                         n_buckets: int = 64) -> ray.data.Dataset:
    """Range (interval) join — the other custom-operator class named
    beside as-of joins: for every ``window_type`` event, count the
    same user's ``probe_type`` events with
    ``ts in [window_ts - lookback, window_ts]`` (attribution windows,
    feature lookbacks).  Returns (event_id, user_id, ts_us, n_probe).

    Shape: ONE coarse ``user_id % n_buckets`` shuffle of the two
    narrow event slices, then a vectorized interval-stab per bucket —
    probes sorted once per (bucket) with user-boundary offsets, each
    window answered by two ``np.searchsorted`` calls against its
    user's slice (no per-row loop, no quadratic join).  The standard
    distributed range-join plan: partition by equi-key, sort the probe
    side, binary-search the intervals."""

    def with_bucket(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        keep = (et == window_type) | (et == probe_type)
        sub = batch.filter(pa.array(keep))
        uid = sub["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": sub["event_id"].cast(pa.int64()),
            "user_id": sub["user_id"].cast(pa.int64()),
            "ts_us": pa.array(_ts_us(sub), pa.int64()),
            "is_window": pa.array(
                (sub["event_type"].to_numpy(zero_copy_only=False)
                 == window_type).astype(np.int8)),
            "bucket": pa.array((uid % n_buckets).astype(np.int32))})

    late_us = int(lookback_sec) * 1_000_000

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        isw = g["is_window"].to_numpy() == 1
        probes = g[~isw]
        wins = g[isw]
        if not len(wins):
            return pd.DataFrame({
                "event_id": pd.Series([], dtype=np.int64),
                "user_id": pd.Series([], dtype=np.int64),
                "ts_us": pd.Series([], dtype=np.int64),
                "n_probe": pd.Series([], dtype=np.int64)})
        pu = probes["user_id"].to_numpy()
        pt = probes["ts_us"].to_numpy()
        wu = wins["user_id"].to_numpy()
        wt = wins["ts_us"].to_numpy()

        def rank(qt: np.ndarray, queries_first: bool) -> np.ndarray:
            """#probes with (user, ts) strictly below / at-or-below
            each (wu, qt) query — ONE merge lexsort, no per-row loop
            (composite int64 keys would overflow; a merge can't)."""
            u_all = np.concatenate([pu, wu])
            t_all = np.concatenate([pt, qt])
            isq = np.concatenate([np.zeros(len(pu), np.int8),
                                  np.ones(len(wu), np.int8)])
            # queries_first=True: query sorts BEFORE an equal-(u,t)
            # probe, so the prefix counts strictly-below probes;
            # False: query sorts after, so the prefix counts <=
            tie = ((1 - isq) if queries_first else isq)
            order = np.lexsort((tie, t_all, u_all))
            probes_before = np.cumsum(1 - isq[order]) - (1 - isq[order])
            out = np.empty(len(u_all), np.int64)
            out[order] = probes_before
            return out[len(pu):]

        # [wt - lookback, wt] inclusive: (# <= wt) - (# < wt - lookback)
        hi = rank(wt, queries_first=False)
        lo = rank(wt - late_us, queries_first=True)
        return pd.DataFrame({
            "event_id": wins["event_id"].to_numpy(),
            "user_id": wu, "ts_us": wt,
            "n_probe": (hi - lo).astype(np.int64)})

    return events.map_batches(with_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kernel, batch_format="pandas")


# ---------------------------------------------- rolling ROWS window

def rolling_window_events(events: ray.data.Dataset, window_rows: int = 5,
                          n_buckets: int = 64) -> ray.data.Dataset:
    """Per-event rolling ROWS window over the last ``window_rows``
    events of the same user in (ts, event_id) order — SQL's
    ``SUM/COUNT OVER (PARTITION BY user ORDER BY ts ROWS BETWEEN W-1
    PRECEDING AND CURRENT ROW)``, the moving-average primitive for
    rate limiting / anomaly features.  Output: (event_id, user_id,
    win_n, win_sum_c) with value carried as exact integer cents.

    Scale shape: the exchange carries only (user_id, event_id, ts_us,
    cents) — 32 B/row — through the coarse user-bucket shuffle shared
    with ``sessionize_events``; the kernel is ONE lexsort + a cumsum
    difference (window start = max(user segment start, i - W + 1)),
    no per-row loop and no window materialization.
    """

    def with_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": pa.array(_ts_us(batch)),
            "cents": pa.array(_cents(batch)),
            "bucket": pa.array((uid % n_buckets).astype(np.int32)),
        })

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("event_id", "user_id",
                                           "win_n", "win_sum_c")})
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        cents = g["cents"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, eid, cents = uid[order], eid[order], cents[order]
        n = len(uid)
        new_seg = np.empty(n, dtype=bool)
        new_seg[:1] = True
        new_seg[1:] = uid[1:] != uid[:-1]
        # segment start index, broadcast to every row of the segment
        seg_start = np.maximum.accumulate(
            np.where(new_seg, np.arange(n), -1))
        idx = np.arange(n)
        start = np.maximum(seg_start, idx - (window_rows - 1))
        csum = np.concatenate(([0], np.cumsum(cents)))
        return pd.DataFrame({
            "event_id": eid,
            "user_id": uid,
            "win_n": (idx + 1 - start).astype(np.int64),
            "win_sum_c": (csum[idx + 1] - csum[start]).astype(np.int64),
        })

    return events.select_columns(["event_id", "ts", "user_id", "value"]) \
        .map_batches(with_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kernel, batch_format="pandas")


# --------------------------------------------------- value histogram

def value_histogram(events: ray.data.Dataset,
                    bin_cents: int = 1000) -> pd.DataFrame:
    """(bin, n, sum_c): fixed-width histogram over the value column —
    the classic distribution-profiling primitive (bin = cents //
    bin_cents; exact integer cents so the oracle is bit-stable;
    values are non-negative in this stream, so numpy floor-division
    and SQL integer division agree).

    Scale shape: the canonical combiner-then-tiny-reduce — each batch
    pre-aggregates to <= n_bins partial rows with one Arrow group_by
    and only those reach the driver; rows never shuffle.
    """

    def partial(batch: pa.Table) -> pa.Table:
        cents = _cents(batch)
        t = pa.table({"bin": pa.array(cents // bin_cents),
                      "cents": pa.array(cents)})
        return t.group_by("bin").aggregate(
            [("cents", "sum"), ([], "count_all")]).rename_columns(
            ["bin", "sum_c", "n"])

    parts = events.select_columns(["value"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("bin", as_index=False).agg(
        n=("n", "sum"), sum_c=("sum_c", "sum"))
    out["n"] = out["n"].astype(np.int64)
    out["sum_c"] = out["sum_c"].astype(np.int64)
    return out[["bin", "n", "sum_c"]].sort_values("bin") \
        .reset_index(drop=True)


def rolling_anomaly_counts(events: ray.data.Dataset,
                           window_rows: int = 4, mult: int = 3,
                           n_buckets: int = 64) -> ray.data.Dataset:
    """(user_id, n_events, n_anomalies): per-user count of events whose
    value exceeds ``mult`` x the mean of their PREVIOUS ``window_rows``
    events — the trailing-window anomaly flag (SQL frame ROWS BETWEEN
    W PRECEDING AND 1 PRECEDING), with the verdict as an integer
    cross-product ``cents * prev_n > mult * prev_sum`` so no float
    boundary exists.  A user's first event has an empty frame and is
    never anomalous.

    Same exchange/kernel contract as ``rolling_window_events`` (32 B
    rows, coarse user buckets, one lexsort + cumsum difference); only
    the frame shifts by one.
    """

    def with_bucket(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": pa.array(_ts_us(batch)),
            "cents": pa.array(_cents(batch)),
            "bucket": pa.array((uid % n_buckets).astype(np.int32)),
        })

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("user_id", "n_events",
                                           "n_anomalies")})
        uid = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        cents = g["cents"].to_numpy()
        order = np.lexsort((eid, ts, uid))
        uid, cents = uid[order], cents[order]
        n = len(uid)
        new_seg = np.empty(n, dtype=bool)
        new_seg[:1] = True
        new_seg[1:] = uid[1:] != uid[:-1]
        seg_start = np.maximum.accumulate(
            np.where(new_seg, np.arange(n), -1))
        idx = np.arange(n)
        # frame = [max(seg_start, i - W), i)  — excludes the current row
        start = np.maximum(seg_start, idx - window_rows)
        prev_n = idx - start
        csum = np.concatenate(([0], np.cumsum(cents)))
        prev_sum = csum[idx] - csum[start]
        anom = (prev_n > 0) & (cents * prev_n > mult * prev_sum)
        starts = np.flatnonzero(new_seg)
        ends = np.append(starts[1:], n)
        acs = np.concatenate(([0], np.cumsum(anom.astype(np.int64))))
        return pd.DataFrame({
            "user_id": uid[starts],
            "n_events": (ends - starts).astype(np.int64),
            "n_anomalies": acs[ends] - acs[starts],
        })

    return events.select_columns(["event_id", "ts", "user_id", "value"]) \
        .map_batches(with_bucket, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kernel, batch_format="pandas")

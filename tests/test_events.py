"""Event-stream temporal operators: tumbling window agg, sessionization,
as-of join (stages/events.py) — edge semantics + multi-block behavior."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

US = 1_000_000
T0 = 1_700_000_000 * US


def _events_ds(rows, n_blocks=3):
    """rows: (event_id, ts_us, user_id, event_type, value)."""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    return ray.data.from_arrow(t).repartition(n_blocks)


class TestWindowAgg:
    def test_alignment_and_exact_sums(self, ray_session):
        from searchenginesimple_ray.stages.events import event_window_agg
        h = 3600 * US
        rows = [
            (0, T0 - T0 % h, 1, "click", 1.25),        # window w0, first us
            (1, T0 - T0 % h + h - 1, 1, "click", 2.50),  # last us of w0
            (2, T0 - T0 % h + h, 1, "click", 4.00),    # first us of w1
            (3, T0 - T0 % h + h, 2, "view", 0.10),
        ]
        pdf = event_window_agg(_events_ds(rows), window_sec=3600) \
            .to_pandas().sort_values(["window_start_us", "event_type"]) \
            .reset_index(drop=True)
        w0 = T0 - T0 % h
        assert pdf.to_dict("records") == [
            {"window_start_us": w0, "event_type": "click",
             "n_events": 2, "sum_value_cents": 375},
            {"window_start_us": w0 + h, "event_type": "click",
             "n_events": 1, "sum_value_cents": 400},
            {"window_start_us": w0 + h, "event_type": "view",
             "n_events": 1, "sum_value_cents": 10},
        ]


class TestSessionize:
    def test_gap_boundary_is_exclusive(self, ray_session):
        from searchenginesimple_ray.stages.events import sessionize_events
        gap = 1800 * US
        rows = [
            (0, T0, 7, "click", 1.0),
            (1, T0 + gap, 7, "click", 2.0),       # == gap: SAME session
            (2, T0 + 2 * gap + 1, 7, "click", 4.0),  # > gap: new session
            (3, T0, 9, "click", 8.0),              # other user independent
        ]
        pdf = sessionize_events(_events_ds(rows), gap_sec=1800) \
            .to_pandas().sort_values(["user_id", "session_idx"]) \
            .reset_index(drop=True)
        assert pdf.to_dict("records") == [
            {"user_id": 7, "session_idx": 0, "n_events": 2,
             "start_us": T0, "end_us": T0 + gap, "sum_value_cents": 300},
            {"user_id": 7, "session_idx": 1, "n_events": 1,
             "start_us": T0 + 2 * gap + 1, "end_us": T0 + 2 * gap + 1,
             "sum_value_cents": 400},
            {"user_id": 9, "session_idx": 0, "n_events": 1,
             "start_us": T0, "end_us": T0, "sum_value_cents": 800},
        ]

    def test_same_bucket_users_do_not_merge(self, ray_session):
        # users 5 and 5+64 land in one coarse bucket; sessions must not mix
        from searchenginesimple_ray.stages.events import sessionize_events
        rows = [(0, T0, 5, "click", 1.0), (1, T0 + 1, 69, "click", 2.0)]
        pdf = sessionize_events(_events_ds(rows), gap_sec=1800) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        assert list(pdf["user_id"]) == [5, 69]
        assert list(pdf["n_events"]) == [1, 1]


class TestAsofJoin:
    def test_backward_exact_and_unmatched(self, ray_session):
        from searchenginesimple_ray.stages.events import asof_join_events
        rows = [
            (0, T0, 1, "signup", 0.0),
            (1, T0 + 5, 1, "purchase", 9.0),    # matches signup 0
            (2, T0 + 10, 1, "signup", 0.0),
            (3, T0 + 10, 1, "purchase", 9.0),   # exact match allowed -> 2
            (4, T0, 2, "purchase", 9.0),        # no signup -> -1
        ]
        pdf = asof_join_events(_events_ds(rows)).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert list(pdf["event_id"]) == [1, 3, 4]
        assert list(pdf["asof_event_id"]) == [0, 2, -1]
        assert list(pdf["asof_ts_us"]) == [T0, T0 + 10, -1]

    def test_right_tie_takes_max_event_id(self, ray_session):
        from searchenginesimple_ray.stages.events import asof_join_events
        rows = [
            (0, T0, 1, "signup", 0.0),
            (7, T0, 1, "signup", 0.0),   # same (user, ts): dedup to max id
            (8, T0 + 1, 1, "purchase", 9.0),
        ]
        pdf = asof_join_events(_events_ds(rows)).to_pandas()
        assert list(pdf["asof_event_id"]) == [7]


class TestOracleParity:
    """Engine vs DuckDB on the real sf0.001 events table (the driver
    runs the same comparison at sf0.01 via __ray_entry__)."""

    @pytest.mark.parametrize("name", ["event_window_agg", "sessionize",
                                      "asof_join", "json_props_agg",
                                      "funnel"])
    def test_matches_duckdb(self, ray_session, name):
        import duckdb
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "__ray_entry__", "/root/repo/__ray_entry__.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        got = m.queries()[name]("/root/testdata/sf0.001")
        con = duckdb.connect()
        con.execute("CREATE VIEW events AS SELECT * FROM "
                    "'/root/testdata/sf0.001/events.parquet'")
        want = con.execute(m.oracle_sql()[name]).df()
        cols = sorted(want.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestReviewHardening:
    """Review-found edge cases: null JSON fields, huge asof ids,
    payload-preserving quota/topk."""

    def test_json_props_null_field_matches_sql_semantics(self,
                                                         ray_session):
        import duckdb
        import ray.data

        from searchenginesimple_ray.stages.events import json_props_agg
        pdf = pd.DataFrame({
            "event_type": ["a", "a", "b", "b"],
            "props": ['{"k": 3}', "{}", '{"k": 5}', None]})
        got = json_props_agg(ray.data.from_pandas(pdf)) \
            .sort_values("event_type").reset_index(drop=True)
        want = duckdb.sql("""
            SELECT event_type, count(*) AS n_events,
                   sum(CAST(json_extract_string(props, '$.k')
                            AS BIGINT)) AS sum_k
            FROM pdf GROUP BY event_type ORDER BY event_type""").df()
        assert got["n_events"].tolist() == want["n_events"].tolist()
        assert got["sum_k"].tolist() == [int(x) for x in want["sum_k"]]

    def test_json_props_malformed_rows_degrade_to_null(self,
                                                       ray_session):
        """A malformed props JSON row must degrade to NULL (try-cast
        semantics) rather than failing the whole batch task (polars'
        json_decode raises ComputeError on any bad row)."""
        import ray.data

        from searchenginesimple_ray.stages.events import json_props_agg
        pdf = pd.DataFrame({
            "event_type": ["a", "a", "a", "b", "b"],
            "props": ['{"k": 3}', '{"k": oops', 'not json at all',
                      '{"k": 5}', '[1, 2]']})
        got = json_props_agg(ray.data.from_pandas(pdf)) \
            .sort_values("event_type").reset_index(drop=True)
        assert got["n_events"].tolist() == [3, 2]
        assert got["sum_k"].tolist() == [3, 5]

    def test_asof_ids_above_2_53_survive(self, ray_session):
        import pyarrow as pa
        import ray.data

        from searchenginesimple_ray.stages.events import asof_join_events
        big = (1 << 53) + 3       # not float64-representable
        t = pa.table({
            "event_id": pa.array([big, big + 10, 7], pa.int64()),
            "ts": pa.array([1_000_000, 500_000, 2_000_000],
                           pa.timestamp("us")),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(["purchase", "signup", "purchase"]),
            "value": pa.array([1.0, 0.0, 2.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        })
        out = asof_join_events(ray.data.from_arrow(t)).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        # both purchases match the signup with the EXACT huge id
        assert out["asof_event_id"].tolist() == [big + 10, big + 10]

    def test_cents_half_rule_matches_duckdb(self, ray_session):
        import duckdb
        import pyarrow as pa

        from searchenginesimple_ray.stages.events import _cents
        vals = [0.125, 0.135, 1.005, 2.675, 0.0, 3.505]
        got = _cents(pa.table({"value": pa.array(vals)})).tolist()
        want = [r[0] for r in duckdb.sql(
            "SELECT CAST(floor(100 * x + 0.5) AS BIGINT) FROM "
            "(SELECT unnest(?) AS x)", params=[vals]).fetchall()]
        assert got == want

    def test_quota_and_topk_keep_payload_columns(self, ray_session):
        import ray.data

        from searchenginesimple_ray.stages.sampling import (
            quota_by_group, topk_by_group)
        docs = pd.DataFrame({
            "doc_id": np.arange(100, dtype=np.int64),
            "source": (np.arange(100) % 5).astype(str),
            "text": [f"payload {i}" for i in range(100)],
            "score": np.arange(100, dtype=np.int64)})
        q = quota_by_group(ray.data.from_pandas(docs), "source", 3,
                           key="doc_id").to_pandas()
        t = topk_by_group(ray.data.from_pandas(docs), "source", "score",
                          3, key="doc_id").to_pandas()
        for out in (q, t):
            assert set(out.columns) == {"doc_id", "source", "text",
                                        "score"}
            assert out["text"].str.startswith("payload").all()


class TestFunnel:
    """First-touch funnel (stages/events.funnel_events)."""

    def _run(self, rows, window_sec=1800, steps=("view", "click",
                                                 "purchase")):
        from searchenginesimple_ray.stages.events import funnel_events
        pdf = funnel_events(_events_ds(rows), steps=steps,
                            window_sec=window_sec).to_pandas()
        if pdf.empty:    # to_pandas drops schema on empty datasets
            return pdf
        return pdf.sort_values("user_id").reset_index(drop=True)

    def test_greedy_chain_semantics(self, ray_session):
        rows = [
            # user 1 completes: view@0, click@60s, purchase@120s
            (0, T0, 1, "view", 1.0),
            (1, T0 + 60 * US, 1, "click", 1.0),
            (2, T0 + 120 * US, 1, "purchase", 1.0),
            # user 2: click BEFORE first view never counts; next click
            # after the view completes the chain
            (3, T0 + 10 * US, 2, "click", 1.0),
            (4, T0 + 20 * US, 2, "view", 1.0),
            (5, T0 + 30 * US, 2, "click", 1.0),
            (6, T0 + 40 * US, 2, "purchase", 1.0),
            # user 3: no purchase -> incomplete
            (7, T0, 3, "view", 1.0),
            (8, T0 + 5 * US, 3, "click", 1.0),
            # user 4: completes but outside the window
            (9, T0, 4, "view", 1.0),
            (10, T0 + 60 * US, 4, "click", 1.0),
            (11, T0 + 4000 * US, 4, "purchase", 1.0),
            # user 5: purchase before click never counts
            (12, T0, 5, "view", 1.0),
            (13, T0 + 10 * US, 5, "purchase", 1.0),
            (14, T0 + 20 * US, 5, "click", 1.0),
        ]
        got = self._run(rows, window_sec=1800)
        assert got["user_id"].tolist() == [1, 2]
        assert got.loc[0, ["step1_us", "step2_us", "step3_us"]] \
            .tolist() == [T0, T0 + 60 * US, T0 + 120 * US]
        assert got.loc[1, ["step1_us", "step2_us", "step3_us"]] \
            .tolist() == [T0 + 20 * US, T0 + 30 * US, T0 + 40 * US]

    def test_first_touch_is_greedy_not_optimal(self, ray_session):
        # anchored at the FIRST view: a later view would complete
        # in-window, but first-touch semantics report no completion
        rows = [
            (0, T0, 1, "view", 1.0),
            (1, T0 + 5000 * US, 1, "view", 1.0),
            (2, T0 + 5010 * US, 1, "click", 1.0),
            (3, T0 + 5020 * US, 1, "purchase", 1.0),
        ]
        assert len(self._run(rows, window_sec=1800)) == 0
        # widening the window admits the chain from the first view
        got = self._run(rows, window_sec=6000)
        assert got["step1_us"].tolist() == [T0]

    def test_two_step_funnel_and_ties(self, ray_session):
        # strict inequality: a click at EXACTLY the view ts is not
        # "after" it
        rows = [(0, T0, 1, "view", 1.0), (1, T0, 1, "click", 1.0),
                (2, T0 + US, 1, "click", 1.0)]
        got = self._run(rows, steps=("view", "click"))
        assert got["step2_us"].tolist() == [T0 + US]

    def test_empty_and_no_matching_events(self, ray_session):
        rows = [(0, T0, 1, "error", 1.0), (1, T0 + US, 1, "signup", 1.0)]
        assert len(self._run(rows)) == 0


class TestWatermarkLateEvents:
    def _brute(self, rows, lateness_us):
        """Sequential reference: running max over event_id order."""
        srt = sorted(rows, key=lambda r: r[0])
        out, run = [], -1 << 62
        for eid, ts, *_ in srt:
            run = max(run, ts)
            wm = run - lateness_us
            out.append((eid, ts, wm, int(ts < wm)))
        return pd.DataFrame(out, columns=["event_id", "ts_us",
                                          "watermark_us", "is_late"])

    def test_matches_sequential_reference(self, ray_session):
        from searchenginesimple_ray.stages.events import \
            watermark_late_events
        rng = np.random.default_rng(8)
        n = 2000
        # out-of-order stream: timestamps jitter +-3h around a ramp,
        # ids shuffled across blocks, sparse ids (range gaps)
        ids = rng.permutation(np.arange(0, 3 * n, 3, dtype=np.int64))
        ts = (T0 + np.arange(n) * 60 * US
              + rng.integers(-3 * 3600 * US, 3 * 3600 * US, n))
        rows = [(int(i), int(t), 1, "click", 1.0)
                for i, t in zip(ids, ts)]
        got = watermark_late_events(_events_ds(rows, n_blocks=7),
                                    lateness_sec=3600,
                                    n_buckets=16).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        exp = self._brute([(r[0], r[1]) + r[2:] for r in rows],
                          3600 * US)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # both classes present on this stream
        assert 0 < got["is_late"].sum() < len(got)

    def test_bucket_count_invariance_and_empty(self, ray_session):
        from searchenginesimple_ray.stages.events import \
            watermark_late_events
        rng = np.random.default_rng(4)
        rows = [(int(i), int(T0 + rng.integers(0, 10**9)), 1, "x", 0.0)
                for i in rng.permutation(200)]
        a = watermark_late_events(_events_ds(rows), lateness_sec=60,
                                  n_buckets=4).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        b = watermark_late_events(_events_ds(rows), lateness_sec=60,
                                  n_buckets=64).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        empty = watermark_late_events(_events_ds([]), lateness_sec=60)
        assert empty.count() == 0
        # typed empty: the Dataset keeps the full output schema even
        # with zero rows (to_pandas drops it — Ray returns a bare
        # frame — so check the dataset schema itself)
        assert empty.schema().names == ["event_id", "ts_us",
                                        "watermark_us", "is_late"]

    def test_sparse_64bit_id_span(self, ray_session):
        """Snowflake-style sparse ids: span ~2^60 must not overflow
        the bucket arithmetic (multiply-then-divide would)."""
        from searchenginesimple_ray.stages.events import \
            watermark_late_events
        ids = [0, 1 << 59, (1 << 60) - 3, (1 << 60) + 5]
        ts = [T0 + 3600 * US, T0, T0 + 2 * 3600 * US, T0 + US]
        rows = [(i, t, 1, "x", 0.0) for i, t in zip(ids, ts)]
        got = watermark_late_events(_events_ds(rows, n_blocks=2),
                                    lateness_sec=1800,
                                    n_buckets=16).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        exp = self._brute([(r[0], r[1]) for r in rows], 1800 * US)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


class TestIntervalJoin:
    def _brute(self, rows, lookback_us):
        purchases = [(e, u, t) for e, t, u, ty, _ in rows
                     if ty == "purchase"]
        clicks = [(u, t) for _, t, u, ty, _ in rows if ty == "click"]
        out = []
        for e, u, t in sorted(purchases):
            n = sum(1 for cu, ct in clicks
                    if cu == u and t - lookback_us <= ct <= t)
            out.append((e, u, t, n))
        return pd.DataFrame(out, columns=["event_id", "user_id",
                                          "ts_us", "n_probe"])

    def test_matches_brute_force(self, ray_session):
        from searchenginesimple_ray.stages.events import \
            interval_join_events
        rng = np.random.default_rng(6)
        n = 1500
        # half the timestamps snap to exact hour marks so interval
        # BOUNDARY collisions (ts == wt and ts == wt - lookback) are
        # common, not measure-zero
        def _ts():
            t = int(T0 + rng.integers(0, 48 * 3600 * US))
            if rng.random() < 0.5:
                t = t - t % (3600 * US)
            return t
        rows = [(int(i), _ts(), int(rng.integers(0, 40)),
                 str(rng.choice(["purchase", "click", "view"])), 0.0)
                for i in range(n)]
        got = interval_join_events(_events_ds(rows, n_blocks=6),
                                   lookback_sec=3600,
                                   n_buckets=8).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        exp = self._brute(rows, 3600 * US)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert got["n_probe"].sum() > 0          # joins actually hit

    def test_boundaries_inclusive_and_user_isolation(self, ray_session):
        from searchenginesimple_ray.stages.events import \
            interval_join_events
        L = 3600 * US
        rows = [
            (0, T0 + L, 1, "purchase", 0.0),
            (1, T0, 1, "click", 0.0),           # exactly ts - L: in
            (2, T0 + L, 1, "click", 0.0),       # exactly ts: in
            (3, T0 - 1, 1, "click", 0.0),       # one us early: out
            (4, T0 + L + 1, 1, "click", 0.0),   # one us late: out
            (5, T0 + L, 2, "click", 0.0),       # other user: out
        ]
        got = interval_join_events(_events_ds(rows),
                                   lookback_sec=3600).to_pandas()
        assert len(got) == 1 and got["n_probe"].iloc[0] == 2

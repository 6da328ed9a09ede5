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
                                      "asof_join", "json_props_agg"])
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

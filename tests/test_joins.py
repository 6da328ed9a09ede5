"""stages/joins.py: broadcast (map-side) and shuffle (reduce-side)
joins, plus the TPC-H-Q5-shaped driver entry."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


class TestBroadcastJoin:
    def test_inner_and_left(self, ray_session):
        import ray.data

        from searchenginesimple_ray.stages.joins import broadcast_join
        big = ray.data.from_pandas(pd.DataFrame({
            "k": [1, 2, 3, 3, 9], "v": [10, 20, 30, 31, 90]}))
        dim = pa.table({"j": [1, 2, 3], "name": ["a", "b", "c"]})
        inner = broadcast_join(big, dim, keys="k", right_keys="j") \
            .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
        assert inner["k"].tolist() == [1, 2, 3, 3]
        assert inner["name"].tolist() == ["a", "b", "c", "c"]
        left = broadcast_join(big, dim, keys="k", right_keys="j",
                              join_type="left outer").to_pandas()
        assert len(left) == 5
        assert left.loc[left["k"] == 9, "name"].isna().all()

    def test_oversized_broadcast_refused(self, ray_session):
        import ray.data

        from searchenginesimple_ray.stages import joins
        big = ray.data.range(1)
        t = pa.table({"id": np.zeros(8, np.int64)})
        old = joins.BROADCAST_MAX_ROWS
        joins.BROADCAST_MAX_ROWS = 4
        try:
            with pytest.raises(ValueError, match="use shuffle_join"):
                joins.broadcast_join(big, t, keys="id")
        finally:
            joins.BROADCAST_MAX_ROWS = old


class TestShuffleJoin:
    def test_matches_pandas_merge(self, ray_session):
        import ray.data

        from searchenginesimple_ray.stages.joins import shuffle_join
        rng = np.random.default_rng(5)
        l = pd.DataFrame({"k": rng.integers(0, 50, 500),
                          "a": np.arange(500)})
        r = pd.DataFrame({"j": np.arange(0, 60, dtype=np.int64),
                          "b": np.arange(0, 60) * 7})
        got = shuffle_join(ray.data.from_pandas(l),
                           ray.data.from_pandas(r),
                           on="k", right_on="j", num_partitions=4) \
            .to_pandas().sort_values(["k", "a"]).reset_index(drop=True)
        want = l.merge(r, left_on="k", right_on="j").drop(columns="j") \
            .sort_values(["k", "a"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k", "a", "b"]], want[["k", "a", "b"]],
            check_dtype=False)


class TestNationRevenue:
    def test_driver_entry_matches_oracle(self, ray_session):
        import importlib.util

        import duckdb
        spec = importlib.util.spec_from_file_location(
            "__ray_entry__", "/root/repo/__ray_entry__.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        got = m.queries()["nation_revenue"]("/root/testdata/sf0.001")
        con = duckdb.connect()
        for t in ["lineitem", "orders", "customer", "nation", "region"]:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'/root/testdata/sf0.001/{t}.parquet'")
        want = con.execute(m.oracle_sql()["nation_revenue"]).df()
        cols = sorted(want.columns)
        got = got[cols].sort_values(cols).reset_index(drop=True)
        want = want[cols].sort_values(cols).reset_index(drop=True)
        assert len(want) > 0
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestJoinRobustness:
    def test_drop_empty_blocks_scrubs_join_empties(self, ray_session):
        # a join's empty hash partitions emit SCHEMA-LESS blocks;
        # chaining a second join over them crashes acero — scrubbed
        # output must chain cleanly and lose no rows
        import numpy as np
        import pyarrow as pa

        import ray
        from searchenginesimple_ray.stages.joins import (
            drop_empty_blocks, shuffle_join)
        from ray.data.block import BlockAccessor
        left = ray.data.from_arrow(pa.table(
            {"k": pa.array([0] * 5, pa.int64()),
             "x": pa.array(np.arange(5), pa.int64())}))
        right = ray.data.from_arrow(pa.table(
            {"k": pa.array([0], pa.int64()),
             "y": pa.array([7], pa.int64())}))
        j1 = shuffle_join(left, right, on="k",
                          num_partitions=8).materialize()
        clean = drop_empty_blocks(j1)
        assert clean is not None and clean.count() == 5
        for bundle in clean.iter_internal_ref_bundles():
            for ref, _meta in bundle.blocks:
                acc = BlockAccessor.for_block(ray.get(ref))
                assert list(acc.schema().names) == ["k", "x", "y"]
        # second join over the scrubbed output works
        r2 = ray.data.from_arrow(pa.table(
            {"y": pa.array([7], pa.int64()),
             "z": pa.array([1], pa.int64())}))
        out = shuffle_join(clean, r2, on="y",
                           num_partitions=8).materialize()
        assert out.count() == 5
        # all-empty dataset -> None
        none_ds = drop_empty_blocks(
            shuffle_join(left, ray.data.from_arrow(pa.table(
                {"k": pa.array([99], pa.int64()),
                 "y": pa.array([1], pa.int64())})), on="k",
                num_partitions=4))
        assert none_ds is None

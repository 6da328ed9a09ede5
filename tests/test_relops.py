"""Relational wide ops (stages/relops.py): pivot, distributed global
rank, grouped exact median, Bloom-prefiltered exact semi-join —
DuckDB oracles + edge semantics."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray.data

from searchenginesimple_ray.stages.relops import (bloom_semi_join,
                                                  global_rank,
                                                  group_median,
                                                  pivot_counts)


def _events(seed=3, n=4000, users=300):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, users, n).astype(np.int64),
        "event_type": rng.choice(["click", "view", "purchase"], n),
        "value": np.round(rng.normal(50, 20, n), 3)})


class TestPivotCounts:
    def test_matches_oracle(self, ray_session):
        rng = np.random.default_rng(5)
        docs = pd.DataFrame({
            "source": rng.choice([f"s{i}" for i in range(6)], 1500),
            "lang": rng.choice(["en", "zh", "de", "xx", "yy"], 1500)})
        got = pivot_counts(ray.data.from_pandas(docs).repartition(4),
                           "source", "lang", ["en", "zh", "de"])
        con = duckdb.connect()
        con.register("docs", docs)
        exp = con.sql("""
SELECT source,
 CAST(sum(CASE WHEN lang='en' THEN 1 ELSE 0 END) AS BIGINT) n_en,
 CAST(sum(CASE WHEN lang='zh' THEN 1 ELSE 0 END) AS BIGINT) n_zh,
 CAST(sum(CASE WHEN lang='de' THEN 1 ELSE 0 END) AS BIGINT) n_de,
 CAST(sum(CASE WHEN lang NOT IN ('en','zh','de') THEN 1 ELSE 0 END)
      AS BIGINT) n_other,
 CAST(count(*) AS BIGINT) n_total
FROM docs GROUP BY source ORDER BY source""").df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_null_rows_and_empty(self, ray_session):
        docs = pd.DataFrame({
            "source": pd.array(["a", None, "a"], dtype="string"),
            "lang": pd.array(["en", "en", None], dtype="string")})
        got = pivot_counts(ray.data.from_pandas(docs), "source",
                           "lang", ["en"])
        # NULL source groups under "", NULL lang counts as other
        assert got.loc[got["source"] == "", "n_en"].iloc[0] == 1
        assert got.loc[got["source"] == "a", "n_other"].iloc[0] == 1
        assert got["n_total"].sum() == 3
        empty = pivot_counts(ray.data.from_pandas(pd.DataFrame(
            {"source": pd.Series([], dtype="string"),
             "lang": pd.Series([], dtype="string")})),
            "source", "lang", ["en"])
        assert len(empty) == 0
        assert list(empty.columns) == ["source", "n_en", "n_other",
                                       "n_total"]


class TestGlobalRank:
    def test_matches_rank_oracle(self, ray_session):
        df = _events(seed=7)
        got = global_rank(ray.data.from_pandas(df).repartition(5),
                          "event_id", "value").to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.sql(
            "SELECT event_id, CAST(rank() OVER (ORDER BY value) "
            "AS BIGINT) value_rank FROM events ORDER BY event_id").df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_heavy_ties_share_rank(self, ray_session):
        # many duplicated values: ties always land in one bucket
        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "event_id": np.arange(1000, dtype=np.int64),
            "value": rng.integers(0, 7, 1000).astype(np.float64)})
        got = global_rank(ray.data.from_pandas(df).repartition(4),
                          "event_id", "value", n_buckets=16) \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.sql(
            "SELECT event_id, CAST(rank() OVER (ORDER BY value) "
            "AS BIGINT) value_rank FROM events ORDER BY event_id").df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_constant_and_empty(self, ray_session):
        df = pd.DataFrame({"event_id": np.arange(5, dtype=np.int64),
                           "value": np.full(5, 2.5)})
        got = global_rank(ray.data.from_pandas(df), "event_id",
                          "value").to_pandas()
        assert got["value_rank"].tolist() == [1] * 5
        e = global_rank(ray.data.from_pandas(pd.DataFrame(
            {"event_id": pd.Series([], dtype=np.int64),
             "value": pd.Series([], dtype=np.float64)})),
            "event_id", "value").to_pandas()
        assert len(e) == 0

    def test_nan_refused(self, ray_session):
        df = pd.DataFrame({"event_id": np.array([0, 1], np.int64),
                           "value": [1.0, np.nan]})
        with pytest.raises(Exception, match="NULL/NaN"):
            global_rank(ray.data.from_pandas(df), "event_id",
                        "value").to_pandas()


class TestGroupMedian:
    def test_matches_quantile_disc(self, ray_session):
        df = _events(seed=13)
        got = group_median(ray.data.from_pandas(df).repartition(5),
                           "event_type", "value")
        con = duckdb.connect()
        con.register("events", df)
        exp = con.sql(
            'SELECT event_type AS "group", CAST(count(*) AS BIGINT) n,'
            " CAST(quantile_disc(value, 0.5) AS DOUBLE) median"
            ' FROM events GROUP BY event_type ORDER BY "group"').df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_even_odd_and_null_group(self, ray_session):
        df = pd.DataFrame({
            "g": pd.array(["a", "a", "a", "a", "b", "b", "b", None],
                          dtype="string"),
            "v": [1.0, 2.0, 3.0, 4.0, 10.0, 30.0, 20.0, 5.0]})
        got = group_median(ray.data.from_pandas(df), "g", "v")
        m = dict(zip(got["group"], got["median"]))
        assert m["a"] == 2.0      # even n: lower middle (disc rule)
        assert m["b"] == 20.0
        assert m[""] == 5.0       # NULL group sentinel

    def test_general_quantile_disc(self, ray_session):
        df = _events(seed=23, n=2000)
        for qn, qd in [(1, 4), (3, 4), (9, 10), (1, 1)]:
            got = group_median(ray.data.from_pandas(df).repartition(4),
                               "event_type", "value",
                               q_num=qn, q_den=qd)
            con = duckdb.connect()
            con.register("events", df)
            exp = con.sql(
                'SELECT event_type AS "group",'
                " CAST(count(*) AS BIGINT) n,"
                f" CAST(quantile_disc(value, {qn}/{qd}) AS DOUBLE)"
                ' median FROM events GROUP BY event_type'
                ' ORDER BY "group"').df()
            pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        with pytest.raises(ValueError, match="quantile"):
            group_median(ray.data.from_pandas(df), "event_type",
                         "value", q_num=3, q_den=2)

    def test_single_value_and_skew(self, ray_session):
        # zero value width (lo == hi) must not divide by zero; a group
        # 100x another still gets the exact element
        df = pd.DataFrame({
            "g": ["x"] * 400 + ["y"] * 4,
            "v": np.concatenate([np.full(400, 7.0),
                                 [1.0, 2.0, 3.0, 4.0]])})
        got = group_median(ray.data.from_pandas(df).repartition(3),
                           "g", "v")
        m = dict(zip(got["group"], got["median"]))
        assert m["x"] == 7.0 and m["y"] == 2.0


class TestBloomSemiJoin:
    def _sets(self, seed=17):
        df = _events(seed=seed, n=3000, users=250)
        rng = np.random.default_rng(seed + 1)
        keys = pd.DataFrame({"user_id": np.unique(
            rng.integers(0, 250, 90)).astype(np.int64)})
        return df, keys

    @pytest.mark.parametrize("anti", [False, True])
    def test_exact_with_tiny_bloom(self, ray_session, anti):
        # 256-bit bloom on 90 keys -> high FP rate; the verify join
        # must still make the result EXACT
        df, keys = self._sets()
        got = bloom_semi_join(
            ray.data.from_pandas(df).repartition(4),
            ray.data.from_pandas(keys).repartition(2),
            on="user_id", anti=anti, num_bits=256,
            join_partitions=4).to_pandas()
        ks = set(keys["user_id"])
        mask = df["user_id"].isin(ks)
        exp = df[~mask] if anti else df[mask]
        assert sorted(got["event_id"]) == sorted(exp["event_id"])

    def test_empty_right_side(self, ray_session):
        df, _ = self._sets()
        empty = pd.DataFrame({"user_id": pd.Series([], dtype=np.int64)})
        semi = bloom_semi_join(ray.data.from_pandas(df),
                               ray.data.from_pandas(empty),
                               on="user_id").to_pandas()
        anti = bloom_semi_join(ray.data.from_pandas(df),
                               ray.data.from_pandas(empty),
                               on="user_id", anti=True).to_pandas()
        assert len(semi) == 0 and len(anti) == len(df)

    def test_matches_entry_oracle(self, ray_session):
        import __ray_entry__ as e
        sf = "/root/testdata/sf0.001"
        got = e.queries()["bloom_user_filter"](sf)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
        exp = con.execute(e.oracle_sql()["bloom_user_filter"]).df()
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True),
                                      check_dtype=False)



class TestGroupRank:
    def test_matches_windowed_rank_oracle(self, ray_session):
        from searchenginesimple_ray.stages.relops import group_rank
        df = _events(seed=29)
        got = group_rank(ray.data.from_pandas(df).repartition(5),
                         "event_id", "event_type", "value") \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.sql(
            "SELECT event_id, event_type, CAST(rank() OVER "
            "(PARTITION BY event_type ORDER BY value) AS BIGINT) "
            "value_rank FROM events ORDER BY event_id").df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_ties_and_null_group(self, ray_session):
        from searchenginesimple_ray.stages.relops import group_rank
        df = pd.DataFrame({
            "event_id": np.arange(6, dtype=np.int64),
            "g": pd.array(["a", "a", "a", None, None, "a"],
                          dtype="string"),
            "v": [5.0, 5.0, 1.0, 2.0, 2.0, 9.0]})
        got = group_rank(ray.data.from_pandas(df), "event_id", "g",
                         "v", n_buckets=4).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        assert got["value_rank"].tolist() == [2, 2, 1, 1, 1, 4]
        assert got.loc[3, "g"] == ""       # NULL group sentinel


class TestNullOracleAlignment:
    """The ops' NULL conventions (NULL group -> '' sentinel, NULL
    pivot value -> other) are pinned INTO the registered oracle SQL;
    fixtures here contain actual NULLs so a drift fails loudly."""

    def test_lang_pivot_nulls(self, ray_session):
        import __ray_entry__ as e
        docs = pd.DataFrame({
            "source": pd.array(["a", None, "a", "b"], dtype="string"),
            "lang": pd.array(["en", "en", None, "xx"], dtype="string")})
        got = pivot_counts(ray.data.from_pandas(docs), "source",
                           "lang", ["de", "en", "es", "fr", "zh"])
        con = duckdb.connect()
        con.register("documents", docs)
        exp = con.execute(e.oracle_sql()["lang_pivot"]).df()
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_group_ops_null_group(self, ray_session):
        import __ray_entry__ as e
        from searchenginesimple_ray.stages.relops import group_rank
        ev = pd.DataFrame({
            "event_id": np.arange(6, dtype=np.int64),
            "event_type": pd.array(["a", "a", None, None, "b", "a"],
                                   dtype="string"),
            "value": [3.0, 1.0, 5.0, 2.0, 4.0, 1.0]})
        con = duckdb.connect()
        con.register("events", ev)
        gm = group_median(ray.data.from_pandas(ev), "event_type",
                          "value")
        em = con.execute(e.oracle_sql()["event_type_median"]).df()
        pd.testing.assert_frame_equal(gm, em, check_dtype=False)
        gr = group_rank(ray.data.from_pandas(ev), "event_id",
                        "event_type", "value").to_pandas() \
            .sort_values("event_id").reset_index(drop=True) \
            .rename(columns={"event_type": "event_type"})
        er = con.execute(e.oracle_sql()["event_type_rank"]).df()
        pd.testing.assert_frame_equal(gr, er, check_dtype=False)


class TestGlobalOrder:
    def test_dense_rank_and_row_number_match_oracles(self, ray_session):
        from searchenginesimple_ray.stages.relops import global_order
        df = _events(seed=37, n=3000)
        # force heavy ties too
        df.loc[:500, "value"] = np.round(df.loc[:500, "value"], 0)
        con = duckdb.connect()
        con.register("events", df)
        dr = global_order(ray.data.from_pandas(df).repartition(5),
                          "event_id", "value", method="dense_rank",
                          n_buckets=32).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        exp = con.sql(
            "SELECT event_id, CAST(dense_rank() OVER (ORDER BY value)"
            " AS BIGINT) dense_rank FROM events ORDER BY event_id").df()
        pd.testing.assert_frame_equal(dr, exp, check_dtype=False)
        rn = global_order(ray.data.from_pandas(df).repartition(5),
                          "event_id", "value", method="row_number",
                          n_buckets=32).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        exp2 = con.sql(
            "SELECT event_id, CAST(row_number() OVER (ORDER BY value,"
            " event_id) AS BIGINT) row_num FROM events"
            " ORDER BY event_id").df()
        pd.testing.assert_frame_equal(rn, exp2, check_dtype=False)

    def test_edges(self, ray_session):
        from searchenginesimple_ray.stages.relops import global_order
        with pytest.raises(ValueError, match="method"):
            global_order(ray.data.from_pandas(_events(n=5)),
                         "event_id", "value", method="percent_rank")
        e = global_order(ray.data.from_pandas(pd.DataFrame(
            {"event_id": pd.Series([], dtype=np.int64),
             "value": pd.Series([], dtype=np.float64)})),
            "event_id", "value").to_pandas()
        assert len(e) == 0
        const = pd.DataFrame({"event_id": np.arange(4, dtype=np.int64),
                              "value": np.full(4, 1.5)})
        dr = global_order(ray.data.from_pandas(const), "event_id",
                          "value", method="dense_rank").to_pandas()
        assert sorted(dr["dense_rank"]) == [1, 1, 1, 1]
        rn = global_order(ray.data.from_pandas(const), "event_id",
                          "value", method="row_number").to_pandas() \
            .sort_values("event_id")
        assert rn["row_num"].tolist() == [1, 2, 3, 4]


class TestPivotSumCents:
    def test_matches_oracle_and_entry(self, ray_session):
        import __ray_entry__ as e
        from searchenginesimple_ray.stages.relops import pivot_sum_cents
        got = e.queries()["orders_pivot"]("/root/testdata/sf0.001")
        con = duckdb.connect()
        con.sql("CREATE VIEW orders AS SELECT * FROM "
                "read_parquet('/root/testdata/sf0.001/orders.parquet')")
        exp = con.execute(e.oracle_sql()["orders_pivot"]).df()
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True),
                                      check_dtype=False)
        # cent rule is IEEE-consistent on both sides: the double
        # nearest 1.005 is 1.00499...9, so floor(x*100 + 0.5) = 100
        # in numpy AND DuckDB (no decimal re-rounding); NULL counts 0
        df = pd.DataFrame({
            "r": ["a", "a", "b"],
            "c": pd.array(["x", None, "x"], dtype="string"),
            "v": [1.005, 2.0, None]})
        out = pivot_sum_cents(ray.data.from_pandas(df), "r", "c",
                              ["x"], "v")
        assert out.loc[out["r"] == "a", "c_x"].iloc[0] == 100
        assert out.loc[out["r"] == "a", "c_other"].iloc[0] == 200
        assert out.loc[out["r"] == "b", "c_x"].iloc[0] == 0


class TestDupClusterHist:
    def test_matches_oracle_with_duplicates(self, ray_session):
        import __ray_entry__ as e
        from searchenginesimple_ray.stages.relops import dup_cluster_hist
        rng = np.random.default_rng(41)
        base = [f"text number {i}" for i in range(30)]
        texts = list(rng.choice(base, 200)) + [None, None, "solo"]
        df = pd.DataFrame({"text": pd.array(texts, dtype="string")})
        got = dup_cluster_hist(ray.data.from_pandas(df).repartition(4))
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(e.oracle_sql()["dup_cluster_hist"]).df()
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True),
                                      check_dtype=False)
        # totals reconcile: sum(size * n_clusters) == row count
        assert int((got["cluster_size"] * got["n_clusters"]).sum()) \
            == len(df)

    def test_empty(self, ray_session):
        from searchenginesimple_ray.stages.relops import dup_cluster_hist
        out = dup_cluster_hist(ray.data.from_pandas(pd.DataFrame(
            {"text": pd.Series([], dtype="string")})))
        assert len(out) == 0

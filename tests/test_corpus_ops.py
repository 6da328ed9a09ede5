"""Corpus-statistic filters (stages/filtering.py), LAG-delta aggregate
(stages/events.lag_deltas_events), TPC-H-Q1 pricing summary
(stages/joins.pricing_summary) and vocabulary build
(stages/sketches.vocab_build) — edge semantics + DuckDB oracles on
randomized multi-block inputs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

US = 1_000_000
T0 = 1_700_000_000 * US


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_oracle(got: pd.DataFrame, con, sql: str):
    exp = con.execute(sql).df()
    a, b = _canon(got), _canon(exp)
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# ------------------------------------------------------------ filtering

def _docs_table(rng, n=240, n_sources=8):
    words = ["alpha", "beta", "gamma", "delta", "x", "longword"]
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 30)))
             for _ in range(n)]
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
        "source": pa.array([f"s{int(i)}" for i in
                            rng.integers(0, n_sources, n)], pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts], np.int64)),
    })


class TestBadSourceFilter:
    def test_matches_duckdb_on_random_corpus(self, ray_session):
        from searchenginesimple_ray.stages.filtering import bad_source_filter
        t = _docs_table(np.random.default_rng(7))
        ds = ray.data.from_arrow(t).repartition(5)
        got = bad_source_filter(ds, n_drop=3).to_pandas()
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        _assert_oracle(got, con, """
WITH s AS (
  SELECT source, CAST(sum(n_chars) * 10000 AS BIGINT) // count(*) AS m
  FROM documents GROUP BY source
), b AS (SELECT source FROM s ORDER BY m, source LIMIT 3)
SELECT doc_id, source FROM documents
WHERE source NOT IN (SELECT source FROM b)""")

    def test_mean_tie_breaks_by_source_name(self, ray_session):
        from searchenginesimple_ray.stages.filtering import bad_source_filter
        # two sources with IDENTICAL means; the lexicographically
        # smaller one must be the blocked one
        t = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "source": pa.array(["zz", "aa", "good", "good"]),
            "n_chars": pa.array([10, 10, 100, 100], pa.int64()),
        })
        got = bad_source_filter(ray.data.from_arrow(t), n_drop=1) \
            .to_pandas()
        assert set(got["source"]) == {"zz", "good"}


class TestOutlierClip:
    def test_matches_duckdb_quantile_disc(self, ray_session):
        from searchenginesimple_ray.stages.filtering import outlier_clip
        t = _docs_table(np.random.default_rng(11), n=300)
        ds = ray.data.from_arrow(t).repartition(6)
        got = outlier_clip(ds).to_pandas()
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        _assert_oracle(got, con, r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
), q AS (
  SELECT quantile_disc(n_tokens, 0.0625) AS lo,
         quantile_disc(n_tokens, 0.9375) AS hi FROM t
)
SELECT doc_id, n_tokens FROM t, q
WHERE n_tokens >= lo AND n_tokens <= hi""")

    def test_small_n_rank_rule(self, ray_session):
        # n=7: ceil(7/16)=1, ceil(105/16)=7 -> band = [min, max], all kept
        from searchenginesimple_ray.stages.filtering import outlier_clip
        texts = ["w " * k for k in range(1, 8)]
        t = pa.table({"doc_id": pa.array(range(7), pa.int64()),
                      "text": pa.array(texts)})
        got = outlier_clip(ray.data.from_arrow(t)).to_pandas()
        assert len(got) == 7

    def test_band_boundaries_inclusive(self, ray_session):
        from searchenginesimple_ray.stages.filtering import outlier_clip
        # 32 docs of increasing length: lo rank ceil(2)=2, hi ceil(30)=30
        texts = ["w " * k for k in range(1, 33)]
        t = pa.table({"doc_id": pa.array(range(32), pa.int64()),
                      "text": pa.array(texts)})
        got = outlier_clip(ray.data.from_arrow(t).repartition(3)) \
            .to_pandas().sort_values("doc_id")
        assert got["n_tokens"].min() == 2 and got["n_tokens"].max() == 30
        assert len(got) == 29


# ------------------------------------------------------------ lag deltas

def _events_table(rng, n=400, n_users=25):
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(
            (T0 + rng.integers(0, 3600 * US, n)).astype("datetime64[us]")),
        "user_id": pa.array(rng.integers(0, n_users, n).astype(np.int64)),
        "event_type": pa.array(rng.choice(["a", "b"], n)),
        "value": pa.array(rng.random(n)),
    })


class TestLagDeltas:
    def test_matches_duckdb_lag(self, ray_session):
        from searchenginesimple_ray.stages.events import lag_deltas_events
        t = _events_table(np.random.default_rng(3))
        got = lag_deltas_events(ray.data.from_arrow(t).repartition(7)) \
            .to_pandas()
        con = duckdb.connect()
        con.register("events", t.to_pandas())
        _assert_oracle(got, con, """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
g AS (
  SELECT user_id, ts_us - LAG(ts_us) OVER (
      PARTITION BY user_id ORDER BY ts_us, event_id) AS gap
  FROM e)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(gap) AS BIGINT) AS n_gaps,
       CAST(COALESCE(max(gap), -1) AS BIGINT) AS max_gap_us,
       CAST(COALESCE(sum(gap), 0) AS BIGINT) AS sum_gap_us
FROM g GROUP BY user_id""")

    def test_single_event_user_sentinels(self, ray_session):
        from searchenginesimple_ray.stages.events import lag_deltas_events
        t = pa.table({
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array(np.array([T0, T0, T0 + 5], "datetime64[us]")),
            "user_id": pa.array([1, 2, 2], pa.int64()),
            "event_type": pa.array(["a"] * 3),
            "value": pa.array([0.0] * 3),
        })
        got = lag_deltas_events(ray.data.from_arrow(t)).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        assert got.to_dict("records") == [
            {"user_id": 1, "n_events": 1, "n_gaps": 0,
             "max_gap_us": -1, "sum_gap_us": 0},
            {"user_id": 2, "n_events": 2, "n_gaps": 1,
             "max_gap_us": 5, "sum_gap_us": 5},
        ]

    def test_same_bucket_users_do_not_mix(self, ray_session):
        from searchenginesimple_ray.stages.events import lag_deltas_events
        # users 5 and 69 share bucket 5 (mod 64): the boundary row
        # between them must not produce a cross-user gap
        t = pa.table({
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "ts": pa.array(np.array(
                [T0, T0 + 10, T0 + 100, T0 + 130], "datetime64[us]")),
            "user_id": pa.array([5, 5, 69, 69], pa.int64()),
            "event_type": pa.array(["a"] * 4),
            "value": pa.array([0.0] * 4),
        })
        got = lag_deltas_events(ray.data.from_arrow(t)).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        assert list(got["max_gap_us"]) == [10, 30]
        assert list(got["sum_gap_us"]) == [10, 30]


# ------------------------------------------------------- pricing summary

class TestPricingSummary:
    CUTOFF_US = 904_694_400_000_000  # 1998-09-02 00:00:00

    def _lineitem(self, rng, n=500):
        base = np.datetime64("1996-01-01", "us").astype(np.int64)
        span = np.datetime64("2000-01-01", "us").astype(np.int64) - base
        return pa.table({
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n)),
            "l_linestatus": pa.array(rng.choice(["F", "O"], n)),
            "l_quantity": pa.array(
                rng.integers(1, 51, n).astype(np.float64)),
            "l_extendedprice": pa.array(
                np.round(rng.random(n) * 90000 + 900, 2)),
            "l_discount": pa.array(np.round(rng.random(n) * 0.1, 2)),
            "l_tax": pa.array(np.round(rng.random(n) * 0.08, 2)),
            "l_shipdate": pa.array(
                (base + (rng.random(n) * span).astype(np.int64))
                .astype("datetime64[us]")),
        })

    def test_matches_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.joins import pricing_summary
        t = self._lineitem(np.random.default_rng(5))
        got = pricing_summary(ray.data.from_arrow(t).repartition(6),
                              cutoff_us=self.CUTOFF_US)
        con = duckdb.connect()
        con.register("lineitem", t.to_pandas())
        _assert_oracle(got, con, """
WITH c AS (
  SELECT l_returnflag, l_linestatus,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_c,
         CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_c
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
SELECT l_returnflag, l_linestatus,
       CAST(sum(qty_c) AS BIGINT) AS sum_qty_c,
       CAST(sum(price_c) AS BIGINT) AS sum_base_c,
       CAST(sum(price_c * (100 - disc_c)) AS BIGINT) AS sum_disc_c4,
       CAST(sum(price_c * (100 - disc_c) * (100 + tax_c)) AS BIGINT)
           AS sum_charge_c6,
       CAST(count(*) AS BIGINT) AS n_rows
FROM c GROUP BY l_returnflag, l_linestatus""")

    def test_cutoff_is_inclusive(self, ray_session):
        from searchenginesimple_ray.stages.joins import pricing_summary
        at = np.datetime64("1998-09-02T00:00:00", "us")
        t = pa.table({
            "l_returnflag": pa.array(["A", "A"]),
            "l_linestatus": pa.array(["F", "F"]),
            "l_quantity": pa.array([1.0, 1.0]),
            "l_extendedprice": pa.array([10.0, 10.0]),
            "l_discount": pa.array([0.0, 0.0]),
            "l_tax": pa.array([0.0, 0.0]),
            "l_shipdate": pa.array([at, at + 1]),  # at cutoff / 1us past
        })
        got = pricing_summary(ray.data.from_arrow(t),
                              cutoff_us=self.CUTOFF_US)
        assert got["n_rows"].tolist() == [1]


# ----------------------------------------------------------- vocab build

class TestVocabBuild:
    def test_matches_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.sketches import vocab_build
        t = _docs_table(np.random.default_rng(13), n=200)
        got = vocab_build(ray.data.from_arrow(t).repartition(5))
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        _assert_oracle(got, con, r"""
WITH p AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
    FROM documents)
), dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p
           GROUP BY term)
SELECT term,
       CAST(ROW_NUMBER() OVER (ORDER BY df DESC, term) - 1 AS BIGINT)
           AS token_id,
       df
FROM dfs""")

    def test_df_counts_each_doc_once(self, ray_session):
        from searchenginesimple_ray.stages.sketches import vocab_build
        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["dup dup dup solo", "dup"]),
        })
        got = vocab_build(ray.data.from_arrow(t)) \
            .set_index("term")
        assert got.loc["dup", "df"] == 2          # not 4
        assert got.loc["dup", "token_id"] == 0    # df desc
        assert got.loc["solo", "token_id"] == 1

    def test_rank_ties_break_by_term(self, ray_session):
        from searchenginesimple_ray.stages.sketches import vocab_build
        t = pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["zeta alpha"]),
        })
        got = vocab_build(ray.data.from_arrow(t)).set_index("term")
        assert got.loc["alpha", "token_id"] == 0
        assert got.loc["zeta", "token_id"] == 1

    def test_null_text_ignored(self, ray_session):
        from searchenginesimple_ray.stages.sketches import vocab_build
        t = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b", None]),
        })
        got = vocab_build(ray.data.from_arrow(t))
        assert set(got["term"]) == {"a", "b"}

    def test_distributed_rank_identical_to_driver(self, ray_session):
        """The two-level sample-split rank (driver_limit=0) must equal
        the driver sort bit-for-bit — including CJK terms (multi-byte
        prefix keys) and a run of same-df terms sharing their first 8
        bytes (the coarse 16-byte key cannot separate them, so they
        co-bucket and the in-bucket exact sort must order them)."""
        from searchenginesimple_ray.stages.sketches import vocab_build
        rng = np.random.default_rng(23)
        words = [f"prefix00{i:04d}" for i in range(40)] \
            + ["中文词", "中文字", "alpha", "beta", "z"]
        texts = [" ".join(rng.choice(words,
                                     size=int(rng.integers(1, 12))))
                 for _ in range(300)]
        t = pa.table({
            "doc_id": pa.array(np.arange(300, dtype=np.int64)),
            "text": pa.array(texts, pa.string())})
        ds = ray.data.from_arrow(t).repartition(5)
        want = vocab_build(ds)                       # driver rank
        for nb in (None, 2, 7):                      # 2+ partitionings
            got = vocab_build(ds, driver_limit=0, n_buckets=nb)
            pd.testing.assert_frame_equal(got, want)

    def test_vocab_build_ds_streaming_form(self, ray_session):
        from searchenginesimple_ray.stages.sketches import (
            vocab_build, vocab_build_ds)
        t = _docs_table(np.random.default_rng(29), n=120)
        ds = ray.data.from_arrow(t).repartition(3)
        want = vocab_build(ds)
        got = vocab_build_ds(ds).to_pandas() \
            .sort_values("term").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["term", "token_id", "df"]], want)


# ------------------------------------------------------- cooc pairs

class TestCoocPairs:
    def test_matches_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.sketches import cooc_pairs_topk
        t = _docs_table(np.random.default_rng(17), n=150)
        got = cooc_pairs_topk(ray.data.from_arrow(t).repartition(4),
                              k=10)
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        _assert_oracle(got, con, r"""
WITH p AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
    FROM documents)
), c AS (
  SELECT a.term AS term_a, b.term AS term_b,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM p a JOIN p b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2)
SELECT term_a, term_b, n_docs FROM c
ORDER BY n_docs DESC, term_a, term_b LIMIT 10""")

    def test_pair_counted_once_per_doc(self, ray_session):
        from searchenginesimple_ray.stages.sketches import cooc_pairs_topk
        t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["a b a b a", "b a"])})
        got = cooc_pairs_topk(ray.data.from_arrow(t), k=5)
        assert got.to_dict("records") == [
            {"term_a": "a", "term_b": "b", "n_docs": 2}]

    def test_doc_term_bound_raises(self, ray_session):
        from searchenginesimple_ray.stages.sketches import cooc_pairs_topk
        text = " ".join(f"w{i}" for i in range(50))
        t = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array([text])})
        with pytest.raises(Exception, match="max_doc_terms"):
            cooc_pairs_topk(ray.data.from_arrow(t), k=5,
                            max_doc_terms=10)

    def test_null_and_single_term_docs(self, ray_session):
        from searchenginesimple_ray.stages.sketches import cooc_pairs_topk
        t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                      "text": pa.array([None, "solo", "x y"])})
        got = cooc_pairs_topk(ray.data.from_arrow(t), k=5)
        assert got.to_dict("records") == [
            {"term_a": "x", "term_b": "y", "n_docs": 1}]


# -------------------------------------------------------- label centroids

class TestLabelCentroids:
    def test_matches_duckdb_fixed_point(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import \
            label_centroids
        rng = np.random.default_rng(23)
        n, dim = 200, 8
        vecs = (rng.standard_normal((n, dim)) * 3).astype(np.float32)
        t = pa.table({
            "label": pa.array(rng.integers(0, 5, n).astype(np.int32)),
            "embedding": pa.array(list(vecs),
                                  pa.list_(pa.float32())),
        })
        got = label_centroids(ray.data.from_arrow(t).repartition(6))
        con = duckdb.connect()
        con.register("embeddings", t.to_pandas())
        _assert_oracle(got, con, """
SELECT CAST(label AS BIGINT) AS label, dim - 1 AS dim,
       CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5)
                     AS BIGINT)) AS BIGINT) AS sum_fp,
       CAST(count(*) AS BIGINT) AS n
FROM (SELECT label, unnest(embedding) AS v,
             generate_subscripts(embedding, 1) AS dim FROM embeddings)
GROUP BY label, dim""")

    def test_exact_known_sums(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import \
            label_centroids
        t = pa.table({
            "label": pa.array([1, 1, 2], pa.int32()),
            "embedding": pa.array(
                [[0.5, -0.5], [0.25, 0.5], [1.0, 2.0]],
                pa.list_(pa.float32())),
        })
        got = label_centroids(ray.data.from_arrow(t))
        # floor(x*1e6 + 0.5): 0.5 -> 500000, -0.5 -> floor(-499999.5)
        # = -500000 (round half UP, so the pair cancels exactly)
        assert got.to_dict("records") == [
            {"label": 1, "dim": 0, "sum_fp": 750000, "n": 2},
            {"label": 1, "dim": 1, "sum_fp": 0, "n": 2},
            {"label": 2, "dim": 0, "sum_fp": 1000000, "n": 1},
            {"label": 2, "dim": 1, "sum_fp": 2000000, "n": 1},
        ]


# ---------------------------------------------------------- rollup

class TestRollup:
    def test_matches_duckdb_grouping_sets(self, ray_session):
        from searchenginesimple_ray.stages.events import rollup_events
        t = _events_table(np.random.default_rng(29), n=300)
        got = rollup_events(ray.data.from_arrow(t).repartition(5))
        con = duckdb.connect()
        con.register("events", t.to_pandas())
        _assert_oracle(got, con, """
SELECT COALESCE(event_type, 'ALL') AS event_type,
       CAST(COALESCE(day_us, -1) AS BIGINT) AS day_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_value_cents
FROM (SELECT event_type,
             CAST((epoch_us(ts) // 86400000000) * 86400000000
                  AS BIGINT) AS day_us,
             CAST(floor(100 * value + 0.5) AS BIGINT) AS cents
      FROM events)
GROUP BY GROUPING SETS ((event_type, day_us), (event_type),
                        (day_us), ())""")

    def test_grain_consistency(self, ray_session):
        # the four grains must agree: total == sum(by_type) ==
        # sum(by_day) == sum(finest)
        from searchenginesimple_ray.stages.events import rollup_events
        t = _events_table(np.random.default_rng(31), n=120)
        got = rollup_events(ray.data.from_arrow(t).repartition(3))
        finest = got[(got["event_type"] != "ALL") & (got["day_us"] != -1)]
        by_type = got[(got["event_type"] != "ALL") & (got["day_us"] == -1)]
        by_day = got[(got["event_type"] == "ALL") & (got["day_us"] != -1)]
        total = got[(got["event_type"] == "ALL") & (got["day_us"] == -1)]
        assert len(total) == 1
        for col in ("n_events", "sum_value_cents"):
            tot = total[col].iloc[0]
            assert finest[col].sum() == tot
            assert by_type[col].sum() == tot
            assert by_day[col].sum() == tot
        assert total["n_events"].iloc[0] == 120


# ------------------------------------------------------ curation chain

class TestCurationKeep:
    def _corpus(self, rng, n=260):
        words = ["the", "and", "for", "with", "alpha", "beta", "gamma",
                 "delta", "epsilon", "zeta", "eta", "theta"]
        texts = [" ".join(rng.choice(words, size=int(rng.integers(2, 80))))
                 for _ in range(n)]
        # inject exact duplicates so the dedup stage has real work
        for i in range(0, n - 10, 17):
            texts[i + 3] = texts[i]
        return pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        })

    def test_matches_duckdb_composition(self, ray_session):
        from searchenginesimple_ray.config import DEFAULT_STOP_WORDS
        from searchenginesimple_ray.pipelines.curation import curate_df
        t = self._corpus(np.random.default_rng(37))
        got = curate_df(ray.data.from_arrow(t).repartition(6),
                        stop_words=DEFAULT_STOP_WORDS, min_tokens=30,
                        seed=0)
        import __ray_entry__ as e
        sql = e.oracle_sql()["curation_keep"]
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        _assert_oracle(got, con, sql)
        # the chain did real work at every stage: some docs dropped by
        # quality, some by dedup, survivors span several splits
        assert 0 < len(got) < len(t)
        assert got["doc_id"].is_unique
        assert set(got["split"]) <= {"train", "val", "test"}
        assert len(set(got["split"])) >= 2

    def test_first_wins_within_quality_survivors(self, ray_session):
        # a duplicate pair where the EARLIER doc fails quality: the
        # later copy must survive (dedup runs on quality survivors,
        # not the raw corpus)
        from searchenginesimple_ray.config import DEFAULT_STOP_WORDS
        from searchenginesimple_ray.pipelines.curation import curate_df
        # passes every Gopher rule: 40 tokens, mean word length in
        # [3, 10], two distinct stop words, all-distinct n-grams
        good = "the and " + " ".join(f"word{i:03d}" for i in range(38))
        t = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["too short", good, good]),
        })
        got = curate_df(ray.data.from_arrow(t),
                        stop_words=DEFAULT_STOP_WORDS,
                        min_tokens=30, seed=0)
        assert list(got["doc_id"]) == [1]


# -------------------------------------------------------- retention

class TestRetention:
    def test_matches_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.events import retention_cohorts
        rng = np.random.default_rng(41)
        n = 500
        t = pa.table({
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array((T0 + rng.integers(0, 60, n)
                            * 86_400_000_000).astype("datetime64[us]")),
            "user_id": pa.array(rng.integers(0, 40, n).astype(np.int64)),
            "event_type": pa.array(rng.choice(["a", "b"], n)),
            "value": pa.array(rng.random(n)),
        })
        got = retention_cohorts(ray.data.from_arrow(t).repartition(7))
        con = duckdb.connect()
        con.register("events", t.to_pandas())
        _assert_oracle(got, con, """
WITH wk AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS w
  FROM events
), fw AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY user_id)
SELECT CAST(cw AS BIGINT) AS cohort_week,
       CAST(w - cw AS BIGINT) AS weeks_since,
       CAST(count(*) AS BIGINT) AS n_users
FROM wk JOIN fw USING (user_id) GROUP BY cw, w""")

    def test_cohort_zero_row_equals_cohort_size(self, ray_session):
        from searchenginesimple_ray.stages.events import retention_cohorts
        W = 604_800_000_000
        base = (T0 // W) * W
        rows = [  # user 1: weeks 0,1 ; user 2: week 0 ; user 3: week 1
            (0, base, 1), (1, base + W, 1), (2, base + 1, 2),
            (3, base + W + 5, 3),
            (4, base + W + 6, 3),   # same user+week dup must not count
        ]
        t = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(np.array([r[1] for r in rows],
                                    "datetime64[us]")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["a"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
        })
        got = retention_cohorts(ray.data.from_arrow(t).repartition(2))
        w0 = base // W
        assert got.to_dict("records") == [
            {"cohort_week": w0, "weeks_since": 0, "n_users": 2},
            {"cohort_week": w0, "weeks_since": 1, "n_users": 1},
            {"cohort_week": w0 + 1, "weeks_since": 0, "n_users": 1},
        ]


class TestCurateWrite:
    def test_partitioned_output_roundtrip(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from searchenginesimple_ray.config import DEFAULT_STOP_WORDS
        from searchenginesimple_ray.pipelines.curation import (curate_df,
                                                               curate_write)
        rng = np.random.default_rng(43)
        words = ["the", "and", "for", "alpha", "beta", "gamma", "delta",
                 "epsilon", "zeta", "theta"]
        texts = [" ".join(rng.choice(words, size=int(rng.integers(30, 60))))
                 for _ in range(120)]
        t = pa.table({"doc_id": pa.array(np.arange(120, dtype=np.int64)),
                      "text": pa.array(texts)})
        out = str(tmp_path / "curated")
        r = curate_write(ray.data.from_arrow(t).repartition(4), out,
                         stop_words=DEFAULT_STOP_WORDS, min_tokens=20,
                         seed=0)
        ref = curate_df(ray.data.from_arrow(t),
                        stop_words=DEFAULT_STOP_WORDS, min_tokens=20,
                        seed=0)
        assert r["n_rows"] == len(ref) > 0
        back = pq.read_table(out).to_pandas()
        # hive layout: split is the partition key, text rides along
        assert set(back.columns) >= {"doc_id", "text", "split"}
        merged = back[["doc_id", "split"]].astype({"split": str}) \
            .sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            merged, ref[["doc_id", "split"]], check_dtype=False)
        import os
        assert any(d.startswith("split=") for d in os.listdir(out))


class TestCurationLmKeep:
    def _corpus(self, rng, n=260):
        # zipf-ish mixed-frequency vocabulary so mean surprisal varies
        words = ["the", "and", "for", "with", "alpha", "beta", "gamma",
                 "delta", "rareword1", "rareword2", "rareword3"]
        p = np.array([1.0 / (i + 1) for i in range(len(words))])
        p /= p.sum()
        texts = [" ".join(rng.choice(words, p=p,
                                     size=int(rng.integers(2, 80))))
                 for _ in range(n)]
        for i in range(0, n - 10, 17):
            texts[i + 3] = texts[i]
        return pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string())})

    def test_matches_duckdb_composition(self, ray_session):
        from searchenginesimple_ray.config import DEFAULT_STOP_WORDS
        from searchenginesimple_ray.pipelines.curation import curate_lm
        t = self._corpus(np.random.default_rng(53))
        # pick the band at the kept-subset's observed median so the LM
        # stage does real filtering on this corpus
        got = curate_lm(ray.data.from_arrow(t).repartition(6),
                        stop_words=DEFAULT_STOP_WORDS, min_tokens=30,
                        max_mean_centibits=403, seed=0).to_pandas()
        import __ray_entry__ as e
        sql = e.oracle_sql()["curation_lm_keep"]
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        _assert_oracle(got.sort_values("doc_id").reset_index(drop=True),
                       con, sql)
        assert 0 < len(got) < len(t)

    def test_lm_band_is_a_subset_of_the_rule_chain(self, ray_session):
        """Adding the LM band can only shrink the survivor set, and a
        doc surviving BOTH chains gets the same split (doc_id hash)."""
        from searchenginesimple_ray.config import DEFAULT_STOP_WORDS
        from searchenginesimple_ray.pipelines.curation import (curate_df,
                                                               curate_lm)
        t = self._corpus(np.random.default_rng(7))
        base = curate_df(ray.data.from_arrow(t),
                         stop_words=DEFAULT_STOP_WORDS, min_tokens=30,
                         seed=0)
        lm = curate_lm(ray.data.from_arrow(t),
                       stop_words=DEFAULT_STOP_WORDS, min_tokens=30,
                       max_mean_centibits=403, seed=0).to_pandas()
        # LM survivors' ids need not be a subset of base ids (a dedup
        # winner can shift when the LM band removes the earlier copy),
        # but any id in BOTH must carry the same split
        both = set(base["doc_id"]) & set(lm["doc_id"])
        a = base.set_index("doc_id").loc[sorted(both), "split"]
        b = lm.set_index("doc_id").loc[sorted(both), "split"]
        assert (a == b).all()


class TestDistinctiveTerms:
    def test_matches_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.sketches import \
            distinctive_terms
        rng = np.random.default_rng(19)
        words = ["the", "and", "alpha", "beta", "gamma"]
        n = 240
        srcs = [f"s{int(i)}" for i in rng.integers(0, 4, n)]
        texts = []
        for s in srcs:
            base = list(rng.choice(words, size=int(rng.integers(1, 30))))
            # a signature token EXCLUSIVE to the source (df = 1), so
            # idf separates it from the shared vocabulary (df = 4)
            base += [f"srcword{s[1:]}"] * int(rng.integers(1, 4))
            texts.append(" ".join(base))
        # nulls and empties
        texts[0], texts[1] = None, ""
        t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                      "text": pa.array(texts, pa.string()),
                      "source": pa.array(srcs, pa.string())})
        got = distinctive_terms(
            ray.data.from_arrow(t).repartition(5), k=5)
        import __ray_entry__ as e
        sql = e.oracle_sql()["distinctive_terms"] \
            .replace("<= 10", "<= 5")
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        _assert_oracle(got, con, sql)
        # each source's injected signature token must outrank the
        # shared vocabulary for that source (real ranking check)
        for s in sorted(set(srcs)):
            top = got[(got["group"] == s) & (got["rank"] == 0)]
            assert len(top) == 1
            assert top["term"].iloc[0] == f"srcword{s[1:]}", \
                (s, top["term"].iloc[0])

    def test_join_path_identical_to_broadcast(self, ray_session):
        """broadcast_limit=0 forces the term-hash-partitioned df join
        (no vocabulary-sized driver state); results must match the
        broadcast-model path exactly."""
        from searchenginesimple_ray.stages.sketches import \
            distinctive_terms
        t = _docs_table(np.random.default_rng(31), n=200)
        ds = ray.data.from_arrow(t).repartition(4)
        want = distinctive_terms(ds, k=5)
        got = distinctive_terms(ds, k=5, broadcast_limit=0,
                                join_partitions=4)
        pd.testing.assert_frame_equal(got, want)


class TestCompressionRatio:
    def test_matches_direct_zlib_and_orders_repetitive_low(
            self, ray_session):
        import zlib

        from searchenginesimple_ray.stages.textstages import \
            compression_ratio
        texts = ["abc " * 200,                    # templated: low ratio
                 "".join(chr(33 + ((i * 7919) % 90))
                         for i in range(800)),    # noisy: high ratio
                 "", None, "short"]
        t = pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                      "text": pa.array(texts, pa.string())})
        got = compression_ratio(
            ray.data.from_arrow(t).repartition(2)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        for i, tx in enumerate(texts):
            raw = (tx or "").encode()
            assert got["n_bytes"][i] == len(raw)
            assert got["n_compressed"][i] == len(zlib.compress(raw, 6))
            assert got["ratio_u"][i] == (
                len(zlib.compress(raw, 6)) * 1_000_000
                // max(len(raw), 1))
        assert got["ratio_u"][0] < got["ratio_u"][1]


class TestQuantizeEmbeddings:
    def test_matches_duckdb_with_negatives_and_zero_vector(
            self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import \
            quantize_embeddings_stats
        rng = np.random.default_rng(13)
        vecs = (rng.standard_normal((120, 16)) * 3).astype(np.float32)
        vecs[7] = 0.0                              # all-zero vector
        t = pa.table({
            "vec_id": pa.array(np.arange(120, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32()))})
        got = quantize_embeddings_stats(
            ray.data.from_arrow(t).repartition(4)).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        import __ray_entry__ as e
        con = duckdb.connect()
        con.register("embeddings", t.to_pandas())
        exp = con.execute(e.oracle_sql()["quantize_embeddings"]).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)
        z = got[got["vec_id"] == 7].iloc[0]
        assert (z["scale_u"], z["q_sum"], z["q_min"], z["q_max"]) \
            == (0, 0, 0, 0)
        # int8 range respected
        assert got["q_min"].min() >= -127 and got["q_max"].max() <= 127

    def test_reconstruction_error_bound(self, ray_session):
        """|x - q*scale/127| <= scale/254 per component (half a
        quantization step) — the property that makes int8 ANN work."""
        from searchenginesimple_ray.pipelines.similarity import \
            quantize_embeddings_stats  # noqa: F401 (API presence)
        rng = np.random.default_rng(2)
        x = rng.standard_normal(64)
        scale = np.abs(x).max()
        q = np.floor(x / scale * 127 + 0.5)
        err = np.abs(x - q * scale / 127)
        assert (err <= scale / 254 + 1e-12).all()


class TestConvStats:
    def test_matches_oracle_on_testdata(self, ray_session):
        import __ray_entry__ as e
        from searchenginesimple_ray.pipelines.driverops import \
            q_conv_stats
        got = q_conv_stats("/root/testdata/sf0.001")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')")
        exp = con.execute(e.oracle_sql()["conv_stats"]).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)
        # invariants: turn balance and parity rule
        assert (got["n_user"] + got["n_assistant"]
                == got["n_turns"]).all()
        assert (got["max_turn_idx"] == got["n_turns"] - 1).all()
        assert (got["n_user"] - got["n_assistant"]).isin([0, 1]).all()

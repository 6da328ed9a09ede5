"""stratified_sample (stages/sampling.py): exact per-stratum hash-rank
sampling — DuckDB window-function oracle + edge semantics."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from searchenginesimple_ray.stages.sampling import (hash_u32,
                                                    stratified_sample)


def _run(df: pd.DataFrame, num=1, den=4, **kw) -> pd.DataFrame:
    ds = ray.data.from_pandas(df).repartition(4)
    return stratified_sample(ds, "source", num=num, den=den, **kw) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def _oracle(df: pd.DataFrame, num=1, den=4) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", df)
    return con.execute(f"""
WITH h AS (
  SELECT doc_id, source,
         ((doc_id % 2147483648) * 2654435761) % 4294967296 AS hv
  FROM documents
), r AS (
  SELECT doc_id, source, hv,
         row_number() OVER (PARTITION BY source
                            ORDER BY hv, doc_id) AS rn,
         count(*) OVER (PARTITION BY source) AS n
  FROM h
)
SELECT doc_id, source,
       CAST(CASE WHEN rn <= ({num} * n + {den} - 1) // {den}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM r ORDER BY doc_id
""").df()


class TestStratifiedSample:
    def test_randomized_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(3)
        n = 400
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "source": [f"s{int(x)}" for x in rng.integers(0, 7, n)]})
        got = _run(df)
        exp = _oracle(df)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_exact_quota_per_group(self, ray_session):
        # group sizes 1, 2, 5, 9 -> quotas ceil(n/4) = 1, 1, 2, 3
        sizes = {"a": 1, "b": 2, "c": 5, "d": 9}
        ids, srcs = [], []
        base = 0
        for g, n in sizes.items():
            ids += list(range(base, base + n)); srcs += [g] * n
            base += n
        df = pd.DataFrame({"doc_id": np.array(ids, np.int64),
                           "source": srcs})
        got = _run(df)
        kept = got[got["keep"] == 1].groupby("source").size().to_dict()
        assert kept == {"a": 1, "b": 1, "c": 2, "d": 3}

    def test_full_fraction_keeps_everything(self, ray_session):
        df = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                           "source": ["x"] * 10 + ["y"] * 10})
        got = _run(df, num=1, den=1)
        assert got["keep"].tolist() == [1] * 20

    def test_small_bucket_count_matches(self, ray_session):
        rng = np.random.default_rng(5)
        n = 300
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64) * 3 + 1,
            "source": [f"s{int(x)}" for x in rng.integers(0, 4, n)]})
        got = _run(df, n_buckets=3)        # many groups share buckets
        exp = _oracle(df)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_null_group_is_its_own_stratum(self, ray_session):
        df = pd.DataFrame({
            "doc_id": np.arange(8, dtype=np.int64),
            "source": pd.array(["a", "a", None, None, None, None,
                                "a", "a"], dtype="string")})
        got = _run(df)
        nulls = got[got["source"].isna()]
        assert len(nulls) == 4
        assert int(nulls["keep"].sum()) == 1          # ceil(4/4)

    def test_duplicate_keys_refused(self, ray_session):
        df = pd.DataFrame({"doc_id": np.array([1, 1, 2], np.int64),
                           "source": ["a", "a", "a"]})
        ds = ray.data.from_pandas(df)
        with pytest.raises(Exception, match="unique"):
            stratified_sample(ds, "source", num=1, den=2).to_pandas()

    def test_bad_fraction_refused(self, ray_session):
        ds = ray.data.from_pandas(pd.DataFrame(
            {"doc_id": np.array([1], np.int64), "source": ["a"]}))
        with pytest.raises(ValueError, match="fraction"):
            stratified_sample(ds, "source", num=3, den=2)


class TestGlobalUniqueness:
    def test_cross_group_duplicate_keys_refused(self, ray_session):
        # a key duplicated across two DIFFERENT strata shares a hash
        # bucket (bucket = f(key)), so the per-bucket check sees both
        # copies — global enforcement, not just per (group, bucket)
        df = pd.DataFrame({"doc_id": np.array([1, 1, 2, 3], np.int64),
                           "source": ["a", "b", "a", "b"]})
        ds = ray.data.from_pandas(df)
        with pytest.raises(Exception, match="unique"):
            stratified_sample(ds, "source", num=1, den=2).to_pandas()

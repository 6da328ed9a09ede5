"""Unigram-LM surprisal scoring (stages/lm.py): exact bit-length
kernel vs math.log2, DuckDB oracle parity on randomized multi-block
corpora (nulls / empties / whitespace-only), cross-corpus training
(OOV path), and the keep_filter composition contract."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _rand_docs(rng, n=300):
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
             "dog", "zipf", "rare1", "rare2", "UPPER", "MiXeD"]
    # zipf-ish: heavy head so counts vary by orders of magnitude
    p = np.array([1 / (i + 1) for i in range(len(words))])
    p /= p.sum()
    texts: list = []
    for i in range(n):
        r = rng.random()
        if r < 0.04:
            texts.append(None)
        elif r < 0.08:
            texts.append("")
        elif r < 0.11:
            texts.append("  \t \n ")
        else:
            k = int(rng.integers(1, 40))
            texts.append(" ".join(rng.choice(words, size=k, p=p)))
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, pa.string())})


LM_ORACLE = """
WITH doc AS (
  SELECT doc_id, lower(coalesce(text, '')) AS text FROM {score}
), tok AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS t
  FROM doc
), ttok AS (
  SELECT unnest(list_filter(string_split_regex(
             lower(coalesce(text, '')), '\\s+'), x -> x <> '')) AS t
  FROM {train}
), cnt AS (
  SELECT t, count(*) AS c FROM ttok GROUP BY t
), mass AS (
  SELECT CAST(sum(c) + count(*) AS BIGINT) AS D FROM cnt
), scored AS (
  SELECT tok.doc_id,
         (length(bin(D)) - length(bin(coalesce(c, 0) + 1))
          - CASE WHEN D < (coalesce(c, 0) + 1) * power(2,
                length(bin(D)) - length(bin(coalesce(c, 0) + 1)))
            THEN 1 ELSE 0 END) AS s
  FROM tok LEFT JOIN cnt USING (t) CROSS JOIN mass
), agg AS (
  SELECT doc_id, count(*) AS n_tok, sum(s) AS bits
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(coalesce(a.bits, 0) AS BIGINT) AS sum_bits,
       CAST(CASE WHEN a.n_tok > 0 AND a.bits * 100 <= {cb} * a.n_tok
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM doc d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
"""


class TestSurprisalKernel:
    def test_exact_floor_log2(self):
        from searchenginesimple_ray.stages.lm import surprisal_bits
        rng = np.random.default_rng(3)
        for D in [2, 3, 7, 1024, 10**6 + 7, 2**52]:
            c = np.unique(np.concatenate([
                rng.integers(0, D - 1, 200),
                # power-of-two boundaries are the floor's edge cases
                np.array([0, 1, 2, 3]),
                (2 ** np.arange(1, int(math.log2(D)) + 1)) - 1,
                2 ** np.arange(1, int(math.log2(D)) + 1)]))
            c = c[(c >= 0) & (c < D)]
            got = surprisal_bits(c, D)
            ref = np.array([math.floor(math.log2(D / (int(x) + 1)))
                            for x in c])
            assert (got == ref).all(), (D, c[got != ref][:5])


class TestLmSurprisal:
    def test_matches_duckdb_self_trained(self, ray_session):
        from searchenginesimple_ray.stages.lm import lm_surprisal
        t = _rand_docs(np.random.default_rng(11))
        ds = ray.data.from_arrow(t).repartition(7)
        got = lm_surprisal(ds, max_mean_centibits=350).to_pandas()
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        exp = con.execute(LM_ORACLE.format(
            score="documents", train="documents", cb=350)).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)
        # threshold actually separates: both classes present
        assert 0 < got["keep"].sum() < len(got)

    def test_cross_corpus_training_oov(self, ray_session):
        """Score corpus has tokens absent from the training corpus —
        they must score at the add-one floor (c = 0)."""
        from searchenginesimple_ray.stages.lm import lm_surprisal
        rng = np.random.default_rng(23)
        train = _rand_docs(rng, n=150)
        score = pa.table({
            "doc_id": pa.array(np.arange(5, dtype=np.int64)),
            "text": pa.array(["the the the", "unseen tokens here",
                              "fox dog UNSEEN2", None, ""])})
        got = lm_surprisal(
            ray.data.from_arrow(score).repartition(2),
            counts_from=ray.data.from_arrow(train),
            max_mean_centibits=1200).to_pandas()
        con = duckdb.connect()
        con.register("score_t", score.to_pandas())
        con.register("train_t", train.to_pandas())
        exp = con.execute(LM_ORACLE.format(
            score="score_t", train="train_t", cb=1200)).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)

    def test_keep_filter_matches_verdicts(self, ray_session):
        from searchenginesimple_ray.stages.lm import lm_surprisal
        t = _rand_docs(np.random.default_rng(5), n=120)
        ds = ray.data.from_arrow(t).repartition(4)
        verd = lm_surprisal(ds, max_mean_centibits=350).to_pandas()
        kept = lm_surprisal(ds, max_mean_centibits=350,
                            keep_filter=True).to_pandas()
        assert sorted(kept["doc_id"]) == sorted(
            verd.loc[verd["keep"] == 1, "doc_id"])
        # survivors keep their full input row, not just the verdict
        assert set(kept.columns) == {"doc_id", "text"}

    def test_empty_and_degenerate_inputs(self, ray_session):
        from searchenginesimple_ray.stages.lm import lm_surprisal
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text": pa.array([], pa.string())})
        out = lm_surprisal(ray.data.from_arrow(empty)).to_pandas()
        assert len(out) == 0
        # all-empty texts: vocabulary is empty, every doc keep = 0
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": pa.array(["", None], pa.string())})
        out = lm_surprisal(ray.data.from_arrow(t)).to_pandas()
        assert (out["keep"] == 0).all() and (out["n_tok"] == 0).all()

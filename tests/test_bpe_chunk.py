"""BPE training (stages/bpe.py) and sliding-window chunking
(stages/chunking.py): DuckDB oracle parity for the SQL-expressible
slices, independent pure-Python reference for the iterative trainer."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _docs(rng, n=200):
    words = ["banana", "bandana", "ananas", "aaaa", "abab", "x",
             "lowlow", "low", "lower", "newest", "widest"]
    texts: list = []
    for _ in range(n):
        r = rng.random()
        if r < 0.05:
            texts.append(None)
        elif r < 0.10:
            texts.append("")
        else:
            k = int(rng.integers(1, 25))
            texts.append(" ".join(rng.choice(words, size=k)))
    return pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                     "text": pa.array(texts, pa.string())})


class TestBpePairCounts:
    def test_matches_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.bpe import pair_counts
        t = _docs(np.random.default_rng(2))
        got = pair_counts(ray.data.from_arrow(t).repartition(5),
                          top_k=30)
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        exp = con.execute("""
WITH doc AS (SELECT lower(coalesce(text, '')) AS text FROM documents),
tok AS (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS w FROM doc),
wc AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
pairs AS (
  SELECT substr(w, i, 1) AS l, substr(w, i + 1, 1) AS r, c
  FROM (SELECT w, c, unnest(range(1, length(w))) AS i
        FROM wc WHERE length(w) >= 2)
)
SELECT l AS "left", r AS "right", CAST(sum(c) AS BIGINT) AS n
FROM pairs GROUP BY l, r
ORDER BY n DESC, l, r LIMIT 30""").df()
        pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                      check_dtype=False)


class TestBpeTrain:
    def test_matches_pure_python_reference(self, ray_session):
        from searchenginesimple_ray.stages.bpe import (bpe_train,
                                                       bpe_train_reference)
        t = _docs(np.random.default_rng(9), n=150)
        got = bpe_train(ray.data.from_arrow(t).repartition(4),
                        n_merges=15)
        ref = bpe_train_reference(t["text"].to_pylist(), n_merges=15)
        pd.testing.assert_frame_equal(got, ref)
        # merges actually compound: some merged symbol is length > 2
        assert (got["merged"].str.len() > 2).any()

    def test_overlapping_run_merges_leftmost_first(self, ray_session):
        from searchenginesimple_ray.stages.bpe import (bpe_train,
                                                       bpe_train_reference)
        texts = ["aaaa aaaa aaa", "aaaa aa"]
        t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(texts, pa.string())})
        got = bpe_train(ray.data.from_arrow(t), n_merges=4)
        ref = bpe_train_reference(texts, n_merges=4)
        pd.testing.assert_frame_equal(got, ref)


class TestChunkText:
    @pytest.mark.parametrize("size,stride", [(5, 2), (8, 8), (20, 10)])
    def test_matches_duckdb(self, ray_session, size, stride):
        from searchenginesimple_ray.stages.chunking import chunk_text
        t = _docs(np.random.default_rng(4))
        got = chunk_text(ray.data.from_arrow(t).repartition(6),
                         size=size, stride=stride).to_pandas()
        con = duckdb.connect()
        con.register("documents", t.to_pandas())
        exp = con.execute(f"""
WITH doc AS (
  SELECT doc_id, lower(coalesce(text, '')) AS text FROM documents
), tok AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS toks
  FROM doc
), m AS (
  SELECT doc_id, toks, len(toks) AS L FROM tok WHERE len(toks) > 0
), ch AS (
  SELECT doc_id, toks, L,
         unnest(range(0, CASE WHEN L <= {size} THEN 1
                  ELSE (L - {size} + {stride} - 1) // {stride} + 1 END)) AS k
  FROM m
)
SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
       CAST(k * {stride} AS BIGINT) AS start_tok,
       CAST(least({size}, L - k * {stride}) AS BIGINT) AS n_tok,
       array_to_string(
         toks[k * {stride} + 1 : k * {stride} + least({size}, L - k * {stride})],
         ' ') AS chunk_text
FROM ch ORDER BY doc_id, chunk_idx""").df()
        pd.testing.assert_frame_equal(_canon(got), _canon(exp),
                                      check_dtype=False)

    def test_bad_params_raise(self, ray_session):
        from searchenginesimple_ray.stages.chunking import chunk_text
        t = _docs(np.random.default_rng(1), n=4)
        with pytest.raises(ValueError):
            chunk_text(ray.data.from_arrow(t), size=4, stride=5)
        with pytest.raises(ValueError):
            chunk_text(ray.data.from_arrow(t), size=4, stride=0)

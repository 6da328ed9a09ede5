"""Round-4 third op wave: collocation mining, per-doc tf-idf top-k,
value histogram, conditional bigram-LM surprisal — DuckDB oracles on
randomized multi-block inputs + kernel property tests."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _eq(a: pd.DataFrame, b: pd.DataFrame):
    pd.testing.assert_frame_equal(_canon(a), _canon(b), check_dtype=False)


def _rand_docs(rng, n=160, vocab=14):
    words = [f"w{i}" for i in range(vocab)] + ["W3", "w1x"]
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 12))
        texts.append(" ".join(rng.choice(words, size=k)) if k else "")
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


class TestCollocations:
    def test_vs_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.sketches import collocations
        rng = np.random.default_rng(3)
        df = _rand_docs(rng)
        got = collocations(ray.data.from_pandas(df).repartition(5),
                           min_count=2, lift_num=11, lift_den=10)
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(r"""
WITH dt AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
    FROM documents)
), n AS (SELECT CAST(count(*) AS BIGINT) nd FROM documents),
dfs AS (SELECT term, CAST(count(*) AS BIGINT) c FROM dt GROUP BY term),
pairs AS (SELECT a.term ta, b.term tb, CAST(count(*) AS BIGINT) n_ab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2)
SELECT ta term_a, tb term_b, n_ab, fa.c n_a, fb.c n_b
FROM pairs JOIN dfs fa ON ta = fa.term JOIN dfs fb ON tb = fb.term
CROSS JOIN n
WHERE n_ab >= 2 AND nd * n_ab * 10 >= 11 * fa.c * fb.c
ORDER BY 1, 2""").df()
        assert len(exp) > 0
        _eq(got, exp)

    def test_all_pass_at_lift_zero(self, ray_session):
        from searchenginesimple_ray.stages.sketches import collocations
        df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                           "text": ["a b", "a b", "a c", "b c"]})
        got = collocations(ray.data.from_pandas(df), min_count=1,
                           lift_num=0, lift_den=1)
        assert set(map(tuple, got[["term_a", "term_b"]].values)) == \
            {("a", "b"), ("a", "c"), ("b", "c")}


class TestDocTfidfTopk:
    def test_vs_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.sketches import doc_tfidf_topk
        rng = np.random.default_rng(5)
        df = _rand_docs(rng, n=200)
        got = doc_tfidf_topk(
            ray.data.from_pandas(df).repartition(6), k=3).to_pandas()
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(r"""
WITH doc AS (SELECT doc_id, lower(coalesce(text,'')) AS text
             FROM documents),
tok AS (SELECT doc_id, unnest(list_filter(
            string_split_regex(text, '\s+'), x -> x != '')) AS t
        FROM doc),
tf AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) tf
       FROM tok GROUP BY 1, 2),
dfs AS (SELECT t, CAST(count(DISTINCT doc_id) AS BIGINT) df
        FROM tok GROUP BY t),
n AS (SELECT CAST(count(*) AS BIGINT) nd FROM documents),
idf AS (SELECT t, (length(bin(nd)) - length(bin(df))
        - CASE WHEN nd < df * power(2, length(bin(nd))
                                       - length(bin(df)))
          THEN 1 ELSE 0 END) AS idf_bits FROM dfs CROSS JOIN n),
scored AS (SELECT tf.doc_id, tf.t AS term, tf.tf,
                  tf.tf * idf.idf_bits AS score
           FROM tf JOIN idf USING (t))
SELECT doc_id, CAST(row_number() OVER w AS BIGINT) AS rank,
       term, tf, CAST(score AS BIGINT) AS score
FROM scored
WINDOW w AS (PARTITION BY doc_id ORDER BY score DESC, tf DESC, term)
QUALIFY row_number() OVER w <= 3""").df()
        _eq(got, exp)

    def test_doc_with_fewer_terms_than_k(self, ray_session):
        from searchenginesimple_ray.stages.sketches import doc_tfidf_topk
        df = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                           "text": ["only two", ""]})
        got = doc_tfidf_topk(ray.data.from_pandas(df), k=5).to_pandas()
        # doc 0 has 2 terms -> 2 rows; empty doc 1 -> none
        assert len(got) == 2
        assert set(got["doc_id"]) == {0}
        assert sorted(got["rank"]) == [1, 2]


class TestValueHistogram:
    def test_vs_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.events import value_histogram
        rng = np.random.default_rng(9)
        n = 500
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(1_700_000_000_000_000
                                 + np.arange(n) * 1_000_000, unit="us"),
            "user_id": rng.integers(0, 9, n).astype(np.int64),
            "event_type": "click",
            "value": np.round(rng.uniform(0, 333, n), 2),
            "props": "{}"})
        got = value_histogram(
            ray.data.from_pandas(df).repartition(7), bin_cents=500)
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
WITH c AS (SELECT CAST(floor(value*100+0.5) AS BIGINT) cents
           FROM events)
SELECT cents // 500 AS bin, CAST(count(*) AS BIGINT) n,
       CAST(sum(cents) AS BIGINT) sum_c
FROM c GROUP BY 1 ORDER BY 1""").df()
        _eq(got, exp)
        assert int(got["n"].sum()) == n


class TestBigramSurprisal:
    def test_surprisal_bits_vec_property(self):
        from searchenginesimple_ray.stages.lm import surprisal_bits_vec
        rng = np.random.default_rng(13)
        c = rng.integers(0, 1 << 40, 300)
        d = c + 1 + rng.integers(0, 1 << 41, 300)  # den >= c+1
        got = surprisal_bits_vec(c, d)
        exp = np.array([(int(dd) // int(cc + 1)).bit_length() - 1
                        if int(dd) // int(cc + 1) >= 1 else 0
                        for cc, dd in zip(c, d)])
        # floor(log2(d/(c+1))) == bitlen(d // (c+1)) - 1 for d >= c+1
        assert (got == exp).all()

    def test_vs_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.lm import bigram_surprisal
        rng = np.random.default_rng(17)
        df = _rand_docs(rng, n=180)
        got = bigram_surprisal(
            ray.data.from_pandas(df).repartition(5)).to_pandas()
        con = duckdb.connect()
        con.register("documents", df)
        exp = con.execute(r"""
WITH doc AS (SELECT doc_id, lower(coalesce(text,'')) AS text
             FROM documents),
toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                    x -> x != '') AS l FROM doc),
tok AS (SELECT unnest(l) AS t FROM toks),
uni AS (SELECT t, CAST(count(*) AS BIGINT) c FROM tok GROUP BY t),
v AS (SELECT CAST(count(*) AS BIGINT) AS V FROM uni),
pe AS (SELECT doc_id, p[1] AS w1, p[2] AS w2 FROM (
  SELECT doc_id, unnest(list_zip(list_slice(l, 1, len(l)-1),
                                 list_slice(l, 2, len(l)))) AS p
  FROM toks WHERE len(l) >= 2)),
big AS (SELECT w1, w2, CAST(count(*) AS BIGINT) c12
        FROM pe GROUP BY w1, w2),
scored AS (
  SELECT pe.doc_id,
         (length(bin(u.c + V)) - length(bin(b.c12 + 1))
          - CASE WHEN (u.c + V) < (b.c12 + 1)
                      * power(2, length(bin(u.c + V))
                                 - length(bin(b.c12 + 1)))
            THEN 1 ELSE 0 END) AS s
  FROM pe JOIN uni u ON pe.w1 = u.t
  JOIN big b ON pe.w1 = b.w1 AND pe.w2 = b.w2 CROSS JOIN v)
SELECT doc_id, CAST(count(*) AS BIGINT) n_pairs,
       CAST(sum(s) AS BIGINT) sum_bits
FROM scored GROUP BY doc_id""").df()
        _eq(got, exp)

    def test_short_docs_excluded(self, ray_session):
        from searchenginesimple_ray.stages.lm import bigram_surprisal
        df = pd.DataFrame({"doc_id": np.array([0, 1, 2], np.int64),
                           "text": ["single", "", "two tokens"]})
        got = bigram_surprisal(ray.data.from_pandas(df)).to_pandas()
        assert set(got["doc_id"]) == {2}
        assert got["n_pairs"].tolist() == [1]


# ------------------------------------------------- wave 4: anomaly

class TestRollingAnomaly:
    def test_vs_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.events import \
            rolling_anomaly_counts
        rng = np.random.default_rng(43)
        n = 400
        df = pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(1_700_000_000_000_000
                                 + rng.integers(0, n // 2, n)
                                 * 1_000_000, unit="us"),
            "user_id": rng.integers(0, 13, n).astype(np.int64),
            "event_type": "click",
            "value": np.round(rng.uniform(0, 50, n), 2),
            "props": "{}"})
        got = rolling_anomaly_counts(
            ray.data.from_pandas(df).repartition(6),
            window_rows=4, mult=3, n_buckets=5).to_pandas()
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us,
                  CAST(floor(value*100+0.5) AS BIGINT) cents
           FROM events),
w AS (SELECT user_id, cents,
        CAST(count(*) OVER w AS BIGINT) prev_n,
        CAST(COALESCE(sum(cents) OVER w, 0) AS BIGINT) prev_sum
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING))
SELECT user_id, CAST(count(*) AS BIGINT) n_events,
       CAST(count(*) FILTER (WHERE prev_n > 0
                             AND cents * prev_n > 3 * prev_sum)
            AS BIGINT) n_anomalies
FROM w GROUP BY user_id""").df()
        _eq(got, exp)

    def test_first_event_never_anomalous(self, ray_session):
        from searchenginesimple_ray.stages.events import \
            rolling_anomaly_counts
        df = pd.DataFrame({
            "event_id": np.arange(3, dtype=np.int64),
            "ts": pd.to_datetime([1, 2, 3], unit="s"),
            "user_id": np.array([7, 7, 7], np.int64),
            "event_type": "click",
            "value": [1000.0, 0.01, 1000.0],   # huge first, tiny, huge
            "props": "{}"})
        got = rolling_anomaly_counts(ray.data.from_pandas(df)) \
            .to_pandas()
        # first event: empty frame; third: 1000 > 3*mean(1000, 0.01)?
        # mean ~500 -> not anomalous; second: 0.01 < 3*1000.
        # Only cents*prev_n > 3*prev_sum decides: event 3 has
        # prev_sum=100001, prev_n=2 -> 100000*2 < 3*100001 -> 0
        assert got["n_anomalies"].tolist() == [0]
        assert got["n_events"].tolist() == [3]


# ---------------------------------------------- wave 4: bpe encode

class TestBpeEncode:
    def test_vs_reference(self, ray_session):
        from searchenginesimple_ray.stages.bpe import (
            bpe_encode, bpe_encode_reference, bpe_train)
        rng = np.random.default_rng(47)
        words = ["aaa", "aab", "abab", "banana", "bandana", "scan",
                 "scans", "Table", "table!"]
        texts = [" ".join(rng.choice(words, size=rng.integers(1, 9)))
                 for _ in range(60)]
        df = pd.DataFrame({"doc_id": np.arange(60, dtype=np.int64),
                           "text": texts})
        ds = ray.data.from_pandas(df).repartition(4)
        merges = bpe_train(ds, n_merges=8)
        assert len(merges) > 0
        got = bpe_encode(ds, merges).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        triples = list(map(tuple, merges.sort_values("rank")
                           [["left", "right", "merged"]].values))
        exp_counts = [bpe_encode_reference(t, triples) for t in texts]
        assert got["n_bpe_tokens"].tolist() == exp_counts
        assert got["n_words"].tolist() == [len(t.split()) for t in texts]

    def test_zero_merges_is_codepoint_count(self, ray_session):
        from searchenginesimple_ray.stages.bpe import bpe_encode
        df = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                           "text": ["ab cde", ""]})
        merges = pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                               "left": [], "right": [], "merged": [],
                               "n": pd.Series([], dtype=np.int64)})
        got = bpe_encode(ray.data.from_pandas(df), merges).to_pandas() \
            .sort_values("doc_id")
        assert got["n_bpe_tokens"].tolist() == [5, 0]

    def test_more_merges_never_increase_tokens(self, ray_session):
        from searchenginesimple_ray.stages.bpe import bpe_encode, \
            bpe_train
        df = pd.DataFrame({
            "doc_id": np.arange(20, dtype=np.int64),
            "text": ["the quick brown fox the the quick"] * 20})
        ds = ray.data.from_pandas(df)
        m_all = bpe_train(ds, n_merges=10)
        prev = None
        for k in (0, 3, 10):
            got = bpe_encode(ds, m_all.head(k)).to_pandas()
            tot = int(got["n_bpe_tokens"].sum())
            if prev is not None:
                assert tot <= prev
            prev = tot

"""Round-4 second op wave: transcript SFT ops, rolling window, Q3
join, k-means assign, snapshot diff, edit-distance-1 fuzzy join —
edge semantics + brute-force / DuckDB oracles on randomized
multi-block inputs."""

import hashlib

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


def _eq(a: pd.DataFrame, b: pd.DataFrame):
    pd.testing.assert_frame_equal(_canon(a), _canon(b), check_dtype=False)


# ------------------------------------------------------ transcript ops

def _ts_table(rng, n_convs=30):
    """Randomized transcripts WITH pathologies: gaps in turn_idx,
    non-alternating roles, single-turn convs."""
    rows = []
    for c in range(n_convs):
        n = int(rng.integers(1, 12))
        tidx = np.sort(rng.choice(np.arange(2 * n), size=n,
                                  replace=False))  # gaps
        for i, t in enumerate(tidx):
            role = rng.choice(["user", "assistant", "system"])
            words = rng.integers(0, 8)
            text = " ".join(f"w{int(rng.integers(0, 9))}"
                            for _ in range(words))
            rows.append((f"conv{c:03d}", int(t), str(role), text))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                     "text"])
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["tool"] = ""
    df["ts"] = pd.to_datetime(T0 + df.index.to_numpy() * US, unit="us")
    return df


class TestSftPairs:
    def test_vs_brute_force(self, ray_session):
        from searchenginesimple_ray.stages.transcript_ops import sft_pairs
        rng = np.random.default_rng(7)
        df = _ts_table(rng)
        ds = ray.data.from_pandas(df).repartition(5)
        got = sft_pairs(ds, n_buckets=7).to_pandas()

        rows = []
        for conv, g in df.groupby("conv_id"):
            g = g.sort_values("turn_idx")
            t = g["turn_idx"].to_numpy()
            r = g["role"].to_numpy()
            txt = g["text"].to_numpy()
            for i in range(len(g) - 1):
                if (t[i + 1] == t[i] + 1 and r[i] == "user"
                        and r[i + 1] == "assistant"):
                    rows.append((conv, int(t[i]),
                                 len(txt[i]), len(txt[i].split()),
                                 len(txt[i + 1]),
                                 len(txt[i + 1].split())))
        exp = pd.DataFrame(rows, columns=[
            "conv_id", "prompt_turn_idx", "prompt_chars",
            "prompt_tokens", "response_chars", "response_tokens"])
        assert len(got) == len(exp)
        if len(exp):
            _eq(got, exp)

    def test_empty_and_single_turn(self, ray_session):
        from searchenginesimple_ray.stages.transcript_ops import sft_pairs
        df = pd.DataFrame({
            "conv_id": ["a"], "turn_idx": np.array([0], np.int32),
            "role": ["user"], "text": ["hi"], "tool": [""],
            "ts": pd.to_datetime([T0], unit="us")})
        got = sft_pairs(ray.data.from_pandas(df)).to_pandas()
        assert len(got) == 0


class TestConvAssemble:
    def test_vs_brute_force_unordered_input(self, ray_session):
        from searchenginesimple_ray.stages.transcript_ops import \
            conv_assemble
        rng = np.random.default_rng(11)
        df = _ts_table(rng)
        # shuffle row order: assembly must still follow turn_idx
        df = df.sample(frac=1.0, random_state=3).reset_index(drop=True)
        ds = ray.data.from_pandas(df).repartition(4)
        got = conv_assemble(ds, n_buckets=5).to_pandas()

        rows = []
        for conv, g in df.groupby("conv_id"):
            g = g.sort_values("turn_idx")
            dialog = "\n".join(g["text"])
            rows.append((conv, len(g), len(dialog),
                         hashlib.md5(dialog.encode()).hexdigest()))
        exp = pd.DataFrame(rows, columns=["conv_id", "n_turns",
                                          "n_chars", "dialog_md5"])
        _eq(got, exp)


# ------------------------------------------------------ rolling window

class TestRollingWindow:
    def _events(self, rng, n=400, n_users=17):
        return pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            # duplicate timestamps exercise the (ts, event_id) tiebreak
            "ts": pd.to_datetime(
                T0 + rng.integers(0, n // 2, n) * US, unit="us"),
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "event_type": "click",
            "value": np.round(rng.uniform(0, 100, n), 2),
            "props": "{}",
        })

    def test_vs_duckdb(self, ray_session):
        from searchenginesimple_ray.stages.events import \
            rolling_window_events
        rng = np.random.default_rng(23)
        df = self._events(rng)
        got = rolling_window_events(
            ray.data.from_pandas(df).repartition(6),
            window_rows=5, n_buckets=7).to_pandas()
        con = duckdb.connect()
        con.register("events", df)
        exp = con.execute("""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) ts_us,
                  CAST(floor(value*100+0.5) AS BIGINT) cents FROM events)
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) win_n,
       CAST(sum(cents) OVER w AS BIGINT) win_sum_c
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""").df()
        _eq(got, exp)

    def test_window_one_is_identity(self, ray_session):
        from searchenginesimple_ray.stages.events import \
            rolling_window_events
        rng = np.random.default_rng(29)
        df = self._events(rng, n=60, n_users=5)
        got = rolling_window_events(
            ray.data.from_pandas(df), window_rows=1).to_pandas()
        assert (got["win_n"] == 1).all()
        cents = np.floor(df["value"].to_numpy() * 100 + 0.5).astype(
            np.int64)
        exp = pd.DataFrame({"event_id": df["event_id"],
                            "win_sum_c": cents})
        _eq(got[["event_id", "win_sum_c"]], exp)


# ------------------------------------------------------------ Q3 join

class TestShippingPriority:
    def test_vs_duckdb_sf0001(self, ray_session):
        from searchenginesimple_ray.stages.joins import \
            shipping_priority_topk
        sf = "/root/testdata/sf0.001"
        cut = 880_000_000_000_000
        got = shipping_priority_topk(
            ray.data.read_parquet(f"{sf}/customer.parquet"),
            ray.data.read_parquet(f"{sf}/orders.parquet"),
            ray.data.read_parquet(f"{sf}/lineitem.parquet"),
            "AUTOMOBILE", cut, k=10)
        con = duckdb.connect()
        for t in ("customer", "orders", "lineitem"):
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM '{sf}/{t}.parquet'")
        exp = con.execute(f"""
SELECT l.l_orderkey, epoch_us(o.o_orderdate) AS o_orderdate_us,
       o.o_orderpriority,
       CAST(sum(CAST(floor(l.l_extendedprice*100+0.5) AS BIGINT)
            * (100 - CAST(floor(l.l_discount*100+0.5) AS BIGINT)))
            AS BIGINT) AS revenue_c4
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'AUTOMOBILE'
  AND epoch_us(o.o_orderdate) < {cut} AND epoch_us(l.l_shipdate) > {cut}
GROUP BY 1, 2, 3 ORDER BY revenue_c4 DESC, l.l_orderkey LIMIT 10
""").df()
        # ordered comparison: top-k output order is part of the contract
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), exp.reset_index(drop=True),
            check_dtype=False)

    def test_k_larger_than_result(self, ray_session):
        from searchenginesimple_ray.stages.joins import \
            shipping_priority_topk
        sf = "/root/testdata/sf0.001"
        got = shipping_priority_topk(
            ray.data.read_parquet(f"{sf}/customer.parquet"),
            ray.data.read_parquet(f"{sf}/orders.parquet"),
            ray.data.read_parquet(f"{sf}/lineitem.parquet"),
            "AUTOMOBILE", 880_000_000_000_000, k=100000)
        assert len(got) >= 10
        # strictly ranked
        r = got["revenue_c4"].to_numpy()
        assert ((r[:-1] > r[1:]) | (
            (r[:-1] == r[1:])
            & (got["l_orderkey"].to_numpy()[:-1]
               < got["l_orderkey"].to_numpy()[1:]))).all()


# ------------------------------------------------------- kmeans assign

class TestKmeansAssign:
    def test_vs_brute_force(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import \
            kmeans_assign
        rng = np.random.default_rng(31)
        n, dim, k = 200, 16, 6
        V = rng.normal(size=(n, dim)).astype(np.float32)
        df = pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v for v in V],
            "label": np.zeros(n, np.int32)})
        got = kmeans_assign(ray.data.from_pandas(df).repartition(4),
                            n_clusters=k).to_pandas()
        Q = np.floor(V.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        C = Q[:k]
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cl = np.argmin(d, axis=1)
        exp = pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64),
            "cluster_id": cl.astype(np.int64),
            "dist_q": d[np.arange(n), cl]})
        _eq(got, exp)

    def test_tie_breaks_to_lowest_cluster(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import \
            kmeans_assign
        # centroids 0 and 1 identical -> every tie must choose 0
        V = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 2.0],
                      [1.0, 0.1], [0.9, 0.0]], dtype=np.float32)
        df = pd.DataFrame({
            "vec_id": np.arange(5, dtype=np.int64),
            "embedding": [v for v in V],
            "label": np.zeros(5, np.int32)})
        got = kmeans_assign(ray.data.from_pandas(df),
                            n_clusters=2).to_pandas() \
            .sort_values("vec_id")
        assert got["cluster_id"].tolist() == [0, 0, 0, 0, 0]
        assert got["dist_q"].tolist()[0] == 0

    def test_missing_centroid_raises(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import \
            kmeans_assign
        df = pd.DataFrame({
            "vec_id": np.array([0, 1, 5], np.int64),
            "embedding": [np.ones(4, np.float32)] * 3,
            "label": np.zeros(3, np.int32)})
        with pytest.raises(ValueError, match="seed centroids"):
            kmeans_assign(ray.data.from_pandas(df), n_clusters=3)


# ------------------------------------------------------- snapshot diff

class TestSnapshotDiff:
    def test_vs_brute_force(self, ray_session):
        from searchenginesimple_ray.stages.snapshot import snapshot_diff
        rng = np.random.default_rng(41)
        n = 300
        ids = np.arange(n, dtype=np.int64)
        texts = np.array([f"doc {i} {rng.integers(0, 5)}"
                          for i in ids], dtype=object)
        in_old = rng.random(n) < 0.8
        in_new = rng.random(n) < 0.8
        changed = rng.random(n) < 0.3
        old = pd.DataFrame({"doc_id": ids[in_old],
                            "text": texts[in_old]})
        new_t = np.where(changed, texts + " MOD", texts)
        new = pd.DataFrame({"doc_id": ids[in_new],
                            "text": new_t[in_new]})
        got = snapshot_diff(
            ray.data.from_pandas(old).repartition(3),
            ray.data.from_pandas(new).repartition(4), n_buckets=5)
        exp = {
            "added": int((~in_old & in_new).sum()),
            "removed": int((in_old & ~in_new).sum()),
            "changed": int((in_old & in_new & changed).sum()),
            "unchanged": int((in_old & in_new & ~changed).sum()),
        }
        got_d = dict(zip(got["status"], got["n_docs"]))
        assert got_d == exp

    def test_duplicate_id_raises(self, ray_session):
        from searchenginesimple_ray.stages.snapshot import snapshot_diff
        old = pd.DataFrame({"doc_id": np.array([1, 1], np.int64),
                            "text": ["a", "b"]})
        new = pd.DataFrame({"doc_id": np.array([1], np.int64),
                            "text": ["a"]})
        with pytest.raises(Exception, match="duplicate ids"):
            snapshot_diff(ray.data.from_pandas(old),
                          ray.data.from_pandas(new))

    def test_identical_snapshots(self, ray_session):
        from searchenginesimple_ray.stages.snapshot import snapshot_diff
        df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                           "text": [f"t{i}" for i in range(10)]})
        got = snapshot_diff(ray.data.from_pandas(df),
                            ray.data.from_pandas(df))
        got_d = dict(zip(got["status"], got["n_docs"]))
        assert got_d == {"added": 0, "removed": 0, "changed": 0,
                         "unchanged": 10}


# ---------------------------------------------------------- fuzzy join

class TestEd1:
    def test_ed1_unit(self):
        from searchenginesimple_ray.stages.fuzzy import _ed1
        assert not _ed1("abc", "abc")            # ed 0
        assert _ed1("abc", "abd")                # substitution
        assert _ed1("abc", "abcd")               # insertion at end
        assert _ed1("abc", "xabc")               # insertion at front
        assert _ed1("abc", "ab")                 # deletion
        assert not _ed1("abc", "adc"[::-1])      # "cda": ed 3
        assert not _ed1("abx", "ayb")            # the ed-2 blocking FP
        assert not _ed1("abc", "abcde")          # length diff 2
        assert _ed1("a", "")                     # single char vs empty

    def test_pairs_vs_brute_force(self, ray_session):
        from searchenginesimple_ray.stages.fuzzy import ed1_pairs
        vocab = ["join", "joins", "joi", "jorn", "xoin", "hash",
                 "hashx", "hasj", "abx", "ayb", "scan", "scam",
                 "scans", "tablet", "table", "tble"]
        ds = ray.data.from_pandas(
            pd.DataFrame({"term": vocab})).repartition(3)
        got = ed1_pairs(ds, n_buckets=4)
        import itertools

        def ed(a, b):
            # full Levenshtein DP for the oracle
            la, lb = len(a), len(b)
            D = np.zeros((la + 1, lb + 1), np.int64)
            D[:, 0] = np.arange(la + 1)
            D[0, :] = np.arange(lb + 1)
            for i in range(1, la + 1):
                for j in range(1, lb + 1):
                    D[i, j] = min(D[i - 1, j] + 1, D[i, j - 1] + 1,
                                  D[i - 1, j - 1]
                                  + (a[i - 1] != b[j - 1]))
            return D[la, lb]

        exp = sorted((a, b) for a, b in
                     itertools.combinations(sorted(set(vocab)), 2)
                     if ed(a, b) == 1)
        assert list(map(tuple, got.values)) == exp

    def test_noisy_terms_deterministic(self, ray_session):
        from searchenginesimple_ray.stages.fuzzy import noisy_doc_terms
        docs = pd.DataFrame({
            "doc_id": np.array([0, 1, 2], np.int64),
            "text": ["Alpha beta GAMMA delta", "alpha beta", "xy z"]})
        a = noisy_doc_terms(ray.data.from_pandas(docs)).to_pandas()
        b = noisy_doc_terms(ray.data.from_pandas(docs)).to_pandas()
        _eq(a, b)
        # tokens shorter than min_len are dropped entirely
        assert not a["term"].str.contains("xy").any()
        assert not (a["term"].str.len() < 3).any()

    def test_typo_pairs_end_to_end(self, ray_session):
        """End-to-end on sf0.001 vs DuckDB (same SQL as the entry)."""
        from searchenginesimple_ray.stages.fuzzy import typo_pairs
        sf = "/root/testdata/sf0.001"
        got = typo_pairs(ray.data.read_parquet(
            f"{sf}/documents.parquet"))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * "
                    f"FROM '{sf}/documents.parquet'")
        exp = con.execute(r"""
WITH base AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+'))
           AS term FROM documents)
  WHERE length(term) BETWEEN 4 AND 16
), noisy AS (
  SELECT CASE ((((doc_id * 131 + ascii(term) * 7 + length(term) + 5)
               % 2147483648) * 2654435761) % 4294967296) % 8
      WHEN 0 THEN substr(term, 1, 1) || term
      WHEN 1 THEN substr(term, 1, length(term) - 1)
      WHEN 2 THEN 'x' || substr(term, 2)
      ELSE term END AS term
  FROM base
), vocab AS (SELECT DISTINCT term FROM noisy)
SELECT a.term term_a, b.term term_b FROM vocab a JOIN vocab b
  ON a.term < b.term AND abs(length(a.term)-length(b.term)) <= 1
 AND levenshtein(a.term, b.term) = 1
ORDER BY 1, 2""").df()
        assert len(exp) > 0          # the noise rule yields positives
        _eq(got, exp)


class TestReviewRegressions:
    """Round-4 review findings: null-text handling, duplicate seed
    ids, bigram key contract."""

    def test_sft_pairs_null_text(self, ray_session):
        from searchenginesimple_ray.stages.transcript_ops import sft_pairs
        df = pd.DataFrame({
            "conv_id": ["c"] * 4,
            "turn_idx": np.arange(4, dtype=np.int32),
            "role": ["user", "assistant", "user", "assistant"],
            "text": [None, "ok then", "hi", None],
            "tool": [""] * 4,
            "ts": pd.to_datetime([T0] * 4, unit="us")})
        got = sft_pairs(ray.data.from_pandas(df)).to_pandas() \
            .sort_values("prompt_turn_idx").reset_index(drop=True)
        # null text counts as '' -> 0 chars / 0 tokens, int64 dtype
        assert got["prompt_chars"].tolist() == [0, 2]
        assert got["response_tokens"].tolist() == [2, 0]
        assert got["prompt_chars"].dtype == np.int64
        assert got["response_tokens"].dtype == np.int64

    def test_conv_assemble_null_text(self, ray_session):
        from searchenginesimple_ray.stages.transcript_ops import \
            conv_assemble
        df = pd.DataFrame({
            "conv_id": ["c", "c", "c"],
            "turn_idx": np.arange(3, dtype=np.int32),
            "role": ["user"] * 3,
            "text": ["a", None, "b"],
            "tool": [""] * 3,
            "ts": pd.to_datetime([T0] * 3, unit="us")})
        got = conv_assemble(ray.data.from_pandas(df)).to_pandas()
        assert len(got) == 1
        dialog = "a\n\nb"          # null assembles as ''
        assert got["dialog_md5"].iloc[0] == \
            hashlib.md5(dialog.encode()).hexdigest()
        assert got["n_chars"].iloc[0] == len(dialog)

    def test_kmeans_duplicate_seed_ids_raise(self, ray_session):
        from searchenginesimple_ray.pipelines.similarity import \
            kmeans_assign
        df = pd.DataFrame({
            "vec_id": np.array([0, 0, 1], np.int64),
            "embedding": [np.ones(4, np.float32)] * 3,
            "label": np.zeros(3, np.int32)})
        with pytest.raises(ValueError, match="seed centroids"):
            kmeans_assign(ray.data.from_pandas(df), n_clusters=2)

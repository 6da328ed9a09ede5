"""Gopher-rule quality filter (stages/textstages.gopher_quality) and
deterministic global shuffle (stages/sampling.global_shuffle_order)
vs brute-force Python oracles and DuckDB."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from searchenginesimple_ray.config import DEFAULT_STOP_WORDS


def _docs_ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def _brute_gopher(rows, stop, min_tokens=30, max_tokens=100_000,
                  min_len=3, max_len=10, min_stop=2, big_pct=20,
                  tri_pct=30):
    import re
    from collections import Counter
    out = []
    for did, tx in rows:
        # RE2 ASCII whitespace semantics, matching the SQL oracle
        toks = re.findall(r"[^ \t\n\r\f]+", (tx or "").lower())
        n = len(toks)
        wc = len(re.sub(r"[ \t\n\r\f]", "", tx or ""))
        nstop = len(set(toks) & stop)
        bigs = Counter(zip(toks, toks[1:]))
        top2 = max(bigs.values()) if bigs else 0
        tris = Counter(zip(toks, toks[1:], toks[2:]))
        dup3 = sum(tris.values()) - len(tris)
        bits = ((n < min_tokens) * 1 | (n > max_tokens) * 2
                | (wc < min_len * n) * 4 | (wc > max_len * n) * 8
                | (nstop < min_stop) * 16
                | (100 * top2 > big_pct * max(n - 1, 0)) * 32
                | (100 * dup3 > tri_pct * max(n - 2, 0)) * 64)
        out.append((did, n, wc, nstop, top2, dup3, bits,
                    1 if bits == 0 else 0))
    return out


class TestGopherQuality:
    def test_matches_brute_force(self, ray_session):
        from searchenginesimple_ray.stages.textstages import gopher_quality
        stop = frozenset(DEFAULT_STOP_WORDS)
        rows = [
            (1, "the quick brown fox jumps over a lazy dog " * 6),
            (2, "spam spam spam spam " * 20),            # repetition
            (3, "short doc"),                            # too few tokens
            (4, "a b c d e f g h i j " * 5),             # mean len < 3
            (5, "supercalifragilistic expialidocious " * 20),  # no stop
            (6, " ".join(f"w{i} the of" for i in range(20))),
            # clean: >=30 tokens, 2 stop words, no n-gram repetition
            (7, "the analysis of " + " ".join(
                f"token{i} value{i}" for i in range(20))),
            (8, None),                    # NULL text = empty string
            (9, "foo\u00a0bar baz"),      # NBSP is NOT whitespace
            #   under RE2 \s (ASCII) — 2 tokens, 10 word chars
        ]
        got = gopher_quality(_docs_ds(rows), stop_words=DEFAULT_STOP_WORDS,
                             min_tokens=30).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        want = _brute_gopher(rows, stop)
        cols = ["doc_id", "n_tokens", "word_chars", "n_stop_distinct",
                "top_bigram_count", "n_dup_trigrams", "rule_bits", "keep"]
        assert [tuple(r) for r in got[cols].values] == want
        # the fixture exercises both verdicts and >=3 distinct rules
        assert set(got["keep"]) == {0, 1}
        assert len(set(got["rule_bits"])) >= 3

    def test_testdata_matches_duckdb_oracle(self, ray_session):
        import duckdb

        import __ray_entry__ as e
        from searchenginesimple_ray.pipelines.driverops import \
            q_gopher_quality_keep
        sf = "/root/testdata/sf0.001"
        got = q_gopher_quality_keep(sf)
        con = duckdb.connect()
        con.execute("SET threads=2")
        con.execute(f"CREATE VIEW documents AS FROM '{sf}/documents.parquet'")
        want = con.execute(e.oracle_sql()["gopher_quality_keep"]).df()
        assert len(got) == len(want)
        for c in want.columns:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


class TestGlobalShuffle:
    def test_is_a_permutation_and_matches_rank(self, ray_session):
        from searchenginesimple_ray.stages.sampling import (
            global_shuffle_order, hash_u32)
        ids = np.array([3, 7, 11, 100, 205, 9999, 2, 0], np.int64)
        ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids)}))
        got = global_shuffle_order(ds, seed=17).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        h = hash_u32(ids, 17)
        order = np.lexsort((ids, h))
        want_pos = np.empty(len(ids), np.int64)
        want_pos[order] = np.arange(len(ids))
        want = dict(zip(ids, want_pos))
        assert {r.doc_id: r.shuffle_pos for r in got.itertuples()} == \
            {int(k): int(v) for k, v in want.items()}
        assert sorted(got["shuffle_pos"]) == list(range(len(ids)))

    def test_seed_changes_order(self, ray_session):
        from searchenginesimple_ray.stages.sampling import \
            global_shuffle_order
        ids = pa.array(np.arange(64, dtype=np.int64))
        ds = ray.data.from_arrow(pa.table({"doc_id": ids}))
        a = global_shuffle_order(ds, seed=1).to_pandas() \
            .sort_values("doc_id")["shuffle_pos"].tolist()
        b = global_shuffle_order(ds, seed=2).to_pandas() \
            .sort_values("doc_id")["shuffle_pos"].tolist()
        assert a != b

    def test_duplicate_keys_raise(self, ray_session):
        from searchenginesimple_ray.stages.sampling import \
            global_shuffle_order
        ds = ray.data.from_arrow(pa.table(
            {"doc_id": pa.array([1, 1, 2], pa.int64())}))
        with pytest.raises(Exception, match="unique"):
            global_shuffle_order(ds).to_pandas()


def _brute_token_budget(rows, budget, seed):
    """rows = (doc_id, source, text); keep iff per-source cumsum of
    n_tokens BEFORE the doc (in (hash, id) order) is < budget."""
    from searchenginesimple_ray.stages.sampling import hash_u32
    by_src: dict = {}
    for did, src, tx in rows:
        n = len((tx or "").split())
        h = int(hash_u32(np.array([did], np.int64), seed)[0])
        by_src.setdefault(src, []).append((h, did, n))
    keep = []
    for src, lst in by_src.items():
        cum = 0
        for h, did, n in sorted(lst):
            if cum < budget:
                keep.append((did, src, n))
            cum += n
    return sorted(keep)


class TestTokenBudgetSample:
    def _ds(self, rows):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string())}))

    def test_matches_brute_force_small_buckets(self, ray_session):
        # n_buckets=4 forces all three verdict paths (whole-bucket
        # keep, exact boundary resolution, whole-bucket drop)
        from searchenginesimple_ray.stages.sampling import \
            token_budget_sample
        rng = np.random.default_rng(3)
        rows = [(int(i), f"s{i % 3}",
                 " ".join(f"w{j}" for j in range(rng.integers(1, 40))))
                for i in range(120)]
        rows.append((900, "tiny", "only four tokens here"))  # under budget
        got = token_budget_sample(self._ds(rows), budget=150, seed=9,
                                  n_buckets=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        want = _brute_token_budget(rows, 150, 9)
        assert [tuple(r) for r in got[
            ["doc_id", "source", "n_tokens"]].values] == want
        # every source kept SOMETHING and the big sources were cut
        assert set(got["source"]) == {"s0", "s1", "s2", "tiny"}
        assert len(got) < len(rows)

    def test_budget_never_crossed_keeps_all(self, ray_session):
        from searchenginesimple_ray.stages.sampling import \
            token_budget_sample
        rows = [(i, "a", "x y z") for i in range(5)]
        got = token_budget_sample(self._ds(rows), budget=10_000,
                                  seed=1).to_pandas()
        assert len(got) == 5

    def test_empty_input(self, ray_session):
        from searchenginesimple_ray.stages.sampling import \
            token_budget_sample
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "source": pa.array([], pa.string()),
            "text": pa.array([], pa.string())}))
        assert len(token_budget_sample(ds, budget=5).to_pandas()) == 0

    def test_null_group_raises(self, ray_session):
        from searchenginesimple_ray.stages.sampling import \
            token_budget_sample
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "source": pa.array(["a", None], pa.string()),
            "text": pa.array(["x y", "z"], pa.string())}))
        with pytest.raises(Exception, match="non-null"):
            token_budget_sample(ds, budget=5).to_pandas()

    def test_duplicate_key_across_groups_is_exact(self, ray_session):
        # the same doc_id in two sources must get each source's own
        # verdict (key membership is applied per group, only at that
        # group's boundary bucket)
        from searchenginesimple_ray.stages.sampling import \
            token_budget_sample
        # different token sizes per source => different boundaries,
        # so the same id can be kept in one source and dropped in the
        # other
        rows = ([(i, "a", "w " * 10) for i in range(40)]
                + [(i, "b", "w " * 3) for i in range(40)])
        got = token_budget_sample(self._ds(rows), budget=100, seed=2,
                                  n_buckets=4).to_pandas()
        want = _brute_token_budget(rows, 100, 2)
        assert sorted(map(tuple, got[
            ["doc_id", "source", "n_tokens"]].values)) == want

"""Query-path rank-identity vs the brute-force oracle (FIXTURES F3) and
exactness of the pruned/WAND paths vs the exhaustive path."""

import math

import numpy as np
import pytest

from searchenginesimple_ray.pipelines.query import (ScorerCore,
                                                    bm25_query_terms,
                                                    query_weight_vector)
from searchenginesimple_ray.sources.transcripts import generate_queries


def _ids(rows):
    return [r["doc_id"] for r in rows]


def _scores(rows):
    return [r["score"] for r in rows]


@pytest.fixture(scope="module")
def queries():
    return generate_queries()


class TestBm25RankIdentical:
    def test_conjunctive(self, t1_engine, t1_oracle, queries):
        for q in queries:
            e = t1_engine.bm25_topk(q)
            o = t1_oracle.bm25_topk(q)
            assert _ids(e) == _ids(o), q
            for se, so in zip(_scores(e), _scores(o)):
                assert abs(se - so) <= 1e-9

    def test_disjunctive(self, t1_engine, t1_oracle, queries):
        for q in queries[:40]:
            e = t1_engine.bm25_topk(q, conjunctive=False)
            o = t1_oracle.bm25_topk(q, conjunctive=False)
            assert _ids(e) == _ids(o), q
            for se, so in zip(_scores(e), _scores(o)):
                assert abs(se - so) <= 1e-9


class TestRefCosineRankIdentical:
    def test_all_queries(self, t1_engine, t1_oracle, queries):
        for q in queries:
            e = t1_engine.ref_cosine_topk(q)
            o = t1_oracle.ref_cosine_topk(q)
            assert _ids(e) == _ids(o), q
            for se, so in zip(_scores(e), _scores(o)):
                if math.isnan(se) or math.isnan(so):
                    assert math.isnan(se) and math.isnan(so)
                else:
                    assert abs(se - so) <= 1e-9

    def test_scores_descend_in_true_cosine(self, t1_engine, queries):
        """Raw scores ascend (negative) => true cosine descends (G7/G8).

        The canonical order quantizes scores to 1e-9 before comparing
        (ranking.DECIMALS spec) — sub-EPS float jitter is a tie broken
        by doc_id, so assert on the QUANTIZED sequence.
        """
        from searchenginesimple_ray.functions.ranking import qround
        for q in queries[:20]:
            s = [qround(r["score"]) for r in t1_engine.ref_cosine_topk(q)
                 if not math.isnan(r["score"])]
            assert s == sorted(s)


class TestPruningExactness:
    """Block-max pruning / WAND must never change results (SURVEY §7.5)."""

    def test_conjunctive_pruned_equals_exhaustive(self, t1_index, queries):
        core = ScorerCore(t1_index["dir"],
                          list(range(t1_index["cfg"].num_doc_shards)))
        for q in queries:
            qt = [(t, c) for t, c in bm25_query_terms(q)
                  if t in core.postings]
            a = core.bm25_local_topk(qt, 10, True, method="exhaustive")
            b = core.bm25_local_topk(qt, 10, True, method="pruned")
            assert [d for _, d in a] == [d for _, d in b], q

    def test_wand_equals_exhaustive(self, t1_index, queries):
        core = ScorerCore(t1_index["dir"],
                          list(range(t1_index["cfg"].num_doc_shards)))
        for q in queries:
            qt = [(t, c) for t, c in bm25_query_terms(q)
                  if t in core.postings]
            if not qt:
                continue
            a = core.bm25_local_topk(qt, 10, False, method="exhaustive")
            b = core.bm25_local_topk(qt, 10, False, method="pruned")
            assert [d for _, d in a] == [d for _, d in b], q
            for (sa, _), (sb, _) in zip(a, b):
                assert abs(sa - sb) <= 1e-9


class TestEdgeCases:
    def test_absent_terms_dropped(self, t1_engine, t1_oracle):
        q = "zzzzabsent qqqmissing"
        assert t1_engine.bm25_topk(q) == []
        assert t1_oracle.bm25_topk(q) == []
        assert t1_engine.ref_cosine_topk(q) == []
        assert t1_oracle.ref_cosine_topk(q) == []

    def test_empty_query(self, t1_engine):
        assert t1_engine.bm25_topk("") == []
        assert t1_engine.ref_cosine_topk("123 ,,,") == []

    def test_batch_equals_single(self, t1_engine, queries):
        qs = queries[:10]
        batch_bm = t1_engine.batch(qs, scorer="bm25")
        batch_rc = t1_engine.batch(qs, scorer="ref")
        for q, bb, br in zip(qs, batch_bm, batch_rc):
            assert _ids(bb) == _ids(t1_engine.bm25_topk(q))
            assert _ids(br) == _ids(t1_engine.ref_cosine_topk(q))

    def test_actor_count_invariance(self, t1_index, t1_engine, queries):
        """Same results with 1, 2 and 4 scorer actors — including the
        sharded A8 membership decision (OR of has_terms across the
        pool), which must erase the same terms at every actor count."""
        from searchenginesimple_ray.pipelines.query import QueryEngine
        eng4 = QueryEngine(t1_index["dir"], num_actors=4,
                           num_cpus_per_actor=0.5)
        eng1 = QueryEngine(t1_index["dir"], num_actors=1,
                           num_cpus_per_actor=0.5)
        try:
            for q in queries[:15]:
                want_bm = _ids(t1_engine.bm25_topk(q))
                want_rc = _ids(t1_engine.ref_cosine_topk(q))
                for eng in (eng1, eng4):
                    assert _ids(eng.bm25_topk(q)) == want_bm
                    assert _ids(eng.ref_cosine_topk(q)) == want_rc
        finally:
            eng4.shutdown()
            eng1.shutdown()

    def test_membership_memo_semantics(self, t1_index, t1_engine):
        """The driver holds NO vocabulary set: membership verdicts are
        served by the shard actors and memoized per queried term only."""
        from searchenginesimple_ray.pipelines.query import QueryEngine
        eng = QueryEngine(t1_index["dir"], num_actors=4,
                          num_cpus_per_actor=0.5)
        try:
            from searchenginesimple_ray.functions.tokenize import \
                ref_transform
            from searchenginesimple_ray.sources.transcripts import \
                make_vocab
            hot = ref_transform(make_vocab(5000, 42)[0])
            assert eng._vocab_memo == {}   # no O(vocab) driver state
            present = eng._filter_global([hot, "zzzzabsent"])
            assert present == {hot}
            assert eng._vocab_memo == {hot: True, "zzzzabsent": False}
            # a mixed query drops only the absent term (A8), and the
            # result matches the baseline engine's decision
            q = f"{hot} zzzzabsent"
            assert _ids(eng.bm25_topk(q)) == _ids(t1_engine.bm25_topk(q))
            assert len(_ids(eng.bm25_topk(q))) > 0
        finally:
            eng.shutdown()

    def test_query_weight_vector_signs(self):
        raw, w = query_weight_vector("hello world hello")
        # IDF=-1 => negative weights, L2-normalized
        assert all(v < 0 for v in w.values())
        assert abs(sum(v * v for v in w.values()) - 1.0) < 1e-12
        assert w["hello"] < w["world"]  # tf 2 => more negative


class TestWandEpsTies:
    """Regression for the review-found heap defect: a raw score within
    EPS below the k-th must survive WAND and win the quantized doc_id
    tiebreak, exactly as the exhaustive EPS-band path ranks it."""

    def test_sub_eps_tie_kept(self, t1_index):
        import numpy as np

        from searchenginesimple_ray.pipelines.query import ScorerCore
        core = ScorerCore(t1_index["dir"], list(range(8)))
        term = max(core.postings, key=lambda t: len(core.postings[t][0]))
        ids, _ = core.postings[term]
        if len(ids) < 4:
            pytest.skip("needs a term with several postings")
        # force k-1 clear winners plus two sub-EPS-tied docs where the
        # LOWER raw score has the SMALLER doc id (quantized tie -> it
        # must rank above)
        s = core.scores[term].copy()
        try:
            core.scores[term][:] = 1e-6
            k = 3
            hi = np.argsort(ids)[-1]       # biggest doc id
            lo = np.argsort(ids)[0]        # smallest doc id
            mid = np.argsort(ids)[len(ids) // 2]
            core.scores[term][mid] = 5.0               # clear winner
            core.scores[term][hi] = 1.0                # k-th raw score
            core.scores[term][lo] = 1.0 - 5e-10        # sub-EPS below
            # keep block upper bounds consistent with the doctored
            # scores (the ctor computes them the same way)
            core.block_max[term] = np.maximum.reduceat(
                core.scores[term],
                np.arange(0, len(s), core.block_size))
            a = core.bm25_local_topk([(term, 1)], k, conjunctive=False,
                                     method="pruned")
            b = core.bm25_local_topk([(term, 1)], k, conjunctive=False,
                                     method="exhaustive")
            assert a == b
            got_ids = [d for _, d in a]
            assert int(ids[lo]) in got_ids     # the sub-EPS tie survived
        finally:
            core.scores[term] = s

"""§2.9 user-extension surface: the stage registry actually injects.

The reference only sketches these hooks (abstract ``SplitTool::cut``
`include/Dictionary/SplitTool.hpp:7-10`, DI loader
`KeyRecommander.hpp:19-23`, unused MapReduce ``mapf``/``reducef``
`src/MapReduce/woker.cc:78-82`); here each registry kind is proven
end-to-end: a swapped tokenizer changes the built index, a swapped
dedup policy changes the drop set, and a user-registered scorer
dispatches through ``QueryEngine.topk``.
"""

from __future__ import annotations

import shutil

import pyarrow.parquet as pq
import pytest

from searchenginesimple_ray import registry

TEST_ROOT = "/tmp/sesr_pytest"


def test_resolve_unknown_raises_with_available():
    with pytest.raises(KeyError, match="bm25"):
        registry.resolve("scorer", "nope")
    with pytest.raises(ValueError):
        registry.resolve("frobnicator", "x")
    assert "ref" in registry.available("tokenizer")
    assert {"bm25", "ref_cosine"} <= set(registry.available("scorer"))
    assert {"simhash", "none", "exact_simhash"} <= set(
        registry.available("dedup"))


def test_whitespace_tokenizer_counts():
    tok = registry.resolve("tokenizer", "whitespace")(
        stop_words=("the",))
    c = tok.doc_counts("The quick brown fox the THE quick")
    assert c == {"quick": 2, "brown": 1, "fox": 1}


def _build(corpus, cfg, name):
    from searchenginesimple_ray.pipelines.index_build import build_index
    from searchenginesimple_ray.sources.transcripts import transcripts_files
    out = f"{TEST_ROOT}/idx_registry_{name}"
    shutil.rmtree(out, ignore_errors=True)
    res = build_index(transcripts_files(corpus), out, cfg)
    return out, res


class TestInjectedBuild:
    def test_custom_tokenizer_injects_end_to_end(self, t1_corpus, t1_index):
        """A tokenizer registered IN THE TEST (so only cloudpickle
        by-value shipping can get it to workers) flows through
        cfg.tokenizer -> prep actors -> term_df: every doc gets a
        marker term, so df(marker) == n_docs."""
        from searchenginesimple_ray.config import EngineConfig
        from searchenginesimple_ray.stages.tokenizer import TokenCounter

        @registry.register("tokenizer", "_test_marker")
        def marker_factory(stop_words=(), apply_stop=True):
            class MarkerCounter(TokenCounter):
                def doc_counts(self, text):
                    c = super().doc_counts(text)
                    c["zzzmarker"] += 1
                    return c
            return MarkerCounter(stop_words=stop_words,
                                 apply_stop=apply_stop)

        try:
            cfg = EngineConfig(num_input_buckets=2, num_doc_shards=2,
                               tokenizer="_test_marker")
            out, res = _build(t1_corpus, cfg, "marker")
            df = pq.read_table(
                f"{out}/term_df/term_df.parquet").to_pandas()
            row = df[df.term == "zzzmarker"]
            assert len(row) == 1 and int(row.df.iloc[0]) == res.n_docs
            # swapped stage => different fingerprint => lineage rebuilds
            assert cfg.fingerprint() != t1_index["cfg"].fingerprint()
        finally:
            registry._REGISTRIES["tokenizer"].pop("_test_marker", None)

    def test_none_dedup_policy_drops_nothing(self, t1_corpus, t1_index):
        from searchenginesimple_ray.config import EngineConfig
        cfg = EngineConfig(num_input_buckets=2, num_doc_shards=2,
                           dedup_policy="none")
        out, res = _build(t1_corpus, cfg, "nodedup")
        assert res.n_dropped == 0
        # the default simhash policy does drop near-dups on this corpus
        assert t1_index["result"].n_dropped > 0


class TestInjectedScorer:
    def test_topk_dispatches_builtins(self, t1_engine):
        q = "missing term query"
        assert t1_engine.topk(q, scorer="bm25") == t1_engine.bm25_topk(q)

    def test_custom_scorer_roundtrip(self, t1_engine):
        @registry.register("scorer", "_test_const")
        def const_scorer(engine, sentence, k=None):
            return [{"rank": 0, "doc_id": -1, "score": 42.0,
                     "echo": sentence}]

        try:
            out = t1_engine.topk("hello", scorer="_test_const")
            assert out[0]["score"] == 42.0 and out[0]["echo"] == "hello"
            # batch() falls back to per-query dispatch for custom names
            b = t1_engine.batch(["a", "b"], scorer="_test_const")
            assert [r[0]["echo"] for r in b] == ["a", "b"]
        finally:
            registry._REGISTRIES["scorer"].pop("_test_const", None)

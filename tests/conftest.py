"""Shared fixtures.  Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import shutil

import pytest

import ray

TEST_ROOT = "/tmp/sesr_pytest"


@pytest.fixture(scope="session")
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # cap Dataset execution at 3 of the 4 session CPUs: the
    # session-scoped t1_engine holds 1 CPU (2 x 0.5 scorer actors) for
    # the whole run, and an UNCAPPED autoscaling actor pool
    # (concurrency=(1, 4)) can grab all 3 remaining CPUs and starve
    # its own upstream read task — a rare but observed full-suite
    # deadlock.  With the cap, every pipeline's pool + read fits.
    try:                                  # private Ray API — may move
        from ray.data._internal.execution.interfaces import (
            ExecutionResources)
        ctx.execution_options.resource_limits = ExecutionResources(cpu=3)
    except (ImportError, TypeError, AttributeError):
        pass                              # degrade to uncapped execution
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def t1_corpus(ray_session):
    """Deterministic t1 corpus (~2k turns)."""
    from searchenginesimple_ray.sources.transcripts import generate_transcripts
    return generate_transcripts(f"{TEST_ROOT}/corpus_t1", n_convs=200, seed=42)


@pytest.fixture(scope="session")
def t1_index(t1_corpus):
    """Index built once over the t1 corpus (small shard counts)."""
    from searchenginesimple_ray.config import EngineConfig
    from searchenginesimple_ray.pipelines.index_build import build_index
    from searchenginesimple_ray.sources.transcripts import transcripts_files
    cfg = EngineConfig(num_input_buckets=3, num_doc_shards=4)
    out = f"{TEST_ROOT}/idx_t1"
    shutil.rmtree(out, ignore_errors=True)
    res = build_index(transcripts_files(t1_corpus), out, cfg)
    return {"dir": out, "cfg": cfg, "result": res, "corpus": t1_corpus}


@pytest.fixture(scope="session")
def t1_oracle(t1_index):
    """Oracle index over the same raw docs (independent brute force)."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from searchenginesimple_ray.oracle.pyoracle import OracleIndex
    docs_raw = pd.concat([
        pq.read_table(f).to_pandas() for f in sorted(
            glob.glob(f"{t1_index['dir']}/docs_raw/**/*.parquet",
                      recursive=True))])
    cfg = t1_index["cfg"]
    return OracleIndex(list(zip(docs_raw.doc_id, docs_raw.text)),
                       stop_words=cfg.stop_words, min_text_len=0,
                       simhash_top_n=cfg.simhash_top_n,
                       hamming_threshold=cfg.hamming_threshold,
                       bm25_k1=cfg.bm25_k1, bm25_b=cfg.bm25_b)


@pytest.fixture(scope="session")
def t1_engine(t1_index):
    from searchenginesimple_ray.pipelines.query import QueryEngine
    # fractional CPUs: the 4-CPU test session must fit this pool PLUS the
    # temporary 4-actor pool of test_actor_count_invariance concurrently
    eng = QueryEngine(t1_index["dir"], num_actors=2, num_cpus_per_actor=0.5)
    yield eng
    eng.shutdown()

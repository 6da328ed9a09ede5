"""Checkpoint/resume (FIXTURES F5, north rule): a killed build resumes
without re-running sealed partitions, and the final index is identical
to an uninterrupted run."""

import glob
import json
import os
import shutil
import subprocess
import sys

import pandas as pd
import pyarrow.parquet as pq
import pytest

TEST_ROOT = "/tmp/sesr_pytest"

RUNNER = r"""
import sys, ray
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from searchenginesimple_ray.config import EngineConfig
from searchenginesimple_ray.pipelines.index_build import build_index
from searchenginesimple_ray.sources.transcripts import transcripts_files
cfg = EngineConfig(num_input_buckets=3, num_doc_shards=4)
res = build_index(transcripts_files(sys.argv[1]), sys.argv[2], cfg)
print("RUN:", ";".join(res.stages_run))
print("SKIPPED:", ";".join(res.stages_skipped))
ray.shutdown()
"""


_POSTING_COLS = ["term", "doc_shard", "salt", "df", "n_local",
                 "doc_ids_vb", "tfs_vb"]


def _postings_frame(d):
    # hive-partitioned read: doc_shard comes from the directory names
    t = pq.read_table(f"{d}/postings", columns=_POSTING_COLS)
    pdf = t.to_pandas()
    pdf["doc_shard"] = pdf["doc_shard"].astype(int)
    return pdf.sort_values(["term", "doc_shard", "salt"]).reset_index(drop=True)


@pytest.mark.slow
class TestResume:
    def test_rerun_skips_everything(self, t1_index):
        """Second run over an intact checkpoint tree recomputes nothing."""
        from searchenginesimple_ray.config import EngineConfig
        from searchenginesimple_ray.pipelines.index_build import build_index
        from searchenginesimple_ray.sources.transcripts import transcripts_files
        res = build_index(transcripts_files(t1_index["corpus"]),
                          t1_index["dir"], t1_index["cfg"])
        assert res.stages_run == []
        assert len(res.stages_skipped) >= 9

    def test_stale_partition_recomputed(self, t1_index):
        """Breaking ONE bucket's manifest re-runs only that partition and
        its downstream stages — sibling buckets are not re-tokenized."""
        from searchenginesimple_ray.pipelines.index_build import build_index
        from searchenginesimple_ray.sources.transcripts import transcripts_files
        os.remove(os.path.join(t1_index["dir"], "docs_raw", "bucket=1",
                               "_lineage.json"))
        os.remove(os.path.join(t1_index["dir"], "docs", "_lineage.json"))
        res = build_index(transcripts_files(t1_index["corpus"]),
                          t1_index["dir"], t1_index["cfg"])
        # only the broken prep bucket re-tokenizes; its deterministic
        # recompute re-seals the same manifest hash, so downstream
        # global stages stay skippable (except the one whose own
        # manifest was removed)
        assert "docs_raw/bucket=1" in res.stages_run
        assert "docs_raw/bucket=0" in res.stages_skipped
        assert "docs/global" in res.stages_run
        assert "dedup/global" in res.stages_skipped
        assert "term_df/global" in res.stages_skipped
        assert "postings/global" in res.stages_skipped

    def test_killed_run_resumes_identically(self, t1_corpus):
        """Kill the build after the first partitions are sealed; the resumed
        run skips them and produces a byte-identical postings set."""
        out_dir = f"{TEST_ROOT}/idx_resume"
        ref_dir = f"{TEST_ROOT}/idx_ref"
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(ref_dir, ignore_errors=True)
        env = dict(os.environ, PYTHONPATH="/root/repo")

        # uninterrupted reference run (fresh process; ray session separate)
        subprocess.run([sys.executable, "-c", RUNNER, t1_corpus, ref_dir],
                       env=env, check=True, capture_output=True, timeout=600)

        # interrupted run: kill once the first docs_raw bucket is sealed
        p = subprocess.Popen([sys.executable, "-c", RUNNER, t1_corpus,
                              out_dir], env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL)
        import time
        sealed = os.path.join(out_dir, "docs_raw", "bucket=0",
                              "_lineage.json")
        for _ in range(1200):
            if os.path.exists(sealed):
                break
            time.sleep(0.25)
        else:
            p.kill()
            pytest.fail("first partition never sealed")
        p.kill()
        p.wait()

        # resume in a fresh process
        out = subprocess.run([sys.executable, "-c", RUNNER, t1_corpus,
                              out_dir], env=env, check=True,
                             capture_output=True, text=True, timeout=600)
        lines = {l.split(":", 1)[0]: l.split(":", 1)[1].strip()
                 for l in out.stdout.splitlines() if ":" in l}
        skipped = lines.get("SKIPPED", "").split(";")
        assert "docs_raw/bucket=0" in skipped  # sealed partition reused

        a = _postings_frame(out_dir)
        b = _postings_frame(ref_dir)
        assert len(a) == len(b)
        for col in ("term", "doc_shard", "salt", "df", "n_local"):
            assert (a[col].to_numpy() == b[col].to_numpy()).all()
        assert (a.doc_ids_vb == b.doc_ids_vb).all()
        assert (a.tfs_vb == b.tfs_vb).all()

    def test_touched_input_invalidates_resume(self, ray_session):
        """A regenerated input whose SIZE happens to be unchanged must
        still invalidate the resume (fingerprints include mtime_ns —
        the round-1 gap let stale checkpoints pass silently)."""
        from searchenginesimple_ray.config import EngineConfig
        from searchenginesimple_ray.pipelines.index_build import build_index
        from searchenginesimple_ray.sources.transcripts import (
            generate_transcripts, transcripts_files)
        corp = generate_transcripts(f"{TEST_ROOT}/corpus_touch",
                                    n_convs=30, seed=9, n_files=2)
        out = f"{TEST_ROOT}/idx_touch"
        shutil.rmtree(out, ignore_errors=True)
        cfg = EngineConfig(num_input_buckets=2, num_doc_shards=2)
        files = transcripts_files(corp)
        build_index(files, out, cfg)
        os.utime(files[0])   # same bytes, new mtime
        res = build_index(files, out, cfg)
        assert any(s.startswith("docs_raw/") for s in res.stages_run)
        assert res.stages_skipped == []   # whole chain invalidated

    def test_changed_input_invalidates(self, t1_index, tmp_path):
        """A different input fingerprint must not reuse checkpoints."""
        from searchenginesimple_ray.state import lineage
        part = os.path.join(t1_index["dir"], "docs_raw", "bucket=0")
        m = lineage.read_manifest(part)
        assert lineage.is_complete(part, "docs_raw",
                                   m["input_fingerprint"],
                                   m["config_fingerprint"])
        assert not lineage.is_complete(part, "docs_raw", "DIFFERENT",
                                       m["config_fingerprint"])
        assert not lineage.is_complete(part, "docs_raw",
                                       m["input_fingerprint"], "DIFFERENT")

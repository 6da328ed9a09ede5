"""pipelines/index_build.append_index: incremental index append.

Parity contract: build(A) + append(B) must be value-identical to
build(A+B) when B's conv_ids sort after A's (same docid assignment);
appended near-dups of existing docs are dropped, never the existing
doc; appends are refused for already-indexed conversations and for
config mismatches; a completed append re-runs as a no-op.
"""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_corpus(path, conv_prefix, n_convs, seed, dup_text=None):
    """Deterministic transcript parquet; optionally append one conv
    whose single turn duplicates ``dup_text`` exactly."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i:02d}" for i in range(30)]
    rows = []
    for c in range(n_convs):
        conv = f"{conv_prefix}{c:04d}"
        for t in range(int(rng.integers(2, 6))):
            words = rng.choice(vocab, size=int(rng.integers(10, 18)))
            rows.append((conv, t, "user", " ".join(words), "", 0))
    if dup_text is not None:
        rows.append((f"{conv_prefix}9999", 0, "user", dup_text, "", 0))
    t = pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "tool": pa.array([r[4] for r in rows]),
        "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
    })
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(t, path)
    return path


def _read_dir(d, drop_cols=()):
    files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"),
                             recursive=True))
    pdf = pq.read_table(files).to_pandas()
    pdf = pdf.drop(columns=[c for c in drop_cols if c in pdf], errors="ignore")
    for c in pdf.columns:   # list columns (postings payloads) -> tuples
        if len(pdf) and isinstance(pdf[c].iloc[0], (np.ndarray, list)):
            pdf[c] = pdf[c].map(tuple)
    cols = sorted(pdf.columns)
    return pdf[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def _decoded_postings(index_dir):
    """term -> (sorted doc_ids tuple, tfs tuple, max stored df) with
    all physical rows (salt runs, append deltas) merged — the logical
    posting content the shard actors reconstruct."""
    from searchenginesimple_ray.functions.varbyte import decode_postings
    files = sorted(glob.glob(os.path.join(index_dir, "postings", "**",
                                          "*.parquet"), recursive=True))
    raw, df = {}, {}
    for f in files:
        t = pq.read_table(f, columns=["term", "df", "n_local",
                                      "doc_ids_vb", "tfs_vb"])
        for term, d, n, dvb, tvb in zip(t["term"].to_pylist(),
                                        t["df"].to_pylist(),
                                        t["n_local"].to_pylist(),
                                        t["doc_ids_vb"].to_pylist(),
                                        t["tfs_vb"].to_pylist()):
            ids, tfs = decode_postings(dvb, tvb, int(n))
            raw.setdefault(term, []).append((ids, tfs))
            df[term] = max(df.get(term, 0), int(d))
    out = {}
    for term, runs in raw.items():
        ids = np.concatenate([r[0] for r in runs]).astype(np.int64)
        tfs = np.concatenate([r[1] for r in runs])
        o = np.argsort(ids)
        out[term] = (tuple(ids[o]), tuple(tfs[o]), df[term])
    return out


@pytest.fixture(scope="module")
def cfg():
    from searchenginesimple_ray.config import EngineConfig
    return EngineConfig(num_input_buckets=2, num_doc_shards=2,
                        min_text_len=1)


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    root = tmp_path_factory.mktemp("append_corpora")
    fa = _write_corpus(str(root / "a" / "a.parquet"), "conva", 30, 1)
    fb = _write_corpus(str(root / "b" / "b.parquet"), "convb", 20, 2)
    return str(root), fa, fb


class TestAppendParity:
    def test_append_equals_full_rebuild(self, ray_session, corpora, cfg,
                                        tmp_path_factory):
        from searchenginesimple_ray.pipelines.index_build import (
            append_index, build_index)
        root, fa, fb = corpora
        full_dir = str(tmp_path_factory.mktemp("idx_full"))
        incr_dir = str(tmp_path_factory.mktemp("idx_incr"))
        r_full = build_index([fa, fb], full_dir, cfg)
        build_index([fa], incr_dir, cfg)
        r_app = append_index([fb], incr_dir, cfg)
        # only the new bucket(s) were prepped in the append
        assert all(k.startswith(("conv_bases", "docs_raw/bucket=app-",
                                 "dedup", "docs_append", "term_df",
                                 "doc_stats", "postings_append"))
                   for k in r_app.stages_run)
        assert any("bucket=app-" in k for k in r_app.stages_run)
        # meta parity
        mf = json.load(open(os.path.join(full_dir, "meta.json")))
        mi = json.load(open(os.path.join(incr_dir, "meta.json")))
        for k in ["n_docs", "n_docs_raw", "n_terms", "avgdl",
                  "n_docs_with_terms", "n_dropped"]:
            assert mf[k] == mi[k], k
        # stage-for-stage value parity (postings physical rows differ —
        # the delta lives in appended rows — compared DECODED below)
        for sub in ["term_df", "doc_stats", "docs", "dedup"]:
            f = _read_dir(os.path.join(full_dir, sub),
                          drop_cols=("applied",))
            i = _read_dir(os.path.join(incr_dir, sub),
                          drop_cols=("applied",))
            pd.testing.assert_frame_equal(f, i, check_dtype=False)
        assert _decoded_postings(full_dir) == _decoded_postings(incr_dir)
        # query parity
        from searchenginesimple_ray.pipelines.query import QueryEngine
        ef = QueryEngine(full_dir, num_actors=2)
        ei = QueryEngine(incr_dir, num_actors=2)
        try:
            for q in ["w01 w02", "w10", "w05 w17 w23"]:
                assert ef.bm25_topk(q) == ei.bm25_topk(q)
        finally:
            ef.shutdown()
            ei.shutdown()

    def test_append_noop_on_rerun(self, ray_session, corpora, cfg):
        from searchenginesimple_ray.pipelines.index_build import append_index
        root, fa, fb = corpora
        # idx_incr from the previous test is gone (function-scoped
        # tmp); rebuild a fresh one here
        import tempfile
        from searchenginesimple_ray.pipelines.index_build import build_index
        d = tempfile.mkdtemp(prefix="idx_noop_")
        build_index([fa], d, cfg)
        r1 = append_index([fb], d, cfg)
        assert any("bucket=app-" in k for k in r1.stages_run)
        r2 = append_index([fb], d, cfg)
        # second identical append: prep buckets skip (sealed), docids
        # unchanged (resume path), downstream skips too
        assert not any("bucket=app-" in k for k in r2.stages_run)
        assert r2.n_docs == r1.n_docs and r2.n_terms == r1.n_terms


class TestAppendDedupAndGuards:
    def test_cross_set_duplicate_drops_new_doc(self, ray_session, cfg,
                                               tmp_path_factory):
        from searchenginesimple_ray.pipelines.index_build import (
            append_index, build_index)
        root = tmp_path_factory.mktemp("dupcase")
        dup = " ".join(f"w{i:02d}" for i in range(12))
        fa = _write_corpus(str(root / "a.parquet"), "conva", 10, 3,
                           dup_text=dup)
        fb = _write_corpus(str(root / "b.parquet"), "convb", 5, 4,
                           dup_text=dup)
        d = str(tmp_path_factory.mktemp("idx_dup"))
        build_index([fa], d, cfg)
        old_drops = set(pq.read_table(
            os.path.join(d, "dedup", "drop_ids.parquet"))
            ["doc_id"].to_pylist())
        r = append_index([fb], d, cfg)
        drops = set(pq.read_table(
            os.path.join(d, "dedup", "drop_ids.parquet"))
            ["doc_id"].to_pylist())
        # the old duplicate's doc is still indexed; the appended twin
        # was dropped (its id is in the append range, above ceiling)
        from searchenginesimple_ray.pipelines.index_build import \
            _load_bases
        conv, base, _ = _load_bases(os.path.join(d, "conv_bases"))
        first_new_id = min(b for c, b in zip(conv, base)
                           if c.startswith("convb"))
        new_drops = drops - old_drops
        assert new_drops and all(i >= first_new_id for i in new_drops)
        docs = pq.read_table(os.path.join(d, "docs"),
                             columns=["text"])["text"].to_pylist()
        assert docs.count(dup) == 1

    def test_refuses_existing_conv_and_wrong_config(
            self, ray_session, cfg, tmp_path_factory):
        from searchenginesimple_ray.config import EngineConfig
        from searchenginesimple_ray.pipelines.index_build import (
            append_index, build_index)
        root = tmp_path_factory.mktemp("guards")
        fa = _write_corpus(str(root / "a.parquet"), "conva", 8, 5)
        fb = _write_corpus(str(root / "b.parquet"), "convb", 4, 6)
        fmix = _write_corpus(str(root / "mix.parquet"), "conva", 3, 7)
        d = str(tmp_path_factory.mktemp("idx_guard"))
        build_index([fa], d, cfg)
        with pytest.raises(ValueError, match="already indexed"):
            append_index([fmix, fb], d, cfg)
        with pytest.raises(ValueError, match="config"):
            append_index([fb], d, EngineConfig(num_input_buckets=2,
                                               num_doc_shards=4,
                                               min_text_len=1))
        with pytest.raises(FileNotFoundError):
            append_index([fb], str(root / "nothere"), cfg)


class TestChainedAppends:
    def test_two_appends_equal_full_rebuild(self, ray_session, cfg,
                                            tmp_path_factory):
        from searchenginesimple_ray.pipelines.index_build import (
            append_index, build_index)
        from searchenginesimple_ray.pipelines.query import QueryEngine
        root = tmp_path_factory.mktemp("chain")
        fa = _write_corpus(str(root / "a.parquet"), "conva", 15, 8)
        fb = _write_corpus(str(root / "b.parquet"), "convb", 10, 9)
        fc = _write_corpus(str(root / "c.parquet"), "convc", 8, 10)
        full_dir = str(tmp_path_factory.mktemp("idx_full3"))
        incr_dir = str(tmp_path_factory.mktemp("idx_incr3"))
        build_index([fa, fb, fc], full_dir, cfg)
        build_index([fa], incr_dir, cfg)
        append_index([fb], incr_dir, cfg)
        append_index([fc], incr_dir, cfg)
        mf = json.load(open(os.path.join(full_dir, "meta.json")))
        mi = json.load(open(os.path.join(incr_dir, "meta.json")))
        for k in ["n_docs", "n_docs_raw", "n_terms", "avgdl",
                  "n_dropped"]:
            assert mf[k] == mi[k], k
        assert len(mi["appended"]) == 2
        for sub in ["term_df", "doc_stats", "docs"]:
            f = _read_dir(os.path.join(full_dir, sub),
                          drop_cols=("applied",))
            i = _read_dir(os.path.join(incr_dir, sub),
                          drop_cols=("applied",))
            pd.testing.assert_frame_equal(f, i, check_dtype=False)
        assert _decoded_postings(full_dir) == _decoded_postings(incr_dir)
        ef = QueryEngine(full_dir, num_actors=2)
        ei = QueryEngine(incr_dir, num_actors=2)
        try:
            for q in ["w01 w02", "w29", "w05 w17"]:
                assert ef.bm25_topk(q) == ei.bm25_topk(q)
        finally:
            ef.shutdown()
            ei.shutdown()


class TestAppendSafetyGuards:
    """Review-found hazards: duplication and ceiling-revert refusals,
    and crash-window recovery of in-place-merged stages."""

    def test_modified_files_full_overlap_refused(self, ray_session, cfg,
                                                 tmp_path_factory):
        from searchenginesimple_ray.pipelines.index_build import (
            append_index, build_index)
        root = tmp_path_factory.mktemp("touchcase")
        fa = _write_corpus(str(root / "a.parquet"), "conva", 8, 11)
        fb = _write_corpus(str(root / "b.parquet"), "convb", 4, 12)
        d = str(tmp_path_factory.mktemp("idx_touch"))
        build_index([fa], d, cfg)
        append_index([fb], d, cfg)
        # same conversations, changed fingerprint (mtime) -> refused,
        # NOT treated as a resume (would duplicate every doc_id)
        os.utime(fb, (1, 1))
        with pytest.raises(ValueError, match="duplicate"):
            append_index([fb], d, cfg)

    def test_full_build_into_appended_dir_refused(self, ray_session, cfg,
                                                  tmp_path_factory):
        from searchenginesimple_ray.pipelines.index_build import (
            append_index, build_index)
        root = tmp_path_factory.mktemp("rebuildcase")
        fa = _write_corpus(str(root / "a.parquet"), "conva", 8, 13)
        fb = _write_corpus(str(root / "b.parquet"), "convb", 4, 14)
        d = str(tmp_path_factory.mktemp("idx_rebuild"))
        build_index([fa], d, cfg)
        append_index([fb], d, cfg)
        with pytest.raises(ValueError, match="appended partitions"):
            build_index([fa], d, cfg)

    def test_atomic_dir_crash_window_recovery(self, tmp_path):
        """A kill between atomic_dir's two commit renames leaves the
        previous version parked; gc restores it."""
        from searchenginesimple_ray.state import lineage
        root = tmp_path / "idx"
        stage = root / "term_df"
        stage.mkdir(parents=True)
        (stage / "term_df.parquet").write_bytes(b"OLD")
        # simulate the window: previous version parked, final missing,
        # new version still in an uncommitted tmp dir
        os.rename(stage, root / "term_df.tmp-old-deadbeef")
        (root / "term_df.tmp-cafe0001").mkdir()
        (root / "term_df.tmp-cafe0001" / "term_df.parquet") \
            .write_bytes(b"NEW-UNCOMMITTED")
        lineage.gc_tmp_dirs(str(root))
        assert (stage / "term_df.parquet").read_bytes() == b"OLD"
        assert not (root / "term_df.tmp-cafe0001").exists()
        assert not (root / "term_df.tmp-old-deadbeef").exists()
        # committed case: final exists -> parked copy is garbage
        os.makedirs(root / "docs.tmp-old-12345678")
        (root / "docs").mkdir()
        lineage.gc_tmp_dirs(str(root))
        assert (root / "docs").exists()
        assert not (root / "docs.tmp-old-12345678").exists()


class TestKeyIndexedAppend:
    """dedup_key_index=True: persisted sorted key runs + delta-probe
    append with arrival-order verdict semantics."""

    @pytest.fixture(scope="class")
    def cfg_ki(self):
        from searchenginesimple_ray.config import EngineConfig
        return EngineConfig(num_input_buckets=2, num_doc_shards=2,
                            min_text_len=1, dedup_key_index=True)

    def test_delta_append_matches_full_rebuild(self, ray_session, cfg_ki,
                                               tmp_path_factory):
        from searchenginesimple_ray.pipelines.index_build import (
            append_index, build_index)
        from searchenginesimple_ray.pipelines.query import QueryEngine
        from searchenginesimple_ray.state import lineage
        root = tmp_path_factory.mktemp("ki")
        dup = " ".join(f"w{i:02d}" for i in range(12))
        fa = _write_corpus(str(root / "a.parquet"), "conva", 25, 21,
                           dup_text=dup)
        fb = _write_corpus(str(root / "b.parquet"), "convb", 15, 22,
                           dup_text=dup)
        full_dir = str(tmp_path_factory.mktemp("idx_ki_full"))
        incr_dir = str(tmp_path_factory.mktemp("idx_ki_incr"))
        build_index([fa, fb], full_dir, cfg_ki)
        build_index([fa], incr_dir, cfg_ki)
        # key runs persisted by the build
        runs = glob.glob(os.path.join(incr_dir, "dedup", "keys",
                                      "band=*", "run-full.parquet"))
        assert len(runs) == 20
        k0 = pq.read_table(runs[0], columns=["key"])["key"].to_numpy()
        assert (np.diff(k0) >= 0).all()
        append_index([fb], incr_dir, cfg_ki)
        m = lineage.read_manifest(os.path.join(incr_dir, "dedup"))
        assert m["extra"]["mode"] == "delta"
        assert m["extra"]["delta_edges"] >= 1   # the cross-set dup
        # delta run appended alongside the hardlinked full run
        b0 = os.path.join(incr_dir, "dedup", "keys", "band=0")
        assert len(glob.glob(os.path.join(b0, "*.parquet"))) == 2
        # verdict + content + query parity (corpus has no bridge case,
        # so arrival-order and global-CC verdicts coincide)
        df = pq.read_table(os.path.join(full_dir, "dedup",
                                        "drop_ids.parquet")).to_pandas()
        di = pq.read_table(os.path.join(incr_dir, "dedup",
                                        "drop_ids.parquet")).to_pandas()
        assert df["doc_id"].tolist() == di["doc_id"].tolist()
        for sub in ["term_df", "doc_stats", "docs"]:
            f = _read_dir(os.path.join(full_dir, sub),
                          drop_cols=("applied",))
            i = _read_dir(os.path.join(incr_dir, sub),
                          drop_cols=("applied",))
            pd.testing.assert_frame_equal(f, i, check_dtype=False)
        assert _decoded_postings(full_dir) == _decoded_postings(incr_dir)
        ef = QueryEngine(full_dir, num_actors=2)
        ei = QueryEngine(incr_dir, num_actors=2)
        try:
            for q in ["w01 w02", "w10"]:
                assert ef.bm25_topk(q) == ei.bm25_topk(q)
        finally:
            ef.shutdown()
            ei.shutdown()

    def test_bridge_drops_only_the_new_doc(self, ray_session, tmp_path):
        """A delta doc within hamming<=3 of TWO distinct old docs
        (themselves >3 apart) is dropped; both old docs stay —
        arrival-order semantics."""
        from searchenginesimple_ray.stages.dedup import (
            components_min_rep, simhash_delta_edges, write_band_key_runs)
        import ray as _ray
        a = np.uint64(0)
        b = np.uint64((1 << 6) - 1)          # hamming(a,b)=6
        n = np.uint64((1 << 3) - 1)          # 3 from a, 3 from b
        keys_dir = str(tmp_path / "keys")
        cons = _ray.put((np.array([a, b], np.uint64),
                         np.array([1, 2], np.int64)))
        write_band_key_runs(cons, 3, keys_dir, "run-full")
        edges = simhash_delta_edges(keys_dir, np.array([n], np.uint64),
                                    np.array([100], np.int64), 3)
        got = {(r.src, r.dst) for r in edges.itertuples()}
        assert got == {(1, 100), (2, 100)}
        rep = components_min_rep(edges)
        ceiling = 100
        drop_new = sorted(d for d, r in rep.items()
                          if d != r and d >= ceiling)
        assert drop_new == [100]             # 2 is NOT dropped
        # (a from-scratch global-CC rebuild would merge {1,2,100} and
        # drop 2 as well — the documented divergence)
        assert rep.get(2) == 1

    def test_delta_probe_row_group_pruning_correct(self, ray_session,
                                                   tmp_path,
                                                   monkeypatch):
        """Tiny row groups force the pruning path; matches stay exact."""
        import ray as _ray

        from searchenginesimple_ray.stages import dedup as dd
        monkeypatch.setattr(dd, "KEY_RUN_ROW_GROUP", 8)
        rng = np.random.default_rng(4)
        old_h = rng.integers(0, 2**63, 200).astype(np.uint64) << np.uint64(1)
        old_d = np.arange(200, dtype=np.int64)
        keys_dir = str(tmp_path / "keys")
        cons = _ray.put((old_h, old_d))
        dd.write_band_key_runs(cons, 3, keys_dir, "run-full")
        # delta: exact copies of two old fingerprints + one novel
        new_h = np.array([old_h[7], old_h[150],
                          np.uint64(0xDEADBEEF) << np.uint64(8)],
                         np.uint64)
        new_d = np.array([1000, 1001, 1002], np.int64)
        edges = dd.simhash_delta_edges(keys_dir, new_h, new_d, 3)
        got = {(r.src, r.dst) for r in edges.itertuples()}
        assert (7, 1000) in got and (150, 1001) in got
        assert not any(1002 in e for e in got)


class TestCompaction:
    def test_compact_after_appends_preserves_content(
            self, ray_session, tmp_path_factory):
        from searchenginesimple_ray.config import EngineConfig
        from searchenginesimple_ray.pipelines.index_build import (
            append_index, build_index, compact_index)
        from searchenginesimple_ray.pipelines.query import QueryEngine
        cfg = EngineConfig(num_input_buckets=2, num_doc_shards=2,
                           min_text_len=1, dedup_key_index=True)
        root = tmp_path_factory.mktemp("compact")
        fa = _write_corpus(str(root / "a.parquet"), "conva", 20, 31)
        fb = _write_corpus(str(root / "b.parquet"), "convb", 10, 32)
        fc = _write_corpus(str(root / "c.parquet"), "convc", 8, 33)
        d = str(tmp_path_factory.mktemp("idx_compact"))
        build_index([fa], d, cfg)
        append_index([fb], d, cfg)
        before = _decoded_postings(d)
        eng = QueryEngine(d, num_actors=2)
        try:
            q_before = {q: eng.bm25_topk(q)
                        for q in ["w01 w02", "w10", "w05 w17"]}
        finally:
            eng.shutdown()
        stats = compact_index(d, cfg)
        assert stats["rows_after"] < stats["rows_before"]
        assert stats["key_runs_merged"] >= 2
        # one physical row per (term, doc_shard) now
        for sd in glob.glob(os.path.join(d, "postings", "doc_shard=*")):
            t = pq.read_table(glob.glob(os.path.join(sd, "*.parquet")))
            terms = t["term"].to_pylist()
            assert len(terms) == len(set(terms))
        assert _decoded_postings(d) == before
        # single merged key run per band
        for bd in glob.glob(os.path.join(d, "dedup", "keys", "band=*")):
            assert len(glob.glob(os.path.join(bd, "*.parquet"))) == 1
        eng = QueryEngine(d, num_actors=2)
        try:
            for q, want in q_before.items():
                assert eng.bm25_topk(q) == want
        finally:
            eng.shutdown()
        # a further append on the compacted index still works
        r = append_index([fc], d, cfg)
        assert r.n_docs > 0
        eng = QueryEngine(d, num_actors=2)
        try:
            assert isinstance(eng.bm25_topk("w01"), list)
        finally:
            eng.shutdown()

    def test_compact_preserves_hot_term_salting(self, ray_session,
                                                tmp_path_factory):
        """Compaction must NOT undo the hot-term payload bound: a term
        whose merged local postings exceed hot_term_df_threshold is
        re-split into salted rows, not one giant varbyte row."""
        from searchenginesimple_ray.config import EngineConfig
        from searchenginesimple_ray.pipelines.index_build import (
            append_index, build_index, compact_index)
        from searchenginesimple_ray.pipelines.query import QueryEngine
        thr = 5
        cfg = EngineConfig(num_input_buckets=2, num_doc_shards=2,
                           min_text_len=1, hot_term_df_threshold=thr)
        root = tmp_path_factory.mktemp("compact_hot")
        fa = _write_corpus(str(root / "a.parquet"), "conva", 25, 41)
        fb = _write_corpus(str(root / "b.parquet"), "convb", 12, 42)
        d = str(tmp_path_factory.mktemp("idx_compact_hot"))
        build_index([fa], d, cfg)
        append_index([fb], d, cfg)
        before = _decoded_postings(d)
        compact_index(d, cfg)
        assert _decoded_postings(d) == before
        post = pq.read_table(os.path.join(d, "postings")).to_pandas()
        # every row's payload stays bounded (modulo split is near-even
        # on dense per-shard doc ids; 2x covers the worst imbalance)
        assert post["n_local"].max() <= 2 * thr
        per = post.groupby(["term", "doc_shard"])["salt"].nunique()
        assert per.max() >= 2, "no hot term kept >1 salted row"
        eng = QueryEngine(d, num_actors=2)
        try:
            got = eng.bm25_topk("w01 w02")
            assert len(got) > 0
        finally:
            eng.shutdown()

"""Index-build pipeline correctness (SURVEY §7.2 steps 2-4).

Key invariant (BASELINE.json input_hint): for every surviving doc,
``docs.text`` equals the source ``transcripts.text`` at its
``(conv_id, turn_idx)`` under stable turn ordering.
"""

import glob
import json

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from searchenginesimple_ray.functions.varbyte import decode_postings


def _read_dir(d):
    files = sorted(glob.glob(f"{d}/**/*.parquet", recursive=True))
    return pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)


def _read_corpus(corpus_dir):
    from searchenginesimple_ray.sources.transcripts import transcripts_files
    return pd.concat([pq.read_table(f).to_pandas()
                      for f in transcripts_files(corpus_dir)],
                     ignore_index=True)


@pytest.fixture(scope="module")
def built(t1_index):
    return t1_index


class TestDocPrep:
    def test_short_texts_dropped(self, built, t1_corpus):
        src = _read_corpus(t1_corpus)
        n_long = int((src.text.str.len() >= 10).sum())
        assert built["result"].n_docs_raw == n_long

    def test_doc_ids_follow_sorted_order(self, built):
        """doc_id order == lexicographic (conv_id, turn_idx) order (A5)."""
        docs = _read_dir(f"{built['dir']}/docs_raw")
        docs = docs.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        assert docs.doc_id.is_monotonic_increasing
        assert docs.doc_id.is_unique

    def test_per_turn_text_equality(self, built, t1_corpus):
        """The input_hint per-row invariant."""
        src = _read_corpus(t1_corpus)
        docs = _read_dir(f"{built['dir']}/docs")
        merged = docs.merge(src[["conv_id", "turn_idx", "text"]],
                            on=["conv_id", "turn_idx"], suffixes=("", "_src"))
        assert len(merged) == len(docs)
        assert (merged.text == merged.text_src).all()


class TestDedup:
    def test_truth_duplicates_deduplicated(self, built, t1_corpus):
        """Every injected duplicate pair ends in the same cluster: at most
        one of (dup, src) survives into the docs table."""
        truth = pq.read_table(
            f"{t1_corpus}/_truth_duplicates.parquet").to_pandas()
        docs = _read_dir(f"{built['dir']}/docs")
        alive = set(zip(docs.conv_id, docs.turn_idx))
        for _, r in truth.iterrows():
            dup = (r.dup_conv_id, r.dup_turn_idx)
            src = (r.src_conv_id, r.src_turn_idx)
            assert not (dup in alive and src in alive), \
                f"duplicate pair both alive: {dup} {src} ({r.kind})"

    def test_no_surviving_near_pairs(self, built):
        """After dedup no two surviving docs are within hamming<=3
        (verified brute-force — the banded shuffle may not miss pairs)."""
        from searchenginesimple_ray.functions.hashing import hamming64
        docs = _read_dir(f"{built['dir']}/docs")
        h = docs.simhash.to_numpy().astype(np.uint64)
        h = h[h != 0]
        ii, jj = np.triu_indices(len(h), k=1)
        d = hamming64(h[ii], h[jj])
        assert int((d <= 3).sum()) == 0

    def test_counts_consistent(self, built):
        r = built["result"]
        assert r.n_docs == r.n_docs_raw - r.n_dropped


class TestPostings:
    def test_postings_match_oracle(self, built, t1_oracle):
        """Decoded postings == oracle dict-of-dicts postings, exactly."""
        po = _read_dir(f"{built['dir']}/postings")
        # regroup salted/sharded rows per term
        got: dict[str, dict[int, int]] = {}
        for _, row in po.iterrows():
            ids, tfs = decode_postings(bytes(row.doc_ids_vb),
                                       bytes(row.tfs_vb), int(row.n_local))
            m = got.setdefault(row.term, {})
            for d, t in zip(ids.tolist(), tfs.tolist()):
                assert d not in m
                m[d] = t
        assert set(got) == set(t1_oracle.postings)
        for term, m in got.items():
            assert m == t1_oracle.postings[term], term

    def test_df_is_global(self, built, t1_oracle):
        po = _read_dir(f"{built['dir']}/postings")
        df_by_term = po.groupby("term")["df"].first()
        for term, df in df_by_term.items():
            assert df == t1_oracle.df[term]
        # and the sum of local posting lengths equals df
        nloc = po.groupby("term")["n_local"].sum()
        for term, n in nloc.items():
            assert n == t1_oracle.df[term]

    def test_term_shard_parity(self, built):
        from searchenginesimple_ray.functions.hashing import shard_of_term
        po = _read_dir(f"{built['dir']}/postings").head(500)
        for _, row in po.iterrows():
            assert row.term_shard == shard_of_term(row.term, 10)

    def test_doc_shard_layout(self, built):
        """Each posting row's doc_ids all belong to its doc_shard."""
        D = built["cfg"].num_doc_shards
        for shard in range(D):
            files = glob.glob(
                f"{built['dir']}/postings/doc_shard={shard}/*.parquet")
            if not files:
                continue
            po = pd.concat([pq.read_table(f).to_pandas() for f in files])
            for _, row in po.head(200).iterrows():
                ids, _ = decode_postings(bytes(row.doc_ids_vb),
                                         bytes(row.tfs_vb), int(row.n_local))
                assert (ids % D == shard).all()


class TestDedupPathParity:
    def test_all_three_candidate_paths_agree(self, built):
        """driver lexsort, band-parallel tasks and distributed groupby
        must produce the same verified edge set."""
        import glob as g

        import ray.data
        from searchenginesimple_ray.stages.dedup import \
            simhash_near_dup_edges
        files = sorted(f for f in g.glob(
            f"{built['dir']}/docs_raw/**/*.parquet", recursive=True)
            if ".tmp-" not in f)

        def edges(**kw):
            ds = ray.data.read_parquet(files,
                                       columns=["doc_id", "simhash"])
            df = simhash_near_dup_edges(ds, threshold=3, **kw)
            return {(min(int(r.src), int(r.dst)),
                     max(int(r.src), int(r.dst)))
                    for r in df.itertuples()}

        e_driver = edges()
        e_band = edges(driver_limit=0)
        e_dist = edges(driver_limit=0, band_task_limit=0)
        assert e_band == e_driver
        assert e_dist == e_driver
        assert len(e_driver) > 0   # t1 corpus plants near-dups


class TestHotTermSalting:
    """Exercise the hot-term skew-split path end-to-end: with a tiny
    ``hot_term_df_threshold`` real terms salt into multiple posting
    sub-lists, and the scorer's salted-run merge must produce
    rank-identical results to an unsalted build of the same corpus."""

    @pytest.fixture(scope="class")
    def salted_index(self, t1_corpus):
        import shutil

        from searchenginesimple_ray.config import EngineConfig
        from searchenginesimple_ray.pipelines.index_build import build_index
        from searchenginesimple_ray.sources.transcripts import \
            transcripts_files
        cfg = EngineConfig(num_input_buckets=3, num_doc_shards=4,
                           hot_term_df_threshold=5)
        out = "/tmp/sesr_pytest/idx_t1_salted"
        shutil.rmtree(out, ignore_errors=True)
        build_index(transcripts_files(t1_corpus), out, cfg)
        return out

    def test_real_terms_salted(self, salted_index):
        # read the DIRECTORY so the hive doc_shard partition column
        # materializes (per-file reads lose it)
        post = pq.read_table(f"{salted_index}/postings").to_pandas()
        hot = post[post["salt"] > 0]
        assert len(hot), "no term salted despite threshold=5"
        # a hot term splits into >= 2 sub-lists within one doc shard
        per = post.groupby(["term", "doc_shard"])["salt"].nunique()
        assert per.max() >= 2

    def test_salted_ranks_identical(self, salted_index, t1_index):
        from searchenginesimple_ray.pipelines.query import QueryEngine
        from searchenginesimple_ray.sources.transcripts import \
            generate_queries
        eng_s = QueryEngine(salted_index, num_actors=2,
                            num_cpus_per_actor=0.5)
        eng_u = QueryEngine(t1_index["dir"], num_actors=2,
                            num_cpus_per_actor=0.5)
        try:
            for q in generate_queries():
                rs = eng_s.bm25_topk(q, k=10)
                ru = eng_u.bm25_topk(q, k=10)
                assert [r["doc_id"] for r in rs] == \
                    [r["doc_id"] for r in ru], q
                np.testing.assert_allclose(
                    [r["score"] for r in rs], [r["score"] for r in ru],
                    atol=1e-9)
        finally:
            eng_s.shutdown()
            eng_u.shutdown()


class TestDocStats:
    def test_doc_stats_match_oracle(self, built, t1_oracle):
        st = _read_dir(f"{built['dir']}/doc_stats")
        assert set(st.doc_id) == set(t1_oracle.doc_len)
        st = st.set_index("doc_id")
        for d, dl in t1_oracle.doc_len.items():
            assert st.loc[d, "doc_len"] == dl
        for d, nr in t1_oracle.ref_norm.items():
            assert abs(st.loc[d, "ref_norm"] - nr) < 1e-9

    def test_meta(self, built, t1_oracle):
        with open(f"{built['dir']}/meta.json") as f:
            meta = json.load(f)
        assert meta["n_docs"] == t1_oracle.n_docs
        assert abs(meta["avgdl"] - t1_oracle.avgdl) < 1e-9


class TestJsonlSource:
    """sources/transcripts.read_transcripts_jsonl: alternate ingest
    format normalized to the canonical input_hint schema."""

    def test_jsonl_normalizes_and_feeds_prep(self, ray_session, tmp_path):
        import json as _json

        import pyarrow as pa

        from searchenginesimple_ray.sources.transcripts import \
            read_transcripts_jsonl
        p = tmp_path / "t.jsonl"
        rows = [
            {"conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "hello there world", "tool": "",
             "ts": "2026-01-02T03:04:05"},
            {"conv_id": "c1", "turn_idx": 1, "role": "assistant",
             "text": "general reply text", "tool": "bash",
             "ts": 1767323045000000},
        ]
        # mixed ts types must live in separate files (a JSON column
        # has one inferred type per read)
        p.write_text("\n".join(_json.dumps(r) for r in rows[:1]))
        p2 = tmp_path / "t2.jsonl"
        p2.write_text("\n".join(_json.dumps(r) for r in rows[1:]))
        p3 = tmp_path / "t3.jsonl"
        p3.write_text(_json.dumps({
            "conv_id": "c2", "turn_idx": 0, "role": "user",
            "text": "fractional ts", "tool": "",
            "ts": "2026-01-02T03:04:05.123456"}))
        for path, want_ts in [(p, "2026-01-02T03:04:05"),
                              (p2, 1767323045000000),
                              (p3, "fractional")]:
            ds = read_transcripts_jsonl([str(path)])
            t = pa.Table.from_pandas(ds.to_pandas())
            assert [f.name for f in t.schema] == \
                ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            assert t["turn_idx"].type == pa.int32()
            assert pa.types.is_timestamp(t["ts"].type)
            assert t["ts"].null_count == 0


class TestCsvSource:
    """sources/transcripts.read_transcripts_csv: third ingest format,
    normalized to the canonical input_hint schema; also exercised
    end-to-end through the CLI build staging path."""

    def test_csv_normalizes(self, ray_session, tmp_path):
        import pyarrow as pa

        from searchenginesimple_ray.sources.transcripts import \
            read_transcripts_csv
        p = tmp_path / "t.csv"
        p.write_text(
            "conv_id,turn_idx,role,text,tool,ts\n"
            'c1,0,user,"hello there world",,2026-01-02T03:04:05\n'
            'c1,1,assistant,"general reply text",bash,'
            "2026-01-02T03:04:06.123456\n")
        ds = read_transcripts_csv([str(p)])
        t = pa.Table.from_pandas(ds.to_pandas())
        assert [f.name for f in t.schema] == \
            ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        assert t["turn_idx"].type == pa.int32()
        assert pa.types.is_timestamp(t["ts"].type)
        assert t["ts"].null_count == 0
        assert t["text"][0].as_py() == "hello there world"

    def test_cli_builds_from_csv(self, ray_session, tmp_path, capsys):
        import json as _json

        from searchenginesimple_ray.__main__ import main
        src = tmp_path / "csvcorpus"
        src.mkdir()
        lines = ["conv_id,turn_idx,role,text,tool,ts"]
        for c in range(6):
            for i in range(4):
                lines.append(
                    f"conv{c},{i},user,these are some tokens row "
                    f"{c} {i} extra words here,,"
                    f"2026-01-02T03:04:{10 + i:02d}")
        (src / "a.csv").write_text("\n".join(lines) + "\n")
        idx = str(tmp_path / "idx")
        assert main(["build", "--input", str(src), "--out", idx]) == 0
        built = _json.loads(capsys.readouterr().out.strip())
        assert built["n_docs"] > 0

"""Duplicate-span detection (stages/spans.py) and concat-and-chunk
sequence packing (stages/packing.py) vs brute-force Python oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _docs_ds(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}))


def _brute_dup_spans(rows, window=40, stride=10):
    wins = []   # (doc_id, pos, win)
    for did, tx in rows:
        if tx is None:
            continue
        for p in range(0, len(tx) - window + 1, stride):
            wins.append((did, p, tx[p:p + window]))
    by_win = {}
    for did, p, w in wins:
        by_win.setdefault(w, set()).add(did)
    out = [(did, p) for did, p, w in wins if len(by_win[w]) >= 2]
    return sorted(out)


class TestDupSpans:
    def test_matches_brute_force_synthetic(self, ray_session):
        from searchenginesimple_ray.stages.spans import dup_spans
        shared = "x" * 25 + "the quick brown fox jumps over the lazy dog"
        rows = [
            (1, "prefix one " + shared + " tail A"),
            (2, "another start " + shared + " suffix B"),
            (3, "totally unrelated content with no overlap at all here"),
            (4, "short"),                       # < window: no windows
            (5, shared),                        # aligned at 0
            (6, "zz" + shared + shared),        # repeats within one doc
        ]
        got = dup_spans(_docs_ds(rows), window=20, stride=5) \
            .to_pandas().sort_values(["doc_id", "pos"])
        want = _brute_dup_spans(rows, window=20, stride=5)
        assert list(map(tuple, got[["doc_id", "pos"]].values)) == want
        assert len(want) > 0

    def test_within_doc_repeat_alone_is_not_dup(self, ray_session):
        from searchenginesimple_ray.stages.spans import dup_spans
        rep = "abcdefghijklmnopqrst"          # 20 chars
        rows = [(1, rep * 4), (2, "completely different text here ok")]
        got = dup_spans(_docs_ds(rows), window=20, stride=20).to_pandas()
        assert len(got) == 0                  # >=2 DISTINCT docs required

    def test_testdata_matches_duckdb(self, ray_session):
        import duckdb
        from searchenginesimple_ray.stages.spans import dup_spans
        path = "/root/testdata/sf0.001/documents.parquet"
        got = dup_spans(
            ray.data.read_parquet(path, columns=["doc_id", "text"]),
            window=40, stride=10).to_pandas() \
            .sort_values(["doc_id", "pos"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute("SET threads=2")
        want = con.execute(f"""
            WITH w AS (
              SELECT doc_id,
                     unnest(generate_series(0, length(text)-40, 10)) AS pos,
                     text
              FROM '{path}' WHERE length(text) >= 40
            ), ws AS (
              SELECT doc_id, pos, substr(text, pos+1, 40) AS win FROM w
            ), dup AS (
              SELECT win FROM ws GROUP BY win
              HAVING count(DISTINCT doc_id) >= 2
            )
            SELECT ws.doc_id, CAST(ws.pos AS BIGINT) AS pos
            FROM ws JOIN dup USING (win) ORDER BY doc_id, pos
        """).df()
        assert len(got) == len(want) and len(got) > 0
        assert (got["doc_id"].to_numpy() ==
                want["doc_id"].to_numpy()).all()
        assert (got["pos"].to_numpy() == want["pos"].to_numpy()).all()

    def test_empty_and_null_inputs(self, ray_session):
        from searchenginesimple_ray.stages.spans import dup_spans
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([None, "tiny"], pa.string())}))
        assert len(dup_spans(ds, window=20, stride=5).to_pandas()) == 0

    def test_string_ids(self, ray_session):
        # non-integer id column: batches whose candidate filter leaves
        # zero rows must still emit a string-typed id column (schema
        # stability across blocks)
        from searchenginesimple_ray.stages.spans import dup_spans
        shared = "0123456789abcdefghij"        # 20 chars
        rows = [("u1", "xx " + shared), ("u2", shared + " yy"),
                ("u3", "no overlap in this one at all truly")]
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string())}))
        got = dup_spans(ds, window=20, stride=1, id_col="doc_id") \
            .to_pandas().sort_values(["doc_id", "pos"])
        assert list(map(tuple, got[["doc_id", "pos"]].values)) == \
            [("u1", 3), ("u2", 0)]

    def test_unicode_positions(self, ray_session):
        # pos is a CHARACTER offset (utf-32 kernel), matching SQL substr
        from searchenginesimple_ray.stages.spans import dup_spans
        shared = "搜索引擎测试" * 4              # 24 CJK chars
        rows = [(1, "前缀" + shared), (2, shared + "后缀")]
        got = dup_spans(_docs_ds(rows), window=20, stride=1) \
            .to_pandas().sort_values(["doc_id", "pos"])
        want = _brute_dup_spans(rows, window=20, stride=1)
        assert list(map(tuple, got[["doc_id", "pos"]].values)) == want


def _brute_pack(rows, seq_len):
    import re
    toks = {d: len(re.findall(r"\S+", t)) for d, t in rows if t}
    out = []
    off = 0
    for d in sorted(toks):
        n = toks[d]
        if n == 0:
            continue
        out.append((d, n, off, off // seq_len, (off + n - 1) // seq_len))
        off += n
    return out


class TestPackSequences:
    def test_matches_brute_force(self, ray_session):
        from searchenginesimple_ray.stages.packing import pack_sequences
        rng = np.random.default_rng(7)
        rows = [(int(i * 3 + 1), " ".join(
            f"w{j}" for j in range(rng.integers(0, 30))))
            for i in range(200)]
        got = pack_sequences(_docs_ds(rows), seq_len=16).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        want = _brute_pack(rows, 16)
        assert [tuple(r) for r in got[
            ["doc_id", "n_tokens", "start_offset", "start_seq",
             "end_seq"]].values] == want

    def test_doc_spanning_sequences(self, ray_session):
        from searchenginesimple_ray.stages.packing import pack_sequences
        rows = [(1, " ".join(["a"] * 10)), (2, " ".join(["b"] * 10))]
        got = pack_sequences(_docs_ds(rows), seq_len=8).to_pandas() \
            .sort_values("doc_id")
        # doc 1: tokens 0..9 -> seqs 0..1; doc 2: tokens 10..19 -> 1..2
        assert got["start_seq"].tolist() == [0, 1]
        assert got["end_seq"].tolist() == [1, 2]

    def test_empty_input(self, ray_session):
        from searchenginesimple_ray.stages.packing import pack_sequences
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string())}))
        assert len(pack_sequences(ds, seq_len=8).to_pandas()) == 0

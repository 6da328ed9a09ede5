"""segment_dedup (stages/linededup.py): C4/RefinedWeb-style
cross-document segment dedup — brute-force Python oracle + DuckDB
oracle on randomized multi-block inputs, plus edge semantics."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from searchenginesimple_ray.stages.linededup import segment_dedup


def brute_segment_dedup(texts: list, seg_words: int = 10,
                        min_docs: int = 2) -> pd.DataFrame:
    """Independent per-doc Python reference."""
    import re
    tok = re.compile(r"[^ \t\n\r\f]+")
    words = [tok.findall(t) if t else [] for t in texts]
    segs = [[" ".join(w[i:i + seg_words])
             for i in range(0, len(w), seg_words)] for w in words]
    docs_of: dict = {}
    for d, ss in enumerate(segs):
        for s in set(ss):
            docs_of.setdefault(s, set()).add(d)
    dup = {s for s, ds_ in docs_of.items() if len(ds_) >= min_docs}
    rows = []
    for d, ss in enumerate(segs):
        kept = [s for s in ss if s not in dup]
        rows.append((d, " ".join(kept), len(ss),
                     sum(1 for s in ss if s in dup)))
    return pd.DataFrame(rows, columns=["doc_id", "clean_text",
                                       "n_segs", "n_removed"])


def run(texts, **kw):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df).repartition(4)
    return segment_dedup(ds, **kw).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)


class TestSegmentDedup:
    def test_handcrafted(self, ray_session):
        boiler = " ".join(f"b{i}" for i in range(10))     # shared 10-word seg
        texts = [
            boiler + " unique one two three",              # seg0 dup, tail kept
            boiler + " other tail words here",             # seg0 dup
            "totally different text with no overlap at all ok fine",
            "",                                            # empty doc
            boiler + " " + boiler,                         # dup twice IN one doc
        ]
        got = run(texts, seg_words=10)
        exp = brute_segment_dedup(texts, 10)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        # the boilerplate segment is removed everywhere
        assert got.loc[0, "clean_text"] == "unique one two three"
        assert got.loc[3, "clean_text"] == "" and got.loc[3, "n_segs"] == 0
        assert got.loc[4, "n_removed"] == 2 and got.loc[4, "clean_text"] == ""

    def test_within_doc_repeat_is_not_cross_doc_dup(self, ray_session):
        seg = " ".join(f"w{i}" for i in range(10))
        texts = [seg + " " + seg,                # repeated inside ONE doc only
                 "completely unrelated other document text body here now ok"]
        got = run(texts, seg_words=10)
        # count(DISTINCT doc) == 1 -> kept both times
        assert got.loc[0, "n_removed"] == 0
        assert got.loc[0, "clean_text"] == seg + " " + seg

    def test_short_tail_segments_dedup_too(self, ray_session):
        texts = ["alpha beta gamma", "alpha beta gamma",   # 3-word docs
                 "alpha beta delta"]
        got = run(texts, seg_words=10)
        exp = brute_segment_dedup(texts, 10)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)
        assert got.loc[0, "clean_text"] == ""               # dup across 2 docs
        assert got.loc[2, "clean_text"] == "alpha beta delta"

    def test_min_docs_threshold(self, ray_session):
        seg = " ".join(f"m{i}" for i in range(10))
        texts = [seg, seg, seg, "other words entirely distinct here ok"]
        got2 = run(texts, seg_words=10, min_docs=2)
        got4 = run(texts, seg_words=10, min_docs=4)
        assert got2["n_removed"].tolist()[:3] == [1, 1, 1]
        assert got4["n_removed"].tolist() == [0, 0, 0, 0]

    def test_randomized_vs_brute_and_duckdb(self, ray_session):
        rng = np.random.default_rng(7)
        vocab = [f"t{i}" for i in range(30)]
        texts = []
        for _ in range(160):
            n = int(rng.integers(0, 35))
            texts.append(" ".join(rng.choice(vocab, size=n)))
        # inject exact shared runs so duplicated segments exist
        shared = " ".join(rng.choice(vocab, size=10))
        for i in range(0, 160, 7):
            texts[i] = shared + " " + texts[i]
        got = run(texts, seg_words=10)
        exp = brute_segment_dedup(texts, 10)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

        con = duckdb.connect()
        con.register("documents", pa.table({
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string())}))
        import __ray_entry__ as e
        sql = e.oracle_sql()["segment_dedup"]
        odf = con.execute(sql).df()
        pd.testing.assert_frame_equal(
            got, odf[["doc_id", "clean_text", "n_segs",
                      "n_removed"]].reset_index(drop=True),
            check_dtype=False)

    def test_null_text_counts_as_empty(self, ray_session):
        df = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                           "text": pd.array([None, "a b c"],
                                            dtype="string")})
        ds = ray.data.from_pandas(df)
        got = segment_dedup(ds, seg_words=10).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert got.loc[0, "clean_text"] == ""
        assert got.loc[0, "n_segs"] == 0
        assert got.loc[1, "clean_text"] == "a b c"


class TestSourceOverlap:
    def _run(self, df: pd.DataFrame) -> pd.DataFrame:
        from searchenginesimple_ray.stages.linededup import source_overlap
        ds = ray.data.from_pandas(df).repartition(4)
        return source_overlap(ds, seg_words=10).to_pandas()

    def test_handcrafted(self, ray_session):
        shared = " ".join(f"s{i}" for i in range(10))
        other = " ".join(f"o{i}" for i in range(10))
        df = pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "source": ["a", "a", "b", "b", "c", "c"],
            "text": [shared, other,             # a has both segs
                     shared, other,             # b has both segs
                     shared,                    # c shares only one
                     "nothing in common here at all ok fine now done"],
        })
        got = self._run(df)
        exp = pd.DataFrame({"src_a": ["a", "a", "b"],
                            "src_b": ["b", "c", "c"],
                            "n_shared": np.array([2, 1, 1], np.int64)})
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_within_source_dup_is_not_overlap(self, ray_session):
        seg = " ".join(f"w{i}" for i in range(10))
        df = pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "source": ["a", "a", "b"],
            "text": [seg, seg,                   # duplicated INSIDE a
                     "totally different words in this other source doc x"],
        })
        got = self._run(df)
        assert len(got) == 0

    def test_randomized_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(11)
        vocab = [f"t{i}" for i in range(25)]
        texts, srcs = [], []
        for i in range(150):
            texts.append(" ".join(rng.choice(vocab,
                                             size=int(rng.integers(0, 30)))))
            srcs.append(f"s{int(rng.integers(0, 6))}")
        shared = " ".join(rng.choice(vocab, size=10))
        for i in range(0, 150, 11):
            texts[i] = shared + " " + texts[i]
        df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64),
                           "source": srcs, "text": texts})
        got = self._run(df)
        con = duckdb.connect()
        con.register("documents", df)
        import __ray_entry__ as e
        sql = e.oracle_sql()["source_overlap"]
        exp = con.execute(sql).df()
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True),
                                      check_dtype=False)

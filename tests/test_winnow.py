"""winnow_fingerprints (stages/winnow.py): simple-rule winnowing —
brute-force reference, the paper's overlap guarantee, md5 parity."""

import hashlib
import struct

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from searchenginesimple_ray.stages.winnow import (_md5_low64,
                                                  winnow_fingerprints)


def brute_winnow(text: str, n=3, w=4):
    """Per-doc simple winnowing (paper Fig. 5): rightmost minimal."""
    import re
    words = re.findall(r"[^ \t\n\r\f]+", text or "")
    grams = [" ".join(words[i:i + n])
             for i in range(max(len(words) - n + 1, 0))]
    hs = [_md5_low64(g) for g in grams]
    sel = set()
    for j in range(w - 1, len(hs)):
        win = hs[j - w + 1: j + 1]
        mn = min(win)
        # rightmost minimal position
        p = j - list(reversed(win)).index(mn)
        sel.add((p, hs[p]))
    return sorted(sel)


def _run(texts, **kw):
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    ds = ray.data.from_pandas(df).repartition(4)
    pdf = winnow_fingerprints(ds, **kw).to_pandas()
    if "doc_id" not in pdf.columns:
        return pdf
    return pdf.sort_values(["doc_id", "pos"]).reset_index(drop=True)


class TestWinnow:
    def test_matches_bruteforce(self, ray_session):
        rng = np.random.default_rng(7)
        vocab = [f"v{i}" for i in range(12)]   # small vocab -> repeats
        texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 40))))
                 for _ in range(80)]
        got = _run(texts)
        rows = []
        for d, t in enumerate(texts):
            for p, f in brute_winnow(t):
                rows.append((d, p, f))
        exp = pd.DataFrame(rows, columns=["doc_id", "pos", "fp"])
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    def test_overlap_guarantee(self, ray_session):
        # any shared run of w + n - 1 = 6 words must share >= 1
        # selected fingerprint value between the two docs
        rng = np.random.default_rng(3)
        shared = " ".join(f"s{i}" for i in range(6))
        a = "x1 x2 x3 " + shared + " y1 y2 y3 y4"
        b = "z9 z8 " + shared + " q5 q6"
        got = _run([a, b])
        fa = set(got[got["doc_id"] == 0]["fp"])
        fb = set(got[got["doc_id"] == 1]["fp"])
        assert fa & fb

    def test_short_docs_emit_nothing(self, ray_session):
        # < n + w - 1 = 6 words -> no full window
        got = _run(["one two three four five", "", "a b"])
        assert len(got) == 0

    def test_md5_parity_with_duckdb(self, ray_session):
        con = duckdb.connect()
        for s in ["alpha beta gamma", "", "x"]:
            v = con.execute(
                "SELECT CAST(CASE WHEN md5_number_lower(?) > "
                "9223372036854775807 THEN CAST(md5_number_lower(?) AS "
                "HUGEINT) - 18446744073709551616 ELSE "
                "CAST(md5_number_lower(?) AS HUGEINT) END AS BIGINT)",
                [s, s, s]).fetchone()[0]
            assert v == _md5_low64(s)

    def test_density_bound(self, ray_session):
        # expected selection density ~2/(w+1); assert a sane loose band
        rng = np.random.default_rng(5)
        text = " ".join(f"u{int(x)}" for x in rng.integers(0, 10_000, 5000))
        got = _run([text], n=3, w=4)
        n_grams = 5000 - 2
        density = len(got) / n_grams
        assert 0.2 < density < 0.6


class TestWinnowOverlap:
    def test_plagiarised_pair_found(self, ray_session):
        from searchenginesimple_ray.stages.winnow import \
            winnow_overlap_pairs
        rng = np.random.default_rng(8)
        shared = " ".join(f"c{i}" for i in range(15))   # long shared run
        texts = [
            "intro words here " + shared + " outro alpha beta gamma",
            "different opening " + shared + " and another ending text",
        ] + [" ".join(f"r{int(x)}" for x in rng.integers(0, 9999, 30))
             for _ in range(20)]
        df = pd.DataFrame({"doc_id": np.arange(len(texts),
                                               dtype=np.int64),
                           "text": texts})
        got = winnow_overlap_pairs(ray.data.from_pandas(df)
                                   .repartition(4))
        assert ((got["doc_a"] == 0) & (got["doc_b"] == 1)).any()

    def test_matches_oracle_sql(self, ray_session):
        from searchenginesimple_ray.stages.winnow import \
            winnow_overlap_pairs
        rng = np.random.default_rng(13)
        vocab = [f"v{i}" for i in range(15)]
        texts = [" ".join(rng.choice(vocab,
                                     size=int(rng.integers(6, 40))))
                 for _ in range(100)]
        df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                           "text": texts})
        got = winnow_overlap_pairs(ray.data.from_pandas(df)
                                   .repartition(4))
        con = duckdb.connect()
        con.register("documents", df)
        import __ray_entry__ as e
        exp = con.execute(e.oracle_sql()["winnow_overlap"]).df()
        pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                      exp.reset_index(drop=True),
                                      check_dtype=False)

    def test_boilerplate_fp_suppressed(self, ray_session):
        from searchenginesimple_ray.stages.winnow import \
            winnow_overlap_pairs
        # one 6-word run shared by MANY docs -> fp capped away
        shared = " ".join(f"b{i}" for i in range(6))
        texts = [shared + f" filler{i} pad{i} word{i} more{i}"
                 for i in range(40)]
        df = pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64),
                           "text": texts})
        got = winnow_overlap_pairs(ray.data.from_pandas(df),
                                   max_docs_per_fp=8)
        # the shared fp covers 40 > 8 docs; per-doc unique fillers
        # share nothing, so no pair survives
        assert len(got) == 0


class TestHashedFeatures:
    def test_matches_brute_and_rowsums(self, ray_session):
        from searchenginesimple_ray.stages.winnow import (_md5_low64,
                                                          hashed_features)
        rng = np.random.default_rng(23)
        vocab = [f"w{i}" for i in range(40)]
        texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 25))))
                 for _ in range(120)]
        df = pd.DataFrame({"doc_id": np.arange(120, dtype=np.int64),
                           "text": texts})
        got = hashed_features(ray.data.from_pandas(df).repartition(4),
                              n_buckets=8).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        import re
        tok = re.compile(r"[^ \t\n\r\f]+")
        for i, t in enumerate(texts):
            words = tok.findall(t)
            exp = np.zeros(8, np.int64)
            for wd in words:
                exp[_md5_low64(wd) % 8] += 1
            assert got.loc[i, [f"f_{j}" for j in range(8)]] \
                .to_numpy(dtype=np.int64).tolist() == exp.tolist()
        # row sums = word counts
        sums = got[[f"f_{j}" for j in range(8)]].sum(axis=1)
        assert sums.tolist() == [len(tok.findall(t)) for t in texts]


class TestNgramNovelty:
    def test_brute_and_edges(self, ray_session):
        from searchenginesimple_ray.stages.winnow import ngram_novelty
        shared = "alpha beta gamma delta"      # 2 shared 3-grams
        texts = [shared + " unique1 unique2",  # 2 shared + 3 own grams
                 shared,                       # both grams shared
                 "totally different words here now",
                 "ab",                         # < 3 words: no grams
                 ""]
        df = pd.DataFrame({"doc_id": np.arange(len(texts),
                                               dtype=np.int64),
                           "text": texts})
        got = ngram_novelty(ray.data.from_pandas(df).repartition(3))
        # brute force
        import re
        tok = re.compile(r"[^ \t\n\r\f]+")
        grams = [set(" ".join(tok.findall(t)[i:i+3])
                     for i in range(max(len(tok.findall(t)) - 2, 0)))
                 for t in texts]
        for i in range(len(texts)):
            others = set().union(*(grams[j] for j in range(len(texts))
                                   if j != i))
            assert got.loc[i, "n_grams"] == len(grams[i])
            assert got.loc[i, "n_novel"] == len(grams[i] - others)
        assert got.loc[3, "n_grams"] == 0 and got.loc[4, "n_grams"] == 0

    def test_within_doc_repeat_still_novel(self, ray_session):
        from searchenginesimple_ray.stages.winnow import ngram_novelty
        rep = "x1 x2 x3 x1 x2 x3"   # gram 'x1 x2 x3' twice in ONE doc
        df = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                           "text": [rep,
                                    "other stuff entirely here now ok"]})
        got = ngram_novelty(ray.data.from_pandas(df))
        # distinct-doc count is 1 -> every gram of doc 0 is novel
        assert got.loc[0, "n_novel"] == got.loc[0, "n_grams"]

    def test_partitioned_path_matches_broadcast(self, ray_session):
        # broadcast_limit=0 forces the gram-hash-partitioned semi-join
        # (the 100-TB path); both paths are exact so outputs must be
        # identical, including zero-gram and empty docs
        from searchenginesimple_ray.stages.winnow import ngram_novelty
        rng = np.random.default_rng(21)
        vocab = [f"w{i}" for i in range(40)]
        texts = [" ".join(rng.choice(vocab,
                                     size=int(rng.integers(0, 25))))
                 for _ in range(60)] + ["", "ab"]
        df = pd.DataFrame({"doc_id": np.arange(len(texts),
                                               dtype=np.int64),
                           "text": texts})
        ds = ray.data.from_pandas(df).repartition(4)
        bcast = ngram_novelty(ds, n=3)
        part = ngram_novelty(ds, n=3, broadcast_limit=0,
                             join_partitions=4)
        pd.testing.assert_frame_equal(
            part.reset_index(drop=True), bcast.reset_index(drop=True),
            check_dtype=False)

    def test_fnv1a64_hash_fn_same_counts(self, ray_session):
        # production hash swap: novelty verdicts depend only on gram
        # IDENTITY, so counts match md5 exactly (no collisions at
        # this size); fingerprint VALUES are allowed to differ
        from searchenginesimple_ray.stages.winnow import ngram_novelty
        texts = ["alpha beta gamma delta unique1",
                 "alpha beta gamma delta",
                 "totally different words here now"]
        df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                           "text": texts})
        ds = ray.data.from_pandas(df)
        md5 = ngram_novelty(ds)
        fnv = ngram_novelty(ds, hash_fn="fnv1a64")
        pd.testing.assert_frame_equal(fnv, md5, check_dtype=False)
        with pytest.raises(ValueError, match="hash_fn"):
            ngram_novelty(ds, hash_fn="xxh3")

    def test_fnv1a64_fingerprint_guarantee_holds(self, ray_session):
        # winnowing SELECTS different positions under a different hash
        # (the min is hash-value-dependent), but the paper's guarantee
        # is hash-agnostic: a shared w+n-1-word run still yields an
        # identical fingerprint, so the overlap pair survives the swap
        from searchenginesimple_ray.stages.winnow import (
            winnow_fingerprints, winnow_overlap_pairs)
        rng = np.random.default_rng(31)
        shared = " ".join(f"s{i}" for i in range(12))
        texts = ["head words " + shared + " tail here",
                 "other head " + shared + " other tail words",
                 " ".join(f"r{int(x)}" for x in
                          rng.integers(0, 999, 25))]
        df = pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64),
                           "text": texts})
        ds = ray.data.from_pandas(df)
        fp = winnow_fingerprints(ds, hash_fn="fnv1a64").to_pandas()
        assert len(fp) and (fp["pos"] >= 0).all()
        prs = winnow_overlap_pairs(ds, hash_fn="fnv1a64")
        assert ((prs["doc_a"] == 0) & (prs["doc_b"] == 1)).any()

    def test_partitioned_tiny_skewed_input(self, ray_session):
        # tiny corpus + many join partitions: exercises the two Ray
        # join quirks (schema-less empty partition blocks; aggregator
        # pool hang when partitions >> CPUs — capped in shuffle_join)
        from searchenginesimple_ray.stages.winnow import ngram_novelty
        df = pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["alpha beta gamma delta",
                     "alpha beta gamma delta", "x y z"]})
        got = ngram_novelty(ray.data.from_pandas(df),
                            broadcast_limit=0, join_partitions=32)
        assert got["n_novel"].tolist() == [0, 0, 1]
        assert got["n_grams"].tolist() == [2, 2, 1]

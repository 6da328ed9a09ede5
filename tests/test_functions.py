"""Unit tests for the pure function layer (FIXTURES.md F4 micro-cases)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from searchenginesimple_ray.functions import hashing as H
from searchenginesimple_ray.functions import minhash as M
from searchenginesimple_ray.functions import textstats as X
from searchenginesimple_ray.functions import tokenize as T
from searchenginesimple_ray.functions import varbyte as V
from searchenginesimple_ray.functions.simhash import simhash_of_text


class TestFnv1a:
    # public FNV-1a 32 test vectors; parity with ihsah.hpp:8-27
    def test_vectors(self):
        assert H.fnv1a32("") == 2166136261
        assert H.fnv1a32("a") == 0xE40C292C
        assert H.fnv1a32("foobar") == 0xBF9CF968

    def test_ihash_nonnegative_and_mod(self):
        for tok in ["hello", "中文", "the", "x" * 100]:
            h = H.ihash(tok)
            assert 0 <= h <= 0x7FFFFFFF
            assert H.shard_of_term(tok, 10) == h % 10

    def test_array_matches_scalar(self):
        terms = ["alpha", "beta", "alpha", "中", ""]
        assert list(H.fnv1a32_array(terms)) == [H.fnv1a32(t) for t in terms]
        assert list(H.fnv1a32_array(terms, 7)) == \
            [H.shard_of_term(t, 7) for t in terms]


class TestJenkins:
    def test_empty(self):
        # lookup3: zero-length returns initvals (+deadbeef), no final mix
        assert H.hashlittle2(b"") == (0xDEADBEEF, 0xDEADBEEF)

    def test_published_vector(self):
        # from Bob Jenkins' lookup3.c driver program (public domain)
        pc, pb = H.hashlittle2(b"Four score and seven years ago", 0, 0)
        assert pc == 0x17770551
        assert pb == 0xCE7226E6

    def test_composition(self):
        # jenkins.h:98-103: (pc << 32) | pb
        pc, pb = H.hashlittle2(b"hello", 0, 0)
        assert H.jenkins64("hello") == (pc << 32) | pb

    @given(st.binary(max_size=64), st.integers(0, 2**64 - 1))
    @settings(max_examples=50, deadline=None)
    def test_deterministic(self, data, seed):
        assert H.jenkins64(data, seed) == H.jenkins64(data, seed)


class TestHamming:
    def test_scalar(self):
        assert H.hamming64(0, 0) == 0
        assert H.hamming64(0xFFFFFFFFFFFFFFFF, 0) == 64
        assert H.hamming64(0b1011, 0b0010) == 2

    def test_is_equal_thresholds(self):
        # mirrors src/test/simhash.cpp:47-50 shape: threshold 3 vs 5
        a, b = 0xF0F0, 0xF0F0 ^ 0b11111  # 5 bits apart
        assert not H.simhash_is_equal(a, b, 3)
        assert H.simhash_is_equal(a, b, 5)

    @given(st.integers(0, 2**64 - 1),
           st.sets(st.integers(0, 63), min_size=0, max_size=3))
    @settings(max_examples=100, deadline=None)
    def test_pigeonhole_bands(self, h, flip_bits):
        """Any pair within hamming<=3 shares at least one of 4 bands."""
        h2 = h
        for bit in flip_bits:
            h2 ^= 1 << bit
        b1 = H.simhash_bands([h], 4)[0]
        b2 = H.simhash_bands([h2], 4)[0]
        assert (b1 == b2).any()


class TestVarbyte:
    @given(st.lists(st.integers(0, 2**62), max_size=200))
    @settings(max_examples=60, deadline=None)
    def test_roundtrip(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        assert np.array_equal(V.varbyte_decode(V.varbyte_encode(arr)),
                              arr) or len(vals) == 0

    @given(st.sets(st.integers(0, 10**12), min_size=1, max_size=500),
           st.integers(1, 60))
    @settings(max_examples=30, deadline=None)
    def test_postings_roundtrip(self, ids, tfmax):
        ids = np.sort(np.array(sorted(ids), dtype=np.uint64))
        tfs = (np.arange(len(ids)) % tfmax + 1).astype(np.uint64)
        dvb, tvb, bl, bm = V.encode_postings(ids, tfs, block_size=16)
        di, ti = V.decode_postings(dvb, tvb, len(ids))
        assert np.array_equal(di, ids)
        assert np.array_equal(ti, tfs)
        assert bl[-1] == ids[-1]
        # block maxima really are maxima
        for bi in range(len(bm)):
            seg = tfs[bi * 16:(bi + 1) * 16]
            assert bm[bi] == seg.max()

    @given(st.lists(st.lists(st.integers(0, 10**12), max_size=40),
                    max_size=30),
           st.integers(0, 5))
    @settings(max_examples=40, deadline=None)
    def test_batch_table_decode_equals_per_row(self, rows, skew):
        """Whole-table vectorized decode == per-row decode_postings,
        including empty posting rows and a SLICED Arrow column (the
        offset-rebase path)."""
        import pyarrow as pa
        enc_d, enc_t, n_local, want = [], [], [], []
        for vals in rows:
            ids = np.unique(np.array(vals, dtype=np.uint64))
            tfs = (np.arange(len(ids), dtype=np.uint64) % 9) + 1
            dvb, tvb, _, _ = V.encode_postings(ids, tfs)
            enc_d.append(dvb)
            enc_t.append(tvb)
            n_local.append(len(ids))
            want.append((ids, tfs))
        d_col = pa.chunked_array([pa.array(enc_d, pa.binary())])
        t_col = pa.chunked_array([pa.array(enc_t, pa.binary())])
        sl = min(skew, len(rows))
        d_col, t_col = d_col.slice(sl), t_col.slice(sl)
        nl = np.array(n_local[sl:], np.int64)
        ids_all, tfs_all, starts, ends = \
            V.batch_decode_posting_table(d_col, t_col, nl)
        assert len(ids_all) == nl.sum()
        for i, (ids, tfs) in enumerate(want[sl:]):
            assert np.array_equal(ids_all[starts[i]:ends[i]], ids)
            assert np.array_equal(tfs_all[starts[i]:ends[i]], tfs)


class TestTokenize:
    def test_ref_fold_quirk(self):
        # the reference maps A-Z to chr(c-0x20) — literal parity
        assert T.ref_transform("Hello") == "(ello"
        assert T.ref_transform("HELLO") == "(%,,/"
        assert T.ref_transform("hello") == "hello"

    def test_charset_filter(self):
        assert T.ref_transform("123abc") is None
        assert T.ref_transform("!x") is None
        assert T.ref_transform("中文") == "中文"

    def test_cjk_newline_join(self):
        assert T.cjk_newline_join("中\n文") == "中文"
        assert T.cjk_newline_join("中\n\n\n文") == "中文"
        assert T.cjk_newline_join("a\nb") == "a\nb"
        assert T.cjk_newline_join("中\na") == "中\na"

    def test_tokenize_cases(self):
        assert T.tokenize("the Quick brown 中文 123 fox",
                          frozenset({"the"})) == \
            ["1uick", "brown", "中", "文", "fox"]
        # stop filter applies AFTER the fold (build side)
        assert T.tokenize("THE the", frozenset({"the"})) == ["4(%"]

    def test_query_path_no_stop(self):
        raw, tr = T.query_raw_and_transformed("the Dog 42")
        assert raw == ["the", "Dog", "42"]
        assert tr == ["the", "$og"]

    def test_token_counter_parity_mixed_interior_case(self):
        # lowercase-LED tokens with interior A-Z must still fold (M4
        # applies to every char of any letter-led token) — the
        # TokenCounter fast path must match the scalar spec exactly.
        from collections import Counter

        from searchenginesimple_ray.stages.tokenizer import TokenCounter
        stop = frozenset({"the"})
        for text in ["fooBar iPhone", "camelCase mixedUP x",
                     "the The THE fooBar fooBar", "a1B2c3 中Mix文"]:
            tc = TokenCounter(stop_words=stop)
            assert tc.doc_counts(text) == \
                Counter(T.tokenize(text, stop)), text
        assert TokenCounter(stop_words=stop).doc_counts("fooBar")["foo\"ar"] == 1


class TestSimhash:
    def test_deterministic_nonzero(self):
        h = simhash_of_text("alpha beta gamma delta")
        assert h == simhash_of_text("alpha beta gamma delta") != 0

    def test_empty_is_zero(self):
        assert simhash_of_text("") == 0
        assert simhash_of_text("123 456") == 0  # all tokens dropped by M4

    def test_permutation_invariant(self):
        a = simhash_of_text("one two three four five six")
        b = simhash_of_text("six five four three two one")
        assert a == b  # tf multiset identical

    def test_small_edit_small_distance(self):
        words = [f"tok{i:02d}" for i in range(30)]
        base = " ".join(words * 2)          # 30 distinct terms, tf=2 each
        edited = base + " extraterm"        # one tf=1 term added
        d = int(H.hamming64(simhash_of_text(base), simhash_of_text(edited)))
        # far below the ~32 expected for unrelated docs; the exact small
        # value depends on vote margins, so only bound it loosely
        assert d <= 16


class TestRefKeywordExtractor:
    """T2 reference-semantics parity: cppjieba KeywordExtractor
    weighting (tf * idf, avg-idf OOV, single-rune + stopword drop)
    feeding the bit-exact jenkins64 weighted vote."""

    WORDS = {"南京市": 10, "长江": 5, "大桥": 4, "天气": 3, "不错": 2}
    IDF = {"南京市": 3.0, "长江": 2.0, "大桥": 5.0, "天气": 1.5}

    def _ex(self, stop=("天气",)):
        from searchenginesimple_ray.functions.simhash import \
            RefKeywordExtractor
        return RefKeywordExtractor(self.WORDS, self.IDF, stop_words=stop)

    def test_extract_weights_and_order(self):
        ex = self._ex()
        # tf: 南京市 1, 长江 2, 大桥 1, hello 1 (OOV idf = avg 2.875)
        got = ex.extract("南京市长江大桥 长江 hello", top_n=3)
        assert got == [("大桥", 5.0), ("长江", 4.0), ("南京市", 3.0)]
        # full list includes the OOV word at the table-average idf
        got_all = ex.extract("南京市长江大桥 长江 hello", top_n=0)
        assert ("hello", pytest.approx(2.875)) in \
            [(w, pytest.approx(v)) for w, v in got_all]

    def test_single_rune_and_stopword_dropped(self):
        ex = self._ex()
        # 人 segments to a single rune (IsSingleWord -> dropped);
        # 天气 is a stop word; x is a single ascii rune
        got = ex.extract("天气 人 x 大桥", top_n=0)
        assert got == [("大桥", 5.0)]

    def test_hmm_oov_word_reaches_extractor(self):
        ex = self._ex()
        # 长桥 is OOV but B/E-trained -> HMM joins it; weight = avg idf
        got = dict(ex.extract("长桥 大桥", top_n=0))
        assert got["长桥"] == pytest.approx(2.875)

    def test_fingerprint_matches_independent_vote(self):
        """Extractor fingerprint == a scalar reimplementation of
        Simhasher::make's per-bit loop (Simhasher.hpp:50-68) over the
        hand-verified keyword list."""
        from searchenginesimple_ray.functions.hashing import jenkins64
        ex = self._ex()
        text = "南京市长江大桥 长江 hello 不错"
        kws = ex.extract(text, top_n=5)
        votes = [0.0] * 64
        for w, wt in kws:
            h = jenkins64(w)
            for j in range(64):
                votes[j] += wt if (h >> j) & 1 else -wt
        want = 0
        for j in range(64):
            if votes[j] > 0.0:
                want |= 1 << j
        assert ex.simhash(text, top_n=5) == want != 0
        assert ex.simhash("", top_n=5) == 0

    def test_stage_hook_weighter(self):
        """make_ref_weighter plugs the same weighting into the
        SimhashStage keyword_fn hook (Counter -> weighted top-N)."""
        from collections import Counter

        from searchenginesimple_ray.functions.simhash import \
            make_ref_weighter
        fn = make_ref_weighter(self.IDF, stop_words=("天气",))
        tf = Counter({"长江": 2, "大桥": 1, "天气": 9, "人": 7,
                      "hello": 1})
        assert fn(tf, 2) == [("大桥", 5.0), ("长江", 4.0)]
        got = dict(fn(tf, 0))
        assert "天气" not in got and "人" not in got
        assert got["hello"] == pytest.approx(2.875)


class TestTextStats:
    def test_token_counts(self):
        assert X.whitespace_token_count("a  b c") == 3
        assert X.bpe_token_count("hello, world42") == 4  # hello , world 42

    def test_lang_id(self):
        assert X.lang_id("the cat and the dog is here for it") == "en"
        assert X.lang_id("el perro y la casa en que") == "es"
        assert X.lang_id("") == "und"
        assert X.lang_id("zzz qqq xxx") == "und"

    def test_quality(self):
        q = X.quality_stats("The cat, the hat!", frozenset({"the"}))
        assert q["n_tokens"] == 4
        assert 0 < q["punct_ratio"] < 1
        assert q["stop_ratio"] == 0.5

    def test_fingerprint_shift_invariance(self):
        # same 16-byte window present => same min window hash candidate set
        a = X.rolling_fingerprint("abcdefghijklmnopqrstuvwxyz")
        assert a == X.rolling_fingerprint("abcdefghijklmnopqrstuvwxyz")


class TestMinhash:
    def test_similar_texts_high_estimate(self):
        s1 = M.minhash_signature(M.char_shingles(
            "the quick brown fox jumps over the lazy dog"))
        s2 = M.minhash_signature(M.char_shingles(
            "the quick brown fox jumped over the lazy dog"))
        assert M.estimate_jaccard(s1, s2) > 0.5
        assert (M.lsh_band_keys(s1) == M.lsh_band_keys(s2)).any()

    def test_dissimilar_low(self):
        s1 = M.minhash_signature(M.char_shingles("alpha beta gamma delta"))
        s2 = M.minhash_signature(M.char_shingles(
            "completely unrelated content here"))
        assert M.estimate_jaccard(s1, s2) < 0.3

    def test_jaccard_exact(self):
        assert M.jaccard({1, 2, 3}, {2, 3, 4}) == 0.5
        assert M.jaccard(set(), set()) == 1.0
        assert M.jaccard({1}, set()) == 0.0

    def test_char_shingles_flat_matches_per_doc(self):
        import pyarrow as pa
        texts = ["the quick brown fox", "Short", "ab", "", "xyz" * 50,
                 "MIXED Case Text with  spaces", "漢字 cjk 短"]
        flat, counts = M.char_shingles_flat(pa.array(texts), 5)
        assert counts.sum() == len(flat)
        offs = np.concatenate([[0], np.cumsum(counts)])
        for i, t in enumerate(texts):
            got = set(flat[offs[i]:offs[i + 1]].tolist())
            want = set(M.char_shingles(t, 5).tolist())
            assert got == want, f"doc {i}"

    @given(st.lists(st.text(
        alphabet=st.characters(codec="utf-8"), max_size=40),
        min_size=1, max_size=12))
    @settings(max_examples=60, deadline=None)
    def test_char_shingles_flat_property(self, texts):
        import pyarrow as pa
        flat, counts = M.char_shingles_flat(pa.array(texts), 5)
        offs = np.concatenate([[0], np.cumsum(counts)])
        for i, t in enumerate(texts):
            got = set(flat[offs[i]:offs[i + 1]].tolist())
            want = set(M.char_shingles(t, 5).tolist())
            assert got == want

    def test_flat_signatures_match_per_doc(self):
        import pyarrow as pa
        texts = ["the quick brown fox jumps", "tiny", "", "repeat " * 30]
        flat, counts = M.char_shingles_flat(pa.array(texts), 5)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        got = M.minhash_signatures_flat(flat, offsets, 64)
        want = np.stack([M.minhash_signature(M.char_shingles(t, 5), 64)
                         for t in texts])
        assert (got == want).all()


class TestReviewKernelFixes:
    def test_sort_scored_desc_nan_last(self):
        from searchenginesimple_ray.functions.ranking import \
            sort_scored_desc
        nan = float("nan")
        out = sort_scored_desc([(5.0, 2), (nan, 9), (3.0, 3),
                                (nan, 1), (4.0, 4)])
        assert [d for _, d in out] == [2, 4, 3, 1, 9]
        import math
        assert all(math.isnan(s) for s, _ in out[3:])

    def test_combo_key_threshold_guard(self):
        import numpy as np
        import pytest as _pt

        from searchenginesimple_ray.functions.hashing import (
            simhash_combo_key_band, simhash_combo_keys)
        h = np.array([0], np.uint64)
        simhash_combo_keys(h, 5)          # C(8,3)=56 <= 64: fine
        with _pt.raises(ValueError, match="6-bit"):
            simhash_combo_keys(h, 6)      # C(9,3)=84 aliases
        with _pt.raises(ValueError, match="6-bit"):
            simhash_combo_key_band(h, 6, 0)

    def test_simhash_vector_cache_bit_identical(self):
        from searchenginesimple_ray.functions.hashing import jenkins64
        from searchenginesimple_ray.functions.simhash import \
            simhash_from_keywords
        kws = [("alpha", 2.5849625007211562), ("beta", 1.0),
               ("gamma", 3.321928094887362), ("alpha", 1.0)]
        cache: dict = {}
        a = simhash_from_keywords(kws, cache)
        b = simhash_from_keywords(kws, cache)   # warm-cache path
        c = simhash_from_keywords(kws, None)    # uncached path
        # reference scalar implementation
        votes = [0.0] * 64
        for t, w in kws:
            h = jenkins64(t)
            for j in range(64):
                votes[j] += w if (h >> j) & 1 else -w
        want = 0
        for j in range(64):
            if votes[j] > 0.0:
                want |= 1 << j
        assert a == b == c == want


class TestSketchKernelProperties:
    """Pure-kernel invariants of the sketch ops (no Ray): the
    Misra-Gries compress must never lose a phi-heavy candidate, and
    the quantile rank rule must match percentile_disc semantics."""

    @given(st.lists(st.integers(min_value=0, max_value=30),
                    min_size=1, max_size=400),
           st.integers(min_value=2, max_value=20))
    @settings(max_examples=100, deadline=None)
    def test_mg_compress_superset_guarantee(self, stream, cap):
        import numpy as np

        from searchenginesimple_ray.stages.sketches import _mg_compress
        vals, counts = np.unique(np.asarray(stream), return_counts=True)
        total = len(stream)
        kept_vals, kept_w = _mg_compress(vals.astype(object),
                                         counts.astype(np.int64), cap)
        kept = dict(zip(kept_vals, kept_w))
        for v, c in zip(vals, counts):
            # undercount bound: a single compress removes <= pivot
            # from each counter and >= (cap+1)*pivot total mass
            if c > total / (cap + 1):
                assert v in kept, (v, c, total, cap)
            if v in kept:
                assert kept[v] <= c          # never overcount

    @given(st.lists(st.integers(min_value=0, max_value=50),
                    min_size=1, max_size=300))
    @settings(max_examples=100, deadline=None)
    def test_quantile_rank_rule_is_percentile_disc(self, values):
        """The cumulative-histogram walk == smallest value whose rank
        reaches ceil(q*n) — checked against a sorted-array oracle."""
        import numpy as np
        v = np.sort(np.asarray(values, dtype=np.int64))
        uniq, counts = np.unique(v, return_counts=True)
        cum = counts.cumsum()
        n = len(v)
        for q in (0.25, 0.5, 0.75):
            k = max(int(np.ceil(q * n)), 1)
            got = int(uniq[np.searchsorted(cum, k)])
            want = int(v[k - 1])     # 1-based rank in the sorted array
            assert got == want

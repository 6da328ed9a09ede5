"""functions/segment.py: dictionary max-prob CJK segmentation (M3
upgrade), validated against the reference's own dict artifact."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

REF_DAT = "/root/reference/data/dictIndex.dat"


class TestDictSegmenter:
    def test_classic_maxprob_example(self):
        from searchenginesimple_ray.functions.segment import DictSegmenter
        seg = DictSegmenter({"南京": 3, "市": 2, "长江": 5, "大桥": 4,
                             "南京市": 10, "长江大桥": 20, "市长": 8,
                             "江大桥": 1})
        # the classic garden-path sentence: max-prob picks the
        # city + bridge reading, not 市长 (mayor)
        assert seg.cut("南京市长江大桥") == ["南京市", "长江大桥"]

    def test_oov_falls_back_to_codepoints_without_hmm(self):
        from searchenginesimple_ray.functions.segment import DictSegmenter
        seg = DictSegmenter({"大桥": 4}, hmm=False)
        assert seg.cut("某某大桥") == ["某", "某", "大桥"]
        assert seg.cut("") == []
        assert seg.cut("一") == ["一"]

    def test_hmm_joins_oov_run(self):
        """With hmm=True (the reference's Cut(text, words, true)), an
        OOV run whose characters the emission model has seen in B/E
        positions is joined into one word by the Viterbi pass: B→E
        (-0.2627-0.5108+emit) beats the S,S path whose first S
        emission is the unseen floor."""
        from searchenginesimple_ray.functions.segment import DictSegmenter
        seg = DictSegmenter({"长江": 5, "长城": 1, "大桥": 4})  # hmm on
        # 长桥 is OOV but 长 is B-trained and 桥 is E-trained → joined
        assert seg.cut("长桥大桥") == ["长桥", "大桥"]
        assert seg.cut("") == []
        assert seg.cut("一") == ["一"]
        # a single OOV char between dict words stays single (buf len 1)
        assert seg.cut("大桥某大桥") == ["大桥", "某", "大桥"]
        # chars the emission model has NEVER seen tie at the MIN floor
        # and resolve to S,S — same as jieba's decoder on chars absent
        # from prob_emit (max() tuple tie-break picks 'S' over 'E')
        assert seg.cut("某某大桥") == ["某", "某", "大桥"]

    def test_hmm_invocab_buffer_emitted_per_char(self):
        """jieba __cut_DAG: a buffered single-char run that IS a dict
        word is emitted per character, not HMM-joined."""
        from searchenginesimple_ray.functions.segment import DictSegmenter
        # freq chosen so the DAG prefers 单+字 over the word 单字:
        # log(9)+log(9)-2logT > log(1)-logT with T=19
        seg = DictSegmenter({"单": 9, "字": 9, "单字": 1})
        assert seg._cut_dag("单字") == ["单", "字"]
        assert seg.cut("单字") == ["单", "字"]

    def test_tie_prefers_longer_word(self):
        from searchenginesimple_ray.functions.segment import DictSegmenter
        # freq(ab)=1 path equals freq(a)*freq(b)=1*? -- construct an
        # exact tie: ab freq 1 vs a,b unseen (freq 1 each):
        # log(1)-logT vs 2*(log(1)-logT) => single word wins on value,
        # so force a genuine tie via equal freqs: words 'ab'(2),'a'(1),
        # 'b'(2), total=5: ab: log(2/5) = -0.916; a+b: log(1/5)+log(2/5)
        # not a tie.  Use the rule directly: same value => longer j.
        seg = DictSegmenter({"一二": 1})
        # '一二' freq1: log(1)-log(1)=0... total=1; path 一+二 =
        # 2*(log(1)-log(1))=0 — exact tie, longer word must win
        assert seg.cut("一二") == ["一二"]

    def test_counter_full_pipeline_semantics(self):
        from searchenginesimple_ray.functions.segment import \
            DictTokenCounter
        c = DictTokenCounter({"大桥": 4}, stop_words=("the",),
                             apply_stop=True)
        got = c.doc_counts("the Big 123 大桥\n大桥")
        # 'the' stopped, 'Big' ref-folded ('B'->'"'), '123' dropped,
        # CJK newline join then dict segmentation
        assert got['"ig'] == 1
        assert got["大桥"] == 2
        assert "the" not in got and "123" not in got

    def test_query_tokens_order(self):
        from searchenginesimple_ray.functions.segment import \
            DictTokenCounter
        c = DictTokenCounter({"长江": 5})
        assert c.tokens("abc 长江人") == ["abc", "长江", "人"]


class TestHmmModel:
    """The B/M/E/S Viterbi decoder (jieba finalseg semantics)."""

    def test_published_constants(self):
        """start/trans are jieba's published finalseg parameters
        (prob_start.py / prob_trans.py of the MIT source)."""
        from searchenginesimple_ray.functions.segment import (
            HMM_START_P, HMM_TRANS_P)
        assert HMM_START_P["B"] == pytest.approx(-0.26268660809250016)
        assert HMM_START_P["S"] == pytest.approx(-1.4652633398537678)
        assert HMM_START_P["M"] < -1e100 and HMM_START_P["E"] < -1e100
        assert set(HMM_TRANS_P["B"]) == {"E", "M"}
        assert set(HMM_TRANS_P["E"]) == {"B", "S"}
        assert set(HMM_TRANS_P["M"]) == {"E", "M"}
        assert set(HMM_TRANS_P["S"]) == {"B", "S"}
        assert HMM_TRANS_P["B"]["E"] == pytest.approx(-0.510825623765990)
        assert HMM_TRANS_P["S"]["S"] == pytest.approx(-0.6658631448798212)

    def test_from_dictionary_positional_counts(self):
        from searchenginesimple_ray.functions.segment import HmmModel
        import math
        m = HmmModel.from_dictionary({"长江": 3, "长城": 1, "人": 2})
        # B: 长 appears word-initial 4 times (only B char)
        assert m.emit_p["B"]["长"] == pytest.approx(math.log(1.0))
        # E: 江 3 of 4, 城 1 of 4
        assert m.emit_p["E"]["江"] == pytest.approx(math.log(3 / 4))
        assert m.emit_p["E"]["城"] == pytest.approx(math.log(1 / 4))
        # S: the single-char word
        assert m.emit_p["S"]["人"] == pytest.approx(math.log(1.0))
        assert m.emit_p["M"] == {}

    def test_viterbi_matches_bruteforce(self):
        """Viterbi decode == exhaustive max over all legal state
        sequences (start in {B,S}, legal transitions, end in {E,S}),
        on random emission tables with full character coverage."""
        import itertools
        import math

        import numpy as np

        from searchenginesimple_ray.functions.segment import (
            HMM_START_P, HMM_TRANS_P, HmmModel)

        def tags_to_words(text, tags):
            out, begin, nexti = [], 0, 0
            for i, tg in enumerate(tags):
                if tg == "B":
                    begin = i
                elif tg == "E":
                    out.append(text[begin:i + 1])
                    nexti = i + 1
                elif tg == "S":
                    out.append(text[i])
                    nexti = i + 1
            if nexti < len(text):
                out.append(text[nexti:])
            return out

        rng = np.random.RandomState(7)
        chars = "xyz"
        for trial in range(40):
            emit = {s: {c: float(math.log(rng.uniform(0.05, 1.0)))
                        for c in chars} for s in "BMES"}
            m = HmmModel(emit)
            n = int(rng.randint(1, 7))
            text = "".join(chars[rng.randint(3)] for _ in range(n))
            best, best_tags = -math.inf, None
            for seq in itertools.product("BMES", repeat=n):
                if seq[-1] not in ("E", "S"):
                    continue
                if HMM_START_P[seq[0]] < -1e100 or any(
                        b not in HMM_TRANS_P[a]
                        for a, b in zip(seq, seq[1:])):
                    continue
                sc = HMM_START_P[seq[0]] + emit[seq[0]][text[0]]
                for i in range(1, n):
                    sc += HMM_TRANS_P[seq[i - 1]][seq[i]] + \
                        emit[seq[i]][text[i]]
                if sc > best:
                    best, best_tags = sc, seq
            assert best_tags is not None
            assert m.cut(text) == tags_to_words(text, best_tags), \
                (trial, text, best_tags)


@pytest.mark.skipif(not os.path.exists(REF_DAT),
                    reason="reference artifact not present")
class TestReferenceDictParity:
    """Validation against the reference's shipped dictionary: words
    jieba itself produced from the reference corpus must round-trip
    through our max-prob segmentation."""

    @pytest.fixture(scope="class")
    def ref_words(self):
        from ref_dict import parse_dict_index
        d, _ = parse_dict_index(REF_DAT)
        return d

    def test_dict_words_roundtrip(self, ref_words):
        from searchenginesimple_ray.functions.segment import DictSegmenter
        seg = DictSegmenter(ref_words)
        freq = seg.freq
        import math
        logtot = math.log(seg.total)
        n_checked = 0
        for w, c in ref_words:
            if len(w) < 2 or not all(0x4E00 <= ord(ch) <= 0x9FA5
                                     for ch in w):
                continue
            # the word is the provably-best path for itself whenever
            # its own log-prob beats the best 2+-part split; verify
            # the guaranteed subset: every proper part unseen =>
            # split cost <= 2*(log(1)-logtot) < log(c)-logtot
            parts_seen = any(w[i:j] in freq
                             for i in range(len(w))
                             for j in range(i + 1, len(w) + 1)
                             if (i, j) != (0, len(w)))
            if parts_seen:
                continue
            assert seg.cut(w) == [w], w
            n_checked += 1
        assert n_checked > 500  # the subset is large enough to matter

    def test_sample_sentences_prefer_dict_words(self, ref_words):
        from searchenginesimple_ray.functions.segment import DictSegmenter
        seg = DictSegmenter(ref_words)
        words = [w for w, c in ref_words
                 if len(w) >= 2 and c >= 10
                 and all(0x4E00 <= ord(ch) <= 0x9FA5 for ch in w)][:50]
        assert len(words) >= 20
        # concatenations of frequent dict words re-segment into words
        # (not single codepoints) for the vast majority of pairs
        ok = 0
        for a, b in zip(words[::2], words[1::2]):
            cut = seg.cut(a + b)
            if all(len(p) >= 2 for p in cut):
                ok += 1
        assert ok >= 0.8 * (len(words) // 2)


class TestRegisteredDictTokenizerBuild:
    def test_build_uses_dict_words(self, ray_session, tmp_path):
        """End-to-end: a registered dictionary tokenizer changes the
        indexed vocabulary from codepoints to dictionary words."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from searchenginesimple_ray.config import EngineConfig
        from searchenginesimple_ray.functions.segment import \
            register_dict_tokenizer
        from searchenginesimple_ray.pipelines.index_build import build_index

        register_dict_tokenizer("test_dict", {"长江": 5, "大桥": 4,
                                              "南京市": 10})
        corp = tmp_path / "corpus"
        corp.mkdir()
        rows = [("c0", i, "user", "南京市长江大桥 hello", "", 0)
                for i in range(12)]
        t = pa.table({
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array([r[2] for r in rows]),
            "text": pa.array([r[3] for r in rows]),
            "tool": pa.array([r[4] for r in rows]),
            "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
        })
        pq.write_table(t, corp / "part0.parquet")
        out = tmp_path / "idx"
        cfg = EngineConfig(num_input_buckets=1, num_doc_shards=1,
                           tokenizer="test_dict", dedup_enabled=False,
                           min_text_len=1)
        build_index([str(corp / "part0.parquet")], str(out), cfg)
        df = pq.read_table(str(out / "term_df" / "term_df.parquet")) \
            .to_pandas()
        terms = set(df["term"])
        # dictionary words indexed as units; no lone codepoints from
        # inside them (长 appears only via the unsegmented 长)
        assert {"南京市", "长江", "大桥", "hello"} <= terms
        assert "南" not in terms and "桥" not in terms

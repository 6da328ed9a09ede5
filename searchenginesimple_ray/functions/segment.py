"""Dictionary-driven CJK segmentation (M3 upgrade).

The reference segments with cppjieba ``Cut(text, words, hmm=true)``
(`include/Page/Page.hpp:288`, `include/Dictionary/Dictionary.hpp:95`).
Jieba's core algorithm is public (jieba README / MIT source): build a
DAG of all dictionary words starting at each position, then pick the
max-probability path under a unigram model ``log(freq/total)`` with
unseen single characters given frequency 1.  ``DictSegmenter``
implements exactly that algorithm for ANY user-supplied (word, freq)
dictionary, INCLUDING jieba's HMM out-of-vocabulary step: runs of
consecutive single-codepoint DAG pieces are buffered and, when the
buffered run is itself out-of-vocabulary, re-segmented by a 4-state
(B/M/E/S) Viterbi pass — the exact ``__cut_DAG`` control flow and
``finalseg`` decoder of jieba's MIT source, with jieba's published
start/transition log-probabilities.  One documented deviation
remains: jieba's character-emission table (``prob_emit.py``, ~20k
characters trained on the People's-Daily corpus) is not vendored;
``HmmModel.from_dictionary`` trains emissions from the supplied
dictionary by the same positional-count method (word-initial char →
B, word-final → E, interior → M, single-char words → S), and any
externally-trained table can be passed via ``HmmModel(emit_p=...)``.

The engine default tokenizer remains the deterministic per-codepoint
stand-in (`functions/tokenize.py`); a dictionary tokenizer is one
``register_dict_tokenizer(...)`` call away, and the test suite
validates this implementation against the reference's own shipped
dictionary artifact (`data/dictIndex.dat`, 15k multi-char CJK words
with corpus frequencies).
"""

from __future__ import annotations

import math
import re
from collections import Counter

from .tokenize import cjk_newline_join, ref_transform

# ASCII alnum runs | CJK runs (segmented further by the dictionary)
_RUNS = re.compile(r"[A-Za-z0-9]+|[一-龥]+")

# jieba's published HMM parameters (jieba/finalseg/prob_start.py,
# prob_trans.py — MIT licence).  These are corpus-independent model
# structure: start distribution, allowed transitions, and the legal
# predecessor map the Viterbi pass iterates over.
_MIN_FLOAT = -3.14e100
HMM_START_P = {"B": -0.26268660809250016, "E": _MIN_FLOAT,
               "M": _MIN_FLOAT, "S": -1.4652633398537678}
HMM_TRANS_P = {
    "B": {"E": -0.510825623765990, "M": -0.916290731874155},
    "E": {"B": -0.5897149736854513, "S": -0.8085250474669937},
    "M": {"E": -0.33344856811948514, "M": -1.2603623820268226},
    "S": {"B": -0.7211965654669841, "S": -0.6658631448798212},
}
_PREV_STATES = {"B": ("E", "S"), "M": ("M", "B"),
                "S": ("S", "E"), "E": ("B", "M")}
_STATES = ("B", "M", "E", "S")


class HmmModel:
    """4-state (B/M/E/S) character-tagging HMM — jieba's ``finalseg``
    decoder.  ``start_p`` / ``trans_p`` default to jieba's published
    constants; ``emit_p`` maps state -> {char: log-prob} (unseen
    characters emit at ``_MIN_FLOAT``, as in jieba)."""

    def __init__(self, emit_p: dict[str, dict[str, float]],
                 start_p: dict[str, float] | None = None,
                 trans_p: dict[str, dict[str, float]] | None = None):
        self.emit_p = {s: dict(emit_p.get(s, {})) for s in _STATES}
        self.start_p = dict(start_p or HMM_START_P)
        self.trans_p = {s: dict((trans_p or HMM_TRANS_P)[s])
                        for s in _STATES}

    @classmethod
    def from_dictionary(cls, freq: dict[str, int]) -> "HmmModel":
        """Train the emission table from a (word -> count) dictionary
        by positional counts — the same supervised method jieba's
        shipped ``prob_emit`` was produced with, applied to the only
        corpus statistics we legitimately have (the dictionary)."""
        counts: dict[str, Counter] = {s: Counter() for s in _STATES}
        for w, c in freq.items():
            c = max(int(c), 1)
            if len(w) == 1:
                counts["S"][w] += c
            elif len(w) >= 2:
                counts["B"][w[0]] += c
                counts["E"][w[-1]] += c
                for ch in w[1:-1]:
                    counts["M"][ch] += c
        emit = {}
        for s in _STATES:
            tot = sum(counts[s].values())
            emit[s] = ({ch: math.log(n / tot)
                        for ch, n in counts[s].items()} if tot else {})
        return cls(emit)

    def viterbi(self, text: str) -> list[str]:
        """Max-probability state sequence (jieba ``finalseg.viterbi``:
        legal-predecessor pruning, final state forced to E or S, ties
        broken by max() over (score, state) tuples exactly as jieba's
        ``max`` over tuples does)."""
        v = [{}]
        path: dict[str, list[str]] = {}
        for y in _STATES:
            v[0][y] = self.start_p[y] + \
                self.emit_p[y].get(text[0], _MIN_FLOAT)
            path[y] = [y]
        for t in range(1, len(text)):
            v.append({})
            newpath: dict[str, list[str]] = {}
            for y in _STATES:
                em = self.emit_p[y].get(text[t], _MIN_FLOAT)
                prob, state = max(
                    (v[t - 1][y0] + self.trans_p[y0].get(y, _MIN_FLOAT)
                     + em, y0) for y0 in _PREV_STATES[y])
                v[t][y] = prob
                newpath[y] = path[state] + [y]
            path = newpath
        _, state = max((v[len(text) - 1][y], y) for y in ("E", "S"))
        return path[state]

    def cut(self, text: str) -> list[str]:
        """Words from the decoded tags (jieba ``finalseg.__cut``)."""
        if not text:
            return []
        tags = self.viterbi(text)
        out: list[str] = []
        begin = nexti = 0
        for i, tag in enumerate(tags):
            if tag == "B":
                begin = i
            elif tag == "E":
                out.append(text[begin:i + 1])
                nexti = i + 1
            elif tag == "S":
                out.append(text[i])
                nexti = i + 1
        if nexti < len(text):
            out.append(text[nexti:])
        return out


class DictSegmenter:
    """Max-probability DAG segmentation over a (word -> freq) dict —
    jieba's published algorithm, including the HMM OOV step when
    ``hmm=True`` (the reference always cuts with ``hmm=true``,
    `include/Page/Page.hpp:288`).

    Deterministic tie rule: on equal path log-probability prefer the
    LONGER word at the current position.
    """

    def __init__(self, words: dict[str, int] | list[tuple[str, int]],
                 hmm: bool = True,
                 hmm_model: HmmModel | None = None):
        items = words.items() if isinstance(words, dict) else words
        self.freq = {w: max(int(c), 1) for w, c in items if w}
        self.max_len = max((len(w) for w in self.freq), default=1)
        # +1 per unseen char is approximated by total+1 smoothing;
        # jieba uses plain total of dict freqs — we match jieba.
        self.total = max(sum(self.freq.values()), 1)
        self._logtotal = math.log(self.total)
        self.hmm = bool(hmm) or hmm_model is not None
        self._hmm_model = hmm_model
        if self.hmm and self._hmm_model is None:
            self._hmm_model = HmmModel.from_dictionary(self.freq)

    def _word_logp(self, w: str) -> float:
        return math.log(self.freq.get(w, 1)) - self._logtotal

    def cut(self, run: str) -> list[str]:
        """Segment one contiguous CJK run (jieba ``__cut_DAG`` when
        ``hmm`` is on, ``__cut_DAG_NO_HMM`` semantics otherwise)."""
        pieces = self._cut_dag(run)
        if not self.hmm:
            return pieces
        # jieba __cut_DAG: buffer consecutive single-char pieces; a
        # buffered run of length >= 2 that is itself OOV goes through
        # the HMM; an in-vocab buffer is emitted per character.
        out: list[str] = []

        def flush(buf: str) -> None:
            if len(buf) == 1:
                out.append(buf)
            elif buf not in self.freq:
                out.extend(self._hmm_model.cut(buf))
            else:
                out.extend(buf)

        buf = ""
        for w in pieces:
            if len(w) == 1:
                buf += w
            else:
                if buf:
                    flush(buf)
                    buf = ""
                out.append(w)
        if buf:
            flush(buf)
        return out

    def _cut_dag(self, run: str) -> list[str]:
        """Max-prob DAG pieces for one contiguous CJK run."""
        n = len(run)
        if n <= 1:
            return [run] if run else []
        # DAG: for each i the set of j where run[i:j] is a word
        # (i+1 always present: single-char fallback, freq >= 1)
        choice = [0] * n
        route = [0.0] * (n + 1)
        for i in range(n - 1, -1, -1):
            best_v = -math.inf
            best_j = i + 1
            hi = min(n, i + self.max_len)
            for j in range(i + 1, hi + 1):
                w = run[i:j]
                if j > i + 1 and w not in self.freq:
                    continue
                v = self._word_logp(w) + route[j]
                if v > best_v or (v == best_v and j > best_j):
                    best_v, best_j = v, j
            route[i] = best_v
            choice[i] = best_j
        out = []
        i = 0
        while i < n:
            out.append(run[i:choice[i]])
            i = choice[i]
        return out


class DictTokenCounter:
    """Drop-in tokenizer-stage counter (same interface as
    ``stages/tokenizer.TokenCounter``): M2 newline join, dictionary
    max-prob segmentation of CJK runs, M4 charset filter + literal
    fold, optional M5 stop filter."""

    def __init__(self, words, stop_words=(), apply_stop: bool = True,
                 hmm: bool = True):
        self.seg = DictSegmenter(words, hmm=hmm)
        self.stop = frozenset(stop_words)
        self.apply_stop = apply_stop

    def doc_counts(self, text: str) -> Counter:
        c: Counter = Counter()
        for m in _RUNS.finditer(cjk_newline_join(text)):
            tok = m.group()
            if 0x4E00 <= ord(tok[0]) <= 0x9FA5:
                parts = self.seg.cut(tok)
            else:
                # M4 charset filter + literal fold (digit-led dropped)
                t = ref_transform(tok)
                parts = () if t is None else (t,)
            for p in parts:
                if self.apply_stop and p in self.stop:
                    continue
                c[p] += 1
        return c

    def tokens(self, text: str) -> list[str]:
        """Ordered token stream (query-path helper)."""
        out: list[str] = []
        for m in _RUNS.finditer(cjk_newline_join(text)):
            tok = m.group()
            if 0x4E00 <= ord(tok[0]) <= 0x9FA5:
                out.extend(self.seg.cut(tok))
            else:
                t = ref_transform(tok)
                if t is not None:
                    out.append(t)
        return out


def register_dict_tokenizer(name: str, words, hmm: bool = True) -> None:
    """Register a dictionary tokenizer under ``name`` so
    ``EngineConfig(tokenizer=name)`` selects it for a build (the name
    becomes part of the lineage fingerprint).

    MIGRATION NOTE: ``hmm`` defaults to True since r3 (the reference
    cuts with ``Cut(text, words, true)``) — OOV CJK runs now join into
    HMM words instead of single codepoints.  An index built with a
    pre-r3 dict tokenizer must either be REBUILT or re-register its
    tokenizer with ``hmm=False``; otherwise query-side tokens for OOV
    runs no longer match the indexed vocabulary."""
    from ..registry import register

    @register("tokenizer", name)
    def _factory(stop_words=(), apply_stop: bool = True,
                 _words=words, _hmm=hmm):
        return DictTokenCounter(_words, stop_words=stop_words,
                                apply_stop=apply_stop, hmm=_hmm)


__all__ = ["DictSegmenter", "DictTokenCounter", "HmmModel",
           "HMM_START_P", "HMM_TRANS_P", "register_dict_tokenizer"]

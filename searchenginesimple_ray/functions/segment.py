"""Dictionary-driven CJK segmentation (M3 upgrade).

The reference segments with cppjieba ``Cut(text, words, hmm=true)``
(`include/Page/Page.hpp:288`, `include/Dictionary/Dictionary.hpp:95`).
Jieba's core algorithm is public (jieba README / MIT source): build a
DAG of all dictionary words starting at each position, then pick the
max-probability path under a unigram model ``log(freq/total)`` with
unseen single characters given frequency 1.  ``DictSegmenter``
implements exactly that algorithm for ANY user-supplied (word, freq)
dictionary — we do not vendor jieba's dict.txt or its HMM model, so
out-of-vocabulary multi-character words fall back to single
codepoints (the HMM OOV step is the one part not reproduced;
documented deviation).

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


class DictSegmenter:
    """Max-probability DAG segmentation over a (word -> freq) dict —
    jieba's published algorithm minus the HMM OOV step.

    Deterministic tie rule: on equal path log-probability prefer the
    LONGER word at the current position.
    """

    def __init__(self, words: dict[str, int] | list[tuple[str, int]]):
        items = words.items() if isinstance(words, dict) else words
        self.freq = {w: max(int(c), 1) for w, c in items if w}
        self.max_len = max((len(w) for w in self.freq), default=1)
        # +1 per unseen char is approximated by total+1 smoothing;
        # jieba uses plain total of dict freqs — we match jieba.
        self.total = max(sum(self.freq.values()), 1)
        self._logtotal = math.log(self.total)

    def _word_logp(self, w: str) -> float:
        return math.log(self.freq.get(w, 1)) - self._logtotal

    def cut(self, run: str) -> list[str]:
        """Segment one contiguous CJK run."""
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

    def __init__(self, words, stop_words=(), apply_stop: bool = True):
        self.seg = DictSegmenter(words)
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


def register_dict_tokenizer(name: str, words) -> None:
    """Register a dictionary tokenizer under ``name`` so
    ``EngineConfig(tokenizer=name)`` selects it for a build (the name
    becomes part of the lineage fingerprint)."""
    from ..registry import register

    @register("tokenizer", name)
    def _factory(stop_words=(), apply_stop: bool = True,
                 _words=words):
        return DictTokenCounter(_words, stop_words=stop_words,
                                apply_stop=apply_stop)


__all__ = ["DictSegmenter", "DictTokenCounter", "register_dict_tokenizer"]

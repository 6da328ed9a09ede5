"""Simhash fingerprinting (reference parity where deterministic).

Reference flow (`include/simhash/Simhasher.hpp:44-71`, topN=5 at
`include/Page/Page.hpp:94`):

1. extract topN keywords with weights (cppjieba's TF-IDF extractor —
   depends on jieba's shipped IDF model, which we do not vendor);
2. jenkins 64-bit hash of each keyword (`jenkins.h:98-103`);
3. weighted ±1 bit vote per of 64 bits, weight = keyword weight;
   bit j of the result = 1 iff vote > 0 (`Simhasher.hpp:50-68`).

The ENGINE DEFAULT weighting (``top_keywords``) is ``1 + log2(tf)``
(log-damped term frequency, ties broken by lexicographic term order —
deterministic, model-free): raw tf let one hot term dominate the vote
(measured 1065 vs 38 false hamming<=3 pairs on the fixture corpus).

REFERENCE-SEMANTICS weighting is available too (r3):
``RefKeywordExtractor`` / ``ref_keyword_weights`` reproduce cppjieba's
``KeywordExtractor::Extract`` (the MIT cppjieba source the reference
vendors; wiring at `Simhasher.hpp:21-44`): mixed dict+HMM cut, drop
single-rune words and stop words, weight = tf * idf with the table
average for OOV words, top-N by weight.  Supply any IDF table in
jieba's public ``idf.txt`` shape (``word -> idf``); jieba's shipped
corpus table itself is not vendored.  cppjieba's ``partial_sort``
leaves equal-weight order unspecified — we break ties by word asc
(deterministic; documented choice).  Steps 2-3 are bit-exact with the
reference (including strict ``> 0`` vote and equal-weight ties).  The
hamming-distance equality test used for near-dedup is exact parity
(`Simhasher.hpp:109-151`).
"""

from __future__ import annotations

from collections import Counter

from .hashing import jenkins64
from .tokenize import term_frequencies


def top_keywords(tf: Counter, top_n: int = 0) -> list[tuple[str, float]]:
    """(term, weight) features for the bit vote.

    ``top_n > 0``: top-N by tf desc then term asc — the reference's
    keyword-extraction shape (topN=5, `Page.hpp:94`).  ``top_n <= 0``
    (engine default): ALL terms — standard full-feature simhash
    (Charikar 2002), far more discriminative on Zipf-skewed corpora
    where many docs share the same hot keywords.  In BOTH modes the
    weight is ``1 + log2(tf)`` (documented deviation from jieba's
    IDF-weighted scores; see the module header and the comment below).
    """
    items = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))
    if top_n > 0:
        items = items[:top_n]
    # weight = 1 + log2(tf): logarithmic tf damping.  Raw-tf weights let a
    # single high-tf hot term dominate the bit vote, collapsing unrelated
    # docs that share it onto near-identical hashes (measured: 1065 false
    # hamming<=3 pairs vs 38 on the t1 fixture corpus).  Deviation from
    # the reference's jieba-IDF keyword weights, shared with the oracle.
    import math
    return [(t, 1.0 + math.log2(c)) for t, c in items]


def ref_keyword_weights(tf: Counter, idf: dict[str, float],
                        idf_avg: float, stop: frozenset,
                        top_n: int = 5) -> list[tuple[str, float]]:
    """cppjieba ``KeywordExtractor::Extract`` weighting over a term
    frequency Counter: drop single-rune words (``IsSingleWord``) and
    stop words, weight = tf * idf (table average for OOV), top-N by
    weight desc then word asc (deterministic tie rule; cppjieba's
    partial_sort leaves ties unspecified)."""
    weighted = [(w, c * idf.get(w, idf_avg)) for w, c in tf.items()
                if len(w) > 1 and w not in stop]
    weighted.sort(key=lambda kv: (-kv[1], kv[0]))
    return weighted[:top_n] if top_n > 0 else weighted


def make_ref_weighter(idf: dict[str, float], stop_words=()):
    """A ``keyword_fn(tf, top_n)`` closure for the simhash stages —
    reference-semantics (tf*idf) weighting behind the same hook the
    default ``top_keywords`` fills."""
    idf = {w: float(v) for w, v in
           (idf.items() if isinstance(idf, dict) else idf)}
    idf_avg = (sum(idf.values()) / len(idf)) if idf else 1.0
    stop = frozenset(stop_words)

    def keyword_fn(tf: Counter, top_n: int = 5):
        return ref_keyword_weights(tf, idf, idf_avg, stop, top_n)

    return keyword_fn


class RefKeywordExtractor:
    """Standalone reference-semantics keyword extractor + simhash:
    the full cppjieba ``Jieba.extractor.Extract`` -> jenkins64 ->
    weighted bit vote path of ``Simhasher::make``
    (`Simhasher.hpp:26-71`, topN=5 at `Page.hpp:94`).

    ``words`` is the segmentation dictionary (word -> freq) cut with
    jieba's max-prob DAG + HMM OOV step (``DictSegmenter(hmm=True)``
    == cppjieba's MixSegment); ``idf`` is a (word -> idf) table in
    jieba's public ``idf.txt`` shape."""

    def __init__(self, words, idf: dict[str, float], stop_words=()):
        from .segment import _RUNS, DictSegmenter
        self._runs = _RUNS
        self.seg = DictSegmenter(words, hmm=True)
        self.idf = {w: float(v) for w, v in
                    (idf.items() if isinstance(idf, dict) else idf)}
        self.idf_avg = (sum(self.idf.values()) / len(self.idf)) \
            if self.idf else 1.0
        self.stop = frozenset(stop_words)
        self.hash_cache: dict = {}

    def term_frequencies(self, text: str) -> Counter:
        """Mixed-segment tf: CJK runs via the dictionary+HMM cut,
        ASCII alnum runs as single words (jieba keeps ascii runs
        whole), punctuation/whitespace skipped."""
        tf: Counter = Counter()
        for m in self._runs.finditer(text):
            run = m.group()
            if 0x4E00 <= ord(run[0]) <= 0x9FA5:
                tf.update(self.seg.cut(run))
            else:
                tf[run] += 1
        return tf

    def extract(self, text: str, top_n: int = 5) \
            -> list[tuple[str, float]]:
        return ref_keyword_weights(self.term_frequencies(text),
                                   self.idf, self.idf_avg, self.stop,
                                   top_n)

    def simhash(self, text: str, top_n: int = 5) -> int:
        return simhash_from_keywords(self.extract(text, top_n),
                                     self.hash_cache)


def simhash_from_keywords(keywords: list[tuple[str, float]],
                          hash_cache: dict | None = None) -> int:
    """Weighted bit vote over jenkins64 hashes (`Simhasher.hpp:50-68`).

    Mirrors ``make_from_predefined_keywords`` (`Simhasher.hpp:77-106`).
    Returns 0 for an empty keyword list (the reference skips docs whose
    simhash is 0, `Page.hpp:127-133`).
    """
    if not keywords:
        return 0
    import numpy as np
    votes = np.zeros(64)
    for term, w in keywords:
        # cache the +-1 vote VECTOR, not just the hash: the 64-step
        # Python unpack loop per (term, doc) occurrence dominated the
        # tokenize hot path on Zipf corpora.  w * (+-1.0) is exactly
        # +-w, accumulated in the same term order => bit-identical to
        # the scalar loop.
        bits = hash_cache.get(term) if hash_cache is not None else None
        if bits is None:
            h = jenkins64(term)
            bits = np.fromiter(
                (1.0 if (h >> j) & 1 else -1.0 for j in range(64)),
                np.float64, 64)
            if hash_cache is not None:
                hash_cache[term] = bits
        votes += w * bits
    v = 0
    for j in range(64):
        if votes[j] > 0.0:
            v |= 1 << j
    return v


def simhash_of_text(text: str, top_n: int = 0,
                    stop_words: frozenset | None = None,
                    hash_cache: dict | None = None) -> int:
    """Text -> simhash, the per-doc fingerprint (T1/T2)."""
    tf = term_frequencies(text, stop_words)
    return simhash_from_keywords(top_keywords(tf, top_n), hash_cache)

"""Simhash fingerprinting (reference parity where deterministic).

Reference flow (`include/simhash/Simhasher.hpp:44-71`, topN=5 at
`include/Page/Page.hpp:94`):

1. extract topN keywords with weights (cppjieba's TF-IDF extractor —
   depends on jieba's shipped IDF model, which we do not vendor);
2. jenkins 64-bit hash of each keyword (`jenkins.h:98-103`);
3. weighted ±1 bit vote per of 64 bits, weight = keyword weight;
   bit j of the result = 1 iff vote > 0 (`Simhasher.hpp:50-68`).

**Documented deviation** (SURVEY §7.5): step 1's keyword weights here
are ``tf`` within the doc with ties broken by lexicographic term order
(deterministic, model-free) instead of jieba's IDF-weighted TF.  Steps
2-3 are bit-exact with the reference (including strict ``> 0`` vote and
equal-weight ties).  The hamming-distance equality test used for
near-dedup is exact parity (`Simhasher.hpp:109-151`).
"""

from __future__ import annotations

from collections import Counter

from .hashing import jenkins64
from .tokenize import term_frequencies


def top_keywords(tf: Counter, top_n: int = 0) -> list[tuple[str, float]]:
    """(term, weight) features for the bit vote.

    ``top_n > 0``: top-N by tf desc then term asc — the reference's
    keyword-extraction shape (topN=5, `Page.hpp:94`), with tf standing
    in for jieba's IDF-weighted scores (documented deviation).
    ``top_n <= 0`` (engine default): ALL terms, weight = tf — standard
    full-feature simhash (Charikar 2002), far more discriminative on
    Zipf-skewed corpora where many docs share the same hot keywords.
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


def simhash_from_keywords(keywords: list[tuple[str, float]],
                          hash_cache: dict | None = None) -> int:
    """Weighted bit vote over jenkins64 hashes (`Simhasher.hpp:50-68`).

    Mirrors ``make_from_predefined_keywords`` (`Simhasher.hpp:77-106`).
    Returns 0 for an empty keyword list (the reference skips docs whose
    simhash is 0, `Page.hpp:127-133`).
    """
    if not keywords:
        return 0
    votes = [0.0] * 64
    for term, w in keywords:
        if hash_cache is not None:
            h = hash_cache.get(term)
            if h is None:
                h = jenkins64(term)
                hash_cache[term] = h
        else:
            h = jenkins64(term)
        for j in range(64):
            if (h >> j) & 1:
                votes[j] += w
            else:
                votes[j] -= w
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

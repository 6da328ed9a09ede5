"""Tokenization + normalization with reference-literal semantics.

The reference pipeline (build side, `include/Page/Page.hpp:283-309`;
dict side `include/Dictionary/Dictionary.hpp:89-116`; query side —
WITHOUT the stop filter — `include/Page/WebPageQuery.hpp:143-160`):

1. **CJK newline join** (M2): regex ``([一-龥])\n+([一-龥])``
   replaced by ``$1$2`` (`Page.hpp:283-287`).
2. **Segmentation** (M3): cppjieba ``Cut(text, words, hmm=True)``.  We
   do not ship jieba's model; the deterministic analogue is: ASCII
   alnum runs are single tokens, each CJK codepoint is its own token
   (documented deviation — filter/fold/stop semantics below are exact).
3. **Charset filter + "case fold"** (M4, `Page.hpp:290-309`): keep a
   token iff its FIRST codepoint is CJK ``[0x4e00,0x9fa5]`` or an ASCII
   letter; all other tokens (digits, punctuation, other scripts) are
   dropped.  For ASCII-letter-led tokens every char in ``[0x41,0x5a]``
   (A-Z) is mapped to ``chr(c - 0x20)`` — **the reference literally
   subtracts 0x20 from UPPERCASE letters, mapping 'A'..'Z' to
   '!'..':'** (an apparent bug in the original, applied identically on
   build and query sides, so index keys still match).  We reproduce it
   bit-for-bit.
4. **Stop filter** (M5): build side only (`Page.hpp:294,305`); the
   query path applies NO stop filter (`WebPageQuery.hpp:140-160`).

``tokenize`` is the scalar spec; ``TokenCounter`` in
``stages/tokenizer.py`` is the vectorized/actor-pool version.
"""

from __future__ import annotations

import re
from collections import Counter

# M2: join Chinese lines (Page.hpp:283-287)
_CJK_NEWLINE = re.compile(r"([一-龥])\n+([一-龥])")

# M3 analogue: ASCII alnum runs | single CJK codepoints
_TOKEN = re.compile(r"[A-Za-z0-9]+|[一-龥]")

# M4 "case fold": A-Z -> chr(c-0x20)  (literal reference behaviour)
_REF_FOLD = str.maketrans({chr(c): chr(c - 0x20) for c in range(0x41, 0x5B)})


def cjk_newline_join(text: str) -> str:
    return _CJK_NEWLINE.sub(r"\1\2", text)


def segment(text: str) -> list[str]:
    """Deterministic segmentation (jieba stand-in, M3)."""
    return _TOKEN.findall(cjk_newline_join(text))


def ref_transform(token: str) -> str | None:
    """Charset filter + literal case map (M4). None => token dropped."""
    if not token:
        return None
    cp = ord(token[0])
    if 0x4E00 <= cp <= 0x9FA5:
        return token
    if (0x41 <= cp <= 0x5A) or (0x61 <= cp <= 0x7A):
        return token.translate(_REF_FOLD)
    return None


def tokenize(text: str, stop_words: frozenset | None = None) -> list[str]:
    """Full build-side token stream: segment -> M4 transform -> M5 stop.

    Pass ``stop_words=None`` for the query path (no stop filter,
    `WebPageQuery.hpp:140-160`).
    """
    out = []
    for tok in segment(text):
        t = ref_transform(tok)
        if t is None:
            continue
        if stop_words and t in stop_words:
            continue
        out.append(t)
    return out


def term_frequencies(text: str, stop_words: frozenset | None = None) -> Counter:
    """Per-doc TF (G1, `Page.hpp:296,306`)."""
    return Counter(tokenize(text, stop_words))


def query_raw_and_transformed(text: str) -> tuple[list[str], list[str]]:
    """Query path: raw segmented words AND the transformed/filtered list.

    The reference scores over the RAW word list while weights are keyed
    by transformed tokens (`WebPageQuery.hpp:91-96` vs 143-160) — both
    lists are needed to reproduce that quirk.
    """
    raw = segment(text)
    transformed = [t for t in (ref_transform(w) for w in raw) if t is not None]
    return raw, transformed

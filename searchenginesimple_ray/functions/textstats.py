"""Text-analysis scalar kernels for the training-data-pipeline ops:
language-ID (charclass + stopword-marker heuristic), quality scoring
(length / punctuation / stopword ratios), token counting (whitespace +
BPE-ish regex), and rolling-hash document fingerprinting.

These power the `queries()` text-analysis entries over the `documents`
table; the hot-path versions are vectorized in
``stages/``/``pipelines``.  No model downloads — pure heuristics.
"""

from __future__ import annotations

import re

import numpy as np

WS_TOKEN = re.compile(r"\S+")
# BPE-ish pretokenizer: letter runs, digit runs, single other non-space chars
BPE_TOKEN = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
PUNCT = re.compile(r"[^\w\s]")
CJK = re.compile(r"[一-龥]")

# tiny language marker sets (public common stopwords) for the heuristic
LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "por", "con"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "dans", "est", "pour"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"},
}


def whitespace_token_count(text: str) -> int:
    return len(WS_TOKEN.findall(text))


def bpe_token_count(text: str) -> int:
    return len(BPE_TOKEN.findall(text))


def quality_stats(text: str, stop_words: frozenset) -> dict:
    toks = [t.lower() for t in WS_TOKEN.findall(text)]
    n = len(toks)
    n_chars = len(text)
    n_punct = len(PUNCT.findall(text))
    n_stop = sum(1 for t in toks if t in stop_words)
    mean_len = (sum(len(t) for t in toks) / n) if n else 0.0
    return {
        "n_tokens": n,
        "n_chars": n_chars,
        "punct_ratio": (n_punct / n_chars) if n_chars else 0.0,
        "stop_ratio": (n_stop / n) if n else 0.0,
        "mean_token_len": mean_len,
    }


def lang_id(text: str) -> str:
    """Heuristic language ID: CJK char share first, then marker-stopword
    voting over LANG_MARKERS; ties and no-evidence -> 'und'."""
    if CJK.search(text):
        cjk = len(CJK.findall(text))
        if cjk * 4 >= len(text):
            return "zh"
    toks = [t.lower() for t in WS_TOKEN.findall(text)]
    if not toks:
        return "und"
    scores = {lang: sum(1 for t in toks if t in m) for lang, m in LANG_MARKERS.items()}
    best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
    if best[1] == 0:
        return "und"
    top = [l for l, s in scores.items() if s == best[1]]
    return sorted(top)[0]


_FP_BASE = np.uint64(1099511628211)     # FNV64 prime as rolling base
_FP_MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Rolling polynomial hash fingerprint: min over all windows of a
    degree-`window` polynomial hash of the byte stream (a Rabin-Karp /
    winnowing-style document fingerprint; deterministic, mod 2^64)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = data.size
    if n == 0:
        return 0
    with np.errstate(over="ignore"):  # intended mod-2^64 wraparound
        if n <= window:
            h = np.uint64(0)
            for b in data:
                h = (h * _FP_BASE + b) & _FP_MOD_MASK
            return int(h)
        # vectorized rolling hash: window hash = H[i+w] - H[i]*base^w over
        # prefix hashes, all mod 2^64
        powers = np.empty(n + 1, dtype=np.uint64)
        powers[0] = np.uint64(1)
        for i in range(1, n + 1):
            powers[i] = powers[i - 1] * _FP_BASE
        prefix = np.zeros(n + 1, dtype=np.uint64)
        for i in range(n):
            prefix[i + 1] = prefix[i] * _FP_BASE + data[i]
        wh = prefix[window:] - prefix[:-window] * powers[window]
        return int(wh.min())

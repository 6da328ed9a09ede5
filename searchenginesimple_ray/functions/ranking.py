"""Canonical top-k ordering (the tie/precision SPEC, FIXTURES.md F3).

Distributed float accumulation (groupby partial sums, shard merges)
legitimately produces low-bit score jitter vs a single-process oracle.
The defined total order therefore quantizes scores to 1e-9 before
comparing, then breaks ties by doc_id asc; NaN scores sort last (the
reference's heap comparator is UB for NaN, `WebPageQuery.hpp:101-117`).
Both the engine and the oracle rank with THESE functions; raw scores
are still reported and asserted equal within 1e-9.
"""

from __future__ import annotations

import math

DECIMALS = 9
EPS = 10.0 ** (-DECIMALS)


def qround(s: float) -> float:
    if isinstance(s, float) and math.isnan(s):
        return s
    return round(s, DECIMALS)


def sort_scored_desc(items):
    """[(score, doc_id), ...] -> sorted best-first (score desc, doc
    asc); NaN scores last by doc_id (a bare -qround(NaN) key is
    non-transitive under sorted() and left NaN rows wherever they
    arrived — shard-merge order, not a total order)."""
    def key(sd):
        s, d = sd[0], sd[1]
        if isinstance(s, float) and math.isnan(s):
            return (1, 0.0, d)
        return (0, -qround(s), d)
    return sorted(items, key=key)


def sort_scored_asc_nan_last(items):
    """[(score, doc_id, is_nan?), ...] -> (score asc, doc asc), NaN last.

    Accepts 2-tuples (score, doc) or 3-tuples (score, doc, is_nan).
    """
    def key(x):
        s, d = x[0], x[1]
        nan = (x[2] if len(x) > 2 else False) or (
            isinstance(s, float) and (math.isnan(s) or math.isinf(s)))
        return (math.inf if nan else qround(s), d)
    return sorted(items, key=key)

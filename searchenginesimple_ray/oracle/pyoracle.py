"""Pure-Python reference-semantics oracles (FIXTURES.md F3).

Everything here is deliberately brute force — dict-of-dicts postings,
all-pairs hamming dedup, exhaustive scoring — so the distributed engine
can be asserted *rank-identical* against it.  The scalar token /
simhash / weight DEFINITIONS are shared with the engine (they are the
spec, `functions/`); the distributed machinery (banding, sharding,
varbyte, actor merge) is NOT shared, which is what the tests exercise.

Scoring semantics mirror the reference literally:
- ref_cosine: G6/G7/G8 (`include/Page/WebPageQuery.hpp:38-185`) with
  the sign quirks and the raw-vs-transformed token mismatch intact;
- bm25: exhaustive BM25 (k1=1.2, b=0.75, Robertson idf) over the same
  conjunctive candidate rule (A8).
- dedup: all-pairs hamming<=3 connected components, representative =
  min doc_id (SURVEY §7.5 rule, shared with the engine).
"""

from __future__ import annotations

import math
from collections import Counter

from ..functions.hashing import hamming64
from ..functions.ranking import sort_scored_asc_nan_last, sort_scored_desc
from ..functions.simhash import simhash_of_text
from ..functions.tokenize import ref_transform, segment, tokenize


class OracleIndex:
    """In-memory single-process index over (doc_id, text) pairs."""

    def __init__(self, docs: list[tuple[int, str]], stop_words=(),
                 min_text_len: int = 10, simhash_top_n: int = 0,
                 hamming_threshold: int = 3,
                 bm25_k1: float = 1.2, bm25_b: float = 0.75,
                 pre_deduped: bool = False):
        self.stop = frozenset(stop_words)
        self.k1, self.b = bm25_k1, bm25_b

        # M8 length rule
        kept = [(d, t) for d, t in docs if len(t) >= min_text_len]

        if pre_deduped:
            self.docs = dict(kept)
            self.dropped: set[int] = set()
            self.clusters: dict[int, int] = {}
        else:
            # simhash + dedup (A3/A4): all-pairs, min-doc_id representative
            sims = {d: simhash_of_text(t, simhash_top_n, self.stop)
                    for d, t in kept}
            ids = sorted(sims)
            parent = {i: i for i in ids}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for i_pos, a in enumerate(ids):
                if sims[a] == 0:
                    continue
                for b in ids[i_pos + 1:]:
                    if sims[b] == 0:
                        continue
                    if int(hamming64(sims[a], sims[b])) <= hamming_threshold:
                        ra, rb = find(a), find(b)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)
            self.clusters = {i: find(i) for i in ids}
            self.dropped = {i for i in ids
                            if sims[i] == 0 or self.clusters[i] != i}
            self.docs = {d: t for d, t in kept if d not in self.dropped}
            self.simhashes = sims

        # forward + inverted index (G1, A6) — plain dicts
        self.tf: dict[int, Counter] = {}
        self.postings: dict[str, dict[int, int]] = {}
        for d, t in sorted(self.docs.items()):
            c = Counter(tokenize(t, self.stop))
            if not c:
                continue
            self.tf[d] = c
            for term, n in c.items():
                self.postings.setdefault(term, {})[d] = n
        self.n_docs = len(self.docs)
        self.df = {t: len(m) for t, m in self.postings.items()}
        self.doc_len = {d: sum(c.values()) for d, c in self.tf.items()}
        self.avgdl = (sum(self.doc_len.values()) / len(self.doc_len)
                      if self.doc_len else 1.0)
        # reference doc weights: idf*tf, then per-doc L2 norm (G3/G4)
        self.ref_weight: dict[str, dict[int, float]] = {}
        norms: dict[int, float] = {}
        for term, m in self.postings.items():
            idf = math.log2(self.n_docs / (self.df[term] + 1.0))
            for d, n in m.items():
                w = idf * n
                norms[d] = norms.get(d, 0.0) + w * w
        self.ref_norm = {d: math.sqrt(v) for d, v in norms.items()}
        for term, m in self.postings.items():
            idf = math.log2(self.n_docs / (self.df[term] + 1.0))
            self.ref_weight[term] = {
                d: (idf * n / self.ref_norm[d]) if self.ref_norm.get(d, 0) > 0
                else 0.0
                for d, n in m.items()}

    # ------------------------------------------------------------ BM25

    def bm25_idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25_topk(self, sentence: str, k: int = 10,
                  conjunctive: bool = True) -> list[dict]:
        qterms = [t for t in (ref_transform(w) for w in segment(sentence))
                  if t is not None]
        qtf = Counter(qterms)
        present = {t: q for t, q in qtf.items() if t in self.postings}
        if not present:
            return []
        if conjunctive:
            cand = None
            for t in present:
                s = set(self.postings[t])
                cand = s if cand is None else cand & s
            cand = cand or set()
        else:
            cand = set()
            for t in present:
                cand |= set(self.postings[t])
        scored = []
        for d in cand:
            s = 0.0
            for t, q in sorted(present.items()):
                n = self.postings[t].get(d)
                if n is None:
                    continue
                dl = self.doc_len[d]
                denom = n + self.k1 * (1 - self.b + self.b * dl / self.avgdl)
                s += q * self.bm25_idf(self.df[t]) * n * (self.k1 + 1) / denom
            scored.append((s, d))
        scored = sort_scored_desc(scored)
        return [{"rank": i, "doc_id": d, "score": s}
                for i, (s, d) in enumerate(scored[:k])]

    # ------------------------------------------------- reference cosine

    def ref_cosine_topk(self, sentence: str, k: int = 10) -> list[dict]:
        # G6 — raw words, transformed counts, IDF = log2(1/2), L2 norm
        words = segment(sentence)
        count: Counter = Counter()
        for w in words:
            t = ref_transform(w)
            if t is not None:
                count[t] += 1
        idf = math.log2(0.5)
        weight = {t: idf * c for t, c in count.items()}
        sqr = math.sqrt(sum(v * v for v in weight.values()))
        if sqr > 0:
            weight = {t: v / sqr for t, v in weight.items()}
        # A8 — erase empty-posting terms from the intersection set only
        ikeys = [t for t in weight if self.postings.get(t)]
        if not ikeys:
            return []
        cand = None
        for t in ikeys:
            s = set(self.postings[t])
            cand = s if cand is None else cand & s
        # G7 — score over RAW word list (duplicates included)
        results = []
        for d in sorted(cand):
            xy = X2 = Y2 = 0.0
            for w in words:
                wq = weight.get(w, 0.0)
                y = self.ref_weight.get(w, {}).get(d, 0.0)
                xy += wq * y
                X2 += wq * wq
                Y2 += y * y
            denom = math.sqrt(X2) * math.sqrt(Y2)
            cos = (xy / denom) if denom > 0 else float("nan")
            results.append((cos, d))
        # G8 — min-heap pop order; defined tie/NaN rule (ranking spec)
        results = sort_scored_asc_nan_last(results)
        return [{"rank": i, "doc_id": d, "score": s}
                for i, (s, d) in enumerate(results[:k])]

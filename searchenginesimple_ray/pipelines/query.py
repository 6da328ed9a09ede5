"""Query path: actor-pool scorers over the sharded inverted index.

Replaces the reference's single-process ``PageServer`` (whole index in
one process RAM, `include/Page/WebPageQuery.hpp:28-36`, SURVEY §3.3)
with one scorer actor per doc shard: each actor loads ONLY its shard's
postings + doc_stats Parquet once (T4), queries fan out to all shards
and the driver merges per-shard top-k (G8).

Two scorers:

- ``bm25_topk`` — the north-star scorer: conjunctive posting-list
  intersection (A8 semantics: query terms absent from the index are
  dropped first, `WebPageQuery.hpp:52-58`; empty term set => empty
  result) with BM25 scoring and optional block-max pruning (Ding &
  Suel 2011): per-block score upper bounds (computed exactly at actor
  load from block-max-tf metadata + local doc lens) skip blocks that
  cannot beat the running min-heap threshold.  Pruning is exactness-
  preserving — property-tested equal to the exhaustive path.
- ``ref_cosine_topk`` — the reference's literal scorer, quirks intact
  (SURVEY §7.5): query weights ``IDF=log2(1/(1+1))=-1`` times TF,
  L2-normalized (G6, `WebPageQuery.hpp:140-185`); the scoring loop
  iterates RAW segmented words while weights/postings are keyed by
  transformed tokens, so tokens altered by the M4 case map contribute
  zero (G7, `WebPageQuery.hpp:86-99`); min-heap pop order => ascending
  raw cosine = descending true cosine (G8, `WebPageQuery.hpp:101-136`).
  Tie/NaN rule (defined, reference UB): sort by (raw_score asc,
  doc_id asc), NaN scores last by doc_id.

Determinism: identical results at any actor count (shard-local results
are merged with a total (score, doc_id) order).
"""

from __future__ import annotations

import glob
import heapq
import json
import math
import os
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

import ray

from ..functions.ranking import EPS, sort_scored_asc_nan_last, sort_scored_desc
from ..functions.tokenize import query_raw_and_transformed, ref_transform, segment
from ..functions.varbyte import batch_decode_posting_table


class ScorerCore:
    """Shard-local scoring state + kernels (plain class: unit-testable
    without Ray; wrapped in an actor by QueryEngine)."""

    def __init__(self, index_dir: str, doc_shards: list[int]):
        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.k1 = float(self.meta["bm25_k1"])
        self.b = float(self.meta["bm25_b"])
        self.n_docs = int(self.meta["n_docs"])
        self.avgdl = float(self.meta["avgdl"]) or 1.0

        # doc stats for owned shards
        stats_files = []
        post_files = []
        for sh in doc_shards:
            stats_files += glob.glob(os.path.join(
                index_dir, "doc_stats", f"doc_shard={sh}", "*.parquet"))
            post_files += glob.glob(os.path.join(
                index_dir, "postings", f"doc_shard={sh}", "*.parquet"))
        if stats_files:
            st = pq.read_table(stats_files,
                               columns=["doc_id", "doc_len", "ref_norm"])
            doc_id = st["doc_id"].to_numpy()
            order = np.argsort(doc_id)
            self.stat_doc_ids = doc_id[order]
            self.doc_len = st["doc_len"].to_numpy()[order].astype(np.float64)
            self.ref_norm = st["ref_norm"].to_numpy()[order]
        else:
            self.stat_doc_ids = np.empty(0, np.int64)
            self.doc_len = np.empty(0)
            self.ref_norm = np.empty(0)

        # postings: term -> (doc_ids i64, tfs f64); salted rows merged.
        # Cold-start path is VECTORIZED: one read of all posting files,
        # one whole-table varbyte decode (batch_decode_posting_table),
        # one whole-stream BM25 score pass — the per-term Python work
        # is dict inserts + zero-copy slices only (merging is reserved
        # for the few multi-run terms: hot-term salt splits + appends).
        self.block_size = 128
        self.postings: dict[str, tuple] = {}
        self.df: dict[str, int] = {}
        self.scores: dict[str, np.ndarray] = {}
        self.block_max: dict[str, np.ndarray] = {}
        if post_files:
            t = pq.read_table(sorted(post_files),
                              columns=["term", "salt", "df", "n_local",
                                       "doc_ids_vb", "tfs_vb"])
            self._load_posting_table(t)

    def _bm25_score_stream(self, ids: np.ndarray, tfs: np.ndarray,
                           idf_per_posting: np.ndarray) -> np.ndarray:
        """Exact BM25 per posting over a concatenated stream (local doc
        lens looked up once, all-numpy)."""
        idx = np.searchsorted(self.stat_doc_ids, ids)
        idx = np.clip(idx, 0, max(0, len(self.stat_doc_ids) - 1))
        dl = self.doc_len[idx] if len(self.doc_len) else np.ones(len(ids))
        denom = tfs + self.k1 * (1 - self.b + self.b * dl / self.avgdl)
        return idf_per_posting * tfs * (self.k1 + 1) / denom

    def _block_max_of(self, s: np.ndarray) -> np.ndarray:
        if not len(s):
            return np.empty(0)
        return np.maximum.reduceat(
            s, np.arange(0, len(s), self.block_size))

    def _load_posting_table(self, t) -> None:
        terms = np.asarray(t["term"].to_pandas())
        dfs = t["df"].to_numpy().astype(np.int64)
        nloc = t["n_local"].to_numpy().astype(np.int64)
        ids_all, tfs_all, starts, ends = batch_decode_posting_table(
            t["doc_ids_vb"], t["tfs_vb"], nloc)
        ids_all = ids_all.astype(np.int64)
        tfs_all = tfs_all.astype(np.float64)

        # per-TERM df = max over its rows (append rows carry the GROWN
        # global df; pre-append rows keep the old one) — grouped via
        # one stable argsort over the vocab-bounded row table
        order = np.argsort(terms, kind="stable")
        st = terms[order]
        run_start = np.empty(len(st), bool)
        if len(st):
            run_start[0] = True
            run_start[1:] = st[1:] != st[:-1]
        gstarts = np.flatnonzero(run_start)
        gends = np.append(gstarts[1:], len(st))

        # score the WHOLE stream once with per-posting idf from the
        # row df; single-run terms (the vast majority) slice straight
        # into this array — only multi-run terms recompute after merge
        row_df_max = dfs.copy()
        for gs, ge in zip(gstarts, gends):
            if ge - gs > 1:
                row_df_max[order[gs:ge]] = dfs[order[gs:ge]].max()
        # one math.log per ROW (vocab-bounded) — bit-identical to the
        # per-term _bm25_idf the query path uses, unlike np.log1p
        idf_row = np.array([self._bm25_idf(int(d)) for d in row_df_max],
                           np.float64)
        s_all = self._bm25_score_stream(
            ids_all, tfs_all, np.repeat(idf_row, nloc))

        for gs, ge in zip(gstarts, gends):
            term = st[gs]
            rows = order[gs:ge]
            dfv = int(row_df_max[rows[0]])
            if ge - gs == 1:
                r = rows[0]
                ids = ids_all[starts[r]:ends[r]]
                tfs = tfs_all[starts[r]:ends[r]]
                s = s_all[starts[r]:ends[r]]
            else:   # merge salted sub-lists / append runs, re-sort
                ids = np.concatenate(
                    [ids_all[starts[r]:ends[r]] for r in rows])
                tfs = np.concatenate(
                    [tfs_all[starts[r]:ends[r]] for r in rows])
                o = np.argsort(ids)
                ids, tfs = ids[o], tfs[o]
                s = np.concatenate(
                    [s_all[starts[r]:ends[r]] for r in rows])[o]
            self.postings[term] = (ids, tfs)
            self.df[term] = dfv
            self.scores[term] = s
            self.block_max[term] = self._block_max_of(s)

    # ----------------------------------------------------- A8 membership

    def has_terms(self, terms: list[str]) -> list[bool]:
        """Shard-local vocabulary membership.  The GLOBAL A8 decision
        ("erase query terms with empty postings",
        `WebPageQuery.hpp:52-58`) is the OR of this over all actors —
        every term with df >= 1 has a posting row in exactly the
        shards that hold its docs, so union-of-shards == the term_df
        vocabulary without any driver-side vocab materialization."""
        return [t in self.postings for t in terms]

    # ------------------------------------------------------------ BM25

    def _bm25_idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25_local_topk(self, qterms: list[tuple[str, int]], k: int,
                        conjunctive: bool = True,
                        method: str = "auto") -> list[tuple[float, int]]:
        """Local top-k: list of (score, doc_id), score desc, doc_id asc.

        ``qterms``: (transformed term, query tf) pairs; absent terms are
        dropped (A8).  ``method``: 'exhaustive' | 'pruned' | 'auto'.
        """
        # ``qterms`` were already filtered by the DRIVER to globally-
        # present terms (A8 erasure is a global decision).  A term the
        # driver kept but this shard lacks => no local doc contains it:
        # conjunctive result is empty HERE, the term is NOT dropped.
        if not qterms:
            return []
        if conjunctive:
            if any(t not in self.postings for t, _ in qterms):
                return []
            present = qterms

            cand = None
            for t, _ in sorted(present, key=lambda x: len(self.postings[x[0]][0])):
                ids = self.postings[t][0]
                cand = ids if cand is None else cand[
                    np.isin(cand, ids, assume_unique=True)]
                if len(cand) == 0:
                    return []
            use_prune = (method == "pruned" or
                         (method == "auto" and len(cand) > 4 * k))
            if use_prune:
                # block-max pruning over the candidate set: upper-bound each
                # candidate by the sum of its terms' block maxima; exact-score
                # only candidates whose bound can still beat the running
                # min-heap threshold (lagged by EPS so quantized ties are
                # never pruned — exactness-preserving, property-tested).
                # Candidates are processed in bound-descending CHUNKS so the
                # scoring stays vectorized (no per-candidate Python loop).
                bounds = np.zeros(len(cand))
                for t, q in present:
                    ids = self.postings[t][0]
                    pos = np.searchsorted(ids, cand)
                    bounds += q * self.block_max[t][pos // self.block_size]
                order = np.argsort(-bounds)
                heap: list[tuple[float, int]] = []
                scored: list[tuple[float, int]] = []
                CH = 1024
                for start in range(0, len(order), CH):
                    chunk = order[start:start + CH]
                    if len(heap) >= k and \
                            bounds[chunk[0]] <= heap[0][0] - EPS:
                        break  # no remaining candidate can beat the heap min
                    docs_c = cand[chunk]
                    total = np.zeros(len(chunk))
                    for t, q in present:
                        ids, _ = self.postings[t]
                        pos = np.searchsorted(ids, docs_c)
                        total += q * self.scores[t][pos]
                    for s, d in zip(total.tolist(), docs_c.tolist()):
                        scored.append((s, d))
                        item = (s, -d)
                        if len(heap) < k:
                            heapq.heappush(heap, item)
                        elif item > heap[0]:
                            heapq.heapreplace(heap, item)
                return sort_scored_desc(scored)[:k]
            total = np.zeros(len(cand))
            for t, q in present:
                ids, _ = self.postings[t]
                pos = np.searchsorted(ids, cand)
                total += q * self.scores[t][pos]
            return self._topk_from(cand, total, k)
        # disjunctive: terms this shard lacks simply contribute nothing
        present = [(t, q) for t, q in qterms if t in self.postings]
        if not present:
            return []
        if method == "pruned":
            return self._wand_topk(present, k)
        all_ids = np.concatenate([self.postings[t][0] for t, _ in present])
        uniq = np.unique(all_ids)
        total = np.zeros(len(uniq))
        for t, q in present:
            ids, _ = self.postings[t]
            pos = np.searchsorted(uniq, ids)
            np.add.at(total, pos, q * self.scores[t])
        return self._topk_from(uniq, total, k)

    def _topk_from(self, ids: np.ndarray, scores: np.ndarray,
                   k: int) -> list[tuple[float, int]]:
        if len(ids) == 0:
            return []
        # keep every candidate within EPS of the raw k-th score (so ALL
        # quantized ties survive the cut), then apply the canonical order
        if len(ids) > k:
            kth = np.partition(scores, len(scores) - k)[len(scores) - k]
            sel = scores >= kth - EPS
            ids, scores = ids[sel], scores[sel]
        return sort_scored_desc(
            list(zip(scores.tolist(), ids.tolist())))[:k]

    def _wand_topk(self, present: list[tuple[str, int]],
                   k: int) -> list[tuple[float, int]]:
        """Classic block-max WAND (disjunctive, exact top-k): document-at-
        a-time pivoting with per-term cursors; blocks whose combined
        upper bound cannot beat the heap threshold are skipped."""
        terms = [t for t, _ in present]
        qtf = {t: q for t, q in present}
        cursors = {t: 0 for t in terms}
        plists = {t: self.postings[t][0] for t in terms}
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap
        # every fully-scored doc is COLLECTED: the heap alone would
        # drop raw-score ties within EPS of the k-th (candidates the
        # quantized doc_id tiebreak can still rank above it) — the
        # final cut goes through the same EPS-band _topk_from as every
        # other scoring path, keeping results identical across actor
        # counts and methods
        collected: list[tuple[float, int]] = []
        max_score = {t: qtf[t] * float(self.block_max[t].max())
                     if len(self.block_max[t]) else 0.0 for t in terms}
        while True:
            live = [t for t in terms if cursors[t] < len(plists[t])]
            if not live:
                break
            live.sort(key=lambda t: plists[t][cursors[t]])
            threshold = heap[0][0] - EPS if len(heap) >= k else -math.inf
            acc, pivot_term = 0.0, None
            for t in live:
                acc += max_score[t]
                if acc > threshold:
                    pivot_term = t
                    break
            if pivot_term is None:
                break
            pivot_doc = int(plists[pivot_term][cursors[pivot_term]])
            if int(plists[live[0]][cursors[live[0]]]) == pivot_doc:
                s = 0.0
                for t in live:
                    ids = plists[t]
                    ci = cursors[t]
                    if ci < len(ids) and ids[ci] == pivot_doc:
                        s += qtf[t] * float(self.scores[t][ci])
                        cursors[t] += 1
                    elif ids[min(ci, len(ids) - 1)] > pivot_doc:
                        break
                collected.append((s, pivot_doc))
                item = (s, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
            else:
                for t in live:
                    if plists[t][cursors[t]] >= pivot_doc:
                        break
                    cursors[t] = int(np.searchsorted(plists[t], pivot_doc))
        if not collected:
            return []
        sc = np.array([c[0] for c in collected])
        di = np.array([c[1] for c in collected], dtype=np.int64)
        return self._topk_from(di, sc, k)

    # ------------------------------------------------- reference cosine

    def ref_cosine_local(self, raw_words: list[str],
                         weight: dict[str, float],
                         intersect_keys: list[str],
                         k: int) -> list[tuple[float, int, bool]]:
        """Literal G7 scoring over this shard.  Returns (raw_cos, doc_id,
        is_nan) for the local top-k in reference pop order.

        ``intersect_keys``: weight keys with globally non-empty postings
        (the reference erases empty-posting terms from the intersection
        but keeps them in the weight map, `WebPageQuery.hpp:52-58`).
        A key this shard lacks => empty local intersection.
        """
        if not intersect_keys:
            return []
        if any(t not in self.postings for t in intersect_keys):
            return []
        cand = None
        for t in sorted(intersect_keys,
                        key=lambda t: len(self.postings[t][0])):
            ids = self.postings[t][0]
            cand = ids if cand is None else cand[
                np.isin(cand, ids, assume_unique=True)]
            if len(cand) == 0:
                return []
        # per-candidate scoring over RAW words (dups included) — G7
        pos = np.searchsorted(self.stat_doc_ids, cand)
        pos = np.clip(pos, 0, max(0, len(self.stat_doc_ids) - 1))
        norms = self.ref_norm[pos]
        xy = np.zeros(len(cand))
        X2 = 0.0
        Y2 = np.zeros(len(cand))
        n_docs_f = float(self.n_docs)
        for w in raw_words:
            wq = weight.get(w, 0.0)
            X2 += wq * wq
            p = self.postings.get(w)
            if p is None:
                continue
            ids, tfs = p
            idx = np.searchsorted(ids, cand)
            idx_c = np.clip(idx, 0, len(ids) - 1)
            hit = ids[idx_c] == cand
            idf = np.log2(n_docs_f / (self.df[w] + 1.0))
            y = np.where(hit, idf * tfs[idx_c] / np.where(norms > 0, norms, 1.0),
                         0.0)
            xy += wq * y
            Y2 += y * y
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = xy / (np.sqrt(X2) * np.sqrt(Y2))
        is_nan = ~np.isfinite(cos)
        # defined order: (cos asc, doc_id asc), NaN last by doc_id; keep
        # everything within EPS of the raw k-th so quantized ties survive
        sort_cos = np.where(is_nan, np.inf, cos)
        if len(cand) > k:
            kth = np.partition(sort_cos, k - 1)[k - 1]
            sel = sort_cos <= kth + EPS
            cand, cos, is_nan = cand[sel], cos[sel], is_nan[sel]
        ordered = sort_scored_asc_nan_last(
            [(float(c), int(d), bool(n))
             for c, d, n in zip(cos, cand, is_nan)])
        return ordered[:k]


def query_weight_vector(sentence: str) -> tuple[list[str], dict[str, float]]:
    """G6 (`WebPageQuery.hpp:140-185`): raw words + normalized weights.

    NO stop filter on the query path.  IDF is the reference's literal
    ``log2(1/(DF+1))`` with DF hard-coded 1.0 => -1.0.
    """
    raw = segment(sentence)
    count: Counter = Counter()
    for w in raw:
        t = ref_transform(w)
        if t is not None:
            count[t] += 1
    idf = math.log2(1.0 / 2.0)
    weight = {t: idf * c for t, c in count.items()}
    sqr = math.sqrt(sum(v * v for v in weight.values()))
    if sqr > 0:
        weight = {t: v / sqr for t, v in weight.items()}
    return raw, weight


def bm25_query_terms(sentence: str) -> list[tuple[str, int]]:
    """Query tokenization for BM25: transform, no stop filter; (term, qtf)."""
    _, transformed = query_raw_and_transformed(sentence)
    return sorted(Counter(transformed).items())


class QueryEngine:
    """Driver-side facade over the scorer actor pool."""

    def __init__(self, index_dir: str, num_actors: int | None = None,
                 num_cpus_per_actor: float = 1.0):
        with open(os.path.join(index_dir, "meta.json")) as f:
            meta = json.load(f)
        D = int(meta["num_doc_shards"])
        num_actors = min(num_actors or D, D)
        shard_sets = [list(range(D))[i::num_actors] for i in range(num_actors)]
        Actor = ray.remote(num_cpus=num_cpus_per_actor)(ScorerCore)
        self.actors = [Actor.remote(index_dir, shards)
                       for shards in shard_sets]
        self.k_default = 10  # WebPageQuery.hpp:121
        # A8 "erase terms with empty postings" is a GLOBAL decision —
        # served by the shard actors (OR of has_terms over the pool),
        # NOT a driver-side vocabulary set: driver memory stays O(1)
        # in vocabulary size.  Verdicts memoize into a bounded LRU so
        # repeated query terms (Zipf traffic) skip the fan-out.
        self._vocab_memo: dict[str, bool] = {}
        self._vocab_memo_cap = 1_000_000

    def _memoize_membership(self, terms: list[str]) -> None:
        """ONE membership fan-out for every term not yet memoized;
        afterwards every term in ``terms`` is guaranteed memoized."""
        if len(self._vocab_memo) + len(terms) > self._vocab_memo_cap:
            self._vocab_memo.clear()   # rare; Zipf hot terms re-warm fast
        unknown = sorted({t for t in terms if t not in self._vocab_memo})
        if not unknown:
            return
        futs = [a.has_terms.remote(unknown) for a in self.actors]
        present = np.any(np.asarray(ray.get(futs), dtype=bool), axis=0)
        for t, v in zip(unknown, present.tolist()):
            self._vocab_memo[t] = bool(v)

    def _filter_global(self, terms: list[str]) -> set[str]:
        """The globally-present subset of ``terms`` (A8 erasure)."""
        self._memoize_membership(terms)
        return {t for t in terms if self._vocab_memo[t]}

    def bm25_topk(self, sentence: str, k: int | None = None,
                  conjunctive: bool = True,
                  method: str = "auto") -> list[dict]:
        k = k or self.k_default
        all_q = bm25_query_terms(sentence)
        keep = self._filter_global([t for t, _ in all_q])
        qterms = [(t, q) for t, q in all_q if t in keep]  # A8 erasure
        if not qterms:
            return []
        futs = [a.bm25_local_topk.remote(qterms, k, conjunctive, method)
                for a in self.actors]
        merged = [x for part in ray.get(futs) for x in part]
        merged = sort_scored_desc(merged)
        return [{"rank": i, "doc_id": d, "score": s}
                for i, (s, d) in enumerate(merged[:k])]

    def ref_cosine_topk(self, sentence: str, k: int | None = None) -> list[dict]:
        k = k or self.k_default
        raw, weight = query_weight_vector(sentence)
        keep = self._filter_global(list(weight))
        ikeys = sorted(t for t in weight if t in keep)
        if not weight or not ikeys:
            return []
        futs = [a.ref_cosine_local.remote(raw, weight, ikeys, k)
                for a in self.actors]
        merged = sort_scored_asc_nan_last(
            [x for part in ray.get(futs) for x in part])
        return [{"rank": i, "doc_id": d, "score": s}
                for i, (s, d, _n) in enumerate(merged[:k])]

    def topk(self, sentence: str, scorer: str = "bm25",
             k: int | None = None) -> list[dict]:
        """Registry-dispatched top-k (§2.9): ``scorer`` names a
        ``registry.py`` "scorer" entry — built-ins ``bm25`` /
        ``ref_cosine``, or any user-registered
        ``fn(engine, sentence, k) -> list[dict]``."""
        from ..registry import resolve
        return resolve("scorer", scorer)(self, sentence, k)

    def batch(self, sentences: list[str], scorer: str = "bm25",
              k: int | None = None, **kw) -> list[list[dict]]:
        """Pipelined batch mode: all shard calls for all queries are in
        flight at once; results keep input order.  The two built-in
        scorers get the pipelined fast path; any other registered
        scorer falls back to per-query registry dispatch."""
        k = k or self.k_default
        if scorer not in ("bm25", "ref", "ref_cosine"):
            return [self.topk(s, scorer=scorer, k=k) for s in sentences]
        # tokenize the whole batch first => ONE membership fan-out for
        # every not-yet-memoized term across all queries in the batch
        parsed = []
        batch_terms: list[str] = []
        for s in sentences:
            if scorer == "bm25":
                all_q = bm25_query_terms(s)
                parsed.append(("bm25", all_q))
                batch_terms += [t for t, _ in all_q]
            else:
                raw, weight = query_weight_vector(s)
                parsed.append(("ref", (raw, weight)))
                batch_terms += list(weight)
        self._memoize_membership(batch_terms)
        memo = self._vocab_memo
        futs_per_q = []
        for kind, payload in parsed:
            if kind == "bm25":
                qterms = [(t, q) for t, q in payload if memo[t]]
                futs_per_q.append((
                    "bm25", None,
                    [a.bm25_local_topk.remote(qterms, k,
                                              kw.get("conjunctive", True),
                                              kw.get("method", "auto"))
                     for a in self.actors] if qterms else []))
            else:
                raw, weight = payload
                ikeys = sorted(t for t in weight if memo[t])
                futs_per_q.append((
                    "ref", None,
                    [a.ref_cosine_local.remote(raw, weight, ikeys, k)
                     for a in self.actors] if (weight and ikeys) else []))
        out = []
        for kind, _, futs in futs_per_q:
            if not futs:
                out.append([])
                continue
            merged = [x for part in ray.get(futs) for x in part]
            if kind == "bm25":
                merged = sort_scored_desc(merged)
                out.append([{"rank": i, "doc_id": d, "score": s}
                            for i, (s, d) in enumerate(merged[:k])])
            else:
                merged = sort_scored_asc_nan_last(merged)
                out.append([{"rank": i, "doc_id": d, "score": s}
                            for i, (s, d, _n) in enumerate(merged[:k])])
        return out

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []

"""Fused doc-prep stage: length filter (M8) + doc-id assignment (A5) +
simhash fingerprint (T1/T2) + text_len, in ONE actor pool.

Why fused: each ``map_batches`` actor pool pins >= 1 CPU per job.  With
several bucket jobs in flight, stacking one pool per sub-step starves
the task operators (read/write) of CPUs and deadlocks the cluster —
one pool per job keeps `jobs x 1` actors + free CPUs for tasks, and
also removes two Arrow round-trips per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..functions.tokenize import _REF_FOLD as _FOLD
from .docids import AssignDocIds
from .simhash import SimhashStage


class PrepStage:
    """Also emits the per-doc term/tf lists: downstream ``doc_terms`` is
    then a pure vectorized list-explode instead of a SECOND tokenize
    pass over every text (tokenization is the build's dominant CPU)."""

    def __init__(self, bases_ref, stop_words=(), top_n: int = 0,
                 min_len: int = 10, tokenizer_factory=None,
                 keyword_fn=None):
        self.assign = AssignDocIds(bases_ref)
        self.simhash = SimhashStage(stop_words=stop_words, top_n=top_n,
                                    tokenizer_factory=tokenizer_factory,
                                    keyword_fn=keyword_fn)
        self.min_len = min_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.simhash import simhash_from_keywords
        t = batch.filter(
            pc.greater_equal(pc.utf8_length(batch["text"]), self.min_len))
        t = self.assign(t)
        texts = t["text"].to_pylist()
        n = len(texts)
        sims = np.empty(n, dtype=np.uint64)
        terms_col: list[list[str]] = []
        tfs_col: list[list[int]] = []
        doc_len = np.zeros(n, dtype=np.int32)
        counter = self.simhash.counter
        cache = self.simhash.hash_cache
        top_n = self.simhash.top_n
        keyword_fn = self.simhash.keyword_fn
        for i, tx in enumerate(texts):
            tf = counter.doc_counts(tx)
            sims[i] = simhash_from_keywords(keyword_fn(tf, top_n), cache)
            terms_col.append(list(tf.keys()))
            tfs_col.append(list(tf.values()))
            doc_len[i] = sum(tf.values())
        return (t
                .append_column("simhash", pa.array(sims, pa.uint64()))
                .append_column("text_len",
                               pc.cast(pc.utf8_length(t["text"]), "int32"))
                .append_column("doc_len", pa.array(doc_len, pa.int32()))
                .append_column("terms",
                               pa.array(terms_col, pa.list_(pa.string())))
                .append_column("tfs",
                               pa.array(tfs_col, pa.list_(pa.int32()))))


class VectorizedPrepStage:
    """Exact vectorized PrepStage for the DEFAULT path (``ref``
    tokenizer + log-tf keyword weighting): Arrow RE2 kernels tokenize
    the whole batch, the M4 fold/stop transform runs once per UNIQUE
    token (persistent per-worker cache), tf/doc_len/term-lists come
    from one composite-key ``np.unique``, and the simhash bit vote is
    a segmented ``np.add.reduceat`` over entries arranged in the SAME
    ``(-tf, term)`` order the scalar loop uses — float accumulation
    order is identical, so fingerprints are bit-equal (property-tested
    against PrepStage).  Custom tokenizers / keyword weighters from
    the §2.9 registry fall back to the scalar PrepStage."""

    def __init__(self, bases_ref, stop_words=(), top_n: int = 0,
                 min_len: int = 10):
        self.assign = AssignDocIds(bases_ref)
        self.stop = frozenset(stop_words)
        self.top_n = top_n
        self.min_len = min_len
        # per-unique-token caches persist across batches (Zipf vocab);
        # bounded: open-web token streams can push "vocabulary" far
        # past memory, so both caches reset past _CACHE_CAP entries
        self.fold_cache: dict[str, str | None] = {}
        self._bits_ids: dict[str, int] = {}
        # int8 ±1 signs (8x smaller than float64 rows); the float
        # conversion of ±1 at use time is exact, so w * sign products
        # are bit-identical either way
        self._bits_mat = np.empty((256, 64), np.int8)
        self._w_lut = np.array([0.0, 1.0])   # 1 + log2(tf), tf-indexed
        self._shifts = np.arange(64, dtype=np.uint64)

    _CACHE_CAP = 500_000

    def _fold_one(self, t: str) -> str | None:
        """Verbatim TokenCounter.doc_counts per-token transform."""
        c = ord(t[0])
        if 0x61 <= c <= 0x7A:
            if not t.islower():
                t = t.translate(_FOLD)
        elif 0x4E00 <= c <= 0x9FA5:
            pass
        elif 0x41 <= c <= 0x5A:
            t = t.translate(_FOLD)
        else:
            return None
        return None if t in self.stop else t

    def _weights_of(self, counts):
        import math
        mx = int(counts.max(initial=0))
        if mx >= len(self._w_lut):
            lut = np.empty(mx + 1)
            lut[0] = 0.0
            for c in range(1, mx + 1):
                lut[c] = 1.0 + math.log2(c)   # math.log2 == scalar path
            self._w_lut = lut
        return self._w_lut[counts]

    def _bits_rows(self, terms: list) -> np.ndarray:
        """Rows of the persistent ±1 bit-vote matrix for ``terms`` —
        jenkins64 is computed once per term EVER (the matrix grows by
        doubling; a gather replaces the per-batch re-stack)."""
        from ..functions.hashing import jenkins64
        ids = self._bits_ids
        if len(ids) > self._CACHE_CAP:
            ids.clear()
            self.fold_cache.clear()
        for t in terms:
            if t not in ids:
                j = len(ids)
                if j >= len(self._bits_mat):
                    grown = np.empty((2 * len(self._bits_mat), 64),
                                     np.int8)
                    grown[:j] = self._bits_mat[:j]
                    self._bits_mat = grown
                h = jenkins64(t)
                self._bits_mat[j] = np.fromiter(
                    (1 if (h >> k) & 1 else -1 for k in range(64)),
                    np.int8, 64)
                ids[t] = j
        return np.fromiter((ids[t] for t in terms), np.int64, len(terms))

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.greater_equal(pc.utf8_length(batch["text"]), self.min_len))
        t = self.assign(t)
        n = t.num_rows
        text = t["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()

        # -- tokenize (RE2): findall(r"[A-Za-z0-9]+|[一-龥]") after the
        # CJK newline join == non-token runs -> space, CJK spaced out,
        # whitespace split, empties dropped
        s = pc.replace_substring_regex(
            text, pattern=r"([一-龥])\n+([一-龥])", replacement=r"\1\2")
        s = pc.replace_substring_regex(
            s, pattern=r"[^A-Za-z0-9一-龥]+", replacement=" ")
        s = pc.replace_substring_regex(
            s, pattern=r"([一-龥])", replacement=r" \1 ")
        toks = pc.utf8_split_whitespace(s)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens).astype(np.int64)
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        flat = toks.flatten()

        # -- M4 fold/drop + M5 stop, once per unique token
        denc = flat.dictionary_encode()
        uniq = denc.dictionary.to_pylist()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        fold = self.fold_cache
        new_ids: dict[str, int] = {}
        new_terms: list[str] = []
        lut = np.empty(len(uniq), dtype=np.int64)
        for i, u in enumerate(uniq):
            if u in fold:
                m = fold[u]
            else:
                m = self._fold_one(u) if u else None   # '' from split
                fold[u] = m
            if m is None:
                lut[i] = -1
            else:
                nid = new_ids.get(m)
                if nid is None:
                    nid = len(new_terms)
                    new_ids[m] = nid
                    new_terms.append(m)
                lut[i] = nid
        ntid_flat = lut[codes] if len(codes) else np.empty(0, np.int64)
        keep = ntid_flat >= 0
        rows_k = rows[keep]
        ntid_k = ntid_flat[keep]
        n_new = max(len(new_terms), 1)
        doc_len = np.bincount(rows_k, minlength=n).astype(np.int32)

        # -- per-(row, term) tf + first-occurrence position
        comp = rows_k * n_new + ntid_k
        uc, first_idx, counts = np.unique(comp, return_index=True,
                                          return_counts=True)
        u_row = (uc // n_new).astype(np.int64)
        u_tid = (uc % n_new).astype(np.int64)
        terms_arr = np.array(new_terms, dtype=object)

        # terms/tfs lists in FIRST-OCCURRENCE order (Counter insertion
        # order, what the scalar stage emits)
        order_fo = np.lexsort((first_idx, u_row))
        per_row = np.bincount(u_row, minlength=n)
        offsets = np.concatenate([[0], np.cumsum(per_row)])
        terms_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(terms_arr[u_tid[order_fo]].tolist() if len(uc)
                     else [], pa.string()))
        tfs_list = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(counts[order_fo].astype(np.int32), pa.int32()))

        # -- simhash: entries per row in (-tf, term asc) order, then a
        # segmented sequential reduce — same additions, same order as
        # simhash_from_keywords's loop
        if len(uc):
            lex_rank = np.empty(len(terms_arr), dtype=np.int64)
            lex_rank[np.argsort(terms_arr, kind="stable")] = \
                np.arange(len(terms_arr))
            order_sh = np.lexsort((lex_rank[u_tid], -counts, u_row))
            r_s = u_row[order_sh]
            t_s = u_tid[order_sh]
            c_s = counts[order_sh]
            if self.top_n > 0:
                seg_first = np.concatenate(
                    [[0], np.flatnonzero(r_s[1:] != r_s[:-1]) + 1])
                seg_start_of = seg_first[
                    np.cumsum(np.concatenate(
                        [[False], r_s[1:] != r_s[:-1]]))]
                rank_in_row = np.arange(len(r_s)) - seg_start_of
                m = rank_in_row < self.top_n
                r_s, t_s, c_s = r_s[m], t_s[m], c_s[m]
            sims = np.zeros(n, dtype=np.uint64)
            if len(r_s):
                w = self._weights_of(c_s)
                gid = self._bits_rows(new_terms)
                C = w[:, None] * self._bits_mat[gid[t_s]] \
                    .astype(np.float64)
                starts = np.concatenate(
                    [[0], np.flatnonzero(r_s[1:] != r_s[:-1]) + 1])
                ends = np.append(starts[1:], len(r_s))
                # outer-axis add.reduce is a SEQUENTIAL row
                # accumulation (accumulator += row) — the same
                # additions in the same order as the scalar keyword
                # loop, hence bit-equal votes.  (np.add.reduceat
                # groups differently and diverges in the last ulp,
                # flipping near-zero votes — property-tested.)
                votes = np.empty((len(starts), 64))
                for k, (a, b) in enumerate(zip(starts, ends)):
                    votes[k] = C[a:b].sum(axis=0)
                vals = ((votes > 0.0).astype(np.uint64)
                        << self._shifts[None, :]).sum(
                            axis=1, dtype=np.uint64)
                sims[r_s[starts]] = vals
        else:
            sims = np.zeros(n, dtype=np.uint64)

        return (t
                .append_column("simhash", pa.array(sims, pa.uint64()))
                .append_column("text_len",
                               pc.cast(pc.utf8_length(t["text"]), "int32"))
                .append_column("doc_len",
                               pa.array(doc_len, pa.int32()))
                .append_column("terms", terms_list)
                .append_column("tfs", tfs_list))


# process-global stage memo: plain map_batches TASKS reuse Ray worker
# processes, so the per-worker state (regexes, stop set, broadcast
# bases) loads once per worker — actor-pool semantics WITHOUT the
# per-job actor spawn cost (a build runs dozens of small bucket jobs;
# fresh actor pools per job were a dominant fixed overhead and a
# deadlock risk when concurrent pools pinned every CPU).
_PREP_CACHE: dict = {}


def _prep_batch(batch: pa.Table, bases_ref, stop_words, top_n,
                min_len, tokenizer="ref",
                tokenizer_factory=None) -> pa.Table:
    key = (getattr(bases_ref, "hex", lambda: str(id(bases_ref)))(),
           stop_words, top_n, min_len, tokenizer)
    stage = _PREP_CACHE.get(key)
    if stage is None:
        from .tokenizer import TokenCounter
        if tokenizer_factory is None or tokenizer_factory is TokenCounter:
            # default path: vectorized, bit-equal (property-tested)
            stage = VectorizedPrepStage(bases_ref, stop_words, top_n,
                                        min_len)
        else:   # §2.9 custom tokenizer: scalar per-doc path
            stage = PrepStage(bases_ref, stop_words, top_n, min_len,
                              tokenizer_factory=tokenizer_factory)
        _PREP_CACHE.clear()   # one live config per worker is plenty
        _PREP_CACHE[key] = stage
    return stage(batch)


def prep_transcripts(ds: ray.data.Dataset, bases_ref, stop_words=(),
                     top_n: int = 0, min_len: int = 10,
                     concurrency=None,
                     batch_size: int = 2048,
                     tokenizer: str = "ref") -> ray.data.Dataset:
    # resolve the registry name on the DRIVER and ship the factory by
    # value — custom tokenizers registered in user code need not be
    # importable on workers (registry.py §2.9)
    from ..registry import resolve
    factory = resolve("tokenizer", tokenizer)
    return ds.map_batches(
        _prep_batch,
        fn_kwargs={"bases_ref": bases_ref,
                   "stop_words": tuple(stop_words),
                   "top_n": top_n, "min_len": min_len,
                   "tokenizer": tokenizer,
                   "tokenizer_factory": factory},
        batch_format="pyarrow", batch_size=batch_size)

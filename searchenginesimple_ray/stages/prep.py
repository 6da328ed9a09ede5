"""Fused doc-prep stage: length filter (M8) + doc-id assignment (A5) +
simhash fingerprint (T1/T2) + text_len, in ONE actor pool.

Why fused: each ``map_batches`` actor pool pins >= 1 CPU per job.  With
several bucket jobs in flight, stacking one pool per sub-step starves
the task operators (read/write) of CPUs and deadlocks the cluster —
one pool per job keeps `jobs x 1` actors + free CPUs for tasks, and
also removes two Arrow round-trips per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray

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

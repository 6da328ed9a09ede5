"""Simhash fingerprint stage (T1/T2) as an actor pool.

The reference constructs a fresh ``Simhasher`` (jieba model reload) per
input *file* (`include/Page/Page.hpp:93`) — here the tokenizer +
jenkins hash cache live once per actor; per batch we only hash terms
not seen before (Zipf vocab => high cache hit rate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.simhash import simhash_from_keywords, top_keywords
from .tokenizer import TokenCounter


class SimhashStage:
    def __init__(self, stop_words=(), top_n: int = 0,
                 tokenizer_factory=None, keyword_fn=None):
        # tokenizer_factory: a registry.py "tokenizer" entry (§2.9);
        # default is the reference-exact TokenCounter.
        # keyword_fn(tf, top_n) -> [(term, weight)]: the bit-vote
        # feature weighter; default log-damped tf (top_keywords),
        # reference tf*idf semantics via make_ref_weighter.
        mk = tokenizer_factory or TokenCounter
        self.counter = mk(stop_words=stop_words)
        self.top_n = top_n
        self.keyword_fn = keyword_fn or top_keywords
        self.hash_cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        for i, tx in enumerate(texts):
            tf = self.counter.doc_counts(tx)
            out[i] = simhash_from_keywords(
                self.keyword_fn(tf, self.top_n), self.hash_cache)
        return batch.append_column("simhash", pa.array(out, pa.uint64()))


def add_simhash(docs: ray.data.Dataset, stop_words=(), top_n: int = 0,
                concurrency=(1, 8), batch_size: int = 2048) -> ray.data.Dataset:
    return docs.map_batches(
        SimhashStage,
        fn_constructor_kwargs={"stop_words": tuple(stop_words), "top_n": top_n},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

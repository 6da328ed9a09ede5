"""Tokenizer stage (M2+M3+M4+M5+G1 fused, SURVEY §7.1).

A callable-class actor pool: the compiled regexes, stop set and the M4
transform table are built once per actor in ``__init__`` (the reference
reloads its Simhasher model per *file*, `Page.hpp:93` — fixed here);
``__call__`` turns a batch of docs into ``doc_terms`` rows::

    doc_terms(doc_id: int64, term: string, tf: int32, doc_len: int32)

``doc_len`` (total kept tokens per doc) rides along on every row so the
postings builder can compute BM25 length normalization without a
doc-side shuffle join (int32 per row; the term dictionary fits Arrow
dictionary encoding on write).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from ..functions.tokenize import _REF_FOLD, _TOKEN, cjk_newline_join


class TokenCounter:
    """docs(doc_id, text, ...) batch -> doc_terms batch."""

    def __init__(self, stop_words=(), apply_stop: bool = True):
        self.stop = frozenset(stop_words) if apply_stop else frozenset()
        self.findall = _TOKEN.findall
        self.fold = _REF_FOLD

    def doc_counts(self, text: str) -> Counter:
        toks = self.findall(cjk_newline_join(text))
        fold = self.fold
        stop = self.stop
        out = []
        append = out.append
        for t in toks:
            c = ord(t[0])
            if 0x61 <= c <= 0x7A:          # lowercase-ASCII-led
                # M4 folds A-Z anywhere in a letter-led token
                # (Page.hpp:290-309); islower() is False iff the ASCII
                # alnum run contains any A-Z, so 'fooBar' still folds.
                if not t.islower():
                    t = t.translate(fold)
            elif 0x4E00 <= c <= 0x9FA5:    # CJK: keep as-is
                pass
            elif 0x41 <= c <= 0x5A:        # uppercase-led: literal M4 map
                t = t.translate(fold)
            else:                           # digit-led: dropped by M4
                continue
            if t in stop:
                continue
            append(t)
        return Counter(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        out_doc: list[np.ndarray] = []
        out_term: list[str] = []
        out_tf: list[int] = []
        out_len: list[np.ndarray] = []
        for did, tx in zip(doc_ids, texts):
            counts = self.doc_counts(tx)
            n_terms = len(counts)
            if n_terms == 0:
                continue
            dlen = sum(counts.values())
            out_doc.append(np.full(n_terms, did, dtype=np.int64))
            out_len.append(np.full(n_terms, dlen, dtype=np.int32))
            out_term.extend(counts.keys())
            out_tf.extend(counts.values())
        if not out_doc:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int32()),
                             "doc_len": pa.array([], pa.int32())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
            "term": pa.array(out_term, pa.string()),
            "tf": pa.array(np.asarray(out_tf, dtype=np.int32), pa.int32()),
            "doc_len": pa.array(np.concatenate(out_len), pa.int32()),
        })


def tokenize_to_doc_terms(docs: ray.data.Dataset, stop_words=(),
                          concurrency=(1, 8),
                          batch_size: int = 2048) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        TokenCounter,
        fn_constructor_kwargs={"stop_words": tuple(stop_words)},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def explode_doc_terms(batch: pa.Table) -> pa.Table:
    """Prepped docs (doc_id, doc_len, terms: list<str>, tfs: list<int32>)
    -> doc_terms rows.  Pure Arrow list-flatten — no re-tokenize, no
    Python loop (the term lists were materialized once in PrepStage)."""
    import pyarrow.compute as pc
    terms = batch["terms"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    tfs = batch["tfs"]
    if isinstance(tfs, pa.ChunkedArray):
        tfs = tfs.combine_chunks()
    lengths = pc.list_value_length(terms).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths).astype(np.int64)
    doc_ids = np.repeat(
        batch["doc_id"].to_numpy(zero_copy_only=False), lengths)
    doc_lens = np.repeat(
        batch["doc_len"].to_numpy(zero_copy_only=False), lengths)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "term": terms.flatten(),
        "tf": tfs.flatten(),
        "doc_len": pa.array(doc_lens.astype(np.int32), pa.int32()),
    })


def doc_terms_from_prepped(prepped: ray.data.Dataset) -> ray.data.Dataset:
    """Task-based explode over prepped docs (column-pruned input)."""
    return prepped.select_columns(["doc_id", "doc_len", "terms", "tfs"]) \
        .map_batches(explode_doc_terms, batch_format="pyarrow")

"""Sliding-window document chunking (RAG / long-context prep).

Splits every document into overlapping token windows — the
retrieval-corpus preparation step (chunk size ``size`` tokens, stride
``stride``); distinct from ``stages/packing.pack_sequences`` (which
concatenates docs into fixed training rows, no overlap, no per-doc
alignment).

Rule (exact, SQL-expressible): tokens are the RE2 ``\\s+`` split of
``lower(coalesce(text, ''))`` with empties dropped (the shared oracle
tokenization); a doc with L > 0 tokens yields
``n_chunks = 1 if L <= size else (L - size + stride - 1) // stride + 1``
chunks; chunk k covers tokens ``[k*stride, k*stride + n_tok)`` with
``n_tok = min(size, L - k*stride)``; ``chunk_text`` is the covered
tokens joined by one space.  L = 0 docs yield no chunks.  The final
chunk always reaches the last token; no chunk starts past L.

Streaming shape: pure ``map_batches`` — chunk enumeration is
repeat/cumsum arithmetic, the text rebuild is one ``pc.take`` gather +
one Arrow ``binary_join`` per batch; no shuffle, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def chunk_text(ds: ray.data.Dataset, size: int, stride: int,
               id_col: str = "doc_id", text_col: str = "text",
               batch_size: int = 4096) -> ray.data.Dataset:
    """(id, chunk_idx, start_tok, n_tok, chunk_text) rows per window."""
    if not (0 < stride <= size):
        raise ValueError("need 0 < stride <= size")
    from .lm import _flat_tokens

    def chunks(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, parents = _flat_tokens(batch, text_col)
        par = parents.to_numpy(zero_copy_only=False)
        lens = np.bincount(par, minlength=n).astype(np.int64) \
            if len(par) else np.zeros(n, np.int64)
        n_chunks = np.where(
            lens == 0, 0,
            np.where(lens <= size, 1,
                     (lens - size + stride - 1) // stride + 1))
        total = int(n_chunks.sum())
        empty_text = pa.array([], pa.string())
        if total == 0:
            return pa.table({
                id_col: batch[id_col].slice(0, 0),
                "chunk_idx": pa.array([], pa.int64()),
                "start_tok": pa.array([], pa.int64()),
                "n_tok": pa.array([], pa.int64()),
                "chunk_text": empty_text})
        doc_of = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
        first = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
        cidx = np.arange(total, dtype=np.int64) - first[doc_of]
        start = cidx * stride
        n_tok = np.minimum(size, lens[doc_of] - start)
        # gather indices into the batch-flat token array
        tok_start = np.concatenate([[0], np.cumsum(lens)])[:-1]
        g0 = tok_start[doc_of] + start
        offsets = np.concatenate([[0], np.cumsum(n_tok)])
        intra = np.arange(int(offsets[-1]), dtype=np.int64) \
            - np.repeat(offsets[:-1], n_tok)
        gather = np.repeat(g0, n_tok) + intra
        flat_arr = flat.combine_chunks() \
            if isinstance(flat, pa.ChunkedArray) else flat
        toks = pc.take(flat_arr, pa.array(gather, pa.int64()))
        if int(offsets[-1]) < 2**31:
            lists = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), toks)
        else:   # giant-doc batch: 64-bit offsets
            lists = pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), toks)
        joined = pc.binary_join(lists, " ")
        return pa.table({
            id_col: pc.take(batch[id_col], pa.array(doc_of, pa.int64())),
            "chunk_idx": pa.array(cidx),
            "start_tok": pa.array(start),
            "n_tok": pa.array(n_tok),
            "chunk_text": joined})

    return ds.select_columns([id_col, text_col]).map_batches(
        chunks, batch_format="pyarrow", batch_size=batch_size)


__all__ = ["chunk_text"]

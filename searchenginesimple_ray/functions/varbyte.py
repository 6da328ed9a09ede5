"""Delta + varbyte posting-list compression with block-max metadata.

The reference stores postings as plain ``std::map<string, map<int,double>>``
(`include/Page/Page.hpp:418`); the north-star layout upgrades this to
docID-delta + varbyte compressed lists with per-block maxima (classic
VByte, e.g. Williams & Zobel 1999; block-max metadata per Ding &
Suel 2011 "block-max WAND").  Pure-numpy codecs — no Python loop over
postings in the hot path.
"""

from __future__ import annotations

import numpy as np


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array as LEB128-style varbytes (7 bits/byte,
    high bit = continuation).  Vectorized: computes per-value byte
    widths and scatters bytes with numpy.
    """
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte width = ceil(bit_length/7), min 1 — vectorized comparison per
    # possible width (10 max for 64-bit values)
    widths = np.ones(v.shape, dtype=np.int64)
    for w in range(1, 10):
        widths[v >= (np.uint64(1) << np.uint64(7 * w))] = w + 1
    total = int(widths.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(widths)
    starts = ends - widths
    rem = v.copy()
    # fill byte position k of every value that has >= k+1 bytes
    maxw = int(widths.max())
    for k in range(maxw):
        sel = widths > k
        idx = starts[sel] + k
        byte = (rem[sel] & np.uint64(0x7F)).astype(np.uint8)
        cont = (widths[sel] > k + 1).astype(np.uint8) << 7
        out[idx] = byte | cont
        rem[sel] = rem[sel] >> np.uint64(7)
    return out.tobytes()


def varbyte_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode varbytes back to uint64. Vectorized via continuation masks."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    cont = (raw & 0x80) != 0
    # value boundaries: positions where previous byte had cont=0 (or start)
    is_start = np.empty(raw.shape, dtype=bool)
    is_start[0] = True
    is_start[1:] = ~cont[:-1]
    value_idx = np.cumsum(is_start) - 1          # which value each byte belongs to
    starts = np.flatnonzero(is_start)
    byte_pos = np.arange(raw.size) - starts[value_idx]  # byte offset within its value
    n = int(is_start.sum())
    out = np.zeros(n, dtype=np.uint64)
    payload = (raw & 0x7F).astype(np.uint64) << (np.uint64(7) * byte_pos.astype(np.uint64))
    np.add.at(out, value_idx, payload)
    if count is not None:
        assert n == count, f"varbyte_decode: expected {count} values, got {n}"
    return out


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    ids = np.asarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    out = np.empty_like(ids)
    out[0] = ids[0]
    out[1:] = ids[1:] - ids[:-1]
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(np.asarray(deltas, dtype=np.uint64), dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, block_size: int = 128):
    """Sorted doc_ids + tfs -> (doc_ids_vb, tfs_vb, block_last_doc, block_max_tf).

    Block-max metadata: for each block of ``block_size`` postings, the
    last (max) doc id and the max tf — enough for the scorer to build
    exact per-block BM25 upper bounds at load time (it holds doc lens).
    """
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    assert doc_ids.size == tfs.size
    n = doc_ids.size
    dvb = varbyte_encode(delta_encode(doc_ids))
    tvb = varbyte_encode(tfs)
    if n == 0:
        return dvb, tvb, np.empty(0, np.uint64), np.empty(0, np.uint64)
    nblocks = (n + block_size - 1) // block_size
    last_idx = np.minimum(np.arange(1, nblocks + 1) * block_size, n) - 1
    block_last = doc_ids[last_idx]
    block_max_tf = np.maximum.reduceat(tfs, np.arange(0, n, block_size))
    return dvb, tvb, block_last, block_max_tf


def decode_postings(doc_ids_vb: bytes, tfs_vb: bytes, count: int | None = None):
    doc_ids = delta_decode(varbyte_decode(doc_ids_vb, count))
    tfs = varbyte_decode(tfs_vb, count)
    return doc_ids, tfs

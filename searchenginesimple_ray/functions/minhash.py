"""MinHash / shingling / SimHash-free near-dup kernels for the
training-data dedup suite (MinHash+LSH, n-gram Jaccard).

Vectorized numpy: shingle hashes once per doc, then ``num_perm``
universal-hash permutations ``(a*x + b) mod p`` over the shingle-hash
set (Broder 1997; LSH banding per Leskovec/Rajaraman/Ullman, "Mining
of Massive Datasets" ch.3).  Deterministic: permutation parameters are
derived from a fixed seed.

Hash family: ``p = 2^31 - 1`` (Mersenne), ``a in [1, p)``, ``b in
[0, p)``, shingle hashes reduced mod p first.  With ``a < 2^31`` and
``x < 2^31`` the product fits uint64 exactly, so this IS the claimed
universal family (x -> (a*x+b) mod p over Z_p) with no silent 2^64
wraparound — a 61-bit prime with 61-bit multipliers overflows uint64
and degrades to an ad-hoc mix.
"""

from __future__ import annotations

import numpy as np

_MERSENNE_P = np.uint64((1 << 31) - 1)
_MAX_HASH = np.uint64((1 << 32) - 1)


def _permutations(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    p = int(_MERSENNE_P)
    a = rng.randint(1, p, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, p, size=num_perm, dtype=np.uint64)
    return a, b


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char shingle hashes (uint32) of the lowercased text."""
    s = text.lower()
    if len(s) < k:
        s = s + " " * (k - len(s))
    data = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
    n = data.size
    if n < k:
        return np.zeros(1, dtype=np.uint64)
    # polynomial hash of each k-byte window, vectorized via stride tricks
    win = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    base = np.uint64(257)
    powers = base ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    hashes = (win * powers).sum(axis=1, dtype=np.uint64) & _MAX_HASH
    return np.unique(hashes)


def char_shingles_flat(col, k: int = 5) -> tuple[np.ndarray, np.ndarray]:
    """Batch shingling: Arrow string array -> (flat_hashes, seg_counts).

    Doc ``d``'s shingle hashes are ``flat[counts[:d].sum() :
    counts[:d+1].sum()]``.  The whole batch is hashed in ONE pass over
    the column's concatenated utf-8 buffer (Horner polynomial over k
    byte-shifted views — no (N, k) window materialization), with
    windows that cross doc boundaries masked out via a range-diff
    cumsum.  Hash values match ``char_shingles`` exactly; duplicates
    are RETAINED for long docs (callers feed minima, which don't care),
    while docs shorter than k characters fall back to per-doc
    ``char_shingles`` (multi-byte padding parity) and are spliced in.
    Lowercasing uses Arrow ``utf8_lower`` (identical to ``str.lower``
    on ASCII; exotic case maps may differ — acceptable for a hash)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    if col.null_count:
        # nulls would poison the offsets math (utf8_length -> NaN) and
        # crash the short-doc fallback; treat them as empty strings
        col = pc.fill_null(col, "")
    low = pc.utf8_lower(col)
    char_len = pc.utf8_length(low).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(low.type) else np.int32
    offs = np.frombuffer(low.buffers()[1], dtype=off_dtype)[
        low.offset: low.offset + n + 1].astype(np.int64)
    data_buf = low.buffers()[2]
    data = (np.frombuffer(data_buf, dtype=np.uint8)[offs[0]: offs[-1]]
            if data_buf is not None else np.empty(0, np.uint8))
    offs = offs - offs[0]
    short = char_len < k
    counts = np.where(short, 0, np.diff(offs) - k + 1)
    m = data.size - k + 1
    if m > 0 and counts.sum() > 0:
        flat_u = data.astype(np.uint64)
        base = np.uint64(257)
        with np.errstate(over="ignore"):
            h = np.zeros(m, np.uint64)
            for j in range(k):
                h = h * base + flat_u[j: j + m]
        h &= _MAX_HASH
        starts = offs[:-1][counts > 0]
        ends = (offs[:-1] + counts)[counts > 0]
        delta = np.zeros(m + 1, np.int32)
        np.add.at(delta, starts, 1)
        np.add.at(delta, ends, -1)
        flat = h[np.cumsum(delta[:-1]) > 0]
    else:
        flat = np.empty(0, np.uint64)
        counts = np.zeros(n, np.int64)
    seg_counts = counts.copy()
    if short.any():
        idx_short = np.flatnonzero(short)
        pos_in_flat = (np.cumsum(counts) - counts)[idx_short]
        short_strs = low.take(pa.array(idx_short)).to_pylist()
        ins_pos, ins_vals = [], []
        for d, p, s in zip(idx_short, pos_in_flat, short_strs):
            hs = char_shingles(s, k)
            seg_counts[d] = len(hs)
            ins_vals.append(hs)
            ins_pos.append(np.full(len(hs), p, np.int64))
        flat = np.insert(flat, np.concatenate(ins_pos),
                         np.concatenate(ins_vals))
    return flat, seg_counts


def word_ngrams(tokens: list[str], n: int = 3) -> set:
    if len(tokens) < n:
        return {tuple(tokens)} if tokens else set()
    return {tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def minhash_signature(shingle_hashes: np.ndarray, num_perm: int = 64,
                      seed: int = 7, perms=None) -> np.ndarray:
    """uint32 signature of length num_perm."""
    a, b = perms if perms is not None else _permutations(num_perm, seed)
    x = shingle_hashes.astype(np.uint64) % _MERSENNE_P
    if x.size == 0:
        x = np.zeros(1, dtype=np.uint64)
    # (num_perm, n_shingles): a*x < 2^62 — exact in uint64
    vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE_P
    return vals.min(axis=1).astype(np.uint32)


def minhash_signatures_flat(flat_hashes: np.ndarray, offsets: np.ndarray,
                            num_perm: int = 64, seed: int = 7,
                            perms=None) -> np.ndarray:
    """(n_docs, num_perm) uint32 signatures from a FLAT shingle-hash
    array: doc ``d``'s shingles are ``flat_hashes[offsets[d]:
    offsets[d+1]]`` (``offsets`` has one entry per doc, no total; every
    segment must be non-empty).  One permutation at a time keeps the
    working set at O(total_shingles); per-doc minima via
    ``np.minimum.reduceat``.  Duplicate hashes within a segment are
    harmless — the minimum is unaffected — so callers need not dedup."""
    a, b = perms if perms is not None else _permutations(num_perm, seed)
    n = len(offsets)
    out = np.empty((n, len(a)), dtype=np.uint32)
    if n == 0:
        return out
    flat = flat_hashes.astype(np.uint64) % _MERSENNE_P
    for j in range(len(a)):
        vals = (a[j] * flat + b[j]) % _MERSENNE_P
        out[:, j] = np.minimum.reduceat(vals, offsets).astype(np.uint32)
    return out


def minhash_signatures_batch(shingle_sets: list[np.ndarray],
                             num_perm: int = 64, seed: int = 7,
                             perms=None) -> np.ndarray:
    """(n_docs, num_perm) uint32 signatures in ONE vectorized pass.

    Concatenates every doc's shingle hashes then delegates to
    ``minhash_signatures_flat`` (batch-scale replacement for per-row
    ``minhash_signature`` calls, which pay the (num_perm x n) broadcast
    per doc)."""
    if not shingle_sets:        # empty block: reduceat would crash
        return np.empty((0, num_perm), np.uint32)
    lens = np.fromiter((max(len(s), 1) for s in shingle_sets),
                       np.int64, len(shingle_sets))
    flat = np.concatenate(
        [s if len(s) else np.zeros(1, np.uint64) for s in shingle_sets]) \
        if shingle_sets else np.zeros(0, np.uint64)
    offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return minhash_signatures_flat(flat, offsets, num_perm, seed, perms)


def lsh_band_keys(signature: np.ndarray, num_bands: int = 16) -> np.ndarray:
    """Split a signature into bands; returns uint64 key per band
    (band_id folded in so keys from different bands never collide)."""
    sig = signature.reshape(num_bands, -1).astype(np.uint64)
    keys = np.empty(num_bands, dtype=np.uint64)
    with np.errstate(over="ignore"):  # intended mod-2^64 wraparound
        for i in range(num_bands):
            h = np.uint64(1469598103934665603)  # FNV-64 offset basis
            for v in sig[i]:
                h = (h ^ v) * np.uint64(1099511628211)
            keys[i] = (h ^ np.uint64(i)) * np.uint64(1099511628211)
    return keys


def lsh_band_keys_batch(sigs: np.ndarray, num_bands: int = 16) -> np.ndarray:
    """(n, num_perm) signatures -> (n, num_bands) uint64 band keys.

    Bit-identical to per-row ``lsh_band_keys`` (same FNV-1a fold over
    the band's values, band id folded in) but vectorized across the
    batch — the sequential FNV chain is only ``num_perm/num_bands``
    steps long, so the loop runs over that tiny width, not over docs."""
    n, P = sigs.shape
    r = P // num_bands
    s = sigs.reshape(n, num_bands, r).astype(np.uint64)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):  # intended mod-2^64 wraparound
        h = np.full((n, num_bands), np.uint64(1469598103934665603),
                    dtype=np.uint64)
        for j in range(r):
            h = (h ^ s[:, :, j]) * prime
        h = (h ^ np.arange(num_bands, dtype=np.uint64)[None, :]) * prime
    return h


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))

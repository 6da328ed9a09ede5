"""Hash functions with exact reference parity.

- ``fnv1a32`` / ``ihash`` / ``shard_of_term``: FNV-1a 32-bit and the
  reference's non-negative zone hash (`include/helper/ihsah.hpp:8-27`;
  zone sharding call sites `include/Dictionary/Dictionary.hpp:102,113`).
- ``jenkins64``: Bob Jenkins' public-domain lookup3 ``hashlittle2``
  composed as ``(pc << 32) | pb`` with seed 0, exactly as the
  reference's simhash hasher (`include/simhash/jenkins.h:98-103`).
- ``hamming64`` / ``simhash_is_equal``: popcount distance and the
  threshold test (`include/simhash/Simhasher.hpp:109-151`).
- ``simhash_bands``: split a 64-bit simhash into ``num_bands`` equal
  bit-bands (pigeonhole: two hashes within hamming<=3 share at least
  one of 4 bands — used by the banded near-dup shuffle, SURVEY §2.4 A4).

All functions are pure Python/numpy reimplementations from the public
algorithms — no code is copied from the reference.
"""

from __future__ import annotations

import numpy as np

_U32 = 0xFFFFFFFF


def fnv1a32(key: str | bytes) -> int:
    """FNV-1a 32-bit (parity with `ihsah.hpp:8-18`)."""
    if isinstance(key, str):
        key = key.encode("utf-8")
    h = 2166136261
    for b in key:
        h ^= b
        h = (h * 16777619) & _U32
    return h


_U64 = 0xFFFFFFFFFFFFFFFF


def fnv1a64(key: str | bytes) -> int:
    """FNV-1a 64-bit (public-domain Fowler–Noll–Vo; used for
    collision-safe shingle/gram identities in the dedup suite)."""
    if isinstance(key, str):
        key = key.encode("utf-8")
    h = 14695981039346656037
    for b in key:
        h ^= b
        h = (h * 1099511628211) & _U64
    return h


def ihash(key: str | bytes) -> int:
    """Non-negative variant (`ihsah.hpp:21-27`): fnv1a32 & 0x7fffffff."""
    return fnv1a32(key) & 0x7FFFFFFF


def shard_of_term(term: str, num_shards: int) -> int:
    """Zone sharding `iHash::Hash(tok) % zone` (`Dictionary.hpp:102,113`)."""
    return ihash(term) % num_shards


def fnv1a32_array(terms, num_shards: int | None = None) -> np.ndarray:
    """Vectorized-ish FNV-1a over an array of strings.

    Hashes each *unique* value once (Zipf-distributed term columns make
    uniques ≪ rows), then gathers.  Returns uint32 hashes, or int32
    shards when ``num_shards`` is given.
    """
    arr = np.asarray(terms, dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    if num_shards is None:
        vals = np.fromiter((fnv1a32(u) for u in uniq), dtype=np.uint32, count=len(uniq))
        return vals[inv]
    vals = np.fromiter(
        ((fnv1a32(u) & 0x7FFFFFFF) % num_shards for u in uniq),
        dtype=np.int32,
        count=len(uniq),
    )
    return vals[inv]


def _rot(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & _U32


def _mix(a: int, b: int, c: int):
    a = (a - c) & _U32; a ^= _rot(c, 4);  c = (c + b) & _U32
    b = (b - a) & _U32; b ^= _rot(a, 6);  a = (a + c) & _U32
    c = (c - b) & _U32; c ^= _rot(b, 8);  b = (b + a) & _U32
    a = (a - c) & _U32; a ^= _rot(c, 16); c = (c + b) & _U32
    b = (b - a) & _U32; b ^= _rot(a, 19); a = (a + c) & _U32
    c = (c - b) & _U32; c ^= _rot(b, 4);  b = (b + a) & _U32
    return a, b, c


def _final(a: int, b: int, c: int):
    c ^= b; c = (c - _rot(b, 14)) & _U32
    a ^= c; a = (a - _rot(c, 11)) & _U32
    b ^= a; b = (b - _rot(a, 25)) & _U32
    c ^= b; c = (c - _rot(b, 16)) & _U32
    a ^= c; a = (a - _rot(c, 4)) & _U32
    b ^= a; b = (b - _rot(a, 14)) & _U32
    c ^= b; c = (c - _rot(b, 24)) & _U32
    return a, b, c


def hashlittle2(data: bytes, pc: int = 0, pb: int = 0) -> tuple[int, int]:
    """lookup3 ``hashlittle2`` (Bob Jenkins, public domain, little-endian
    logical behaviour).  Returns ``(pc, pb)`` — *pc is better mixed*.
    """
    length = len(data)
    a = b = c = (0xDEADBEEF + length + pc) & _U32
    c = (c + pb) & _U32

    off = 0
    while length > 12:
        a = (a + int.from_bytes(data[off:off + 4], "little")) & _U32
        b = (b + int.from_bytes(data[off + 4:off + 8], "little")) & _U32
        c = (c + int.from_bytes(data[off + 8:off + 12], "little")) & _U32
        a, b, c = _mix(a, b, c)
        off += 12
        length -= 12

    # tail: the reference's byte-at-a-time switch (jenkins.h hashlittle2,
    # k8[] branch) — equivalent across alignment branches.
    tail = data[off:off + length]
    if length == 0:
        return c, b  # original: "case 0: return" without final()
    for i, byte in enumerate(tail):
        shift = (i % 4) * 8
        v = byte << shift
        if i < 4:
            a = (a + v) & _U32
        elif i < 8:
            b = (b + v) & _U32
        else:
            c = (c + v) & _U32
    a, b, c = _final(a, b, c)
    return c, b


def jenkins64(key: str | bytes, seed: int = 0) -> int:
    """64-bit jenkins as the reference composes it (`jenkins.h:98-103`):
    ``a = seed>>32, b = seed&0xffffffff; hashlittle2 -> (a<<32)|b``.
    """
    if isinstance(key, str):
        key = key.encode("utf-8")
    pc, pb = hashlittle2(key, (seed >> 32) & _U32, seed & _U32)
    return (pc << 32) | pb


_M1 = np.uint64(0x5555555555555555)
_M2 = np.uint64(0x3333333333333333)
_M4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_H01 = np.uint64(0x0101010101010101)


def popcount64(x) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (no per-bit unpack)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):   # intended mod-2^64 arithmetic
        x -= (x >> np.uint64(1)) & _M1
        x = (x & _M2) + ((x >> np.uint64(2)) & _M2)
        x = (x + (x >> np.uint64(4))) & _M4
        return (x * _H01) >> np.uint64(56)


def hamming64(lhs, rhs):
    """Popcount of xor — scalar ints or numpy uint64 arrays."""
    x = np.bitwise_xor(np.asarray(lhs, dtype=np.uint64),
                       np.asarray(rhs, dtype=np.uint64))
    cnt = popcount64(x).astype(np.int64)
    return cnt.reshape(np.shape(x)) if np.ndim(x) else int(cnt.reshape(-1)[0])


def simhash_is_equal(lhs: int, rhs: int, n: int = 3) -> bool:
    """`Simhasher::isEqual` (`Simhasher.hpp:109-151`): hamming <= n."""
    return int(hamming64(lhs, rhs)) <= n


def simhash_combo_keys(hashes, threshold: int = 3) -> np.ndarray:
    """Manku-style block-combination candidate keys for hamming<=threshold
    (Manku, Jain & Das Sarma, WWW'07 §3).

    Split 64 bits into ``B = threshold + 3`` near-equal blocks; <=
    ``threshold`` flipped bits corrupt <= threshold blocks, so at least
    3 blocks are intact => some 3-block combination is identical.  Keys
    are all C(B, 3) 3-block concatenations (combo id folded into the
    top bits).  Key width ~ 3*64/B bits: at threshold 3 that is ~32
    bits vs the naive 4x16-bit banding — 2^16x more selective per key,
    which is what keeps candidate pairs near-linear once the corpus
    outgrows 2^16 (the naive scheme degenerates to all-pairs there).

    Returns shape (n, C(B,3)) uint64.
    """
    if threshold > 5:
        # C(threshold+3, 3) combos must fit the 6-bit combo-id fold
        # (64 ids); beyond that distinct combos would alias into one
        # key space and blow up candidate verification
        raise ValueError(f"threshold={threshold} > 5: combo ids "
                         "exceed the 6-bit key fold")

    from itertools import combinations

    h = np.asarray(hashes, dtype=np.uint64).reshape(-1)
    B = threshold + 3
    bounds = np.linspace(0, 64, B + 1).astype(int)
    blocks = []
    for i in range(B):
        w = bounds[i + 1] - bounds[i]
        blocks.append((h >> np.uint64(bounds[i]))
                      & np.uint64((1 << w) - 1))
    combos = list(combinations(range(B), 3))
    out = np.empty((len(h), len(combos)), dtype=np.uint64)
    for ci, combo in enumerate(combos):
        k = np.zeros_like(h)
        for b in reversed(combo):   # high block first: threshold 0
            w = bounds[b + 1] - bounds[b]    # reassembles h exactly
            k = (k << np.uint64(w)) | blocks[b]
        # fold the combo id into the top bits so different combos
        # occupy disjoint key spaces (collisions would only add
        # candidates — verification stays exact — but cost shuffle)
        out[:, ci] = k ^ (np.uint64(ci) << np.uint64(58))
    return out


def simhash_combo_key_band(hashes, threshold: int, band: int) -> np.ndarray:
    """ONE combo band's keys (column ``band`` of ``simhash_combo_keys``)
    without computing the other C(B,3)-1 columns — for band-parallel
    candidate generation where each task owns a single band."""
    if threshold > 5:
        # C(threshold+3, 3) combos must fit the 6-bit combo-id fold
        # (64 ids); beyond that distinct combos would alias into one
        # key space and blow up candidate verification
        raise ValueError(f"threshold={threshold} > 5: combo ids "
                         "exceed the 6-bit key fold")

    from itertools import combinations

    h = np.asarray(hashes, dtype=np.uint64).reshape(-1)
    B = threshold + 3
    bounds = np.linspace(0, 64, B + 1).astype(int)
    combo = list(combinations(range(B), 3))[band]
    k = np.zeros_like(h)
    for b in reversed(combo):
        w = bounds[b + 1] - bounds[b]
        blk = (h >> np.uint64(bounds[b])) & np.uint64((1 << w) - 1)
        k = (k << np.uint64(w)) | blk
    return k ^ (np.uint64(band) << np.uint64(58))


def simhash_num_combo_bands(threshold: int) -> int:
    from math import comb
    return comb(threshold + 3, 3)


def simhash_bands(hashes, num_bands: int = 4) -> np.ndarray:
    """Split uint64 simhashes into ``num_bands`` equal bit bands.

    Returns an array of shape (n, num_bands) of uint64 band values.
    With 4 bands of 16 bits, any pair with hamming distance <= 3 must
    agree on at least one band (pigeonhole over 64 bits).
    """
    h = np.asarray(hashes, dtype=np.uint64).reshape(-1)
    width = 64 // num_bands
    mask = np.uint64((1 << width) - 1)
    out = np.empty((len(h), num_bands), dtype=np.uint64)
    for i in range(num_bands):
        out[:, i] = (h >> np.uint64(i * width)) & mask
    return out

"""Pigeonhole property of the Manku block-combination candidate keys."""

import numpy as np

from searchenginesimple_ray.functions.hashing import (hamming64,
                                                      simhash_combo_keys)


def _flip(h, bits):
    for b in bits:
        h ^= np.uint64(1) << np.uint64(int(b))
    return h


class TestComboKeys:
    def test_pair_within_threshold_shares_key(self):
        rng = np.random.RandomState(3)
        for threshold in (0, 1, 2, 3):
            for _ in range(200):
                h = np.uint64(rng.randint(0, 2**63, dtype=np.int64))
                k = rng.randint(0, threshold + 1)
                h2 = _flip(h, rng.choice(64, size=k, replace=False))
                assert int(hamming64(h, h2)) <= threshold
                k1 = simhash_combo_keys([h], threshold)[0]
                k2 = simhash_combo_keys([h2], threshold)[0]
                assert (k1 == k2).any(), (hex(int(h)), hex(int(h2)), threshold)

    def test_key_count(self):
        from math import comb
        for threshold in (0, 1, 2, 3):
            keys = simhash_combo_keys([np.uint64(12345)], threshold)
            assert keys.shape == (1, comb(threshold + 3, 3))

    def test_selectivity_random_hashes(self):
        """Random (far-apart) hashes almost never share a key."""
        rng = np.random.RandomState(5)
        h = rng.randint(0, 2**63, size=2000, dtype=np.int64).astype(np.uint64)
        keys = simhash_combo_keys(h, 3).reshape(-1)
        _, counts = np.unique(keys, return_counts=True)
        collisions = int((counts > 1).sum())
        assert collisions < 10  # 40k keys into ~2^32 space

    def test_exact_threshold0_is_full_hash(self):
        h = np.uint64(0xDEADBEEF12345678)
        keys = simhash_combo_keys([h], 0)
        assert keys.shape == (1, 1)
        assert int(keys[0, 0]) == int(h)

    def test_vectorized_matches_scalar(self):
        rng = np.random.RandomState(9)
        hs = rng.randint(0, 2**63, size=50, dtype=np.int64).astype(np.uint64)
        batch = simhash_combo_keys(hs, 3)
        for i, h in enumerate(hs):
            single = simhash_combo_keys([h], 3)[0]
            assert (batch[i] == single).all()

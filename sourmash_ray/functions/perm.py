"""MinHash permutation family for LSH banding.

The reference engine never needed this — its candidate pruning is SBT /
inverted-index based (``/root/reference/src/sourmash/sbt.py``,
``lca_db.py:82``). At 10^12-turn scale that role is played by classic
MinHash-LSH banding (Broder '97; MMDS ch.3), which needs ``num_perm``
independent min-hash values per sketch.

Family: ``h_i(x) = fmix64(x XOR r_i)`` — a fixed 64-bit bijection
(murmur3's finalizer) applied after a per-permutation random XOR. Each
``h_i`` is a bijection of u64, so ``argmin`` over a set is a uniformly
random element in expectation — the MinHash property. Fully vectorized:
one ``(n_hashes, num_perm)`` numpy pass, no Python loops.

The minima are computed over the *retained* (scaled/num) ``mins`` set, not
the raw shingle stream: FracMinHash subsets preserve Jaccard in expectation
(the whole premise of the reference's scaled sketches, ``minhash.rs:21-27``),
and it keeps the LSH estimator consistent with what the verify stage and the
oracle actually measure.
"""

from __future__ import annotations

import numpy as np

MAX_U64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def perm_seeds(num_perm: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) * np.uint64(2) + np.uint64(1)


def _fmix64_vec(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def perm_minima(hashes: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """(num_perm,) uint64 minima of the permuted hash set; all-MAX for an
    empty set (identity element for elementwise-min merging)."""
    if hashes.size == 0:
        return np.full(seeds.size, MAX_U64, dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        m = _fmix64_vec(hashes.astype(np.uint64)[:, None] ^ seeds[None, :])
    finally:
        np.seterr(**old)
    return m.min(axis=0)

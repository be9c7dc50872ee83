"""HyperLogLog: mergeable approximate-distinct sketches, vectorized.

Reimplements the semantics of the reference's HLL
(``/root/reference/src/core/src/sketch/hyperloglog/mod.rs:33-236`` and
``estimators.rs:57-160``): p low bits of the 64-bit hash pick the
register, the rank of the leading one-bit in the remaining ``q = 64 - p``
bits updates it via max, merge is the element-wise register max, and
cardinality comes from Ertl's Maximum-Likelihood estimator (arXiv
1702.01284 — the reference implements the same published algorithm,
equations 46-58; this is an independent numpy/python implementation from
the paper's pseudo-code).

Everything here is a pure function over numpy arrays so Ray map_batches
stages can build per-block registers as a COMBINER (constant-size state,
``2**p`` bytes) and reduce them with a tiny element-wise max — the
dataset-level approximate-distinct never shuffles row data.
"""
from __future__ import annotations

import math

import numpy as np

__all__ = [
    "hll_p_for_error", "hll_empty", "hll_add_hashes", "hll_merge",
    "hll_counts", "hll_mle", "hll_cardinality", "hll_error_rate",
    "hll_joint_mle", "hll_union_cardinality", "hll_intersection",
    "hll_similarity", "hll_containment",
]


def hll_p_for_error(error_rate: float) -> int:
    """``mod.rs:41-44``: p = ceil(log2((1.04 / err)^2)), clamped to the
    reference's supported range [4, 18]."""
    p = math.ceil(math.log2((1.04 / error_rate) ** 2))
    return min(18, max(4, p))


def hll_error_rate(p: int) -> float:
    """Expected relative standard error 1.04 / sqrt(2^p)."""
    return 1.04 / math.sqrt(1 << p)


def hll_empty(p: int) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def _clz64(v: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros of uint64 (v == 0 → 64)."""
    v = np.asarray(v, np.uint64)
    n = np.full(v.shape, 64, dtype=np.int64)
    x = v.copy()
    shift = np.uint64(32)
    for s in (32, 16, 8, 4, 2, 1):
        shift = np.uint64(s)
        big = (x >> shift) != 0
        n[big] -= s
        x[big] >>= shift
    n[v != 0] -= 1  # x is now 1 for nonzero inputs; clz = 64 - bitlength
    return n


def hll_add_hashes(registers: np.ndarray, hashes: np.ndarray) -> None:
    """``mod.rs:217-225`` vectorized: index = low p bits, rank = leading
    zeros of the high ``q`` bits + 1; registers[index] = max(old, rank).
    In-place, one ``np.maximum.at`` scatter per batch."""
    p = int(np.log2(registers.size))
    h = np.asarray(hashes, np.uint64)
    idx = (h & np.uint64((1 << p) - 1)).astype(np.int64)
    value = h >> np.uint64(p)
    # leftmost = clz64(value) + 1 - p  (value occupies 64-p meaningful bits)
    rank = (_clz64(value) + 1 - p).astype(np.uint8)
    np.maximum.at(registers, idx, rank)


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """``mod.rs:62-69``: element-wise max (sizes must match)."""
    if a.size != b.size:
        raise ValueError("cannot merge HLLs of different p")
    return np.maximum(a, b)


def hll_counts(registers: np.ndarray, q: int) -> np.ndarray:
    """``estimators.rs::counts``: multiplicity histogram C[0..q+1]."""
    return np.bincount(registers, minlength=q + 2)[: q + 2]


def hll_mle(counts: np.ndarray, p: int, q: int,
            relerr: float = 0.01) -> float:
    """Ertl's MLE cardinality estimator (paper §4, algorithm 8 /
    eqns 46-58; reference twin ``estimators.rs:57-160``)."""
    m = 1 << p
    if counts[0] == m:
        return 0.0
    if counts[q + 1] == m:
        return float("inf")
    nz = np.flatnonzero(counts)
    k_min = int(nz[0])
    k_min_prime = max(1, k_min)
    k_max = int(nz[-1])
    k_max_prime = min(q, k_max)

    z = 0.0
    for i in range(k_max_prime, k_min_prime - 1, -1):
        z = 0.5 * z + float(counts[i])
    z = math.ldexp(z, -k_min_prime)

    c_prime = int(counts[q + 1])
    if q >= 1:
        c_prime += int(counts[k_max_prime])

    g_prev = 0.0
    a = z + float(counts[0])
    b = z + math.ldexp(float(counts[q + 1]), -q)
    m_prime = float(m - counts[0])

    if b <= 1.5 * a:
        x = m_prime / (0.5 * b + a)        # weak lower bound (47)
    else:
        x = m_prime / (b * math.log1p(b / a))  # strong lower bound (46)

    delta_x = x
    del_rel = relerr / math.sqrt(m)
    while delta_x > x * del_rel:
        # secant-method iteration on the log-likelihood derivative
        kappa = int(2 + math.floor(math.log2(x))) if x > 0 else 2
        kappa = max(kappa, 0)
        x_prime = math.ldexp(x, -max(k_max_prime, kappa) - 1)
        x_pp = x_prime * x_prime
        # Taylor expansion of h at small argument (58)
        h = x_prime - x_pp / 3 + (x_pp * x_pp) * (1.0 / 45 - x_pp / 472.5)
        for _ in range(kappa - 1, k_max_prime - 1, -1):
            h_prime = 1.0 - h
            h = (x_prime + h * h_prime) / (x_prime + h_prime)
            x_prime += x_prime
        g = c_prime * h
        for k in range(k_max_prime - 1, k_min_prime - 1, -1):
            h_prime = 1.0 - h
            h = (x_prime + h * h_prime) / (x_prime + h_prime)
            g += float(counts[k]) * h
            x_prime += x_prime
        g += x * a
        if g > g_prev and m_prime >= g:
            delta_x = delta_x * (m_prime - g) / (g - g_prev)
        else:
            delta_x = 0.0
        x += delta_x
        g_prev = g
    return m * x


def hll_cardinality(registers: np.ndarray) -> int:
    """``mod.rs:83-107``: MLE with the reference's p-dependent relative
    error target."""
    p = int(np.log2(registers.size))
    q = 64 - p
    relerr = 0.01 if p < 8 else (0.05 if p < 16 else 0.1)
    return int(hll_mle(hll_counts(registers, q), p, q, relerr))


def hll_joint_mle(a: np.ndarray, b: np.ndarray) -> tuple[int, int, int]:
    """Ertl's joint maximum-likelihood estimator for two sketches (paper
    §5 / Algorithm 9, arXiv 1702.01284; reference twin
    ``estimators.rs:159-260``): returns (|A\\B|, |B\\A|, |A∩B|). Solves
    five univariate MLE problems over register-comparison histograms —
    far lower variance than inclusion-exclusion for small intersections.
    Vectorized: the six histograms are bincounts over register masks."""
    if a.size != b.size:
        raise ValueError("cannot compare HLLs of different p")
    p = int(np.log2(a.size))
    q = 64 - p
    relerr = 0.01  # the reference's joint path uses the tight tolerance
    ka = a.astype(np.int64)
    kb = b.astype(np.int64)
    less = ka < kb
    greater = ka > kb
    eq = ~less & ~greater
    nbins = q + 2

    def bc(vals: np.ndarray) -> np.ndarray:
        return np.bincount(vals, minlength=nbins)[:nbins].astype(np.int64)

    c1 = bc(ka[less])          # A's value where A lost the register max
    cg1 = bc(ka[greater])      # A's value where A holds the max
    c2 = bc(kb[greater])
    cg2 = bc(kb[less])
    ceq = bc(ka[eq])
    cu = bc(np.maximum(ka, kb))
    c1 = c1 + cg1 + ceq        # register histogram of A alone
    c2 = c2 + cg2 + ceq        # register histogram of B alone

    c_ax = hll_mle(c1, p, q, relerr)
    c_bx = hll_mle(c2, p, q, relerr)
    c_abx = hll_mle(cu, p, q, relerr)

    # half-resolution histograms for the A\B / B\A terms (paper eq. 74-77)
    axb_half = np.zeros(nbins, np.int64)
    bxa_half = np.zeros(nbins, np.int64)
    axb_half[q] = a.size
    bxa_half[q] = b.size
    for k in range(q):
        axb_half[k] = cg1[k] + ceq[k] + cg2[k + 1]
        axb_half[q] -= axb_half[k]
        bxa_half[k] = cg2[k] + ceq[k] + cg1[k + 1]
        bxa_half[q] -= bxa_half[k]
    c_axb_half = hll_mle(axb_half, p, q - 1, relerr)
    c_bxa_half = hll_mle(bxa_half, p, q - 1, relerr)

    cx1 = 1.5 * c_bx + 1.5 * c_ax - c_bxa_half - c_axb_half
    cx2 = 2.0 * (c_bxa_half + c_axb_half) - 3.0 * c_abx
    inter = max(0, int(0.5 * (cx1 + cx2)))
    return max(0, int(c_abx - c_bx)), max(0, int(c_abx - c_ax)), inter


def hll_union_cardinality(a: np.ndarray, b: np.ndarray) -> int:
    """|A ∪ B| = only_a + only_b + intersection via the joint MLE
    (``mod.rs:109-114``)."""
    only_a, only_b, inter = hll_joint_mle(a, b)
    return only_a + only_b + inter


def hll_intersection(a: np.ndarray, b: np.ndarray) -> int:
    """|A ∩ B| via the joint MLE (``mod.rs:130-135``)."""
    return hll_joint_mle(a, b)[2]


def hll_similarity(a: np.ndarray, b: np.ndarray) -> float:
    """Jaccard estimate (``mod.rs:116-121``)."""
    only_a, only_b, inter = hll_joint_mle(a, b)
    u = only_a + only_b + inter
    return inter / u if u else 0.0


def hll_containment(a: np.ndarray, b: np.ndarray) -> float:
    """|A∩B| / |A| (``mod.rs:123-128``)."""
    only_a, _, inter = hll_joint_mle(a, b)
    ca = only_a + inter
    return inter / ca if ca else 0.0

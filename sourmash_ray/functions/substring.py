"""Longest-common-substring kernel — the exact long-match pass.

The north-star analogue of the reference's hash→kmer back-mapping
(``sig kmers``, ``/root/reference/src/sourmash/sig/__main__.py:1087-1308``,
``minhash.py:393-460``): after sketch-level similarity says two
conversations are near-dups, find the longest EXACT shared byte span.

Algorithm: binary search on span length L over POLYNOMIAL rolling
hashes. One O(n) prefix pass per string computes
``S[i] = sum_{j<i} a[j]·B^j (mod 2^64)``; every L-window hash is then
the position-normalized ``(S[i+L] - S[i]) · B^{-i}`` — a subtract and a
multiply, so each binary-search probe costs O(n+m) TOTAL, independent
of L (the previous murmur-window variant re-hashed L bytes per window,
O(n·L) per probe — quadratic on near-identical blobs whose first probe
is L ≈ n/2). Candidates from the hash intersection are confirmed by
direct byte comparison, so 2^64-poly collisions cost time, never
correctness.
"""

from __future__ import annotations

import numpy as np

_B = np.uint64(0x9E3779B97F4A7C15)           # odd → invertible mod 2^64
_BINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def _prefix_state(x: np.ndarray):
    """(S, invpows) for the normalized rolling hash; uint64 arithmetic
    wraps mod 2^64 by construction (numpy unsigned overflow)."""
    n = x.size
    S = np.zeros(n + 1, np.uint64)
    invpows = np.ones(n + 1, np.uint64)
    if n:
        pows = np.ones(n, np.uint64)
        if n > 1:
            np.cumprod(np.full(n - 1, _B, np.uint64), out=pows[1:])
        np.cumprod(np.full(n, _BINV, np.uint64), out=invpows[1:])
        # +1 so a zero byte still contributes its positional weight
        np.cumsum((x.astype(np.uint64) + np.uint64(1)) * pows, out=S[1:])
    return S, invpows


def _window_hashes(S: np.ndarray, invpows: np.ndarray,
                   L: int) -> np.ndarray:
    n = S.size - 1 - L + 1
    if n <= 0:
        return np.empty(0, np.uint64)
    return (S[L:L + n] - S[:n]) * invpows[:n]


def _match_at_length(a: np.ndarray, b: np.ndarray, sa_state, sb_state,
                     L: int):
    """Return (pos_a, pos_b) of an exact common L-substring, or None."""
    ha = _window_hashes(*sa_state, L)
    hb = _window_hashes(*sb_state, L)
    if ha.size == 0 or hb.size == 0:
        return None
    common = np.intersect1d(ha, hb)
    if common.size == 0:
        return None
    # confirm (collision-proof): check each candidate pair of positions
    order_a = np.argsort(ha, kind="stable")
    order_b = np.argsort(hb, kind="stable")
    sa = ha[order_a]
    sb = hb[order_b]
    for h in common.tolist():
        pa_lo, pa_hi = np.searchsorted(sa, h), np.searchsorted(sa, h, "right")
        pb_lo, pb_hi = np.searchsorted(sb, h), np.searchsorted(sb, h, "right")
        for pa in order_a[pa_lo:pa_hi].tolist():
            va = a[pa:pa + L]
            for pb in order_b[pb_lo:pb_hi].tolist():
                if np.array_equal(va, b[pb:pb + L]):
                    return int(pa), int(pb)
    return None


def longest_common_substring(a: bytes, b: bytes) -> tuple[int, int, int]:
    """(length, start_a, start_b) of the longest exact common substring."""
    aa = np.frombuffer(a, dtype=np.uint8)
    bb = np.frombuffer(b, dtype=np.uint8)
    sa_state = _prefix_state(aa)
    sb_state = _prefix_state(bb)
    lo, hi = 0, min(aa.size, bb.size)
    best = (0, 0, 0)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        m = _match_at_length(aa, bb, sa_state, sb_state, mid)
        if m is not None:
            best = (mid, m[0], m[1])
            lo = mid
        else:
            hi = mid - 1
    return best

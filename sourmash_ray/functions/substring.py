"""Longest-common-substring kernel — the exact long-match pass.

The north-star analogue of the reference's hash→kmer back-mapping
(``sig kmers``, ``/root/reference/src/sourmash/sig/__main__.py:1087-1308``,
``minhash.py:393-460``): after sketch-level similarity says two
conversations are near-dups, find the longest EXACT shared byte span.

Algorithm: binary search on span length L; at each L, murmur-hash every
L-window of both strings (one vectorized pass, same kernel as the
sketcher), intersect the hash sets, and confirm a surviving candidate by
direct byte comparison (eliminating collisions). O((n+m)·log min(n,m))
hash work, fully vectorized per probe.
"""

from __future__ import annotations

import numpy as np

from .murmur import murmur64_fixedlen


def _window_hashes(data: np.ndarray, L: int) -> np.ndarray:
    n = data.size - L + 1
    if n <= 0:
        return np.empty(0, np.uint64)
    width = L + (-L) % 8
    padded = np.concatenate([data, np.zeros(8, np.uint8)])
    view = np.lib.stride_tricks.sliding_window_view(padded, width)[:n]
    return murmur64_fixedlen(view, length=L)


def _match_at_length(a: np.ndarray, b: np.ndarray, L: int):
    """Return (pos_a, pos_b) of an exact common L-substring, or None."""
    ha = _window_hashes(a, L)
    hb = _window_hashes(b, L)
    if ha.size == 0 or hb.size == 0:
        return None
    common, ia, ib = np.intersect1d(ha, hb, return_indices=True)
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
    lo, hi = 0, min(aa.size, bb.size)
    best = (0, 0, 0)
    while lo < hi:
        mid = (lo + hi + 1) // 2
        m = _match_at_length(aa, bb, mid)
        if m is not None:
            best = (mid, m[0], m[1])
            lo = mid
        else:
            hi = mid - 1
    return best

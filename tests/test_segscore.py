"""Brute-force equivalence tests for the vectorized segment kernels
(functions/segscore.py) — the shared scoring core of verify / scan /
angular / gather. Pure numpy, no Ray session needed."""

import numpy as np
import pytest

from sourmash_ray.functions import segscore
from sourmash_ray.functions.segscore import (
    hash_strings64,
    pair_dot_stats,
    pair_jaccard_stats,
    popcount64,
    query_jaccard_stats,
)


def _mkseg(rng, npairs, maxlen, space=200):
    offs = [0]
    vals = []
    for _ in range(npairs):
        k = int(rng.integers(0, maxlen))
        v = np.sort(rng.choice(space, size=k, replace=False)
                    .astype(np.uint64))
        vals.append(v)
        offs.append(offs[-1] + k)
    return (np.concatenate(vals) if vals else np.empty(0, np.uint64),
            np.array(offs, np.int64))


@pytest.mark.parametrize("num", [0, 7])
def test_pair_jaccard_stats_bruteforce(num):
    rng = np.random.default_rng(7)
    for _ in range(40):
        n = int(rng.integers(1, 25))
        av, ao = _mkseg(rng, n, 30)
        bv, bo = _mkseg(rng, n, 30)
        c, cj, dj = pair_jaccard_stats(av, ao, bv, bo, num)
        for i in range(n):
            a = av[ao[i]:ao[i + 1]]
            b = bv[bo[i]:bo[i + 1]]
            common = np.intersect1d(a, b, assume_unique=True)
            assert c[i] == common.size
            if num:
                comb = np.union1d(a, b)[:num]
                assert cj[i] == np.intersect1d(
                    common, comb, assume_unique=True).size
                assert dj[i] == comb.size
            else:
                assert cj[i] == common.size
                assert dj[i] == a.size + b.size - common.size


def test_pair_jaccard_stats_chunked_path():
    """Chunking (length-ordered row groups) returns results in the
    original pair order."""
    rng = np.random.default_rng(3)
    old = segscore._CHUNK_ROWS
    segscore._CHUNK_ROWS = 4
    try:
        av, ao = _mkseg(rng, 37, 50)
        bv, bo = _mkseg(rng, 37, 50)
        c, _, _ = pair_jaccard_stats(av, ao, bv, bo, 0)
        for i in range(37):
            a = av[ao[i]:ao[i + 1]]
            b = bv[bo[i]:bo[i + 1]]
            assert c[i] == np.intersect1d(a, b, assume_unique=True).size
    finally:
        segscore._CHUNK_ROWS = old


def test_pair_jaccard_sentinel_fallback():
    """A real UINT64_MAX value routes to the bisect path, still exact."""
    MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
    av = np.array([1, 5, MAX], np.uint64)
    ao = np.array([0, 3], np.int64)
    bv = np.array([5, MAX], np.uint64)
    bo = np.array([0, 2], np.int64)
    c, cj, dj = pair_jaccard_stats(av, ao, bv, bo, 0)
    assert c[0] == 2 and dj[0] == 3


@pytest.mark.parametrize("num", [0, 7])
def test_query_jaccard_stats_bruteforce(num):
    rng = np.random.default_rng(11)
    for _ in range(40):
        n = int(rng.integers(1, 25))
        sv, so = _mkseg(rng, n, 30)
        q = np.sort(rng.choice(
            200, size=int(rng.integers(0, 40)), replace=False)
            .astype(np.uint64))
        c, cj, dj = query_jaccard_stats(q, sv, so, num)
        for i in range(n):
            s = sv[so[i]:so[i + 1]]
            common = np.intersect1d(q, s, assume_unique=True)
            assert c[i] == common.size
            if num:
                comb = np.union1d(q, s)[:num]
                assert cj[i] == np.intersect1d(
                    common, comb, assume_unique=True).size
                assert dj[i] == comb.size
            else:
                assert cj[i] == common.size
                assert dj[i] == q.size + s.size - common.size


def test_pair_dot_stats_bruteforce():
    rng = np.random.default_rng(13)
    for _ in range(30):
        n = int(rng.integers(1, 15))
        av, ao = _mkseg(rng, n, 20)
        bv, bo = _mkseg(rng, n, 20)
        aw = rng.integers(1, 10, size=av.size).astype(np.float64)
        bw = rng.integers(1, 10, size=bv.size).astype(np.float64)
        dot, na2, nb2 = pair_dot_stats(av, ao, aw, bv, bo, bw)
        for i in range(n):
            a = av[ao[i]:ao[i + 1]]
            b = bv[bo[i]:bo[i + 1]]
            _, ia, ib = np.intersect1d(a, b, assume_unique=True,
                                       return_indices=True)
            ref = float(np.dot(aw[ao[i]:ao[i + 1]][ia],
                               bw[bo[i]:bo[i + 1]][ib]))
            assert abs(dot[i] - ref) < 1e-9
            assert abs(na2[i] - np.dot(aw[ao[i]:ao[i + 1]],
                                       aw[ao[i]:ao[i + 1]])) < 1e-9
            assert abs(nb2[i] - np.dot(bw[bo[i]:bo[i + 1]],
                                       bw[bo[i]:bo[i + 1]])) < 1e-9


def test_hash_strings64_content_only():
    """Hash depends only on the string content, not the containing array
    (widths, neighbors) — the property every exchange key relies on."""
    h1 = hash_strings64(["c0000005", "c0000007"])
    h2 = hash_strings64(["c0000005", "a-much-longer-identifier-string"])
    assert h1[0] == h2[0]
    h3 = hash_strings64(np.array(["c0000005"], dtype="S64"))
    assert h3[0] == h1[0]
    import pyarrow as pa

    h4 = hash_strings64(pa.chunked_array([pa.array(["c0000005"]),
                                          pa.array(["c0000007"])]))
    assert (h4 == h1).all()
    assert (h1 >= 0).all() and h1[0] != h1[1]
    assert len(hash_strings64([])) == 0


def test_popcount64():
    rng = np.random.default_rng(17)
    x = rng.integers(0, 2**63, size=500).astype(np.uint64)
    ref = np.array([bin(int(v)).count("1") for v in x], np.int64)
    assert (popcount64(x) == ref).all()
    assert popcount64(np.array([0, 0xFFFFFFFFFFFFFFFF], np.uint64)).tolist() \
        == [0, 64]


def test_hash_strings_unicode_and_nulls():
    """UTF-8 ids (the reviewer's crash case): non-ASCII conv_ids must hash,
    not raise; same content hashes equal across container types; nulls
    hash as empty."""
    import pyarrow as pa

    from sourmash_ray.functions.segscore import hash_strings64

    v = hash_strings64(["conv-café-1", "día", "", "plain"])
    arr = pa.chunked_array([pa.array(["conv-café-1", None, "plain"])])
    v2 = hash_strings64(arr)
    assert v[0] == v2[0] and v[3] == v2[2]
    assert v2[1] == v[2]  # null ≡ empty string
    assert hash_strings64(["café"])[0] == \
        hash_strings64(["café".encode()])[0]
    assert hash_strings64(np.array([b"plain"]))[0] == v[3]


# --- hypothesis property tests: kernels ≡ naive reference ---------------

from hypothesis import given, settings, strategies as st


@st.composite
def _segment_pairs(draw):
    n = draw(st.integers(0, 12))
    a_segs, b_segs = [], []
    for _ in range(n):
        a = draw(st.lists(st.integers(0, 400), max_size=25))
        b = draw(st.lists(st.integers(0, 400), max_size=25))
        a_segs.append(np.unique(np.array(a, np.uint64)))
        b_segs.append(np.unique(np.array(b, np.uint64)))
    return a_segs, b_segs


def _flat(segs):
    offs = np.concatenate(
        [[0], np.cumsum([len(s) for s in segs])]).astype(np.int64)
    vals = (np.concatenate(segs).astype(np.uint64) if segs
            else np.empty(0, np.uint64))
    return vals, offs


@settings(max_examples=150, deadline=None)
@given(_segment_pairs(), st.sampled_from([0, 5]))
def test_pair_jaccard_stats_property(pairs, num):
    """Matrix fast path AND bisect fallback both equal the naive per-pair
    reference on arbitrary segment shapes (empties, dupes across sides,
    unequal lengths)."""
    from sourmash_ray.functions.segscore import (
        _pair_jaccard_stats_bisect, _seg_lens, pair_jaccard_stats,
    )

    a_segs, b_segs = pairs
    av, ao = _flat(a_segs)
    bv, bo = _flat(b_segs)
    c, cj, dj = pair_jaccard_stats(av, ao, bv, bo, num)
    n = len(a_segs)
    cb, cjb, djb = _pair_jaccard_stats_bisect(
        av, ao, bv, bo, num, n, _seg_lens(ao), _seg_lens(bo))
    for i, (a, b) in enumerate(zip(a_segs, b_segs)):
        inter = np.intersect1d(a, b, assume_unique=True)
        assert c[i] == cb[i] == inter.size
        union = np.union1d(a, b)
        if not num:
            assert dj[i] == djb[i] == union.size
            assert cj[i] == inter.size
        else:
            top = set(union[:num].tolist())
            exp_cj = sum(1 for x in inter if int(x) in top)
            assert cj[i] == cjb[i] == exp_cj
            assert dj[i] == djb[i] == min(union.size, num)


@settings(max_examples=100, deadline=None)
@given(_segment_pairs())
def test_seg_lower_bound_property(pairs):
    """Pooled-buffer bisection ≡ per-segment np.searchsorted."""
    from sourmash_ray.functions.segscore import _seg_lower_bound

    a_segs, b_segs = pairs
    av, ao = _flat(a_segs)
    bv, bo = _flat(b_segs)
    n = len(a_segs)
    if n == 0 or av.size == 0 or bv.size == 0:
        return
    pids = np.repeat(np.arange(n, dtype=np.int64), np.diff(bo))
    lo0 = ao[pids]
    hi0 = ao[pids + 1]
    got = _seg_lower_bound(av, lo0, hi0, bv)
    k = 0
    for i, (a, b) in enumerate(zip(a_segs, b_segs)):
        for x in b:
            exp = ao[i] + np.searchsorted(a, x)
            assert got[k] == exp, (i, x)
            k += 1

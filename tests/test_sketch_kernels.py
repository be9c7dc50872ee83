"""Sketch + set-algebra kernel tests, following the reference's unit-test
style (hand-set hash lists, exact fractions — ``tests/test_jaccard.py:16-80``)
and hypothesis-vs-dict-oracle style (``tests/test__minhash_hypothesis.py``).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from sourmash_ray.functions.murmur import murmur64
from sourmash_ray.functions.sketch import (
    MAX_U64,
    Sketch,
    SketchParams,
    build_sketch,
    max_hash_for_scaled,
    md5_of_mins,
    normalize_text,
    shingle_hashes,
    sketch_text,
)
from sourmash_ray.functions import setops


def mk(mins, num=0, scaled=1, abunds=None, ksize=31):
    p = SketchParams(ksize=ksize, scaled=scaled, num=num,
                     track_abundance=abunds is not None)
    return Sketch(
        mins=np.array(sorted(mins), dtype=np.uint64),
        abunds=None if abunds is None else np.array(abunds, dtype=np.uint64),
        params=p,
    )


# --- retention rules -------------------------------------------------------

def test_max_hash_for_scaled():
    assert max_hash_for_scaled(0) == 0
    assert max_hash_for_scaled(1) == MAX_U64
    assert max_hash_for_scaled(2) == MAX_U64 // 2
    assert max_hash_for_scaled(1000) == MAX_U64 // 1000


def test_build_sketch_scaled_keeps_below_max_hash():
    p = SketchParams(ksize=4, scaled=2, num=0)
    hashes = np.array([0, 1, p.max_hash, p.max_hash + 1, MAX_U64], dtype=np.uint64)
    mins, abunds, n = build_sketch(hashes, p)
    assert mins.tolist() == [0, 1, p.max_hash]
    assert abunds is None and n == 5


def test_build_sketch_num_keeps_bottom_k_distinct():
    p = SketchParams(ksize=4, scaled=0, num=3)
    hashes = np.array([9, 5, 5, 1, 7, 3], dtype=np.uint64)
    mins, _, n = build_sketch(hashes, p)
    assert mins.tolist() == [1, 3, 5]
    assert n == 5


def test_build_sketch_abundance_counts_multiplicity():
    p = SketchParams(ksize=4, scaled=1, num=0, track_abundance=True)
    hashes = np.array([5, 5, 1, 5, 1, 9], dtype=np.uint64)
    mins, abunds, _ = build_sketch(hashes, p)
    assert mins.tolist() == [1, 5, 9]
    assert abunds.tolist() == [2, 3, 1]


# --- jaccard (test_jaccard.py:16-43 analogues) -----------------------------

def test_jaccard_scaled_4_of_6():
    a = mk([1, 2, 3, 4, 5])
    b = mk([1, 2, 3, 4, 6])
    assert setops.jaccard(a, b) == pytest.approx(4 / 6)


def test_jaccard_num_mode_combined_bottom_k():
    # num=5: combined bottom-5 union of {1..5} and {1,2,3,4,6} is {1,2,3,4,5};
    # common within it = {1,2,3,4} => 4/5 (minhash.rs:593-631).
    a = mk([1, 2, 3, 4, 5], num=5, scaled=0)
    b = mk([1, 2, 3, 4, 6], num=5, scaled=0)
    assert setops.jaccard(a, b) == pytest.approx(4 / 5)


def test_jaccard_identical_and_disjoint():
    a = mk([1, 2, 3])
    assert setops.jaccard(a, a) == 1.0
    b = mk([7, 8, 9])
    assert setops.jaccard(a, b) == 0.0


def test_incompatible_raises():
    a = mk([1], scaled=1)
    b = mk([1], scaled=2)
    with pytest.raises(ValueError):
        setops.jaccard(a, b)


# --- containment -----------------------------------------------------------

def test_containment_directional():
    # large scaled => bias factor ~ 1
    a = mk([1, 2, 3, 4], scaled=10**6)
    b = mk([1, 2, 3, 4, 5, 6, 7, 8], scaled=10**6)
    # bias factor = 1-(1-1/s)^(n*s) ~= 1-e^-n (minhash.py:833): containment
    # 4/8 is debiased by /(1-e^-8) then clamped at 1.0
    assert setops.contained_by(a, b) == 1.0
    assert setops.contained_by(b, a) == pytest.approx(0.5 / (1 - np.exp(-8)), rel=1e-4)
    assert setops.max_containment(a, b) == 1.0
    assert setops.avg_containment(a, b) == pytest.approx(
        (1.0 + 0.5 / (1 - np.exp(-8))) / 2, rel=1e-4
    )


def test_containment_empty():
    a = mk([], scaled=1000)
    b = mk([1, 2], scaled=1000)
    assert setops.contained_by(a, b) == 0.0


# --- merge / intersect / subtract ------------------------------------------

def test_merge_union_and_num_truncation():
    a = mk([1, 3, 5], num=4, scaled=0)
    b = mk([2, 4, 6], num=4, scaled=0)
    m = setops.merge(a, b)
    assert m.mins.tolist() == [1, 2, 3, 4]  # truncated to num=4


def test_merge_abundance_sums():
    a = mk([1, 3], abunds=[2, 5])
    b = mk([3, 7], abunds=[1, 4])
    m = setops.merge(a, b)
    assert m.mins.tolist() == [1, 3, 7]
    assert m.abunds.tolist() == [2, 6, 4]


def test_subtract():
    a = mk([1, 2, 3, 4])
    b = mk([2, 4])
    assert setops.subtract(a, b).mins.tolist() == [1, 3]


def test_intersection_num_mode():
    a = mk([1, 2, 3, 4, 5], num=5, scaled=0)
    b = mk([1, 2, 3, 4, 6], num=5, scaled=0)
    common, size = setops.intersection(a, b)
    assert common.tolist() == [1, 2, 3, 4]
    assert size == 5


# --- downsample / flatten / inflate ----------------------------------------

def test_downsample_scaled_one_way():
    p = SketchParams(ksize=4, scaled=1000, num=0)
    hi = max_hash_for_scaled(2000)
    s = Sketch(mins=np.array([1, hi, hi + 1, max_hash_for_scaled(1000)],
                             dtype=np.uint64), abunds=None, params=p)
    d = setops.downsample_scaled(s, 2000)
    assert d.mins.tolist() == [1, hi]
    with pytest.raises(ValueError):
        setops.downsample_scaled(d, 1000)  # upsample forbidden


def test_downsample_num():
    s = mk([1, 2, 3, 4, 5], num=5, scaled=0)
    d = setops.downsample_num(s, 3)
    assert d.mins.tolist() == [1, 2, 3]
    with pytest.raises(ValueError):
        setops.downsample_num(d, 5)


def test_flatten_and_inflate():
    a = mk([1, 2, 3], abunds=[5, 6, 7])
    f = setops.flatten(a)
    assert f.abunds is None
    b = mk([2, 3, 4])
    infl = setops.inflate(b, a)
    assert infl.mins.tolist() == [2, 3]
    assert infl.abunds.tolist() == [6, 7]


# --- angular similarity ----------------------------------------------------

def test_angular_similarity_identical():
    a = mk([1, 2, 3], abunds=[1, 2, 3])
    assert setops.angular_similarity(a, a) == pytest.approx(1.0)


def test_angular_similarity_orthogonal():
    a = mk([1, 2], abunds=[1, 1])
    b = mk([3, 4], abunds=[1, 1])
    # cos = 0 -> 1 - 2*acos(0)/pi = 0
    assert setops.angular_similarity(a, b) == pytest.approx(0.0)


# --- md5 identity ----------------------------------------------------------

def test_md5_identity_matches_reference_recipe():
    import hashlib

    mins = np.array([10, 20, 30], dtype=np.uint64)
    h = hashlib.md5()
    h.update(b"31")
    for m in (10, 20, 30):
        h.update(str(m).encode())
    assert md5_of_mins(mins, 31) == h.hexdigest()


# --- text shingling --------------------------------------------------------

def test_normalize_text_modes():
    assert normalize_text("  Hello\t WORLD \n", "ws") == b"hello world"
    assert normalize_text("a,b!!c", "alnum") == b"a b c"
    assert normalize_text("AbC", "raw") == b"AbC"


def test_shingle_hashes_matches_scalar():
    data = normalize_text("the quick brown fox jumps over the lazy dog", "ws")
    k = 8
    hs = shingle_hashes(data, k)
    expect = [murmur64(data[i : i + k]) for i in range(len(data) - k + 1)]
    assert hs.tolist() == expect


def test_shingle_short_text_empty():
    assert shingle_hashes(b"abc", 8).size == 0


def test_sketch_text_deterministic():
    p = SketchParams(ksize=8, scaled=0, num=16)
    s1 = sketch_text("hello world this is a test of sketching", p)
    s2 = sketch_text("hello  world this is a test of sketching", p)  # ws-normalized
    assert s1.mins.tolist() == s2.mins.tolist()
    assert s1.md5 == s2.md5
    assert len(s1) <= 16


# --- hypothesis vs set oracle ----------------------------------------------

@given(
    st.sets(st.integers(min_value=0, max_value=2**64 - 1), max_size=60),
    st.sets(st.integers(min_value=0, max_value=2**64 - 1), max_size=60),
)
@settings(max_examples=60, deadline=None)
def test_hypothesis_scaled_jaccard_vs_set_oracle(sa, sb):
    a = mk(sa)
    b = mk(sb)
    inter = len(sa & sb)
    union = len(sa | sb)
    expect = inter / union if union else 0.0
    assert setops.jaccard(a, b) == pytest.approx(expect)


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=200),
)
@settings(max_examples=40, deadline=None)
def test_hypothesis_build_sketch_vs_dict_oracle(vals):
    p = SketchParams(ksize=4, scaled=0, num=10, track_abundance=True)
    mins, abunds, n = build_sketch(np.array(vals, dtype=np.uint64), p)
    from collections import Counter

    c = Counter(vals)
    expect = sorted(c)[:10]
    assert mins.tolist() == expect
    assert abunds.tolist() == [c[v] for v in expect]
    assert n == len(c)


def test_docsketcher_vectorized_perms_match_per_row_oracle(ray_session):
    """DocSketcher's per-seed reduceat perms + md5 must equal the per-row
    perm_minima / md5_of_mins oracle exactly (incl. empty-text rows)."""
    import numpy as np
    import pyarrow as pa

    from sourmash_ray.config import DEFAULT_CONFIG
    from sourmash_ray.functions.perm import perm_minima, perm_seeds
    from sourmash_ray.functions.sketch import md5_of_mins
    from sourmash_ray.pipelines.docops import DocSketcher

    texts = ["the quick brown fox jumps over the lazy dog " * 4,
             "", "   ", "unicode éàü ß text with repeats repeats " * 3,
             "short", "the quick brown fox jumps over the lazy dog " * 4]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    cfg = DEFAULT_CONFIG
    out = DocSketcher(cfg)(batch)
    seeds = perm_seeds(cfg.lsh.num_perm, cfg.sketch.seed)
    mins_col = out["mins"].combine_chunks()
    perms_col = out["perms"].combine_chunks()
    for i in range(len(texts)):
        mins = np.asarray(mins_col[i].as_py(), np.uint64)
        want_perms = perm_minima(mins, seeds)
        got_perms = np.asarray(perms_col[i].as_py(), np.uint64)
        assert np.array_equal(got_perms, want_perms), i
        assert out["md5"][i].as_py() == md5_of_mins(
            mins, cfg.sketch.ksize), i

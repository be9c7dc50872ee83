"""HyperLogLog kernel + dataset-level distinct operators.

Semantics mirror ``/root/reference/src/core/src/sketch/hyperloglog``
(register update, merge, Ertl MLE estimator); the dataset operators are
checked estimate-vs-exact on synthetic corpora."""
import numpy as np
import pyarrow as pa
import pytest

from sourmash_ray.functions.hll import (
    _clz64, hll_add_hashes, hll_cardinality, hll_counts, hll_empty,
    hll_error_rate, hll_merge, hll_mle, hll_p_for_error,
)
from sourmash_ray.functions.segscore import hash_strings_u64


def test_clz64():
    v = np.array([0, 1, 2, 3, 2 ** 63, 2 ** 64 - 1, 2 ** 32], np.uint64)
    exp = [64, 63, 62, 62, 0, 0, 31]
    assert _clz64(v).tolist() == exp


def test_p_for_error_matches_reference_formula():
    # mod.rs:41-44: ceil(log2((1.04/err)^2))
    assert hll_p_for_error(0.01) == 14
    assert hll_p_for_error(0.05) == 9
    assert hll_p_for_error(1.0) == 4   # clamped low
    assert hll_p_for_error(1e-9) == 18  # clamped high


def test_empty_and_saturated_registers():
    regs = hll_empty(10)
    assert hll_cardinality(regs) == 0
    sat = np.full(1 << 10, 55, np.uint8)  # q+1 for p=10 → infinity
    assert hll_mle(hll_counts(sat, 54), 10, 54) == float("inf")


def test_estimate_within_error_bound():
    rng = np.random.default_rng(11)
    for p, n in [(12, 1000), (14, 100_000)]:
        regs = hll_empty(p)
        h = np.unique(rng.integers(0, 2 ** 64, size=n, dtype=np.uint64))
        hll_add_hashes(regs, h)
        est = hll_cardinality(regs)
        # 5 sigma of the expected relative standard error
        assert abs(est - len(h)) / len(h) < 5 * hll_error_rate(p)


def test_merge_equals_single_pass_and_is_commutative():
    a, b = hll_empty(12), hll_empty(12)
    h1 = hash_strings_u64([f"tok{i}" for i in range(4000)])
    h2 = hash_strings_u64([f"tok{i}" for i in range(2000, 6000)])
    hll_add_hashes(a, h1)
    hll_add_hashes(b, h2)
    both = hll_empty(12)
    hll_add_hashes(both, np.concatenate([h1, h2]))
    assert np.array_equal(hll_merge(a, b), both)
    assert np.array_equal(hll_merge(a, b), hll_merge(b, a))
    with pytest.raises(ValueError):
        hll_merge(a, hll_empty(11))


def test_as_hll_sketch_bridge():
    from sourmash_ray.functions.setops import as_hll
    from sourmash_ray.functions.sketch import Sketch, SketchParams

    params = SketchParams(ksize=31, scaled=1, num=0, seed=42,
                          track_abundance=False, normalization="ws")
    rng = np.random.default_rng(3)
    mins = np.unique(rng.integers(0, 2 ** 64, size=5000, dtype=np.uint64))
    s = Sketch(mins=mins, abunds=None, params=params)
    regs = as_hll(s)
    assert regs.size == 1 << 14  # error_rate 0.01 → p=14
    est = hll_cardinality(regs)
    assert abs(est - len(mins)) / len(mins) < 5 * hll_error_rate(14)


def test_dataset_distinct_ops_estimate_vs_exact(ray_session):
    """approx_distinct (HLL combiner) vs distinct_count_exact (exchange)
    over a multi-block Dataset with a 8k-token vocabulary."""
    import ray.data

    from sourmash_ray.functions.sketch import WS_PATTERN
    from sourmash_ray.stages.approx import (
        approx_distinct, distinct_count_exact, tokens_of,
    )

    rng = np.random.default_rng(5)
    vocab = np.array([f"w{i:05d}" for i in range(8000)])
    docs = [" ".join(rng.choice(vocab, size=60)) for _ in range(3000)]
    used = sorted({t for d in docs for t in d.split()})
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })).repartition(8)

    fn = lambda b: tokens_of(b["text"].combine_chunks(), WS_PATTERN)
    exact = distinct_count_exact(ds, fn)
    assert exact == len(used)
    est = approx_distinct(ds, fn, p=14)
    assert abs(est - exact) / exact < 5 * hll_error_rate(14)


def test_union_similarity_containment_estimates():
    """HLL set-relationship estimates within 5% of exact on overlapping
    50k-element sets (mod.rs:109-136 API)."""
    from sourmash_ray.functions.hll import (
        hll_containment, hll_intersection, hll_similarity,
        hll_union_cardinality,
    )

    rng = np.random.default_rng(23)
    pool = rng.integers(0, 2 ** 64, size=80_000, dtype=np.uint64)
    A = np.unique(pool[:50_000])
    B = np.unique(pool[30_000:80_000])   # ~20k overlap
    a, b = hll_empty(14), hll_empty(14)
    hll_add_hashes(a, A)
    hll_add_hashes(b, B)
    exact_u = np.union1d(A, B).size
    exact_i = np.intersect1d(A, B).size
    assert abs(hll_union_cardinality(a, b) - exact_u) / exact_u < 0.05
    assert abs(hll_intersection(a, b) - exact_i) / exact_i < 0.05
    assert abs(hll_similarity(a, b) - exact_i / exact_u) < 0.05
    assert abs(hll_containment(a, b) - exact_i / A.size) < 0.05


def test_hll_joint_mle_moderate_overlap():
    """Joint MLE (Ertl §5): two 60k sets sharing 30k — all three
    components within 5%."""
    import numpy as np

    from sourmash_ray.functions.hll import (hll_add_hashes, hll_empty,
                                            hll_joint_mle)
    from sourmash_ray.functions.murmur import murmur64_fixedlen

    def hset(vals, p=14):
        r = hll_empty(p)
        b = vals.astype(np.uint64).view(np.uint8).reshape(-1, 8)
        hll_add_hashes(r, murmur64_fixedlen(
            np.ascontiguousarray(b), seed=42, length=8))
        return r

    rng = np.random.default_rng(11)
    common = rng.choice(2 ** 40, 30000, replace=False)
    a_only = rng.choice(2 ** 40, 30000, replace=False) + 2 ** 41
    b_only = rng.choice(2 ** 40, 30000, replace=False) + 2 ** 42
    A = hset(np.concatenate([common, a_only]))
    B = hset(np.concatenate([common, b_only]))
    oa, ob, inter = hll_joint_mle(A, B)
    assert abs(oa - 30000) / 30000 < 0.05
    assert abs(ob - 30000) / 30000 < 0.05
    assert abs(inter - 30000) / 30000 < 0.05


def test_hll_joint_union_consistent_with_merged_mle():
    """Union from the joint decomposition stays within 3% of the
    merged-register MLE (they estimate the same quantity)."""
    import numpy as np

    from sourmash_ray.functions.hll import (hll_add_hashes,
                                            hll_cardinality, hll_empty,
                                            hll_merge,
                                            hll_union_cardinality)
    from sourmash_ray.functions.murmur import murmur64_fixedlen

    def hset(vals, p=12):
        r = hll_empty(p)
        b = vals.astype(np.uint64).view(np.uint8).reshape(-1, 8)
        hll_add_hashes(r, murmur64_fixedlen(
            np.ascontiguousarray(b), seed=42, length=8))
        return r

    rng = np.random.default_rng(23)
    A = hset(rng.choice(2 ** 40, 50000, replace=False))
    B = hset(rng.choice(2 ** 40, 20000, replace=False) + 2 ** 41)
    ju = hll_union_cardinality(A, B)
    mu = hll_cardinality(hll_merge(A, B))
    assert abs(ju - mu) / mu < 0.03


def test_hll_joint_disjoint_and_identical():
    import numpy as np

    from sourmash_ray.functions.hll import (hll_add_hashes, hll_empty,
                                            hll_containment,
                                            hll_joint_mle, hll_similarity)
    from sourmash_ray.functions.murmur import murmur64_fixedlen

    def hset(vals, p=12):
        r = hll_empty(p)
        b = vals.astype(np.uint64).view(np.uint8).reshape(-1, 8)
        hll_add_hashes(r, murmur64_fixedlen(
            np.ascontiguousarray(b), seed=42, length=8))
        return r

    rng = np.random.default_rng(31)
    vals = rng.choice(2 ** 40, 40000, replace=False)
    A = hset(vals)
    assert hll_similarity(A, A) == 1.0
    assert hll_containment(A, A) == 1.0
    oa, ob, inter = hll_joint_mle(A, A)
    assert oa == 0 and ob == 0
    assert abs(inter - 40000) / 40000 < 0.05
    B = hset(rng.choice(2 ** 40, 40000, replace=False) + 2 ** 41)
    sim = hll_similarity(A, B)
    assert sim < 0.01

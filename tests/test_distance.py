"""Parity tests for functions/distance.py against the reference's own
expected values (``/root/reference/tests/test_distance_utils.py``) — the
numeric targets there were produced by scipy / Mathematica, so matching
them validates the scipy-free probit/brentq/binom_cdf replacements."""
import math

import numpy as np
import pytest

from sourmash_ray.functions.distance import (
    ANIResult, ciANIResult, jaccardANIResult,
    binom_cdf, brentq, containment_ani_arrays, containment_to_distance,
    jaccard_to_distance, probit, set_size_chernoff, set_size_exact_prob,
)

REL = 1e-9


def test_probit_matches_scipy_values():
    # scipy.stats.norm.ppf reference values
    assert probit(0.975) == pytest.approx(1.959963984540054, rel=1e-12)
    assert probit(0.5) == 0.0
    assert probit(0.025) == pytest.approx(-1.959963984540054, rel=1e-12)
    assert probit(1e-10) == pytest.approx(-6.361340902404056, rel=1e-9)
    assert probit(0.99) == pytest.approx(2.3263478740408408, rel=1e-12)


def test_brentq_simple_roots():
    assert brentq(lambda x: x ** 2 - 2, 0, 2) == pytest.approx(
        math.sqrt(2), rel=1e-12)
    assert brentq(lambda x: math.cos(x) - x, 0, 1) == pytest.approx(
        0.7390851332151607, rel=1e-12)
    with pytest.raises(ValueError):
        brentq(lambda x: x ** 2 + 1, -1, 1)


def test_binom_cdf_exact_small():
    # sum of pmf for n=10, p=0.3, k<=3 = 0.6496107184
    assert binom_cdf(3, 10, 0.3) == pytest.approx(0.6496107184, rel=1e-9)
    assert binom_cdf(-1, 10, 0.3) == 0.0
    assert binom_cdf(10, 10, 0.3) == 1.0
    # large-n underflow safety: pmf(0) underflows double, cdf must not
    assert 0.0 < binom_cdf(900, 10 ** 6, 1e-3) < 1.0


def test_aniresult_flags():
    # test_distance_utils.py:21-32
    res = ANIResult(0.4, 0.1)
    assert res.dist == 0.4 and res.ani == 0.6
    assert res.p_exceeds_threshold is True
    assert ANIResult(0.4, 0.0001).p_exceeds_threshold is False
    with pytest.raises(ValueError):
        ANIResult(1.1, 0.1)


def test_jaccard_aniresult_withholds_ani():
    # test_distance_utils.py:49-59
    res = jaccardANIResult(0.4, 0.1, jaccard_error=0.03)
    assert res.ani is None and res.je_exceeds_threshold is True
    res3 = jaccardANIResult(0.4, 0.1, jaccard_error=0.00001)
    assert res3.je_exceeds_threshold is False and res3.ani == 0.6
    with pytest.raises(ValueError):
        jaccardANIResult(0.4, 0.1)


def test_ci_aniresult_bounds():
    # test_distance_utils.py:70-77
    res = ciANIResult(0.4, 0.1, dist_low=0.3, dist_high=0.5)
    assert res.ani == 0.6 and res.ani_low == 0.5 and res.ani_high == 0.7


def test_containment_to_distance_zero_and_one():
    # test_distance_utils.py:84-141
    res = containment_to_distance(0, 21, 1, n_unique_kmers=10000,
                                  estimate_ci=True)
    assert (res.dist, res.dist_low, res.dist_high,
            res.p_nothing_in_common) == (1.0, 1.0, 1.0, 1.0)
    res = containment_to_distance(1, 21, 1, n_unique_kmers=10000,
                                  estimate_ci=True)
    assert (res.dist, res.ani, res.p_nothing_in_common) == (0.0, 1.0, 0.0)
    assert res.ani_low == 1.0 and res.ani_high == 1.0


def test_containment_to_distance_scaled1():
    # test_distance_utils.py:144-160 (scipy-produced doubles)
    res = containment_to_distance(0.5, 21, 1, n_unique_kmers=10000,
                                  estimate_ci=True)
    assert res.dist == pytest.approx(0.032468221476108394, rel=REL)
    assert res.dist_low == pytest.approx(0.028709912966405623, rel=1e-7)
    assert res.dist_high == pytest.approx(0.03647860197289783, rel=1e-7)
    assert res.p_nothing_in_common == 0.0


def test_containment_to_distance_scaled100():
    # test_distance_utils.py:175-189
    res = containment_to_distance(0.1, 31, 100, n_unique_kmers=10000,
                                  estimate_ci=True)
    assert res.dist == pytest.approx(0.07158545548052564, rel=REL)
    assert res.dist_low == pytest.approx(0.05320779238601372, rel=1e-7)
    assert res.dist_high == pytest.approx(0.09055547672455365, rel=1e-7)
    assert res.p_nothing_in_common == pytest.approx(4.3171247410658655e-05,
                                                   rel=1e-9)
    assert res.p_exceeds_threshold is False


def test_containment_to_distance_k10():
    # test_distance_utils.py:208-221
    res = containment_to_distance(0.5, 10, 100, n_unique_kmers=10000,
                                  estimate_ci=True)
    assert res.dist == pytest.approx(0.06696700846319259, rel=REL)
    assert res.dist_low == pytest.approx(0.04982777541057476, rel=1e-7)
    assert res.dist_high == pytest.approx(0.08745108232411622, rel=1e-7)


def test_containment_to_distance_confidence99():
    # test_distance_utils.py:224-243 (confidence=0.99)
    res = containment_to_distance(0.1, 31, 100, confidence=0.99,
                                  n_unique_kmers=10000, estimate_ci=True)
    assert res.dist == pytest.approx(0.07158545548052564, rel=REL)
    assert res.dist_low == pytest.approx(0.04802880300938562, rel=1e-7)
    assert res.dist_high == pytest.approx(0.09619930040790341, rel=1e-7)


def test_jaccard_to_distance_edges_and_error():
    # test_distance_utils.py:294-340
    res = jaccard_to_distance(0, 21, 1, n_unique_kmers=10000)
    assert (res.dist, res.ani, res.p_nothing_in_common,
            res.jaccard_error) == (1.0, 0.0, 1.0, 0.0)
    res = jaccard_to_distance(1, 21, 1, n_unique_kmers=10000)
    assert (res.dist, res.ani, res.p_nothing_in_common,
            res.jaccard_error) == (0.0, 1.0, 0.0, 0.0)
    res = jaccard_to_distance(0.5, 21, 1, n_unique_kmers=10000)
    assert res.dist == pytest.approx(0.019122659390482077, rel=REL)
    assert res.jaccard_error == pytest.approx(0.00018351337045518042, rel=REL)
    assert res.je_exceeds_threshold is True and res.ani is None
    # scaled does not change point estimate / error
    res2 = jaccard_to_distance(0.5, 21, 100, n_unique_kmers=10000)
    assert res2.dist == res.dist and res2.jaccard_error == res.jaccard_error


def test_set_size_chernoff_mathematica():
    # test_distance_utils.py:476-512 (Mathematica values)
    assert set_size_chernoff(1000000, 10, relative_error=0.01) == \
        pytest.approx(0.928652, abs=1e-6)
    assert set_size_chernoff(10000, 1, relative_error=0.05) == \
        pytest.approx(0.999519, abs=1e-6)
    assert set_size_chernoff(10, 100, relative_error=0.001) == \
        pytest.approx(-1, abs=1e-6)


def test_set_size_exact_prob_mathematica():
    # test_distance_utils.py:515-545 (Mathematica values)
    assert set_size_exact_prob(100, 2, relative_error=0.05) == \
        pytest.approx(0.382701, abs=1e-3)
    assert set_size_exact_prob(200, 5, relative_error=0.15) == \
        pytest.approx(0.749858, abs=1e-3)
    assert set_size_exact_prob(10, 10, relative_error=0.10) == \
        pytest.approx(0.38742, abs=1e-3)
    assert set_size_exact_prob(1000, 10, relative_error=0.10) == \
        pytest.approx(0.73182, abs=1e-3)


def test_containment_ani_arrays_matches_scalar():
    c = np.array([0.0, 0.1, 0.5, 0.9, 1.0])
    L = np.full(5, 10000.0)
    out = containment_ani_arrays(c, 31, 100, L)
    for i, cv in enumerate(c):
        scalar = containment_to_distance(float(cv), 31, 100,
                                         n_unique_kmers=10000)
        assert out["ani"][i] == pytest.approx(1 - scalar.dist, rel=1e-12)
        assert out["p_nothing_in_common"][i] == pytest.approx(
            scalar.p_nothing_in_common, rel=1e-9)

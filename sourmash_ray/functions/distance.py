"""ANI / evolutionary-distance estimation from containment and jaccard.

Reimplements the semantics of the reference's ``distance_utils.py`` (all
citations are ``/root/reference/src/sourmash/distance_utils.py`` unless
noted) — point estimates, confidence intervals via a root solve on the
variance-corrected containment equation, the probability that two sketches
share nothing by chance, and sketch-size accuracy bounds — WITHOUT scipy
(not in this container):

* ``probit``     — Acklam's rational approximation to the inverse normal
                   CDF, refined to machine precision with two Newton steps
                   against ``math.erfc`` (public algorithm, Acklam 2003).
* ``brentq``     — classic Brent root finder (inverse quadratic + secant +
                   bisection; Brent 1973 / Numerical Recipes ch. 9.3).
* ``binom_cdf``  — log-space summation with a cumulative log-binomial
                   recurrence + logsumexp (exact, underflow-safe).

Equations follow the mutation-rate interval model of
Blanca et al. / Koslicki Lab (doi:10.1101/2022.01.11.475870), as used by
``distance_utils.py:128-180`` (moments of N_mutated) and ``:258-343``
(containment CI root functions).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "ANIResult", "jaccardANIResult", "ciANIResult",
    "probit", "brentq", "binom_cdf",
    "r1_to_q", "exp_n_mutated", "var_n_mutated", "exp_n_mutated_squared",
    "handle_seqlen_nkmers", "set_size_chernoff", "set_size_exact_prob",
    "get_exp_probability_nothing_common",
    "containment_to_distance", "jaccard_to_distance",
    "containment_ani_arrays",
]


# ---------------------------------------------------------------------------
# numerics: inverse normal CDF, Brent root finder, binomial CDF
# ---------------------------------------------------------------------------

# Acklam coefficients for the rational initial guess.
_ACKLAM_A = (-3.969683028665376e+01, 2.209460984245205e+02,
             -2.759285104469687e+02, 1.383577518672690e+02,
             -3.066479806614716e+01, 2.506628277459239e+00)
_ACKLAM_B = (-5.447609879822406e+01, 1.615858368580409e+02,
             -1.556989798598866e+02, 6.680131188771972e+01,
             -1.328068155288572e+01)
_ACKLAM_C = (-7.784894002430293e-03, -3.223964580411365e-01,
             -2.400758277161838e+00, -2.549732539343734e+00,
             4.374664141464968e+00, 2.938163982698783e+00)
_ACKLAM_D = (7.784695709041462e-03, 3.224671290700398e-01,
             2.445134137142996e+00, 3.754408661907416e+00)


def _norm_cdf(x: float) -> float:
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def _norm_pdf(x: float) -> float:
    return math.exp(-0.5 * x * x) / math.sqrt(2.0 * math.pi)


def probit(p: float) -> float:
    """Inverse standard-normal CDF (replaces ``scipy_norm.ppf``,
    ``distance_utils.py:163-164``). Acklam seed + 2 Newton refinements
    → agrees with scipy to ~1 ulp over (0, 1)."""
    if not 0.0 < p < 1.0:
        if p == 0.0:
            return -math.inf
        if p == 1.0:
            return math.inf
        raise ValueError(f"probit domain error: {p}")
    a, b, c, d = _ACKLAM_A, _ACKLAM_B, _ACKLAM_C, _ACKLAM_D
    p_low, p_high = 0.02425, 1 - 0.02425
    if p < p_low:
        q = math.sqrt(-2 * math.log(p))
        x = ((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
              + c[5])
             / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    elif p <= p_high:
        q = p - 0.5
        r = q * q
        x = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r
              + a[5]) * q
             / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r
                + 1))
    else:
        q = math.sqrt(-2 * math.log1p(-p))
        x = -((((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
               + c[5])
              / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1))
    for _ in range(2):  # Newton: x -= (Phi(x) - p) / phi(x)
        pdf = _norm_pdf(x)
        if pdf <= 0.0:
            break
        x -= (_norm_cdf(x) - p) / pdf
    return x


def brentq(f, a: float, b: float, xtol: float = 2e-12,
           rtol: float = 8.881784197001252e-16, maxiter: int = 100) -> float:
    """Brent's root finder on [a, b]; drop-in for ``scipy.optimize.brentq``
    as used at ``distance_utils.py:330-331``. Raises ValueError when the
    bracket does not change sign (same contract scipy gives the reference's
    try/except)."""
    fa, fb = f(a), f(b)
    if fa == 0.0:
        return a
    if fb == 0.0:
        return b
    if fa * fb > 0:
        raise ValueError("f(a) and f(b) must have different signs")
    c, fc = a, fa
    d = e = b - a
    for _ in range(maxiter):
        if fb * fc > 0:
            c, fc = a, fa
            d = e = b - a
        if abs(fc) < abs(fb):
            a, b, c = b, c, b
            fa, fb, fc = fb, fc, fb
        tol1 = 2.0 * rtol * abs(b) + 0.5 * xtol
        xm = 0.5 * (c - b)
        if abs(xm) <= tol1 or fb == 0.0:
            return b
        if abs(e) >= tol1 and abs(fa) > abs(fb):
            s = fb / fa
            if a == c:
                p = 2.0 * xm * s
                q = 1.0 - s
            else:
                q = fa / fc
                r = fb / fc
                p = s * (2.0 * xm * q * (q - r) - (b - a) * (r - 1.0))
                q = (q - 1.0) * (r - 1.0) * (s - 1.0)
            if p > 0:
                q = -q
            p = abs(p)
            if 2.0 * p < min(3.0 * xm * q - abs(tol1 * q), abs(e * q)):
                e, d = d, p / q
            else:
                d = xm
                e = d
        else:
            d = xm
            e = d
        a, fa = b, fb
        b += d if abs(d) > tol1 else math.copysign(tol1, xm)
        fb = f(b)
    return b


def binom_cdf(x: float, n: int, p: float) -> float:
    """P(X <= floor(x)) for X ~ Binomial(n, p); replaces ``binom.cdf``
    (``distance_utils.py:204-219``). Log-space cumulative-binomial
    recurrence + logsumexp: exact and underflow-safe for n up to ~1e7."""
    if x < 0:
        return 0.0
    k = int(math.floor(x))
    if k >= n:
        return 1.0
    if p <= 0.0:
        return 1.0
    if p >= 1.0:
        return 0.0
    i = np.arange(0, k + 1, dtype=np.float64)
    # log C(n, i) built cumulatively: logC(n,i) = logC(n,i-1)+log(n-i+1)-log(i)
    with np.errstate(divide="ignore"):
        steps = np.log(n - i + 1) - np.log(i)
    steps[0] = 0.0
    log_comb = np.cumsum(steps)
    log_pmf = log_comb + i * math.log(p) + (n - i) * math.log1p(-p)
    m = log_pmf.max()
    return float(min(1.0, math.exp(m) * np.exp(log_pmf - m).sum()))


def binom_pmf(k: float, n: int, p: float) -> float:
    """P(X == k); replaces ``binom.pmf`` (``distance_utils.py:211``)."""
    if k != int(k) or k < 0 or k > n:
        return 0.0
    k = int(k)
    log_comb = (math.lgamma(n + 1) - math.lgamma(k + 1)
                - math.lgamma(n - k + 1))
    return math.exp(log_comb + k * math.log(p) + (n - k) * math.log1p(-p))


# ---------------------------------------------------------------------------
# mutation-model moments (distance_utils.py:127-160)
# ---------------------------------------------------------------------------


def r1_to_q(k: int, r1: float) -> float:
    """``distance_utils.py:127-130``: q = 1 - (1-r1)^k."""
    return float(1.0 - (1.0 - float(r1)) ** k)


def exp_n_mutated(L: float, k: int, r1: float) -> float:
    """``distance_utils.py:154-156``: E[N_mut] = L * q."""
    return L * r1_to_q(k, r1)


def var_n_mutated(L: float, k: int, r1: float, *, q=None) -> float:
    """``distance_utils.py:133-151``: Var[N_mut] under the simple mutation
    model. Raises on the (tiny-data-only) negative-variance pathology just
    like the reference."""
    if r1 == 0:
        return 0.0
    r1 = float(r1)
    if q is None:
        q = r1_to_q(k, r1)
    varN = (L * (1 - q) * (q * (2 * k + (2 / r1) - 1) - 2 * k)
            + k * (k - 1) * (1 - q) ** 2
            + (2 * (1 - q) / (r1 ** 2)) * ((1 + (k - 1) * (1 - q)) * r1 - q))
    if varN < 0.0:
        raise ValueError(f"mutation-count variance came out negative ({varN}) — parameters out of model range")
    return float(varN)


def exp_n_mutated_squared(L: float, k: int, p: float) -> float:
    """``distance_utils.py:159-160``: E[N²] = Var + E²."""
    return var_n_mutated(L, k, p) + exp_n_mutated(L, k, p) ** 2


def handle_seqlen_nkmers(ksize: int, *, sequence_len_bp=None,
                         n_unique_kmers=None) -> float:
    """``distance_utils.py:167-177``."""
    if n_unique_kmers is not None:
        return n_unique_kmers
    if sequence_len_bp is None:
        raise ValueError(
            "need one of sequence_len_bp or n_unique_kmers to "
            "estimate distance")
    return sequence_len_bp - (ksize - 1)


# ---------------------------------------------------------------------------
# sketch-size accuracy (distance_utils.py:181-219)
# ---------------------------------------------------------------------------


def set_size_chernoff(set_size: float, scaled: float, *,
                      relative_error: float = 0.05) -> float:
    """Two-sided Chernoff lower bound on P(|est - true|/true <= rel_err)
    (``distance_utils.py:181-193``)."""
    return 1 - 2 * math.exp(-(relative_error ** 2) * set_size / (scaled * 3))


def set_size_exact_prob(set_size: float, scaled: float, *,
                        relative_error: float = 0.05) -> float:
    """Exact binomial-CDF version (``distance_utils.py:196-219``):
    P(|X*scaled - n| / n <= rel_err), X ~ Binom(n, 1/scaled)."""
    hi = set_size / scaled * (relative_error + 1)
    lo = -set_size / scaled * (relative_error - 1)
    prob = binom_cdf(hi, int(set_size), 1.0 / scaled) \
        - binom_cdf(lo, int(set_size), 1.0 / scaled)
    if lo == int(lo):
        # the reference re-adds the lower edge pmf when it is integral
        prob += binom_pmf(lo, int(set_size), 1.0 / scaled)
    return prob


# ---------------------------------------------------------------------------
# probability of sharing nothing (distance_utils.py:222-253)
# ---------------------------------------------------------------------------


def get_expected_log_probability(n_unique_kmers: float, ksize: int,
                                 mutation_rate: float,
                                 scaled_fraction: float) -> float:
    """``distance_utils.py:222-231``."""
    exp_nmut = exp_n_mutated(n_unique_kmers, ksize, mutation_rate)
    try:
        return (n_unique_kmers - exp_nmut) * math.log(1.0 - scaled_fraction)
    except ValueError:
        return float("-inf")


def get_exp_probability_nothing_common(
        mutation_rate: float, ksize: int, scaled: float, *,
        n_unique_kmers=None, sequence_len_bp=None) -> float:
    """``distance_utils.py:234-253``: expected probability that two
    FracMinHash sketches of a sequence and its mutated copy share no
    hashes at all."""
    n_unique_kmers = handle_seqlen_nkmers(
        ksize, sequence_len_bp=sequence_len_bp, n_unique_kmers=n_unique_kmers)
    f_scaled = 1.0 / float(scaled)
    if mutation_rate == 1.0:
        return 1.0
    if mutation_rate == 0.0:
        return 0.0
    return math.exp(get_expected_log_probability(
        n_unique_kmers, ksize, mutation_rate, f_scaled))


# ---------------------------------------------------------------------------
# result objects (distance_utils.py:43-124)
# ---------------------------------------------------------------------------


def _check_distance(dist: float) -> float:
    if not 0 <= dist <= 1:
        raise ValueError(
            f"distance {dist:.4f} outside the unit interval")
    return dist


@dataclass
class ANIResult:
    """``distance_utils.py:43-67``: distance + p_nothing_in_common with a
    false-negative threshold flag."""

    dist: float
    p_nothing_in_common: float
    p_threshold: float = 1e-3
    size_is_inaccurate: bool = False
    p_exceeds_threshold: bool = field(init=False)

    def __post_init__(self):
        self.dist = _check_distance(self.dist)
        self.p_exceeds_threshold = (self.p_threshold is not None
                                    and self.p_nothing_in_common
                                    > self.p_threshold)

    @property
    def ani(self):
        if self.size_is_inaccurate:
            return None
        return 1 - self.dist


@dataclass
class jaccardANIResult(ANIResult):
    """``distance_utils.py:70-95``: adds the jaccard-approximation error;
    the ANI estimate is withheld when that error exceeds its threshold."""

    jaccard_error: float = None
    je_threshold: float = 1e-4

    def __post_init__(self):
        super().__post_init__()
        if self.jaccard_error is None:
            raise ValueError("jaccardANIResult requires a jaccard_error value")
        self.je_exceeds_threshold = (self.je_threshold is not None
                                     and self.jaccard_error
                                     > self.je_threshold)

    @property
    def ani(self):
        if self.je_exceeds_threshold or self.size_is_inaccurate:
            return None
        return 1 - self.dist


@dataclass
class ciANIResult(ANIResult):
    """``distance_utils.py:98-124``: distance with confidence interval."""

    dist_low: float = None
    dist_high: float = None

    def __post_init__(self):
        super().__post_init__()
        if self.dist_low is not None and self.dist_high is not None:
            self.dist_low = _check_distance(self.dist_low)
            self.dist_high = _check_distance(self.dist_high)

    @property
    def ani_low(self):
        if self.dist_high is None or self.size_is_inaccurate:
            return None
        return 1 - self.dist_high

    @property
    def ani_high(self):
        if self.dist_low is None or self.size_is_inaccurate:
            return None
        return 1 - self.dist_low


# ---------------------------------------------------------------------------
# containment / jaccard --> distance (distance_utils.py:256-407)
# ---------------------------------------------------------------------------


def containment_to_distance(
        containment: float, ksize: int, scaled: float, *,
        n_unique_kmers=None, sequence_len_bp=None, confidence: float = 0.95,
        estimate_ci: bool = False, prob_threshold: float = 1e-3,
) -> ciANIResult:
    """``distance_utils.py:256-343``: point estimate
    dist = 1 - containment^(1/k), with optional CI from a Brent solve on
    containment = (1-p)^k ± z·sqrt(Var_direct(p))."""
    sol1 = sol2 = None
    n_unique_kmers = handle_seqlen_nkmers(
        ksize, sequence_len_bp=sequence_len_bp, n_unique_kmers=n_unique_kmers)
    if containment == 0:
        point_estimate = sol1 = sol2 = 1.0
    elif containment == 1:
        point_estimate = sol1 = sol2 = 0.0
    else:
        point_estimate = 1.0 - containment ** (1.0 / ksize)
        if estimate_ci:
            try:
                alpha = 1 - confidence
                z_alpha = probit(1 - alpha / 2)
                f_scaled = 1.0 / scaled
                bias_factor = 1 - (1 - f_scaled) ** n_unique_kmers
                term_1 = ((1.0 - f_scaled)
                          / (f_scaled * n_unique_kmers ** 3 * bias_factor ** 2))

                def var_direct(pest):
                    t2 = (n_unique_kmers
                          * exp_n_mutated(n_unique_kmers, ksize, pest)
                          - exp_n_mutated_squared(n_unique_kmers, ksize, pest))
                    t3 = (var_n_mutated(n_unique_kmers, ksize, pest)
                          / n_unique_kmers ** 2)
                    return term_1 * t2 + t3

                def f1(pest):
                    return ((1 - pest) ** ksize
                            + z_alpha * math.sqrt(var_direct(pest))
                            - containment)

                def f2(pest):
                    return ((1 - pest) ** ksize
                            - z_alpha * math.sqrt(var_direct(pest))
                            - containment)

                sol1 = brentq(f1, 0.0000001, 0.9999999)
                sol2 = brentq(f2, 0.0000001, 0.9999999)
            except ValueError:
                # extremely small sketches: CI unavailable (reference warns
                # and returns None bounds, distance_utils.py:333-338)
                sol1 = sol2 = None

    prob_nothing_in_common = get_exp_probability_nothing_common(
        point_estimate, ksize, scaled, n_unique_kmers=n_unique_kmers)
    return ciANIResult(point_estimate, prob_nothing_in_common,
                       dist_low=sol2, dist_high=sol1,
                       p_threshold=prob_threshold)


def jaccard_to_distance(
        jaccard: float, ksize: int, scaled: float, *,
        n_unique_kmers=None, sequence_len_bp=None,
        prob_threshold: float = 1e-3, err_threshold: float = 1e-4,
) -> jaccardANIResult:
    """``distance_utils.py:346-407``: point estimate
    dist = 1 - (2j/(1+j))^(1/k) plus the approximation-error lower bound."""
    n_unique_kmers = handle_seqlen_nkmers(
        ksize, sequence_len_bp=sequence_len_bp, n_unique_kmers=n_unique_kmers)
    if jaccard == 0:
        point_estimate, error_lower_bound = 1.0, 0.0
    elif jaccard == 1:
        point_estimate, error_lower_bound = 0.0, 0.0
    else:
        point_estimate = 1.0 - (2.0 * jaccard / (1 + jaccard)) ** (1.0 / ksize)
        exp_n_mut = exp_n_mutated(n_unique_kmers, ksize, point_estimate)
        var_n_mut = var_n_mutated(n_unique_kmers, ksize, point_estimate)
        error_lower_bound = (1.0 * n_unique_kmers * var_n_mut
                             / (n_unique_kmers + exp_n_mut) ** 3)
    prob_nothing_in_common = get_exp_probability_nothing_common(
        point_estimate, ksize, scaled, n_unique_kmers=n_unique_kmers)
    return jaccardANIResult(point_estimate, prob_nothing_in_common,
                            jaccard_error=error_lower_bound,
                            p_threshold=prob_threshold,
                            je_threshold=err_threshold)


# ---------------------------------------------------------------------------
# vectorized batch helper for pipeline columns
# ---------------------------------------------------------------------------


def containment_ani_arrays(containment: np.ndarray, ksize: int,
                           scaled: float, n_unique_kmers: np.ndarray,
                           ) -> dict:
    """Vectorized point-estimate ANI + p_nothing_in_common over a batch of
    (containment, set-size) pairs — the per-row columns gather/search emit
    (reference ``search.py:553-664`` ANI fields). CIs need a per-row root
    solve, so they stay scalar (``containment_to_distance(estimate_ci=True)``)
    for the small result tables where they're requested."""
    c = np.asarray(containment, dtype=np.float64)
    L = np.asarray(n_unique_kmers, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        dist = 1.0 - np.power(np.clip(c, 0.0, 1.0), 1.0 / ksize)
    dist = np.where(c <= 0, 1.0, np.where(c >= 1, 0.0, dist))
    # p_nothing_in_common = exp((L - L*q) * log(1 - 1/scaled))
    q = 1.0 - np.power(1.0 - dist, ksize)
    log1m = math.log1p(-1.0 / scaled) if scaled > 1 else -np.inf
    with np.errstate(invalid="ignore"):
        pnc = np.exp((L - L * q) * log1m)
    pnc = np.where(dist >= 1.0, 1.0, np.where(dist <= 0.0, 0.0, pnc))
    return {"ani": 1.0 - dist, "p_nothing_in_common": pnc}

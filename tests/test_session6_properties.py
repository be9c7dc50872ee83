"""Property tests (hypothesis) for the session-6 kernel math, checked
against DuckDB on randomized inputs — ties, zeros, and negative values
are exactly where cross-engine integer contracts break."""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.lists(st.integers(min_value=1, max_value=10 ** 14),
                min_size=1, max_size=200))
@settings(max_examples=60, deadline=None)
def test_benford_first_digit_division_equals_string_head(vals):
    """Repeated integer division == first character of the decimal
    string, for any positive int64 (the Benford kernel's claim)."""
    c = np.array(vals, np.int64)
    while np.any(c >= 10):
        c = np.where(c >= 10, c // 10, c)
    assert c.tolist() == [int(str(v)[0]) for v in vals]


@given(st.lists(st.integers(min_value=0, max_value=10 ** 13),
                min_size=1, max_size=120))
@settings(max_examples=60, deadline=None)
def test_magnitude_searchsorted_equals_digit_count(vals):
    """searchsorted against powers of ten == len(str(x)) for any
    non-negative int64 (the magnitude-histogram kernel's claim)."""
    pow10 = np.array([10 ** k for k in range(1, 19)], np.int64)
    c = np.array(vals, np.int64)
    mag = np.searchsorted(pow10, c, side="right") + 1
    assert mag.tolist() == [len(str(v)) for v in vals]


@given(st.lists(st.integers(min_value=0, max_value=10 ** 6),
                min_size=1, max_size=80))
@settings(max_examples=40, deadline=None)
def test_gini_rank_formula_equals_pairwise_identity(vals):
    """2·Σ(rank·x₍ᵢ₎) − (n+1)·Σx over n·Σx equals the mean-absolute-
    difference Gini Σ|xi−xj| / (2·n·Σx) for any non-negative ints —
    including heavy ties and zeros (the length_gini kernel's claim)."""
    x = np.sort(np.array(vals, np.int64))
    n = len(x)
    rank = np.arange(1, n + 1, dtype=np.int64)
    num = 2 * int(np.sum(rank * x)) - (n + 1) * int(np.sum(x))
    den = n * int(np.sum(x))
    mad = sum(abs(int(a) - int(b)) for a in vals for b in vals)
    # num/den == mad/(2·n·Σx) and den == n·Σx, so the identity
    # collapses to mad == 2·num (holds for den == 0 too: both are 0)
    assert mad == 2 * num
    assert 0 <= num <= den  # G ∈ [0, 1)  (num == den only if Σx>0 & n→∞)


@given(st.lists(st.tuples(st.integers(0, 50),
                          st.integers(0, 10 ** 6)),
                min_size=1, max_size=100, unique_by=lambda t: t[0]))
@settings(max_examples=40, deadline=None)
def test_ntile_cut_matches_duckdb(rows):
    """The driver-side decile cut (sizes n//k with the first n%k
    buckets taking the extra row, over the (value desc, id asc) order)
    is exactly SQL ntile(10) — ties and tiny n included (the
    user_value_deciles / type_mix cut)."""
    uid = np.array([r[0] for r in rows], np.int64)
    val = np.array([r[1] for r in rows], np.int64)
    order = np.lexsort((uid, -val))
    n = len(rows)
    sizes = np.full(10, n // 10, np.int64)
    sizes[: n % 10] += 1
    tile_of = np.repeat(np.arange(1, 11, dtype=np.int64), sizes)
    mine = dict(zip(uid[order].tolist(), tile_of.tolist()))
    con = duckdb.connect()
    con.sql("CREATE TABLE t (id BIGINT, v BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(con.sql(
        "SELECT id, ntile(10) OVER (ORDER BY v DESC, id) FROM t"
    ).fetchall())
    assert mine == want


@given(st.integers(min_value=1, max_value=40))
@settings(max_examples=40, deadline=None)
def test_linenumber_moment_fingerprint_is_sound(n):
    """Soundness direction of the order_linenumber_integrity test:
    every true permutation of 1..n passes the (count, Σ, Σ²)
    fingerprint. (Completeness is explicitly NOT claimed — the
    docstring documents that adversarial multisets matching both
    moments would pass.)"""
    ln = np.random.permutation(np.arange(1, n + 1)).astype(np.int64)
    s, s2 = int(ln.sum()), int((ln * ln).sum())
    assert 2 * s == n * (n + 1)
    assert 6 * s2 == n * (n + 1) * (2 * n + 1)

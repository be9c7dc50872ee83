"""Distributed hash join on the exchange — semantics vs an in-memory
pyarrow join oracle."""
from __future__ import annotations

import pyarrow as pa
import ray.data

from sourmash_ray.stages.join import hash_join_exchange


def _sorted(rows):
    return sorted(rows, key=lambda r: tuple(
        (v is None, v) for v in r.values()))


def test_inner_join_with_duplicates(ray_session):
    left = ray.data.from_arrow(pa.table({
        "k": [1, 1, 2, 3, 7], "lv": ["a", "b", "c", "d", "e"]}))
    right = ray.data.from_arrow(pa.table({
        "k": [1, 2, 2, 9], "rv": [10, 20, 21, 90]}))
    out = hash_join_exchange(left, right, "k", ["lv"], ["rv"],
                             n_parts=4).take_all()
    # duplicates cross-product: k=1 → 2×1 rows, k=2 → 1×2 rows
    expect = [
        {"k": 1, "lv": "a", "rv": 10}, {"k": 1, "lv": "b", "rv": 10},
        {"k": 2, "lv": "c", "rv": 20}, {"k": 2, "lv": "c", "rv": 21},
    ]
    assert _sorted(out) == _sorted(expect)


def test_left_outer_join(ray_session):
    left = ray.data.from_arrow(pa.table({"k": [1, 2], "lv": ["a", "b"]}))
    right = ray.data.from_arrow(pa.table({"k": [2], "rv": [20]}))
    out = hash_join_exchange(left, right, "k", ["lv"], ["rv"],
                             n_parts=4, join_type="left outer").take_all()
    assert _sorted(out) == _sorted([
        {"k": 1, "lv": "a", "rv": None},
        {"k": 2, "lv": "b", "rv": 20},
    ])


def test_differing_key_names(ray_session):
    left = ray.data.from_arrow(pa.table({"o_custkey": [5, 6],
                                         "o_orderkey": [100, 101]}))
    right = ray.data.from_arrow(pa.table({"c_custkey": [6],
                                          "c_nationkey": [3]}))
    out = hash_join_exchange(
        left, right, key="custkey", left_cols=["o_orderkey"],
        right_cols=["c_nationkey"], n_parts=2,
        left_key="o_custkey", right_key="c_custkey").take_all()
    assert out == [{"custkey": 6, "o_orderkey": 101, "c_nationkey": 3}]


def test_disjoint_sides_empty_result(ray_session):
    left = ray.data.from_arrow(pa.table({"k": [1, 2], "lv": [1.0, 2.0]}))
    right = ray.data.from_arrow(pa.table({"k": [3, 4], "rv": [3, 4]}))
    out = hash_join_exchange(left, right, "k", ["lv"], ["rv"],
                             n_parts=8).take_all()
    assert out == []


def test_semi_anti_join(ray_session):
    """Semi keeps matched left rows once (no dup multiplication from a
    duplicated right side); anti keeps the complement; neither emits
    right payload columns."""
    left = ray.data.from_arrow(pa.table({
        "k": [1, 1, 2, 3, 7], "lv": ["a", "b", "c", "d", "e"]}))
    right = ray.data.from_arrow(pa.table({
        "k": [1, 2, 2, 9], "rv": [10, 20, 21, 90]}))
    semi = hash_join_exchange(left, right, "k", ["lv"], [],
                              n_parts=4, join_type="left semi").take_all()
    assert _sorted(semi) == _sorted([
        {"k": 1, "lv": "a"}, {"k": 1, "lv": "b"}, {"k": 2, "lv": "c"}])
    anti = hash_join_exchange(left, right, "k", ["lv"], [],
                              n_parts=4, join_type="left anti").take_all()
    assert _sorted(anti) == _sorted([
        {"k": 3, "lv": "d"}, {"k": 7, "lv": "e"}])


def test_anti_join_empty_right(ray_session):
    """Every partition has an empty right side → anti passes left through;
    semi returns nothing."""
    left = ray.data.from_arrow(pa.table({"k": [1, 2], "lv": ["a", "b"]}))
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64())}))
    anti = hash_join_exchange(left, right, "k", ["lv"], [],
                              n_parts=4, join_type="left anti").take_all()
    assert _sorted(anti) == _sorted([
        {"k": 1, "lv": "a"}, {"k": 2, "lv": "b"}])
    semi = hash_join_exchange(left, right, "k", ["lv"], [],
                              n_parts=4, join_type="left semi").take_all()
    assert semi == []


def test_semi_anti_matches_pyarrow_oracle(ray_session):
    import numpy as np

    rng = np.random.default_rng(11)
    lt = pa.table({"k": pa.array(rng.integers(0, 40, 300), pa.int64()),
                   "lv": pa.array(np.arange(300), pa.int64())})
    rt = pa.table({"k": pa.array(rng.integers(20, 60, 200), pa.int64())})
    for jt in ("left semi", "left anti"):
        got = hash_join_exchange(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            "k", ["lv"], [], n_parts=6, join_type=jt).take_all()
        want = lt.join(rt, keys="k", join_type=jt).to_pylist()
        assert _sorted(got) == _sorted(want)


def test_matches_pyarrow_join_oracle(ray_session):
    import numpy as np

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 50, 400)
    rk = rng.integers(0, 50, 300)
    lt = pa.table({"k": pa.array(lk, pa.int64()),
                   "lv": pa.array(np.arange(400), pa.int64())})
    rt = pa.table({"k": pa.array(rk, pa.int64()),
                   "rv": pa.array(np.arange(300), pa.int64())})
    got = hash_join_exchange(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        "k", ["lv"], ["rv"], n_parts=6).take_all()
    want = lt.join(rt, keys="k", join_type="inner").to_pylist()
    assert _sorted(got) == _sorted(want)


def test_asof_join_events_edge_cases(ray_session, tmp_path):
    """Inclusive ties, no-prior-event nulls, and duplicate (user, ts)
    right rows collapsing to max event_id."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.eventops import asof_join_events

    t0 = dt.datetime(2024, 1, 1)
    us = lambda s: t0 + dt.timedelta(seconds=s)
    rows = [
        # user 1: signup at 10 (two rows, ids 2 then 5), purchase at 10
        # (tie → inclusive, picks id 5) and at 9 (before → null)
        (1, us(10), 1, "purchase"), (0, us(9), 1, "purchase"),
        (2, us(10), 1, "signup"), (5, us(10), 1, "signup"),
        # user 2: signup 3, purchases at 4 and 100
        (7, us(3), 2, "signup"),
        (8, us(4), 2, "purchase"), (9, us(100), 2, "purchase"),
        # user 3: purchase, no signup at all
        (11, us(50), 3, "purchase"),
        # noise type ignored
        (12, us(1), 1, "error"),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    sf = str(tmp_path)
    pq.write_table(tbl, f"{sf}/events.parquet")

    got = {r["purchase_id"]: (r["signup_event"], r["gap_us"])
           for r in asof_join_events(sf).take_all()}
    assert got == {
        1: (5, 0),                 # tie is inclusive; dup → max id
        0: (None, None),           # purchase before any signup
        8: (7, 1_000_000),
        9: (7, 97_000_000),
        11: (None, None),
    }


def test_range_join_burst_user_chunked(ray_session, tmp_path):
    """A burst (one user, many events inside one window) emits the full
    quadratic pair set even when chunk_pairs forces many emission chunks;
    pairs are ordered (ts, id) lexicographically and within the window."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.eventops import pairs_within_window_events

    t0 = dt.datetime(2024, 1, 1)
    n_burst = 40
    rows = [(i, t0 + dt.timedelta(seconds=i), 1, "e") for i in
            range(n_burst)]
    # second user, two events: one pair in window, one outside
    rows += [(100, t0, 2, "e"), (101, t0 + dt.timedelta(seconds=10), 2,
             "e"), (102, t0 + dt.timedelta(hours=2), 2, "e")]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    pq.write_table(tbl, f"{tmp_path}/events.parquet")

    got = pairs_within_window_events(str(tmp_path), window_minutes=5,
                                     chunk_pairs=7).take_all()
    burst = [(r["a_event"], r["b_event"]) for r in got
             if r["user_id"] == 1]
    # all 40 events within 39s < 5 min → full upper triangle
    assert sorted(burst) == [(a, b) for a in range(n_burst)
                             for b in range(a + 1, n_burst)]
    u2 = sorted((r["a_event"], r["b_event"], r["dt_us"]) for r in got
                if r["user_id"] == 2)
    assert u2 == [(100, 101, 10_000_000)]


# ---------------------------------------------------------------------------
# hypothesis: partition kernels vs nested-loop oracles (no Ray needed)
# ---------------------------------------------------------------------------

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_events = st.lists(
    st.tuples(st.integers(0, 4),          # user_id
              st.integers(0, 50),         # ts (small domain → many ties)
              st.booleans()),             # is_left
    min_size=0, max_size=60)


def _asof_part(evs):
    return pa.table({
        "user_id": pa.array([e[0] for e in evs], pa.int64()),
        "side": pa.array([0 if e[2] else 1 for e in evs], pa.int8()),
        "event_id": pa.array(list(range(len(evs))), pa.int64()),
        "ts_us": pa.array([e[1] for e in evs], pa.int64()),
    })


@settings(max_examples=60, deadline=None)
@given(_events)
def test_asof_kernel_matches_nested_loop(evs):
    from sourmash_ray.pipelines.eventops import asof_merge_partition

    got = {r["purchase_id"]: (r["signup_event"], r["gap_us"])
           for r in asof_merge_partition(_asof_part(evs)).to_pylist()}
    want = {}
    for i, (u, ts, left) in enumerate(evs):
        if not left:
            continue
        cands = [(rts, j) for j, (ru, rts, rl) in enumerate(evs)
                 if not rl and ru == u and rts <= ts]
        if cands:
            rts, j = max(cands)           # latest ts, then max event_id
            want[i] = (j, ts - rts)
        else:
            want[i] = (None, None)
    assert got == want


@settings(max_examples=60, deadline=None)
@given(_events, st.integers(1, 30), st.integers(1, 64))
def test_range_kernel_matches_nested_loop(evs, w, chunk):
    from sourmash_ray.pipelines.eventops import range_merge_partition

    part = pa.table({
        "user_id": pa.array([e[0] for e in evs], pa.int64()),
        "event_id": pa.array(list(range(len(evs))), pa.int64()),
        "ts_us": pa.array([e[1] for e in evs], pa.int64()),
    })
    got = sorted((r["a_event"], r["b_event"], r["dt_us"]) for r in
                 range_merge_partition(part, w_us=w,
                                       chunk_pairs=chunk).to_pylist())
    want = sorted(
        (i, j, evs[j][1] - evs[i][1])
        for i, (u1, t1, _) in enumerate(evs)
        for j, (u2, t2, _) in enumerate(evs)
        if u1 == u2 and (t1, i) < (t2, j) and 0 <= t2 - t1 <= w)
    assert got == want


def test_string_key_join_matches_pyarrow_oracle(ray_session):
    """String-keyed exchange join: partitioned by content hash, joined
    on the exact string values inside partitions — incl. non-ASCII."""
    import numpy as np

    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(30)] + ["héllo", "ümlaut", "日本語"]
    lk = [vocab[i] for i in rng.integers(0, len(vocab), 200)]
    rk = [vocab[i] for i in rng.integers(0, len(vocab), 100)]
    lt = pa.table({"k": pa.array(lk, pa.string()),
                   "lv": pa.array(range(200), pa.int64())})
    rt = pa.table({"k": pa.array(rk, pa.string()),
                   "rv": pa.array(range(100), pa.int64())})
    for jt in ("inner", "left outer", "left semi", "left anti"):
        got = hash_join_exchange(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            "k", ["lv"], [] if jt.startswith("left s") or
            jt.startswith("left a") else ["rv"],
            n_parts=5, join_type=jt).take_all()
        cols = ["k", "lv"] if jt in ("left semi", "left anti") \
            else ["k", "lv", "rv"]
        want = lt.join(rt.select(["k"] if jt in ("left semi", "left anti")
                                 else ["k", "rv"]),
                       keys="k", join_type=jt).select(cols).to_pylist()
        assert _sorted(got) == _sorted(want), jt


def test_full_outer_join_matches_pyarrow_oracle(ray_session):
    import numpy as np

    rng = np.random.default_rng(13)
    lt = pa.table({"k": pa.array(rng.integers(0, 30, 120), pa.int64()),
                   "lv": pa.array(np.arange(120), pa.int64())})
    rt = pa.table({"k": pa.array(rng.integers(15, 45, 100), pa.int64()),
                   "rv": pa.array(np.arange(100), pa.int64())})
    got = hash_join_exchange(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        "k", ["lv"], ["rv"], n_parts=6,
        join_type="full outer").take_all()
    want = (lt.join(rt, keys="k", join_type="full outer")
            .select(["k", "lv", "rv"]).to_pylist())
    assert _sorted(got) == _sorted(want)


def test_salted_join_equals_unsalted(ray_session):
    """Skew valve: salt=K replicates the build side into K slots and
    spreads probe rows — the output multiset must be identical to the
    unsalted join for every supported join type, including a pathological
    hot key holding most probe rows."""
    import numpy as np

    rng = np.random.default_rng(17)
    hot = np.zeros(500, np.int64)              # hot key 0: 500 probe rows
    cold = rng.integers(1, 25, 200)
    lt = pa.table({"k": pa.array(np.r_[hot, cold], pa.int64()),
                   "lv": pa.array(np.arange(700), pa.int64())})
    rt = pa.table({"k": pa.array(rng.integers(0, 30, 60), pa.int64()),
                   "rv": pa.array(np.arange(60), pa.int64())})
    ld, rd = ray.data.from_arrow(lt), ray.data.from_arrow(rt)
    for jt in ("inner", "left outer", "left semi", "left anti"):
        rc = [] if jt in ("left semi", "left anti") else ["rv"]
        plain = hash_join_exchange(ld, rd, "k", ["lv"], rc,
                                   n_parts=8, join_type=jt).take_all()
        salted = hash_join_exchange(ld, rd, "k", ["lv"], rc, n_parts=8,
                                    join_type=jt, salt=4).take_all()
        assert _sorted(salted) == _sorted(plain), jt


def test_salt_validation(ray_session):
    ld = ray.data.from_arrow(pa.table({"k": [1], "lv": [1]}))
    rd = ray.data.from_arrow(pa.table({"k": [1], "rv": [1]}))
    import pytest
    with pytest.raises(ValueError, match="full outer"):
        hash_join_exchange(ld, rd, "k", ["lv"], ["rv"], n_parts=4,
                           join_type="full outer", salt=2)
    with pytest.raises(ValueError, match="salt"):
        hash_join_exchange(ld, rd, "k", ["lv"], ["rv"], n_parts=4, salt=8)


def test_broadcast_join_matches_exchange(ray_session):
    import numpy as np

    from sourmash_ray.stages.join import broadcast_join

    rng = np.random.default_rng(23)
    lt = pa.table({"o_k": pa.array(rng.integers(0, 40, 300), pa.int64()),
                   "lv": pa.array(np.arange(300), pa.int64())})
    rt = pa.table({"r_k": pa.array(rng.integers(20, 60, 50), pa.int64()),
                   "rv": pa.array(np.arange(50), pa.int64())})
    ld = ray.data.from_arrow(lt)
    for jt in ("inner", "left outer", "left semi", "left anti"):
        rc = [] if jt in ("left semi", "left anti") else ["rv"]
        got = broadcast_join(ld, rt, "k", ["lv"], rc, join_type=jt,
                             left_key="o_k", right_key="r_k").take_all()
        want = hash_join_exchange(
            ld, ray.data.from_arrow(rt), "k", ["lv"], rc, n_parts=4,
            join_type=jt, left_key="o_k", right_key="r_k").take_all()
        assert _sorted(got) == _sorted(want), jt


def test_salted_string_key_join_equals_unsalted(ray_session):
    import numpy as np

    rng = np.random.default_rng(29)
    vocab = ["the", "a", "owl", "zebra"]
    lk = [vocab[min(i, 3)] for i in rng.integers(0, 10, 400)]  # "the"-hot
    lt = pa.table({"k": pa.array(lk, pa.string()),
                   "lv": pa.array(np.arange(400), pa.int64())})
    rt = pa.table({"k": pa.array(vocab + ["missing"], pa.string()),
                   "rv": pa.array(np.arange(5), pa.int64())})
    ld, rd = ray.data.from_arrow(lt), ray.data.from_arrow(rt)
    plain = hash_join_exchange(ld, rd, "k", ["lv"], ["rv"],
                               n_parts=6).take_all()
    salted = hash_join_exchange(ld, rd, "k", ["lv"], ["rv"], n_parts=6,
                                salt=3).take_all()
    assert _sorted(salted) == _sorted(plain)


def test_null_keys_never_match(ray_session):
    """SQL NULL-key semantics: NULL joins nothing (not even NULL) in
    inner/semi; NULL-key left rows surface unmatched in left outer and
    left anti — both int and string keys."""
    lt = pa.table({"k": pa.array([1, None, 2], pa.int64()),
                   "lv": ["a", "b", "c"]})
    rt = pa.table({"k": pa.array([1, None], pa.int64()),
                   "rv": pa.array([10, 99], pa.int64())})
    ld, rd = ray.data.from_arrow(lt), ray.data.from_arrow(rt)
    inner = hash_join_exchange(ld, rd, "k", ["lv"], ["rv"],
                               n_parts=3).take_all()
    assert inner == [{"k": 1, "lv": "a", "rv": 10}]
    louter = hash_join_exchange(ld, rd, "k", ["lv"], ["rv"], n_parts=3,
                                join_type="left outer").take_all()
    assert _sorted(louter) == _sorted([
        {"k": 1, "lv": "a", "rv": 10},
        {"k": None, "lv": "b", "rv": None},
        {"k": 2, "lv": "c", "rv": None}])
    anti = hash_join_exchange(ld, rd, "k", ["lv"], [], n_parts=3,
                              join_type="left anti").take_all()
    assert _sorted(anti) == _sorted([
        {"k": None, "lv": "b"}, {"k": 2, "lv": "c"}])

    lts = ray.data.from_arrow(pa.table(
        {"k": pa.array(["x", None], pa.string()), "lv": [1, 2]}))
    rts = ray.data.from_arrow(pa.table(
        {"k": pa.array(["x", None], pa.string()),
         "rv": pa.array([7, 8], pa.int64())}))
    assert hash_join_exchange(lts, rts, "k", ["lv"], ["rv"],
                              n_parts=3).take_all() == [
        {"k": "x", "lv": 1, "rv": 7}]


# ---------------------------------------------------------------------------
# hypothesis: join vs in-memory pyarrow oracle across types/nulls/salt
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_keys = st.lists(st.one_of(st.none(), st.integers(0, 8)),
                 min_size=0, max_size=25)


@settings(max_examples=12, deadline=None)
@given(_keys, _keys,
       st.sampled_from(["inner", "left outer", "left semi", "left anti"]),
       st.sampled_from([1, 3]))
def test_join_matches_pyarrow_oracle_property(ray_session, lk, rk, jt,
                                              salt):
    lt = pa.table({"k": pa.array(lk, pa.int64()),
                   "lv": pa.array(range(len(lk)), pa.int64())})
    rc = [] if jt in ("left semi", "left anti") else ["rv"]
    rt = pa.table({"k": pa.array(rk, pa.int64()),
                   "rv": pa.array(range(len(rk)), pa.int64())})
    got = hash_join_exchange(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        "k", ["lv"], rc, n_parts=3, join_type=jt, salt=salt).take_all()
    want = (lt.join(rt.select(["k"] + rc), keys="k", join_type=jt)
            .select(["k", "lv"] + rc).to_pylist())
    assert _sorted(got) == _sorted(want)


@settings(max_examples=60, deadline=None)
@given(_events, st.integers(0, 25))
def test_rolling_kernel_matches_nested_loop(evs, w):
    """Trailing RANGE-frame count: every same-user event with
    ts in [cur - w, cur], peers included."""
    from sourmash_ray.pipelines.eventops import rolling_merge_partition

    part = pa.table({
        "event_id": pa.array(list(range(len(evs))), pa.int64()),
        "user_id": pa.array([e[0] for e in evs], pa.int64()),
        "ts_us": pa.array([e[1] for e in evs], pa.int64()),
    })
    got = {r["event_id"]: r["n_trailing"]
           for r in rolling_merge_partition(part, w_us=w).to_pylist()}
    for i, (u, ts, _) in enumerate(evs):
        want = sum(1 for (ou, ots, _) in evs
                   if ou == u and ts - w <= ots <= ts)
        assert got[i] == want, (i, evs, w)


def test_top_building_orders_matches_duckdb(ray_session):
    """Q3-style composition (semi join + big-big join + rollup + top-k)
    vs DuckDB on the sf0.001 tables."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    got = [(r["o_orderkey"], r["o_date_us"], r["sum_revenue_e4"])
           for r in e.queries()["top_building_orders"](sf).take_all()]
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    want = [tuple(r) for r in
            con.sql(e.oracle_sql()["top_building_orders"]).fetchall()]
    assert got == want


def test_composite_key_overflow_guards_raise():
    """A user_id × ts span product past int64 must raise, not wrap."""
    import pytest

    from sourmash_ray.pipelines.eventops import (asof_merge_partition,
                                                 rolling_merge_partition)

    part = pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "user_id": pa.array([2**62, 2**62], pa.int64()),
        "ts_us": pa.array([0, 10], pa.int64()),
    })
    with pytest.raises(ValueError, match="overflows"):
        rolling_merge_partition(part, w_us=5)

    asof_part = pa.table({
        "user_id": pa.array([2**62, 2**62], pa.int64()),
        "side": pa.array([0, 1], pa.int8()),
        "event_id": pa.array([0, 1], pa.int64()),
        "ts_us": pa.array([10, 0], pa.int64()),
    })
    with pytest.raises(ValueError, match="overflows"):
        asof_merge_partition(asof_part)


def test_picklist_joins_broadcast_equals_exchange(ray_session):
    """The picklist semi/anti ops must return identical rows whichever
    branch the broadcast budget selects (budget=0 forces the big-big
    exchange path)."""
    from sourmash_ray.pipelines.relational import _picklist_join_orders

    sf = "/root/testdata/sf0.001"
    for anti in (False, True):
        fast = _picklist_join_orders(sf, anti=anti)
        forced = _picklist_join_orders(sf, anti=anti, broadcast_budget=0)
        cols = ["o_orderkey", "o_custkey", "o_totalprice"]

        def _rows(ds):
            return sorted(tuple(r[c] for c in cols) for r in ds.take_all())

        a, b = _rows(fast), _rows(forced)
        assert a == b
        assert len(a) > 0


def test_promo_revenue_broadcast_equals_exchange(ray_session):
    """promo_revenue_monthly must return identical cells whichever branch
    the dimension-size budget selects (budget=0 forces the big-big
    exchange path)."""
    from sourmash_ray.pipelines.relational import promo_revenue_monthly

    sf = "/root/testdata/sf0.001"

    def _rows(ds):
        return sorted((r["ship_month"], r["promo_rev_e4"],
                       r["total_rev_e4"]) for r in ds.take_all())

    fast = _rows(promo_revenue_monthly(sf))
    forced = _rows(promo_revenue_monthly(sf, broadcast_budget=0))
    assert fast == forced
    assert len(fast) > 0


def test_promo_broadcast_drops_unmatched_partkeys(ray_session, tmp_path):
    """Broadcast branch must use INNER-join semantics: lineitems whose
    partkey is absent from part contribute to NEITHER sum (matches the
    exchange branch and the SQL oracle on FK-broken data); an empty part
    dimension yields zero rows, not IndexError."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.relational import promo_revenue_monthly

    d = tmp_path / "fkbroken"
    d.mkdir()
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO X", "STANDARD Y"]),
    }), d / "part.parquet")
    ship = pa.array([1000000, 1000001, 1000002], pa.date32())
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 99], pa.int64()),  # 99 unmatched
        "l_extendedprice": pa.array([10.0, 20.0, 40.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
        "l_shipdate": ship,
    }), d / "lineitem.parquet")

    def _rows(ds):
        return sorted((r["ship_month"], r["promo_rev_e4"],
                       r["total_rev_e4"]) for r in ds.take_all())

    fast = _rows(promo_revenue_monthly(str(d)))
    forced = _rows(promo_revenue_monthly(str(d), broadcast_budget=0))
    assert fast == forced
    # unmatched partkey 99 (price 40) must be absent from totals
    assert sum(r[2] for r in fast) == (10_0000 + 20_0000) * 100 // 100

    # empty part dimension -> inner join -> no rows, no crash
    pq.write_table(pa.table({
        "p_partkey": pa.array([], pa.int64()),
        "p_type": pa.array([], pa.string()),
    }), d / "part.parquet")
    assert _rows(promo_revenue_monthly(str(d))) == []


def test_linestatus_unknown_value_raises(ray_session, tmp_path):
    """A status outside {F, O} must raise (composite-key collision
    guard), not silently wrap into the wrong bucket."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from sourmash_ray.pipelines.relational import linestatus_priority_counts

    d = tmp_path / "badstatus"
    d.mkdir()
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_linestatus": pa.array(["Z"]),
    }), d / "lineitem.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT"]),
    }), d / "orders.parquet")
    with pytest.raises(Exception, match="l_linestatus"):
        linestatus_priority_counts(str(d)).take_all()


def test_new_broadcast_lookups_inner_join_on_fk_broken_data(
        ray_session, tmp_path):
    """large_orders / volume_shipping / supplier_balance_by_nation must
    DROP rows whose FK is absent from the broadcast dim — matching
    their SQL oracles' inner joins on FK-broken data (the ADVICE-r4
    promo_revenue class of bug)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.relational import (
        large_orders, supplier_balance_by_nation, volume_shipping)

    d = tmp_path / "fk"
    d.mkdir()
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int32()),
        "n_name": pa.array(["N_A", "N_B"]),
        "n_regionkey": pa.array([0, 0], pa.int32()),
    }), d / "nation.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], pa.int64()),
        "s_name": pa.array(["s1", "s2"]),
        "s_nationkey": pa.array([0, 7], pa.int64()),   # 7 missing
        "s_acctbal": pa.array([10.0, 20.0]),
    }), d / "supplier.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_name": pa.array(["c1"]),
        "c_nationkey": pa.array([0], pa.int64()),
        "c_acctbal": pa.array([5.0]),
        "c_mktsegment": pa.array(["X"]),
    }), d / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([1, 99], pa.int64()),    # 99 missing
        "o_totalprice": pa.array([100.0, 200.0]),
    }), d / "orders.parquet")
    ship = pa.array([12000, 12001, 12002], pa.date32())
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 11, 10], pa.int64()),
        "l_suppkey": pa.array([1, 1, 55], pa.int64()),  # 55 missing
        "l_quantity": pa.array([200.0, 300.0, 400.0]),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
        "l_shipdate": ship,
    }), d / "lineitem.parquet")

    con = duckdb.connect()
    for t in ("nation", "supplier", "customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')")
    import __ray_entry__ as E

    oracles = E.oracle_sql()
    for name, fn in (("large_orders", large_orders),
                     ("volume_shipping", volume_shipping),
                     ("supplier_balance_by_nation",
                      supplier_balance_by_nation)):
        df = fn(str(d)).to_pandas()
        want = con.sql(oracles[name]).df()
        a = df[sorted(df.columns)].astype(str)
        b = want[sorted(want.columns)].astype(str)
        assert sorted(map(tuple, a.values.tolist())) == \
            sorted(map(tuple, b.values.tolist())), name


def test_semi_anti_list_payload_and_null_keys(ray_session):
    """Semi/anti joins carry list<...> payload columns (Acero's hash join
    rejects non-flat non-key fields; the semi/anti path filters on an
    is_in mask instead) and apply SQL key semantics: a NULL left key
    never matches — dropped by semi, kept by anti — and a NULL right key
    matches nothing."""
    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, None, 3], pa.int64()),
        "mins": pa.array([[1, 2], [3], [4, 5, 6], []],
                         pa.list_(pa.uint64())),
    }))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array([2, None, 9], pa.int64())}))
    semi = hash_join_exchange(left, right, "k", ["mins"], [],
                              n_parts=4, join_type="left semi").take_all()
    assert [(r["k"], r["mins"]) for r in semi] == [(2, [3])]
    anti = hash_join_exchange(left, right, "k", ["mins"], [],
                              n_parts=4, join_type="left anti").take_all()
    assert _sorted([{"k": r["k"]} for r in anti]) == _sorted(
        [{"k": 1}, {"k": None}, {"k": 3}])
    # oracle: in-memory Acero join on the key-only projection agrees
    lt = pa.table({"k": pa.array([1, 2, None, 3], pa.int64())})
    rt = pa.table({"k": pa.array([2, None, 9], pa.int64())})
    want_anti = sorted(lt.join(rt, keys="k", join_type="left anti")
                       ["k"].to_pylist(), key=lambda v: (v is None, v))
    got_anti = sorted((r["k"] for r in anti),
                      key=lambda v: (v is None, v))
    assert got_anti == want_anti

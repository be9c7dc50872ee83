"""Event-stream curation ops: consecutive-duplicate compaction, funnel
conversion, grouped mode — kernel tests vs nested-loop oracles plus
end-to-end DuckDB parity on the sf0.001 tables."""
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

_events = st.lists(
    st.tuples(st.integers(0, 3),          # user_id
              st.integers(0, 40),         # ts_us
              st.sampled_from(["a", "b", "c"])),
    min_size=0, max_size=40)


@settings(max_examples=60, deadline=None)
@given(_events)
def test_dedupe_consecutive_kernel_matches_nested_loop(evs):
    from sourmash_ray.pipelines.eventops import dedupe_consecutive_partition

    part = pa.table({
        "event_id": pa.array(list(range(len(evs))), pa.int64()),
        "user_id": pa.array([e[0] for e in evs], pa.int64()),
        "ts_us": pa.array([e[1] for e in evs], pa.int64()),
        "event_type": pa.array([e[2] for e in evs], pa.string()),
    })
    got = sorted(r["event_id"]
                 for r in dedupe_consecutive_partition(part).to_pylist())
    want = []
    for u in set(e[0] for e in evs):
        seq = sorted((ts, i) for i, (ou, ts, _) in enumerate(evs)
                     if ou == u)
        prev = None
        for _, i in seq:
            if prev is None or evs[i][2] != prev:
                want.append(i)
            prev = evs[i][2]
    assert got == sorted(want), (evs, got, sorted(want))


@settings(max_examples=60, deadline=None)
@given(_events, st.integers(0, 25))
def test_funnel_kernel_matches_nested_loop(evs, w):
    """First 'a' per user; converted iff any 'b' in [a_ts, a_ts + w]."""
    from sourmash_ray.pipelines.eventops import funnel_merge_partition

    part = pa.table({
        "user_id": pa.array([e[0] for e in evs], pa.int64()),
        "ts_us": pa.array([e[1] for e in evs], pa.int64()),
        "is_a": pa.array([1 if e[2] == "a" else 0 for e in evs],
                         pa.int64()),
    })
    got = {r["user_id"]: (r["a_ts_us"], r["b_ts_us"], r["converted"])
           for r in funnel_merge_partition(part, w_us=w).to_pylist()}
    users_a = {u for (u, _, t) in evs if t == "a"}
    assert set(got) == users_a
    for u in users_a:
        a_ts = min(ts for (ou, ts, t) in evs if ou == u and t == "a")
        bs = [ts for (ou, ts, t) in evs
              if ou == u and t != "a" and a_ts <= ts <= a_ts + w]
        if bs:
            assert got[u] == (a_ts, min(bs), 1), (evs, w, u)
        else:
            assert got[u] == (a_ts, None, 0), (evs, w, u)


def test_funnel_kernel_overflow_guard_raises():
    import pytest

    from sourmash_ray.pipelines.eventops import funnel_merge_partition

    part = pa.table({
        "user_id": pa.array([2**62, 2**62], pa.int64()),
        "ts_us": pa.array([0, 10], pa.int64()),
        "is_a": pa.array([1, 0], pa.int64()),
    })
    with pytest.raises(ValueError, match="overflows"):
        funnel_merge_partition(part, w_us=5)


def _duckdb_rows(sf, sql):
    import duckdb

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')")
    return sorted(tuple(r) for r in con.sql(sql).fetchall())


def test_event_curation_queries_match_duckdb(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    q, o = e.queries(), e.oracle_sql()
    for name in ("dedupe_consecutive_events", "funnel_conversions_events",
                 "top_event_type_by_user"):
        got = sorted(tuple(r[c] for c in r)
                     for r in q[name](sf).take_all())
        want = _duckdb_rows(sf, o[name])
        assert got == want, name


@settings(max_examples=50, deadline=None)
@given(_events)
def test_retention_kernel_matches_nested_loop(evs):
    """Partial (cohort, offset) cells over ONE partition == brute force
    distinct-user counts (one partition holds every user's history, so
    partials are exact here)."""
    from sourmash_ray.pipelines.eventops import (
        _US_PER_DAY, retention_merge_partition)

    part = pa.table({
        "user_id": pa.array([e[0] for e in evs], pa.int64()),
        # spread ts over day boundaries
        "ts_us": pa.array([e[1] * (_US_PER_DAY // 4) for e in evs],
                          pa.int64()),
    })
    got = {(r["cohort_day"], r["day_offset"]): r["n"]
           for r in retention_merge_partition(part).to_pylist()}
    want = {}
    firsts = {}
    for u, t, _ in evs:
        d = (t * (_US_PER_DAY // 4)) // _US_PER_DAY
        firsts[u] = min(firsts.get(u, d), d)
    seen = set()
    for u, t, _ in evs:
        d = (t * (_US_PER_DAY // 4)) // _US_PER_DAY
        cell = (firsts[u], d - firsts[u])
        if (u,) + cell not in seen:
            seen.add((u,) + cell)
            want[cell] = want.get(cell, 0) + 1
    assert got == want, (evs, got, want)


def test_retention_and_knn_match_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    q, o = e.queries(), e.oracle_sql()
    for name in ("user_retention_cohorts", "knn_label_vote"):
        got = sorted(tuple(r[c] for c in r)
                     for r in q[name](sf).take_all())
        want = sorted(tuple(r) for r in con.sql(o[name]).fetchall())
        assert got == want, name


@settings(max_examples=50, deadline=None)
@given(_events)
def test_transition_kernel_matches_nested_loop(evs):
    from sourmash_ray.pipelines.eventops import transition_merge_partition

    part = pa.table({
        "event_id": pa.array(list(range(len(evs))), pa.int64()),
        "user_id": pa.array([e[0] for e in evs], pa.int64()),
        "ts_us": pa.array([e[1] for e in evs], pa.int64()),
        "event_type": pa.array([e[2] for e in evs], pa.string()),
    })
    got = {(r["prev_type"], r["next_type"]): r["n"]
           for r in transition_merge_partition(part).to_pylist()}
    want = {}
    for u in set(e[0] for e in evs):
        seq = sorted((ts, i) for i, (ou, ts, _) in enumerate(evs)
                     if ou == u)
        for (_, i), (_, j) in zip(seq, seq[1:]):
            cell = (evs[i][2], evs[j][2])
            want[cell] = want.get(cell, 0) + 1
    assert got == want, (evs, got, want)


@settings(max_examples=50, deadline=None)
@given(_events)
def test_cooccurrence_kernel_matches_nested_loop(evs):
    """Partial pair counts over ONE partition == brute force distinct
    type-pairs per (user, bucketed-ts) cell."""
    from itertools import combinations

    from sourmash_ray.pipelines.eventops import (
        cooccurrence_merge_partition)

    part = pa.table({
        "user_id": pa.array([e[0] for e in evs], pa.int64()),
        "hour_us": pa.array([e[1] // 10 for e in evs], pa.int64()),
        "event_type": pa.array([e[2] for e in evs], pa.string()),
    })
    got = {(r["type_a"], r["type_b"]): r["n"]
           for r in cooccurrence_merge_partition(part).to_pylist()}
    cells = {}
    for u, t, ty in evs:
        cells.setdefault((u, t // 10), set()).add(ty)
    want = {}
    for types in cells.values():
        for a, b in combinations(sorted(types), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want, (evs, got, want)


def test_cooccurrence_and_lapsed_match_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    q, o = e.queries(), e.oracle_sql()
    for name in ("event_cooccurrence_counts", "lapsed_users"):
        got = sorted(tuple(r[c] for c in r)
                     for r in q[name](sf).take_all())
        want = _duckdb_rows(sf, o[name])
        assert got == want, name
    assert len(q["lapsed_users"](sf).take_all()) > 0


@settings(max_examples=50, deadline=None)
@given(_events)
def test_paths_kernel_matches_nested_loop(evs):
    from sourmash_ray.pipelines.eventops import paths_merge_partition

    part = pa.table({
        "event_id": pa.array(list(range(len(evs))), pa.int64()),
        "user_id": pa.array([e[0] for e in evs], pa.int64()),
        "ts_us": pa.array([e[1] for e in evs], pa.int64()),
        "event_type": pa.array([e[2] for e in evs], pa.string()),
    })
    got = {r["user_id"]: (r["path"], r["n_events"])
           for r in paths_merge_partition(part).to_pylist()}
    want = {}
    for u in set(e[0] for e in evs):
        seq = sorted((ts, i) for i, (ou, ts, _) in enumerate(evs)
                     if ou == u)
        want[u] = (",".join(evs[i][2] for _, i in seq), len(seq))
    assert got == want, (evs, got, want)

"""Exact DuckDB twins + conservation invariants for the batch-25
operators: event_transition_trigrams (second-order Markov),
user_session_count_histogram (sessions-per-user histogram),
order_value_delta_histogram (consecutive-order value change by
sign × magnitude), part_demand_histogram (SKU-velocity tiers by
brand)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders", "lineitem", "part"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_event_transition_trigrams_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import event_transition_trigrams

    got = sorted((r["type_1"], r["type_2"], r["type_3"], r["n_trigrams"])
                 for r in event_transition_trigrams(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT type_1, type_2, type_3, count(*)
        FROM (SELECT event_type AS type_1,
                     lead(event_type) OVER w AS type_2,
                     lead(event_type, 2) OVER w AS type_3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        WHERE type_2 IS NOT NULL AND type_3 IS NOT NULL
        GROUP BY 1, 2, 3
    """).fetchall())
    assert got == want
    # mass conservation: total trigrams = Σ_user max(0, n_events − 2)
    total = con.sql("""
        SELECT sum(CASE WHEN n > 2 THEN n - 2 ELSE 0 END)
        FROM (SELECT count(*) AS n FROM events GROUP BY user_id)
    """).fetchone()[0]
    assert sum(n for *_, n in got) == total


def test_user_session_count_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import (
        sessionize_events, user_session_count_histogram)

    got = sorted((r["n_sessions"], r["n_users"])
                 for r in user_session_count_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH s AS (SELECT user_id,
               CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                       > 1800000000
                    THEN 1 ELSE 0 END AS brk
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        u AS (SELECT user_id, sum(brk) AS n_sessions
              FROM s GROUP BY user_id)
        SELECT CAST(n_sessions AS BIGINT), CAST(count(*) AS BIGINT)
        FROM u GROUP BY 1
    """).fetchall())
    assert got == want
    # Σ n_users == distinct users; Σ n_sessions·n_users == total
    # sessions from the sessionize operator at the same gap rule
    n_users = con.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(u for _, u in got) == n_users
    n_sessions = sessionize_events(SF).count()
    assert sum(s * u for s, u in got) == n_sessions


def test_order_value_delta_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        order_value_delta_histogram)

    got = sorted((r["sign"], r["magnitude"], r["n_deltas"])
                 for r in order_value_delta_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH s AS (SELECT o_custkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
               lead(CAST(round(o_totalprice * 100) AS BIGINT))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS nx
               FROM orders),
        d AS (SELECT nx - cents AS delta FROM s WHERE nx IS NOT NULL)
        SELECT CAST(sign(delta) AS BIGINT),
               CASE WHEN delta = 0 THEN 0
                    ELSE length(CAST(abs(delta) AS VARCHAR)) END,
               count(*)
        FROM d GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # mass conservation: one delta per consecutive same-customer pair
    total = con.sql("""
        SELECT sum(n - 1)
        FROM (SELECT count(*) AS n FROM orders GROUP BY o_custkey)
    """).fetchone()[0]
    assert sum(n for *_, n in got) == total
    # sign 0 pairs exactly with magnitude 0, and magnitudes stay in
    # the 19-digit int64 envelope
    for s, m, _ in got:
        assert (s == 0) == (m == 0)
        assert 0 <= m <= 19


def test_part_demand_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import part_demand_histogram

    got = sorted((r["p_brand"], r["n_lineitems"], r["n_parts"])
                 for r in part_demand_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT l_partkey, count(*) AS n_lineitems
                   FROM lineitem GROUP BY l_partkey)
        SELECT p_brand, n_lineitems, CAST(count(*) AS BIGINT)
        FROM c JOIN part ON p_partkey = l_partkey
        GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # mass conservation: Σ n_parts·n_lineitems == lineitems whose part
    # exists in the dimension (inner-join semantics)
    total = con.sql("""
        SELECT count(*) FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part)
    """).fetchone()[0]
    assert sum(n * k for _, k, n in got) == total
    n_parts_seen = con.sql("""
        SELECT count(DISTINCT l_partkey) FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part)
    """).fetchone()[0]
    assert sum(n for *_, n in got) == n_parts_seen

"""Batch-41: session_position_value_profile (within-session value
decay: position 1/2/3+ buckets with exact cent totals) vs DuckDB."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM "
          f"read_parquet('{SF}/events.parquet')")
    return c


def test_session_position_value_profile_matches_duckdb(ray_session,
                                                       con):
    from sourmash_ray.pipelines.eventops import (
        session_position_value_profile, sessionize_events)

    got = sorted((r["position"], r["n_events"], r["sum_cents"])
                 for r in session_position_value_profile(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH s AS (SELECT user_id, ts, event_id,
              coalesce(value, 0) AS v,
              CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > 1800000000
              THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        t AS (SELECT user_id, ts, event_id, v,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sid FROM s),
        p AS (SELECT v, row_number() OVER (PARTITION BY user_id, sid
                  ORDER BY ts, event_id) AS rn FROM t)
        SELECT CAST(least(rn, 3) AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT)
        FROM p GROUP BY 1
    """).fetchall())
    assert got == want
    # every event lands in exactly one position bucket, and the
    # position-1 count equals the total session count
    total = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert sum(n for _, n, _c in got) == total
    n_sessions = sessionize_events(SF).count()
    first = dict((p, n) for p, n, _ in got)[1]
    assert first == n_sessions

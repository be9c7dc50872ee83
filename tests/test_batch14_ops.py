"""Exact DuckDB twins for the session-6 batch-14 data-forensics ops:
benford_first_digit_orders (first-significant-digit audit) and
value_magnitude_histogram (decimal-magnitude load shape)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_benford_first_digit_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        benford_first_digit_orders)

    got = sorted((r["first_digit"], r["n_orders"], r["share_e4"])
                 for r in benford_first_digit_orders(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH d AS (SELECT CAST(substr(CAST(CAST(round(o_totalprice*100)
                       AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) fd
                   FROM orders),
        g AS (SELECT fd, CAST(count(*) AS BIGINT) n FROM d GROUP BY 1)
        SELECT fd, n, CAST(n * 10000 // sum(n) OVER () AS BIGINT)
        FROM g
    """).fetchall())
    assert got == want
    assert {r[0] for r in got} <= set(range(1, 10))
    n_orders = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert sum(r[1] for r in got) == n_orders
    s = sum(r[2] for r in got)
    assert 10000 - len(got) < s <= 10000


def test_value_magnitude_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import value_magnitude_histogram

    got = sorted((r["event_type"], r["magnitude"], r["n_events"])
                 for r in value_magnitude_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT event_type,
               CAST(length(CAST(CAST(round(coalesce(value,0)*100)
                   AS BIGINT) AS VARCHAR)) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM events GROUP BY 1, 2
    """).fetchall())
    assert got == want
    n_events = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert sum(r[2] for r in got) == n_events
    # magnitude really is the digit count: spot-check the max value
    mx = con.sql("""SELECT CAST(round(max(value)*100) AS BIGINT)
                    FROM events""").fetchone()[0]
    assert max(r[1] for r in got) == len(str(mx))

"""Exact DuckDB twins + invariants for the batch-28 operators:
new_vs_returning_weekly (growth-accounting lifecycle split) and
orders_above_customer_median (self-referential discrete-median
threshold count)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_new_vs_returning_weekly_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import new_vs_returning_weekly

    got = sorted((r["week"], r["is_new"], r["n_events"])
                 for r in new_vs_returning_weekly(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH e AS (SELECT user_id,
                CAST(epoch_us(ts) AS BIGINT)
                    // 604800000000 AS week FROM events),
        f AS (SELECT user_id, min(week) AS fw FROM e GROUP BY 1)
        SELECT e.week, e.week = f.fw, CAST(count(*) AS BIGINT)
        FROM e JOIN f ON e.user_id = f.user_id GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # every event is either new or returning, exactly once
    total = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert sum(n for *_, n in got) == total
    # the earliest week has NO returning events
    wmin = min(w for w, *_ in got)
    assert not any(w == wmin and not new for w, new, _ in got)
    # new-user events per week == users whose first week is that week,
    # weighted by their first-week event count: at least one per user
    n_users = con.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(n for _, new, n in got if new) >= n_users


def test_orders_above_customer_median_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        orders_above_customer_median)

    got = sorted((r["o_orderpriority"], r["n_orders"])
                 for r in orders_above_customer_median(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH m AS (SELECT o_custkey,
                quantile_disc(CAST(round(o_totalprice * 100)
                                   AS BIGINT), 0.5) AS med
                FROM orders GROUP BY 1)
        SELECT o_orderpriority, CAST(count(*) AS BIGINT)
        FROM orders o JOIN m ON o.o_custkey = m.o_custkey
        WHERE CAST(round(o_totalprice * 100) AS BIGINT) > m.med
        GROUP BY 1
    """).fetchall())
    assert got == want
    # strictly-above-the-lower-median is under half of all orders
    total = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert 0 < sum(n for _, n in got) < total / 2 + 1

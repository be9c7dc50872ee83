"""Exact DuckDB twins for the session-6 batch-4 operators:
top_suppliers_per_nation (grouped ranking over a joined fact),
customer_active_month_streaks (gaps-and-islands on the orders carrier),
event_type_share_by_week (exact-integer mix shares)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("nation", "supplier", "orders", "lineitem", "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_top_suppliers_per_nation_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import top_suppliers_per_nation

    got = sorted((r["nation"], r["s_suppkey"], r["revenue_e4"], r["rn"])
                 for r in top_suppliers_per_nation(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l_discount * 100)
                                        AS BIGINT))) AS BIGINT) AS r
          FROM lineitem GROUP BY l_suppkey),
        named AS (
          SELECT n.n_name AS nation, s.s_suppkey, rev.r
          FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey),
        ranked AS (
          SELECT nation, s_suppkey, r,
                 row_number() OVER (PARTITION BY nation
                                    ORDER BY r DESC, s_suppkey) AS rn
          FROM named)
        SELECT nation, CAST(s_suppkey AS BIGINT), r, CAST(rn AS BIGINT)
        FROM ranked WHERE rn <= 3
    """).fetchall())
    assert got == want and len(got) >= 3
    # ranks are 1..k contiguous and revenue non-increasing inside a nation
    from itertools import groupby

    by_nation = sorted(got, key=lambda r: (r[0], r[3]))
    for _, rows in groupby(by_nation, key=lambda r: r[0]):
        rows = list(rows)
        assert [r[3] for r in rows] == list(range(1, len(rows) + 1))
        revs = [r[2] for r in rows]
        assert revs == sorted(revs, reverse=True)


def test_customer_month_streaks_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        customer_active_month_streaks)

    got = sorted((r["streak_months"], r["n_customers"])
                 for r in customer_active_month_streaks(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH cm AS (SELECT DISTINCT o_custkey,
                           (year(o_orderdate) - 1970) * 12
                           + month(o_orderdate) - 1 AS mo
                    FROM orders),
        isl AS (SELECT o_custkey,
                       mo - ROW_NUMBER() OVER (PARTITION BY o_custkey
                                               ORDER BY mo) AS grp
                FROM cm),
        runs AS (SELECT o_custkey, count(*) AS len
                 FROM isl GROUP BY o_custkey, grp),
        mx AS (SELECT o_custkey, max(len) AS s FROM runs
               GROUP BY o_custkey)
        SELECT CAST(s AS BIGINT), CAST(count(*) AS BIGINT)
        FROM mx GROUP BY 1
    """).fetchall())
    assert got == want
    n_cust = con.sql(
        "SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert sum(n for _, n in got) == n_cust


def test_event_type_share_by_week_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import event_type_share_by_week

    got = sorted((r["wk"], r["event_type"], r["n_events"], r["share_e4"])
                 for r in event_type_share_by_week(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT CAST(epoch_us(ts) AS BIGINT) // 604800000000
                              AS wk,
                          event_type, count(*) AS n
                   FROM events GROUP BY 1, 2)
        SELECT wk, event_type, CAST(n AS BIGINT),
               CAST(n * 10000 // sum(n) OVER (PARTITION BY wk)
                    AS BIGINT)
        FROM c
    """).fetchall())
    assert got == want
    # per-week shares sum to ≤ 10000 (floor) and > 10000 - n_types
    from itertools import groupby

    for wk, rows in groupby(got, key=lambda r: r[0]):
        rows = list(rows)
        s = sum(r[3] for r in rows)
        assert 10000 - len(rows) < s <= 10000

"""Exact DuckDB twins for the session-6 batch-19 operators:
customer_priority_drift (first→last order-priority lifecycle matrix)
and ship_delay_quantiles_by_priority (join-then-quantile with the
shift-before-floor negative-delay contract)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "lineitem"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_customer_priority_drift_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import customer_priority_drift

    got = sorted((r["first_priority"], r["last_priority"],
                  r["n_customers"])
                 for r in customer_priority_drift(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH b AS (SELECT o_custkey,
                          first(o_orderpriority
                                ORDER BY o_orderdate, o_orderkey) f,
                          last(o_orderpriority
                               ORDER BY o_orderdate, o_orderkey) l
                   FROM orders GROUP BY 1)
        SELECT f, l, CAST(count(*) AS BIGINT) FROM b GROUP BY 1, 2
    """).fetchall())
    assert got == want
    n_cust = con.sql(
        "SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert sum(r[2] for r in got) == n_cust


def test_ship_delay_quantiles_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        ship_delay_quantiles_by_priority)

    got = sorted((r["o_orderpriority"], r["q"], r["delay_days"])
                 for r in ship_delay_quantiles_by_priority(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH d AS (SELECT o.o_orderpriority,
                          (CAST(epoch_us(l.l_shipdate) AS BIGINT)
                           - CAST(epoch_us(o.o_orderdate) AS BIGINT)
                           + 100000 * 86400000000)
                          // 86400000000 - 100000 delay_days
                   FROM lineitem l
                   JOIN orders o ON l.l_orderkey = o.o_orderkey)
        SELECT o_orderpriority, CAST(q AS DOUBLE), CAST(v AS BIGINT)
        FROM (SELECT o_orderpriority, unnest([0.25,0.5,0.75,0.9]) q,
                     unnest(quantile_disc(delay_days,
                                          [0.25,0.5,0.75,0.9])) v
              FROM d GROUP BY o_orderpriority)
    """).fetchall())
    assert got == want and len(got) == 20
    # this corpus ships before ordering sometimes: the quantile table
    # must contain a negative delay (the shift contract is load-bearing)
    assert any(v < 0 for _, _, v in got)
    from itertools import groupby

    for _, rows in groupby(got, key=lambda r: r[0]):
        vals = [r[2] for r in rows]
        assert vals == sorted(vals)

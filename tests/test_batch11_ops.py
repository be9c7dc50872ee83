"""Exact DuckDB twins for the session-6 batch-11 operators:
customer_churn_by_quarter (quarter-over-quarter NOT-EXISTS churn via
the next-row test on lexsorted distinct pairs),
customer_priority_affinity (segment × priority mix shares),
part_brand_price_spread (grouped min/max fold)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "part"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_customer_churn_by_quarter_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        customer_churn_by_quarter)

    got = sorted((r["quarter"], r["n_active"], r["n_churned"],
                  r["churn_e4"])
                 for r in customer_churn_by_quarter(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH cq AS (SELECT DISTINCT o_custkey,
                           (year(o_orderdate)-1970)*4
                           + quarter(o_orderdate) - 1 q
                    FROM orders),
        mx AS (SELECT max(q) m FROM cq),
        ch AS (SELECT a.o_custkey, a.q FROM cq a, mx
               WHERE a.q < mx.m
                 AND NOT EXISTS (SELECT 1 FROM cq b
                                 WHERE b.o_custkey = a.o_custkey
                                   AND b.q = a.q + 1)),
        act AS (SELECT q, CAST(count(*) AS BIGINT) n FROM cq GROUP BY 1),
        chn AS (SELECT q, CAST(count(*) AS BIGINT) n FROM ch GROUP BY 1)
        SELECT act.q, act.n, CAST(coalesce(chn.n, 0) AS BIGINT),
               CAST(coalesce(chn.n, 0) * 10000 // act.n AS BIGINT)
        FROM act LEFT JOIN chn USING (q), mx WHERE act.q < mx.m
    """).fetchall())
    assert got == want and len(got) >= 4
    # churn is a valid share, non-degenerate in both directions somewhere
    assert all(0 <= r[2] <= r[1] and 0 <= r[3] <= 10000 for r in got)
    assert any(r[2] > 0 for r in got)
    assert any(r[2] < r[1] for r in got)


def test_customer_priority_affinity_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        customer_priority_affinity)

    got = sorted((r["c_mktsegment"], r["o_orderpriority"], r["n_orders"],
                  r["share_e4"])
                 for r in customer_priority_affinity(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH cells AS (
          SELECT c.c_mktsegment, o.o_orderpriority,
                 CAST(count(*) AS BIGINT) n
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2)
        SELECT c_mktsegment, o_orderpriority, n,
               CAST(n * 10000 // sum(n)
                        OVER (PARTITION BY c_mktsegment) AS BIGINT)
        FROM cells
    """).fetchall())
    assert got == want
    # order mass conserved, per-segment floor shares bounded
    n_orders = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert sum(r[2] for r in got) == n_orders
    from itertools import groupby

    for _, rows in groupby(got, key=lambda r: r[0]):
        rows = list(rows)
        s = sum(r[3] for r in rows)
        assert 10000 - len(rows) < s <= 10000


def test_part_brand_price_spread_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import part_brand_price_spread

    got = sorted((r["p_brand"], r["n_parts"], r["min_cents"],
                  r["max_cents"])
                 for r in part_brand_price_spread(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT p_brand, CAST(count(*) AS BIGINT),
               CAST(min(CAST(round(p_retailprice*100) AS BIGINT))
                    AS BIGINT),
               CAST(max(CAST(round(p_retailprice*100) AS BIGINT))
                    AS BIGINT)
        FROM part GROUP BY 1
    """).fetchall())
    assert got == want
    n_parts = con.sql("SELECT count(*) FROM part").fetchone()[0]
    assert sum(r[1] for r in got) == n_parts
    assert all(r[2] <= r[3] for r in got)

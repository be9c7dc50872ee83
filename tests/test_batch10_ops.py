"""Exact DuckDB twins for the session-6 batch-10 operators:
priority_status_cube (all four CUBE grouping sets from one fact pass),
orders_above_nation_avg (theta self-compare via integer
cross-multiply), order_value_quantiles_by_segment (join-then-quantile
composition)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "nation"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_priority_status_cube_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import priority_status_cube

    got = sorted((r["o_orderpriority"], r["o_orderstatus"],
                  r["n_orders"], r["cents"])
                 for r in priority_status_cube(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT coalesce(o_orderpriority, '*'),
               coalesce(o_orderstatus, '*'),
               CAST(count(*) AS BIGINT),
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                    AS BIGINT)
        FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """).fetchall())
    assert got == want
    # the grand-total cell equals the whole fact, and margins agree
    n_orders = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    grand = [r for r in got if r[0] == "*" and r[1] == "*"]
    assert len(grand) == 1 and grand[0][2] == n_orders
    p_margin = sum(r[2] for r in got if r[0] != "*" and r[1] == "*")
    s_margin = sum(r[2] for r in got if r[0] == "*" and r[1] != "*")
    base = sum(r[2] for r in got if r[0] != "*" and r[1] != "*")
    assert p_margin == s_margin == base == n_orders


def test_orders_above_nation_avg_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import orders_above_nation_avg

    got = sorted((r["nation"], r["n_orders"], r["n_above_avg"])
                 for r in orders_above_nation_avg(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH j AS (SELECT n.n_name nation, n.n_nationkey nk,
                          CAST(round(o.o_totalprice*100) AS BIGINT) cents
                   FROM orders o
                   JOIN customer c ON o.o_custkey = c.c_custkey
                   JOIN nation n ON c.c_nationkey = n.n_nationkey),
        s AS (SELECT nk, CAST(count(*) AS BIGINT) n,
                     CAST(sum(cents) AS BIGINT) tot
              FROM j GROUP BY 1)
        SELECT j.nation, CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE j.cents * s.n > s.tot)
                    AS BIGINT)
        FROM j JOIN s ON j.nk = s.nk GROUP BY 1
    """).fetchall())
    assert got == want
    # strictly-above-average is a proper minority unless all equal
    assert all(0 < r[2] < r[1] for r in got if r[1] > 1)
    n_orders = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert sum(r[1] for r in got) == n_orders


def test_order_value_quantiles_by_segment_matches_duckdb(
        ray_session, con):
    from sourmash_ray.pipelines.relational import (
        order_value_quantiles_by_segment)

    got = sorted((r["c_mktsegment"], r["q"], r["cents"])
                 for r in order_value_quantiles_by_segment(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH j AS (SELECT c.c_mktsegment,
                          CAST(round(o.o_totalprice*100) AS BIGINT) cents
                   FROM orders o
                   JOIN customer c ON o.o_custkey = c.c_custkey)
        SELECT c_mktsegment, CAST(q AS DOUBLE), CAST(v AS BIGINT)
        FROM (SELECT c_mktsegment, unnest([0.25,0.5,0.75,0.9]) q,
                     unnest(quantile_disc(cents, [0.25,0.5,0.75,0.9])) v
              FROM j GROUP BY c_mktsegment)
    """).fetchall())
    assert got == want and len(got) == 20  # 5 segments x 4 quantiles
    # quantiles non-decreasing inside a segment (got sorted by seg, q)
    from itertools import groupby

    for _, rows in groupby(got, key=lambda r: r[0]):
        vals = [r[2] for r in rows]
        assert vals == sorted(vals)

"""Batch-38: line_weighted_value_median_by_priority (weighted
discrete median via the value-histogram cumsum) and
orders_month_seasonality (integer permille share within year) vs
their DuckDB twins."""

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


def test_weighted_median_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        line_weighted_value_median_by_priority)

    tbl = line_weighted_value_median_by_priority(SF)
    got = sorted(zip(tbl["o_orderpriority"].to_pylist(),
                     tbl["median_cents"].to_pylist()))
    want = sorted(tuple(r) for r in con.sql("""
        WITH w AS (SELECT l_orderkey, count(*) AS nl
                   FROM lineitem GROUP BY 1),
        j AS (SELECT o_orderpriority AS p,
                     CAST(round(o_totalprice * 100) AS BIGINT) AS c, nl
              FROM orders JOIN w ON o_orderkey = l_orderkey),
        g AS (SELECT p, c, sum(nl) AS wv FROM j GROUP BY 1, 2),
        o AS (SELECT p, c, sum(wv) OVER (PARTITION BY p ORDER BY c)
                     AS cw, sum(wv) OVER (PARTITION BY p) AS tw FROM g)
        SELECT p, CAST(min(c) AS BIGINT)
        FROM o WHERE cw >= (tw + 1) // 2 GROUP BY 1
    """).fetchall())
    assert got == want
    # the weighted median is an actual order value of its priority
    for p, v in got:
        n = con.sql(f"""
            SELECT count(*) FROM orders
            WHERE o_orderpriority = '{p}'
              AND CAST(round(o_totalprice * 100) AS BIGINT) = {v}
        """).fetchone()[0]
        assert n > 0


def test_orders_month_seasonality_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import orders_month_seasonality

    tbl = orders_month_seasonality(SF)
    got = sorted(zip(tbl["year"].to_pylist(), tbl["month"].to_pylist(),
                     tbl["n_orders"].to_pylist(),
                     tbl["permille"].to_pylist()))
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
                       CAST(month(o_orderdate) AS BIGINT) AS m,
                       count(*) AS n
                   FROM orders GROUP BY 1, 2)
        SELECT y, m, n, CAST(n * 1000 // sum(n) OVER (PARTITION BY y)
                             AS BIGINT)
        FROM c
    """).fetchall())
    assert got == want
    # permille shares within a year sum to ≤ 1000 (floor) and > 900
    from collections import defaultdict

    per_year = defaultdict(int)
    for y, _, _, pm in got:
        per_year[y] += pm
    for y, s in per_year.items():
        assert 900 < s <= 1000

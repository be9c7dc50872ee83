"""Exact DuckDB twins for the session-6 batch-22 operators:
order_top_line_share (within-order value-concentration deciles via
partial-combinable max+sum) and revenue_hhi_by_nation
(exact-integer Herfindahl parts with the floor-of-cents dollar
grain)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_order_top_line_share_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import order_top_line_share

    got = sorted((r["share_decile"], r["n_orders"])
                 for r in order_top_line_share(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH per AS (
          SELECT l_orderkey,
                 max(CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT))) mx,
                 sum(CAST(round(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(round(l_discount*100) AS BIGINT))) tot
          FROM lineitem GROUP BY 1)
        SELECT CAST(mx * 10 // tot AS BIGINT), CAST(count(*) AS BIGINT)
        FROM per GROUP BY 1
    """).fetchall())
    assert got == want
    # deciles live in [1, 10]: max line is at least 1/n and at most all
    assert all(1 <= d <= 10 for d, _ in got)
    n_orders = con.sql(
        "SELECT count(DISTINCT l_orderkey) FROM lineitem").fetchone()[0]
    assert sum(n for _, n in got) == n_orders
    # single-line orders land in decile 10 exactly
    singles = con.sql("""
        SELECT count(*) FROM (SELECT l_orderkey FROM lineitem
                              GROUP BY 1 HAVING count(*) = 1)
    """).fetchone()[0]
    assert dict(got).get(10, 0) >= singles


def test_revenue_hhi_by_nation_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import revenue_hhi_by_nation

    got = sorted((r["nation"], r["n_customers"], r["total_dollars"],
                  r["sumsq_dollars"])
                 for r in revenue_hhi_by_nation(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH per AS (SELECT o_custkey,
                            CAST(sum(CAST(round(o_totalprice*100)
                                AS BIGINT) // 100) AS BIGINT) x
                     FROM orders GROUP BY 1)
        SELECT n.n_name, CAST(count(*) AS BIGINT),
               CAST(sum(per.x) AS BIGINT),
               CAST(sum(per.x * per.x) AS BIGINT)
        FROM per JOIN customer c ON per.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
    """).fetchall())
    assert got == want
    # HHI bounds: total²/n <= sumsq <= total² (Cauchy–Schwarz / trivial)
    for _, n, tot, ssq in got:
        assert tot * tot <= ssq * n          # CS lower bound on Σx²
        assert ssq <= tot * tot              # single-customer upper

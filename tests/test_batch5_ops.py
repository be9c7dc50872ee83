"""Exact DuckDB twins for the session-6 batch-5 operators:
tax_charge_summary (the l_tax leg of Q1 in exact 1e6 integers),
order_linenumber_integrity (permutation-of-1..n moment fingerprint),
user_value_deciles (SQL-ntile spend segmentation),
ship_month_profile (month-of-year seasonality)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_tax_charge_summary_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import tax_charge_summary

    got = sorted((r["l_returnflag"], r["l_linestatus"], r["n_lines"],
                  r["charge_e6"], r["tax_e6"])
                 for r in tax_charge_summary(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT),
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT))
                        * (100 + CAST(round(l_tax*100) AS BIGINT)))
                    AS BIGINT),
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT))
                        * CAST(round(l_tax*100) AS BIGINT)) AS BIGINT)
        FROM lineitem GROUP BY 1, 2
    """).fetchall())
    assert got == want and len(got) == 6
    # charge − tax component == the discounted-price e6 mass
    disc_e6 = con.sql("""
        SELECT CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(round(l_discount*100) AS BIGINT))
                        * 100) AS BIGINT) FROM lineitem
    """).fetchone()[0]
    assert sum(r[3] - r[4] for r in got) == disc_e6


def test_order_linenumber_integrity_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        order_linenumber_integrity)

    got = sorted((r["n_lines"], r["is_contiguous"], r["n_orders"])
                 for r in order_linenumber_integrity(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH per AS (
          SELECT l_orderkey, CAST(count(*) AS BIGINT) n,
                 CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) s,
                 CAST(sum(CAST(l_linenumber AS BIGINT)
                          * CAST(l_linenumber AS BIGINT)) AS BIGINT) s2
          FROM lineitem GROUP BY 1)
        SELECT n, CAST((2*s = n*(n+1) AND 6*s2 = n*(n+1)*(2*n+1))
                       AS BIGINT), CAST(count(*) AS BIGINT)
        FROM per GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # every order lands in exactly one cell, and both classes occur
    n_orders = con.sql(
        "SELECT count(DISTINCT l_orderkey) FROM lineitem").fetchone()[0]
    assert sum(r[2] for r in got) == n_orders
    assert {r[1] for r in got} == {0, 1}
    # the moment fingerprint agrees with the direct multiset test
    direct = con.sql("""
        WITH per AS (
          SELECT l_orderkey,
                 CAST((count(*) = max(l_linenumber)
                       AND min(l_linenumber) = 1
                       AND count(*) = count(DISTINCT l_linenumber))
                      AS BIGINT) ok
          FROM lineitem GROUP BY 1)
        SELECT sum(ok) FROM per
    """).fetchone()[0]
    assert sum(r[2] for r in got if r[1] == 1) == direct


def test_user_value_deciles_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import user_value_deciles

    got = sorted((r["decile"], r["n_users"], r["sum_value_cents"])
                 for r in user_value_deciles(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH per AS (
          SELECT user_id,
                 CAST(sum(CAST(round(coalesce(value,0)*100) AS BIGINT))
                      AS BIGINT) c
          FROM events GROUP BY 1),
        t AS (SELECT c, ntile(10) OVER (ORDER BY c DESC, user_id) d
              FROM per)
        SELECT CAST(d AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(sum(c) AS BIGINT)
        FROM t GROUP BY 1
    """).fetchall())
    assert got == want
    # user + cent mass conserved; decile means non-increasing
    tot = con.sql("""
        SELECT count(DISTINCT user_id),
               CAST(sum(CAST(round(coalesce(value,0)*100) AS BIGINT))
                    AS BIGINT) FROM events
    """).fetchone()
    assert (sum(r[1] for r in got), sum(r[2] for r in got)) == tot
    means = [r[2] / r[1] for r in got]  # got sorted by decile
    assert all(a >= b for a, b in zip(means, means[1:]))


def test_ship_month_profile_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import ship_month_profile

    got = sorted((r["month"], r["l_returnflag"], r["n_lines"],
                  r["qty_e2"]) for r in ship_month_profile(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT CAST(month(l_shipdate) AS BIGINT), l_returnflag,
               CAST(count(*) AS BIGINT),
               CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
        FROM lineitem GROUP BY 1, 2
    """).fetchall())
    assert got == want
    assert {r[0] for r in got} <= set(range(1, 13))
    n_lines = con.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    assert sum(r[2] for r in got) == n_lines

"""Exact DuckDB twins for the session-6 batch-7 operators:
nation_flow_matrix (the full 25×25 trade-flow matrix on the shared Q7
spine), revenue_pareto_customers (integer Pareto coverage curve),
user_day_regularity (active-days/span habituality deciles),
conv_verbosity_histogram (assistant/user char-ratio buckets composed
on conv_role_balance)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("nation", "supplier", "customer", "orders", "lineitem",
              "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_nation_flow_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        cross_border_trade, nation_flow_matrix)

    got = sorted((r["cust_nation"], r["supp_nation"], r["revenue_e4"])
                 for r in nation_flow_matrix(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH rev AS (
          SELECT l_orderkey, s.s_nationkey snk,
                 CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                          * (100 - CAST(round(l_discount*100) AS BIGINT)))
                      AS BIGINT) r
          FROM lineitem JOIN supplier s ON l_suppkey = s.s_suppkey
          GROUP BY 1, 2),
        j AS (SELECT c.c_nationkey cnk, rev.snk, rev.r
              FROM rev JOIN orders o ON rev.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey)
        SELECT nc.n_name, ns.n_name, CAST(sum(j.r) AS BIGINT)
        FROM j JOIN nation nc ON j.cnk = nc.n_nationkey
        JOIN nation ns ON j.snk = ns.n_nationkey
        GROUP BY 1, 2
    """).fetchall())
    assert got == want and len(got) > 25
    # the matrix marginalizes exactly onto cross_border_trade
    split = {r["nation"]: (r["local_rev_e4"], r["cross_rev_e4"])
             for r in cross_border_trade(SF).take_all()}
    by_cust: dict = {}
    for cn, sn, rev in got:
        loc, cro = by_cust.get(cn, (0, 0))
        by_cust[cn] = (loc + (rev if cn == sn else 0),
                       cro + (rev if cn != sn else 0))
    assert by_cust == split


def test_revenue_pareto_customers_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import revenue_pareto_customers

    got = sorted((r["p_pct"], r["n_customers"], r["cum_cents"])
                 for r in revenue_pareto_customers(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH per AS (SELECT o_custkey,
                            CAST(sum(CAST(round(o_totalprice*100)
                                          AS BIGINT)) AS BIGINT) c
                     FROM orders GROUP BY 1),
        r AS (SELECT c, row_number() OVER (ORDER BY c DESC, o_custkey) rn,
                     sum(c) OVER (ORDER BY c DESC, o_custkey
                                  ROWS UNBOUNDED PRECEDING) cum
              FROM per),
        t AS (SELECT CAST(sum(c) AS BIGINT) tot FROM per)
        SELECT CAST(u.p AS BIGINT), CAST(min(rn) AS BIGINT),
               CAST(min_by(cum, rn) AS BIGINT)
        FROM r, t, (SELECT unnest([50,80,90,95]) AS p) u
        WHERE cum * 100 >= u.p * t.tot GROUP BY 1
    """).fetchall())
    assert got == want and len(got) == 4
    # coverage counts grow with p, and each cum really covers p% of total
    ns = [n for _, n, _ in got]
    assert ns == sorted(ns)
    tot = con.sql("""SELECT CAST(sum(CAST(round(o_totalprice*100)
                     AS BIGINT)) AS BIGINT) FROM orders""").fetchone()[0]
    for p, _, cum in got:
        assert cum * 100 >= p * tot


def test_user_day_regularity_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import user_day_regularity

    got = sorted((r["regularity_decile"], r["n_users"])
                 for r in user_day_regularity(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH w AS (SELECT DISTINCT user_id,
                          CAST(epoch_us(ts) AS BIGINT)//86400000000 k
                   FROM events),
        per AS (SELECT user_id, count(*) a, max(k)-min(k)+1 s
                FROM w GROUP BY 1)
        SELECT CAST(a*10//s AS BIGINT), CAST(count(*) AS BIGINT)
        FROM per GROUP BY 1
    """).fetchall())
    assert got == want and len(got) >= 2  # non-degenerate at day grain
    n_users = con.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(n for _, n in got) == n_users
    assert all(0 <= d <= 10 for d, _ in got)


def test_conv_verbosity_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import (
        conv_verbosity_histogram)
    from sourmash_ray.sources.transcripts import transcripts_path

    turns = transcripts_path(SF)
    got = sorted((r["ratio_bucket_e2"], r["n_convs"])
                 for r in conv_verbosity_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql(f"""
        WITH per AS (
          SELECT conv_id,
                 CAST(coalesce(sum(length(coalesce(text,'')))
                      FILTER (role = 'assistant'), 0) AS BIGINT) a,
                 greatest(CAST(coalesce(sum(length(coalesce(text,'')))
                      FILTER (role = 'user'), 0) AS BIGINT), 1) u
          FROM read_parquet('{turns}/*.parquet') GROUP BY conv_id)
        SELECT CAST(least(a*100//u, 500) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM per GROUP BY 1
    """).fetchall())
    assert got == want
    n_convs = con.sql(f"""SELECT count(DISTINCT conv_id)
        FROM read_parquet('{turns}/*.parquet')""").fetchone()[0]
    assert sum(n for _, n in got) == n_convs
    assert all(0 <= b <= 500 for b, _ in got)

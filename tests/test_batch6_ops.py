"""Exact DuckDB twins for the session-6 batch-6 operators:
return_rate_by_month (exact floor-division return-rate seasonality),
acctbal_activity_matrix (credit-risk × order-count contingency over a
hash-join exchange), time_to_first_purchase_quantiles (funnel latency
with the quantile_disc index rule)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_return_rate_by_month_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import return_rate_by_month

    got = sorted((r["month"], r["n_lines"], r["n_returned"], r["rate_e4"])
                 for r in return_rate_by_month(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT CAST(month(l_shipdate) AS BIGINT) m,
                          CAST(count(*) AS BIGINT) n,
                          CAST(count(*) FILTER (WHERE l_returnflag='R')
                               AS BIGINT) r
                   FROM lineitem GROUP BY 1)
        SELECT m, n, r, CAST(r * 10000 // n AS BIGINT) FROM c
    """).fetchall())
    assert got == want and len(got) == 12
    # rates are valid shares and the returned mass matches the flag count
    assert all(0 <= r[3] <= 10000 for r in got)
    n_r = con.sql("SELECT count(*) FROM lineitem "
                  "WHERE l_returnflag = 'R'").fetchone()[0]
    assert sum(r[2] for r in got) == n_r


def test_acctbal_activity_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import acctbal_activity_matrix

    got = sorted((r["bal_neg"], r["orders_bucket"], r["n_customers"],
                  r["sum_acctbal_cents"])
                 for r in acctbal_activity_matrix(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH per AS (SELECT o_custkey, CAST(count(*) AS BIGINT) n
                     FROM orders GROUP BY 1),
        j AS (SELECT CAST(c.c_acctbal < 0 AS BIGINT) neg,
                     least(per.n, 10) b,
                     CAST(round(c.c_acctbal * 100) AS BIGINT) cents
              FROM per JOIN customer c ON per.o_custkey = c.c_custkey)
        SELECT neg, CAST(b AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(sum(cents) AS BIGINT)
        FROM j GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # every customer lands in exactly one cell (testdata: all ordered)
    n_cust = con.sql("SELECT count(*) FROM customer").fetchone()[0]
    assert sum(r[2] for r in got) == n_cust
    assert {r[0] for r in got} == {0, 1}  # both risk classes occur


def test_time_to_first_purchase_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import (
        time_to_first_purchase_quantiles)

    got = sorted((r["q"], r["delta_us"])
                 for r in time_to_first_purchase_quantiles(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH f AS (SELECT user_id,
                     min(CAST(epoch_us(ts) AS BIGINT))
                         FILTER (WHERE event_type='signup') s,
                     min(CAST(epoch_us(ts) AS BIGINT))
                         FILTER (WHERE event_type='purchase') p
                   FROM events GROUP BY 1),
        d AS (SELECT p - s delta FROM f
              WHERE s IS NOT NULL AND p IS NOT NULL AND p >= s)
        SELECT CAST(unnest([0.25,0.5,0.75,0.9]) AS DOUBLE),
               CAST(unnest(quantile_disc(delta, [0.25,0.5,0.75,0.9]))
                    AS BIGINT)
        FROM d
    """).fetchall())
    assert got == want and len(got) == 4
    vals = [v for _, v in got]  # got sorted by q ascending
    assert vals == sorted(vals) and all(v >= 0 for v in vals)

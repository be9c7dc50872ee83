"""Exact DuckDB twins + invariants for the batch-34 operators:
user_peak_weekday_histogram (mode-per-user then histogram) and
customer_cohort_segment_matrix (first-order month × segment)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders", "customer"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_user_peak_weekday_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import (
        user_peak_weekday_histogram)

    got = sorted((r["isodow"], r["n_users"])
                 for r in user_peak_weekday_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT user_id, CAST(isodow(ts) AS BIGINT)
                       AS isodow, count(*) AS n
                   FROM events GROUP BY 1, 2),
        p AS (SELECT user_id, isodow FROM
              (SELECT c.*, row_number() OVER (PARTITION BY user_id
                      ORDER BY n DESC, isodow) AS rn FROM c)
              WHERE rn = 1)
        SELECT isodow, CAST(count(*) AS BIGINT) FROM p GROUP BY 1
    """).fetchall())
    assert got == want
    # exactly one peak weekday per user; ISO range
    n_users = con.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(n for _, n in got) == n_users
    assert all(1 <= d <= 7 for d, _ in got)


def test_customer_cohort_segment_matrix_matches_duckdb(ray_session,
                                                       con):
    import pandas as pd

    from sourmash_ray.pipelines.relational import (
        customer_cohort_segment_matrix)

    df = customer_cohort_segment_matrix(SF).to_pandas()
    got = sorted((str(pd.Timestamp(m)), s, int(n)) for m, s, n in
                 zip(df["month"], df["c_mktsegment"],
                     df["n_customers"]))
    want = sorted((str(pd.Timestamp(m)), s, int(n))
                  for m, s, n in con.sql("""
        WITH f AS (SELECT o_custkey, min(o_orderdate) AS fd
                   FROM orders GROUP BY 1)
        SELECT date_trunc('month', fd), c_mktsegment, count(*)
        FROM f JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # every ordering customer lands in exactly one cohort cell
    n_cust = con.sql(
        "SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert sum(n for *_, n in got) == n_cust

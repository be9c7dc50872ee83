"""Batch-39: transition_gap_median_matrix (per-transition-pair exact
discrete median latency) and value_trend_by_segment (sign of
last-minus-first order value per customer × segment) vs DuckDB."""

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


def test_transition_gap_median_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import (
        event_transition_counts, transition_gap_median_matrix)

    tbl = transition_gap_median_matrix(SF)
    got = sorted(zip(tbl["prev_type"].to_pylist(),
                     tbl["next_type"].to_pylist(),
                     tbl["median_gap_s"].to_pylist()))
    want = sorted(tuple(r) for r in con.sql("""
        WITH s AS (SELECT event_type AS next_type,
              lag(event_type) OVER w AS prev_type,
              (CAST(epoch_us(ts) AS BIGINT)
               - CAST(epoch_us(lag(ts) OVER w) AS BIGINT))
                  // 1000000 AS gap_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        SELECT prev_type, next_type,
               CAST(quantile_disc(gap_s, 0.5) AS BIGINT)
        FROM s WHERE prev_type IS NOT NULL GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # the matrix covers exactly the observed transition pairs
    pairs = {(r["prev_type"], r["next_type"])
             for r in event_transition_counts(SF).take_all()}
    assert {(a, b) for a, b, _ in got} == pairs
    assert all(g >= 0 for *_, g in got)


def test_value_trend_by_segment_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import value_trend_by_segment

    got = sorted((r["c_mktsegment"], r["trend_sign"], r["n_customers"])
                 for r in value_trend_by_segment(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH r AS (SELECT o_custkey,
              CAST(round(o_totalprice * 100) AS BIGINT) AS c,
              row_number() OVER w AS rn,
              count(*) OVER (PARTITION BY o_custkey) AS n
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey)),
        f AS (SELECT o_custkey,
              max(CASE WHEN rn = 1 THEN c END) AS first_c,
              max(CASE WHEN rn = n THEN c END) AS last_c
              FROM r GROUP BY o_custkey)
        SELECT c_mktsegment, CAST(sign(last_c - first_c) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM f JOIN customer ON o_custkey = c_custkey
        GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # single-order customers have trend 0; every ordering customer
    # lands in exactly one cell
    n_cust = con.sql(
        "SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert sum(n for *_, n in got) == n_cust
    assert all(s in (-1, 0, 1) for _, s, _n in got)

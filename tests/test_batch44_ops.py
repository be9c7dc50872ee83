"""Batch-44: dim_ident_integrity (name-ident vs surrogate-key
reconciliation over both dimensions) and
time_to_first_shipment_quantiles (order-grain fulfillment latency with
the +100000-day shift) vs DuckDB."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("supplier", "customer", "orders", "lineitem"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_dim_ident_integrity_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import dim_ident_integrity

    tbl = dim_ident_integrity(SF)
    got = sorted(zip(tbl["dim"].to_pylist(), tbl["n_rows"].to_pylist(),
                     tbl["n_matched"].to_pylist()))
    want = sorted(tuple(r) for r in con.sql("""
        SELECT 'supplier', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN CAST(string_split(s_name, '#')[2]
                        AS BIGINT) = s_suppkey THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM supplier
        UNION ALL
        SELECT 'customer', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN CAST(string_split(c_name, '#')[2]
                        AS BIGINT) = c_custkey THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM customer
    """).fetchall())
    assert got == want
    # this synthetic corpus is integral: every ident matches its key
    assert all(n == m for _, n, m in got)
    assert len(got) == 2


def test_time_to_first_shipment_quantiles_matches_duckdb(ray_session,
                                                         con):
    from sourmash_ray.pipelines.relational import (
        time_to_first_shipment_quantiles)

    tbl = time_to_first_shipment_quantiles(SF)
    got = sorted(zip(tbl["o_orderpriority"].to_pylist(),
                     tbl["q"].to_pylist(), tbl["value"].to_pylist()))
    want = sorted(tuple(r) for r in con.sql("""
        WITH f AS (SELECT l_orderkey,
                min(CAST(epoch_us(l_shipdate) AS BIGINT)
                    // 86400000000) AS fd
                FROM lineitem GROUP BY 1),
        d AS (SELECT o_orderpriority AS p,
              fd - CAST(epoch_us(o_orderdate) AS BIGINT)
                 // 86400000000 + 100000 AS delay
              FROM orders JOIN f ON o_orderkey = l_orderkey)
        SELECT p, CAST(q AS DOUBLE), CAST(v AS BIGINT)
        FROM (SELECT p, unnest([0.25, 0.5, 0.75, 0.9]) AS q,
                     unnest(quantile_disc(delay,
                            [0.25, 0.5, 0.75, 0.9])) AS v
              FROM d GROUP BY p)
    """).fetchall())
    assert got == want
    # order-grain first-ship delay ≤ every per-line delay of the same
    # order, so the shifted values stay positive and monotone in q
    for i in range(1, len(got)):
        if got[i][0] == got[i - 1][0]:
            assert got[i][2] >= got[i - 1][2]
    assert all(v > 0 for *_, v in got)

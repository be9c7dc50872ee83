"""Batch-62: order_cents_census (sub-dollar digit uniformity audit)
and returns_by_line_position (positional return-bias slice) vs their
DuckDB twins."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_order_cents_census_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import order_cents_census

    got = {r["cents"]: r["n_orders"]
           for r in order_cents_census(SF).take_all()}
    con = duckdb.connect()
    want = dict(con.sql(f"""
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) % 100,
               count(*)
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1
        """).fetchall())
    assert got == want
    assert set(got) <= set(range(100))
    n = con.sql(f"SELECT count(*) FROM read_parquet("
                f"'{SF}/orders.parquet')").fetchone()[0]
    assert sum(got.values()) == n


def test_returns_by_line_position_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import (
        returns_by_line_position)

    got = {r["l_linenumber"]: (r["n_lines"], r["n_returned"],
                               r["returned_permille"])
           for r in returns_by_line_position(SF).take_all()}
    con = duckdb.connect()
    want = {ln: (n, r, p) for ln, n, r, p in con.sql(f"""
        WITH g AS (
          SELECT CAST(l_linenumber AS BIGINT) AS l_linenumber,
                 count(*) AS n_lines,
                 CAST(sum(CASE WHEN l_returnflag = 'R'
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
          FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1)
        SELECT l_linenumber, n_lines, n_returned,
               1000 * n_returned // n_lines
        FROM g""").fetchall()}
    assert got == want
    # every line lands in exactly one position cell
    n_lines = con.sql(f"SELECT count(*) FROM read_parquet("
                      f"'{SF}/lineitem.parquet')").fetchone()[0]
    assert sum(n for n, _, _ in got.values()) == n_lines
    assert all(0 <= p <= 1000 for _, _, p in got.values())

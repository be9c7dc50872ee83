"""Batch-45: returns_by_order_size (return-risk × basket-size
interaction) and conv_tool_density_histogram (agenticness deciles)
vs DuckDB."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    c.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
          f"read_parquet('{SF}/lineitem.parquet')")
    c.sql(f"CREATE VIEW transcripts AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    return c


def test_returns_by_order_size_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        order_fanout_histogram, returns_by_order_size)

    got = sorted((r["n_lines"], r["has_return"], r["n_orders"])
                 for r in returns_by_order_size(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT l_orderkey, count(*) AS n_lines,
                          max(CASE WHEN l_returnflag = 'R'
                              THEN 1 ELSE 0 END) AS hr
                   FROM lineitem GROUP BY 1)
        SELECT CAST(n_lines AS BIGINT), hr = 1,
               CAST(count(*) AS BIGINT)
        FROM c GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # marginalizing the return flag reproduces the fanout histogram
    from collections import Counter

    marg = Counter()
    for n_lines, _, n_orders in got:
        marg[n_lines] += n_orders
    fan = {r["n_items"]: r["n_orders"]
           for r in order_fanout_histogram(SF).take_all()}
    assert dict(marg) == fan


def test_conv_tool_density_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import (
        conv_tool_density_histogram)

    got = sorted((r["density_decile"], r["n_convs"])
                 for r in conv_tool_density_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT conv_id, count(*) AS n,
                sum(CASE WHEN tool IS NOT NULL AND tool <> ''
                    THEN 1 ELSE 0 END) AS nt
                FROM transcripts GROUP BY 1)
        SELECT CAST(nt * 10 // n AS BIGINT), CAST(count(*) AS BIGINT)
        FROM c GROUP BY 1
    """).fetchall())
    assert got == want
    n_convs = con.sql(
        "SELECT count(DISTINCT conv_id) FROM transcripts").fetchone()[0]
    assert sum(n for _, n in got) == n_convs
    assert all(0 <= d <= 10 for d, _ in got)

"""Exact DuckDB twins for the session-6 batch-20 operators:
tool_copresence_pairs (conversation tool baskets) and
customer_cohort_sizes (first-order acquisition cohorts)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW orders AS SELECT * FROM "
          f"read_parquet('{SF}/orders.parquet')")
    return c


def test_tool_copresence_pairs_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import tool_copresence_pairs
    from sourmash_ray.sources.transcripts import transcripts_path

    turns = transcripts_path(SF)
    got = sorted((r["tool_a"], r["tool_b"], r["n_convs"])
                 for r in tool_copresence_pairs(SF).take_all())
    want = sorted(tuple(r) for r in con.sql(f"""
        WITH t AS (SELECT DISTINCT conv_id, tool
                   FROM read_parquet('{turns}/*.parquet')
                   WHERE tool IS NOT NULL AND tool <> '')
        SELECT a.tool, b.tool, CAST(count(*) AS BIGINT)
        FROM t a JOIN t b ON a.conv_id = b.conv_id AND a.tool < b.tool
        GROUP BY 1, 2
    """).fetchall())
    assert got == want and len(got) >= 1
    assert all(a < b for a, b, _ in got)
    # a pair can't outnumber either tool's conversation presence
    presence = dict(con.sql(f"""
        SELECT tool, count(DISTINCT conv_id)
        FROM read_parquet('{turns}/*.parquet')
        WHERE tool IS NOT NULL AND tool <> '' GROUP BY 1""").fetchall())
    for a, b, n in got:
        assert n <= min(presence[a], presence[b])


def test_customer_cohort_sizes_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import customer_cohort_sizes

    got = sorted((r["cohort_month"], r["n_customers"])
                 for r in customer_cohort_sizes(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH f AS (SELECT o_custkey,
                          min((year(o_orderdate)-1970)*12
                              + month(o_orderdate) - 1) mo
                   FROM orders GROUP BY 1)
        SELECT CAST(mo AS BIGINT), CAST(count(*) AS BIGINT)
        FROM f GROUP BY 1
    """).fetchall())
    assert got == want
    n_cust = con.sql(
        "SELECT count(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert sum(n for _, n in got) == n_cust

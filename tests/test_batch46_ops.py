"""Batch-46: segment_nation_matrix (customer-base composition) and
conv_first_tool_counts (tool-adoption entry point) vs DuckDB."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    for t in ("customer", "nation"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    c.sql(f"CREATE VIEW transcripts AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    return c


def test_segment_nation_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import segment_nation_matrix

    got = sorted((r["n_name"], r["c_mktsegment"], r["n_customers"])
                 for r in segment_nation_matrix(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT)
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    """).fetchall())
    assert got == want
    total = con.sql("SELECT count(*) FROM customer").fetchone()[0]
    assert sum(n for *_, n in got) == total


def test_conv_first_tool_counts_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import (
        conv_first_tool_counts)

    got = sorted((r["tool"], r["n_convs"])
                 for r in conv_first_tool_counts(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH t AS (SELECT conv_id, turn_idx, tool FROM transcripts
                   WHERE tool IS NOT NULL AND tool <> ''),
        r AS (SELECT conv_id, tool,
              row_number() OVER (PARTITION BY conv_id
                                 ORDER BY turn_idx) AS rn
              FROM t)
        SELECT tool, CAST(count(*) AS BIGINT)
        FROM r WHERE rn = 1 GROUP BY 1
    """).fetchall())
    assert got == want
    # one entry per tool-using conversation
    n_tool_convs = con.sql("""
        SELECT count(DISTINCT conv_id) FROM transcripts
        WHERE tool IS NOT NULL AND tool <> ''
    """).fetchone()[0]
    assert sum(n for _, n in got) == n_tool_convs

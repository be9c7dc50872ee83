"""Exact DuckDB twins + invariants for the batch-35 operators:
response_amplification_histogram (user→assistant char-ratio buckets)
and order_fanout_by_priority (order line counts × priority)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    for t in ("orders", "lineitem"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    c.sql(f"CREATE VIEW transcripts AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    return c


def test_response_amplification_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import (
        response_amplification_histogram)

    got = sorted((r["bucket"], r["n_pairs"])
                 for r in response_amplification_histogram(SF)
                 .take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH b AS (SELECT conv_id, turn_idx, role,
                length(coalesce(text, '')) AS nch FROM transcripts),
        p AS (SELECT a.nch AS uc, c.nch AS ac
              FROM b a JOIN b c
                ON a.conv_id = c.conv_id
               AND c.turn_idx = a.turn_idx + 1
              WHERE a.role = 'user' AND c.role = 'assistant')
        SELECT CAST(least((ac * 100 // greatest(uc, 1)) // 25, 40)
                    AS BIGINT), CAST(count(*) AS BIGINT)
        FROM p GROUP BY 1
    """).fetchall())
    assert got == want
    # pair inventory: every user→assistant adjacency counted once
    total = con.sql("""
        SELECT count(*) FROM transcripts a JOIN transcripts c
          ON a.conv_id = c.conv_id AND c.turn_idx = a.turn_idx + 1
        WHERE a.role = 'user' AND c.role = 'assistant'
    """).fetchone()[0]
    assert sum(n for _, n in got) == total
    assert all(0 <= b <= 40 for b, _ in got)


def test_order_fanout_by_priority_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import order_fanout_by_priority

    got = sorted((r["o_orderpriority"], r["n_lines"], r["n_orders"])
                 for r in order_fanout_by_priority(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT l_orderkey, count(*) AS n_lines
                   FROM lineitem GROUP BY 1)
        SELECT o_orderpriority, n_lines, CAST(count(*) AS BIGINT)
        FROM c JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # marginals conserve: Σ n_orders·n_lines == total lineitems whose
    # order exists; Σ n_orders == distinct ordered orderkeys
    n_li = con.sql("""SELECT count(*) FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders)
    """).fetchone()[0]
    assert sum(n * k for _, k, n in got) == n_li

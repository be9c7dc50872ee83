"""Batch-42: token_position_length_profile (positional token-length
census, map-only) vs DuckDB, plus reconciliation with the per-doc
token stats."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

_WS = "[ \\t\\n\\r\\f\\v]+"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM "
          f"read_parquet('{SF}/documents.parquet')")
    return c


def test_token_position_length_profile_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import (
        token_position_length_profile, token_stats_docs)

    got = sorted((r["position"], r["n_tokens"], r["sum_len"])
                 for r in token_position_length_profile(SF).take_all())
    want = sorted(tuple(r) for r in con.sql(f"""
        WITH t AS (SELECT doc_id,
                list_filter(string_split(trim(regexp_replace(
                    coalesce(text, ''), '{_WS}', ' ', 'g')), ' '),
                    x -> len(x) > 0) AS toks
                FROM documents),
        z AS (SELECT unnest(toks) AS tok,
                     unnest(range(1, len(toks) + 1)) AS pos
              FROM t WHERE len(toks) > 0)
        SELECT CAST(least(pos, 4) AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(sum(len(tok)) AS BIGINT)
        FROM z GROUP BY 1
    """).fetchall())
    assert got == want
    # totals reconcile with token_stats_docs: Σ n_tokens across
    # buckets == Σ per-doc token counts; every doc with ≥1 token
    # contributes exactly one position-1 token
    per_doc = token_stats_docs(SF).to_pandas()
    assert sum(n for _, n, _s in got) == int(per_doc["n_tokens"].sum())
    first = dict((p, n) for p, n, _ in got)[1]
    assert first == int((per_doc["n_tokens"] > 0).sum())

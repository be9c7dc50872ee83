"""Batch-40: peak_hourly_rate_histogram (per-user burstiness, max of
hourly counts) and conv_dup_depth_matrix (exact-re-log fingerprint ×
turn count interaction) vs DuckDB."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM "
          f"read_parquet('{SF}/events.parquet')")
    c.sql(f"CREATE VIEW transcripts AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    return c


def test_peak_hourly_rate_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import (
        peak_hourly_rate_histogram)

    got = sorted((r["peak_hourly"], r["n_users"])
                 for r in peak_hourly_rate_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT user_id, date_trunc('hour', ts) AS h,
                          count(*) AS n
                   FROM events GROUP BY 1, 2),
        m AS (SELECT user_id, max(n) AS peak FROM c GROUP BY 1)
        SELECT CAST(peak AS BIGINT), CAST(count(*) AS BIGINT)
        FROM m GROUP BY 1
    """).fetchall())
    assert got == want
    n_users = con.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(n for _, n in got) == n_users
    assert all(p >= 1 for p, _ in got)


def test_conv_dup_depth_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import (
        conv_dup_depth_matrix)

    got = sorted((r["is_dup"], r["n_turns"], r["n_convs"])
                 for r in conv_dup_depth_matrix(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH f AS (SELECT conv_id,
                md5(string_agg(coalesce(text, ''), chr(31)
                    ORDER BY turn_idx)) AS fp,
                count(*) AS n_turns
                FROM transcripts GROUP BY conv_id),
        g AS (SELECT fp, count(*) AS k FROM f GROUP BY fp)
        SELECT (k >= 2), CAST(n_turns AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM f JOIN g USING (fp) GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # every conversation lands in exactly one cell, and the dup rows
    # reconcile with exact_dedup_conversations' group inventory
    n_convs = con.sql(
        "SELECT count(DISTINCT conv_id) FROM transcripts").fetchone()[0]
    assert sum(n for *_, n in got) == n_convs
    from sourmash_ray.pipelines.transcriptops import (
        exact_dedup_conversations)

    dup_convs = sum(r["n_convs"]
                    for r in exact_dedup_conversations(SF).take_all())
    assert sum(n for d, _, n in got if d) == dup_convs

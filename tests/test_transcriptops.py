"""Turn/conversation-grain transcript ops vs exact DuckDB twins over
the same synthesized transcripts parquet (the driver's oracle views
don't include transcripts, so the exact check lives here)."""

import duckdb
import pytest

from sourmash_ray.pipelines import transcriptops as T
from sourmash_ray.sources.transcripts import transcripts_path

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW turns AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    return c


def test_turn_dedup_matches_duckdb(ray_session, con):
    got = sorted(
        (r["text_md5"], r["rep_conv_id"], r["rep_turn_idx"], r["n_dups"])
        for r in T.turn_dedup_transcripts(SF).take_all())
    # representative = lexicographically first (conv_id, turn_idx):
    want = sorted(tuple(r) for r in con.sql("""
        WITH h AS (
          SELECT conv_id, turn_idx,
                 md5(trim(regexp_replace(lower(coalesce(text, '')),
                          '[ \t\n\r\f\v]+', ' ', 'g'))) AS m
          FROM turns),
        r AS (
          SELECT m, conv_id, turn_idx,
                 row_number() OVER (PARTITION BY m
                                    ORDER BY conv_id, turn_idx) AS rn,
                 count(*) OVER (PARTITION BY m) AS n
          FROM h)
        SELECT m, conv_id, CAST(turn_idx AS BIGINT), CAST(n AS BIGINT)
        FROM r WHERE rn = 1
    """).fetchall())
    assert got == want
    assert any(r[3] > 1 for r in got), "corpus should contain dup turns"


def test_role_stats_matches_duckdb(ray_session, con):
    got = sorted((r["role"], r["tool"], r["n_turns"], r["sum_chars"])
                 for r in T.role_stats_transcripts(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT role, coalesce(tool, '') AS tool,
               count(*) AS n_turns,
               CAST(sum(len(coalesce(text, ''))) AS BIGINT) AS sum_chars
        FROM turns GROUP BY 1, 2
    """).fetchall())
    assert got == want


def test_conversation_stats_matches_duckdb(ray_session, con):
    got = sorted((r["conv_id"], r["n_turns"], r["sum_chars"],
                  r["n_roles"], r["duration_us"])
                 for r in T.conversation_stats_transcripts(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT conv_id, count(*) AS n_turns,
               CAST(sum(len(coalesce(text, ''))) AS BIGINT) AS sum_chars,
               CAST(count(DISTINCT role) AS BIGINT) AS n_roles,
               CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT)
                   AS duration_us
        FROM turns GROUP BY conv_id
    """).fetchall())
    assert got == want


def test_curate_transcripts_job_composes_components(ray_session):
    """curate_transcripts_job == gate(conversation_stats) ∘ one
    representative (min gated conv_id) per dedup cluster — checked by
    composing the standalone components."""
    from sourmash_ray.pipelines.dedup import dedup_pipeline
    from sourmash_ray.pipelines.transcriptops import (
        conversation_stats_transcripts, curate_transcripts_job)

    got = {r["conv_id"]: r for r in
           curate_transcripts_job(SF).take_all()}

    stats = {r["conv_id"]: r for r in
             conversation_stats_transcripts(SF).take_all()}
    gated = {c for c, r in stats.items()
             if 3 <= r["n_turns"] <= 40 and r["sum_chars"] >= 200}
    clusters = {r["conv_id"]: r["cluster_id"] for r in
                dedup_pipeline(SF)["clusters"].take_all()}
    by_cluster: dict = {}
    for c in gated:
        by_cluster.setdefault(clusters[c], []).append(c)
    want = {min(cs) for cs in by_cluster.values()}

    assert set(got) == want
    for c, r in got.items():
        assert r["n_turns"] == stats[c]["n_turns"]
        assert r["sum_chars"] == stats[c]["sum_chars"]
        assert r["cluster_id"] == clusters[c]
    assert len(got) < len(gated), "dedup should collapse some clusters"


def test_tool_usage_matches_duckdb(ray_session, con):
    got = sorted((r["tool"], r["n_turns"], r["n_convs"], r["sum_chars"])
                 for r in T.tool_usage_transcripts(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT coalesce(tool, '') AS tool, count(*) AS n_turns,
               CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
               CAST(sum(len(coalesce(text, ''))) AS BIGINT) AS sum_chars
        FROM turns GROUP BY 1
    """).fetchall())
    assert got == want


def test_conv_boundary_roles_matches_duckdb(ray_session, con):
    got = sorted((r["conv_id"], r["first_role"], r["last_role"],
                  r["n_turns"])
                 for r in T.conv_boundary_roles_transcripts(
                     SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH r AS (
          SELECT conv_id, role, turn_idx,
                 row_number() OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx) AS rn_a,
                 row_number() OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx DESC) AS rn_d,
                 count(*) OVER (PARTITION BY conv_id) AS n
          FROM turns)
        SELECT f.conv_id, f.role, l.role, CAST(f.n AS BIGINT)
        FROM r f JOIN r l ON f.conv_id = l.conv_id
        WHERE f.rn_a = 1 AND l.rn_d = 1
    """).fetchall())
    assert got == want


def test_role_transition_matches_duckdb(ray_session, con):
    got = sorted((r["from_role"], r["to_role"], r["n"])
                 for r in T.role_transition_transcripts(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH r AS (
          SELECT conv_id, role,
                 lead(role) OVER (PARTITION BY conv_id
                                  ORDER BY turn_idx) AS nxt
          FROM turns)
        SELECT role, nxt, count(*) FROM r
        WHERE nxt IS NOT NULL GROUP BY 1, 2
    """).fetchall())
    assert got == want

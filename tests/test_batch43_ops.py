"""Batch-43: transition_asymmetry_matrix (directed→unordered
reciprocity fold over the Markov cells) and
tool_response_length_suffstats (post-tool turn verbosity) vs DuckDB."""

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


def test_transition_asymmetry_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import (
        event_transition_counts, transition_asymmetry_matrix)

    tbl = transition_asymmetry_matrix(SF)
    got = sorted(zip(tbl["type_a"].to_pylist(),
                     tbl["type_b"].to_pylist(),
                     tbl["n_ab"].to_pylist(), tbl["n_ba"].to_pylist()))
    want = sorted(tuple(r) for r in con.sql("""
        WITH tr AS (SELECT lag(event_type) OVER w AS p,
                           event_type AS n
                    FROM events
                    WINDOW w AS (PARTITION BY user_id
                                 ORDER BY ts, event_id)),
        c AS (SELECT p, n, count(*) AS cnt FROM tr
              WHERE p IS NOT NULL GROUP BY 1, 2),
        u AS (SELECT least(p, n) AS a, greatest(p, n) AS b
              FROM c WHERE p <> n GROUP BY 1, 2)
        SELECT u.a, u.b, CAST(coalesce(f.cnt, 0) AS BIGINT),
               CAST(coalesce(r.cnt, 0) AS BIGINT)
        FROM u LEFT JOIN c f ON f.p = u.a AND f.n = u.b
               LEFT JOIN c r ON r.p = u.b AND r.n = u.a
    """).fetchall())
    assert got == want
    # reciprocity fold conserves the off-diagonal transition mass
    cells = event_transition_counts(SF).take_all()
    off_diag = sum(r["n_transitions"] for r in cells
                   if r["prev_type"] != r["next_type"])
    assert sum(ab + ba for *_, ab, ba in got) == off_diag
    assert all(a < b for a, b, *_ in got)


def test_tool_response_length_suffstats_matches_duckdb(ray_session,
                                                       con):
    from sourmash_ray.pipelines.transcriptops import (
        tool_response_length_suffstats)

    got = sorted((r["tool"], r["n"], r["sum_c"], r["sum_c2"])
                 for r in tool_response_length_suffstats(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH b AS (SELECT conv_id, turn_idx, tool,
                length(coalesce(text, '')) AS nch FROM transcripts),
        p AS (SELECT a.tool, c.nch AS c
              FROM b a JOIN b c
                ON a.conv_id = c.conv_id
               AND c.turn_idx = a.turn_idx + 1
              WHERE a.tool IS NOT NULL AND a.tool <> '')
        SELECT tool, CAST(count(*) AS BIGINT),
               CAST(sum(c) AS BIGINT), CAST(sum(c * c) AS BIGINT)
        FROM p GROUP BY 1
    """).fetchall())
    assert got == want
    # Cauchy–Schwarz (n·Σc² ≥ (Σc)²) per tool
    for _, n, sc, sc2 in got:
        assert n * sc2 >= sc * sc

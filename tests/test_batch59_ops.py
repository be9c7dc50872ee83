"""Batch-59: conv_tool_entry_exit_matrix (entry→exit tool flow cells)
and session_type_diversity_histogram (distinct event types per
session) vs their DuckDB twins."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_conv_tool_entry_exit_matrix_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import (
        conv_first_tool_counts, conv_tool_entry_exit_matrix)
    from sourmash_ray.sources.transcripts import transcripts_path

    tp = transcripts_path(SF)
    got = {(r["tool_first"], r["tool_last"]): r["n_convs"]
           for r in conv_tool_entry_exit_matrix(SF).take_all()}
    con = duckdb.connect()
    want = {(a, b): n for a, b, n in con.sql(f"""
        WITH t AS (SELECT conv_id, turn_idx, tool
                   FROM read_parquet('{tp}/*.parquet')
                   WHERE tool IS NOT NULL AND tool <> ''),
        fl AS (SELECT conv_id,
                      min_by(tool, turn_idx) AS tool_first,
                      max_by(tool, turn_idx) AS tool_last
               FROM t GROUP BY conv_id)
        SELECT tool_first, tool_last, count(*)
        FROM fl GROUP BY 1, 2""").fetchall()}
    assert got == want
    # the matrix's row marginals are exactly conv_first_tool_counts
    first = {r["tool"]: r["n_convs"]
             for r in conv_first_tool_counts(SF).take_all()}
    marg = {}
    for (a, _), n in got.items():
        marg[a] = marg.get(a, 0) + n
    assert marg == first


def test_session_type_diversity_histogram_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.eventops import (
        session_length_histogram, session_type_diversity_histogram)

    got = {r["n_types"]: r["n_sessions"]
           for r in session_type_diversity_histogram(SF).take_all()}
    con = duckdb.connect()
    want = dict(con.sql(f"""
        WITH g AS (
          SELECT user_id, ts, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM read_parquet('{SF}/events.parquet')
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        s AS (
          SELECT user_id, event_type,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess
          FROM g),
        sess AS (SELECT user_id, sess,
                        count(DISTINCT event_type) AS n_types
                 FROM s GROUP BY user_id, sess)
        SELECT CAST(n_types AS BIGINT), count(*)
        FROM sess GROUP BY 1""").fetchall())
    assert got == want
    # session population conserved vs the length histogram
    lens = {r["n_events"]: r["n_sessions"]
            for r in session_length_histogram(SF).take_all()}
    assert sum(got.values()) == sum(lens.values())
    # diversity is bounded by session length: a 1-event session has 1 type
    assert min(got) >= 1

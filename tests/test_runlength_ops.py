"""Exact DuckDB twins for the gaps-and-islands / run-length family:
user_daily_streaks, session_entry_exit_matrix, conv_tool_run_lengths,
conv_tool_set_counts, top_bigrams_docs. Each runs the distributed
pipeline at sf0.001 and compares value-exactly against an independent
SQL formulation over the same bytes (the oracle_sql() entries run the
same comparison at sf0.01 under the driver), plus a structural
invariant tying the result back to a second, independent pipeline."""

import duckdb
import pytest

from sourmash_ray.sources.transcripts import transcripts_path

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW turns AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    c.sql(f"CREATE VIEW documents AS SELECT * FROM "
          f"read_parquet('{SF}/documents.parquet')")
    c.sql(f"CREATE VIEW events AS SELECT * FROM "
          f"read_parquet('{SF}/events.parquet')")
    return c


def test_user_daily_streaks_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import user_daily_streaks

    got = sorted((r["streak_days"], r["n_users"])
                 for r in user_daily_streaks(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH ud AS (
          SELECT DISTINCT user_id,
                 CAST(epoch_us(ts) AS BIGINT) // 86400000000 AS d
          FROM events),
        isl AS (SELECT user_id,
                       d - ROW_NUMBER() OVER (PARTITION BY user_id
                                              ORDER BY d) AS grp
                FROM ud),
        runs AS (SELECT user_id, count(*) AS len
                 FROM isl GROUP BY user_id, grp),
        mx AS (SELECT user_id, max(len) AS s FROM runs GROUP BY user_id)
        SELECT CAST(s AS BIGINT), CAST(count(*) AS BIGINT)
        FROM mx GROUP BY 1
    """).fetchall())
    assert got == want
    # non-degenerate and conserving: every user has exactly one max streak
    assert len(got) > 1
    n_users = con.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(n for _, n in got) == n_users


def test_session_entry_exit_matches_duckdb_and_sessionizer(ray_session,
                                                           con):
    from sourmash_ray.pipelines.eventops import (session_entry_exit_matrix,
                                                 sessionize_events)

    got = sorted((r["entry_type"], r["exit_type"], r["n_sessions"])
                 for r in session_entry_exit_matrix(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH e AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR CAST(epoch_us(ts) AS BIGINT)
                           - CAST(epoch_us(lag(ts) OVER w) AS BIGINT)
                           > 1800000000
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM e),
        fe AS (SELECT user_id, sid,
                      first(event_type ORDER BY ts, event_id) AS a,
                      last(event_type ORDER BY ts, event_id) AS b
               FROM s GROUP BY user_id, sid)
        SELECT a, b, CAST(count(*) AS BIGINT) FROM fe GROUP BY 1, 2
    """).fetchall())
    assert got == want and len(got) > 1
    # total mass == the independent sessionizer's session count
    assert sum(n for _, _, n in got) == sessionize_events(SF).count()


def test_conv_tool_run_lengths_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import conv_tool_run_lengths

    got = sorted((r["tool"], r["run_len"], r["n_runs"])
                 for r in conv_tool_run_lengths(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH tt AS (SELECT conv_id, turn_idx, tool FROM turns
                    WHERE tool IS NOT NULL AND tool <> ''),
        t AS (SELECT tool,
                     ROW_NUMBER() OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx)
                     - ROW_NUMBER() OVER (PARTITION BY conv_id, tool
                                          ORDER BY turn_idx) AS grp,
                     conv_id
              FROM tt),
        runs AS (SELECT tool, count(*) AS rl
                 FROM t GROUP BY conv_id, tool, grp)
        SELECT tool, CAST(rl AS BIGINT), CAST(count(*) AS BIGINT)
        FROM runs GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # run mass conservation: sum(run_len * n_runs) == tool-turn count
    n_tool_turns = con.sql("SELECT count(*) FROM turns WHERE tool IS NOT "
                           "NULL AND tool <> ''").fetchone()[0]
    assert sum(rl * n for _, rl, n in got) == n_tool_turns
    # the retry-loop detector fires: at least one run longer than 1
    assert any(rl > 1 for _, rl, _ in got)


def test_conv_tool_set_counts_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import (
        conv_tool_chain_counts, conv_tool_set_counts)

    got = sorted((r["tool_set"], r["n_convs"])
                 for r in conv_tool_set_counts(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT conv_id,
                          string_agg(DISTINCT tool, '>' ORDER BY tool)
                              AS s
                   FROM turns WHERE tool IS NOT NULL AND tool <> ''
                   GROUP BY conv_id)
        SELECT s, CAST(count(*) AS BIGINT) FROM c GROUP BY s
    """).fetchall())
    assert got == want and len(got) > 1
    # set members are sorted and unique inside every signature
    for s, _ in got:
        members = s.split(">")
        assert members == sorted(set(members))
    # same conversations chain: total mass equals the chain inventory's
    chains = conv_tool_chain_counts(SF).take_all()
    assert sum(n for _, n in got) == sum(r["n_convs"] for r in chains)


def test_top_bigrams_docs_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import top_bigrams_docs

    got = [(r["tok_a"], r["tok_b"], r["n_occurrences"])
           for r in top_bigrams_docs(SF).take_all()]
    want = [tuple(r) for r in con.sql("""
        WITH t AS (SELECT string_split(coalesce(text, ''), ' ') AS toks
                   FROM documents),
        p AS (SELECT unnest(toks[1:len(toks) - 1]) AS a,
                     unnest(toks[2:len(toks)]) AS b
              FROM t)
        SELECT a, b, CAST(count(*) AS BIGINT) AS n
        FROM p WHERE a <> '' AND b <> ''
        GROUP BY a, b ORDER BY n DESC, a, b LIMIT 50
    """).fetchall()]
    assert got == want and len(got) == 50


def test_bigram_kernel_adjacency_edge_cases(ray_session):
    """Double spaces break adjacency; 1-token and empty docs emit
    nothing; counts aggregate within a doc."""
    import pyarrow as pa

    from sourmash_ray.pipelines.docops import _bigram_rows_batch

    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b  c d a b", "solo", "", None]),
    })
    out = _bigram_rows_batch(batch)
    rows = sorted(zip(*(c.to_pylist() for c in out.columns)))
    # "a b  c d a b" tokens: [a,b,'',c,d,a,b] → pairs (a,b)x2, (c,d),
    # (d,a); (b,'') and ('',c) are dropped
    assert rows == [("a", "b", 2), ("c", "d", 1), ("d", "a", 1)]

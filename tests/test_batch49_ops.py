"""Batch-49: turn_index_integrity (0..n-1 moment-fingerprint audit of
turn_idx, the transcripts twin of order_linenumber_integrity) and
role_run_length_histogram (same-role run lengths, the alternation
detector) vs their DuckDB twins, plus conservation invariants."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _turns_path():
    from sourmash_ray.sources.transcripts import transcripts_path

    return transcripts_path(SF)


def test_turn_index_integrity_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import turn_index_integrity

    got = {(r["n_turns"], r["is_contiguous"]): r["n_convs"]
           for r in turn_index_integrity(SF).take_all()}
    con = duckdb.connect()
    want = {(n, ok): c for n, ok, c in con.sql(f"""
        WITH per AS (
          SELECT conv_id, count(*) AS n,
                 sum(CAST(turn_idx AS BIGINT)) AS s,
                 sum(CAST(turn_idx AS BIGINT)
                     * CAST(turn_idx AS BIGINT)) AS s2
          FROM read_parquet('{_turns_path()}/*.parquet')
          GROUP BY conv_id)
        SELECT CAST(n AS BIGINT),
               CAST(CASE WHEN 2 * s = n * (n - 1)
                         AND 6 * s2 = n * (n - 1) * (2 * n - 1)
                    THEN 1 ELSE 0 END AS BIGINT),
               count(*)
        FROM per GROUP BY 1, 2""").fetchall()}
    assert got == want
    # the synthetic corpus is dense 0-based by construction
    assert all(ok == 1 for (_, ok) in got)
    # conv-count conservation vs an independent count
    n_convs = con.sql(
        f"SELECT count(DISTINCT conv_id) FROM "
        f"read_parquet('{_turns_path()}/*.parquet')").fetchone()[0]
    assert sum(got.values()) == n_convs


def test_turn_index_integrity_flags_broken_perm():
    """The moment fingerprint must reject a gap and a duplicate."""
    import numpy as np

    def ok(ix):
        ix = np.asarray(ix, np.int64)
        n, s, s2 = len(ix), ix.sum(), (ix * ix).sum()
        return (2 * s == n * (n - 1)) and (6 * s2 == n * (n - 1)
                                           * (2 * n - 1))

    assert ok([0, 1, 2, 3])
    assert ok([3, 0, 2, 1])          # permutation, any order
    assert not ok([0, 1, 3, 4])      # gap
    assert not ok([0, 1, 1, 2])      # duplicate
    assert not ok([1, 2, 3, 4])      # 1-based
    assert ok([0])


def test_role_run_length_histogram_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import (
        role_run_length_histogram,
    )

    got = {(r["role"], r["run_len"]): r["n_runs"]
           for r in role_run_length_histogram(SF).take_all()}
    con = duckdb.connect()
    want = {(role, rl): n for role, rl, n in con.sql(f"""
        WITH t AS (
          SELECT conv_id, role,
                 row_number() OVER (PARTITION BY conv_id
                                    ORDER BY turn_idx)
                 - row_number() OVER (PARTITION BY conv_id, role
                                      ORDER BY turn_idx) AS isl
          FROM read_parquet('{_turns_path()}/*.parquet')),
        runs AS (
          SELECT conv_id, role, isl, count(*) AS run_len
          FROM t GROUP BY conv_id, role, isl)
        SELECT role, CAST(run_len AS BIGINT), count(*)
        FROM runs GROUP BY role, run_len""").fetchall()}
    assert got == want
    # every turn belongs to exactly one run
    n_turns = con.sql(
        f"SELECT count(*) FROM "
        f"read_parquet('{_turns_path()}/*.parquet')").fetchone()[0]
    assert sum(rl * n for (_, rl), n in got.items()) == n_turns
    assert set(r for (r, _) in got) == {"user", "assistant"}

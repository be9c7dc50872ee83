"""Batch-51: turn_hour_role_matrix (hour-of-day × role traffic) and
conv_chars_turns_suffstats (exact-int depth/verbosity covariance
moments) vs their DuckDB twins, plus conservation invariants."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _turns_path():
    from sourmash_ray.sources.transcripts import transcripts_path

    return transcripts_path(SF)


def test_turn_hour_role_matrix_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import turn_hour_role_matrix

    got = {(r["hour"], r["role"]): r["n_turns"]
           for r in turn_hour_role_matrix(SF).take_all()}
    con = duckdb.connect()
    want = {(h, role): n for h, role, n in con.sql(f"""
        SELECT CAST(extract(hour FROM ts) AS BIGINT), role, count(*)
        FROM read_parquet('{_turns_path()}/*.parquet')
        GROUP BY 1, 2""").fetchall()}
    assert got == want
    n_turns = con.sql(f"SELECT count(*) FROM read_parquet("
                      f"'{_turns_path()}/*.parquet')").fetchone()[0]
    assert sum(got.values()) == n_turns
    assert all(0 <= h < 24 for (h, _) in got)


def test_conv_chars_turns_suffstats_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import (
        conv_chars_turns_suffstats,
    )

    tbl = conv_chars_turns_suffstats(SF).take_all()
    assert len(tbl) == 1
    got = tbl[0]
    con = duckdb.connect()
    n, st, sc, stc, st2, sc2 = con.sql(f"""
        WITH per AS (
          SELECT conv_id, count(*) AS t,
                 sum(length(coalesce(text, ''))) AS c
          FROM read_parquet('{_turns_path()}/*.parquet')
          GROUP BY conv_id)
        SELECT count(*), CAST(sum(t) AS BIGINT), CAST(sum(c) AS BIGINT),
               CAST(sum(t * c) AS BIGINT), CAST(sum(t * t) AS BIGINT),
               CAST(sum(c * c) AS BIGINT)
        FROM per""").fetchone()
    assert (got["n_convs"], got["sum_t"], got["sum_c"], got["sum_tc"],
            got["sum_t2"], got["sum_c2"]) == (n, st, sc, stc, st2, sc2)
    # Cauchy–Schwarz on the exact moments: (Σtc)² ≤ Σt²·Σc²
    assert got["sum_tc"] ** 2 <= got["sum_t2"] * got["sum_c2"]
    # Σt is the corpus turn count
    n_turns = con.sql(f"SELECT count(*) FROM read_parquet("
                      f"'{_turns_path()}/*.parquet')").fetchone()[0]
    assert got["sum_t"] == n_turns

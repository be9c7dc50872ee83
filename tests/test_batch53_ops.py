"""Batch-53: doc_terminal_char_census (last-character truncation
detector per source) and turn_empty_rate_by_role (whitespace-only turn
permille) vs their DuckDB twins, plus kernel edge cases."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def _turns_path():
    from sourmash_ray.sources.transcripts import transcripts_path

    return transcripts_path(SF)


def test_doc_terminal_char_census_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.docops import doc_terminal_char_census

    got = {(r["source"], r["terminal"]): r["n_docs"]
           for r in doc_terminal_char_census(SF).take_all()}
    con = duckdb.connect()
    want = {(s, t): n for s, t, n in con.sql(f"""
        SELECT source,
               CASE substr(coalesce(text, ''),
                           length(coalesce(text, '')), 1)
                    WHEN '.' THEN 'period'
                    WHEN '!' THEN 'bang'
                    WHEN '?' THEN 'question'
                    WHEN '' THEN 'empty'
                    ELSE 'other' END,
               count(*)
        FROM read_parquet('{SF}/documents.parquet')
        GROUP BY 1, 2""").fetchall()}
    assert got == want
    n_docs = con.sql(f"SELECT count(*) FROM read_parquet("
                     f"'{SF}/documents.parquet')").fetchone()[0]
    assert sum(got.values()) == n_docs


def test_terminal_kernel_edge_cases():
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    text = pa.array(["end.", "hey!", "why?", "", "mid", "dot. no"])
    last = pc.utf8_slice_codeunits(text, -1)
    idx = np.asarray(pc.fill_null(
        pc.index_in(last, value_set=pa.array([".", "!", "?"])), -1),
        np.int64)
    labels = np.array(["period", "bang", "question"], dtype=object)
    out = np.where(idx >= 0, labels[np.clip(idx, 0, 2)], "other")
    out = np.where(np.asarray(pc.equal(last, "")).astype(bool),
                   "empty", out)
    assert out.tolist() == ["period", "bang", "question", "empty",
                            "other", "other"]


def test_turn_empty_rate_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import (
        turn_empty_rate_by_role,
    )

    got = {r["role"]: (r["n_turns"], r["n_empty"], r["empty_permille"])
           for r in turn_empty_rate_by_role(SF).take_all()}
    con = duckdb.connect()
    want = {role: (n, e, p) for role, n, e, p in con.sql(f"""
        WITH g AS (
          SELECT role, count(*) AS n,
                 CAST(sum(CASE WHEN trim(coalesce(text, ''),
                               ' ' || chr(9) || chr(10) || chr(13)) = ''
                          THEN 1 ELSE 0 END) AS BIGINT) AS e
          FROM read_parquet('{_turns_path()}/*.parquet')
          GROUP BY role)
        SELECT role, n, e, CAST(1000 * e // n AS BIGINT)
        FROM g""").fetchall()}
    assert got == want
    n_turns = con.sql(f"SELECT count(*) FROM read_parquet("
                      f"'{_turns_path()}/*.parquet')").fetchone()[0]
    assert sum(n for n, _, _ in got.values()) == n_turns

"""Batch-56: turn_char_class_profile_by_role (encoding-sanity census
over turn text) and supplier_acctbal_band_census (credit-band
composition of the supply base) vs their DuckDB twins."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_turn_char_class_profile_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import (
        turn_char_class_profile_by_role)
    from sourmash_ray.sources.transcripts import transcripts_path

    tp = transcripts_path(SF)
    got = {r["role"]: (r["n_chars"], r["n_alpha"], r["n_digit"],
                       r["n_space"], r["n_other"])
           for r in turn_char_class_profile_by_role(SF).take_all()}
    con = duckdb.connect()
    want = {role: tuple(v) for role, *v in con.sql(f"""
        SELECT role,
               CAST(sum(length(t)) AS BIGINT),
               CAST(sum(length(t) - length(regexp_replace(t,
                    '[a-zA-Z]', '', 'g'))) AS BIGINT),
               CAST(sum(length(t) - length(regexp_replace(t,
                    '[0-9]', '', 'g'))) AS BIGINT),
               CAST(sum(length(t) - length(replace(t, ' ', '')))
                    AS BIGINT),
               CAST(sum(length(regexp_replace(replace(t, ' ', ''),
                    '[a-zA-Z0-9]', '', 'g'))) AS BIGINT)
        FROM (SELECT role, coalesce(text, '') AS t
              FROM read_parquet('{tp}/*.parquet'))
        GROUP BY role""").fetchall()}
    assert got == want
    # the four classes partition every character exactly
    for tot, al, dg, sp, ot in got.values():
        assert tot == al + dg + sp + ot


def test_supplier_acctbal_band_census_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import (
        supplier_acctbal_band_census)

    got = {(r["n_name"], r["band"]): (r["n_suppliers"],
                                      r["sum_acctbal_e2"])
           for r in supplier_acctbal_band_census(SF).take_all()}
    con = duckdb.connect()
    want = {(n, b): (c, s) for n, b, c, s in con.sql(f"""
        WITH s AS (
          SELECT s_nationkey,
                 CAST(round(s_acctbal * 100) AS BIGINT) AS cents
          FROM read_parquet('{SF}/supplier.parquet'))
        SELECT n_name,
               CASE WHEN cents < 0 THEN 'negative'
                    WHEN cents < 500000 THEN 'low'
                    ELSE 'high' END,
               count(*), CAST(sum(cents) AS BIGINT)
        FROM s JOIN read_parquet('{SF}/nation.parquet')
               ON n_nationkey = s_nationkey
        GROUP BY 1, 2""").fetchall()}
    assert got == want
    # supplier count reconciles: every supplier lands in exactly one band
    n_supp = con.sql(f"SELECT count(*) FROM read_parquet("
                     f"'{SF}/supplier.parquet')").fetchone()[0]
    assert sum(c for c, _ in got.values()) == n_supp

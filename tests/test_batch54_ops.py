"""Batch-54: label_size_histogram (class-balance shape of the
embedding corpus) and segment_status_matrix (segment × order-status
cells with exact cents) vs their DuckDB twins."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_label_size_histogram_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.ann import label_size_histogram

    got = {r["n_vecs"]: r["n_labels"]
           for r in label_size_histogram(SF).take_all()}
    con = duckdb.connect()
    want = dict(con.sql(f"""
        WITH per AS (
          SELECT label, count(*) AS n
          FROM read_parquet('{SF}/embeddings.parquet')
          GROUP BY label)
        SELECT CAST(n AS BIGINT), count(*) FROM per GROUP BY n
        """).fetchall())
    assert got == want
    # vector mass and label count both reconcile
    n_vecs, n_labels = con.sql(
        f"SELECT count(*), count(DISTINCT label) FROM "
        f"read_parquet('{SF}/embeddings.parquet')").fetchone()
    assert sum(k * v for k, v in got.items()) == n_vecs
    assert sum(got.values()) == n_labels


def test_segment_status_matrix_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import segment_status_matrix

    got = {(r["c_mktsegment"], r["o_orderstatus"]):
           (r["n_orders"], r["sum_totalprice_e2"])
           for r in segment_status_matrix(SF).take_all()}
    con = duckdb.connect()
    want = {(s, st): (n, v) for s, st, n, v in con.sql(f"""
        SELECT c_mktsegment, o_orderstatus, count(*),
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT)
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c
             ON o_custkey = c_custkey
        GROUP BY 1, 2""").fetchall()}
    assert got == want
    # FK integrity makes the join lossless: order count reconciles
    n_orders = con.sql(f"SELECT count(*) FROM read_parquet("
                       f"'{SF}/orders.parquet')").fetchone()[0]
    assert sum(n for n, _ in got.values()) == n_orders

"""Batch-61: customer_acctbal_band_by_segment (demand-side credit-band
matrix) and conv_verbosity_trend_census (exact covariance-sign trend of
turn length within each conversation) vs their DuckDB twins."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_customer_acctbal_band_by_segment_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import (
        customer_acctbal_band_by_segment)

    got = {(r["c_mktsegment"], r["band"]): (r["n_customers"],
                                            r["sum_acctbal_e2"])
           for r in customer_acctbal_band_by_segment(SF).take_all()}
    con = duckdb.connect()
    want = {(s, b): (n, v) for s, b, n, v in con.sql(f"""
        WITH c AS (
          SELECT c_mktsegment,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS cents
          FROM read_parquet('{SF}/customer.parquet'))
        SELECT c_mktsegment,
               CASE WHEN cents < 0 THEN 'negative'
                    WHEN cents < 500000 THEN 'low'
                    ELSE 'high' END,
               count(*), CAST(sum(cents) AS BIGINT)
        FROM c GROUP BY 1, 2""").fetchall()}
    assert got == want
    n_cust = con.sql(f"SELECT count(*) FROM read_parquet("
                     f"'{SF}/customer.parquet')").fetchone()[0]
    assert sum(n for n, _ in got.values()) == n_cust


def test_conv_verbosity_trend_census_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import (
        conv_verbosity_trend_census)
    from sourmash_ray.sources.transcripts import transcripts_path

    tp = transcripts_path(SF)
    got = {r["trend"]: r["n_convs"]
           for r in conv_verbosity_trend_census(SF).take_all()}
    con = duckdb.connect()
    want = dict(con.sql(f"""
        WITH per AS (
          SELECT conv_id, count(*) AS n,
                 CAST(sum(turn_idx) AS BIGINT) AS sx,
                 CAST(sum(length(coalesce(text, ''))) AS BIGINT) AS sc,
                 CAST(sum(turn_idx * length(coalesce(text, '')))
                      AS BIGINT) AS sxc
          FROM read_parquet('{tp}/*.parquet') GROUP BY conv_id)
        SELECT CASE WHEN n * sxc - sx * sc > 0 THEN 'rising'
                    WHEN n * sxc - sx * sc < 0 THEN 'falling'
                    ELSE 'flat' END, count(*)
        FROM per GROUP BY 1""").fetchall())
    assert got == want
    # every conversation lands in exactly one trend cell
    n_convs = con.sql(f"SELECT count(DISTINCT conv_id) FROM "
                      f"read_parquet('{tp}/*.parquet')").fetchone()[0]
    assert sum(got.values()) == n_convs


def test_verbosity_trend_kernel_signs(ray_session, tmp_path):
    """Hand-built conversations with known trends land in the right
    cells: strictly lengthening = rising, strictly shortening =
    falling, constant and single-turn = flat."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines import transcriptops as T

    rows = []
    for cid, texts in [("up", ["a", "bb", "ccc"]),
                       ("down", ["ccc", "bb", "a"]),
                       ("const", ["xx", "xx", "xx"]),
                       ("single", ["hello"])]:
        for i, t in enumerate(texts):
            rows.append((cid, i, "user", t))
    tbl = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
    })
    d = tmp_path / "turns"
    d.mkdir()
    pq.write_table(tbl, d / "part-0.parquet")

    orig = T._read_turns
    try:
        T._read_turns = lambda sf, cols: __import__("ray").data \
            .read_parquet(str(d), columns=list(cols))
        got = {r["trend"]: r["n_convs"]
               for r in T.conv_verbosity_trend_census("unused")
               .take_all()}
    finally:
        T._read_turns = orig
    assert got == {"rising": 1, "falling": 1, "flat": 2}

"""Batch-63: tool_share_by_position_decile (where in a conversation
tools fire) and embedding_norm_band_census (degenerate-vector bands on
the exact e8 squared norm) vs their DuckDB twins."""

import duckdb
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_tool_share_by_position_decile_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import (
        tool_share_by_position_decile)
    from sourmash_ray.sources.transcripts import transcripts_path

    tp = transcripts_path(SF)
    got = {r["decile"]: (r["n_turns"], r["n_tool_turns"],
                         r["tool_permille"])
           for r in tool_share_by_position_decile(SF).take_all()}
    con = duckdb.connect()
    want = {d: (n, t, p) for d, n, t, p in con.sql(f"""
        WITH t AS (
          SELECT conv_id, turn_idx,
                 CASE WHEN tool IS NOT NULL AND tool <> ''
                      THEN 1 ELSE 0 END AS is_tool,
                 count(*) OVER (PARTITION BY conv_id) AS n_conv
          FROM read_parquet('{tp}/*.parquet')),
        d AS (SELECT 10 * turn_idx // n_conv AS decile, is_tool FROM t),
        g AS (SELECT CAST(decile AS BIGINT) AS decile,
                     count(*) AS n_turns,
                     CAST(sum(is_tool) AS BIGINT) AS n_tool_turns
              FROM d GROUP BY 1)
        SELECT decile, n_turns, n_tool_turns,
               1000 * n_tool_turns // n_turns
        FROM g""").fetchall()}
    assert got == want
    assert set(got) <= set(range(10))
    # turn mass conserved
    n_turns = con.sql(f"SELECT count(*) FROM read_parquet("
                      f"'{tp}/*.parquet')").fetchone()[0]
    assert sum(n for n, _, _ in got.values()) == n_turns


def test_embedding_norm_band_census_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.ann import embedding_norm_band_census

    got = {(r["label"], r["band"]): r["n_vecs"]
           for r in embedding_norm_band_census(SF).take_all()}
    con = duckdb.connect()
    want = {(la, b): n for la, b, n in con.sql(f"""
        SELECT CAST(label AS BIGINT),
               CASE WHEN ssq < 25000000 THEN 'near_zero'
                    WHEN ssq < 400000000 THEN 'normal'
                    ELSE 'large' END,
               count(*)
        FROM (SELECT label,
                     CAST(list_sum(list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) * 10000)
                               AS BIGINT)
                             * CAST(round(CAST(x AS DOUBLE) * 10000)
                               AS BIGINT))) AS BIGINT) AS ssq
              FROM read_parquet('{SF}/embeddings.parquet'))
        GROUP BY 1, 2""").fetchall()}
    assert got == want
    n_vecs = con.sql(f"SELECT count(*) FROM read_parquet("
                     f"'{SF}/embeddings.parquet')").fetchone()[0]
    assert sum(got.values()) == n_vecs


def test_norm_band_fixture_all_bands(ray_session, tmp_path):
    """Hand-built vectors land in the right bands: zero vector →
    near_zero, unit vector → normal, 3x unit → large."""
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.ann import embedding_norm_band_census

    dim = 4
    vecs = [[0.0] * dim,                      # ssq 0        → near_zero
            [1.0, 0.0, 0.0, 0.0],             # ssq 1e8      → normal
            [3.0, 0.0, 0.0, 0.0]]             # ssq 9e8      → large
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([7, 7, 7], pa.int32()),
    }), tmp_path / "embeddings.parquet")
    got = {(r["label"], r["band"]): r["n_vecs"]
           for r in embedding_norm_band_census(str(tmp_path))
           .take_all()}
    assert got == {(7, "near_zero"): 1, (7, "normal"): 1,
                   (7, "large"): 1}

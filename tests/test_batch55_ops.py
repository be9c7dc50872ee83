"""Batch-55: media_kind_source_matrix (modality × provenance byte
audit) and conv_last_tool_counts (closing-tool identity, the exit twin
of conv_first_tool_counts) vs their DuckDB twins."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_media_kind_source_matrix_matches_duckdb(ray_session):
    from sourmash_ray.stages.multimodal import (media_kind_source_matrix,
                                                media_path)

    mp = media_path(SF)
    got = {(r["kind"], r["source"]):
           (r["n_media"], r["sum_bytes"], r["sum_text_chars"])
           for r in media_kind_source_matrix(SF).take_all()}
    con = duckdb.connect()
    want = {(k, s): (n, b, c) for k, s, n, b, c in con.sql(f"""
        SELECT kind, source, count(*),
               CAST(sum(n_bytes) AS BIGINT),
               CAST(sum(n_chars) AS BIGINT)
        FROM read_parquet('{mp}/*.parquet') m
        JOIN read_parquet('{SF}/documents.parquet') d
             ON d.doc_id = m.media_id
        GROUP BY 1, 2""").fetchall()}
    assert got == want
    # media ids are doc ids (1:1 lineage) so the join is lossless
    n_media = con.sql(f"SELECT count(*) FROM read_parquet("
                      f"'{mp}/*.parquet')").fetchone()[0]
    assert sum(n for n, _, _ in got.values()) == n_media


def test_conv_last_tool_counts_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import (
        conv_first_tool_counts, conv_last_tool_counts)
    from sourmash_ray.sources.transcripts import transcripts_path

    tp = transcripts_path(SF)
    got = {r["tool"]: r["n_convs"]
           for r in conv_last_tool_counts(SF).take_all()}
    con = duckdb.connect()
    want = dict(con.sql(f"""
        WITH t AS (SELECT conv_id, turn_idx, tool
                   FROM read_parquet('{tp}/*.parquet')
                   WHERE tool IS NOT NULL AND tool <> ''),
        r AS (SELECT conv_id, tool,
              row_number() OVER (PARTITION BY conv_id
                                 ORDER BY turn_idx DESC) AS rn
              FROM t)
        SELECT tool, count(*) FROM r WHERE rn = 1 GROUP BY 1
        """).fetchall())
    assert got == want
    # first/last decompose the SAME conv population: totals agree
    first = {r["tool"]: r["n_convs"]
             for r in conv_first_tool_counts(SF).take_all()}
    assert sum(got.values()) == sum(first.values())

"""Batch-64: source_split_matrix (stratification audit of the
content-hash split over provenance) and tool_interval_histogram
(inter-arrival spectrum of tool calls within conversations) vs their
DuckDB twins."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_source_split_matrix_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.docops import (hash_split_docs,
                                               source_split_matrix)

    got = {(r["source"], r["split"]): (r["n_docs"], r["sum_n_chars"])
           for r in source_split_matrix(SF).take_all()}
    con = duckdb.connect()
    want = {(s, sp): (n, c) for s, sp, n, c in con.sql(f"""
        SELECT source, split, count(*), CAST(sum(n_chars) AS BIGINT)
        FROM (SELECT source, n_chars,
                     CASE WHEN b < 80 THEN 'train'
                          WHEN b < 90 THEN 'valid'
                          ELSE 'test' END AS split
              FROM (SELECT source, n_chars,
                           CAST(concat('0x',
                                substr(md5(coalesce(text, '')), 1, 8))
                                AS UBIGINT) % 100 AS b
                    FROM read_parquet('{SF}/documents.parquet')))
        GROUP BY source, split""").fetchall()}
    assert got == want
    # the split marginals agree with hash_split_docs (same assignment)
    lang_marg = {}
    for r in hash_split_docs(SF).take_all():
        k = r["split"]
        n, c = lang_marg.get(k, (0, 0))
        lang_marg[k] = (n + r["n_docs"], c + r["sum_n_chars"])
    src_marg = {}
    for (_, sp), (n, c) in got.items():
        a, b = src_marg.get(sp, (0, 0))
        src_marg[sp] = (a + n, b + c)
    assert src_marg == lang_marg


def test_tool_interval_histogram_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import (
        tool_interval_histogram)
    from sourmash_ray.sources.transcripts import transcripts_path

    tp = transcripts_path(SF)
    got = {r["interval"]: r["n_pairs"]
           for r in tool_interval_histogram(SF).take_all()}
    con = duckdb.connect()
    want = dict(con.sql(f"""
        WITH t AS (SELECT conv_id, turn_idx
                   FROM read_parquet('{tp}/*.parquet')
                   WHERE tool IS NOT NULL AND tool <> ''),
        l AS (SELECT turn_idx
                  - lag(turn_idx) OVER (PARTITION BY conv_id
                                        ORDER BY turn_idx) AS interval
              FROM t)
        SELECT CAST(interval AS BIGINT), count(*)
        FROM l WHERE interval IS NOT NULL GROUP BY 1""").fetchall())
    assert got == want
    # intervals are positive (turn_idx strictly increases within conv)
    assert all(k >= 1 for k in got)
    # pair count = tool turns - convs-with-tools (n-1 gaps per conv)
    n_tool, n_conv = con.sql(f"""
        SELECT count(*), count(DISTINCT conv_id)
        FROM read_parquet('{tp}/*.parquet')
        WHERE tool IS NOT NULL AND tool <> ''""").fetchone()
    assert sum(got.values()) == n_tool - n_conv

"""Batch-48: corpus_table_counts — the corpus manifest (exact row
count per table incl. the derived transcript/media caches) vs the
DuckDB UNION-ALL twin."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_corpus_table_counts_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import corpus_table_counts
    from sourmash_ray.sources.transcripts import transcripts_path
    from sourmash_ray.stages.multimodal import media_path

    tbl = corpus_table_counts(SF)
    got = dict(zip(tbl["table_name"].to_pylist(),
                   tbl["n_rows"].to_pylist()))
    con = duckdb.connect()
    want = {}
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"):
        want[t] = con.sql(f"SELECT count(*) FROM read_parquet("
                          f"'{SF}/{t}.parquet')").fetchone()[0]
    want["transcripts"] = con.sql(
        f"SELECT count(*) FROM read_parquet("
        f"'{transcripts_path(SF)}/*.parquet')").fetchone()[0]
    want["media"] = con.sql(
        f"SELECT count(*) FROM read_parquet("
        f"'{media_path(SF)}/*.parquet')").fetchone()[0]
    assert got == want
    assert len(got) == 12 and all(n > 0 for n in got.values())
    # fixed sf0.001 anchors (deterministic synthetic corpus)
    assert got["documents"] == 500
    assert got["region"] == 5

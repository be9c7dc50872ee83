"""Exact DuckDB twins + invariants for the batch-29 operators:
label_dim_argmax_matrix (per-label dominant-dimension census),
media_magic_prefix_census (4-byte magic-number census off the Arrow
binary buffers), longest_turn_position_histogram (relative position
of each conversation's longest turn)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    from sourmash_ray.sources.transcripts import transcripts_path
    from sourmash_ray.stages.multimodal import media_path

    c = duckdb.connect()
    c.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
          f"read_parquet('{SF}/embeddings.parquet')")
    c.sql(f"CREATE VIEW media AS SELECT * FROM "
          f"read_parquet('{media_path(SF)}/*.parquet')")
    c.sql(f"CREATE VIEW transcripts AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    return c


def test_label_dim_argmax_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.ann import (
        dim_argmax_histogram, label_dim_argmax_matrix)

    got = sorted((r["label"], r["dim"], r["n_vectors"])
                 for r in label_dim_argmax_matrix(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH a AS (SELECT CAST(label AS BIGINT) AS label,
              list_transform(embedding,
                  x -> abs(CAST(round(CAST(x AS DOUBLE) * 10000)
                                AS BIGINT))) AS labs
              FROM embeddings)
        SELECT label,
               CAST(list_indexof(labs, list_max(labs)) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM a GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # marginalizing labels away reproduces the global dim histogram
    global_hist = {r["dim"]: r["n_vectors"]
                   for r in dim_argmax_histogram(SF).take_all()}
    from collections import Counter

    marg = Counter()
    for _, d, n in got:
        marg[d] += n
    assert dict(marg) == global_hist


def test_media_magic_prefix_census_matches_duckdb(ray_session, con):
    from sourmash_ray.stages.multimodal import media_magic_prefix_census

    got = sorted((r["kind"], r["prefix"], r["n_media"])
                 for r in media_magic_prefix_census(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH m AS (SELECT kind, hex(payload) AS h FROM media
                   WHERE octet_length(payload) >= 4),
        v AS (SELECT kind,
                (strpos('123456789ABCDEF', substr(h, 1, 1)) * 16
               + strpos('123456789ABCDEF', substr(h, 2, 1))) * 16777216
              + (strpos('123456789ABCDEF', substr(h, 3, 1)) * 16
               + strpos('123456789ABCDEF', substr(h, 4, 1))) * 65536
              + (strpos('123456789ABCDEF', substr(h, 5, 1)) * 16
               + strpos('123456789ABCDEF', substr(h, 6, 1))) * 256
              + (strpos('123456789ABCDEF', substr(h, 7, 1)) * 16
               + strpos('123456789ABCDEF', substr(h, 8, 1))) AS prefix
              FROM m)
        SELECT kind, CAST(prefix AS BIGINT), CAST(count(*) AS BIGINT)
        FROM v GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # every ≥4-byte payload is counted once, and all payloads here
    # open with the zlib magic 0x78 in the top byte
    total = con.sql("SELECT count(*) FROM media "
                    "WHERE octet_length(payload) >= 4").fetchone()[0]
    assert sum(n for *_, n in got) == total
    assert all(p >> 24 == 0x78 for _, p, _n in got)


def test_longest_turn_position_histogram_matches_duckdb(ray_session,
                                                        con):
    from sourmash_ray.pipelines.transcriptops import (
        longest_turn_position_histogram)

    got = sorted((r["position_decile"], r["n_convs"])
                 for r in longest_turn_position_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH r AS (SELECT conv_id, turn_idx,
                count(*) OVER (PARTITION BY conv_id) AS n,
                row_number() OVER (PARTITION BY conv_id
                    ORDER BY length(coalesce(text, '')) DESC,
                             turn_idx) AS rn
                FROM transcripts)
        SELECT CAST(turn_idx * 10 // n AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM r WHERE rn = 1 GROUP BY 1
    """).fetchall())
    assert got == want
    # exactly one winner per conversation, deciles in [0, 9]
    n_convs = con.sql(
        "SELECT count(DISTINCT conv_id) FROM transcripts").fetchone()[0]
    assert sum(n for _, n in got) == n_convs
    assert all(0 <= d <= 9 for d, _ in got)

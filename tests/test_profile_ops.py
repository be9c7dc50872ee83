"""Exact DuckDB twins for the round-5 profile/inventory operators:
embedding_dim_profile, media_payload_stats, conv_tool_chain_counts,
prefix_dup_inventory. Each runs the distributed pipeline at sf0.001 and
compares value-exactly against an independent SQL formulation over the
same bytes (the oracle_sql() entries run the same comparison at sf0.01
under the driver)."""

import duckdb
import pytest

from sourmash_ray.sources.transcripts import transcripts_path

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW turns AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    c.sql(f"CREATE VIEW documents AS SELECT * FROM "
          f"read_parquet('{SF}/documents.parquet')")
    c.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
          f"read_parquet('{SF}/embeddings.parquet')")
    return c


def test_embedding_dim_profile_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.ann import embedding_dim_profile

    got = sorted(map(tuple, embedding_dim_profile(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql("""
        WITH v AS (
          SELECT unnest(range(1, len(embedding) + 1)) AS dim,
                 CAST(round(CAST(unnest(embedding) AS DOUBLE) * 10000)
                      AS BIGINT) AS e4
          FROM embeddings)
        SELECT dim, count(*), CAST(sum(e4) AS BIGINT), min(e4), max(e4)
        FROM v GROUP BY dim
    """).fetchall())
    assert got == want and len(got) == 64


def test_media_payload_stats_matches_duckdb(ray_session, con):
    from sourmash_ray.stages.multimodal import (media_path,
                                                media_payload_stats)

    got = sorted(map(tuple, media_payload_stats(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql(f"""
        WITH m AS (
          SELECT media_id, kind, n_bytes, hex(payload) AS h
          FROM read_parquet('{media_path(SF)}/*.parquet')),
        b AS (SELECT media_id, kind, n_bytes, h,
                     unnest(range(0, length(h) // 2)) AS j FROM m),
        v AS (SELECT media_id, kind, n_bytes,
                     strpos('123456789ABCDEF', substr(h, 2*j+1, 1)) * 16
                   + strpos('123456789ABCDEF', substr(h, 2*j+2, 1)) AS byte
              FROM b),
        per AS (SELECT media_id, kind, any_value(n_bytes) AS n_bytes,
                       CAST(sum(byte) AS BIGINT) AS s
                FROM v GROUP BY media_id, kind)
        SELECT kind, count(*), CAST(sum(n_bytes) AS BIGINT),
               CAST(sum(s) AS BIGINT), min(n_bytes), max(n_bytes)
        FROM per GROUP BY kind
    """).fetchall())
    assert got == want and len(got) == 2


def test_media_cache_matches_synth_table(ray_session):
    """media_path's cached parquet is byte-identical to a fresh
    synth_media_table derivation (the determinism the oracle relies on)."""
    import pyarrow.parquet as pq

    from sourmash_ray.stages.multimodal import media_path, synth_media_table

    cached = pq.read_table(media_path(SF)).sort_by("media_id")
    fresh = synth_media_table(SF).sort_by("media_id")
    assert cached.equals(fresh)


def test_conv_tool_chain_counts_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import conv_tool_chain_counts

    got = sorted((r["chain"], r["n_convs"])
                 for r in conv_tool_chain_counts(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (
          SELECT conv_id, string_agg(tool, '>' ORDER BY turn_idx) AS chain
          FROM turns WHERE tool IS NOT NULL AND tool <> ''
          GROUP BY conv_id)
        SELECT chain, count(*) FROM c GROUP BY chain
    """).fetchall())
    assert got == want and got  # non-degenerate fixture


def test_prefix_dup_inventory_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import prefix_dup_inventory

    got = sorted(map(tuple, prefix_dup_inventory(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql("""
        WITH p AS (
          SELECT doc_id, substr(coalesce(text, ''), 1, 64) AS prefix,
                 md5(coalesce(text, '')) AS h
          FROM documents)
        SELECT prefix, count(*), CAST(count(DISTINCT h) AS BIGINT),
               min(doc_id)
        FROM p GROUP BY prefix HAVING count(*) >= 2
    """).fetchall())
    assert got == want and got
    # the whole point of the inventory: at least one prefix group hides
    # >1 distinct text (an exact pass can't collapse it)
    assert any(r[2] > 1 for r in got)


def test_token_length_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import token_length_histogram

    got = sorted((r["token_len"], r["n_tokens"])
                 for r in token_length_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT length(t), count(*)
        FROM (SELECT unnest(string_split(coalesce(text,''), ' ')) AS t
              FROM documents)
        WHERE t <> '' GROUP BY 1
    """).fetchall())
    assert got == want and got


def test_embedding_norm_quantiles_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.ann import embedding_norm_quantiles

    got = {r["q"]: r["value"]
           for r in embedding_norm_quantiles(SF).to_pylist()}
    want = dict(con.sql("""
        WITH v AS (SELECT vec_id,
                          CAST(round(CAST(unnest(embedding) AS DOUBLE)
                               * 10000) AS BIGINT) AS e4
                   FROM embeddings),
        n AS (SELECT vec_id, CAST(sum(e4*e4) AS BIGINT) AS norm2
              FROM v GROUP BY vec_id)
        SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE),
               unnest(quantile_disc(norm2, [0.25, 0.5, 0.75, 0.9]))
        FROM n
    """).fetchall())
    assert got == want and len(got) == 4


def test_user_activity_span_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import user_activity_span

    c2 = con
    c2.sql(f"CREATE VIEW IF NOT EXISTS events AS SELECT * FROM "
           f"read_parquet('{SF}/events.parquet')")
    got = sorted(map(tuple, user_activity_span(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in c2.sql("""
        SELECT user_id, count(*),
               CAST(min(epoch_us(ts)) AS BIGINT),
               CAST(max(epoch_us(ts)) AS BIGINT),
               CAST(max(epoch_us(ts)) - min(epoch_us(ts)) AS BIGINT)
        FROM events GROUP BY user_id
    """).fetchall())
    assert got == want and got


def test_media_size_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.stages.multimodal import (media_path,
                                                media_size_histogram)

    got = sorted(map(tuple, media_size_histogram(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql(f"""
        SELECT kind, (n_bytes // 32) * 32, count(*)
        FROM read_parquet('{media_path(SF)}/*.parquet') GROUP BY 1, 2
    """).fetchall())
    assert got == want and got


def test_ship_delay_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import ship_delay_histogram

    c2 = con
    for t in ("orders", "lineitem"):
        c2.sql(f"CREATE VIEW IF NOT EXISTS {t} AS SELECT * FROM "
               f"read_parquet('{SF}/{t}.parquet')")
    got = sorted((r["delay_bucket_days"], r["n_items"])
                 for r in ship_delay_histogram(SF).take_all())
    want = sorted(tuple(r) for r in c2.sql("""
        WITH d AS (SELECT (epoch_us(l_shipdate) - epoch_us(o_orderdate))
                              // 86400000000 AS days
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        SELECT ((days + 100000) // 7) * 7 - 100000, count(*)
        FROM d GROUP BY 1
    """).fetchall())
    assert got == want and got
    # the synthetic corpus has negative delays — the very case the
    # truncate-vs-floor shift exists for
    assert any(b < 0 for b, _ in got)


def test_media_compression_ratio_matches_duckdb(ray_session, con):
    from sourmash_ray.stages.multimodal import (media_compression_ratio,
                                                media_path)

    got = sorted((r["ratio_pct"], r["n_media"])
                 for r in media_compression_ratio(SF).take_all())
    want = sorted(tuple(r) for r in con.sql(f"""
        SELECT (m.n_bytes * 100) // greatest(d.n_chars, 1), count(*)
        FROM read_parquet('{media_path(SF)}/*.parquet') m
        JOIN documents d ON m.media_id = d.doc_id GROUP BY 1
    """).fetchall())
    assert got == want and got


def test_conv_role_balance_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import conv_role_balance

    got = sorted(map(tuple, conv_role_balance(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql("""
        SELECT conv_id,
               CAST(count(*) FILTER (role = 'user') AS BIGINT),
               CAST(count(*) FILTER (role = 'assistant') AS BIGINT),
               CAST(coalesce(sum(length(coalesce(text, '')))
                    FILTER (role = 'user'), 0) AS BIGINT),
               CAST(coalesce(sum(length(coalesce(text, '')))
                    FILTER (role = 'assistant'), 0) AS BIGINT)
        FROM turns GROUP BY conv_id
    """).fetchall())
    assert got == want and got


def test_conv_role_balance_rejects_unknown_role(ray_session):
    """The actual partition kernel raises on an unknown role instead of
    silently re-bucketing it (linestatus discipline)."""
    import pyarrow as pa

    from sourmash_ray.pipelines.transcriptops import _role_balance_pivot

    part = pa.table({
        "conv_id": pa.array(["c1", "c1"]),
        "role": pa.array(["user", "system"]),
        "n_chars": pa.array([3, 4], "int64"),
        "conv_part": pa.array([0, 0], "int64"),
    })
    with pytest.raises(ValueError, match="unknown role"):
        _role_balance_pivot(part)
    # and the happy path still pivots
    ok = _role_balance_pivot(pa.table({
        "conv_id": pa.array(["c1", "c1", "c2"]),
        "role": pa.array(["user", "assistant", "user"]),
        "n_chars": pa.array([3, 4, 5], "int64"),
        "conv_part": pa.array([0, 0, 0], "int64"),
    })).to_pylist()
    assert {r["conv_id"]: (r["user_turns"], r["assistant_turns"],
                           r["user_chars"], r["assistant_chars"])
            for r in ok} == {"c1": (1, 1, 3, 4), "c2": (1, 0, 5, 0)}


def test_batch4_histograms_match_duckdb(ray_session, con):
    """events_value_histogram, event_hour_profile, order_fanout_histogram
    and dup_cluster_size_histogram vs independent SQL at sf0.001."""
    from sourmash_ray.pipelines.docops import dup_cluster_size_histogram
    from sourmash_ray.pipelines.eventops import (event_hour_profile,
                                                 events_value_histogram)
    from sourmash_ray.pipelines.relational import order_fanout_histogram

    c2 = con
    for t in ("events", "lineitem"):
        c2.sql(f"CREATE VIEW IF NOT EXISTS {t} AS SELECT * FROM "
               f"read_parquet('{SF}/{t}.parquet')")

    got = sorted((r["event_type"], r["bucket_micros"], r["n_events"])
                 for r in events_value_histogram(SF).take_all())
    want = sorted(tuple(r) for r in c2.sql("""
        SELECT event_type,
               ((CAST(round(value * 1000000, 0) AS BIGINT)
                 + 1099511627776) // 5000000) * 5000000
                   - 1099511627776,
               count(*)
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    """).fetchall())
    assert got == want and got

    got = sorted((r["event_type"], r["hour"], r["n_events"])
                 for r in event_hour_profile(SF).take_all())
    want = sorted(tuple(r) for r in c2.sql("""
        SELECT event_type, (epoch_us(ts) // 3600000000) % 24, count(*)
        FROM events GROUP BY 1, 2
    """).fetchall())
    assert got == want and got

    got = sorted((r["n_items"], r["n_orders"])
                 for r in order_fanout_histogram(SF).take_all())
    want = sorted(tuple(r) for r in c2.sql("""
        WITH per AS (SELECT l_orderkey, count(*) AS n FROM lineitem
                     GROUP BY 1)
        SELECT n, count(*) FROM per GROUP BY 1
    """).fetchall())
    assert got == want and got

    got = sorted((r["group_size"], r["n_groups"])
                 for r in dup_cluster_size_histogram(SF).take_all())
    want = sorted(tuple(r) for r in c2.sql(r"""
        WITH g AS (
          SELECT md5(trim(regexp_replace(lower(coalesce(text, '')),
                                         '[ \t\n\r\f\v]+', ' ', 'g'))),
                 count(*) AS n
          FROM documents GROUP BY 1)
        SELECT n, count(*) FROM g GROUP BY 1
    """).fetchall())
    assert got == want and got
    # sf0.001 documents carry no exact dups (cross_source_dup_matrix is
    # typed-empty there too) — the histogram is all size-1 groups and
    # total groups == total docs
    n_docs = c2.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(s * n for s, n in got) == n_docs


def test_batch5_quantiles_and_matrix_match_duckdb(ray_session, con):
    """turn_gap_quantiles, media_ratio_quantiles, and
    order_status_priority_matrix vs independent SQL at sf0.001."""
    from sourmash_ray.pipelines.relational import (
        order_status_priority_matrix)
    from sourmash_ray.pipelines.transcriptops import turn_gap_quantiles
    from sourmash_ray.stages.multimodal import (media_path,
                                                media_ratio_quantiles)

    c2 = con
    c2.sql(f"CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM "
           f"read_parquet('{SF}/orders.parquet')")

    got = {r["q"]: r["value"] for r in turn_gap_quantiles(SF).to_pylist()}
    want = dict(c2.sql("""
        WITH g AS (SELECT epoch_us(lead(ts) OVER (PARTITION BY conv_id
                                                  ORDER BY turn_idx))
                          - epoch_us(ts) AS gap_us FROM turns)
        SELECT CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE),
               CAST(unnest(quantile_disc(gap_us,
                    [0.25, 0.5, 0.75, 0.9])) AS BIGINT)
        FROM g WHERE gap_us IS NOT NULL
    """).fetchall())
    assert got == want and len(got) == 4

    got = {(r["kind"], r["q"]): r["value"]
           for r in media_ratio_quantiles(SF).to_pylist()}
    want = {(k, q): v for k, q, v in c2.sql(f"""
        WITH r AS (SELECT m.kind,
                          (m.n_bytes * 100) // greatest(d.n_chars, 1)
                              AS ratio
                   FROM read_parquet('{media_path(SF)}/*.parquet') m
                   JOIN documents d ON m.media_id = d.doc_id)
        SELECT kind, CAST(unnest([0.25, 0.5, 0.75, 0.9]) AS DOUBLE),
               CAST(unnest(quantile_disc(ratio,
                    [0.25, 0.5, 0.75, 0.9])) AS BIGINT)
        FROM r GROUP BY kind
    """).fetchall()}
    assert got == want and len(got) == 8

    got = sorted(map(tuple, order_status_priority_matrix(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in c2.sql("""
        SELECT o_orderstatus, o_orderpriority, count(*),
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT)
        FROM orders GROUP BY 1, 2
    """).fetchall())
    assert got == want and got


def test_snapshot_diff_embeddings_matches_duckdb(ray_session, con):
    import __ray_entry__ as E

    got = sorted((r["vec_id"], r["status"])
                 for r in E._emb_snapshot_diff_q(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH a AS (
          SELECT vec_id,
                 md5(array_to_string(list_transform(embedding,
                     x -> CAST(round(CAST(x AS DOUBLE) * 10000)
                               AS BIGINT)), ',')) AS fp
          FROM embeddings),
        braw AS (
          SELECT vec_id,
                 CASE WHEN vec_id % 7 = 0
                      THEN list_prepend(
                             CAST(embedding[1] AS DOUBLE) + 0.25,
                             CAST(embedding[2:] AS DOUBLE[]))
                      ELSE CAST(embedding AS DOUBLE[]) END AS emb
          FROM embeddings WHERE vec_id % 10 <> 0
          UNION ALL
          SELECT vec_id + 10000000,
                 list_reverse(CAST(embedding AS DOUBLE[]))
          FROM embeddings WHERE vec_id % 13 = 0),
        b AS (SELECT vec_id,
                     md5(array_to_string(list_transform(emb,
                         x -> CAST(round(x * 10000) AS BIGINT)), ','))
                         AS fp
              FROM braw)
        SELECT coalesce(a.vec_id, b.vec_id),
               CASE WHEN a.vec_id IS NULL THEN 'added'
                    WHEN b.vec_id IS NULL THEN 'removed'
                    ELSE 'changed' END
        FROM a FULL OUTER JOIN b ON a.vec_id = b.vec_id
        WHERE a.vec_id IS NULL OR b.vec_id IS NULL OR a.fp <> b.fp
    """).fetchall())
    assert got == want and got
    statuses = {s for _, s in got}
    assert statuses == {"added", "removed", "changed"}

"""Exact DuckDB twins for the session-6 batch-3 operators:
embedding_value_histogram, vector_ssq_quantiles_by_label,
dim_argmax_histogram, error_burst_events, discount_profile."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("embeddings", "events", "lineitem"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_embedding_value_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.ann import embedding_value_histogram

    got = sorted((r["bucket_e4"], r["n_values"])
                 for r in embedding_value_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH v AS (SELECT CAST(round(CAST(unnest(embedding) AS DOUBLE)
                                     * 10000) AS BIGINT) AS e4
                   FROM embeddings)
        SELECT ((e4 + 20000000) // 500 - 40000) * 500,
               CAST(count(*) AS BIGINT)
        FROM v GROUP BY 1
    """).fetchall())
    assert got == want and len(got) > 5
    # mass conservation: every component lands in exactly one bucket
    n_vec, dim = con.sql(
        "SELECT count(*), max(len(embedding)) FROM embeddings"
    ).fetchone()
    assert sum(n for _, n in got) == n_vec * dim
    # negative buckets exist (the shift trick is actually exercised)
    assert any(b < 0 for b, _ in got)


def test_vector_ssq_quantiles_by_label_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.ann import vector_ssq_quantiles_by_label

    got = sorted((r["label"], r["q"], r["ssq_e8"])
                 for r in vector_ssq_quantiles_by_label(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH s AS (SELECT CAST(label AS BIGINT) AS label,
                          list_sum(list_transform(embedding,
                              x -> CAST(round(CAST(x AS DOUBLE) * 10000)
                                        AS BIGINT)
                                   * CAST(round(CAST(x AS DOUBLE)
                                                * 10000) AS BIGINT)))
                              AS ssq
                   FROM embeddings)
        SELECT label, CAST(q AS DOUBLE), CAST(v AS BIGINT)
        FROM (SELECT label, unnest([0.25, 0.5, 0.75, 0.9]) AS q,
                     unnest(quantile_disc(ssq, [0.25, 0.5, 0.75, 0.9]))
                         AS v
              FROM s GROUP BY label)
    """).fetchall())
    assert got == want and len(got) == 40  # 10 labels x 4 quantiles


def test_dim_argmax_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.ann import dim_argmax_histogram

    got = sorted((r["dim"], r["n_vectors"])
                 for r in dim_argmax_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH a AS (SELECT list_transform(embedding,
                       x -> abs(CAST(round(CAST(x AS DOUBLE) * 10000)
                                     AS BIGINT))) AS labs
                   FROM embeddings)
        SELECT CAST(list_indexof(labs, list_max(labs)) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM a GROUP BY 1
    """).fetchall())
    assert got == want
    n_vec = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]
    assert sum(n for _, n in got) == n_vec
    assert all(1 <= d <= 64 for d, _ in got)


def test_error_burst_events_typed_empty_and_nonempty(ray_session, con):
    import pyarrow as pa

    from sourmash_ray.pipelines.eventops import error_burst_events

    # sf0.001 has no 2-error 5-min cell: the result must be EMPTY but
    # carry the full typed schema (the empty-Dataset quirk guard)
    res = error_burst_events(SF)
    assert isinstance(res, pa.Table) and res.num_rows == 0
    assert res.column_names == ["user_id", "window_start", "n_errors"]
    # sf0.01 has bursts; compare value-exactly
    got = sorted((r["user_id"], r["window_start"], r["n_errors"])
                 for r in error_burst_events(SF01).take_all())
    c = duckdb.connect()
    want = sorted(tuple(r) for r in c.sql(f"""
        WITH c AS (SELECT user_id,
                          make_timestamp((CAST(epoch_us(ts) AS BIGINT)
                                          // 300000000) * 300000000)
                              AS w,
                          count(*) AS n
                   FROM read_parquet('{SF01}/events.parquet')
                   WHERE event_type = 'error' GROUP BY 1, 2)
        SELECT user_id, w, CAST(n AS BIGINT) FROM c WHERE n >= 2
    """).fetchall())
    assert got == want and len(got) >= 1


def test_discount_profile_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import discount_profile

    got = sorted((r["discount_pct"], r["n_lines"], r["sum_qty"],
                  r["revenue_e4"])
                 for r in discount_profile(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT CAST(round(l_discount * 100) AS BIGINT),
               CAST(count(*) AS BIGINT),
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT),
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100)
                                      AS BIGINT))) AS BIGINT)
        FROM lineitem GROUP BY 1
    """).fetchall())
    assert got == want and len(got) == 11  # 0..10 percent
    n_lines = con.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    assert sum(n for _, n, _, _ in got) == n_lines

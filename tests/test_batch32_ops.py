"""Exact DuckDB twins + invariants for the batch-32/33 operators:
tax_discount_matrix (pricing-lever interaction census),
first_session_length_histogram (onboarding depth),
value_lag1_suffstats (windowed-product autocovariance stats),
media_doc_size_suffstats (cross-modal size covariance per kind)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    from sourmash_ray.stages.multimodal import media_path

    c = duckdb.connect()
    for t in ("lineitem", "events", "documents"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    c.sql(f"CREATE VIEW media AS SELECT * FROM "
          f"read_parquet('{media_path(SF)}/*.parquet')")
    return c


def test_tax_discount_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import tax_discount_matrix

    got = sorted((r["tax_bp"], r["discount_bp"], r["n_lines"])
                 for r in tax_discount_matrix(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT CAST(round(l_tax * 100) AS BIGINT),
               CAST(round(l_discount * 100) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM lineitem GROUP BY 1, 2
    """).fetchall())
    assert got == want
    total = con.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    assert sum(n for *_, n in got) == total


def test_first_session_length_histogram_matches_duckdb(ray_session,
                                                       con):
    from sourmash_ray.pipelines.eventops import (
        first_session_length_histogram, user_session_count_histogram)

    got = sorted((r["session_len"], r["n_users"])
                 for r in first_session_length_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH s AS (SELECT user_id, ts,
              CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > 1800000000
              THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        t AS (SELECT user_id, sum(brk) OVER (PARTITION BY user_id
                  ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM s),
        f AS (SELECT user_id, count(*) AS n FROM t
              WHERE sid = 1 GROUP BY user_id)
        SELECT CAST(n AS BIGINT), CAST(count(*) AS BIGINT)
        FROM f GROUP BY 1
    """).fetchall())
    assert got == want
    # one first session per user — totals match the sessions-per-user
    # histogram's user count
    sess = user_session_count_histogram(SF).take_all()
    assert sum(n for _, n in got) == sum(r["n_users"] for r in sess)


def test_value_lag1_suffstats_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import value_lag1_suffstats

    row = value_lag1_suffstats(SF).take_all()[0]
    want = con.sql("""
        WITH s AS (SELECT user_id,
              CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS a,
              lead(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
                  OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS b
              FROM events)
        SELECT CAST(count(*) AS BIGINT), CAST(sum(a * b) AS BIGINT),
               CAST(sum(a) AS BIGINT), CAST(sum(b) AS BIGINT),
               CAST(sum(a * a) AS BIGINT), CAST(sum(b * b) AS BIGINT)
        FROM s WHERE b IS NOT NULL
    """).fetchone()
    got = (row["n_pairs"], row["sum_ab"], row["sum_a"], row["sum_b"],
           row["sum_a2"], row["sum_b2"])
    assert got == tuple(want)
    # Cauchy–Schwarz on the pair stream
    assert row["sum_ab"] ** 2 <= row["sum_a2"] * row["sum_b2"]
    # pair count: Σ_user (n_u − 1)
    n_pairs = con.sql("""
        SELECT sum(n - 1) FROM
        (SELECT count(*) AS n FROM events GROUP BY user_id)
    """).fetchone()[0]
    assert row["n_pairs"] == n_pairs


def test_media_doc_size_suffstats_matches_duckdb(ray_session, con):
    from sourmash_ray.stages.multimodal import media_doc_size_suffstats

    got = sorted(
        (r["kind"], r["n"], r["sum_b"], r["sum_c"], r["sum_bc"],
         r["sum_b2"], r["sum_c2"])
        for r in media_doc_size_suffstats(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT kind, CAST(count(*) AS BIGINT),
               CAST(sum(n_bytes) AS BIGINT),
               CAST(sum(n_chars) AS BIGINT),
               CAST(sum(n_bytes * n_chars) AS BIGINT),
               CAST(sum(n_bytes * n_bytes) AS BIGINT),
               CAST(sum(n_chars * n_chars) AS BIGINT)
        FROM media JOIN documents ON media_id = doc_id
        GROUP BY kind
    """).fetchall())
    assert got == want
    for _, n, sb, sc, sbc, sb2, sc2 in got:
        assert sbc * sbc <= sb2 * sc2
        assert n > 0

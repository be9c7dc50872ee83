"""Batch-60: numeric_token_rate_by_lang (pure-digit token share under
the pinned tokenizer convention) and user_weekend_affinity_census
(weekend-share banding of the user base) vs their DuckDB twins."""

import duckdb

SF = "/root/testdata/sf0.001"


def test_numeric_token_rate_by_lang_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.docops import numeric_token_rate_by_lang

    got = {r["lang"]: (r["n_tokens"], r["n_numeric"],
                       r["numeric_permille"])
           for r in numeric_token_rate_by_lang(SF).take_all()}
    con = duckdb.connect()
    want = {la: (t, n, p) for la, t, n, p in con.sql(f"""
        WITH toks AS (
          SELECT lang,
                 unnest(list_filter(string_split(trim(
                     regexp_replace(coalesce(text, ''),
                                    '[ \t\n\r\f\v]+', ' ', 'g')),
                     ' '), x -> len(x) > 0)) AS tok
          FROM read_parquet('{SF}/documents.parquet')),
        agg AS (
          SELECT lang, count(*) AS n_tokens,
                 CAST(count(*) FILTER (
                     regexp_full_match(tok, '[0-9]+'))
                      AS BIGINT) AS n_numeric
          FROM toks GROUP BY lang)
        SELECT lang, n_tokens, n_numeric,
               CASE WHEN n_tokens > 0
                    THEN 1000 * n_numeric // n_tokens ELSE 0 END
        FROM agg""").fetchall()}
    assert got == want
    # numeric tokens are a subset of all tokens
    assert all(n <= t for t, n, _ in got.values())
    # token mass reconciles with the per-doc token_stats convention
    tot = con.sql(f"""
        SELECT CAST(sum(len(list_filter(string_split(trim(
                   regexp_replace(coalesce(text, ''),
                                  '[ \t\n\r\f\v]+', ' ', 'g')),
                   ' '), x -> len(x) > 0))) AS BIGINT)
        FROM read_parquet('{SF}/documents.parquet')""").fetchone()[0]
    assert sum(t for t, _, _ in got.values()) == tot


def test_user_weekend_affinity_census_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.eventops import (
        user_weekend_affinity_census)

    got = {r["band"]: (r["n_users"], r["sum_events"])
           for r in user_weekend_affinity_census(SF).take_all()}
    con = duckdb.connect()
    want = {b: (u, e) for b, u, e in con.sql(f"""
        WITH per AS (
          SELECT user_id, count(*) AS n_events,
                 CAST(sum(CASE WHEN dayofweek(ts) IN (0, 6)
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_wk
          FROM read_parquet('{SF}/events.parquet') GROUP BY user_id),
        banded AS (
          SELECT CASE WHEN 1000 * n_wk // n_events < 250
                        THEN 'weekday_heavy'
                      WHEN 1000 * n_wk // n_events < 750
                        THEN 'balanced'
                      ELSE 'weekend_heavy' END AS band, n_events
          FROM per)
        SELECT band, count(*), CAST(sum(n_events) AS BIGINT)
        FROM banded GROUP BY band""").fetchall()}
    assert got == want
    # user and event populations reconcile
    n_users, n_events = con.sql(
        f"SELECT count(DISTINCT user_id), count(*) FROM "
        f"read_parquet('{SF}/events.parquet')").fetchone()
    assert sum(u for u, _ in got.values()) == n_users
    assert sum(e for _, e in got.values()) == n_events

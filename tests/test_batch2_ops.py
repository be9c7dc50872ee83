"""Exact DuckDB twins for the session-6 batch-2 operators:
cross_border_trade, session_duration_by_entry_type,
event_daypart_profile, tool_adoption_by_conv_length,
token_length_by_lang, media_kind_size_quantiles — each at sf0.001 with
an independent SQL formulation plus a structural invariant."""

import duckdb
import pytest

from sourmash_ray.sources.transcripts import transcripts_path

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("nation", "customer", "supplier", "orders", "lineitem",
              "documents", "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    c.sql(f"CREATE VIEW turns AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    return c


def test_cross_border_trade_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import cross_border_trade

    got = sorted((r["nation"], r["local_rev_e4"], r["cross_rev_e4"])
                 for r in cross_border_trade(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH rev AS (
          SELECT l.l_orderkey, s.s_nationkey AS snk,
                 CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS r
          FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey)
        SELECT cn.n_name,
               CAST(sum(CASE WHEN rev.snk = c.c_nationkey
                             THEN rev.r ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN rev.snk = c.c_nationkey
                             THEN 0 ELSE rev.r END) AS BIGINT)
        FROM rev
        JOIN orders o ON rev.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        GROUP BY cn.n_name
    """).fetchall())
    assert got == want and len(got) == 25
    # conservation: local + cross over all nations == total joined revenue
    total = con.sql("""
        SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS BIGINT)
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
    """).fetchone()[0]
    assert sum(lc + cr for _, lc, cr in got) == total
    # cross-border dominates in TPC-H-ish uniform data (24/25 foreign)
    assert sum(cr for *_, cr in got) > sum(lc for _, lc, _ in got)


def test_session_duration_by_entry_type_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import (
        session_duration_by_entry_type, session_entry_exit_matrix)

    got = sorted((r["entry_type"], r["q"], r["dur_s"])
                 for r in session_duration_by_entry_type(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH e AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR CAST(epoch_us(ts) AS BIGINT)
                           - CAST(epoch_us(lag(ts) OVER w) AS BIGINT)
                           > 1800000000 THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM e),
        d AS (SELECT first(event_type ORDER BY ts, event_id) AS et,
                     (CAST(epoch_us(max(ts)) AS BIGINT)
                      - CAST(epoch_us(min(ts)) AS BIGINT)) // 1000000
                         AS dur
              FROM s GROUP BY user_id, sid)
        SELECT et, CAST(q AS DOUBLE), CAST(v AS BIGINT)
        FROM (SELECT et, unnest([0.25, 0.5, 0.75, 0.9]) AS q,
                     unnest(quantile_disc(dur, [0.25, 0.5, 0.75, 0.9]))
                         AS v
              FROM d GROUP BY et)
    """).fetchall())
    assert got == want
    # the entry types agree with the entry/exit matrix's row margin
    entries = {r["entry_type"]
               for r in session_entry_exit_matrix(SF).take_all()}
    assert {e for e, _, _ in got} == entries
    # quantiles are monotone within each entry type
    from itertools import groupby

    for et, rows in groupby(got, key=lambda r: r[0]):
        vals = [v for _, _, v in rows]
        assert vals == sorted(vals)


def test_event_daypart_profile_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import event_daypart_profile

    got = sorted((r["daypart"], r["event_type"], r["n_events"],
                  r["sum_value_micros"])
                 for r in event_daypart_profile(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT CASE ((CAST(epoch_us(ts) AS BIGINT) // 3600000000) % 24)
                    // 6
                 WHEN 0 THEN 'night' WHEN 1 THEN 'morning'
                 WHEN 2 THEN 'afternoon' ELSE 'evening' END,
               event_type, CAST(count(*) AS BIGINT),
               CAST(sum(CAST(round(value * 1000000) AS BIGINT))
                    AS BIGINT)
        FROM events GROUP BY 1, 2
    """).fetchall())
    assert got == want
    n_events = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert sum(n for _, _, n, _ in got) == n_events
    assert {d for d, *_ in got} == {"night", "morning", "afternoon",
                                    "evening"}


def test_tool_adoption_by_conv_length_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import (
        tool_adoption_by_conv_length)

    got = sorted((r["n_turns"], r["n_convs"], r["n_with_tool"])
                 for r in tool_adoption_by_conv_length(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT conv_id, count(*) AS n,
                          max(CASE WHEN tool IS NOT NULL AND tool <> ''
                                   THEN 1 ELSE 0 END) AS ht
                   FROM turns GROUP BY conv_id)
        SELECT CAST(n AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(sum(ht) AS BIGINT)
        FROM c GROUP BY 1
    """).fetchall())
    assert got == want and len(got) > 1
    assert all(wt <= n for _, n, wt in got)
    n_convs = con.sql(
        "SELECT count(DISTINCT conv_id) FROM turns").fetchone()[0]
    assert sum(n for _, n, _ in got) == n_convs


def test_token_length_by_lang_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import token_length_by_lang

    got = sorted((r["lang"], r["n_tokens"], r["sum_token_chars"])
                 for r in token_length_by_lang(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH t AS (SELECT lang,
                          list_filter(string_split(coalesce(text, ''),
                                                   ' '), x -> x <> '')
                              AS toks
                   FROM documents)
        SELECT lang, CAST(sum(len(toks)) AS BIGINT),
               CAST(sum(list_sum(list_transform(toks, x -> len(x))))
                    AS BIGINT)
        FROM t GROUP BY lang
    """).fetchall())
    assert got == want and len(got) > 1
    # the unigram canon counts the same total token mass
    from sourmash_ray.pipelines.docops import token_stats_docs

    stats = token_stats_docs(SF).take_all()
    col = ("n_tokens" if "n_tokens" in stats[0] else None)
    if col:
        assert sum(n for _, n, _ in got) == sum(r[col] for r in stats)


def test_media_kind_size_quantiles_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.stages.multimodal import (media_kind_size_quantiles,
                                                media_path)

    c = duckdb.connect()
    got = sorted((r["kind"], r["q"], r["n_bytes"])
                 for r in media_kind_size_quantiles(SF).take_all())
    want = sorted(tuple(r) for r in c.sql(f"""
        SELECT kind, CAST(q AS DOUBLE), CAST(v AS BIGINT)
        FROM (SELECT kind, unnest([0.25, 0.5, 0.75, 0.9]) AS q,
                     unnest(quantile_disc(n_bytes,
                                          [0.25, 0.5, 0.75, 0.9])) AS v
              FROM read_parquet('{media_path(SF)}/*.parquet')
              GROUP BY kind)
    """).fetchall())
    assert got == want and len(got) == 8  # 2 kinds x 4 quantiles

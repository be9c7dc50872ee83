"""Exact DuckDB twins for the session-6 batch-9 operators:
top3_order_values_by_priority (tie-aware dense ranking over the
deduplicated value fold), session_purchase_rate (sessionized
conversion under the shared 30-min break rule),
nation_share_within_region (percent-of-parent rollup)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "nation", "region", "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_top3_order_values_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        top3_order_values_by_priority)

    got = sorted((r["o_orderpriority"], r["cents"], r["n_orders"],
                  r["rn"])
                 for r in top3_order_values_by_priority(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH d AS (SELECT o_orderpriority,
                          CAST(round(o_totalprice*100) AS BIGINT) cents,
                          CAST(count(*) AS BIGINT) n
                   FROM orders GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                           ORDER BY cents DESC) rn
              FROM d)
        SELECT o_orderpriority, cents, n, CAST(rn AS BIGINT)
        FROM r WHERE rn <= 3
    """).fetchall())
    assert got == want and len(got) == 15  # 5 classes x 3 values
    # values strictly decreasing with rank inside a class
    from itertools import groupby

    for _, rows in groupby(sorted(got, key=lambda r: (r[0], r[3])),
                           key=lambda r: r[0]):
        cents = [r[1] for r in rows]
        assert all(a > b for a, b in zip(cents, cents[1:]))


def test_session_purchase_rate_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import (
        session_purchase_rate, sessionize_events)

    got = sorted((r["entry_type"], r["n_sessions"],
                  r["n_with_purchase"], r["rate_e4"])
                 for r in session_purchase_rate(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH e AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR CAST(epoch_us(ts) AS BIGINT)
                           - CAST(epoch_us(lag(ts) OVER w) AS BIGINT)
                           > 1800000000
                      THEN 1 ELSE 0 END brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) sid
              FROM e),
        d AS (SELECT first(event_type ORDER BY ts, event_id) entry_type,
                     CAST(max(event_type = 'purchase') AS BIGINT) p
              FROM s GROUP BY user_id, sid),
        g AS (SELECT entry_type, CAST(count(*) AS BIGINT) n,
                     CAST(sum(p) AS BIGINT) np
              FROM d GROUP BY 1)
        SELECT entry_type, n, np, CAST(np * 10000 // n AS BIGINT)
        FROM g
    """).fetchall())
    assert got == want
    assert all(0 <= r[2] <= r[1] and 0 <= r[3] <= 10000 for r in got)
    # session count conserved against the sessionizer's own output
    n_sessions = sessionize_events(SF).count()
    assert sum(r[1] for r in got) == n_sessions


def test_nation_share_within_region_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        nation_share_within_region)

    got = sorted((r["region"], r["nation"], r["revenue_cents"],
                  r["share_e4"])
                 for r in nation_share_within_region(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH cells AS (
          SELECT r.r_name region, n.n_name nation,
                 CAST(sum(CAST(round(o.o_totalprice*100) AS BIGINT))
                      AS BIGINT) cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          GROUP BY 1, 2)
        SELECT region, nation, cents,
               CAST(cents * 10000 // sum(cents)
                        OVER (PARTITION BY region) AS BIGINT)
        FROM cells
    """).fetchall())
    assert got == want and len(got) == 25
    # per-region shares sum to <= 10000 (floor) and > 10000 - n_nations
    from itertools import groupby

    for reg, rows in groupby(got, key=lambda r: r[0]):
        rows = list(rows)
        s = sum(r[3] for r in rows)
        assert 10000 - len(rows) < s <= 10000
    # total cents conserved against orders
    tot = con.sql("""SELECT CAST(sum(CAST(round(o_totalprice*100)
                     AS BIGINT)) AS BIGINT) FROM orders""").fetchone()[0]
    assert sum(r[2] for r in got) == tot

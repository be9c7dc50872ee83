"""Exact DuckDB twins for the session-6 batch-8 operators:
customers_all_priorities (relational division per segment),
p99_outlier_counts (quantile-then-filter tail census),
token_concentration_by_source (exact-integer Simpson numerator)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "customer", "events", "documents"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_customers_all_priorities_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import customers_all_priorities

    got = sorted((r["c_mktsegment"], r["n_customers"], r["n_cover_all"])
                 for r in customers_all_priorities(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH per AS (SELECT o_custkey,
                            count(DISTINCT o_orderpriority) np
                     FROM orders GROUP BY 1),
        tot AS (SELECT count(DISTINCT o_orderpriority) t FROM orders)
        SELECT c.c_mktsegment, CAST(count(*) AS BIGINT),
               CAST(count(*) FILTER (WHERE per.np = tot.t) AS BIGINT)
        FROM per JOIN customer c ON per.o_custkey = c.c_custkey, tot
        GROUP BY 1
    """).fetchall())
    assert got == want
    # division is a subset, and both full- and partial-coverage occur
    assert all(0 <= r[2] <= r[1] for r in got)
    assert sum(r[2] for r in got) > 0
    assert sum(r[2] for r in got) < sum(r[1] for r in got)


def test_p99_outlier_counts_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import p99_outlier_counts

    got = sorted((r["event_type"], r["p99_cents"], r["n_above"])
                 for r in p99_outlier_counts(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT event_type,
                          CAST(round(coalesce(value,0)*100) AS BIGINT)
                              cents
                   FROM events),
        q AS (SELECT event_type,
                     CAST(quantile_disc(cents, 0.99) AS BIGINT) p99
              FROM c GROUP BY 1)
        SELECT c.event_type, q.p99,
               CAST(count(*) FILTER (WHERE c.cents > q.p99) AS BIGINT)
        FROM c JOIN q USING (event_type) GROUP BY 1, 2
    """).fetchall())
    assert got == want and len(got) == 5
    # strictly-above-P99 is at most 1% of the type's rows
    per_type = dict(con.sql(
        "SELECT event_type, count(*) FROM events GROUP BY 1").fetchall())
    for et, _, n_above in got:
        assert n_above <= per_type[et] * 0.01 + 1


def test_token_concentration_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import (
        token_concentration_by_source)

    got = sorted((r["source"], r["n_tokens"], r["collisions"])
                 for r in token_concentration_by_source(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH tok AS (
          SELECT source, t, CAST(count(*) AS BIGINT) c
          FROM (SELECT source,
                       unnest(string_split(coalesce(text,''), ' ')) t
                FROM documents)
          WHERE t <> '' GROUP BY 1, 2)
        SELECT source, CAST(sum(c) AS BIGINT),
               CAST(sum(c*(c-1)) AS BIGINT)
        FROM tok GROUP BY 1
    """).fetchall())
    assert got == want
    # token mass conserved against a direct corpus-wide count,
    # and every source has real collision mass (repeated tokens)
    n_tok = con.sql("""
        SELECT count(*) FROM (SELECT unnest(string_split(
            coalesce(text,''), ' ')) t FROM documents) WHERE t <> ''
    """).fetchone()[0]
    assert sum(r[1] for r in got) == n_tok
    assert all(r[2] > 0 for r in got)
    # Simpson probability is a valid share: coll <= N(N-1)
    assert all(r[2] <= r[1] * (r[1] - 1) for r in got)

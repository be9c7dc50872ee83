"""Exact DuckDB twins for the session-6 batch-18 operators:
copurchase_part_pairs (market-basket top-k with bounded per-basket
pair explosion) and qty_discount_suffstats (pushdown-covariance
sufficient statistics)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW lineitem AS SELECT * FROM "
          f"read_parquet('{SF}/lineitem.parquet')")
    return c


def test_copurchase_part_pairs_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import copurchase_part_pairs

    got = [(r["part_a"], r["part_b"], r["n_orders"])
           for r in copurchase_part_pairs(SF).take_all()]
    want = [tuple(r) for r in con.sql("""
        WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (SELECT a.l_partkey pa_, b.l_partkey pb_,
                         CAST(count(*) AS BIGINT) n
                  FROM p a JOIN p b ON a.l_orderkey = b.l_orderkey
                                   AND a.l_partkey < b.l_partkey
                  GROUP BY 1, 2)
        SELECT CAST(pa_ AS BIGINT), CAST(pb_ AS BIGINT), n
        FROM pairs ORDER BY n DESC, pa_, pb_ LIMIT 20
    """).fetchall()]
    assert got == want and len(got) == 20
    assert all(a < b for a, b, _ in got)  # canonical pair order
    # support ordering respected
    ns = [n for _, _, n in got]
    assert ns == sorted(ns, reverse=True)
    # total pair mass (all pairs, not just top-k) matches the basket
    # combinatorics sum l*(l-1)/2
    total = con.sql("""
        WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        b AS (SELECT l_orderkey, count(*) l FROM p GROUP BY 1)
        SELECT CAST(sum(l*(l-1)//2) AS BIGINT) FROM b""").fetchone()[0]
    pair_total = con.sql("""
        WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT count(*) FROM p a JOIN p b
          ON a.l_orderkey = b.l_orderkey
         AND a.l_partkey < b.l_partkey""").fetchone()[0]
    assert total == pair_total


def test_qty_discount_suffstats_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import qty_discount_suffstats

    got = sorted((r["l_returnflag"], r["n"], r["sum_q"], r["sum_d"],
                  r["sum_qd"], r["sum_q2"], r["sum_d2"])
                 for r in qty_discount_suffstats(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH x AS (SELECT l_returnflag,
                          CAST(round(l_quantity, 0) AS BIGINT) q,
                          CAST(round(l_discount*100) AS BIGINT) d
                   FROM lineitem)
        SELECT l_returnflag, CAST(count(*) AS BIGINT),
               CAST(sum(q) AS BIGINT), CAST(sum(d) AS BIGINT),
               CAST(sum(q*d) AS BIGINT), CAST(sum(q*q) AS BIGINT),
               CAST(sum(d*d) AS BIGINT)
        FROM x GROUP BY 1
    """).fetchall())
    assert got == want and len(got) == 3
    # Cauchy–Schwarz sanity on the exact sums: (Σqd)² ≤ Σq²·Σd²
    for _, n, sq, sd, sqd, sq2, sd2 in got:
        assert sqd * sqd <= sq2 * sd2
        assert n * sq2 >= sq * sq and n * sd2 >= sd * sd  # variances ≥ 0

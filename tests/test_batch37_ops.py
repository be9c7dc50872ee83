"""Batch-37: the segmented composite-key cummax (`_prior_group_max`)
and its two running-max-window consumers — personal_record_orders and
record_values_by_type — vs their DuckDB `max() OVER (... 1 PRECEDING)`
twins, plus a hypothesis property test of the kernel itself."""

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5),
                          st.integers(-1000, 1000)),
                max_size=60))
def test_prior_group_max_property(pairs):
    """For rows sorted by group, (has, prior) equals the brute-force
    running max of strictly-prior same-group values."""
    from sourmash_ray.pipelines.relational import _prior_group_max

    pairs = sorted(pairs)  # group non-decreasing
    grp = np.array([g for g, _ in pairs], np.int64)
    vals = np.array([v for _, v in pairs], np.int64)
    has, prior = _prior_group_max(grp, vals)
    for i in range(len(pairs)):
        prev = [vals[j] for j in range(i) if grp[j] == grp[i]]
        assert has[i] == bool(prev)
        if prev:
            assert prior[i] == max(prev)


def test_personal_record_orders_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import personal_record_orders

    got = sorted((r["o_orderpriority"], r["n_records"])
                 for r in personal_record_orders(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH s AS (SELECT o_orderpriority,
              CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
              max(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
                (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prior_max
              FROM orders)
        SELECT o_orderpriority, CAST(count(*) AS BIGINT)
        FROM s WHERE prior_max IS NOT NULL AND cents > prior_max
        GROUP BY 1
    """).fetchall())
    assert got == want
    # records are bounded by non-first orders
    non_first = con.sql("""
        SELECT sum(n - 1) FROM
        (SELECT count(*) AS n FROM orders GROUP BY o_custkey)
    """).fetchone()[0]
    assert 0 < sum(n for _, n in got) <= non_first


def test_record_values_by_type_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import record_values_by_type

    got = sorted((r["event_type"], r["n_records"])
                 for r in record_values_by_type(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH s AS (SELECT event_type,
              CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS cents,
              max(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS prior_max
              FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT)
        FROM s WHERE prior_max IS NOT NULL AND cents > prior_max
        GROUP BY 1
    """).fetchall())
    assert got == want

"""Batch-52: conv_ts_monotonicity_audit (ts non-decreasing in replay
order per conversation — the wall-clock integrity gate) and
events_weekend_share_by_type (weekend traffic permille per type) vs
their DuckDB twins, plus a synthetic non-monotonic fixture driven
through the partition kernel's classification logic."""

import duckdb
import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def _turns_path():
    from sourmash_ray.sources.transcripts import transcripts_path

    return transcripts_path(SF)


def test_conv_ts_monotonicity_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.transcriptops import (
        conv_ts_monotonicity_audit,
    )

    got = {r["is_monotonic"]: r["n_convs"]
           for r in conv_ts_monotonicity_audit(SF).take_all()}
    con = duckdb.connect()
    want = dict(con.sql(f"""
        WITH d AS (
          SELECT conv_id,
                 ts >= lag(ts) OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS ok
          FROM read_parquet('{_turns_path()}/*.parquet')),
        per AS (
          SELECT conv_id,
                 CAST(CASE WHEN bool_and(coalesce(ok, TRUE))
                      THEN 1 ELSE 0 END AS BIGINT) AS m
          FROM d GROUP BY conv_id)
        SELECT m, count(*) FROM per GROUP BY m""").fetchall())
    assert got == want
    n_convs = con.sql(
        f"SELECT count(DISTINCT conv_id) FROM "
        f"read_parquet('{_turns_path()}/*.parquet')").fetchone()[0]
    assert sum(got.values()) == n_convs


def test_monotonicity_kernel_flags_backwards_clock():
    """Classification logic on a hand-built partition: one monotonic
    conversation, one with a backwards step."""
    cid = np.array([b"a", b"a", b"a", b"b", b"b"])
    tix = np.array([0, 1, 2, 0, 1], np.int64)
    ts = np.array([10, 20, 30, 50, 40], np.int64)  # b goes backwards
    order = np.lexsort((tix, cid))
    cid_s, ts_s = cid[order], ts[order]
    same = cid_s[1:] == cid_s[:-1]
    backwards = same & (np.diff(ts_s) < 0)
    new = np.r_[True, ~same]
    conv_of = np.cumsum(new) - 1
    bad = np.zeros(int(conv_of[-1]) + 1, bool)
    bad[conv_of[1:][backwards]] = True
    assert bad.tolist() == [False, True]


def test_events_weekend_share_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.eventops import (
        events_weekend_share_by_type,
    )

    got = {r["event_type"]: (r["n_events"], r["n_weekend"],
                             r["weekend_permille"])
           for r in events_weekend_share_by_type(SF).take_all()}
    con = duckdb.connect()
    want = {t: (n, w, p) for t, n, w, p in con.sql(f"""
        WITH g AS (
          SELECT event_type, count(*) AS n,
                 CAST(sum(CASE WHEN dayofweek(ts) IN (0, 6)
                          THEN 1 ELSE 0 END) AS BIGINT) AS w
          FROM read_parquet('{SF}/events.parquet')
          GROUP BY event_type)
        SELECT event_type, n, w, CAST(1000 * w // n AS BIGINT)
        FROM g""").fetchall()}
    assert got == want
    n_events = con.sql(f"SELECT count(*) FROM read_parquet("
                       f"'{SF}/events.parquet')").fetchone()[0]
    assert sum(n for n, _, _ in got.values()) == n_events
    # a uniform-time synthetic corpus sits near 2/7 ≈ 286 permille
    assert all(0 <= p <= 1000 for _, _, p in got.values())

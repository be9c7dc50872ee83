"""Incremental view maintenance of the Q1 aggregate: maintained
base+delta cells must equal the from-scratch pricing_summary exactly,
and the warm path must reuse the persisted base instead of
recomputing it."""

import os
import shutil

SF = "/root/testdata/sf0.001"


def _cache_dir() -> str:
    import hashlib

    tag = hashlib.md5(os.path.abspath(SF).encode()).hexdigest()[:10]
    return f"/tmp/ivm_q1_{tag}"


def _rows(ds):
    return sorted((r["l_returnflag"], r["l_linestatus"], r["sum_qty"],
                   r["sum_price_cents"], r["count_order"])
                  for r in ds.take_all())


def test_ivm_equals_full_recompute_cold_and_warm(ray_session):
    from sourmash_ray.pipelines.incremental import (
        incremental_pricing_summary)
    from sourmash_ray.pipelines.relational import pricing_summary

    shutil.rmtree(_cache_dir(), ignore_errors=True)
    full = _rows(pricing_summary(SF))
    cold = _rows(incremental_pricing_summary(SF))
    assert cold == full and len(cold) == 6

    # warm: base cells must be REUSED (file untouched), result identical
    base_file = f"{_cache_dir()}/base_cells.parquet"
    mtime = os.path.getmtime(base_file)
    warm = _rows(incremental_pricing_summary(SF))
    assert warm == full
    assert os.path.getmtime(base_file) == mtime


def test_ivm_base_and_delta_partition_the_fact(ray_session):
    """The 90/10 split is a partition: base + delta row counts equal the
    full fact, so no line is double-counted or dropped."""
    import duckdb

    from sourmash_ray.pipelines.incremental import (
        incremental_pricing_summary)

    got = _rows(incremental_pricing_summary(SF))
    n_total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()[0]
    assert sum(r[4] for r in got) == n_total
    base = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet')
        WHERE l_orderkey % 10 != 0""").fetchone()[0]
    assert 0 < base < n_total  # both sides non-empty at this sf


def test_ivm_distinct_users_equals_full(ray_session):
    """Non-additive IVM: the maintained presence store's distinct-user
    count equals the from-scratch COUNT DISTINCT, cold and warm, and
    the warm path reuses the persisted base set."""
    import hashlib

    import duckdb

    from sourmash_ray.pipelines.incremental import (
        incremental_distinct_users)

    tag = hashlib.md5(os.path.abspath(SF).encode()).hexdigest()[:10]
    cache = f"/tmp/ivm_du_{tag}"
    shutil.rmtree(cache, ignore_errors=True)
    full = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{SF}/events.parquet')").fetchone()[0]
    cold = incremental_distinct_users(SF).take_all()
    assert cold == [{"n_users": full}]
    base_file = f"{cache}/base_users.parquet"
    mtime = os.path.getmtime(base_file)
    warm = incremental_distinct_users(SF).take_all()
    assert warm == [{"n_users": full}]
    assert os.path.getmtime(base_file) == mtime
    # the delta side genuinely contributes: base alone undercounts OR
    # equals (both splits non-empty is asserted via row counts)
    import pyarrow.parquet as pq

    n_base = pq.read_table(base_file).num_rows
    assert 0 < n_base <= full

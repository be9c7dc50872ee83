"""Exact DuckDB twins + invariants for the batch-30 operators:
supplier_balance_quantiles_by_region (two-hop broadcast dim +
grouped discrete quantiles over signed cents),
part_type_head_size_matrix (type-family × size census), and
incremental_revenue_by_nation — the JOIN-view IVM flavor (persisted
90% base + delta join), equal to the from-scratch Q5 rollup cold AND
warm with the base file untouched."""

import os
import shutil

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("supplier", "nation", "region", "part", "customer",
              "orders", "lineitem"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_supplier_balance_quantiles_by_region_matches_duckdb(
        ray_session, con):
    from sourmash_ray.pipelines.relational import (
        supplier_balance_quantiles_by_region)

    tbl = supplier_balance_quantiles_by_region(SF)
    got = sorted(zip(tbl["r_name"].to_pylist(), tbl["q"].to_pylist(),
                     tbl["value"].to_pylist()))
    want = sorted(tuple(r) for r in con.sql("""
        WITH s AS (SELECT r_name,
                CAST(round(s_acctbal * 100) AS BIGINT) AS cents
                FROM supplier
                JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey)
        SELECT r_name, CAST(q AS DOUBLE), CAST(v AS BIGINT)
        FROM (SELECT r_name, unnest([0.25, 0.5, 0.75, 0.9]) AS q,
                     unnest(quantile_disc(cents,
                            [0.25, 0.5, 0.75, 0.9])) AS v
              FROM s GROUP BY r_name)
    """).fetchall())
    assert got == want
    # quantiles are monotone within a region (signed-int ordering)
    for i in range(1, len(got)):
        if got[i][0] == got[i - 1][0]:
            assert got[i][2] >= got[i - 1][2]
    # every region is present with all four quantile rows
    n_regions = con.sql(
        "SELECT count(*) FROM region").fetchone()[0]
    assert len(got) == 4 * n_regions


def test_part_type_head_size_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        part_type_head_size_matrix)

    got = sorted((r["type_head"], r["p_size"], r["n_parts"])
                 for r in part_type_head_size_matrix(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT string_split(p_type, ' ')[1], CAST(p_size AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM part GROUP BY 1, 2
    """).fetchall())
    assert got == want
    total = con.sql("SELECT count(*) FROM part").fetchone()[0]
    assert sum(n for *_, n in got) == total


def _ivm_q5_cache() -> str:
    import hashlib

    tag = hashlib.md5(os.path.abspath(SF).encode()).hexdigest()[:10]
    return f"/tmp/ivm_q5_{tag}"


def test_ivm_join_equals_full_recompute_cold_and_warm(ray_session, con):
    from sourmash_ray.pipelines.incremental import (
        incremental_revenue_by_nation)
    from sourmash_ray.pipelines.relational import revenue_by_nation

    def _rows(ds):
        return sorted((r["n_name"], r["sum_revenue_e4"], r["n_items"])
                      for r in ds.take_all())

    shutil.rmtree(_ivm_q5_cache(), ignore_errors=True)
    full = _rows(revenue_by_nation(SF))
    cold = _rows(incremental_revenue_by_nation(SF))
    assert cold == full and len(cold) > 0

    # warm: the persisted base must be REUSED, result identical
    base_file = f"{_ivm_q5_cache()}/base_cells.parquet"
    mtime = os.path.getmtime(base_file)
    warm = _rows(incremental_revenue_by_nation(SF))
    assert warm == full
    assert os.path.getmtime(base_file) == mtime

    # and the SQL twin agrees (the driver checks the same oracle)
    want = sorted(tuple(r) for r in con.sql("""
        SELECT n_name,
               CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100, 0)
                                      AS BIGINT))) AS BIGINT),
               count(*)
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
          AND c_nationkey = n_nationkey
        GROUP BY n_name
    """).fetchall())
    assert warm == want

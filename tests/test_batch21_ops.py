"""Scan-level predicate pushdown: pushdown_urgent_revenue must match
both the DuckDB twin and a late-filter (scan-then-mask) variant of
itself — proving filter= at the reader changes WHERE the predicate
runs, never WHAT it returns."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW orders AS SELECT * FROM "
          f"read_parquet('{SF}/orders.parquet')")
    return c


def _late_filter_variant(sf_dir: str):
    """Same aggregate with the predicate as an in-kernel mask AFTER an
    unfiltered scan — the shape pushdown replaces."""
    from sourmash_ray.sources.tables import read_parquet_clean
    from sourmash_ray.stages.agg import grouped_sums

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice", "o_orderpriority"])

    def _tag(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(batch["o_orderpriority"], "1-URGENT"),
                    pc.greater(batch["o_totalprice"], 200_000.0))
        t = batch.filter(m)
        d = np.asarray(t["o_orderdate"], "datetime64[us]")
        mo = d.astype("datetime64[M]").astype(np.int64)
        c = np.rint(np.asarray(t["o_totalprice"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({"month": pa.array(mo, pa.int64()),
                         "cents": pa.array(c, pa.int64())})

    return grouped_sums(ds.map_batches(_tag, batch_format="pyarrow"),
                        ["month"], ["cents"], count_as="n_orders")


def test_pushdown_matches_duckdb_and_late_filter(ray_session, con):
    from sourmash_ray.pipelines.relational import pushdown_urgent_revenue

    got = sorted((r["month"], r["n_orders"], r["cents"])
                 for r in pushdown_urgent_revenue(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT CAST((year(o_orderdate)-1970)*12 + month(o_orderdate) - 1
                    AS BIGINT),
               CAST(count(*) AS BIGINT),
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
                    AS BIGINT)
        FROM orders
        WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
        GROUP BY 1
    """).fetchall())
    assert got == want and len(got) >= 5
    late = sorted((r["month"], r["n_orders"], r["sum_cents"])
                  for r in _late_filter_variant(SF).take_all())
    assert got == late
    # the predicate is genuinely selective on this corpus
    n_all = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert sum(r[1] for r in got) < n_all / 2

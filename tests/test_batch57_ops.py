"""Batch-57: case_ratio_by_source (uppercase-mass audit — the case
split char_class_profile folds away) and orders_day_of_month_census
(month-end batch-effect detector) vs their DuckDB twins."""

import duckdb
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_case_ratio_by_source_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.docops import case_ratio_by_source

    got = {r["source"]: (r["n_upper"], r["n_lower"],
                         r["upper_permille"])
           for r in case_ratio_by_source(SF).take_all()}
    con = duckdb.connect()
    want = {s: (u, l, p) for s, u, l, p in con.sql(f"""
        WITH s AS (
          SELECT source,
                 CAST(sum(length(t) - length(regexp_replace(t,
                      '[A-Z]', '', 'g'))) AS BIGINT) AS n_upper,
                 CAST(sum(length(t) - length(regexp_replace(t,
                      '[a-z]', '', 'g'))) AS BIGINT) AS n_lower
          FROM (SELECT source, coalesce(text, '') AS t
                FROM read_parquet('{SF}/documents.parquet'))
          GROUP BY source)
        SELECT source, n_upper, n_lower,
               CASE WHEN n_upper + n_lower > 0
                    THEN 1000 * n_upper // (n_upper + n_lower)
                    ELSE 0 END
        FROM s""").fetchall()}
    assert got == want
    # permille is a valid floor-share wherever letters exist
    assert all(0 <= p <= 1000 for _, _, p in got.values())
    assert any(u + l > 0 for u, l, _ in got.values())


def test_case_ratio_zero_letter_source(ray_session, tmp_path):
    """An all-digit source reports 0 permille (the pinned convention),
    not a crash."""
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import case_ratio_by_source

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["123 456", None], pa.string()),
        "lang": pa.array(["en", "en"], pa.string()),
        "source": pa.array(["digits", "digits"], pa.string()),
        "n_chars": pa.array([7, 0], pa.int64()),
    }), tmp_path / "documents.parquet")
    rows = case_ratio_by_source(str(tmp_path)).take_all()
    assert rows == [{"source": "digits", "n_upper": 0, "n_lower": 0,
                     "upper_permille": 0}]


def test_orders_day_of_month_census_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import (
        orders_day_of_month_census)

    got = {r["day_of_month"]: (r["n_orders"], r["sum_totalprice_e2"])
           for r in orders_day_of_month_census(SF).take_all()}
    con = duckdb.connect()
    want = {d: (n, s) for d, n, s in con.sql(f"""
        SELECT CAST(day(o_orderdate) AS BIGINT), count(*),
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT)
        FROM read_parquet('{SF}/orders.parquet') GROUP BY 1
        """).fetchall()}
    assert got == want
    assert set(got) <= set(range(1, 32))
    n_orders = con.sql(f"SELECT count(*) FROM read_parquet("
                       f"'{SF}/orders.parquet')").fetchone()[0]
    assert sum(n for n, _ in got.values()) == n_orders

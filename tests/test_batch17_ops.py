"""Exact DuckDB twins for the session-6 batch-17 operators:
order_value_mad (two-pass exact median-absolute-deviation) and
type_mix_by_value_decile (spend-decile behavioral mix)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_order_value_mad_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import order_value_mad

    got = [(r["median_cents"], r["mad_cents"])
           for r in order_value_mad(SF).take_all()]
    want = [tuple(r) for r in con.sql("""
        WITH c AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) cents
                   FROM orders),
        m AS (SELECT CAST(quantile_disc(cents, 0.5) AS BIGINT) med
              FROM c)
        SELECT m.med, CAST(quantile_disc(abs(c.cents - m.med), 0.5)
                           AS BIGINT)
        FROM c, m GROUP BY 1
    """).fetchall()]
    assert got == want and len(got) == 1
    med, mad = got[0]
    assert med > 0 and mad > 0
    # MAD really covers half the mass: |x-med| <= mad for >= 50% of rows
    frac = con.sql(f"""
        SELECT count(*) FILTER (WHERE
            abs(CAST(round(o_totalprice*100) AS BIGINT) - {med})
            <= {mad}) * 2 >= count(*)
        FROM orders""").fetchone()[0]
    assert frac


def test_type_mix_by_value_decile_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import type_mix_by_value_decile

    got = sorted((r["decile"], r["event_type"], r["n_events"],
                  r["share_e4"])
                 for r in type_mix_by_value_decile(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH per AS (SELECT user_id,
                            CAST(sum(CAST(round(coalesce(value,0)*100)
                                AS BIGINT)) AS BIGINT) c
                     FROM events GROUP BY 1),
        t AS (SELECT user_id, ntile(10) OVER (ORDER BY c DESC, user_id) d
              FROM per),
        cells AS (SELECT t.d, e.event_type, CAST(count(*) AS BIGINT) n
                  FROM events e JOIN t ON e.user_id = t.user_id
                  GROUP BY 1, 2)
        SELECT CAST(d AS BIGINT), event_type, n,
               CAST(n * 10000 // sum(n) OVER (PARTITION BY d) AS BIGINT)
        FROM cells
    """).fetchall())
    assert got == want
    # event mass conserved, per-decile floor shares bounded
    n_events = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert sum(r[2] for r in got) == n_events
    from itertools import groupby

    for _, rows in groupby(got, key=lambda r: r[0]):
        rows = list(rows)
        s = sum(r[3] for r in rows)
        assert 10000 - len(rows) < s <= 10000

"""Exact DuckDB twins for the session-6 batch-16 operators:
length_gini_by_source (exact-integer Gini rational) and
user_type_run_lengths (same-type habit bursts)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_length_gini_by_source_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import length_gini_by_source

    got = sorted((r["source"], r["gini_num"], r["gini_den"])
                 for r in length_gini_by_source(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH r AS (SELECT source, CAST(n_chars AS BIGINT) x,
                          row_number() OVER (PARTITION BY source
                                             ORDER BY n_chars, doc_id) rk
                   FROM documents)
        SELECT source,
               CAST(2*sum(rk*x) - (count(*)+1)*sum(x) AS BIGINT),
               CAST(count(*)*sum(x) AS BIGINT)
        FROM r GROUP BY 1
    """).fetchall())
    assert got == want
    # 0 <= G < 1 and real inequality exists somewhere
    assert all(0 <= num < den for _, num, den in got)
    assert any(num > 0 for _, num, _ in got)
    # cross-check one source against a direct mean-absolute-difference
    # Gini (num/den == sum|xi-xj| / (2 n sum x))
    src, num, den = got[0]
    xs = [r[0] for r in con.sql(
        f"SELECT n_chars FROM documents WHERE source = '{src}'"
    ).fetchall()]
    mad = sum(abs(a - b) for a in xs for b in xs)
    assert num * 2 * len(xs) * sum(xs) == mad * den


def test_user_type_run_lengths_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import user_type_run_lengths

    got = sorted((r["event_type"], r["run_len"], r["n_runs"])
                 for r in user_type_run_lengths(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH o AS (SELECT user_id, event_type, ts, event_id,
                          CASE WHEN lag(event_type) OVER w
                                   IS DISTINCT FROM event_type
                               THEN 1 ELSE 0 END brk
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)),
        r AS (SELECT user_id, event_type,
                     sum(brk) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) rid
              FROM o),
        g AS (SELECT user_id, rid, event_type,
                     CAST(count(*) AS BIGINT) len
              FROM r GROUP BY 1, 2, 3)
        SELECT event_type, len, CAST(count(*) AS BIGINT)
        FROM g GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # every event lives in exactly one run: Σ len·n_runs == n_events
    n_events = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert sum(l * n for _, l, n in got) == n_events
    assert any(l >= 2 for _, l, _ in got)  # real bursts exist

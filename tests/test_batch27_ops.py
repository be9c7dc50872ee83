"""Exact DuckDB twins + invariants for the batch-27 operators:
echo_rate_transcripts (adjacent-turn token-overlap cells by role
pair), conv_topic_drift_histogram (first-vs-last turn Jaccard
deciles), order_weekday_priority_matrix (isodow × priority)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"

_WS = "[ \\t\\n\\r\\f\\v]+"


@pytest.fixture(scope="module")
def con():
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    c.sql(f"CREATE VIEW orders AS SELECT * FROM "
          f"read_parquet('{SF}/orders.parquet')")
    c.sql(f"CREATE VIEW transcripts AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    return c


def test_echo_rate_transcripts_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import (
        echo_rate_transcripts)

    got = sorted(
        (r["role_a"], r["role_b"], r["n_pairs"], r["n_echo"],
         r["sum_inter"], r["sum_union"])
        for r in echo_rate_transcripts(SF).take_all())
    want = sorted(tuple(r) for r in con.sql(f"""
        WITH base AS (SELECT conv_id, turn_idx, role,
                trim(regexp_replace(coalesce(text, ''), '{_WS}',
                                    ' ', 'g')) AS trimmed
                FROM transcripts),
        tok AS (SELECT DISTINCT conv_id, turn_idx,
                       unnest(string_split(trimmed, ' ')) AS token
                FROM base WHERE trimmed <> ''),
        cnt AS (SELECT conv_id, turn_idx, count(*) AS n
                FROM tok GROUP BY 1, 2),
        pairs AS (SELECT a.conv_id, a.turn_idx,
                         a.role AS role_a, b.role AS role_b
                  FROM base a JOIN base b
                    ON a.conv_id = b.conv_id
                   AND b.turn_idx = a.turn_idx + 1),
        inter AS (SELECT t1.conv_id, t1.turn_idx, count(*) AS i
                  FROM tok t1 JOIN tok t2
                    ON t1.conv_id = t2.conv_id
                   AND t2.turn_idx = t1.turn_idx + 1
                   AND t1.token = t2.token
                  GROUP BY 1, 2),
        e AS (SELECT p.role_a, p.role_b,
                     coalesce(ca.n, 0) AS na, coalesce(cb.n, 0) AS nb,
                     coalesce(i.i, 0) AS i
              FROM pairs p
              LEFT JOIN cnt ca ON ca.conv_id = p.conv_id
                              AND ca.turn_idx = p.turn_idx
              LEFT JOIN cnt cb ON cb.conv_id = p.conv_id
                              AND cb.turn_idx = p.turn_idx + 1
              LEFT JOIN inter i ON i.conv_id = p.conv_id
                               AND i.turn_idx = p.turn_idx)
        SELECT role_a, role_b, CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN na + nb - i > 0
                              AND 4 * i >= na + nb - i
                        THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(i) AS BIGINT),
               CAST(sum(na + nb - i) AS BIGINT)
        FROM e GROUP BY 1, 2
    """).fetchall())
    assert got == want
    # pair inventory: Σ n_pairs == adjacent (turn, turn+1) pairs
    total = con.sql("""
        SELECT sum(n - 1) FROM
        (SELECT count(*) AS n FROM transcripts GROUP BY conv_id)
    """).fetchone()[0]
    assert sum(r[2] for r in got) == total
    # intersection never exceeds union; echo never exceeds pairs
    for *_, np_, ne, si, su in [(None, None, r[2], r[3], r[4], r[5])
                                for r in got]:
        assert ne <= np_ and si <= su


def test_conv_topic_drift_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import (
        conv_topic_drift_histogram)

    got = sorted((r["drift_decile"], r["n_convs"])
                 for r in conv_topic_drift_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql(f"""
        WITH base AS (SELECT conv_id, turn_idx,
                trim(regexp_replace(coalesce(text, ''), '{_WS}',
                                    ' ', 'g')) AS trimmed
                FROM transcripts),
        fl AS (SELECT conv_id, min(turn_idx) AS ft, max(turn_idx) AS lt
               FROM base GROUP BY conv_id),
        tok AS (SELECT DISTINCT b.conv_id, b.turn_idx,
                       unnest(string_split(b.trimmed, ' ')) AS token
                FROM base b JOIN fl ON b.conv_id = fl.conv_id
                WHERE b.trimmed <> ''
                  AND (b.turn_idx = fl.ft OR b.turn_idx = fl.lt)),
        cnt AS (SELECT t.conv_id,
                    count(DISTINCT CASE WHEN t.turn_idx = fl.ft
                                   THEN t.token END)
                  + count(DISTINCT CASE WHEN t.turn_idx = fl.lt
                                   THEN t.token END)
                  - count(DISTINCT t.token) AS i,
                    count(DISTINCT t.token) AS u
                FROM tok t JOIN fl ON t.conv_id = fl.conv_id
                GROUP BY t.conv_id)
        SELECT CAST(i * 10 // u AS BIGINT), CAST(count(*) AS BIGINT)
        FROM cnt WHERE u > 0 GROUP BY 1
    """).fetchall())
    assert got == want
    # every conv with a non-empty endpoint turn is counted once
    n_convs = con.sql("""
        SELECT count(DISTINCT conv_id) FROM transcripts
        WHERE trim(regexp_replace(coalesce(text, ''),
                   '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) <> ''
    """).fetchone()[0]
    assert sum(n for _, n in got) <= n_convs
    assert all(0 <= d <= 10 for d, _ in got)


def test_order_weekday_priority_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        order_weekday_priority_matrix)

    got = sorted((r["isodow"], r["o_orderpriority"], r["n_orders"])
                 for r in order_weekday_priority_matrix(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT CAST(isodow(o_orderdate) AS BIGINT), o_orderpriority,
               CAST(count(*) AS BIGINT)
        FROM orders GROUP BY 1, 2
    """).fetchall())
    assert got == want
    total = con.sql("SELECT count(*) FROM orders").fetchone()[0]
    assert sum(n for *_, n in got) == total
    assert all(1 <= d <= 7 for d, *_ in got)

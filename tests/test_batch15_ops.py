"""Exact DuckDB twins for the session-6 batch-15 operators:
user_entry_exit_matrix (user-grain lifecycle cells),
unit_price_quantiles_by_brand (floor unit price under the brand
broadcast + grouped value-histogram quantile),
doc_first_token_topk (document-initial token profile)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "lineitem", "part", "documents"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_user_entry_exit_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.eventops import user_entry_exit_matrix

    got = sorted((r["first_type"], r["last_type"], r["n_users"])
                 for r in user_entry_exit_matrix(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH b AS (SELECT user_id,
                          first(event_type ORDER BY ts, event_id) f,
                          last(event_type ORDER BY ts, event_id) l
                   FROM events GROUP BY 1)
        SELECT f, l, CAST(count(*) AS BIGINT) FROM b GROUP BY 1, 2
    """).fetchall())
    assert got == want
    n_users = con.sql(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert sum(r[2] for r in got) == n_users


def test_unit_price_quantiles_by_brand_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        unit_price_quantiles_by_brand)

    got = sorted((r["p_brand"], r["q"], r["unit_cents"])
                 for r in unit_price_quantiles_by_brand(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH u AS (SELECT p.p_brand,
                          CAST(round(l.l_extendedprice*100) AS BIGINT)
                          // CAST(round(l.l_quantity, 0) AS BIGINT)
                              unit_cents
                   FROM lineitem l JOIN part p
                     ON l.l_partkey = p.p_partkey
                   WHERE CAST(round(l.l_quantity, 0) AS BIGINT) > 0)
        SELECT p_brand, CAST(q AS DOUBLE), CAST(v AS BIGINT)
        FROM (SELECT p_brand, unnest([0.25,0.5,0.75,0.9]) q,
                     unnest(quantile_disc(unit_cents,
                                          [0.25,0.5,0.75,0.9])) v
              FROM u GROUP BY p_brand)
    """).fetchall())
    assert got == want and len(got) >= 4
    # quantiles non-decreasing within a brand (got sorted by brand, q)
    from itertools import groupby

    for _, rows in groupby(got, key=lambda r: r[0]):
        vals = [r[2] for r in rows]
        assert vals == sorted(vals) and all(v > 0 for v in vals)


def test_doc_first_token_topk_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import doc_first_token_topk

    got = [(r["tok"], r["n_docs"])
           for r in doc_first_token_topk(SF).take_all()]
    want = [tuple(r) for r in con.sql("""
        WITH f AS (SELECT split_part(coalesce(text,''), ' ', 1) tok
                   FROM documents)
        SELECT tok, CAST(count(*) AS BIGINT) FROM f WHERE tok <> ''
        GROUP BY tok ORDER BY 2 DESC, tok LIMIT 20
    """).fetchall()]
    assert got == want and len(got) == 20
    # ordering contract: count desc, token asc tiebreak
    assert all((a[1], a[0]) >= (b[1], a[0]) and
               (a[1] > b[1] or a[0] < b[0])
               for a, b in zip(got, got[1:]))


def test_blocking_key_selectivity_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import blocking_key_selectivity

    got = sorted((r["block_size"], r["n_blocks"])
                 for r in blocking_key_selectivity(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH b AS (SELECT n_chars,
                          split_part(coalesce(text,''), ' ', 1) ft,
                          CAST(count(*) AS BIGINT) sz
                   FROM documents GROUP BY 1, 2)
        SELECT sz, CAST(count(*) AS BIGINT) FROM b GROUP BY 1
    """).fetchall())
    assert got == want
    # block mass conserved: Σ size·n_blocks == corpus size
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(s * n for s, n in got) == n_docs

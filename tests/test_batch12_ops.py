"""Exact DuckDB twins for the session-6 batch-12 operators:
neardup_label_homophily (label matrix over the exact cosine pair
graph), vocab_size_by_source (type-token Heaps observables on the
shared (source, tok) exchange)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("embeddings", "documents"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


def test_neardup_label_homophily_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.ann import (
        embedding_neardup_exact, neardup_label_homophily)

    got = sorted((r["label_a"], r["label_b"], r["n_pairs"])
                 for r in neardup_label_homophily(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH q AS (SELECT vec_id, label,
                          list_transform(embedding,
                              x -> round(CAST(x AS DOUBLE)*10000)) qe
                   FROM embeddings)
        SELECT CAST(least(a.label, b.label) AS BIGINT),
               CAST(greatest(a.label, b.label) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM q a JOIN q b ON a.vec_id < b.vec_id
        WHERE round(10000*list_dot_product(a.qe, b.qe)
                    / sqrt(list_dot_product(a.qe, a.qe)
                           * list_dot_product(b.qe, b.qe))) >= 4000
        GROUP BY 1, 2
    """).fetchall())
    assert got == want and len(got) > 5
    assert all(a <= b for a, b, _ in got)  # canonical order
    # pair mass conserved against the pair inventory itself
    n_pairs = embedding_neardup_exact(SF).count()
    assert sum(n for _, _, n in got) == n_pairs


def test_vocab_size_by_source_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import (
        token_concentration_by_source, vocab_size_by_source)

    got = sorted((r["source"], r["n_types"], r["n_tokens"],
                  r["type_token_e4"])
                 for r in vocab_size_by_source(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH tok AS (SELECT source, t, CAST(count(*) AS BIGINT) c
                     FROM (SELECT source, unnest(string_split(
                               coalesce(text,''), ' ')) t
                           FROM documents)
                     WHERE t <> '' GROUP BY 1, 2)
        SELECT source, CAST(count(*) AS BIGINT),
               CAST(sum(c) AS BIGINT),
               CAST(count(*) * 10000 // sum(c) AS BIGINT)
        FROM tok GROUP BY 1
    """).fetchall())
    assert got == want
    assert all(1 <= r[1] <= r[2] for r in got)  # types <= tokens
    # token mass agrees with the Simpson op's shared exchange
    simpson = {r["source"]: r["n_tokens"]
               for r in token_concentration_by_source(SF).take_all()}
    assert {r[0]: r[2] for r in got} == simpson

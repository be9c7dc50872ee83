"""NULL-tolerance of the doc/agg operators: DuckDB-parity semantics
(count(*) counts NULL-keyed rows; quantile_disc skips NULL values; md5
ops treat NULL text as '' on both engine and oracle side)."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def null_sf(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("nulldocs")
    tbl = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(["hello world", None, "", "x y z", None, "q",
                          "hello world", "zz"], pa.string()),
        "lang": pa.array(["en", "en", None, "es", "es", None, "en", "en"],
                         pa.string()),
        "source": pa.array([f"src{i}" for i in range(8)], pa.string()),
        "n_chars": pa.array([11, 0, 0, 5, 0, 1, 11, 2], pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def test_grouped_sums_counts_null_keyed_rows(ray_session):
    import ray.data

    from sourmash_ray.stages.agg import grouped_sums

    tbl = pa.table({
        "k": pa.array(["a", None, "a", None, None], pa.string()),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = {r["k"]: (r["sum_v"], r["n"]) for r in grouped_sums(
        ray.data.from_arrow(tbl), ["k"], ["v"], count_as="n").take_all()}
    assert out["a"] == (4, 2)
    assert out[None] == (11, 3)      # count(*) semantics, not count(k)


def test_doc_ops_tolerate_null_text(null_sf):
    from sourmash_ray.pipelines import docops

    split = {(r["split"], r["lang"]): r["n_docs"]
             for r in docops.hash_split_docs(null_sf).take_all()}
    assert sum(split.values()) == 8   # NULL text rows assigned, not lost
    sample = docops.stratified_sample_docs(null_sf).take_all()
    assert all(r["doc_id"] in range(8) for r in sample)
    dedup = docops.exact_dedup_docs(null_sf).take_all()
    # NULL and '' normalize identically -> one shared md5 group
    md5s = [r["text_md5"] for r in dedup]
    assert len(md5s) == len(set(md5s)) == 5
    q = docops.length_quantiles_docs(null_sf)
    assert q.num_rows == 6
    ql = docops.length_quantiles_by_lang(null_sf).to_pylist()
    langs = {r["lang"] for r in ql}
    assert langs == {"en", "es", None}   # NULL group kept (GROUP BY)


def test_quantiles_skip_null_values(ray_session):
    import ray.data

    from sourmash_ray.stages.agg import grouped_quantiles_disc, \
        quantiles_disc

    tbl = pa.table({
        "g": pa.array(["x", "x", "y", "y"], pa.string()),
        "v": pa.array([1, None, None, None], pa.int64()),
    })
    ds = ray.data.from_arrow(tbl)
    out = quantiles_disc(ds, "v", [0.5]).to_pylist()
    assert out == [{"q": 0.5, "value": 1}]
    # group with only NULL values vanishes (n == 0), like quantile_disc
    grp = grouped_quantiles_disc(ds, "g", "v", [0.5]).to_pylist()
    assert grp == [{"g": "x", "q": 0.5, "value": 1}]


def test_round3_doc_ops_tolerate_null_text(null_sf):
    from sourmash_ray.pipelines import docops

    lex = {r["doc_id"]: r["n_tokens"]
           for r in docops.lexical_diversity_docs(null_sf).take_all()}
    assert set(lex) == {0, 3, 5, 6, 7}      # NULL/'' docs dropped
    qf = {r["doc_id"]: r["kept"]
          for r in docops.quality_filter_docs(null_sf).take_all()}
    assert set(qf) == {0, 3, 5, 6, 7}
    lm = {r["doc_id"]: (r["n_trigrams"], r["lm_score_e3"])
          for r in docops.trigram_lm_score_docs(null_sf).take_all()}
    assert len(lm) == 8
    assert lm[1] == (0, None) and lm[2] == (0, None)   # NULL/'' -> NULL
    assert lm[0][0] > 0 and lm[0][1] is not None
    # doc 6 repeats doc 0's text -> exact contamination vs bench {0,1}
    dec = {r["doc_id"]: r["contaminated"]
           for r in docops.exact_decontaminate_docs(
               null_sf, n_bench=2).take_all()}
    assert dec[6] == 1 and dec[3] == 0
    # NULL text normalizes to '' == doc 2's '' -> bench NULL (doc 1)
    # contaminates the empty doc 4
    assert dec[2] == 1 and dec[4] == 1
    kl = docops.source_divergence_docs(null_sf).take_all()
    assert {r["source"] for r in kl} <= {f"src{i}" for i in range(8)}


def test_round5_doc_ops_tolerate_null_text(null_sf):
    """dup_rate_by_source / doc_length_histogram / interleave on the
    null-text fixture: no crash, DuckDB-parity semantics."""
    import duckdb

    from sourmash_ray.pipelines.docops import (doc_length_histogram,
                                               dup_rate_by_source_docs,
                                               interleave_sources_docs)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{null_sf}/documents.parquet')")

    got = sorted((r["source"], r["n_docs"], r["n_distinct"], r["n_dups"])
                 for r in dup_rate_by_source_docs(null_sf).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH h AS (SELECT source,
            md5(trim(regexp_replace(lower(coalesce(text,'')),
                     '[ \t\n\r\f\v]+', ' ', 'g'))) AS m FROM documents)
        SELECT source, count(*), CAST(count(DISTINCT m) AS BIGINT),
               CAST(count(*) - count(DISTINCT m) AS BIGINT)
        FROM h GROUP BY source""").fetchall())
    assert got == want

    got = sorted((r["bucket_lo"], r["n_docs"], r["sum_chars"])
                 for r in doc_length_histogram(null_sf).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        SELECT CAST((n_chars // 256) * 256 AS BIGINT), count(*),
               CAST(sum(n_chars) AS BIGINT)
        FROM documents GROUP BY 1""").fetchall())
    assert got == want

    got = sorted((r["doc_id"], r["source"], r["pos"])
                 for r in interleave_sources_docs(null_sf).take_all())
    assert [g[2] for g in got] == list(range(8))  # 8 sources, 1 doc each


def test_column_profile_nulls_match_duckdb(null_sf):
    import duckdb

    from sourmash_ray.pipelines import docops

    got = {r["col_name"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
           for r in docops.column_profile_docs(null_sf).take_all()}
    con = duckdb.connect()
    for col in ("doc_id", "text", "lang", "source", "n_chars"):
        want = con.execute(f"""
            SELECT count(*), count(*) - count({col}),
                   count(DISTINCT {col})
            FROM read_parquet('{null_sf}/documents.parquet')
        """).fetchone()
        assert got[col] == tuple(int(x) for x in want), col


def test_cross_source_dup_matrix_null_text(null_sf):
    """NULL text and '' normalize to the same md5 group; their two
    sources form a cross-source dup pair (DuckDB coalesce parity)."""
    import duckdb

    from sourmash_ray.pipelines import docops

    res = docops.cross_source_dup_matrix(null_sf)
    rows = (res.take_all() if hasattr(res, "take_all")
            else res.to_pylist())
    got = {(r["src_a"], r["src_b"]): r["n_groups"] for r in rows}
    want = dict()
    for a, b, n in duckdb.connect().execute(f"""
        WITH h AS (
          SELECT md5(trim(regexp_replace(lower(coalesce(text, '')),
                          '[ \t\n\r\f\v]+', ' ', 'g'))) AS m,
                 coalesce(source, '') AS s
          FROM read_parquet('{null_sf}/documents.parquet')),
        g AS (SELECT m, s, count(*) AS n FROM h GROUP BY 1, 2)
        SELECT a.s, b.s, count(*) FROM g a JOIN g b
          ON a.m = b.m AND (a.s < b.s OR (a.s = b.s AND a.n >= 2))
        GROUP BY 1, 2
    """).fetchall():
        want[(a, b)] = int(n)
    assert got == want
    assert got  # the NULL/''/dup-text groups must appear

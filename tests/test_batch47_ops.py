"""Batch-47: langid_confusion_matrix — (actual × predicted) language
cells for the n-gram heuristic, reconciled against the per-doc
langid_docs output and the composed DuckDB twin."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_langid_confusion_matrix_matches_duckdb(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    from sourmash_ray.pipelines.docops import (langid_confusion_matrix,
                                               langid_docs)

    got = sorted((r["lang_actual"], r["lang_guess"], r["n_docs"])
                 for r in langid_confusion_matrix(SF).take_all())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    want = sorted(tuple(r) for r in con.sql(
        "WITH l AS ({}) SELECT lang_actual, lang_guess, "
        "CAST(count(*) AS BIGINT) FROM l GROUP BY 1, 2".format(
            e._langid_sql())).fetchall())
    assert got == want
    # the matrix is the exact contraction of the per-doc langid output
    from collections import Counter

    per_doc = Counter()
    for r in langid_docs(SF).take_all():
        per_doc[(r["lang_actual"], r["lang_guess"])] += 1
    assert dict(per_doc) == {(a, g): n for a, g, n in got}
    # sanity: some diagonal mass exists, every actual lang appears,
    # and every document lands in exactly one cell (the synthetic
    # corpus is mostly marker-free, so the heuristic sits near chance
    # — the matrix is the audit that MEASURES that, not a claim)
    assert sum(n for a, g, n in got if a == g) > 0
    total = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(n for *_, n in got) == total
    actual_langs = {r[0] for r in con.sql(
        "SELECT DISTINCT lang FROM documents").fetchall()}
    assert {a for a, *_ in got} == actual_langs

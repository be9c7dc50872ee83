"""Persisted inverted text index: build + partition-pruned tf-idf
search vs the DuckDB oracle, pruning bound, missing-term behavior."""
import glob

import pyarrow as pa


def _build(tmp_path, sf="/root/testdata/sf0.001"):
    from sourmash_ray.pipelines.textindex import build_text_index

    idx = str(tmp_path / "tix")
    build_text_index(sf, idx)
    return idx, sf


def test_text_search_matches_duckdb(ray_session, tmp_path):
    import duckdb

    import __ray_entry__ as e

    from sourmash_ray.pipelines.textindex import text_search_docs

    idx, sf = _build(tmp_path)
    got = [(r["doc_id"], r["score"], r["rn"]) for r in
           text_search_docs(idx, ["merge", "spark", "window"],
                            k=20).take_all()]
    got.sort(key=lambda r: r[2])
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    want = [tuple(r) for r in
            con.sql(e.oracle_sql()["text_search_docs"]).fetchall()]
    want.sort(key=lambda r: r[2])
    assert got == want


def test_text_search_prunes_partitions(ray_session, tmp_path):
    from sourmash_ray.pipelines.textindex import (N_TOK_FILES,
                                                  _pruned_files)

    idx, _ = _build(tmp_path)
    all_parts = glob.glob(f"{idx}/postings/tok_file=*")
    assert len(all_parts) > 3        # the index is genuinely spread out
    files = _pruned_files(idx, "postings", ["merge", "spark", "window"])
    touched = {f.split("tok_file=")[1].split("/")[0] for f in files}
    assert 1 <= len(touched) <= 3    # <= one partition per term
    assert len(files) < len(glob.glob(f"{idx}/postings/*/*.parquet"))


def test_text_search_missing_terms(ray_session, tmp_path):
    from sourmash_ray.pipelines.textindex import text_search_docs

    idx, _ = _build(tmp_path)
    # entirely absent vocabulary -> empty result, correct schema
    out = text_search_docs(idx, ["zzz_not_a_word"], k=5)
    assert out.take_all() == []
    # present + absent mix: absent term contributes nothing
    a = [(r["doc_id"], r["score"]) for r in
         text_search_docs(idx, ["merge"], k=5).take_all()]
    b = [(r["doc_id"], r["score"]) for r in
         text_search_docs(idx, ["merge", "zzz_not_a_word"],
                          k=5).take_all()]
    assert a == b

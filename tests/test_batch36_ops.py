"""Exact DuckDB twins + invariants for the batch-36 operators:
tool_chain_trigrams (3-step agent-loop motifs over tool turns) and
alphabet_size_histogram (distinct chars per doc off the Arrow string
buffers)."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM "
          f"read_parquet('{SF}/documents.parquet')")
    c.sql(f"CREATE VIEW transcripts AS SELECT * FROM "
          f"read_parquet('{transcripts_path(SF)}/*.parquet')")
    return c


def test_tool_chain_trigrams_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.transcriptops import tool_chain_trigrams

    got = sorted((r["tool_1"], r["tool_2"], r["tool_3"],
                  r["n_trigrams"])
                 for r in tool_chain_trigrams(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH t AS (SELECT conv_id, turn_idx, tool FROM transcripts
                   WHERE tool IS NOT NULL AND tool <> ''),
        s AS (SELECT tool AS tool_1, lead(tool) OVER w AS tool_2,
                     lead(tool, 2) OVER w AS tool_3
              FROM t
              WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
        SELECT tool_1, tool_2, tool_3, count(*)
        FROM s WHERE tool_2 IS NOT NULL AND tool_3 IS NOT NULL
        GROUP BY 1, 2, 3
    """).fetchall())
    assert got == want
    # mass conservation: Σ trigrams = Σ_conv max(0, tool-turns − 2)
    total = con.sql("""
        SELECT sum(CASE WHEN n > 2 THEN n - 2 ELSE 0 END) FROM
        (SELECT count(*) AS n FROM transcripts
         WHERE tool IS NOT NULL AND tool <> '' GROUP BY conv_id)
    """).fetchone()[0]
    assert sum(n for *_, n in got) == (total or 0)


def test_alphabet_size_histogram_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import alphabet_size_histogram

    got = sorted((r["n_distinct_chars"], r["n_docs"])
                 for r in alphabet_size_histogram(SF).take_all())
    want = sorted(tuple(r) for r in con.sql("""
        WITH c AS (SELECT doc_id,
                CAST(length(list_distinct(string_split(
                    coalesce(text, ''), ''))) AS BIGINT) AS n
                FROM documents)
        SELECT n, CAST(count(*) AS BIGINT) FROM c GROUP BY 1
    """).fetchall())
    assert got == want
    # every doc counted once; ASCII bound
    total = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert sum(n for _, n in got) == total
    assert all(1 <= d <= 128 for d, _ in got)


def test_alphabet_kernel_empty_convention(ray_session):
    """The buffer kernel applies the empty-string convention (alphabet
    1, matching DuckDB string_split('','')) and exact distinct counts
    on a hand corpus."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import alphabet_size_histogram

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["abca", "", "ab"]),
        }), os.path.join(td, "documents.parquet"))
        got = sorted((r["n_distinct_chars"], r["n_docs"])
                     for r in alphabet_size_histogram(td).take_all())
    # 'abca' → {a,b,c}=3, '' → 1, 'ab' → 2
    assert got == [(1, 1), (2, 1), (3, 1)]

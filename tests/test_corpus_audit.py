"""Exact DuckDB twins for the cross-source corpus-audit operators
(hapax rate, stopword mass, pairwise vocabulary Jaccard) and the
embeddings-audit pair (label dispersion, sparsity profile). Each runs
the distributed pipeline at sf0.001 and compares value-exactly against
an independent SQL formulation over the same bytes; the oracle_sql()
entries run the same comparison at sf0.01 under the driver."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM "
          f"read_parquet('{SF}/documents.parquet')")
    c.sql(f"CREATE VIEW embeddings AS SELECT * FROM "
          f"read_parquet('{SF}/embeddings.parquet')")
    return c


def test_hapax_rate_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import hapax_rate_by_source_docs

    got = sorted(map(tuple, hapax_rate_by_source_docs(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql("""
        WITH tf AS (
          SELECT source, t AS tok, count(*) AS c
          FROM (SELECT source, unnest(string_split(coalesce(text,''),' '))
                    AS t FROM documents)
          WHERE t <> '' GROUP BY source, t)
        SELECT source, count(*),
               CAST(sum(CASE WHEN c=1 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(1000000*sum(CASE WHEN c=1 THEN 1 ELSE 0 END)
                    // count(*) AS BIGINT)
        FROM tf GROUP BY source
    """).fetchall())
    assert got == want and len(got) == 20
    # non-degenerate: at least one source has a hapax
    assert any(r[2] > 0 for r in got)


def test_stopword_rate_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import (STOPWORDS,
                                               stopword_rate_by_source_docs)

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    got = sorted(map(tuple, stopword_rate_by_source_docs(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql(f"""
        SELECT source, count(*),
               CAST(sum(CASE WHEN t IN ({sw}) THEN 1 ELSE 0 END) AS BIGINT),
               CAST(1000000*sum(CASE WHEN t IN ({sw}) THEN 1 ELSE 0 END)
                    // count(*) AS BIGINT)
        FROM (SELECT source, unnest(string_split(coalesce(text,''),' '))
                  AS t FROM documents)
        WHERE t <> '' GROUP BY source
    """).fetchall())
    assert got == want and len(got) == 20
    assert any(r[2] > 0 for r in got)


def test_stopword_sql_literal_in_sync():
    """The oracle_sql literal and docops.STOPWORDS must never drift."""
    import __ray_entry__ as e
    from sourmash_ray.pipelines.docops import STOPWORDS

    assert e._STOPWORDS_SQL == ", ".join(f"'{w}'" for w in STOPWORDS)


def test_vocab_overlap_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import vocab_overlap_sources_docs

    got = sorted(map(tuple, vocab_overlap_sources_docs(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql("""
        WITH st AS (
          SELECT DISTINCT source, t AS tok
          FROM (SELECT source, unnest(string_split(coalesce(text,''),' '))
                    AS t FROM documents)
          WHERE t <> ''),
        tot AS (SELECT source, count(*) AS n FROM st GROUP BY source),
        com AS (SELECT a.source AS sa, b.source AS sb, count(*) AS c
                FROM st a JOIN st b
                  ON a.tok = b.tok AND a.source < b.source
                GROUP BY 1, 2)
        SELECT ta.source, tb.source, CAST(coalesce(c.c,0) AS BIGINT),
               CAST(ta.n AS BIGINT), CAST(tb.n AS BIGINT),
               CAST(1000000*coalesce(c.c,0)
                    // (ta.n + tb.n - coalesce(c.c,0)) AS BIGINT)
        FROM tot ta JOIN tot tb ON ta.source < tb.source
        LEFT JOIN com c ON c.sa = ta.source AND c.sb = tb.source
    """).fetchall())
    assert got == want and len(got) == 190  # 20 choose 2


def test_vocab_overlap_disjoint_and_partial(ray_session, tmp_path):
    """Hand corpus where the SQL twin can't be consulted blind: one
    disjoint pair (jaccard 0), one partial overlap, exact expected ppm."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import vocab_overlap_sources_docs

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["x y z", "x y q", "only unique words"]),
        "source": pa.array(["sA", "sB", "sC"]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = {(r["source_a"], r["source_b"]):
           (r["n_common"], r["n_a"], r["n_b"], r["jaccard_ppm"])
           for r in vocab_overlap_sources_docs(str(tmp_path)).to_pylist()}
    assert got == {
        ("sA", "sB"): (2, 3, 3, 1_000_000 * 2 // 4),
        ("sA", "sC"): (0, 3, 3, 0),
        ("sB", "sC"): (0, 3, 3, 0),
    }


def test_label_dispersion_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.ann import label_dispersion

    got = sorted(map(tuple, label_dispersion(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql("""
        WITH u AS (SELECT CAST(label AS BIGINT) AS label,
                          CAST(generate_subscripts(embedding,1) AS BIGINT)
                              AS dim,
                          CAST(round(CAST(unnest(embedding) AS DOUBLE)
                               * 10000) AS BIGINT) AS q
                   FROM embeddings),
        pd AS (SELECT label, dim, count(*) AS n,
                      CAST(sum(q) AS BIGINT) AS s,
                      CAST(sum(q*q) AS BIGINT) AS ss
               FROM u GROUP BY label, dim)
        SELECT label, CAST(max(n) AS BIGINT), CAST(sum(ss) AS BIGINT),
               CAST(sum(n*ss - s*s) AS BIGINT)
        FROM pd GROUP BY label
    """).fetchall())
    assert got == want and len(got) == 10
    assert all(r[3] > 0 for r in got)  # real scatter in every label


def test_label_dispersion_single_vector_is_zero(ray_session, tmp_path):
    """n=1 labels must report dispersion 0 (n·Σq² − (Σq)² with n=1 and a
    single vector collapses exactly)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.ann import label_dispersion

    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.5, -0.25], [0.1, 0.2], [0.3, 0.2]],
                              pa.list_(pa.float32())),
        "label": pa.array([7, 8, 8], pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    got = {r["label"]: (r["n_vecs"], r["dispersion"])
           for r in label_dispersion(str(tmp_path)).take_all()}
    assert got[7] == (1, 0)
    # label 8: dims (1000,3000) and (2000,2000): 2*(1e6+9e6)-(4000**2)
    #          + 2*(4e6+4e6)-(4000**2) = 4_000_000 + 0
    assert got[8] == (2, 4_000_000)


def test_vector_sparsity_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.ann import vector_sparsity_profile

    got = sorted(map(tuple, vector_sparsity_profile(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql("""
        WITH per AS (
          SELECT vec_id,
                 sum(CASE WHEN abs(CAST(round(CAST(e AS DOUBLE)*10000)
                          AS BIGINT)) <= 500 THEN 1 ELSE 0 END) AS c
          FROM (SELECT vec_id, unnest(embedding) AS e FROM embeddings)
          GROUP BY vec_id)
        SELECT CAST(c AS BIGINT), count(*) FROM per GROUP BY c
    """).fetchall())
    assert got == want and len(got) > 5
    # histogram covers every vector exactly once
    assert sum(r[1] for r in got) == 500


def test_char_class_profile_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import char_class_profile_docs

    got = sorted(map(tuple, char_class_profile_docs(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql("""
        SELECT lang, CAST(sum(length(t)) AS BIGINT),
               CAST(sum(length(t) - length(regexp_replace(t,'[a-zA-Z]','','g'))) AS BIGINT),
               CAST(sum(length(t) - length(regexp_replace(t,'[0-9]','','g'))) AS BIGINT),
               CAST(sum(length(t) - length(replace(t,' ',''))) AS BIGINT),
               CAST(sum(length(regexp_replace(replace(t,' ',''),'[a-zA-Z0-9]','','g'))) AS BIGINT)
        FROM (SELECT lang, coalesce(text,'') AS t FROM documents)
        GROUP BY lang
    """).fetchall())
    assert got == want and len(got) == 5


def test_char_class_profile_hand_fixture(ray_session, tmp_path):
    """Digits / punctuation / NULL text — classes the synth corpus barely
    exercises; n_other picks up punctuation and the class sums tile
    n_chars exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import char_class_profile_docs

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["ab 12!", None, "x,y.z"]),
        "lang": pa.array(["aa", "aa", "bb"]),
    })
    pq.write_table(t, tmp_path / "documents.parquet")
    got = {r["lang"]: (r["n_chars"], r["n_alpha"], r["n_digit"],
                       r["n_space"], r["n_other"])
           for r in char_class_profile_docs(str(tmp_path)).take_all()}
    assert got == {"aa": (6, 2, 2, 1, 1), "bb": (5, 3, 0, 0, 2)}


def test_customer_order_gap_quantiles_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.relational import (
        customer_order_gap_quantiles)

    c2 = con
    c2.sql(f"CREATE VIEW IF NOT EXISTS orders AS SELECT * FROM "
           f"read_parquet('{SF}/orders.parquet')")
    c2.sql(f"CREATE VIEW IF NOT EXISTS customer AS SELECT * FROM "
           f"read_parquet('{SF}/customer.parquet')")
    got = sorted(map(tuple, customer_order_gap_quantiles(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted((s, float(q), v) for s, q, v in c2.sql("""
        WITH l AS (
          SELECT o_custkey, lag(o_orderdate) OVER w AS prev, o_orderdate
          FROM orders
          WINDOW w AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey)),
        g AS (SELECT o_custkey,
                     (CAST(epoch_us(o_orderdate) AS BIGINT)
                      - CAST(epoch_us(prev) AS BIGINT)) // 86400000000
                         AS gap_days
              FROM l WHERE prev IS NOT NULL)
        SELECT c_mktsegment, q, CAST(v AS BIGINT)
        FROM (SELECT c_mktsegment, unnest([0.25,0.5,0.75,0.9]) AS q,
                     unnest(quantile_disc(gap_days, [0.25,0.5,0.75,0.9]))
                         AS v
              FROM g JOIN customer ON c_custkey = o_custkey
              GROUP BY c_mktsegment)
    """).fetchall())
    assert got == want and len(got) == 20  # 5 segments x 4 quantiles


def test_doc_embedding_coverage(ray_session, con, tmp_path):
    from sourmash_ray.pipelines.ann import doc_embedding_coverage

    # sf0.001: 500 docs, 500 vecs, ids coincide fully
    row = doc_embedding_coverage(SF).take_all()[0]
    assert (row["matched"], row["docs_without_vec"],
            row["vecs_without_doc"]) == (500, 0, 0)

    # hand fixture with holes on both sides
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 5], pa.int64()),
        "text": pa.array(["a", "b", "c", "d"]),
    }), tmp_path / "documents.parquet")
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 9], pa.int64()),
        "embedding": pa.array([[0.1], [0.2], [0.3]],
                              pa.list_(pa.float32())),
    }), tmp_path / "embeddings.parquet")
    row = doc_embedding_coverage(str(tmp_path)).take_all()[0]
    assert (row["matched"], row["docs_without_vec"],
            row["vecs_without_doc"]) == (2, 2, 1)


def test_centroid_distance_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.ann import centroid_distance_matrix

    got = sorted(map(tuple, centroid_distance_matrix(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql("""
        WITH u AS (
          SELECT CAST(label AS BIGINT) AS label,
                 CAST(round(CAST(unnest(embedding) AS DOUBLE)*10000)
                      AS BIGINT) AS q,
                 CAST(generate_subscripts(embedding,1) AS BIGINT) AS dim
          FROM embeddings),
        c AS (SELECT label, dim, CAST(sum(q) // count(*) AS BIGINT) AS ce
              FROM u GROUP BY label, dim)
        SELECT a.label, b.label,
               CAST(sum((a.ce - b.ce)*(a.ce - b.ce)) AS BIGINT)
        FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
        GROUP BY 1, 2
    """).fetchall())
    assert got == want and len(got) == 45  # 10 choose 2
    assert all(r[2] > 0 for r in got)


def test_conv_depth_histogram_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.transcriptops import conv_depth_histogram
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    got = sorted((r["n_turns"], r["n_convs"])
                 for r in conv_depth_histogram(SF).take_all())
    want = sorted(tuple(r) for r in c.sql(f"""
        WITH per AS (SELECT conv_id, count(*) AS n
                     FROM read_parquet('{transcripts_path(SF)}/*.parquet')
                     GROUP BY conv_id)
        SELECT CAST(n AS BIGINT), count(*) FROM per GROUP BY n
    """).fetchall())
    assert got == want and len(got) > 1
    # histogram mass == conversation count
    n_convs = c.sql(f"SELECT count(DISTINCT conv_id) FROM read_parquet("
                    f"'{transcripts_path(SF)}/*.parquet')").fetchone()[0]
    assert sum(r[1] for r in got) == n_convs


def test_user_event_type_diversity_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.eventops import user_event_type_diversity

    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM "
          f"read_parquet('{SF}/events.parquet')")
    got = sorted((r["n_types"], r["n_users"])
                 for r in user_event_type_diversity(SF).take_all())
    want = sorted(tuple(r) for r in c.sql("""
        WITH per AS (SELECT user_id, count(DISTINCT event_type) AS n
                     FROM events GROUP BY user_id)
        SELECT CAST(n AS BIGINT), count(*) FROM per GROUP BY n
    """).fetchall())
    assert got == want and got


def test_conv_lexical_diversity_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.transcriptops import conv_lexical_diversity
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    got = sorted(map(tuple, conv_lexical_diversity(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in c.sql(f"""
        WITH tok AS (
          SELECT conv_id, t
          FROM (SELECT conv_id, unnest(string_split(coalesce(text,''),' '))
                    AS t
                FROM read_parquet('{transcripts_path(SF)}/*.parquet'))
          WHERE t <> '')
        SELECT conv_id, count(*), CAST(count(DISTINCT t) AS BIGINT),
               CAST(1000000 * count(DISTINCT t) // count(*) AS BIGINT)
        FROM tok GROUP BY conv_id
    """).fetchall())
    assert got == want and len(got) > 50
    # TTR is a ratio: every row in (0, 1e6]
    assert all(0 < r[3] <= 1_000_000 for r in got)


def test_snapshot_diff_transcripts_matches_duckdb(ray_session):
    import duckdb

    from __ray_entry__ import _turns_snapshot_b_dir
    from sourmash_ray.pipelines.transcriptops import (
        snapshot_diff_transcripts)
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    got = sorted((r["conv_id"], r["status"])
                 for r in snapshot_diff_transcripts(
                     SF, _turns_snapshot_b_dir(SF)).take_all())
    want = sorted(tuple(r) for r in c.sql(f"""
        WITH ta AS (
          SELECT conv_id, turn_idx, coalesce(text,'') AS text,
                 CAST(regexp_extract(conv_id, '[0-9]+') AS BIGINT) AS cnum
          FROM read_parquet('{transcripts_path(SF)}/*.parquet')),
        bk AS (SELECT conv_id, turn_idx,
                      CASE WHEN cnum % 7 = 0 AND turn_idx = 0
                           THEN text || ' +changed+' ELSE text END AS text
               FROM ta WHERE cnum % 10 <> 0),
        badd AS (SELECT conv_id || '_snap' AS conv_id, turn_idx, text
                 FROM ta WHERE cnum % 13 = 0),
        b AS (SELECT * FROM bk UNION ALL SELECT * FROM badd),
        fa AS (SELECT conv_id, md5(string_agg(text, chr(31)
                      ORDER BY turn_idx)) AS fp FROM ta GROUP BY conv_id),
        fb AS (SELECT conv_id, md5(string_agg(text, chr(31)
                      ORDER BY turn_idx)) AS fp FROM b GROUP BY conv_id)
        SELECT coalesce(fa.conv_id, fb.conv_id),
               CASE WHEN fa.conv_id IS NULL THEN 'added'
                    WHEN fb.conv_id IS NULL THEN 'removed'
                    ELSE 'changed' END
        FROM fa FULL OUTER JOIN fb ON fa.conv_id = fb.conv_id
        WHERE fa.conv_id IS NULL OR fb.conv_id IS NULL OR fa.fp <> fb.fp
    """).fetchall())
    assert got == want and got
    # every status class is exercised by the derivation
    statuses = {s for _, s in got}
    assert statuses == {"added", "removed", "changed"}


def test_media_kind_lang_matrix_matches_duckdb(ray_session, con):
    from sourmash_ray.stages.multimodal import (media_kind_lang_matrix,
                                                media_path)

    got = sorted(map(tuple, media_kind_lang_matrix(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in con.sql(f"""
        SELECT kind, lang, count(*), CAST(sum(n_bytes) AS BIGINT)
        FROM read_parquet('{media_path(SF)}/*.parquet') m
        JOIN documents d ON d.doc_id = m.media_id
        GROUP BY kind, lang
    """).fetchall())
    assert got == want and len(got) == 10  # 2 kinds x 5 langs


def test_exact_dedup_conversations_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.transcriptops import (
        exact_dedup_conversations)
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    got = sorted(map(tuple, exact_dedup_conversations(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in c.sql(f"""
        WITH f AS (SELECT conv_id,
                          md5(string_agg(coalesce(text,''), chr(31)
                              ORDER BY turn_idx)) AS fp
                   FROM read_parquet('{transcripts_path(SF)}/*.parquet')
                   GROUP BY conv_id)
        SELECT fp, count(*), min(conv_id)
        FROM f GROUP BY fp HAVING count(*) >= 2
    """).fetchall())
    assert got == want and got  # synth corpus HAS exact conv re-logs


def test_split_leakage_transcripts_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.transcriptops import (
        split_leakage_transcripts)
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    got = sorted(map(tuple, split_leakage_transcripts(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in c.sql(f"""
        WITH f AS (
          SELECT conv_id,
                 md5(string_agg(coalesce(text,''), chr(31)
                     ORDER BY turn_idx)) AS fp,
                 CASE WHEN CAST(concat('0x', substr(md5(conv_id), 1, 8))
                           AS UBIGINT) % 10 < 8
                      THEN 1 ELSE 0 END AS it
          FROM read_parquet('{transcripts_path(SF)}/*.parquet')
          GROUP BY conv_id),
        g AS (SELECT fp, count(*) AS c, CAST(sum(it) AS BIGINT) AS tr,
                     CAST(count(*) - sum(it) AS BIGINT) AS ho,
                     min(conv_id) AS rep
              FROM f GROUP BY fp)
        SELECT fp, c, tr, ho, rep FROM g WHERE tr > 0 AND ho > 0
    """).fetchall())
    assert got == want and got  # leaks exist at sf0.001 (2 groups)
    # a leaking group has members on BOTH sides by definition
    assert all(r[2] > 0 and r[3] > 0 for r in got)


def test_customer_rfm_segments_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.relational import customer_rfm_segments

    c = duckdb.connect()
    c.sql(f"CREATE VIEW orders AS SELECT * FROM "
          f"read_parquet('{SF}/orders.parquet')")
    got = sorted(map(tuple, customer_rfm_segments(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in c.sql("""
        WITH per AS (SELECT o_custkey, max(o_orderdate) AS last_d,
                            count(*) AS n,
                            CAST(sum(CAST(round(o_totalprice*100)
                                 AS BIGINT)) AS BIGINT) AS cents
                     FROM orders GROUP BY o_custkey),
        mx AS (SELECT max(last_d) AS m FROM per),
        t AS (SELECT CASE WHEN (CAST(epoch_us(m) AS BIGINT)
                               - CAST(epoch_us(last_d) AS BIGINT))
                               // 86400000000 <= 90 THEN 0
                          WHEN (CAST(epoch_us(m) AS BIGINT)
                               - CAST(epoch_us(last_d) AS BIGINT))
                               // 86400000000 <= 270 THEN 1
                          ELSE 2 END AS r,
                     CASE WHEN n >= 12 THEN 0 WHEN n >= 9 THEN 1
                          ELSE 2 END AS f,
                     CASE WHEN cents >= 280000000 THEN 0
                          WHEN cents >= 200000000 THEN 1
                          ELSE 2 END AS m
              FROM per, mx)
        SELECT CAST(r AS BIGINT), CAST(f AS BIGINT), CAST(m AS BIGINT),
               count(*)
        FROM t GROUP BY 1, 2, 3
    """).fetchall())
    assert got == want and len(got) > 5
    # cell mass == customer universe (every customer lands in one cell)
    n_cust = c.sql("SELECT count(DISTINCT o_custkey) FROM orders"
                   ).fetchone()[0]
    assert sum(r[3] for r in got) == n_cust


def test_events_weekday_hour_heatmap_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.eventops import events_weekday_hour_heatmap

    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM "
          f"read_parquet('{SF}/events.parquet')")
    got = sorted(map(tuple, events_weekday_hour_heatmap(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in c.sql("""
        SELECT CAST(isodow(ts) AS BIGINT), CAST(hour(ts) AS BIGINT),
               count(*),
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
        FROM events GROUP BY 1, 2
    """).fetchall())
    assert got == want and len(got) > 100  # most of the 168 cells lit
    # every event lands in exactly one cell
    n = c.sql("SELECT count(*) FROM events").fetchone()[0]
    assert sum(r[2] for r in got) == n


def test_first_tool_position_histogram_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.transcriptops import (
        first_tool_position_histogram)
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    got = sorted((r["first_tool"], r["n_convs"])
                 for r in first_tool_position_histogram(SF).take_all())
    want = sorted(tuple(r) for r in c.sql(f"""
        WITH f AS (SELECT conv_id, min(turn_idx) AS ft
                   FROM read_parquet('{transcripts_path(SF)}/*.parquet')
                   WHERE tool IS NOT NULL AND tool <> ''
                   GROUP BY conv_id)
        SELECT CAST(ft AS BIGINT), count(*) FROM f GROUP BY ft
    """).fetchall())
    assert got == want and got


def test_length_quantiles_by_split_matches_duckdb(ray_session, con):
    from sourmash_ray.pipelines.docops import length_quantiles_by_split

    got = sorted(map(tuple, length_quantiles_by_split(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted((s, float(q), v) for s, q, v in con.sql("""
        WITH s AS (
          SELECT CASE WHEN b < 80 THEN 'train'
                      WHEN b < 90 THEN 'valid' ELSE 'test' END AS split,
                 n_chars
          FROM (SELECT n_chars,
                       CAST(concat('0x', substr(md5(coalesce(text,'')),
                            1, 8)) AS UBIGINT) % 100 AS b
                FROM documents))
        SELECT split, q, CAST(v AS BIGINT)
        FROM (SELECT split, unnest([0.25,0.5,0.75,0.9]) AS q,
                     unnest(quantile_disc(n_chars, [0.25,0.5,0.75,0.9]))
                         AS v
              FROM s GROUP BY split)
    """).fetchall())
    assert got == want and len(got) == 12  # 3 splits x 4 quantiles


def test_response_latency_by_role_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.transcriptops import (
        response_latency_by_role)
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    got = sorted(map(tuple, response_latency_by_role(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted((r, float(q), v) for r, q, v in c.sql(f"""
        WITH g AS (
          SELECT role,
                 (CAST(epoch_us(ts) AS BIGINT)
                  - CAST(epoch_us(lag(ts) OVER w) AS BIGINT))
                     // 1000000 AS gap_s
          FROM read_parquet('{transcripts_path(SF)}/*.parquet')
          WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
        SELECT role, q, CAST(v AS BIGINT)
        FROM (SELECT role, unnest([0.25,0.5,0.75,0.9]) AS q,
                     unnest(quantile_disc(gap_s, [0.25,0.5,0.75,0.9]))
                         AS v
              FROM g WHERE gap_s IS NOT NULL GROUP BY role)
    """).fetchall())
    assert got == want and len(got) == 8  # 2 roles x 4 quantiles


def test_session_gap_threshold_sweep_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.eventops import session_gap_threshold_sweep

    c = duckdb.connect()
    c.sql(f"CREATE VIEW events AS SELECT * FROM "
          f"read_parquet('{SF}/events.parquet')")
    got = sorted((r["gap_minutes"], r["n_sessions"])
                 for r in session_gap_threshold_sweep(SF).take_all())
    want = sorted(tuple(r) for r in c.sql("""
        WITH g AS (SELECT (CAST(epoch_us(ts) AS BIGINT)
                           - CAST(epoch_us(lag(ts) OVER w) AS BIGINT))
                              AS gap
                   FROM events
                   WINDOW w AS (PARTITION BY user_id
                                ORDER BY ts, event_id)),
        thr AS (SELECT unnest([5, 15, 30, 60, 120]) AS m),
        u AS (SELECT count(DISTINCT user_id) AS n FROM events)
        SELECT CAST(t.m AS BIGINT),
               CAST(u.n + (SELECT count(*) FROM g
                           WHERE gap > CAST(t.m AS BIGINT) * 60000000)
                    AS BIGINT)
        FROM thr t, u
    """).fetchall())
    assert got == want and len(got) == 5
    # the curve is monotone non-increasing in the threshold
    curve = [n for _, n in got]
    assert all(a >= b for a, b in zip(curve, curve[1:]))
    # and consistent with the real sessionizer at its default gap
    from sourmash_ray.pipelines.eventops import sessionize_events

    default_30 = dict(got)[30]
    n_sess = sessionize_events(SF).count()
    assert n_sess == default_30


def test_tool_chain_bigrams_matches_duckdb(ray_session):
    import duckdb

    from sourmash_ray.pipelines.transcriptops import (
        conv_tool_chain_counts, tool_chain_bigrams)
    from sourmash_ray.sources.transcripts import transcripts_path

    c = duckdb.connect()
    got = sorted(map(tuple, tool_chain_bigrams(SF).to_pandas()
                     .itertuples(index=False)))
    want = sorted(tuple(r) for r in c.sql(f"""
        WITH t AS (SELECT conv_id, turn_idx, tool
                   FROM read_parquet('{transcripts_path(SF)}/*.parquet')
                   WHERE tool IS NOT NULL AND tool <> ''),
        l AS (SELECT tool, lag(tool) OVER (PARTITION BY conv_id
                                           ORDER BY turn_idx) AS prev
              FROM t)
        SELECT prev, tool, count(*) FROM l WHERE prev IS NOT NULL
        GROUP BY 1, 2
    """).fetchall())
    assert got == want and got
    # internal consistency: total bigrams == sum over chains of (len-1)
    chains = conv_tool_chain_counts(SF).take_all()
    expect = sum((r["chain"].count(">")) * r["n_convs"] for r in chains)
    assert sum(r[2] for r in got) == expect

"""Term-frequency kernel + TF-IDF/top-token pipelines vs naive oracles."""
from __future__ import annotations

from collections import Counter

import pyarrow as pa

from sourmash_ray.pipelines.docops import _tf_rows_batch


def _naive_tf(docs):
    out = {}
    for did, text in docs:
        for tok, c in Counter(
                t for t in (text or "").split(" ") if t).items():
            out[(did, tok)] = c
    return out


def test_tf_rows_kernel_matches_naive():
    docs = [
        (7, "a b a  c a"),            # double space → empty token dropped
        (9, ""), (11, None),          # empty / null → no rows
        (13, "x"),
        (15, "é é ü 日本 日本 日本"),   # multi-byte tokens count by content
    ]
    batch = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })
    got = {(r["doc_id"], r["tok"]): r["tf"]
           for r in _tf_rows_batch(batch).to_pylist()}
    assert got == _naive_tf(docs)


def test_tf_rows_empty_batch():
    batch = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    assert _tf_rows_batch(batch).num_rows == 0


def test_tfidf_and_top_tokens_small(ray_session, tmp_path):
    """End-to-end over a 4-doc corpus vs hand-computed scores."""
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import (
        tfidf_top_terms_docs, top_tokens_docs)

    docs = [(0, "cat dog cat"), (1, "dog fish"), (2, "cat"),
            (3, "owl owl owl dog")]
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    }), f"{tmp_path}/documents.parquet")

    # df: cat=2, dog=3, fish=1, owl=1; N=4
    # doc0: cat tf2 → 2*4*1e4//2=40000; dog tf1 → 1*4*1e4//3=13333
    got = {(r["doc_id"], r["rn"]): (r["tok"], r["score_e4"])
           for r in tfidf_top_terms_docs(str(tmp_path), k=2).take_all()}
    assert got == {
        (0, 1): ("cat", 40000), (0, 2): ("dog", 13333),
        (1, 1): ("fish", 40000), (1, 2): ("dog", 13333),
        (2, 1): ("cat", 20000),
        (3, 1): ("owl", 120000), (3, 2): ("dog", 13333),
    }

    top = [(r["tok"], r["n_occurrences"])
           for r in top_tokens_docs(str(tmp_path), k=3).take_all()]
    assert top == [("cat", 3), ("dog", 3), ("owl", 3)]


def test_pack_docs_offsets_stream_invariants(ray_session, tmp_path):
    """Per shard: offsets are contiguous (each doc starts where the
    previous ended), sequences cover the stream, seq/offset fields are
    consistent with start_char."""
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import pack_docs_offsets

    n = 200
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "n_chars": pa.array([(i * 37) % 500 + 1 for i in range(n)],
                            pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    L = 128
    rows = pack_docs_offsets(str(tmp_path), n_shards=4,
                             max_len=L).take_all()
    lens = {i: (i * 37) % 500 + 1 for i in range(n)}
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert sum(len(v) for v in by_shard.values()) == n
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["start_char"])
        expect_start = 0
        for r in rs:
            assert r["start_char"] == expect_start
            assert r["start_seq"] == r["start_char"] // L
            assert r["start_offset"] == r["start_char"] % L
            assert r["end_seq"] == (r["start_char"]
                                    + lens[r["doc_id"]] - 1) // L
            expect_start += lens[r["doc_id"]]


def test_heavy_hitters_equal_exact_on_zipf(ray_session, tmp_path):
    """Large synthetic Zipf vocabulary: the bounded-shuffle heavy-hitter
    path returns the SAME top-k (tokens AND exact counts) as the
    every-distinct-token exact path, and the correctness precondition
    (k-th true count > N/(m+1)) holds with a wide margin."""
    import numpy as np
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import (heavy_hitters_docs,
                                               top_tokens_docs)

    rng = np.random.RandomState(5)
    vocab = np.array([f"w{i:04d}" for i in range(2000)])
    # Zipf ranks: p(i) ~ 1/(i+1)
    p = 1.0 / np.arange(1, len(vocab) + 1)
    p /= p.sum()
    docs = [" ".join(rng.choice(vocab, size=80, p=p)) for _ in range(300)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(300), pa.int64()),
        "text": pa.array(docs, pa.string()),
        "lang": pa.array(["en"] * 300, pa.string()),
        "source": pa.array(["s"] * 300, pa.string()),
        "n_chars": pa.array([len(d) for d in docs], pa.int64()),
    }), f"{tmp_path}/documents.parquet")

    k, m = 10, 128
    exact = [(r["tok"], r["n_occurrences"])
             for r in top_tokens_docs(str(tmp_path), k=k).take_all()]
    hh = [(r["tok"], r["n_occurrences"])
          for r in heavy_hitters_docs(str(tmp_path), k=k,
                                      m=m).take_all()]
    assert hh == exact
    n_total = 300 * 80
    assert exact[k - 1][1] > n_total // (m + 1)


def test_doc_token_profile_edge_cases():
    """Empty text, NULL text, multi-space runs, repeated tokens,
    stopword counting — the profile kernel vs hand counts."""
    import numpy as np

    from sourmash_ray.pipelines.docops import _doc_token_profile

    batch = pa.table({
        "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
        "text": pa.array(["a a the  cat", "", None, "zebra"], pa.string()),
    })
    ids, n_tok, n_uni, sum_len, n_stop = _doc_token_profile(batch)
    assert list(ids) == [10, 11, 12, 13]
    assert list(n_tok) == [4, 0, 0, 1]      # double space -> empty token dropped
    assert list(n_uni) == [3, 0, 0, 1]      # {a, the, cat}
    assert list(sum_len) == [1 + 1 + 3 + 3, 0, 0, 5]
    assert list(n_stop) == [3, 0, 0, 0]     # a, a, the
    assert n_tok.dtype == np.int64 and sum_len.dtype == np.int64


def test_lexdiv_and_quality_filter_match_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    q, o = e.queries(), e.oracle_sql()
    for name in ("lexical_diversity_docs", "quality_filter_docs"):
        got = sorted(tuple(r[c] for c in r)
                     for r in q[name](sf).take_all())
        want = sorted(tuple(r) for r in con.sql(o[name]).fetchall())
        assert got == want, name
    # the gate must actually gate (both classes present)
    kept = {r["kept"] for r in q["quality_filter_docs"](sf).take_all()}
    assert kept == {0, 1}


def test_exact_decontaminate_planted(ray_session, tmp_path):
    """Planted leakage: corpus doc 30 repeats bench doc 2's text (with
    different whitespace — normalization must still catch it); corpus
    doc 31 is clean."""
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import exact_decontaminate_docs

    texts = {i: f"doc body {i} unique words" for i in range(25)}
    texts[30] = "doc  body 2   unique words"   # ws-normalized == doc 2
    texts[31] = "completely different"
    ids = sorted(texts)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids], pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["s"] * len(ids), pa.string()),
        "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
    }), f"{tmp_path}/documents.parquet")

    got = {r["doc_id"]: r["contaminated"]
           for r in exact_decontaminate_docs(str(tmp_path),
                                             n_bench=25).take_all()}
    assert got == {30: 1, 31: 0}


def test_pivot_and_rollup_match_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    q, o = e.queries(), e.oracle_sql()
    for name in ("source_lang_pivot", "lang_rollup_totals"):
        got = sorted((tuple((c, r[c]) for c in r)
                      for r in q[name](sf).take_all()), key=repr)
        want_df = con.sql(o[name]).fetchdf()
        want = sorted((tuple(zip(want_df.columns, row))
                       for row in want_df.itertuples(index=False)),
                      key=repr)
        assert got == want, name


def test_pivot_unknown_lang_raises(ray_session, tmp_path):
    import pytest
    import pyarrow.parquet as pq

    import ray

    from sourmash_ray.pipelines.docops import source_lang_pivot

    pq.write_table(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["x"], pa.string()),
        "lang": pa.array(["xx"], pa.string()),     # not in the pivot set
        "source": pa.array(["s"], pa.string()),
        "n_chars": pa.array([1], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    with pytest.raises(ray.exceptions.RayTaskError,
                       match="unknown lang"):
        source_lang_pivot(str(tmp_path)).take_all()


def test_trigram_lm_scores_match_serial_and_rank_gibberish(ray_session,
                                                           tmp_path):
    import math

    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import (_TRI_CELLS,
                                               trigram_lm_score_docs)

    texts = ["the table joins the query plan",
             "query table scan sort merge join",
             "zxq qqj xjz vvk wqx jzz qkx",          # gibberish
             "table scan and merge of the plan"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{tmp_path}/documents.parquet")

    got = {r["doc_id"]: (r["n_trigrams"], r["lm_score_e3"])
           for r in trigram_lm_score_docs(str(tmp_path)).take_all()}

    # serial oracle: same alphabet, same smoothing, same op order
    def code(ch):
        return ord(ch) - ord("a") + 1 if "a" <= ch <= "z" else 0

    counts = {}
    for t in texts:
        for i in range(len(t) - 2):
            c = code(t[i]) * 729 + code(t[i + 1]) * 27 + code(t[i + 2])
            counts[c] = counts.get(c, 0) + 1
    total = sum(counts.values())
    import numpy as np

    logp = np.log2((np.array(
        [counts.get(c, 0) for c in range(_TRI_CELLS)], np.float64) + 1.0)
        / (total + _TRI_CELLS))
    for d, t in enumerate(texts):
        tri = [code(t[i]) * 729 + code(t[i + 1]) * 27 + code(t[i + 2])
               for i in range(len(t) - 2)]
        s = np.float64(0.0)
        for c in tri:
            s += logp[c]
        want = int(np.round(s / len(tri) * 1000))
        assert got[d] == (len(tri), want), d
    # the gibberish doc scores strictly worst
    scores = {d: v[1] for d, v in got.items()}
    assert min(scores, key=scores.get) == 2


def test_source_divergence_planted_shift(ray_session, tmp_path):
    """A source writing different text must rank strictly highest in
    KL from the corpus distribution."""
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import source_divergence_docs

    normal = ["the table joins the query plan and scans rows"] * 8
    weird = ["zzz qqq xxx vvv kkk jjj www zzz qqq xxx"] * 4
    texts = normal + weird
    srcs = ["norm_a"] * 4 + ["norm_b"] * 4 + ["weird"] * 4
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{tmp_path}/documents.parquet")

    rows = source_divergence_docs(str(tmp_path)).take_all()
    kl = {r["source"]: r["kl_e6"] for r in rows}
    assert set(kl) == {"norm_a", "norm_b", "weird"}
    assert kl["weird"] > kl["norm_a"] and kl["weird"] > kl["norm_b"]
    # identical text -> identical distribution -> identical KL
    assert kl["norm_a"] == kl["norm_b"]


from hypothesis import given, settings
from hypothesis import strategies as st

_doc_texts = st.lists(
    st.text(alphabet=" abzé", min_size=0, max_size=24) | st.none(),
    min_size=1, max_size=12)


@settings(max_examples=80, deadline=None)
@given(_doc_texts)
def test_doc_token_profile_matches_python_oracle(texts):
    """Profile kernel vs a plain-python oracle over arbitrary text —
    multi-space runs, empty/None docs, non-ASCII bytes."""
    from sourmash_ray.pipelines.docops import _doc_token_profile

    batch = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    ids, n_tok, n_uni, sum_len, n_stop = _doc_token_profile(batch)
    for i, t in enumerate(texts):
        toks = [w for w in (t or "").split(" ") if w]
        assert n_tok[i] == len(toks), (texts, i)
        assert n_uni[i] == len(set(toks)), (texts, i)
        assert sum_len[i] == sum(len(w) for w in toks), (texts, i)
        assert n_stop[i] == sum(w in ("a", "the") for w in toks)


def test_unpivot_is_pivot_inverse(ray_session):
    """melt(pivot(x)) == plain grouped counts (zero cells dropped)."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    got = sorted((r["source"], r["lang"], r["n"]) for r in
                 e.queries()["source_lang_unpivot"](sf).take_all())
    want = sorted(tuple(r) for r in con.sql(
        e.oracle_sql()["source_lang_unpivot"]).fetchall())
    assert got == want

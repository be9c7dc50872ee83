"""Range-partition global sort, mixing weights, PII scan/redact."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from sourmash_ray.stages.sort import (_assign_parts, _boundaries,
                                      range_partition_sort)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(-50, 50), st.integers(0, 20)),
                min_size=0, max_size=120),
       st.integers(1, 9))
def test_assign_parts_respects_total_order(pairs, n_parts):
    """Rows in partition p sort strictly before rows in partition p+1
    under the composite (key, tie) order, and partition ids stay in
    range — for ANY sample-derived boundaries."""
    k = np.array([p[0] for p in pairs], np.int64)
    t = np.array([p[1] for p in pairs], np.int64)
    bk, bt = _boundaries(k, t, n_parts)
    part = _assign_parts(k, t, bk, bt)
    assert ((part >= 0) & (part < n_parts)).all()
    comp = list(zip(k.tolist(), t.tolist(), part.tolist()))
    comp.sort()
    for (a, b, pa_), (c, d, pb) in zip(comp, comp[1:]):
        assert pa_ <= pb          # partition ids monotone in total order
    # equal composites never split across partitions
    seen = {}
    for key, tie, p in comp:
        assert seen.setdefault((key, tie), p) == p


def _write_docs(tmp_path, n_chars, langs=None, texts=None):
    n = len(n_chars)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts or ["x"] * n, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
        "source": pa.array([f"s{i % 3}" for i in range(n)], pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    }), f"{tmp_path}/documents.parquet")


def test_range_sort_exact_ranks_and_skew(ray_session, tmp_path):
    """Global ranks equal the argsort oracle, including an all-equal-key
    corpus (every row same n_chars — the worst boundary skew)."""
    from sourmash_ray.pipelines.docops import docs_global_ranked

    rng = np.random.RandomState(7)
    n_chars = np.r_[rng.randint(1, 40, size=300),
                    np.full(200, 17)].astype(np.int64)
    _write_docs(tmp_path, n_chars.tolist())
    rows = docs_global_ranked(str(tmp_path)).take_all()
    assert len(rows) == 500
    got = {r["doc_id"]: r["global_rank"] for r in rows}
    order = np.lexsort((np.arange(500), n_chars))
    for rank0, doc in enumerate(order):
        assert got[int(doc)] == rank0 + 1


def test_range_sort_blocks_are_ordered_ranges(ray_session, tmp_path):
    """Output blocks are the range partitions in global order — a
    consumer can stream them as already-sorted shards."""
    _write_docs(tmp_path, [(i * 131) % 997 for i in range(400)])
    ds = range_partition_sort(
        __import__("ray").data.read_parquet(
            f"{tmp_path}/documents.parquet",
            columns=["doc_id", "n_chars"]),
        "n_chars", "doc_id", n_parts=4)
    prev_last = None
    for batch in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if batch.num_rows == 0:
            continue
        r = batch["global_rank"].to_pylist()
        assert r == sorted(r)
        if prev_last is not None:
            assert r[0] == prev_last + 1
        prev_last = r[-1]
    assert prev_last == 400


def test_pii_scan_and_redact(ray_session, tmp_path):
    from sourmash_ray.pipelines.docops import pii_redact_docs, pii_scan_docs

    texts = [
        "contact bob.smith+x@example.co.uk or call +1 (415) 555-0199 now",
        "server at 10.0.255.3 and backup 192.168.1.1",
        "no pii here at all",
        "a@b.io mailed c_d%e@f-g.org twice",
    ]
    _write_docs(tmp_path, [len(t) for t in texts], texts=texts)
    got = {r["doc_id"]: r for r in pii_scan_docs(str(tmp_path)).take_all()}
    assert (got[0]["n_emails"], got[0]["n_phones"]) == (1, 1)
    assert got[1]["n_ipv4"] == 2 and got[1]["has_pii"] == 1
    assert got[2]["has_pii"] == 0
    assert got[3]["n_emails"] == 2

    red = {r["doc_id"]: r["text"]
           for r in pii_redact_docs(str(tmp_path)).take_all()}
    assert "example.co.uk" not in red[0] and "[PII]" in red[0]
    assert "10.0.255.3" not in red[1]
    assert red[2] == texts[2]


def test_mixing_weights_uniform_target(ray_session, tmp_path):
    """Equal-sized sources get weight 1e6/n_sources-balanced: every
    weight_e6 equals total/(s*chars) exactly."""
    from sourmash_ray.pipelines.docops import mixing_weights_docs

    _write_docs(tmp_path, [10] * 9)  # 3 sources x 3 docs x 10 chars
    t = mixing_weights_docs(str(tmp_path))
    assert t.num_rows == 3
    assert set(t["weight_e6"].to_pylist()) == {1_000_000}
    assert set(t["share_e6"].to_pylist()) == {333_333}


def test_budget_sample_invariants(ray_session, tmp_path):
    """Kept per-source totals never exceed the budget, the selection is
    maximal in hash-priority order (the first excluded doc would
    overflow), and reruns pick identical docs."""
    import hashlib

    from sourmash_ray.pipelines.docops import budget_sample_docs

    n = 120
    lens = [(i * 53) % 300 + 1 for i in range(n)]
    _write_docs(tmp_path, lens)
    B = 1500
    rows = budget_sample_docs(str(tmp_path), budget_chars=B).take_all()
    rows2 = budget_sample_docs(str(tmp_path), budget_chars=B).take_all()
    assert sorted(r["doc_id"] for r in rows) == \
        sorted(r["doc_id"] for r in rows2)

    by_src = {}
    for i in range(n):
        h = hashlib.md5(str(i).encode()).hexdigest()
        by_src.setdefault(f"s{i % 3}", []).append((h, i, lens[i]))
    kept = {r["doc_id"] for r in rows}
    for src, docs in by_src.items():
        docs.sort()
        cum, want = 0, []
        for h, i, L in docs:
            if cum + L > B:
                break       # greedy prefix in (md5, doc_id) order
            cum += L
            want.append(i)
        assert sorted(want) == sorted(i for i in kept
                                      if f"s{i % 3}" == src)
        got_total = sum(r["n_chars"] for r in rows
                        if r["source"] == src)
        assert got_total <= B


def test_chunk_offsets_cover_and_overlap(ray_session, tmp_path):
    """Chunks cover every char, consecutive chunks overlap by exactly
    `overlap` (except the clipped tail), and a short doc yields one
    clipped chunk."""
    from sourmash_ray.pipelines.docops import chunk_docs_offsets

    lens = [100, 5, 40, 41, 1]
    _write_docs(tmp_path, lens)
    rows = chunk_docs_offsets(str(tmp_path), size=40,
                              overlap=10).take_all()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_end"]))
    assert sorted(by_doc[1]) == [(0, 0, 5)]
    assert sorted(by_doc[4]) == [(0, 0, 1)]
    for d, n in enumerate(lens):
        ch = sorted(by_doc[d])
        assert ch[0][1] == 0 and ch[-1][2] == n      # full coverage
        for (i1, s1, e1), (i2, s2, e2) in zip(ch, ch[1:]):
            assert i2 == i1 + 1 and s2 == s1 + 30    # stride
            assert e1 - s2 >= 1                      # genuine overlap


def test_keep_best_dedup_prefers_longest(ray_session, tmp_path):
    """Duplicate groups keep their longest member (doc_id tiebreak).
    NOTE: groups are keyed by NORMALIZED text md5, so same-text docs
    tie on md5; differing n_chars metadata decides the representative."""
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import exact_dedup_keep_best_docs

    texts = ["alpha beta gamma", "alpha beta gamma", "alpha beta gamma",
             "delta", "delta", "unique one"]
    n_chars = [16, 99, 99, 5, 7, 10]   # doc1/doc2 tie at 99 → doc 1 wins
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 6, pa.string()),
        "source": pa.array(["s"] * 6, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    rows = exact_dedup_keep_best_docs(str(tmp_path)).take_all()
    kept = {r["doc_id"] for r in rows}
    assert kept == {1, 4, 5}
    assert len(rows) == 3


def test_curate_job_composes_its_component_ops(ray_session):
    """curate_job_docs == quality gate ∩ not-contaminated ∩ exact-dedup
    representatives, then pack_offsets — checked by composing the
    standalone component queries on the same corpus."""
    from sourmash_ray.pipelines import docops

    sf = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in docops.curate_job_docs(sf).take_all()}

    quality_kept = {r["doc_id"] for r in
                    docops.quality_filter_docs(sf).take_all()
                    if r["kept"] == 1}
    clean = {r["doc_id"] for r in
             docops.exact_decontaminate_docs(sf).take_all()
             if r["contaminated"] == 0}
    gated = quality_kept & clean  # doc_id >= 25 implied by decontaminate

    # expected representatives: min doc_id per text_md5 WITHIN the gated
    # set (can't reuse exact_dedup_docs reps — they dedup the full corpus)
    import duckdb

    want = {r[0] for r in duckdb.sql(f"""
        SELECT min(doc_id) FROM (
          SELECT doc_id,
                 md5(trim(regexp_replace(lower(coalesce(text, '')),
                          '[ \t\n\r\f\v]+', ' ', 'g'))) AS m
          FROM read_parquet('{sf}/documents.parquet')
          WHERE doc_id IN ({",".join(map(str, sorted(gated)))}))
        GROUP BY m""").fetchall()}
    assert set(out) == want

    # offsets must agree with pack_offsets over exactly the kept docs
    import ray.data

    kept_ds = (ray.data.read_parquet(f"{sf}/documents.parquet",
                                     columns=["doc_id", "n_chars"])
               .filter(lambda r: r["doc_id"] in want))
    repacked = {r["doc_id"]: r for r in
                docops.pack_offsets(kept_ds).take_all()}
    assert {k: (v["shard"], v["start_char"], v["end_seq"])
            for k, v in out.items()} == \
           {k: (v["shard"], v["start_char"], v["end_seq"])
            for k, v in repacked.items()}

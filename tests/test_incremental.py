"""Incremental dedup vs the full pipeline on the same banding."""

import pyarrow as pa

import ray.data

from sourmash_ray.config import DEFAULT_CONFIG
from sourmash_ray.pipelines.incremental import (
    _band_rows, _docs_side, build_doc_dedup_index, incremental_dedup_docs)

SF = "/root/testdata/sf0.001"


def _pairset(rows):
    return {(min(r["a"], r["b"]), max(r["a"], r["b"]),
             round(r["jaccard"], 12)) for r in rows}


def test_incremental_equals_full_restricted(ray_session, tmp_path):
    """Index the corpus side (doc_id % 5 != 0), dedup the delta
    (doc_id % 5 == 0): verified pairs == the same full-pairs LSH run
    over ALL docs, restricted to pairs with >= 1 delta member."""
    from sourmash_ray.stages.lsh import (PAIRS_SCHEMA, _emit_pairs_part,
                                         dedup_pairs)
    from sourmash_ray.stages.exchange import exchange_map_groups
    from sourmash_ray.stages.verify import verify_pairs

    cfg = DEFAULT_CONFIG
    idx = str(tmp_path / "idx")
    build_doc_dedup_index(SF, idx, cfg)
    got = _pairset(incremental_dedup_docs(SF, idx, cfg).take_all())

    # reference: same emission over the union of both sides
    corpus = _docs_side(SF, delta=False, cfg=cfg).materialize()
    delta = _docs_side(SF, delta=True, cfg=cfg).materialize()
    sigs = corpus.union(delta).materialize()
    keyed = _band_rows(sigs, cfg).select_columns(
        ["band_key", "band_part", "conv_id"])
    pairs = exchange_map_groups(
        keyed, "band_part", 8,
        _emit_pairs_part(cfg.lsh.max_bucket_pairs_members,
                         full_pairs=True), PAIRS_SCHEMA)
    pairs = dedup_pairs(pairs, cfg.exec.group_parts,
                        out_schema=PAIRS_SCHEMA)
    verified = verify_pairs(pairs, sigs, cfg).take_all()
    delta_ids = {r["conv_id"] for r in delta.select_columns(
        ["conv_id"]).take_all()}
    want = _pairset(r for r in verified
                    if r["a"] in delta_ids or r["b"] in delta_ids)

    assert got == want
    assert got, "fixture must produce at least one delta-involved pair"
    # corpus-internal pairs never appear
    for a, b, _ in got:
        assert a in delta_ids or b in delta_ids


def test_index_layout_is_partitioned(ray_session, tmp_path):
    import glob

    idx = str(tmp_path / "idx")
    build_doc_dedup_index(SF, idx, DEFAULT_CONFIG)
    assert glob.glob(f"{idx}/bands/band_file=*/*.parquet")
    assert glob.glob(f"{idx}/sigs/sig_file=*/*.parquet")


def test_index_one_file_per_partition(ray_session, tmp_path):
    """File-count discipline: each band/sig hive partition must land as
    ONE Parquet file (block-grain files made probe file-open overhead
    dominate the incremental wall — BASELINE.md round 5)."""
    import glob

    idx = str(tmp_path / "idx")
    build_doc_dedup_index(SF, idx, DEFAULT_CONFIG)
    for part in glob.glob(f"{idx}/bands/band_file=*") + glob.glob(
            f"{idx}/sigs/sig_file=*"):
        files = glob.glob(f"{part}/*.parquet")
        assert len(files) == 1, part


def test_incremental_embeddings_equals_full_restricted(ray_session,
                                                       tmp_path):
    """Embeddings twin of the docs test: index the corpus vectors
    (vec_id % 5 != 0), probe the delta (vec_id % 5 == 0) — cosine pairs
    == the same banding run over ALL vectors, restricted to pairs with
    ≥ 1 delta member; and every emitted pair is brute-force-true."""
    import numpy as np
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.incremental import (
        _emb_band_rows, _emb_blob_side, build_emb_dedup_index,
        incremental_dedup_embeddings)
    from sourmash_ray.stages.exchange import exchange_map_groups
    from sourmash_ray.stages.lsh import (PAIRS_SCHEMA, _emit_pairs_part,
                                         dedup_pairs)
    from sourmash_ray.stages.verify import CosineScorer, score_pairs

    cfg = DEFAULT_CONFIG
    idx = str(tmp_path / "eidx")
    build_emb_dedup_index(SF, idx, cfg)
    got = {(r["a"], r["b"], r["cosine"])
           for r in incremental_dedup_embeddings(SF, idx, cfg).take_all()}

    corpus = _emb_blob_side(SF, delta=False).materialize()
    delta = _emb_blob_side(SF, delta=True).materialize()
    blobs = corpus.union(delta).materialize()
    dim = len(blobs.take(1)[0]["blob"]) // 8
    keyed = _emb_band_rows(blobs, dim, cfg.exec.group_parts
                           ).select_columns(
        ["band_key", "band_part", "conv_id"])
    pairs = exchange_map_groups(
        keyed, "band_part", 8,
        _emit_pairs_part(cfg.lsh.max_bucket_pairs_members,
                         full_pairs=True), PAIRS_SCHEMA)
    pairs = dedup_pairs(pairs, cfg.exec.group_parts,
                        out_schema=PAIRS_SCHEMA)
    scored = score_pairs(pairs, blobs, cfg,
                         CosineScorer(0.35, round_to=6)).take_all()
    delta_ids = {r["conv_id"] for r in delta.select_columns(
        ["conv_id"]).take_all()}
    want = {(min(int(r["a"]), int(r["b"])),
             max(int(r["a"]), int(r["b"])), r["cosine"])
            for r in scored
            if r["a"] in delta_ids or r["b"] in delta_ids}
    assert got == want and got

    # soundness vs brute force: no false pairs, scores exact
    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], np.int64)
    mat = np.asarray(t["embedding"].combine_chunks().flatten(),
                     np.float64).reshape(len(ids), -1)
    q = np.round(mat * 1e4)
    nn = np.linalg.norm(q, axis=1)
    nn[nn == 0] = 1
    cos = (q @ q.T) / (nn[:, None] * nn[None, :])
    pos = {int(v): i for i, v in enumerate(ids)}
    for a, b, c in got:
        assert (ids[pos[a]] % 5 == 0) or (ids[pos[b]] % 5 == 0)
        assert cos[pos[a], pos[b]] >= 0.35
        assert abs(round(cos[pos[a], pos[b]], 6) - c) < 1e-12

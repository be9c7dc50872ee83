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

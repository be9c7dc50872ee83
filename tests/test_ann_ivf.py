"""IVF coarse-quantizer ANN: training convergence + recall vs the
brute-force twin."""
from __future__ import annotations

import numpy as np
import pytest


SF = "/root/testdata/sf0.01"


def test_ivf_centroids_unit_norm_and_deterministic(ray_session):
    from sourmash_ray.pipelines.ann import _read_emb, ivf_train_centroids

    ds = _read_emb(SF)
    c1 = ivf_train_centroids(ds, n_centroids=8, n_iters=2)
    c2 = ivf_train_centroids(ds, n_centroids=8, n_iters=2)
    assert c1.shape[0] == 8
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    # deterministic: no RNG anywhere in train
    assert np.array_equal(c1, c2)


def test_ivf_assign_covers_all_vectors(ray_session):
    from sourmash_ray.pipelines.ann import (_read_emb, ivf_assign,
                                            ivf_train_centroids)

    ds = _read_emb(SF)
    cents = ivf_train_centroids(ds, n_centroids=8, n_iters=2)
    rows = ivf_assign(ds, cents).take_all()
    assert len(rows) == ds.count()
    lists = {r["list_id"] for r in rows}
    assert lists <= set(range(8))
    assert len(lists) > 1  # quantizer actually splits the corpus


def test_ivf_topk_recall_vs_bruteforce(ray_session):
    """nprobe=all lists == exact; nprobe<n_centroids keeps recall@k high
    on the clustered embeddings table (labels = genuine clusters)."""
    from sourmash_ray.pipelines.ann import ann_topk_bruteforce, ann_topk_ivf

    exact = ann_topk_bruteforce(SF, n_queries=8, k=5)
    want = {(r["query_id"], r["neighbor_id"]) for r in exact.to_pylist()}

    # full probe = exact (the pruning mask passes everything)
    full = ann_topk_ivf(SF, n_queries=8, k=5, n_centroids=8, nprobe=8)
    got_full = {(r["query_id"], r["neighbor_id"]) for r in full.to_pylist()}
    assert got_full == want
    # scores identical too
    se = {(r["query_id"], r["neighbor_id"]): r["score_e4"]
          for r in exact.to_pylist()}
    for r in full.to_pylist():
        assert se[(r["query_id"], r["neighbor_id"])] == r["score_e4"]

    # pruned probe: recall@5 ≥ 0.8 on clustered data
    ivf = ann_topk_ivf(SF, n_queries=8, k=5, n_centroids=8, nprobe=3)
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf.to_pylist()}
    recall = len(got & want) / len(want)
    assert recall >= 0.8, recall
    # every IVF hit's score matches the exact score (pruning only drops)
    for r in ivf.to_pylist():
        key = (r["query_id"], r["neighbor_id"])
        if key in se:
            assert se[key] == r["score_e4"]


def test_ivf_index_persistence_round_trip(ray_session, tmp_path):
    """Build → save (hive-partitioned by list_id) → load → query equals
    the in-memory IVF path at identical parameters, and the scoring read
    opens only the probed partitions."""
    import os

    from sourmash_ray.pipelines.ann import (
        ann_topk_ivf, ann_topk_ivf_index, ivf_build_index,
        ivf_load_centroids,
    )

    idx = str(tmp_path / "ivf_index")
    cents = ivf_build_index(SF, idx, n_centroids=8, n_iters=2)
    # layout: lists/list_id=N/ dirs + tiny centroids.parquet
    parts = sorted(os.listdir(f"{idx}/lists"))
    assert all(p.startswith("list_id=") for p in parts)
    assert 1 < len(parts) <= 8
    assert np.array_equal(ivf_load_centroids(idx), cents)

    mem = ann_topk_ivf(SF, n_queries=8, k=5, n_centroids=8, nprobe=3,
                       n_iters=2)
    disk = ann_topk_ivf_index(idx, n_queries=8, k=5, nprobe=3)
    assert mem.to_pylist() == disk.to_pylist()

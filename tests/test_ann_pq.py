"""Product-quantization ANN: recall vs brute force, planted-dup
retrieval, code compression."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sourmash_ray.pipelines.ann import (ann_topk_bruteforce, ann_topk_pq,
                                        pq_encode, pq_train, _read_emb)

SF = "/root/testdata/sf0.001"


def _pairs(tbl):
    return {(r["query_id"], r["neighbor_id"]) for r in tbl.to_pylist()}


def _write_emb(d, emb):
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(emb)), pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              pa.list_(pa.float64())),
        "label": pa.array([0] * len(emb), pa.int64()),
    }), f"{d}/embeddings.parquet")


def test_pq_recall_vs_bruteforce(ray_session):
    """Recall@5 against the exact twin on the shared embeddings table;
    PQ is approximate — the bar reflects the measured margin (0.65 at
    m=16/k=128 on this corpus), and recall must not DROP when the
    codebook grows."""
    bf = _pairs(ann_topk_bruteforce(SF, n_queries=8, k=5))
    p_hi = _pairs(ann_topk_pq(SF, n_queries=8, k=5, m_sub=16,
                              k_codes=128))
    assert len(bf & p_hi) / len(bf) >= 0.5


def test_pq_retrieves_planted_duplicates(ray_session, tmp_path):
    """An exact duplicate of each query sits in the corpus: PQ must
    return it at rank 1 (same codes ⇒ max ADC score among dups)."""
    rng = np.random.RandomState(11)
    base = rng.randn(120, 64)
    emb = np.vstack([base, base[:6]])     # vec_ids 120..125 dup 0..5
    _write_emb(tmp_path, emb)
    res = ann_topk_pq(str(tmp_path), n_queries=6, k=3, m_sub=16,
                      k_codes=32, n_iters=4).to_pylist()
    top1 = {r["query_id"]: r["neighbor_id"]
            for r in res if r["rank"] == 1}
    for q in range(6):
        assert top1[q] == 120 + q


def test_pq_encode_compression(ray_session):
    """Codes are m uint8 values per vector — 64 float64s (512 B) become
    16 bytes at m_sub=16."""
    ds = _read_emb(SF)
    books = pq_train(ds, m_sub=16, k_codes=32, n_iters=2)
    assert books.shape == (16, 32, 4)
    rows = pq_encode(ds, books).take_all()
    assert len(rows) == 500
    for r in rows[:5]:
        assert len(r["codes"]) == 16
        assert all(0 <= c < 32 for c in r["codes"])


def test_ivfpq_full_probe_equals_pq(ray_session):
    """nprobe = n_centroids disables pruning: IVF+PQ must reproduce PQ
    exactly at the same codebooks (deterministic training both paths)."""
    from sourmash_ray.pipelines.ann import ann_topk_ivfpq

    pq_res = ann_topk_pq(SF, n_queries=6, k=5, m_sub=16,
                         k_codes=32).to_pylist()
    ivfpq = ann_topk_ivfpq(SF, n_queries=6, k=5, n_centroids=8,
                           nprobe=8, m_sub=16, k_codes=32).to_pylist()
    assert ivfpq == pq_res


def test_ivfpq_index_matches_inmemory(ray_session, tmp_path):
    """The persisted compressed index (pruned list reads, codes only)
    reproduces the in-memory IVF+PQ path exactly at equal params —
    training is deterministic on both paths."""
    from sourmash_ray.pipelines.ann import (ann_topk_ivfpq,
                                            ann_topk_ivfpq_index,
                                            ivfpq_build_index)

    params = dict(n_centroids=8, m_sub=16, k_codes=32)
    idx = str(tmp_path / "ivfpq")
    ivfpq_build_index(SF, idx, n_iters=3, **params)
    mem = ann_topk_ivfpq(SF, n_queries=6, k=5, nprobe=3, n_iters=3,
                         **params).to_pylist()
    disk = ann_topk_ivfpq_index(idx, SF, n_queries=6, k=5,
                                nprobe=3).to_pylist()
    assert disk == mem

    import glob
    assert glob.glob(f"{idx}/lists/list_id=*/*.parquet")
    assert glob.glob(f"{idx}/codebooks.parquet")

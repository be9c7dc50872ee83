"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the exactness baseline — the query matrix is
broadcast once via ``ray.put`` and each ``map_batches`` task does one
float64 matmul against its batch (the reference's broadcast-query linear
scan, ``/root/reference/src/sourmash/index/__init__.py:150-170``, with the
sketch similarity swapped for cosine). The LSH-bucketed variant is the
scale path: random-hyperplane signatures (Charikar '02) bucket vectors so
only same-bucket pairs are scored — the same band-groupby shape as the
MinHash pipeline.

Scores are computed in float64 and rounded to 4 decimals so the DuckDB
``list_cosine_similarity`` oracle hashes identically.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import pyarrow.compute as pc

import ray
import ray.data

from ..sources.tables import read_parquet_clean

ROUND = 4


def _read_emb(sf_dir: str):
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch["vec_id"], dtype=np.int64)
    lst = batch["embedding"].combine_chunks()
    dim = len(lst[0]) if len(lst) else 0
    mat = np.asarray(lst.flatten(), dtype=np.float64).reshape(len(ids), dim)
    return ids, mat


class BruteForceScorer:
    """Top-k per query within each batch; partial top-k rows are merged by
    a final groupby-free sort+limit per query (the k × |queries| result is
    tiny, so a single-node reduce is fine at any corpus scale)."""

    def __init__(self, queries_ref, k: int):
        # ray.put-broadcast (query_ids, query_matrix_normalized)
        self.q_ids, self.q = ray.get(queries_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat / norms[:, None]) @ self.q.T  # (n_batch, n_q)
        n, nq = sims.shape
        k = min(self.k + 1, n)  # +1 to survive self-match removal downstream
        top = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, n_q)
        rows = top.reshape(-1)
        qcol = np.repeat(self.q_ids[None, :], k, axis=0).reshape(-1)
        score = sims[rows, np.repeat(np.arange(nq)[None, :], k, axis=0).reshape(-1)]
        return pa.table({
            "query_id": pa.array(qcol, pa.int64()),
            "neighbor_id": pa.array(ids[rows], pa.int64()),
            "score": pa.array(score, pa.float64()),
        })


def ann_topk_bruteforce(sf_dir: str, n_queries: int = 8, k: int = 5):
    """Exact cosine top-k (excluding self) for the first ``n_queries``
    vec_ids. Output: (query_id, neighbor_id, rank, score) with score
    rounded to 4 decimals."""
    ds = _read_emb(sf_dir)
    qrows = [r for r in ds.filter(
        expr=f"vec_id < {n_queries}").take_all()]
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    queries_ref = ray.put((q_ids, qm / qn[:, None]))

    def _score(batch: pa.Table) -> pa.Table:
        return BruteForceScorer(queries_ref, k)(batch)

    partial = ds.map_batches(_score, batch_format="pyarrow")
    # global reduce: tiny (k+1 per query per block) → driver-side final top-k
    tbl = pa.Table.from_pylist(partial.take_all())
    out_rows = []
    qids = tbl["query_id"].to_numpy()
    nids = tbl["neighbor_id"].to_numpy()
    scores = tbl["score"].to_numpy()
    for q in q_ids:
        m = (qids == q) & (nids != q)
        order = np.lexsort((nids[m], -scores[m]))[:k]
        for rank, j in enumerate(order, 1):
            out_rows.append({
                "query_id": int(q),
                "neighbor_id": int(nids[m][j]),
                "rank": rank,
                # exact-integer score (1e4 scale): float repr differs
                # between engines in the last ulp
                "score_e4": int(round(float(scores[m][j]) * 1e4)),
            })
    return pa.Table.from_pylist(out_rows)


class HyperplaneBucketer:
    """Random-hyperplane LSH bucketing: sign-bit signature of ``n_bits``
    projections → bucket key. Stateful: the projection matrix is built once
    per actor from the seed."""

    def __init__(self, dim: int, n_bits: int, seed: int):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((dim, n_bits))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        bits = (mat @ self.proj) > 0
        key = (bits.astype(np.uint64)
               << np.arange(bits.shape[1], dtype=np.uint64)[None, :]).sum(
                   axis=1, dtype=np.uint64)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(key, pa.uint64())})


def ann_buckets(sf_dir: str, n_bits: int = 8, seed: int = 42):
    """The scale path's bucketing stage: vec_id → hyperplane bucket.
    Same-bucket candidates then verify exactly like the MinHash pipeline."""
    ds = _read_emb(sf_dir)
    first = ds.take(1)[0]
    dim = len(first["embedding"])
    bk = HyperplaneBucketer(dim, n_bits, seed)
    return ds.map_batches(lambda t: bk(t), batch_format="pyarrow")


class MultiTableBucketer:
    """All ``n_tables`` hyperplane bucket keys per vector in ONE pass —
    one (dim, n_tables*n_bits) projection matmul per batch, emitting
    ``n_tables`` (vec_id, bucket) rows per vector with the table id folded
    into the key. One actor pool regardless of table count."""

    def __init__(self, dim: int, n_bits: int, n_tables: int, seed: int):
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((dim, n_tables * n_bits))
        self.n_bits, self.n_tables = n_bits, n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        bits = ((mat @ self.proj) > 0).reshape(
            len(ids), self.n_tables, self.n_bits)
        key = (bits.astype(np.uint64)
               << np.arange(self.n_bits, dtype=np.uint64)[None, None, :]).sum(
                   axis=2, dtype=np.uint64)
        key = key * np.uint64(self.n_tables + 1) + np.arange(
            self.n_tables, dtype=np.uint64)[None, :]
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, self.n_tables), pa.int64()),
            "bucket": pa.array(key.reshape(-1), pa.uint64()),
        })


NEARDUP_SCHEMA = pa.schema([
    ("a", pa.int64()),
    ("b", pa.int64()),
    ("cosine", pa.float64()),
])


def embedding_neardup_pairs(sf_dir: str, n_bits: int = 4, seed: int = 42,
                            threshold: float = 0.4, n_tables: int = 16,
                            cfg=None):
    """Embedding-cosine near-dup pairs: candidates sharing any of
    ``n_tables`` independent hyperplane buckets, verified by exact cosine ≥
    threshold (multi-table LSH: recall 1-(1-p^bits)^tables; defaults give
    ~0.94 at cos 0.4 — the synthetic embeddings corpus has no pairs above
    0.52, so the demo threshold sits below that; production would use
    threshold≈0.9 with n_bits=8, where recall is higher for the same
    table count).

    Scale shape — the SAME machinery as the MinHash flagship, no
    ``Dataset.join`` anywhere: bucket keys go through the coarse-key
    exchange emitting FULL in-bucket pairs in memory-bounded chunks
    (``stages/lsh._emit_pairs_part(full_pairs=True)`` — a pair-list
    operator must not drop pairs via the clustering star+chain cap; only
    past the explicit 100k-member skew valve does a bucket degrade, with
    a warning), candidate pairs dedup on the pair-part exchange, and the
    float64-vector blobs attach via ``score_pairs`` (broadcast within
    budget, two-exchange co-group beyond it — ``stages/verify.py``).
    ``n_bits``/``n_tables`` are the recall/cost knobs: scale ``n_bits``
    ~log2(n/64) with corpus size and ``n_tables`` to the recall target —
    candidate count per table is Θ(Σ bucket²), the true LSH cost."""
    from ..config import DEFAULT_CONFIG as _DC
    from ..config import resolve_num_partitions
    from ..stages.exchange import exchange_map_groups
    from ..stages.lsh import PAIRS_SCHEMA, _emit_pairs_part, dedup_pairs
    from ..stages.verify import CosineScorer, score_pairs

    cfg = cfg or _DC
    emb = _read_emb(sf_dir)
    first = emb.take(1)[0]
    dim = len(first["embedding"])
    bucketer = MultiTableBucketer(dim, n_bits, n_tables, seed)
    group_parts = cfg.exec.group_parts

    def _keyed(batch: pa.Table) -> pa.Table:
        b = bucketer(batch)
        keys = np.asarray(b["bucket"], dtype=np.uint64)
        return pa.table({
            "band_key": b["bucket"],
            "band_part": pa.array(
                (keys % np.uint64(group_parts)).astype(np.int64),
                pa.int64()),
            "conv_id": pc.cast(b["vec_id"], pa.string()),
        })

    keyed = emb.map_batches(_keyed, batch_format="pyarrow")
    # full_pairs: this operator RETURNS the pair list, so the clustering
    # cap (star+chain) would silently drop true near-dup pairs inside big
    # buckets; emission is chunked full pairs with an explicit skew valve
    pairs = exchange_map_groups(
        keyed, "band_part", 2 * resolve_num_partitions(cfg),
        _emit_pairs_part(cfg.lsh.max_bucket_pairs_members,
                         full_pairs=True), PAIRS_SCHEMA)
    pairs = dedup_pairs(pairs, group_parts, out_schema=PAIRS_SCHEMA)

    blobs = emb.map_batches(_emb_blob, batch_format="pyarrow")
    scored = score_pairs(pairs, blobs, cfg,
                         CosineScorer(threshold, round_to=ROUND),
                         size_hint_bytes=emb.size_bytes() or 0)

    def _to_int_pairs(batch: pa.Table) -> pa.Table:
        a = np.array([int(x) for x in batch["a"].to_pylist()], np.int64)
        b = np.array([int(x) for x in batch["b"].to_pylist()], np.int64)
        # bucket pairs are ordered by STRING id; normalize numerically
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table({
            "a": pa.array(lo, pa.int64()),
            "b": pa.array(hi, pa.int64()),
            "cosine": batch["cosine"],
        })

    return scored.map_batches(_to_int_pairs, batch_format="pyarrow")


def _emb_blob(batch: pa.Table) -> pa.Table:
    """(vec_id, embedding list<float>) → (conv_id str, blob binary) —
    zero-copy float64 bytes, offsets built arithmetically (no per-row
    ``tobytes`` loop)."""
    ids, mat = _emb_matrix(batch)
    n, dim = mat.shape if mat.ndim == 2 else (len(ids), 0)
    flat = np.ascontiguousarray(mat, dtype=np.float64).reshape(-1)
    offs = (np.arange(n + 1, dtype=np.int32) * (8 * dim))
    blob = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs), pa.py_buffer(flat.view(np.uint8))])
    return pa.table({
        "conv_id": pc.cast(pa.array(ids, pa.int64()), pa.string()),
        "blob": blob,
    })


def cosine_pairs_exact(sf_dir: str, n_vecs: int = 100,
                       threshold_e4: int = 2000):
    """Exact cosine for all pairs among the first ``n_vecs`` embeddings with
    score ≥ threshold — the SQL-checkable exact twin of the LSH-bucketed
    near-dup op (integer 1e4 scores for exact oracle hashing)."""
    ds = _read_emb(sf_dir).filter(expr=f"vec_id < {n_vecs}")
    rows = ds.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    sims = (m / norms[:, None]) @ (m / norms[:, None]).T
    iu, ju = np.triu_indices(len(ids), 1)
    e4 = np.round(sims[iu, ju] * 1e4).astype(np.int64)
    keep = e4 >= threshold_e4
    return pa.table({
        "a": pa.array(ids[iu[keep]], pa.int64()),
        "b": pa.array(ids[ju[keep]], pa.int64()),
        "score_e4": pa.array(e4[keep], pa.int64()),
    })

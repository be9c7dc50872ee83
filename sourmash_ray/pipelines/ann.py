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


def embedding_neardup_exact(sf_dir: str, threshold_e4: int = 4000):
    """Brute-force all-pairs cosine ≥ threshold over the WHOLE embeddings
    table — the exact baseline the LSH variant
    (:func:`embedding_neardup_pairs`) approximates, and the distributed
    big sibling of the driver-local :func:`cosine_pairs_exact`. The
    corpus matrix is ``ray.put``-broadcast once (embeddings are the
    small O(n·d) side); each batch computes its block-row of the
    similarity matrix against the broadcast side and keeps only (a < b)
    hits, so every true pair appears exactly once with no pair-dedup
    exchange. O(n²d) compute — the LSH path is the corpus-scale path.

    Cross-engine exactness uses cosine_pairs_exact's scheme: elements
    quantize to 1e4-scale integers FIRST, so every dot partial is an
    exact float64 integer (< 2^53) and BLAS block order cannot perturb
    the sum; the remaining multiply/sqrt/divide are single IEEE ops,
    identical in DuckDB."""
    ds = _read_emb(sf_dir)
    blocks = [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
    if not blocks:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "score_e4": pa.array([], pa.int64())})
    all_ids, all_mat = _emb_matrix(pa.concat_tables(blocks))
    gq = np.round(all_mat * 1e4)          # exact integers in float64
    gs = np.einsum("ij,ij->i", gq, gq)    # exact
    gs[gs == 0] = 1.0
    ref = ray.put((all_ids, gq, gs))

    def _block(batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        q = np.round(mat * 1e4)
        sa = np.einsum("ij,ij->i", q, q)
        sa[sa == 0] = 1.0
        g_ids, g_q, g_s = ray.get(ref)
        num = q @ g_q.T                   # exact integer partials
        e4 = np.round(1e4 * num / np.sqrt(sa[:, None] * g_s[None, :]))
        mask = (e4 >= threshold_e4) & (g_ids[None, :] > ids[:, None])
        ii, jj = np.nonzero(mask)
        return pa.table({
            "a": pa.array(ids[ii], pa.int64()),
            "b": pa.array(g_ids[jj], pa.int64()),
            "score_e4": pa.array(e4[ii, jj].astype(np.int64), pa.int64()),
        })

    return ds.map_batches(_block, batch_format="pyarrow")


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
    """Exact cosine for all pairs among the first ``n_vecs`` embeddings
    with score ≥ threshold — the SQL-checkable exact twin of the
    LSH-bucketed near-dup op.

    Elements quantize to 1e4-scale integers FIRST: with |q| ≤ ~6e3 every
    dot-product partial stays < 2^53, so float64 sums are EXACT and
    summation order cannot perturb the score — raw-float cosine diverged
    from DuckDB in the last ulp at sf0.1 (numpy's pairwise summation vs
    DuckDB's serial ``list_dot_product``) and flipped a knife-edge
    round(·1e4). The remaining ops (one multiply, one sqrt, one divide)
    are single correctly-rounded IEEE ops, identical across engines."""
    ds = _read_emb(sf_dir).filter(expr=f"vec_id < {n_vecs}")
    rows = ds.take_all()
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    q = np.round(m * 1e4)                 # exact integers in float64
    num = q @ q.T                         # all partials < 2^53: exact
    sa = np.einsum("ij,ij->i", q, q)      # exact
    sa[sa == 0] = 1.0
    den = np.sqrt(sa[:, None] * sa[None, :])
    iu, ju = np.triu_indices(len(ids), 1)
    e4 = np.round(1e4 * num[iu, ju] / den[iu, ju]).astype(np.int64)
    keep = e4 >= threshold_e4
    return pa.table({
        "a": pa.array(ids[iu[keep]], pa.int64()),
        "b": pa.array(ids[ju[keep]], pa.int64()),
        "score_e4": pa.array(e4[keep], pa.int64()),
    })


# ---------------------------------------------------------------------------
# IVF: the second scale path (coarse quantizer + inverted lists)
# ---------------------------------------------------------------------------

_IVF_PART_SCHEMA = pa.schema([
    ("centroid", pa.int64()),
    ("vec_sum", pa.list_(pa.float64())),
    ("n_vecs", pa.int64()),
])


def ivf_train_centroids(ds, n_centroids: int = 16, n_iters: int = 3,
                        cfg=None) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) over unit-normalized
    embeddings — the IVF coarse quantizer (the public FAISS/IVF recipe
    re-expressed as Dataset passes). Init = the ``n_centroids`` lowest
    vec_ids (deterministic, no RNG). Each iteration is ONE streaming
    pass: broadcast centroids (``ray.put``), per-batch assign + a
    CONSTANT-SIZE partial (per-centroid vector sum + count — never the
    vectors), exchange the partials by centroid id, driver update of the
    C×dim table. Empty lists keep their previous centroid. At 100 TB
    each pass ships blocks×C partial rows through the exchange and C
    rows to the driver."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    cfg = cfg or DEFAULT_CONFIG
    # deterministic init WITHOUT a global sort (Ray 2.49's sort shuffle
    # has a data-proportional serial component): filter the n lowest ids
    # (vec_ids are dense from 0) and order the tiny result driver-side
    init = sorted(ds.filter(expr=f"vec_id < {n_centroids}").take_all(),
                  key=lambda r: r["vec_id"])
    cents = np.array([r["embedding"] for r in init], dtype=np.float64)
    nrm = np.linalg.norm(cents, axis=1)
    nrm[nrm == 0] = 1.0
    cents = cents / nrm[:, None]
    n_parts = min(n_centroids, resolve_num_partitions(cfg))

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _IVF_PART_SCHEMA.empty_table()
        c = np.asarray(part["centroid"], np.int64)
        lst = part["vec_sum"].combine_chunks()
        dim = len(lst[0])
        mat = np.asarray(lst.flatten(), np.float64).reshape(len(c), dim)
        n = np.asarray(part["n_vecs"], np.int64)
        uniq, inv = np.unique(c, return_inverse=True)
        sums = np.zeros((len(uniq), dim))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, weights=n, minlength=len(uniq))
        return pa.table({
            "centroid": pa.array(uniq, pa.int64()),
            "vec_sum": pa.array(list(sums), pa.list_(pa.float64())),
            "n_vecs": pa.array(counts.astype(np.int64), pa.int64()),
        })

    for _ in range(n_iters):
        cent_ref = ray.put(cents)

        def _partial(batch: pa.Table) -> pa.Table:
            cc = ray.get(cent_ref)
            ids, mat = _emb_matrix(batch)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            matn = mat / norms[:, None]
            a = np.argmax(matn @ cc.T, axis=1)
            sums = np.zeros_like(cc)
            np.add.at(sums, a, matn)
            counts = np.bincount(a, minlength=cc.shape[0])
            nz = np.flatnonzero(counts)
            return pa.table({
                "centroid": pa.array(nz, pa.int64()),
                "vec_sum": pa.array(list(sums[nz]),
                                    pa.list_(pa.float64())),
                "n_vecs": pa.array(counts[nz].astype(np.int64),
                                   pa.int64()),
            })

        parts = ds.map_batches(_partial, batch_format="pyarrow")
        rows = exchange_map_groups(parts, "centroid", n_parts, _merge,
                                   _IVF_PART_SCHEMA).take_all()
        for r in rows:
            if r["n_vecs"] > 0:
                v = np.asarray(r["vec_sum"], np.float64)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[r["centroid"]] = v / nv
    return cents


def ivf_assign(ds, centroids: np.ndarray):
    """vec_id → inverted-list id (nearest centroid by cosine). At scale
    this is what you persist as list-partitioned Parquet so queries read
    only their probed lists."""
    cent_ref = ray.put(centroids)

    def _assign(batch: pa.Table) -> pa.Table:
        cc = ray.get(cent_ref)
        ids, mat = _emb_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        a = np.argmax((mat / norms[:, None]) @ cc.T, axis=1)
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "list_id": pa.array(a, pa.int64())})

    return ds.map_batches(_assign, batch_format="pyarrow")


def _load_queries(ds, n_queries: int):
    """(q_ids, unit-normalized query matrix) for the vec_id < n_queries
    convention shared by all ann_topk_* entry points."""
    qrows = ds.filter(expr=f"vec_id < {n_queries}").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    return q_ids, qm / qn[:, None]


def _probe_mask(qm: np.ndarray, cents: np.ndarray, nprobe: int
                ) -> np.ndarray:
    """(n_q, n_centroids) bool: each query's ``nprobe`` nearest lists."""
    qsims = qm @ cents.T
    probe = np.argpartition(-qsims, min(nprobe, cents.shape[0]) - 1,
                            axis=1)[:, :nprobe]          # (n_q, nprobe)
    mask = np.zeros((qm.shape[0], cents.shape[0]), bool)
    mask[np.arange(qm.shape[0])[:, None], probe] = True
    return mask


def ann_topk_ivf(sf_dir: str, n_queries: int = 8, k: int = 5,
                 n_centroids: int = 16, nprobe: int = 4,
                 n_iters: int = 3):
    """IVF top-k: each query scores ONLY vectors whose inverted list is
    among its ``nprobe`` nearest centroids (candidate pruning by a factor
    of ~n_centroids/nprobe; approximate — recall measured in
    ``tests/test_ann_ivf.py`` against the brute-force twin). Same output
    schema as :func:`ann_topk_bruteforce`; one scoring pass with the
    list mask applied in-kernel."""
    ds = _read_emb(sf_dir)
    cents = ivf_train_centroids(ds, n_centroids, n_iters)
    q_ids, qm = _load_queries(ds, n_queries)
    probe_mask = _probe_mask(qm, cents, nprobe)
    return _ivf_score_reduce(ds, q_ids, qm, cents, probe_mask, k)


def _ivf_score_reduce(ds, q_ids, qm, cents, probe_mask, k: int):
    """One distributed scoring pass (in-kernel list mask) + the tiny
    k×|queries| driver reduce shared by the in-memory and the
    index-backed IVF paths."""
    state_ref = ray.put((q_ids, qm, cents, probe_mask))

    def _score(batch: pa.Table) -> pa.Table:
        qi, qmat, cc, pm = ray.get(state_ref)
        ids, mat = _emb_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        lists = np.argmax(matn @ cc.T, axis=1)
        sims = matn @ qmat.T                       # (n_batch, n_q)
        sims[~pm[:, lists].T] = -np.inf            # prune unprobed lists
        n, nq = sims.shape
        kk = min(k + 1, n)
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        rows = top.reshape(-1)
        qcol = np.repeat(qi[None, :], kk, axis=0).reshape(-1)
        score = sims[rows, np.repeat(np.arange(nq)[None, :], kk,
                                     axis=0).reshape(-1)]
        keep = np.isfinite(score)
        return pa.table({
            "query_id": pa.array(qcol[keep], pa.int64()),
            "neighbor_id": pa.array(ids[rows][keep], pa.int64()),
            "score": pa.array(score[keep], pa.float64()),
        })

    partial = ds.map_batches(_score, batch_format="pyarrow")
    tbl = pa.Table.from_pylist(partial.take_all())
    out_rows = []
    if tbl.num_rows:
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
                    "score_e4": int(round(float(scores[m][j]) * 1e4)),
                })
    return pa.Table.from_pylist(out_rows) if out_rows else pa.table({
        "query_id": pa.array([], pa.int64()),
        "neighbor_id": pa.array([], pa.int64()),
        "rank": pa.array([], pa.int64()),
        "score_e4": pa.array([], pa.int64()),
    })


# ---------------------------------------------------------------------------
# IVF index persistence — the 100-TB layout.
#
# lists/list_id=N/*.parquet  (hive-partitioned by inverted list) means a
# query's scoring read opens ONLY its probed partitions: storage scanned
# per query drops by ~n_centroids/nprobe, and the written index doubles
# as a resumable artifact (a crashed build reruns only missing lists; a
# recall-starved query re-probes without re-sharding). centroids.parquet
# (C×dim, tiny) sits next to it and is broadcast per query session.
# ---------------------------------------------------------------------------


def ivf_build_index(sf_dir: str, out_dir: str, n_centroids: int = 16,
                    n_iters: int = 3) -> np.ndarray:
    """Train the coarse quantizer, then stream the vectors out as
    Parquet hive-partitioned by their inverted-list id. Returns the
    centroid matrix (also persisted to ``centroids.parquet``)."""
    import pyarrow.parquet as pq

    ds = _read_emb(sf_dir)
    cents = ivf_train_centroids(ds, n_centroids, n_iters)
    cent_ref = ray.put(cents)

    def _with_list(batch: pa.Table) -> pa.Table:
        cc = ray.get(cent_ref)
        ids, mat = _emb_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        a = np.argmax((mat / norms[:, None]) @ cc.T, axis=1)
        return batch.append_column(
            "list_id", pa.array(a.astype(np.int64), pa.int64()))

    ds.map_batches(_with_list, batch_format="pyarrow").write_parquet(
        f"{out_dir}/lists", partition_cols=["list_id"])
    pq.write_table(
        pa.table({
            "centroid": pa.array(np.arange(cents.shape[0]), pa.int64()),
            "vec": pa.array(list(cents), pa.list_(pa.float64())),
        }),
        f"{out_dir}/centroids.parquet")
    return cents


def ivf_load_centroids(index_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{index_dir}/centroids.parquet").sort_by("centroid")
    lst = t["vec"].combine_chunks()
    dim = len(lst[0]) if len(lst) else 0
    return np.asarray(lst.flatten(), np.float64).reshape(t.num_rows, dim)


def ann_topk_ivf_index(index_dir: str, n_queries: int = 8, k: int = 5,
                       nprobe: int = 4):
    """IVF top-k over a persisted index: the scoring read opens ONLY the
    union of the queries' probed ``list_id=N`` partitions (path-level
    pruning — no bytes of unprobed lists leave storage). The query-vector
    lookup itself is a one-off column-pruned scan (real deployments pass
    external query vectors). Output is identical to :func:`ann_topk_ivf`
    at equal parameters: rows outside a query's probe set score -inf in
    both paths."""
    cents = ivf_load_centroids(index_dir)
    full = read_parquet_clean(f"{index_dir}/lists",
                              columns=["vec_id", "embedding"])
    q_ids, qm = _load_queries(full, n_queries)
    probe_mask = _probe_mask(qm, cents, nprobe)
    probed = np.flatnonzero(probe_mask.any(axis=0))
    # Ray 2.49 read_parquet doesn't expand directories inside a path
    # LIST — enumerate the partition files ourselves
    import glob

    paths = [f for i in probed for f in sorted(
        glob.glob(f"{index_dir}/lists/list_id={int(i)}/*.parquet"))]
    pruned = read_parquet_clean(paths, columns=["vec_id", "embedding"])
    return _ivf_score_reduce(pruned, q_ids, qm, cents, probe_mask, k)


# ---------------------------------------------------------------------------
# PQ: the third scale path (product quantization, Jégou et al. 2011) —
# memory-compressed ANN. Vectors quantize to m uint8 codes (dim·8 bytes →
# m bytes, e.g. 64 floats → 8 bytes); queries score candidates with an
# asymmetric-distance (ADC) table lookup, never touching raw floats. At
# 100 TB this is what keeps the index resident: the codes table is
# ~dim·8/m× smaller than the embeddings and the per-batch scoring cost is
# a (n, m) gather + sum instead of an (n, dim) matmul. Composes with IVF
# (probe lists, then ADC within them).
# ---------------------------------------------------------------------------

_PQ_PART_SCHEMA = pa.schema([
    ("slot", pa.int64()),                 # sub * k_codes + code
    ("vec_sum", pa.list_(pa.float64())),
    ("n_vecs", pa.int64()),
])


def _pq_subsplit(mat: np.ndarray, m_sub: int) -> np.ndarray:
    """(n, dim) unit-normalized → (n, m_sub, subdim)."""
    n, dim = mat.shape
    if dim % m_sub:
        raise ValueError(f"dim={dim} not divisible by m_sub={m_sub}")
    return mat.reshape(n, m_sub, dim // m_sub)


def _pq_assign(sub: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m, d) subvectors × (m, k, d) codebooks → (n, m) nearest-code
    ids (L2 == argmax of dot - ||c||²/2)."""
    # scores[n, m, k] = sub[n,m,:]·books[m,k,:]
    scores = np.einsum("nmd,mkd->nmk", sub, books)
    scores -= 0.5 * np.einsum("mkd,mkd->mk", books, books)[None]
    return np.argmax(scores, axis=2)


def pq_train(ds, m_sub: int = 8, k_codes: int = 32, n_iters: int = 3,
             cfg=None) -> np.ndarray:
    """Distributed PQ codebook training: per-subspace k-means with the
    same constant-size-partial exchange as :func:`ivf_train_centroids`
    — per batch, each (subspace, code) slot accumulates one subvector
    sum + count (m·k rows per block, never the vectors); the driver
    updates the (m, k, subdim) codebook table. Init = the ``k_codes``
    lowest vec_ids' subvectors (deterministic, no RNG). Vectors are
    unit-normalized first so ADC dot products approximate cosine."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    cfg = cfg or DEFAULT_CONFIG
    # same sort-free deterministic init as ivf_train_centroids
    init = sorted(ds.filter(expr=f"vec_id < {k_codes}").take_all(),
                  key=lambda r: r["vec_id"])
    qm = np.array([r["embedding"] for r in init], dtype=np.float64)
    nrm = np.linalg.norm(qm, axis=1)
    nrm[nrm == 0] = 1.0
    books = np.ascontiguousarray(
        _pq_subsplit(qm / nrm[:, None], m_sub).transpose(1, 0, 2))
    n_parts = min(m_sub * k_codes, resolve_num_partitions(cfg))
    subdim = books.shape[2]

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _PQ_PART_SCHEMA.empty_table()
        s = np.asarray(part["slot"], np.int64)
        lst = part["vec_sum"].combine_chunks()
        mat = np.asarray(lst.flatten(), np.float64).reshape(len(s), subdim)
        n = np.asarray(part["n_vecs"], np.int64)
        uniq, inv = np.unique(s, return_inverse=True)
        sums = np.zeros((len(uniq), subdim))
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, weights=n, minlength=len(uniq))
        return pa.table({
            "slot": pa.array(uniq, pa.int64()),
            "vec_sum": pa.array(list(sums), pa.list_(pa.float64())),
            "n_vecs": pa.array(counts.astype(np.int64), pa.int64()),
        })

    for _ in range(n_iters):
        books_ref = ray.put(books)

        def _partial(batch: pa.Table) -> pa.Table:
            bb = ray.get(books_ref)
            _, mat = _emb_matrix(batch)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            sub = _pq_subsplit(mat / norms[:, None], m_sub)
            codes = _pq_assign(sub, bb)                   # (n, m)
            slots = (np.arange(m_sub)[None, :] * k_codes
                     + codes).reshape(-1)
            flat = sub.reshape(-1, subdim)
            uniq, inv = np.unique(slots, return_inverse=True)
            sums = np.zeros((len(uniq), subdim))
            np.add.at(sums, inv, flat)
            counts = np.bincount(inv, minlength=len(uniq))
            return pa.table({
                "slot": pa.array(uniq, pa.int64()),
                "vec_sum": pa.array(list(sums), pa.list_(pa.float64())),
                "n_vecs": pa.array(counts.astype(np.int64), pa.int64()),
            })

        parts = ds.map_batches(_partial, batch_format="pyarrow")
        rows = exchange_map_groups(parts, "slot", n_parts, _merge,
                                   _PQ_PART_SCHEMA).take_all()
        for r in rows:
            if r["n_vecs"] > 0:
                m_i, c_i = divmod(r["slot"], k_codes)
                books[m_i, c_i] = (np.asarray(r["vec_sum"], np.float64)
                                   / r["n_vecs"])
    return books


def pq_encode(ds, books: np.ndarray):
    """vec_id → m uint8 PQ codes (the compressed index you persist)."""
    m_sub, k_codes = books.shape[0], books.shape[1]
    books_ref = ray.put(books)

    def _enc(batch: pa.Table) -> pa.Table:
        bb = ray.get(books_ref)
        ids, mat = _emb_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        codes = _pq_assign(_pq_subsplit(mat / norms[:, None], m_sub), bb)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "codes": pa.array(list(codes.astype(np.uint8)),
                              pa.list_(pa.uint8())),
        })

    return ds.map_batches(_enc, batch_format="pyarrow")


def ann_topk_pq(sf_dir: str, n_queries: int = 8, k: int = 5,
                m_sub: int = 8, k_codes: int = 32, n_iters: int = 3):
    """PQ/ADC top-k: same output schema as :func:`ann_topk_bruteforce`
    but every candidate is scored from its m codes via per-query lookup
    tables (``tables[q, m, code]`` summed over m) — the raw floats are
    read once at encode time, never at query time. Approximate; recall
    vs the brute-force twin is measured in ``tests/test_ann_pq.py``."""
    ds = _read_emb(sf_dir)
    books = pq_train(ds, m_sub, k_codes, n_iters)
    q_ids, qm = _load_queries(ds, n_queries)
    # ADC tables: (n_q, m, k) = q_sub[q,m,:]·books[m,k,:]
    tables = np.einsum("qmd,mkd->qmk", _pq_subsplit(qm, m_sub), books)
    state_ref = ray.put((q_ids, tables, books))

    def _score(batch: pa.Table) -> pa.Table:
        qi, tbls, bb = ray.get(state_ref)
        ids, mat = _emb_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        codes = _pq_assign(_pq_subsplit(mat / norms[:, None], m_sub), bb)
        # sims[n, q] = sum_m tbls[q, m, codes[n, m]]
        sims = tbls[:, np.arange(m_sub)[None, :], codes].sum(
            axis=2).T                                   # (n, n_q)
        n, nq = sims.shape
        kk = min(k + 1, n)
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        rows = top.reshape(-1)
        qcol = np.repeat(qi[None, :], kk, axis=0).reshape(-1)
        score = sims[rows, np.repeat(np.arange(nq)[None, :], kk,
                                     axis=0).reshape(-1)]
        return pa.table({
            "query_id": pa.array(qcol, pa.int64()),
            "neighbor_id": pa.array(ids[rows], pa.int64()),
            "score": pa.array(score, pa.float64()),
        })

    partial = ds.map_batches(_score, batch_format="pyarrow")
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
                "score_e4": int(round(float(scores[m][j]) * 1e4)),
            })
    return pa.Table.from_pylist(out_rows)


def ann_topk_ivfpq(sf_dir: str, n_queries: int = 8, k: int = 5,
                   n_centroids: int = 16, nprobe: int = 4,
                   m_sub: int = 16, k_codes: int = 64,
                   n_iters: int = 3):
    """IVF+PQ — the standard billion-scale composition: the coarse
    quantizer prunes candidates to each query's ``nprobe`` lists AND
    every surviving candidate is scored from its m uint8 codes via ADC
    tables. Storage touched per query ≈ (nprobe/n_centroids) of a
    codes table that is itself ~dim·8/m× smaller than the floats. At
    full probe (nprobe = n_centroids) the output equals
    :func:`ann_topk_pq` at the same codebooks — the pruning is the only
    approximation added on top of PQ (equality-tested)."""
    ds = _read_emb(sf_dir)
    cents = ivf_train_centroids(ds, n_centroids, n_iters)
    books = pq_train(ds, m_sub, k_codes, n_iters)
    q_ids, qm = _load_queries(ds, n_queries)
    probe_mask = _probe_mask(qm, cents, nprobe)
    tables = np.einsum("qmd,mkd->qmk", _pq_subsplit(qm, m_sub), books)
    state_ref = ray.put((q_ids, tables, books, cents, probe_mask))

    def _score(batch: pa.Table) -> pa.Table:
        qi, tbls, bb, cc, pm = ray.get(state_ref)
        ids, mat = _emb_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        lists = np.argmax(matn @ cc.T, axis=1)
        codes = _pq_assign(_pq_subsplit(matn, m_sub), bb)
        sims = tbls[:, np.arange(m_sub)[None, :], codes].sum(axis=2).T
        sims[~pm[:, lists].T] = -np.inf
        n, nq = sims.shape
        kk = min(k + 1, n)
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        rows = top.reshape(-1)
        qcol = np.repeat(qi[None, :], kk, axis=0).reshape(-1)
        score = sims[rows, np.repeat(np.arange(nq)[None, :], kk,
                                     axis=0).reshape(-1)]
        keep = np.isfinite(score)
        return pa.table({
            "query_id": pa.array(qcol[keep], pa.int64()),
            "neighbor_id": pa.array(ids[rows][keep], pa.int64()),
            "score": pa.array(score[keep], pa.float64()),
        })

    partial = ds.map_batches(_score, batch_format="pyarrow")
    tbl = pa.Table.from_pylist(partial.take_all())
    out_rows = []
    if tbl.num_rows:
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
                    "score_e4": int(round(float(scores[m][j]) * 1e4)),
                })
    return pa.Table.from_pylist(out_rows)


def ivfpq_build_index(sf_dir: str, out_dir: str, n_centroids: int = 16,
                      m_sub: int = 16, k_codes: int = 64,
                      n_iters: int = 3) -> None:
    """Persist the full compressed index: PQ codes hive-partitioned by
    IVF list (`lists/list_id=N/`, each row = vec_id + m uint8 codes)
    plus the two tiny model tables (centroids, codebooks). The persisted
    artifact is dim·8/m× smaller than the embeddings themselves — the
    layout that keeps a 100-TB corpus's ANN index resident — and a
    query session reads ONLY its probed lists' codes (path-level
    pruning), never a raw float."""
    import pyarrow.parquet as pq

    ds = _read_emb(sf_dir)
    cents = ivf_train_centroids(ds, n_centroids, n_iters)
    books = pq_train(ds, m_sub, k_codes, n_iters)
    state_ref = ray.put((cents, books))

    def _enc(batch: pa.Table) -> pa.Table:
        cc, bb = ray.get(state_ref)
        ids, mat = _emb_matrix(batch)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        matn = mat / norms[:, None]
        lists = np.argmax(matn @ cc.T, axis=1)
        codes = _pq_assign(_pq_subsplit(matn, m_sub), bb)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "codes": pa.array(list(codes.astype(np.uint8)),
                              pa.list_(pa.uint8())),
            "list_id": pa.array(lists.astype(np.int64), pa.int64()),
        })

    ds.map_batches(_enc, batch_format="pyarrow").write_parquet(
        f"{out_dir}/lists", partition_cols=["list_id"])
    pq.write_table(
        pa.table({
            "centroid": pa.array(np.arange(cents.shape[0]), pa.int64()),
            "vec": pa.array(list(cents), pa.list_(pa.float64())),
        }), f"{out_dir}/centroids.parquet")
    mm, kk, dd = books.shape
    pq.write_table(
        pa.table({
            "sub": pa.array(np.repeat(np.arange(mm), kk), pa.int64()),
            "code": pa.array(np.tile(np.arange(kk), mm), pa.int64()),
            "vec": pa.array(list(books.reshape(mm * kk, dd)),
                            pa.list_(pa.float64())),
        }), f"{out_dir}/codebooks.parquet")


def ivfpq_load_books(index_dir: str) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{index_dir}/codebooks.parquet").sort_by(
        [("sub", "ascending"), ("code", "ascending")])
    lst = t["vec"].combine_chunks()
    dd = len(lst[0]) if len(lst) else 0
    m = int(np.asarray(t["sub"], np.int64).max()) + 1 if t.num_rows else 0
    k = t.num_rows // max(m, 1)
    return np.asarray(lst.flatten(), np.float64).reshape(m, k, dd)


def ann_topk_ivfpq_index(index_dir: str, sf_dir: str,
                         n_queries: int = 8, k: int = 5,
                         nprobe: int = 4):
    """IVF+PQ top-k over the PERSISTED compressed index: centroids +
    codebooks load from their tiny tables, queries come from the
    embeddings table (real deployments pass external vectors), and the
    scoring read opens ONLY the probed lists' code files — the raw
    embedding column is read just for the query vectors."""
    import glob

    cents = ivf_load_centroids(index_dir)
    books = ivfpq_load_books(index_dir)
    m_sub = books.shape[0]
    q_ids, qm = _load_queries(_read_emb(sf_dir), n_queries)
    probe_mask = _probe_mask(qm, cents, nprobe)
    probed = np.flatnonzero(probe_mask.any(axis=0))
    paths = [f for i in probed for f in sorted(
        glob.glob(f"{index_dir}/lists/list_id={int(i)}/*.parquet"))]
    tables = np.einsum("qmd,mkd->qmk", _pq_subsplit(qm, m_sub), books)
    state_ref = ray.put((q_ids, tables, probe_mask))

    from ..sources.tables import read_parquet_clean as _rpc

    def _score(batch: pa.Table) -> pa.Table:
        qi, tbls, pm = ray.get(state_ref)
        ids = np.asarray(batch["vec_id"], np.int64)
        lst = batch["codes"].combine_chunks()
        codes = np.asarray(lst.flatten(), np.uint8).reshape(
            len(ids), m_sub).astype(np.int64)
        lists = np.asarray(batch["list_id"], np.int64)
        sims = tbls[:, np.arange(m_sub)[None, :], codes].sum(axis=2).T
        sims[~pm[:, lists].T] = -np.inf
        n, nq = sims.shape
        kk2 = min(k + 1, n)
        top = np.argpartition(-sims, kk2 - 1, axis=0)[:kk2]
        rows = top.reshape(-1)
        qcol = np.repeat(qi[None, :], kk2, axis=0).reshape(-1)
        score = sims[rows, np.repeat(np.arange(nq)[None, :], kk2,
                                     axis=0).reshape(-1)]
        keep = np.isfinite(score)
        return pa.table({
            "query_id": pa.array(qcol[keep], pa.int64()),
            "neighbor_id": pa.array(ids[rows][keep], pa.int64()),
            "score": pa.array(score[keep], pa.float64()),
        })

    partial = _rpc(paths, columns=["vec_id", "codes", "list_id"]
                   ).map_batches(_score, batch_format="pyarrow")
    tbl = pa.Table.from_pylist(partial.take_all())
    out_rows = []
    if tbl.num_rows:
        qids = tbl["query_id"].to_numpy()
        nids = tbl["neighbor_id"].to_numpy()
        scores = tbl["score"].to_numpy()
        for q in q_ids:
            m2 = (qids == q) & (nids != q)
            order = np.lexsort((nids[m2], -scores[m2]))[:k]
            for rank, j in enumerate(order, 1):
                out_rows.append({
                    "query_id": int(q),
                    "neighbor_id": int(nids[m2][j]),
                    "rank": rank,
                    "score_e4": int(round(float(scores[m2][j]) * 1e4)),
                })
    return pa.Table.from_pylist(out_rows)


LABEL_CENTROID_SCHEMA = pa.schema([
    ("label", pa.int64()), ("dim", pa.int64()),
    ("sum_e4", pa.int64()), ("n_vecs", pa.int64()),
    ("centroid_e4", pa.int64()),
])


def label_centroids(sf_dir: str):
    """Per-label mean embedding (class centroids — the supervised twin
    of the k-means trainers, and the grouped VECTOR aggregate shape:
    partial per-block per-label sums, never per-row shuffle).

    Each block reduces to ≤ labels×dim (label, dim, sum, n) rows via one
    argsort + ``np.add.reduceat``; elements quantize to 1e4-scale
    integers FIRST (the `cosine_pairs_exact` exactness rule — every
    partial < 2^53 so float64 sums are exact and order-insensitive),
    then `grouped_sums` merges partials on the exchange. The centroid is
    TRUNCATING integer division (sign·(|s|÷n)) because DuckDB ``//``
    truncates toward zero while numpy floors — sums go negative here."""
    from ..stages.agg import grouped_sums

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding", "label"])

    def _partials(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch["label"], np.int64)
        lst = batch["embedding"].combine_chunks()
        dim = len(lst[0]) if len(lst) else 0
        if len(lab) == 0 or dim == 0:
            return pa.schema([("label", pa.int64()), ("dim", pa.int64()),
                              ("sum_e4", pa.int64()),
                              ("n_vecs", pa.int64())]).empty_table()
        mat = np.asarray(lst.flatten(), np.float64).reshape(len(lab), dim)
        q = np.round(mat * 1e4)
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        starts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        sums = np.add.reduceat(q[order], starts, axis=0)
        counts = np.diff(np.append(starts, len(lab_s)))
        labs = lab_s[starts]
        nlab = len(labs)
        return pa.table({
            "label": pa.array(np.repeat(labs, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                    nlab), pa.int64()),
            "sum_e4": pa.array(sums.ravel().astype(np.int64), pa.int64()),
            "n_vecs": pa.array(np.repeat(counts, dim).astype(np.int64),
                               pa.int64()),
        })

    agg = grouped_sums(ds.map_batches(_partials, batch_format="pyarrow"),
                       ["label", "dim"], ["sum_e4", "n_vecs"])

    def _final(t: pa.Table) -> pa.Table:
        s = np.asarray(t["sum_sum_e4"], np.int64)
        nv = np.asarray(t["sum_n_vecs"], np.int64)
        c = np.sign(s) * (np.abs(s) // np.maximum(nv, 1))
        return pa.table({
            "label": t["label"], "dim": t["dim"],
            "sum_e4": pa.array(s, pa.int64()),
            "n_vecs": pa.array(nv, pa.int64()),
            "centroid_e4": pa.array(c, pa.int64()),
        }).cast(LABEL_CENTROID_SCHEMA)

    return agg.map_batches(_final, batch_format="pyarrow")


def knn_label_vote(sf_dir: str, n_queries: int = 8, k: int = 5):
    """k-NN classification: for each query vector (vec_id < n_queries),
    the majority label of its k nearest corpus neighbours by EXACT
    quantized cosine — the similarity-search → classification
    composition, SQL-checkable end to end.

    Scores use the `cosine_pairs_exact` integer-quantization rule
    (elements → 1e4 ints, every partial < 2^53, identical IEEE op
    sequence to the oracle). Per-batch scoring is one matmul against the
    broadcast query matrix; per-query candidate truncation + the exact
    global top-k ride `grouped_topk` (≤ k rows per query per block
    shuffle), and the vote is a second tiny grouped_topk over label
    counts — deterministic tiebreaks (neighbor id, then label) both
    stages."""
    import ray as _ray

    from ..stages.agg import grouped_sums, grouped_topk

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    qrows = ds.filter(expr=f"vec_id < {n_queries}").take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in qrows], np.int64)
    qm = np.round(np.array([r["embedding"] for r in qrows],
                           np.float64) * 1e4)
    qnorm = np.einsum("ij,ij->i", qm, qm)         # exact ints in float64
    qref = _ray.put((qids, qm, qnorm))

    def _score(batch: pa.Table) -> pa.Table:
        qi, qmat, qn = _ray.get(qref)
        ids = np.asarray(batch["vec_id"], np.int64)
        keep = ids >= n_queries
        ids = ids[keep]
        if ids.size == 0:
            return pa.schema([
                ("query_id", pa.int64()), ("neighbor_id", pa.int64()),
                ("label", pa.int64()), ("score_e4", pa.int64()),
            ]).empty_table()
        lst = batch["embedding"].combine_chunks()
        dim = len(lst[0])
        mat = np.asarray(lst.flatten(), np.float64).reshape(-1, dim)[keep]
        lab = np.asarray(batch["label"], np.int64)[keep]
        cm = np.round(mat * 1e4)
        num = qmat @ cm.T                          # exact: partials < 2^53
        cn = np.einsum("ij,ij->i", cm, cm)
        cn[cn == 0] = 1.0
        e4 = np.round(1e4 * num / np.sqrt(qn[:, None] * cn[None, :])
                      ).astype(np.int64)
        nq, nc = len(qi), len(ids)
        return pa.table({
            "query_id": pa.array(np.repeat(qi, nc), pa.int64()),
            "neighbor_id": pa.array(np.tile(ids, nq), pa.int64()),
            "label": pa.array(np.tile(lab, nq), pa.int64()),
            "score_e4": pa.array(e4.ravel(), pa.int64()),
        })

    scores = ds.map_batches(_score, batch_format="pyarrow")
    top = grouped_topk(scores, key="query_id", order_col="score_e4",
                       k=k, tiebreak="neighbor_id")
    votes = grouped_sums(top.select_columns(["query_id", "label"]),
                         ["query_id", "label"], [], count_as="n")
    win = grouped_topk(votes, key="query_id", order_col="n", k=1,
                       tiebreak="label")
    return win.map_batches(
        lambda t: pa.table({"query_id": t["query_id"],
                            "pred_label": t["label"], "n_votes": t["n"]}),
        batch_format="pyarrow")


def ann_recall_report(sf_dir: str, n_queries: int = 8, k: int = 5,
                      variants: tuple = ("ivf", "pq", "ivfpq")):
    """ANN index quality accounting: recall@k of each approximate
    variant against the exact brute-force top-k, per index — the tuning
    report an embedding-dedup run files next to residual_dup_rate. Each
    variant's neighbor sets intersect the exact sets per query (a
    driver-side fold over k·|queries| rows); output one row per variant:
    (variant, n_queries, k, mean_recall_ppm). Deterministic (every index
    here is seeded), so reruns are byte-identical."""
    exact = ann_topk_bruteforce(sf_dir, n_queries=n_queries, k=k)
    ex: dict[int, set] = {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    fns = {"ivf": ann_topk_ivf, "pq": ann_topk_pq,
           "ivfpq": ann_topk_ivfpq}
    rows = []
    for name in variants:
        res = fns[name](sf_dir, n_queries=n_queries, k=k)
        got: dict[int, set] = {}
        for r in (res.to_pylist() if isinstance(res, pa.Table)
                  else res.take_all()):
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recs = [len(got.get(q, set()) & s) * 1_000_000 // max(len(s), 1)
                for q, s in sorted(ex.items())]
        rows.append({
            "variant": name,
            "n_queries": len(ex),
            "k": k,
            "mean_recall_ppm": int(sum(recs) // max(len(recs), 1)),
        })
    return pa.Table.from_pylist(rows, schema=pa.schema(
        [("variant", pa.string()), ("n_queries", pa.int64()),
         ("k", pa.int64()), ("mean_recall_ppm", pa.int64())]))


def embedding_dim_profile(sf_dir: str):
    """Per-dimension profile of the embedding column: count, sum, min and
    max of the 1e4-quantized values — the column-health audit an
    embedding-table ingest runs before indexing (dead dimensions, scale
    drift, clipped values all show here). One pruned scan; each block
    reduces to ``dim`` partial rows (the classic combiner shape), and the
    final combine over ``dim × n_blocks`` rows is provably driver-scale.

    Quantization follows cosine_pairs_exact's scheme (elements → 1e4
    integers, exact in float64) so sums are bit-stable across engines.
    """
    ds = _read_emb(sf_dir).map_batches(_dim_profile_partial,
                                       batch_format="pyarrow")
    parts = ds.take_all()
    if not parts:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "sum_e4": pa.array([], pa.int64()),
                         "min_e4": pa.array([], pa.int64()),
                         "max_e4": pa.array([], pa.int64())})
    import pandas as pd

    df = pd.DataFrame(parts)
    g = df.groupby("dim", sort=True).agg(
        n=("n", "sum"), sum_e4=("sum_e4", "sum"),
        min_e4=("min_e4", "min"), max_e4=("max_e4", "max")).reset_index()
    return pa.Table.from_pandas(g, preserve_index=False)


def _dim_profile_partial(batch: pa.Table) -> pa.Table:
    _, mat = _emb_matrix(batch)
    if mat.size == 0:
        return pa.table({"dim": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64()),
                         "sum_e4": pa.array([], pa.int64()),
                         "min_e4": pa.array([], pa.int64()),
                         "max_e4": pa.array([], pa.int64())})
    q = np.round(mat * 1e4)               # exact integers in float64
    d = mat.shape[1]
    return pa.table({
        "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
        "n": pa.array(np.full(d, mat.shape[0], dtype=np.int64)),
        "sum_e4": pa.array(q.sum(axis=0).astype(np.int64)),
        "min_e4": pa.array(q.min(axis=0).astype(np.int64)),
        "max_e4": pa.array(q.max(axis=0).astype(np.int64)),
    })


def embedding_norm_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9)):
    """Exact discrete quantiles of the quantized squared L2 norm
    (sum of e4²; every partial an exact float64 integer) — the scale
    audit that catches unnormalized or clipped embedding batches before
    they poison cosine thresholds. Rides the shared distributed
    value-histogram quantile exchange."""
    from ..stages.agg import quantiles_disc

    def _norm(batch: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(batch)
        q = np.round(mat * 1e4)
        return pa.table({"norm2_e8": pa.array(
            np.einsum("ij,ij->i", q, q).astype(np.int64)
            if mat.size else np.empty(0, np.int64), pa.int64())})

    ds = _read_emb(sf_dir).map_batches(_norm, batch_format="pyarrow")
    return quantiles_disc(ds, "norm2_e8", list(qs))


def _emb_fp_batch(col_name: str):
    """(vec_id, md5-of-e4-CSV) fingerprint map — the embedding analogue
    of the docs snapshot fingerprint: quantize to 1e4 integers (exact in
    float64), render the canonical comma-joined decimal string fully
    vectorized (cast → ListArray → binary_join), md5 it. DuckDB computes
    the identical string via array_to_string(list_transform(...)), so
    the fingerprints agree byte-for-byte."""
    from .docops import _md5_column

    def _f(batch: pa.Table) -> pa.Table:
        ids, mat = _emb_matrix(batch)
        q = np.round(mat * 1e4).astype(np.int64)
        n, d = q.shape if q.ndim == 2 else (len(ids), 0)
        s = pc.cast(pa.array(q.reshape(-1)), pa.string())
        offs = pa.array(np.arange(n + 1, dtype=np.int32) * d)
        csv = pc.binary_join(pa.ListArray.from_arrays(offs, s), ",")
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            col_name: _md5_column(csv),
        })

    return _f


def snapshot_diff_embeddings(dir_a: str, dir_b: str):
    """Two-snapshot EMBEDDING-table diff: vectors ADDED, REMOVED, or
    CHANGED (same vec_id, different e4-quantized values) between
    snapshots — the re-embed audit a training pipeline runs after an
    encoder upgrade. Each side reduces to its (vec_id, fingerprint) in
    the map pass (vectors never shuffle), ONE full-outer vec_id exchange
    joins them, and only the changed surface is emitted."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    a = _read_emb(dir_a).map_batches(_emb_fp_batch("fp_a"),
                                     batch_format="pyarrow")
    b = _read_emb(dir_b).map_batches(_emb_fp_batch("fp_b"),
                                     batch_format="pyarrow")
    j = hash_join_exchange(a, b, key="vec_id", left_cols=["fp_a"],
                           right_cols=["fp_b"], n_parts=n_parts,
                           join_type="full outer")

    def _status(batch: pa.Table) -> pa.Table:
        ma = batch["fp_a"].combine_chunks()
        mb = batch["fp_b"].combine_chunks()
        a_null = np.asarray(pc.is_null(ma), bool)
        b_null = np.asarray(pc.is_null(mb), bool)
        neq = np.asarray(pc.fill_null(pc.not_equal(ma, mb), False), bool)
        status = np.where(a_null, "added",
                          np.where(b_null, "removed", "changed"))
        keep = a_null | b_null | neq
        return pa.table({
            "vec_id": pc.filter(pc.cast(batch["vec_id"], pa.int64()),
                                pa.array(keep)),
            "status": pa.array(status[keep], pa.string()),
        })

    return j.map_batches(_status, batch_format="pyarrow")


LABEL_DISPERSION_SCHEMA = pa.schema([
    ("label", pa.int64()), ("n_vecs", pa.int64()),
    ("ssq_e8", pa.int64()), ("dispersion", pa.int64()),
])


def label_dispersion(sf_dir: str):
    """Per-label within-cluster scatter, EXACT in integers: for each
    label, ``dispersion = Σ_dims (n·Σq² − (Σq)²)`` over the 1e4-quantized
    elements — n² times the per-dim variance summed over dims, the
    separability audit for `label_centroids` / `knn_label_vote` (a label
    whose dispersion rivals the inter-centroid gap cannot be voted
    reliably). Same partial shape as `label_centroids` (one argsort +
    `np.add.reduceat` per block, ≤ labels×dim rows out), one
    `grouped_sums` exchange on (label, dim), then a second exchange over
    the ≤ labels×dim cell table folds dims per label; ``n_vecs`` rides
    the dim-1 cell so the fold is a plain sum. int64 bounds are guarded
    (n·Σq² must stay below 2^62), not silently wrapped."""
    from ..stages.agg import grouped_sums

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding", "label"])
    part_schema = pa.schema([
        ("label", pa.int64()), ("dim", pa.int64()), ("sum_e4", pa.int64()),
        ("sumsq_e8", pa.int64()), ("n_vecs", pa.int64())])

    def _partials(batch: pa.Table) -> pa.Table:
        lab = np.asarray(batch["label"], np.int64)
        lst = batch["embedding"].combine_chunks()
        dim = len(lst[0]) if len(lst) else 0
        if len(lab) == 0 or dim == 0:
            return part_schema.empty_table()
        mat = np.asarray(lst.flatten(), np.float64).reshape(len(lab), dim)
        q = np.round(mat * 1e4)
        order = np.argsort(lab, kind="stable")
        lab_s = lab[order]
        starts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        sums = np.add.reduceat(q[order], starts, axis=0)
        sumsq = np.add.reduceat(q[order] ** 2, starts, axis=0)
        counts = np.diff(np.append(starts, len(lab_s)))
        labs = lab_s[starts]
        nlab = len(labs)
        return pa.table({
            "label": pa.array(np.repeat(labs, dim), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, dim + 1, dtype=np.int64),
                                    nlab), pa.int64()),
            "sum_e4": pa.array(sums.ravel().astype(np.int64), pa.int64()),
            "sumsq_e8": pa.array(sumsq.ravel().astype(np.int64),
                                 pa.int64()),
            "n_vecs": pa.array(np.repeat(counts, dim).astype(np.int64),
                               pa.int64()),
        }).cast(part_schema)

    agg = grouped_sums(ds.map_batches(_partials, batch_format="pyarrow"),
                       ["label", "dim"], ["sum_e4", "sumsq_e8", "n_vecs"])

    cell_schema = pa.schema([
        ("label", pa.int64()), ("disp", pa.int64()), ("ssq", pa.int64()),
        ("n_once", pa.int64())])

    def _cells(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cell_schema.empty_table()
        s = np.asarray(t["sum_sum_e4"], np.int64)
        ss = np.asarray(t["sum_sumsq_e8"], np.int64)
        n = np.asarray(t["sum_n_vecs"], np.int64)
        # overflow guard in float64 BEFORE the int64 multiply: exact-int
        # contract, never a silent wrap
        if (n.astype(np.float64) * ss.astype(np.float64)).max(initial=0.0) \
                > 2.0 ** 62 or np.abs(s.astype(np.float64)).max(
                    initial=0.0) ** 2 > 2.0 ** 62:
            raise OverflowError(
                "label_dispersion: n·Σq² exceeds 2^62; rescale the "
                "quantization or shard the label dimension")
        dim = np.asarray(t["dim"], np.int64)
        return pa.table({
            "label": t["label"],
            "disp": pa.array(n * ss - s * s, pa.int64()),
            "ssq": pa.array(ss, pa.int64()),
            "n_once": pa.array(np.where(dim == 1, n, 0), pa.int64()),
        }).cast(cell_schema)

    folded = grouped_sums(agg.map_batches(_cells, batch_format="pyarrow"),
                          ["label"], ["disp", "ssq", "n_once"])

    def _final(t: pa.Table) -> pa.Table:
        return pa.table({
            "label": t["label"],
            "n_vecs": t["sum_n_once"],
            "ssq_e8": t["sum_ssq"],
            "dispersion": t["sum_disp"],
        }).cast(LABEL_DISPERSION_SCHEMA)

    return folded.map_batches(_final, batch_format="pyarrow")


SPARSITY_SCHEMA = pa.schema([
    ("n_small_dims", pa.int64()), ("n_vecs", pa.int64()),
])


def vector_sparsity_profile(sf_dir: str, threshold_e4: int = 500):
    """Histogram of per-vector near-zero dimension counts (|q| ≤
    ``threshold_e4`` at 1e4 quantization) — the effective-dimensionality
    audit that decides whether PQ sub-quantizers / IVF coarse lists are
    sized against dense or hollow vectors. Map-only partial bincounts
    (one |q|≤T reduction per block) into a ≤ dim+1-row `grouped_sums`
    exchange; all-integer output."""
    from ..stages.agg import grouped_sums

    part_schema = pa.schema([("n_small_dims", pa.int64()),
                             ("n", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["vec_id"], np.int64)
        lst = batch["embedding"].combine_chunks()
        dim = len(lst[0]) if len(lst) else 0
        if len(ids) == 0 or dim == 0:
            return part_schema.empty_table()
        mat = np.asarray(lst.flatten(), np.float64).reshape(len(ids), dim)
        cnt = (np.abs(np.round(mat * 1e4)) <= threshold_e4).sum(axis=1)
        bc = np.bincount(cnt.astype(np.int64), minlength=0)
        nz = np.flatnonzero(bc)
        return pa.table({
            "n_small_dims": pa.array(nz.astype(np.int64), pa.int64()),
            "n": pa.array(bc[nz].astype(np.int64), pa.int64()),
        }).cast(part_schema)

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding"])
    agg = grouped_sums(ds.map_batches(_partial, batch_format="pyarrow"),
                       ["n_small_dims"], ["n"])

    def _final(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_small_dims": t["n_small_dims"],
            "n_vecs": t["sum_n"],
        }).cast(SPARSITY_SCHEMA)

    return agg.map_batches(_final, batch_format="pyarrow")


COVERAGE_SCHEMA = pa.schema([
    ("matched", pa.int64()), ("docs_without_vec", pa.int64()),
    ("vecs_without_doc", pa.int64()),
])


def doc_embedding_coverage(sf_dir: str):
    """Cross-modality referential-integrity audit: ONE row counting
    doc ids with an embedding row, docs missing a vector, and vectors
    whose source doc is gone — the gate an embedding-dependent stage
    (ANN dedup, clustering) runs before trusting vec_id ≡ doc_id
    lineage. Same shape as `orders_reconciliation`: both sides pre-dedup
    per block, meet on one id exchange, three counters per partition."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _side(col: str, side_val: int):
        def _keys(batch: pa.Table) -> pa.Table:
            k = np.unique(np.asarray(batch[col], np.int64))
            return pa.table({
                "key": pa.array(k, pa.int64()),
                "side": pa.array(np.full(len(k), side_val, np.int8),
                                 pa.int8()),
                "part": pa.array(k % n_parts, pa.int64()),
            })
        return _keys

    d = read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"]).map_batches(
        _side("doc_id", 0), batch_format="pyarrow")
    v = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id"]).map_batches(
        _side("vec_id", 1), batch_format="pyarrow")

    counts_schema = pa.schema([
        ("one", pa.int64()), ("docs_only", pa.int64()),
        ("vecs_only", pa.int64()), ("matched", pa.int64())])

    def _count(part: pa.Table) -> pa.Table:
        key = np.asarray(part["key"], np.int64)
        side = np.asarray(part["side"], np.int8)
        dk = np.unique(key[side == 0])
        vk = np.unique(key[side == 1])
        m = np.intersect1d(dk, vk, assume_unique=True).size
        return pa.table({
            "one": pa.array([0], pa.int64()),
            "docs_only": pa.array([len(dk) - m], pa.int64()),
            "vecs_only": pa.array([len(vk) - m], pa.int64()),
            "matched": pa.array([m], pa.int64()),
        })

    parts = exchange_map_groups(d.union(v), "part", n_parts, _count,
                                counts_schema)
    out = grouped_sums(parts, ["one"],
                       ["docs_only", "vecs_only", "matched"])
    return out.map_batches(
        lambda t: pa.table({
            "matched": t["sum_matched"],
            "docs_without_vec": t["sum_docs_only"],
            "vecs_without_doc": t["sum_vecs_only"],
        }).cast(COVERAGE_SCHEMA), batch_format="pyarrow")


CENTROID_DIST_SCHEMA = pa.schema([
    ("label_a", pa.int64()), ("label_b", pa.int64()),
    ("dist_sq_e8", pa.int64()),
])


def centroid_distance_matrix(sf_dir: str):
    """Pairwise squared L2 distance between label centroids (1e4-scale
    truncated-integer centroids, so the matrix is exact and
    order-insensitive) — read together with `label_dispersion` this is
    the between/within separability ratio that predicts `knn_label_vote`
    reliability. The heavy lifting is `label_centroids`' one exchange;
    the ≤ labels×dim centroid table is driver-scale by construction, so
    the pair fold is a single numpy pass here."""
    cent = label_centroids(sf_dir).take_all()
    if not cent:
        return CENTROID_DIST_SCHEMA.empty_table()
    labels = sorted({r["label"] for r in cent})
    dims = sorted({r["dim"] for r in cent})
    li = {v: i for i, v in enumerate(labels)}
    di = {v: i for i, v in enumerate(dims)}
    m = np.zeros((len(labels), len(dims)), np.int64)
    for r in cent:
        m[li[r["label"]], di[r["dim"]]] = r["centroid_e4"]
    out_a, out_b, out_d = [], [], []
    for i, a in enumerate(labels):
        for j in range(i + 1, len(labels)):
            d = m[i] - m[j]
            out_a.append(a)
            out_b.append(labels[j])
            out_d.append(int(np.dot(d, d)))
    return pa.table({
        "label_a": pa.array(out_a, pa.int64()),
        "label_b": pa.array(out_b, pa.int64()),
        "dist_sq_e8": pa.array(out_d, pa.int64()),
    }).cast(CENTROID_DIST_SCHEMA)


EMB_VALUE_HIST_SCHEMA = pa.schema([
    ("bucket_e4", pa.int64()),
    ("n_values", pa.int64()),
])

_EVH_SHIFT_E4 = 20_000_000  # divisible by every sane bucket width


def embedding_value_histogram(sf_dir: str, bucket_e4: int = 500):
    """Global histogram of embedding COMPONENT values in
    ``bucket_e4``-wide 1e4-quantized buckets — the value-distribution
    audit (clipping, saturation, dead zero mass) next to
    :func:`embedding_dim_profile`'s per-dimension moments. Bucket =
    floor(e4 / width): negative values shift by +2e7 before the integer
    division so numpy's floor and SQL's truncating ``//`` agree on a
    non-negative operand, then shift back (the ship_delay_histogram
    contract; values below −2e7 raise rather than silently diverge).
    Each block reduces to its distinct buckets before the exchange."""
    from ..stages.agg import grouped_sums

    if _EVH_SHIFT_E4 % bucket_e4:
        raise ValueError("bucket_e4 must divide the shift")

    def _hist(batch: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(batch)
        if mat.size == 0:
            return pa.schema([("bucket_e4", pa.int64()),
                              ("n_values", pa.int64())]).empty_table()
        q = np.round(mat * 1e4).astype(np.int64).ravel()
        if (q < -_EVH_SHIFT_E4).any():
            raise ValueError("embedding value below histogram shift")
        b = (q + _EVH_SHIFT_E4) // bucket_e4 - _EVH_SHIFT_E4 // bucket_e4
        vals, cnts = np.unique(b, return_counts=True)
        return pa.table({
            "bucket_e4": pa.array(vals * bucket_e4, pa.int64()),
            "n_values": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    g = grouped_sums(_read_emb(sf_dir).map_batches(
        _hist, batch_format="pyarrow"), ["bucket_e4"], ["n_values"])
    return g.map_batches(
        lambda t: pa.table({"bucket_e4": t["bucket_e4"],
                            "n_values": t["sum_n_values"]}
                           ).cast(EMB_VALUE_HIST_SCHEMA),
        batch_format="pyarrow")


SSQ_QUANT_SCHEMA = pa.schema([
    ("label", pa.int64()),
    ("q", pa.float64()),
    ("ssq_e8", pa.int64()),
])


def vector_ssq_quantiles_by_label(sf_dir: str,
                                  qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-label exact discrete quantiles of the squared L2 norm in 1e8
    integer units (sum of squared 1e4-quantized components — exact
    int64, the same quantize-first trick that makes
    embedding_neardup_exact knife-edge-stable). The norm spread per
    class is the calibration audit run before cosine thresholds are
    picked per label."""
    from ..stages.agg import grouped_quantiles_disc

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])

    def _ssq(batch: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(batch)
        if mat.size == 0:
            return pa.schema([("label", pa.int64()),
                              ("ssq_e8", pa.int64())]).empty_table()
        q = np.round(mat * 1e4).astype(np.int64)
        ssq = (q * q).sum(axis=1)
        return pa.table({
            "label": pc.cast(batch["label"], pa.int64()),
            "ssq_e8": pa.array(ssq, pa.int64()),
        })

    import ray.data

    tbl = grouped_quantiles_disc(
        ds.map_batches(_ssq, batch_format="pyarrow"),
        "label", "ssq_e8", list(qs))
    return ray.data.from_arrow(pa.table({
        "label": pc.cast(tbl["label"], pa.int64()),
        "q": tbl["q"],
        "ssq_e8": tbl["value"],
    }).cast(SSQ_QUANT_SCHEMA))


DIM_ARGMAX_SCHEMA = pa.schema([
    ("dim", pa.int64()),
    ("n_vectors", pa.int64()),
])


def dim_argmax_histogram(sf_dir: str):
    """Which dimension dominates each vector: per vector the 1-BASED
    index of the maximum ABSOLUTE 1e4-quantized component (first index
    on ties — numpy argmax and SQL list_indexof(l, list_max(l)) agree),
    counted across the corpus. A healthy isotropic embedding spreads
    mass over all dims; a spike here means a dimension is doing all the
    work (batch-norm bugs, projection collapse)."""
    from ..stages.agg import grouped_sums

    def _am(batch: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(batch)
        if mat.size == 0:
            return pa.schema([("dim", pa.int64()),
                              ("n_vectors", pa.int64())]).empty_table()
        q = np.abs(np.round(mat * 1e4).astype(np.int64))
        am = q.argmax(axis=1) + 1
        vals, cnts = np.unique(am, return_counts=True)
        return pa.table({
            "dim": pa.array(vals.astype(np.int64), pa.int64()),
            "n_vectors": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    g = grouped_sums(_read_emb(sf_dir).map_batches(
        _am, batch_format="pyarrow"), ["dim"], ["n_vectors"])
    return g.map_batches(
        lambda t: pa.table({"dim": t["dim"],
                            "n_vectors": t["sum_n_vectors"]}
                           ).cast(DIM_ARGMAX_SCHEMA),
        batch_format="pyarrow")


HOMOPHILY_SCHEMA = pa.schema([
    ("label_a", pa.int64()),
    ("label_b", pa.int64()),
    ("n_pairs", pa.int64()),
])


def neardup_label_homophily(sf_dir: str, threshold_e4: int = 4000):
    """Label structure of the near-duplicate graph: every exact cosine
    pair ≥ threshold (:func:`embedding_neardup_exact`, the quantized
    exact-integer scorer) bucketed by its canonical (min, max) label
    pair — the homophily matrix that says whether near-dups respect
    class boundaries. Labels ride in as one dense broadcast array; the
    cell fold is ≤ |labels|² rows."""
    labels = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "label"]).take_all()
    max_id = max((r["vec_id"] for r in labels), default=-1)
    lab = np.full(max_id + 1, -1, np.int64)
    for r in labels:
        lab[r["vec_id"]] = r["label"]
    lab_ref = ray.put(lab)

    from ..stages.agg import grouped_sums

    def _cells(batch: pa.Table) -> pa.Table:
        l_a = ray.get(lab_ref)
        a = l_a[np.asarray(batch["a"], np.int64)]
        b = l_a[np.asarray(batch["b"], np.int64)]
        return pa.table({
            "label_a": pa.array(np.minimum(a, b), pa.int64()),
            "label_b": pa.array(np.maximum(a, b), pa.int64()),
        })

    pairs = embedding_neardup_exact(sf_dir, threshold_e4=threshold_e4)
    g = grouped_sums(pairs.map_batches(_cells, batch_format="pyarrow"),
                     ["label_a", "label_b"], [], count_as="n_pairs")
    return g.map_batches(lambda t: t.cast(HOMOPHILY_SCHEMA),
                         batch_format="pyarrow")


LABEL_ARGMAX_SCHEMA = pa.schema([
    ("label", pa.int64()),
    ("dim", pa.int64()),
    ("n_vectors", pa.int64()),
])


def label_dim_argmax_matrix(sf_dir: str):
    """Per-LABEL dominant-dimension matrix: the by-class refinement of
    :func:`dim_argmax_histogram` — for each label, how vectors
    distribute over the 1-based index of their maximum absolute
    1e4-quantized component (first index on ties; numpy argmax ==
    SQL ``list_indexof(l, list_max(l))``). A label whose mass
    concentrates on one dim is linearly separable by a single
    coordinate — a leakage/shortcut audit for labeled embeddings.
    Map-only to ≤ labels × dims cells, then one tiny exchange."""
    from ..stages.agg import grouped_sums

    def _am(batch: pa.Table) -> pa.Table:
        lab = np.asarray(
            batch["label"].combine_chunks().cast(pa.int64()), np.int64)
        lst = batch["embedding"].combine_chunks()
        dim = len(lst[0]) if len(lst) else 0
        if dim == 0:
            return LABEL_ARGMAX_SCHEMA.empty_table()
        mat = np.asarray(lst.flatten(), dtype=np.float64).reshape(
            len(lab), dim)
        q = np.abs(np.round(mat * 1e4).astype(np.int64))
        am = q.argmax(axis=1) + 1
        return pa.table({
            "label": pa.array(lab, pa.int64()),
            "dim": pa.array(am.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                            columns=["label", "embedding"]).map_batches(
        _am, batch_format="pyarrow")
    g = grouped_sums(ds, ["label", "dim"], [], count_as="n_vectors")
    return g.map_batches(lambda t: t.cast(LABEL_ARGMAX_SCHEMA),
                         batch_format="pyarrow")


LABEL_SIZE_SCHEMA = pa.schema([
    ("n_vecs", pa.int64()),
    ("n_labels", pa.int64()),
])


def label_size_histogram(sf_dir: str):
    """Class-balance shape of the embedding corpus: per-label vector
    counts contracted to a (n_vecs → n_labels) histogram — the one
    table that shows imbalance at a glance (a lone giant label starves
    IVF list pruning; a long tail of singleton labels makes the k-NN
    vote noisy). Only the label column leaves storage; two cell folds,
    nothing else shuffles."""
    from ..sources.tables import read_parquet_clean
    from ..stages.agg import grouped_sums

    per = grouped_sums(
        read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                           columns=["label"]).map_batches(
            lambda t: pa.table({"label": pc.cast(t["label"],
                                                 pa.int64())}),
            batch_format="pyarrow"),
        ["label"], [], count_as="n_vecs")
    g = grouped_sums(
        per.map_batches(lambda t: pa.table({"n_vecs": t["n_vecs"]}),
                        batch_format="pyarrow"),
        ["n_vecs"], [], count_as="n_labels")
    return g.map_batches(lambda t: t.cast(LABEL_SIZE_SCHEMA),
                         batch_format="pyarrow")


DIM_SIGN_SCHEMA = pa.schema([
    ("dim", pa.int64()),
    ("n_neg", pa.int64()),
    ("n_zero", pa.int64()),
    ("n_pos", pa.int64()),
    ("sum_abs_e4", pa.int64()),
])


def embedding_dim_sign_census(sf_dir: str):
    """Per-dimension sign balance of the embedding column: negative /
    zero / positive counts plus the absolute 1e4-quantized mass — the
    bias audit `embedding_dim_profile`'s sum hides (a dim whose mean is
    ~0 can still be 90/10 sign-skewed, and a dead ReLU-style dim shows
    as all-zero here before it shows anywhere else). Signs are decided
    on the SAME e4 integers both engines compute, so boundary values
    land identically. One pruned scan; each block reduces to d partial
    rows; one d-row fold."""
    from ..stages.agg import grouped_sums

    part_schema = pa.schema([
        ("dim", pa.int64()), ("n_neg", pa.int64()),
        ("n_zero", pa.int64()), ("n_pos", pa.int64()),
        ("sum_abs_e4", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        _, mat = _emb_matrix(batch)
        if mat.size == 0:
            return part_schema.empty_table()
        q = np.round(mat * 1e4)           # exact integers in float64
        d = mat.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "n_neg": pa.array((q < 0).sum(axis=0).astype(np.int64)),
            "n_zero": pa.array((q == 0).sum(axis=0).astype(np.int64)),
            "n_pos": pa.array((q > 0).sum(axis=0).astype(np.int64)),
            "sum_abs_e4": pa.array(np.abs(q).sum(axis=0)
                                   .astype(np.int64)),
        })

    g = grouped_sums(
        _read_emb(sf_dir).map_batches(_partial, batch_format="pyarrow"),
        ["dim"], ["n_neg", "n_zero", "n_pos", "sum_abs_e4"])
    return g.map_batches(
        lambda t: pa.table({
            "dim": t["dim"], "n_neg": t["sum_n_neg"],
            "n_zero": t["sum_n_zero"], "n_pos": t["sum_n_pos"],
            "sum_abs_e4": t["sum_sum_abs_e4"],
        }).cast(DIM_SIGN_SCHEMA), batch_format="pyarrow")


NORM_BAND_SCHEMA = pa.schema([
    ("label", pa.int64()),
    ("band", pa.string()),
    ("n_vecs", pa.int64()),
])


def embedding_norm_band_census(sf_dir: str):
    """Degenerate-vector detector per label: vectors banded by their
    EXACT e8 squared norm (Σ round(e·1e4)² — integers, so the band
    edges land identically on both engines) into near_zero
    (‖v‖ < 0.5), normal, and large (‖v‖ ≥ 2) — collapsed or exploded
    embeddings poison cosine math silently, and per-label counts show
    WHICH class's encoder run went bad. Map-only over the pruned scan
    (one matmul-free numpy pass per block); ≤ labels × 3 cells fold."""
    from ..sources.tables import read_parquet_clean
    from ..stages.agg import grouped_sums

    bands = np.array(["near_zero", "normal", "large"], dtype=object)

    def _prep(batch: pa.Table) -> pa.Table:
        lst = batch["embedding"].combine_chunks()
        n = len(lst)
        dim = len(lst[0]) if n else 0
        mat = np.asarray(lst.flatten(), np.float64).reshape(n, dim)
        q = np.round(mat * 1e4)
        ssq = (q * q).sum(axis=1).astype(np.int64)
        band = np.where(ssq < 25_000_000, 0,
                        np.where(ssq < 400_000_000, 1, 2))
        return pa.table({
            "label": pc.cast(batch["label"], pa.int64()),
            "band": pa.array(bands[band], pa.string()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/embeddings.parquet",
                           columns=["label", "embedding"]).map_batches(
            _prep, batch_format="pyarrow"),
        ["label", "band"], [], count_as="n_vecs")
    return g.map_batches(lambda t: t.cast(NORM_BAND_SCHEMA),
                         batch_format="pyarrow")

"""Verify stage: candidate pairs → true sketch similarity, thresholded.

The row-pair kernel implements the reference's pairwise-compare harness
semantics (``/root/reference/src/sourmash/sketchcomparison.py:11-256``):
Jaccard per ``minhash.rs:624-631`` (scaled estimator, or the combined
bottom-k estimator in num mode, ``minhash.rs:593-621``) plus both raw
containments |A∩B|/|A| (``minhash.py:819-841`` without the bias factor, so
values are exactly reproducible by the oracle and by SQL).

Join strategy (SURVEY.md §7.4 "verify join" row): within the broadcast
budget the sorted sketch-blob arrays ride the object store once and pair
batches gather both sides with vectorized searchsorted (no shuffle);
beyond it, two distributed hash joins partitioned by conv_id. Arrow's
Acero join cannot carry ``list<uint64>`` payload columns, so the sorted
``mins`` ride along as a little-endian ``binary`` blob — a zero-copy
reinterpretation of the list values buffer, 8 bytes per hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import (
    EngineConfig,
    DEFAULT_CONFIG,
    clamped_join_partitions,
)

VERIFIED_SCHEMA = pa.schema([
    ("a", pa.string()),
    ("b", pa.string()),
    ("jaccard", pa.float64()),
    ("containment_ab", pa.float64()),
    ("containment_ba", pa.float64()),
])


def _st_join(left: pa.Table, right: pa.Table, keys, right_keys,
             join_type: str = "inner") -> pa.Table:
    """Single-threaded Acero join for use INSIDE Ray tasks."""
    return left.join(right, keys=keys, right_keys=right_keys,
                     join_type=join_type, use_threads=False)


def mins_to_blob(batch: pa.Table) -> pa.Table:
    """(conv_id, mins: list<u64>) → (conv_id, blob: binary), zero-copy."""
    lst = batch["mins"].combine_chunks()
    offs = np.asarray(lst.offsets, dtype=np.int32)
    values = np.asarray(lst.flatten(), dtype=np.uint64)
    data = values.view(np.uint8)
    blob = pa.Array.from_buffers(
        pa.binary(), batch.num_rows,
        [None, pa.py_buffer((offs * 8).astype(np.int32)), pa.py_buffer(data)])
    return pa.table({"conv_id": batch["conv_id"], "blob": blob})




def _common_width(keys: np.ndarray, ref: np.ndarray):
    """Cast both fixed-width byte arrays to their max width (padding only —
    never truncation, which would alias distinct long keys)."""
    w = max(keys.dtype.itemsize, ref.dtype.itemsize, 1)
    dt = f"S{w}"
    return keys.astype(dt), ref.astype(dt)


def _blob_views(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    arr = col.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    offs = offs[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    buf = arr.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8) if buf is not None
            else np.empty(0, np.uint8))
    return offs, data


class PairScorer:
    """map_batches kernel over joined pair rows (blob_a, blob_b).

    ``metric``: "jaccard" (default) or "max_containment" — the latter keeps
    prefix/subset duplicates whose Jaccard is diluted by length difference
    (``minhash.py:881-905`` max_containment semantics)."""

    def __init__(self, num: int, threshold: float,
                 metric: str = "jaccard"):
        self.num = num
        self.threshold = threshold
        self.metric = metric

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ja = np.empty(n, np.float64)
        cab = np.empty(n, np.float64)
        cba = np.empty(n, np.float64)
        oa, da = _blob_views(batch["blob_a"])
        ob, db = _blob_views(batch["blob_b"])
        ua = da.view(np.uint64)
        ub = db.view(np.uint64)
        for i in range(n):
            a = ua[oa[i] // 8: oa[i + 1] // 8]
            b = ub[ob[i] // 8: ob[i + 1] // 8]
            common = np.intersect1d(a, b, assume_unique=True)
            c = common.size
            if self.num:
                combined = np.union1d(a, b)[: self.num]
                c = np.intersect1d(common, combined, assume_unique=True).size
                denom = combined.size
            else:
                denom = a.size + b.size - c
            ja[i] = c / max(1, denom)
            cab[i] = common.size / max(1, a.size)
            cba[i] = common.size / max(1, b.size)
        out = pa.table({
            "a": batch["a"],
            "b": batch["b"],
            "jaccard": pa.array(ja, pa.float64()),
            "containment_ab": pa.array(cab, pa.float64()),
            "containment_ba": pa.array(cba, pa.float64()),
        })
        score = (np.maximum(cab, cba) if self.metric == "max_containment"
                 else ja)
        return out.filter(pa.array(score >= self.threshold))


import ray as _ray


@_ray.remote
def _build_sorted_broadcast(*blocks):
    """(sorted S32 id array, blob offsets, blob bytes) for the broadcast
    verify path — built off-driver, returned into the object store."""
    tables = [t for t in blocks if t.num_rows]
    tbl = pa.concat_tables(tables).combine_chunks()
    # dynamic fixed width: S-dtype silently TRUNCATES beyond its width,
    # which would collide distinct long ids — size to the longest id
    ids = np.array(tbl["conv_id"].to_pylist(), dtype=bytes)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    sorted_tbl = tbl.take(pa.array(order, pa.int64()))
    offs, data = _blob_views(sorted_tbl["blob"])
    return ids, offs, data.copy()


def verify_pairs(pairs, sigs, cfg: EngineConfig = DEFAULT_CONFIG,
                 threshold: float | None = None,
                 metric: str = "jaccard"):
    """candidate pairs + signatures → verified pair Dataset
    (a, b, jaccard, containment_ab, containment_ba), score ≥ threshold
    where score is ``metric`` (jaccard or max_containment)."""
    import ray
    import ray.data

    thr = cfg.verify_threshold if threshold is None else threshold
    pairs = pairs.materialize()
    npairs = pairs.count()
    if npairs == 0:
        return ray.data.from_arrow(VERIFIED_SCHEMA.empty_table())
    blobs = sigs.select_columns(["conv_id", "mins"]).map_batches(
        mins_to_blob, batch_format="pyarrow")

    # size estimate from the (already materialized) signatures dataset —
    # an overestimate of the blob bytes, so the broadcast decision stays
    # conservative without a blobs materialize barrier
    if sigs.size_bytes() <= cfg.exec.broadcast_bytes_limit:
        # broadcast fast path: the SORTED sketch-blob arrays ride the object
        # store once and each pair batch gathers both sides with vectorized
        # searchsorted — no shuffle, no per-task hash build (an Acero join
        # here spent ~0.7s/task rebuilding a hash table of the whole
        # collection). Keys are fixed-width S32 byte arrays (C memcmp sort,
        # no Python-string driver work); the whole build runs in ONE remote
        # task so the driver never touches the blob bytes. The hash-shuffle
        # join below is the scale path past the broadcast budget.
        blob_refs = blobs.to_arrow_refs()
        if not blob_refs:
            return ray.data.from_arrow(VERIFIED_SCHEMA.empty_table())
        ref = _build_sorted_broadcast.remote(*blob_refs)
        num, vthr = cfg.sketch.num, thr
        vmetric = metric

        def broadcast_score(batch: pa.Table) -> pa.Table:
            ids_s, offs_s, data_s = ray.get(ref)
            u = data_s.view(np.uint64)
            a_np, ids_w = _common_width(
                np.array(batch["a"].to_pylist(), dtype=bytes), ids_s)
            b_np, _ = _common_width(
                np.array(batch["b"].to_pylist(), dtype=bytes), ids_s)
            ia = np.searchsorted(ids_w, a_np)
            ib = np.searchsorted(ids_w, b_np)
            n = batch.num_rows
            ja = np.empty(n, np.float64)
            cab = np.empty(n, np.float64)
            cba = np.empty(n, np.float64)
            for i in range(n):
                p, q = ia[i], ib[i]
                a = u[offs_s[p] // 8: offs_s[p + 1] // 8]
                b = u[offs_s[q] // 8: offs_s[q + 1] // 8]
                common = np.intersect1d(a, b, assume_unique=True)
                c = common.size
                if num:
                    combined = np.union1d(a, b)[:num]
                    c = np.intersect1d(common, combined,
                                       assume_unique=True).size
                    denom = combined.size
                else:
                    denom = a.size + b.size - c
                ja[i] = c / max(1, denom)
                cab[i] = common.size / max(1, a.size)
                cba[i] = common.size / max(1, b.size)
            out = pa.table({
                "a": batch["a"],
                "b": batch["b"],
                "jaccard": pa.array(ja, pa.float64()),
                "containment_ab": pa.array(cab, pa.float64()),
                "containment_ba": pa.array(cba, pa.float64()),
            })
            score = (np.maximum(cab, cba)
                     if vmetric == "max_containment" else ja)
            return out.filter(pa.array(score >= vthr))

        return pairs.map_batches(
            broadcast_score,
            batch_format="pyarrow",
            batch_size=cfg.exec.verify_batch_size,
        )

    nparts = clamped_join_partitions(cfg, npairs, sigs.count())
    blobs = blobs.materialize()
    with_a = pairs.join(
        blobs, join_type="inner", num_partitions=nparts,
        on=("a",), right_on=("conv_id",),
    ).rename_columns({"blob": "blob_a"})
    with_ab = with_a.join(
        blobs, join_type="inner", num_partitions=nparts,
        on=("b",), right_on=("conv_id",),
    ).rename_columns({"blob": "blob_b"})
    scorer = PairScorer(cfg.sketch.num, thr, metric)
    return with_ab.map_batches(
        lambda t: scorer(t),
        batch_format="pyarrow",
        batch_size=cfg.exec.verify_batch_size,
    )


# ---------------------------------------------------------------------------
# abundance-weighted (angular) similarity — the reference's similarity()
# dispatch when both sketches track abundance (minhash.rs:635-702)
# ---------------------------------------------------------------------------

ANGULAR_SCHEMA = pa.schema([
    ("a", pa.string()),
    ("b", pa.string()),
    ("similarity", pa.float64()),
])


def _sig_blobs_ab(batch: pa.Table) -> pa.Table:
    """(conv_id, mins blob, abunds blob) — abunds share mins' offsets."""
    out = mins_to_blob(batch)
    ab = batch["abunds"].combine_chunks()
    offs = np.asarray(ab.offsets, dtype=np.int32)
    vals = np.asarray(ab.flatten(), dtype=np.uint64)
    ablob = pa.Array.from_buffers(
        pa.binary(), batch.num_rows,
        [None, pa.py_buffer((offs * 8).astype(np.int32)),
         pa.py_buffer(vals.view(np.uint8))])
    return out.append_column("ablob", ablob)


@_ray.remote
def _build_sorted_broadcast_ab(*blocks):
    tables = [t for t in blocks if t.num_rows]
    tbl = pa.concat_tables(tables).combine_chunks()
    ids = np.array(tbl["conv_id"].to_pylist(), dtype=bytes)
    order = np.argsort(ids, kind="stable")
    sorted_tbl = tbl.take(pa.array(order, pa.int64()))
    offs, data = _blob_views(sorted_tbl["blob"])
    _, adata = _blob_views(sorted_tbl["ablob"])
    return ids[order], offs, data.copy(), adata.copy()


def angular_pairs(pairs, sigs, cfg: EngineConfig = DEFAULT_CONFIG,
                  threshold: float = 0.5):
    """candidate pairs → (a, b, similarity) with the abundance-cosine
    angular similarity ``1 - 2·acos(cos)/π`` (``minhash.rs:635-680``),
    thresholded. Requires abundance-tracked sketches."""
    import math

    import ray
    import ray.data

    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(ANGULAR_SCHEMA.empty_table())
    blobs = sigs.select_columns(["conv_id", "mins", "abunds"]).map_batches(
        _sig_blobs_ab, batch_format="pyarrow").materialize()
    refs = blobs.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(ANGULAR_SCHEMA.empty_table())
    ref = _build_sorted_broadcast_ab.remote(*refs)

    def _score(batch: pa.Table) -> pa.Table:
        ids_s, offs_s, data_s, adata_s = ray.get(ref)
        u = data_s.view(np.uint64)
        av = adata_s.view(np.uint64)
        a_np, ids_w = _common_width(
            np.array(batch["a"].to_pylist(), dtype=bytes), ids_s)
        b_np, _ = _common_width(
            np.array(batch["b"].to_pylist(), dtype=bytes), ids_s)
        ia = np.searchsorted(ids_w, a_np)
        ib = np.searchsorted(ids_w, b_np)
        n = batch.num_rows
        sim = np.zeros(n, np.float64)
        for i in range(n):
            p, q = ia[i], ib[i]
            sa, ea = offs_s[p] // 8, offs_s[p + 1] // 8
            sb, eb = offs_s[q] // 8, offs_s[q + 1] // 8
            ma, mb = u[sa:ea], u[sb:eb]
            aa, ab = av[sa:ea].astype(np.float64), av[sb:eb].astype(np.float64)
            _, ja_idx, jb_idx = np.intersect1d(
                ma, mb, assume_unique=True, return_indices=True)
            prod = float(np.dot(aa[ja_idx], ab[jb_idx]))
            na = math.sqrt(float(np.dot(aa, aa)))
            nb = math.sqrt(float(np.dot(ab, ab)))
            if na == 0.0 or nb == 0.0:
                continue
            cos = min(prod / (na * nb), 1.0)
            sim[i] = 1.0 - (2.0 * math.acos(cos) / math.pi)
        out = pa.table({
            "a": batch["a"], "b": batch["b"],
            "similarity": pa.array(sim, pa.float64()),
        })
        return out.filter(pa.array(sim >= threshold))

    return pairs.map_batches(_score, batch_format="pyarrow",
                             batch_size=cfg.exec.verify_batch_size)

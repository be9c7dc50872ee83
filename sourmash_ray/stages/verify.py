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
beyond it, a two-exchange co-group partitioned by id hash then pair hash
(no ``Dataset.join`` anywhere in the flagship). The sorted ``mins`` ride
as a little-endian ``binary`` blob — a zero-copy reinterpretation of the
list values buffer, 8 bytes per hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, DEFAULT_CONFIG

VERIFIED_SCHEMA = pa.schema([
    ("a", pa.string()),
    ("b", pa.string()),
    ("jaccard", pa.float64()),
    ("containment_ab", pa.float64()),
    ("containment_ba", pa.float64()),
])


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

    return _verify_pairs_exchange(pairs, blobs, cfg, thr, metric)


# ---------------------------------------------------------------------------
# beyond-broadcast scale path: two-exchange co-group (no Dataset.join)
# ---------------------------------------------------------------------------

_COGROUP_SCHEMA = pa.schema([
    ("key", pa.int64()),        # id-hash of the lookup conv_id
    ("a", pa.string()),
    ("b", pa.string()),
    ("side", pa.int8()),        # 0 = slot for a, 1 = slot for b, 2 = blob
    ("conv_id", pa.string()),
    ("blob", pa.binary()),
])

_SLOTTED_SCHEMA = pa.schema([
    ("pair_part", pa.int64()),
    ("a", pa.string()),
    ("b", pa.string()),
    ("side", pa.int8()),
    ("blob", pa.binary()),
])


def _id_hash64(ids: list[str]) -> np.ndarray:
    """64-bit partitioning hash of string ids (crc32 pair — deterministic
    across processes; collisions only co-locate, never mis-match)."""
    import zlib

    out = np.empty(len(ids), np.int64)
    for i, s in enumerate(ids):
        b = s.encode()
        out[i] = ((zlib.crc32(b) << 31) ^ zlib.crc32(b[::-1])) & 0x7FFFFFFFFFFFFFFF
    return out


def _verify_pairs_exchange(pairs, blobs, cfg: EngineConfig, thr: float,
                           metric: str):
    """The scale path: signatures too big to broadcast.

    Exchange 1 (key = id-hash of the looked-up conv_id): pair SLOT rows
    (one per side) meet the blob rows of the same conversations in one
    partition; a vectorized searchsorted attach emits (pair, side, blob).
    Exchange 2 (key = pair hash): the two sides of each pair meet; the
    reduce builds (a, b, blob_a, blob_b) and scores in place. No
    ``Dataset.join`` — Ray 2.49's hash-shuffle join partitions rows with a
    per-row Python ``hash()`` loop and breaks on empty partitions.
    """
    from ..config import resolve_num_partitions
    from .exchange import exchange_map_groups

    n_parts = 2 * resolve_num_partitions(cfg)

    def _pair_slots(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        n = len(a)
        keys = np.concatenate([_id_hash64(a), _id_hash64(b)])
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "a": pa.array(a + a, pa.string()),
            "b": pa.array(b + b, pa.string()),
            "side": pa.array([0] * n + [1] * n, pa.int8()),
            "conv_id": pa.nulls(2 * n, pa.string()),
            "blob": pa.nulls(2 * n, pa.binary()),
        }).cast(_COGROUP_SCHEMA)

    def _blob_rows(batch: pa.Table) -> pa.Table:
        ids = batch["conv_id"].to_pylist()
        n = len(ids)
        return pa.table({
            "key": pa.array(_id_hash64(ids), pa.int64()),
            "a": pa.nulls(n, pa.string()),
            "b": pa.nulls(n, pa.string()),
            "side": pa.array([2] * n, pa.int8()),
            "conv_id": batch["conv_id"],
            "blob": batch["blob"],
        }).cast(_COGROUP_SCHEMA)

    slots = pairs.map_batches(_pair_slots, batch_format="pyarrow")
    brows = blobs.map_batches(_blob_rows, batch_format="pyarrow")
    both = slots.union(brows)
    group_parts = cfg.exec.group_parts

    def _attach(part: pa.Table) -> pa.Table:
        import zlib

        side = np.asarray(part["side"], dtype=np.int8)
        is_blob = side == 2
        blob_tbl = part.filter(pa.array(is_blob))
        slot_tbl = part.filter(pa.array(~is_blob))
        if slot_tbl.num_rows == 0 or blob_tbl.num_rows == 0:
            return _SLOTTED_SCHEMA.empty_table()
        ids = np.array(blob_tbl["conv_id"].to_pylist(), dtype=bytes)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        blob_sorted = blob_tbl["blob"].combine_chunks().take(
            pa.array(order, pa.int64()))
        a = slot_tbl["a"].to_pylist()
        b = slot_tbl["b"].to_pylist()
        s_side = np.asarray(slot_tbl["side"], dtype=np.int8)
        lookup = [x if sd == 0 else y
                  for x, y, sd in zip(a, b, s_side.tolist())]
        keys = np.array(lookup, dtype=bytes)
        w = max(keys.dtype.itemsize, ids.dtype.itemsize, 1)
        keys = keys.astype(f"S{w}")  # pad-only (never truncate)
        ids_w = ids.astype(f"S{w}")
        pos = np.searchsorted(ids_w, keys)
        pos_c = np.minimum(pos, max(len(ids_w) - 1, 0))
        hit = ids_w[pos_c] == keys
        keep = np.flatnonzero(hit)
        pp = np.fromiter(
            ((zlib.crc32(a[i].encode()) * 31 + zlib.crc32(b[i].encode()))
             % group_parts for i in keep.tolist()),
            dtype=np.int64, count=keep.size)
        return pa.table({
            "pair_part": pa.array(pp, pa.int64()),
            "a": slot_tbl["a"].take(pa.array(keep, pa.int64())),
            "b": slot_tbl["b"].take(pa.array(keep, pa.int64())),
            "side": slot_tbl["side"].take(pa.array(keep, pa.int64())),
            "blob": blob_sorted.take(pa.array(pos_c[keep], pa.int64())),
        }).cast(_SLOTTED_SCHEMA)

    slotted = exchange_map_groups(both, "key", n_parts, _attach,
                                  _SLOTTED_SCHEMA)
    scorer = PairScorer(cfg.sketch.num, thr, metric)

    def _pair_up(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return VERIFIED_SCHEMA.empty_table()
        part = part.sort_by([("a", "ascending"), ("b", "ascending"),
                             ("side", "ascending")])
        a = np.array(part["a"].to_pylist(), dtype=bytes)
        b = np.array(part["b"].to_pylist(), dtype=bytes)
        side = np.asarray(part["side"], dtype=np.int8)
        # dedupe (a, b, side): duplicate candidate pairs (distinct=False
        # upstream) would otherwise mis-pair side0 with side0
        uniq = np.ones(len(a), bool)
        if len(a) > 1:
            uniq[1:] = ~((a[1:] == a[:-1]) & (b[1:] == b[:-1])
                         & (side[1:] == side[:-1]))
        sel = pa.array(np.flatnonzero(uniq), pa.int64())
        part = part.take(sel)
        a, b = a[uniq], b[uniq]
        side = side[uniq]
        # rows come in (side0, side1) runs per pair; keep complete pairs
        same_next = np.zeros(len(a), bool)
        if len(a) > 1:
            same_next[:-1] = (a[1:] == a[:-1]) & (b[1:] == b[:-1])
        first = same_next & (side == 0)
        i0 = np.flatnonzero(first)
        i1 = i0 + 1
        if i0.size == 0:
            return VERIFIED_SCHEMA.empty_table()
        joined = pa.table({
            "a": part["a"].take(pa.array(i0, pa.int64())),
            "b": part["b"].take(pa.array(i0, pa.int64())),
            "blob_a": part["blob"].take(pa.array(i0, pa.int64())),
            "blob_b": part["blob"].take(pa.array(i1, pa.int64())),
        })
        return scorer(joined)

    return exchange_map_groups(slotted, "pair_part", n_parts, _pair_up,
                               VERIFIED_SCHEMA)


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

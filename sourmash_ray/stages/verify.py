"""Verify stage: candidate pairs → true pairwise similarity, thresholded.

The pair kernels implement the reference's pairwise-compare harness
semantics (``/root/reference/src/sourmash/sketchcomparison.py:11-256``):
Jaccard per ``minhash.rs:624-631`` (scaled estimator, or the combined
bottom-k estimator in num mode, ``minhash.rs:593-621``) plus both raw
containments |A∩B|/|A| (``minhash.py:819-841`` without the bias factor, so
values are exactly reproducible by the oracle and by SQL), and the
abundance-weighted angular similarity (``minhash.rs:635-680``).

Scoring is FULLY vectorized — one :func:`pair_jaccard_stats` /
:func:`pair_dot_stats` call per batch (``functions/segscore.py``), no
per-pair Python loop anywhere.

Join strategy (SURVEY.md §7.4 "verify join" row), shared by every scorer
through :func:`score_pairs`: within the broadcast budget the sorted
sketch-blob arrays ride the object store once and pair batches gather both
sides with vectorized searchsorted (no shuffle); beyond it, a two-exchange
co-group partitioned by id hash then pair hash (no ``Dataset.join``
anywhere in the flagship). Pairs whose id is missing from the blob table
are dropped on BOTH paths (identical semantics). The sorted ``mins`` ride
as a little-endian ``binary`` blob — a zero-copy reinterpretation of the
list values buffer, 8 bytes per hash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray as _ray

from ..config import EngineConfig, DEFAULT_CONFIG
from ..functions.segscore import (
    _to_bytes_array,
    hash_strings64,
    pair_dot_stats,
    pair_jaccard_stats,
)

VERIFIED_SCHEMA = pa.schema([
    ("a", pa.string()),
    ("b", pa.string()),
    ("jaccard", pa.float64()),
    ("containment_ab", pa.float64()),
    ("containment_ba", pa.float64()),
])

ANGULAR_SCHEMA = pa.schema([
    ("a", pa.string()),
    ("b", pa.string()),
    ("similarity", pa.float64()),
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


def sig_blobs_packed(batch: pa.Table) -> pa.Table:
    """(conv_id, mins, abunds) → (conv_id, blob) where blob = the mins
    bytes followed by the abunds bytes (equal halves — the two lists share
    offsets), for scorers that need weights (angular)."""
    lst = batch["mins"].combine_chunks()
    ab = batch["abunds"].combine_chunks()
    offs = np.asarray(lst.offsets, dtype=np.int64)
    mins = np.asarray(lst.flatten(), dtype=np.uint64)
    abunds = np.asarray(ab.flatten(), dtype=np.uint64)
    lens = np.diff(offs)
    n = batch.num_rows
    out = np.empty(2 * mins.size, np.uint64)
    # interleave per row: [mins_row, abunds_row]
    dst_off = np.concatenate([[0], np.cumsum(2 * lens)])
    idx = np.repeat(dst_off[:-1], lens) + _local(lens)
    out[idx] = mins
    out[idx + np.repeat(lens, lens)] = abunds
    blob = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer((dst_off * 8).astype(np.int32)),
         pa.py_buffer(out.view(np.uint8))])
    return pa.table({"conv_id": batch["conv_id"], "blob": blob})


from ..functions.segscore import _local_idx as _local  # shared helper


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


# ---------------------------------------------------------------------------
# scorers: vectorized kernels over gathered per-pair byte segments
# ---------------------------------------------------------------------------


class _SegmentScorer:
    """Base: subclasses implement :meth:`score` over contiguous per-pair
    byte segments; ``__call__`` adapts a joined (a, b, blob_a, blob_b)
    batch (the exchange path / direct kernel use in tests)."""

    out_schema: pa.Schema

    def score(self, a_ids, b_ids, oa, da, ob, db) -> pa.Table:
        raise NotImplementedError

    def __call__(self, batch: pa.Table) -> pa.Table:
        oa, da = _blob_views(batch["blob_a"])
        ob, db = _blob_views(batch["blob_b"])
        return self.score(batch["a"], batch["b"], oa, da, ob, db)


class PairScorer(_SegmentScorer):
    """Jaccard + containments over sorted-u64 mins blobs.

    ``metric``: "jaccard" (default) or "max_containment" — the latter keeps
    prefix/subset duplicates whose Jaccard is diluted by length difference
    (``minhash.py:881-905`` max_containment semantics)."""

    out_schema = VERIFIED_SCHEMA

    def __init__(self, num: int, threshold: float,
                 metric: str = "jaccard"):
        self.num = num
        self.threshold = threshold
        self.metric = metric

    def score(self, a_ids, b_ids, oa, da, ob, db) -> pa.Table:
        ua = da.view(np.uint64)
        ub = db.view(np.uint64)
        ao = oa // 8
        bo = ob // 8
        c, cj, dj = pair_jaccard_stats(ua, ao, ub, bo, self.num)
        la = np.maximum(np.diff(ao), 1)
        lb = np.maximum(np.diff(bo), 1)
        ja = cj / np.maximum(dj, 1)
        cab = c / la
        cba = c / lb
        out = pa.table({
            "a": a_ids,
            "b": b_ids,
            "jaccard": pa.array(ja, pa.float64()),
            "containment_ab": pa.array(cab, pa.float64()),
            "containment_ba": pa.array(cba, pa.float64()),
        })
        score = (np.maximum(cab, cba) if self.metric == "max_containment"
                 else ja)
        return out.filter(pa.array(score >= self.threshold))


class AngularScorer(_SegmentScorer):
    """Abundance-cosine angular similarity ``1 - 2·acos(cos)/π``
    (``minhash.rs:635-680``) over packed mins||abunds blobs
    (:func:`sig_blobs_packed`)."""

    out_schema = ANGULAR_SCHEMA

    def __init__(self, threshold: float):
        self.threshold = threshold

    def score(self, a_ids, b_ids, oa, da, ob, db) -> pa.Table:
        ua = da.view(np.uint64)
        ub = db.view(np.uint64)
        # split packed halves: per pair, first half mins, second abunds
        ao = oa // 8
        bo = ob // 8
        ha = np.diff(ao) // 2
        hb = np.diff(bo) // 2
        ia = np.repeat(ao[:-1], ha) + _local(ha)
        ib = np.repeat(bo[:-1], hb) + _local(hb)
        a_m, a_w = ua[ia], ua[ia + np.repeat(ha, ha)].astype(np.float64)
        b_m, b_w = ub[ib], ub[ib + np.repeat(hb, hb)].astype(np.float64)
        a_off = np.concatenate([[0], np.cumsum(ha)])
        b_off = np.concatenate([[0], np.cumsum(hb)])
        dot, na2, nb2 = pair_dot_stats(a_m, a_off, a_w, b_m, b_off, b_w)
        denom = np.sqrt(na2) * np.sqrt(nb2)
        cos = np.minimum(np.divide(dot, denom, out=np.zeros_like(dot),
                                   where=denom > 0), 1.0)
        sim = np.where(denom > 0, 1.0 - (2.0 * np.arccos(cos) / np.pi), 0.0)
        out = pa.table({
            "a": a_ids, "b": b_ids,
            "similarity": pa.array(sim, pa.float64()),
        })
        return out.filter(pa.array(sim >= self.threshold))


COSINE_SCHEMA = pa.schema([
    ("a", pa.string()),
    ("b", pa.string()),
    ("cosine", pa.float64()),
])


class CosineScorer(_SegmentScorer):
    """Exact cosine over float64-vector blobs (embedding near-dup verify).
    ``round_to`` decimal rounding keeps the DuckDB oracle hash-exact."""

    out_schema = COSINE_SCHEMA

    def __init__(self, threshold: float, round_to: int = 4):
        self.threshold = threshold
        self.round_to = round_to

    def score(self, a_ids, b_ids, oa, da, ob, db) -> pa.Table:
        n = len(oa) - 1
        fa = da.view(np.float64)
        fb = db.view(np.float64)
        la = np.diff(oa // 8)
        d = int(la[0]) if n else 0
        va = fa[np.repeat(oa[:-1] // 8, la) + _local(la)].reshape(n, d)
        lb = np.diff(ob // 8)
        vb = fb[np.repeat(ob[:-1] // 8, lb) + _local(lb)].reshape(n, d)
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = np.einsum("ij,ij->i", va, vb) / (na * nb)
        out = pa.table({
            "a": a_ids, "b": b_ids,
            "cosine": pa.array(np.round(cos, self.round_to), pa.float64()),
        })
        return out.filter(pa.array(cos >= self.threshold))


# ---------------------------------------------------------------------------
# generic pair-scoring driver: broadcast fast path + exchange scale path
# ---------------------------------------------------------------------------


@_ray.remote
def _build_sorted_broadcast(*blocks):
    """(sorted S-width id array, blob offsets, blob bytes) for the broadcast
    path — built off-driver, returned into the object store."""
    tables = [t for t in blocks if t.num_rows]
    tbl = pa.concat_tables(tables).combine_chunks()
    # dynamic fixed width: S-dtype silently TRUNCATES beyond its width,
    # which would collide distinct long ids — size to the longest id
    ids = _to_bytes_array(tbl["conv_id"])
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    sorted_tbl = tbl.take(pa.array(order, pa.int64()))
    offs, data = _blob_views(sorted_tbl["blob"])
    return ids, offs, data.copy()


def _scratch_buf(key: str, size: int, dtype=np.uint8) -> np.ndarray:
    """Per-worker-process reusable buffer — delegates to the shared
    work pool (``segscore._wk``: size-grown, dtype-checked)."""
    from ..functions.segscore import _wk

    return _wk(f"verify:{key}", size, dtype)


def _gather_segments(offs_s, data_s, pos: np.ndarray, key: str = "g"):
    """Contiguous (byte_offsets, bytes) of the segments at sorted positions
    ``pos``, copied into the reused scratch buffer.

    A per-pair memcpy loop (~1-2 µs each) beats the fully-vectorized
    ``np.repeat``+fancy-index formulation here: that builds two fresh
    index arrays plus the output (3× the segment bytes in NEW allocations
    per batch), all paid at page-fault speed, while this writes the bytes
    once into warm memory."""
    starts = offs_s[pos]
    lens = offs_s[pos + 1] - starts
    out_offs = np.empty(len(pos) + 1, np.int64)
    out_offs[0] = 0
    np.cumsum(lens, out=out_offs[1:])
    out = _scratch_buf(key, int(out_offs[-1]), data_s.dtype)
    for i in range(len(pos)):
        o = out_offs[i]
        s = starts[i]
        out[o:o + lens[i]] = data_s[s:s + lens[i]]
    return out_offs, out


def score_pairs(pairs, blobs, cfg: EngineConfig, scorer: _SegmentScorer,
                size_hint_bytes: int | None = None,
                batch_size: int | None = None):
    """Candidate pairs (a, b) + blob table (conv_id, blob) → scored pair
    Dataset per ``scorer``. Chooses broadcast vs exchange co-group by the
    blob size; pairs referencing a missing conv_id are dropped on both
    paths. ``batch_size`` overrides the broadcast-path pairs-per-task
    (small for expensive per-pair scorers like LCS)."""
    import ray
    import ray.data

    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(scorer.out_schema.empty_table())
    if size_hint_bytes is None:
        size_hint_bytes = blobs.size_bytes() or 0
    if size_hint_bytes <= cfg.exec.broadcast_bytes_limit:
        # broadcast fast path: the SORTED blob arrays ride the object store
        # once and each pair batch gathers both sides with vectorized
        # searchsorted — no shuffle, no per-task hash build (an Acero join
        # here spent ~0.7s/task rebuilding a hash table of the whole
        # collection). Keys are fixed-width byte arrays (C memcmp sort, no
        # Python-string driver work); the whole build runs in ONE remote
        # task so the driver never touches the blob bytes. The exchange
        # co-group below is the scale path past the broadcast budget.
        blob_refs = blobs.to_arrow_refs()
        if not blob_refs:
            return ray.data.from_arrow(scorer.out_schema.empty_table())
        ref = _build_sorted_broadcast.remote(*blob_refs)

        def broadcast_score(batch: pa.Table) -> pa.Table:
            ids_s, offs_s, data_s = ray.get(ref)
            a_np, ids_w = _common_width(
                _to_bytes_array(batch["a"]), ids_s)
            b_np, _ = _common_width(
                _to_bytes_array(batch["b"]), ids_s)
            ia = np.searchsorted(ids_w, a_np)
            ib = np.searchsorted(ids_w, b_np)
            # clamp + hit check: a pair id absent from the blob table is
            # DROPPED (same as the exchange path), never scored against a
            # neighboring conversation's blob
            top = max(len(ids_w) - 1, 0)
            ia_c = np.minimum(ia, top)
            ib_c = np.minimum(ib, top)
            ok = (ids_w[ia_c] == a_np) & (ids_w[ib_c] == b_np) \
                if len(ids_w) else np.zeros(len(a_np), bool)
            keep = np.flatnonzero(ok)
            sel = pa.array(keep, pa.int64())
            oa, da = _gather_segments(offs_s, data_s, ia_c[keep], key="ga")
            ob, db = _gather_segments(offs_s, data_s, ib_c[keep], key="gb")
            return scorer.score(batch["a"].take(sel), batch["b"].take(sel),
                                oa, da, ob, db)

        return pairs.map_batches(
            broadcast_score,
            batch_format="pyarrow",
            batch_size=batch_size or cfg.exec.verify_batch_size,
        )

    return _score_pairs_exchange(pairs, blobs, cfg, scorer)


def verify_pairs(pairs, sigs, cfg: EngineConfig = DEFAULT_CONFIG,
                 threshold: float | None = None,
                 metric: str = "jaccard"):
    """candidate pairs + signatures → verified pair Dataset
    (a, b, jaccard, containment_ab, containment_ba), score ≥ threshold
    where score is ``metric`` (jaccard or max_containment)."""
    thr = cfg.verify_threshold if threshold is None else threshold
    blobs = sigs.select_columns(["conv_id", "mins"]).map_batches(
        mins_to_blob, batch_format="pyarrow")
    # size estimate from the (already materialized) signatures dataset — an
    # overestimate of the blob bytes, so the broadcast decision stays
    # conservative without a blobs materialize barrier
    return score_pairs(pairs, blobs, cfg,
                       PairScorer(cfg.sketch.num, thr, metric),
                       size_hint_bytes=sigs.size_bytes() or 0)


def angular_pairs(pairs, sigs, cfg: EngineConfig = DEFAULT_CONFIG,
                  threshold: float = 0.5):
    """candidate pairs → (a, b, similarity) with the abundance-cosine
    angular similarity (``minhash.rs:635-680``), thresholded. Requires
    abundance-tracked sketches. Shares the broadcast/exchange machinery
    with :func:`verify_pairs` (both paths available)."""
    blobs = sigs.select_columns(["conv_id", "mins", "abunds"]).map_batches(
        sig_blobs_packed, batch_format="pyarrow")
    return score_pairs(pairs, blobs, cfg, AngularScorer(threshold),
                       size_hint_bytes=2 * (sigs.size_bytes() or 0))


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


def _score_pairs_exchange(pairs, blobs, cfg: EngineConfig,
                          scorer: _SegmentScorer):
    """The scale path: blob table too big to broadcast.

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
        a = batch["a"].combine_chunks()
        b = batch["b"].combine_chunks()
        n = len(a)
        keys = np.concatenate([hash_strings64(a), hash_strings64(b)])
        return pa.table({
            "key": pa.array(keys, pa.int64()),
            "a": pa.concat_arrays([a, a]),
            "b": pa.concat_arrays([b, b]),
            "side": pa.array([0] * n + [1] * n, pa.int8()),
            "conv_id": pa.nulls(2 * n, pa.string()),
            "blob": pa.nulls(2 * n, pa.binary()),
        }).cast(_COGROUP_SCHEMA)

    def _blob_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": pa.array(hash_strings64(batch["conv_id"]), pa.int64()),
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
        side = np.asarray(part["side"], dtype=np.int8)
        is_blob = side == 2
        blob_tbl = part.filter(pa.array(is_blob))
        slot_tbl = part.filter(pa.array(~is_blob))
        if slot_tbl.num_rows == 0 or blob_tbl.num_rows == 0:
            return _SLOTTED_SCHEMA.empty_table()
        ids = _to_bytes_array(blob_tbl["conv_id"])
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        blob_sorted = blob_tbl["blob"].combine_chunks().take(
            pa.array(order, pa.int64()))
        a = _to_bytes_array(slot_tbl["a"])
        b = _to_bytes_array(slot_tbl["b"])
        s_side = np.asarray(slot_tbl["side"], dtype=np.int8)
        keys = np.where(s_side == 0, a, b)
        w = max(keys.dtype.itemsize, ids.dtype.itemsize, 1)
        keys = keys.astype(f"S{w}")  # pad-only (never truncate)
        ids_w = ids.astype(f"S{w}")
        pos = np.searchsorted(ids_w, keys)
        pos_c = np.minimum(pos, max(len(ids_w) - 1, 0))
        hit = ids_w[pos_c] == keys
        keep = np.flatnonzero(hit)
        sel = pa.array(keep, pa.int64())
        a_col = slot_tbl["a"].take(sel)
        b_col = slot_tbl["b"].take(sel)
        pp = (hash_strings64(a_col) * 31 + hash_strings64(b_col)) \
            % group_parts
        return pa.table({
            "pair_part": pa.array(pp, pa.int64()),
            "a": a_col,
            "b": b_col,
            "side": slot_tbl["side"].take(sel),
            "blob": blob_sorted.take(pa.array(pos_c[keep], pa.int64())),
        }).cast(_SLOTTED_SCHEMA)

    slotted = exchange_map_groups(both, "key", n_parts, _attach,
                                  _SLOTTED_SCHEMA)

    def _pair_up(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return scorer.out_schema.empty_table()
        part = part.sort_by([("a", "ascending"), ("b", "ascending"),
                             ("side", "ascending")])
        a = _to_bytes_array(part["a"])
        b = _to_bytes_array(part["b"])
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
            return scorer.out_schema.empty_table()
        joined = pa.table({
            "a": part["a"].take(pa.array(i0, pa.int64())),
            "b": part["b"].take(pa.array(i0, pa.int64())),
            "blob_a": part["blob"].take(pa.array(i0, pa.int64())),
            "blob_b": part["blob"].take(pa.array(i1, pa.int64())),
        })
        return scorer(joined)

    return exchange_map_groups(slotted, "pair_part", n_parts, _pair_up,
                               scorer.out_schema)

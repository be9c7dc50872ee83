"""Sketch stage: transcripts → per-conversation MinHash signatures.

The Ray-Data re-expression of ``sourmash sketch``
(``/root/reference/src/sourmash/command_sketch.py:198-362``): where the
reference streams FASTA *records* into one growing ``Signature`` per file
(``command_sketch.py:827-833`` → ``Signature::add_sequence``,
``/root/reference/src/core/src/signature.rs:661-697``), we stream transcript
*turns* into one signature per conversation. Faithful to the reference's
record semantics, shingles never cross turn boundaries (k-mers never cross
FASTA record boundaries either), which makes the per-turn stage embarrassingly
parallel and order-insensitive — exactly sourmash's set semantics
(``minhash.rs:159-171``: sorted-set invariant, insertion order irrelevant).

Two stages:

1. ``sketch_turns_batch`` — task-based ``map_batches`` over zero-copy
   Arrow batches. One vectorized murmur pass hashes *every* k-byte shingle
   of *every* turn in the batch; the scaled/num retention rule
   (``minhash.rs:309-383``) is applied per turn, and adjacent same-
   conversation rows are pre-merged (combiner), so only retained hashes
   (~1/scaled of the data, ~1 row per conversation) enter the shuffle.
2. coarse-key exchange on ``conv_part`` + ``merge_part`` — per-conversation
   sorted-union merge (``minhash.rs:432-516`` semantics), emitting the
   final signature row (+ LSH permutation minima + md5 identity).

The per-turn retention commutes with union (scaled: mask-then-union ==
union-then-mask; num: bottom-k of union == bottom-k of union of bottom-ks),
so stage 1 is a correct partial aggregate — the "pre-aggregate before
groupby" pattern that keeps the wide shuffle small at 10^12-turn scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig, DEFAULT_CONFIG, resolve_num_partitions
from ..functions.murmur import murmur64_fixedlen
from ..functions.perm import MAX_U64, perm_seeds
from ..functions.sketch import (
    ALNUM_DROP_PATTERN,
    SketchParams,
    WS_PATTERN,
    md5_of_mins,
)

SIG_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("ksize", pa.int32()),
    ("scaled", pa.uint64()),
    ("num", pa.uint32()),
    ("seed", pa.uint64()),
    ("n_shingles", pa.uint64()),
    ("n_turns", pa.int32()),
    ("mins", pa.list_(pa.uint64())),
    ("abunds", pa.list_(pa.uint64())),
    ("md5", pa.string()),
    ("perms", pa.list_(pa.uint64())),
])


def normalize_column(col: pa.ChunkedArray | pa.Array, mode: str) -> pa.Array:
    """Vectorized text normalization (pyarrow RE2) — bit-identical to the
    scalar ``normalize_text`` (shared ASCII regex patterns)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    if mode == "raw":
        return col
    low = pc.utf8_lower(col)
    if mode == "ws":
        out = pc.replace_substring_regex(low, WS_PATTERN, " ")
    elif mode == "alnum":
        out = pc.replace_substring_regex(low, ALNUM_DROP_PATTERN, " ")
    else:
        raise ValueError(f"unknown normalization mode: {mode}")
    return pc.utf8_trim(out, " ")


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64, data uint8) views of a StringArray, zero-copy."""
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)
    offs = offs[arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return offs, data


def batch_shingle_hashes(
    norm: pa.Array, ksize: int, seed: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All k-shingle hashes of every string in ``norm`` in ONE murmur pass.

    Returns ``(hashes, row_of_hash, n_shingles_per_row)`` where hashes are
    grouped by row in order. The analogue of ``SeqToHashes``
    (``signature.rs:166-399``) vectorized across a whole Arrow batch.
    """
    from ..functions.segscore import _wk

    n = len(norm)
    offs, data = _string_buffers(norm)
    lens = offs[1:] - offs[:-1]
    counts = np.maximum(lens - ksize + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                counts.astype(np.uint64))
    # the two total-sized outputs live in the per-worker scratch pool
    # (valid until the NEXT batch in this worker — every caller consumes
    # them within its __call__): fresh multi-MB allocations are mmap'd +
    # page-faulted per batch on this kernel, which dominated the stage
    hashes = _wk("sh_hashes", total, np.uint64)
    rows = _wk("sh_rows", total, np.int64)
    # rows = repeat(arange(n), counts) without the fresh allocation:
    # marker scatter + cumsum (np.add.at handles zero-count rows that
    # share a boundary index)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rows[:] = 0
    if n > 1:
        marks = cum[1:]
        np.add.at(rows, marks[marks < total], 1)
    np.cumsum(rows, out=rows)
    # trailing zero-count rows put markers at index == total (dropped
    # above); they emit no shingles so no row id is lost
    # starts = offs[row] + (global_idx - cum[row]) = base[row] + global_idx
    base = (offs[:-1] - cum).astype(np.int64)
    # gather via a zero-copy sliding view + one row take — a 2D index-matrix
    # gather here allocates an (n_shingles, ksize) int64 index (≈20× the
    # window bytes) and was the pipeline's hottest line. Windows are
    # gathered pre-padded to a u64-lane multiple so murmur skips its own
    # full-matrix pad copy (tail masking ignores the extra bytes).
    width = ksize + (-ksize) % 8
    data = np.concatenate([data, np.zeros(8, np.uint8)])
    view = np.lib.stride_tricks.sliding_window_view(data, width)
    # cache-blocked: hash in ~64k-shingle chunks so the dozen u64
    # temporaries stay L2-sized (and heap-served, not mmap-churned) —
    # with 32 concurrent tasks an unchunked ~80 MB working set saturates
    # shared L3/DRAM bandwidth and the stage stops scaling past ~16 cores
    step = 65536
    st = _wk("sh_starts", min(step, total), np.int64)
    for lo in range(0, total, step):
        hi = min(lo + step, total)
        m = hi - lo
        np.take(base, rows[lo:hi], out=st[:m])
        st[:m] += np.arange(lo, hi, dtype=np.int64)
        hashes[lo:hi] = murmur64_fixedlen(
            view[st[:m]], seed=seed, length=ksize)
    return hashes, rows, counts.astype(np.uint64)


def _retain_per_row(
    hashes: np.ndarray, rows: np.ndarray, n_rows: int, params: SketchParams
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply the scaled/num retention rule per row, vectorized.

    Returns ``(offsets, mins_values, abund_values)`` for building two
    ListArrays: per-row sorted-unique retained hashes + multiplicities.
    Semantics of ``add_hash`` (``minhash.rs:309-383``) in bulk.
    """
    if params.scaled:
        mask = hashes <= np.uint64(params.max_hash)
        hashes, rows = hashes[mask], rows[mask]
    if hashes.size:
        order = np.lexsort((hashes, rows))
        h, r = hashes[order], rows[order]
        first = np.empty(h.size, dtype=bool)
        first[0] = True
        first[1:] = (h[1:] != h[:-1]) | (r[1:] != r[:-1])
        keep_idx = np.flatnonzero(first)
        mins = h[keep_idx]
        run_ends = np.concatenate([keep_idx[1:], [h.size]])
        abunds = (run_ends - keep_idx).astype(np.uint64)
        keep_rows = r[keep_idx]
        if params.num:
            # bottom-num per row: position within row < num
            row_counts = np.bincount(keep_rows, minlength=n_rows)
            row_start = np.concatenate([[0], np.cumsum(row_counts)[:-1]])
            pos = np.arange(mins.size) - row_start[keep_rows]
            sel = pos < params.num
            mins, abunds, keep_rows = mins[sel], abunds[sel], keep_rows[sel]
        per_row = np.bincount(keep_rows, minlength=n_rows)
    else:
        mins = np.empty(0, np.uint64)
        abunds = np.empty(0, np.uint64)
        per_row = np.zeros(n_rows, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(per_row)]).astype(np.int32)
    return offsets, mins, abunds


def _merge_rows_by_group(
    group_ord: np.ndarray, n_groups: int, offsets: np.ndarray,
    mins: np.ndarray, abunds: np.ndarray, num: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Union the list rows of each group (sorted-unique, abundances summed,
    optional bottom-num truncation) in one vectorized pass. Returns
    (group_offsets int32, merged_mins, merged_abunds).

    This IS the ``minhash.rs:432-516`` merge generalized to k inputs ×
    many groups; shared by the in-batch combiner and the shuffle-side
    merge so both paths have identical semantics."""
    row_lens = np.diff(offsets)
    hash_grp = np.repeat(group_ord, row_lens)
    order = np.lexsort((mins, hash_grp))
    h, a, g = mins[order], abunds[order], hash_grp[order]
    if h.size:
        first = np.empty(h.size, dtype=bool)
        first[0] = True
        first[1:] = (h[1:] != h[:-1]) | (g[1:] != g[:-1])
        idx = np.flatnonzero(first)
        mins_v = h[idx]
        ab_v = np.add.reduceat(a, idx).astype(np.uint64)
        keep_g = g[idx]
    else:
        mins_v = np.empty(0, np.uint64)
        ab_v = np.empty(0, np.uint64)
        keep_g = np.empty(0, np.int64)
    per_g = np.bincount(keep_g, minlength=n_groups)
    if num:
        starts = np.concatenate([[0], np.cumsum(per_g)[:-1]])
        pos = np.arange(mins_v.size) - starts[keep_g]
        sel = pos < num
        mins_v, ab_v, keep_g = mins_v[sel], ab_v[sel], keep_g[sel]
        per_g = np.bincount(keep_g, minlength=n_groups)
    g_offsets = np.concatenate([[0], np.cumsum(per_g)]).astype(np.int32)
    return g_offsets, mins_v, ab_v


def sketch_turns_batch(batch: pa.Table, *, params: SketchParams,
                       group_parts: int = 1024,
                       combine: bool = True) -> pa.Table:
    """``map_batches`` kernel: turn batch → partial sketches (reference
    analogue: the per-process sketch factory, ``command_sketch.py:309-362``).
    Runs task-based — setup cost here is just the shared compiled regexes.

    With ``combine=True`` (the pipeline default), ADJACENT rows of the same
    conversation are pre-merged inside the batch — the combiner side of the
    shuffle. Transcripts parquet is written with a conversation's turns
    contiguous, so this shrinks the merge shuffle by ~the average turns per
    conversation; correctness never depends on contiguity (non-adjacent
    fragments stay separate partials and merge later).

    Also emits ``conv_part`` (vectorized murmur of conv_id mod
    ``group_parts``) — the coarse shuffle key for the merge stage, so the
    per-conversation merge runs one vectorized Python call per partition
    instead of per conversation."""
    p = params
    norm = normalize_column(batch["text"], p.normalization)
    hashes, rows, n_shingles = batch_shingle_hashes(norm, p.ksize, p.seed)
    offsets, mins, abunds = _retain_per_row(hashes, rows, len(batch), p)
    conv = batch["conv_id"].combine_chunks()
    n_turns = np.ones(batch.num_rows, dtype=np.int64)

    if combine and batch.num_rows:
        cid = np.asarray(conv.to_numpy(zero_copy_only=False))
        new_run = np.concatenate([[True], cid[1:] != cid[:-1]])
        run_ord = np.cumsum(new_run) - 1
        n_runs = int(run_ord[-1]) + 1
        offsets, mins, abunds = _merge_rows_by_group(
            run_ord, n_runs, offsets.astype(np.int64), mins, abunds, p.num)
        first_rows = np.flatnonzero(new_run)
        conv = conv.take(pa.array(first_rows, pa.int64()))
        n_shingles = np.bincount(
            run_ord, weights=n_shingles.astype(np.float64),
            minlength=n_runs).astype(np.uint64)
        n_turns = np.bincount(run_ord, minlength=n_runs).astype(np.int64)

    from ..functions.segscore import hash_strings64

    conv_part = hash_strings64(conv) % group_parts
    return pa.table({
        "conv_id": conv,
        "conv_part": pa.array(conv_part, pa.int64()),
        "mins": pa.ListArray.from_arrays(
            pa.array(np.asarray(offsets, dtype=np.int32)),
            pa.array(mins, pa.uint64())),
        "abunds": pa.ListArray.from_arrays(
            pa.array(np.asarray(offsets, dtype=np.int32)),
            pa.array(abunds, pa.uint64())),
        "n_shingles": pa.array(np.asarray(n_shingles, np.uint64),
                               pa.uint64()),
        "n_turns": pa.array(n_turns, pa.int64()),
    })


class TurnSketcher:
    """Thin callable wrapper over :func:`sketch_turns_batch` (kept for
    direct kernel use in tests)."""

    def __init__(self, params: SketchParams, group_parts: int = 1024):
        self.params = params
        self.group_parts = group_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        # combine=False: one output row per turn (kernel-level tests
        # compare per-turn partials against the scalar oracle)
        return sketch_turns_batch(batch, params=self.params,
                                  group_parts=self.group_parts,
                                  combine=False)


def make_merge_part_fn(cfg: EngineConfig):
    """Merge turn partials → signature rows for a whole COARSE partition in
    one vectorized pass (all conversations of the partition at once).

    Per conversation: sorted union with abundance sum (``minhash.rs:432-516``
    merge semantics generalized to k inputs), LSH permutation minima over
    the retained set, and the md5 identity (``minhash.rs:290-307``).
    """
    p = cfg.sketch
    seeds = perm_seeds(cfg.lsh.num_perm, p.seed)
    num_perm = cfg.lsh.num_perm

    def merge_part(part: pa.Table) -> pa.Table:
        part = part.sort_by([("conv_id", "ascending")])
        conv = part["conv_id"].combine_chunks()
        cid = np.asarray(conv.to_numpy(zero_copy_only=False))
        # turn-row → conversation-ordinal
        new_conv = np.concatenate([[True], cid[1:] != cid[:-1]])
        conv_ord = np.cumsum(new_conv) - 1
        n_convs = int(conv_ord[-1]) + 1 if cid.size else 0
        conv_row = np.flatnonzero(new_conv)  # first turn-row of each conv

        mins_col = part["mins"].combine_chunks()
        all_mins = np.asarray(mins_col.flatten(), dtype=np.uint64)
        all_ab = np.asarray(
            part["abunds"].combine_chunks().flatten(), dtype=np.uint64)
        offsets, mins_v, ab_v = _merge_rows_by_group(
            conv_ord, n_convs, np.asarray(mins_col.offsets, dtype=np.int64),
            all_mins, all_ab, p.num)
        per_conv = np.diff(offsets)

        # permutation minima: one seed at a time over the retained hashes —
        # same FLOPs as the (n_retained, num_perm) matrix but the working
        # set stays cache-sized instead of allocating a ~0.5 GB temp
        perms = np.full((n_convs, num_perm), MAX_U64, dtype=np.uint64)
        if mins_v.size:
            nonempty = per_conv > 0
            starts = offsets[:-1][nonempty].astype(np.int64)
            n_ne = int(nonempty.sum())
            old = np.seterr(over="ignore")
            try:
                for j in range(num_perm):
                    col = _fmix64_mat(mins_v ^ seeds[j])
                    perms[nonempty, j] = np.minimum.reduceat(
                        col, starts)[:n_ne]
            finally:
                np.seterr(**old)

        md5s = [md5_of_mins(mins_v[offsets[i]:offsets[i + 1]], p.ksize)
                for i in range(n_convs)]
        n_sh = np.bincount(
            conv_ord, weights=np.asarray(part["n_shingles"], dtype=np.float64),
            minlength=n_convs).astype(np.uint64)
        n_turns = np.bincount(
            conv_ord, weights=np.asarray(part["n_turns"], dtype=np.float64),
            minlength=n_convs).astype(np.int32)

        perm_offs = pa.array(
            np.arange(n_convs + 1, dtype=np.int32) * num_perm)
        return pa.table({
            "conv_id": conv.take(pa.array(conv_row, pa.int64())),
            "ksize": pa.array(np.full(n_convs, p.ksize, np.int32)),
            "scaled": pa.array(np.full(n_convs, p.scaled, np.uint64)),
            "num": pa.array(np.full(n_convs, p.num, np.uint32)),
            "seed": pa.array(np.full(n_convs, p.seed, np.uint64)),
            "n_shingles": pa.array(n_sh, pa.uint64()),
            "n_turns": pa.array(n_turns, pa.int32()),
            "mins": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(mins_v, pa.uint64())),
            "abunds": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(ab_v, pa.uint64())),
            "md5": pa.array(md5s, pa.string()),
            "perms": pa.ListArray.from_arrays(
                perm_offs, pa.array(perms.reshape(-1), pa.uint64())),
        })

    return merge_part


def _fmix64_mat(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    k = k ^ (k >> np.uint64(33))
    return k


def sketch_transcripts(ds, cfg: EngineConfig = DEFAULT_CONFIG,
                       checkpoint_dir: str | None = None,
                       fingerprint: str = ""):
    """transcripts Dataset → signatures Dataset (one row per conversation).

    ``ds`` needs columns (conv_id, text); extra columns are pruned here —
    callers reading Parquet should already pass ``columns=["conv_id",
    "text"]`` to prune at the scan. The conv_id shuffle runs on the coarse
    ``conv_part`` key (one vectorized merge call per partition);
    ``checkpoint_dir`` enables partition-level resume of the merge side
    of the shuffle (see ``exchange_map_groups``).
    """
    ds = ds.select_columns(["conv_id", "text"])
    from .exchange import exchange_map_groups

    partial = ds.map_batches(
        sketch_turns_batch,
        fn_kwargs=dict(params=cfg.sketch, group_parts=cfg.exec.group_parts),
        batch_format="pyarrow",
        batch_size=cfg.exec.sketch_batch_size,
    )
    return exchange_map_groups(
        partial, "conv_part", 2 * resolve_num_partitions(cfg),
        make_merge_part_fn(cfg), SIG_SCHEMA,
        checkpoint_dir=checkpoint_dir, fingerprint=fingerprint)

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

1. ``TurnSketcher`` — stateful actor-pool ``map_batches`` over zero-copy
   Arrow batches. One vectorized murmur pass hashes *every* k-byte shingle
   of *every* turn in the batch; the scaled/num retention rule
   (``minhash.rs:309-383``) is applied per turn before the shuffle, so only
   retained hashes (~1/scaled of the data) move.
2. ``merge_turn_sketches`` — ``groupby("conv_id")`` shuffle + per-group
   sorted-union merge (``minhash.rs:432-516`` semantics), emitting the final
   signature row (+ LSH permutation minima + md5 identity).

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
from ..functions.perm import MAX_U64, perm_minima, perm_seeds
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
    n = len(norm)
    offs, data = _string_buffers(norm)
    lens = offs[1:] - offs[:-1]
    counts = np.maximum(lens - ksize + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return (np.empty(0, np.uint64), np.empty(0, np.int64),
                counts.astype(np.uint64))
    rows = np.repeat(np.arange(n, dtype=np.int64), counts)
    cum = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(cum, counts)
    starts = offs[:-1][rows] + within
    windows = data[starts[:, None] + np.arange(ksize, dtype=np.int64)[None, :]]
    hashes = murmur64_fixedlen(windows, seed=seed)
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


class TurnSketcher:
    """Actor-pool ``map_batches`` stage: turn batch → per-turn partial
    sketches. Config (compiled patterns, params) lives in ``__init__`` —
    once per actor, not per batch (reference analogue: the per-process
    sketch factory state, ``command_sketch.py:309-362``)."""

    def __init__(self, params: SketchParams):
        self.params = params

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.params
        norm = normalize_column(batch["text"], p.normalization)
        hashes, rows, n_shingles = batch_shingle_hashes(norm, p.ksize, p.seed)
        offsets, mins, abunds = _retain_per_row(hashes, rows, len(batch), p)
        return pa.table({
            "conv_id": batch["conv_id"],
            "mins": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(mins, pa.uint64())),
            "abunds": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(abunds, pa.uint64())),
            "n_shingles": pa.array(n_shingles, pa.uint64()),
        })


def make_merge_group_fn(cfg: EngineConfig):
    """Per-conversation merge of turn partials → one signature row.

    Sorted k-way union with abundance sum (``minhash.rs:432-516`` merge
    semantics generalized to k inputs), then LSH permutation minima over the
    retained set and the md5 identity (``minhash.rs:290-307``).
    """
    p = cfg.sketch
    seeds = perm_seeds(cfg.lsh.num_perm, p.seed)

    def merge_group(group: pa.Table) -> pa.Table:
        conv_id = group["conv_id"][0].as_py()
        mins_col = group["mins"].combine_chunks()
        all_mins = np.asarray(mins_col.flatten(), dtype=np.uint64)
        all_ab = np.asarray(
            group["abunds"].combine_chunks().flatten(), dtype=np.uint64)
        if all_mins.size:
            order = np.argsort(all_mins, kind="stable")
            h = all_mins[order]
            a = all_ab[order]
            first = np.empty(h.size, dtype=bool)
            first[0] = True
            first[1:] = h[1:] != h[:-1]
            idx = np.flatnonzero(first)
            mins = h[idx]
            abunds = np.add.reduceat(a, idx).astype(np.uint64)
        else:
            mins = np.empty(0, np.uint64)
            abunds = np.empty(0, np.uint64)
        if p.num:
            mins, abunds = mins[: p.num], abunds[: p.num]
        perms = perm_minima(mins, seeds)
        n_shingles = int(pc.sum(group["n_shingles"]).as_py() or 0)
        return pa.table({
            "conv_id": pa.array([conv_id], pa.string()),
            "ksize": pa.array([p.ksize], pa.int32()),
            "scaled": pa.array([p.scaled], pa.uint64()),
            "num": pa.array([p.num], pa.uint32()),
            "seed": pa.array([p.seed], pa.uint64()),
            "n_shingles": pa.array([n_shingles], pa.uint64()),
            "n_turns": pa.array([len(group)], pa.int32()),
            "mins": pa.array([mins], pa.list_(pa.uint64())),
            "abunds": pa.array([abunds], pa.list_(pa.uint64())),
            "md5": pa.array([md5_of_mins(mins, p.ksize)], pa.string()),
            "perms": pa.array([perms], pa.list_(pa.uint64())),
        })

    return merge_group


def sketch_transcripts(ds, cfg: EngineConfig = DEFAULT_CONFIG):
    """transcripts Dataset → signatures Dataset (one row per conversation).

    ``ds`` needs columns (conv_id, text); extra columns are pruned here —
    callers reading Parquet should already pass ``columns=["conv_id",
    "text"]`` to prune at the scan.
    """
    ds = ds.select_columns(["conv_id", "text"])
    partial = ds.map_batches(
        TurnSketcher,
        fn_constructor_args=(cfg.sketch,),
        batch_format="pyarrow",
        batch_size=cfg.exec.sketch_batch_size,
        concurrency=(1, resolve_num_partitions(cfg)),
        num_cpus=1,
    )
    return partial.groupby("conv_id").map_groups(
        make_merge_group_fn(cfg), batch_format="pyarrow"
    )

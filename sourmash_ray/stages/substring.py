"""Exact long-match stage: verified pairs → longest shared byte span.

SURVEY.md §7.2 step 6: the pass that upgrades "sketch-similar" to
"provably shares an exact span of ≥ min_len bytes" — the suffix/rolling
hash substring analogue of the reference's ``sig kmers`` back-mapping.

Conversation documents are assembled with an explicit
``(conv_id, turn_idx)`` sort (the input_hint ordering invariant: any
stable assembly MUST impose this order, never read order) inside an
id-hash exchange partition, joined with '\\n' separators. The pass then
rides the shared :func:`~sourmash_ray.stages.verify.score_pairs`
machinery: pair-involved conversation blobs either broadcast (sorted
arrays built in ONE remote task — the driver never touches text bytes)
or meet their pairs in the two-exchange co-group beyond the broadcast
budget. No ``take_all`` of pairs, no driver-built text dict.

Partitioning assumption: the distinct pair-involved id set is broadcast
to filter the transcript scan (a semi-join on the small side — dup
pairs are a tiny fraction of the corpus); the text bytes themselves
never aggregate in one process on either path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import EngineConfig, DEFAULT_CONFIG
from ..functions.segscore import _to_bytes_array, hash_strings64
from ..functions.sketch import normalize_text
from ..functions.substring import longest_common_substring

SPAN_SCHEMA = pa.schema([
    ("a", pa.string()),
    ("b", pa.string()),
    ("lcs_len", pa.int64()),
    ("lcs_a_start", pa.int64()),
    ("lcs_b_start", pa.int64()),
])

_BLOB_SCHEMA = pa.schema([("conv_id", pa.string()), ("blob", pa.binary())])

_TURN_SCHEMA = pa.schema([
    ("key", pa.int64()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int64()),
    ("text", pa.string()),
])


@ray.remote
def _pair_id_array(*blocks) -> np.ndarray:
    """Sorted distinct S-array of every id referenced by a pair block —
    built off-driver for the semi-join broadcast."""
    tables = [t for t in blocks if t.num_rows]
    if not tables:
        return np.empty(0, "S1")
    tbl = pa.concat_tables(tables).combine_chunks()
    a = _to_bytes_array(tbl["a"])
    b = _to_bytes_array(tbl["b"])
    w = max(a.dtype.itemsize, b.dtype.itemsize, 1)
    return np.unique(np.concatenate([a.astype(f"S{w}"),
                                     b.astype(f"S{w}")]))


def conversation_blobs(transcripts_ds, normalization: str = "ws",
                       involved_ref=None,
                       cfg: EngineConfig = DEFAULT_CONFIG):
    """transcripts → (conv_id, blob) Dataset of normalized full-text
    bytes, turns joined '\\n' in explicit (conv_id, turn_idx) order.

    Turns co-locate by conv_id hash on the coarse exchange and are
    assembled inside each partition — the whole-corpus text never meets
    in one process. ``involved_ref``: optional ray.put ref of a sorted
    S-array of conv_ids to keep (semi-join pushdown into the scan)."""
    from ..config import resolve_num_partitions
    from .exchange import exchange_map_groups
    from .verify import _common_width

    n_parts = 2 * resolve_num_partitions(cfg)

    def _turn_rows(batch: pa.Table) -> pa.Table:
        if involved_ref is not None:
            ids_s = ray.get(involved_ref)
            keys, ids_w = _common_width(
                _to_bytes_array(batch["conv_id"]), ids_s)
            pos = np.searchsorted(ids_w, keys)
            pos_c = np.minimum(pos, max(len(ids_w) - 1, 0))
            hit = (ids_w[pos_c] == keys) if len(ids_w) else \
                np.zeros(len(keys), bool)
            batch = batch.filter(pa.array(hit))
        return pa.table({
            "key": pa.array(hash_strings64(batch["conv_id"]), pa.int64()),
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"].cast(pa.int64()),
            "text": batch["text"],
        }).cast(_TURN_SCHEMA)

    def _assemble(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _BLOB_SCHEMA.empty_table()
        part = part.sort_by([("conv_id", "ascending"),
                             ("turn_idx", "ascending")])
        ids = _to_bytes_array(part["conv_id"])
        first = np.ones(len(ids), bool)
        if len(ids) > 1:
            first[1:] = ids[1:] != ids[:-1]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(ids))
        texts = part["text"].to_pylist()  # per-turn normalize is per-row
        conv_col = part["conv_id"].take(pa.array(starts, pa.int64()))
        blobs = [
            b"\n".join(normalize_text(t or "", normalization)
                       for t in texts[s:e])
            for s, e in zip(starts, ends)
        ]
        return pa.table({"conv_id": conv_col,
                         "blob": pa.array(blobs, pa.binary())})

    turns = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "text"]).map_batches(
        _turn_rows, batch_format="pyarrow")
    return exchange_map_groups(turns, "key", n_parts, _assemble,
                               _BLOB_SCHEMA)


class LCSScorer:
    """Per-pair longest common substring over assembled text blobs
    (``_SegmentScorer`` protocol — both score_pairs paths). The LCS
    itself is inherently per-pair (suffix-automaton walk per pair);
    everything around it is vectorized/columnar."""

    out_schema = SPAN_SCHEMA

    def __init__(self, min_len: int):
        self.min_len = min_len

    def score(self, a_ids, b_ids, oa, da, ob, db) -> pa.Table:
        n = len(oa) - 1
        lens = np.zeros(n, np.int64)
        sa = np.zeros(n, np.int64)
        sb = np.zeros(n, np.int64)
        for i in range(n):
            ta = da[oa[i]:oa[i + 1]].tobytes()
            tb = db[ob[i]:ob[i + 1]].tobytes()
            L, pa_, pb_ = longest_common_substring(ta, tb)
            lens[i], sa[i], sb[i] = L, pa_, pb_
        out = pa.table({
            "a": a_ids, "b": b_ids,
            "lcs_len": pa.array(lens, pa.int64()),
            "lcs_a_start": pa.array(sa, pa.int64()),
            "lcs_b_start": pa.array(sb, pa.int64()),
        }).cast(SPAN_SCHEMA)
        return out.filter(pa.array(lens >= self.min_len))

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .verify import _blob_views

        oa, da = _blob_views(batch["blob_a"])
        ob, db = _blob_views(batch["blob_b"])
        return self.score(batch["a"], batch["b"], oa, da, ob, db)


def conversation_texts(transcripts_ds, conv_ids: set[str],
                       normalization: str = "ws") -> dict[str, bytes]:
    """Driver-side helper (tests / small tools): assembled normalized
    text per conversation, explicit (conv_id, turn_idx) order."""
    ids_ref = ray.put(np.sort(np.array(
        [c.encode("utf-8") for c in conv_ids], dtype=bytes))
        if conv_ids else np.empty(0, "S1"))
    blobs = conversation_blobs(transcripts_ds, normalization,
                               involved_ref=ids_ref)
    return {r["conv_id"]: r["blob"] for r in blobs.take_all()}


def exact_substring_pass(pairs_ds, transcripts_ds,
                         cfg: EngineConfig = DEFAULT_CONFIG,
                         min_len: int = 64):
    """(a, b) pairs → (a, b, lcs_len, lcs_a_start, lcs_b_start) for pairs
    whose longest exact common substring is ≥ ``min_len`` bytes.

    Shape: distinct pair ids (off-driver build, broadcast) prune the
    transcript scan; blobs assemble on the conv-id exchange; the shared
    broadcast/exchange pair scorer computes LCS where pair and blobs
    meet. LCS costs ~ms per pair, so pairs fan out in small batches."""
    import ray.data

    pairs = pairs_ds.select_columns(["a", "b"]).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(SPAN_SCHEMA.empty_table())
    refs = pairs.to_arrow_refs()
    involved_ref = _pair_id_array.remote(*refs)
    blobs = conversation_blobs(transcripts_ds, cfg.sketch.normalization,
                               involved_ref=involved_ref,
                               cfg=cfg).materialize()
    from .verify import score_pairs

    # spread the per-pair LCS cost wide: many small blocks (map tasks are
    # per block) + small verify batches
    n_pairs = pairs.count()
    pairs = pairs.repartition(max(8, min(n_pairs // 8 + 1, 512)))
    return score_pairs(pairs, blobs, cfg, LCSScorer(min_len),
                       size_hint_bytes=blobs.size_bytes() or 0,
                       batch_size=8)

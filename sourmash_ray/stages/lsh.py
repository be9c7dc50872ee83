"""LSH banding: signatures → candidate near-duplicate pairs.

This replaces the reference's candidate-pruning index structures — the SBT
Bloom-filter tree (``/root/reference/src/sourmash/sbt.py``) and the
``_hashval_to_idx`` inverted index (``lca_db.py:82,202-203``) — with the
shuffle-native equivalent: band the permutation signature, ``groupby`` the
band key (THE all-to-all exchange of the pipeline), and emit pairs within
each bucket.

Skew handling (SURVEY.md §4): a bucket of g members emits O(g²) pairs; a
boilerplate band shared by millions of conversations would explode. Buckets
larger than ``max_bucket_pairs_members`` are *chained* — every member links
to the bucket minimum plus its sorted successor — which keeps output linear
in g while preserving the connected-components result (any clique collapses
to the same component through the star+chain edges). The exact-duplicate
path (identical md5 → same cluster) is handled separately in the dedup
pipeline and does not depend on bucket capping.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, DEFAULT_CONFIG, resolve_num_partitions
from ..functions.murmur import murmur64_fixedlen
from ..functions.perm import MAX_U64
from .exchange import exchange_map_groups

PAIRS_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string())])


class BandKeyer:
    """map_batches: one signature row → ``bands`` rows of
    ``(band_key: uint64, conv_id)``.

    The band key is a murmur64 over the little-endian bytes of
    ``[band_id, perm[band*r], …, perm[band*r+r-1]]`` — one vectorized
    murmur pass over an ``(n*bands, 8*(r+1))`` byte matrix.

    Signatures with an empty sketch (text shorter than the shingle size
    everywhere) are dropped: their perm vector is all-MAX, every such row
    would share every bucket and pair up with Jaccard 0/0.
    """

    def __init__(self, num_perm: int, bands: int, rows: int,
                 group_parts: int = 1024):
        self.num_perm, self.bands, self.rows = num_perm, bands, rows
        self.group_parts = group_parts

    def _empty(self) -> pa.Table:
        return pa.table({"band_key": pa.array([], pa.uint64()),
                         "band_part": pa.array([], pa.int64()),
                         "conv_id": pa.array([], pa.string())})

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return self._empty()
        perms = np.asarray(
            batch["perms"].combine_chunks().flatten(), dtype=np.uint64
        ).reshape(n, self.num_perm)
        nonempty = ~(perms[:, 0] == MAX_U64)
        perms = perms[nonempty]
        conv = batch["conv_id"].combine_chunks().filter(pa.array(nonempty))
        m = perms.shape[0]
        if m == 0:
            return self._empty()
        # (m, bands, rows) -> prepend band_id lane -> bytes -> murmur
        banded = perms.reshape(m, self.bands, self.rows)
        band_ids = np.broadcast_to(
            np.arange(self.bands, dtype=np.uint64)[None, :, None],
            (m, self.bands, 1))
        lanes = np.concatenate([band_ids, banded], axis=2)
        mat = lanes.reshape(m * self.bands, self.rows + 1).astype("<u8")
        keys = murmur64_fixedlen(mat.view(np.uint8).reshape(
            m * self.bands, 8 * (self.rows + 1)))
        # repeat conv_id `bands` times via take on a repeated index vector
        idx = np.repeat(np.arange(m, dtype=np.int64), self.bands)
        conv_rep = conv.take(pa.array(idx))
        return pa.table({
            "band_key": pa.array(keys, pa.uint64()),
            "band_part": pa.array(
                (keys % np.uint64(self.group_parts)).astype(np.int64),
                pa.int64()),
            "conv_id": conv_rep,
        })


def band_keys_batch(batch: pa.Table, *, keyer: "BandKeyer") -> pa.Table:
    """Task-based map_batches wrapper (no actor pool spin-up; the keyer
    holds only small config arrays)."""
    return keyer(batch)


def full_pair_indices(s: int, g: int, chunk_elems: int = 1 << 22):
    """ALL (i, j), i<j index pairs of a size-``g`` run starting at ``s``,
    generated in memory-bounded chunks (≤ ``chunk_elems`` entries per
    block) — for pair-LIST consumers where the star+chain cap would drop
    true pairs. Yields (a_idx, b_idx) int64 arrays."""
    from ..functions.segscore import _local_idx

    block = max(1, chunk_elems // max(1, g))
    for i0 in range(0, g - 1, block):
        i1 = min(i0 + block, g - 1)
        cnt = (g - 1) - np.arange(i0, i1, dtype=np.int64)
        ai = np.repeat(np.arange(i0, i1, dtype=np.int64), cnt) + s
        bi = (np.repeat(np.arange(i0, i1, dtype=np.int64) + 1, cnt)
              + _local_idx(cnt) + s)
        yield ai, bi


PAIRS_CAPPED_SCHEMA = pa.schema([
    ("a", pa.string()), ("b", pa.string()), ("capped", pa.bool_()),
])


def _pair_indices_sorted(keys: np.ndarray, cap: int, full_pairs: bool,
                         skew_limit: int):
    """In-run pair indices over a SORTED key vector: returns
    (a_idx, b_idx, capped) where ``capped`` marks edges that came from a
    star+chain-degraded bucket (pair list incomplete for that bucket —
    connectivity preserved, enumeration not). Shared by the coarse-part
    emitter and the fused incremental probe."""
    if keys.size < 2:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, bool)
    starts = np.flatnonzero(
        np.concatenate([[True], keys[1:] != keys[:-1]]))
    sizes = np.diff(np.concatenate([starts, [keys.size]]))
    ai: list[np.ndarray] = []
    bi: list[np.ndarray] = []
    cp: list[np.ndarray] = []
    for s, g in zip(starts[sizes >= 2], sizes[sizes >= 2]):
        g = int(g)
        s = int(s)
        if g <= cap:
            iu, ju = np.triu_indices(g, 1)
            ai.append(s + iu)
            bi.append(s + ju)
            cp.append(np.zeros(iu.size, bool))
        elif full_pairs and g <= skew_limit:
            for a_idx, b_idx in full_pair_indices(s, g):
                ai.append(a_idx)
                bi.append(b_idx)
                cp.append(np.zeros(a_idx.size, bool))
        else:
            if full_pairs:
                import logging

                logging.getLogger(__name__).warning(
                    "pair emission: bucket of %d members exceeds "
                    "skew_limit=%d — degrading to star+chain (pair "
                    "list incomplete for this bucket; edges carry "
                    "capped=True)", g, skew_limit)
            # hot bucket (boilerplate band): star to the minimum plus a
            # chain of sorted successors — linear edges, same connected
            # components (SURVEY.md §4 skew row)
            idx = np.arange(s, s + g)
            ai.append(np.concatenate(
                [np.full(g - 1, s), idx[1:-1]]))
            bi.append(np.concatenate([idx[1:], idx[2:]]))
            cp.append(np.ones(2 * g - 3, bool))
    if not ai:
        z = np.empty(0, np.int64)
        return z, z, np.empty(0, bool)
    return (np.concatenate(ai), np.concatenate(bi), np.concatenate(cp))


def _emit_pairs_part(cap: int, full_pairs: bool = False,
                     skew_limit: int = 100_000,
                     capped_col: bool = False):
    """Vectorized pair emission over one COARSE partition of band keys.

    ``full_pairs=False`` (clustering consumers): buckets larger than
    ``cap`` emit star+chain edges — linear output, identical connected
    components. ``full_pairs=True`` (pair-LIST consumers, e.g. near-dup
    pair reports): every in-bucket pair is emitted in memory-bounded
    chunks; only beyond ``skew_limit`` members (adversarial identical-key
    skew, ~5·10⁹ pairs from one bucket) does the bucket degrade to
    star+chain, with a WARNING — never a silent drop.

    ``capped_col=True`` appends a ``capped: bool`` column marking edges
    from degraded buckets, so 100-TB recall accounting can distinguish
    "no dup found" from "pairs not enumerated" (output conforms to
    :data:`PAIRS_CAPPED_SCHEMA`).

    The groupby key is ``band_part = band_key % group_parts``; equal band
    keys always land in the same partition, so pair semantics are identical
    to a per-bucket groupby — but one Python call handles thousands of
    buckets: sort by (band_key, conv_id), detect runs, and only runs with
    ≥ 2 members (the rare case) get pair generation.
    """
    out_schema = PAIRS_CAPPED_SCHEMA if capped_col else PAIRS_SCHEMA

    def emit(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return out_schema.empty_table()
        part = part.sort_by([("band_key", "ascending"),
                             ("conv_id", "ascending")])
        keys = np.asarray(part["band_key"], dtype=np.uint64)
        conv = part["conv_id"].combine_chunks()
        a_idx, b_idx, capped = _pair_indices_sorted(
            keys, cap, full_pairs, skew_limit)
        if a_idx.size == 0:
            return out_schema.empty_table()
        cols = {"a": conv.take(pa.array(a_idx, pa.int64())),
                "b": conv.take(pa.array(b_idx, pa.int64()))}
        if capped_col:
            cols["capped"] = pa.array(capped)
        return pa.table(cols)

    return emit


def _first_distinct_pairs(tbl: pa.Table) -> pa.Table:
    """EXACT first-occurrence distinct on (a, b), Arrow/numpy native —
    no pandas round-trip, no hash-collision risk: each id column is
    dictionary-encoded (exact value identity) and the two code vectors
    combine into one collision-free int64 composite."""
    if tbl.num_rows < 2:
        return tbl
    ca = np.asarray(
        tbl["a"].combine_chunks().dictionary_encode().indices, np.int64)
    cb = np.asarray(
        tbl["b"].combine_chunks().dictionary_encode().indices, np.int64)
    key = ca * np.int64(int(cb.max()) + 1) + cb
    _, first = np.unique(key, return_index=True)
    if first.size == tbl.num_rows:
        return tbl
    first.sort()  # keep original row order (deterministic "first")
    return tbl.take(pa.array(first, pa.int64()))


def _dedup_pairs_part(part: pa.Table) -> pa.Table:
    """Distinct (a, b) within one coarse pair partition, vectorized;
    non-key columns keep the first occurrence's values."""
    return _first_distinct_pairs(part.drop_columns(["pair_part"]))


def _pair_key64(col) -> np.ndarray:
    """Vectorized 64-bit key of a pair-id column (string or integer)."""
    import pyarrow.types as pt

    from ..functions.murmur import _np_fmix64
    from ..functions.segscore import hash_strings64

    t = col.type if hasattr(col, "type") else None
    if t is not None and (pt.is_integer(t)):
        old = np.seterr(over="ignore")
        try:
            return (_np_fmix64(np.asarray(col).astype(np.uint64))
                    >> np.uint64(1)).astype(np.int64)
        finally:
            np.seterr(**old)
    return hash_strings64(col)


def _add_pair_part(parts: int):
    def add(batch: pa.Table) -> pa.Table:
        pp = (_pair_key64(batch["a"]) * 31 + _pair_key64(batch["b"])) % parts
        return batch.append_column("pair_part", pa.array(pp, pa.int64()))

    return add


def candidate_pairs(sigs, cfg: EngineConfig = DEFAULT_CONFIG,
                    distinct: bool = True):
    """signatures Dataset → candidate pair Dataset (a < b).

    Shuffles on COARSE keys (``group_parts`` partitions): a band-part
    groupby forming buckets, then (``distinct=True``) a pair-part groupby
    deduping pairs found in multiple bands (SURVEY.md §7.4 key table).
    The flagship pipeline passes ``distinct=False`` and dedups AFTER
    verification instead: scoring a duplicate candidate costs ~30µs while
    the dedup shuffle moves every candidate, so it is cheaper to dedup the
    much smaller verified set (``dedup_pairs``).
    """
    lsh = cfg.lsh
    parts = cfg.exec.group_parts
    keyer = BandKeyer(lsh.num_perm, lsh.bands, lsh.rows, parts)
    keyed = sigs.select_columns(["conv_id", "perms"]).map_batches(
        band_keys_batch,
        fn_kwargs=dict(keyer=keyer),
        batch_format="pyarrow",
    )
    pairs = exchange_map_groups(
        keyed, "band_part", 2 * resolve_num_partitions(cfg),
        _emit_pairs_part(lsh.max_bucket_pairs_members), PAIRS_SCHEMA)
    if not distinct:
        return pairs
    return dedup_pairs(pairs, parts, out_schema=PAIRS_SCHEMA)


# pair rows are thin (two ids + flags); 2M rows ≈ 100 MB on the driver
# and the dictionary-encode + np.unique dedup runs in ~0.5 s — cheaper
# than an extra all-to-all exchange round. Past the budget the coarse
# pair-part exchange path engages (the 100-TB path).
DRIVER_DEDUP_MAX_ROWS = 2_000_000


def dedup_pairs(pairs, parts: int = 1024, out_schema=None, n_parts=None):
    """Distinct rows by (a, b); keeps every other column of the first
    occurrence (rows for the same pair are identical in this engine, so
    "first" is deterministic in value).

    Small inputs dedup on the driver (one pandas pass — cheaper than an
    exchange barrier); larger ones go through the coarse pair-part
    exchange."""
    import ray
    import ray.data

    from ..config import DEFAULT_CONFIG as _cfg

    if out_schema is None:
        out_schema = PAIRS_SCHEMA
    pairs = pairs.materialize()
    if pairs.count() <= DRIVER_DEDUP_MAX_ROWS:
        blocks = [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
        if not blocks:
            return ray.data.from_arrow(out_schema.empty_table())
        out = _first_distinct_pairs(
            pa.concat_tables(blocks).combine_chunks())
        return ray.data.from_arrow(out.cast(out_schema))
    if n_parts is None:
        n_parts = 2 * resolve_num_partitions(_cfg)
    keyed = pairs.map_batches(_add_pair_part(parts), batch_format="pyarrow")
    return exchange_map_groups(keyed, "pair_part", n_parts,
                               _dedup_pairs_part, out_schema)

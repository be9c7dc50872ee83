"""Approximate- and exact-distinct aggregates over a Dataset column.

The reference's HLL sketch (``/root/reference/src/core/src/sketch/
hyperloglog/mod.rs``) is a per-signature object; at training-data scale
the operator a pipeline actually needs is *dataset-level* distinct
counting (distinct tokens / n-grams / URLs across a corpus). Shape:

- ``approx_distinct``: every ``map_batches`` task folds its batch into a
  CONSTANT-SIZE ``2**p``-byte register array (a combiner — register
  arrays, not rows, leave the tasks), one row per block; the driver
  reduce is an element-wise max over ``n_blocks`` tiny arrays. No
  shuffle, no data-proportional driver state — this is the 100-TB path.
- ``distinct_count_exact``: the exact twin — values hash-partition
  through the coarse-key exchange, each partition counts its uniques,
  the driver sums ``n_parts`` integers. Costs a full shuffle of the
  (already-deduplicated-per-batch) values, which is what COUNT(DISTINCT)
  costs in any engine; exists as the SQL-checkable oracle twin and for
  when the answer must be exact.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hll import (
    hll_add_hashes, hll_cardinality, hll_empty, hll_merge,
)
from ..functions.segscore import hash_strings64, hash_strings_u64

_REG_SCHEMA = pa.schema([("registers", pa.binary())])


def tokens_of(batch_text: pa.ChunkedArray, ws_pattern: str) -> pa.Array:
    """Whitespace tokens of a text column, empty strings dropped —
    the SAME normalization the token/langid SQL oracles use
    (``docops._token_stats_batch``)."""
    text = pc.fill_null(batch_text, "")
    trimmed = pc.utf8_trim(
        pc.replace_substring_regex(text, ws_pattern, " "), " ")
    toks = pc.list_flatten(pc.split_pattern(trimmed, " "))
    return toks.filter(pc.not_equal(toks, ""))


def approx_distinct(ds, value_fn, p: int = 14) -> int:
    """HLL estimate of the number of distinct values produced by
    ``value_fn(batch) -> pyarrow Array of string`` across the Dataset.

    Per-block combiner + constant-size driver max-reduce. ``take_all`` is
    bounded by block count × 2**p bytes (p=14 → 16 KiB/row), never by
    data size."""

    def _regs(batch: pa.Table) -> pa.Table:
        regs = hll_empty(p)
        vals = value_fn(batch)
        if len(vals):
            hll_add_hashes(regs, hash_strings_u64(vals))
        return pa.table({"registers": pa.array([regs.tobytes()],
                                               pa.binary())})

    rows = ds.map_batches(_regs, batch_format="pyarrow").take_all()
    merged = hll_empty(p)
    for r in rows:
        merged = hll_merge(merged,
                           np.frombuffer(r["registers"], dtype=np.uint8))
    return hll_cardinality(merged)


def distinct_count_exact(ds, value_fn, group_parts: int = 256) -> int:
    """Exact distinct count of ``value_fn(batch)`` values: per-batch
    local dedup (combiner), hash-partition exchange on the value, unique
    count per partition, driver sum of ``n_parts`` ints."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from .exchange import exchange_map_groups

    def _local(batch: pa.Table) -> pa.Table:
        vals = value_fn(batch)
        uniq = pc.unique(vals)
        return pa.table({
            "value": uniq,
            "part": pa.array(hash_strings64(uniq) % group_parts, pa.int64()),
        })

    local = ds.map_batches(_local, batch_format="pyarrow")

    out_schema = pa.schema([("n", pa.int64())])

    def _count(part: pa.Table) -> pa.Table:
        n = len(pc.unique(part["value"])) if part.num_rows else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    counts = exchange_map_groups(local, "part", n_parts, _count, out_schema)
    return sum(r["n"] for r in counts.take_all())


def grouped_approx_distinct(ds, keys: list[str], col: str, p: int = 14,
                            distinct_as: str = "approx_n_distinct",
                            n_parts: int | None = None):
    """``approx count(DISTINCT col) GROUP BY keys`` — the constant-memory
    scale twin of `stages.agg.grouped_distinct_count`: when the distinct
    ``(keys, col)`` combo set itself is too large to shuffle (user ids
    per slice at 10^12 rows), per-group HLL registers are. Per block the
    values hash once and reduce to at most ``groups × 2^p`` sparse
    ``(keys, register, rank)`` rows (only registers actually hit);
    registers of one group co-locate on a key-hash exchange and merge by
    max; the Ertl-MLE estimate runs per group in-partition. Rows
    shipped: min(distinct combos, groups × 2^p) per block — bounded by
    the sketch, not the data. NULL values are skipped (SQL count
    distinct semantics)."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..functions.hll import _clz64, hll_counts, hll_mle
    from .exchange import exchange_map_groups

    if n_parts is None:
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    q = 64 - p

    def _key_hash(tbl: pa.Table) -> np.ndarray:
        key = pc.cast(tbl[keys[0]], pa.string()).combine_chunks()
        for k in keys[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(tbl[k], pa.string()).combine_chunks(), "|")
        return hash_strings64(key) % 1024

    def _partial(batch: pa.Table) -> pa.Table:
        vals = pc.cast(batch[col], pa.string()).combine_chunks()
        ok = pc.is_valid(vals)
        tbl = batch.filter(ok) if not pc.all(ok).as_py() else batch
        vals = pc.cast(tbl[col], pa.string()).combine_chunks()
        h = hash_strings_u64(vals)
        reg = (h & np.uint64((1 << p) - 1)).astype(np.int64)
        value = h >> np.uint64(p)
        rank = (_clz64(value) + 1 - p).astype(np.int64)
        sparse = tbl.select(keys).append_column(
            "reg", pa.array(reg, pa.int64())).append_column(
            "rank", pa.array(rank, pa.int64()))
        g = sparse.group_by(keys + ["reg"], use_threads=False).aggregate(
            [("rank", "max")]).rename_columns(keys + ["reg", "rank"])
        return g.append_column(
            "grp_part", pa.array(_key_hash(g), pa.int64()))

    sch = ds.schema()
    key_types = {k: sch.base_schema.field(k).type for k in keys}
    out_schema = pa.schema([(k, key_types[k]) for k in keys]
                           + [(distinct_as, pa.int64())])

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        g = part.drop_columns(["grp_part"]).group_by(
            keys + ["reg"], use_threads=False).aggregate(
            [("rank", "max")]).rename_columns(keys + ["reg", "rank"])
        # assemble per-group register arrays: sort rows by group, walk runs
        gid_key = pc.cast(g[keys[0]], pa.string()).combine_chunks()
        for k in keys[1:]:
            gid_key = pc.binary_join_element_wise(
                gid_key, pc.cast(g[k], pa.string()).combine_chunks(), "|")
        codes = pc.dictionary_encode(gid_key)
        if isinstance(codes, pa.ChunkedArray):
            codes = codes.combine_chunks()
        gid = np.asarray(codes.indices, np.int64)
        order = np.argsort(gid, kind="stable")
        gid_s = gid[order]
        reg_s = np.asarray(g["reg"], np.int64)[order]
        rank_s = np.asarray(g["rank"], np.int64)[order]
        starts = np.flatnonzero(np.r_[True, gid_s[1:] != gid_s[:-1]])
        bounds = np.append(starts, len(gid_s))
        ests, first_rows = [], []
        m = 1 << p
        for i in range(len(starts)):
            lo, hi = bounds[i], bounds[i + 1]
            regs = np.zeros(m, np.uint8)
            regs[reg_s[lo:hi]] = rank_s[lo:hi]
            ests.append(int(round(hll_mle(hll_counts(regs, q), p, q))))
            first_rows.append(int(order[lo]))
        out = g.select(keys).take(pa.array(first_rows, pa.int64()))
        return out.append_column(
            distinct_as, pa.array(ests, pa.int64())).cast(out_schema)

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    return exchange_map_groups(parts, "grp_part", n_parts, _merge,
                               out_schema)

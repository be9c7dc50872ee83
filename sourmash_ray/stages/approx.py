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

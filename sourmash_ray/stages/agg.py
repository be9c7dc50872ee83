"""Partial-aggregate + exchange: the engine's grouped-aggregation shape.

``Dataset.groupby().aggregate()`` in Ray 2.49 runs a sort-based shuffle
with a data-proportional serial component (the reason every wide step in
this engine uses the coarse-key exchange). For grouped sums/counts the
right shape is: Arrow ``group_by`` per block (single-threaded in-task —
Acero's own pool oversubscribes the node), hash-partition ONLY the
partial rows (blocks × n_groups, not the fact rows), merge per
partition. Exactness: every aggregate here is integer-valued (sums of
int64), so partial + merge is bit-identical to a single pass.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.segscore import hash_strings64


def grouped_sums(ds, keys: list[str], sum_cols: list[str],
                 count_as: str | None = None, n_parts: int | None = None):
    """groupby(keys) → integer sums of ``sum_cols`` (+ optional row count
    named ``count_as``), via block-local combiner + exchange. Key columns
    may be string or integer; output column names are
    ``sum_<col>`` / ``count_as``."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from .exchange import exchange_map_groups

    if n_parts is None:
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    out_fields = [(k, None) for k in keys]
    sum_names = [f"sum_{c}" for c in sum_cols]

    def _key_hash(tbl: pa.Table) -> np.ndarray:
        key = pc.cast(tbl[keys[0]], pa.string()).combine_chunks()
        for k in keys[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(tbl[k], pa.string()).combine_chunks(), "|")
        return hash_strings64(key) % 1024

    aggs = [(c, "sum") for c in sum_cols]
    if count_as:
        aggs.append((sum_cols[0] if sum_cols else keys[0], "count"))

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(keys, use_threads=False).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for c, name in zip(sum_cols, sum_names):
            cols[name] = pc.cast(g[f"{c}_sum"], pa.int64())
        if count_as:
            src = f"{sum_cols[0]}_count" if sum_cols else f"{keys[0]}_count"
            cols[count_as] = pc.cast(g[src], pa.int64())
        out = pa.table(cols)
        return out.append_column(
            "grp_part", pa.array(_key_hash(out), pa.int64()))

    merge_aggs = [(n, "sum") for n in sum_names]
    if count_as:
        merge_aggs.append((count_as, "sum"))

    sch = ds.schema()
    key_types = {k: sch.base_schema.field(k).type for k in keys}
    out_schema = pa.schema(
        [(k, key_types[k]) for k in keys]
        + [(n, pa.int64()) for n in sum_names]
        + ([(count_as, pa.int64())] if count_as else []))

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        g = part.group_by(keys, use_threads=False).aggregate(merge_aggs)
        cols = {k: g[k] for k in keys}
        for n in sum_names:
            cols[n] = pc.cast(g[f"{n}_sum"], pa.int64())
        if count_as:
            cols[count_as] = pc.cast(g[f"{count_as}_sum"], pa.int64())
        return pa.table(cols).cast(out_schema)

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    return exchange_map_groups(parts, "grp_part", n_parts, _merge,
                               out_schema)

"""Range-partitioned global sort with exact global rank (TeraSort shape).

``Dataset.sort`` in Ray 2.49 runs its sort shuffle with a
data-proportional serial component (same bottleneck that pushed every
grouped aggregate in this engine onto the coarse-key exchange — see
``stages/exchange.py``). A total order needs a RANGE exchange instead of
a hash one, so this stage does the classic three-pass sample sort:

1. **Sample** — a stride sample of the (key, tiebreak) pair per block
   (pruned to the two key columns), pooled on the driver and reduced to
   ``n_parts - 1`` composite boundaries at even order statistics.
   Driver bytes = blocks x sample_per_block x 16 — at 50k blocks and the
   default 128 samples that is ~100 MB, and ``sample_per_block`` shrinks
   as blocks grow since boundary quality depends on the TOTAL sample,
   not the per-block one.
2. **Assign + exchange** — each row's partition = number of boundaries
   lexicographically <= (key, tiebreak), fully vectorized (one
   ``searchsorted`` on the key + one per *distinct boundary key that
   collides*, bounded by n_parts, not rows); rows ride the one-pass
   exchange keyed by that partition id. Every partition therefore holds
   a contiguous slice of the global order — ranks can be stitched from
   per-partition counts without a second data shuffle.
3. **Local sort + rank stitch** — each partition lexsorts once and emits
   a local rank; a tiny per-partition count table (n_parts rows) turns
   into base offsets on the driver, and one streaming ``map_batches``
   adds ``base[part] + local_rank``. The data crosses the wire exactly
   once.

Ties on the full composite (key, tiebreak) all land in one partition (a
boundary cannot split equal composites), so ranks among exact duplicates
follow partition-internal stable order — callers wanting SQL
``row_number()`` determinism pass a unique tiebreak (e.g. the row id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _boundaries(sample_k: np.ndarray, sample_t: np.ndarray,
                n_parts: int) -> tuple[np.ndarray, np.ndarray]:
    """n_parts-1 composite boundaries at even order statistics of the
    pooled sample (lexicographic (key, tiebreak) order)."""
    if n_parts <= 1 or len(sample_k) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    order = np.lexsort((sample_t, sample_k))
    k_s, t_s = sample_k[order], sample_t[order]
    idx = (np.arange(1, n_parts, dtype=np.int64)
           * len(k_s)) // n_parts
    return k_s[idx], t_s[idx]


def _assign_parts(key: np.ndarray, tie: np.ndarray, b_key: np.ndarray,
                  b_tie: np.ndarray) -> np.ndarray:
    """Partition id per row = count of boundaries <= (key, tie)
    lexicographically. Vectorized: boundaries with b_key < key via one
    searchsorted; the tiebreak only decides among boundaries whose key
    EQUALS the row's key, and distinct boundary keys number < n_parts,
    so the refinement loop is bounded by the partition count."""
    part = np.searchsorted(b_key, key, side="left").astype(np.int64)
    if len(b_key) == 0:
        return part
    # distinct boundary keys and their runs inside the sorted boundary list
    runs = np.flatnonzero(np.r_[True, b_key[1:] != b_key[:-1]])
    ends = np.r_[runs[1:], len(b_key)]
    for lo, hi in zip(runs, ends):
        mask = key == b_key[lo]
        if mask.any():
            part[mask] += np.searchsorted(b_tie[lo:hi], tie[mask],
                                          side="right")
    return part


def range_partition_sort(ds, key: str, tiebreak: str,
                         rank_as: str = "global_rank",
                         n_parts: int | None = None,
                         sample_per_block: int = 128,
                         schema: pa.Schema | None = None):
    """Globally sort ``ds`` by ``(key, tiebreak)`` ascending (both int64,
    non-null) and attach the exact 1-based global rank (``row_number()
    OVER (ORDER BY key, tiebreak)``). Returns a Dataset whose blocks are
    the range partitions in order, each internally sorted.

    The input is consumed twice (a pruned 2-column sample pass, then the
    data pass); pass a re-readable Dataset (e.g. straight off
    ``read_parquet``) so no materialization is forced.
    """
    import ray
    import ray.data

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from .exchange import exchange_map_groups

    if n_parts is None:
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    sample_schema = pa.schema([("k", pa.int64()), ("t", pa.int64())])

    def _sample(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return sample_schema.empty_table()
        take = min(sample_per_block, n)
        idx = (np.arange(take, dtype=np.int64) * n) // take
        return pa.table({
            "k": pa.array(np.asarray(batch[key], np.int64)[idx]),
            "t": pa.array(np.asarray(batch[tiebreak], np.int64)[idx]),
        })

    pooled = ds.select_columns([key, tiebreak]).map_batches(
        _sample, batch_format="pyarrow").take_all()
    b_key, b_tie = _boundaries(
        np.array([r["k"] for r in pooled], np.int64),
        np.array([r["t"] for r in pooled], np.int64), n_parts)
    bounds_ref = ray.put((b_key, b_tie))

    def _tag(batch: pa.Table) -> pa.Table:
        bk, bt = ray.get(bounds_ref)
        part = _assign_parts(np.asarray(batch[key], np.int64),
                             np.asarray(batch[tiebreak], np.int64), bk, bt)
        return batch.append_column("range_part",
                                   pa.array(part, pa.int64()))

    if schema is None:
        # Dataset.schema() executes a block on mapped datasets (~0.8s);
        # callers that know their layout pass `schema=` to skip it
        s = ds.schema()
        schema = pa.schema([(n, s.base_schema.field(n).type)
                            for n in s.names])
    in_names = schema.names
    in_types = {n: schema.field(n).type for n in in_names}
    out_schema = pa.schema(
        [(n, in_types[n]) for n in in_names]
        + [("range_part", pa.int64()), ("lrank", pa.int64())])

    def _local_sort(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        order = np.lexsort((np.asarray(part[tiebreak], np.int64),
                            np.asarray(part[key], np.int64)))
        part = part.take(pa.array(order, pa.int64()))
        return part.append_column(
            "lrank", pa.array(np.arange(part.num_rows, dtype=np.int64)))

    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    sorted_parts = exchange_map_groups(tagged, "range_part", n_parts,
                                       _local_sort, out_schema)

    # stitch: per-partition counts (n_parts rows) -> base offsets
    def _count(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.schema([("p", pa.int64()),
                              ("n", pa.int64())]).empty_table()
        p = np.asarray(batch["range_part"], np.int64)
        uniq, cnt = np.unique(p, return_counts=True)
        return pa.table({"p": pa.array(uniq), "n": pa.array(cnt)})

    counts = np.zeros(n_parts, dtype=np.int64)
    for r in sorted_parts.map_batches(
            _count, batch_format="pyarrow").take_all():
        counts[r["p"]] += r["n"]
    base = np.zeros(n_parts, dtype=np.int64)
    base[1:] = np.cumsum(counts)[:-1]
    base_ref = ray.put(base)

    def _stitch(batch: pa.Table) -> pa.Table:
        b = ray.get(base_ref)
        p = np.asarray(batch["range_part"], np.int64)
        lr = np.asarray(batch["lrank"], np.int64)
        batch = batch.drop_columns(["range_part", "lrank"])
        return batch.append_column(
            rank_as, pa.array(b[p] + lr + 1, pa.int64()))

    return sorted_parts.map_batches(_stitch, batch_format="pyarrow")

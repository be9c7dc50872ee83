"""Coarse-key partition exchange — a fully parallel map/reduce shuffle.

Why not ``Dataset.groupby``: Ray 2.49's sort-based shuffle runs its
SortMap/SortReduce suboperators with a serial component proportional to the
data (observed: ~5s per 10M-row groupby regardless of CPU count), which
caps the pipeline's scaling efficiency. Our shuffle keys are already COARSE
integers (``conv_part`` / ``band_part`` / ``pair_part`` in
``0..group_parts``), so a sort is pure overhead: the exchange only needs
every equal key in one partition.

Shape (the classic exchange; raw Ray tasks because the Dataset API's
implementation — not its semantics — is the bottleneck here):

- ``split`` tasks: one per input block, ``num_returns=n_parts``; vectorized
  stable-argsort + slice of the block by ``key % n_parts``.
- ``reduce`` tasks: one per partition; concat its sub-blocks (zero-copy
  Arrow) and apply the caller's vectorized merge function.

Determinism: partition assignment is a pure function of the key; reduce
concatenation follows input-block order; every merge function sorts
internally. Objects created: n_blocks × n_parts small refs — bounded by
(2·CPUs)² per stage.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _split_block(block: pa.Table, key_col: str, n_parts: int):
    if block.num_rows == 0:
        return tuple([None] * n_parts) if n_parts > 1 else None
    if block.schema.metadata:
        # pandas dict metadata defeats Ray's schema-hash dedup when these
        # slices are later re-ingested ("Failed to hash the schemas" spam)
        block = block.replace_schema_metadata(None)
    keys = np.asarray(block[key_col], dtype=np.int64) % n_parts
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    block = block.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(sorted_keys, np.arange(n_parts + 1))
    out = []
    for p in range(n_parts):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        out.append(block.slice(lo, hi - lo) if hi > lo else None)
    return tuple(out) if n_parts > 1 else out[0]


def _reduce_part(merge_fn, out_schema: pa.Schema, part_path, *subs):
    import os

    import pyarrow.parquet as pq

    if part_path is not None and os.path.exists(part_path):
        # partition-level resume: this reduce partition already completed
        # in a previous run with the same fingerprint — read it back
        return pq.read_table(part_path)
    tables = [t.replace_schema_metadata(None) if t.schema.metadata else t
              for t in subs if t is not None and t.num_rows]
    if not tables:
        out = out_schema.empty_table()
    else:
        part = pa.concat_tables(tables).combine_chunks()
        out = merge_fn(part)
        if not out.num_rows:
            out = out_schema.empty_table()
    if out.schema.metadata:
        # pandas dict metadata defeats Ray's schema dedup downstream
        # ("Failed to hash the schemas" warning spam in from_arrow_refs)
        out = out.replace_schema_metadata(None)
    if part_path is not None:
        tmp = f"{part_path}.tmp{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, part_path)  # atomic: a crash never leaves half files
    return out


def _prepare_checkpoint_dir(checkpoint_dir: str, fingerprint: str) -> None:
    """Create/validate the per-partition checkpoint dir: a fingerprint
    mismatch (different input or config) clears stale partitions."""
    import json
    import os
    import shutil

    marker = os.path.join(checkpoint_dir, "_FINGERPRINT.json")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("fingerprint") == fingerprint:
                return
        shutil.rmtree(checkpoint_dir, ignore_errors=True)
    os.makedirs(checkpoint_dir, exist_ok=True)
    with open(marker, "w") as f:
        json.dump({"fingerprint": fingerprint}, f)


def _super_split(block: pa.Table, key_col: str, n_parts: int,
                 n_super: int):
    """Level-1 split of the two-level exchange: route rows by
    ``(key % n_parts) % n_super`` (the super-partition)."""
    if block.num_rows == 0:
        return tuple([None] * n_super) if n_super > 1 else None
    if block.schema.metadata:
        block = block.replace_schema_metadata(None)
    keys = (np.asarray(block[key_col], dtype=np.int64) % n_parts) % n_super
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    block = block.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(sorted_keys, np.arange(n_super + 1))
    out = []
    for p in range(n_super):
        lo, hi = int(bounds[p]), int(bounds[p + 1])
        out.append(block.slice(lo, hi - lo) if hi > lo else None)
    return tuple(out) if n_super > 1 else out[0]


def _super_refine(key_col: str, n_parts: int, n_super: int, super_id: int,
                  n_sub: int, *subs):
    """Level-2: concat one super-partition and split it into its final
    partitions (those ``p`` with ``p % n_super == super_id``, i.e.
    ``p = super_id + j*n_super`` for ``j`` in range(n_sub))."""
    tables = [t for t in subs if t is not None and t.num_rows]
    if not tables:
        return tuple([None] * n_sub) if n_sub > 1 else None
    tbl = pa.concat_tables(tables).combine_chunks()
    keys = (np.asarray(tbl[key_col], dtype=np.int64) % n_parts) // n_super
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    tbl = tbl.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(sorted_keys, np.arange(n_sub + 1))
    out = []
    for j in range(n_sub):
        lo, hi = int(bounds[j]), int(bounds[j + 1])
        out.append(tbl.slice(lo, hi - lo) if hi > lo else None)
    return tuple(out) if n_sub > 1 else out[0]


def exchange_map_groups(ds, key_col: str, n_parts: int, merge_fn,
                        out_schema: pa.Schema,
                        checkpoint_dir: str | None = None,
                        fingerprint: str = "",
                        max_fanout: int = 256):
    """Partition ``ds`` by ``key_col % n_parts`` and apply ``merge_fn`` to
    each partition's concatenated Arrow table. Returns a Dataset with one
    block per partition (``out_schema`` used for empty partitions).

    ``merge_fn`` must tolerate multiple distinct key values per call — the
    same contract as the coarse-partition groupby it replaces.

    ``checkpoint_dir``: opt-in PARTITION-level resume (the north rule's
    "resume mid-shuffle"): each reduce partition persists atomically as
    ``part-NNNNN.parquet``; a rerun with the same fingerprint skips every
    completed partition's merge work, recomputing only missing ones.
    """
    if checkpoint_dir is not None:
        # fold the partition count into the fingerprint: n_parts derives
        # from the live cluster CPU count, so resuming on a different-sized
        # session must invalidate the checkpoint (part files were written
        # under a different `key % n_parts` modulus)
        _prepare_checkpoint_dir(checkpoint_dir,
                                f"{fingerprint}|n_parts={n_parts}")

    import math
    import os

    reduce_r = ray.remote(_reduce_part)

    block_refs = ds.to_arrow_refs()
    if not block_refs:
        return ray.data.from_arrow(out_schema.empty_table())

    def _ckpt(p):
        return (os.path.join(checkpoint_dir, f"part-{p:05d}.parquet")
                if checkpoint_dir is not None else None)

    if n_parts > max_fanout:
        # Two-level exchange (SCALE.md §2): a naive all-to-all creates
        # blocks × n_parts objects — at cluster scale (50k blocks × 10^5
        # partitions) that is too many objects for the object store /
        # scheduler. Route through √n_parts super-partitions first:
        # objects = blocks × n_super + n_parts, at the cost of one extra
        # materialization of the data (on a real cluster level 1 is the
        # per-node combine, so the extra hop is node-local).
        n_super = int(math.ceil(math.sqrt(n_parts)))
        n_sub = int(math.ceil(n_parts / n_super))
        split1 = ray.remote(num_returns=n_super)(_super_split)
        refine = ray.remote(num_returns=n_sub)(_super_refine)
        level1 = [split1.remote(b, key_col, n_parts, n_super)
                  for b in block_refs]
        cols1 = [[t] if n_super == 1 else list(t) for t in level1]
        refined = [
            refine.remote(key_col, n_parts, n_super, s, n_sub,
                          *[cols1[i][s] for i in range(len(cols1))])
            for s in range(n_super)
        ]
        cols2 = [[t] if n_sub == 1 else list(t) for t in refined]
        out_refs = [
            reduce_r.remote(merge_fn, out_schema, _ckpt(p),
                            cols2[p % n_super][p // n_super])
            for p in range(n_parts)
        ]
        return ray.data.from_arrow_refs(out_refs)

    split = ray.remote(num_returns=n_parts)(_split_block)
    parts = [split.remote(b, key_col, n_parts) for b in block_refs]
    cols = [[p] if n_parts == 1 else list(p) for p in parts]
    out_refs = [
        reduce_r.remote(
            merge_fn, out_schema, _ckpt(p),
            *[cols[i][p] for i in range(len(cols))])
        for p in range(n_parts)
    ]
    return ray.data.from_arrow_refs(out_refs)

"""Connected components over verified duplicate edges → cluster labels.

The reference has no clustering operator (its ``plot`` does driver-side
scipy hierarchical clustering on the dense matrix,
``/root/reference/src/sourmash/fig.py:26-94`` — impossible at 10^12-turn
scale). Here: distributed min-label propagation, a bounded number of
``join + groupby().min()`` rounds (cf. the BTS/label-prop literature in
PAPERS.md). Dup components are stars/cliques (diameter ≤ ~2 after the LSH
star+chain edges), so convergence is a handful of rounds; ``cc_max_iters``
caps the loop defensively.

Convergence detection: labels only ever decrease, so the global sum of
``murmur-mixed (node, label)`` checksums is stable iff no label changed.
This costs one small aggregate per round instead of a full join-diff.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, DEFAULT_CONFIG, clamped_join_partitions
from ..functions.perm import _fmix64_vec


def _checksum_batch(batch: pa.Table) -> pa.Table:
    # order-insensitive multiset checksum of (node,label) rows.
    # zlib.crc32 — deterministic across worker processes (Python's str hash
    # is salted per process and must NOT be used here).
    import zlib

    h1 = np.array([zlib.crc32(x.encode()) for x in batch["node"].to_pylist()],
                  dtype=np.uint64)
    h2 = np.array([zlib.crc32(x.encode()) for x in batch["label"].to_pylist()],
                  dtype=np.uint64)
    old = np.seterr(over="ignore")
    try:
        mixed = _fmix64_vec(h1 * np.uint64(0x9E3779B97F4A7C15) ^ h2)
        s = np.uint64(0)
        for v in mixed:
            s = s + v
    finally:
        np.seterr(**old)
    return pa.table({"cksum": pa.array([int(s)], pa.uint64())})


def _labels_checksum(labels) -> int:
    parts = labels.map_batches(_checksum_batch, batch_format="pyarrow")
    total = 0
    for row in parts.take_all():
        total = (total + row["cksum"]) & 0xFFFFFFFFFFFFFFFF
    return total


def connected_components(edges, cfg: EngineConfig = DEFAULT_CONFIG):
    """edges Dataset (a, b) → labels Dataset (node, label=min reachable id).

    Only nodes that appear in an edge are labeled; callers union singleton
    self-labels afterwards (``assign_clusters``).
    """
    import ray.data

    e = edges.select_columns(["a", "b"])
    sym = e.rename_columns({"a": "src", "b": "dst"}).union(
        e.rename_columns({"a": "dst", "b": "src"})
    ).materialize()
    n_sym = sym.count()
    if n_sym == 0:
        return ray.data.from_arrow(pa.schema(
            [("node", pa.string()), ("label", pa.string())]).empty_table())

    labels = (
        sym.groupby("dst").min("src")
        .rename_columns({"dst": "node", "min(src)": "label"})
    )
    # include self so a node's own id competes as a label
    labels = labels.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "label": pa.compute.min_element_wise(t["label"], t["node"]),
        }),
        batch_format="pyarrow",
    ).materialize()

    prev = _labels_checksum(labels)
    for _ in range(cfg.exec.cc_max_iters):
        # propagate: each node sends its label to every neighbour
        msgs = sym.join(
            labels,
            join_type="inner",
            num_partitions=clamped_join_partitions(cfg, n_sym, labels.count()),
            on=("src",),
            right_on=("node",),
        ).select_columns(["dst", "label"]).rename_columns({"dst": "node"})
        labels = (
            msgs.union(labels)
            .groupby("node").min("label")
            .rename_columns({"min(label)": "label"})
            .materialize()
        )
        cur = _labels_checksum(labels)
        if cur == prev:
            break
        prev = cur
    return labels


def assign_clusters(sigs, edges, cfg: EngineConfig = DEFAULT_CONFIG):
    """signatures + dup edges → (conv_id, cluster_id) for EVERY conversation
    (nodes without edges label themselves) — SURVEY.md §1.4 cluster table."""
    labels = connected_components(edges, cfg)
    n_labels = labels.count()
    ids = sigs.select_columns(["conv_id"])
    if n_labels == 0:
        return ids.map_batches(
            lambda t: pa.table({"conv_id": t["conv_id"],
                                "cluster_id": t["conv_id"]}),
            batch_format="pyarrow",
        )
    joined = ids.join(
        labels,
        join_type="left_outer",
        num_partitions=clamped_join_partitions(cfg, sigs.count(), n_labels),
        on=("conv_id",),
        right_on=("node",),
    )
    return joined.map_batches(
        lambda t: pa.table({
            "conv_id": t["conv_id"],
            "cluster_id": pa.compute.coalesce(t["label"], t["conv_id"]),
        }),
        batch_format="pyarrow",
    )

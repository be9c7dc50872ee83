"""Connected components over verified duplicate edges → cluster labels.

The reference has no clustering operator (its ``plot`` does driver-side
scipy hierarchical clustering on the dense matrix,
``/root/reference/src/sourmash/fig.py:26-94`` — impossible at 10^12-turn
scale). Two paths:

- **driver union-find** (default below ``driver_cc_max_edges``): dup edges
  are a tiny fraction of the corpus; collecting ≤5M edges to the driver and
  running path-halving union-find is faster and exactly equivalent.
- **distributed min-label propagation** (above the cutoff): bounded
  ``join + groupby().min()`` rounds (cf. the BTS/label-prop literature in
  PAPERS.md). Dup components are stars/cliques (diameter ≤ ~2 after the
  LSH star+chain edges), so convergence is a handful of rounds;
  ``cc_max_iters`` caps the loop defensively. Convergence detection uses a
  deterministic crc32 multiset checksum (labels only ever decrease, so the
  checksum is stable iff no label changed); Python's salted str hash must
  NOT be used across worker processes.

The final label attach to the signatures dataset streams: labels are
ray.put-broadcast and joined per batch with local Acero when small, else
hash-shuffle joined.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, DEFAULT_CONFIG, clamped_join_partitions
from ..functions.perm import _fmix64_vec

_LABEL_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])


def _driver_union_find(edge_rows) -> pa.Table:
    """Path-halving union-find over (a, b) rows; labels = min member id."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    nodes = list(parent)
    labels = [find(n) for n in nodes]
    return pa.table({"node": pa.array(nodes, pa.string()),
                     "label": pa.array(labels, pa.string())})


def _checksum_batch(batch: pa.Table) -> pa.Table:
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


def _label_propagation(sym, n_sym: int, cfg: EngineConfig):
    labels = (
        sym.groupby("dst").min("src")
        .rename_columns({"dst": "node", "min(src)": "label"})
    )
    labels = labels.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "label": pa.compute.min_element_wise(t["label"], t["node"]),
        }),
        batch_format="pyarrow",
    ).materialize()

    prev = _labels_checksum(labels)
    for _ in range(cfg.exec.cc_max_iters):
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


def connected_components(edges, cfg: EngineConfig = DEFAULT_CONFIG):
    """edges Dataset (a, b) → labels Dataset (node, label=min reachable id).

    Only nodes that appear in an edge are labeled; callers union singleton
    self-labels afterwards (``assign_clusters``)."""
    import ray.data

    edges = edges.select_columns(["a", "b"]).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_arrow(_LABEL_SCHEMA.empty_table())
    if n_edges <= cfg.exec.driver_cc_max_edges:
        def _edge_iter():
            # iter_batches (columnar) — iter_rows is ~20k rows/s
            for b in edges.iter_batches(batch_format="pyarrow",
                                        batch_size=65536):
                yield from zip(b["a"].to_pylist(), b["b"].to_pylist())

        return ray.data.from_arrow(_driver_union_find(_edge_iter()))
    sym = edges.rename_columns({"a": "src", "b": "dst"}).union(
        edges.rename_columns({"a": "dst", "b": "src"})
    ).materialize()
    return _label_propagation(sym, sym.count(), cfg)


import ray as _ray


@_ray.remote
def _build_label_broadcast(*blocks):
    """(sorted S32 node keys, aligned label StringArray) for the broadcast
    attach — built off-driver."""
    tables = [t for t in blocks if t.num_rows]
    if not tables:
        return np.empty(0, dtype="S32"), pa.array([], pa.string())
    tbl = pa.concat_tables(tables).combine_chunks()
    nodes = np.array(tbl["node"].to_pylist(), dtype=bytes)
    order = np.argsort(nodes, kind="stable")
    labels = tbl["label"].combine_chunks().take(
        pa.array(order, pa.int64()))
    return nodes[order], labels


def assign_clusters(sigs, edges, cfg: EngineConfig = DEFAULT_CONFIG):
    """signatures + dup edges → (conv_id, cluster_id) for EVERY conversation
    (nodes without edges label themselves) — SURVEY.md §1.4 cluster table."""
    import ray

    labels = connected_components(edges, cfg).materialize()
    n_labels = labels.count()
    ids = sigs.select_columns(["conv_id"])
    if n_labels == 0:
        return ids.map_batches(
            lambda t: pa.table({"conv_id": t["conv_id"],
                                "cluster_id": t["conv_id"]}),
            batch_format="pyarrow",
        )
    if labels.size_bytes() <= cfg.exec.broadcast_bytes_limit:
        # broadcast attach: sorted S32 node keys + label array built in one
        # remote task, searchsorted gather per batch (left-outer semantics:
        # unlabeled nodes keep their own id)
        ref = _build_label_broadcast.remote(*labels.to_arrow_refs())

        def _attach(batch: pa.Table) -> pa.Table:
            from .verify import _common_width

            nodes_s, label_arr = ray.get(ref)
            keys, nodes_w = _common_width(
                np.array(batch["conv_id"].to_pylist(), dtype=bytes), nodes_s)
            pos = np.searchsorted(nodes_w, keys)
            pos_c = np.minimum(pos, max(len(nodes_w) - 1, 0))
            hit = nodes_w[pos_c] == keys if len(nodes_w) else \
                np.zeros(len(keys), bool)
            out = pa.compute.if_else(
                pa.array(hit),
                label_arr.take(pa.array(pos_c, pa.int64())),
                batch["conv_id"].combine_chunks())
            return pa.table({"conv_id": batch["conv_id"],
                             "cluster_id": out})

        return ids.map_batches(_attach, batch_format="pyarrow")

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

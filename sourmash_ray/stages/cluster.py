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

from ..functions.segscore import _to_bytes_array
import pyarrow as pa

from ..config import EngineConfig, DEFAULT_CONFIG
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
    from ..functions.segscore import hash_strings64

    h1 = hash_strings64(batch["node"]).astype(np.uint64)
    h2 = hash_strings64(batch["label"]).astype(np.uint64)
    old = np.seterr(over="ignore")
    try:
        mixed = _fmix64_vec(h1 * np.uint64(0x9E3779B97F4A7C15) ^ h2)
        s = np.uint64(mixed.sum(dtype=np.uint64)) if mixed.size else \
            np.uint64(0)
    finally:
        np.seterr(**old)
    return pa.table({"cksum": pa.array([int(s)], pa.uint64())})


def _labels_checksum(labels) -> int:
    parts = labels.map_batches(_checksum_batch, batch_format="pyarrow")
    total = 0
    for row in parts.take_all():
        total = (total + row["cksum"]) & 0xFFFFFFFFFFFFFFFF
    return total


_PROP_SCHEMA = pa.schema([
    ("key", pa.int64()),
    ("src", pa.string()),      # edge source / label node
    ("dst", pa.string()),      # edge destination (null for label rows)
    ("label", pa.string()),    # label value (null for edge rows)
    ("side", pa.int8()),       # 0 = edge, 1 = label
])


def _id_hash64_col(ids) -> np.ndarray:
    from ..functions.segscore import hash_strings64

    return hash_strings64(ids)


def _min_label_part(part: pa.Table) -> pa.Table:
    """(node, label) rows → min label per node, vectorized."""
    if part.num_rows == 0:
        return _LABEL_SCHEMA.empty_table()
    part = part.select(["node", "label"]).sort_by(
        [("node", "ascending"), ("label", "ascending")])
    nodes = _to_bytes_array(part["node"])
    first = np.ones(len(nodes), bool)
    if len(nodes) > 1:
        first[1:] = nodes[1:] != nodes[:-1]
    sel = pa.array(np.flatnonzero(first), pa.int64())
    return part.take(sel)


def _label_propagation(sym, n_sym: int, cfg: EngineConfig):
    """Min-label propagation on the coarse exchange (no Dataset.join):
    each round, edge rows meet label rows in an id-hash co-group (labels
    gathered onto edges by searchsorted), then (node, candidate-label)
    messages union the previous labels and min-reduce per node."""
    from ..config import resolve_num_partitions
    from .exchange import exchange_map_groups

    n_parts = 2 * resolve_num_partitions(cfg)

    def _edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": pa.array(_id_hash64_col(batch["src"]), pa.int64()),
            "src": batch["src"],
            "dst": batch["dst"],
            "label": pa.nulls(n, pa.string()),
            "side": pa.array(np.zeros(n, np.int8())),
        }).cast(_PROP_SCHEMA)

    def _label_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": pa.array(_id_hash64_col(batch["node"]), pa.int64()),
            "src": batch["node"],
            "dst": pa.nulls(n, pa.string()),
            "label": batch["label"],
            "side": pa.array(np.ones(n, np.int8())),
        }).cast(_PROP_SCHEMA)

    def _send(part: pa.Table) -> pa.Table:
        side = np.asarray(part["side"], dtype=np.int8)
        lbl_tbl = part.filter(pa.array(side == 1))
        edg_tbl = part.filter(pa.array(side == 0))
        if lbl_tbl.num_rows == 0 or edg_tbl.num_rows == 0:
            return _LABEL_SCHEMA.empty_table()
        nodes = _to_bytes_array(lbl_tbl["src"])
        order = np.argsort(nodes, kind="stable")
        nodes = nodes[order]
        lbls = lbl_tbl["label"].combine_chunks().take(
            pa.array(order, pa.int64()))
        srcs = _to_bytes_array(edg_tbl["src"])
        w = max(nodes.dtype.itemsize, srcs.dtype.itemsize, 1)
        nodes_w = nodes.astype(f"S{w}")
        srcs_w = srcs.astype(f"S{w}")
        pos = np.searchsorted(nodes_w, srcs_w)
        pos_c = np.minimum(pos, max(len(nodes_w) - 1, 0))
        hit = nodes_w[pos_c] == srcs_w
        keep = pa.array(np.flatnonzero(hit), pa.int64())
        return pa.table({
            "node": edg_tbl["dst"].take(keep),
            "label": lbls.take(pa.array(pos_c[np.asarray(keep)], pa.int64())),
        }).cast(_LABEL_SCHEMA)

    def _keyed_labels(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "key", pa.array(_id_hash64_col(batch["node"]), pa.int64()))

    # init: every node labels itself (derived from edge endpoints)
    def _self_labels(batch: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([batch["src"].combine_chunks(),
                                 batch["dst"].combine_chunks()])
        return pa.table({"node": vals, "label": vals})

    labels = exchange_map_groups(
        sym.map_batches(_self_labels, batch_format="pyarrow")
           .map_batches(_keyed_labels, batch_format="pyarrow"),
        "key", n_parts, _min_label_part, _LABEL_SCHEMA)

    def _jump_edge_rows(batch: pa.Table) -> pa.Table:
        # pointer-jumping: treat each (node, label) as an edge label→node,
        # so _send gathers label(label) and emits (node, label-of-label) —
        # path lengths halve per round, making convergence O(log diameter)
        n = batch.num_rows
        return pa.table({
            "key": pa.array(_id_hash64_col(batch["label"]), pa.int64()),
            "src": batch["label"],
            "dst": batch["node"],
            "label": pa.nulls(n, pa.string()),
            "side": pa.array([0] * n, pa.int8()),
        }).cast(_PROP_SCHEMA)

    edges_keyed = sym.map_batches(_edge_rows,
                                  batch_format="pyarrow").materialize()

    prev = _labels_checksum(labels)
    converged = False
    for _ in range(cfg.exec.cc_max_iters):
        both = edges_keyed.union(
            labels.map_batches(_label_rows, batch_format="pyarrow"),
            labels.map_batches(_jump_edge_rows, batch_format="pyarrow"))
        msgs = exchange_map_groups(both, "key", n_parts, _send,
                                   _LABEL_SCHEMA)
        labels = exchange_map_groups(
            msgs.union(labels).map_batches(_keyed_labels,
                                           batch_format="pyarrow"),
            "key", n_parts, _min_label_part, _LABEL_SCHEMA)
        cur = _labels_checksum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        import logging

        logging.getLogger(__name__).warning(
            "label propagation exited after cc_max_iters=%d rounds without "
            "checksum convergence — components wider than the round budget "
            "may carry split labels", cfg.exec.cc_max_iters)
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
    nodes = _to_bytes_array(tbl["node"])
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
                _to_bytes_array(batch["conv_id"]), nodes_s)
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

    # beyond-broadcast scale path: id-hash exchange co-group attach (the
    # verify.py _score_pairs_exchange pattern) — NOT Dataset.join, whose
    # hash partitioner is a per-row Python hash() loop and which breaks on
    # empty partitions (Ray 2.49).
    return _assign_exchange(ids, labels, cfg)


_ASSIGN_SCHEMA = pa.schema([
    ("key", pa.int64()),
    ("conv_id", pa.string()),   # id row: the conversation; label row: node
    ("label", pa.string()),     # null for id rows
    ("side", pa.int8()),        # 0 = id, 1 = label
])

_ASSIGN_OUT = pa.schema([("conv_id", pa.string()),
                         ("cluster_id", pa.string())])


def _assign_exchange(ids, labels, cfg: EngineConfig):
    """Left-outer label attach on the coarse exchange: conv_id rows meet
    label rows keyed by the same id-hash; inside each partition a sorted
    searchsorted gather assigns cluster_id (own id on miss)."""
    from ..config import resolve_num_partitions
    from .exchange import exchange_map_groups

    n_parts = 2 * resolve_num_partitions(cfg)

    def _id_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": pa.array(_id_hash64_col(batch["conv_id"]), pa.int64()),
            "conv_id": batch["conv_id"],
            "label": pa.nulls(n, pa.string()),
            "side": pa.array(np.zeros(n, np.int8())),
        }).cast(_ASSIGN_SCHEMA)

    def _lab_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "key": pa.array(_id_hash64_col(batch["node"]), pa.int64()),
            "conv_id": batch["node"],
            "label": batch["label"],
            "side": pa.array(np.ones(n, np.int8())),
        }).cast(_ASSIGN_SCHEMA)

    def _attach_part(part: pa.Table) -> pa.Table:
        from .verify import _common_width

        side = np.asarray(part["side"], dtype=np.int8)
        id_tbl = part.filter(pa.array(side == 0))
        if id_tbl.num_rows == 0:
            return _ASSIGN_OUT.empty_table()
        lab_tbl = part.filter(pa.array(side == 1))
        own = id_tbl["conv_id"].combine_chunks()
        if lab_tbl.num_rows == 0:
            return pa.table({"conv_id": own,
                             "cluster_id": own}).cast(_ASSIGN_OUT)
        nodes = _to_bytes_array(lab_tbl["conv_id"])
        order = np.argsort(nodes, kind="stable")
        nodes = nodes[order]
        lbls = lab_tbl["label"].combine_chunks().take(
            pa.array(order, pa.int64()))
        keys, nodes_w = _common_width(_to_bytes_array(own), nodes)
        pos = np.searchsorted(nodes_w, keys)
        pos_c = np.minimum(pos, max(len(nodes_w) - 1, 0))
        hit = nodes_w[pos_c] == keys
        out = pa.compute.if_else(
            pa.array(hit), lbls.take(pa.array(pos_c, pa.int64())), own)
        return pa.table({"conv_id": own,
                         "cluster_id": out}).cast(_ASSIGN_OUT)

    both = ids.map_batches(_id_rows, batch_format="pyarrow").union(
        labels.map_batches(_lab_rows, batch_format="pyarrow"))
    return exchange_map_groups(both, "key", n_parts, _attach_part,
                               _ASSIGN_OUT)

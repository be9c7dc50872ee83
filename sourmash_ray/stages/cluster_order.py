"""Compare-matrix cluster ordering — the computational half of ``plot``.

The reference renders ``compare`` output as a dendrogram + reordered
heatmap (``/root/reference/src/sourmash/fig.py:26-94``:
``scipy.cluster.hierarchy.linkage(D, method="single")`` then the
dendrogram's ``leaves`` permutation). matplotlib/scipy stay out of scope
here; what a ``compare`` user actually consumes next is the *ordering* —
so this module computes single-linkage hierarchical clustering from the
sparse pair rows directly (no dense matrix) and emits, per signature:

- ``leaf_order``: the dendrogram leaf permutation (cluster members land
  contiguously — the row/column order the reference's heatmap uses),
- ``cluster_id``: the flat cluster at a distance cut (connected
  components of pairs with ``dist <= cut``), numbered by first leaf,
- ``merge_dist``: the distance at which the leaf first merges (1.0 when
  it never does — singleton at the cut).

Single linkage over sparse pairs is exactly Kruskal's MST: process edges
ascending; each union of two live clusters is one dendrogram merge.
Missing pairs are implicitly at distance > any observed edge (the sparse
rows carry only scored pairs), so disconnected components surface as
separate roots, ordered by their smallest leaf. Determinism: edges sort
by ``(dist, min_id, max_id)``; a merge's left child is the subtree whose
smallest leaf index is smaller.

At scale this runs over the *verified pair list* (output of the LSH /
verify stages — edge count is dup-rate bounded, never O(n²)), so the
driver-side Kruskal is bounded by the same budget as union-find
clustering (``pipelines/cluster.py``); the dense all-pairs form only
exists in compare's explicitly small-n mode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ORDER_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("leaf_order", pa.int64()),
    ("cluster_id", pa.int64()),
    ("merge_dist", pa.float64()),
])


def single_linkage_leaf_order(ids, pair_a, pair_b, dist,
                              cut: float = 1.0) -> pa.Table:
    """Dendrogram leaf ordering + flat clusters from sparse pair rows.

    ``ids``: every signature id (singletons included). ``pair_a`` /
    ``pair_b`` / ``dist``: sparse symmetric pair rows (each unordered
    pair once). ``cut``: flat-cluster threshold (components of edges
    with ``dist <= cut``). Returns :data:`ORDER_SCHEMA` rows.
    """
    ids = sorted(ids)
    idx = {s: i for i, s in enumerate(ids)}
    n = len(ids)
    if n == 0:
        return ORDER_SCHEMA.empty_table()

    a = np.fromiter((idx[s] for s in pair_a), np.int64, len(pair_a))
    b = np.fromiter((idx[s] for s in pair_b), np.int64, len(pair_b))
    d = np.asarray(dist, np.float64)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    order = np.lexsort((hi, lo, d))

    # Kruskal with dendrogram bookkeeping. Cluster ids: leaves 0..n-1,
    # internal nodes n..2n-2. parent[] is the union-find; cluster_of[]
    # maps a union-find root to its current dendrogram node; min_leaf[]
    # keys deterministic left/right placement and root ordering.
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    cluster_of = np.arange(n, dtype=np.int64)
    min_leaf = list(range(n)) + [0] * (n - 1)
    children: list[tuple[int, int]] = [(-1, -1)] * (2 * n - 1)
    merge_dist = np.full(n, 1.0)
    next_cluster = n
    for e in order:
        ra, rb = find(int(lo[e])), find(int(hi[e]))
        if ra == rb:
            continue
        ca, cb = int(cluster_of[ra]), int(cluster_of[rb])
        left, right = ((ca, cb) if min_leaf[ca] <= min_leaf[cb]
                       else (cb, ca))
        children[next_cluster] = (left, right)
        min_leaf[next_cluster] = min_leaf[left]
        parent[rb] = ra
        cluster_of[ra] = next_cluster
        next_cluster += 1
        if next_cluster == 2 * n - 1:
            break

    # per-leaf first-merge distance: replay is avoidable — a leaf's first
    # merge is the cheapest edge incident to it that Kruskal accepted OR
    # skipped (single linkage: the leaf joins a cluster at exactly the
    # smallest distance of any edge touching it).
    if len(d):
        np.minimum.at(merge_dist, lo, d)
        np.minimum.at(merge_dist, hi, d)

    # roots of the (possibly) forest, ordered by smallest leaf
    roots = sorted({int(cluster_of[find(i)]) for i in range(n)},
                   key=lambda c: min_leaf[c])

    leaf_order = np.empty(n, np.int64)
    pos = 0
    for root in roots:
        stack = [root]
        while stack:
            node = stack.pop()
            left, right = children[node]
            if left < 0:
                leaf_order[node] = pos
                pos += 1
            else:
                stack.append(right)  # left visited first (LIFO)
                stack.append(left)

    # flat clusters at the cut: components of edges with dist <= cut,
    # numbered by the cluster's first leaf in leaf_order
    cparent = np.arange(n, dtype=np.int64)

    def cfind(x: int) -> int:
        root = x
        while cparent[root] != root:
            root = cparent[root]
        while cparent[x] != root:
            cparent[x], x = root, cparent[x]
        return root

    for e in order:
        if d[e] > cut:
            break
        ra, rb = cfind(int(lo[e])), cfind(int(hi[e]))
        if ra != rb:
            cparent[rb] = ra
    comp = np.fromiter((cfind(i) for i in range(n)), np.int64, n)
    first_pos = np.full(n, np.iinfo(np.int64).max)
    np.minimum.at(first_pos, comp, leaf_order)
    rank = {root: r for r, root in enumerate(
        sorted(set(comp.tolist()), key=lambda c: first_pos[c]))}
    cluster_id = np.fromiter((rank[int(c)] for c in comp), np.int64, n)

    return pa.table({
        "id": pa.array(ids, pa.string()),
        "leaf_order": pa.array(leaf_order, pa.int64()),
        "cluster_id": pa.array(cluster_id, pa.int64()),
        "merge_dist": pa.array(np.round(merge_dist, 9), pa.float64()),
    }).cast(ORDER_SCHEMA)


def compare_ordered(sigs, cfg=None, cut: float = 0.9):
    """``compare`` + cluster ordering: all-pairs jaccard (small-n exact
    mode) → single-linkage leaf order + flat clusters over
    ``dist = 1 - jaccard``. The heatmap-ready permutation of
    ``fig.plot_composite_matrix`` minus the rendering."""
    from ..config import DEFAULT_CONFIG
    from ..pipelines.sourmash_parity import compare_exact

    import ray

    cfg = cfg or DEFAULT_CONFIG
    # ids come from the SIGNATURE list, not the pair table: a signature
    # with no scored pair (singleton, or 0/1-signature input) must still
    # appear in the ordering. compare is the explicitly small-n mode, so
    # the driver-side id pull is budget-bounded by construction.
    sigs = sigs.materialize()
    ids = [r["conv_id"]
           for r in sigs.select_columns(["conv_id"]).take_all()]
    blocks = [t for t in ray.get(compare_exact(sigs, cfg).to_arrow_refs())
              if t.num_rows]
    if not blocks:
        return single_linkage_leaf_order(ids, [], [],
                                         np.empty(0, np.float64), cut=cut)
    pair_tbl = pa.concat_tables(
        blocks, promote_options="default").combine_chunks()
    sim = np.asarray(pair_tbl["jaccard"], np.float64)
    return single_linkage_leaf_order(
        ids, pair_tbl["a"].to_pylist(), pair_tbl["b"].to_pylist(),
        1.0 - sim, cut=cut)

"""Single-linkage compare-matrix ordering (the computational half of
``plot`` — reference fig.py:26-94 minus the rendering)."""

import numpy as np
import pyarrow as pa

from sourmash_ray.stages.cluster_order import (compare_ordered,
                                               single_linkage_leaf_order)


def _by_id(tbl: pa.Table) -> dict:
    return {r["id"]: r for r in tbl.to_pylist()}


def test_golden_two_clusters_and_chain():
    ids = ["a", "b", "c", "d", "e", "f"]
    pa_, pb, d = zip(("a", "b", 0.1), ("c", "d", 0.15), ("b", "c", 0.4),
                     ("e", "f", 0.2), ("d", "e", 0.8))
    out = _by_id(single_linkage_leaf_order(ids, list(pa_), list(pb),
                                           list(d), cut=0.5))
    # dendrogram: {a,b}@.1, {c,d}@.15, {e,f}@.2, {ab,cd}@.4, all@.8
    assert [out[i]["leaf_order"] for i in ids] == [0, 1, 2, 3, 4, 5]
    assert [out[i]["cluster_id"] for i in ids] == [0, 0, 0, 0, 1, 1]
    assert [out[i]["merge_dist"] for i in ids] == [
        0.1, 0.1, 0.15, 0.15, 0.2, 0.2]


def test_golden_nontrivial_order_and_singleton():
    ids = ["a", "b", "c", "d"]
    out = _by_id(single_linkage_leaf_order(
        ids, ["a", "b"], ["c", "c"], [0.1, 0.3], cut=0.5))
    # merge (a,c) first -> subtree [a, c]; b attaches right; d never merges
    assert [out[i]["leaf_order"] for i in ["a", "c", "b", "d"]] == [
        0, 1, 2, 3]
    assert out["d"]["cluster_id"] == 1 and out["d"]["merge_dist"] == 1.0
    assert {out[i]["cluster_id"] for i in ["a", "b", "c"]} == {0}


def test_properties_random_pairs():
    """Permutation validity, cluster contiguity in leaf order,
    first-leaf cluster numbering, and input-order invariance."""
    rng = np.random.default_rng(7)
    n = 40
    ids = [f"s{i:02d}" for i in range(n)]
    m = 120
    a_idx = rng.integers(0, n, m)
    b_idx = rng.integers(0, n, m)
    keep = a_idx != b_idx
    a = [ids[i] for i in a_idx[keep]]
    b = [ids[i] for i in b_idx[keep]]
    d = rng.uniform(0.01, 0.99, keep.sum()).round(3).tolist()

    out = single_linkage_leaf_order(ids, a, b, d, cut=0.35)
    rows = out.to_pylist()
    pos = [r["leaf_order"] for r in rows]
    assert sorted(pos) == list(range(n))

    # members of each flat cluster occupy contiguous leaf positions
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["leaf_order"])
    firsts = []
    for cid, ps in by_cluster.items():
        ps = sorted(ps)
        assert ps == list(range(ps[0], ps[0] + len(ps))), cid
        firsts.append((cid, ps[0]))
    # cluster ids numbered by first leaf position
    assert sorted(firsts) == sorted(firsts, key=lambda t: t[1])

    # invariant under a permutation of the input pair rows
    perm = rng.permutation(len(d))
    out2 = single_linkage_leaf_order(
        ids, [a[i] for i in perm], [b[i] for i in perm],
        [d[i] for i in perm], cut=0.35)
    assert out.equals(out2)


def test_empty_and_single():
    assert single_linkage_leaf_order([], [], [], []).num_rows == 0
    t = single_linkage_leaf_order(["x"], [], [], [])
    assert t.to_pylist() == [{"id": "x", "leaf_order": 0,
                              "cluster_id": 0, "merge_dist": 1.0}]


def test_compare_ordered_end_to_end(ray_session):
    """compare_exact -> ordering over real sketches: near-dup
    conversations must land in the same flat cluster, contiguous."""
    from sourmash_ray.config import DEFAULT_CONFIG
    from sourmash_ray.sources.transcripts import read_transcripts
    from sourmash_ray.stages.sketch import sketch_transcripts

    sigs = sketch_transcripts(
        read_transcripts("/root/testdata/sf0.001"),
        DEFAULT_CONFIG).limit(30).materialize()
    out = compare_ordered(sigs, cut=0.5)
    assert out.num_rows == 30
    assert sorted(r["leaf_order"] for r in out.to_pylist()) == list(
        range(30))
    by_cluster: dict = {}
    for r in out.to_pylist():
        by_cluster.setdefault(r["cluster_id"], []).append(r["leaf_order"])
    for ps in by_cluster.values():
        ps = sorted(ps)
        assert ps == list(range(ps[0], ps[0] + len(ps)))


def test_compare_ordered_singleton_and_pairless(ray_session):
    """0- and 1-signature inputs must not crash, and signatures with no
    scored pair still appear as singletons (ids come from the signature
    list, not the pair table)."""
    from sourmash_ray.config import DEFAULT_CONFIG
    from sourmash_ray.sources.transcripts import read_transcripts
    from sourmash_ray.stages.sketch import sketch_transcripts

    sigs = sketch_transcripts(
        read_transcripts("/root/testdata/sf0.001"),
        DEFAULT_CONFIG).limit(1).materialize()
    out = compare_ordered(sigs, cut=0.5)
    assert out.num_rows == 1
    r = out.to_pylist()[0]
    assert (r["leaf_order"], r["cluster_id"], r["merge_dist"]) == (
        0, 0, 1.0)

    empty = sigs.filter(lambda row: False).materialize()
    assert compare_ordered(empty, cut=0.5).num_rows == 0

"""SBT build/save/load/search parity: pruned search never misses a leaf
above threshold (vs brute-force exact scoring over all leaves), internal
nodes are exact unions of descendant leaf bits, v6 JSON round-trips via
both FSStorage and ZipStorage (reference semantics:
/root/reference/src/sourmash/sbt.py, sbtmh.py)."""
from __future__ import annotations

import json

import numpy as np
import pytest

from sourmash_ray.config import EngineConfig, LSHParams
from sourmash_ray.functions.nodegraph import GraphFactory, Nodegraph
from sourmash_ray.functions.sketch import SketchParams
from sourmash_ray.sources.transcripts import synth_transcripts

PARAMS = SketchParams(ksize=12, scaled=4, num=0, track_abundance=False)
CFG = EngineConfig(sketch=PARAMS, lsh=LSHParams(num_perm=12, bands=4, rows=3))
FACTORY_ARGS = (1, 50_000, 4)


@pytest.fixture(scope="module")
def sigs(ray_session):
    import ray.data

    from sourmash_ray.stages.sketch import sketch_transcripts

    corpus = synth_transcripts(40, seed=23)
    return sketch_transcripts(ray.data.from_arrow(corpus), CFG).materialize()


@pytest.fixture(scope="module")
def tree(sigs):
    from sourmash_ray.stages.sbt import build_sbt

    return build_sbt(sigs, factory=GraphFactory(*FACTORY_ARGS), d=2)


def _brute_force(tree, q, threshold, score):
    out = {}
    for r in tree.signatures():
        m = r["mins"]
        shared = len(np.intersect1d(q, m))
        if score == "similarity":
            s = shared / (len(q) + len(m) - shared)
        elif score == "containment":
            s = shared / len(q)
        else:
            s = shared / min(len(q), len(m))
        if s >= threshold:
            out[r["conv_id"]] = pytest.approx(s)
    return out


def test_structure_and_internal_union(tree, sigs):
    rows = sigs.take_all()
    assert len(tree) == len(rows) > 10
    # every leaf's ancestors exist as internal nodes up to the root
    for pos in tree._leaf_idx:
        p = tree.parent(pos)
        while True:
            assert p in tree.nodes
            if p == 0:
                break
            p = tree.parent(p)
    # root bits == bloom of the union of ALL mins (OR is exact, no approx)
    union = np.unique(np.concatenate(
        [np.asarray(r["mins"], dtype=np.uint64) for r in rows]))
    direct = GraphFactory(*FACTORY_ARGS)()
    direct.update_many(union)
    for a, b in zip(tree.nodes[0].blocks, direct.blocks):
        assert np.array_equal(a, b)
    # min_n_below at root == smallest leaf sketch
    assert tree.node_meta[0]["min_n_below"] == min(
        max(1, len(r["mins"])) for r in rows)


@pytest.mark.parametrize("score,threshold", [
    ("similarity", 0.05), ("similarity", 0.3),
    ("containment", 0.2), ("max_containment", 0.3),
])
def test_search_equals_brute_force(tree, sigs, score, threshold):
    rows = sigs.take_all()
    for q_row in rows[:8]:
        q = np.asarray(q_row["mins"], dtype=np.uint64)
        got = {r["conv_id"]: r["score"]
               for r in tree.search(q, threshold, score=score)}
        assert got == _brute_force(tree, q, threshold, score)


def test_save_load_roundtrip_fs_and_zip(tree, tmp_path):
    from sourmash_ray.stages.sbt import SBT

    for path in (str(tmp_path / "idx.sbt.json"), str(tmp_path / "idx")):
        saved = tree.save(path)
        back = SBT.load(saved)
        assert back.d == tree.d
        assert len(back) == len(tree)
        assert sorted(back.nodes) == sorted(tree.nodes)
        for pos, ng in tree.nodes.items():
            assert back.nodes[pos] == ng
            assert back.node_meta[pos]["min_n_below"] == \
                tree.node_meta[pos]["min_n_below"]
        mine = {r["conv_id"]: (r["md5"], r["mins"].tolist())
                for r in tree.signatures()}
        theirs = {r["conv_id"]: (r["md5"], r["mins"].tolist())
                  for r in back.signatures()}
        assert mine == theirs
        q = next(tree.signatures())["mins"]
        assert ([r["conv_id"] for r in back.search(q, 0.1)]
                == [r["conv_id"] for r in tree.search(q, 0.1)])

    # the FS artifact is reference-shaped v6 JSON
    info = json.loads((tmp_path / "idx.sbt.json").read_bytes())
    assert info["version"] == 6
    assert info["storage"] == {"backend": "FSStorage",
                               "args": {"path": ".sbt.idx"}}
    assert info["factory"] == {"class": "GraphFactory",
                               "args": list(FACTORY_ARGS)}
    # internal node files are khmer-loadable OXLI
    pos0 = info["nodes"]["0"]["filename"]
    ng = Nodegraph.load(str(tmp_path / ".sbt.idx" / pos0))
    assert ng == tree.nodes[0]
    # manifest rides along
    manifest = (tmp_path / ".sbt.idx" / "idx.manifest.csv").read_text()
    assert manifest.startswith("# SOURMASH-MANIFEST-VERSION: 1.0")
    assert manifest.count("\n") == len(tree) + 2


def test_single_leaf_and_table_input(ray_session):
    from sourmash_ray.functions.oracle import sketch_table
    from sourmash_ray.stages.sbt import build_sbt

    corpus = synth_transcripts(1, seed=5)
    sk = sketch_table(corpus, PARAMS)
    import pyarrow as pa
    cid = next(iter(sk))
    mins = np.asarray(sk[cid]["mins"], dtype=np.uint64)
    tbl = pa.table({
        "conv_id": pa.array([cid]),
        "ksize": pa.array([PARAMS.ksize], pa.int32()),
        "scaled": pa.array([PARAMS.scaled], pa.uint64()),
        "num": pa.array([0], pa.uint32()),
        "seed": pa.array([42], pa.uint64()),
        "mins": pa.array([mins], pa.list_(pa.uint64())),
        "abunds": pa.array([np.ones(len(mins), np.uint64)],
                           pa.list_(pa.uint64())),
        "md5": pa.array([sk[cid]["md5"]]),
    })
    tree = build_sbt(tbl, factory=GraphFactory(1, 10_000, 3), d=2)
    assert len(tree) == 1 and 0 in tree.nodes
    hits = tree.search(mins, 0.99)
    assert [r["conv_id"] for r in hits] == [cid]

    with pytest.raises(ValueError):
        build_sbt(tbl.slice(0, 0))


def test_plugin_registry_roundtrip(tree, tmp_path):
    import numpy as np

    from sourmash_ray.plugins import load_any, save_any

    path = save_any(tree.leaf_table, str(tmp_path / "reg.sbt.zip"))
    ds = load_any(path)
    got = sorted(r["conv_id"] for r in ds.take_all())
    assert got == sorted(r["conv_id"] for r in tree.signatures())

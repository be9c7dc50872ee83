"""Legacy SBT format load (v1–v5) + migrate: hand-built fixtures in each
historical dialect (reference ``sbt.py:950-1181``) must load and search
identically to the v6 tree they were derived from."""
from __future__ import annotations

import gzip
import json
import os

import numpy as np
import pytest

from sourmash_ray.config import EngineConfig, LSHParams
from sourmash_ray.functions.nodegraph import GraphFactory
from sourmash_ray.functions.sketch import SketchParams
from sourmash_ray.sources.transcripts import synth_transcripts

PARAMS = SketchParams(ksize=12, scaled=4, num=0, track_abundance=False)
CFG = EngineConfig(sketch=PARAMS, lsh=LSHParams(num_perm=12, bands=4, rows=3))
FACTORY_ARGS = (1, 50_000, 4)


@pytest.fixture(scope="module")
def tree(ray_session):
    import ray.data

    from sourmash_ray.stages.sbt import build_sbt
    from sourmash_ray.stages.sketch import sketch_transcripts

    corpus = synth_transcripts(24, seed=31)
    sigs = sketch_transcripts(ray.data.from_arrow(corpus),
                              CFG).materialize()
    return build_sbt(sigs, factory=GraphFactory(*FACTORY_ARGS), d=2)


def _payloads(tree):
    """(internal {pos: (fn, bytes, meta)}, leaves {pos: (fn, bytes,
    name)}) for fixture writing."""
    from sourmash_ray.sources.sigjson import sigs_to_json

    internal = {}
    for pos, ng in tree.nodes.items():
        internal[pos] = (f"internal.{pos}", ng.to_bytes(compression=1),
                         dict(tree.node_meta.get(pos, {})))
    leaves = {}
    seen = set()
    for pos, i in tree._leaf_idx.items():
        r = tree._leaf_row(i)
        fn = f"{r['md5']}.sig.gz"
        if fn in seen:                 # exact dups share an md5
            fn = f"{r['md5']}.{pos}.sig.gz"
        seen.add(fn)
        leaves[pos] = (fn, gzip.compress(
            json.dumps(sigs_to_json([r])).encode()), r["conv_id"])
    return internal, leaves


def _write_files(d, sub, internal, leaves):
    tgt = os.path.join(d, sub) if sub else d
    os.makedirs(tgt, exist_ok=True)
    for fn, buf, _ in list(internal.values()) + list(leaves.values()):
        with open(os.path.join(tgt, fn), "wb") as f:
            f.write(buf)


def write_legacy(tree, version: int, d: str) -> str:
    """Write ``tree`` in the historical v1–v5 description dialects."""
    internal, leaves = _payloads(tree)
    sub = ".sbt.legacy" if version >= 3 else ""
    _write_files(d, sub, internal, leaves)

    def _node(pos, keep_min_n=True):
        fn, _, meta = internal[pos]
        if not keep_min_n:
            meta = {k: v for k, v in meta.items() if k != "min_n_below"}
        return {"filename": fn, "name": f"internal.{pos}",
                "metadata": meta}

    def _leaf(pos):
        fn, _, name = leaves[pos]
        return {"filename": fn, "name": name, "metadata": name}

    if version == 1:
        top = max(list(internal) + list(leaves))
        arr = [None] * (top + 1)
        for p in internal:
            arr[p] = _node(p, keep_min_n=False)
        for p in leaves:
            arr[p] = _leaf(p)
        info = arr
    elif version == 2:
        nodes = {str(p): _node(p, keep_min_n=False) for p in internal}
        nodes.update({str(p): _leaf(p) for p in leaves})
        info = {"version": 2, "d": tree.d, "nodes": nodes}
    elif version in (3, 4):
        keep = version == 4          # v3 predates min_n_below
        nodes = {str(p): _node(p, keep_min_n=keep) for p in internal}
        nodes.update({str(p): _leaf(p) for p in leaves})
        info = {"version": version, "d": tree.d,
                "factory": {"class": "GraphFactory",
                            "args": list(tree.factory.init_args())},
                "storage": {"backend": "FSStorage",
                            "args": {"path": sub}},
                "nodes": nodes}
    elif version == 5:
        info = {"version": 5, "d": tree.d,
                "factory": {"class": "GraphFactory",
                            "args": list(tree.factory.init_args())},
                "storage": {"backend": "FSStorage",
                            "args": {"path": sub}},
                "nodes": {str(p): _node(p) for p in internal},
                "leaves": {str(p): _leaf(p) for p in leaves}}
    else:
        raise ValueError(version)
    path = os.path.join(d, "legacy.sbt.json")
    with open(path, "w") as f:
        json.dump(info, f)
    return path


def _search_sets(t, queries, threshold=0.2):
    out = []
    for q in queries:
        out.append({(r["conv_id"], round(r["score"], 12))
                    for r in t.search(q, threshold)})
    return out


@pytest.mark.parametrize("version", [1, 2, 3, 4, 5])
def test_legacy_load_matches_v6(tree, version, tmp_path):
    from sourmash_ray.stages.sbt import SBT

    path = write_legacy(tree, version, str(tmp_path))
    got = SBT.load(path)
    assert got.d == tree.d
    if version >= 3:
        assert got.factory.init_args() == tree.factory.init_args()
    else:
        # v1/v2 infer factory params from the root nodegraph FILE
        # (reference extract_nodegraph_info): starting_size comes back
        # as the first realized prime tablesize, not the request
        ka, sa, na = got.factory.init_args()
        assert (ka, na) == (tree.factory.ksize, tree.factory.n_tables)
        assert sa == int(tree.nodes[0].tablesizes[0])
    assert sorted(got._leaf_idx) == sorted(tree._leaf_idx)
    # identical signatures
    want_sigs = [(r["conv_id"], r["md5"]) for r in tree.signatures()]
    got_sigs = [(r["conv_id"], r["md5"]) for r in got.signatures()]
    assert got_sigs == want_sigs
    # min_n_below present everywhere (back-filled for v1-v3)
    assert all("min_n_below" in m for m in got.node_meta.values())
    # identical search results on several real queries
    queries = [np.asarray(tree.leaf_table["mins"][i].values,
                          dtype=np.uint64)
               for i in range(0, len(want_sigs), 7)]
    assert _search_sets(got, queries) == _search_sets(tree, queries)


def test_min_n_below_backfill_is_exact(tree, tmp_path):
    """v3 carries no min_n_below; the back-fill must reproduce the
    built tree's values exactly."""
    from sourmash_ray.stages.sbt import SBT

    path = write_legacy(tree, 3, str(tmp_path))
    got = SBT.load(path)
    for pos, meta in tree.node_meta.items():
        assert got.node_meta[pos]["min_n_below"] == meta["min_n_below"]


def test_migrate_rewrites_v6(tree, tmp_path):
    from sourmash_ray.stages.sbt import SBT, migrate_sbt

    src = write_legacy(tree, 2, str(tmp_path / "old"))
    out = migrate_sbt(src, str(tmp_path / "migrated.sbt.zip"))
    with __import__("zipfile").ZipFile(out) as z:
        info = json.loads(z.read("migrated.sbt.json"))
    assert info["version"] == 6
    got = SBT.load(out)
    queries = [np.asarray(tree.leaf_table["mins"][0].values,
                          dtype=np.uint64)]
    assert _search_sets(got, queries) == _search_sets(tree, queries)


def test_unsupported_version_raises(tree, tmp_path):
    from sourmash_ray.stages.sbt import SBT

    path = write_legacy(tree, 5, str(tmp_path))
    info = json.load(open(path))
    info["version"] = 9
    json.dump(info, open(path, "w"))
    with pytest.raises(ValueError, match="not supported"):
        SBT.load(path)

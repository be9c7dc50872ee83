"""LCA DB JSON interop — round trip, validation, and plug-in to the
engine's lca_summarize."""
from __future__ import annotations

import gzip
import json

import numpy as np
import pytest

from sourmash_ray.sources.lca_json import (load_lca_json, write_lca_json)

ENTRIES = [
    ("s1", "sig one", "d__B;p__P;g__G", np.array([1, 2, 3], np.uint64)),
    ("s2", "sig two", "d__B;p__P;g__H", np.array([2, 3, 4], np.uint64)),
    ("s3", "sig three", "", np.array([9], np.uint64)),   # no lineage
]


def test_round_trip(tmp_path):
    p = str(tmp_path / "db.lca.json")
    write_lca_json(p, ENTRIES, ksize=5, scaled=10)
    db = load_lca_json(p)
    assert (db["ksize"], db["scaled"], db["moltype"]) == (5, 10, "DNA")
    assert db["lineages"] == {"s1": "d__B;p__P;g__G",
                              "s2": "d__B;p__P;g__H"}
    assert db["names"]["s3"] == "sig three"
    rows = sorted(zip(db["index_table"]["hash"].to_pylist(),
                      db["index_table"]["conv_id"].to_pylist()))
    assert rows == [(1, "s1"), (2, "s1"), (2, "s2"), (3, "s1"),
                    (3, "s2"), (4, "s2"), (9, "s3")]


def test_gzip_and_no_overwrite(tmp_path):
    p = str(tmp_path / "db.lca.json.gz")
    write_lca_json(p, ENTRIES, ksize=5, scaled=10)
    with gzip.open(p, "rt") as f:
        d = json.load(f)
    assert d["type"] == "sourmash_lca" and d["version"] == "2.1"
    # reference rank names applied positionally
    assert d["lid_to_lineage"]["0"][0] == ["superkingdom", "d__B"]
    assert load_lca_json(p)["lineages"]["s1"] == "d__B;p__P;g__G"
    with pytest.raises(ValueError, match="not overwriting"):
        write_lca_json(p, ENTRIES, ksize=5, scaled=10)


def test_load_rejects_bad_inputs(tmp_path):
    with pytest.raises(ValueError, match="is not a file"):
        load_lca_json(str(tmp_path / "missing.json"))
    p = tmp_path / "notjson.json"
    p.write_text("hello")
    with pytest.raises(ValueError, match="not an LCA database"):
        load_lca_json(str(p))
    p2 = tmp_path / "wrongtype.json"
    p2.write_text(json.dumps({"type": "other", "version": "2.1"}))
    with pytest.raises(ValueError, match="not an LCA db"):
        load_lca_json(str(p2))
    p3 = tmp_path / "old.json"
    p3.write_text(json.dumps({"type": "sourmash_lca", "version": "1.0"}))
    with pytest.raises(ValueError, match="old-style"):
        load_lca_json(str(p3))


def test_feeds_lca_summarize(ray_session, tmp_path):
    """A loaded JSON DB drives the engine's per-rank LCA walk."""
    import ray.data

    from sourmash_ray.stages.index import lca_summarize

    p = str(tmp_path / "db.lca.json")
    write_lca_json(p, ENTRIES, ksize=5, scaled=10)
    db = load_lca_json(p)
    idx = ray.data.from_arrow(db["index_table"])
    out = lca_summarize(idx, db["lineages"],
                        np.array([2, 3], np.uint64), threshold=1)
    got = {r["lineage"]: r["count"] for r in out.to_pylist()}
    # hashes 2,3 belong to both s1 and s2 → LCA is the shared prefix
    assert got.get("d__B;p__P") == 2
    assert got.get("d__B") == 2

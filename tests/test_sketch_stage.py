"""Sketch stage parity: Ray pipeline sketches ≡ scalar oracle sketches.

Mirrors the reference's strategy of checking its distributed/parallel path
against the serial one (``/root/reference/tests/test_compare.py:86-92``:
parallel must equal serial)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from sourmash_ray.config import EngineConfig, LSHParams
from sourmash_ray.functions.oracle import sketch_table
from sourmash_ray.functions.sketch import SketchParams, normalize_text
from sourmash_ray.sources.transcripts import synth_transcripts
from sourmash_ray.stages.sketch import (
    TurnSketcher,
    batch_shingle_hashes,
    normalize_column,
    sketch_transcripts,
)


def test_normalize_column_matches_scalar():
    texts = ["Hello   World", "  A\tB\nC  ", "", "x", "UP low 2  ",
             "tab\t\ttab", "multi\n\n\nline"]
    for mode in ("ws", "alnum", "raw"):
        vec = normalize_column(pa.array(texts), mode).to_pylist()
        ref = [normalize_text(t, mode).decode() for t in texts]
        assert vec == ref, mode


def test_batch_shingle_hashes_matches_scalar():
    from sourmash_ray.functions.sketch import shingle_hashes

    texts = ["the quick brown fox jumps over the lazy dog", "short", "",
             "a" * 40]
    k = 8
    arr = pa.array(texts)
    hashes, rows, counts = batch_shingle_hashes(arr, k, 42)
    for i, t in enumerate(texts):
        mine = hashes[rows == i]
        ref = shingle_hashes(t.encode(), k, 42)
        assert np.array_equal(mine, ref), i
        assert counts[i] == ref.size


@pytest.mark.parametrize("params", [
    SketchParams(ksize=12, scaled=4, num=0),
    SketchParams(ksize=12, scaled=0, num=64),
    SketchParams(ksize=12, scaled=4, num=0, track_abundance=True),
])
def test_turn_sketcher_local_matches_oracle(params):
    """The map_batches kernel alone (no Ray) vs per-turn scalar sketches."""
    from sourmash_ray.functions.sketch import build_sketch, shingle_hashes

    tbl = synth_transcripts(8, seed=7)
    sk = TurnSketcher(params)
    out = sk(tbl.select(["conv_id", "text"]))
    assert out.num_rows == tbl.num_rows
    for i in range(tbl.num_rows):
        text = tbl["text"][i].as_py()
        data = normalize_text(text, params.normalization)
        ref_h = shingle_hashes(data, params.ksize, params.seed)
        ref_mins, ref_ab, _ = build_sketch(
            ref_h, SketchParams(ksize=params.ksize, scaled=params.scaled,
                                num=params.num, seed=params.seed,
                                track_abundance=True))
        got = np.array(out["mins"][i].as_py(), dtype=np.uint64)
        gab = np.array(out["abunds"][i].as_py(), dtype=np.uint64)
        assert np.array_equal(got, ref_mins)
        assert np.array_equal(gab, ref_ab)
        assert out["n_shingles"][i].as_py() == ref_h.size


@pytest.mark.parametrize("params", [
    SketchParams(ksize=12, scaled=4, num=0),
    SketchParams(ksize=12, scaled=0, num=64),
])
def test_pipeline_sketches_match_oracle(ray_session, params):
    import ray.data

    tbl = synth_transcripts(20, seed=11)
    cfg = EngineConfig(sketch=params, lsh=LSHParams(num_perm=12, bands=4, rows=3))
    ds = ray.data.from_arrow(tbl).repartition(4)
    sigs = {r["conv_id"]: r for r in sketch_transcripts(ds, cfg).take_all()}
    oracle = sketch_table(tbl, params)
    assert set(sigs) == set(oracle)
    for cid, ref in oracle.items():
        got = sigs[cid]
        assert np.array_equal(
            np.asarray(got["mins"], dtype=np.uint64), ref["mins"]), cid
        assert got["md5"] == ref["md5"]
        assert got["n_shingles"] == ref["n_shingles"]
        assert got["n_turns"] == ref["n_turns"]
        assert len(got["perms"]) == 12


def test_exact_clone_same_md5(ray_session):
    """Planted exact dups share md5 — the exact-dedup invariant."""
    import ray.data

    tbl = synth_transcripts(30, seed=3)
    cfg = EngineConfig(sketch=SketchParams(ksize=12, scaled=4, num=0),
                       lsh=LSHParams(num_perm=12, bands=4, rows=3))
    sigs = {r["conv_id"]: r["md5"]
            for r in sketch_transcripts(ray.data.from_arrow(tbl), cfg).take_all()}
    clones = [c for c in sigs if "_xd" in c]
    assert clones
    for c in clones:
        base = c.split("_xd")[0]
        assert sigs[c] == sigs[base], c

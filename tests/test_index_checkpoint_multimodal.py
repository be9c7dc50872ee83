"""Inverted index, checkpoint/resume, and multimodal plumbing tests."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from sourmash_ray.config import EngineConfig, LSHParams
from sourmash_ray.functions.sketch import SketchParams
from sourmash_ray.sources.transcripts import synth_transcripts

PARAMS = SketchParams(ksize=12, scaled=4, num=0)
CFG = EngineConfig(sketch=PARAMS, lsh=LSHParams(num_perm=12, bands=4, rows=3))


@pytest.fixture(scope="module")
def sigs(ray_session):
    import ray.data

    from sourmash_ray.stages.sketch import sketch_transcripts

    tbl = synth_transcripts(15, seed=23)
    return sketch_transcripts(ray.data.from_arrow(tbl), CFG).materialize()


def test_inverted_index_roundtrip(sigs):
    """Index explode + counter lookup ≡ direct intersection counting
    (the lca_db Counter semantics)."""
    from sourmash_ray.stages.index import build_inverted_index, counter_lookup

    idx = build_inverted_index(sigs).materialize()
    rows = {r["conv_id"]: np.asarray(r["mins"], dtype=np.uint64)
            for r in sigs.take_all()}
    total = sum(len(v) for v in rows.values())
    assert idx.count() == total

    qid = sorted(rows)[0]
    got = {r["conv_id"]: r["overlap"]
           for r in counter_lookup(idx, rows[qid], CFG).take_all()}
    for cid, mins in rows.items():
        ov = int(np.intersect1d(rows[qid], mins, assume_unique=True).size)
        if ov:
            assert got[cid] == ov, cid
        else:
            assert cid not in got


def test_hash_frequency(sigs):
    from sourmash_ray.stages.index import build_inverted_index, hash_frequency

    idx = build_inverted_index(sigs)
    freq = {r["hash"]: r["n_sigs"] for r in hash_frequency(idx).take_all()}
    rows = [np.asarray(r["mins"], dtype=np.uint64) for r in sigs.take_all()]
    import collections

    ref = collections.Counter()
    for mins in rows:
        for h in mins.tolist():
            ref[h] += 1
    assert freq == dict(ref)


def test_checkpoint_resume(ray_session, tmp_path):
    """Second run with the same fingerprint reads the checkpoint instead of
    recomputing; a changed fingerprint recomputes."""
    import ray.data

    from sourmash_ray.state.checkpoint import checkpoint_dataset

    tbl = synth_transcripts(5, seed=31)
    ds = ray.data.from_arrow(tbl)
    path = str(tmp_path / "ckpt")

    out1, lin1 = checkpoint_dataset(ds, path, stage="s", fingerprint="fp1")
    assert lin1["rows"] == tbl.num_rows
    assert os.path.exists(os.path.join(path, "_LINEAGE.json"))

    # resume: same fingerprint → lineage unchanged (no rewrite)
    before = json.load(open(os.path.join(path, "_LINEAGE.json")))
    out2, lin2 = checkpoint_dataset(ds, path, stage="s", fingerprint="fp1")
    after = json.load(open(os.path.join(path, "_LINEAGE.json")))
    assert before == after
    assert out2.count() == tbl.num_rows

    # different fingerprint → recompute (lineage rewritten)
    out3, lin3 = checkpoint_dataset(ds, path, stage="s", fingerprint="fp2")
    assert lin3["fingerprint"] == "fp2"


def test_dedup_pipeline_checkpointed_equals_direct(ray_session, tmp_path):
    import ray.data

    from sourmash_ray.pipelines.dedup import dedup_pipeline

    tbl = synth_transcripts(20, seed=37)
    direct = dedup_pipeline(ray.data.from_arrow(tbl), CFG)
    want = sorted((r["conv_id"], r["cluster_id"])
                  for r in direct["clusters"].take_all())

    ckpt = str(tmp_path / "pipe")
    run1 = dedup_pipeline(ray.data.from_arrow(tbl), CFG, checkpoint_dir=ckpt)
    got1 = sorted((r["conv_id"], r["cluster_id"])
                  for r in run1["clusters"].take_all())
    assert got1 == want
    # resumed run must read checkpoints and produce identical output
    run2 = dedup_pipeline(ray.data.from_arrow(tbl), CFG, checkpoint_dir=ckpt)
    got2 = sorted((r["conv_id"], r["cluster_id"])
                  for r in run2["clusters"].take_all())
    assert got2 == want


def test_media_features_plumbing(ray_session):
    from sourmash_ray.stages.multimodal import FEATURE_DIM, media_features

    rows = media_features("/root/testdata/sf0.001").take_all()
    assert rows
    for r in rows[:10]:
        assert len(r["features"]) == FEATURE_DIM
        assert r["kind"] in ("image", "audio")
        assert r["n_bytes"] > 0
    # determinism: same input → same features
    rows2 = media_features("/root/testdata/sf0.001").take_all()
    a = {r["media_id"]: tuple(r["features"]) for r in rows}
    b = {r["media_id"]: tuple(r["features"]) for r in rows2}
    assert a == b


def test_media_vectorized_hist_equals_per_row_loop():
    """The one-bincount batched histogram must be bit-identical to calling
    the per-payload stub decode row by row (incl. sliced batches and
    empty payloads)."""
    import numpy as np
    import pyarrow as pa

    from sourmash_ray.stages.multimodal import (FEATURE_DIM,
                                                MediaFeatureExtractor,
                                                synth_media_table)

    tbl = synth_media_table("/root/testdata/sf0.001")
    ex = MediaFeatureExtractor()

    def _loop_oracle(t: pa.Table) -> np.ndarray:
        feats = np.zeros((t.num_rows, FEATURE_DIM), np.float64)
        for i, p in enumerate(t["payload"].to_pylist()):
            if p:
                feats[i] = ex._decode_stub(p) @ ex.proj
        return np.round(feats, 6)

    def _flat(out: pa.Table) -> np.ndarray:
        return np.asarray(out["features"].combine_chunks()
                          .flatten()).reshape(-1, FEATURE_DIM)

    assert np.array_equal(_flat(ex(tbl)), _loop_oracle(tbl))
    sl = tbl.slice(100, 50)  # nonzero Arrow offset
    assert np.array_equal(_flat(ex(sl)), _loop_oracle(sl))
    empty = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": pa.array(["image"]),
        "payload": pa.array([b""], pa.binary()),
        "n_bytes": pa.array([0], pa.int64()),
    })
    assert _flat(ex(empty)).sum() == 0


def test_partition_level_resume(ray_session, tmp_path):
    """The exchange's per-partition parquet checkpoints: delete one part,
    rerun — only the missing partition recomputes; output identical."""
    import os
    import time

    import ray.data

    from sourmash_ray.stages.sketch import sketch_transcripts

    tbl = synth_transcripts(20, seed=43)
    ckpt = str(tmp_path / "parts")

    def run():
        return sketch_transcripts(ray.data.from_arrow(tbl), CFG,
                                  checkpoint_dir=ckpt, fingerprint="fpA")

    want = sorted((r["conv_id"], r["md5"]) for r in run().take_all())
    parts = sorted(f for f in os.listdir(ckpt) if f.endswith(".parquet"))
    assert parts
    # record mtimes, delete one partition, rerun
    keep = parts[0]
    victim = parts[-1]
    mtime_before = os.path.getmtime(os.path.join(ckpt, keep))
    os.remove(os.path.join(ckpt, victim))
    time.sleep(0.05)
    got = sorted((r["conv_id"], r["md5"]) for r in run().take_all())
    assert got == want
    assert os.path.exists(os.path.join(ckpt, victim))  # recomputed
    assert os.path.getmtime(os.path.join(ckpt, keep)) == mtime_before  # reused

    # fingerprint change clears and recomputes everything
    out2 = sketch_transcripts(ray.data.from_arrow(tbl), CFG,
                              checkpoint_dir=ckpt, fingerprint="fpB")
    got2 = sorted((r["conv_id"], r["md5"]) for r in out2.take_all())
    assert got2 == want


def test_lca_classify(sigs):
    """A clone query must classify into its base's cluster with strong
    agreement; an unrelated query with no majority stays assigned to its
    own singleton label."""
    from sourmash_ray.stages.index import build_inverted_index, lca_classify

    idx = build_inverted_index(sigs).materialize()
    rows = {r["conv_id"]: np.asarray(r["mins"], dtype=np.uint64)
            for r in sigs.take_all()}
    clones = [c for c in rows if "_xd" in c]
    assert clones
    q = clones[0]
    base = q.split("_xd")[0]
    labels = {cid: (base if cid in (q, base) else cid) for cid in rows}
    res = lca_classify(idx, rows[q], labels, CFG)
    assert res["label"] == base
    assert res["f_agreement"] > 0.5
    assert res["n_voting_hashes"] > 0


def _oracle_lca_summarize(rows: dict, lineages: dict, q: np.ndarray,
                          qc: np.ndarray, threshold: int) -> dict:
    """Pure-Python transcription of the reference algorithm
    (lca/command_summarize.py:20-58 + lca_utils.count_lca_for_assignments):
    per-hash lineage set -> LCA tuple -> abundance-weighted counts ->
    threshold -> climb (root only counts root-LCA hashes)."""
    weight = {int(h): int(c) for h, c in zip(q, qc)}
    assignments: dict = {}
    for cid, mins in rows.items():
        lin = lineages.get(cid)
        if lin is None:
            continue
        for h in np.intersect1d(q, mins, assume_unique=True):
            assignments.setdefault(int(h), set()).add(tuple(lin.split(";")))
    counts: dict = {}
    for h, lins in assignments.items():
        lins = sorted(lins)
        lca = lins[0]
        for other in lins[1:]:
            k = 0
            while k < min(len(lca), len(other)) and lca[k] == other[k]:
                k += 1
            lca = lca[:k]
        counts[lca] = counts.get(lca, 0) + weight[h]
    agg: dict = {}
    for lca, count in counts.items():
        if count < threshold:
            continue
        if not lca:
            agg[lca] = agg.get(lca, 0) + count
        while lca:
            agg[lca] = agg.get(lca, 0) + count
            lca = lca[:-1]
    return {(";".join(k) if k else "(root)"): v for k, v in agg.items()}


def test_lca_summarize_matches_reference_oracle(sigs):
    """lca_summarize (exchange-shaped) == the reference's per-rank LCA walk
    on a lineage assignment engineered to exercise every branch: agreeing
    hashes (full lineage), genus-level conflicts (proper-prefix LCA), and
    phylum-level conflicts (near-root LCA)."""
    from sourmash_ray.stages.index import build_inverted_index, lca_summarize

    idx = build_inverted_index(sigs).materialize()
    rows = {r["conv_id"]: np.asarray(r["mins"], dtype=np.uint64)
            for r in sigs.take_all()}
    cids = sorted(rows)
    # 3 phyla x 2 genera x species-per-sig; clones share their base's genus
    # but get a distinct species so shared hashes resolve at genus level.
    lineages = {}
    for i, cid in enumerate(cids):
        base = cid.split("_xd")[0]
        j = cids.index(base) if base in cids else i
        lineages[cid] = (f"p{j % 3};g{j % 2};s{i}")
    # drop one signature from the taxonomy: its hashes must not vote
    dropped = cids[-1]
    del lineages[dropped]

    q = np.unique(np.concatenate([rows[c] for c in cids[:8]]))
    rng = np.random.default_rng(7)
    qc = rng.integers(1, 5, size=q.size).astype(np.int64)

    for threshold in (1, 3):
        got_tbl = lca_summarize(idx, lineages, q, qc, threshold=threshold,
                                cfg=CFG)
        got = {r["lineage"]: r["count"] for r in got_tbl.to_pylist()}
        want = _oracle_lca_summarize(rows, lineages, q, qc, threshold)
        assert got == want, (threshold, got, want)
        # percent column: of TOTAL query weight, like output_results
        total = int(qc.sum())
        for r in got_tbl.to_pylist():
            assert r["f_percent"] == round(100.0 * r["count"] / total, 1)
    # counts sorted descending
    cnts = [r["count"] for r in got_tbl.to_pylist()]
    assert cnts == sorted(cnts, reverse=True)


def test_lca_summarize_unweighted_default(sigs):
    """query_counts=None == all-ones weighting (--ignore-abundance)."""
    from sourmash_ray.stages.index import build_inverted_index, lca_summarize

    idx = build_inverted_index(sigs).materialize()
    rows = {r["conv_id"]: np.asarray(r["mins"], dtype=np.uint64)
            for r in sigs.take_all()}
    cids = sorted(rows)
    lineages = {cid: f"p{i % 2};g{i % 3}" for i, cid in enumerate(cids)}
    q = np.unique(np.concatenate([rows[c] for c in cids[:5]]))
    a = lca_summarize(idx, lineages, q, None, threshold=1, cfg=CFG)
    b = lca_summarize(idx, lineages, q, np.ones(q.size, np.int64),
                      threshold=1, cfg=CFG)
    assert a.equals(b)


def test_lca_partial_tuple_order_regression():
    """The per-hash LCA must use rank-TUPLE order, not raw string order:
    ';' (0x3B) sorts after digits, so {"a;b", "a;b0", "a;b;z"} raw-sorts
    with "a;b0" in the middle and a first/last LCP would wrongly say
    "a;b"; the true common rank prefix is "a"."""
    import pyarrow as pa

    from sourmash_ray.stages.index import _lca_partial

    part = pa.table({
        "key": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "hash": pa.array([42, 42, 42, 7, 7], pa.uint64()),
        "lineage": pa.array(["a;b", "a;b0", "a;b;z", "a;b", "a;b"]),
        "weight": pa.array([3, 3, 3, 2, 2], pa.int64()),
    })
    out = {r["lineage"]: r["count"] for r in _lca_partial(part).to_pylist()}
    assert out == {"a": 3, "a;b": 2}


def test_media_resize_matches_per_row_reference(ray_session):
    import numpy as np

    from sourmash_ray.stages.multimodal import (IMG_H, IMG_W,
                                                MediaResizer,
                                                synth_media_table)

    SF = "/root/testdata/sf0.001"
    import pyarrow.compute as pc

    tbl = synth_media_table(SF)
    imgs = tbl.filter(pc.equal(tbl["kind"], "image")).slice(0, 16)
    out = MediaResizer(out_h=8, out_w=8)(imgs)
    got = {m: p for m, p in zip(out["media_id"].to_pylist(),
                                out["pixels"].to_pylist())}
    for mid, payload in zip(imgs["media_id"].to_pylist(),
                            imgs["payload"].to_pylist()):
        px = np.zeros(IMG_H * IMG_W)
        raw = np.frombuffer(payload, np.uint8)[:IMG_H * IMG_W]
        px[:len(raw)] = raw
        ref = px.reshape(IMG_H, IMG_W).reshape(8, 4, 8, 4).mean(
            axis=(1, 3))
        assert np.allclose(got[mid], np.round(ref.reshape(-1), 6)), mid


def test_media_frames_matches_per_row_reference(ray_session):
    import numpy as np

    from sourmash_ray.stages.multimodal import (FRAME_BYTES,
                                                FrameSampler,
                                                synth_media_table)

    tbl = synth_media_table("/root/testdata/sf0.001").slice(0, 20)
    out = FrameSampler(stride=3)(tbl)
    got = {(m, f): fr for m, f, fr in zip(
        out["media_id"].to_pylist(), out["frame_idx"].to_pylist(),
        out["frame"].to_pylist())}
    want = {}
    for mid, payload in zip(tbl["media_id"].to_pylist(),
                            tbl["payload"].to_pylist()):
        nf = len(payload) // FRAME_BYTES
        for f in range(0, nf, 3):
            want[(mid, f)] = payload[f * FRAME_BYTES:
                                     (f + 1) * FRAME_BYTES]
    assert got == want
    assert want  # fixture non-degenerate


def test_media_pipelines_run(ray_session):
    from sourmash_ray.stages.multimodal import media_frames, media_resize

    SF = "/root/testdata/sf0.001"
    r = media_resize(SF).take_all()
    assert r and all(len(x["pixels"]) == 64 for x in r[:5])
    f = media_frames(SF)
    assert f.count() > 0

"""End-to-end dedup pipeline vs the brute-force oracle.

The analogue of the reference's golden-matrix tests
(``/root/reference/tests/test_compare.py:48-92``): same sketch config on a
planted corpus, assert the LSH pipeline recovers ≥ 0.99 of oracle dup
pairs (BASELINE.md target) and that verified Jaccard values are exactly
the oracle's (same sketches ⇒ same estimator)."""

from __future__ import annotations

from collections import defaultdict

import pytest

from sourmash_ray.config import EngineConfig
from sourmash_ray.functions.oracle import (
    jaccard_mins,
    oracle_clusters,
    oracle_dup_pairs,
    sketch_table,
)
from sourmash_ray.functions.sketch import SketchParams
from sourmash_ray.sources.transcripts import synth_transcripts

PARAMS = SketchParams(ksize=12, scaled=4, num=0)
CFG = EngineConfig(sketch=PARAMS)  # default LSH: 126 perms, 42 bands of 3


@pytest.fixture(scope="module")
def corpus():
    return synth_transcripts(60, seed=13)


@pytest.fixture(scope="module")
def pipeline_out(ray_session, corpus):
    import ray.data

    from sourmash_ray.pipelines.dedup import dedup_pipeline

    out = dedup_pipeline(ray.data.from_arrow(corpus), CFG)
    return {
        "verified": out["verified_pairs"].take_all(),
        "clusters": out["clusters"].take_all(),
    }


@pytest.fixture(scope="module")
def oracle(corpus):
    sketches = sketch_table(corpus, PARAMS)
    pairs = oracle_dup_pairs(sketches, PARAMS, CFG.verify_threshold)
    return {"sketches": sketches, "pairs": pairs}


def test_dup_pair_recall(pipeline_out, oracle):
    """≥ 0.99 of oracle pairs end up in the same predicted cluster."""
    label = {r["conv_id"]: r["cluster_id"] for r in pipeline_out["clusters"]}
    truth = oracle["pairs"]
    assert truth, "oracle found no planted dup pairs — corpus broken"
    hit = sum(1 for a, b in truth if label[a] == label[b])
    recall = hit / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f} over {len(truth)} pairs"


def test_verified_jaccard_matches_oracle(pipeline_out, oracle):
    sk = oracle["sketches"]
    assert pipeline_out["verified"], "no verified pairs"
    for r in pipeline_out["verified"]:
        ref = jaccard_mins(sk[r["a"]]["mins"], sk[r["b"]]["mins"], PARAMS)
        assert r["jaccard"] == pytest.approx(ref, abs=1e-12), (r["a"], r["b"])
        assert r["jaccard"] >= CFG.verify_threshold


def test_verified_pairs_no_false_positives(pipeline_out, oracle):
    """Every verified pair is an oracle pair (verification is exact)."""
    truth = oracle["pairs"]
    for r in pipeline_out["verified"]:
        assert (r["a"], r["b"]) in truth


def test_cluster_assignment_matches_oracle(pipeline_out, oracle, corpus):
    """Cluster labels equal oracle union-find labels (min-id per component)
    wherever the pair sets agree — with recall ≥ 0.99 and exact verification
    they agree on this corpus in full."""
    ids = sorted(set(corpus["conv_id"].to_pylist()))
    ref = oracle_clusters(oracle["pairs"], ids)
    got = {r["conv_id"]: r["cluster_id"] for r in pipeline_out["clusters"]}
    assert set(got) == set(ref)
    mismatches = {i for i in ids if got[i] != ref[i]}
    assert not mismatches, sorted(mismatches)[:10]


def test_every_conversation_labeled(pipeline_out, corpus):
    ids = set(corpus["conv_id"].to_pylist())
    labels = {r["conv_id"] for r in pipeline_out["clusters"]}
    assert labels == ids


def test_transcripts_roundtrip_text_equality(tmp_path):
    """Per-turn text equality under stable (conv_id, turn_idx) ordering —
    the input_hint per-row invariant."""
    import pyarrow.parquet as pq

    tbl = synth_transcripts(10, seed=21)
    pq.write_table(tbl, tmp_path / "t.parquet")
    back = pq.read_table(tmp_path / "t.parquet")
    a = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    b = back.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    assert a.equals(b)


def test_threshold_sweep_matches_bruteforce(ray_session, corpus):
    """The one-banding-pass sweep's curve equals the brute-force
    all-pairs curve at every threshold (planted corpus: LSH recall 1)."""
    import itertools

    import ray.data

    from sourmash_ray.pipelines.dedup import neardup_threshold_sweep

    thr = [0.25, 0.5, 0.75, 0.9, 0.9999]
    got = {r["threshold_e4"]: r["n_pairs"]
           for r in neardup_threshold_sweep(
               ray.data.from_arrow(corpus), CFG,
               thresholds=thr).take_all()}
    sk = sketch_table(corpus, PARAMS)
    js = [jaccard_mins(sk[a]["mins"], sk[b]["mins"], PARAMS)
          for a, b in itertools.combinations(sorted(sk), 2)]
    want = {int(round(t * 1e4)): sum(1 for j in js if j >= t)
            for t in thr}
    assert got == want
    assert got[2500] >= got[9999] > 0  # curve is monotone + non-trivial

"""Recall under the DEFAULT production config, extreme skew, and the
distributed connected-components path."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from sourmash_ray.config import DEFAULT_CONFIG, EngineConfig, ExecParams, LSHParams
from sourmash_ray.functions.oracle import oracle_dup_pairs, sketch_table
from sourmash_ray.sources.transcripts import synth_transcripts


def test_recall_default_config(ray_session):
    """Default ksize=31/scaled=16/126-perm LSH on a 200-base corpus:
    same-cluster recall ≥ 0.99 vs the brute-force oracle (BASELINE.md
    headline target at the production config)."""
    import ray.data

    from sourmash_ray.pipelines.dedup import dedup_pipeline

    corpus = synth_transcripts(200, seed=47)
    out = dedup_pipeline(ray.data.from_arrow(corpus), DEFAULT_CONFIG)
    label = {r["conv_id"]: r["cluster_id"]
             for r in out["clusters"].take_all()}

    sketches = sketch_table(corpus, DEFAULT_CONFIG.sketch)
    truth = oracle_dup_pairs(sketches, DEFAULT_CONFIG.sketch,
                             DEFAULT_CONFIG.verify_threshold)
    assert truth
    hit = sum(1 for a, b in truth if label[a] == label[b])
    recall = hit / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f} over {len(truth)} pairs"


def test_extreme_skew_bounded_pairs(ray_session):
    """A corpus where 60 conversations are IDENTICAL (one mega-bucket in
    every band): hot-bucket chaining must keep candidate pairs ~linear in
    the bucket size (not 60·59/2 per band) while the cluster still comes
    out as one component."""
    import ray.data

    from sourmash_ray.pipelines.dedup import dedup_pipeline
    from sourmash_ray.stages.lsh import candidate_pairs
    from sourmash_ray.stages.sketch import sketch_transcripts

    base = synth_transcripts(5, seed=51)
    # replicate conversation c0000000 60× under new ids
    tbl = base.to_pydict()
    src_rows = [i for i, c in enumerate(tbl["conv_id"]) if c == "c0000000"]
    rows = {k: list(v) for k, v in tbl.items()}
    for j in range(60):
        for i in src_rows:
            for k in rows:
                v = tbl[k][i]
                if k == "conv_id":
                    v = f"dup{j:03d}"
                rows[k].append(v)
    corpus = pa.table(rows).cast(base.schema)

    cap = 16
    cfg = EngineConfig(
        lsh=LSHParams(num_perm=12, bands=4, rows=3,
                      max_bucket_pairs_members=cap),
        sketch=DEFAULT_CONFIG.sketch)
    ds = ray.data.from_arrow(corpus)
    sigs = sketch_transcripts(ds, cfg).materialize()
    pairs = candidate_pairs(sigs, cfg).materialize()
    n_members = 61  # c0000000 + 60 clones
    # capped: per band ≤ 2·g edges (star+chain), 4 bands, plus a few pairs
    # among the 4 unrelated convs
    assert pairs.count() <= 4 * 2 * n_members + 20, pairs.count()

    out = dedup_pipeline(ds, cfg)
    label = {r["conv_id"]: r["cluster_id"] for r in out["clusters"].take_all()}
    clones = {c for c in label if c.startswith("dup")} | {"c0000000"}
    got = {label[c] for c in clones}
    assert got == {"c0000000"}, got


def test_distributed_label_propagation_matches_driver_uf(ray_session):
    """Force the distributed CC path (driver cutoff 0) and check it equals
    the driver union-find labels."""
    import ray.data

    from sourmash_ray.stages.cluster import connected_components

    edges = pa.table({
        "a": ["n1", "n2", "n5", "n7", "n8", "n3"],
        "b": ["n2", "n3", "n6", "n8", "n9", "n1"],
    })
    ds = ray.data.from_arrow(edges)
    driver = {r["node"]: r["label"]
              for r in connected_components(ds, DEFAULT_CONFIG).take_all()}
    forced = EngineConfig(exec=ExecParams(driver_cc_max_edges=0))
    dist = {r["node"]: r["label"]
            for r in connected_components(ds, forced).take_all()}
    assert driver == dist
    assert dist["n3"] == "n1" and dist["n9"] == "n7" and dist["n6"] == "n5"


def test_num_mode_dedup_end_to_end(ray_session):
    """bottom-k (num-mode) sketches through the FULL pipeline: exact clones
    cluster together and verified jaccard uses the combined bottom-k
    estimator (minhash.rs:593-621 semantics)."""
    import ray.data

    from sourmash_ray.functions.oracle import jaccard_mins, sketch_table
    from sourmash_ray.functions.sketch import SketchParams
    from sourmash_ray.pipelines.dedup import dedup_pipeline

    params = SketchParams(ksize=12, scaled=0, num=64)
    cfg = EngineConfig(sketch=params, lsh=LSHParams(num_perm=12, bands=4,
                                                    rows=3))
    corpus = synth_transcripts(40, seed=53)
    out = dedup_pipeline(ray.data.from_arrow(corpus), cfg)
    label = {r["conv_id"]: r["cluster_id"]
             for r in out["clusters"].take_all()}
    clones = [c for c in label if "_xd" in c]
    assert clones
    for c in clones:
        assert label[c] == label[c.split("_xd")[0]], c

    sketches = sketch_table(corpus, params)
    for r in out["verified_pairs"].take_all():
        ref = jaccard_mins(sketches[r["a"]]["mins"],
                           sketches[r["b"]]["mins"], params)
        assert abs(r["jaccard"] - ref) < 1e-12, (r["a"], r["b"])


def test_long_conv_ids_no_key_aliasing(ray_session):
    """conv_ids longer than any fixed guess (previously S32-truncated) must
    not alias in the broadcast searchsorted paths."""
    import pyarrow as pa
    import ray.data

    from sourmash_ray.pipelines.dedup import dedup_pipeline

    base = synth_transcripts(10, seed=59)
    prefix = "x" * 40  # shared 40-byte prefix: truncation would alias ids
    tbl = base.to_pydict()
    tbl["conv_id"] = [prefix + c for c in tbl["conv_id"]]
    corpus = pa.table(tbl).cast(base.schema)
    cfg = EngineConfig(sketch=DEFAULT_CONFIG.sketch,
                       lsh=LSHParams(num_perm=12, bands=4, rows=3))
    out = dedup_pipeline(ray.data.from_arrow(corpus), cfg)
    label = {r["conv_id"]: r["cluster_id"] for r in out["clusters"].take_all()}
    assert len(label) == len(set(tbl["conv_id"]))
    clones = [c for c in label if "_xd" in c]
    assert clones
    for c in clones:
        assert label[c] == label[c.split("_xd")[0]], c
    # distinct (non-clone) conversations must NOT share clusters
    bases = [c for c in label if "_" not in c.split(prefix)[1]]
    non_dup_labels = [label[c] for c in bases]
    assert len(set(non_dup_labels)) > 1


def test_simhash_neardup_pigeonhole(ray_session, tmp_path):
    """SimHash banding recall is EXACT for hamming ≤ 3 (pigeonhole over
    4×16-bit chunks): compare against brute-force over all doc pairs."""
    import pyarrow.parquet as pq

    from sourmash_ray.config import DEFAULT_CONFIG
    from sourmash_ray.pipelines.docops import simhash_docs, simhash_neardup_pairs

    sf = "/root/testdata/sf0.01"
    sims = {r["doc_id"]: int(r["simhash"])
            for r in simhash_docs(sf, DEFAULT_CONFIG).take_all()}
    ids = sorted(sims)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(sims[a] ^ sims[b]).count("1") <= 3:
                truth.add((a, b))
    got = {(r["a"], r["b"])
           for r in simhash_neardup_pairs(sf, DEFAULT_CONFIG).take_all()}
    assert got == truth


def test_verify_exchange_path_equals_broadcast(ray_session):
    """Force the beyond-broadcast co-group verify (budget=0) and check it
    produces exactly the broadcast path's verified pairs."""
    import ray.data

    from sourmash_ray.stages.lsh import candidate_pairs
    from sourmash_ray.stages.sketch import sketch_transcripts
    from sourmash_ray.stages.verify import verify_pairs

    corpus = synth_transcripts(40, seed=61)
    cfg_b = EngineConfig(sketch=DEFAULT_CONFIG.sketch,
                         lsh=LSHParams(num_perm=12, bands=4, rows=3))
    cfg_x = EngineConfig(sketch=DEFAULT_CONFIG.sketch,
                         lsh=LSHParams(num_perm=12, bands=4, rows=3),
                         exec=ExecParams(broadcast_bytes_limit=0))
    ds = ray.data.from_arrow(corpus)
    sigs = sketch_transcripts(ds, cfg_b).materialize()
    pairs = candidate_pairs(sigs, cfg_b, distinct=False).materialize()

    want = sorted((r["a"], r["b"], round(r["jaccard"], 12))
                  for r in verify_pairs(pairs, sigs, cfg_b).take_all())
    got = sorted({(r["a"], r["b"], round(r["jaccard"], 12))
                  for r in verify_pairs(pairs, sigs, cfg_x).take_all()})
    # broadcast path may emit duplicate rows for duplicate candidates;
    # compare distinct sets
    assert got == sorted(set(want))


def test_distributed_cc_random_graph(ray_session):
    """Randomized CC equivalence: 400 random edges over 120 nodes,
    forced-distributed label propagation ≡ driver union-find."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sourmash_ray.stages.cluster import connected_components

    rng = np.random.default_rng(67)
    n_nodes = 120
    e = rng.integers(0, n_nodes, size=(400, 2))
    e = e[e[:, 0] != e[:, 1]]
    edges = pa.table({
        "a": pa.array([f"node{x:04d}" for x in e[:, 0]], pa.string()),
        "b": pa.array([f"node{x:04d}" for x in e[:, 1]], pa.string()),
    })
    ds = ray.data.from_arrow(edges)
    driver = {r["node"]: r["label"]
              for r in connected_components(ds, DEFAULT_CONFIG).take_all()}
    forced = EngineConfig(exec=ExecParams(driver_cc_max_edges=0))
    dist = {r["node"]: r["label"]
            for r in connected_components(ds, forced).take_all()}
    assert dist == driver


def test_embedding_neardup_exchange_equals_broadcast(ray_session):
    """Forced beyond-broadcast co-group cosine verify ≡ broadcast path
    (the embedding near-dup pipeline shares score_pairs with the
    flagship)."""
    from sourmash_ray.pipelines.ann import embedding_neardup_pairs

    sf = "/root/testdata/sf0.01"
    want = sorted((r["a"], r["b"], r["cosine"])
                  for r in embedding_neardup_pairs(sf).take_all())
    forced = EngineConfig(exec=ExecParams(broadcast_bytes_limit=0))
    got = sorted((r["a"], r["b"], r["cosine"])
                 for r in embedding_neardup_pairs(sf, cfg=forced).take_all())
    assert want and got == want


def test_angular_exchange_equals_broadcast(ray_session):
    """Angular (abundance-cosine) verify now has the exchange fallback;
    forced path ≡ broadcast path."""
    import ray.data

    from sourmash_ray.sources.transcripts import synth_transcripts
    from sourmash_ray.stages.lsh import candidate_pairs
    from sourmash_ray.stages.sketch import sketch_transcripts
    from sourmash_ray.stages.verify import angular_pairs

    corpus = synth_transcripts(40, seed=61)
    cfg_b = EngineConfig(sketch=DEFAULT_CONFIG.sketch,
                         lsh=LSHParams(num_perm=12, bands=4, rows=3))
    cfg_x = EngineConfig(sketch=DEFAULT_CONFIG.sketch,
                         lsh=LSHParams(num_perm=12, bands=4, rows=3),
                         exec=ExecParams(broadcast_bytes_limit=0))
    ds = ray.data.from_arrow(corpus)
    sigs = sketch_transcripts(ds, cfg_b).materialize()
    pairs = candidate_pairs(sigs, cfg_b).materialize()
    want = sorted((r["a"], r["b"], round(r["similarity"], 12))
                  for r in angular_pairs(pairs, sigs, cfg_b,
                                         threshold=0.1).take_all())
    got = sorted((r["a"], r["b"], round(r["similarity"], 12))
                 for r in angular_pairs(pairs, sigs, cfg_x,
                                        threshold=0.1).take_all())
    assert want and got == want


def test_two_level_exchange_equals_single_level(ray_session):
    """Forcing the two-level path (max_fanout below n_parts) must produce
    exactly the single-level exchange's partitions (SCALE.md §2)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sourmash_ray.stages.exchange import exchange_map_groups

    rng = np.random.default_rng(9)
    n = 20_000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 10_000, n), pa.int64()),
        "v": pa.array(rng.integers(0, 1 << 40, n), pa.int64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(7)
    schema = pa.schema([("k", pa.int64()), ("sum_v", pa.int64())])

    def merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return schema.empty_table()
        import pyarrow.compute as pc

        g = part.group_by("k").aggregate([("v", "sum")])
        g = g.sort_by("k")
        return pa.table({"k": g["k"],
                         "sum_v": pc.cast(g["v_sum"], pa.int64())})

    n_parts = 37
    single = exchange_map_groups(ds, "k", n_parts, merge, schema,
                                 max_fanout=256).take_all()
    double = exchange_map_groups(ds, "k", n_parts, merge, schema,
                                 max_fanout=8).take_all()
    key = lambda r: (r["k"], r["sum_v"])
    assert sorted(map(key, single)) == sorted(map(key, double))
    # exact totals
    assert sum(r["sum_v"] for r in double) == int(
        np.asarray(tbl["v"]).sum())


def test_two_level_exchange_checkpoint_resume(ray_session, tmp_path):
    """Partition-level resume works identically through the two-level
    path: completed part files are reused, missing ones recomputed."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data

    from sourmash_ray.stages.exchange import exchange_map_groups

    rng = np.random.default_rng(13)
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 500, 5000), pa.int64()),
        "v": pa.array(rng.integers(0, 1000, 5000), pa.int64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    schema = pa.schema([("k", pa.int64()), ("n", pa.int64())])

    def merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return schema.empty_table()
        g = part.group_by("k").aggregate([("v", "count")]).sort_by("k")
        return pa.table({"k": g["k"], "n": g["v_count"]})

    ck = str(tmp_path / "ck")
    first = exchange_map_groups(ds, "k", 20, merge, schema,
                                checkpoint_dir=ck, fingerprint="t",
                                max_fanout=4).take_all()
    # delete two partitions; rerun must regenerate only those
    parts = sorted(os.listdir(ck))
    removed = [p for p in parts if p.endswith(".parquet")][:2]
    for p in removed:
        os.remove(os.path.join(ck, p))
    second = exchange_map_groups(ds, "k", 20, merge, schema,
                                 checkpoint_dir=ck, fingerprint="t",
                                 max_fanout=4).take_all()
    key = lambda r: (r["k"], r["n"])
    assert sorted(map(key, first)) == sorted(map(key, second))


def test_langid_handles_non_ascii(ray_session):
    import pyarrow as pa

    from sourmash_ray.pipelines.docops import LangIdScorer

    sc = LangIdScorer()
    out = sc(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["el día está aquí con el sol",
                          "die straße ist schön und die stadt"]),
        "lang": pa.array(["es", "de"]),
    }))
    assert out["lang_guess"].to_pylist() == ["es", "de"]


def test_embedding_neardup_full_recall_vs_bruteforce(ray_session):
    """full_pairs emission: every bucket-coincident pair above threshold
    is returned (no star+chain truncation); found ⊆ exact; recall vs the
    exact cosine pair set reported by the multi-table LSH probability."""
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.ann import embedding_neardup_pairs

    sf = "/root/testdata/sf0.01"
    thr = 0.4
    found = {(r["a"], r["b"]): r["cosine"]
             for r in embedding_neardup_pairs(sf, threshold=thr).take_all()}
    emb = pq.read_table(f"{sf}/embeddings.parquet")
    ids = np.asarray(emb["vec_id"])
    mat = np.vstack([np.asarray(v) for v in emb["embedding"].to_pylist()])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                           1e-12)
    cos = mat @ mat.T
    iu, ju = np.triu_indices(len(ids), 1)
    above = cos[iu, ju] >= thr
    exact = {(int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
             for i, j in zip(iu[above], ju[above])}
    assert set(found) <= exact          # precision 1 (exact verify)
    recall = len(found) / len(exact) if exact else 1.0
    # multi-table LSH expected recall ~0.94 at these defaults; 0.8 floor
    # guards against a capping regression without flaking on LSH variance
    assert recall >= 0.8, f"recall {recall:.3f} over {len(exact)} pairs"


def test_dedup_pipeline_unicode_end_to_end(ray_session):
    """Non-ASCII conv_ids AND text flow through sketch → LSH → verify →
    exact edges → clustering without ASCII-encode crashes; exact unicode
    duplicates land in one cluster."""
    import pyarrow as pa
    import ray.data

    from sourmash_ray.pipelines.dedup import dedup_pipeline

    text = ("die straße ist schön und die stadt über dem fluß glänzt "
            "am frühen morgen im goldenen licht der aufgehenden sonne — "
            "ein tag voller möglichkeiten beginnt für alle bewohner")
    rows = []
    for cid, body in [("konv-ä-1", text), ("konv-ö-2", text),
                      ("konv-ü-3", "completamente diferente aquí con "
                       "palabras únicas que no aparecen en ningún otro "
                       "documento de esta colección de prueba número")]:
        for t, chunk in enumerate([body, body[::-1]]):
            rows.append({"conv_id": cid, "turn_idx": t, "role": "user",
                         "text": chunk, "tool": "", "ts": 0})
    tbl = pa.table({
        "conv_id": pa.array([r["conv_id"] for r in rows]),
        "turn_idx": pa.array([r["turn_idx"] for r in rows],
                             pa.int32()),
        "role": pa.array([r["role"] for r in rows]),
        "text": pa.array([r["text"] for r in rows]),
        "tool": pa.array([r["tool"] for r in rows]),
        "ts": pa.array([r["ts"] for r in rows], pa.int64()),
    })
    out = dedup_pipeline(ray.data.from_arrow(tbl))
    label = {r["conv_id"]: r["cluster_id"]
             for r in out["clusters"].take_all()}
    assert set(label) == {"konv-ä-1", "konv-ö-2", "konv-ü-3"}
    assert label["konv-ä-1"] == label["konv-ö-2"]
    assert label["konv-ü-3"] != label["konv-ä-1"]


def test_assign_clusters_exchange_equals_broadcast(ray_session):
    """Forced beyond-broadcast label attach (broadcast_bytes_limit=0) goes
    through the id-hash exchange co-group (no Dataset.join) and must equal
    the broadcast searchsorted attach exactly, including left-outer
    self-label semantics for edge-less conversations."""
    import ray.data

    from sourmash_ray.stages.cluster import assign_clusters

    ids = [f"conv-{i:03d}" for i in range(30)] + ["naïve-é-ünïcode"]
    sigs = ray.data.from_arrow(pa.table({"conv_id": pa.array(ids)}))
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array(["conv-001", "conv-002", "conv-010",
                       "naïve-é-ünïcode"]),
        "b": pa.array(["conv-002", "conv-003", "conv-011", "conv-020"]),
    }))
    want = {r["conv_id"]: r["cluster_id"]
            for r in assign_clusters(sigs, edges,
                                     DEFAULT_CONFIG).take_all()}
    forced = EngineConfig(exec=ExecParams(broadcast_bytes_limit=0))
    got = {r["conv_id"]: r["cluster_id"]
           for r in assign_clusters(sigs, edges, forced).take_all()}
    assert len(want) == len(ids)
    assert got == want
    assert want["conv-003"] == "conv-001"          # chained component
    assert want["conv-005"] == "conv-005"          # singleton self-label
    assert want["naïve-é-ünïcode"] == "conv-020"   # non-ASCII id hashed


def test_recall_abundance_angular_mode(ray_session):
    """Abundance-mode flagship twin (VERDICT r4 item 6): the SAME
    pipeline with track_abundance=True and angular-cosine verification
    reaches >= 0.99 same-cluster recall vs the brute-force angular
    oracle (the reference runs its whole matrix in flat AND abund
    variants, tests/conftest.py:27-60)."""
    import dataclasses

    import ray.data

    from sourmash_ray.functions.oracle import oracle_angular_pairs
    from sourmash_ray.pipelines.dedup import dedup_pipeline

    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        sketch=dataclasses.replace(DEFAULT_CONFIG.sketch,
                                   track_abundance=True))
    corpus = synth_transcripts(200, seed=47)
    out = dedup_pipeline(ray.data.from_arrow(corpus), cfg,
                         metric="angular")
    label = {r["conv_id"]: r["cluster_id"]
             for r in out["clusters"].take_all()}

    sketches = sketch_table(corpus, cfg.sketch)
    truth = oracle_angular_pairs(sketches, cfg.sketch,
                                 cfg.verify_threshold)
    assert truth, "fixture must contain angular dup pairs"
    hit = sum(1 for a, b in truth if label[a] == label[b])
    recall = hit / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f} over {len(truth)} pairs"
    # verified pair scores are true angular similarities >= threshold
    for r in out["verified_pairs"].take_all():
        assert r["similarity"] >= cfg.verify_threshold


def test_angular_mode_requires_abundance(ray_session):
    import ray.data

    from sourmash_ray.pipelines.dedup import dedup_pipeline

    corpus = synth_transcripts(5, seed=3)
    with pytest.raises(ValueError, match="track_abundance"):
        dedup_pipeline(ray.data.from_arrow(corpus), DEFAULT_CONFIG,
                       metric="angular")


def test_recall_max_containment_mode(ray_session):
    """Containment-mode flagship: same pipeline with max_containment
    verification; recall >= 0.99 vs the brute-force containment
    oracle (subset/prefix duplicates that Jaccard dilutes)."""
    import ray.data

    from sourmash_ray.functions.oracle import sketch_table
    from sourmash_ray.functions.setops import max_containment
    from sourmash_ray.functions.sketch import Sketch
    from sourmash_ray.pipelines.dedup import dedup_pipeline

    corpus = synth_transcripts(150, seed=52)
    out = dedup_pipeline(ray.data.from_arrow(corpus), DEFAULT_CONFIG,
                         metric="max_containment")
    label = {r["conv_id"]: r["cluster_id"]
             for r in out["clusters"].take_all()}

    sketches = sketch_table(corpus, DEFAULT_CONFIG.sketch)
    ids = sorted(sketches)
    sk = {i: Sketch(mins=sketches[i]["mins"], abunds=None,
                    params=DEFAULT_CONFIG.sketch) for i in ids}
    thr = DEFAULT_CONFIG.verify_threshold
    truth = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
             if len(sk[a].mins) and len(sk[b].mins)
             and max_containment(sk[a], sk[b]) >= thr}
    assert truth
    hit = sum(1 for a, b in truth if label[a] == label[b])
    recall = hit / len(truth)
    assert recall >= 0.99, f"recall {recall:.4f} over {len(truth)} pairs"


def test_windowed_dedup_equals_horizon_restricted(ray_session):
    """Time-windowed dedup == the full pipeline's verified pairs
    restricted to |window_a - window_b| <= 1 (identical scores), and
    pairs beyond the horizon are excluded."""
    import ray.data

    from sourmash_ray.pipelines.dedup import (dedup_pipeline,
                                              dedup_transcripts_windowed)

    corpus = synth_transcripts(120, seed=61)
    ts = corpus["ts"].cast(pa.int64()).to_pylist()
    cid = corpus["conv_id"].to_pylist()
    tmin: dict = {}
    for c, t in zip(cid, ts):
        tmin[c] = min(tmin.get(c, t), t)
    span = max(tmin.values()) - min(tmin.values())
    window_us = max(1, span // 5)      # ~6 windows
    w = {c: t // window_us for c, t in tmin.items()}

    src = ray.data.from_arrow(corpus)
    full = dedup_pipeline(src, DEFAULT_CONFIG)
    ver_full = {(r["a"], r["b"]): round(r["jaccard"], 12)
                for r in full["verified_pairs"].take_all()}
    out = dedup_transcripts_windowed(src, window_us, DEFAULT_CONFIG)
    ver_win = {(r["a"], r["b"]): round(r["jaccard"], 12)
               for r in out["verified_pairs"].take_all()}

    want = {p: j for p, j in ver_full.items()
            if abs(w[p[0]] - w[p[1]]) <= 1}
    assert ver_win == want
    assert ver_win, "fixture must contain within-horizon pairs"
    # the horizon must actually exclude something in this fixture, else
    # the test is vacuous
    assert len(want) < len(ver_full)
    # clusters cover every conversation
    labels = {r["conv_id"] for r in out["clusters"].take_all()}
    assert labels == set(tmin)

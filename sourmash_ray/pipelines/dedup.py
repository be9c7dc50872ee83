"""The flagship pipeline: transcripts → near-duplicate clusters.

North-star shape (SURVEY.md §2.9 / §7): sketch → LSH bands (groupby on
band key) → candidate pairs → verify (true sketch Jaccard) → exact-dup
edges (identical md5, the ``found_md5`` dedup idea of
``/root/reference/src/sourmash/search.py:682-691`` promoted to an operator)
→ union-find connected components → cluster assignment per conversation.

Every intermediate is a streaming Ray Dataset; ``checkpoint_dir`` opts into
stage-level Parquet materialization with lineage manifests so a failed run
resumes past the expensive shuffles.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..config import EngineConfig, DEFAULT_CONFIG
from ..sources.transcripts import read_transcripts
from ..stages.cluster import assign_clusters
from ..stages.lsh import candidate_pairs
from ..stages.sketch import sketch_transcripts
from ..stages.verify import verify_pairs
from ..state.checkpoint import checkpoint_dataset


def _exact_edges_part(part: pa.Table) -> pa.Table:
    """Star edges for every identical-md5 run within one coarse partition
    (vectorized run detection; empty sketches are excluded upstream — they
    share a vacuous md5 but have Jaccard 0 by the max(1, denom) rule,
    ``minhash.rs:624-631``)."""
    import numpy as np

    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string())})
    if part.num_rows < 2:
        return empty
    part = part.select(["md5", "conv_id"]).sort_by(
        [("md5", "ascending"), ("conv_id", "ascending")])
    md5 = np.asarray(part["md5"].combine_chunks().to_numpy(
        zero_copy_only=False))
    conv = part["conv_id"].combine_chunks()
    new = np.concatenate([[True], md5[1:] != md5[:-1]])
    starts = np.flatnonzero(new)
    sizes = np.diff(np.concatenate([starts, [md5.size]]))
    ai, bi = [], []
    for s, g in zip(starts[sizes >= 2], sizes[sizes >= 2]):
        g = int(g)
        ai.append(np.full(g - 1, s))
        bi.append(np.arange(s + 1, s + g))
    if not ai:
        return empty
    return pa.table({
        "a": conv.take(pa.array(np.concatenate(ai), pa.int64())),
        "b": conv.take(pa.array(np.concatenate(bi), pa.int64())),
    })


def exact_dup_edges(sigs, group_parts: int = 1024):
    """Identical-sketch star edges: coarse groupby over md5 (the
    ``found_md5`` dedup promoted to an operator)."""
    import numpy as np
    import pyarrow.compute as pc

    def _key(batch: pa.Table) -> pa.Table:
        from ..functions.segscore import hash_strings64

        keep = pc.greater(pc.list_value_length(batch["mins"]), 0)
        t = batch.select(["conv_id", "md5"]).filter(keep)
        mp = hash_strings64(t["md5"]) % group_parts
        return t.append_column("md5_part", pa.array(mp, pa.int64()))

    from ..stages.exchange import exchange_map_groups
    from ..stages.lsh import PAIRS_SCHEMA
    from ..config import resolve_num_partitions

    keyed = (sigs.select_columns(["conv_id", "md5", "mins"])
             .map_batches(_key, batch_format="pyarrow"))
    return exchange_map_groups(
        keyed, "md5_part", 2 * resolve_num_partitions(DEFAULT_CONFIG),
        _exact_edges_part, PAIRS_SCHEMA)


def dedup_pipeline(
    source,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    metric: str = "jaccard",
):
    """Run the full near-dup pipeline.

    ``source``: an sf_dir string (synthesizes/reads the transcripts corpus)
    or an existing transcripts Dataset.

    ``metric``: ``"jaccard"`` (flat sketches, default),
    ``"max_containment"`` (keeps prefix/subset duplicates whose Jaccard
    is diluted by length difference — ``minhash.py:881-905``), or
    ``"angular"`` (abundance-cosine verification via
    :func:`stages.verify.angular_pairs` — requires
    ``cfg.sketch.track_abundance``; the reference runs its whole test
    matrix in both flat and abund variants,
    ``tests/conftest.py:27-60``). In angular mode the identical-md5
    exact-dup edges are SKIPPED: md5 digests mins only, so two sketches
    with equal mins but different abundances can sit below the angular
    threshold — force-merging them would be wrong. True exact duplicates
    (equal text → equal abunds) score 1.0 and merge through verification.

    Returns dict of Datasets: ``signatures``, ``verified_pairs``,
    ``clusters`` (conv_id → cluster_id for every conversation).
    """
    if metric not in ("jaccard", "angular", "max_containment"):
        raise ValueError(f"unknown dedup metric {metric!r}")
    if metric == "angular" and not cfg.sketch.track_abundance:
        raise ValueError("metric='angular' requires "
                         "cfg.sketch.track_abundance=True")
    if isinstance(source, str):
        ds = read_transcripts(source)
        fingerprint = f"v2|sf={source}|cfg={cfg.sketch}|{cfg.lsh}|{metric}"
    else:
        ds = source
        if checkpoint_dir:
            # content fingerprint for Dataset sources: row count + checksum
            # of sampled (conv_id, TEXT) rows — ids alone would silently
            # resume stale verified-pairs/cluster checkpoints after a
            # same-shape edit of the texts (ADVICE r2)
            from ..functions.segscore import hash_strings64

            n_rows = ds.count()
            sample = ds.limit(512).select_columns(
                ["conv_id", "text"]).take_all()
            crc = int((hash_strings64([r["conv_id"] for r in sample])
                       ^ hash_strings64([r["text"] or ""
                                         for r in sample])
                       ).sum()) & 0xFFFFFFFFFFFF if sample else 0
            fingerprint = (f"v2|ds|n={n_rows}|crc={crc:x}"
                           f"|cfg={cfg.sketch}|{cfg.lsh}|{metric}")
        else:
            fingerprint = f"v2|ds|cfg={cfg.sketch}|{cfg.lsh}|{metric}"

    sigs = sketch_transcripts(
        ds, cfg,
        checkpoint_dir=(os.path.join(checkpoint_dir, "signature_parts")
                        if checkpoint_dir else None),
        fingerprint=fingerprint)
    if checkpoint_dir:
        sigs, _ = checkpoint_dataset(
            sigs, os.path.join(checkpoint_dir, "signatures"),
            stage="signatures", fingerprint=fingerprint, resume=resume)
    else:
        # reused by banding, two verify joins and cluster assignment —
        # materialize once into the object store instead of recomputing
        sigs = sigs.materialize()

    # distinct pairs BEFORE verify: with the vectorized scorer a verify
    # pass over band-duplicated pairs (~10× rows) costs more than the
    # pair dedup it used to hide behind; verified output needs no
    # post-dedup because verify is per-pair deterministic
    pairs = candidate_pairs(sigs, cfg)
    # launch the exact-dup md5 exchange NOW: its raw Ray tasks run
    # concurrently with the verify materialization below (independent
    # branches over the same materialized sigs)
    # exact md5 edges are valid for jaccard AND max_containment
    # (identical mins => both scores are 1.0) but NOT for angular
    # (equal mins with different abunds can sit below threshold)
    exact_edges = exact_dup_edges(sigs) if metric != "angular" else None
    if metric == "angular":
        from ..stages.verify import angular_pairs

        verified = angular_pairs(pairs, sigs, cfg,
                                 threshold=cfg.verify_threshold)
    else:
        verified = verify_pairs(pairs, sigs, cfg, metric=metric)
    if checkpoint_dir:
        verified, _ = checkpoint_dataset(
            verified, os.path.join(checkpoint_dir, "verified_pairs"),
            stage="verified_pairs", fingerprint=fingerprint, resume=resume)
    else:
        verified = verified.materialize()

    edges = verified.select_columns(["a", "b"])
    if exact_edges is not None:
        edges = edges.union(exact_edges)
    clusters = assign_clusters(sigs, edges, cfg)
    if checkpoint_dir:
        clusters, _ = checkpoint_dataset(
            clusters, os.path.join(checkpoint_dir, "clusters"),
            stage="clusters", fingerprint=fingerprint, resume=resume)

    return {"signatures": sigs, "verified_pairs": verified,
            "clusters": clusters}

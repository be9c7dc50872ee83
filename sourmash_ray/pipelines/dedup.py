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


def _exact_group_edges(group: pa.Table) -> pa.Table:
    """Star edges within one identical-md5 group (skipping empty sketches:
    empty sketches share a vacuous md5 but have Jaccard 0 by the
    max(1, denom) rule, ``minhash.rs:624-631``)."""
    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string())})
    if group.num_rows < 2 or len(group["mins"][0]) == 0:
        return empty
    ids = sorted(group["conv_id"].to_pylist())
    root = ids[0]
    return pa.table({"a": pa.array([root] * (len(ids) - 1), pa.string()),
                     "b": pa.array(ids[1:], pa.string())})


def exact_dup_edges(sigs):
    """groupby(md5) → star edges between identical sketches."""
    return (
        sigs.select_columns(["conv_id", "md5", "mins"])
        .groupby("md5")
        .map_groups(_exact_group_edges, batch_format="pyarrow")
    )


def dedup_pipeline(
    source,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    checkpoint_dir: str | None = None,
    resume: bool = True,
):
    """Run the full near-dup pipeline.

    ``source``: an sf_dir string (synthesizes/reads the transcripts corpus)
    or an existing transcripts Dataset.

    Returns dict of Datasets: ``signatures``, ``verified_pairs``,
    ``clusters`` (conv_id → cluster_id for every conversation).
    """
    if isinstance(source, str):
        ds = read_transcripts(source)
        fingerprint = f"sf={source}|cfg={cfg.sketch}|{cfg.lsh}"
    else:
        ds = source
        fingerprint = f"ds|cfg={cfg.sketch}|{cfg.lsh}"

    sigs = sketch_transcripts(ds, cfg)
    if checkpoint_dir:
        sigs, _ = checkpoint_dataset(
            sigs, os.path.join(checkpoint_dir, "signatures"),
            stage="signatures", fingerprint=fingerprint, resume=resume)
    else:
        # reused by banding, two verify joins and cluster assignment —
        # materialize once into the object store instead of recomputing
        sigs = sigs.materialize()

    pairs = candidate_pairs(sigs, cfg)
    verified = verify_pairs(pairs, sigs, cfg)
    if checkpoint_dir:
        verified, _ = checkpoint_dataset(
            verified, os.path.join(checkpoint_dir, "verified_pairs"),
            stage="verified_pairs", fingerprint=fingerprint, resume=resume)
    else:
        verified = verified.materialize()

    edges = verified.select_columns(["a", "b"]).union(exact_dup_edges(sigs))
    clusters = assign_clusters(sigs, edges, cfg)
    if checkpoint_dir:
        clusters, _ = checkpoint_dataset(
            clusters, os.path.join(checkpoint_dir, "clusters"),
            stage="clusters", fingerprint=fingerprint, resume=resume)

    return {"signatures": sigs, "verified_pairs": verified,
            "clusters": clusters}

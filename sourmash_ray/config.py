"""Engine configuration.

``SketchParams`` (functions/sketch.py) mirrors the reference's
``ComputeParameters`` (``/root/reference/src/sourmash/command_sketch.py:25-30,
864-1085``). ``EngineConfig`` adds what the reference never needed — LSH
banding parameters and Ray Data execution knobs — because the new engine
replaces the O(n²) ``compare`` ancestor (``/root/reference/src/sourmash/
compare.py:14-64``) with banded candidate generation at 10^12-turn scale.

LSH default (bands=42, rows=3, 126 permutations): for a true-Jaccard-0.5
pair the candidate-capture probability is 1-(1-0.5^3)^42 ≈ 0.9965, which
(together with the exact-md5 dedup path that catches identical texts with
probability 1) clears the dup-pair recall ≥ 0.99 target at the default
verify threshold 0.5.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .functions.sketch import SketchParams

# Default transcript sketch config — the analogue of the reference's DNA
# default "k=31,scaled=1000" (command_sketch.py:26). Conversations are a
# few KB of normalized text, so scaled=16 keeps O(100) mins per sketch.
DEFAULT_SKETCH = SketchParams(ksize=31, scaled=16, num=0, seed=42,
                              track_abundance=False, normalization="ws")


@dataclass(frozen=True)
class LSHParams:
    """Classic MinHash-LSH banding over a ``num_perm``-permutation
    signature (Broder '97 / MMDS ch.3 — public algorithm)."""

    num_perm: int = 126
    bands: int = 42
    rows: int = 3
    # buckets larger than this are "hot bands" (boilerplate); they are
    # chained instead of fully paired (SURVEY.md §4 skew row).
    max_bucket_pairs_members: int = 64

    def __post_init__(self):
        if self.bands * self.rows != self.num_perm:
            raise ValueError("bands*rows must equal num_perm")


@dataclass(frozen=True)
class ExecParams:
    """Ray Data execution knobs. ``num_partitions=None`` resolves to the
    cluster CPU count at run time (hash-shuffle joins spawn that many
    aggregator actors; oversizing it versus the cluster starves the other
    stages and can deadlock a small test cluster)."""

    num_partitions: int | None = None  # shuffle/join partition count
    sketch_batch_size: int = 1024      # turns per sketcher batch (L2-friendly)
    verify_batch_size: int = 8192      # pairs per verifier batch
    cc_max_iters: int = 25             # label-propagation round cap
    # coarse-group vectorization: per-key map_groups costs one Python call
    # per group, so keys are first folded into `group_parts` coarse
    # partitions and each partition is processed with vectorized run
    # detection (one call per partition, not per key). Scale by raising
    # this so a partition stays ~1e6 rows.
    group_parts: int = 1024
    # connected components run as a driver-side union-find below this edge
    # count (single pass, C-speed dict ops); above it the distributed
    # label-propagation loop takes over.
    driver_cc_max_edges: int = 5_000_000
    # side tables below this size are ray.put-broadcast into map_batches
    # (searchsorted gathers per batch) instead of hash-shuffle joined.
    # Sized to the single-node object store; a multi-node deployment keeps
    # the same knob per-node (the broadcast is one object, read zero-copy).
    broadcast_bytes_limit: int = 4 << 30


def resolve_num_partitions(cfg: "EngineConfig") -> int:
    if cfg.exec.num_partitions:
        return cfg.exec.num_partitions
    try:
        import ray

        if ray.is_initialized():
            return max(2, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        pass
    return 8


@dataclass(frozen=True)
class EngineConfig:
    sketch: SketchParams = DEFAULT_SKETCH
    lsh: LSHParams = field(default_factory=LSHParams)
    exec: ExecParams = field(default_factory=ExecParams)
    verify_threshold: float = 0.5     # jaccard cut for a verified dup pair


DEFAULT_CONFIG = EngineConfig()

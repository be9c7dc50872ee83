"""``ray job submit`` entrypoint for the flagship near-dup pipeline.

On a real cluster (the north rule's deployment shape):

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python jobs/dedup_job.py \
        --input s3://bucket/transcripts/ --out s3://bucket/dedup_out/ \
        --checkpoint-dir s3://bucket/dedup_ckpt/

The job connects to the cluster it was submitted to (``ray.init()``
inside a submitted job attaches to the running cluster), streams the
input Parquet through sketch → LSH → verify → clustering, writes
partitioned Parquet, and reports throughput metrics on stdout (one JSON
line — the driver-side lineage metric the north rule asks for).
``--checkpoint-dir`` enables stage + partition-level resume: resubmitting
the identical job skips completed work.

In this sandbox there is no dashboard/job server; the same entrypoint
runs directly (``python jobs/dedup_job.py --input <sf_dir>``) against a
local session.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="transcripts Parquet dir or sf dir")
    ap.add_argument("--out", default=None,
                    help="output dir for clusters Parquet")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--metric", default="jaccard",
                    choices=["jaccard", "max_containment", "angular"],
                    help="verification metric (angular requires "
                         "track_abundance sketches and skips md5 "
                         "exact edges)")
    ap.add_argument("--window-us", type=int, default=None,
                    help="time-horizon mode: only pairs within "
                         "adjacent min-ts windows are candidates")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode only; ignored on a cluster")
    ap.add_argument("--audit", action="store_true",
                    help="with --tiered docs: append a residual-dup-"
                         "rate audit of the kept set (sampled all-pairs "
                         "verify) to the metrics line")
    ap.add_argument("--tiered", default=None,
                    choices=["docs", "transcripts", "embeddings"],
                    help="run the tier-dedup cascade instead of the "
                         "flat pipeline: 'docs' = exact->simhash->"
                         "minhash over <input>/documents.parquet, "
                         "'transcripts' = exact(sig-md5)->jaccard->"
                         "containment; output is the one-row-per-"
                         "record (id, tier, rep) table")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # inside `ray job submit` this attaches to the cluster; locally it
        # starts a session
        kwargs = {}
        if args.num_cpus:
            kwargs = dict(address="local", num_cpus=args.num_cpus,
                          include_dashboard=False)
        ray.init(**kwargs)

    import dataclasses

    from sourmash_ray.config import DEFAULT_CONFIG
    from sourmash_ray.pipelines.dedup import (dedup_pipeline,
                                              dedup_transcripts_windowed)

    cfg = DEFAULT_CONFIG
    if args.metric == "angular":
        cfg = dataclasses.replace(
            cfg, sketch=dataclasses.replace(cfg.sketch,
                                            track_abundance=True))

    t0 = time.perf_counter()
    if args.tiered:
        if args.metric != "jaccard" or args.window_us:
            raise SystemExit("--tiered is incompatible with --metric/"
                             "--window-us (the cascade fixes its own "
                             "tier metrics)")
        from sourmash_ray.pipelines.tiered import (
            tiered_dedup_docs, tiered_dedup_embeddings,
            tiered_dedup_transcripts)

        fn = {"docs": tiered_dedup_docs,
              "transcripts": tiered_dedup_transcripts,
              "embeddings": tiered_dedup_embeddings}[args.tiered]
        tiers = fn(args.input, cfg, checkpoint_dir=args.checkpoint_dir)
        if args.audit or args.out:
            tiers = tiers.materialize()
        if args.out:
            tiers.write_parquet(args.out)
        n = tiers.count()
        audit = None
        if args.audit:
            if args.tiered == "docs":
                from sourmash_ray.pipelines.tiered import residual_dup_rate

                audit = residual_dup_rate(args.input, cfg,
                                          tiers=tiers).take_all()[0]
            elif args.tiered == "embeddings":
                from sourmash_ray.pipelines.tiered import (
                    residual_cosine_rate)

                audit = residual_cosine_rate(args.input, cfg,
                                             tiers=tiers).take_all()[0]
            else:
                raise SystemExit("--audit supports --tiered "
                                 "docs/embeddings only")
        wall = time.perf_counter() - t0
        rep = {
            "job": f"tiered_dedup_{args.tiered}",
            "input": args.input,
            "rows": n,
            "wall_s": round(wall, 2),
            "cluster_cpus": ray.cluster_resources().get("CPU"),
            "out": args.out,
            "checkpoint_dir": args.checkpoint_dir,
        }
        if audit is not None:
            rep["audit"] = {k: int(v) for k, v in audit.items()}
        print(json.dumps(rep))
        ray.shutdown()
        return
    if args.window_us:
        if args.metric != "jaccard":
            raise SystemExit("--window-us supports jaccard only")
        out = dedup_transcripts_windowed(args.input, args.window_us, cfg)
    else:
        out = dedup_pipeline(args.input, cfg,
                             checkpoint_dir=args.checkpoint_dir,
                             metric=args.metric)
    clusters = out["clusters"]
    if args.out:
        clusters.write_parquet(args.out)
        n = clusters.count()
    else:
        n = clusters.count()
    wall = time.perf_counter() - t0
    print(json.dumps({
        "job": "dedup_transcripts",
        "input": args.input,
        "clusters_rows": n,
        "verified_pairs": out["verified_pairs"].count(),
        "wall_s": round(wall, 2),
        "cluster_cpus": ray.cluster_resources().get("CPU"),
        "out": args.out,
        "checkpoint_dir": args.checkpoint_dir,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

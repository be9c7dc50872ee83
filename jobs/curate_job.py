"""``ray job submit`` entrypoint for the training-data curation sweep.

The docops composition a corpus-prep run actually executes: exact dedup
(md5 representative), quality curation gate (quantile length band +
repetition + benchmark decontamination), language ID — each stage a
streaming Dataset over the same pruned read, outputs written as
partitioned Parquet per stage so a resubmit can skip finished stages.

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python jobs/curate_job.py \
        --input s3://bucket/documents/ --out s3://bucket/curated/

Locally: ``python jobs/curate_job.py --input /root/testdata/sf0.01
--out /tmp/curated --num-cpus 8``.
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
    ap.add_argument("--input", required=True, help="sf dir with documents.parquet")
    ap.add_argument("--out", default=None, help="output root (one subdir per stage)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {}
        if args.num_cpus:
            kwargs = dict(address="local", num_cpus=args.num_cpus,
                          include_dashboard=False)
        ray.init(**kwargs)

    from sourmash_ray.pipelines import docops

    stages = {
        "exact_dedup": docops.exact_dedup_docs,
        "curated": docops.curate_docs,
        "langid": docops.langid_docs,
        # round-3 gates: composite Gopher rules, exact-match benchmark
        # leakage, LM-based quality score — each another streaming pass
        "quality_gate": docops.quality_filter_docs,
        "exact_decontam": docops.exact_decontaminate_docs,
        "lm_score": docops.trigram_lm_score_docs,
    }
    t0 = time.perf_counter()
    counts = {}
    for name, fn in stages.items():
        if args.out:
            dest = os.path.join(args.out, name)
            done = os.path.join(dest, "_DONE")
            if os.path.exists(done):      # stage-level resume: skip
                counts[name] = "skipped (done)"  # before building the
                continue                         # stage's Dataset graph
            fn(args.input).write_parquet(dest)
            open(done, "w").write("ok")
            counts[name] = "written"
        else:
            counts[name] = fn(args.input).count()
    print(json.dumps({
        "job": "curate_documents",
        "input": args.input,
        "stages": counts,
        "wall_s": round(time.perf_counter() - t0, 2),
        "cluster_cpus": ray.cluster_resources().get("CPU"),
        "out": args.out,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()

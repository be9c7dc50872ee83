"""``ray job submit`` entrypoint for the corpus-health audit suite.

On a real cluster:

    ray job submit --address http://<head>:8265 \
        --working-dir . -- python jobs/audit_job.py \
        --input s3://bucket/corpus/ --out s3://bucket/audit_out/

Runs the cross-cutting integrity/hygiene audits a training-data corpus
is gated on BEFORE an expensive train run — referential coverage across
modalities, exact-duplicate inventories, train/heldout leakage, and
source-mirror detection — each a bounded-output distributed pipeline
(id/fingerprint/token exchanges; no all-pairs anywhere). Emits ONE JSON
metrics line on stdout (headline scalars per audit + wall time) and,
with ``--out``, the full per-audit tables as Parquet subdirectories.

In this sandbox the same entrypoint runs directly:
``python jobs/audit_job.py --input /root/testdata/sf0.001``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

AUDITS = ("coverage", "conv_dups", "leakage", "dup_sources",
          "vocab_overlap", "lexdiv", "echo", "drift", "dup_depth")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="sf-style corpus dir")
    ap.add_argument("--out", default=None,
                    help="output dir: one Parquet subdir per audit")
    ap.add_argument("--audits", default=",".join(AUDITS),
                    help=f"comma list from {AUDITS}")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode only; ignored on a cluster")
    args = ap.parse_args()
    selected = [a for a in args.audits.split(",") if a]
    unknown = set(selected) - set(AUDITS)
    if unknown:
        raise SystemExit(f"unknown audits: {sorted(unknown)}")

    import ray

    if not ray.is_initialized():
        kwargs = {}
        if args.num_cpus:
            kwargs = dict(address="local", num_cpus=args.num_cpus,
                          include_dashboard=False)
        ray.init(**kwargs)

    import pyarrow as pa

    from sourmash_ray.pipelines.ann import doc_embedding_coverage
    from sourmash_ray.pipelines.docops import (dup_rate_by_source_docs,
                                               vocab_overlap_sources_docs)
    from sourmash_ray.pipelines.transcriptops import (
        conv_lexical_diversity, exact_dedup_conversations,
        split_leakage_transcripts)

    t0 = time.perf_counter()
    metrics: dict = {"input": args.input, "audits": selected}

    def _emit(name: str, table):
        """Persist one audit's full table (Dataset or pa.Table)."""
        if args.out is None:
            return
        dest = os.path.join(args.out, name)
        if isinstance(table, pa.Table):
            import pyarrow.parquet as pq

            os.makedirs(dest, exist_ok=True)
            pq.write_table(table, os.path.join(dest, "part-0.parquet"))
        else:
            table.write_parquet(dest)

    if "coverage" in selected:
        row = doc_embedding_coverage(args.input).take_all()[0]
        metrics["coverage"] = {k: int(row[k]) for k in
                               ("matched", "docs_without_vec",
                                "vecs_without_doc")}

    if "conv_dups" in selected:
        groups = exact_dedup_conversations(args.input).materialize()
        rows = groups.take_all()
        metrics["conv_dups"] = {
            "n_groups": len(rows),
            "n_dup_convs": int(sum(r["n_convs"] for r in rows)),
        }
        _emit("conv_dups", groups)

    if "leakage" in selected:
        leaks = split_leakage_transcripts(args.input).materialize()
        rows = leaks.take_all()
        metrics["leakage"] = {
            "n_leaking_groups": len(rows),
            "n_heldout_leaked": int(sum(r["n_heldout"] for r in rows)),
        }
        _emit("leakage", leaks)

    if "dup_sources" in selected:
        t = dup_rate_by_source_docs(args.input).materialize()
        rows = t.take_all()
        worst = max(rows, key=lambda r: (1_000_000 * r["n_dups"]
                                         // max(r["n_docs"], 1),
                                         r["source"]), default=None)
        metrics["dup_sources"] = {
            "n_sources": len(rows),
            "worst_source": worst["source"] if worst else None,
            "worst_dup_ppm": (1_000_000 * int(worst["n_dups"])
                              // max(int(worst["n_docs"]), 1)
                              if worst else 0),
        }
        _emit("dup_sources", t)

    if "vocab_overlap" in selected:
        t = vocab_overlap_sources_docs(args.input)
        rows = t.to_pylist()
        worst = max(rows, key=lambda r: (r["jaccard_ppm"], r["source_a"],
                                         r["source_b"]), default=None)
        metrics["vocab_overlap"] = {
            "n_pairs": len(rows),
            "max_jaccard_ppm": int(worst["jaccard_ppm"]) if worst else 0,
            "max_pair": ([worst["source_a"], worst["source_b"]]
                         if worst else None),
        }
        _emit("vocab_overlap", t)

    if "lexdiv" in selected:
        t = conv_lexical_diversity(args.input).materialize()
        lo = t.sort(["ttr_ppm", "conv_id"]).limit(5).take_all()
        metrics["lexdiv"] = {
            "n_convs": t.count(),
            "min_ttr_ppm": int(lo[0]["ttr_ppm"]) if lo else None,
            "lowest_convs": [r["conv_id"] for r in lo],
        }
        _emit("lexdiv", t)

    if "echo" in selected:
        from sourmash_ray.pipelines.transcriptops import (
            echo_rate_transcripts)

        t = echo_rate_transcripts(args.input).materialize()
        rows = t.take_all()
        n_pairs = int(sum(r["n_pairs"] for r in rows))
        metrics["echo"] = {
            "n_pairs": n_pairs,
            "echo_ppm": (1_000_000 * int(sum(r["n_echo"] for r in rows))
                         // max(n_pairs, 1)),
            "mean_jaccard_ppm": (
                1_000_000 * int(sum(r["sum_inter"] for r in rows))
                // max(int(sum(r["sum_union"] for r in rows)), 1)),
        }
        _emit("echo", t)

    if "drift" in selected:
        from sourmash_ray.pipelines.transcriptops import (
            conv_topic_drift_histogram)

        t = conv_topic_drift_histogram(args.input).materialize()
        rows = t.take_all()
        n = int(sum(r["n_convs"] for r in rows))
        stuck = int(sum(r["n_convs"] for r in rows
                        if r["drift_decile"] >= 8))
        metrics["drift"] = {
            "n_convs": n,
            # high first↔last overlap = the conversation went nowhere
            "stuck_ppm": 1_000_000 * stuck // max(n, 1),
        }
        _emit("drift", t)

    if "dup_depth" in selected:
        from sourmash_ray.pipelines.transcriptops import (
            conv_dup_depth_matrix)

        t = conv_dup_depth_matrix(args.input).materialize()
        rows = t.take_all()
        dup_turns = int(sum(r["n_turns"] * r["n_convs"]
                            for r in rows if r["is_dup"]))
        all_turns = int(sum(r["n_turns"] * r["n_convs"] for r in rows))
        metrics["dup_depth"] = {
            "dup_turn_ppm": 1_000_000 * dup_turns // max(all_turns, 1),
            "n_dup_convs": int(sum(r["n_convs"] for r in rows
                                   if r["is_dup"])),
        }
        _emit("dup_depth", t)

    metrics["wall_s"] = round(time.perf_counter() - t0, 3)
    print("AUDIT " + json.dumps(metrics))


if __name__ == "__main__":
    main()

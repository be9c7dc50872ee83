"""CLI — the ``sourmash <cmd>`` surface re-expressed over Ray Data.

Subcommands mirror the reference's entry points (``/root/reference/src/
sourmash/cli/__init__.py`` dispatch): sketch, dedup (the north-star
pipeline; no reference equivalent), search, prefetch, gather, compare,
describe, index. The CLI owns the Ray session (guarded init, shutdown at
exit) — library code never calls ray.init (driver contract).

Examples::

    python -m sourmash_ray sketch --sf /root/testdata/sf0.001 --out /tmp/sigs
    python -m sourmash_ray dedup  --sf /root/testdata/sf0.001 --out /tmp/dedup
    python -m sourmash_ray search --sf /root/testdata/sf0.001 --query c0000000
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None) -> bool:
    """Guarded init; returns True when THIS process created the session
    (only then does the CLI shut it down — a caller-owned session, e.g.
    the test fixture's, is left alone)."""
    import ray

    if ray.is_initialized():
        return False
    kwargs = dict(address="local", include_dashboard=False,
                  logging_level="ERROR")
    if num_cpus:
        kwargs["num_cpus"] = num_cpus
    ray.init(**kwargs)
    return True


def _sigs(args):
    from .config import DEFAULT_CONFIG
    from .sources.transcripts import read_transcripts
    from .stages.sketch import sketch_transcripts

    return sketch_transcripts(read_transcripts(args.sf), DEFAULT_CONFIG
                              ).materialize()


def main(argv=None):
    p = argparse.ArgumentParser(prog="sourmash_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, **kw):
        sp = sub.add_parser(name, **kw)
        sp.add_argument("--sf", required=True,
                        help="sf dir (e.g. /root/testdata/sf0.001)")
        return sp

    add("sketch").add_argument("--out", required=True)
    d = add("dedup")
    d.add_argument("--out", required=True)
    d.add_argument("--checkpoint-dir", default=None)
    for name in ("search", "prefetch", "gather"):
        sp = add(name)
        sp.add_argument("--query", required=True)
        sp.add_argument("--threshold", type=float, default=0.08)
    add("compare").add_argument("--out", required=True)
    add("describe")
    ix = add("index")
    ix.add_argument("--out", required=True)
    ix.add_argument("--sbt", action="store_true",
                    help="build a .sbt.json/.sbt.zip Sequence Bloom Tree "
                         "instead of the exploded inverted index")
    di = add("distinct")
    di.add_argument("--exact", action="store_true",
                    help="exact COUNT(DISTINCT) via the exchange instead "
                         "of the HLL estimate")
    di.add_argument("--p", type=int, default=14,
                    help="HLL precision (registers = 2^p)")
    add("tax-rollup")
    tp = sub.add_parser(
        "tax-prepare",
        help="convert lineage CSVs into one SqliteLineage 1.0 database "
             "(reference `tax prepare`); later --csv files win on "
             "duplicate idents")
    tp.add_argument("--csv", action="append", required=True,
                    help="lineage CSV (repeatable; .gz ok)")
    tp.add_argument("--out", required=True, help="output .sqldb path")
    mg = sub.add_parser(
        "migrate",
        help="rewrite a legacy (v1-v5) SBT as the current v6 layout "
             "(reference `sourmash migrate`)")
    mg.add_argument("src", help="legacy .sbt.json / .sbt.zip")
    mg.add_argument("--out", required=True,
                    help="output .sbt.json or .sbt.zip path")
    ts = sub.add_parser(
        "tax-summarize",
        help="summarize lineage spreadsheets: entry/rank counts + "
             "per-prefix lineage counts (reference `tax summarize`)")
    ts.add_argument("--csv", action="append", required=True,
                    help="lineage CSV (repeatable; .gz ok)")
    ts.add_argument("--out", default=None,
                    help="write the lineage-count CSV here")
    tg = sub.add_parser(
        "tax-grep",
        help="regex search over lineage NAMES; emits a picklist "
             "(reference `tax grep`)")
    tg.add_argument("pattern")
    tg.add_argument("--csv", action="append", required=True,
                    help="lineage CSV (repeatable; .gz ok)")
    tg.add_argument("--rank", default=None,
                    help="restrict the search to this rank name")
    tg.add_argument("-v", "--invert-match", action="store_true")
    tg.add_argument("-i", "--ignore-case", action="store_true")
    tg.add_argument("--count", action="store_true",
                    help="print only the match count")
    tg.add_argument("--out", default=None,
                    help="write the picklist CSV here")
    pk = add("picklist")
    pk.add_argument("--coltype", default="ident",
                    help="name|md5|ident|identprefix|md5short")
    pk.add_argument("--values", required=True,
                    help="comma-separated picked values")
    pk.add_argument("--exclude", action="store_true")
    dc = add("doc")
    dc.add_argument("--op", required=True,
                    choices=["split", "sample", "quantiles", "tokens",
                             "exact-dedup", "grouped-topk", "shuffle"])
    dc.add_argument("--out", default=None)
    dc.add_argument("--by-lang", action="store_true",
                    help="quantiles: per-language thresholds")
    dc.add_argument("--k", type=int, default=3,
                    help="grouped-topk: rows kept per key")
    an = add("ann")
    an.add_argument("--op", required=True, choices=["build", "query"])
    an.add_argument("--index", required=True,
                    help="IVF index dir (lists/list_id=N + centroids)")
    an.add_argument("--n-centroids", type=int, default=16)
    an.add_argument("--nprobe", type=int, default=4)
    an.add_argument("--k", type=int, default=5)
    sg = add("sig")
    sg.add_argument("--op", required=True,
                    choices=["downsample", "flatten", "filter", "extract",
                             "merge", "intersect", "subtract", "rename",
                             "manifest"])
    sg.add_argument("--out", default=None)
    sg.add_argument("--scaled", type=int, default=None)
    sg.add_argument("--min-abund", type=int, default=1)
    sg.add_argument("--pattern", default=None)
    sg.add_argument("--prefix", default="renamed_")

    # plugin-registered subcommands (cli_script hook): `scripts <command>`
    from . import plugins as _plugins

    scripts_help = "plugin subcommands:\n  " + "\n  ".join(
        _plugins.get_cli_scripts_descriptions())
    scr = sub.add_parser(
        "scripts", description=scripts_help,
        formatter_class=argparse.RawDescriptionHelpFormatter,
        help="plugin-registered subcommands (cli_script hook)")
    scr_sub = scr.add_subparsers(dest="script_cmd", required=True)
    script_objs = _plugins.add_cli_scripts(scr_sub)

    args = p.parse_args(argv)
    owns_ray = _init_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "scripts":
            return script_objs[args.script_cmd].main(args)
        from .config import DEFAULT_CONFIG

        if args.cmd == "sketch":
            sigs = _sigs(args)
            sigs.write_parquet(args.out)
            print(json.dumps({"signatures": sigs.count(), "out": args.out}))
        elif args.cmd == "dedup":
            from .pipelines.dedup import dedup_pipeline

            out = dedup_pipeline(args.sf, DEFAULT_CONFIG,
                                 checkpoint_dir=args.checkpoint_dir)
            out["clusters"].write_parquet(args.out)
            print(json.dumps({
                "clusters_rows": out["clusters"].count(),
                "verified_pairs": out["verified_pairs"].count(),
                "out": args.out,
            }))
        elif args.cmd in ("search", "prefetch"):
            from .pipelines import sourmash_parity as sp_

            fn = sp_.search if args.cmd == "search" else sp_.prefetch
            kwargs = ({"threshold": args.threshold}
                      if args.cmd == "search" else {})
            rows = fn(_sigs(args), args.query, DEFAULT_CONFIG,
                      **kwargs).take_all()
            for r in rows[:25]:
                print(json.dumps(r))
        elif args.cmd == "gather":
            from .pipelines.sourmash_parity import gather

            tbl = gather(_sigs(args), args.query, DEFAULT_CONFIG)
            for r in tbl.to_pylist():
                print(json.dumps(r))
        elif args.cmd == "compare":
            from .pipelines.sourmash_parity import compare_exact

            ds = compare_exact(_sigs(args), DEFAULT_CONFIG)
            ds.write_parquet(args.out)
            print(json.dumps({"pairs": ds.count(), "out": args.out}))
        elif args.cmd == "describe":
            from .stages.sigops import describe_sigs

            for r in describe_sigs(_sigs(args)).take(25):
                print(json.dumps(r))
        elif args.cmd == "index":
            from .stages.index import build_inverted_index, write_index

            if args.sbt:
                from .stages.sbt import build_sbt

                tree = build_sbt(_sigs(args))
                saved = tree.save(args.out)
                print(json.dumps({"leaves": len(tree),
                                  "internal": len(tree.nodes),
                                  "out": saved}))
            else:
                idx = build_inverted_index(_sigs(args))
                write_index(idx, args.out)
                print(json.dumps({"entries": idx.count(),
                                  "out": args.out}))
        elif args.cmd == "distinct":
            from .pipelines.docops import (
                approx_distinct_tokens, distinct_tokens_exact,
            )

            tbl = (distinct_tokens_exact(args.sf) if args.exact
                   else approx_distinct_tokens(args.sf, p=args.p))
            print(json.dumps(tbl.to_pylist()[0]))
        elif args.cmd == "tax-prepare":
            from .sources.lineage_db import (
                load_lineage_csv, merge_lineage_dbs, write_lineage_sqlite,
            )

            dbs = [load_lineage_csv(c) for c in args.csv]
            merged = merge_lineage_dbs(*reversed(dbs))  # last CSV wins
            write_lineage_sqlite(merged, args.out)
            print(json.dumps({"idents": len(merged), "out": args.out}))
        elif args.cmd == "migrate":
            from .stages.sbt import migrate_sbt

            out = migrate_sbt(args.src, args.out)
            print(json.dumps({"src": args.src, "out": out,
                              "version": 6}))
        elif args.cmd == "tax-summarize":
            import pyarrow.csv as pacsv

            from .sources.lineage_db import (load_lineage_csv,
                                             merge_lineage_dbs)
            from .stages.tax import tax_summarize

            dbs = [load_lineage_csv(c) for c in args.csv]
            summary, tbl = tax_summarize(merge_lineage_dbs(
                *reversed(dbs)))
            if args.out:
                pacsv.write_csv(tbl, args.out)
                summary["out"] = args.out
            print(json.dumps(summary))
        elif args.cmd == "tax-grep":
            import pyarrow.csv as pacsv

            from .sources.lineage_db import (load_lineage_csv,
                                             merge_lineage_dbs)
            from .stages.tax import tax_grep

            dbs = [load_lineage_csv(c) for c in args.csv]
            tbl = tax_grep(merge_lineage_dbs(*reversed(dbs)),
                           args.pattern, rank=args.rank,
                           invert=args.invert_match,
                           ignore_case=args.ignore_case)
            if args.count:
                print(json.dumps({"matches": tbl.num_rows}))
            elif args.out:
                pacsv.write_csv(tbl, args.out)
                print(json.dumps({"matches": tbl.num_rows,
                                  "out": args.out}))
            else:
                for r in tbl.to_pylist():
                    print(json.dumps(r))
        elif args.cmd == "tax-rollup":
            from .pipelines.relational import tax_rollup_customers

            for r in tax_rollup_customers(args.sf).take_all():
                print(json.dumps(r))
        elif args.cmd == "sig":
            from .stages import sigops

            sigs = _sigs(args)
            if args.op == "downsample":
                out = sigops.downsample_sigs(sigs, args.scaled or 32)
            elif args.op == "flatten":
                out = sigops.flatten_sigs(sigs)
            elif args.op == "filter":
                out = sigops.abund_filter_sigs(sigs,
                                               min_abund=args.min_abund)
            elif args.op == "extract":
                out = sigops.extract_sigs(sigs, name_pattern=args.pattern)
            elif args.op == "rename":
                out = sigops.rename_sigs(sigs,
                                         lambda c: args.prefix + c)
            elif args.op == "manifest":
                path = args.out or "/tmp/sourmash_ray_manifest"
                sigops.write_manifest(sigs, path)
                print(json.dumps({"manifest": path}))
                return
            elif args.op == "subtract":
                from .stages.sigops import subtract_from

                first = sigs.take(1)[0]["conv_id"]
                res = subtract_from(sigs, first)
                print(json.dumps({"op": "subtract",
                                  "target": res["conv_id"],
                                  "n_mins": int(len(res["mins"])),
                                  "n_removed": res["n_removed"]}))
                return
            elif args.op in ("merge", "intersect"):
                fn = (sigops.merge_all if args.op == "merge"
                      else sigops.intersect_all)
                res = fn(sigs)
                print(json.dumps({
                    "op": args.op, "n_mins": int(len(res["mins"])),
                    "md5": res.get("md5"),
                }))
                return
            if args.out:
                out.write_parquet(args.out)
                print(json.dumps({"rows": out.count(), "out": args.out}))
            else:
                for r in out.take(10):
                    r.pop("mins", None)
                    r.pop("abunds", None)
                    r.pop("perms", None)
                    print(json.dumps(r, default=str))
        elif args.cmd == "doc":
            import pyarrow as pa

            from .pipelines import docops, relational

            if args.op == "split":
                res = docops.hash_split_docs(args.sf)
            elif args.op == "sample":
                res = docops.stratified_sample_docs(args.sf)
            elif args.op == "quantiles":
                res = (docops.length_quantiles_by_lang(args.sf)
                       if args.by_lang
                       else docops.length_quantiles_docs(args.sf))
            elif args.op == "tokens":
                res = docops.bpe_token_counts_docs(args.sf)
            elif args.op == "exact-dedup":
                res = docops.exact_dedup_docs(args.sf)
            elif args.op == "shuffle":
                res = docops.shard_shuffle_docs(args.sf)
            else:
                res = relational.grouped_topk_orders(args.sf, k=args.k)
            if args.out:
                if isinstance(res, pa.Table):
                    import pyarrow.parquet as pq

                    pq.write_table(res, args.out)
                    n = res.num_rows
                else:
                    res.write_parquet(args.out)
                    n = res.count()
                print(json.dumps({"rows": n, "out": args.out}))
            elif isinstance(res, pa.Table):
                for r in res.to_pylist()[:25]:
                    print(json.dumps(r))
            else:
                for r in res.take(25):
                    print(json.dumps(r, default=str))
        elif args.cmd == "ann":
            from .pipelines.ann import ann_topk_ivf_index, ivf_build_index

            if args.op == "build":
                cents = ivf_build_index(args.sf, args.index,
                                        n_centroids=args.n_centroids)
                print(json.dumps({"centroids": int(cents.shape[0]),
                                  "out": args.index}))
            else:
                tbl = ann_topk_ivf_index(args.index, k=args.k,
                                         nprobe=args.nprobe)
                for r in tbl.to_pylist():
                    print(json.dumps(r))
        elif args.cmd == "picklist":
            from .stages.picklist import PickStyle, picklist_filter

            style = (PickStyle.EXCLUDE if args.exclude
                     else PickStyle.INCLUDE)
            out = picklist_filter(
                _sigs(args).select_columns(["conv_id", "md5"]), "conv_id",
                args.values.split(","), coltype=args.coltype, style=style)
            for r in out.take(25):
                print(json.dumps(r))
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())

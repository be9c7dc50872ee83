"""Taxonomic summarization of gather results.

The reference's ``tax metagenome`` consumer
(``/root/reference/src/sourmash/tax/tax_utils.py:2328-2420``
``summarize_up_ranks`` / ``build_summarized_result``): each gather match
carries a lineage; at every rank the match's ``f_unique_to_query`` /
``f_unique_weighted`` / ``unique_intersect_bp`` accumulate into the
lineage truncated at that rank, results sort by fraction desc, and the
uncovered remainder becomes an ``unclassified`` row. Gather tables are
per-query and small, so this is a pure-Arrow function — the distributed
shape is a ``map_groups`` over per-query gather outputs with the lineage
map broadcast (same pattern as ``relational.tax_rollup_customers``).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

TAX_SUMMARY_SCHEMA = pa.schema([
    ("rank", pa.int64()),
    ("lineage", pa.string()),
    ("fraction", pa.float64()),
    ("f_weighted_at_rank", pa.float64()),
    ("bp_match_at_rank", pa.int64()),
])


def tax_metagenome(gather_tbl: pa.Table, lineage_of: dict,
                   n_ranks: int | None = None) -> pa.Table:
    """Summarize one query's gather result at every lineage rank.

    ``lineage_of``: match id → ';'-joined lineage string. Matches with no
    lineage entry count toward ``unclassified`` (reference behavior for
    unannotated genomes). Fractions at a rank sum the per-match
    ``f_unique_to_query`` (disjoint by gather's min-set-cov construction,
    so sums stay ≤ 1; ``check_values`` raises above 1 in the reference —
    here a ValueError mirrors it).
    """
    matches = gather_tbl["match"].to_pylist()
    f_uniq = np.asarray(gather_tbl["f_unique_to_query"], np.float64)
    f_w = np.asarray(gather_tbl["f_unique_weighted"], np.float64)
    bp = np.asarray(gather_tbl["unique_intersect_bp"], np.int64)

    lineages = [lineage_of.get(m) for m in matches]
    if n_ranks is None:
        n_ranks = max((len(s.split(";")) for s in lineages if s),
                      default=1)

    rows = []
    for rank in range(n_ranks):
        acc: dict[str, list] = {}
        unclassified_f = unclassified_w = 0.0
        for i, lin in enumerate(lineages):
            parts = lin.split(";") if lin else []
            if len(parts) <= rank:
                unclassified_f += float(f_uniq[i])
                unclassified_w += float(f_w[i])
                continue
            key = ";".join(parts[: rank + 1])
            slot = acc.setdefault(key, [0.0, 0.0, 0])
            slot[0] += float(f_uniq[i])
            slot[1] += float(f_w[i])
            slot[2] += int(bp[i])
        covered = sum(v[0] for v in acc.values()) + unclassified_f
        if covered > 1 + 1e-9:
            raise ValueError(
                f"fraction > 1 at rank {rank}: gather rows overlap")
        # remainder of the query not covered by any match
        unclassified_f += max(0.0, 1.0 - covered)
        ordered = sorted(acc.items(), key=lambda kv: (-kv[1][0], kv[0]))
        for lin, (f, w, b) in ordered:
            rows.append({"rank": rank, "lineage": lin, "fraction": f,
                         "f_weighted_at_rank": w, "bp_match_at_rank": b})
        if unclassified_f > 0:
            rows.append({"rank": rank, "lineage": "unclassified",
                         "fraction": unclassified_f,
                         "f_weighted_at_rank": unclassified_w,
                         "bp_match_at_rank": 0})
    return pa.Table.from_pylist(rows, schema=TAX_SUMMARY_SCHEMA)


# ---------------------------------------------------------------------------
# gather-CSV interop + CAMI bioboxes writer
# ---------------------------------------------------------------------------

# the columns tax consumers require from a gather CSV
# (``tax_utils.py:754-850`` ``load_gather_results`` essential-column check)
GATHER_CSV_REQUIRED = ("match", "f_unique_to_query", "f_unique_weighted",
                       "unique_intersect_bp")


def write_gather_csv(gather_tbl: pa.Table, path: str) -> str:
    """Gather-result CSV writer (the ``-o`` CSV of ``sourmash gather``,
    ``search.py:367-400`` column discipline — here the engine's own
    GatherResult columns)."""
    import pyarrow.csv as pacsv

    pacsv.write_csv(gather_tbl, path)
    return path


def load_gather_csv(path: str) -> pa.Table:
    """Gather-CSV reader for the tax consumers
    (``tax_utils.py:754-956``): validates the essential columns are
    present and the file is non-empty, then hands the table straight to
    :func:`tax_metagenome` / rollups."""
    import pyarrow.csv as pacsv

    tbl = pacsv.read_csv(path)
    missing = [c for c in GATHER_CSV_REQUIRED
               if c not in tbl.column_names]
    if missing:
        raise ValueError(
            f"not a gather CSV: missing columns {missing} in '{path}'")
    if tbl.num_rows == 0:
        raise ValueError(f"gather CSV '{path}' is empty")
    return tbl


def write_bioboxes(tax_tbl: pa.Table, out_path: str, *,
                   sample_id: str = "query",
                   rank_names: tuple = ("superkingdom", "phylum", "class",
                                        "order", "family", "genus",
                                        "species", "strain"),
                   sep: str = "\t") -> str:
    """CAMI profiling Bioboxes writer for a :func:`tax_metagenome` table
    (``tax_utils.py:1100-1115`` ``write_bioboxes`` +
    ``:2772-2830`` ``make_cami_bioboxes``): header block, then one
    ``TAXID RANK TAXPATH TAXPATHSN PERCENTAGE`` row per classified
    lineage, percentage = ``f_weighted_at_rank``×100 at 2 decimals.
    This engine carries no numeric NCBI taxids, so TAXID/TAXPATH use the
    lineage names (the spec's fields, names standing in for ids);
    ``unclassified`` rows are skipped like the reference's
    unassigned-lineage guard."""
    rows = tax_tbl.to_pylist()
    lines = [
        "# Taxonomic Profiling Output",
        f"@SampleID:{sample_id}",
        "@Version:0.10.0",
        "@Ranks:" + "|".join(
            rank_names[:max((r["rank"] for r in rows), default=0) + 1]),
        "@__program__:sourmash_ray",
        sep.join(["@@TAXID", "RANK", "TAXPATH", "TAXPATHSN",
                  "PERCENTAGE"]),
    ]
    for r in sorted(rows, key=lambda r: r["rank"]):
        if r["lineage"] == "unclassified":
            continue
        names = r["lineage"].split(";")
        rank_nm = (rank_names[r["rank"]]
                   if r["rank"] < len(rank_names) else str(r["rank"]))
        path = "|".join(names)
        lines.append(sep.join([
            names[-1], rank_nm, path, path,
            f"{r['f_weighted_at_rank'] * 100:.2f}",
        ]))
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return out_path


CLASSIFICATION_SCHEMA = pa.schema([
    ("status", pa.string()),
    ("rank", pa.int64()),
    ("fraction", pa.float64()),
    ("lineage", pa.string()),
    ("f_weighted_at_rank", pa.float64()),
    ("bp_match_at_rank", pa.int64()),
    ("query_ani_at_rank", pa.float64()),
])


def tax_genome(gather_tbl: pa.Table, lineage_of: dict, *,
               rank: int | None = None,
               containment_threshold: float | None = 0.1,
               ani_threshold: float | None = None,
               ksize: int = 31, scaled: int = 1000,
               query_n_hashes: int | None = None,
               n_ranks: int | None = None) -> pa.Table:
    """``tax genome`` classification
    (``tax_utils.py:2449-2530`` ``build_classification_result`` +
    ``ClassificationResult.set_status:2208-2222``): walk ranks from most
    specific upward, at each rank take the best lineage by summed
    ``f_unique_to_query``, stop at the first rank whose best meets the
    threshold (ANI threshold wins over containment when both given, as
    in the reference). Returns ONE row; status ``match`` /
    ``below_threshold`` / ``nomatch`` (no gather rows)."""
    from ..functions.distance import containment_to_distance

    if containment_threshold is not None and not (
            0 <= containment_threshold <= 1):
        raise ValueError(
            f"containment_threshold={containment_threshold} outside [0, 1]")
    if ani_threshold is not None and not 0 <= ani_threshold <= 1:
        raise ValueError(
            f"ani_threshold={ani_threshold} outside [0, 1]")

    if gather_tbl.num_rows == 0:
        return pa.Table.from_pylist([{
            "status": "nomatch", "rank": -1, "fraction": 0.0,
            "lineage": "", "f_weighted_at_rank": 0.0,
            "bp_match_at_rank": 0, "query_ani_at_rank": 0.0,
        }], schema=CLASSIFICATION_SCHEMA)

    matches = gather_tbl["match"].to_pylist()
    f_uniq = np.asarray(gather_tbl["f_unique_to_query"], np.float64)
    f_w = np.asarray(gather_tbl["f_unique_weighted"], np.float64)
    bp = np.asarray(gather_tbl["unique_intersect_bp"], np.int64)
    lineages = [lineage_of.get(m) for m in matches]
    if n_ranks is None:
        n_ranks = max((len(s.split(";")) for s in lineages if s),
                      default=1)
    ranks = [rank] if rank is not None else list(
        range(n_ranks - 1, -1, -1))   # most specific first, climb up

    best_row = None
    for this_rank in ranks:
        acc: dict[str, list] = {}
        for i, lin in enumerate(lineages):
            parts = lin.split(";") if lin else []
            if len(parts) <= this_rank:
                continue
            key = ";".join(parts[: this_rank + 1])
            slot = acc.setdefault(key, [0.0, 0.0, 0])
            slot[0] += float(f_uniq[i])
            slot[1] += float(f_w[i])
            slot[2] += int(bp[i])
        if not acc:
            continue
        # best-at-rank: max fraction, lineage tiebreak for determinism
        lin_best, (f, w, b) = max(acc.items(),
                                  key=lambda kv: (kv[1][0], kv[0]))
        if query_n_hashes is None:
            if ani_threshold is not None:
                raise ValueError("ani_threshold needs query_n_hashes "
                                 "to estimate query ANI")
            ani = None                      # no query size info → no ANI
        else:
            ani = containment_to_distance(
                min(1.0, f), ksize, scaled,
                n_unique_kmers=query_n_hashes).ani
        status = "below_threshold"
        if ani_threshold is not None:       # ANI thresh overrides
            if ani is not None and ani >= ani_threshold:
                status = "match"
        elif (containment_threshold is not None
              and f >= containment_threshold):
            status = "match"
        best_row = {"status": status, "rank": this_rank, "fraction": f,
                    "lineage": lin_best, "f_weighted_at_rank": w,
                    "bp_match_at_rank": b,
                    "query_ani_at_rank": float(ani or 0.0)}
        if status == "match":
            break
    if best_row is None:                    # no annotated matches at all
        best_row = {"status": "nomatch", "rank": -1, "fraction": 0.0,
                    "lineage": "", "f_weighted_at_rank": 0.0,
                    "bp_match_at_rank": 0, "query_ani_at_rank": 0.0}
    return pa.Table.from_pylist([best_row],
                                schema=CLASSIFICATION_SCHEMA)


def tax_annotate(gather_tbl: pa.Table, lineage_of: dict) -> pa.Table:
    """``tax annotate`` (``tax/__main__.py:380-470``): attach a
    ``lineage`` column to gather rows by ident lookup — unannotated
    matches get an empty string, rows are otherwise passed through
    unchanged. The lineage dict is the broadcast side at scale
    (`relational.broadcast_lookup_join` pattern)."""
    lin = pa.array(
        [lineage_of.get(m) or "" for m in gather_tbl["match"].to_pylist()],
        pa.string())
    return gather_tbl.append_column("lineage", lin)


COMPARE_CSV_SCHEMA = pa.schema([
    ("ident", pa.string()),
    ("status", pa.string()),      # compatible | incompatible
    ("lca", pa.string()),
])


def compare_lineage_dicts(a: dict, b: dict) -> tuple[pa.Table, dict]:
    """``lca compare_csv`` (``lca/command_compare_csv.py:60-99``): for
    every ident present in both assignments with DIFFERING lineages,
    classify the disagreement — ``compatible`` when one lineage is an
    ancestor (rank-boundary prefix) of the other, ``incompatible`` when
    the trees diverge — and report the LCA (longest common rank prefix).
    Returns (rows for differing idents sorted by ident, summary counts
    incl. per-depth incompatibility histogram)."""
    common = sorted(set(a) & set(b))
    rows = []
    n_different = n_compat = n_incompat = 0
    incompat_depth: dict[int, int] = {}
    for k in common:
        va, vb = a[k], b[k]
        if va == vb:
            continue
        n_different += 1
        pa_, pb_ = va.split(";"), vb.split(";")
        d = 0
        while d < min(len(pa_), len(pb_)) and pa_[d] == pb_[d]:
            d += 1
        lca = ";".join(pa_[:d])
        if d == min(len(pa_), len(pb_)):   # one is ancestor of the other
            n_compat += 1
            rows.append({"ident": k, "status": "compatible", "lca": lca})
        else:
            n_incompat += 1
            incompat_depth[d] = incompat_depth.get(d, 0) + 1
            rows.append({"ident": k, "status": "incompatible",
                         "lca": lca})
    summary = {
        "n_total": len(common),
        "n_different": n_different,
        "n_compatible": n_compat,
        "n_incompatible": n_incompat,
        "missing_in_a": len(set(b) - set(a)),
        "missing_in_b": len(set(a) - set(b)),
        "incompatible_at_depth": incompat_depth,
    }
    return pa.Table.from_pylist(rows, schema=COMPARE_CSV_SCHEMA), summary


# ---------------------------------------------------------------------------
# tax summarize / tax grep — lineage-spreadsheet utilities
# ---------------------------------------------------------------------------

_DEFAULT_RANKS = ("superkingdom", "phylum", "class", "order", "family",
                  "genus", "species", "strain")

LINEAGE_COUNT_SCHEMA = pa.schema([
    ("rank", pa.string()),
    ("lineage_count", pa.int64()),
    ("lineage", pa.string()),
])


def tax_summarize(lineages: dict[str, str],
                  rank_names: tuple = _DEFAULT_RANKS
                  ) -> tuple[dict, pa.Table]:
    """``tax summarize`` (``/root/reference/src/sourmash/tax/__main__.py``
    ``summarize():617-684``): summary counts over a lineage spreadsheet +
    the ``-o`` per-prefix lineage-count CSV rows.

    Returns ``(summary, table)``:

    - ``summary["n_lineages"]`` — number of entries (reference
      ``len(tax_assign)``);
    - ``summary["rank_counts"]`` — per rank, number of distinct names,
      with the reference's global ``name_seen`` quirk preserved: a name
      already counted at one rank is NOT recounted at another;
    - table — one row per distinct lineage PREFIX with its count
      (reference ``Counter`` over ``tup[:-1]`` chains), rank = the rank
      name of the prefix's deepest entry, ordered (count desc, lineage
      asc) for determinism where ``most_common`` ties are arbitrary.
    """
    from collections import Counter

    rank_counts: dict[str, int] = {}
    name_seen: set[str] = set()
    prefix_counts: Counter = Counter()
    for lin in lineages.values():
        parts = lin.split(";") if lin else []
        for d, name in enumerate(parts):
            if name not in name_seen:
                name_seen.add(name)
                rname = (rank_names[d] if d < len(rank_names) else str(d))
                rank_counts[rname] = rank_counts.get(rname, 0) + 1
        for d in range(len(parts), 0, -1):
            prefix_counts[";".join(parts[:d])] += 1

    rows = sorted(prefix_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    depth = [len(k.split(";")) - 1 for k, _ in rows]
    tbl = pa.table({
        "rank": pa.array(
            [rank_names[d] if d < len(rank_names) else str(d)
             for d in depth], pa.string()),
        "lineage_count": pa.array([c for _, c in rows], pa.int64()),
        "lineage": pa.array([k for k, _ in rows], pa.string()),
    }).cast(LINEAGE_COUNT_SCHEMA)
    summary = {"n_lineages": len(lineages), "rank_counts": rank_counts}
    return summary, tbl


def tax_grep(lineages: dict[str, str], pattern: str, *,
             rank: str | int | None = None, invert: bool = False,
             ignore_case: bool = False,
             rank_names: tuple = _DEFAULT_RANKS) -> pa.Table:
    """``tax grep`` (``tax/__main__.py`` ``grep():561-614``): regex
    search over lineage NAMES (never idents), optionally restricted to
    one rank (name from ``rank_names`` or integer depth), with
    ``-v``/``-i`` semantics; returns the picklist table the reference
    writes — ``ident`` + one column per rank, rows sorted by ident."""
    import re

    pat = re.compile(pattern, re.IGNORECASE if ignore_case else 0)
    if isinstance(rank, str):
        if rank not in rank_names:
            raise ValueError(f"unknown rank {rank!r}")
        rank = rank_names.index(rank)

    def _hits(parts: list[str]) -> bool:
        for d, name in enumerate(parts):
            if (rank is None or d == rank) and pat.search(name):
                return True
        return False

    matched = sorted(
        (ident, lin.split(";") if lin else [])
        for ident, lin in lineages.items()
        if _hits(lin.split(";") if lin else []) != invert)
    n_cols = max((len(p) for _, p in matched), default=0)
    cols = {"ident": pa.array([i for i, _ in matched], pa.string())}
    for d in range(n_cols):
        nm = rank_names[d] if d < len(rank_names) else str(d)
        cols[nm] = pa.array(
            [p[d] if d < len(p) else "" for _, p in matched], pa.string())
    return pa.table(cols)

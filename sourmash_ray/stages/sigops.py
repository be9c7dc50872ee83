"""Signature-collection transforms — the ``sourmash sig …`` CLI family
(SURVEY.md §2.5/§2.9) as vectorized Dataset operations over the signatures
table. Each cites the reference subcommand it mirrors.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..functions.sketch import max_hash_for_scaled, md5_of_mins


def _list_views(col: pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    lst = col.combine_chunks()
    offs = np.asarray(lst.offsets, dtype=np.int64)
    vals = np.asarray(lst.flatten(), dtype=np.uint64)
    return offs, vals


def _rebuild_lists(offs: np.ndarray, vals: np.ndarray, keep: np.ndarray):
    """Apply a per-value boolean mask to a list column; returns (new_offsets
    int32, new_values)."""
    row_of = np.repeat(np.arange(offs.size - 1), np.diff(offs))
    kept_rows = row_of[keep]
    per_row = np.bincount(kept_rows, minlength=offs.size - 1)
    new_offs = np.concatenate([[0], np.cumsum(per_row)]).astype(np.int32)
    return new_offs, vals[keep]


def downsample_sigs(sigs, new_scaled: int):
    """``sig downsample`` (``/root/reference/src/sourmash/sig/__main__.py:
    926-999``): scaled may only increase (``minhash.py:678-700``); keeps
    hashes ≤ the new max_hash and recomputes md5."""
    new_max = np.uint64(max_hash_for_scaled(new_scaled))

    def _ds(batch: pa.Table) -> pa.Table:
        old_scaled = batch["scaled"][0].as_py() if batch.num_rows else 0
        if old_scaled and new_scaled < old_scaled:
            raise ValueError(
                f"new scaled {new_scaled} < current {old_scaled} "
                "(downsampling is one-way, minhash.py:678-700)")
        offs, vals = _list_views(batch["mins"])
        keep = vals <= new_max
        new_offs, new_vals = _rebuild_lists(offs, vals, keep)
        a_offs, a_vals = _list_views(batch["abunds"])
        _, new_ab = _rebuild_lists(a_offs, a_vals, keep)
        ks = batch["ksize"][0].as_py() if batch.num_rows else 0
        md5s = [md5_of_mins(new_vals[new_offs[i]:new_offs[i + 1]], ks)
                for i in range(batch.num_rows)]
        t = batch.drop_columns(["mins", "abunds", "md5", "scaled"])
        return (t.append_column("scaled", pa.array(
                    np.full(batch.num_rows, new_scaled, np.uint64)))
                 .append_column("mins", pa.ListArray.from_arrays(
                     pa.array(new_offs), pa.array(new_vals, pa.uint64())))
                 .append_column("abunds", pa.ListArray.from_arrays(
                     pa.array(new_offs), pa.array(new_ab, pa.uint64())))
                 .append_column("md5", pa.array(md5s, pa.string())))

    return sigs.map_batches(_ds, batch_format="pyarrow")


def flatten_sigs(sigs):
    """``sig flatten`` — drop abundances (``minhash.py:721-738``)."""

    def _fl(batch: pa.Table) -> pa.Table:
        offs, _ = _list_views(batch["mins"])
        n = batch.num_rows
        empty_ab = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32)),
            pa.array(np.ones(int(offs[-1]), np.uint64)))
        i = batch.schema.get_field_index("abunds")
        return batch.set_column(i, "abunds", empty_ab)

    return sigs.map_batches(_fl, batch_format="pyarrow")


def abund_filter_sigs(sigs, min_abund: int = 1, max_abund: int | None = None):
    """``sig filter`` — keep hashes whose abundance is in [min, max]
    (``sig/__main__.py:830-878``)."""
    hi = np.uint64(max_abund) if max_abund is not None else None

    def _ff(batch: pa.Table) -> pa.Table:
        offs, vals = _list_views(batch["mins"])
        a_offs, a_vals = _list_views(batch["abunds"])
        keep = a_vals >= np.uint64(min_abund)
        if hi is not None:
            keep &= a_vals <= hi
        new_offs, new_vals = _rebuild_lists(offs, vals, keep)
        _, new_ab = _rebuild_lists(a_offs, a_vals, keep)
        ks = batch["ksize"][0].as_py() if batch.num_rows else 0
        md5s = [md5_of_mins(new_vals[new_offs[i]:new_offs[i + 1]], ks)
                for i in range(batch.num_rows)]
        t = batch.drop_columns(["mins", "abunds", "md5"])
        return (t.append_column("mins", pa.ListArray.from_arrays(
                    pa.array(new_offs), pa.array(new_vals, pa.uint64())))
                 .append_column("abunds", pa.ListArray.from_arrays(
                     pa.array(new_offs), pa.array(new_ab, pa.uint64())))
                 .append_column("md5", pa.array(md5s, pa.string())))

    return sigs.map_batches(_ff, batch_format="pyarrow")


def extract_sigs(sigs, name_pattern: str | None = None,
                 md5_prefix: str | None = None):
    """``sig extract`` / ``sig grep`` — metadata regex / md5-prefix filter
    (``sig/__main__.py:753-827``, ``sig/grep.py``)."""

    def _keep(batch: pa.Table) -> pa.Table:
        mask = pa.array(np.ones(batch.num_rows, bool))
        if name_pattern is not None:
            mask = pc.and_(mask, pc.match_substring_regex(
                batch["conv_id"], name_pattern))
        if md5_prefix is not None:
            mask = pc.and_(mask, pc.starts_with(batch["md5"], md5_prefix))
        return batch.filter(mask)

    return sigs.map_batches(_keep, batch_format="pyarrow")


def merge_all(sigs) -> dict:
    """``sig merge`` of a whole collection → ONE union sketch
    (``sig/__main__.py:459-523``): per-block partial unions (tree reduce)
    then a driver-side final union — never materializes all mins at once
    beyond the per-block partials."""

    def _partial(batch: pa.Table) -> pa.Table:
        _, vals = _list_views(batch["mins"])
        u = np.unique(vals)
        return pa.table({"mins": pa.array([u], pa.list_(pa.uint64()))})

    parts = sigs.select_columns(["mins"]).map_batches(
        _partial, batch_format="pyarrow").take_all()
    if not parts:
        merged = np.empty(0, np.uint64)
    else:
        merged = np.unique(np.concatenate(
            [np.asarray(p["mins"], dtype=np.uint64) for p in parts]))
    return {"mins": merged, "n_sigs_merged": len(parts)}


def intersect_all(sigs) -> dict:
    """``sig intersect`` of a whole collection → hashes present in EVERY
    sketch (``sig/__main__.py:526-592``).

    Shape: per-block (hash, count) combiner (each sketch's mins are
    unique, so a block-local bincount is a valid partial), hash-partition
    through the coarse-key exchange (NOT ``Dataset.groupby`` — Ray 2.49's
    sort shuffle has a data-proportional serial component, the reason
    every other wide step in this engine uses the exchange), per-partition
    sum + keep count == n, driver concat of the tiny survivors."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from .exchange import exchange_map_groups

    n_total = sigs.count()
    group_parts = 1024

    def _partial(batch: pa.Table) -> pa.Table:
        _, vals = _list_views(batch["mins"])
        u, cnt = np.unique(vals, return_counts=True)
        return pa.table({
            "h": pa.array(u, pa.uint64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
            "h_part": pa.array(
                (u % np.uint64(group_parts)).astype(np.int64), pa.int64()),
        })

    out_schema = pa.schema([("h", pa.uint64())])

    def _common(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        h = np.asarray(part["h"], np.uint64)
        n = np.asarray(part["n"], np.int64)
        order = np.argsort(h, kind="stable")
        h, n = h[order], n[order]
        starts = np.flatnonzero(
            np.concatenate([[True], h[1:] != h[:-1]]))
        sums = np.add.reduceat(n, starts)
        keep = sums == n_total
        return pa.table({"h": pa.array(h[starts][keep], pa.uint64())})

    parts = (sigs.select_columns(["mins"])
             .map_batches(_partial, batch_format="pyarrow"))
    hits = exchange_map_groups(parts, "h_part",
                               2 * resolve_num_partitions(DEFAULT_CONFIG),
                               _common, out_schema)
    common = np.array(sorted(r["h"] for r in hits.take_all()),
                      dtype=np.uint64)
    return {"mins": common, "n_sigs": n_total}


def describe_sigs(sigs):
    """``sig describe`` — per-signature summary incl. abundance stats
    (``sig/__main__.py:250-345``; stats per ``minhash.py:1093-1127``)."""

    def _desc(batch: pa.Table) -> pa.Table:
        offs, _vals = _list_views(batch["mins"])
        a_offs, a_vals = _list_views(batch["abunds"])
        n = batch.num_rows
        # per-row segment sums via prefix sums: exact for empty segments
        # (reduceat mishandles repeated/clamped boundaries)
        if a_vals.size:
            cs = np.concatenate([[0], np.cumsum(a_vals.astype(np.int64))])
            sums = cs[a_offs[1:]] - cs[a_offs[:-1]]
        else:
            sums = np.zeros(n, np.int64)
        return pa.table({
            "conv_id": batch["conv_id"],
            "ksize": batch["ksize"],
            "scaled": batch["scaled"],
            "num": batch["num"],
            "n_mins": pa.array(np.diff(offs), pa.int64()),
            "sum_abundance": pa.array(sums, pa.int64()),
            "md5short": pc.utf8_slice_codeunits(batch["md5"], 0, 8),
        })

    return sigs.map_batches(_desc, batch_format="pyarrow")


def rename_sigs(sigs, fn):
    """``sig rename`` (``sig/__main__.py:715-750``) — rewrite the name
    column; ``fn`` maps old conv_id → new name (applied per batch)."""

    def _rn(batch: pa.Table) -> pa.Table:
        new = pa.array([fn(c) for c in batch["conv_id"].to_pylist()],
                       pa.string())
        i = batch.schema.get_field_index("conv_id")
        return batch.set_column(i, "conv_id", new)

    return sigs.map_batches(_rn, batch_format="pyarrow")


def cat_collections(*sig_datasets):
    """``sig cat`` (``sig/__main__.py:114-163``) — concatenate signature
    collections (schema-aligned union)."""
    out = sig_datasets[0]
    for ds in sig_datasets[1:]:
        out = out.union(ds)
    return out


def write_manifest(sigs, path: str):
    """Standalone manifest (the reference's ``sig manifest`` /
    ``CollectionManifest``, ``manifest.py:17-214``): the summary columns
    of every signature as their OWN small Parquet, so selection reads
    manifest rows, never sketch payloads."""
    describe_sigs(sigs).write_parquet(path)
    return path


def select_via_manifest(sigs, manifest_path: str, expr: str):
    """Manifest-lazy selection (``Index.select`` over a standalone
    manifest): evaluate ``expr`` on the manifest Parquet (tiny read — no
    mins column), broadcast the surviving conv_ids, and prune the full
    collection with one vectorized membership filter. The sketch payloads
    of non-matching signatures are never deserialized into the query."""
    import ray
    import ray.data

    picked = (ray.data.read_parquet(manifest_path)
              .filter(expr=expr)
              .select_columns(["conv_id"]))
    ids = pa.array(sorted(r["conv_id"] for r in picked.take_all()),
                   pa.string())
    ids_ref = ray.put(ids)

    def _keep(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["conv_id"].combine_chunks(),
                        value_set=ray.get(ids_ref))
        return batch.filter(keep)

    return sigs.map_batches(_keep, batch_format="pyarrow")


def subtract_from(sigs, target_id: str):
    """``sig subtract`` (``sig/__main__.py:525-580``): remove every hash
    that appears in ANY other signature of the collection from the target
    signature. The "others" union is built with the merge_all tree reduce
    (per-block partials, no full materialization); the difference is one
    sorted-array pass (``minhash.rs:406-430`` remove_many semantics)."""
    target = sigs.filter(expr=f"conv_id == '{target_id}'").take_all()
    if not target:
        raise KeyError(f"{target_id!r} not in collection")
    t = target[0]
    others = sigs.filter(expr=f"conv_id != '{target_id}'")
    union = merge_all(others)["mins"]
    mins = np.asarray(t["mins"], np.uint64)
    keep = ~np.isin(mins, union, assume_unique=True)
    ab = t.get("abunds")
    return {
        "conv_id": t["conv_id"],
        "mins": mins[keep],
        "abunds": (np.asarray(ab, np.uint64)[keep]
                   if ab is not None else None),
        "n_removed": int((~keep).sum()),
    }


def _manifest_path_for(location: str) -> str:
    """Convention: a collection at ``loc`` (Parquet dir) carries its
    standalone manifest at ``loc + '.manifest'`` (a small Parquet dir
    written by :func:`write_manifest`)."""
    return location.rstrip("/") + ".manifest"


def collect_manifests(locations, output_path: str | None = None,
                      merge_previous: bool = False,
                      require_manifest: bool = True):
    """``sig collect`` (``/root/reference/src/sourmash/sig/__main__.py:
    1553-1660``): gather per-signature manifest rows across many
    collection locations into ONE standalone manifest, each row's
    ``internal_location`` rewritten to its container so any signature can
    later be found by loading that location (the reference's
    ``row["internal_location"] = iloc`` loop).

    Per location: read the sibling ``<loc>.manifest`` Parquet when
    present (payloads never touched — the reference's "require manifests
    by default, since generating can be slow"); when absent, raise unless
    ``require_manifest=False``, in which case the manifest is generated
    with a pruned :func:`describe_sigs` scan (``--no-require-manifest``).

    ``merge_previous``: union rows already collected at ``output_path``
    (``--merge-previous``); without it an existing output is an error,
    mirroring the reference's refusal to overwrite.

    Returns the combined manifest Dataset (streams; rows are summary
    columns only). Writes partitioned Parquet to ``output_path`` if set.
    """
    import ray.data

    from .. import plugins

    if output_path and os.path.exists(output_path) and not merge_previous:
        raise FileExistsError(
            f"{output_path!r} already exists — remove it or pass "
            "merge_previous=True to merge (sig collect semantics)")

    parts = []
    if merge_previous and output_path and os.path.exists(output_path):
        parts.append(ray.data.read_parquet(output_path))
    for loc in locations:
        mf_path = _manifest_path_for(loc)
        if os.path.exists(mf_path):
            mf = ray.data.read_parquet(mf_path)
        elif require_manifest:
            raise FileNotFoundError(
                f"no manifest at {mf_path!r} for {loc!r}; sig collect "
                "requires a manifest by default — pass "
                "require_manifest=False to generate one")
        else:
            mf = describe_sigs(plugins.load_any(loc))
        iloc = loc

        def _tag(batch: pa.Table, iloc=iloc) -> pa.Table:
            # rewrite, never duplicate: a manifest produced by a prior
            # collect already carries internal_location (the reference
            # overwrites the field: row["internal_location"] = iloc)
            if "internal_location" in batch.column_names:
                batch = batch.drop_columns(["internal_location"])
            return batch.append_column(
                "internal_location",
                pa.array([iloc] * batch.num_rows, pa.string()))

        parts.append(mf.map_batches(_tag, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    if output_path:
        if merge_previous and os.path.exists(output_path):
            # rewrite: the merged manifest replaces the previous one
            merged = out.materialize()
            import shutil

            shutil.rmtree(output_path)
            merged.write_parquet(output_path)
            return merged
        out.write_parquet(output_path)
    return out


def check_collections(locations, values, coltype: str = "name",
                      require_manifest: bool = True,
                      style=None):
    """``sig check`` (``sig/__main__.py:1412-1550``): audit collections
    against a picklist WITHOUT reading sketch payloads. Combines the
    locations' manifests (:func:`collect_manifests` — internal_location
    rewritten per container), filters them by the picklist, and reports
    which picklist entries were never found (``--output-missing``).

    ``coltype``: picklist preprocessor applied to the manifest's
    ``conv_id`` column (``name``/``ident``/``identprefix``) or
    ``md5short`` column. ``style``: PickStyle; EXCLUDE cannot report
    missing entries (reference forbids ``-o`` with exclude picklists).

    Returns ``(matching, missing, n_examined)``: the matching manifest
    Dataset, the sorted list of picked values with zero matches, and the
    total manifest rows examined. ``missing`` is bounded by the picklist
    size: only distinct matched keys (a subset of the picklist) are
    collected, never the manifest itself.
    """
    from .picklist import PickStyle, preprocess_column

    style = PickStyle.INCLUDE if style is None else style
    # materialize once: count + matching scan + found-keys scan would
    # otherwise each re-run the whole read/describe pipeline
    mf = collect_manifests(
        locations, require_manifest=require_manifest).materialize()
    n_examined = mf.count()
    column = "md5short" if coltype == "md5short" else "conv_id"
    ct = "name" if coltype == "md5short" else coltype
    picked = sorted(set(values))
    vals_ref = ray.put(pa.array(picked, pa.string()))
    include = style == PickStyle.INCLUDE

    def _match(batch: pa.Table) -> pa.Table:
        key = preprocess_column(
            pc.cast(batch[column].combine_chunks(), pa.string()), ct)
        mask = pc.is_in(key, value_set=ray.get(vals_ref))
        if not include:
            mask = pc.invert(mask)
        return batch.append_column("picklist_key", key).filter(mask)

    matching = mf.map_batches(_match, batch_format="pyarrow")
    if not include:
        return matching, None, n_examined
    # found keys ⊆ picklist → bounded driver reduce (per-batch uniques)
    found_parts = matching.map_batches(
        lambda t: pa.table(
            {"picklist_key": t["picklist_key"].combine_chunks().unique()}),
        batch_format="pyarrow")
    found = {r["picklist_key"] for r in
             found_parts.select_columns(["picklist_key"]).take_all()}
    missing = sorted(set(picked) - found)
    return matching, missing, n_examined


OVERLAP_SCHEMA = pa.schema([
    ("id_a", pa.string()), ("id_b", pa.string()),
    ("md5_a", pa.string()), ("md5_b", pa.string()),
    ("ksize", pa.int64()), ("scaled", pa.int64()), ("num", pa.int64()),
    ("size_a", pa.int64()), ("size_b", pa.int64()),
    ("jaccard", pa.float64()),
    ("containment_a_in_b", pa.float64()),
    ("containment_b_in_a", pa.float64()),
    ("num_common", pa.int64()),
    ("disjoint_a", pa.int64()), ("disjoint_b", pa.int64()),
    ("num_union", pa.int64()),
])


def overlap_report(sigs, id_a: str, id_b: str) -> pa.Table:
    """``sig overlap`` (``sig/__main__.py:379-470``): detailed
    two-signature comparison — jaccard, both containments, and the raw
    common/disjoint/union hash counts the reference prints. Exactly two
    rows leave the Dataset (predicate pushdown); the set math is the
    same sorted-array kernels every other op uses."""
    from ..functions.setops import contained_by, intersect_sorted, jaccard
    from ..functions.sketch import Sketch, SketchParams

    rows = sigs.filter(
        expr=f"conv_id == '{id_a}' or conv_id == '{id_b}'").take_all()
    by = {}
    for r in rows:
        by.setdefault(r["conv_id"], r)
    missing = [i for i in (id_a, id_b) if i not in by]
    if missing:
        raise ValueError(f"signature(s) not found: {missing}")

    def _sk(r):
        params = SketchParams(
            ksize=int(r["ksize"]), scaled=int(r["scaled"]),
            num=int(r["num"]),
            track_abundance=r.get("abunds") is not None)
        mins = np.asarray(r["mins"], np.uint64)
        ab = (np.asarray(r["abunds"], np.int64)
              if r.get("abunds") is not None else None)
        return Sketch(mins=mins, abunds=ab, params=params,
                      name=r["conv_id"], _md5=r["md5"])

    sa, sb = _sk(by[id_a]), _sk(by[id_b])
    common = int(intersect_sorted(sa.mins, sb.mins).size)
    union = int(sa.mins.size + sb.mins.size - common)
    return pa.Table.from_pylist([{
        "id_a": id_a, "id_b": id_b, "md5_a": sa.md5, "md5_b": sb.md5,
        "ksize": sa.params.ksize, "scaled": sa.params.scaled,
        "num": sa.params.num,
        "size_a": int(sa.mins.size), "size_b": int(sb.mins.size),
        "jaccard": jaccard(sa, sb),
        "containment_a_in_b": contained_by(sa, sb),
        "containment_b_in_a": contained_by(sb, sa),
        "num_common": common,
        "disjoint_a": int(sa.mins.size) - common,
        "disjoint_b": int(sb.mins.size) - common,
        "num_union": union,
    }], schema=OVERLAP_SCHEMA)


def plan_fromfile(entries: list[dict], build_params: list,
                  manifest: pa.Table | None = None
                  ) -> tuple[pa.Table, dict]:
    """``sketch fromfile`` planning (``command_sketch.py:403-545``):
    cross the CSV's names with the requested sketch specs, subtract what
    an ``--already-done`` manifest covers, and report what remains to
    build. Validation mirrors the reference: blank or duplicate names
    are hard errors; an entry whose source file is absent for a needed
    spec lands in ``missing`` instead of the build list.

    ``entries``: dicts with ``name`` and ``source_path`` (the transcript
    analogue of genome_filename). ``build_params``: SketchParams list —
    a spec is "done" when the manifest holds a row with the same
    (name, ksize, scaled, num). Returns (to_build table, summary)."""
    seen, dups, blanks = {}, set(), 0
    for e in entries:
        name = e.get("name") or ""
        if not name:
            blanks += 1
            continue
        if name in seen:
            dups.add(name)
        else:
            seen[name] = e.get("source_path") or ""
    if dups:
        raise ValueError(
            f"{len(dups)} duplicate name entries: {sorted(dups)[:5]}")
    if blanks:
        raise ValueError(f"{blanks} entries with blank names")

    done: set[tuple] = set()
    if manifest is not None:
        for r in manifest.select(
                ["conv_id", "ksize", "scaled", "num"]).to_pylist():
            done.add((r["conv_id"], int(r["ksize"]), int(r["scaled"]),
                      int(r["num"])))

    rows, missing = [], []
    skipped = total = 0
    for name, src in seen.items():
        for p in build_params:
            total += 1
            key = (name, p.ksize, p.scaled, p.num)
            if key in done:
                skipped += 1
            elif not src:
                missing.append(name)
            else:
                rows.append({"name": name, "source_path": src,
                             "ksize": p.ksize, "scaled": p.scaled,
                             "num": p.num})
    to_build = pa.Table.from_pylist(rows, schema=pa.schema([
        ("name", pa.string()), ("source_path", pa.string()),
        ("ksize", pa.int64()), ("scaled", pa.int64()),
        ("num", pa.int64())]))
    return to_build, {
        "total_sigs": total, "n_to_build": len(rows),
        "n_already_done": skipped, "n_missing_source": len(missing),
        "missing": sorted(set(missing)),
    }

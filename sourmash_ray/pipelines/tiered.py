"""Tiered (cascade) dedup over documents: exact → SimHash → MinHash.

The production pattern for web-scale corpora — the reference's own dedup
surface is single-tier md5 (``/root/reference/src/sourmash/search.py:682-691``,
the ``found_md5`` collapse); this cascade is the new-engine requirement the
graft axis names ("tier dedup"). Tiers run cheapest-first and each tier
only processes the SURVIVORS of the previous one, so the expensive stages
(banded candidate emission, sketch verification) never see the mass of
exact clones tier 0 removes with one (md5, id) exchange:

- **tier 'exact'** — normalized-text md5 groups; one exchange shipping
  ~40 bytes/doc (md5 + id), never text. Non-min members are eliminated.
- **tier 'simhash'** — 64-bit SimHash, 4×16-bit banded (pigeonhole-exact
  for Hamming ≤ 3) over exact survivors. Text-identical docs share a
  fingerprint, so filtering AFTER the map-only fingerprint pass (an
  id anti-join on the tiny (doc_id, simhash) table) is equivalent to
  fingerprinting survivors only, without re-reading the corpus.
- **tier 'minhash'** — MinHash LSH candidates + Jaccard verification
  (the flagship machinery) over simhash survivors; the survivor filter is
  again an id anti-join on the sketch table (~1000× smaller than the
  corpus), so sketches of eliminated docs never enter banding or verify.

Output: ONE row per document — ``(doc_id, tier, rep_doc_id)`` where
``tier`` names the stage that eliminated the doc or ``'kept'``. Reps are
per-tier: the min-id member of the duplicate group among that tier's
input. A rep may itself be eliminated by a LATER tier (rep chains are
standard in cascade dedup; follow ``rep_doc_id`` transitively to reach a
kept doc — the chain is strictly id-decreasing, so it terminates).

Scale notes: no stage materializes text beyond the two map-only
fingerprint passes; every exchange ships ids + fixed-width payloads; the
within-tier grouping reuses :func:`stages.cluster.connected_components`
(driver union-find below the edge cutoff, distributed min-label
propagation above).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, EngineConfig, resolve_num_partitions
from ..stages.exchange import exchange_map_groups
from ..stages.join import hash_join_exchange
from .docops import (DocSketcher, SimHasher, _normalize_md5_batch,
                     _read_docs, simhash_neardup_pairs)

TIER_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("tier", pa.string()),
    ("rep_doc_id", pa.int64()),
])

_ELIM_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("rep_doc_id", pa.int64()),
])

# doc ids are non-negative int64, so a 19-digit zero-pad makes
# lexicographic string order == numeric order (connected_components'
# node/label columns are strings; its labels are lexicographic minima)
_PAD = 19


def _docs(source):
    return _read_docs(source) if isinstance(source, str) else source


def _exact_eliminations(docs, cfg: EngineConfig, n_parts: int):
    """Tier 0: (doc_id, rep_doc_id) for every doc whose normalized-text
    md5 already appeared under a smaller doc_id. One exchange of
    (md5, id) rows — the md5 groups are equivalence classes, so no
    connected-components pass is needed."""
    from ..functions.segscore import _to_bytes_array, hash_strings64

    group_parts = cfg.exec.group_parts

    def _partial(batch: pa.Table) -> pa.Table:
        # fused-cascade input already carries text_md5 (one-scan sketcher)
        t = (batch if "text_md5" in batch.schema.names
             else _normalize_md5_batch(batch))
        md5 = t["text_md5"]
        return pa.table({
            "text_md5": md5,
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "md5_part": pa.array(
                hash_strings64(md5) % group_parts, pa.int64()),
        })

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _ELIM_SCHEMA.empty_table()
        md5 = _to_bytes_array(part["text_md5"])
        ids = np.asarray(part["doc_id"], np.int64)
        order = np.lexsort((ids, md5))
        md5, ids = md5[order], ids[order]
        first = np.concatenate([[True], md5[1:] != md5[:-1]])
        grp = np.cumsum(first) - 1
        reps = ids[np.flatnonzero(first)][grp]
        non = ~first
        return pa.table({
            "doc_id": pa.array(ids[non], pa.int64()),
            "rep_doc_id": pa.array(reps[non], pa.int64()),
        })

    parts = docs.map_batches(_partial, batch_format="pyarrow")
    return exchange_map_groups(parts, "md5_part", n_parts, _merge,
                               _ELIM_SCHEMA)


def _eliminations_from_pairs(pairs, a_col: str, b_col: str,
                             cfg: EngineConfig):
    """Duplicate-pair Dataset → (doc_id, rep_doc_id) for every non-min
    member of each connected component. Pair id columns may be int64 or
    decimal strings; they are zero-padded for the string-keyed
    connected-components pass so the component label IS the numeric min."""
    from ..stages.cluster import connected_components

    def _pad(batch: pa.Table) -> pa.Table:
        return pa.table({
            "a": pc.utf8_lpad(pc.cast(batch[a_col], pa.string()),
                              _PAD, "0"),
            "b": pc.utf8_lpad(pc.cast(batch[b_col], pa.string()),
                              _PAD, "0"),
        })

    labels = connected_components(
        pairs.map_batches(_pad, batch_format="pyarrow"), cfg)

    def _emit(batch: pa.Table) -> pa.Table:
        node = pc.cast(batch["node"], pa.int64())
        label = pc.cast(batch["label"], pa.int64())
        keep = pc.not_equal(node, label)
        return pa.table({
            "doc_id": pc.filter(node, keep),
            "rep_doc_id": pc.filter(label, keep),
        })

    return labels.map_batches(_emit, batch_format="pyarrow")


# dup-id broadcast budget: ids are 8 B/row, so 64 MiB covers ~8M
# eliminated docs per tier — beyond that the cascade falls back to the
# hash-exchange anti-join (the id set no longer belongs on every worker)
_BCAST_IDS_LIMIT = 64 << 20


def _surviving(left, elim_list, key: str, left_cols: list[str],
               cfg: EngineConfig, n_parts: int, to_string: bool = False):
    """Rows of ``left`` whose id is in NONE of the (materialized)
    elimination Datasets. The dup-id set is the SMALL side (dups are the
    minority of a corpus), so the default is a broadcast anti-join —
    map-only, no exchange round; the cascade chains three of these and
    each saved exchange is one less sequential-stage floor. Above the
    budget it degrades to the big-big hash-exchange anti-join."""
    import ray as _r

    from ..stages.join import broadcast_join

    total = sum((e.size_bytes() or 0) for e in elim_list)
    if total <= _BCAST_IDS_LIMIT:
        blocks = []
        for e in elim_list:
            blocks.extend(_r.get(
                e.select_columns(["doc_id"]).to_arrow_refs()))
        blocks = [b for b in blocks if b.num_rows] or \
            [pa.table({"doc_id": pa.array([], pa.int64())})]
        ids = pa.concat_tables(blocks).combine_chunks()
        col = (pc.cast(ids["doc_id"], pa.string()) if to_string
               else ids["doc_id"])
        return broadcast_join(left, pa.table({key: col}), key,
                              left_cols, [], join_type="left anti")
    elim = elim_list[0]
    for e in elim_list[1:]:
        elim = elim.union(e)
    elim_ids = elim.map_batches(
        lambda t: pa.table({
            key: (pc.cast(t["doc_id"], pa.string()) if to_string
                  else pc.cast(t["doc_id"], pa.int64()))}),
        batch_format="pyarrow")
    return hash_join_exchange(left, elim_ids, key, left_cols, [],
                              n_parts, join_type="left anti")


def _with_tier(ds, tier: str):
    def _fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch["doc_id"], pa.int64()),
            "tier": pa.array([tier] * batch.num_rows, pa.string()),
            "rep_doc_id": pc.cast(batch["rep_doc_id"], pa.int64()),
        })

    return ds.map_batches(_fn, batch_format="pyarrow")


def _ckpt(ds, checkpoint_dir, stage: str, fingerprint: str,
          resume: bool = True, schema: pa.Schema | None = None):
    """Tier-boundary materialize: plain object-store materialize without
    a checkpoint dir, else a resumable Parquet stage checkpoint with a
    lineage manifest (the north rule's per-partition lineage + metrics)
    — a killed cascade resumes after its last completed tier.

    ``schema``: an EMPTY stage (e.g. a tier that eliminated nothing)
    writes one typed empty Parquet file under it — ``write_parquet`` of
    an empty Dataset writes nothing at all, which would break both the
    lineage scan and the resume read."""
    if checkpoint_dir is None:
        return ds.materialize()
    import json as _json
    import shutil

    import pyarrow.parquet as pq

    import ray.data

    from ..state.checkpoint import checkpoint_dataset

    path = os.path.join(checkpoint_dir, stage)
    marker = os.path.join(path, "_LINEAGE.json")
    if resume and os.path.exists(marker):
        with open(marker) as f:
            lineage = _json.load(f)
        if lineage.get("fingerprint") == fingerprint:
            return ray.data.read_parquet(path).materialize()
        shutil.rmtree(path, ignore_errors=True)
    ds = ds.materialize()
    if ds.count() == 0 and schema is None:
        # nothing to persist and no type to persist it under — skip the
        # checkpoint; recomputing an empty stage on resume is free
        return ds
    if schema is not None and ds.count() == 0:
        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        pq.write_table(schema.empty_table(),
                       os.path.join(path, "empty-0.parquet"))
        with open(marker, "w") as f:
            _json.dump({"stage": stage, "fingerprint": fingerprint,
                        "rows": 0, "partitions": []}, f, indent=1)
        return ray.data.from_arrow(schema.empty_table())
    out, _ = checkpoint_dataset(ds, path, stage=stage,
                                fingerprint=fingerprint, resume=False)
    return out.materialize()


class _CascadeDocSketcher:
    """ONE text scan for the whole docs cascade: exact-dup md5 + simhash
    + minhash sketch columns in a single pass. ``normalize_column`` and
    the shingle-hash kernel run once and feed all three tiers — at corpus
    scale the text scan dominates, so 3 scans → 1 is the cascade's
    biggest single saving (the sketch table it emits is ~1000× smaller
    than the corpus and is the only thing later tiers touch)."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.mink = DocSketcher(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.sketch import batch_shingle_hashes, normalize_column

        from .docops import _md5_column

        p = self.cfg.sketch
        norm = normalize_column(batch["text"], p.normalization)
        # exact tier hashes the "ws"-normalized text (DuckDB-oracle
        # convention); reuse norm when the sketch normalization agrees
        norm_ws = (norm if p.normalization == "ws"
                   else normalize_column(batch["text"], "ws"))
        hashes, rows, _ = batch_shingle_hashes(norm, p.ksize, p.seed)
        n = len(batch)
        sig = self.mink.from_hashes(batch["doc_id"], hashes, rows, n)
        return (sig
                .append_column("doc_id",
                               pc.cast(batch["doc_id"], pa.int64()))
                .append_column("text_md5", _md5_column(norm_ws))
                .append_column("simhash",
                               SimHasher.from_hashes(hashes, rows, n)))


def tiered_dedup_docs(source, cfg: EngineConfig = DEFAULT_CONFIG, *,
                      max_hamming: int = 3,
                      minhash_threshold: float | None = None,
                      checkpoint_dir: str | None = None,
                      resume: bool = True):
    """Run the exact → simhash → minhash cascade; see module docstring.

    ``source``: an sf_dir string or a (doc_id, text) Dataset.
    ``checkpoint_dir`` (path sources only): persist each tier boundary
    (fused sketch table + the three elimination tables) as a resumable
    Parquet stage checkpoint — a killed cascade resumes after its last
    completed tier.
    Returns a Dataset with exactly one ``(doc_id, tier, rep_doc_id)``
    row per input document.
    """
    import ray.data

    if checkpoint_dir is not None and not isinstance(source, str):
        raise ValueError("checkpoint_dir requires a path source (a "
                         "Dataset source has no stable fingerprint to "
                         "key resume on)")
    fp = (f"tiers-v1|sf={source}|cfg={cfg.sketch}|{cfg.lsh}"
          f"|hamming={max_hamming}|thr={minhash_threshold}")
    docs = _docs(source)
    n_parts = 2 * resolve_num_partitions(cfg)

    # ---- one text scan: md5 + simhash + minhash sketches ------------
    csk = _CascadeDocSketcher(cfg)
    sketches = _ckpt(docs.map_batches(lambda t: csk(t),
                                      batch_format="pyarrow"),
                     checkpoint_dir, "sketches", fp, resume)
    if sketches.count() == 0:
        return ray.data.from_arrow(TIER_SCHEMA.empty_table())

    # ---- tier 0: exact ----------------------------------------------
    exact = _ckpt(_exact_eliminations(
        sketches.select_columns(["doc_id", "text_md5"]), cfg, n_parts),
        checkpoint_dir, "tier_exact", fp, resume, _ELIM_SCHEMA)

    # ---- tier 1: simhash over exact survivors -----------------------
    sims_surv = _surviving(
        sketches.select_columns(["doc_id", "simhash"]), [exact],
        "doc_id", ["simhash"], cfg, n_parts)
    # distinct=False: connected components tolerate multi-edges, so the
    # pair-dedup exchange round is pure floor here
    sim_pairs = simhash_neardup_pairs(sims_surv, cfg, max_hamming,
                                      distinct=False)
    sim_elim = _ckpt(_eliminations_from_pairs(sim_pairs, "a", "b", cfg),
                     checkpoint_dir, "tier_simhash", fp, resume,
                     _ELIM_SCHEMA)

    # ---- tier 2: minhash LSH + verify over simhash survivors --------
    from ..stages.lsh import candidate_pairs
    from ..stages.verify import verify_pairs

    sigs = sketches.select_columns(["conv_id", "mins", "md5", "perms"])
    sigs_surv = _surviving(sigs, [exact, sim_elim], "conv_id",
                           ["mins", "md5", "perms"], cfg, n_parts,
                           to_string=True).materialize()
    cand = candidate_pairs(sigs_surv, cfg, distinct=False)
    ver = verify_pairs(cand, sigs_surv, cfg, threshold=minhash_threshold)
    min_elim = _ckpt(_eliminations_from_pairs(ver, "a", "b", cfg),
                     checkpoint_dir, "tier_minhash", fp, resume,
                     _ELIM_SCHEMA)

    # ---- assemble: one labeled row per doc --------------------------
    kept_ids = _surviving(sketches.select_columns(["doc_id"]),
                          [exact, sim_elim, min_elim], "doc_id", [],
                          cfg, n_parts)
    kept = kept_ids.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "tier": pa.array(["kept"] * t.num_rows, pa.string()),
            "rep_doc_id": pc.cast(t["doc_id"], pa.int64()),
        }), batch_format="pyarrow")
    return (_with_tier(exact, "exact")
            .union(_with_tier(sim_elim, "simhash"))
            .union(_with_tier(min_elim, "minhash"))
            .union(kept))


def tier_report_docs(source, cfg: EngineConfig = DEFAULT_CONFIG, *,
                     max_hamming: int = 3,
                     minhash_threshold: float | None = None,
                     tiers=None):
    """Docs eliminated / kept per tier — the cascade's accounting row
    set: (tier, n_docs), the number a 100 TB curation run reports.
    ``tiers``: report on a cascade the caller already ran."""
    from ..stages.agg import grouped_sums

    # materialized: grouped_sums reads ds.schema(), which a lazy map over
    # a hash_join_exchange union reports as None (Ray 2.49 quirk)
    if tiers is None:
        tiers = tiered_dedup_docs(source, cfg, max_hamming=max_hamming,
                                  minhash_threshold=minhash_threshold
                                  ).materialize()
    return grouped_sums(tiers.select_columns(["tier"]), ["tier"], [],
                        count_as="n_docs")


# ---------------------------------------------------------------------------
# transcripts-grain cascade: exact (sig md5) → jaccard-near → containment
# ---------------------------------------------------------------------------

TIER_T_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("tier", pa.string()),
    ("rep_conv_id", pa.string()),
])

_ELIM_T_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("rep_conv_id", pa.string()),
])


def _exact_sig_eliminations(sigs, cfg: EngineConfig, n_parts: int):
    """Tier 0 at sketch grain: conversations whose sketch md5 (digest of
    the retained mins — the flagship's exact-dup edge key,
    ``pipelines/dedup.py``) already appeared under a lexicographically
    smaller conv_id. Equal text always gives an equal sketch, so
    text-exact dups are a subset; the (rare) mins-collision of unequal
    texts is a Jaccard-1.0 near-dup — legitimately 'exact' at this grain."""
    from ..functions.segscore import _to_bytes_array, hash_strings64

    group_parts = cfg.exec.group_parts

    def _partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "md5": batch["md5"],
            "conv_id": batch["conv_id"],
            "md5_part": pa.array(
                hash_strings64(batch["md5"]) % group_parts, pa.int64()),
        })

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _ELIM_T_SCHEMA.empty_table()
        md5 = _to_bytes_array(part["md5"])
        ids = _to_bytes_array(part["conv_id"].combine_chunks())
        order = np.lexsort((ids, md5))
        md5_s = md5[order]
        first = np.concatenate([[True], md5_s[1:] != md5_s[:-1]])
        grp = np.cumsum(first) - 1
        col = part["conv_id"].combine_chunks().take(
            pa.array(order, pa.int64()))
        reps = col.take(pa.array(np.flatnonzero(first)[grp], pa.int64()))
        keep = pa.array(~first)
        return pa.table({
            "conv_id": col.filter(keep),
            "rep_conv_id": reps.filter(keep),
        })

    parts = sigs.select_columns(["conv_id", "md5"]).map_batches(
        _partial, batch_format="pyarrow")
    return exchange_map_groups(parts, "md5_part", n_parts, _merge,
                               _ELIM_T_SCHEMA)


def _eliminations_from_str_pairs(pairs, cfg: EngineConfig):
    """String-id duplicate pairs → (conv_id, rep_conv_id) for non-min
    members (connected_components is string-native; its component label
    is the lexicographic min member)."""
    from ..stages.cluster import connected_components

    labels = connected_components(pairs.select_columns(["a", "b"]), cfg)

    def _emit(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch["node"], batch["label"])
        return pa.table({
            "conv_id": pc.filter(batch["node"].combine_chunks(), keep),
            "rep_conv_id": pc.filter(batch["label"].combine_chunks(),
                                     keep),
        })

    return labels.map_batches(_emit, batch_format="pyarrow")


def _surviving_t(left, elim_list, left_cols: list[str],
                 cfg: EngineConfig, n_parts: int):
    """String-keyed twin of :func:`_surviving` (key column ``conv_id``)."""
    import ray as _r

    from ..stages.join import broadcast_join

    total = sum((e.size_bytes() or 0) for e in elim_list)
    if total <= _BCAST_IDS_LIMIT:
        blocks = []
        for e in elim_list:
            blocks.extend(_r.get(
                e.select_columns(["conv_id"]).to_arrow_refs()))
        blocks = [b for b in blocks if b.num_rows] or \
            [pa.table({"conv_id": pa.array([], pa.string())})]
        ids = pa.concat_tables(blocks).combine_chunks()
        return broadcast_join(left, ids, "conv_id", left_cols, [],
                              join_type="left anti")
    elim = elim_list[0]
    for e in elim_list[1:]:
        elim = elim.union(e)
    return hash_join_exchange(
        left, elim.select_columns(["conv_id"]), "conv_id", left_cols,
        [], n_parts, join_type="left anti")


def _drop_pairs_touching(pairs_tbl: pa.Table, elim_ids) -> pa.Table:
    """Driver-side pair filter: drop rows whose a OR b is eliminated.
    ``elim_ids``: pa.Array of conv_ids. Pairs are the tiny side here
    (near-dup edges), so this runs where the pair table already lives."""
    if pairs_tbl.num_rows == 0 or len(elim_ids) == 0:
        return pairs_tbl
    bad_a = pc.is_in(pairs_tbl["a"], value_set=elim_ids)
    bad_b = pc.is_in(pairs_tbl["b"], value_set=elim_ids)
    keep = pc.invert(pc.or_(bad_a, bad_b))
    return pairs_tbl.filter(pc.fill_null(keep, True))


def _with_tier_t(ds, tier: str):
    def _fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"],
            "tier": pa.array([tier] * batch.num_rows, pa.string()),
            "rep_conv_id": batch["rep_conv_id"],
        })

    return ds.map_batches(_fn, batch_format="pyarrow")


def tiered_dedup_transcripts(source, cfg: EngineConfig = DEFAULT_CONFIG, *,
                             containment_threshold: float = 0.9,
                             checkpoint_dir: str | None = None,
                             resume: bool = True):
    """Conversation-grain tier cascade over the transcripts corpus:

    - **tier 'exact'** — sketch-md5 groups (the flagship's exact-dup key).
    - **tier 'jaccard'** — LSH candidates verified at
      ``cfg.verify_threshold`` Jaccard among exact survivors: global
      near-dups.
    - **tier 'containment'** — pairs at ``max_containment ≥
      containment_threshold`` among jaccard survivors: prefix/subset
      duplicates whose Jaccard is diluted by length difference
      (``minhash.py:881-905`` containment rationale).

    Candidates are banded ONCE over the exact survivors and scored ONCE
    (the verify kernel already returns jaccard + both containments;
    jaccard ≤ max_containment, so thresholding the scan at
    ``min(cfg.verify_threshold, containment_threshold)`` on
    max_containment keeps a superset of both tiers' edges) — the
    containment tier then just re-filters the scored pair table, no
    second band exchange or verify pass.

    Returns (conv_id, tier, rep_conv_id), one row per conversation;
    reps are the lexicographic-min member of the duplicate group among
    that tier's input (rep chains across tiers as in
    :func:`tiered_dedup_docs`).

    ``source``: sf_dir string or a transcripts Dataset.
    """
    import ray.data

    from ..sources.transcripts import read_transcripts
    from ..stages.lsh import candidate_pairs
    from ..stages.sketch import sketch_transcripts
    from ..stages.verify import verify_pairs

    if checkpoint_dir is not None and not isinstance(source, str):
        raise ValueError("checkpoint_dir requires a path source (a "
                         "Dataset source has no stable fingerprint to "
                         "key resume on)")
    fp = (f"tiers-t-v1|sf={source}|cfg={cfg.sketch}|{cfg.lsh}"
          f"|cthr={containment_threshold}")
    ds = read_transcripts(source) if isinstance(source, str) else source
    n_parts = 2 * resolve_num_partitions(cfg)
    sigs = _ckpt(sketch_transcripts(ds, cfg), checkpoint_dir,
                 "signatures", fp, resume)
    if sigs.count() == 0:
        return ray.data.from_arrow(TIER_T_SCHEMA.empty_table())

    # ---- tier 0: sketch-exact ----------------------------------------
    exact = _ckpt(_exact_sig_eliminations(sigs, cfg, n_parts),
                  checkpoint_dir, "tier_exact", fp, resume,
                  _ELIM_T_SCHEMA)

    # ---- one banding + one scoring pass over exact survivors ---------
    sigs1 = _surviving_t(sigs, [exact], ["mins", "md5", "perms"],
                         cfg, n_parts).materialize()
    cand = candidate_pairs(sigs1, cfg, distinct=False)
    floor = min(cfg.verify_threshold, containment_threshold)
    scored = _ckpt(verify_pairs(cand, sigs1, cfg, threshold=floor,
                                metric="max_containment"),
                   checkpoint_dir, "scored_pairs", fp, resume)

    # ---- tier 1: jaccard near-dups ------------------------------------
    jac_pairs = scored.map_batches(
        lambda t, thr=cfg.verify_threshold: t.filter(
            pc.fill_null(pc.greater_equal(t["jaccard"], thr), False)),
        batch_format="pyarrow")
    jac = _ckpt(_eliminations_from_str_pairs(jac_pairs, cfg),
                checkpoint_dir, "tier_jaccard", fp, resume,
                _ELIM_T_SCHEMA)

    # ---- tier 2: containment (subset/prefix) dups ---------------------
    jac_ids = pa.concat_tables(
        [b.select(["conv_id"]) for b in
         _ray_blocks(jac)] or
        [pa.table({"conv_id": pa.array([], pa.string())})]
    )["conv_id"].combine_chunks()
    con_pairs = scored.map_batches(
        lambda t, thr=containment_threshold, bad=jac_ids:
        _drop_pairs_touching(
            t.filter(pc.fill_null(pc.greater_equal(
                pc.max_element_wise(t["containment_ab"],
                                    t["containment_ba"]), thr), False)),
            bad),
        batch_format="pyarrow")
    con = _ckpt(_eliminations_from_str_pairs(con_pairs, cfg),
                checkpoint_dir, "tier_containment", fp, resume,
                _ELIM_T_SCHEMA)

    # ---- assemble ------------------------------------------------------
    kept_ids = _surviving_t(sigs.select_columns(["conv_id"]),
                            [exact, jac, con], [], cfg, n_parts)
    kept = kept_ids.map_batches(
        lambda t: pa.table({
            "conv_id": t["conv_id"],
            "tier": pa.array(["kept"] * t.num_rows, pa.string()),
            "rep_conv_id": t["conv_id"],
        }), batch_format="pyarrow")
    return (_with_tier_t(exact, "exact")
            .union(_with_tier_t(jac, "jaccard"))
            .union(_with_tier_t(con, "containment"))
            .union(kept))


def _ray_blocks(ds):
    import ray as _r

    return [b for b in _r.get(ds.to_arrow_refs()) if b.num_rows]


def tier_report_transcripts(source, cfg: EngineConfig = DEFAULT_CONFIG, *,
                            containment_threshold: float = 0.9):
    """(tier, n_convs) accounting rows for the transcripts cascade."""
    from ..stages.agg import grouped_sums

    tiers = tiered_dedup_transcripts(
        source, cfg, containment_threshold=containment_threshold
    ).materialize()
    return grouped_sums(tiers.select_columns(["tier"]), ["tier"], [],
                        count_as="n_convs")


def residual_dup_rate(source, cfg: EngineConfig = DEFAULT_CONFIG, *,
                      n_sample: int = 256, threshold: float | None = None,
                      tiers=None):
    """Post-dedup quality audit: estimated residual near-dup rate among
    the cascade's KEPT documents, by exhaustive verification of a
    deterministic sample — the acceptance check a 100 TB dedup run
    reports next to its tier counts. Sampling is by md5-order of the
    doc id (uniform, seedless, reproducible); the sample's sketches are
    verified all-pairs with the same Jaccard kernel the minhash tier
    used, so the estimate is an unbiased check OF the cascade, not a
    re-run of it. Output: one row
    (n_kept, n_sampled, n_pairs_checked, n_dup_pairs, dup_rate_ppm).
    """
    import ray.data

    from ..functions.segscore import (_local_idx, hash_strings64,
                                      pair_jaccard_stats)

    thr = cfg.verify_threshold if threshold is None else threshold
    # ``tiers``: audit a cascade the caller already ran (the job-level
    # --audit path) instead of re-running it here
    if tiers is None:
        tiers = tiered_dedup_docs(source, cfg).materialize()
    kept = tiers.map_batches(
        lambda t: t.filter(pc.equal(t["tier"], "kept")).select(
            ["doc_id"]),
        batch_format="pyarrow").materialize()
    n_kept = kept.count()
    # deterministic uniform sample: smallest n_sample md5(doc_id) values
    samp_rows = kept.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "h": pa.array(hash_strings64(
                pc.cast(t["doc_id"], pa.string())), pa.int64()),
        }), batch_format="pyarrow").sort("h").take(n_sample)
    ids = pa.array(sorted(r["doc_id"] for r in samp_rows), pa.int64())
    docs = _docs(source)
    sk = DocSketcher(cfg)

    def _sample_sigs(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.is_in(batch["doc_id"], value_set=ids))
        return sk(sel)

    sig_tbl = pa.concat_tables(
        [b for b in _ray_blocks(
            docs.map_batches(_sample_sigs, batch_format="pyarrow"))]
        or [sk(pa.table({"doc_id": pa.array([], pa.int64()),
                         "text": pa.array([], pa.string())}))]
    ).combine_chunks()
    n = sig_tbl.num_rows
    n_pairs = n * (n - 1) // 2
    n_dup = 0
    if n >= 2:
        mins = sig_tbl["mins"].combine_chunks()
        offs = np.asarray(mins.offsets, np.int64)
        vals = np.asarray(mins.values, np.uint64) if len(mins.values) \
            else np.empty(0, np.uint64)
        iu, ju = np.triu_indices(n, k=1)
        la = (offs[iu + 1] - offs[iu])
        lb = (offs[ju + 1] - offs[ju])
        a_idx = np.repeat(offs[iu], la) + _local_idx(la)
        b_idx = np.repeat(offs[ju], lb) + _local_idx(lb)
        ao = np.concatenate([[0], np.cumsum(la)]).astype(np.int64)
        bo = np.concatenate([[0], np.cumsum(lb)]).astype(np.int64)
        _c, cj, dj = pair_jaccard_stats(vals[a_idx], ao, vals[b_idx], bo)
        n_dup = int(((cj / np.maximum(dj, 1)) >= thr).sum())
    rate_ppm = int(round(n_dup / n_pairs * 1_000_000)) if n_pairs else 0
    return ray.data.from_arrow(pa.table({
        "n_kept": pa.array([n_kept], pa.int64()),
        "n_sampled": pa.array([n], pa.int64()),
        "n_pairs_checked": pa.array([n_pairs], pa.int64()),
        "n_dup_pairs": pa.array([n_dup], pa.int64()),
        "dup_rate_ppm": pa.array([rate_ppm], pa.int64()),
    }))



# ---------------------------------------------------------------------------
# embeddings-grain cascade: exact (quantized bytes) → cosine-hi → cosine-lo
# ---------------------------------------------------------------------------

TIER_E_SCHEMA = pa.schema([
    ("vec_id", pa.int64()),
    ("tier", pa.string()),
    ("rep_vec_id", pa.int64()),
])


def _emb_sketch_batch(batch: pa.Table) -> pa.Table:
    """ONE embedding scan for the whole cascade: per vector, the
    1e4-quantized float64 blob (exact-integer cosine partials — the
    ``cosine_pairs_exact`` determinism scheme) and the md5 of its int64
    bytes (the exact tier's key: bit-identical at e4 resolution). The
    emitted table is the only thing later tiers touch; raw floats are
    never re-read."""
    import hashlib

    from .ann import _emb_matrix

    ids, mat = _emb_matrix(batch)
    n, dim = (mat.shape if mat.ndim == 2 and mat.size else (len(ids), 0))
    q = np.round(mat * 1e4) if mat.size else mat.reshape(n, 0)
    qi = np.ascontiguousarray(q.astype(np.int64))
    row_bytes = qi.view(np.uint8).reshape(n, 8 * dim) if n and dim else \
        np.empty((n, 0), np.uint8)
    md5s = [hashlib.md5(row_bytes[i].tobytes()).hexdigest()
            for i in range(n)]
    flat = np.ascontiguousarray(q, dtype=np.float64).reshape(-1)
    offs = np.arange(n + 1, dtype=np.int32) * (8 * dim)
    blob = pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs), pa.py_buffer(flat.view(np.uint8))])
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text_md5": pa.array(md5s, pa.string()),
        "blob": blob,
    })


def _keyed_from_blob(proj: np.ndarray, n_bits: int, n_tables: int,
                     group_parts: int):
    """Hyperplane band keys straight off the quantized blob column (sign
    of q·h == sign of v·h under positive scaling, so banding the
    quantized vectors is the same LSH family)."""
    def _fn(batch: pa.Table) -> pa.Table:
        blob = batch["blob"].combine_chunks()
        n = len(blob)
        dim = proj.shape[0]
        if n:
            bufs = blob.buffers()
            width = 8 if pa.types.is_large_binary(blob.type) else 4
            offs = np.frombuffer(
                bufs[1], dtype=np.int64 if width == 8 else np.int32,
                count=n + 1, offset=blob.offset * width).astype(np.int64)
            # fixed-width rows, but honor the actual offsets (a sliced
            # array's data buffer does not start at 0)
            data = np.frombuffer(bufs[2], np.uint8,
                                 count=offs[n] - offs[0], offset=offs[0])
            mat = data.view(np.float64).reshape(n, dim)
        else:
            mat = np.empty((0, dim))
        bits = ((mat @ proj) > 0).reshape(n, n_tables, n_bits)
        key = (bits.astype(np.uint64)
               << np.arange(n_bits, dtype=np.uint64)[None, None, :]).sum(
                   axis=2, dtype=np.uint64)
        key = key * np.uint64(n_tables + 1) + np.arange(
            n_tables, dtype=np.uint64)[None, :]
        keys = key.reshape(-1)
        return pa.table({
            "band_key": pa.array(keys, pa.uint64()),
            "band_part": pa.array(
                (keys % np.uint64(group_parts)).astype(np.int64),
                pa.int64()),
            "conv_id": pc.cast(
                pa.array(np.repeat(np.asarray(batch["doc_id"], np.int64),
                                   n_tables), pa.int64()), pa.string()),
        })

    return _fn


def _with_tier_e(ds, tier: str):
    def _fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": pc.cast(batch["doc_id"], pa.int64()),
            "tier": pa.array([tier] * batch.num_rows, pa.string()),
            "rep_vec_id": pc.cast(batch["rep_doc_id"], pa.int64()),
        })

    return ds.map_batches(_fn, batch_format="pyarrow")


def tiered_dedup_embeddings(source, cfg: EngineConfig = DEFAULT_CONFIG, *,
                            hi: float = 0.45, lo: float = 0.35,
                            n_bits: int = 4, n_tables: int = 16,
                            seed: int = 42,
                            checkpoint_dir: str | None = None,
                            resume: bool = True):
    """Embedding-grain tier cascade — the third modality of the tier-dedup
    family (docs, transcripts, embeddings):

    - **tier 'exact'** — vectors bit-identical at 1e4 quantization (one
      md5-of-int64-bytes exchange; re-encoded/re-uploaded embeddings).
    - **tier 'cosine_hi'** — exact cosine ≥ ``hi`` among exact survivors
      (semantic clones).
    - **tier 'cosine_lo'** — ``lo`` ≤ cosine < ``hi`` among hi survivors
      (near-neighbors a stricter curation pass also drops).

    Candidates band ONCE (multi-table hyperplane LSH over the quantized
    blobs) and score ONCE at threshold ``lo`` — both cosine tiers
    re-filter the same scored pair table, exactly the transcripts
    cascade's one-pass split. Scores use the exact-integer-dot scheme,
    so tier boundaries are bit-stable across runs and engines. Defaults
    sit below the synthetic corpus's max inter-vector cosine (~0.52) so
    the demo cascade is non-degenerate; production embeddings would run
    hi≈0.99 / lo≈0.95 with ``n_bits`` scaled ~log2(n/64).

    ``source``: sf_dir string or a (vec_id, embedding) Dataset.
    Returns (vec_id, tier, rep_vec_id), one row per vector; rep chains
    across tiers as in :func:`tiered_dedup_docs`.
    """
    import ray.data

    from ..stages.lsh import PAIRS_SCHEMA, _emit_pairs_part, dedup_pairs
    from ..stages.verify import CosineScorer, score_pairs
    from .ann import _read_emb

    if checkpoint_dir is not None and not isinstance(source, str):
        raise ValueError("checkpoint_dir requires a path source (a "
                         "Dataset source has no stable fingerprint to "
                         "key resume on)")
    fp = (f"tiers-e-v1|sf={source}|hi={hi}|lo={lo}|bits={n_bits}"
          f"|tables={n_tables}|seed={seed}")
    emb = _read_emb(source) if isinstance(source, str) else source
    n_parts = 2 * resolve_num_partitions(cfg)
    group_parts = cfg.exec.group_parts

    sketches = _ckpt(emb.map_batches(_emb_sketch_batch,
                                     batch_format="pyarrow"),
                     checkpoint_dir, "sketches", fp, resume)
    if sketches.count() == 0:
        return ray.data.from_arrow(TIER_E_SCHEMA.empty_table())
    first = sketches.take(1)[0]
    dim = len(first["blob"]) // 8

    # ---- tier 0: exact at e4 resolution ------------------------------
    exact = _ckpt(_exact_eliminations(
        sketches.select_columns(["doc_id", "text_md5"]), cfg, n_parts),
        checkpoint_dir, "tier_exact", fp, resume, _ELIM_SCHEMA)

    # ---- one banding + one scoring pass over exact survivors ---------
    surv = _surviving(sketches.select_columns(["doc_id", "blob"]),
                      [exact], "doc_id", ["blob"], cfg,
                      n_parts).materialize()
    rng = np.random.default_rng(seed)
    proj = rng.standard_normal((dim, n_tables * n_bits))
    keyed = surv.map_batches(
        _keyed_from_blob(proj, n_bits, n_tables, group_parts),
        batch_format="pyarrow")
    # full_pairs: the scored table feeds TWO tiers; the clustering
    # star+chain cap would silently break the lo tier's components
    pairs = exchange_map_groups(
        keyed, "band_part", n_parts,
        _emit_pairs_part(cfg.lsh.max_bucket_pairs_members,
                         full_pairs=True), PAIRS_SCHEMA)
    pairs = dedup_pairs(pairs, group_parts, out_schema=PAIRS_SCHEMA)
    blobs = surv.map_batches(
        lambda t: pa.table({"conv_id": pc.cast(t["doc_id"], pa.string()),
                            "blob": t["blob"]}),
        batch_format="pyarrow")
    scored = _ckpt(
        score_pairs(pairs, blobs, cfg, CosineScorer(lo, round_to=6),
                    size_hint_bytes=surv.size_bytes() or 0),
        checkpoint_dir, "scored_pairs", fp, resume)

    # ---- tier 1: cosine ≥ hi ------------------------------------------
    hi_pairs = scored.map_batches(
        lambda t, thr=hi: t.filter(
            pc.fill_null(pc.greater_equal(t["cosine"], thr), False)),
        batch_format="pyarrow")
    hi_elim = _ckpt(_eliminations_from_pairs(hi_pairs, "a", "b", cfg),
                    checkpoint_dir, "tier_cosine_hi", fp, resume,
                    _ELIM_SCHEMA)

    # ---- tier 2: lo ≤ cosine < hi among hi survivors --------------------
    hi_ids = pa.concat_tables(
        [b.select(["doc_id"]) for b in _ray_blocks(hi_elim)] or
        [pa.table({"doc_id": pa.array([], pa.int64())})]
    )["doc_id"].combine_chunks()
    hi_ids_str = pc.cast(hi_ids, pa.string())
    lo_pairs = scored.map_batches(
        lambda t, thr=hi, bad=hi_ids_str: _drop_pairs_touching(
            t.filter(pc.fill_null(pc.less(t["cosine"], thr), False)),
            bad),
        batch_format="pyarrow")
    lo_elim = _ckpt(_eliminations_from_pairs(lo_pairs, "a", "b", cfg),
                    checkpoint_dir, "tier_cosine_lo", fp, resume,
                    _ELIM_SCHEMA)

    # ---- assemble -------------------------------------------------------
    kept_ids = _surviving(sketches.select_columns(["doc_id"]),
                          [exact, hi_elim, lo_elim], "doc_id", [],
                          cfg, n_parts)
    kept = kept_ids.map_batches(
        lambda t: pa.table({
            "vec_id": pc.cast(t["doc_id"], pa.int64()),
            "tier": pa.array(["kept"] * t.num_rows, pa.string()),
            "rep_vec_id": pc.cast(t["doc_id"], pa.int64()),
        }), batch_format="pyarrow")
    return (_with_tier_e(exact, "exact")
            .union(_with_tier_e(hi_elim, "cosine_hi"))
            .union(_with_tier_e(lo_elim, "cosine_lo"))
            .union(kept))


def tier_report_embeddings(source, cfg: EngineConfig = DEFAULT_CONFIG, *,
                           hi: float = 0.45, lo: float = 0.35,
                           tiers=None):
    """(tier, n_vecs) accounting rows for the embeddings cascade."""
    from ..stages.agg import grouped_sums

    if tiers is None:
        tiers = tiered_dedup_embeddings(source, cfg, hi=hi, lo=lo
                                        ).materialize()
    return grouped_sums(tiers.select_columns(["tier"]), ["tier"], [],
                        count_as="n_vecs")


def tier_agreement_matrix(source, cfg: EngineConfig = DEFAULT_CONFIG, *,
                          doc_tiers=None, emb_tiers=None):
    """Cross-MODALITY cascade audit: the (doc_tier × embedding_tier)
    contingency matrix over ids labeled by BOTH the text cascade and the
    embedding cascade (vec_id ≡ doc_id in this corpus — the embeddings
    are document embeddings). Disagreement cells are the interesting
    ones: text-kept but embedding-dup = paraphrase/template mass the
    text tiers can't see; text-dup but embedding-kept = near-identical
    text whose embeddings drifted (an encoder-version smell). One id
    exchange joins the two label tables; only (pair-of-tiers, count)
    cells leave it."""
    from ..stages.agg import grouped_sums

    if doc_tiers is None:
        doc_tiers = tiered_dedup_docs(source, cfg).materialize()
    if emb_tiers is None:
        emb_tiers = tiered_dedup_embeddings(source, cfg).materialize()
    n_parts = resolve_num_partitions(cfg)
    d = doc_tiers.map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                            "doc_tier": t["tier"]}),
        batch_format="pyarrow")
    e = emb_tiers.map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["vec_id"], pa.int64()),
                            "emb_tier": t["tier"]}),
        batch_format="pyarrow")
    joined = hash_join_exchange(d, e, "doc_id", ["doc_tier"],
                                ["emb_tier"], n_parts)
    return grouped_sums(joined.select_columns(["doc_tier", "emb_tier"]),
                        ["doc_tier", "emb_tier"], [], count_as="n_items")


def residual_cosine_rate(source, cfg: EngineConfig = DEFAULT_CONFIG, *,
                         n_sample: int = 256, lo: float = 0.35,
                         tiers=None):
    """Embeddings-cascade acceptance audit (the :func:`residual_dup_rate`
    twin): estimated residual near-dup rate among KEPT vectors by
    exhaustive exact-integer cosine over a deterministic hash-ordered
    sample. Output: one row
    (n_kept, n_sampled, n_pairs_checked, n_dup_pairs, dup_rate_ppm)."""
    import ray.data

    from ..functions.segscore import hash_strings64
    from .ann import _emb_matrix, _read_emb

    if tiers is None:
        tiers = tiered_dedup_embeddings(source, cfg).materialize()
    kept = tiers.map_batches(
        lambda t: t.filter(pc.equal(t["tier"], "kept")).select(
            ["vec_id"]),
        batch_format="pyarrow").materialize()
    n_kept = kept.count()
    samp_rows = kept.map_batches(
        lambda t: pa.table({
            "vec_id": t["vec_id"],
            "h": pa.array(hash_strings64(
                pc.cast(t["vec_id"], pa.string())), pa.int64()),
        }), batch_format="pyarrow").sort("h").take(n_sample)
    ids = pa.array(sorted(r["vec_id"] for r in samp_rows), pa.int64())
    emb = _read_emb(source) if isinstance(source, str) else source
    sample = pa.concat_tables(
        [b for b in _ray_blocks(emb.map_batches(
            lambda t: t.filter(pc.is_in(t["vec_id"], value_set=ids)),
            batch_format="pyarrow"))]
        or [pa.table({"vec_id": pa.array([], pa.int64()),
                      "embedding": pa.array([], pa.list_(pa.float32()))})]
    ).combine_chunks()
    n = sample.num_rows
    n_pairs = n * (n - 1) // 2
    n_dup = 0
    if n >= 2:
        _, mat = _emb_matrix(sample)
        q = np.round(mat * 1e4)
        norms = np.linalg.norm(q, axis=1)
        norms[norms == 0] = 1.0
        cos = (q @ q.T) / (norms[:, None] * norms[None, :])
        iu, ju = np.triu_indices(n, k=1)
        n_dup = int((cos[iu, ju] >= lo).sum())
    rate_ppm = int(round(n_dup / n_pairs * 1_000_000)) if n_pairs else 0
    return ray.data.from_arrow(pa.table({
        "n_kept": pa.array([n_kept], pa.int64()),
        "n_sampled": pa.array([n], pa.int64()),
        "n_pairs_checked": pa.array([n_pairs], pa.int64()),
        "n_dup_pairs": pa.array([n_dup], pa.int64()),
        "dup_rate_ppm": pa.array([rate_ppm], pa.int64()),
    }))

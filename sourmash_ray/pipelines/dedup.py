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


def _exact_edges_part(part: pa.Table) -> pa.Table:
    """Star edges for every identical-md5 run within one coarse partition
    (vectorized run detection; empty sketches are excluded upstream — they
    share a vacuous md5 but have Jaccard 0 by the max(1, denom) rule,
    ``minhash.rs:624-631``)."""
    import numpy as np

    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string())})
    if part.num_rows < 2:
        return empty
    part = part.select(["md5", "conv_id"]).sort_by(
        [("md5", "ascending"), ("conv_id", "ascending")])
    md5 = np.asarray(part["md5"].combine_chunks().to_numpy(
        zero_copy_only=False))
    conv = part["conv_id"].combine_chunks()
    new = np.concatenate([[True], md5[1:] != md5[:-1]])
    starts = np.flatnonzero(new)
    sizes = np.diff(np.concatenate([starts, [md5.size]]))
    ai, bi = [], []
    for s, g in zip(starts[sizes >= 2], sizes[sizes >= 2]):
        g = int(g)
        ai.append(np.full(g - 1, s))
        bi.append(np.arange(s + 1, s + g))
    if not ai:
        return empty
    return pa.table({
        "a": conv.take(pa.array(np.concatenate(ai), pa.int64())),
        "b": conv.take(pa.array(np.concatenate(bi), pa.int64())),
    })


def exact_dup_edges(sigs, group_parts: int = 1024):
    """Identical-sketch star edges: coarse groupby over md5 (the
    ``found_md5`` dedup promoted to an operator)."""
    import numpy as np
    import pyarrow.compute as pc

    def _key(batch: pa.Table) -> pa.Table:
        from ..functions.segscore import hash_strings64

        keep = pc.greater(pc.list_value_length(batch["mins"]), 0)
        t = batch.select(["conv_id", "md5"]).filter(keep)
        mp = hash_strings64(t["md5"]) % group_parts
        return t.append_column("md5_part", pa.array(mp, pa.int64()))

    from ..stages.exchange import exchange_map_groups
    from ..stages.lsh import PAIRS_SCHEMA
    from ..config import resolve_num_partitions

    keyed = (sigs.select_columns(["conv_id", "md5", "mins"])
             .map_batches(_key, batch_format="pyarrow"))
    return exchange_map_groups(
        keyed, "md5_part", 2 * resolve_num_partitions(DEFAULT_CONFIG),
        _exact_edges_part, PAIRS_SCHEMA)


def dedup_pipeline(
    source,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    metric: str = "jaccard",
):
    """Run the full near-dup pipeline.

    ``source``: an sf_dir string (synthesizes/reads the transcripts corpus)
    or an existing transcripts Dataset.

    ``metric``: ``"jaccard"`` (flat sketches, default),
    ``"max_containment"`` (keeps prefix/subset duplicates whose Jaccard
    is diluted by length difference — ``minhash.py:881-905``), or
    ``"angular"`` (abundance-cosine verification via
    :func:`stages.verify.angular_pairs` — requires
    ``cfg.sketch.track_abundance``; the reference runs its whole test
    matrix in both flat and abund variants,
    ``tests/conftest.py:27-60``). In angular mode the identical-md5
    exact-dup edges are SKIPPED: md5 digests mins only, so two sketches
    with equal mins but different abundances can sit below the angular
    threshold — force-merging them would be wrong. True exact duplicates
    (equal text → equal abunds) score 1.0 and merge through verification.

    Returns dict of Datasets: ``signatures``, ``verified_pairs``,
    ``clusters`` (conv_id → cluster_id for every conversation).
    """
    if metric not in ("jaccard", "angular", "max_containment"):
        raise ValueError(f"unknown dedup metric {metric!r}")
    if metric == "angular" and not cfg.sketch.track_abundance:
        raise ValueError("metric='angular' requires "
                         "cfg.sketch.track_abundance=True")
    if isinstance(source, str):
        ds = read_transcripts(source)
        fingerprint = f"v2|sf={source}|cfg={cfg.sketch}|{cfg.lsh}|{metric}"
    else:
        ds = source
        if checkpoint_dir:
            # content fingerprint for Dataset sources: row count + checksum
            # of sampled (conv_id, TEXT) rows — ids alone would silently
            # resume stale verified-pairs/cluster checkpoints after a
            # same-shape edit of the texts (ADVICE r2)
            from ..functions.segscore import hash_strings64

            n_rows = ds.count()
            sample = ds.limit(512).select_columns(
                ["conv_id", "text"]).take_all()
            crc = int((hash_strings64([r["conv_id"] for r in sample])
                       ^ hash_strings64([r["text"] or ""
                                         for r in sample])
                       ).sum()) & 0xFFFFFFFFFFFF if sample else 0
            fingerprint = (f"v2|ds|n={n_rows}|crc={crc:x}"
                           f"|cfg={cfg.sketch}|{cfg.lsh}|{metric}")
        else:
            fingerprint = f"v2|ds|cfg={cfg.sketch}|{cfg.lsh}|{metric}"

    sigs = sketch_transcripts(
        ds, cfg,
        checkpoint_dir=(os.path.join(checkpoint_dir, "signature_parts")
                        if checkpoint_dir else None),
        fingerprint=fingerprint)
    if checkpoint_dir:
        sigs, _ = checkpoint_dataset(
            sigs, os.path.join(checkpoint_dir, "signatures"),
            stage="signatures", fingerprint=fingerprint, resume=resume)
    else:
        # reused by banding, two verify joins and cluster assignment —
        # materialize once into the object store instead of recomputing
        sigs = sigs.materialize()

    # distinct pairs BEFORE verify: with the vectorized scorer a verify
    # pass over band-duplicated pairs (~10× rows) costs more than the
    # pair dedup it used to hide behind; verified output needs no
    # post-dedup because verify is per-pair deterministic
    pairs = candidate_pairs(sigs, cfg)
    # launch the exact-dup md5 exchange NOW: its raw Ray tasks run
    # concurrently with the verify materialization below (independent
    # branches over the same materialized sigs)
    # exact md5 edges are valid for jaccard AND max_containment
    # (identical mins => both scores are 1.0) but NOT for angular
    # (equal mins with different abunds can sit below threshold)
    exact_edges = exact_dup_edges(sigs) if metric != "angular" else None
    if metric == "angular":
        from ..stages.verify import angular_pairs

        verified = angular_pairs(pairs, sigs, cfg,
                                 threshold=cfg.verify_threshold)
    else:
        verified = verify_pairs(pairs, sigs, cfg, metric=metric)
    if checkpoint_dir:
        verified, _ = checkpoint_dataset(
            verified, os.path.join(checkpoint_dir, "verified_pairs"),
            stage="verified_pairs", fingerprint=fingerprint, resume=resume)
    else:
        verified = verified.materialize()

    edges = verified.select_columns(["a", "b"])
    if exact_edges is not None:
        edges = edges.union(exact_edges)
    clusters = assign_clusters(sigs, edges, cfg)
    if checkpoint_dir:
        clusters, _ = checkpoint_dataset(
            clusters, os.path.join(checkpoint_dir, "clusters"),
            stage="clusters", fingerprint=fingerprint, resume=resume)

    return {"signatures": sigs, "verified_pairs": verified,
            "clusters": clusters}


# ---------------------------------------------------------------------------
# time-windowed near-dup dedup (duplicates within a time horizon)
# ---------------------------------------------------------------------------

def conv_windows(ds, window_us: int):
    """(conv_id, window) — each conversation's time bucket
    ``min(ts) // window_us``. One conv-keyed exchange (conversations
    land whole in a partition, so the min is exact)."""
    import numpy as np
    import pyarrow.compute as pc

    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    schema = pa.schema([("conv_id", pa.string()),
                        ("window", pa.int64())])

    def _prep(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        return pa.table({
            "conv_id": cid,
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "conv_part": pa.array(hash_strings64(cid) % 1024, pa.int64()),
        })

    def _win(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return schema.empty_table()
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        ts = np.asarray(part["ts_us"], np.int64)
        order = np.argsort(cid, kind="stable")
        cid_s = cid[order]
        new = np.r_[True, cid_s[1:] != cid_s[:-1]]
        starts = np.flatnonzero(new)
        tmin = np.minimum.reduceat(ts[order], starts)
        take = pa.array(order[starts], pa.int64())
        return pa.table({
            "conv_id": part["conv_id"].combine_chunks().take(take),
            "window": pa.array(tmin // window_us, pa.int64()),
        })

    keyed = ds.select_columns(["conv_id", "ts"]).map_batches(
        _prep, batch_format="pyarrow")
    return exchange_map_groups(keyed, "conv_part",
                               resolve_num_partitions(DEFAULT_CONFIG),
                               _win, schema)


def attach_windows(sigs, windows, n_parts: int = None):
    """sigs + (conv_id, window) → sigs with a ``window`` column, via a
    conv-hash exchange co-group (NOT ``pa.Table.join`` — Acero rejects
    the list<u64> sketch columns; the in-partition attach is one sorted
    numpy lookup, list columns ride untouched)."""
    import numpy as np

    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups
    from ..stages.sketch import SIG_SCHEMA

    if n_parts is None:
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    out_schema = pa.schema(list(SIG_SCHEMA)
                           + [pa.field("window", pa.int64())])
    padded = pa.schema(list(out_schema) + [pa.field("side", pa.int8()),
                                           pa.field("cp", pa.int64())])

    def _tag_sigs(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        cols = {f.name: batch[f.name] for f in SIG_SCHEMA}
        cols["window"] = pa.nulls(batch.num_rows, pa.int64())
        cols["side"] = pa.array(
            np.zeros(batch.num_rows, np.int8), pa.int8())
        cols["cp"] = pa.array(hash_strings64(cid) % 1024, pa.int64())
        return pa.table(cols).cast(padded)

    def _tag_wnd(batch: pa.Table) -> pa.Table:
        cid = batch["conv_id"].combine_chunks()
        n = batch.num_rows
        cols = {}
        for f in SIG_SCHEMA:
            cols[f.name] = (cid if f.name == "conv_id"
                            else pa.nulls(n, f.type))
        cols["window"] = batch["window"]
        cols["side"] = pa.array(np.ones(n, np.int8), pa.int8())
        cols["cp"] = pa.array(hash_strings64(cid) % 1024, pa.int64())
        return pa.table(cols).cast(padded)

    both = sigs.map_batches(_tag_sigs, batch_format="pyarrow").union(
        windows.map_batches(_tag_wnd, batch_format="pyarrow"))

    def _attach(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        side = np.asarray(part["side"], np.int8)
        cid = _to_bytes_array(part["conv_id"].combine_chunks())
        is_sig = side == 0
        wrows = np.flatnonzero(~is_sig)
        w_ids = cid[wrows]
        w_vals = np.asarray(part["window"], np.int64)[wrows]
        order = np.argsort(w_ids, kind="stable")
        w_ids_s, w_vals_s = w_ids[order], w_vals[order]
        srows = np.flatnonzero(is_sig)
        s_ids = cid[srows]
        if w_ids_s.size == 0:
            raise ValueError("no window rows for this partition")
        pos = np.minimum(np.searchsorted(w_ids_s, s_ids),
                         w_ids_s.size - 1)
        if not (w_ids_s[pos] == s_ids).all():
            raise ValueError("signature without a window row")
        take = pa.array(srows, pa.int64())
        cols = {f.name: part[f.name].take(take) for f in SIG_SCHEMA}
        cols["window"] = pa.array(w_vals_s[pos], pa.int64())
        return pa.table(cols).cast(out_schema)

    return exchange_map_groups(both, "cp", n_parts, _attach, out_schema)


def dedup_transcripts_windowed(source, window_us: int,
                               cfg: EngineConfig = DEFAULT_CONFIG):
    """Near-dup dedup WITHIN A TIME HORIZON: only conversation pairs
    whose start-time windows are equal or adjacent (``|Δwindow| ≤ 1``,
    i.e. within ``2·window_us`` of each other at the bucket grain) are
    candidates — the streaming-corpus shape where duplicates arrive
    close in time and time-scoping bounds every LSH bucket's membership
    regardless of corpus age (the per-(band, window) bucket is the unit
    of work, so a year of crawl never concentrates into one bucket).

    Mechanism: each signature emits its band keys REKEYED by window w
    and w+1 (one murmur fold per copy); a pair ≤ 1 window apart shares
    the higher window's copy, pairs further apart never meet. Within
    the horizon, recall is identical to the unwindowed pipeline (same
    band ⇒ same windowed bucket). md5 exact-dup edges are deliberately
    NOT emitted: identical texts share all bands, so within-horizon
    exact dups are already candidates, and beyond-horizon ones are out
    of the operator's contract.

    Returns dict of Datasets: ``signatures`` (with ``window``),
    ``verified_pairs``, ``clusters``.
    """
    import numpy as np

    from ..config import resolve_num_partitions
    from ..functions.murmur import _np_fmix64
    from ..stages.exchange import exchange_map_groups
    from ..stages.lsh import (PAIRS_SCHEMA, _emit_pairs_part, BandKeyer,
                              band_keys_batch, dedup_pairs)

    if isinstance(source, str):
        ds = read_transcripts(source)
    else:
        ds = source
    sigs = sketch_transcripts(ds, cfg).materialize()
    wnd = conv_windows(ds, window_us)
    sigs_w = attach_windows(sigs, wnd).materialize()

    lsh = cfg.lsh
    parts = cfg.exec.group_parts
    keyer = BandKeyer(lsh.num_perm, lsh.bands, lsh.rows, parts)

    def _windowed_keys(batch: pa.Table) -> pa.Table:
        keyed = keyer(batch)            # (band_key, band_part, conv_id)
        if keyed.num_rows == 0:
            return keyed
        # rows align with the non-empty-sketch subset in batch order;
        # rebuild the window vector the same way the keyer filtered
        from ..functions.perm import MAX_U64

        perms0 = np.asarray(
            batch["perms"].combine_chunks().flatten(),
            dtype=np.uint64).reshape(batch.num_rows, lsh.num_perm)[:, 0]
        w = np.asarray(batch["window"], np.int64)[perms0 != MAX_U64]
        w_rep = np.repeat(w, lsh.bands).astype(np.uint64)
        bk = np.asarray(keyed["band_key"], np.uint64)
        old = np.seterr(over="ignore")
        try:
            k0 = _np_fmix64(bk ^ _np_fmix64(w_rep))
            k1 = _np_fmix64(bk ^ _np_fmix64(w_rep + np.uint64(1)))
        finally:
            np.seterr(**old)
        keys = np.concatenate([k0, k1])
        conv = keyed["conv_id"].combine_chunks()
        conv2 = pa.concat_arrays([conv, conv])
        return pa.table({
            "band_key": pa.array(keys, pa.uint64()),
            "band_part": pa.array(
                (keys % np.uint64(parts)).astype(np.int64), pa.int64()),
            "conv_id": conv2,
        })

    keyed = sigs_w.select_columns(["conv_id", "perms", "window"]
                                  ).map_batches(_windowed_keys,
                                                batch_format="pyarrow")
    pairs = exchange_map_groups(
        keyed, "band_part", 2 * resolve_num_partitions(cfg),
        _emit_pairs_part(lsh.max_bucket_pairs_members), PAIRS_SCHEMA)
    pairs = dedup_pairs(pairs, parts, out_schema=PAIRS_SCHEMA)
    verified = verify_pairs(pairs, sigs_w, cfg).materialize()
    clusters = assign_clusters(sigs_w, verified.select_columns(
        ["a", "b"]), cfg)
    return {"signatures": sigs_w, "verified_pairs": verified,
            "clusters": clusters}


def neardup_threshold_sweep(source, cfg: EngineConfig = DEFAULT_CONFIG, *,
                            thresholds=(0.25, 0.5, 0.75, 0.9, 0.9999)):
    """Near-dup tuning curve: how many verified pairs survive each
    candidate Jaccard threshold — the knob-setting report an operator
    reads before committing a 100 TB dedup threshold. ONE banding pass
    and ONE scoring pass at min(thresholds); every curve point is a
    vectorized count over the same scored pair table (block partials →
    a |thresholds|-sized driver fold), so sweeping 5 thresholds costs
    the same as checking 1. Banded-candidate recall bounds apply as in
    the flagship (SCALE.md §3); pairs below min(thresholds) are never
    scored. Output: (threshold_e4, n_pairs)."""
    import numpy as np

    import ray.data

    thr = sorted(float(t) for t in thresholds)
    if not thr:
        raise ValueError("thresholds must be non-empty")
    ds = read_transcripts(source) if isinstance(source, str) else source
    sigs = sketch_transcripts(ds, cfg).materialize()
    pairs = candidate_pairs(sigs, cfg)
    ver = verify_pairs(pairs, sigs, cfg, threshold=thr[0])

    def _count(batch: pa.Table) -> pa.Table:
        j = np.asarray(batch["jaccard"], np.float64)
        return pa.table({
            "threshold_e4": pa.array(
                [int(round(t * 1e4)) for t in thr], pa.int64()),
            "n_pairs": pa.array([int((j >= t).sum()) for t in thr],
                                pa.int64()),
        })

    agg: dict[int, int] = {int(round(t * 1e4)): 0 for t in thr}
    for row in ver.map_batches(_count,
                               batch_format="pyarrow").take_all():
        agg[row["threshold_e4"]] += row["n_pairs"]
    return ray.data.from_arrow(pa.table({
        "threshold_e4": pa.array(sorted(agg), pa.int64()),
        "n_pairs": pa.array([agg[k] for k in sorted(agg)], pa.int64()),
    }))

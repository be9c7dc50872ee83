"""Capability-parity pipelines: search / prefetch / gather / compare.

The reference's four query entry points re-expressed over the signatures
Dataset (SURVEY.md §3):

- ``search``: one query signature vs a collection, jaccard/containment ≥
  threshold, sorted desc (``/root/reference/src/sourmash/commands.py:606-756``,
  ``search.py:90-169`` JaccardSearch protocol).
- ``prefetch``: containment scan keeping every match above a hash-count
  threshold (``commands.py:1494-1720``, ``index/__init__.py:241-256``).
- ``gather``: greedy min-set-cov via the CounterGather pattern
  (``index/__init__.py:735-909``): ONE distributed prefetch scan collects
  the candidates (only signatures overlapping the query), then the greedy
  rounds run over cached candidate mins with consume/decrement — each
  round costs O(candidate hashes ∩ found), never a rescan of the
  collection. Result rows carry the ``GatherResult`` stats family
  (``search.py:553-664``).
- ``compare``: all-pairs similarity matrix in sparse long form
  (``compare.py:14-64`` serial semantics; the dense n×n matrix of the
  reference is replaced by (a, b, similarity) rows).

The query sketch is broadcast (``ray.put``) into every scan task — the
reference's broadcast-small-side pattern (``index/__init__.py:150-170``).
Scan scoring is one vectorized :func:`query_jaccard_stats` call per batch
(no per-row Python loop), and thresholds are applied as vectorized masks
inside the kernel (no row-lambda ``Dataset.filter``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import EngineConfig, DEFAULT_CONFIG
from ..functions.segscore import _to_bytes_array, query_jaccard_stats
from ..stages.verify import _blob_views, mins_to_blob


def _scan_kernel(batch: pa.Table, q_ref, num: int,
                 min_overlap: int = 0, min_score: float | None = None,
                 score_col: str | None = None,
                 exclude_id: str | None = None) -> pa.Table:
    """Score every signature in the batch against the broadcast query.
    Emits jaccard + containments + overlap hash count per row, with the
    threshold/exclusion masks applied vectorized in-kernel."""
    q = ray.get(q_ref)  # sorted uint64 mins of the query
    blobbed = mins_to_blob(batch)
    offs, data = _blob_views(blobbed["blob"])
    u = data.view(np.uint64)
    so = offs // 8
    c, cj, dj = query_jaccard_stats(q, u, so, num)
    ls = np.diff(so)
    ja = cj / np.maximum(dj, 1)
    cqs = c / max(1, q.size)            # containment of query in subject
    csq = c / np.maximum(ls, 1)         # containment of subject in query
    out = pa.table({
        "match": batch["conv_id"],
        "md5": batch["md5"],
        "jaccard": pa.array(ja, pa.float64()),
        "containment_query": pa.array(cqs, pa.float64()),
        "containment_match": pa.array(csq, pa.float64()),
        "overlap": pa.array(c.astype(np.int64), pa.int64()),
        "n_hashes_match": pa.array(ls.astype(np.int64), pa.int64()),
    })
    mask = np.ones(len(c), bool)
    if min_overlap:
        mask &= c >= min_overlap
    if min_score is not None and score_col is not None:
        mask &= np.asarray(out[score_col]) >= min_score
    if exclude_id is not None:
        import pyarrow.compute as pc

        mask &= np.asarray(
            pc.not_equal(batch["conv_id"].combine_chunks(),
                         pa.scalar(exclude_id)))
    if mask.all():
        return out
    return out.filter(pa.array(mask))


def _query_row(sigs, query_id: str) -> dict:
    rows = sigs.filter(expr=f"conv_id == '{query_id}'").take_all()
    if not rows:
        raise KeyError(f"query {query_id!r} not in collection")
    return rows[0]


def _query_mins(sigs, query_id: str) -> np.ndarray:
    return np.asarray(_query_row(sigs, query_id)["mins"], dtype=np.uint64)


def search(sigs, query_id: str, cfg: EngineConfig = DEFAULT_CONFIG,
           threshold: float = 0.08, containment: bool = False,
           num_results: int | None = None):
    """``sourmash search``: scores sorted desc with md5 tiebreak
    (``index/__init__.py:198-199, 258-270``), optional top-k limit."""
    q = _query_mins(sigs, query_id)
    q_ref = ray.put(q)
    col = "containment_query" if containment else "jaccard"
    hits = sigs.select_columns(["conv_id", "mins", "md5"]).map_batches(
        lambda t: _scan_kernel(t, q_ref, cfg.sketch.num,
                               min_score=threshold, score_col=col,
                               exclude_id=query_id),
        batch_format="pyarrow")
    out = hits.sort([col, "md5"], descending=[True, False])
    if num_results:
        out = out.limit(num_results)
    return out


def prefetch(sigs, query_id: str, cfg: EngineConfig = DEFAULT_CONFIG,
             threshold_hashes: int = 3, estimate_ani: bool = False):
    """``sourmash prefetch``: every subject whose overlap with the query is
    ≥ threshold_hashes (the threshold_bp→hash-count rule,
    ``search.py:15-37``), sorted by overlap desc.

    ``estimate_ani=True`` appends the PrefetchResult ANI family
    (``search.py:367-433``: query/match/max containment ANI +
    potential_false_negative), vectorized per batch."""
    q = _query_mins(sigs, query_id)
    q_ref = ray.put(q)
    hits = sigs.select_columns(["conv_id", "mins", "md5"]).map_batches(
        lambda t: _scan_kernel(t, q_ref, cfg.sketch.num,
                               min_overlap=threshold_hashes,
                               exclude_id=query_id),
        batch_format="pyarrow")
    if estimate_ani:
        ksize = cfg.sketch.ksize
        scaled = max(1, cfg.sketch.scaled)
        q_n = max(1, q.size)

        def _ani(batch: pa.Table) -> pa.Table:
            from ..functions.distance import containment_ani_arrays

            lm = np.maximum(np.asarray(batch["n_hashes_match"]), 1)
            qc = containment_ani_arrays(
                np.asarray(batch["containment_query"]), ksize, scaled,
                np.full(batch.num_rows, q_n * scaled, np.float64))
            mc = containment_ani_arrays(
                np.asarray(batch["containment_match"]), ksize, scaled,
                lm * scaled)
            mxc = containment_ani_arrays(
                np.maximum(np.asarray(batch["containment_query"]),
                           np.asarray(batch["containment_match"])),
                ksize, scaled, np.minimum(q_n, lm) * scaled)
            pfn = ((qc["p_nothing_in_common"] > 1e-3)
                   | (mc["p_nothing_in_common"] > 1e-3))
            for name, arr in [
                    ("query_containment_ani", qc["ani"]),
                    ("match_containment_ani", mc["ani"]),
                    ("average_containment_ani",
                     (qc["ani"] + mc["ani"]) / 2.0),
                    ("max_containment_ani", mxc["ani"]),
            ]:
                batch = batch.append_column(name,
                                            pa.array(arr, pa.float64()))
            return batch.append_column("potential_false_negative",
                                       pa.array(pfn, pa.bool_()))

        hits = hits.map_batches(_ani, batch_format="pyarrow")
    return hits.sort(["overlap", "md5"], descending=[True, False])


_GATHER_FIELDS = [
    ("rank", pa.int64()),
    ("match", pa.string()),
    ("md5", pa.string()),
    ("overlap", pa.int64()),
    ("intersect_bp", pa.int64()),
    ("f_orig_query", pa.float64()),
    ("f_match", pa.float64()),
    ("f_match_orig", pa.float64()),
    ("f_unique_to_query", pa.float64()),
    ("f_unique_weighted", pa.float64()),
    ("average_abund", pa.float64()),
    ("median_abund", pa.float64()),
    ("std_abund", pa.float64()),
    ("unique_intersect_bp", pa.int64()),
    ("remaining_hashes", pa.int64()),
    ("remaining_bp", pa.int64()),
    ("query_name", pa.string()),
    ("query_md5", pa.string()),
    ("query_bp", pa.int64()),
    ("query_n_hashes", pa.int64()),
    ("query_abundance", pa.bool_()),
    ("ksize", pa.int64()),
    ("moltype", pa.string()),
    ("scaled", pa.int64()),
    ("n_unique_weighted_found", pa.float64()),
    ("sum_weighted_found", pa.float64()),
    ("total_weighted_hashes", pa.float64()),
    ("query_containment_ani", pa.float64()),
    ("match_containment_ani", pa.float64()),
    ("average_containment_ani", pa.float64()),
    ("max_containment_ani", pa.float64()),
    ("potential_false_negative", pa.bool_()),
    ("query_containment_ani_low", pa.float64()),
    ("query_containment_ani_high", pa.float64()),
    ("match_containment_ani_low", pa.float64()),
    ("match_containment_ani_high", pa.float64()),
]
GATHER_SCHEMA = pa.schema(_GATHER_FIELDS)


def _gather_candidates(sigs, query_id: str, cfg: EngineConfig,
                       threshold_hashes: int):
    """ONE distributed prefetch scan → candidate rows with their mins
    cached (the CounterGather build, ``index/__init__.py:760-790``: only
    signatures overlapping the query enter the counter)."""
    q = _query_mins(sigs, query_id)
    q_ref = ray.put(q)

    def _keep(batch: pa.Table) -> pa.Table:
        blobbed = mins_to_blob(batch)
        offs, data = _blob_views(blobbed["blob"])
        c, _, _ = query_jaccard_stats(q, data.view(np.uint64), offs // 8, 0)
        import pyarrow.compute as pc

        mask = (c >= threshold_hashes) & np.asarray(
            pc.not_equal(batch["conv_id"].combine_chunks(),
                         pa.scalar(query_id)))
        return batch.filter(pa.array(mask))

    cand = sigs.select_columns(["conv_id", "mins", "md5"]).map_batches(
        _keep, batch_format="pyarrow")
    blocks = [t for t in ray.get(cand.materialize().to_arrow_refs())
              if t.num_rows]
    if not blocks:
        return None, q
    return pa.concat_tables(blocks).combine_chunks(), q


def gather(sigs, query_id: str, cfg: EngineConfig = DEFAULT_CONFIG,
           threshold_hashes: int = 3, max_rounds: int = 50,
           estimate_ani_ci: bool = False):
    """``sourmash gather`` greedy min-set-cov with the CounterGather
    consume/decrement optimization.

    Round structure (``search.py:782-949``, ``index/__init__.py:858-909``):
    pick the candidate with max overlap against the REMAINING query hashes
    (md5 tiebreak), subtract its hashes, then *decrement* every candidate's
    counter by its overlap with the just-found hashes — no rescan of the
    collection, no re-fetch of the winner's mins. Emits the GatherResult
    stats family (``search.py:553-664``): f_orig_query, f_match,
    f_unique_to_query, f_unique_weighted and the abundance moments of the
    query over the newly covered hashes.
    """
    qrow = _query_row(sigs, query_id)
    orig = np.asarray(qrow["mins"], dtype=np.uint64)
    orig_ab = np.asarray(qrow["abunds"], dtype=np.float64) \
        if qrow.get("abunds") is not None else np.ones(orig.size, np.float64)
    orig_size = max(1, orig.size)
    sum_ab = max(orig_ab.sum(), 1.0)

    cand_tbl, _ = _gather_candidates(sigs, query_id, cfg, threshold_hashes)
    if cand_tbl is None:
        return GATHER_SCHEMA.empty_table()
    ids = cand_tbl["match" if "match" in cand_tbl.column_names
                   else "conv_id"].to_pylist()
    md5s = cand_tbl["md5"].to_pylist()
    lst = cand_tbl["mins"].combine_chunks()
    offs = np.asarray(lst.offsets, dtype=np.int64)
    vals = np.asarray(lst.flatten(), dtype=np.uint64)
    ncand = len(ids)
    rows_of_vals = np.repeat(np.arange(ncand, dtype=np.int64),
                             np.diff(offs))
    lens = np.diff(offs)

    # initial counters + f_orig/f_match stats against the ORIGINAL query
    c0, _, _ = query_jaccard_stats(orig, vals, offs, 0)
    counts = c0.copy()
    f_orig = c0 / orig_size
    f_match_orig = c0 / np.maximum(lens, 1)

    from ..functions.distance import containment_to_distance

    ksize = cfg.sketch.ksize
    scaled = max(1, cfg.sketch.scaled)
    query_md5 = str(qrow.get("md5", ""))
    has_abunds = qrow.get("abunds") is not None

    def _cani(containment: float, n_kmers: int):
        """(ani, ani_low, ani_high, p_exceeds) per ``minhash.py:843-879``."""
        res = containment_to_distance(
            float(np.clip(containment, 0.0, 1.0)), ksize, scaled,
            n_unique_kmers=max(1, n_kmers), estimate_ci=estimate_ani_ci)
        return (res.ani, res.ani_low if estimate_ani_ci else None,
                res.ani_high if estimate_ani_ci else None,
                res.p_exceeds_threshold)

    remaining_mask = np.ones(orig.size, bool)
    rows = []
    sum_weighted_found = 0.0
    order_key = np.array(md5s)  # md5 tiebreak, ascending
    for rank in range(max_rounds):
        if int(remaining_mask.sum()) < threshold_hashes:
            break
        best_c = counts.max() if ncand else 0
        if best_c < threshold_hashes:
            break
        tied = np.flatnonzero(counts == best_c)
        w = tied[np.argmin(order_key[tied])]
        # hashes of the winner still in the remaining query = "found"
        seg = vals[offs[w]: offs[w + 1]]
        pos = np.searchsorted(orig, seg)
        posc = np.minimum(pos, orig.size - 1)
        in_orig = (orig[posc] == seg)
        found_idx = posc[in_orig & remaining_mask[posc]]
        newly = orig[found_idx]
        nw_ab = orig_ab[found_idx]
        remaining_mask[found_idx] = False
        n_remaining = int(remaining_mask.sum())
        # ANI family on the ORIG query vs match comparison
        # (search.py:417-427 via minhash.py:843-879)
        q_ani, q_lo, q_hi, q_p = _cani(f_orig[w], orig_size * scaled)
        m_ani, m_lo, m_hi, m_p = _cani(f_match_orig[w],
                                       int(lens[w]) * scaled)
        mx_ani, _, _, mx_p = _cani(max(f_orig[w], f_match_orig[w]),
                                   min(orig_size, int(lens[w])) * scaled)
        nw_sum = float(nw_ab.sum())
        sum_weighted_found += nw_sum
        rows.append({
            "rank": rank,
            "match": ids[w],
            "md5": md5s[w],
            "overlap": int(best_c),
            "intersect_bp": int(c0[w]) * scaled,
            "f_orig_query": float(f_orig[w]),
            # f_match = containment of the match in the REMAINING query
            # (search.py:570-572 gather_comparison); f_match_orig is vs the
            # original query (search.py:566-567)
            "f_match": float(best_c) / max(1, int(lens[w])),
            "f_match_orig": float(f_match_orig[w]),
            "f_unique_to_query": newly.size / orig_size,
            "f_unique_weighted": float(nw_sum / sum_ab),
            "average_abund": float(nw_ab.mean()) if nw_ab.size else 0.0,
            "median_abund": float(np.median(nw_ab)) if nw_ab.size else 0.0,
            "std_abund": float(nw_ab.std()) if nw_ab.size else 0.0,
            "unique_intersect_bp": int(newly.size) * scaled,
            "remaining_hashes": n_remaining,
            "remaining_bp": n_remaining * scaled,
            "query_name": query_id,
            "query_md5": query_md5,
            "query_bp": orig_size * scaled,
            "query_n_hashes": orig_size,
            "query_abundance": has_abunds,
            "ksize": ksize,
            "moltype": cfg.sketch.normalization,
            "scaled": scaled,
            "n_unique_weighted_found": nw_sum,
            "sum_weighted_found": sum_weighted_found,
            "total_weighted_hashes": float(sum_ab),
            "query_containment_ani": q_ani,
            "match_containment_ani": m_ani,
            "average_containment_ani": ((q_ani + m_ani) / 2.0
                                        if q_ani is not None
                                        and m_ani is not None else None),
            "max_containment_ani": mx_ani,
            "potential_false_negative": bool(q_p or m_p or mx_p),
            "query_containment_ani_low": q_lo,
            "query_containment_ani_high": q_hi,
            "match_containment_ani_low": m_lo,
            "match_containment_ani_high": m_hi,
        })
        # consume: decrement every candidate by |cand ∩ newly| — O(total
        # candidate hashes) worst case but one vectorized membership pass
        if newly.size and vals.size:
            p2 = np.searchsorted(newly, vals)
            p2c = np.minimum(p2, newly.size - 1)
            hit = newly[p2c] == vals
            dec = np.bincount(rows_of_vals[hit], minlength=ncand)
            counts = counts - dec
        counts[w] = 0
    if not rows:
        return GATHER_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=GATHER_SCHEMA)


def compare_exact(sigs, cfg: EngineConfig = DEFAULT_CONFIG,
                  ignore_abundance: bool = True,
                  estimate_ani: bool = False):
    """``sourmash compare`` all-pairs (small-n exact mode): sparse
    long-form (a, b, jaccard) for every unordered pair, a < b.

    Implemented as a cross of each block against the broadcast full blob
    table — O(n²/p) per task, parallel over blocks, one vectorized
    :func:`pair_jaccard_stats` call per block; for large n use the LSH
    pipeline instead (``compare.py:241-325`` replaced the same way the
    multiprocessing pool replaced the serial loop).
    """
    from ..functions.segscore import pair_jaccard_stats

    blobs = sigs.select_columns(["conv_id", "mins"]).map_batches(
        mins_to_blob, batch_format="pyarrow").materialize()
    blob_tbl = pa.concat_tables(
        [t for t in ray.get(blobs.to_arrow_refs()) if t.num_rows]
    ).combine_chunks()
    ref = ray.put(blob_tbl)
    num = cfg.sketch.num

    def _cross(batch: pa.Table) -> pa.Table:
        full = ray.get(ref)
        f_offs, f_data = _blob_views(full["blob"])
        fu = f_data.view(np.uint64)
        fo = f_offs // 8
        f_ids = _to_bytes_array(full["conv_id"])
        b_offs, b_data = _blob_views(mins_to_blob(batch)["blob"])
        bu = b_data.view(np.uint64)
        bo = b_offs // 8
        b_ids = _to_bytes_array(batch["conv_id"])
        nb, nf = len(b_ids), len(f_ids)
        bi = np.repeat(np.arange(nb, dtype=np.int64), nf)
        fi = np.tile(np.arange(nf, dtype=np.int64), nb)
        w = max(b_ids.dtype.itemsize, f_ids.dtype.itemsize, 1)
        keep = b_ids.astype(f"S{w}")[bi] < f_ids.astype(f"S{w}")[fi]
        bi, fi = bi[keep], fi[keep]
        # gather both sides' segments contiguously, one kernel call
        lb = (bo[bi + 1] - bo[bi])
        lf = (fo[fi + 1] - fo[fi])
        from ..functions.segscore import _local_idx

        a_vals = bu[np.repeat(bo[bi], lb) + _local_idx(lb)]
        b_vals = fu[np.repeat(fo[fi], lf) + _local_idx(lf)]
        ao = np.concatenate([[0], np.cumsum(lb)]).astype(np.int64)
        bo2 = np.concatenate([[0], np.cumsum(lf)]).astype(np.int64)
        _, cj, dj = pair_jaccard_stats(a_vals, ao, b_vals, bo2, num)
        ja = cj / np.maximum(dj, 1)
        b_col = batch["conv_id"].combine_chunks().take(
            pa.array(bi, pa.int64()))
        f_col = full["conv_id"].combine_chunks().take(
            pa.array(fi, pa.int64()))
        out = pa.table({
            "a": b_col,
            "b": f_col,
            "jaccard": pa.array(ja, pa.float64()),
        })
        if estimate_ani:
            # `compare --estimate-ani` (commands.py:717-756): jaccard→ANI
            # point estimate per pair, n_kmers from the smaller sketch
            ksize = cfg.sketch.ksize
            scaled = max(1, cfg.sketch.scaled)
            with np.errstate(invalid="ignore"):
                d = 1.0 - np.power(
                    2.0 * ja / np.maximum(1.0 + ja, 1e-300), 1.0 / ksize)
            d = np.where(ja <= 0, 1.0, np.where(ja >= 1, 0.0, d))
            out = out.append_column("ani", pa.array(1.0 - d, pa.float64()))
        return out

    return sigs.select_columns(["conv_id", "mins"]).map_batches(
        _cross, batch_format="pyarrow")


CATEGORIZE_SCHEMA = pa.schema([
    ("query", pa.string()),
    ("match", pa.string()),
    ("similarity", pa.float64()),
])


def categorize(query_sigs, ref_sigs, cfg: EngineConfig = DEFAULT_CONFIG,
               threshold: float = 0.08):
    """``sourmash categorize`` (``commands.py:758-833``): for EVERY query
    signature, the best-jaccard reference match above ``threshold``,
    self-matches excluded by md5 identity. One row per query that has a
    match; ties broken by match md5 then id (the reference's sort is
    similarity-only — this adds a deterministic tiebreak).

    Scale shape: the reference collection is broadcast once (sorted blob
    arrays via one remote build task); each query batch scores all refs
    with one vectorized :func:`query_jaccard_stats` call per query row —
    the same per-query cost the reference's linear ``db.find`` pays,
    distributed over query batches."""
    from ..stages.verify import _blob_views, mins_to_blob

    def _blob_with_md5(batch: pa.Table) -> pa.Table:
        return mins_to_blob(batch).append_column("md5", batch["md5"])

    blobs = ref_sigs.select_columns(["conv_id", "mins", "md5"]).map_batches(
        _blob_with_md5, batch_format="pyarrow")

    @ray.remote
    def _build(*blocks):
        from ..functions.segscore import _to_bytes_array

        tables = [t for t in blocks if t.num_rows]
        tbl = pa.concat_tables(tables).combine_chunks()
        md5s = _to_bytes_array(tbl["md5"])
        ids = _to_bytes_array(tbl["conv_id"])
        order = np.lexsort((ids, md5s))
        tbl = tbl.take(pa.array(order, pa.int64()))
        offs, data = _blob_views(tbl["blob"])
        return ids[order], md5s[order], offs.copy(), data.copy()

    import ray.data as _rd

    refs = blobs.to_arrow_refs()
    if not refs:
        return _rd.from_arrow(CATEGORIZE_SCHEMA.empty_table())
    built = _build.remote(*refs)
    num = cfg.sketch.num

    def _best(batch: pa.Table) -> pa.Table:
        ids_r, md5_r, offs_r, data_r = ray.get(built)
        u = data_r.view(np.uint64)
        so = offs_r // 8
        q_ids, q_md5s, rows = [], [], []
        qb = mins_to_blob(batch)
        q_offs, q_data = _blob_views(qb["blob"])
        qu = q_data.view(np.uint64)
        qo = q_offs // 8
        for i in range(batch.num_rows):
            q = qu[qo[i]:qo[i + 1]]
            c, cj, dj = query_jaccard_stats(q, u, so, num)
            sim = cj / np.maximum(dj, 1)
            q_md5 = batch["md5"][i].as_py().encode("utf-8")
            mask = (sim >= threshold) & (md5_r != q_md5)
            if not mask.any():
                continue
            cand = np.flatnonzero(mask)
            best = cand[np.argmax(sim[cand])]
            rows.append({
                "query": batch["conv_id"][i].as_py(),
                "match": ids_r[best].decode("utf-8"),
                "similarity": float(sim[best]),
            })
        if not rows:
            return CATEGORIZE_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=CATEGORIZE_SCHEMA)

    return query_sigs.select_columns(["conv_id", "mins", "md5"]).map_batches(
        _best, batch_format="pyarrow")

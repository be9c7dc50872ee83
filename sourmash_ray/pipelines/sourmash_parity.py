"""Capability-parity pipelines: search / prefetch / gather / compare.

The reference's four query entry points re-expressed over the signatures
Dataset (SURVEY.md §3):

- ``search``: one query signature vs a collection, jaccard/containment ≥
  threshold, sorted desc (``/root/reference/src/sourmash/commands.py:606-756``,
  ``search.py:90-169`` JaccardSearch protocol).
- ``prefetch``: containment scan keeping every match above a hash-count
  threshold (``commands.py:1494-1720``, ``index/__init__.py:241-256``).
- ``gather``: greedy min-set-cov — iteratively take the best-containment
  match, subtract its hashes, repeat (``search.py:755-949``,
  ``commands.py:960-1048``). Sequential by nature (SURVEY.md §7.5 item 3):
  a driver loop, each round a distributed scan.
- ``compare``: all-pairs similarity matrix in sparse long form
  (``compare.py:14-64`` serial semantics; the dense n×n matrix of the
  reference is replaced by (a, b, similarity) rows).

The query sketch is broadcast (``ray.put``) into every scan task — the
reference's broadcast-small-side pattern (``index/__init__.py:150-170``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import EngineConfig, DEFAULT_CONFIG
from ..stages.verify import _blob_views, mins_to_blob


def _scan_kernel(batch: pa.Table, q_ref, num: int) -> pa.Table:
    """Score every signature in the batch against the broadcast query.
    Emits jaccard + containments + overlap hash count per row."""
    q = ray.get(q_ref)  # sorted uint64 mins of the query
    blobbed = mins_to_blob(batch)
    offs, data = _blob_views(blobbed["blob"])
    u = data.view(np.uint64)
    n = batch.num_rows
    ja = np.empty(n, np.float64)
    cqs = np.empty(n, np.float64)  # containment of query in subject
    csq = np.empty(n, np.float64)  # containment of subject in query
    ov = np.empty(n, np.int64)
    for i in range(n):
        s = u[offs[i] // 8: offs[i + 1] // 8]
        common = np.intersect1d(q, s, assume_unique=True)
        c = common.size
        if num:
            combined = np.union1d(q, s)[:num]
            cc = np.intersect1d(common, combined, assume_unique=True).size
            denom = combined.size
        else:
            cc = c
            denom = q.size + s.size - c
        ja[i] = cc / max(1, denom)
        cqs[i] = c / max(1, q.size)
        csq[i] = c / max(1, s.size)
        ov[i] = c
    return pa.table({
        "match": batch["conv_id"],
        "md5": batch["md5"],
        "jaccard": pa.array(ja, pa.float64()),
        "containment_query": pa.array(cqs, pa.float64()),
        "containment_match": pa.array(csq, pa.float64()),
        "overlap": pa.array(ov, pa.int64()),
    })


def _query_mins(sigs, query_id: str) -> np.ndarray:
    rows = sigs.filter(expr=f"conv_id == '{query_id}'").take_all()
    if not rows:
        raise KeyError(f"query {query_id!r} not in collection")
    return np.asarray(rows[0]["mins"], dtype=np.uint64)


def search(sigs, query_id: str, cfg: EngineConfig = DEFAULT_CONFIG,
           threshold: float = 0.08, containment: bool = False,
           num_results: int | None = None):
    """``sourmash search``: scores sorted desc with md5 tiebreak
    (``index/__init__.py:198-199, 258-270``), optional top-k limit."""
    q = _query_mins(sigs, query_id)
    q_ref = ray.put(q)
    scored = sigs.select_columns(["conv_id", "mins", "md5"]).map_batches(
        lambda t: _scan_kernel(t, q_ref, cfg.sketch.num),
        batch_format="pyarrow")
    col = "containment_query" if containment else "jaccard"
    hits = scored.filter(
        lambda r: r[col] >= threshold and r["match"] != query_id)
    out = hits.sort([col, "md5"], descending=[True, False])
    if num_results:
        out = out.limit(num_results)
    return out


def prefetch(sigs, query_id: str, cfg: EngineConfig = DEFAULT_CONFIG,
             threshold_hashes: int = 3):
    """``sourmash prefetch``: every subject whose overlap with the query is
    ≥ threshold_hashes (the threshold_bp→hash-count rule,
    ``search.py:15-37``), sorted by overlap desc."""
    q = _query_mins(sigs, query_id)
    q_ref = ray.put(q)
    scored = sigs.select_columns(["conv_id", "mins", "md5"]).map_batches(
        lambda t: _scan_kernel(t, q_ref, cfg.sketch.num),
        batch_format="pyarrow")
    hits = scored.filter(
        lambda r: r["overlap"] >= threshold_hashes and r["match"] != query_id)
    return hits.sort(["overlap", "md5"], descending=[True, False])


def gather(sigs, query_id: str, cfg: EngineConfig = DEFAULT_CONFIG,
           threshold_hashes: int = 3, max_rounds: int = 50):
    """``sourmash gather`` greedy min-set-cov, driver-looped.

    Each round scans the collection for max overlap with the REMAINING
    query hashes, emits the best match (md5 tiebreak), subtracts its
    hashes, repeats until overlap < threshold (``search.py:782-949``).
    Returns a pyarrow Table of rounds:
    (rank, match, overlap, f_unique_to_query, remaining_hashes).
    """
    remaining = _query_mins(sigs, query_id)
    orig_size = max(1, remaining.size)
    scan = sigs.select_columns(["conv_id", "mins", "md5"]).materialize()
    rows = []
    for rank in range(max_rounds):
        if remaining.size < threshold_hashes:
            break
        q_ref = ray.put(remaining)
        scored = scan.map_batches(
            lambda t, qr=q_ref: _scan_kernel(t, qr, cfg.sketch.num),
            batch_format="pyarrow")
        best = scored.filter(
            lambda r: r["match"] != query_id).sort(
            ["overlap", "md5"], descending=[True, False]).limit(1).take_all()
        if not best or best[0]["overlap"] < threshold_hashes:
            break
        b = best[0]
        match_mins = np.asarray(
            scan.filter(expr=f"conv_id == '{b['match']}'").take_all()[0]
            ["mins"], dtype=np.uint64)
        newly = np.intersect1d(remaining, match_mins, assume_unique=True)
        remaining = np.setdiff1d(remaining, match_mins, assume_unique=True)
        rows.append({
            "rank": rank,
            "match": b["match"],
            "overlap": int(b["overlap"]),
            "f_unique_to_query": newly.size / orig_size,
            "remaining_hashes": int(remaining.size),
        })
    if not rows:
        return pa.table({"rank": pa.array([], pa.int64()),
                         "match": pa.array([], pa.string()),
                         "overlap": pa.array([], pa.int64()),
                         "f_unique_to_query": pa.array([], pa.float64()),
                         "remaining_hashes": pa.array([], pa.int64())})
    return pa.Table.from_pylist(rows)


def compare_exact(sigs, cfg: EngineConfig = DEFAULT_CONFIG,
                  ignore_abundance: bool = True):
    """``sourmash compare`` all-pairs (small-n exact mode): sparse
    long-form (a, b, jaccard) for every unordered pair, a < b.

    Implemented as a cross of each block against the broadcast full blob
    table — O(n²/p) per task, parallel over blocks; for large n use the
    LSH pipeline instead (``compare.py:241-325`` replaced the same way the
    multiprocessing pool replaced the serial loop).
    """
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
        f_ids = full["conv_id"].to_pylist()
        b_offs, b_data = _blob_views(
            mins_to_blob(batch)["blob"])
        bu = b_data.view(np.uint64)
        b_ids = batch["conv_id"].to_pylist()
        a_out, b_out, j_out = [], [], []
        for i, aid in enumerate(b_ids):
            a = bu[b_offs[i] // 8: b_offs[i + 1] // 8]
            for j, bid in enumerate(f_ids):
                if not aid < bid:
                    continue
                s = fu[f_offs[j] // 8: f_offs[j + 1] // 8]
                common = np.intersect1d(a, s, assume_unique=True)
                if num:
                    combined = np.union1d(a, s)[:num]
                    c = np.intersect1d(common, combined,
                                       assume_unique=True).size
                    denom = combined.size
                else:
                    c = common.size
                    denom = a.size + s.size - c
                a_out.append(aid)
                b_out.append(bid)
                j_out.append(c / max(1, denom))
        return pa.table({
            "a": pa.array(a_out, pa.string()),
            "b": pa.array(b_out, pa.string()),
            "jaccard": pa.array(j_out, pa.float64()),
        })

    return sigs.select_columns(["conv_id", "mins"]).map_batches(
        _cross, batch_format="pyarrow")

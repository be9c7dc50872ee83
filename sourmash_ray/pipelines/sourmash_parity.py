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


class _LocalCounters:
    """CounterGather state over ONE candidate table: per-candidate overlap
    counters vs the remaining query, md5 tiebreak, consume/decrement
    (``index/__init__.py:735-909`` semantics). Pure numpy — runs in-process
    (multigather per-query tasks) or inside a :class:`_CounterShard`
    actor (single-query gather), so candidate mins NEVER land on the
    driver; only each round's winner segment does."""

    def __init__(self, orig: np.ndarray, cand_tbl: pa.Table):
        self.n = cand_tbl.num_rows
        if self.n == 0:
            return
        self.ids = cand_tbl["conv_id"].combine_chunks()
        self.md5s = _to_bytes_array(cand_tbl["md5"])
        lst = cand_tbl["mins"].combine_chunks()
        self.offs = np.asarray(lst.offsets, dtype=np.int64)
        self.vals = np.asarray(lst.flatten(), dtype=np.uint64)
        self.lens = np.diff(self.offs)
        self.rows_of_vals = np.repeat(np.arange(self.n, dtype=np.int64),
                                      self.lens)
        c0, _, _ = query_jaccard_stats(orig, self.vals, self.offs, 0)
        self.c0 = c0.astype(np.int64)
        self.counts = self.c0.copy()

    def peek(self):
        """(best remaining count, winner md5 bytes) or None if exhausted."""
        if self.n == 0:
            return None
        best_c = int(self.counts.max())
        if best_c <= 0:
            return None
        tied = np.flatnonzero(self.counts == best_c)
        w = tied[np.argmin(self.md5s[tied])]
        return best_c, bytes(self.md5s[w])

    def take_winner(self):
        """Pop the current local winner: mark consumed (-1 — never re-picked
        even at threshold 0, cf. ADVICE r2) and return its row context +
        mins segment (the ONLY mins bytes that leave this store)."""
        best_c = int(self.counts.max())
        tied = np.flatnonzero(self.counts == best_c)
        w = int(tied[np.argmin(self.md5s[tied])])
        seg = self.vals[self.offs[w]: self.offs[w + 1]].copy()
        self.counts[w] = -1
        return {
            "id": self.ids[w].as_py(),
            "md5": self.md5s[w].decode(),
            "overlap": best_c,
            "c0": int(self.c0[w]),
            "len": int(self.lens[w]),
            "mins": seg,
        }

    def consume(self, newly: np.ndarray) -> None:
        """Decrement every candidate by |cand ∩ newly| — one vectorized
        membership pass, O(local candidate hashes)."""
        if self.n == 0 or newly.size == 0 or self.vals.size == 0:
            return
        p2 = np.searchsorted(newly, self.vals)
        p2c = np.minimum(p2, newly.size - 1)
        hit = newly[p2c] == self.vals
        dec = np.bincount(self.rows_of_vals[hit], minlength=self.n)
        self.counts -= dec.astype(np.int64)


@ray.remote
class _CounterShard:
    """Actor wrapper holding one shard of the candidate set: ids/md5s/mins
    stay in the actor's heap; the driver sees only (count, md5) peeks and
    the per-round winner segment."""

    def __init__(self, orig_ref, *blocks):
        tables = [t for t in blocks if t.num_rows]
        tbl = (pa.concat_tables(tables).combine_chunks() if tables
               else pa.schema([("conv_id", pa.string()),
                               ("mins", pa.list_(pa.uint64())),
                               ("md5", pa.string())]).empty_table())
        self.store = _LocalCounters(np.asarray(orig_ref, np.uint64), tbl)

    def peek(self):
        return self.store.peek()

    def take_winner(self):
        return self.store.take_winner()

    def consume(self, newly) -> None:
        self.store.consume(np.asarray(newly, np.uint64))


def _candidate_scan(sigs, query_id: str, q: np.ndarray, min_keep: int):
    """ONE distributed prefetch scan → candidate Dataset (conv_id, mins,
    md5) of signatures overlapping the query by ≥ ``min_keep`` hashes (the
    CounterGather build, ``index/__init__.py:760-790``). Returns the
    MATERIALIZED Dataset — block refs only, never collected."""
    q_ref = ray.put(q)

    def _keep(batch: pa.Table) -> pa.Table:
        blobbed = mins_to_blob(batch)
        offs, data = _blob_views(blobbed["blob"])
        qq = ray.get(q_ref)
        c, _, _ = query_jaccard_stats(qq, data.view(np.uint64),
                                      offs // 8, 0)
        import pyarrow.compute as pc

        mask = (c >= min_keep) & np.asarray(
            pc.not_equal(batch["conv_id"].combine_chunks(),
                         pa.scalar(query_id)))
        return batch.filter(pa.array(mask))

    return sigs.select_columns(["conv_id", "mins", "md5"]).map_batches(
        _keep, batch_format="pyarrow").materialize()


def _greedy_rounds(stores, remote: bool, qctx: dict, cfg: EngineConfig,
                   threshold_hashes: int, max_rounds: int,
                   estimate_ani_ci: bool) -> list[dict]:
    """The gather round loop over a list of counter stores
    (``search.py:782-949``, ``index/__init__.py:858-909``): pick the
    global max-overlap candidate (md5 tiebreak) from per-store peeks,
    subtract its hashes from the remaining query, then broadcast the
    newly-covered hashes so every store decrements — no rescan of the
    collection, no re-fetch of anything but the winner's mins.

    ``remote=True``: stores are :class:`_CounterShard` actors — peeks and
    winner fetches are small RPCs, candidate mins stay sharded in actor
    heaps. ``remote=False``: one in-process :class:`_LocalCounters` (the
    multigather per-query task path)."""
    from ..functions.distance import containment_to_distance

    orig = qctx["orig"]
    orig_ab = qctx["orig_ab"]
    orig_size = max(1, orig.size)
    sum_ab = max(orig_ab.sum(), 1.0)
    ksize = cfg.sketch.ksize
    scaled = max(1, cfg.sketch.scaled)
    # threshold 0 still requires ≥1 remaining overlap per round — a
    # consumed/zero-overlap candidate is never re-picked (ADVICE r2)
    thr = max(1, threshold_hashes)

    def _cani(containment: float, n_kmers: int):
        """(ani, ani_low, ani_high, p_exceeds) per ``minhash.py:843-879``."""
        res = containment_to_distance(
            float(np.clip(containment, 0.0, 1.0)), ksize, scaled,
            n_unique_kmers=max(1, n_kmers), estimate_ci=estimate_ani_ci)
        return (res.ani, res.ani_low if estimate_ani_ci else None,
                res.ani_high if estimate_ani_ci else None,
                res.p_exceeds_threshold)

    remaining_mask = np.ones(orig.size, bool)
    rows: list[dict] = []
    sum_weighted_found = 0.0
    for rank in range(max_rounds):
        if int(remaining_mask.sum()) < thr:
            break
        peeks = (ray.get([s.peek.remote() for s in stores]) if remote
                 else [s.peek() for s in stores])
        best = None  # (count, md5_bytes, store_idx); max count, min md5
        for si, p in enumerate(peeks):
            if p is None:
                continue
            c, md5b = p
            if best is None or c > best[0] or (c == best[0]
                                               and md5b < best[1]):
                best = (c, md5b, si)
        if best is None or best[0] < thr:
            break
        win = (ray.get(stores[best[2]].take_winner.remote()) if remote
               else stores[best[2]].take_winner())
        best_c = win["overlap"]
        # hashes of the winner still in the remaining query = "found"
        seg = win["mins"]
        pos = np.searchsorted(orig, seg)
        posc = np.minimum(pos, orig.size - 1)
        in_orig = (orig[posc] == seg)
        found_idx = posc[in_orig & remaining_mask[posc]]
        newly = orig[found_idx]
        nw_ab = orig_ab[found_idx]
        remaining_mask[found_idx] = False
        n_remaining = int(remaining_mask.sum())
        f_orig = win["c0"] / orig_size
        f_match_orig = win["c0"] / max(1, win["len"])
        # ANI family on the ORIG query vs match comparison
        # (search.py:417-427 via minhash.py:843-879)
        q_ani, q_lo, q_hi, q_p = _cani(f_orig, orig_size * scaled)
        m_ani, m_lo, m_hi, m_p = _cani(f_match_orig, win["len"] * scaled)
        mx_ani, _, _, mx_p = _cani(max(f_orig, f_match_orig),
                                   min(orig_size, win["len"]) * scaled)
        nw_sum = float(nw_ab.sum())
        sum_weighted_found += nw_sum
        rows.append({
            "rank": rank,
            "match": win["id"],
            "md5": win["md5"],
            "overlap": int(best_c),
            "intersect_bp": win["c0"] * scaled,
            "f_orig_query": float(f_orig),
            # f_match = containment of the match in the REMAINING query
            # (search.py:570-572 gather_comparison); f_match_orig is vs the
            # original query (search.py:566-567)
            "f_match": float(best_c) / max(1, win["len"]),
            "f_match_orig": float(f_match_orig),
            "f_unique_to_query": newly.size / orig_size,
            "f_unique_weighted": float(nw_sum / sum_ab),
            "average_abund": float(nw_ab.mean()) if nw_ab.size else 0.0,
            "median_abund": float(np.median(nw_ab)) if nw_ab.size else 0.0,
            "std_abund": float(nw_ab.std()) if nw_ab.size else 0.0,
            "unique_intersect_bp": int(newly.size) * scaled,
            "remaining_hashes": n_remaining,
            "remaining_bp": n_remaining * scaled,
            "query_name": qctx["query_id"],
            "query_md5": qctx["query_md5"],
            "query_bp": orig_size * scaled,
            "query_n_hashes": orig_size,
            "query_abundance": qctx["has_abunds"],
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
        # consume: every store decrements by |cand ∩ newly| in one
        # vectorized membership pass (broadcast the newly-covered hashes
        # once via the object store on the actor path)
        if newly.size:
            if remote:
                newly_ref = ray.put(newly)
                ray.get([s.consume.remote(newly_ref) for s in stores])
            else:
                for s in stores:
                    s.consume(newly)
    return rows


def _qctx(qrow: dict) -> dict:
    orig = np.asarray(qrow["mins"], dtype=np.uint64)
    has_abunds = qrow.get("abunds") is not None
    orig_ab = (np.asarray(qrow["abunds"], dtype=np.float64) if has_abunds
               else np.ones(orig.size, np.float64))
    return {"orig": orig, "orig_ab": orig_ab,
            "query_id": qrow["conv_id"], "query_md5": str(qrow.get("md5",
                                                                   "")),
            "has_abunds": has_abunds}


def gather(sigs, query_id: str, cfg: EngineConfig = DEFAULT_CONFIG,
           threshold_hashes: int = 3, max_rounds: int = 50,
           estimate_ani_ci: bool = False):
    """``sourmash gather`` greedy min-set-cov with the CounterGather
    consume/decrement optimization, candidate state DISTRIBUTED: the
    prefetch scan's blocks feed a pool of :class:`_CounterShard` actors
    (candidate ids/md5s/mins live in actor heaps, never on the driver);
    each round the driver sees only per-shard (count, md5) peeks and the
    winner's mins segment. Emits the GatherResult stats family
    (``search.py:553-664``)."""
    from ..config import resolve_num_partitions

    qrow = _query_row(sigs, query_id)
    ctx = _qctx(qrow)

    cand = _candidate_scan(sigs, query_id, ctx["orig"],
                           max(1, threshold_hashes))
    refs = cand.to_arrow_refs()
    if not refs:
        return GATHER_SCHEMA.empty_table()
    orig_ref = ray.put(ctx["orig"])
    n_shards = max(1, min(len(refs), resolve_num_partitions(cfg)))
    groups = [refs[i::n_shards] for i in range(n_shards)]
    shards = [_CounterShard.remote(orig_ref, *g) for g in groups if g]
    try:
        rows = _greedy_rounds(shards, True, ctx, cfg, threshold_hashes,
                              max_rounds, estimate_ani_ci)
    finally:
        for s in shards:
            ray.kill(s)
    if not rows:
        return GATHER_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=GATHER_SCHEMA)


@ray.remote
def _multigather_one(qidx: int, qrow: dict, cfg: EngineConfig,
                     threshold_hashes: int, max_rounds: int,
                     estimate_ani_ci: bool, *blocks) -> pa.Table:
    """One query's greedy rounds over its slice of the shared candidate
    blocks — runs entirely inside this task (plain numpy/Arrow, no nested
    Dataset work)."""
    import pyarrow.compute as pc

    parts = [t.filter(pc.equal(t["qidx"], pa.scalar(qidx, pa.int32())))
             for t in blocks if t.num_rows]
    parts = [t for t in parts if t.num_rows]
    if not parts:
        return GATHER_SCHEMA.empty_table()
    tbl = pa.concat_tables(parts).combine_chunks()
    ctx = _qctx(qrow)
    store = _LocalCounters(ctx["orig"], tbl)
    rows = _greedy_rounds([store], False, ctx, cfg, threshold_hashes,
                          max_rounds, estimate_ani_ci)
    if not rows:
        return GATHER_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=GATHER_SCHEMA)


def multigather(sigs, query_ids: list[str],
                cfg: EngineConfig = DEFAULT_CONFIG,
                threshold_hashes: int = 3, max_rounds: int = 50,
                estimate_ani_ci: bool = False) -> pa.Table:
    """``sourmash multigather`` (``commands.py:1124-1388``): gather every
    query against the collection. ONE distributed scan scores each
    signature batch against ALL queries (vectorized per query) and emits
    qidx-tagged candidate rows; the greedy rounds then run QUERY-PARALLEL
    as one remote task per query over the shared candidate blocks.
    Returns the concatenated GatherResult rows ordered by
    (query_name, rank) — per-query output identical to N single gathers
    (equivalence test in tests/test_parity_ops.py)."""
    # fetch the Q query rows in one pass (Q is small; rows carry mins)
    import pyarrow.compute as pc

    qrows: dict[str, dict] = {}

    wanted = set(query_ids)

    def _pick(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch["conv_id"],
                        value_set=pa.array(sorted(wanted), pa.string()))
        return batch.filter(mask)

    for r in sigs.map_batches(_pick, batch_format="pyarrow").take_all():
        qrows[r["conv_id"]] = r
    missing = [q for q in query_ids if q not in qrows]
    if missing:
        raise KeyError(f"queries not in collection: {missing!r}")

    min_keep = max(1, threshold_hashes)
    q_list = [(qid, np.asarray(qrows[qid]["mins"], np.uint64))
              for qid in query_ids]
    q_ref = ray.put(q_list)

    def _keep_multi(batch: pa.Table) -> pa.Table:
        blobbed = mins_to_blob(batch)
        offs, data = _blob_views(blobbed["blob"])
        u = data.view(np.uint64)
        so = offs // 8
        outs = []
        for qi, (qid, qmins) in enumerate(ray.get(q_ref)):
            c, _, _ = query_jaccard_stats(qmins, u, so, 0)
            mask = (c >= min_keep) & np.asarray(
                pc.not_equal(batch["conv_id"].combine_chunks(),
                             pa.scalar(qid)))
            if not mask.any():
                continue
            sub = batch.filter(pa.array(mask))
            outs.append(sub.append_column(
                "qidx", pa.array(np.full(sub.num_rows, qi, np.int32))))
        if not outs:
            return batch.schema.append(
                pa.field("qidx", pa.int32())).empty_table()
        return pa.concat_tables(outs)

    cand = sigs.select_columns(["conv_id", "mins", "md5"]).map_batches(
        _keep_multi, batch_format="pyarrow").materialize()
    refs = cand.to_arrow_refs()
    if not refs:
        return GATHER_SCHEMA.empty_table()
    futs = [_multigather_one.remote(qi, dict(qrows[qid]), cfg,
                                    threshold_hashes, max_rounds,
                                    estimate_ani_ci, *refs)
            for qi, (qid, _) in enumerate(q_list)]
    tables = [t for t in ray.get(futs) if t.num_rows]
    if not tables:
        return GATHER_SCHEMA.empty_table()
    return pa.concat_tables(tables).sort_by(
        [("query_name", "ascending"), ("rank", "ascending")])


def compare_exact(sigs, cfg: EngineConfig = DEFAULT_CONFIG,
                  ignore_abundance: bool = True,
                  estimate_ani: bool = False,
                  metric: str = "jaccard"):
    """``sourmash compare`` all-pairs (small-n exact mode): sparse
    long-form rows for every unordered pair, a < b.

    ``metric`` selects the matrix variant (``compare.py:67-187`` /
    CLI ``commands.py:113-122``):

    - ``"jaccard"`` (default): (a, b, jaccard [, ani])
    - ``"containment"``: (a, b, containment_ab, containment_ba) — the
      asymmetric matrix in sparse form (``matrix[i][j] = c(j in i)``
      reconstructable from the two columns)
    - ``"max_containment"`` / ``"avg_containment"``: (a, b, <metric>)

    Implemented as a cross of each block against the broadcast full blob
    table — O(n²/p) per task, parallel over blocks, one vectorized
    :func:`pair_jaccard_stats` call per block; for large n use the LSH
    pipeline instead (``compare.py:241-325`` replaced the same way the
    multiprocessing pool replaced the serial loop).
    """
    from ..functions.segscore import pair_jaccard_stats

    if metric not in ("jaccard", "containment", "max_containment",
                      "avg_containment"):
        raise ValueError(f"unknown compare metric {metric!r}")
    if metric != "jaccard" and cfg.sketch.num:
        # containment needs scaled sketches (compare.py:95-100 check)
        raise ValueError("containment metrics require scaled sketches, "
                         "not num (bottom-k)")

    blobs = sigs.select_columns(["conv_id", "mins"]).map_batches(
        mins_to_blob, batch_format="pyarrow").materialize()
    blob_blocks = [t for t in ray.get(blobs.to_arrow_refs())
                   if t.num_rows]
    if not blob_blocks:  # 0-signature input: no pairs
        from ray.data import from_arrow

        return from_arrow(pa.table(
            {"a": pa.array([], pa.string()),
             "b": pa.array([], pa.string()),
             "jaccard": pa.array([], pa.float64())}))
    blob_tbl = pa.concat_tables(blob_blocks).combine_chunks()
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
        c, cj, dj = pair_jaccard_stats(a_vals, ao, b_vals, bo2, num)
        ja = cj / np.maximum(dj, 1)
        b_col = batch["conv_id"].combine_chunks().take(
            pa.array(bi, pa.int64()))
        f_col = full["conv_id"].combine_chunks().take(
            pa.array(fi, pa.int64()))
        if metric != "jaccard":
            cab = c / np.maximum(lb, 1)   # containment of a in b's terms:
            cba = c / np.maximum(lf, 1)   # |a∩b|/|a| and |a∩b|/|b|
            cols: dict = {"a": b_col, "b": f_col}
            if metric == "containment":
                cols["containment_ab"] = pa.array(cab, pa.float64())
                cols["containment_ba"] = pa.array(cba, pa.float64())
            elif metric == "max_containment":
                cols["max_containment"] = pa.array(
                    np.maximum(cab, cba), pa.float64())
            else:
                cols["avg_containment"] = pa.array(
                    (cab + cba) / 2.0, pa.float64())
            return pa.table(cols)
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


def watch_stream(records, sigs, cfg: EngineConfig = DEFAULT_CONFIG,
                 threshold: float = 0.05, watermark: int = 1000):
    """``sourmash watch`` (``/root/reference/src/sourmash/commands.py:
    1389-1471``): build one signature INCREMENTALLY from a serial record
    stream (the reference reads FASTA/FASTQ from stdin) and every
    ``watermark`` records run a best-only threshold search over the
    collection, stopping at the first hit.

    Shape: the stream is inherently serial, so the accumulating sketch
    state lives on the driver exactly like the reference's streaming
    MinHash ``E`` — retention (scaled filter / bottom-num truncation) is
    applied after every record, so driver memory is the SKETCH size, not
    the stream size. Each periodic search is the engine's distributed
    broadcast scan (one Dataset pass, ``tree.search`` best-only
    analogue). Returns ``{n_records, found, best_id, best_score,
    n_mins}``; ``found`` is False if the stream ends without a hit (a
    final search still runs, like the reference's post-loop search)."""
    from ..functions.sketch import build_sketch, normalize_text, \
        shingle_hashes

    p = cfg.sketch
    mins = np.empty(0, np.uint64)

    def _best():
        if mins.size == 0:
            return None
        q_ref = ray.put(mins)
        hits = sigs.select_columns(["conv_id", "mins", "md5"]).map_batches(
            lambda t: _scan_kernel(t, q_ref, p.num, min_score=threshold,
                                   score_col="jaccard"),
            batch_format="pyarrow")
        rows = hits.sort(["jaccard", "md5"],
                         descending=[True, False]).limit(1).take_all()
        return rows[0] if rows else None

    n = 0
    best = None
    searched_at = -1
    for rec in records:
        data = normalize_text(rec, p.normalization)
        new, _, _ = build_sketch(shingle_hashes(data, p.ksize, p.seed), p)
        mins = np.unique(np.concatenate([mins, new]))
        if p.num:
            mins = mins[:p.num]
        n += 1
        if n % watermark == 0:
            best = _best()
            searched_at = n
            if best is not None:
                break
    else:
        if searched_at != n:    # post-loop search unless just searched
            best = _best()
    return {
        "n_records": n,
        "found": best is not None,
        "best_id": best["match"] if best else None,
        "best_score": float(best["jaccard"]) if best else 0.0,
        "n_mins": int(mins.size),
    }


def watch_dataset(ds, sigs, column: str = "text",
                  cfg: EngineConfig = DEFAULT_CONFIG,
                  threshold: float = 0.05, watermark: int = 1000,
                  sort_by: str | None = None):
    """:func:`watch_stream` over a Ray ``Dataset`` source — the stream is
    consumed through ``iter_batches`` (streaming execution with
    backpressure; blocks are fetched as the serial loop drains them, the
    corpus is never materialized). ``sort_by`` optionally imposes a
    deterministic record order first (a real stream is already ordered;
    an unordered Parquet directory is not)."""
    if sort_by is not None:
        ds = ds.sort(sort_by)

    def _records():
        for b in ds.select_columns([column]).iter_batches(
                batch_format="pyarrow", batch_size=max(watermark, 256)):
            yield from b[column].to_pylist()

    return watch_stream(_records(), sigs, cfg, threshold=threshold,
                        watermark=watermark)

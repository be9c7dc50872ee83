"""Inverted hash index — the LCA-database / revindex capability.

The reference's ``_hashval_to_idx`` dict (``/root/reference/src/sourmash/
lca/lca_db.py:82,202-203``) and RocksDB revindex (``/root/reference/src/core/
src/index/revindex/disk_revindex.rs:240-274``) re-expressed as data, not a
data structure: an exploded Dataset ``(hash: uint64, conv_id: string)``.
Build = flat_map; persistence = partitioned Parquet (resumable, prunable);
lookup = broadcast the query hash set and scan (the ``multi_get`` of
``disk_revindex.rs:278-299`` without a server); overlap counting =
``groupby(conv_id).count`` — exactly ``lca_db.py:647-653``'s Counter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import EngineConfig, DEFAULT_CONFIG


def _explode_batch(batch: pa.Table) -> pa.Table:
    lst = batch["mins"].combine_chunks()
    lens = np.diff(np.asarray(lst.offsets, dtype=np.int64))
    vals = np.asarray(lst.flatten(), dtype=np.uint64)
    idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    conv = batch["conv_id"].combine_chunks().take(pa.array(idx))
    return pa.table({"hash": pa.array(vals, pa.uint64()), "conv_id": conv})


def build_inverted_index(sigs):
    """signatures → exploded (hash, conv_id) Dataset (the index build of
    ``lca_db.py:202-203`` as a flat_map; no shuffle needed until queried)."""
    return sigs.select_columns(["conv_id", "mins"]).map_batches(
        _explode_batch, batch_format="pyarrow")


def write_index(index_ds, path: str):
    """Persist the index as Parquet — the revindex's on-disk form
    (``disk_revindex.rs:71-124``), resumable/partition-prunable."""
    index_ds.write_parquet(path)
    return path


def hash_frequency(index_ds):
    """hash → number of signatures containing it (the ``lca rankinfo``
    spectrum, ``/root/reference/src/sourmash/lca/command_rankinfo.py``).
    Block-local combiner + coarse exchange (``grouped_sums``) — hash is the
    highest-cardinality key in the engine, so the partial aggregation
    inside each block is what keeps the shuffle to per-block distinct
    hashes instead of every exploded row."""
    from .agg import grouped_sums

    return grouped_sums(index_ds.select_columns(["hash"]), ["hash"], [],
                        count_as="n_sigs")


def counter_lookup(index_ds, query_hashes: np.ndarray,
                   cfg: EngineConfig = DEFAULT_CONFIG):
    """Overlap Counter per signature for a query hash set
    (``lca_db.py:647-653`` / ``CounterGather.add``): broadcast the sorted
    query hashes, scan the index, count matches per conv_id (block-local
    combiner + exchange, not a Ray-native sort-shuffle groupby)."""
    from .agg import grouped_sums

    q = np.sort(np.asarray(query_hashes, dtype=np.uint64))
    q_ref = ray.put(q)

    def _match(batch: pa.Table) -> pa.Table:
        qq = ray.get(q_ref)
        h = np.asarray(batch["hash"], dtype=np.uint64)
        pos = np.searchsorted(qq, h)
        pos[pos >= qq.size] = qq.size - 1 if qq.size else 0
        hit = qq.size > 0
        mask = (qq[pos] == h) if hit else np.zeros(h.size, bool)
        return batch.filter(pa.array(mask))

    hits = index_ds.map_batches(_match, batch_format="pyarrow")
    return grouped_sums(hits.select_columns(["conv_id"]), ["conv_id"], [],
                        count_as="overlap")


LCA_SUMMARIZE_SCHEMA = pa.schema([
    ("lineage", pa.string()),
    ("count", pa.int64()),
    ("f_percent", pa.float64()),
])

_LCA_PART_SCHEMA = pa.schema([("lineage", pa.string()),
                              ("count", pa.int64())])


def _lca_partial(part: pa.Table) -> pa.Table:
    """Per-hash LCA + local (lineage, count) combine inside one exchange
    partition. Rows are ordered by (hash, rank-TUPLE): the ``;`` separator
    is remapped to ``\\x00`` for the sort key so byte order equals
    tuple-of-ranks order — under raw string order ``;`` (0x3B) sorts
    after digits, so a set like {"a;b", "a;b0", "a;b;z"} would put
    "a;b0" in the middle and first/last token-LCP would wrongly return
    "a;b" instead of "a". With tuple order, LCP(set) == LCP(min, max)."""
    import pyarrow.compute as pc

    from ..functions.segscore import _to_bytes_array

    if part.num_rows == 0:
        return _LCA_PART_SCHEMA.empty_table()
    h = np.asarray(part["hash"], dtype=np.uint64)
    lin_col = part["lineage"].combine_chunks()
    lin = _to_bytes_array(lin_col)
    sort_key = _to_bytes_array(pc.replace_substring(
        lin_col, pattern=";", replacement="\x00"))
    w = np.asarray(part["weight"], np.int64)
    order = np.lexsort((sort_key, h))
    h, lin, w = h[order], lin[order], w[order]
    starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
    ends = np.append(starts[1:], len(h))
    first_lin = lin[starts]
    last_lin = lin[ends - 1]
    lcas = first_lin.astype(object)
    for i in np.flatnonzero(first_lin != last_lin):
        ta = first_lin[i].decode("utf-8").split(";")
        tb = last_lin[i].decode("utf-8").split(";")
        k = 0
        while k < min(len(ta), len(tb)) and ta[k] == tb[k]:
            k += 1
        lcas[i] = ";".join(ta[:k]).encode("utf-8")
    # local combine: sum hash weights per distinct LCA
    uniq, inv = np.unique(lcas.astype(bytes), return_inverse=True)
    sums = np.bincount(inv, weights=w[starts].astype(np.float64),
                       minlength=len(uniq)).astype(np.int64)
    return pa.table({
        "lineage": pa.array([u.decode("utf-8") for u in uniq],
                            pa.string()),
        "count": pa.array(sums, pa.int64()),
    }).cast(_LCA_PART_SCHEMA)


def lca_summarize(index_ds, lineages: dict, query_hashes: np.ndarray,
                  query_counts: np.ndarray | None = None,
                  threshold: int = 5,
                  cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """``lca summarize`` with the per-rank LCA walk
    (``/root/reference/src/sourmash/lca/command_summarize.py:20-58`` +
    ``lca_utils.py:137-225``): for each query hash, the lowest common
    ancestor of every lineage assigned to it (longest common rank prefix
    across the distinct lineages — the reference's build_tree/find_lca);
    per-LCA counts (weighted by ``query_counts`` when given, i.e. hash
    abundance) are thresholded, then climbed so every ancestor prefix
    aggregates its descendants' counts (root only counts root-LCA hashes,
    mirroring the reference's climb loop).

    ``lineages``: conv_id → "rank0;rank1;..." lineage string.
    Returns (lineage, count, f_percent) sorted count desc; percent is of
    the total query hash count (assigned or not), like output_results.

    Shape: lineage attach is a broadcast sorted-array gather inside the
    index scan; per-hash LCA runs inside a hash-keyed exchange partition
    (single-lineage runs — the common case — take the vectorized path);
    only per-partition (lineage, count) partials reach the driver."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array
    from .exchange import exchange_map_groups

    q = np.asarray(query_hashes, dtype=np.uint64)
    qc = (np.ones(q.size, np.int64) if query_counts is None
          else np.asarray(query_counts, np.int64))
    order = np.argsort(q, kind="stable")
    q, qc = q[order], qc[order]
    total = int(qc.sum()) or 1
    q_ref = ray.put((q, qc))

    ids_s = np.array([k.encode("utf-8") for k in sorted(lineages)],
                     dtype=bytes) if lineages else np.empty(0, "S1")
    lin_arr = pa.array([lineages[k] for k in sorted(lineages)],
                       pa.string())
    lin_ref = ray.put((ids_s, lin_arr))

    def _attach(batch: pa.Table) -> pa.Table:
        from .verify import _common_width

        qq, qcc = ray.get(q_ref)
        h = np.asarray(batch["hash"], dtype=np.uint64)
        pos = np.searchsorted(qq, h)
        posc = np.minimum(pos, max(qq.size - 1, 0))
        hit = (qq[posc] == h) if qq.size else np.zeros(h.size, bool)
        sub = batch.filter(pa.array(hit))
        weights = qcc[posc[hit]]
        ids_sorted, lins = ray.get(lin_ref)
        keys, ids_w = _common_width(_to_bytes_array(sub["conv_id"]),
                                    ids_sorted)
        lpos = np.searchsorted(ids_w, keys)
        lposc = np.minimum(lpos, max(len(ids_w) - 1, 0))
        lhit = (ids_w[lposc] == keys) if len(ids_w) else \
            np.zeros(len(keys), bool)
        sub = sub.filter(pa.array(lhit))          # unassigned ids drop
        hh = np.asarray(sub["hash"], dtype=np.uint64)
        return pa.table({
            "key": pa.array((hh % np.uint64(2 ** 63)).astype(np.int64),
                            pa.int64()),
            "hash": sub["hash"],
            "lineage": lins.take(pa.array(lposc[lhit], pa.int64())),
            "weight": pa.array(weights[lhit], pa.int64()),
        })

    n_parts = 2 * resolve_num_partitions(cfg)
    rows = index_ds.map_batches(_attach, batch_format="pyarrow")
    partials = exchange_map_groups(rows, "key", n_parts, _lca_partial,
                                   _LCA_PART_SCHEMA)
    # merge partials (distinct LCAs — bounded by the taxonomy, tiny)
    counts: dict[str, int] = {}
    for r in partials.take_all():
        counts[r["lineage"]] = counts.get(r["lineage"], 0) + r["count"]
    # threshold per-LCA, then climb ancestors (command_summarize.py:43-55:
    # root aggregates only root-LCA hashes)
    agg: dict[str, int] = {}
    for lca, count in counts.items():
        if count < threshold:
            continue
        if not lca:
            agg[lca] = agg.get(lca, 0) + count
        parts_l = lca.split(";") if lca else []
        while parts_l:
            key = ";".join(parts_l)
            agg[key] = agg.get(key, 0) + count
            parts_l.pop()
    out = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))
    return pa.table({
        "lineage": pa.array([k if k else "(root)" for k, _ in out],
                            pa.string()),
        "count": pa.array([c for _, c in out], pa.int64()),
        "f_percent": pa.array([round(100.0 * c / total, 1)
                               for _, c in out], pa.float64()),
    }).cast(LCA_SUMMARIZE_SCHEMA)


def lca_classify(index_ds, query_hashes: np.ndarray, labels: dict,
                 cfg: EngineConfig = DEFAULT_CONFIG,
                 majority: float = 0.5):
    """``lca classify`` analogue (``/root/reference/src/sourmash/lca/
    command_classify.py``): each query hash votes with the label (here:
    cluster id, standing in for a taxonomy lineage) of every signature
    containing it; the query is assigned the label holding a strict
    majority of voting hashes, else "unassigned".

    Returns dict(label, f_agreement, n_voting_hashes).
    """
    hits = counter_lookup(index_ds, query_hashes, cfg)
    votes: dict = {}
    n_votes = 0
    for r in hits.take_all():
        lbl = labels.get(r["conv_id"], r["conv_id"])
        votes[lbl] = votes.get(lbl, 0) + r["overlap"]
        n_votes += r["overlap"]
    if not votes:
        return {"label": "unassigned", "f_agreement": 0.0,
                "n_voting_hashes": 0}
    best, cnt = max(votes.items(), key=lambda kv: (kv[1], kv[0]))
    frac = cnt / n_votes
    return {
        "label": best if frac >= majority else "unassigned",
        "f_agreement": frac,
        "n_voting_hashes": n_votes,
    }

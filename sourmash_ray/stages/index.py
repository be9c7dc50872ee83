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

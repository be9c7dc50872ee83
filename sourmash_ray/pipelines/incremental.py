"""Incremental near-dup dedup against a persisted LSH index.

The production shape for a growing corpus (daily crawls into a 100-TB
store): sketch + band the EXISTING corpus once into a persisted index,
then each delta batch is deduplicated by

1. sketching ONLY the delta (the corpus is never re-read or re-sketched),
2. probing the persisted band index for buckets the delta touches
   (hive-partitioned by ``band_key % N_BAND_FILES`` — each lookup task
   pairs one partition's files with the delta keys that hash there;
   in-partition membership is one sort + searchsorted),
3. emitting candidate pairs for touched buckets only and dropping
   old–old pairs (already resolved when the corpus was indexed),
4. fetching ONLY the candidate old sketches from the sig store
   (hive-partitioned by id hash — partitions with no candidate are
   never opened) and verifying exact Jaccard where pairs and sketches
   meet.

Cost per delta: sketch(delta) + one scan of the touched band partitions
+ verify(candidates). Nothing scales with corpus text size except the
band-partition scan, which is bounded by the index (24-byte rows), not
the documents — and prunes to the touched files when the delta is small.

Reference analogue: ``sourmash index`` once + ``sourmash search`` per
new signature (`/root/reference/src/sourmash/commands.py:452-560`);
here the index is bucketed for BATCHED deltas instead of per-query tree
descent.
"""

from __future__ import annotations

import glob

import numpy as np
import pyarrow as pa

import ray

from ..config import EngineConfig, DEFAULT_CONFIG, resolve_num_partitions
from ..functions.segscore import _to_bytes_array, hash_strings64
from ..sources.tables import read_parquet_clean
from ..stages.exchange import exchange_map_groups
from ..stages.lsh import BandKeyer, band_keys_batch, dedup_pairs
from ..stages.verify import verify_pairs

N_BAND_FILES = 64
N_SIG_FILES = 64

_KEYED_SCHEMA = pa.schema([
    ("band_key", pa.uint64()),
    ("band_part", pa.int64()),
    ("conv_id", pa.string()),
])


def _docs_side(sf_dir: str, delta: bool, cfg: EngineConfig):
    """Deterministic corpus/delta split of the documents table:
    ``doc_id % 5 == 0`` is the delta batch (newest fifth), the rest is
    the already-indexed corpus."""
    from .docops import DocSketcher, _read_docs

    def _filt(batch: pa.Table) -> pa.Table:
        mod = np.asarray(batch["doc_id"], np.int64) % 5
        keep = (mod == 0) if delta else (mod != 0)
        return batch.filter(pa.array(keep))

    sk = DocSketcher(cfg)
    return _read_docs(sf_dir).map_batches(
        _filt, batch_format="pyarrow").map_batches(
        lambda t: sk(t), batch_format="pyarrow")


def _band_rows(sigs, cfg: EngineConfig):
    keyer = BandKeyer(cfg.lsh.num_perm, cfg.lsh.bands, cfg.lsh.rows,
                      cfg.exec.group_parts)
    keyed = sigs.map_batches(band_keys_batch, fn_kwargs=dict(keyer=keyer),
                             batch_format="pyarrow")

    def _bf(t: pa.Table) -> pa.Table:
        bf = (np.asarray(t["band_key"], np.uint64)
              % np.uint64(N_BAND_FILES)).astype(np.int64)
        return t.append_column("band_file", pa.array(bf, pa.int64()))

    return keyed.map_batches(_bf, batch_format="pyarrow")


def build_doc_dedup_index(sf_dir: str, index_dir: str,
                          cfg: EngineConfig = DEFAULT_CONFIG) -> None:
    """Persist the corpus side: band index (hive by ``band_key % N``)
    + sig store (hive by id hash % N). Both writes stream; a crashed
    build is rerun whole (the driver query guards on both directories
    existing before reuse) — stage-level resume belongs to the job
    wrapper (`jobs/curate_job.py` `_DONE`-marker pattern), not to
    `write_parquet`, which does not skip existing files."""
    sigs = _docs_side(sf_dir, delta=False, cfg=cfg).materialize()
    _band_rows(sigs, cfg).write_parquet(f"{index_dir}/bands",
                                        partition_cols=["band_file"])

    def _sf(t: pa.Table) -> pa.Table:
        sf = (hash_strings64(t["conv_id"].combine_chunks())
              % N_SIG_FILES).astype(np.int64)
        return pa.table({
            "conv_id": t["conv_id"],
            "mins": t["mins"],
            "sig_file": pa.array(sf, pa.int64()),
        })

    sigs.select_columns(["conv_id", "mins"]).map_batches(
        _sf, batch_format="pyarrow").write_parquet(
        f"{index_dir}/sigs", partition_cols=["sig_file"])


def _sorted_s_array(ids) -> np.ndarray:
    a = _to_bytes_array(ids)
    return np.sort(a) if a.size else a


def _member_mask(keys: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    if sorted_set.size == 0 or keys.size == 0:
        return np.zeros(keys.size, bool)
    pos = np.minimum(np.searchsorted(sorted_set, keys),
                     sorted_set.size - 1)
    return sorted_set[pos] == keys


@ray.remote
def _delta_ids_remote(*blocks) -> np.ndarray:
    tables = [t for t in blocks if t.num_rows]
    if not tables:
        return np.empty(0, "S1")
    ids = pa.concat_tables(
        [t.select(["conv_id"]) for t in tables]).combine_chunks()
    return np.unique(_to_bytes_array(ids["conv_id"]))


def incremental_dedup_docs(sf_dir: str, index_dir: str,
                           cfg: EngineConfig = DEFAULT_CONFIG,
                           threshold: float | None = None):
    """Verified near-dup pairs (a, b, jaccard, containments) involving
    the delta batch — delta–delta and delta–corpus; corpus-internal
    pairs were resolved at index-build time and are filtered out before
    verification ever sees them."""
    import ray.data

    n_parts = resolve_num_partitions(cfg)
    dsigs = _docs_side(sf_dir, delta=True, cfg=cfg).materialize()
    dkeys = _band_rows(dsigs, cfg).materialize()
    delta_ids_ref = _delta_ids_remote.remote(*dkeys.to_arrow_refs())

    def _lookup(part: pa.Table) -> pa.Table:
        """One band partition: read its persisted files once, keep old
        rows whose bucket the delta touches."""
        import pyarrow.parquet as pq

        if part.num_rows == 0:
            return _KEYED_SCHEMA.empty_table()
        bf = int(part["band_file"][0].as_py())
        files = sorted(glob.glob(
            f"{index_dir}/bands/band_file={bf}/*.parquet"))
        if not files:
            return _KEYED_SCHEMA.empty_table()
        old = pa.concat_tables([
            pq.read_table(f, columns=["band_key", "band_part", "conv_id"])
            for f in files])
        touched = np.unique(np.asarray(part["band_key"], np.uint64))
        ok = np.asarray(old["band_key"], np.uint64)
        pos = np.minimum(np.searchsorted(touched, ok),
                         max(touched.size - 1, 0))
        hit = touched[pos] == ok if touched.size else \
            np.zeros(ok.size, bool)
        return old.filter(pa.array(hit)).cast(_KEYED_SCHEMA)

    old_hits = exchange_map_groups(dkeys, "band_file", N_BAND_FILES,
                                   _lookup, _KEYED_SCHEMA)

    # candidate pairs over touched buckets (delta + old members), then
    # drop old–old pairs before any scoring
    from ..stages.lsh import PAIRS_SCHEMA, _emit_pairs_part

    allk = dkeys.select_columns(
        ["band_key", "band_part", "conv_id"]).union(old_hits)
    pairs = exchange_map_groups(
        allk, "band_part", 2 * n_parts,
        _emit_pairs_part(cfg.lsh.max_bucket_pairs_members,
                         full_pairs=True), PAIRS_SCHEMA)
    pairs = dedup_pairs(pairs, cfg.exec.group_parts,
                        out_schema=PAIRS_SCHEMA)

    def _drop_old_old(batch: pa.Table) -> pa.Table:
        dset = ray.get(delta_ids_ref)
        a = _to_bytes_array(batch["a"].combine_chunks())
        b = _to_bytes_array(batch["b"].combine_chunks())
        w = max(a.dtype.itemsize, b.dtype.itemsize,
                dset.dtype.itemsize, 1)
        keep = (_member_mask(a.astype(f"S{w}"), dset.astype(f"S{w}"))
                | _member_mask(b.astype(f"S{w}"), dset.astype(f"S{w}")))
        return batch.filter(pa.array(keep))

    pairs = pairs.map_batches(_drop_old_old,
                              batch_format="pyarrow").materialize()
    if pairs.count() == 0:
        from ..stages.verify import VERIFIED_SCHEMA

        return ray.data.from_arrow(VERIFIED_SCHEMA.empty_table())

    # fetch ONLY candidate old sketches: pair ids -> sig-store partitions
    @ray.remote
    def _pair_old_ids(dref, *blocks) -> np.ndarray:
        tables = [t for t in blocks if t.num_rows]
        if not tables:
            return np.empty(0, "S1")
        tbl = pa.concat_tables(tables).combine_chunks()
        a = _to_bytes_array(tbl["a"])
        b = _to_bytes_array(tbl["b"])
        w = max(a.dtype.itemsize, b.dtype.itemsize, 1)
        ids = np.unique(np.concatenate([a.astype(f"S{w}"),
                                        b.astype(f"S{w}")]))
        dset = dref
        w2 = max(w, dset.dtype.itemsize, 1)
        keep = ~_member_mask(ids.astype(f"S{w2}"), dset.astype(f"S{w2}"))
        return ids[keep]

    old_ids = ray.get(_pair_old_ids.remote(
        ray.get(delta_ids_ref), *pairs.to_arrow_refs()))
    sig_files = sorted(set(
        (hash_strings64(pa.array([i.decode() for i in old_ids.tolist()],
                                 pa.string()))
         % N_SIG_FILES).tolist())) if old_ids.size else []
    paths = [f for sf in sig_files for f in sorted(
        glob.glob(f"{index_dir}/sigs/sig_file={sf}/*.parquet"))]
    old_ids_ref = ray.put(old_ids)

    def _filter_sigs(batch: pa.Table) -> pa.Table:
        oset = ray.get(old_ids_ref)
        ids = _to_bytes_array(batch["conv_id"].combine_chunks())
        w = max(ids.dtype.itemsize, oset.dtype.itemsize, 1)
        keep = _member_mask(ids.astype(f"S{w}"), oset.astype(f"S{w}"))
        return batch.select(["conv_id", "mins"]).filter(pa.array(keep))

    sigs_all = dsigs.select_columns(["conv_id", "mins"])
    if paths:
        old_sigs = read_parquet_clean(
            paths, columns=["conv_id", "mins"]).map_batches(
            _filter_sigs, batch_format="pyarrow")
        sigs_all = sigs_all.union(old_sigs)

    return verify_pairs(pairs, sigs_all.materialize(), cfg,
                        threshold=threshold)

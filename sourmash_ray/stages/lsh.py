"""LSH banding: signatures → candidate near-duplicate pairs.

This replaces the reference's candidate-pruning index structures — the SBT
Bloom-filter tree (``/root/reference/src/sourmash/sbt.py``) and the
``_hashval_to_idx`` inverted index (``lca_db.py:82,202-203``) — with the
shuffle-native equivalent: band the permutation signature, ``groupby`` the
band key (THE all-to-all exchange of the pipeline), and emit pairs within
each bucket.

Skew handling (SURVEY.md §4): a bucket of g members emits O(g²) pairs; a
boilerplate band shared by millions of conversations would explode. Buckets
larger than ``max_bucket_pairs_members`` are *chained* — every member links
to the bucket minimum plus its sorted successor — which keeps output linear
in g while preserving the connected-components result (any clique collapses
to the same component through the star+chain edges). The exact-duplicate
path (identical md5 → same cluster) is handled separately in the dedup
pipeline and does not depend on bucket capping.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import EngineConfig, DEFAULT_CONFIG, resolve_num_partitions
from ..functions.murmur import murmur64_fixedlen
from ..functions.perm import MAX_U64


class BandKeyer:
    """map_batches: one signature row → ``bands`` rows of
    ``(band_key: uint64, conv_id)``.

    The band key is a murmur64 over the little-endian bytes of
    ``[band_id, perm[band*r], …, perm[band*r+r-1]]`` — one vectorized
    murmur pass over an ``(n*bands, 8*(r+1))`` byte matrix.

    Signatures with an empty sketch (text shorter than the shingle size
    everywhere) are dropped: their perm vector is all-MAX, every such row
    would share every bucket and pair up with Jaccard 0/0.
    """

    def __init__(self, num_perm: int, bands: int, rows: int):
        self.num_perm, self.bands, self.rows = num_perm, bands, rows

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"band_key": pa.array([], pa.uint64()),
                             "conv_id": pa.array([], pa.string())})
        perms = np.asarray(
            batch["perms"].combine_chunks().flatten(), dtype=np.uint64
        ).reshape(n, self.num_perm)
        nonempty = ~(perms[:, 0] == MAX_U64)
        perms = perms[nonempty]
        conv = batch["conv_id"].combine_chunks().filter(pa.array(nonempty))
        m = perms.shape[0]
        if m == 0:
            return pa.table({"band_key": pa.array([], pa.uint64()),
                             "conv_id": pa.array([], pa.string())})
        # (m, bands, rows) -> prepend band_id lane -> bytes -> murmur
        banded = perms.reshape(m, self.bands, self.rows)
        band_ids = np.broadcast_to(
            np.arange(self.bands, dtype=np.uint64)[None, :, None],
            (m, self.bands, 1))
        lanes = np.concatenate([band_ids, banded], axis=2)
        mat = lanes.reshape(m * self.bands, self.rows + 1).astype("<u8")
        keys = murmur64_fixedlen(mat.view(np.uint8).reshape(
            m * self.bands, 8 * (self.rows + 1)))
        # repeat conv_id `bands` times via take on a repeated index vector
        idx = np.repeat(np.arange(m, dtype=np.int64), self.bands)
        conv_rep = conv.take(pa.array(idx))
        return pa.table({"band_key": pa.array(keys, pa.uint64()),
                         "conv_id": conv_rep})


def _emit_pairs_group(cap: int):
    def emit(group: pa.Table) -> pa.Table:
        ids = sorted(set(group["conv_id"].to_pylist()))
        g = len(ids)
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        if g < 2:
            return empty
        a: list[str] = []
        b: list[str] = []
        if g <= cap:
            for i in range(g - 1):
                for j in range(i + 1, g):
                    a.append(ids[i])
                    b.append(ids[j])
        else:
            # hot bucket: star to the minimum + chain of successors
            root = ids[0]
            for x in ids[1:]:
                a.append(root)
                b.append(x)
            for i in range(1, g - 1):
                a.append(ids[i])
                b.append(ids[i + 1])
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string())})

    return emit


def candidate_pairs(sigs, cfg: EngineConfig = DEFAULT_CONFIG):
    """signatures Dataset → distinct candidate pair Dataset (a < b).

    Two shuffles: groupby(band_key) to form buckets, then groupby(a, b)
    to dedup pairs found in multiple bands (SURVEY.md §7.4 key table).
    """
    lsh = cfg.lsh
    keyed = sigs.select_columns(["conv_id", "perms"]).map_batches(
        BandKeyer,
        fn_constructor_args=(lsh.num_perm, lsh.bands, lsh.rows),
        batch_format="pyarrow",
        concurrency=(1, resolve_num_partitions(cfg)),
        num_cpus=1,
    )
    pairs = keyed.groupby("band_key").map_groups(
        _emit_pairs_group(lsh.max_bucket_pairs_members),
        batch_format="pyarrow",
    )
    # distinct (a, b)
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])

"""Stage-level Parquet checkpoints with lineage manifests.

Plays the role of the reference's RocksDB ``PROCESSED`` resume bookkeeping
(``/root/reference/src/core/src/index/revindex/disk_revindex.rs:84-111,
167-183``): each materialized stage lands in its own directory with a
``_LINEAGE.json`` manifest (stage name, input fingerprint, per-file rows,
wall seconds). A resumed run with the same fingerprint skips the stage and
reads the Parquet back; anything else recomputes. Between the sketch
shuffle and the band shuffle this is what makes a 100 TB run resumable
mid-pipeline (north rule).
"""

from __future__ import annotations

import json
import os
import shutil
import time

_SUCCESS = "_LINEAGE.json"


def checkpoint_dataset(ds, path: str, *, stage: str, fingerprint: str,
                       resume: bool = True):
    """Materialize ``ds`` to ``path`` (Parquet) unless a completed checkpoint
    with the same fingerprint already exists; return a Dataset reading it."""
    import ray.data

    marker = os.path.join(path, _SUCCESS)
    if resume and os.path.exists(marker):
        with open(marker) as f:
            lineage = json.load(f)
        if lineage.get("fingerprint") == fingerprint:
            return ray.data.read_parquet(path), lineage
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)

    t0 = time.perf_counter()
    ds.write_parquet(path)
    wall = time.perf_counter() - t0
    files = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    import pyarrow.parquet as pq

    parts = [{"file": f, "rows": pq.ParquetFile(os.path.join(path, f)).metadata.num_rows}
             for f in files]
    lineage = {
        "stage": stage,
        "fingerprint": fingerprint,
        "wall_s": wall,
        "rows": sum(p["rows"] for p in parts),
        "partitions": parts,
    }
    with open(marker, "w") as f:
        json.dump(lineage, f, indent=1)
    return ray.data.read_parquet(path), lineage

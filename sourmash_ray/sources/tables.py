"""Shared Parquet table reader with clean Arrow schemas.

``ray.data.read_parquet`` propagates the file's pandas schema metadata
into every block. pyarrow Schemas whose metadata holds a dict are
UNHASHABLE (``hash(schema)`` raises ``unhashable type: 'dict'``), which
makes Ray Data's schema-dedup fast path log a
"Failed to hash the schemas (for deduplication)" warning in every
sort/aggregate reduce task that concatenates such blocks. Stripping the
metadata right after the read (zero-copy — only the schema object changes,
and Ray fuses the map into the read stage) keeps every downstream
Ray-native shuffle quiet and lets schema dedup actually work.
"""
from __future__ import annotations

import pyarrow as pa

import ray.data


def _strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def read_parquet_clean(path: str, **read_kwargs) -> ray.data.Dataset:
    """``ray.data.read_parquet`` + schema-metadata strip (column pruning
    and all other reader args pass through).

    An explicit ``schema=`` at the reader would also quiet the intra-read
    ``SplitBlocks`` concat, but Ray 2.49 rejects it alongside ``columns``
    pruning (ArrowInvalid), so the strip runs as a fused zero-copy map —
    a handful of warnings can still appear inside the read operator
    itself; everything downstream is clean."""
    ds = ray.data.read_parquet(path, **read_kwargs)
    return ds.map_batches(_strip_meta, batch_format="pyarrow")

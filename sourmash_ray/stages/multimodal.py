"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride Ray Data as ``binary`` columns with metadata
columns alongside. Decode / feature-extract runs as an ACTOR-POOL
``map_batches`` stage — the decoder "model" is loaded once per actor in
``__init__`` (the one place in this engine where an actor pool genuinely
pays for itself). The decode libraries are not in this container, so the
decoder is a clearly marked deterministic stub behind ``import-try``; the
Ray-side plumbing — schema, batch sizing for large payloads, actor
signature, output layout — is real and tested.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # "image" | "audio"
    ("payload", pa.binary()),       # opaque encoded bytes
    ("n_bytes", pa.int64()),
])

FEATURE_DIM = 16


def _try_real_decoder():
    """Real decoders (PIL / soundfile) are absent in this container."""
    try:  # pragma: no cover - environment-dependent
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:
        return None


class MediaFeatureExtractor:
    """Actor-pool stage: binary payload → fixed-dim feature vector.

    ``__init__`` loads the decoder once per actor (stubbed: a seeded
    projection matrix standing in for model weights). ``__call__`` is one
    vectorized pass per batch. Payload batches should stay SMALL
    (``batch_size``≈32-256) so batch × concurrency fits worker heaps when
    payloads are megabytes each.
    """

    def __init__(self, seed: int = 42):
        self.backend = _try_real_decoder()
        rng = np.random.default_rng(seed)
        self.proj = rng.standard_normal((256, FEATURE_DIM))

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        # STUB decode: deterministic byte histogram stands in for decoded
        # pixels/samples. A real deployment replaces this method only.
        arr = np.frombuffer(payload, dtype=np.uint8)
        return np.bincount(arr, minlength=256).astype(np.float64)

    def _hist_rows(self, batch: pa.Table) -> np.ndarray:
        """Per-row byte histograms in ONE pass over the concatenated
        payload buffer: a single ``np.bincount`` keyed on
        ``row_index*256 + byte`` (the vectorized twin of calling
        :meth:`_decode_stub` per row — equality-tested)."""
        col = batch["payload"].combine_chunks()
        n = len(col)
        bufs = col.buffers()
        width = 8 if pa.types.is_large_binary(col.type) else 4
        offs = np.frombuffer(
            bufs[1], dtype=np.int64 if width == 8 else np.int32,
            count=n + 1, offset=col.offset * width).astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        lens = np.diff(offs)
        row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lens)
        byte_vals = data[offs[0]:offs[n]].astype(np.int64)
        return np.bincount(row_of_byte * 256 + byte_vals,
                           minlength=n * 256).reshape(n, 256) \
                 .astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        feats = self._hist_rows(batch) @ self.proj
        flat = pa.array(np.round(feats, 6).reshape(-1), pa.float64())
        offs = pa.array(
            np.arange(n + 1, dtype=np.int32) * FEATURE_DIM)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "n_bytes": batch["n_bytes"],
            "features": pa.ListArray.from_arrays(offs, flat),
        })


def synth_media_table(sf_dir: str) -> pa.Table:
    """Deterministic fake media payloads derived from the documents table
    (compressed text bytes standing in for encoded images/audio)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ids, kinds, payloads, sizes = [], [], [], []
    for did, text in zip(docs["doc_id"].to_pylist(),
                         docs["text"].to_pylist()):
        payload = zlib.compress((text or "").encode())
        ids.append(did)
        kinds.append("image" if did % 2 == 0 else "audio")
        payloads.append(payload)
        sizes.append(len(payload))
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "n_bytes": pa.array(sizes, pa.int64()),
    })


def media_features(sf_dir: str):
    """The multimodal pipeline: media table → actor-pool decode/extract →
    feature rows. batch_size kept small for large payloads."""
    import ray.data

    ds = ray.data.from_arrow(synth_media_table(sf_dir))
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=128,
        concurrency=(1, 4),
        num_cpus=1,
    )

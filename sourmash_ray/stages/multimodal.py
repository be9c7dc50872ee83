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
import pyarrow.compute as pc

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


IMG_H, IMG_W = 32, 32
FRAME_BYTES = 64


def _payload_buffer(batch: pa.Table):
    """(offsets, data, lens) views over the concatenated payload buffer."""
    col = batch["payload"].combine_chunks()
    n = len(col)
    bufs = col.buffers()
    width = 8 if pa.types.is_large_binary(col.type) else 4
    offs = np.frombuffer(
        bufs[1], dtype=np.int64 if width == 8 else np.int32,
        count=n + 1, offset=col.offset * width).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return offs, data, np.diff(offs)


class MediaResizer:
    """Actor-pool RESIZE stage: stub-decode each image payload to a fixed
    (IMG_H, IMG_W) grayscale array (bytes truncated / zero-padded — a
    real deployment swaps only the decode), then block-mean resize to
    ``(out_h, out_w)``. Fully vectorized: one scatter builds the (n, H·W)
    pixel matrix straight off the Arrow payload buffer, one reshape-mean
    does every resize in the batch. Output pixels ride as ``list<float>``
    rows (rounded, so reruns hash identically)."""

    def __init__(self, out_h: int = 8, out_w: int = 8):
        if IMG_H % out_h or IMG_W % out_w:
            raise ValueError("output dims must divide the decode dims")
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        offs, data, lens = _payload_buffer(batch)
        hw = IMG_H * IMG_W
        px = np.zeros(n * hw, np.float64)
        take = np.minimum(lens, hw)
        rows = np.repeat(np.arange(n, dtype=np.int64), take)
        local = np.concatenate(
            [np.arange(t, dtype=np.int64) for t in take]) \
            if n else np.empty(0, np.int64)
        src = np.repeat(offs[:-1], take) + local
        px[rows * hw + local] = data[src]
        img = px.reshape(n, IMG_H, IMG_W)
        small = img.reshape(n, self.out_h, IMG_H // self.out_h,
                            self.out_w, IMG_W // self.out_w) \
            .mean(axis=(2, 4))
        flat = pa.array(np.round(small.reshape(-1), 6), pa.float64())
        po = pa.array(np.arange(n + 1, dtype=np.int32)
                      * (self.out_h * self.out_w))
        return pa.table({
            "media_id": batch["media_id"],
            "pixels": pa.ListArray.from_arrays(po, flat),
        })


class FrameSampler:
    """Actor-pool FRAME-SAMPLE stage: treat each payload as a sequence of
    fixed ``FRAME_BYTES`` frames and emit every ``stride``-th frame as
    its OWN row — the row-expanding (flat-map-shaped) stage a video
    pipeline puts before per-frame featurization. One fancy-gather
    copies all selected frames in the batch at once; trailing partial
    frames are dropped (codec-padding convention)."""

    def __init__(self, stride: int = 4):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        offs, data, lens = _payload_buffer(batch)
        n_frames = lens // FRAME_BYTES
        n_sel = (n_frames + self.stride - 1) // self.stride
        media = np.repeat(np.asarray(batch["media_id"], np.int64),
                          n_sel)
        fidx = (np.concatenate(
            [np.arange(k, dtype=np.int64) for k in n_sel])
            if n else np.empty(0, np.int64)) * self.stride
        starts = np.repeat(offs[:-1], n_sel) + fidx * FRAME_BYTES
        if starts.size:
            gathered = data[starts[:, None]
                            + np.arange(FRAME_BYTES)[None, :]]
            payload = pa.Array.from_buffers(
                pa.binary(), len(starts),
                [None,
                 pa.py_buffer(np.arange(0, (len(starts) + 1)
                                        * FRAME_BYTES, FRAME_BYTES,
                                        dtype=np.int32).tobytes()),
                 pa.py_buffer(np.ascontiguousarray(gathered)
                              .tobytes())])
        else:
            payload = pa.array([], pa.binary())
        return pa.table({
            "media_id": pa.array(media, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "frame": payload,
        })


def media_resize(sf_dir: str, out_h: int = 8, out_w: int = 8):
    """Resize pipeline over the image rows of the synthetic media table."""
    import pyarrow.compute as pc

    import ray.data

    tbl = synth_media_table(sf_dir)
    imgs = tbl.filter(pc.equal(tbl["kind"], "image"))
    return ray.data.from_arrow(imgs).map_batches(
        MediaResizer, fn_constructor_kwargs={"out_h": out_h,
                                             "out_w": out_w},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 4),
        num_cpus=1)


def media_frames(sf_dir: str, stride: int = 4):
    """Frame-sample pipeline over every payload of the media table."""
    import ray.data

    return ray.data.from_arrow(synth_media_table(sf_dir)).map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=128, concurrency=(1, 4),
        num_cpus=1)


def media_path(sf_dir: str) -> str:
    """Materialize (once) and return the cached Parquet directory for the
    synthetic media table at this scale — the same deterministic-cache
    contract as ``sources.transcripts.transcripts_path``, so DuckDB
    oracles can read the identical bytes the engine reads. Bucketed into
    4 files for read parallelism; idempotent via atomic rename."""
    import os

    import pyarrow.parquet as pq

    from ..sources.transcripts import CACHE_ROOT, sf_of_dir

    out = os.path.join(CACHE_ROOT, f"media_sf{sf_of_dir(sf_dir)}")
    if os.path.isdir(out):
        return out
    tbl = synth_media_table(sf_dir)
    tmp = out + f".tmp{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    bucket = np.asarray(tbl["media_id"], np.int64) % 4
    for b in range(4):
        pq.write_table(tbl.filter(pa.array(bucket == b)),
                       os.path.join(tmp, f"part-{b:02d}.parquet"))
    try:
        os.rename(tmp, out)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # another writer won
    return out


MEDIA_STATS_SCHEMA = pa.schema([
    ("kind", pa.string()), ("n_media", pa.int64()),
    ("total_bytes", pa.int64()), ("sum_byte_values", pa.int64()),
    ("min_bytes", pa.int64()), ("max_bytes", pa.int64())])


def _media_stats_partial(batch: pa.Table) -> pa.Table:
    offs, data, lens = _payload_buffer(batch)
    per = np.add.reduceat(data.astype(np.int64), offs[:-1]) \
        if data.size else np.zeros(batch.num_rows, np.int64)
    per[lens == 0] = 0                    # reduceat quirk on empty rows
    kind = batch["kind"].combine_chunks()
    rows = []
    for k in pc.unique(kind).to_pylist():
        m = np.asarray(pc.equal(kind, k))
        rows.append({"kind": k, "n_media": int(m.sum()),
                     "total_bytes": int(lens[m].sum()),
                     "sum_byte_values": int(per[m].sum()),
                     "min_bytes": int(lens[m].min()),
                     "max_bytes": int(lens[m].max())})
    return pa.Table.from_pylist(rows, schema=MEDIA_STATS_SCHEMA)


def media_payload_stats(sf_dir: str):
    """Per-kind byte audit of the media table: row count, total payload
    bytes, the SUM of all byte values (an order-insensitive integrity
    checksum over every payload byte), min/max payload size — the
    ingest-time sanity profile a multimodal pipeline runs before paying
    for decode. Vectorized straight off the Arrow binary buffers
    (one reduceat per block); per-block partials reduce to |kinds| rows,
    so the final combine is provably driver-scale."""
    import ray.data

    ds = ray.data.read_parquet(
        media_path(sf_dir), columns=["kind", "payload"]).map_batches(
        _media_stats_partial, batch_format="pyarrow")
    rows = ds.take_all()
    if not rows:
        return MEDIA_STATS_SCHEMA.empty_table()
    import pandas as pd

    g = (pd.DataFrame(rows).groupby("kind", sort=True)
         .agg(n_media=("n_media", "sum"), total_bytes=("total_bytes", "sum"),
              sum_byte_values=("sum_byte_values", "sum"),
              min_bytes=("min_bytes", "min"), max_bytes=("max_bytes", "max"))
         .reset_index())
    return pa.Table.from_pandas(g, preserve_index=False).cast(
        MEDIA_STATS_SCHEMA)


def media_size_histogram(sf_dir: str, width: int = 32):
    """Per-kind payload-size histogram (``width``-byte buckets) — the
    batch-size / block-size sizing input for the decode actor pool
    (payload size drives ``batch_size`` for large-binary stages).
    Map-only bucketing; only (kind, bucket, count) cells shuffle."""
    import ray.data

    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        nb = pc.cast(batch["n_bytes"], pa.int64())
        return pa.table({
            "kind": batch["kind"],
            "bucket": pc.multiply(pc.divide(nb, width),
                                  pa.scalar(width, pa.int64())),
        })

    ds = ray.data.read_parquet(
        media_path(sf_dir), columns=["kind", "n_bytes"]).map_batches(
        _prep, batch_format="pyarrow")
    return grouped_sums(ds, ["kind", "bucket"], [], count_as="n_media")


def media_compression_ratio(sf_dir: str):
    """Cross-MODAL size audit: histogram of payload-bytes per 100 source
    chars ((n_bytes·100) // n_chars) — the compression/encode-efficiency
    profile that joins the media table back to its source documents (the
    lineage join every derived-modality table needs). Media side joins
    docs on id via one key exchange; only (ratio, count) cells leave."""
    import ray.data

    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..sources.tables import read_parquet_clean
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    m = ray.data.read_parquet(
        media_path(sf_dir), columns=["media_id", "n_bytes"]).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["media_id"], pa.int64()),
            "n_bytes": pc.cast(t["n_bytes"], pa.int64()),
        }), batch_format="pyarrow")
    d = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars"]).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
        }), batch_format="pyarrow")
    joined = hash_join_exchange(m, d, "doc_id", ["n_bytes"],
                                ["n_chars"],
                                resolve_num_partitions(_cfg))

    def _ratio(batch: pa.Table) -> pa.Table:
        nb = np.asarray(batch["n_bytes"], np.int64)
        nc = np.maximum(np.asarray(batch["n_chars"], np.int64), 1)
        return pa.table({"ratio_pct":
                         pa.array(nb * 100 // nc, pa.int64())})

    return grouped_sums(joined.map_batches(_ratio,
                                           batch_format="pyarrow"),
                        ["ratio_pct"], [], count_as="n_media")


def media_ratio_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-KIND exact discrete quantiles of the compression ratio
    (payload bytes per 100 source chars) — :func:`media_compression_ratio`
    composed with the grouped value-histogram quantile machinery (the
    encode-efficiency SLO per modality). Same lineage join; only
    (kind, ratio, count) cells then (kind, q, value) rows move."""
    import ray.data

    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..sources.tables import read_parquet_clean
    from ..stages.agg import grouped_quantiles_disc
    from ..stages.join import hash_join_exchange

    m = ray.data.read_parquet(
        media_path(sf_dir),
        columns=["media_id", "kind", "n_bytes"]).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["media_id"], pa.int64()),
            "kind": t["kind"],
            "n_bytes": pc.cast(t["n_bytes"], pa.int64()),
        }), batch_format="pyarrow")
    d = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars"]).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
        }), batch_format="pyarrow")
    from ..config import resolve_num_partitions as _rnp

    joined = hash_join_exchange(m, d, "doc_id", ["kind", "n_bytes"],
                                ["n_chars"], _rnp(_cfg))

    def _ratio(batch: pa.Table) -> pa.Table:
        nb = np.asarray(batch["n_bytes"], np.int64)
        nc = np.maximum(np.asarray(batch["n_chars"], np.int64), 1)
        return pa.table({
            "kind": batch["kind"],
            "ratio_pct": pa.array(nb * 100 // nc, pa.int64()),
        })

    return grouped_quantiles_disc(
        joined.map_batches(_ratio, batch_format="pyarrow"),
        "kind", "ratio_pct", list(qs))


MEDIA_KIND_LANG_SCHEMA = pa.schema([
    ("kind", pa.string()), ("lang", pa.string()),
    ("n_media", pa.int64()), ("sum_bytes", pa.int64()),
])


def media_kind_lang_matrix(sf_dir: str):
    """Media-kind × source-language contingency (count + payload bytes
    per cell): the corpus-composition audit for a multimodal mix —
    which languages carry which modalities, and how many bytes each cell
    contributes to the training mix. One id-keyed exchange join
    (media_id ≡ doc_id lineage, same as `media_compression_ratio`),
    then only ≤ kinds×langs cells ride the final exchange."""
    import ray.data

    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..sources.tables import read_parquet_clean
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    m = ray.data.read_parquet(
        media_path(sf_dir), columns=["media_id", "kind", "n_bytes"]
        ).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["media_id"], pa.int64()),
            "kind": t["kind"],
            "n_bytes": pc.cast(t["n_bytes"], pa.int64()),
        }), batch_format="pyarrow")
    d = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    joined = hash_join_exchange(m, d, "doc_id", ["kind", "n_bytes"],
                                ["lang"],
                                resolve_num_partitions(_cfg))
    agg = grouped_sums(joined.map_batches(
        lambda t: pa.table({"kind": t["kind"], "lang": t["lang"],
                            "n_bytes": t["n_bytes"]}),
        batch_format="pyarrow"),
        ["kind", "lang"], ["n_bytes"], count_as="n_media")
    return agg.map_batches(
        lambda t: pa.table({
            "kind": t["kind"], "lang": t["lang"],
            "n_media": t["n_media"], "sum_bytes": t["sum_n_bytes"],
        }).cast(MEDIA_KIND_LANG_SCHEMA), batch_format="pyarrow")


MEDIA_SIZE_Q_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("q", pa.float64()),
    ("n_bytes", pa.int64()),
])


def media_kind_size_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9)):
    """Exact discrete payload-size quantiles per media kind — the
    P50/P90 sizing numbers behind the decode pool's ``batch_size``
    choice (next to :func:`media_size_histogram`'s full shape). One
    dim-bounded grouped histogram; the quantile walk runs driver-side
    over (kind × distinct-size) cells, never the rows."""
    import ray.data

    from ..stages.agg import grouped_quantiles_disc

    ds = ray.data.read_parquet(media_path(sf_dir),
                               columns=["kind", "n_bytes"])
    tbl = grouped_quantiles_disc(ds, "kind", "n_bytes", list(qs))
    return ray.data.from_arrow(pa.table({
        "kind": tbl["kind"],
        "q": tbl["q"],
        "n_bytes": tbl["value"],
    }).cast(MEDIA_SIZE_Q_SCHEMA))


MAGIC_PREFIX_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("prefix", pa.int64()),
    ("n_media", pa.int64()),
])


def media_magic_prefix_census(sf_dir: str):
    """Format-sniffing census: the first FOUR payload bytes as one
    big-endian integer (the 'magic number' a decoder dispatches on),
    counted per (kind, prefix) — the ingest audit that catches
    mislabeled or corrupt containers BEFORE paying for decode (every
    payload here opens with the zlib 0x78 header; the census proves
    it and profiles the flag/dict bytes). Vectorized straight off the
    Arrow binary buffers via the offsets view (slice-safe); payloads
    under 4 bytes are excluded, matching the SQL
    ``octet_length >= 4``. Only (kind, prefix) cells shuffle."""
    import ray.data

    from ..stages.agg import grouped_sums

    def _prefix(batch: pa.Table) -> pa.Table:
        offs, data, lens = _payload_buffer(batch)
        valid = lens >= 4
        st = offs[:-1][valid]
        pre = ((data[st].astype(np.int64) << 24)
               | (data[st + 1].astype(np.int64) << 16)
               | (data[st + 2].astype(np.int64) << 8)
               | data[st + 3].astype(np.int64))
        return pa.table({
            "kind": batch["kind"].combine_chunks().filter(
                pa.array(valid)),
            "prefix": pa.array(pre, pa.int64()),
        })

    ds = ray.data.read_parquet(
        media_path(sf_dir), columns=["kind", "payload"]).map_batches(
        _prefix, batch_format="pyarrow")
    g = grouped_sums(ds, ["kind", "prefix"], [], count_as="n_media")
    return g.map_batches(lambda t: t.cast(MAGIC_PREFIX_SCHEMA),
                         batch_format="pyarrow")


MEDIA_DOC_SUFF_SCHEMA = pa.schema([
    ("kind", pa.string()), ("n", pa.int64()),
    ("sum_b", pa.int64()), ("sum_c", pa.int64()),
    ("sum_bc", pa.int64()), ("sum_b2", pa.int64()),
    ("sum_c2", pa.int64()),
])


def media_doc_size_suffstats(sf_dir: str):
    """Cross-modal covariance sufficient statistics per media kind:
    (n, Σbytes, Σchars, Σ bytes·chars, Σbytes², Σchars²) over the
    media→source-document lineage join — the exact-integer inputs for
    'does payload size track source length per modality' (encode-
    efficiency drift detection), derived on the driver as one float.
    Same id-keyed lineage exchange as the compression-ratio audit
    (inner-join semantics: media without a source doc drop); per-row
    magnitudes guarded at 2³¹ so products stay below 2⁶²; only ≤ kinds
    six-integer rows leave the join."""
    import ray.data

    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..sources.tables import read_parquet_clean
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    m = ray.data.read_parquet(
        media_path(sf_dir),
        columns=["media_id", "kind", "n_bytes"]).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["media_id"], pa.int64()),
            "kind": t["kind"],
            "n_bytes": pc.cast(t["n_bytes"], pa.int64()),
        }), batch_format="pyarrow")
    d = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "n_chars"]).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
        }), batch_format="pyarrow")
    joined = hash_join_exchange(m, d, "doc_id", ["kind", "n_bytes"],
                                ["n_chars"],
                                resolve_num_partitions(_cfg))

    def _suff(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch["n_bytes"], np.int64)
        c = np.asarray(batch["n_chars"], np.int64)
        if b.size and max(int(np.abs(b).max()),
                          int(np.abs(c).max())) >= 2 ** 31:
            raise ValueError("media_doc_size_suffstats: magnitude "
                             "overflows the exact-int product envelope")
        return pa.table({
            "kind": batch["kind"],
            "b": pa.array(b, pa.int64()),
            "c": pa.array(c, pa.int64()),
            "bc": pa.array(b * c, pa.int64()),
            "b2": pa.array(b * b, pa.int64()),
            "c2": pa.array(c * c, pa.int64()),
        })

    g = grouped_sums(joined.map_batches(_suff, batch_format="pyarrow"),
                     ["kind"], ["b", "c", "bc", "b2", "c2"],
                     count_as="n")
    return g.map_batches(
        lambda t: pa.table({
            "kind": t["kind"], "n": t["n"], "sum_b": t["sum_b"],
            "sum_c": t["sum_c"], "sum_bc": t["sum_bc"],
            "sum_b2": t["sum_b2"], "sum_c2": t["sum_c2"],
        }).cast(MEDIA_DOC_SUFF_SCHEMA), batch_format="pyarrow")


MEDIA_KIND_SOURCE_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("source", pa.string()),
    ("n_media", pa.int64()),
    ("sum_bytes", pa.int64()),
    ("sum_text_chars", pa.int64()),
])


def media_kind_source_matrix(sf_dir: str):
    """Media-kind × provenance-source contingency with BOTH byte masses
    (encoded payload bytes and the originating text's char count): the
    storage-vs-content audit per (modality, crawl source) cell — which
    sources ship bloated payloads relative to their text, and where the
    training-mix bytes actually come from. Same id-keyed exchange join
    lineage as `media_kind_lang_matrix`; only ≤ kinds×sources cells ride
    the final fold."""
    import ray.data

    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..sources.tables import read_parquet_clean
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    m = ray.data.read_parquet(
        media_path(sf_dir), columns=["media_id", "kind", "n_bytes"]
        ).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["media_id"], pa.int64()),
            "kind": t["kind"],
            "n_bytes": pc.cast(t["n_bytes"], pa.int64()),
        }), batch_format="pyarrow")
    d = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"]).map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "source": t["source"],
            "n_chars": pc.cast(t["n_chars"], pa.int64()),
        }), batch_format="pyarrow")
    joined = hash_join_exchange(m, d, "doc_id", ["kind", "n_bytes"],
                                ["source", "n_chars"],
                                resolve_num_partitions(_cfg))
    agg = grouped_sums(joined.map_batches(
        lambda t: pa.table({"kind": t["kind"], "source": t["source"],
                            "n_bytes": t["n_bytes"],
                            "n_chars": t["n_chars"]}),
        batch_format="pyarrow"),
        ["kind", "source"], ["n_bytes", "n_chars"], count_as="n_media")
    return agg.map_batches(
        lambda t: pa.table({
            "kind": t["kind"], "source": t["source"],
            "n_media": t["n_media"], "sum_bytes": t["sum_n_bytes"],
            "sum_text_chars": t["sum_n_chars"],
        }).cast(MEDIA_KIND_SOURCE_SCHEMA), batch_format="pyarrow")

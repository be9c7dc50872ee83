"""Training-data text operators over the ``documents`` table.

The dedup/quality/token/fingerprint family a 100 TB training-data pipeline
needs, expressed Ray-Data-first. Each op mirrors a reference capability
where one exists (cited) and carries a DuckDB-oracle twin in
``__ray_entry__.oracle_sql`` where SQL can express it; numeric outputs are
integers or explicitly rounded so the driver's value-hash compare is exact.
"""

from __future__ import annotations

import binascii
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray as _ray

from ..config import EngineConfig, DEFAULT_CONFIG
from ..functions.perm import perm_seeds
from ..functions.sketch import WS_PATTERN, md5_of_mins
from ..sources.tables import read_parquet_clean
from ..stages.sketch import batch_shingle_hashes, normalize_column


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    return read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=list(columns))


def _md5_column(norm) -> pa.Array:
    """md5 hex of each utf-8 string — identical to DuckDB ``md5()``.

    Digests straight off the Arrow offsets/data buffers: one zero-copy
    memoryview slice per row into hashlib's C digest, raw 16-byte digests
    packed into one preallocated buffer, ONE ``binascii.hexlify`` for the
    whole column, and the hex column rebuilt from constant-width offsets
    (:func:`_s_fixed_to_string_array`). No per-row Python string / bytes
    materialization — the remaining loop is bounded by the C digest cost
    (this is the most-reused doc kernel: exact dedup, keep-best, md5short
    picklist, exact decontamination, hash_split, shard_shuffle)."""
    chunks = norm.chunks if isinstance(norm, pa.ChunkedArray) else [norm]
    md5 = hashlib.md5
    parts = []
    for ch in chunks:
        n = len(ch)
        if n == 0:
            continue
        width = 8 if (pa.types.is_large_string(ch.type)
                      or pa.types.is_large_binary(ch.type)) else 4
        bufs = ch.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64 if width == 8
                             else np.int32, count=n + 1,
                             offset=ch.offset * width)
        data = memoryview(bufs[2])
        raw = bytearray(16 * n)
        lo = offs[0]
        for i in range(n):
            hi = offs[i + 1]
            raw[16 * i:16 * i + 16] = md5(data[lo:hi]).digest()
            lo = hi
        parts.append(raw)
    if not parts:
        return pa.array([], pa.string())
    hexes = np.frombuffer(binascii.hexlify(b"".join(parts)), dtype="S32")
    return _s_fixed_to_string_array(hexes)


def _normalize_md5_batch(batch: pa.Table) -> pa.Table:
    norm = normalize_column(batch["text"], "ws")
    return pa.table({"doc_id": batch["doc_id"],
                     "text_md5": _md5_column(norm)})


def _s_fixed_to_string_array(u: np.ndarray):
    """Fixed-width numpy S array → pa.string() (Array or ChunkedArray),
    zero per-row Python. ONLY valid when every element is exactly
    ``itemsize`` bytes (true for md5 hex, always 32 chars) — numpy strips
    trailing NULs on access but ``tobytes`` preserves the full width.
    Emits int32-offset chunks of ≤1 GiB so a giant reduce partition can
    never wrap the offsets (silent corruption) — it becomes a chunked
    column instead."""
    w = u.dtype.itemsize
    n = len(u)
    if n == 0:
        return pa.array([], pa.string())
    rows_per_chunk = max(1, (1 << 30) // w)

    def _one(seg: np.ndarray) -> pa.Array:
        m = len(seg)
        offsets = pa.py_buffer(
            np.arange(0, (m + 1) * w, w, dtype=np.int32).tobytes())
        return pa.StringArray.from_buffers(m, offsets,
                                           pa.py_buffer(seg.tobytes()))

    if n <= rows_per_chunk:
        return _one(u)
    return pa.chunked_array([_one(u[i:i + rows_per_chunk])
                             for i in range(0, n, rows_per_chunk)])


def exact_dedup_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """Exact dedup: hash-partition on normalized-text md5, keep the first
    (min doc_id) per group — the ``found_md5`` dedup of
    ``/root/reference/src/sourmash/search.py:682-691`` as a full operator.

    Shape: block-local (md5, min, count) combiner, coarse-key exchange
    (not ``Dataset.groupby`` — Ray 2.49's sort shuffle has a
    data-proportional serial component), per-partition merge. Output:
    (text_md5, rep_doc_id, n_docs), one row per distinct text.
    """
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups
    from ..config import resolve_num_partitions

    group_parts = cfg.exec.group_parts

    def _partial(batch: pa.Table) -> pa.Table:
        t = _normalize_md5_batch(batch)
        # md5 hex is fixed-width ASCII: S32 numpy sorts identically to the
        # string column and needs no per-row Python objects
        md5 = _to_bytes_array(t["text_md5"])
        ids = np.asarray(t["doc_id"], np.int64)
        order = np.lexsort((ids, md5))
        md5, ids = md5[order], ids[order]
        starts = np.flatnonzero(
            np.concatenate([[True], md5[1:] != md5[:-1]])) \
            if len(md5) else np.empty(0, np.int64)
        cnt = np.diff(np.concatenate([starts, [len(md5)]]))
        u = md5[starts]
        return pa.table({
            "text_md5": _s_fixed_to_string_array(u),
            "rep_doc_id": pa.array(ids[starts], pa.int64()),
            "n_docs": pa.array(cnt.astype(np.int64), pa.int64()),
            "md5_part": pa.array(hash_strings64(u) % group_parts,
                                 pa.int64()),
        })

    out_schema = pa.schema([("text_md5", pa.string()),
                            ("rep_doc_id", pa.int64()),
                            ("n_docs", pa.int64())])

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        md5 = _to_bytes_array(part["text_md5"])
        rep = np.asarray(part["rep_doc_id"], np.int64)
        cnt = np.asarray(part["n_docs"], np.int64)
        order = np.lexsort((rep, md5))
        md5, rep, cnt = md5[order], rep[order], cnt[order]
        starts = np.flatnonzero(
            np.concatenate([[True], md5[1:] != md5[:-1]]))
        sums = np.add.reduceat(cnt, starts)
        return pa.table({
            "text_md5": _s_fixed_to_string_array(md5[starts]),
            "rep_doc_id": pa.array(rep[starts], pa.int64()),
            "n_docs": pa.array(sums.astype(np.int64), pa.int64()),
        })

    parts = _read_docs(sf_dir).map_batches(_partial,
                                           batch_format="pyarrow")
    return exchange_map_groups(parts, "md5_part",
                               2 * resolve_num_partitions(cfg),
                               _merge, out_schema)


def _token_stats_batch(batch: pa.Table) -> pa.Table:
    """Whitespace token count + length stats, all integer-valued so the
    SQL-oracle compare is bit-exact."""
    text = pc.fill_null(batch["text"].combine_chunks(), "")
    trimmed = pc.utf8_trim(
        pc.replace_substring_regex(text, WS_PATTERN, " "), " ")
    splits = pc.split_pattern(trimmed, " ")
    n_tokens = pc.if_else(pc.equal(trimmed, ""),
                          pa.scalar(0, pa.int64()),
                          pc.cast(pc.list_value_length(splits), pa.int64()))
    return pa.table({
        "doc_id": batch["doc_id"],
        "n_tokens": n_tokens,
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
    })


def token_stats_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """Per-document token/char counts (token-counting op)."""
    return _read_docs(sf_dir).map_batches(
        _token_stats_batch, batch_format="pyarrow")


_PUNCT_CLASS = r"[.!?,;:]"
_DIGIT_CLASS = r"[0-9]"
_UPPER_CLASS = r"[A-Z]"


def _quality_batch(batch: pa.Table) -> pa.Table:
    text = pc.fill_null(batch["text"].combine_chunks(), "")

    def count_class(pattern: str):
        return pc.cast(pc.count_substring_regex(text, pattern), pa.int64())

    return pa.table({
        "doc_id": batch["doc_id"],
        "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        "n_punct": count_class(_PUNCT_CLASS),
        "n_digits": count_class(_DIGIT_CLASS),
        "n_upper": count_class(_UPPER_CLASS),
    })


def quality_stats_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """Quality-scoring signals (punctuation/digit/upper counts) per doc."""
    return _read_docs(sf_dir).map_batches(_quality_batch,
                                          batch_format="pyarrow")


def lang_summary_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """groupby(lang): doc count + total chars — the ``sig fileinfo``-style
    collection summary (``/root/reference/src/sourmash/sig/__main__.py:
    250-345``) over documents."""
    from ..stages.agg import grouped_sums

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "n_chars"])
    agg = grouped_sums(ds, ["lang"], ["n_chars"], count_as="n_docs")
    return agg.map_batches(
        lambda t: pa.table({
            "lang": t["lang"],
            "n_docs": t["n_docs"],
            "total_chars": t["sum_n_chars"],
        }), batch_format="pyarrow")


SUFFSTATS_CT_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("n", pa.int64()),
    ("sum_c", pa.int64()),
    ("sum_t", pa.int64()),
    ("sum_ct", pa.int64()),
    ("sum_c2", pa.int64()),
    ("sum_t2", pa.int64()),
])


def doc_length_token_suffstats(sf_dir: str,
                               cfg: EngineConfig = DEFAULT_CONFIG):
    """Char/token covariance sufficient statistics per source:
    (n, Σc, Σt, Σct, Σc², Σt²) with c = char count and t = whitespace
    token count (the engine's standard tokenizer convention) — the
    corpus-level 'are chars a good token proxy per source' audit,
    shipped as exact integers so the consumer derives Pearson/OLS on
    the driver and partial/merge order can't perturb anything. Map-only
    until a ≤ sources-sized exchange. Per-row magnitudes are guarded at
    2³¹ so every squared term stays below 2⁶²."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _stats(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        trimmed = pc.utf8_trim(
            pc.replace_substring_regex(text, WS_PATTERN, " "), " ")
        splits = pc.split_pattern(trimmed, " ")
        t = np.asarray(pc.if_else(
            pc.equal(trimmed, ""), pa.scalar(0, pa.int64()),
            pc.cast(pc.list_value_length(splits), pa.int64())), np.int64)
        c = np.asarray(pc.cast(pc.utf8_length(text), pa.int64()),
                       np.int64)
        if c.size and int(c.max()) >= 2 ** 31:
            raise ValueError("doc_length_token_suffstats: char count "
                             "overflows the exact-int square envelope")
        return pa.table({
            "source": batch["source"],
            "c": pa.array(c, pa.int64()),
            "t": pa.array(t, pa.int64()),
            "ct": pa.array(c * t, pa.int64()),
            "c2": pa.array(c * c, pa.int64()),
            "t2": pa.array(t * t, pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"]).map_batches(
            _stats, batch_format="pyarrow"),
        ["source"], ["c", "t", "ct", "c2", "t2"], count_as="n")
    return g.map_batches(
        lambda t: pa.table({
            "source": t["source"], "n": t["n"],
            "sum_c": t["sum_c"], "sum_t": t["sum_t"],
            "sum_ct": t["sum_ct"], "sum_c2": t["sum_c2"],
            "sum_t2": t["sum_t2"],
        }).cast(SUFFSTATS_CT_SCHEMA), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash / SimHash near-dup over documents
# ---------------------------------------------------------------------------


class DocSketcher:
    """Single-turn variant of TurnSketcher: per-document scaled sketch +
    perm minima in one vectorized pass (doc == one-turn conversation)."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.seeds = perm_seeds(cfg.lsh.num_perm, cfg.sketch.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.cfg.sketch
        norm = normalize_column(batch["text"], p.normalization)
        hashes, rows, _ = batch_shingle_hashes(norm, p.ksize, p.seed)
        return self.from_hashes(batch["doc_id"], hashes, rows, len(batch))

    def from_hashes(self, doc_id, hashes: np.ndarray, rows: np.ndarray,
                    n_rows: int) -> pa.Table:
        """Sketch table from precomputed shingle hashes — shared with the
        cascade's fused one-scan sketcher."""
        from ..functions.perm import MAX_U64
        from ..stages.sketch import _fmix64_mat, _retain_per_row

        p = self.cfg.sketch
        offsets, mins, _ = _retain_per_row(hashes, rows, n_rows, p)
        num_perm = self.cfg.lsh.num_perm
        # per-seed fmix + reduceat over all rows at once (the
        # make_merge_part_fn path) instead of a per-row perm_minima loop
        perms = np.full((n_rows, num_perm), MAX_U64, np.uint64)
        if mins.size:
            per_row = np.diff(offsets)
            nonempty = per_row > 0
            starts = offsets[:-1][nonempty].astype(np.int64)
            n_ne = int(nonempty.sum())
            old = np.seterr(over="ignore")
            try:
                for j in range(num_perm):
                    col = _fmix64_mat(mins ^ self.seeds[j])
                    perms[nonempty, j] = np.minimum.reduceat(
                        col, starts)[:n_ne]
            finally:
                np.seterr(**old)
        flat = pa.array(perms.reshape(-1), pa.uint64())
        perm_offs = pa.array(
            np.arange(n_rows + 1, dtype=np.int32) * self.cfg.lsh.num_perm)
        return pa.table({
            "conv_id": pc.cast(doc_id, pa.string()),
            "mins": pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(mins, pa.uint64())),
            "md5": pa.array(
                [md5_of_mins(mins[offsets[i]:offsets[i + 1]], p.ksize)
                 for i in range(n_rows)], pa.string()),
            "perms": pa.ListArray.from_arrays(perm_offs, flat),
        })


def sketch_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    sk = DocSketcher(cfg)
    return _read_docs(sf_dir).map_batches(
        lambda t: sk(t), batch_format="pyarrow")


def minhash_dedup_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """Full LSH near-dup clustering over documents: (doc conv_id,
    cluster_id). The flagship pipeline applied to single-text records."""
    from ..stages.cluster import assign_clusters
    from ..stages.lsh import candidate_pairs
    from ..stages.verify import verify_pairs

    sigs = sketch_docs(sf_dir, cfg).materialize()
    pairs = candidate_pairs(sigs, cfg)
    verified = verify_pairs(pairs, sigs, cfg).materialize()
    return assign_clusters(sigs, verified.select_columns(["a", "b"]), cfg)


class SimHasher:
    """64-bit SimHash (Charikar '02) over shingle hashes: sign-sum of the
    bit columns weighted by occurrence. Vectorized via np.bincount over
    (row, bit) pairs."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.cfg.sketch
        norm = normalize_column(batch["text"], p.normalization)
        hashes, rows, _ = batch_shingle_hashes(norm, p.ksize, p.seed)
        return pa.table({
            "doc_id": batch["doc_id"],
            "simhash": self.from_hashes(hashes, rows, len(batch)),
        })

    @staticmethod
    def from_hashes(hashes: np.ndarray, rows: np.ndarray,
                    n: int) -> pa.Array:
        """SimHash column from precomputed shingle hashes — shared with
        the cascade's fused one-scan sketcher."""
        votes = np.zeros((n, 64), np.int64)
        if hashes.size:
            bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            np.add.at(votes, rows, 2 * bits - 1)
        sim = ((votes > 0).astype(np.uint64)
               << np.arange(64, dtype=np.uint64)[None, :]).sum(
                   axis=1, dtype=np.uint64)
        return pa.array(sim, pa.uint64())


def simhash_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    sh = SimHasher(cfg)
    return _read_docs(sf_dir).map_batches(
        lambda t: sh(t), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# language ID + fingerprinting
# ---------------------------------------------------------------------------

# tiny marker-word lists (public common-word sets) — a deterministic
# n-gram/stopword heuristic, the shape of a real langid stage; the engine
# plumbing (vectorized scoring over Arrow batches) is the point
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "you", "for"),
    "es": ("el", "la", "de", "que", "los", "una", "es", "por", "con"),
    "fr": ("le", "la", "les", "de", "et", "est", "une", "que", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"),
    "pt": ("o", "a", "os", "as", "um", "uma", "que", "para", "com"),
}


class LangIdScorer:
    """Stopword-count language heuristic over whitespace tokens, fully
    vectorized: tokens are flattened once per batch, fixed-width-byte
    membership against each marker set runs as ``np.isin``, and per-row
    counts come from one ``bincount`` per language. The marker byte arrays
    live in __init__ (once per actor/task graph). Tie rule: first language
    in sorted order with the (strictly positive) max count; ``unk`` when
    no marker hits — identical to the SQL-oracle twin."""

    # widest marker is 5 bytes; tokens longer than the S-width can only
    # TRUNCATE to ≥6 non-NUL bytes and therefore never equal a marker
    _W = 8

    def __init__(self):
        self.langs = sorted(_LANG_MARKERS)
        self.marker_arrays = [
            np.array(sorted(_LANG_MARKERS[lang]), dtype=f"S{self._W}")
            for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        low = pc.utf8_lower(pc.fill_null(batch["text"].combine_chunks(), ""))
        toks = pc.split_pattern_regex(low, r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        flat = toks.flatten()
        rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
        # UTF-8 bytes straight from the Arrow buffers (zero-copy scatter in
        # _to_bytes_array — no to_pylist); the S-width cast only truncates
        # (safe per the width argument above)
        from ..functions.segscore import _to_bytes_array

        tok_w = (_to_bytes_array(flat).astype(f"S{self._W}")
                 if len(flat) else np.empty(0, f"S{self._W}"))
        hits = np.zeros((len(self.langs), n), np.int64)
        for i, markers in enumerate(self.marker_arrays):
            m = np.isin(tok_w, markers)
            if m.any():
                hits[i] = np.bincount(rows[m], minlength=n)
        best = hits.max(axis=0) if n else np.zeros(0, np.int64)
        which = hits.argmax(axis=0) if n else np.zeros(0, np.int64)
        lang_arr = np.array(self.langs + ["unk"])
        guess = lang_arr[np.where(best > 0, which, len(self.langs))]
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang_guess": pa.array(guess.tolist(), pa.string()),
            "marker_hits": pa.array(best, pa.int64()),
            "lang_actual": batch["lang"],
        })


def langid_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """Language-ID heuristic per document (guess vs the table's actual)."""
    sc = LangIdScorer()
    return _read_docs(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
        lambda t: sc(t), batch_format="pyarrow")


def fingerprint_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG,
                     window: int = 16):
    """Document fingerprint: min/max/xor of rolling shingle hashes — a
    winnowing-style rolling-hash fingerprint (Schleimer et al. '03 shape)
    over the murmur shingle stream the sketcher already computes."""

    def _fp(batch: pa.Table) -> pa.Table:
        p = cfg.sketch
        norm = normalize_column(batch["text"], p.normalization)
        hashes, rows, _ = batch_shingle_hashes(norm, window, p.seed)
        n = batch.num_rows
        fp_min = np.full(n, np.iinfo(np.uint64).max, np.uint64)
        fp_xor = np.zeros(n, np.uint64)
        if hashes.size:
            np.minimum.at(fp_min, rows, hashes)
            np.bitwise_xor.at(fp_xor, rows, hashes)
        empty = np.bincount(rows, minlength=n) == 0 if hashes.size else \
            np.ones(n, bool)
        fp_min[empty] = 0
        return pa.table({
            "doc_id": batch["doc_id"],
            "fp_min": pa.array(fp_min, pa.uint64()),
            "fp_xor": pa.array(fp_xor, pa.uint64()),
        })

    return _read_docs(sf_dir).map_batches(_fp, batch_format="pyarrow")


def ngram_jaccard_pairs(sf_dir: str, n_docs: int = 40, n: int = 2,
                        threshold_e4: int = 0):
    """Exact token-n-gram Jaccard for all pairs among the first ``n_docs``
    documents — the SQL-checkable exact baseline of the MinHash estimator
    (scores as integer 1e4 so the DuckDB oracle hashes identically).

    Small-n exact op: one broadcasted table, pairs generated per batch.
    """
    import ray

    docs = (_read_docs(sf_dir)
            .filter(expr=f"doc_id < {n_docs}")
            .take_all())
    docs.sort(key=lambda r: r["doc_id"])

    def grams(text: str) -> set:
        toks = [t for t in (text or "").split(" ") if t != ""]
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sets = {r["doc_id"]: grams(r["text"]) for r in docs}
    ids = sorted(sets)
    pair_rows = [{"a": a, "b": b} for i, a in enumerate(ids)
                 for b in ids[i + 1:]]
    sets_ref = ray.put(sets)

    def _score(batch: pa.Table) -> pa.Table:
        ss = ray.get(sets_ref)
        a_ids = batch["a"].to_pylist()
        b_ids = batch["b"].to_pylist()
        out = []
        for a, b in zip(a_ids, b_ids):
            sa, sb = ss[a], ss[b]
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 0.0
            # floor, not round: j is the same IEEE double in DuckDB (same
            # integer division), so floor is bit-identical across engines
            out.append(int(j * 1e4))
        t = pa.table({
            "a": pa.array(a_ids, pa.int64()),
            "b": pa.array(b_ids, pa.int64()),
            "jaccard_e4": pa.array(out, pa.int64()),
        })
        return t.filter(pc.greater_equal(t["jaccard_e4"],
                                         pa.scalar(threshold_e4)))

    import ray.data

    return ray.data.from_items(pair_rows).map_batches(
        _score, batch_format="pyarrow")


SIMPAIRS_SCHEMA = pa.schema([
    ("a", pa.int64()),
    ("b", pa.int64()),
    ("hamming", pa.int64()),
])


def _simhash_pairs_part(max_hamming: int):
    """In-partition SimHash candidate emission + popcount verify.

    The simhash rides the exchange as a payload column, so verification
    happens INSIDE the partition — no driver ``take_all``, no second pass.
    Within a chunk bucket, rows are first grouped by identical simhash:
    cross-group candidates are popcount-filtered on the r×r DISTINCT
    values (r stays tiny even when millions of boilerplate docs share one
    simhash), and only MATCHING group pairs expand to member pairs — work
    is O(r² + output), never O(g²) of the raw bucket. Emission is
    therefore exact for the pigeonhole guarantee (hamming ≤ 3 pairs always
    share a 16-bit chunk) with output bounded by the true result size.
    """
    from ..functions.segscore import popcount64

    def emit(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return SIMPAIRS_SCHEMA.empty_table()
        part = part.sort_by([("band_key", "ascending"),
                             ("simhash", "ascending"),
                             ("doc_id", "ascending")])
        keys = np.asarray(part["band_key"], dtype=np.uint64)
        sh = np.asarray(part["simhash"], dtype=np.uint64)
        ids = np.asarray(part["doc_id"], dtype=np.int64)
        b_starts = np.flatnonzero(
            np.concatenate([[True], keys[1:] != keys[:-1]]))
        b_sizes = np.diff(np.concatenate([b_starts, [keys.size]]))
        out_a, out_b, out_h = [], [], []
        for s, g in zip(b_starts[b_sizes >= 2], b_sizes[b_sizes >= 2]):
            g = int(g)
            ss = sh[s:s + g]
            si = ids[s:s + g]
            r_starts = np.flatnonzero(
                np.concatenate([[True], ss[1:] != ss[:-1]]))
            r_sizes = np.diff(np.concatenate([r_starts, [g]]))
            r_vals = ss[r_starts]
            r = len(r_vals)
            # same-simhash runs: every member pair, hamming 0 (chunked —
            # the output is inherently O(run²) for a pair list, but the
            # index generation stays memory-bounded)
            from ..stages.lsh import full_pair_indices

            for rs, rg in zip(r_starts[r_sizes >= 2], r_sizes[r_sizes >= 2]):
                for iu, ju in full_pair_indices(int(rs), int(rg)):
                    out_a.append(si[iu])
                    out_b.append(si[ju])
                    out_h.append(np.zeros(iu.size, np.int64))
            if r < 2:
                continue
            # cross-run candidates on DISTINCT simhashes only, generated
            # in memory-bounded chunks: an unchunked triu over r distinct
            # values allocates O(r²) index entries before the popcount
            # filter — a 100k-value bucket would need ~80 GB
            from ..stages.lsh import full_pair_indices

            for iu, ju in full_pair_indices(0, r):
                hm = popcount64(r_vals[iu] ^ r_vals[ju])
                ok = hm <= max_hamming
                for pi, pj, ph in zip(iu[ok], ju[ok], hm[ok]):
                    mi = si[r_starts[pi]: r_starts[pi] + r_sizes[pi]]
                    mj = si[r_starts[pj]: r_starts[pj] + r_sizes[pj]]
                    out_a.append(np.repeat(mi, mj.size))
                    out_b.append(np.tile(mj, mi.size))
                    out_h.append(np.full(mi.size * mj.size, ph, np.int64))
        if not out_a:
            return SIMPAIRS_SCHEMA.empty_table()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table({
            "a": pa.array(lo, pa.int64()),
            "b": pa.array(hi, pa.int64()),
            "hamming": pa.array(np.concatenate(out_h), pa.int64()),
        })

    return emit


def simhash_neardup_pairs(source, cfg: EngineConfig = DEFAULT_CONFIG,
                          max_hamming: int = 3, distinct: bool = True):
    """SimHash near-dup pairs: 64-bit fingerprints banded into 4×16-bit
    chunks (pigeonhole: any pair within Hamming distance 3 shares at least
    one exact chunk), candidates verified by popcount of the XOR — inside
    the band partition (the simhash travels as a payload column; nothing
    is ever materialized on the driver).

    ``source``: an sf_dir string (fingerprints the documents table) or an
    existing (doc_id, simhash) Dataset — the tiered cascade passes the
    exact-survivor subset here.

    Output: (a, b, hamming) for pairs with distance ≤ ``max_hamming``,
    exact vs brute force (see test_recall_scale).

    ``distinct=False`` skips the final pair-dedup exchange (a pair found
    via several chunks repeats, same hamming) — for consumers that
    tolerate multi-edges (connected components in the tiered cascade)
    it saves one sequential exchange round.
    """
    from ..config import resolve_num_partitions
    from ..stages.exchange import exchange_map_groups
    from ..stages.lsh import dedup_pairs

    sims = (simhash_docs(source, cfg) if isinstance(source, str)
            else source)

    def _chunks(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch["simhash"], dtype=np.uint64)
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        n = len(ids)
        out_keys = np.empty(4 * n, np.uint64)
        for c in range(4):
            chunk = (sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            # fold the chunk index in so chunks from different positions
            # never collide
            out_keys[c::4] = chunk * np.uint64(4) + np.uint64(c)
        return pa.table({
            "band_key": pa.array(out_keys, pa.uint64()),
            "band_part": pa.array(
                (out_keys % np.uint64(cfg.exec.group_parts))
                .astype(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
            "simhash": pa.array(np.repeat(sh, 4), pa.uint64()),
        })

    keyed = sims.map_batches(_chunks, batch_format="pyarrow")
    pairs = exchange_map_groups(
        keyed, "band_part", 2 * resolve_num_partitions(cfg),
        _simhash_pairs_part(max_hamming), SIMPAIRS_SCHEMA)
    if not distinct:
        return pairs
    # a pair found via several chunks repeats with the same hamming —
    # distinct by (a, b), first occurrence kept
    return dedup_pairs(pairs, cfg.exec.group_parts,
                       out_schema=SIMPAIRS_SCHEMA)


# ---------------------------------------------------------------------------
# distinct-token counting: HLL estimate + exact twin
# ---------------------------------------------------------------------------


def approx_distinct_tokens(sf_dir: str, p: int = 14) -> pa.Table:
    """Approximate distinct whitespace-token count across the corpus via
    the mergeable HLL combiner (``stages/approx.py``; reference sketch
    semantics ``hyperloglog/mod.rs:33-236``). One row:
    (n_distinct_tokens_approx, p, expected_relative_error)."""
    from ..functions.hll import hll_error_rate
    from ..stages.approx import approx_distinct, tokens_of

    ds = _read_docs(sf_dir)
    est = approx_distinct(
        ds, lambda b: tokens_of(b["text"].combine_chunks(), WS_PATTERN), p=p)
    return pa.table({
        "n_distinct_tokens_approx": pa.array([est], pa.int64()),
        "p": pa.array([p], pa.int64()),
        "expected_rel_error": pa.array([hll_error_rate(p)], pa.float64()),
    })


def distinct_tokens_exact(sf_dir: str) -> pa.Table:
    """Exact distinct whitespace-token count (SQL-oracle twin of
    :func:`approx_distinct_tokens`): per-batch dedup combiner →
    hash-partition exchange → per-partition unique count → sum."""
    from ..stages.approx import distinct_count_exact, tokens_of

    ds = _read_docs(sf_dir)
    n = distinct_count_exact(
        ds, lambda b: tokens_of(b["text"].combine_chunks(), WS_PATTERN))
    return pa.table({"n_distinct_tokens": pa.array([n], pa.int64())})


@_ray.remote
def _picked_md5shorts(*blocks) -> set:
    """Picked md5short prefixes (every 97th doc_id) from the hashed
    blocks — built off-driver; only the small set returns."""
    picked: set = set()
    for b in blocks:
        if not b.num_rows:
            continue
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        sel = np.flatnonzero(ids % 97 == 0)
        if sel.size:
            short = pc.utf8_slice_codeunits(
                b["text_md5"].combine_chunks(), 0, 8)
            picked.update(short.take(pa.array(sel, pa.int64())).to_pylist())
    return picked


def picklist_md5short_docs(sf_dir: str):
    """Picklist with the ``md5short`` coltype (``picklist.py:29-31``:
    8-char md5 prefix match): keep documents whose normalized-text
    md5short matches any picked prefix (picked = every 97th doc_id's
    md5short — a stand-in for the user's pickfile CSV). Prefix matches
    catch exact-duplicate texts of the picked docs too, like the
    reference's md5short picklists over signature collections."""
    from ..stages.picklist import PickStyle, picklist_filter

    hashed = _read_docs(sf_dir).map_batches(
        _normalize_md5_batch, batch_format="pyarrow").materialize()
    # materialized once: both the picked-set scan and the filter pass
    # reuse the md5 blocks instead of re-hashing the corpus. The picked
    # set builds in ONE remote task over the block refs (only the small
    # picked set returns to the driver — never the corpus md5 column).
    picked = _ray.get(_picked_md5shorts.remote(*hashed.to_arrow_refs()))

    kept = picklist_filter(hashed, "text_md5", picked, coltype="md5short",
                           style=PickStyle.INCLUDE)

    def _out(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "md5short": pc.utf8_slice_codeunits(
                batch["text_md5"].combine_chunks(), 0, 8),
        })

    return kept.map_batches(_out, batch_format="pyarrow")


_HEX_POW = (np.uint64(16) ** np.arange(7, -1, -1, dtype=np.uint64))


def _hex8_to_int(md5_col: pa.Array) -> np.ndarray:
    """Vectorized ``int(h[:8], 16)`` over a lowercase-hex md5 column."""
    from ..functions.segscore import _to_bytes_array

    s = _to_bytes_array(md5_col)
    m = s.view(np.uint8).reshape(len(s), -1)[:, :8].astype(np.uint64)
    digits = m - np.uint64(48) - np.uint64(39) * (m >= 97)
    return digits @ _HEX_POW


def hash_split_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """Deterministic content-hash train/valid/test split — the
    reproducible dataset-split op of a training pipeline: the assignment
    is a pure function of the text (first 8 md5 hex digits % 100:
    <80 train, <90 valid, else test), so it is stable across reruns,
    shards and cluster sizes, needs no RNG state or coordination, and a
    near-duplicate leaked into both splits can be audited by recomputing
    the hash. Returns per-(split, lang) doc counts + char sums via the
    block-local combiner + exchange (only partial rows shuffle)."""
    from ..stages.agg import grouped_sums

    splits = np.array(["train", "valid", "test"])

    def _assign(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        md5 = _md5_column(text)
        b = _hex8_to_int(md5) % np.uint64(100)
        idx = np.where(b < 80, 0, np.where(b < 90, 1, 2))
        return pa.table({
            "split": pa.array(splits[idx], pa.string()),
            "lang": batch["lang"],
            "n_chars": batch["n_chars"],
        })

    ds = _read_docs(sf_dir, ("text", "lang", "n_chars")).map_batches(
        _assign, batch_format="pyarrow")
    return grouped_sums(ds, ["split", "lang"], ["n_chars"],
                        count_as="n_docs")


def length_quantiles_docs(sf_dir: str,
                          qs=(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)):
    """Exact document-length quantiles (the length-filter thresholds of a
    quality pipeline) via the distributed value histogram —
    :func:`sourmash_ray.stages.agg.quantiles_disc`; DuckDB
    ``quantile_disc`` semantics."""
    from ..stages.agg import quantiles_disc

    return quantiles_disc(_read_docs(sf_dir, ("n_chars",)), "n_chars",
                          list(qs))


def stratified_sample_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """Deterministic stratified sampling — the dataset-MIXING primitive of
    a training pipeline: each source is downsampled at its own rate
    (here rate_pct = 5·(1 + src_number mod 10), i.e. 5%–50% per source)
    using the same content-hash buckets as :func:`hash_split_docs`.
    Membership is a pure function of (text, source): reproducible across
    shards, reruns and cluster sizes, no RNG state, and composable with
    the hash split (a doc keeps one bucket for both decisions). Embarrassingly
    parallel — one vectorized pass, no shuffle."""
    def _keep(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        md5 = _md5_column(text)
        b = (_hex8_to_int(md5) % np.uint64(100)).astype(np.int64)
        src = batch["source"].combine_chunks()
        num = pc.cast(pc.utf8_slice_codeunits(src, 3, 32), pa.int64())
        rate = 5 * (1 + np.asarray(num) % 10)
        return pa.table({"doc_id": batch["doc_id"],
                         "source": src}).filter(pa.array(b < rate))

    return _read_docs(sf_dir, ("doc_id", "text", "source")).map_batches(
        _keep, batch_format="pyarrow")


# GPT-2-ish pretokenizer classes, ASCII-restricted so the RE2 pattern is
# byte-identical between Arrow's count_substring_regex and DuckDB's
# regexp_extract_all (both RE2)
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_counts_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG):
    """Token counting with a BPE-ish pretokenizer regex (letter runs,
    digit runs, punctuation runs, whitespace — the GPT-2 split rule
    without unicode classes) next to the whitespace count: the
    cost-estimation op of a training pipeline. One vectorized RE2 pass
    per batch (``pc.count_substring_regex``), no shuffle."""
    def _count(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        trimmed = pc.utf8_trim(
            pc.replace_substring_regex(text, WS_PATTERN, " "), " ")
        splits = pc.split_pattern(trimmed, " ")
        ws = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int64()),
                        pc.cast(pc.list_value_length(splits), pa.int64()))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": pc.cast(
                pc.count_substring_regex(text, BPE_PATTERN), pa.int64()),
            "n_ws_tokens": ws,
        })

    return _read_docs(sf_dir).map_batches(_count, batch_format="pyarrow")


def length_quantiles_by_lang(sf_dir: str,
                             qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-language document-length quantiles (per-group length-filter
    thresholds) — the grouped variant of :func:`length_quantiles_docs`."""
    from ..stages.agg import grouped_quantiles_disc

    return grouped_quantiles_disc(_read_docs(sf_dir, ("lang", "n_chars")),
                                  "lang", "n_chars", list(qs))


SHARD_SHUFFLE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("shard", pa.int64()),
    ("pos", pa.int64()),
])


def shard_shuffle_docs(sf_dir: str, n_shards: int = 8,
                       cfg: EngineConfig = DEFAULT_CONFIG):
    """Deterministic global shuffle + shard assignment — the
    pre-training data-order primitive: every doc gets a shard
    (``int(md5(doc_id)[:8], 16) % n_shards``) and a position within the
    shard (rank of its full md5 hex, ties by doc_id), all a pure
    function of identity. Reruns, partial rebuilds and different
    cluster sizes produce byte-identical epoch order; resuming a
    crashed write means re-emitting only missing shards.

    Scale shape: one column-pruned read (doc_id only), a vectorized
    md5+bucket pass, then the shard-keyed exchange where each partition
    holds complete shards — the in-partition sort by (md5, doc_id) is
    the ONLY ordering work, there is no global sort. At 100 TB rows
    shuffled = rows out (inherent for a permutation), but each row is
    24 bytes, not the document."""
    from ..stages.exchange import exchange_map_groups
    from ..functions.segscore import _to_bytes_array

    n_shards_u = np.uint64(n_shards)

    def _key(batch: pa.Table) -> pa.Table:
        ids_s = pc.cast(batch["doc_id"], pa.string()).combine_chunks()
        md5 = _md5_column(ids_s)
        shard = (_hex8_to_int(md5) % n_shards_u).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "shard": pa.array(shard, pa.int64()),
            "h": md5,
        })

    def _rank(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return SHARD_SHUFFLE_SCHEMA.empty_table()
        ids = np.asarray(part["doc_id"], np.int64)
        shard = np.asarray(part["shard"], np.int64)
        h = _to_bytes_array(part["h"].combine_chunks())
        # one lexsort; positions restart at 0 per shard via group offsets
        order = np.lexsort((ids, h, shard))
        s_sorted = shard[order]
        starts = np.flatnonzero(np.r_[True, s_sorted[1:] != s_sorted[:-1]])
        pos = np.arange(len(order), dtype=np.int64)
        pos -= np.repeat(starts, np.diff(np.r_[starts, len(order)]))
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "shard": pa.array(s_sorted, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
        })

    keyed = _read_docs(sf_dir, ("doc_id",)).map_batches(
        _key, batch_format="pyarrow")
    return exchange_map_groups(keyed, "shard", n_shards, _rank,
                               SHARD_SHUFFLE_SCHEMA)


REPETITION_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("n_tokens", pa.int64()),
    ("n_distinct", pa.int64()),
    ("top_count", pa.int64()),
])


def repetition_stats_docs(sf_dir: str):
    """Per-document token-repetition stats — the Gopher-style quality
    rule "fraction of tokens in the most common token" (Rae et al. '21
    §A1.1) reduced to integer-exact counts (n_tokens / n_distinct /
    top_count; the filter thresholds ratios of these downstream).

    Embarrassingly parallel, no shuffle: per batch the token lists
    flatten to ONE fixed-width bytes array, and a single lexsort over
    (row, token) + run-length pass yields every row's distinct and top
    counts — no per-row Python, exact vs DuckDB's split/unnest/count
    (token identity compared as bytes, not 64-bit hashes, so hash
    collisions cannot skew the counts)."""
    def _stats(batch: pa.Table) -> pa.Table:
        ntok, n_distinct, top = _repetition_counts(batch["text"],
                                                   batch.num_rows)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(ntok, pa.int64()),
            "n_distinct": pa.array(n_distinct.astype(np.int64),
                                   pa.int64()),
            "top_count": pa.array(top, pa.int64()),
        })

    return _read_docs(sf_dir).map_batches(_stats, batch_format="pyarrow")


def _repetition_counts(text_col, n: int):
    """(n_tokens, n_distinct, top_count) int64 arrays per row — one
    lexsort + run-length pass over the flattened token bytes."""
    from ..functions.segscore import _to_bytes_array

    text = pc.fill_null(text_col, "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    ntok = np.asarray(pc.list_value_length(toks), np.int64)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    tb = _to_bytes_array(flat)
    row = np.repeat(np.arange(n, dtype=np.int64), ntok)
    order = np.lexsort((tb, row))
    rs, ts = row[order], tb[order]
    if rs.size:
        new_run = np.r_[True, (rs[1:] != rs[:-1]) | (ts[1:] != ts[:-1])]
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        run_row = rs[new_run]
        n_distinct = np.bincount(run_row, minlength=n)
        top = np.zeros(n, np.int64)
        np.maximum.at(top, run_row, run_len)
    else:
        n_distinct = np.zeros(n, np.int64)
        top = np.zeros(n, np.int64)
    return ntok, n_distinct, top


def _word_trigram_bytes(text: pa.Array | pa.ChunkedArray):
    """(row_index, trigram-bytes S-array) for every word trigram of every
    row — one split + three shifted takes + one element-wise join, no
    per-row Python."""
    from ..functions.segscore import _to_bytes_array

    text = pc.fill_null(text, "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    ntok = np.asarray(pc.list_value_length(toks), np.int64)
    flat = toks.flatten()
    row = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
    if len(flat) < 3:
        return np.empty(0, np.int64), np.empty(0, "S1")
    valid = np.flatnonzero(row[:-2] == row[2:])
    if valid.size == 0:
        return np.empty(0, np.int64), np.empty(0, "S1")
    iv = pa.array(valid, pa.int64())
    iv1 = pa.array(valid + 1, pa.int64())
    iv2 = pa.array(valid + 2, pa.int64())
    tri = pc.binary_join_element_wise(flat.take(iv), flat.take(iv1),
                                      flat.take(iv2), " ")
    return row[valid], _to_bytes_array(tri)


DECONTAM_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("n_hits", pa.int64()),
])


def _bench_trigram_set(path: str, nb: int) -> np.ndarray:
    """Sorted unique trigram bytes of the benchmark docs (doc_id < nb) —
    built off-driver via ``ray.remote`` so the driver never touches the
    bench texts."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["doc_id", "text"],
                        filters=[("doc_id", "<", nb)])
    _, tri = _word_trigram_bytes(tbl["text"])
    return np.unique(tri)


def _trigram_hits(batch_text, n_rows: int, bench: np.ndarray) -> np.ndarray:
    """Per-row count of trigram positions present in ``bench`` (sorted
    S-array) — exact bytes membership via one searchsorted."""
    row, tri = _word_trigram_bytes(batch_text)
    hits = np.zeros(n_rows, np.int64)
    if tri.size and bench.size:
        w = max(tri.dtype.itemsize, bench.dtype.itemsize)
        t_w = tri.astype(f"S{w}")
        b_w = bench.astype(f"S{w}")
        pos = np.searchsorted(b_w, t_w)
        posc = np.minimum(pos, len(b_w) - 1)
        member = b_w[posc] == t_w
        np.add.at(hits, row[member], 1)
    return hits


def decontaminate_docs(sf_dir: str, n_bench: int = 10):
    """Benchmark decontamination — the eval-leakage guard of a training
    pipeline: every corpus document (``doc_id >= n_bench``) is scored by
    how many of its word-trigram positions also occur in the benchmark
    set (here: the trigrams of docs ``doc_id < n_bench``, standing in
    for an eval suite); ``n_hits == 0`` is the keep condition.

    100-TB shape: the benchmark trigram set is tiny and BROADCAST
    (``ray.put`` once — built off-driver in a remote task), the corpus
    pass is embarrassingly parallel, membership is one ``searchsorted``
    per batch against the sorted trigram bytes (exact bytes comparison,
    no hash collisions), and nothing shuffles."""
    path = f"{sf_dir}/documents.parquet"
    bench_ref = _ray.remote(_bench_trigram_set).remote(path, n_bench)

    def _score(batch: pa.Table) -> pa.Table:
        bench = _ray.get(bench_ref)
        hits = _trigram_hits(batch["text"], batch.num_rows, bench)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_hits": pa.array(hits, pa.int64())})

    ds = read_parquet_clean(path, columns=["doc_id", "text"])
    return (ds.filter(expr=f"doc_id >= {n_bench}")
            .map_batches(_score, batch_format="pyarrow"))


CURATE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("lang", pa.string()),
    ("n_chars", pa.int64()),
])


def curate_docs(sf_dir: str, n_bench: int = 10,
                q_band=(0.10, 0.90), rep_factor: int = 4):
    """Capstone curation pipeline — the composed quality gate a
    training-data run applies before tokenization, every stage an
    operator this engine already owns:

    1. exact length thresholds from the distributed value histogram
       (``quantiles_disc`` — DuckDB ``quantile_disc`` semantics);
    2. repetition gate (``top_count × rep_factor ≤ n_tokens``, the
       Gopher A1.1 most-common-token rule on integer counts);
    3. benchmark decontamination (zero eval-set trigram hits, broadcast
       set);
    4. survivors projected to (doc_id, lang, n_chars).

    One histogram exchange for the thresholds, then ONE embarrassingly-
    parallel scoring pass — the per-doc signals never shuffle and never
    meet a join; the keep decision is made in-kernel per batch."""
    from ..stages.agg import quantiles_disc

    qrows = {r["q"]: r["value"] for r in quantiles_disc(
        _read_docs(sf_dir, ("n_chars",)), "n_chars",
        list(q_band)).to_pylist()}
    lo, hi = int(qrows[q_band[0]]), int(qrows[q_band[1]])

    path = f"{sf_dir}/documents.parquet"
    bench_ref = _ray.remote(_bench_trigram_set).remote(path, n_bench)

    def _keep(batch: pa.Table) -> pa.Table:
        bench = _ray.get(bench_ref)
        n = batch.num_rows
        ntok, _, top = _repetition_counts(batch["text"], n)
        hits = _trigram_hits(batch["text"], n, bench)
        nch = np.asarray(batch["n_chars"], np.int64)
        keep = ((nch >= lo) & (nch <= hi)
                & (top * rep_factor <= ntok) & (hits == 0))
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "n_chars": batch["n_chars"],
        }).filter(pa.array(keep)).cast(CURATE_SCHEMA)

    ds = read_parquet_clean(
        path, columns=["doc_id", "text", "lang", "n_chars"])
    return (ds.filter(expr=f"doc_id >= {n_bench}")
            .map_batches(_keep, batch_format="pyarrow"))


CURATE_JOB_SCHEMA = pa.schema([("doc_id", pa.int64()),
                               ("n_chars", pa.int64())])


def curate_job_docs(sf_dir: str, n_bench: int = 25, n_shards: int = 8,
                    max_len: int = 2048,
                    cfg: EngineConfig = DEFAULT_CONFIG):
    """The full training-data curation JOB, end to end: Gopher quality
    gate → exact-md5 benchmark decontamination → exact dedup (keep min
    doc_id per normalized text) → GPT sequence-packing offsets over the
    survivors. What a 100 TB pre-training run actually executes before
    tokenization, as ONE streaming pipeline:

    - stage 1 is map-only (profile + gate + bench-set membership + a
      block-local dedup pre-pick — only candidate representatives leave
      the block; the bench md5 set is built off-driver and broadcast);
    - stage 2 is the one content-hash exchange resolving the global
      representative per distinct text (md5 string co-locates AND
      decides — no 64-bit-collision risk);
    - stage 3 is :func:`pack_offsets`'s shard exchange (24-byte rows).

    Two bounded exchanges total, both over already-reduced rows; the
    corpus text is read exactly once. Fully SQL-expressible, so the
    composite has a DuckDB oracle twin (the component oracles composed
    as CTEs)."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    path = f"{sf_dir}/documents.parquet"
    bench_ref = _ray.remote(_bench_md5_set).remote(path, n_bench)
    group_parts = cfg.exec.group_parts
    partial_schema = pa.schema([
        ("text_md5", pa.string()), ("doc_id", pa.int64()),
        ("n_chars", pa.int64()), ("md5_part", pa.int64())])

    def _gate_partial(batch: pa.Table) -> pa.Table:
        bench = _ray.get(bench_ref)
        _, n_tok, _, sum_len, n_stop = _doc_token_profile(batch)
        div = np.maximum(n_tok, 1)
        mwl = sum_len * 1000 // div
        stp = n_stop * 1_000_000 // div
        md5col = _normalize_md5_batch(batch)["text_md5"]
        if isinstance(md5col, pa.ChunkedArray):
            md5col = md5col.combine_chunks()
        mb = _to_bytes_array(md5col)
        if bench.size:
            w = max(mb.dtype.itemsize, bench.dtype.itemsize)
            bw = bench.astype(f"S{w}")
            pos = np.minimum(np.searchsorted(bw, mb.astype(f"S{w}")),
                             len(bw) - 1)
            hit = bw[pos] == mb.astype(f"S{w}")
        else:
            hit = np.zeros(len(mb), bool)
        keep = ((n_tok >= QUALITY_WORDS_LO) & (n_tok <= QUALITY_WORDS_HI)
                & (mwl >= QUALITY_MWL_LO_E3) & (mwl <= QUALITY_MWL_HI_E3)
                & (stp >= QUALITY_STOP_MIN_E6) & ~hit)
        ids = np.asarray(batch["doc_id"], np.int64)[keep]
        nch = np.asarray(batch["n_chars"], np.int64)[keep]
        m = mb[keep]
        if not len(m):
            return partial_schema.empty_table()
        order = np.lexsort((ids, m))
        m_s, ids_s, nch_s = m[order], ids[order], nch[order]
        first = np.r_[True, m_s[1:] != m_s[:-1]]
        u = m_s[first]
        return pa.table({
            "text_md5": _s_fixed_to_string_array(u),
            "doc_id": pa.array(ids_s[first], pa.int64()),
            "n_chars": pa.array(nch_s[first], pa.int64()),
            "md5_part": pa.array(hash_strings64(u) % group_parts,
                                 pa.int64()),
        })

    def _resolve(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return CURATE_JOB_SCHEMA.empty_table()
        m = _to_bytes_array(part["text_md5"])
        ids = np.asarray(part["doc_id"], np.int64)
        nch = np.asarray(part["n_chars"], np.int64)
        order = np.lexsort((ids, m))
        m_s, ids_s, nch_s = m[order], ids[order], nch[order]
        first = np.r_[True, m_s[1:] != m_s[:-1]]
        return pa.table({
            "doc_id": pa.array(ids_s[first], pa.int64()),
            "n_chars": pa.array(nch_s[first], pa.int64()),
        })

    gated = (read_parquet_clean(
        path, columns=["doc_id", "text", "n_chars"])
        .filter(expr=f"doc_id >= {n_bench}")
        .map_batches(_gate_partial, batch_format="pyarrow"))
    kept = exchange_map_groups(gated, "md5_part",
                               2 * resolve_num_partitions(cfg),
                               _resolve, CURATE_JOB_SCHEMA)
    return pack_offsets(kept, n_shards=n_shards, max_len=max_len)


# ---------------------------------------------------------------------------
# term frequency / TF-IDF — the vocabulary-statistics family
# ---------------------------------------------------------------------------

def _tf_rows_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, tok, tf) rows for every non-empty whitespace token of
    every document in the batch — exact per-document term frequencies.

    One split + one lexsort + one run-length pass over the flattened
    token bytes (the `_repetition_counts` kernel shape); a document
    lives in exactly one row, so block-local counts are globally exact
    with no shuffle. Token strings are taken back out of the original
    Arrow flat array (no bytes→str re-decode)."""
    from ..functions.segscore import _to_bytes_array

    n = batch.num_rows
    text = pc.fill_null(batch["text"], "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    ntok = np.asarray(pc.list_value_length(toks), np.int64)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    row = np.repeat(np.arange(n, dtype=np.int64), ntok)
    nonempty = np.flatnonzero(
        np.asarray(pc.binary_length(flat), np.int64) > 0)
    out_schema = pa.schema([("doc_id", pa.int64()), ("tok", pa.string()),
                            ("tf", pa.int64())])
    if nonempty.size == 0:
        return out_schema.empty_table()
    tb = _to_bytes_array(flat)[nonempty]
    rs = row[nonempty]
    order = np.lexsort((tb, rs))
    rs_s, tb_s = rs[order], tb[order]
    new_run = np.r_[True, (rs_s[1:] != rs_s[:-1]) | (tb_s[1:] != tb_s[:-1])]
    run_id = np.cumsum(new_run) - 1
    run_len = np.bincount(run_id)
    first_flat_idx = nonempty[order[new_run]]
    doc_ids = np.asarray(batch["doc_id"], np.int64)[rs_s[new_run]]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "tok": flat.take(pa.array(first_flat_idx, pa.int64())),
        "tf": pa.array(run_len.astype(np.int64), pa.int64()),
    }).cast(out_schema)


def _doc_tf(sf_dir: str):
    return _read_docs(sf_dir).map_batches(_tf_rows_batch,
                                          batch_format="pyarrow")


def top_tokens_docs(sf_dir: str, k: int = 50):
    """Global top-k vocabulary — the word-count canon at scale: exact
    per-(doc, token) counts in one block-local pass, `grouped_sums`
    exchange of the (token, partial-count) rows only, per-partition
    top-k truncation, then the final sort+limit runs over ≤ k×partitions
    candidate rows — the full vocabulary never leaves its partitions."""
    from ..functions.segscore import _to_bytes_array
    from ..stages.agg import grouped_sums

    g = grouped_sums(_doc_tf(sf_dir).select_columns(["tok", "tf"]),
                     ["tok"], ["tf"])

    def _blk_topk(t: pa.Table) -> pa.Table:
        out = pa.table({"tok": t["tok"],
                        "n_occurrences": t["sum_tf"]})
        if out.num_rows <= k:
            return out
        nv = np.asarray(out["n_occurrences"], np.int64)
        tb = _to_bytes_array(out["tok"].combine_chunks())
        idx = np.lexsort((tb, -nv))[:k]
        return out.take(pa.array(np.sort(idx), pa.int64()))

    return (g.map_batches(_blk_topk, batch_format="pyarrow")
            .sort(["n_occurrences", "tok"], descending=[True, False])
            .limit(k))


def tfidf_top_terms_docs(sf_dir: str, k: int = 3):
    """Per-document top-k TF-IDF terms: exact (doc, token, tf) rows, a
    `grouped_sums` document-frequency table, the STRING-KEYED big-big
    hash join on the exchange (df is vocabulary-sized — broadcast it
    when it fits, but the exchange join is the shape that survives a
    vocabulary larger than a worker's heap), then `grouped_topk` per
    doc. The idf weight is the exact rational ``N/df`` at 1e4 scale
    (integer floor division, no float log) so partial/merge order cannot
    perturb the ranking and the DuckDB twin hashes identically."""
    import pyarrow.dataset as pads

    from ..stages.agg import grouped_sums, grouped_topk
    from ..stages.join import hash_join_exchange
    from ..config import resolve_num_partitions

    # tf feeds BOTH the df aggregate and the join probe side; materialize
    # it once so the tokenize kernel doesn't run twice (the exchange
    # stages materialize their inputs regardless)
    tf = _doc_tf(sf_dir).materialize()
    df = grouped_sums(tf.select_columns(["tok"]), ["tok"], [],
                      count_as="df")
    # N from Parquet row-group metadata — no data read
    n_docs = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()

    # token keys are Zipf-skewed (a stop-word's tf rows are a constant
    # fraction of the corpus): salt the join so a hot token's probe rows
    # spread over 8 partitions — the df build side (1 row/token) costs
    # 8× replication, i.e. nothing
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    joined = hash_join_exchange(
        tf, df, key="tok", left_cols=["doc_id", "tf"], right_cols=["df"],
        n_parts=n_parts, salt=min(8, n_parts))

    def _score(t: pa.Table) -> pa.Table:
        tfv = np.asarray(t["tf"], np.int64)
        dfv = np.asarray(t["df"], np.int64)
        score = (tfv * np.int64(n_docs) * np.int64(10000)) // dfv
        return pa.table({
            "doc_id": t["doc_id"], "tok": t["tok"], "tf": t["tf"],
            "df": t["df"], "score_e4": pa.array(score, pa.int64()),
        })

    scored = joined.map_batches(_score, batch_format="pyarrow")
    return grouped_topk(scored, "doc_id", "score_e4", k, "tok")


PACK_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("shard", pa.int64()),
    ("start_char", pa.int64()), ("start_seq", pa.int64()),
    ("start_offset", pa.int64()), ("end_seq", pa.int64()),
])


def pack_docs_offsets(sf_dir: str, n_shards: int = 8,
                      max_len: int = 2048):
    """GPT-style sequence packing offsets — concatenate every shard's
    document stream (the `shard_shuffle_docs` deterministic order:
    md5-bucket shard, (md5, doc_id) order within) and cut it into
    fixed ``max_len``-char training sequences; documents SPLIT across
    sequence boundaries, the standard pretraining pack. Emits, per doc:
    its global char offset in the shard stream, the sequence it starts
    in, the offset within that sequence, and the sequence it ends in —
    everything a loader needs to materialize sequence i without
    scanning the stream.

    Scale shape: identical to `shard_shuffle_docs` (24-byte rows through
    the shard exchange, one lexsort + prefix-sum per partition); offsets
    are a pure function of identity + length, so reruns and different
    cluster sizes are byte-identical and a loader can resume mid-epoch."""
    return pack_offsets(_read_docs(sf_dir, ("doc_id", "n_chars")),
                        n_shards=n_shards, max_len=max_len)


def pack_offsets(ds, n_shards: int = 8, max_len: int = 2048):
    """Sequence-packing offsets over any (doc_id, n_chars) Dataset —
    the :func:`pack_docs_offsets` kernel, reusable downstream of a
    curation/dedup stage (see :func:`curate_job_docs`)."""
    from ..functions.segscore import _to_bytes_array
    from ..stages.exchange import exchange_map_groups

    n_shards_u = np.uint64(n_shards)

    def _key(batch: pa.Table) -> pa.Table:
        ids_s = pc.cast(batch["doc_id"], pa.string()).combine_chunks()
        md5 = _md5_column(ids_s)
        shard = (_hex8_to_int(md5) % n_shards_u).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": batch["n_chars"].combine_chunks().cast(pa.int64()),
            "shard": pa.array(shard, pa.int64()),
            "h": md5,
        })

    def _pack(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return PACK_SCHEMA.empty_table()
        ids = np.asarray(part["doc_id"], np.int64)
        nch = np.asarray(part["n_chars"], np.int64)
        shard = np.asarray(part["shard"], np.int64)
        h = _to_bytes_array(part["h"].combine_chunks())
        order = np.lexsort((ids, h, shard))
        s_s, n_s, i_s = shard[order], nch[order], ids[order]
        cs = np.cumsum(n_s)
        starts = np.flatnonzero(np.r_[True, s_s[1:] != s_s[:-1]])
        lens = np.diff(np.r_[starts, len(s_s)])
        base = np.repeat(cs[starts] - n_s[starts], lens)
        start = cs - n_s - base            # char offset in shard stream
        end = start + np.maximum(n_s, 1) - 1
        return pa.table({
            "doc_id": pa.array(i_s, pa.int64()),
            "shard": pa.array(s_s, pa.int64()),
            "start_char": pa.array(start, pa.int64()),
            "start_seq": pa.array(start // max_len, pa.int64()),
            "start_offset": pa.array(start % max_len, pa.int64()),
            "end_seq": pa.array(end // max_len, pa.int64()),
        })

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    return exchange_map_groups(keyed, "shard", n_shards, _pack,
                               PACK_SCHEMA)


def docs_global_ranked(sf_dir: str):
    """Global total-order sort of the corpus by (n_chars, doc_id) with the
    exact 1-based rank — ``row_number() OVER (ORDER BY n_chars, doc_id)``
    — on the range-partition sample sort (``stages/sort.py``), not Ray's
    serial-bottlenecked ``Dataset.sort``. Output blocks ARE the range
    partitions in order: a curriculum loader (shortest-first scheduling)
    or a length-bucketed writer consumes them as already-sorted shards."""
    from ..stages.sort import range_partition_sort

    return range_partition_sort(
        _read_docs(sf_dir, ("doc_id", "n_chars")), "n_chars", "doc_id",
        schema=pa.schema([("doc_id", pa.int64()),
                          ("n_chars", pa.int64())]))


def mixing_weights_docs(sf_dir: str):
    """Data-mixing weights per source: char totals via one
    ``grouped_sums`` exchange (only per-block partials shuffle), then the
    source-count-sized weight table finishes on the driver. Weights are
    exact integer rationals (x1e6, floor) so the oracle compare is
    bit-stable: ``share_e6`` = the source's share of total chars,
    ``weight_e6`` = the up/down-sampling factor that equalizes source
    shares (total / (n_sources * source_chars)) — the standard
    temperature-1 uniform-mixing weight."""
    from ..stages.agg import grouped_sums

    t = grouped_sums(_read_docs(sf_dir, ("source", "n_chars")),
                     ["source"], ["n_chars"], count_as="n_docs")
    rows = sorted(t.take_all(), key=lambda r: r["source"])
    total = sum(r["sum_n_chars"] for r in rows)
    s = len(rows)
    return pa.table({
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
        "sum_n_chars": pa.array([r["sum_n_chars"] for r in rows],
                                pa.int64()),
        "share_e6": pa.array(
            [r["sum_n_chars"] * 1_000_000 // total for r in rows],
            pa.int64()),
        "weight_e6": pa.array(
            [total * 1_000_000 // (s * r["sum_n_chars"]) for r in rows],
            pa.int64()),
    })


RANK_LANG_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("lang", pa.string()),
    ("n_chars", pa.int64()), ("rn", pa.int64()), ("pr_e6", pa.int64()),
])


def length_rank_by_lang(sf_dir: str, n_parts: int | None = None):
    """Per-language length rank + percent_rank:
    ``row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)``
    and the exact-integer percentile ``(rn-1)*1e6 // (n_lang-1)``. One
    lang-hash exchange, one lexsort + run-length pass per partition —
    every language lands whole in one partition so both the rank and the
    group size are exact without a second shuffle. Zipf caveat: a
    dominant language concentrates in one partition; for a one-language
    corpus use :func:`docs_global_ranked`'s range sort instead."""
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    if n_parts is None:
        from ..config import resolve_num_partitions
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _key(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].combine_chunks()
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": lang,
            "n_chars": batch["n_chars"].combine_chunks().cast(pa.int64()),
            "lang_part": pa.array(hash_strings64(lang) % 1024, pa.int64()),
        })

    def _rank(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return RANK_LANG_SCHEMA.empty_table()
        lb = _to_bytes_array(part["lang"].combine_chunks())
        ids = np.asarray(part["doc_id"], np.int64)
        nch = np.asarray(part["n_chars"], np.int64)
        order = np.lexsort((ids, nch, lb))
        lb_s = lb[order]
        starts = np.flatnonzero(np.r_[True, lb_s[1:] != lb_s[:-1]])
        lens = np.diff(np.r_[starts, len(lb_s)])
        rn = (np.arange(len(lb_s), dtype=np.int64)
              - np.repeat(starts, lens))
        n_grp = np.repeat(lens, lens)
        pr = np.where(n_grp > 1, rn * 1_000_000 // np.maximum(n_grp - 1, 1),
                      0)
        return pa.table({
            "doc_id": pa.array(ids[order]),
            "lang": part["lang"].combine_chunks().take(
                pa.array(order, pa.int64())),
            "n_chars": pa.array(nch[order]),
            "rn": pa.array(rn + 1),
            "pr_e6": pa.array(pr),
        })

    keyed = _read_docs(sf_dir, ("doc_id", "lang", "n_chars")).map_batches(
        _key, batch_format="pyarrow")
    return exchange_map_groups(keyed, "lang_part", n_parts, _rank,
                               RANK_LANG_SCHEMA)


# PII patterns — RE2 syntax, identical engine on both sides of the oracle
# (pyarrow count_substring_regex and DuckDB regexp_extract_all are RE2)
PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "n_phones": r"\+?\d[\d() -]{7,}\d",
}


def pii_scan_docs(sf_dir: str):
    """Per-doc PII hit counts (emails / IPv4 / phone-shaped numbers) —
    one RE2 pass per pattern per batch, zero shuffle. The filter/redact
    step of a curation pipeline keys off ``has_pii``. Patterns are
    deliberately RE2-portable so the DuckDB oracle runs the SAME regex
    engine; a count here is a count there."""
    def _scan(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        cols = {"doc_id": batch["doc_id"]}
        total = None
        for name, pat in PII_PATTERNS.items():
            c = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
            cols[name] = c
            total = c if total is None else pc.add(total, c)
        cols["has_pii"] = pc.cast(pc.greater(total, 0), pa.int64())
        return pa.table(cols)

    return _read_docs(sf_dir).map_batches(_scan, batch_format="pyarrow")


def pii_redact_docs(sf_dir: str, replacement: str = "[PII]"):
    """Redaction twin of :func:`pii_scan_docs`: every PII match replaced
    in-stream (``replace_substring_regex`` per pattern), emitting
    (doc_id, text) with the same schema as the input corpus — a drop-in
    cleaned shard writer."""
    def _redact(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        for pat in PII_PATTERNS.values():
            text = pc.replace_substring_regex(text, pat,
                                              replacement=replacement)
        return pa.table({"doc_id": batch["doc_id"], "text": text})

    return _read_docs(sf_dir).map_batches(_redact, batch_format="pyarrow")


BUDGET_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("source", pa.string()),
    ("n_chars", pa.int64()), ("cum_chars", pa.int64()),
])


def budget_sample_docs(sf_dir: str, budget_chars: int = 4096,
                       n_parts: int | None = None):
    """Deterministic data selection to a per-source budget: within each
    source, docs are taken in hash-priority order (md5(doc_id), doc_id —
    the `shard_shuffle_docs` order, i.e. a uniform-but-reproducible
    sample) while the running char total stays ≤ ``budget_chars``. The
    standard "cap every source at B tokens" mixing step, as a pure
    function of identity — reruns, shards and cluster sizes all select
    the same docs, so a resumed job never double-samples.

    Shape: 16-byte-plus-source rows through one source-hash exchange;
    per partition one lexsort + segmented prefix-sum; the fact table
    never shuffles. Emits the kept docs with their inclusive running
    total (the loader's progress cursor)."""
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    if n_parts is None:
        from ..config import resolve_num_partitions
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _key(batch: pa.Table) -> pa.Table:
        ids_s = pc.cast(batch["doc_id"], pa.string()).combine_chunks()
        src = batch["source"].combine_chunks()
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": src,
            "n_chars": batch["n_chars"].combine_chunks().cast(pa.int64()),
            "h": _md5_column(ids_s),
            "src_part": pa.array(hash_strings64(src) % 1024, pa.int64()),
        })

    def _fill(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return BUDGET_SCHEMA.empty_table()
        ids = np.asarray(part["doc_id"], np.int64)
        nch = np.asarray(part["n_chars"], np.int64)
        src = _to_bytes_array(part["source"].combine_chunks())
        h = _to_bytes_array(part["h"].combine_chunks())
        order = np.lexsort((ids, h, src))
        src_s, nch_s = src[order], nch[order]
        cs = np.cumsum(nch_s)
        starts = np.flatnonzero(np.r_[True, src_s[1:] != src_s[:-1]])
        lens = np.diff(np.r_[starts, len(src_s)])
        base = np.repeat(cs[starts] - nch_s[starts], lens)
        cum = cs - base                       # inclusive per-source total
        keep = cum <= budget_chars
        take = pa.array(order[keep], pa.int64())
        return pa.table({
            "doc_id": part["doc_id"].take(take),
            "source": part["source"].take(take),
            "n_chars": part["n_chars"].take(take),
            "cum_chars": pa.array(cum[keep], pa.int64()),
        }).cast(BUDGET_SCHEMA)

    keyed = _read_docs(sf_dir, ("doc_id", "source", "n_chars")).map_batches(
        _key, batch_format="pyarrow")
    return exchange_map_groups(keyed, "src_part", n_parts, _fill,
                               BUDGET_SCHEMA)


def heavy_hitters_docs(sf_dir: str, k: int = 10, m: int = 128):
    """Approximate-then-verify heavy hitters (Misra–Gries-style): each
    block emits only tokens whose in-block count exceeds
    ``block_tokens/(m+1)`` — at most m rows per block, so the exchange
    carries O(m·blocks) rows no matter how large the vocabulary grows
    (the frequency-bound twin of `top_tokens_docs`, which ships every
    distinct token's partial). The dropped mass per token is
    ≤ N/(m+1) globally, so every token with true frequency above that
    bound survives; the top 2k survivors by approximate count then get
    EXACT counts in one candidate-broadcast pass (32-byte membership
    searchsorted per batch, no shuffle) and the final top-k is exact
    whenever the k-th true count clears the bound — asserted in the
    test, and true by orders of magnitude on Zipf text."""
    from ..functions.segscore import _to_bytes_array
    from ..stages.agg import grouped_sums

    def _mg_partial(batch: pa.Table) -> pa.Table:
        # block-level counts only (no per-doc granularity): tokenize →
        # ONE argsort over the flat token bytes → run-length sums →
        # MG threshold. Half the sort work of the tf-rows kernel.
        out_schema = pa.schema([("tok", pa.string()), ("tf", pa.int64())])
        if batch.num_rows == 0:
            return out_schema.empty_table()
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        tb = _to_bytes_array(flat)
        nonempty = np.flatnonzero(
            np.asarray(pc.binary_length(flat), np.int64) > 0)
        if nonempty.size == 0:
            return out_schema.empty_table()
        tb = tb[nonempty]
        order = np.argsort(tb, kind="stable")
        tb_s = tb[order]
        starts = np.flatnonzero(np.r_[True, tb_s[1:] != tb_s[:-1]])
        sums = np.diff(np.r_[starts, len(tb_s)])
        keep = sums > len(tb_s) // (m + 1)
        idx = nonempty[order[starts[keep]]]
        return pa.table({
            "tok": flat.take(pa.array(idx, pa.int64())),
            "tf": pa.array(sums[keep], pa.int64()),
        })

    approx = grouped_sums(
        _read_docs(sf_dir).map_batches(_mg_partial,
                                       batch_format="pyarrow"),
        ["tok"], ["tf"]).take_all()
    approx.sort(key=lambda r: (-r["sum_tf"], r["tok"]))
    cand = np.sort(np.array([r["tok"].encode() for r in approx[:2 * k]],
                            dtype=bytes))
    cand_ref = _ray.put(cand)

    def _exact(batch: pa.Table) -> pa.Table:
        # global candidate counts only — filter the FLAT token stream
        # against the (tiny) candidate set BEFORE any sort, so the
        # second pass costs tokenize + membership, not a full lexsort
        cset = _ray.get(cand_ref)
        out_schema = pa.schema([("tok", pa.string()), ("tf", pa.int64())])
        if batch.num_rows == 0 or cset.size == 0:
            return out_schema.empty_table()
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat = pc.split_pattern(text, " ")
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        flat = flat.flatten()
        tb = _to_bytes_array(flat)
        w = max(tb.dtype.itemsize, cset.dtype.itemsize, 1)
        cs_w = cset.astype(f"S{w}")
        pos = np.minimum(np.searchsorted(cs_w, tb.astype(f"S{w}")),
                         cs_w.size - 1)
        # pos doubles as the candidate index: count hits per candidate
        hit = cs_w[pos] == tb.astype(f"S{w}")
        cnt = np.bincount(pos[hit], minlength=cs_w.size)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "tok": pa.array([cset[i].decode() for i in nz], pa.string()),
            "tf": pa.array(cnt[nz], pa.int64()),
        })

    g = grouped_sums(
        _read_docs(sf_dir).map_batches(_exact, batch_format="pyarrow"),
        ["tok"], ["tf"])

    def _rename(t: pa.Table) -> pa.Table:
        return pa.table({"tok": t["tok"], "n_occurrences": t["sum_tf"]})

    return (g.map_batches(_rename, batch_format="pyarrow")
            .sort(["n_occurrences", "tok"], descending=[True, False])
            .limit(k))


CHUNK_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
    ("chunk_start", pa.int64()), ("chunk_end", pa.int64()),
])


def chunk_docs_offsets(sf_dir: str, size: int = 512, overlap: int = 64):
    """RAG-style overlapping chunk offsets: each document yields chunks
    of ``size`` chars starting every ``size - overlap`` chars (last
    chunk clipped at the doc end) — the retrieval-index chunking step,
    emitted as offsets so the loader slices text lazily. Pure function
    of n_chars: zero shuffle, one repeat/arange pair-emission per batch
    (same chunked expansion discipline as the range-join kernel)."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap

    def _chunks(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return CHUNK_SCHEMA.empty_table()
        ids = np.asarray(batch["doc_id"], np.int64)
        nch = np.asarray(batch["n_chars"], np.int64)
        # number of chunks: ceil(max(n - overlap, 1) / stride) for n>0;
        # a doc shorter than size still yields its single clipped chunk
        n_chunks = np.maximum((np.maximum(nch - overlap, 1) + stride - 1)
                              // stride, 1)
        doc = np.repeat(ids, n_chunks)
        nrep = np.repeat(nch, n_chunks)
        starts_of = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        idx = (np.arange(len(doc), dtype=np.int64)
               - np.repeat(starts_of, n_chunks))
        start = idx * stride
        end = np.minimum(start + size, nrep)
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "chunk_idx": pa.array(idx, pa.int64()),
            "chunk_start": pa.array(start, pa.int64()),
            "chunk_end": pa.array(end, pa.int64()),
        })

    return _read_docs(sf_dir, ("doc_id", "n_chars")).map_batches(
        _chunks, batch_format="pyarrow")


NEG_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("neg_idx", pa.int64()),
    ("neg_doc_id", pa.int64()),
])


def negative_samples_docs(sf_dir: str, k: int = 4):
    """Deterministic negative sampling (contrastive-training prep): for
    every document, ``k`` pseudo-random negative doc_ids derived from
    md5(doc_id '#' j) — a pure function of identity, so every rerun,
    shard and cluster size draws the SAME negatives (resume-safe, no
    RNG state to ship) and the DuckDB oracle reproduces them exactly.
    Self-collisions step to the next id. Zero shuffle."""
    import pyarrow.dataset as pads

    # N from Parquet row-group metadata — no data read
    n_docs = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    n_u = np.uint64(n_docs)

    def _negs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return NEG_SCHEMA.empty_table()
        ids = np.asarray(batch["doc_id"], np.int64)
        ids_s = pc.cast(batch["doc_id"], pa.string()).combine_chunks()
        outs = []
        for j in range(k):
            key = pc.binary_join_element_wise(ids_s, f"#{j}", "")
            h = (_hex8_to_int(_md5_column(key)) % n_u).astype(np.int64)
            neg = np.where(h == ids, (h + 1) % n_docs, h)
            outs.append(pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "neg_idx": pa.array(np.full(len(ids), j, np.int64)),
                "neg_doc_id": pa.array(neg, pa.int64()),
            }))
        return pa.concat_tables(outs)

    return _read_docs(sf_dir, ("doc_id",)).map_batches(
        _negs, batch_format="pyarrow")


KEEP_BEST_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("text_md5", pa.string()),
    ("n_chars", pa.int64()),
])


def exact_dedup_keep_best_docs(sf_dir: str, n_parts: int | None = None):
    """Exact dedup with QUALITY-aware representative selection: within
    each duplicate group (whitespace-normalized text md5), keep the
    LONGEST document (doc_id tiebreak) instead of the arbitrary
    min-id — the curation-grade variant of `exact_dedup_docs` (dup
    groups often mix truncated and full copies; keep the full one).
    Groups form on the md5 content-hash exchange and are resolved by a
    run-boundary pass over the FULL md5 string — a 64-bit key hash only
    co-locates, it never merges distinct texts. Block-local pre-pick
    (≤1 row per (block, md5)) bounds the shuffle by distinct texts
    per block, not rows."""
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    if n_parts is None:
        from ..config import resolve_num_partitions
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _pick(t: pa.Table, with_part: bool) -> pa.Table:
        md5 = t["text_md5"].combine_chunks()
        mb = _to_bytes_array(md5)
        nch = np.asarray(t["n_chars"], np.int64)
        ids = np.asarray(t["doc_id"], np.int64)
        order = np.lexsort((ids, -nch, mb))
        mb_s = mb[order]
        first = np.flatnonzero(np.r_[True, mb_s[1:] != mb_s[:-1]])
        idx = pa.array(order[first], pa.int64())
        out = pa.table({
            "doc_id": t["doc_id"].take(idx),
            "text_md5": md5.take(idx),
            "n_chars": t["n_chars"].take(idx),
        })
        if with_part:
            part = hash_strings64(out["text_md5"].combine_chunks()) % 1024
            out = out.append_column("md5_part",
                                    pa.array(part, pa.int64()))
        return out

    def _key(batch: pa.Table) -> pa.Table:
        norm = normalize_column(batch["text"], "ws")
        t = pa.table({
            "doc_id": batch["doc_id"],
            "text_md5": _md5_column(norm),
            "n_chars": batch["n_chars"].combine_chunks().cast(pa.int64()),
        })
        return _pick(t, with_part=True)   # block-local combiner

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return KEEP_BEST_SCHEMA.empty_table()
        return _pick(part.drop_columns(["md5_part"]),
                     with_part=False).cast(KEEP_BEST_SCHEMA)

    keyed = _read_docs(sf_dir, ("doc_id", "text", "n_chars")).map_batches(
        _key, batch_format="pyarrow")
    return exchange_map_groups(keyed, "md5_part", n_parts, _merge,
                               KEEP_BEST_SCHEMA)


# Gopher-style quality gate thresholds (repo defaults; the reference's
# quality heuristics are length/ratio rules of exactly this shape)
QUALITY_WORDS_LO, QUALITY_WORDS_HI = 20, 80
QUALITY_MWL_LO_E3, QUALITY_MWL_HI_E3 = 3800, 5200
QUALITY_STOP_MIN_E6 = 20_000
_QUALITY_STOPWORDS = ("a", "the")


def _doc_token_profile(batch: pa.Table):
    """Per-doc token profile in one split + one lexsort pass: (doc_ids,
    n_tokens, n_unique, sum_token_len, n_stopword) as numpy arrays over
    the batch's non-empty whitespace tokens. The `_tf_rows_batch` kernel
    shape, aggregated per document instead of per (doc, token)."""
    n = batch.num_rows
    text = pc.fill_null(batch["text"], "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    ntok_all = np.asarray(pc.list_value_length(toks), np.int64)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    # CHARACTER length (utf8_length), matching DuckDB len() — byte
    # length silently diverges on non-ASCII text (hypothesis-caught)
    lens = np.asarray(pc.utf8_length(flat), np.int64)
    row = np.repeat(np.arange(n, dtype=np.int64), ntok_all)
    nonempty = lens > 0
    rs = row[nonempty]
    n_tokens = np.bincount(rs, minlength=n)
    # token lengths are tiny ints — the float64 bincount sum is exact
    sum_len = np.bincount(rs, weights=lens[nonempty],
                          minlength=n).astype(np.int64)
    stop = np.asarray(pc.is_in(
        flat, value_set=pa.array(list(_QUALITY_STOPWORDS))))
    n_stop = np.bincount(row[nonempty & stop], minlength=n)
    from ..functions.segscore import _to_bytes_array

    if rs.size:
        tb = _to_bytes_array(flat)[nonempty]
        order = np.lexsort((tb, rs))
        rs_s, tb_s = rs[order], tb[order]
        new_run = np.r_[True,
                        (rs_s[1:] != rs_s[:-1]) | (tb_s[1:] != tb_s[:-1])]
        n_unique = np.bincount(rs_s[new_run], minlength=n)
    else:
        n_unique = np.zeros(n, np.int64)
    doc_ids = np.asarray(batch["doc_id"], np.int64)
    return doc_ids, n_tokens, n_unique, sum_len, n_stop


LEXDIV_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_tokens", pa.int64()),
    ("n_unique", pa.int64()), ("ttr_e6", pa.int64()),
])


def lexical_diversity_docs(sf_dir: str):
    """Per-document type-token ratio (distinct-token share — the
    repetitiveness twin of `repetition_stats_docs`): n_tokens, n_unique
    and exact-integer ttr_e6 = n_unique·1e6 // n_tokens. Map-only (a
    document lives in one row), zero shuffle; empty docs dropped on
    both engines."""

    def _batch(batch: pa.Table) -> pa.Table:
        doc_ids, n_tok, n_uni, _, _ = _doc_token_profile(batch)
        keep = n_tok > 0
        nt, nu = n_tok[keep], n_uni[keep]
        return pa.table({
            "doc_id": pa.array(doc_ids[keep], pa.int64()),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_unique": pa.array(nu, pa.int64()),
            "ttr_e6": pa.array(nu * 1_000_000 // nt, pa.int64()),
        }).cast(LEXDIV_SCHEMA)

    return _read_docs(sf_dir).map_batches(_batch, batch_format="pyarrow")


QUALITY_FILTER_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("n_words", pa.int64()),
    ("mwl_e3", pa.int64()), ("stop_e6", pa.int64()),
    ("kept", pa.int64()),
])


def quality_filter_docs(sf_dir: str):
    """Composite Gopher-style quality gate: word count in range, mean
    word length in range, stopword ratio above floor — each doc scored
    and flagged `kept` in one map-only pass (exact integer rationals,
    no floats). The classic pre-training curation filter; the flags
    stay attached so downstream can audit why a doc dropped."""

    def _batch(batch: pa.Table) -> pa.Table:
        doc_ids, n_tok, _, sum_len, n_stop = _doc_token_profile(batch)
        keep = n_tok > 0
        nw, sl, ns = n_tok[keep], sum_len[keep], n_stop[keep]
        mwl = sl * 1000 // nw
        stp = ns * 1_000_000 // nw
        kept = ((nw >= QUALITY_WORDS_LO) & (nw <= QUALITY_WORDS_HI)
                & (mwl >= QUALITY_MWL_LO_E3) & (mwl <= QUALITY_MWL_HI_E3)
                & (stp >= QUALITY_STOP_MIN_E6))
        return pa.table({
            "doc_id": pa.array(doc_ids[keep], pa.int64()),
            "n_words": pa.array(nw, pa.int64()),
            "mwl_e3": pa.array(mwl, pa.int64()),
            "stop_e6": pa.array(stp, pa.int64()),
            "kept": pa.array(kept.astype(np.int64), pa.int64()),
        }).cast(QUALITY_FILTER_SCHEMA)

    return _read_docs(sf_dir).map_batches(_batch, batch_format="pyarrow")


def _bench_md5_set(path: str, nb: int) -> np.ndarray:
    """Sorted unique normalized-text md5 bytes of the benchmark docs
    (doc_id < nb) — built off-driver in a remote task (the
    `_bench_trigram_set` pattern)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["doc_id", "text"],
                        filters=[("doc_id", "<", nb)])
    md5 = _normalize_md5_batch(tbl)["text_md5"]
    from ..functions.segscore import _to_bytes_array

    if isinstance(md5, pa.ChunkedArray):
        md5 = md5.combine_chunks()
    return np.unique(_to_bytes_array(md5))


def exact_decontaminate_docs(sf_dir: str, n_bench: int = 25):
    """Exact-match benchmark decontamination — the content-hash twin of
    the trigram `decontaminate_docs`: flag every corpus document
    (``doc_id >= n_bench``) whose normalized-text md5 equals some
    benchmark doc's (``doc_id < n_bench``). The bench md5 set is tiny
    and broadcast (built off-driver), the corpus pass is one md5 +
    one sorted-set `searchsorted` per batch, zero shuffle."""
    from ..functions.segscore import _to_bytes_array

    path = f"{sf_dir}/documents.parquet"
    bench_ref = _ray.remote(_bench_md5_set).remote(path, n_bench)

    def _flag(batch: pa.Table) -> pa.Table:
        bench = _ray.get(bench_ref)
        md5 = _normalize_md5_batch(batch)["text_md5"]
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        mb = _to_bytes_array(md5)
        if bench.size:
            w = max(mb.dtype.itemsize, bench.dtype.itemsize)
            b_w = bench.astype(f"S{w}")
            pos = np.minimum(np.searchsorted(b_w, mb.astype(f"S{w}")),
                             len(b_w) - 1)
            hit = b_w[pos] == mb.astype(f"S{w}")
        else:
            hit = np.zeros(len(mb), bool)
        return pa.table({
            "doc_id": batch["doc_id"],
            "contaminated": pa.array(hit.astype(np.int64), pa.int64()),
        })

    ds = _read_docs(sf_dir)
    return (ds.filter(expr=f"doc_id >= {n_bench}")
            .map_batches(_flag, batch_format="pyarrow"))


_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


def source_lang_pivot(sf_dir: str):
    """Crosstab / PIVOT: one row per source with a count column per
    language (`count(*) FILTER (WHERE lang = ...)` — the conditional
    aggregation shape). Rides `grouped_sums` on (source, lang) — only
    ≤ sources×langs partial cells shuffle — then a vectorized widen
    pass per partition (langs are a fixed small set; an unknown lang
    raises rather than silently dropping)."""
    from ..stages.agg import grouped_sums

    ds = _read_docs(sf_dir, columns=("source", "lang"))
    counts = grouped_sums(ds, ["source", "lang"], [], count_as="n")

    out_schema = pa.schema([("source", pa.string())] +
                           [(f"n_{lg}", pa.int64())
                            for lg in _PIVOT_LANGS])

    def _widen(t: pa.Table) -> pa.Table:
        # the (source, lang) cells for one source all live in one
        # partition only if the exchange keyed by source — it keyed by
        # (source, lang), so widen must re-merge per source locally
        # and rely on cell-level disjointness: every (source, lang)
        # combo appears in exactly one partition, so per-partition
        # widening then summing nothing twice is exact with a final
        # grouped_sums over the widened rows.
        if t.num_rows == 0:
            return out_schema.empty_table()
        from ..functions.segscore import _to_bytes_array

        src = t["source"].combine_chunks()
        sb = _to_bytes_array(src)
        order = np.argsort(sb, kind="stable")
        sb_s = sb[order]
        new_run = np.r_[True, sb_s[1:] != sb_s[:-1]]
        run_id = np.cumsum(new_run) - 1
        lang = np.asarray(pc.fill_null(
            pc.index_in(t["lang"],
                        value_set=pa.array(list(_PIVOT_LANGS))), -1),
            np.int64)
        if (lang < 0).any():
            raise ValueError("unknown lang in source_lang_pivot")
        n = np.asarray(t["n"], np.int64)[order]
        wide = np.zeros((int(run_id[-1]) + 1, len(_PIVOT_LANGS)),
                        np.int64)
        wide[run_id, lang[order]] += n
        firsts = np.flatnonzero(new_run)
        cols = {"source": src.take(pa.array(order[firsts], pa.int64()))}
        for j, lg in enumerate(_PIVOT_LANGS):
            cols[f"n_{lg}"] = pa.array(wide[:, j], pa.int64())
        return pa.table(cols).cast(out_schema)

    wide = counts.map_batches(_widen, batch_format="pyarrow")
    agg = grouped_sums(wide, ["source"],
                       [f"n_{lg}" for lg in _PIVOT_LANGS])
    return agg.map_batches(
        lambda t: pa.table(
            {"source": t["source"],
             **{f"n_{lg}": t[f"sum_n_{lg}"] for lg in _PIVOT_LANGS}}),
        batch_format="pyarrow")


def lang_rollup_totals(sf_dir: str):
    """GROUP BY ROLLUP(lang): per-language doc/char totals PLUS the
    grand-total row (lang = NULL) — the subtotal/report shape. The
    grand total derives from the per-lang aggregate (≤ langs rows), so
    the fact table is read and shuffled exactly once."""
    from ..stages.agg import grouped_sums

    ds = _read_docs(sf_dir, columns=("lang", "n_chars"))
    per_lang = grouped_sums(ds, ["lang"], ["n_chars"],
                            count_as="n_docs").materialize()

    def _clean(t: pa.Table) -> pa.Table:
        return pa.table({"lang": t["lang"],
                         "n_docs": t["n_docs"],
                         "sum_n_chars": t["sum_n_chars"]})

    import ray.data as _rd

    rows = per_lang.take_all()          # ≤ distinct langs — driver-scale
    total = pa.table({
        "lang": pa.array([None], pa.string()),
        "n_docs": pa.array([sum(r["n_docs"] for r in rows)], pa.int64()),
        "sum_n_chars": pa.array([sum(r["sum_n_chars"] for r in rows)],
                                pa.int64()),
    })
    return per_lang.map_batches(_clean, batch_format="pyarrow").union(
        _rd.from_arrow(total))


# --- char-trigram LM quality scoring (CCNet/KenLM-style filter) --------

_TRI_CELLS = 27 ** 3
_BYTE_CODE = np.zeros(256, np.uint32)
for _c in range(ord("a"), ord("z") + 1):
    _BYTE_CODE[_c] = _c - ord("a") + 1
for _c in range(ord("A"), ord("Z") + 1):
    _BYTE_CODE[_c] = _c - ord("A") + 1
# every other byte (space, digits, punctuation, UTF-8 continuations)
# maps to code 0 — the 'boundary' symbol


def _char_trigrams(text_col):
    """(trigram codes, per-position row id) for every in-row char
    position of the batch, straight off the Arrow string buffers —
    zero per-row Python. Trigram code = c0·27² + c1·27 + c2 over the
    27-symbol alphabet."""
    t = pc.fill_null(text_col, "")
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    b = t.cast(pa.binary())
    n = len(b)
    bufs = b.buffers()
    offs = np.frombuffer(bufs[1], np.int32)[b.offset: b.offset + n + 1]
    data = np.frombuffer(bufs[2], np.uint8)[offs[0]: offs[-1]]
    offs = (offs - offs[0]).astype(np.int64)
    codes = _BYTE_CODE[data]
    lens = np.diff(offs)
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    if len(codes) < 3:
        return (np.empty(0, np.uint32), np.empty(0, np.int64), n)
    tri = codes[:-2] * 729 + codes[1:-1] * 27 + codes[2:]
    valid = row[:-2] == row[2:]
    return tri[valid], row[:-2][valid], n


def train_trigram_lm(sf_dir: str) -> np.ndarray:
    """Distributed char-trigram count fit: each block reduces its text
    to ≤ 27³ nonzero (cell, n) rows (a 154 KB dense bincount per block,
    emitted sparse), one `grouped_sums` exchange merges them, and the
    ≤ 19,683-row result densifies on the driver — constant-size state
    regardless of corpus size, the HLL-register shape."""
    from ..stages.agg import grouped_sums

    def _counts(batch: pa.Table) -> pa.Table:
        tri, _, _ = _char_trigrams(batch["text"])
        c = np.bincount(tri, minlength=_TRI_CELLS)
        nz = np.flatnonzero(c)
        return pa.table({
            "cell": pa.array(nz.astype(np.int64), pa.int64()),
            "n": pa.array(c[nz].astype(np.int64), pa.int64()),
        })

    rows = grouped_sums(
        _read_docs(sf_dir).map_batches(_counts, batch_format="pyarrow"),
        ["cell"], ["n"]).take_all()
    dense = np.zeros(_TRI_CELLS, np.int64)
    for r in rows:
        dense[r["cell"]] = r["sum_n"]
    return dense


def trigram_lm_score_docs(sf_dir: str):
    """Model-based quality scoring (the CCNet/KenLM filter shape): fit
    a char-trigram LM on the corpus (one pass, constant-size state),
    broadcast the dense count table, then score every document by its
    mean add-1-smoothed log2 trigram probability — low scores flag
    gibberish / out-of-domain text. Self-counting (each doc contributes
    to the LM it is scored under) is the standard single-corpus setup.
    Float log ⇒ no SQL oracle; serial-equality and gibberish-ranking
    tests instead."""
    counts = train_trigram_lm(sf_dir)
    total = int(counts.sum())
    lm_ref = _ray.put(
        np.log2((counts + 1.0) / (total + _TRI_CELLS)))

    def _score(batch: pa.Table) -> pa.Table:
        logp = _ray.get(lm_ref)
        tri, row, n = _char_trigrams(batch["text"])
        n_tri = np.bincount(row, minlength=n)
        sums = np.zeros(n, np.float64)
        np.add.at(sums, row, logp[tri])
        has = n_tri > 0
        mean = np.where(has, sums / np.maximum(n_tri, 1), 0.0)
        score = np.round(mean * 1000).astype(np.int64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_trigrams": pa.array(n_tri.astype(np.int64), pa.int64()),
            "lm_score_e3": pa.array(score, pa.int64(), mask=~has),
        })

    return _read_docs(sf_dir).map_batches(_score, batch_format="pyarrow")


def source_divergence_docs(sf_dir: str):
    """Domain-shift detection: per-source KL divergence (bits) of the
    source's char-trigram distribution from the whole-corpus
    distribution — flags sources whose text differs systematically
    (wrong language, boilerplate, spam). State is ≤ sources × 27³
    (cell, n) rows through ONE grouped_sums exchange — constant in
    corpus size, like the LM fit — and the final KL is numpy over that
    bounded aggregate. Add-1 smoothing both sides; float log ⇒
    rows-only (planted-shift ranking test)."""
    from ..stages.agg import grouped_sums

    def _counts(batch: pa.Table) -> pa.Table:
        tri, row, n = _char_trigrams(batch["text"])
        src = batch["source"].combine_chunks()
        from ..functions.segscore import _to_bytes_array

        sb = _to_bytes_array(src)
        uniq, inv = np.unique(sb, return_inverse=True)
        cell = inv[row].astype(np.int64) * _TRI_CELLS + tri
        c = np.bincount(cell, minlength=len(uniq) * _TRI_CELLS)
        nz = np.flatnonzero(c)
        sidx = nz // _TRI_CELLS
        first_row = np.searchsorted(np.sort(inv), np.arange(len(uniq)))
        # map back to a representative Arrow string per unique source
        order = np.argsort(inv, kind="stable")
        rep = order[first_row]
        return pa.table({
            "source": src.take(pa.array(rep[sidx], pa.int64())),
            "cell": pa.array((nz % _TRI_CELLS).astype(np.int64),
                             pa.int64()),
            "n": pa.array(c[nz].astype(np.int64), pa.int64()),
        })

    agg = grouped_sums(
        _read_docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(_counts, batch_format="pyarrow"),
        ["source", "cell"], ["n"])              # ≤ sources×27³, constant
    tbl = pa.concat_tables(_ray.get(agg.to_arrow_refs()))

    from ..functions.segscore import _to_bytes_array

    sb = _to_bytes_array(tbl["source"].combine_chunks())
    cell = np.asarray(tbl["cell"], np.int64)
    n = np.asarray(tbl["n" if "n" in tbl.column_names else "sum_n"],
                   np.int64)
    uniq, inv = np.unique(sb, return_inverse=True)
    dense = np.zeros((len(uniq), _TRI_CELLS), np.float64)
    dense[inv, cell] = n                       # disjoint (source, cell)
    corpus = dense.sum(axis=0)
    q = (corpus + 1.0) / (corpus.sum() + _TRI_CELLS)
    p = (dense + 1.0) / (dense.sum(axis=1, keepdims=True) + _TRI_CELLS)
    kl = (p * np.log2(p / q[None, :])).sum(axis=1)
    # representative Arrow string per unique source (S-order == sorted)
    order = np.argsort(inv, kind="stable")
    firsts = order[np.searchsorted(inv[order], np.arange(len(uniq)))]
    import ray.data as _rd

    return _rd.from_arrow(pa.table({
        "source": tbl["source"].combine_chunks().take(
            pa.array(firsts, pa.int64())),
        "kl_e6": pa.array(np.round(kl * 1e6).astype(np.int64),
                          pa.int64()),
        "n_trigrams": pa.array(dense.sum(axis=1).astype(np.int64),
                               pa.int64()),
    }))


def source_lang_unpivot(sf_dir: str):
    """UNPIVOT / melt — the inverse of `source_lang_pivot`: the wide
    per-source count columns back to (source, lang, n) long form, one
    repeat/tile expansion per batch (wide rows are ≤ sources, so this
    is driver-scale data in exchange only for the pivot upstream).
    Zero-count cells are dropped to match the plain GROUP BY oracle."""

    wide = source_lang_pivot(sf_dir)

    def _melt(t: pa.Table) -> pa.Table:
        nsrc = t.num_rows
        nl = len(_PIVOT_LANGS)
        if nsrc == 0:
            return pa.schema([("source", pa.string()),
                              ("lang", pa.string()),
                              ("n", pa.int64())]).empty_table()
        counts = np.stack([np.asarray(t[f"n_{lg}"], np.int64)
                           for lg in _PIVOT_LANGS], axis=1)
        src = t["source"].combine_chunks().take(
            pa.array(np.repeat(np.arange(nsrc), nl), pa.int64()))
        lang = pa.array(list(_PIVOT_LANGS) * nsrc, pa.string())
        out = pa.table({"source": src, "lang": lang,
                        "n": pa.array(counts.ravel(), pa.int64())})
        return out.filter(pc.greater(out["n"], 0))

    return wide.map_batches(_melt, batch_format="pyarrow")


NTILE_SCHEMA = pa.schema([("doc_id", pa.int64()), ("lang", pa.string()),
                          ("tile", pa.int64())])


def ntile_by_lang(sf_dir: str, k: int = 4, n_parts: int | None = None):
    """``NTILE(k) OVER (PARTITION BY lang ORDER BY n_chars, doc_id)`` —
    per-language length quartiles, the bucketing behind curriculum
    schedules and per-stratum sampling. Rides the same lang-hash
    exchange + one-lexsort kernel as :func:`length_rank_by_lang`; the
    NTILE split follows SQL semantics exactly (first ``n mod k`` tiles
    take ``ceil(n/k)`` rows)."""
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    if n_parts is None:
        from ..config import resolve_num_partitions
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _key(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].combine_chunks()
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": lang,
            "n_chars": batch["n_chars"].combine_chunks().cast(pa.int64()),
            "lang_part": pa.array(hash_strings64(lang) % 1024, pa.int64()),
        })

    keyed = _read_docs(sf_dir, ("doc_id", "lang", "n_chars")).map_batches(
        _key, batch_format="pyarrow")
    return exchange_map_groups(keyed, "lang_part", n_parts,
                               lambda part: ntile_partition(part, k),
                               NTILE_SCHEMA)


def ntile_partition(part: pa.Table, k: int) -> pa.Table:
    """Per-partition NTILE kernel (module-level for direct kernel
    tests): one lexsort (lang, n_chars, doc_id), run boundaries, SQL
    NTILE split — the first ``n mod k`` tiles take ``ceil(n/k)`` rows."""
    from ..functions.segscore import _to_bytes_array

    if part.num_rows == 0:
        return NTILE_SCHEMA.empty_table()
    lb = _to_bytes_array(part["lang"].combine_chunks())
    ids = np.asarray(part["doc_id"], np.int64)
    nch = np.asarray(part["n_chars"], np.int64)
    order = np.lexsort((ids, nch, lb))
    lb_s = lb[order]
    starts = np.flatnonzero(np.r_[True, lb_s[1:] != lb_s[:-1]])
    lens = np.diff(np.r_[starts, len(lb_s)])
    rn = (np.arange(len(lb_s), dtype=np.int64)
          - np.repeat(starts, lens))
    n = np.repeat(lens, lens)
    q, r = n // k, n % k
    big = r * (q + 1)                 # rows covered by the big tiles
    in_big = rn < big
    tile = np.where(
        in_big, rn // np.maximum(q + 1, 1),
        r + (rn - big) // np.maximum(q, 1)) + 1
    return pa.table({
        "doc_id": pa.array(ids[order], pa.int64()),
        "lang": part["lang"].combine_chunks().take(
            pa.array(order, pa.int64())),
        "tile": pa.array(tile.astype(np.int64), pa.int64()),
    })


def global_deciles_docs(sf_dir: str, k: int = 10):
    """Global ``NTILE(k) OVER (ORDER BY n_chars, doc_id)`` — corpus-wide
    length deciles with no partition key, the bucketing a curriculum
    scheduler applies across the WHOLE corpus. Rides the TeraSort range
    sort (:func:`~sourmash_ray.stages.sort.range_partition_sort`): data
    crosses the wire once, each block maps its exact global rank to the
    SQL NTILE split (n from parquet metadata — no extra pass)."""
    import pyarrow.parquet as pq

    from ..stages.sort import range_partition_sort

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    q, r = n // k, n % k
    big = r * (q + 1)

    def _tile(batch: pa.Table) -> pa.Table:
        rn = np.asarray(batch["global_rank"], np.int64) - 1
        in_big = rn < big
        tile = np.where(
            in_big, rn // max(q + 1, 1),
            r + (rn - big) // max(q, 1)) + 1
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": batch["n_chars"],
            "tile": pa.array(tile.astype(np.int64), pa.int64()),
        })

    ranked = range_partition_sort(
        _read_docs(sf_dir, ("doc_id", "n_chars")), "n_chars", "doc_id",
        schema=pa.schema([("doc_id", pa.int64()),
                          ("n_chars", pa.int64())]))
    return ranked.map_batches(_tile, batch_format="pyarrow")


def exact_spans_docs(sf_dir: str, cfg: EngineConfig = DEFAULT_CONFIG,
                     min_len: int = 64):
    """Repeated-substring detection over near-dup DOCUMENT pairs — the
    doc-level twin of the transcripts exact-spans pass (the "dedup
    training data by long exact matches" operator of Lee et al. 2022):
    LSH candidates → jaccard verify → per-pair longest common substring
    (rolling-hash probe, O(n+m) per length probed) with byte offsets.

    A document is a one-turn conversation, so the whole transcripts
    substring machinery (pruned scan, id-hash exchange blob assembly,
    broadcast/exchange pair scorer) is reused verbatim."""
    from ..stages.lsh import candidate_pairs
    from ..stages.substring import exact_substring_pass
    from ..stages.verify import verify_pairs

    sigs = sketch_docs(sf_dir, cfg).materialize()
    pairs = candidate_pairs(sigs, cfg)
    verified = verify_pairs(pairs, sigs, cfg).materialize()

    def _as_turns(t: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": pc.cast(t["doc_id"], pa.string()),
            "turn_idx": pa.array(np.zeros(t.num_rows, np.int64)),
            "text": t["text"],
        })

    docs_as_turns = _read_docs(sf_dir).map_batches(
        _as_turns, batch_format="pyarrow")
    return exact_substring_pass(verified.select_columns(["a", "b"]),
                                docs_as_turns, cfg, min_len=min_len)


RANKS_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("lang", pa.string()),
    ("n_chars", pa.int64()), ("dense_rank", pa.int64()),
    ("n_le", pa.int64()),
])


def value_ranks_by_lang(sf_dir: str, n_parts: int | None = None):
    """The remaining SQL window ranks, exact-integer: per language,
    ``dense_rank() OVER (PARTITION BY lang ORDER BY n_chars)`` and the
    RANGE-frame running count ``count(*) OVER (PARTITION BY lang ORDER
    BY n_chars)`` (peers included — the cume_dist numerator, so
    cume_dist = n_le / group_n without any cross-engine float). Same
    one-exchange + one-lexsort shape as :func:`length_rank_by_lang`."""
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    if n_parts is None:
        from ..config import resolve_num_partitions
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _key(batch: pa.Table) -> pa.Table:
        lang = batch["lang"].combine_chunks()
        return pa.table({
            "doc_id": batch["doc_id"],
            "lang": lang,
            "n_chars": batch["n_chars"].combine_chunks().cast(pa.int64()),
            "lang_part": pa.array(hash_strings64(lang) % 1024, pa.int64()),
        })

    def _ranks(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return RANKS_SCHEMA.empty_table()
        lb = _to_bytes_array(part["lang"].combine_chunks())
        ids = np.asarray(part["doc_id"], np.int64)
        nch = np.asarray(part["n_chars"], np.int64)
        order = np.lexsort((ids, nch, lb))
        lb_s, nch_s = lb[order], nch[order]
        new_lang = np.r_[True, lb_s[1:] != lb_s[:-1]]
        new_val = new_lang | np.r_[True, nch_s[1:] != nch_s[:-1]]
        # dense_rank: per-lang cumsum of new-value flags
        dr_global = np.cumsum(new_val)
        lang_starts = np.flatnonzero(new_lang)
        lang_lens = np.diff(np.r_[lang_starts, len(lb_s)])
        dr = dr_global - np.repeat(dr_global[lang_starts] - 1, lang_lens)
        # n_le: index of the LAST peer (ties included) within the lang,
        # 1-based — run ends located via the next new-value boundary
        val_starts = np.flatnonzero(new_val)
        val_lens = np.diff(np.r_[val_starts, len(lb_s)])
        run_end = np.repeat(val_starts + val_lens, val_lens)  # global
        lang_base = np.repeat(lang_starts, lang_lens)
        n_le = run_end - lang_base
        return pa.table({
            "doc_id": pa.array(ids[order], pa.int64()),
            "lang": part["lang"].combine_chunks().take(
                pa.array(order, pa.int64())),
            "n_chars": pa.array(nch_s, pa.int64()),
            "dense_rank": pa.array(dr.astype(np.int64), pa.int64()),
            "n_le": pa.array(n_le.astype(np.int64), pa.int64()),
        })

    keyed = _read_docs(sf_dir, ("doc_id", "lang", "n_chars")).map_batches(
        _key, batch_format="pyarrow")
    return exchange_map_groups(keyed, "lang_part", n_parts, _ranks,
                               RANKS_SCHEMA)


def dup_rate_by_source_docs(sf_dir: str):
    """Per-source exact-duplication rate: n_docs, distinct normalized
    texts, duplicate count — the corpus-health report a curation run
    reads before choosing mixing weights (the per-source view of
    :func:`exact_dedup_docs`).

    Scale shape: (source, md5, n) cells pre-reduce per block; ONE md5
    exchange co-locates equal texts, so distinct-(source, md5) pairs are
    countable per partition; only per-partition per-source counters hit
    the final combine."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups
    from ..stages.sketch import normalize_column

    group_parts = DEFAULT_CONFIG.exec.group_parts

    partial_schema = pa.schema([
        ("text_md5", pa.string()), ("source", pa.string()),
        ("n", pa.int64()), ("md5_part", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return partial_schema.empty_table()
        norm = normalize_column(batch["text"], "ws")
        md5 = _md5_column(norm)
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        mb = _to_bytes_array(md5)
        src = _to_bytes_array(batch["source"].combine_chunks())
        order = np.lexsort((src, mb))
        mb_s, src_s = mb[order], src[order]
        first = np.r_[True, (mb_s[1:] != mb_s[:-1])
                      | (src_s[1:] != src_s[:-1])] if len(mb_s) else \
            np.empty(0, bool)
        starts = np.flatnonzero(first)
        cnt = np.diff(np.r_[starts, len(mb_s)])
        take = pa.array(order[starts], pa.int64())
        u_md5 = md5.take(take)
        return pa.table({
            "text_md5": u_md5,
            "source": batch["source"].combine_chunks().take(take),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
            "md5_part": pa.array(
                hash_strings64(u_md5) % group_parts, pa.int64()),
        })

    part_schema = pa.schema([("source", pa.string()),
                             ("n_docs", pa.int64()),
                             ("n_distinct", pa.int64())])

    def _per_part(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        mb = _to_bytes_array(part["text_md5"].combine_chunks())
        src = _to_bytes_array(part["source"].combine_chunks())
        n = np.asarray(part["n"], np.int64)
        order = np.lexsort((mb, src))
        src_s, mb_s, n_s = src[order], mb[order], n[order]
        new_src = np.r_[True, src_s[1:] != src_s[:-1]]
        new_pair = new_src | np.r_[True, mb_s[1:] != mb_s[:-1]]
        starts = np.flatnonzero(new_src)
        src_id = np.cumsum(new_src) - 1
        n_docs = np.bincount(src_id, weights=n_s,
                             minlength=len(starts)).astype(np.int64)
        n_dist = np.bincount(src_id[new_pair],
                             minlength=len(starts)).astype(np.int64)
        take = pa.array(order[starts], pa.int64())
        return pa.table({
            "source": part["source"].combine_chunks().take(take),
            "n_docs": pa.array(n_docs, pa.int64()),
            "n_distinct": pa.array(n_dist, pa.int64()),
        })

    keyed = _read_docs(sf_dir, ("source", "text")).map_batches(
        _partial, batch_format="pyarrow")
    parts = exchange_map_groups(keyed, "md5_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _per_part, part_schema)
    out = grouped_sums(parts, ["source"], ["n_docs", "n_distinct"])
    return out.map_batches(
        lambda t: pa.table({
            "source": t["source"],
            "n_docs": t["sum_n_docs"],
            "n_distinct": t["sum_n_distinct"],
            "n_dups": pc.subtract(t["sum_n_docs"],
                                  t["sum_n_distinct"])}),
        batch_format="pyarrow")


def doc_length_histogram(sf_dir: str, bucket: int = 256):
    """Document-length histogram at ``bucket``-char resolution:
    (bucket_lo, n_docs, sum_chars) — the length-distribution profile a
    packing/chunking stage is tuned against. Pure map + block-local
    combine; only (bucket, 2 sums) cells shuffle."""
    from ..stages.agg import grouped_sums

    def _partial(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n_chars"], np.int64)
        b = (n // bucket) * bucket
        order = np.argsort(b, kind="stable")
        b_s = b[order]
        first = np.r_[True, b_s[1:] != b_s[:-1]] if len(b_s) else \
            np.empty(0, bool)
        starts = np.flatnonzero(first)
        cnt = np.diff(np.r_[starts, len(b_s)])
        sums = np.add.reduceat(n[order], starts) if starts.size else \
            np.empty(0, np.int64)
        return pa.table({
            "bucket_lo": pa.array(b_s[first], pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
            "chars": pa.array(sums.astype(np.int64), pa.int64()),
        })

    ds = _read_docs(sf_dir, ("n_chars",)).map_batches(
        _partial, batch_format="pyarrow")
    out = grouped_sums(ds, ["bucket_lo"], ["n", "chars"])
    return out.map_batches(
        lambda t: pa.table({"bucket_lo": t["bucket_lo"],
                            "n_docs": t["sum_n"],
                            "sum_chars": t["sum_chars"]}),
        batch_format="pyarrow")


INTERLEAVE_SCHEMA = pa.schema([
    ("doc_id", pa.int64()), ("source", pa.string()),
    ("pos", pa.int64()),
])


def interleave_sources_docs(sf_dir: str, n_parts: int | None = None):
    """Deterministic round-robin interleave across sources — the global
    training ORDER a mixture run feeds the loader (position 0 = first
    source's first doc, then one doc from each source in turn; a source
    that runs dry drops out of the rotation). Complements
    ``mixing_weights_docs`` (which only reports proportions).

    Closed form, no global sort: with per-source counts ``c`` (tiny
    dim, broadcast) and per-source rank ``r`` (by doc_id; one
    source-hash exchange — every source lands whole in a partition),
    the round-robin position is

        pos = Σ_{s'} min(c_{s'}, r)  +  |{s' < s : c_{s'} > r}|

    i.e. the count of (r', s') pairs lexicographically before (r, s).
    Per batch this is one (n × k) numpy reduction with k = #sources.
    """
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    if n_parts is None:
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    counts_rows = grouped_sums(
        _read_docs(sf_dir, ("source",)), ["source"], [],
        count_as="n").take_all()
    sources = sorted(r["source"] for r in counts_rows)
    counts = np.array([dict((r["source"], r["n"]) for r in counts_rows)
                       [s] for s in sources], np.int64)
    sidx_of = {s: i for i, s in enumerate(sources)}
    lut_ref = _ray.put((sources, counts, sidx_of))

    def _key(batch: pa.Table) -> pa.Table:
        src = batch["source"].combine_chunks()
        return pa.table({
            "doc_id": batch["doc_id"],
            "source": src,
            "src_part": pa.array(hash_strings64(src) % 1024, pa.int64()),
        })

    def _pos(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return INTERLEAVE_SCHEMA.empty_table()
        srcs, cnts, of = _ray.get(lut_ref)
        sb = _to_bytes_array(part["source"].combine_chunks())
        ids = np.asarray(part["doc_id"], np.int64)
        order = np.lexsort((ids, sb))
        sb_s, ids_s = sb[order], ids[order]
        starts = np.flatnonzero(np.r_[True, sb_s[1:] != sb_s[:-1]])
        lens = np.diff(np.r_[starts, len(sb_s)])
        r = (np.arange(len(sb_s), dtype=np.int64)
             - np.repeat(starts, lens))
        src_col = part["source"].combine_chunks().take(
            pa.array(order, pa.int64()))
        sidx = np.fromiter((of[s] for s in src_col.to_pylist()),
                           np.int64, len(sb_s))
        k = len(cnts)
        cmin = np.minimum(cnts[None, :], r[:, None]).sum(axis=1)
        before = ((cnts[None, :] > r[:, None])
                  & (np.arange(k)[None, :] < sidx[:, None])).sum(axis=1)
        return pa.table({
            "doc_id": pa.array(ids_s, pa.int64()),
            "source": src_col,
            "pos": pa.array(cmin + before, pa.int64()),
        })

    keyed = _read_docs(sf_dir, ("doc_id", "source")).map_batches(
        _key, batch_format="pyarrow")
    return exchange_map_groups(keyed, "src_part", n_parts, _pos,
                               INTERLEAVE_SCHEMA)


def column_profile_docs(sf_dir: str):
    """Data-profiling pass over the documents table: per column, row
    count, NULL count, and distinct count — the schema-audit a pipeline
    runs before trusting a new corpus drop. Null counts are
    block-partial sums; distinct counts reuse the block-distinct →
    key-exchange shape (each block emits its distinct values once, so
    the shuffle is bounded by the true cardinality, never the corpus).
    Distinctness is over a 64-bit value hash — collision probability
    ~n²/2⁶⁵, i.e. exact in practice at any per-column cardinality this
    table can hold, but not adversarially exact."""
    import numpy as np

    import ray.data

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..functions.segscore import hash_strings64
    from ..stages.exchange import exchange_map_groups

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    group_parts = DEFAULT_CONFIG.exec.group_parts

    def _partial(batch: pa.Table) -> pa.Table:
        names, nulls, rows_, vhash = [], [], [], []
        for i, c in enumerate(cols):
            col = batch[c].combine_chunks()
            nn = int(col.null_count)
            # distinct via a 64-bit value hash (column index folded in so
            # equal values in different columns never collide)
            sv = pc.fill_null(col if pa.types.is_string(col.type)
                              else pc.cast(col, pa.string()), "")
            h = hash_strings64(sv).astype(np.uint64)
            valid = ~np.asarray(pc.is_null(col), bool)
            hv = np.unique(h[valid])
            names.append(c)
            nulls.append(nn)
            rows_.append(len(col))
            vhash.append(hv)
        n_out = sum(len(v) for v in vhash)
        col_idx = np.concatenate(
            [np.full(len(v), i, np.int64)
             for i, v in enumerate(vhash)]) if n_out else \
            np.empty(0, np.int64)
        hs = np.concatenate(vhash) if n_out else np.empty(0, np.uint64)
        stats = pa.table({
            "col_idx": pa.array(np.arange(len(cols)), pa.int64()),
            "n_rows": pa.array(rows_, pa.int64()),
            "n_nulls": pa.array(nulls, pa.int64()),
            "vh": pa.array(np.zeros(len(cols), np.uint64), pa.uint64()),
            "is_stat": pa.array([True] * len(cols)),
            "part": pa.array(np.arange(len(cols)) % group_parts,
                             pa.int64()),
        })
        vals = pa.table({
            "col_idx": pa.array(col_idx, pa.int64()),
            "n_rows": pa.array(np.zeros(n_out, np.int64), pa.int64()),
            "n_nulls": pa.array(np.zeros(n_out, np.int64), pa.int64()),
            "vh": pa.array(hs, pa.uint64()),
            "is_stat": pa.array(np.zeros(n_out, bool)),
            "part": pa.array(
                ((hs % np.uint64(group_parts)).astype(np.int64)
                 * len(cols) + col_idx) % group_parts, pa.int64()),
        })
        return pa.concat_tables([stats, vals])

    out_schema = pa.schema([("col_idx", pa.int64()),
                            ("n_rows", pa.int64()),
                            ("n_nulls", pa.int64()),
                            ("n_distinct", pa.int64())])

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        is_stat = np.asarray(part["is_stat"], bool)
        ci = np.asarray(part["col_idx"], np.int64)
        out = {}
        for idx in np.unique(ci):
            m = ci == idx
            ms = m & is_stat
            mv = m & ~is_stat
            vh = np.asarray(part["vh"], np.uint64)[mv]
            out[int(idx)] = (
                int(np.asarray(part["n_rows"], np.int64)[ms].sum()),
                int(np.asarray(part["n_nulls"], np.int64)[ms].sum()),
                int(np.unique(vh).size))
        return pa.table({
            "col_idx": pa.array(list(out), pa.int64()),
            "n_rows": pa.array([v[0] for v in out.values()], pa.int64()),
            "n_nulls": pa.array([v[1] for v in out.values()],
                                pa.int64()),
            "n_distinct": pa.array([v[2] for v in out.values()],
                                   pa.int64()),
        })

    parts = _read_docs(sf_dir, columns=cols).map_batches(
        _partial, batch_format="pyarrow")
    merged = exchange_map_groups(
        parts, "part", resolve_num_partitions(DEFAULT_CONFIG),
        _merge, out_schema).take_all()
    agg: dict[int, list[int]] = {}
    for r in merged:
        a = agg.setdefault(r["col_idx"], [0, 0, 0])
        a[0] += r["n_rows"]
        a[1] += r["n_nulls"]
        a[2] += r["n_distinct"]
    schema = pa.schema([("col_name", pa.string()),
                        ("n_rows", pa.int64()),
                        ("n_nulls", pa.int64()),
                        ("n_distinct", pa.int64())])
    rows = [{"col_name": cols[i], "n_rows": agg[i][0],
             "n_nulls": agg[i][1], "n_distinct": agg[i][2]}
            for i in sorted(agg)]
    if not rows:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


_XSRC_PART_SCHEMA = pa.schema([
    ("text_md5", pa.string()), ("source", pa.string()),
    ("n", pa.int64()), ("md5_part", pa.int64())])
_XSRC_PAIR_SCHEMA = pa.schema([
    ("src_a", pa.string()), ("src_b", pa.string()),
    ("n_groups", pa.int64())])


def cross_source_dup_matrix(sf_dir: str):
    """Cross-source duplication matrix: for every unordered source pair
    (src_a ≤ src_b), the number of exact-dup groups (normalized-text md5
    classes) containing documents from BOTH sources — the diagonal
    counts groups with ≥ 2 docs of the same source. The curation signal
    behind "which crawls re-crawl each other": at web scale most dup
    bytes are cross-snapshot, and this matrix says which pairs to
    dedup-join first.

    Shuffle math: blocks pre-combine to distinct (md5, source, count)
    partials, ONE md5-keyed exchange co-locates a group's sources, and
    each group emits ≤ |sources|² pair rows — the second exchange
    (pair-cell rollup) is |sources|²-bounded, never corpus-bounded."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..functions.segscore import hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    group_parts = DEFAULT_CONFIG.exec.group_parts

    def _partial(batch: pa.Table) -> pa.Table:
        md5 = _normalize_md5_batch(batch)["text_md5"]
        src = pc.fill_null(batch["source"], "")
        t = pa.table({"m": md5, "s": src})
        import pyarrow.compute as _pc

        g = t.group_by(["m", "s"]).aggregate([([], "count_all")])
        m = g["m"].combine_chunks()
        return pa.table({
            "text_md5": m,
            "source": g["s"],
            "n": pc.cast(g["count_all"], pa.int64()),
            "md5_part": pa.array(hash_strings64(m) % group_parts,
                                 pa.int64()),
        })

    def _pairs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _XSRC_PAIR_SCHEMA.empty_table()
        from ..functions.segscore import _to_bytes_array

        m = _to_bytes_array(part["text_md5"])
        src = np.asarray(part["source"], dtype=object)
        n = np.asarray(part["n"], np.int64)
        order = np.lexsort((src, m))
        m, src, n = m[order], src[order], n[order]
        # cross-block combine of per-(group, source) counts
        same = np.concatenate([[False], (m[1:] == m[:-1])
                               & (src[1:] == src[:-1])]) \
            if m.size else np.empty(0, bool)
        starts = np.flatnonzero(~same)
        n = np.add.reduceat(n, starts)
        m, src = m[starts], src[starts]
        first = np.concatenate([[True], m[1:] != m[:-1]])
        gstarts = np.flatnonzero(first)
        gsizes = np.diff(np.concatenate([gstarts, [m.size]]))
        # diagonal cells vectorized; the Python loop touches ONLY
        # multi-source groups (the rare cross-crawl dups), never the
        # singleton mass
        diag = n >= 2
        a_list, b_list = [src[diag]], [src[diag]]
        multi = gsizes >= 2
        for s0, sz in zip(gstarts[multi], gsizes[multi]):
            ss = src[s0:s0 + sz]          # sorted within group
            ii, jj = np.triu_indices(sz, 1)
            a_list.append(ss[ii])
            b_list.append(ss[jj])
        a_out = np.concatenate(a_list) if a_list else \
            np.empty(0, object)
        b_out = np.concatenate(b_list) if b_list else \
            np.empty(0, object)
        return pa.table({
            "src_a": pa.array(a_out, pa.string()),
            "src_b": pa.array(b_out, pa.string()),
            "n_groups": pa.array(np.ones(len(a_out), np.int64),
                                 pa.int64()),
        })

    parts = _read_docs(sf_dir, columns=["doc_id", "text",
                                        "source"]).map_batches(
        _partial, batch_format="pyarrow")
    pairs = exchange_map_groups(parts, "md5_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _pairs, _XSRC_PAIR_SCHEMA)
    agg = grouped_sums(pairs, ["src_a", "src_b"], ["n_groups"])
    out = agg.map_batches(
        lambda t: pa.table({"src_a": t["src_a"], "src_b": t["src_b"],
                            "n_groups": t["sum_n_groups"]}),
        batch_format="pyarrow").materialize()
    if out.count() == 0:
        # a dup-free corpus yields an empty matrix — return it TYPED
        # (an empty Dataset loses its schema; the known engine quirk)
        return _XSRC_PAIR_SCHEMA.empty_table()
    return out


def snapshot_diff_docs(dir_a: str, dir_b: str):
    """Two-snapshot corpus diff — the daily crawl-delta audit: which
    docs were ADDED, REMOVED, or CHANGED (same doc_id, different
    normalized-text md5) between snapshot A and snapshot B. Each side
    reduces to its (doc_id, md5) fingerprint in the map pass (the text
    never shuffles), ONE full-outer doc_id exchange joins them, and
    only the changed surface is emitted — the unchanged mass (the
    overwhelming majority of a daily delta) dies inside the join
    partition."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _fp(col_name):
        def _f(batch: pa.Table) -> pa.Table:
            t = _normalize_md5_batch(batch)
            return pa.table({
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                col_name: t["text_md5"],
            })
        return _f

    a = _read_docs(dir_a).map_batches(_fp("md5_a"),
                                      batch_format="pyarrow")
    b = _read_docs(dir_b).map_batches(_fp("md5_b"),
                                      batch_format="pyarrow")
    j = hash_join_exchange(a, b, key="doc_id", left_cols=["md5_a"],
                           right_cols=["md5_b"], n_parts=n_parts,
                           join_type="full outer")

    def _status(batch: pa.Table) -> pa.Table:
        ma = batch["md5_a"].combine_chunks()
        mb = batch["md5_b"].combine_chunks()
        a_null = np.asarray(pc.is_null(ma), bool)
        b_null = np.asarray(pc.is_null(mb), bool)
        neq = np.asarray(pc.fill_null(pc.not_equal(ma, mb), False), bool)
        status = np.where(a_null, "added",
                          np.where(b_null, "removed", "changed"))
        keep = a_null | b_null | neq
        return pa.table({
            "doc_id": pc.filter(pc.cast(batch["doc_id"], pa.int64()),
                                pa.array(keep)),
            "status": pa.array(status[keep], pa.string()),
        })

    return j.map_batches(_status, batch_format="pyarrow")


PREFIX_DUP_SCHEMA = pa.schema([
    ("prefix", pa.string()), ("n_docs", pa.int64()),
    ("n_distinct_md5", pa.int64()), ("min_doc_id", pa.int64())])


def prefix_dup_inventory(sf_dir: str, prefix_chars: int = 64,
                         cfg: EngineConfig = DEFAULT_CONFIG):
    """Prefix-collision inventory: every ``prefix_chars``-character text
    prefix shared by ≥ 2 documents, with how many docs share it and how
    many DISTINCT full texts hide behind it — the "tier-0b" report that
    sizes the gap between exact dedup and near-dup (boilerplate headers,
    templated pages). ``n_distinct_md5 > 1`` rows are exactly the groups
    an exact pass cannot collapse but a near-dup tier should look at.

    Shape: block-local (prefix, md5) cell combiner (n, min_id per cell),
    one prefix-keyed exchange, per-partition rollup — distinct-text
    counting rides the same pair-dedup-then-reduceat pattern as
    ``cross_source_dup_matrix``. Prefixes slice by codepoint
    (``utf8_slice_codeunits`` == SQL ``substr`` on this ASCII corpus).
    """
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.exchange import exchange_map_groups

    group_parts = cfg.exec.group_parts

    def _cells(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        prefix = pc.utf8_slice_codeunits(text, 0, prefix_chars)
        md5 = _md5_column(text)
        if isinstance(md5, pa.ChunkedArray):
            md5 = md5.combine_chunks()
        pb, mb = _to_bytes_array(prefix), _to_bytes_array(md5)
        ids = np.asarray(batch["doc_id"], np.int64)
        order = np.lexsort((ids, mb, pb))
        pb_s, mb_s, ids_s = pb[order], mb[order], ids[order]
        first = np.r_[True, (pb_s[1:] != pb_s[:-1])
                      | (mb_s[1:] != mb_s[:-1])] if len(pb_s) else \
            np.empty(0, bool)
        starts = np.flatnonzero(first)
        cnt = np.diff(np.r_[starts, len(pb_s)])
        take = pa.array(order[first], pa.int64())
        u = pb_s[first]
        return pa.table({
            "prefix": prefix.take(take),
            "text_md5": _s_fixed_to_string_array(mb_s[first])
            if len(u) else pa.array([], pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
            "min_id": pa.array(ids_s[first], pa.int64()),
            "prefix_part": pa.array(hash_strings64(u) % group_parts,
                                    pa.int64()),
        })

    def _rollup(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return PREFIX_DUP_SCHEMA.empty_table()
        pb = _to_bytes_array(part["prefix"].combine_chunks())
        mb = _to_bytes_array(part["text_md5"].combine_chunks())
        n = np.asarray(part["n"], np.int64)
        mid = np.asarray(part["min_id"], np.int64)
        order = np.lexsort((mb, pb))
        pb_s, mb_s = pb[order], mb[order]
        new_p = np.r_[True, pb_s[1:] != pb_s[:-1]]
        new_pair = new_p | np.r_[True, mb_s[1:] != mb_s[:-1]]
        starts = np.flatnonzero(new_p)
        ends = np.r_[starts, len(pb_s)]
        n_docs = np.add.reduceat(n[order], starts)
        n_md5 = np.add.reduceat(new_pair.astype(np.int64), starts)
        min_id = np.minimum.reduceat(mid[order], starts)
        keep = n_docs >= 2
        take = pa.array(order[starts[keep]], pa.int64())
        return pa.table({
            "prefix": part["prefix"].combine_chunks().take(take),
            "n_docs": pa.array(n_docs[keep], pa.int64()),
            "n_distinct_md5": pa.array(n_md5[keep], pa.int64()),
            "min_doc_id": pa.array(min_id[keep], pa.int64()),
        })

    cells = _read_docs(sf_dir).map_batches(_cells, batch_format="pyarrow")
    return exchange_map_groups(cells, "prefix_part",
                               resolve_num_partitions(cfg),
                               _rollup, PREFIX_DUP_SCHEMA)


def token_length_histogram(sf_dir: str):
    """Corpus-wide token-LENGTH histogram (space-split tokens, the
    ``top_tokens`` family's convention) — the tokenizer-budget profile
    (subword fertility, outlier-token detection) a BPE training run
    reads first. One map pass: lengths come straight off the flattened
    split values; only (length, count) partials shuffle."""
    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        splits = pc.split_pattern(text, " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        lens = pc.cast(pc.utf8_length(splits.flatten()), pa.int64())
        return pa.table({"token_len":
                         lens.filter(pc.greater(lens, 0))})

    ds = _read_docs(sf_dir).map_batches(_prep, batch_format="pyarrow")
    return grouped_sums(ds, ["token_len"], [], count_as="n_tokens")


def dup_cluster_size_histogram(sf_dir: str,
                               cfg: EngineConfig = DEFAULT_CONFIG):
    """Distribution of EXACT-dup group sizes (how many docs share one
    normalized text): the shape that tells a dedup run whether its mass
    is a few giant boilerplate clusters or a long tail of pairs — the
    skew-forecast for every downstream bucket/band stage. Composes
    :func:`exact_dedup_docs` (one md5 exchange) with one tiny
    (size, count) cell exchange."""
    from ..stages.agg import grouped_sums

    groups = exact_dedup_docs(sf_dir, cfg)
    return grouped_sums(
        groups.map_batches(
            lambda t: pa.table({"group_size": t["n_docs"]}),
            batch_format="pyarrow"),
        ["group_size"], [], count_as="n_groups")

# ---------------------------------------------------------------------------
# vocabulary-by-source — the cross-source corpus-audit family
# ---------------------------------------------------------------------------

_SOURCE_TF_SCHEMA = pa.schema([
    ("source", pa.string()), ("tok", pa.string()), ("tf", pa.int64()),
])


def _source_tf_rows_batch(batch: pa.Table) -> pa.Table:
    """(source, tok, tf) partial term frequencies for every non-empty
    whitespace token — the `_tf_rows_batch` kernel keyed by the SOURCE
    column instead of the document row, so a block reduces to at most
    |sources-in-block| × |block vocabulary| rows before any shuffle."""
    from ..functions.segscore import _to_bytes_array

    n = batch.num_rows
    text = pc.fill_null(batch["text"], "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    src = batch["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    enc = pc.fill_null(src, "").dictionary_encode()
    codes = np.asarray(enc.indices, np.int64)
    toks = pc.split_pattern(text, " ")
    ntok = np.asarray(pc.list_value_length(toks), np.int64)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    row = np.repeat(np.arange(n, dtype=np.int64), ntok)
    nonempty = np.flatnonzero(
        np.asarray(pc.binary_length(flat), np.int64) > 0)
    if nonempty.size == 0:
        return _SOURCE_TF_SCHEMA.empty_table()
    tb = _to_bytes_array(flat)[nonempty]
    sc = codes[row[nonempty]]
    order = np.lexsort((tb, sc))
    sc_s, tb_s = sc[order], tb[order]
    new_run = np.r_[True, (sc_s[1:] != sc_s[:-1]) | (tb_s[1:] != tb_s[:-1])]
    run_len = np.bincount(np.cumsum(new_run) - 1)
    first_flat_idx = nonempty[order[new_run]]
    return pa.table({
        "source": enc.dictionary.take(
            pa.array(sc_s[new_run], pa.int64())),
        "tok": flat.take(pa.array(first_flat_idx, pa.int64())),
        "tf": pa.array(run_len.astype(np.int64), pa.int64()),
    }).cast(_SOURCE_TF_SCHEMA)


def _source_tf(sf_dir: str):
    return _read_docs(sf_dir, columns=("source", "text")).map_batches(
        _source_tf_rows_batch, batch_format="pyarrow")


HAPAX_SCHEMA = pa.schema([
    ("source", pa.string()), ("n_distinct", pa.int64()),
    ("n_hapax", pa.int64()), ("hapax_ppm", pa.int64()),
])


def hapax_rate_by_source_docs(sf_dir: str):
    """Hapax-legomenon rate per source: the fraction (ppm) of each
    source's distinct vocabulary that occurs exactly once in that source
    — the classic corpus-freshness / OCR-noise signal (a high hapax rate
    flags garbled extraction; a collapsing one flags template spam).

    One (source, tok) `grouped_sums` exchange carries only the partial
    vocabulary; after it every (source, tok) row is globally unique, so
    per-block hapax/distinct counting composes exactly under the final
    per-source sum. All-integer output (ppm by floor division)."""
    from ..stages.agg import grouped_sums

    g = grouped_sums(_source_tf(sf_dir), ["source", "tok"], ["tf"])
    part_schema = pa.schema([("source", pa.string()),
                             ("n_distinct", pa.int64()),
                             ("n_hapax", pa.int64())])

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        enc = t["source"].combine_chunks().dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        tf = np.asarray(t["sum_tf"], np.int64)
        n_src = len(enc.dictionary)
        nd = np.bincount(codes, minlength=n_src).astype(np.int64)
        nh = np.bincount(codes[tf == 1], minlength=n_src).astype(np.int64)
        return pa.table({
            "source": enc.dictionary,
            "n_distinct": pa.array(nd, pa.int64()),
            "n_hapax": pa.array(nh, pa.int64()),
        }).cast(part_schema)

    agg = grouped_sums(g.map_batches(_partial, batch_format="pyarrow"),
                       ["source"], ["n_distinct", "n_hapax"])

    def _final(t: pa.Table) -> pa.Table:
        nd = np.asarray(t["sum_n_distinct"], np.int64)
        nh = np.asarray(t["sum_n_hapax"], np.int64)
        # a source only reaches here with >= 1 distinct token
        return pa.table({
            "source": t["source"],
            "n_distinct": pa.array(nd, pa.int64()),
            "n_hapax": pa.array(nh, pa.int64()),
            "hapax_ppm": pa.array(1_000_000 * nh // nd, pa.int64()),
        }).cast(HAPAX_SCHEMA)

    return agg.map_batches(_final, batch_format="pyarrow")


# fixed audit vocabulary: function words a quality gate treats as
# non-content; the list is part of the operator contract (mirrored
# verbatim in the oracle SQL) — NOT derived from the data
STOPWORDS = ("the", "a", "an", "of", "to", "and", "in", "is", "it", "for")

STOPWORD_SCHEMA = pa.schema([
    ("source", pa.string()), ("n_tokens", pa.int64()),
    ("n_stop", pa.int64()), ("stop_ppm", pa.int64()),
])


def stopword_rate_by_source_docs(sf_dir: str):
    """Stopword mass per source (ppm of all tokens that are function
    words) — the Gopher-style lexical-quality signal aggregated to the
    source grain, where a near-zero rate flags non-prose (code, tables,
    minified text) and an outlier-high one flags keyword stuffing.

    Map-only partials (one `is_in` mask + two bincounts per block) into
    a |sources|-row `grouped_sums` exchange; sources whose texts produce
    zero tokens emit nothing, matching the SQL twin's `WHERE t <> ''`."""
    from ..stages.agg import grouped_sums

    part_schema = pa.schema([("source", pa.string()),
                             ("n_tokens", pa.int64()),
                             ("n_stop", pa.int64())])
    stop_set = pa.array(STOPWORDS, pa.string())

    def _partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.fill_null(src, "").dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        toks = pc.split_pattern(text, " ")
        ntok = np.asarray(pc.list_value_length(toks), np.int64)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        row = np.repeat(np.arange(n, dtype=np.int64), ntok)
        nonempty = np.asarray(pc.binary_length(flat), np.int64) > 0
        if not nonempty.any():
            return part_schema.empty_table()
        sc = codes[row[nonempty]]
        stop = np.asarray(pc.is_in(flat, value_set=stop_set),
                          bool)[nonempty]
        n_src = len(enc.dictionary)
        nt = np.bincount(sc, minlength=n_src).astype(np.int64)
        ns = np.bincount(sc[stop], minlength=n_src).astype(np.int64)
        keep = nt > 0
        return pa.table({
            "source": enc.dictionary.filter(pa.array(keep)),
            "n_tokens": pa.array(nt[keep], pa.int64()),
            "n_stop": pa.array(ns[keep], pa.int64()),
        }).cast(part_schema)

    agg = grouped_sums(
        _read_docs(sf_dir, columns=("source", "text")).map_batches(
            _partial, batch_format="pyarrow"),
        ["source"], ["n_tokens", "n_stop"])

    def _final(t: pa.Table) -> pa.Table:
        nt = np.asarray(t["sum_n_tokens"], np.int64)
        ns = np.asarray(t["sum_n_stop"], np.int64)
        return pa.table({
            "source": t["source"],
            "n_tokens": pa.array(nt, pa.int64()),
            "n_stop": pa.array(ns, pa.int64()),
            "stop_ppm": pa.array(1_000_000 * ns // nt, pa.int64()),
        }).cast(STOPWORD_SCHEMA)

    return agg.map_batches(_final, batch_format="pyarrow")


VOCAB_OVERLAP_SCHEMA = pa.schema([
    ("source_a", pa.string()), ("source_b", pa.string()),
    ("n_common", pa.int64()), ("n_a", pa.int64()), ("n_b", pa.int64()),
    ("jaccard_ppm", pa.int64()),
])


def vocab_overlap_sources_docs(sf_dir: str):
    """Pairwise distinct-vocabulary Jaccard between sources — the
    corpus-mixing audit (which sources are re-crawls / mirrors of each
    other BEFORE paying for a document-grain near-dup pass). The
    source-grain twin of the sketch `jaccard` kernels
    (reference `src/sourmash/minhash.py` `similarity`), computed exactly.

    Shape: block-local distinct (source, tok) rows exchange ON THE TOKEN
    key (all sources of a token co-locate), each partition folds its
    tokens to source-bitmask counts (`np.bitwise_or.reduceat`, memory
    O(distinct masks), never |sources|² per token), and only
    (source_a, source_b, partial_count) cells — ≤ |sources|² per
    partition — leave the reduce. Final assembly is a driver-side pass
    over the ≤ |sources|² aggregated cells. Requires |sources| ≤ 63
    (bitmask width); raises beyond."""
    from ..config import resolve_num_partitions
    from ..functions.segscore import _to_bytes_array, hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_in = pa.schema([("source", pa.string()), ("tok", pa.string()),
                         ("tok_part", pa.int64())])
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _distinct(batch: pa.Table) -> pa.Table:
        st = _source_tf_rows_batch(batch)
        tok = st["tok"].combine_chunks()
        return pa.table({
            "source": st["source"], "tok": tok,
            "tok_part": pa.array(hash_strings64(tok) % n_parts, pa.int64()),
        }).cast(part_in)

    cell_schema = pa.schema([("source_a", pa.string()),
                             ("source_b", pa.string()), ("n", pa.int64())])

    def _cells(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return cell_schema.empty_table()
        enc = part["source"].combine_chunks().dictionary_encode()
        names = enc.dictionary.to_pylist()
        if len(names) > 63:
            raise ValueError(
                f"vocab_overlap_sources: {len(names)} sources exceed the "
                "63-bit mask; shard the source dimension first")
        sc = np.asarray(enc.indices, np.int64)
        tb = _to_bytes_array(part["tok"].combine_chunks())
        order = np.lexsort((sc, tb))
        tb_s, sc_s = tb[order], sc[order]
        new_tok = np.r_[True, tb_s[1:] != tb_s[:-1]]
        # drop duplicate (source, tok) rows from different upstream blocks
        new_pair = new_tok | np.r_[True, sc_s[1:] != sc_s[:-1]]
        tb_s, sc_s = tb_s[new_pair], sc_s[new_pair]
        new_tok = np.r_[True, tb_s[1:] != tb_s[:-1]]
        starts = np.flatnonzero(new_tok)
        masks = np.bitwise_or.reduceat(
            np.int64(1) << sc_s, starts)
        um, uc = np.unique(masks, return_counts=True)
        rows_a, rows_b, rows_n = [], [], []
        nd = np.bincount(sc_s, minlength=len(names)).astype(np.int64)
        for i, nm in enumerate(names):
            rows_a.append(nm); rows_b.append(nm); rows_n.append(int(nd[i]))
        for i in range(len(names)):
            ai = (um >> i) & 1
            for j in range(i + 1, len(names)):
                c = int(uc[(ai & ((um >> j) & 1)) == 1].sum())
                if c:
                    a, b = sorted((names[i], names[j]))
                    rows_a.append(a); rows_b.append(b); rows_n.append(c)
        return pa.table({
            "source_a": pa.array(rows_a, pa.string()),
            "source_b": pa.array(rows_b, pa.string()),
            "n": pa.array(rows_n, pa.int64()),
        }).cast(cell_schema)

    distinct = _read_docs(sf_dir, columns=("source", "text")).map_batches(
        _distinct, batch_format="pyarrow")
    cells = exchange_map_groups(distinct, "tok_part", n_parts, _cells,
                                cell_schema)
    agg = grouped_sums(cells, ["source_a", "source_b"], ["n"])

    # <= |sources|^2 aggregated cells: driver-side final assembly
    rows = agg.take_all()
    tot = {r["source_a"]: r["sum_n"] for r in rows
           if r["source_a"] == r["source_b"]}
    com = {(r["source_a"], r["source_b"]): r["sum_n"] for r in rows
           if r["source_a"] != r["source_b"]}
    names = sorted(tot)
    out = {k: [] for k in ("source_a", "source_b", "n_common", "n_a",
                           "n_b", "jaccard_ppm")}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            c = int(com.get((a, b), 0))
            na, nb = int(tot[a]), int(tot[b])
            out["source_a"].append(a)
            out["source_b"].append(b)
            out["n_common"].append(c)
            out["n_a"].append(na)
            out["n_b"].append(nb)
            out["jaccard_ppm"].append(1_000_000 * c // (na + nb - c))
    return pa.table(out).cast(VOCAB_OVERLAP_SCHEMA)


CHAR_CLASS_SCHEMA = pa.schema([
    ("lang", pa.string()), ("n_chars", pa.int64()), ("n_alpha", pa.int64()),
    ("n_digit", pa.int64()), ("n_space", pa.int64()), ("n_other", pa.int64()),
])


def char_class_profile_docs(sf_dir: str):
    """Character-class census per language (alpha / digit / space /
    other, in CHARACTERS): the encoding-sanity audit a multilingual
    corpus runs before tokenizer training — a lang whose alpha mass
    collapses or digit mass spikes flags mojibake or table dumps.
    Map-only: three Arrow kernels per block (`utf8_length`,
    `count_substring_regex`, `count_substring`), partial sums per lang,
    one |langs|-row `grouped_sums` exchange. All-integer output."""
    from ..stages.agg import grouped_sums

    part_schema = pa.schema([
        ("lang", pa.string()), ("n_chars", pa.int64()),
        ("n_alpha", pa.int64()), ("n_digit", pa.int64()),
        ("n_space", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lang = batch["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = pc.fill_null(lang, "").dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        n_src = len(enc.dictionary)
        tot = np.asarray(pc.utf8_length(text), np.int64)
        al = np.asarray(pc.count_substring_regex(text, "[a-zA-Z]"),
                        np.int64)
        dg = np.asarray(pc.count_substring_regex(text, "[0-9]"), np.int64)
        sp = np.asarray(pc.count_substring(text, " "), np.int64)
        return pa.table({
            "lang": enc.dictionary,
            "n_chars": pa.array(np.bincount(codes, weights=tot,
                                            minlength=n_src)
                                .astype(np.int64), pa.int64()),
            "n_alpha": pa.array(np.bincount(codes, weights=al,
                                            minlength=n_src)
                                .astype(np.int64), pa.int64()),
            "n_digit": pa.array(np.bincount(codes, weights=dg,
                                            minlength=n_src)
                                .astype(np.int64), pa.int64()),
            "n_space": pa.array(np.bincount(codes, weights=sp,
                                            minlength=n_src)
                                .astype(np.int64), pa.int64()),
        }).cast(part_schema)

    agg = grouped_sums(
        _read_docs(sf_dir, columns=("lang", "text")).map_batches(
            _partial, batch_format="pyarrow"),
        ["lang"], ["n_chars", "n_alpha", "n_digit", "n_space"])

    def _final(t: pa.Table) -> pa.Table:
        tot = np.asarray(t["sum_n_chars"], np.int64)
        al = np.asarray(t["sum_n_alpha"], np.int64)
        dg = np.asarray(t["sum_n_digit"], np.int64)
        sp = np.asarray(t["sum_n_space"], np.int64)
        return pa.table({
            "lang": t["lang"],
            "n_chars": pa.array(tot, pa.int64()),
            "n_alpha": pa.array(al, pa.int64()),
            "n_digit": pa.array(dg, pa.int64()),
            "n_space": pa.array(sp, pa.int64()),
            "n_other": pa.array(tot - al - dg - sp, pa.int64()),
        }).cast(CHAR_CLASS_SCHEMA)

    return agg.map_batches(_final, batch_format="pyarrow")


def length_quantiles_by_split(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-SPLIT document-length quantiles — the post-split sanity check
    that the content-hash train/valid/test assignment
    (`hash_split_docs`) did not skew the length distribution (a split
    whose quantiles diverge signals a content-correlated bucket bug).
    Split assignment is recomputed in-kernel (pure function of the
    text), lengths ride the grouped value-histogram quantile exchange
    (bounded by splits × length domain)."""
    from ..stages.agg import grouped_quantiles_disc

    splits = np.array(["train", "valid", "test"])

    def _assign(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        b = _hex8_to_int(_md5_column(text)) % np.uint64(100)
        idx = np.where(b < 80, 0, np.where(b < 90, 1, 2))
        return pa.table({
            "split": pa.array(splits[idx], pa.string()),
            "n_chars": pc.cast(batch["n_chars"], pa.int64()),
        })

    ds = _read_docs(sf_dir, ("text", "n_chars")).map_batches(
        _assign, batch_format="pyarrow")
    return grouped_quantiles_disc(ds, "split", "n_chars", list(qs))


BIGRAM_SCHEMA = pa.schema([
    ("tok_a", pa.string()),
    ("tok_b", pa.string()),
    ("n_occurrences", pa.int64()),
])


def _bigram_rows_batch(batch: pa.Table) -> pa.Table:
    """(tok_a, tok_b, n) partial counts for every adjacent pair of
    non-empty single-space tokens inside each document of the batch —
    the same tokenizer contract as :func:`_tf_rows_batch` (split on
    ' ', a pair is adjacent in the RAW split, so a double space breaks
    adjacency exactly as SQL's zipped list slices do).

    Adjacency is an index trick on the flattened token array: every
    flat position that isn't the last token of its document pairs with
    position+1; one lexsort over the two S-dtype views run-length
    collapses the batch to partial counts."""
    from ..functions.segscore import _to_bytes_array

    text = pc.fill_null(batch["text"], "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    toks = pc.split_pattern(text, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    ntok = np.asarray(pc.list_value_length(toks), np.int64)
    flat = toks.flatten()
    total = len(flat)
    if total == 0:
        return BIGRAM_SCHEMA.empty_table()
    valid = np.ones(total, dtype=bool)
    ends = np.cumsum(ntok)[ntok > 0] - 1
    valid[ends] = False
    a_idx = np.flatnonzero(valid)
    if a_idx.size == 0:
        return BIGRAM_SCHEMA.empty_table()
    tb = _to_bytes_array(flat)
    ta, tbb = tb[a_idx], tb[a_idx + 1]
    keep = (ta != b"") & (tbb != b"")
    a_idx = a_idx[keep]
    if a_idx.size == 0:
        return BIGRAM_SCHEMA.empty_table()
    ta, tbb = ta[keep], tbb[keep]
    order = np.lexsort((tbb, ta))
    ta_s, tb_s = ta[order], tbb[order]
    new = np.r_[True, (ta_s[1:] != ta_s[:-1]) | (tb_s[1:] != tb_s[:-1])]
    st = np.flatnonzero(new)
    cnt = np.diff(np.r_[st, len(ta_s)])
    first = a_idx[order[st]]
    return pa.table({
        "tok_a": flat.take(pa.array(first, pa.int64())),
        "tok_b": flat.take(pa.array(first + 1, pa.int64())),
        "n_occurrences": pa.array(cnt.astype(np.int64), pa.int64()),
    }).cast(BIGRAM_SCHEMA)


def top_bigrams_docs(sf_dir: str, k: int = 50):
    """Global top-k token BIGRAMS — collocation mining over the corpus
    (the n-gram step above :func:`top_tokens_docs`'s unigram canon).
    Deterministic order: count desc, then (tok_a, tok_b) asc.

    Same scale shape as top_tokens: block-local partial counts, one
    `grouped_sums` exchange keyed on the pair, per-partition top-k
    truncation, final sort over ≤ k×partitions candidates — the full
    bigram vocabulary never leaves its partitions."""
    from ..functions.segscore import _to_bytes_array
    from ..stages.agg import grouped_sums

    g = grouped_sums(
        _read_docs(sf_dir, ("text",)).map_batches(
            _bigram_rows_batch, batch_format="pyarrow"),
        ["tok_a", "tok_b"], ["n_occurrences"])

    def _blk_topk(t: pa.Table) -> pa.Table:
        out = pa.table({"tok_a": t["tok_a"], "tok_b": t["tok_b"],
                        "n_occurrences": t["sum_n_occurrences"]})
        if out.num_rows <= k:
            return out
        nv = np.asarray(out["n_occurrences"], np.int64)
        ab = _to_bytes_array(out["tok_a"].combine_chunks())
        bb = _to_bytes_array(out["tok_b"].combine_chunks())
        idx = np.lexsort((bb, ab, -nv))[:k]
        return out.take(pa.array(np.sort(idx), pa.int64()))

    return (g.map_batches(_blk_topk, batch_format="pyarrow")
            .sort(["n_occurrences", "tok_a", "tok_b"],
                  descending=[True, False, False])
            .limit(k))


TOKEN_LEN_LANG_SCHEMA = pa.schema([
    ("lang", pa.string()),
    ("n_tokens", pa.int64()),
    ("sum_token_chars", pa.int64()),
])


def token_length_by_lang(sf_dir: str):
    """Per-language token mass: count of non-empty single-space tokens
    and the exact sum of their character lengths — the two integers
    behind "mean token length by language" (emit the sums, not the
    ratio: float division is the only thing two engines can disagree
    on). Lengths are UTF-8 CHARACTER counts (``pc.utf8_length``, ==
    SQL ``len()``), folded per row with one ``np.add.reduceat`` over
    the split-list offsets; then one dim-sized grouped_sums."""
    from ..stages.agg import grouped_sums

    def _mass(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        ntok_all = np.asarray(pc.list_value_length(toks), np.int64)
        flat = toks.flatten()
        tok_chars = np.asarray(pc.utf8_length(flat), np.int64)
        # per-row totals via reduceat over the list offsets
        offs = np.r_[np.int64(0), np.cumsum(ntok_all)]
        nonempty = (tok_chars > 0).astype(np.int64)
        n_rows = batch.num_rows
        n_tok = np.zeros(n_rows, np.int64)
        s_chr = np.zeros(n_rows, np.int64)
        nz = ntok_all > 0
        if nz.any():
            n_tok[nz] = np.add.reduceat(nonempty, offs[:-1][nz])
            s_chr[nz] = np.add.reduceat(tok_chars, offs[:-1][nz])
        return pa.table({
            "lang": batch["lang"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "sum_token_chars": pa.array(s_chr, pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet",
                            columns=["lang", "text"]).map_batches(
        _mass, batch_format="pyarrow")
    g = grouped_sums(ds, ["lang"], ["n_tokens", "sum_token_chars"])
    return g.map_batches(
        lambda t: pa.table({"lang": t["lang"],
                            "n_tokens": t["sum_n_tokens"],
                            "sum_token_chars": t["sum_sum_token_chars"]}
                           ).cast(TOKEN_LEN_LANG_SCHEMA),
        batch_format="pyarrow")


SIMPSON_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("n_tokens", pa.int64()),
    ("collisions", pa.int64()),
])


def _source_tok_rows(batch: pa.Table) -> pa.Table:
    """(source, tok, tf) partial rows for every non-empty whitespace
    token — the per-source twin of :func:`_tf_rows_batch` (same split +
    lexsort + run-length shape, keyed on the dictionary-encoded source
    instead of the row)."""
    from ..functions.segscore import _to_bytes_array

    n = batch.num_rows
    text = pc.fill_null(batch["text"], "")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    src = batch["source"]
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    toks = pc.split_pattern(text, " ")
    ntok = np.asarray(pc.list_value_length(toks), np.int64)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    row = np.repeat(np.arange(n, dtype=np.int64), ntok)
    nonempty = np.flatnonzero(
        np.asarray(pc.binary_length(flat), np.int64) > 0)
    out_schema = pa.schema([("source", pa.string()),
                            ("tok", pa.string()),
                            ("tf", pa.int64())])
    if nonempty.size == 0:
        return out_schema.empty_table()
    enc = pc.dictionary_encode(src)
    src_code = np.asarray(enc.indices, np.int64)
    tb = _to_bytes_array(flat)[nonempty]
    sc = src_code[row[nonempty]]
    order = np.lexsort((tb, sc))
    sc_s, tb_s = sc[order], tb[order]
    new_run = np.r_[True,
                    (sc_s[1:] != sc_s[:-1]) | (tb_s[1:] != tb_s[:-1])]
    run_len = np.diff(np.r_[np.flatnonzero(new_run), sc_s.size])
    first_flat = nonempty[order[new_run]]
    return pa.table({
        "source": pc.take(enc.dictionary,
                          pa.array(sc_s[new_run], pa.int64())),
        "tok": pc.take(flat, pa.array(first_flat, pa.int64())),
        "tf": pa.array(run_len.astype(np.int64), pa.int64()),
    }).cast(out_schema)


def token_concentration_by_source(sf_dir: str):
    """Per-source vocabulary concentration as the exact-integer Simpson
    numerator: ``collisions = Σ c·(c−1)`` over the source's token
    counts and ``n_tokens = Σ c`` — the probability two random tokens
    collide is ``collisions / (N·(N−1))``, reported as its integer
    parts so the cross-engine hash never sees a float. One
    :func:`_source_tok_rows` block pass emits (source, tok, partial
    count), one token exchange folds exact per-(source, token) counts,
    and the Σc(c−1) fold moves only vocabulary-sized rows."""
    from ..stages.agg import grouped_sums

    per_tok = grouped_sums(
        _read_docs(sf_dir, columns=("source", "text")).map_batches(
            _source_tok_rows, batch_format="pyarrow"),
        ["source", "tok"], ["tf"])

    def _coll(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["sum_tf"], np.int64)
        return pa.table({
            "source": batch["source"],
            "n_tokens": pa.array(c, pa.int64()),
            "coll": pa.array(c * (c - 1), pa.int64()),
        })

    g = grouped_sums(per_tok.map_batches(_coll, batch_format="pyarrow"),
                     ["source"], ["n_tokens", "coll"])
    return g.map_batches(
        lambda t: pa.table({"source": t["source"],
                            "n_tokens": t["sum_n_tokens"],
                            "collisions": t["sum_coll"]}
                           ).cast(SIMPSON_SCHEMA),
        batch_format="pyarrow")


VOCAB_SIZE_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("n_types", pa.int64()),
    ("n_tokens", pa.int64()),
    ("type_token_e4", pa.int64()),
])


def vocab_size_by_source(sf_dir: str):
    """Type–token profile per source (the Heaps-law observables):
    distinct-token count, total token mass, and their exact floor ratio
    at 1e4 — the lexical-richness twin of
    :func:`token_concentration_by_source`, sharing its (source, tok)
    exact-count exchange; the type/token fold then moves only
    vocabulary-sized rows."""
    from ..stages.agg import grouped_sums

    per_tok = grouped_sums(
        _read_docs(sf_dir, columns=("source", "text")).map_batches(
            _source_tok_rows, batch_format="pyarrow"),
        ["source", "tok"], ["tf"])

    def _fold(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["sum_tf"], np.int64)
        return pa.table({
            "source": batch["source"],
            "types": pa.array(np.ones(len(c), np.int64), pa.int64()),
            "toks": pa.array(c, pa.int64()),
        })

    g = grouped_sums(per_tok.map_batches(_fold, batch_format="pyarrow"),
                     ["source"], ["types", "toks"])

    def _ratio(t: pa.Table) -> pa.Table:
        ty = np.asarray(t["sum_types"], np.int64)
        to = np.asarray(t["sum_toks"], np.int64)
        return pa.table({
            "source": t["source"],
            "n_types": t["sum_types"],
            "n_tokens": t["sum_toks"],
            "type_token_e4": pa.array(ty * 10000 // to, pa.int64()),
        }).cast(VOCAB_SIZE_SCHEMA)

    return g.map_batches(_ratio, batch_format="pyarrow")


FIRST_TOKEN_SCHEMA = pa.schema([
    ("tok", pa.string()),
    ("n_docs", pa.int64()),
])


def doc_first_token_topk(sf_dir: str, k: int = 20):
    """Top-k document-INITIAL tokens (the 'how do documents open'
    profile a boilerplate detector reads): the first whitespace token
    of every doc, global count, top-k by (count desc, token asc) —
    the top_tokens_docs exchange shape with a one-element split per
    row instead of the full explosion."""
    from ..functions.segscore import _to_bytes_array
    from ..stages.agg import grouped_sums

    def _first(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ", max_splits=1)
        first = pc.list_element(toks, 0)
        t = pa.table({"tok": first})
        return t.filter(pc.greater(pc.binary_length(t["tok"]), 0))

    g = grouped_sums(
        _read_docs(sf_dir, columns=("text",)).map_batches(
            _first, batch_format="pyarrow"),
        ["tok"], [], count_as="n_docs")

    def _blk_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t.cast(FIRST_TOKEN_SCHEMA)
        nv = np.asarray(t["n_docs"], np.int64)
        tb = _to_bytes_array(t["tok"].combine_chunks())
        idx = np.lexsort((tb, -nv))[:k]
        return t.take(pa.array(np.sort(idx),
                               pa.int64())).cast(FIRST_TOKEN_SCHEMA)

    return (g.map_batches(_blk_topk, batch_format="pyarrow")
            .sort(["n_docs", "tok"], descending=[True, False])
            .limit(k))


GINI_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("gini_num", pa.int64()),
    ("gini_den", pa.int64()),
])


def length_gini_by_source(sf_dir: str):
    """Length-inequality (Gini) per source as an EXACT integer rational:
    with lengths sorted ascending and ranked 1..n,
    ``num = 2·Σ(rank·len) − (n+1)·Σlen`` and ``den = n·Σlen`` give
    G = num/den — ties commute (equal values at adjacent ranks leave
    the dot product unchanged), so any stable order agrees with SQL's
    row_number. One source exchange; per partition a single argsort +
    dot product."""
    import numpy as np

    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..functions.segscore import hash_strings64
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        return pa.table({
            "source": src,
            "n_chars": pc.cast(batch["n_chars"], pa.int64()),
            "src_part": pa.array(hash_strings64(src) % 1024, pa.int64()),
        })

    def _gini(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return GINI_SCHEMA.empty_table()
        enc = pc.dictionary_encode(part["source"].combine_chunks())
        code = np.asarray(enc.indices, np.int64)
        x = np.asarray(part["n_chars"], np.int64)
        order = np.lexsort((x, code))     # per source, lengths ascending
        code_s, x_s = code[order], x[order]
        first = np.flatnonzero(np.r_[True, code_s[1:] != code_s[:-1]])
        ends = np.r_[first[1:], len(code_s)]
        n = ends - first
        rank = np.arange(len(x_s), dtype=np.int64) - np.repeat(first, n) + 1
        rx = rank * x_s
        sum_rx = np.add.reduceat(rx, first)
        sum_x = np.add.reduceat(x_s, first)
        num = 2 * sum_rx - (n + 1) * sum_x
        den = n * sum_x
        return pa.table({
            "source": pc.take(enc.dictionary,
                              pa.array(code_s[first], pa.int64())),
            "gini_num": pa.array(num, pa.int64()),
            "gini_den": pa.array(den, pa.int64()),
        })

    keyed = _read_docs(sf_dir, columns=("source", "n_chars")
                       ).map_batches(_prep, batch_format="pyarrow")
    return exchange_map_groups(keyed, "src_part",
                               resolve_num_partitions(_cfg),
                               _gini, GINI_SCHEMA)


BLOCKING_SCHEMA = pa.schema([
    ("block_size", pa.int64()),
    ("n_blocks", pa.int64()),
])


def blocking_key_selectivity(sf_dir: str):
    """Dedup-blocking audit: how selective is the cheap blocking key
    (n_chars, first token)? Histogram of block sizes — a heavy tail
    means the key can't bound candidate-pair work and the pipeline
    needs banding (exactly the LSH path's justification). Two folds:
    (key → size), then (size → count); the block table never reaches
    the driver."""
    from ..stages.agg import grouped_sums

    def _key(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        toks = pc.split_pattern(text, " ", max_splits=1)
        return pa.table({
            "n_chars": pc.cast(batch["n_chars"], pa.int64()),
            "first_tok": pc.list_element(toks, 0),
        })

    blocks = grouped_sums(
        _read_docs(sf_dir, columns=("text", "n_chars")).map_batches(
            _key, batch_format="pyarrow"),
        ["n_chars", "first_tok"], [], count_as="block_size")
    g = grouped_sums(blocks.select_columns(["block_size"]),
                     ["block_size"], [], count_as="n_blocks")
    return g.map_batches(lambda t: t.cast(BLOCKING_SCHEMA),
                         batch_format="pyarrow")


ALPHABET_SCHEMA = pa.schema([
    ("n_distinct_chars", pa.int64()),
    ("n_docs", pa.int64()),
])


def alphabet_size_histogram(sf_dir: str,
                            cfg: EngineConfig = DEFAULT_CONFIG):
    """Alphabet-size census: distinct characters per document,
    histogrammed — the cheap entropy proxy that flags binary spill,
    mojibake, or single-character spam without a log() in sight.
    Vectorized off the Arrow string buffers: one unique over the
    (row·256 + byte) composite counts every document's alphabet in a
    single pass (ASCII corpus enforced — a byte ≥ 0x80 raises rather
    than silently diverging from the SQL char-split twin; empty
    documents count alphabet 1, DuckDB's ``string_split('', '')``
    convention). Only ≤ 256 histogram cells shuffle."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _alpha(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch["text"].combine_chunks(), "")
        n = len(col)
        bufs = col.buffers()
        width = 8 if pa.types.is_large_string(col.type) else 4
        offs = np.frombuffer(
            bufs[1], dtype=np.int64 if width == 8 else np.int32,
            count=n + 1, offset=col.offset * width).astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        lens = np.diff(offs)
        start = offs[0]
        span = data[start:offs[-1]]
        if span.size and int(span.max()) >= 0x80:
            raise ValueError("alphabet_size_histogram: non-ASCII byte; "
                             "the byte-level kernel would diverge from "
                             "the char-split SQL twin")
        rix = np.repeat(np.arange(n, dtype=np.int64), lens)
        key = rix * 256 + span.astype(np.int64)
        per_doc = np.bincount(np.unique(key) // 256, minlength=n)
        per_doc[lens == 0] = 1          # '' splits to [''] → alphabet 1
        uk, cn = np.unique(per_doc, return_counts=True)
        return pa.table({
            "n_distinct_chars": pa.array(uk.astype(np.int64),
                                         pa.int64()),
            "n_docs": pa.array(cn.astype(np.int64), pa.int64()),
        })

    g = grouped_sums(
        _read_docs(sf_dir, columns=("text",)).map_batches(
            _alpha, batch_format="pyarrow"),
        ["n_distinct_chars"], ["n_docs"])
    return g.map_batches(
        lambda t: pa.table({"n_distinct_chars": t["n_distinct_chars"],
                            "n_docs": t["sum_n_docs"]}).cast(
            ALPHABET_SCHEMA),
        batch_format="pyarrow")


TOKEN_POS_SCHEMA = pa.schema([
    ("position", pa.int64()),
    ("n_tokens", pa.int64()),
    ("sum_len", pa.int64()),
])


def token_position_length_profile(sf_dir: str,
                                  cfg: EngineConfig = DEFAULT_CONFIG):
    """Positional token-length profile: token char lengths bucketed by
    position within the document (1st, 2nd, 3rd, 4th-or-later) — do
    documents front-load long title-case tokens (a formatting-artifact
    detector for boilerplate headers). Map-only: positions are one
    ``arange − repeat(starts)`` over the per-row token-list offsets, so
    only ≤ 4 partial cells per block shuffle."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _pos(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        trimmed = pc.utf8_trim(
            pc.replace_substring_regex(text, WS_PATTERN, " "), " ")
        splits = pc.split_pattern(trimmed, " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        lens = np.asarray(pc.list_value_length(splits), np.int64)
        flat = pc.list_flatten(splits)
        tlen = np.asarray(pc.utf8_length(flat), np.int64)
        n = len(text)
        starts = np.r_[0, np.cumsum(lens)[:-1]]
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            starts, lens) + 1
        keep = tlen > 0          # engine tokenizer drops empty tokens
        # empty tokens only arise from empty docs ('' splits to ['']),
        # whose single token has length 0 — dropping it keeps position
        # numbering of real tokens intact (they're alone in their doc)
        pos, tlen = np.minimum(pos[keep], 4), tlen[keep]
        if pos.size == 0:
            return TOKEN_POS_SCHEMA.empty_table()
        out_p, out_n, out_s = [], [], []
        for p in (1, 2, 3, 4):
            m = pos == p
            if m.any():
                out_p.append(p)
                out_n.append(int(m.sum()))
                out_s.append(int(tlen[m].sum()))
        return pa.table({
            "position": pa.array(out_p, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "sum_len": pa.array(out_s, pa.int64()),
        })

    g = grouped_sums(
        _read_docs(sf_dir, columns=("text",)).map_batches(
            _pos, batch_format="pyarrow"),
        ["position"], ["n_tokens", "sum_len"])
    return g.map_batches(
        lambda t: pa.table({"position": t["position"],
                            "n_tokens": t["sum_n_tokens"],
                            "sum_len": t["sum_sum_len"]}).cast(
            TOKEN_POS_SCHEMA),
        batch_format="pyarrow")


LANGID_CONFUSION_SCHEMA = pa.schema([
    ("lang_actual", pa.string()),
    ("lang_guess", pa.string()),
    ("n_docs", pa.int64()),
])


def langid_confusion_matrix(sf_dir: str,
                            cfg: EngineConfig = DEFAULT_CONFIG):
    """Classifier-quality confusion matrix for the n-gram language-ID
    heuristic: (actual lang label × predicted lang) cell counts — the
    audit that decides whether the cheap heuristic is good enough to
    gate routing (off-diagonal mass = misrouted documents). Rides the
    SAME LangIdScorer map as ``langid_docs``; only ≤ langs² cells
    shuffle."""
    from ..stages.agg import grouped_sums

    sc = LangIdScorer()

    def _score(batch: pa.Table) -> pa.Table:
        out = sc(batch)
        return pa.table({
            "lang_actual": out["lang_actual"],
            "lang_guess": out["lang_guess"],
        })

    g = grouped_sums(
        _read_docs(sf_dir, columns=("doc_id", "text",
                                    "lang")).map_batches(
            _score, batch_format="pyarrow"),
        ["lang_actual", "lang_guess"], [], count_as="n_docs")
    return g.map_batches(lambda t: t.cast(LANGID_CONFUSION_SCHEMA),
                         batch_format="pyarrow")


TERMINAL_CHAR_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("terminal", pa.string()),
    ("n_docs", pa.int64()),
])


def doc_terminal_char_census(sf_dir: str):
    """Sentence-termination style census per source: classify each
    document by its LAST character — 'period' / 'bang' / 'question' /
    'empty' / 'other' — the cheap truncation detector (a source whose
    docs suddenly stop mid-word shifts mass from 'period' to 'other';
    an 'empty' spike flags extraction failures upstream). Map-only
    slice off the Arrow string buffers; ≤ sources × 5 cells shuffle."""
    import numpy as np

    from ..stages.agg import grouped_sums

    classes = pa.array([".", "!", "?"])
    labels = np.array(["period", "bang", "question"], dtype=object)

    def _cls(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        last = pc.utf8_slice_codeunits(text, -1)
        idx = np.asarray(pc.fill_null(
            pc.index_in(last, value_set=classes), -1), np.int64)
        out = np.where(idx >= 0, labels[np.clip(idx, 0, 2)], "other")
        empty = np.asarray(pc.equal(last, "")).astype(bool)
        out = np.where(empty, "empty", out)
        return pa.table({
            "source": batch["source"],
            "terminal": pa.array(out.tolist(), pa.string()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"]).map_batches(
            _cls, batch_format="pyarrow"),
        ["source", "terminal"], [], count_as="n_docs")
    return g.map_batches(lambda t: t.cast(TERMINAL_CHAR_SCHEMA),
                         batch_format="pyarrow")


CASE_RATIO_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("n_upper", pa.int64()),
    ("n_lower", pa.int64()),
    ("upper_permille", pa.int64()),
])


def case_ratio_by_source(sf_dir: str):
    """Uppercase-mass audit per source: exact upper/lower letter counts
    and the integer-permille upper share — `char_class_profile_docs`
    folds both cases into one alpha bucket, but shouting boilerplate,
    ALL-CAPS headers and licence blocks show up ONLY in the case split.
    Map-only (`count_substring_regex` per case class), per-source
    bincount partials, |sources| cells fold; permille is floor division
    on the exact integers so both engines agree, and an all-digit
    source (zero letters) reports 0‰ by convention on BOTH sides."""
    from ..stages.agg import grouped_sums

    part_schema = pa.schema([
        ("source", pa.string()), ("n_upper", pa.int64()),
        ("n_lower", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"], "")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        src = batch["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        enc = pc.fill_null(src, "").dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        n_s = len(enc.dictionary)
        up = np.asarray(pc.count_substring_regex(text, "[A-Z]"),
                        np.int64)
        lo = np.asarray(pc.count_substring_regex(text, "[a-z]"),
                        np.int64)
        return pa.table({
            "source": enc.dictionary,
            "n_upper": pa.array(np.bincount(codes, weights=up,
                                            minlength=n_s)
                                .astype(np.int64), pa.int64()),
            "n_lower": pa.array(np.bincount(codes, weights=lo,
                                            minlength=n_s)
                                .astype(np.int64), pa.int64()),
        }).cast(part_schema)

    agg = grouped_sums(
        _read_docs(sf_dir, columns=("source", "text")).map_batches(
            _partial, batch_format="pyarrow"),
        ["source"], ["n_upper", "n_lower"])

    def _final(t: pa.Table) -> pa.Table:
        up = np.asarray(t["sum_n_upper"], np.int64)
        lo = np.asarray(t["sum_n_lower"], np.int64)
        denom = up + lo
        pm = np.where(denom > 0, 1000 * up // np.maximum(denom, 1), 0)
        return pa.table({
            "source": t["source"],
            "n_upper": pa.array(up, pa.int64()),
            "n_lower": pa.array(lo, pa.int64()),
            "upper_permille": pa.array(pm, pa.int64()),
        }).cast(CASE_RATIO_SCHEMA)

    return agg.map_batches(_final, batch_format="pyarrow")


NUMERIC_TOKEN_SCHEMA = pa.schema([
    ("lang", pa.string()),
    ("n_tokens", pa.int64()),
    ("n_numeric", pa.int64()),
    ("numeric_permille", pa.int64()),
])


def numeric_token_rate_by_lang(sf_dir: str):
    """Share of whitespace tokens that are PURE digit runs, per lang —
    the table-dump / ID-spam detector at token grain (char-level digit
    mass can't tell '2024 sales rose 3%' prose from a dumped CSV
    column; all-digit TOKENS can). Uses the repo's pinned tokenizer
    convention (WS-normalize → trim → split on ' ', empty text = 0
    tokens); numeric = RE2 full-match `[0-9]+` on the flattened token
    array, folded per lang with one bincount. Permille is floor
    division on exact integers; a lang with zero tokens reports 0‰ on
    both engines."""
    from ..stages.agg import grouped_sums

    part_schema = pa.schema([
        ("lang", pa.string()), ("n_tokens", pa.int64()),
        ("n_numeric", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        lang = batch["lang"]
        if isinstance(lang, pa.ChunkedArray):
            lang = lang.combine_chunks()
        enc = pc.fill_null(lang, "").dictionary_encode()
        codes = np.asarray(enc.indices, np.int64)
        n_l = len(enc.dictionary)
        trimmed = pc.utf8_trim(
            pc.replace_substring_regex(text, WS_PATTERN, " "), " ")
        splits = pc.split_pattern(trimmed, " ")
        n_tok = np.asarray(
            pc.if_else(pc.equal(trimmed, ""),
                       pa.scalar(0, pa.int64()),
                       pc.cast(pc.list_value_length(splits),
                               pa.int64())), np.int64)
        flat = pc.list_flatten(splits)
        num = np.asarray(
            pc.match_substring_regex(flat, r"^[0-9]+$"), bool)
        tok_lang = np.repeat(
            codes, np.asarray(pc.list_value_length(splits), np.int64))
        return pa.table({
            "lang": enc.dictionary,
            "n_tokens": pa.array(np.bincount(codes, weights=n_tok,
                                             minlength=n_l)
                                 .astype(np.int64), pa.int64()),
            "n_numeric": pa.array(np.bincount(tok_lang[num],
                                              minlength=n_l)
                                  .astype(np.int64), pa.int64()),
        }).cast(part_schema)

    agg = grouped_sums(
        _read_docs(sf_dir, columns=("lang", "text")).map_batches(
            _partial, batch_format="pyarrow"),
        ["lang"], ["n_tokens", "n_numeric"])

    def _final(t: pa.Table) -> pa.Table:
        tok = np.asarray(t["sum_n_tokens"], np.int64)
        num = np.asarray(t["sum_n_numeric"], np.int64)
        pm = np.where(tok > 0, 1000 * num // np.maximum(tok, 1), 0)
        return pa.table({
            "lang": t["lang"],
            "n_tokens": pa.array(tok, pa.int64()),
            "n_numeric": pa.array(num, pa.int64()),
            "numeric_permille": pa.array(pm, pa.int64()),
        }).cast(NUMERIC_TOKEN_SCHEMA)

    return agg.map_batches(_final, batch_format="pyarrow")


SOURCE_SPLIT_SCHEMA = pa.schema([
    ("source", pa.string()),
    ("split", pa.string()),
    ("n_docs", pa.int64()),
    ("sum_n_chars", pa.int64()),
])


def source_split_matrix(sf_dir: str):
    """Stratification audit of the content-hash split over PROVENANCE:
    source × {train,valid,test} doc counts + char mass under the exact
    same md5-bucket assignment as `hash_split_docs` — a source whose
    valid share drifts far from 10% means its texts collide in hash
    space (near-duplicate mass), the one failure mode a deterministic
    split can't hide anywhere else. Map-only; ≤ sources × 3 cells
    fold."""
    from ..stages.agg import grouped_sums

    splits = np.array(["train", "valid", "test"])

    def _assign(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch["text"].combine_chunks(), "")
        md5 = _md5_column(text)
        b = _hex8_to_int(md5) % np.uint64(100)
        idx = np.where(b < 80, 0, np.where(b < 90, 1, 2))
        return pa.table({
            "source": batch["source"],
            "split": pa.array(splits[idx], pa.string()),
            "n_chars": batch["n_chars"],
        })

    g = grouped_sums(
        _read_docs(sf_dir, ("text", "source", "n_chars")).map_batches(
            _assign, batch_format="pyarrow"),
        ["source", "split"], ["n_chars"], count_as="n_docs")
    return g.map_batches(
        lambda t: pa.table({
            "source": t["source"], "split": t["split"],
            "n_docs": t["n_docs"], "sum_n_chars": t["sum_n_chars"],
        }).cast(SOURCE_SPLIT_SCHEMA), batch_format="pyarrow")

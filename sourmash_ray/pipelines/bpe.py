"""Distributed byte-level BPE merge training (GPT-2-style tokenizer fit).

The classic trick (Sennrich et al. 2016 `learn_bpe`; GPT-2's byte-level
variant): after ONE distributed pass reduces the corpus to its
word-frequency table, every merge iteration runs on the VOCABULARY —
millions of rows — not the corpus. Each iteration here is:

1. per-batch adjacent-pair counts weighted by word frequency (one
   lexsort/run-length pass over the flattened symbol bytes),
2. a `grouped_sums` exchange of the (pair, partial-count) rows + a
   per-partition top-1 truncation, so the driver sees one candidate row
   per partition and picks the global best by (count desc, pair asc) —
   the deterministic tie-break of the serial reference,
3. a broadcast of the winning pair and a vectorized in-place merge
   (greedy left-to-right, run-parity selection for overlapping matches
   like ``aaa`` + merge (a,a)) applied per batch.

At 100 TB the corpus is touched once; each of the ``n_merges``
iterations ships blocks × distinct-pairs partial rows through one
exchange and exactly one row per partition to the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

def _s_to_binary_array(u: np.ndarray) -> pa.Array:
    """Fixed-width numpy S array → variable-length pa.binary() values,
    zero per-row Python: per-row true lengths (S semantics: trailing
    NULs are padding), one boolean-mask gather of the payload bytes,
    offsets from a cumsum."""
    n = len(u)
    if n == 0:
        return pa.array([], pa.binary())
    w = u.dtype.itemsize
    mat = u.view(np.uint8).reshape(n, w)
    lens = (np.char.str_len(u)).astype(np.int64)
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    mask = np.arange(w, dtype=np.int64)[None, :] < lens[:, None]
    data = np.ascontiguousarray(mat[mask])
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs.astype(np.int32).tobytes()),
         pa.py_buffer(data.tobytes())])


def _bytes_to_byte_symbols(blob: bytes) -> pa.Array:
    """One pa.binary() value per byte of ``blob`` — offsets are arange,
    data is the blob itself (no per-byte Python)."""
    n = len(blob)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None,
         pa.py_buffer(np.arange(n + 1, dtype=np.int32).tobytes()),
         pa.py_buffer(blob)])


MERGE_SCHEMA = pa.schema([
    ("merge_rank", pa.int64()),
    ("left", pa.binary()),
    ("right", pa.binary()),
    ("pair_count", pa.int64()),
])

_VOCAB_SCHEMA = pa.schema([
    ("word", pa.binary()),
    ("freq", pa.int64()),
    ("syms", pa.list_(pa.binary())),
])

_PAIR_SCHEMA = pa.schema([
    ("left", pa.binary()), ("right", pa.binary()), ("cnt", pa.int64()),
])


def _flat_syms(batch: pa.Table):
    """(flat S-array of symbols, word_id per position, freq per word)."""
    syms = batch["syms"].combine_chunks()
    lens = np.asarray(pa.compute.list_value_length(syms), np.int64)
    from ..functions.segscore import _to_bytes_array

    flat = _to_bytes_array(syms.flatten())
    wid = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    freq = np.asarray(batch["freq"], np.int64)
    return flat, wid, freq, lens


def count_pairs_batch(batch: pa.Table) -> pa.Table:
    """Adjacent-pair partial counts, weighted by word frequency."""
    if batch.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    flat, wid, freq, _ = _flat_syms(batch)
    if flat.size < 2:
        return _PAIR_SCHEMA.empty_table()
    adj = wid[1:] == wid[:-1]
    if not adj.any():
        return _PAIR_SCHEMA.empty_table()
    a = flat[:-1][adj]
    b = flat[1:][adj]
    w = freq[wid[:-1][adj]]
    # composite sort key: left + NUL + right (symbols are raw bytes and
    # may share prefixes; NUL cannot appear inside a symbol of UTF-8
    # words split on whitespace, and even if it did the a/b columns are
    # re-read from the run start so the count stays keyed correctly)
    kw = a.dtype.itemsize + b.dtype.itemsize + 1
    key = np.char.add(np.char.add(a.astype(f"S{kw}"), b"\x00"),
                      b).astype(f"S{kw}")
    order = np.argsort(key, kind="stable")
    key_s, w_s = key[order], w[order]
    starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
    sums = np.add.reduceat(w_s, starts)
    idx = order[starts]
    return pa.table({
        "left": _s_to_binary_array(a[idx]),
        "right": _s_to_binary_array(b[idx]),
        "cnt": pa.array(sums, pa.int64()),
    })


def apply_merge_batch(batch: pa.Table, left: bytes,
                      right: bytes) -> pa.Table:
    """Greedy left-to-right merge of every (left, right) adjacency —
    overlapping matches resolve by run parity (positions at even offset
    within a run of consecutive matches merge; odd ones are consumed),
    which is exactly the serial left-to-right scan's outcome."""
    if batch.num_rows == 0:
        return batch
    flat, wid, freq, lens = _flat_syms(batch)
    merged = left + right
    w = max(flat.dtype.itemsize, len(merged), 1)
    flat = flat.astype(f"S{w}")
    if flat.size >= 2:
        m = ((flat[:-1] == left) & (flat[1:] == right)
             & (wid[1:] == wid[:-1]))
    else:
        m = np.zeros(0, bool)
    if m.any():
        mi = np.flatnonzero(m)
        # runs of CONSECUTIVE match positions: offset parity selects the
        # non-overlapping greedy subset
        run_start = np.flatnonzero(np.r_[True, np.diff(mi) != 1])
        run_id = np.cumsum(np.r_[True, np.diff(mi) != 1]) - 1
        offset = mi - mi[run_start][run_id]
        chosen = mi[offset % 2 == 0]
        flat[chosen] = merged
        keep = np.ones(flat.size, bool)
        keep[chosen + 1] = False
        flat = flat[keep]
        removed = np.bincount(wid[chosen + 1], minlength=len(batch))
        lens = lens - removed
    offs = np.zeros(len(batch) + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    return pa.table({
        "word": batch["word"],
        "freq": batch["freq"],
        "syms": pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), _s_to_binary_array(flat)),
    })


def _init_vocab(sf_dir: str):
    """One corpus pass → (word, freq, byte symbols) vocabulary Dataset."""
    from ..stages.agg import grouped_sums
    from .docops import _doc_tf

    vocab = grouped_sums(_doc_tf(sf_dir).select_columns(["tok", "tf"]),
                         ["tok"], ["tf"])

    def _to_syms(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _VOCAB_SCHEMA.empty_table()
        words = [w.encode() for w in t["tok"].to_pylist()]
        lens = np.array([len(w) for w in words], np.int64)
        offs = np.zeros(len(words) + 1, np.int64)
        np.cumsum(lens, out=offs[1:])
        blob = b"".join(words)
        return pa.table({
            "word": pa.array(words, pa.binary()),
            "freq": pa.array(np.asarray(t["sum_tf"], np.int64)),
            "syms": pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()),
                _bytes_to_byte_symbols(blob)),
        })

    return vocab.map_batches(_to_syms, batch_format="pyarrow")


def bpe_train_merges(sf_dir: str, n_merges: int = 20) -> pa.Table:
    """The ordered merge table (the tokenizer artifact): one corpus
    pass, then ``n_merges`` vocabulary-only iterations."""
    out, _ = _train(sf_dir, n_merges)
    return pa.Table.from_pylist(out).cast(MERGE_SCHEMA) if out \
        else MERGE_SCHEMA.empty_table()


def _train(sf_dir: str, n_merges: int):
    """(merge table rows, final vocab Dataset) — shared by the
    merge-table query and the encoder."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..functions.segscore import _to_bytes_array
    from ..stages.agg import grouped_sums

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    vocab = _init_vocab(sf_dir).materialize()
    out = []
    for rank in range(n_merges):
        counts = grouped_sums(
            vocab.map_batches(count_pairs_batch, batch_format="pyarrow"),
            ["left", "right"], ["cnt"], n_parts=n_parts)

        def _top1(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            c = np.asarray(t["sum_cnt"], np.int64)
            la = _to_bytes_array(t["left"].combine_chunks())
            rb = _to_bytes_array(t["right"].combine_chunks())
            i = int(np.lexsort((rb, la, -c))[0])
            return t.slice(i, 1)

        cand = [r for r in counts.map_batches(
            _top1, batch_format="pyarrow").take_all()]
        if not cand:
            break
        cand.sort(key=lambda r: (-r["sum_cnt"], r["left"], r["right"]))
        best = cand[0]
        out.append({"merge_rank": rank, "left": best["left"],
                    "right": best["right"],
                    "pair_count": int(best["sum_cnt"])})
        left, right = best["left"], best["right"]
        vocab = vocab.map_batches(
            lambda t, lf=left, rt=right: apply_merge_batch(t, lf, rt),
            batch_format="pyarrow").materialize()
    return out, vocab


def bpe_token_counts_trained(sf_dir: str, n_merges: int = 12):
    """Encode-side: per-document BPE token counts under the trained
    merges. The corpus is never re-walked symbol-by-symbol — the final
    VOCAB state already holds each word's post-merge symbol count, so
    encoding is one broadcast (word → n_syms) lookup over the exact
    per-(doc, word) tf rows: n_bpe_tokens(doc) = Σ tf·n_syms. Output
    (doc_id, n_bpe_tokens)."""
    from ..functions.segscore import _to_bytes_array
    from .docops import _doc_tf

    _, vocab = _train(sf_dir, n_merges)

    @ray.remote
    def _nsyms(*blocks):
        tables = [t for t in blocks if t.num_rows]
        if not tables:
            return np.empty(0, "S1"), np.empty(0, np.int64)
        tbl = pa.concat_tables(tables).combine_chunks()
        w = _to_bytes_array(tbl["word"])
        n = np.asarray(pa.compute.list_value_length(tbl["syms"]),
                       np.int64)
        order = np.argsort(w, kind="stable")
        return w[order], n[order]

    lut_ref = _nsyms.remote(*vocab.to_arrow_refs())

    def _count(batch: pa.Table) -> pa.Table:
        words, nsyms = ray.get(lut_ref)
        t = batch
        if t.num_rows == 0:
            return pa.schema([("doc_id", pa.int64()),
                              ("n_bpe_tokens", pa.int64())]).empty_table()
        tb = _to_bytes_array(t["tok"].combine_chunks())
        wmax = max(tb.dtype.itemsize, words.dtype.itemsize, 1)
        pos = np.searchsorted(words.astype(f"S{wmax}"),
                              tb.astype(f"S{wmax}"))
        pos = np.minimum(pos, max(len(words) - 1, 0))
        # every corpus token is in the vocab by construction
        per_tok = nsyms[pos] * np.asarray(t["tf"], np.int64)
        doc = np.asarray(t["doc_id"], np.int64)
        uniq, inv = np.unique(doc, return_inverse=True)
        sums = np.bincount(inv, weights=per_tok, minlength=len(uniq))
        return pa.table({
            "doc_id": pa.array(uniq, pa.int64()),
            "n_bpe_tokens": pa.array(sums.astype(np.int64), pa.int64()),
        })

    return _doc_tf(sf_dir).map_batches(_count, batch_format="pyarrow")

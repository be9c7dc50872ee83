"""Persisted inverted text index over the ``documents`` table + a
partition-pruned tf-idf search query.

The disk layout mirrors the engine's other persisted indexes (LSH band
store in `incremental.py`, IVF/PQ lists in `ann.py`): postings are
hive-partitioned by ``tok_file = hash64(token) % N_TOK_FILES`` so a
query for T terms opens at most T partitions' files — the corpus text
is never rescanned at query time, and the index is the small derived
artifact (ints per (doc, token), no text).

    index_dir/postings/tok_file=K/*.parquet   (tok, doc_id, tf)
    index_dir/stats/tok_file=K/*.parquet      (tok, df)
    index_dir/meta.parquet                    (n_docs)

Scoring is the engine's exact-integer tf-idf (`tfidf_top_terms_docs`
rule): ``score = Σ_t tf_t · (n_docs·10⁴ // df_t)`` — no float log, so
the DuckDB oracle reproduces it bit-exactly.

Reference seams: sourmash persists its inverted hash index the same
shape (`/root/reference/src/sourmash/index/revindex.py` hash→signature
postings); this is that idea over text tokens.
"""
from __future__ import annotations

import glob

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.segscore import hash_strings64
from ..sources.tables import read_parquet_clean

N_TOK_FILES = 64

SEARCH_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("score", pa.int64()),
    ("rn", pa.int64()),
])


def _tok_file_col(t: pa.Table) -> pa.Table:
    part = hash_strings64(t["tok"].combine_chunks()) % N_TOK_FILES
    return t.append_column("tok_file",
                           pa.array(part.astype(np.int64), pa.int64()))


def build_text_index(sf_dir: str, index_dir: str) -> None:
    """One tf pass over the corpus writes the postings; the df stats
    are then computed FROM the postings (a pass over the much smaller
    index, one vocab-sized grouped_sums exchange) — the corpus text is
    read exactly once."""
    import pyarrow.parquet as pq

    from ..stages.agg import grouped_sums
    from .docops import _doc_tf

    tf = _doc_tf(sf_dir).map_batches(_tok_file_col,
                                     batch_format="pyarrow")
    tf.write_parquet(f"{index_dir}/postings", partition_cols=["tok_file"])

    posts = ray.data.read_parquet(
        sorted(glob.glob(f"{index_dir}/postings/tok_file=*/*.parquet")),
        columns=["tok"])
    df = grouped_sums(posts, ["tok"], [], count_as="df")
    df.map_batches(_tok_file_col, batch_format="pyarrow").write_parquet(
        f"{index_dir}/stats", partition_cols=["tok_file"])

    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    pq.write_table(pa.table({"n_docs": pa.array([n_docs], pa.int64())}),
                   f"{index_dir}/meta.parquet")


def _pruned_files(index_dir: str, sub: str, terms: list[str]) -> list:
    parts = sorted({int(h % N_TOK_FILES) for h in
                    hash_strings64(pa.array(terms, pa.string()))})
    files: list[str] = []
    for p in parts:
        files += sorted(glob.glob(
            f"{index_dir}/{sub}/tok_file={p}/*.parquet"))
    return files


def text_search_docs(index_dir: str, terms: list[str], k: int = 20):
    """Top-k documents for a bag-of-terms query off the persisted index:
    reads ONLY the ≤|terms| touched postings/stats partitions, scores
    ``Σ tf·idf_e4`` per doc via one doc-keyed `grouped_sums`, then the
    block-truncated global top-k (constant-key `grouped_topk` — ≤k
    candidate rows per block ever move)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.agg import grouped_sums, grouped_topk

    terms = sorted(set(terms))
    n_docs = int(pq.read_table(f"{index_dir}/meta.parquet")["n_docs"][0]
                 .as_py())
    sfiles = _pruned_files(index_dir, "stats", terms)
    tset = pa.array(terms, pa.string())
    dfs = {}
    for f in sfiles:
        t = pq.read_table(f, columns=["tok", "df"])
        t = t.filter(pc.is_in(t["tok"], value_set=tset))
        for r in t.to_pylist():
            dfs[r["tok"]] = r["df"]
    # idf lookup broadcast as sorted S-array + values (tiny)
    from ..functions.segscore import _to_bytes_array

    toks_present = sorted(t for t in terms if t in dfs)
    if not toks_present:
        return ray.data.from_arrow(SEARCH_SCHEMA.empty_table())
    tb = _to_bytes_array(pa.array(toks_present, pa.string()))
    idf = np.array([n_docs * 10_000 // dfs[t] for t in toks_present],
                   np.int64)
    lut_ref = ray.put((tb, idf))

    pfiles = _pruned_files(index_dir, "postings", toks_present)
    posts = ray.data.read_parquet(pfiles,
                                  columns=["tok", "doc_id", "tf"])

    def _score(batch: pa.Table) -> pa.Table:
        keys, vals = ray.get(lut_ref)
        bt = _to_bytes_array(batch["tok"].combine_chunks())
        w = max(keys.dtype.itemsize, bt.dtype.itemsize, 1)
        kw, bw = keys.astype(f"S{w}"), bt.astype(f"S{w}")
        pos = np.searchsorted(kw, bw)
        pos_c = np.minimum(pos, len(kw) - 1)
        hit = kw[pos_c] == bw
        tf = np.asarray(batch["tf"], np.int64)[hit]
        did = np.asarray(batch["doc_id"], np.int64)[hit]
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "part_score": pa.array(tf * vals[pos_c[hit]], pa.int64()),
        })

    scored = grouped_sums(posts.map_batches(_score,
                                            batch_format="pyarrow"),
                          ["doc_id"], ["part_score"])

    def _const(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "score": t["sum_part_score"],
            "g": pa.array(np.zeros(t.num_rows, np.int64), pa.int64()),
        })

    top = grouped_topk(scored.map_batches(_const, batch_format="pyarrow"),
                       key="g", order_col="score", k=k,
                       tiebreak="doc_id")
    return top.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "score": t["score"],
                            "rn": t["rn"]}).cast(SEARCH_SCHEMA),
        batch_format="pyarrow")

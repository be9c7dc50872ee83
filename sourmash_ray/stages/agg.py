"""Partial-aggregate + exchange: the engine's grouped-aggregation shape.

``Dataset.groupby().aggregate()`` in Ray 2.49 runs a sort-based shuffle
with a data-proportional serial component (the reason every wide step in
this engine uses the coarse-key exchange). For grouped sums/counts the
right shape is: Arrow ``group_by`` per block (single-threaded in-task —
Acero's own pool oversubscribes the node), hash-partition ONLY the
partial rows (blocks × n_groups, not the fact rows), merge per
partition. Exactness: every aggregate here is integer-valued (sums of
int64), so partial + merge is bit-identical to a single pass.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.segscore import hash_strings64


def grouped_sums(ds, keys: list[str], sum_cols: list[str],
                 count_as: str | None = None, n_parts: int | None = None):
    """groupby(keys) → integer sums of ``sum_cols`` (+ optional row count
    named ``count_as``), via block-local combiner + exchange. Key columns
    may be string or integer; output column names are
    ``sum_<col>`` / ``count_as``."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from .exchange import exchange_map_groups

    if n_parts is None:
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    out_fields = [(k, None) for k in keys]
    sum_names = [f"sum_{c}" for c in sum_cols]

    def _key_hash(tbl: pa.Table) -> np.ndarray:
        key = pc.cast(tbl[keys[0]], pa.string()).combine_chunks()
        for k in keys[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(tbl[k], pa.string()).combine_chunks(), "|")
        return hash_strings64(key) % 1024

    count_col = sum_cols[0] if sum_cols else keys[0]

    def _partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols]
        if count_as:
            # mode="all": SQL count(*) semantics — a NULL-keyed group
            # must count its rows, not the non-null values of the probe
            # column (options built here: pc options are not
            # cloudpickle-serializable in the captured closure)
            aggs.append((count_col, "count", pc.CountOptions(mode="all")))
        g = batch.group_by(keys, use_threads=False).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        for c, name in zip(sum_cols, sum_names):
            cols[name] = pc.cast(g[f"{c}_sum"], pa.int64())
        if count_as:
            src = f"{sum_cols[0]}_count" if sum_cols else f"{keys[0]}_count"
            cols[count_as] = pc.cast(g[src], pa.int64())
        out = pa.table(cols)
        return out.append_column(
            "grp_part", pa.array(_key_hash(out), pa.int64()))

    merge_aggs = [(n, "sum") for n in sum_names]
    if count_as:
        merge_aggs.append((count_as, "sum"))

    sch = ds.schema()
    key_types = {k: sch.base_schema.field(k).type for k in keys}
    out_schema = pa.schema(
        [(k, key_types[k]) for k in keys]
        + [(n, pa.int64()) for n in sum_names]
        + ([(count_as, pa.int64())] if count_as else []))

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        g = part.group_by(keys, use_threads=False).aggregate(merge_aggs)
        cols = {k: g[k] for k in keys}
        for n in sum_names:
            cols[n] = pc.cast(g[f"{n}_sum"], pa.int64())
        if count_as:
            cols[count_as] = pc.cast(g[f"{count_as}_sum"], pa.int64())
        return pa.table(cols).cast(out_schema)

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    return exchange_map_groups(parts, "grp_part", n_parts, _merge,
                               out_schema)


def grouped_topk(ds, key: str, order_col: str, k: int, tiebreak: str,
                 n_parts: int | None = None):
    """Top-k rows per key with rank — ``row_number() OVER (PARTITION BY
    key ORDER BY order_col DESC, tiebreak ASC) <= k`` as a two-level
    exchange: each block first truncates to ≤k rows PER KEY (the partial
    top-k combiner — a block can never contribute more than k candidates
    for any key), then only those candidates hash-partition by key and
    each partition computes the exact per-key top-k + rank. At 100 TB the
    shuffle carries ≤ k·(distinct keys per block) rows, not the fact
    table.

    ``key`` may be numeric or string (strings sort/group via the
    S-dtype memcmp bytes view — exact runs, not hashes);
    ``order_col`` descending, ``tiebreak`` ascending — both exact
    (IEEE negation / int64), so partial + final is bit-identical to a
    single global pass. Returns all input columns + ``rn`` (1-based).
    """
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from .exchange import exchange_map_groups

    if n_parts is None:
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _truncate(tbl: pa.Table, with_rank: bool):
        from ..functions.segscore import _to_bytes_array

        kcol = tbl[key]
        if pa.types.is_string(kcol.type) or pa.types.is_large_string(
                kcol.type):
            # S-dtype memcmp sorts/compares fine in lexsort — string
            # keys group exactly (run boundaries, not hashes)
            kv = _to_bytes_array(kcol.combine_chunks())
        else:
            kv = np.asarray(kcol)
        ov = np.asarray(tbl[order_col])
        tcol = tbl[tiebreak]
        if pa.types.is_string(tcol.type) or pa.types.is_large_string(
                tcol.type):
            # numpy S-dtype memcmp == UTF-8 bytewise == codepoint order,
            # matching DuckDB's default binary collation
            tb = _to_bytes_array(tcol.combine_chunks())
        else:
            tb = np.asarray(tcol)
        order = np.lexsort((tb, -ov, kv))
        kv = kv[order]
        starts = np.flatnonzero(
            np.concatenate([[True], kv[1:] != kv[:-1]])) \
            if len(kv) else np.empty(0, np.int64)
        lens = np.diff(np.append(starts, len(kv)))
        r = np.arange(len(kv), dtype=np.int64) - np.repeat(starts, lens)
        keep = r < k
        out = tbl.take(pa.array(order[keep], pa.int64()))
        if with_rank:
            out = out.append_column("rn", pa.array(r[keep] + 1, pa.int64()))
        return out

    def _partial(batch: pa.Table) -> pa.Table:
        out = _truncate(batch, with_rank=False)
        part = hash_strings64(
            pc.cast(out[key], pa.string()).combine_chunks()) % 1024
        return out.append_column("grp_part", pa.array(part, pa.int64()))

    sch = ds.schema()
    out_schema = pa.schema(
        [(n, sch.base_schema.field(n).type) for n in sch.names]
        + [("rn", pa.int64())])

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        return _truncate(part.drop_columns(["grp_part"]),
                         with_rank=True).cast(out_schema)

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    return exchange_map_groups(parts, "grp_part", n_parts, _merge,
                               out_schema)


def quantiles_disc(ds, col: str, qs: list[float]) -> pa.Table:
    """Exact discrete quantiles of an INTEGER column via a distributed
    value histogram: block-local (value, count) combine, exchange of the
    partials (:func:`grouped_sums` — per-block distinct values shuffle,
    not rows), then one driver cumsum over the sorted distinct values.
    The driver reduce is bounded by the value DOMAIN (e.g. document
    lengths), not the row count — for unbounded domains bucket first.

    Quantile definition matches DuckDB's ``quantile_disc``: the element
    at index ``max(0, ceil(q*n) - 1)`` of the sorted column. Returns
    (q, value) rows sorted by q.
    """
    import math

    hist = grouped_sums(ds.select_columns([col]), [col], [],
                        count_as="n_rows")
    # NULL values are skipped, matching quantile_disc's NULL handling
    rows = [r for r in hist.take_all() if r[col] is not None]
    vals = np.array(sorted(r[col] for r in rows), dtype=np.int64)
    counts = np.array([r["n_rows"] for r in
                       sorted(rows, key=lambda r: r[col])], dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        if n == 0:
            continue
        idx = max(0, math.ceil(q * n) - 1)
        out_q.append(float(q))
        out_v.append(int(vals[np.searchsorted(cum, idx + 1)]))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})


def grouped_quantiles_disc(ds, group_col: str, col: str,
                           qs: list[float]) -> pa.Table:
    """Per-group exact discrete quantiles — :func:`quantiles_disc` with
    the histogram keyed by (group, value). One exchange; the driver
    reduce is bounded by groups × value domain. Returns
    (group_col, q, value) sorted by (group, q)."""
    import math

    hist = grouped_sums(ds.select_columns([group_col, col]),
                        [group_col, col], [], count_as="n_rows")
    by_grp: dict = {}
    for r in hist.take_all():
        if r[col] is None:          # quantile_disc skips NULL values
            continue
        by_grp.setdefault(r[group_col], []).append((r[col], r["n_rows"]))
    out_g, out_q, out_v = [], [], []
    # NULL groups are kept (GROUP BY keeps them), ordered last
    for g in sorted(by_grp, key=lambda g: (g is None, g)):
        pairs = sorted(by_grp[g])
        vals = np.array([p[0] for p in pairs], np.int64)
        cum = np.cumsum([p[1] for p in pairs])
        n = int(cum[-1])
        if n == 0:
            continue
        for q in qs:
            idx = max(0, math.ceil(q * n) - 1)
            out_g.append(g)
            out_q.append(float(q))
            out_v.append(int(vals[np.searchsorted(cum, idx + 1)]))
    return pa.table({group_col: pa.array(out_g),
                     "q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.int64())})


def grouped_distinct_count(ds, keys: list[str], col: str,
                           distinct_as: str = "n_distinct",
                           count_as: str | None = None,
                           n_parts: int | None = None):
    """``count(DISTINCT col) GROUP BY keys`` (+ optional ``count(*)``)
    without ever shuffling the fact rows: each block first reduces to its
    distinct ``(keys, col)`` combos (Arrow hash group_by), the combos
    exchange partitioned by the FULL combo hash — so every occurrence of
    a combo lands in exactly one partition and per-partition distinct
    counts are disjoint — and only the tiny per-partition
    ``(keys, partial_distinct, partial_rows)`` rows ride a second
    `grouped_sums` exchange. Rows shipped = distinct combos (stage 1)
    + partitions × groups (stage 2), never the fact table.

    NULL ``col`` values are excluded from the distinct count but counted
    in ``count_as`` — SQL semantics."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from .exchange import exchange_map_groups

    if n_parts is None:
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    combo = keys + [col]

    def _combo_hash(tbl: pa.Table) -> np.ndarray:
        key = pc.cast(tbl[combo[0]], pa.string()).combine_chunks()
        key = pc.fill_null(key, "\x00NULL")
        for k in combo[1:]:
            nxt = pc.fill_null(
                pc.cast(tbl[k], pa.string()).combine_chunks(), "\x00NULL")
            key = pc.binary_join_element_wise(key, nxt, "|")
        return hash_strings64(key) % 1024

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(combo, use_threads=False).aggregate(
            [(combo[0], "count", pc.CountOptions(mode="all"))])
        g = g.rename_columns(combo + ["n_rows"])
        return g.append_column(
            "combo_part", pa.array(_combo_hash(g), pa.int64()))

    sch = ds.schema()
    types = {k: sch.base_schema.field(k).type for k in combo}
    mid_schema = pa.schema(
        [(k, types[k]) for k in keys]
        + [("pd", pa.int64()), ("pr", pa.int64())])

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return mid_schema.empty_table()
        # same combo from many blocks → one row; its row counts add up
        g = part.drop_columns(["combo_part"]).group_by(
            combo, use_threads=False).aggregate([("n_rows", "sum")])
        # count (default mode) skips NULL col values; count(*) keeps them
        out = g.group_by(keys, use_threads=False).aggregate(
            [(col, "count"), ("n_rows_sum", "sum")])
        return pa.table(
            {**{k: out[k] for k in keys},
             "pd": pc.cast(out[f"{col}_count"], pa.int64()),
             "pr": pc.cast(out["n_rows_sum_sum"], pa.int64())}
        ).cast(mid_schema)

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    mids = exchange_map_groups(parts, "combo_part", n_parts, _merge,
                               mid_schema)
    agg = grouped_sums(mids, keys, ["pd", "pr"], n_parts=n_parts)

    def _rename(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        cols[distinct_as] = t["sum_pd"]
        if count_as:
            cols[count_as] = t["sum_pr"]
        return pa.table(cols)

    return agg.map_batches(_rename, batch_format="pyarrow")


def grouped_minmax(ds, keys: list[str], col: str,
                   count_as: str | None = None,
                   n_parts: int | None = None):
    """groupby(keys) → min(col), max(col) (+ optional count) via the
    same block-local combiner + exchange as `grouped_sums`: min of
    per-block minima / max of per-block maxima are exact for any
    distribution, so only ≤ groups-per-block partial rows shuffle.
    Output columns: ``min_<col>`` / ``max_<col>`` (+ ``count_as``)."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from .exchange import exchange_map_groups

    if n_parts is None:
        n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _key_hash(tbl: pa.Table) -> np.ndarray:
        key = pc.cast(tbl[keys[0]], pa.string()).combine_chunks()
        for k in keys[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(tbl[k], pa.string()).combine_chunks(), "|")
        return hash_strings64(key) % 1024

    def _partial(batch: pa.Table) -> pa.Table:
        aggs = [(col, "min"), (col, "max")]
        if count_as:
            aggs.append((col, "count", pc.CountOptions(mode="all")))
        g = batch.group_by(keys, use_threads=False).aggregate(aggs)
        cols = {k: g[k] for k in keys}
        cols[f"min_{col}"] = g[f"{col}_min"]
        cols[f"max_{col}"] = g[f"{col}_max"]
        if count_as:
            cols[count_as] = pc.cast(g[f"{col}_count"], pa.int64())
        out = pa.table(cols)
        return out.append_column(
            "grp_part", pa.array(_key_hash(out), pa.int64()))

    sch = ds.schema()
    key_types = {k: sch.base_schema.field(k).type for k in keys}
    val_t = sch.base_schema.field(col).type
    out_schema = pa.schema(
        [(k, key_types[k]) for k in keys]
        + [(f"min_{col}", val_t), (f"max_{col}", val_t)]
        + ([(count_as, pa.int64())] if count_as else []))

    merge_aggs = [(f"min_{col}", "min"), (f"max_{col}", "max")]
    if count_as:
        merge_aggs.append((count_as, "sum"))

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        g = part.group_by(keys, use_threads=False).aggregate(merge_aggs)
        cols = {k: g[k] for k in keys}
        cols[f"min_{col}"] = g[f"min_{col}_min"]
        cols[f"max_{col}"] = g[f"max_{col}_max"]
        if count_as:
            cols[count_as] = pc.cast(g[f"{count_as}_sum"], pa.int64())
        return pa.table(cols).cast(out_schema)

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    return exchange_map_groups(parts, "grp_part", n_parts, _merge,
                               out_schema)

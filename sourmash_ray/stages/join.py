"""Distributed equi-join on the exchange — hash-partition both sides by
the key, join inside each partition with pyarrow's block-local C++ hash
join.

Ray 2.49's native ``Dataset.join`` hash-partitions with a per-row Python
``hash()`` loop and breaks on empty partitions (documented in
``stages/verify.py``), so big-big joins ride the same machinery as every
other wide op here: the two sides are tagged and unioned into ONE
padded-null schema, one exchange co-locates equal keys, and the reduce
runs ``pyarrow.Table.join`` on each partition pair. Rows shipped =
|left| + |right| projected columns, exactly once — the textbook
partitioned hash join. Small sides should NOT use this: broadcast them
(`relational.broadcast_lookup_join` pattern) and skip the shuffle.

Integer keys partition by value (``key % n_parts``); string keys by the
vectorized content hash (`functions.segscore.hash_strings64`) with the
original string carried through the exchange so the in-partition join
still compares exact values — a hash collision only co-locates rows,
never mis-joins them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.segscore import hash_strings64
from .exchange import exchange_map_groups


def hash_join_exchange(left, right, key: str, left_cols: list[str],
                       right_cols: list[str], n_parts: int,
                       join_type: str = "inner",
                       left_key: str | None = None,
                       right_key: str | None = None,
                       salt: int = 1):
    """Equi-join two Datasets on an integer or string key; the joined key
    column is named ``key`` in the output (``left_key`` / ``right_key``
    name the source columns when the sides spell it differently).

    ``left_cols`` / ``right_cols``: payload columns to carry through
    (disjoint names, keys excluded). Output Dataset has
    ``[key] + left_cols + right_cols`` with one block per partition.
    ``join_type`` passes to ``pyarrow.Table.join`` (``inner`` /
    ``left outer`` / ``full outer`` / ``left semi`` / ``left anti``).

    ``salt`` > 1 is the skew valve: a hot probe-side key otherwise sends
    ALL its rows to one partition. With salt=K each LEFT row lands in one
    of K sub-partitions of its key (deterministic round-robin inside the
    block) while every RIGHT row is replicated into all K — each (l, r)
    match is still produced exactly once because a left row exists in
    exactly one sub-partition. Cost: K× build-side duplication; use when
    the probe side is Zipf-skewed and the build side is the small(er)
    side. Not valid for ``full outer`` (replicated right rows would
    multiply unmatched-right output)."""
    left_key = left_key or key
    right_key = right_key or key
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if salt > 1 and join_type == "full outer":
        raise ValueError("salt is not valid for full outer joins: "
                         "unmatched build-side rows would be emitted "
                         "once per salt partition")
    l_types = dict(zip(left.schema().names, left.schema().types))
    r_types = dict(zip(right.schema().names, right.schema().types))
    key_t = l_types[left_key]
    str_key = pa.types.is_string(key_t) or pa.types.is_large_string(key_t)

    if salt > n_parts:
        # K consecutive salted slots stay distinct mod n_parts only for
        # K <= n_parts (a right row must never land twice in one
        # partition — it would duplicate matches)
        raise ValueError(f"salt={salt} must be <= n_parts={n_parts}")

    cols = ([(c, l_types[c], 0) for c in left_cols]
            + [(c, r_types[c], 1) for c in right_cols])
    unified = pa.schema([("__key", pa.int64()), ("__side", pa.int8()),
                         ("__part", pa.int64())]
                        + ([(key, key_t)] if str_key else [])
                        + [(c, t) for c, t, _ in cols])

    def _tag(side: int, key_col: str):
        def _fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            n = batch.num_rows
            kv = batch[key_col].combine_chunks()
            # NULL keys: the partition hash fills them (they must land
            # somewhere), but the carried key column keeps its nulls so
            # the in-partition pyarrow join applies SQL semantics — a
            # NULL key never matches anything (incl. another NULL)
            if str_key:
                base = hash_strings64(pc.fill_null(kv, ""))
                head = [pa.array(base, pa.int64()),
                        pa.array(np.full(n, side, np.int8), pa.int8())]
                keycol = [kv.cast(key_t)]
            else:
                karr = kv.cast(pa.int64())
                base = np.asarray(pc.fill_null(karr, 0), np.int64)
                head = [karr,
                        pa.array(np.full(n, side, np.int8), pa.int8())]
                keycol = []
            base_mod = base % n_parts
            payload = [batch[c].combine_chunks() if s == side
                       else pa.nulls(n, t) for c, t, s in cols]

            def _mk(part: np.ndarray) -> pa.Table:
                return pa.Table.from_arrays(
                    head + [pa.array(part, pa.int64())] + keycol + payload,
                    schema=unified)

            if salt == 1:
                return _mk(base_mod)
            if side == 0:
                # probe side: each row to one of its key's K slots
                sub = np.arange(n, dtype=np.int64) % salt
                return _mk((base_mod * salt + sub) % n_parts)
            # build side: replicate into all K slots of its key
            return pa.concat_tables(
                [_mk((base_mod * salt + s) % n_parts)
                 for s in range(salt)])
        return _fn

    both = left.map_batches(_tag(0, left_key), batch_format="pyarrow") \
        .union(right.map_batches(_tag(1, right_key),
                                 batch_format="pyarrow"))

    l_names = [c for c, _, s in cols if s == 0]
    r_names = [c for c, _, s in cols if s == 1]
    # semi/anti joins emit left rows only — right payload never appears
    semi = join_type in ("left semi", "left anti")
    out_names = [key] + l_names + ([] if semi else r_names)
    out_schema = pa.schema([(key, key_t if str_key else pa.int64())]
                           + [(c, t) for c, t, s in cols
                              if s == 0 or not semi])
    side_key = key if str_key else "__key"

    def _join(part: pa.Table) -> pa.Table:
        side = np.asarray(part["__side"], np.int8)
        lt = (part.filter(pa.array(side == 0))
              .select([side_key] + l_names)
              .rename_columns([key] + l_names))
        rt = (part.filter(pa.array(side == 1))
              .select([side_key] + r_names)
              .rename_columns([key] + r_names))
        if join_type in ("inner", "left semi") and (
                lt.num_rows == 0 or rt.num_rows == 0):
            return out_schema.empty_table()
        if join_type == "left anti" and rt.num_rows == 0:
            return lt.select(out_names).cast(out_schema)
        if semi:
            return _semi_anti_filter(lt, rt, key, join_type,
                                     out_names, out_schema)
        return (lt.join(rt, keys=key, join_type=join_type,
                        use_threads=False)
                .select(out_names).cast(out_schema))

    return exchange_map_groups(both, "__part", n_parts, _join, out_schema)


def _semi_anti_filter(lt: pa.Table, rt: pa.Table, key: str,
                      join_type: str, out_names, out_schema) -> pa.Table:
    """Semi/anti join without Acero: membership needs only the key, and
    left rows pass through wholesale — so payload columns of ANY type
    (incl. list<...>, which Acero's hash join rejects as non-key fields)
    ride along untouched. Semantics match ``Table.join``: a NULL left key
    never matches (dropped by semi, kept by anti)."""
    import pyarrow.compute as pc

    vs = rt[key].combine_chunks().drop_null().unique()
    match = pc.fill_null(
        pc.is_in(lt[key].combine_chunks(), value_set=vs), False)
    keep = match if join_type == "left semi" else pc.invert(match)
    return lt.filter(keep).select(out_names).cast(out_schema)


def broadcast_join(left, right_table: pa.Table, key: str,
                   left_cols: list[str], right_cols: list[str],
                   join_type: str = "inner",
                   left_key: str | None = None,
                   right_key: str | None = None):
    """Map-side equi-join against a SMALL build side: the right table is
    ``ray.put`` once and every probe batch joins it in-task with
    pyarrow's hash join — zero shuffle, zero skew sensitivity (a hot key
    costs nothing extra; this is the first choice whenever the build
    side fits a worker's heap; `hash_join_exchange` is the big-big
    fallback, with ``salt`` for skewed probes). Output columns / key
    naming match `hash_join_exchange`.

    Not valid for ``full outer`` (per-batch joins cannot know which
    build rows stayed unmatched globally).
    """
    import ray as _ray

    if join_type == "full outer":
        raise ValueError("broadcast_join cannot express full outer: "
                         "unmatched build-side rows are a global "
                         "property — use hash_join_exchange")
    left_key = left_key or key
    right_key = right_key or key
    semi = join_type in ("left semi", "left anti")
    rt = right_table.select([right_key] + ([] if semi else right_cols)) \
        .rename_columns([key] + ([] if semi else right_cols))
    rt_ref = _ray.put(rt.combine_chunks())

    l_types = dict(zip(left.schema().names, left.schema().types))
    out_names = [key] + left_cols + ([] if semi else right_cols)
    out_schema = pa.schema(
        [(key, l_types[left_key])]
        + [(c, l_types[c]) for c in left_cols]
        + ([] if semi else [(c, rt.schema.field(c).type)
                            for c in right_cols]))

    def _probe(batch: pa.Table) -> pa.Table:
        r = _ray.get(rt_ref)
        lt = (batch.select([left_key] + left_cols)
              .rename_columns([key] + left_cols))
        if join_type in ("inner", "left semi") and (
                lt.num_rows == 0 or r.num_rows == 0):
            return out_schema.empty_table()
        if join_type == "left anti" and r.num_rows == 0:
            return lt.cast(out_schema)
        if semi:
            return _semi_anti_filter(lt, r, key, join_type,
                                     out_names, out_schema)
        return (lt.join(r, keys=key, join_type=join_type,
                        use_threads=False)
                .select(out_names).cast(out_schema))

    return left.map_batches(_probe, batch_format="pyarrow")

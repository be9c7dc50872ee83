"""Windowed aggregation over the ``events`` stream table.

The reference's only streaming consumer is ``watch``
(``/root/reference/src/sourmash/commands.py:1389-1483``) — re-search every
10k records, no real windows. A training-data engine needs proper windowed
aggregates, so: tumbling windows = truncate-timestamp-then-groupby, which
Ray Data executes as one hash shuffle; no ordering assumption is needed
because the window key is computed per row (SURVEY.md §2.10: order-insensitive
set semantics)."""

from __future__ import annotations

import functools

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.tables import read_parquet_clean


def tumbling_window_counts(sf_dir: str, unit: str = "hour"):
    """Per (event_type, window-start) count + sum(value) rounded to 6
    decimals. Equivalent SQL: date_trunc + GROUP BY."""
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def _window(batch: pa.Table) -> pa.Table:
        # value → exact integer micros per row BEFORE the sum: float sums
        # differ between engines in the last ulp
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": pc.floor_temporal(batch["ts"], unit=unit),
            "value_micros": pc.cast(
                pc.round(pc.multiply(batch["value"], pa.scalar(1e6))),
                pa.int64()),
        })

    from ..stages.agg import grouped_sums

    agg = grouped_sums(ds.map_batches(_window, batch_format="pyarrow"),
                       ["event_type", "window_start"], ["value_micros"],
                       count_as="n_events")
    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "window_start": t["window_start"],
            "n_events": t["n_events"],
            "sum_value_micros": t["sum_value_micros"],
        }), batch_format="pyarrow")


SESSION_SCHEMA = pa.schema([
    ("user_id", pa.int64()),
    ("session_start", pa.timestamp("us")),
    ("n_events", pa.int64()),
])


def sessionize_events(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user: sort within user by ts, break on gaps >
    ``gap_minutes``. Output: one row per session (user_id,
    session_start, n_events).

    Shape: the user-keyed exchange (same contract as
    :func:`asof_join_events`), then each partition sessionizes ALL its
    users in one lexsort + one diff pass — a session breaks where the
    user changes or the gap exceeds the threshold — instead of the
    previous ``groupby(user).map_groups`` (one Python call per user,
    and Ray 2.49's sort-based groupby shuffle behind it)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    gap_us = gap_minutes * 60 * 1_000_000

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def _sessions(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return SESSION_SCHEMA.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        order = np.lexsort((ts, u))
        u, ts = u[order], ts[order]
        new = np.r_[True, (u[1:] != u[:-1]) | (np.diff(ts) > gap_us)]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(u)])
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "session_start": pa.array(ts[starts], pa.int64()).cast(
                pa.timestamp("us")),
            "n_events": pa.array(counts.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"]).map_batches(
        _tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    return exchange_map_groups(ds, "user_id", n_parts, _sessions,
                               SESSION_SCHEMA)


def hopping_window_counts(sf_dir: str, window_hours: int = 2,
                          hop_hours: int = 1):
    """Hopping (overlapping) windows: each event lands in
    ``window/hop`` windows — flat-map the event to every window start,
    then one hash aggregation. Output (event_type, window_start, n_events,
    sum_value_micros), exact-integer sums."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
    n_windows = window_hours // hop_hours
    hop_us = hop_hours * 3_600_000_000

    def _explode(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["ts"].combine_chunks().cast(pa.int64()))
        base = (ts // hop_us) * hop_us  # most recent hop boundary
        n = len(ts)
        idx = np.repeat(np.arange(n, dtype=np.int64), n_windows)
        k = np.tile(np.arange(n_windows, dtype=np.int64), n)
        starts = base[idx] - k * hop_us
        vals = np.asarray(batch["value"], dtype=np.float64)
        micros = np.round(vals * 1e6).astype(np.int64)
        et = batch["event_type"].combine_chunks().take(pa.array(idx))
        return pa.table({
            "event_type": et,
            "window_start": pa.array(starts, pa.int64()).cast(
                pa.timestamp("us")),
            "value_micros": pa.array(micros[idx], pa.int64()),
        })

    from ..stages.agg import grouped_sums

    agg = grouped_sums(ds.map_batches(_explode, batch_format="pyarrow"),
                       ["event_type", "window_start"], ["value_micros"],
                       count_as="n_events")
    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "window_start": t["window_start"],
            "n_events": t["n_events"],
            "sum_value_micros": t["sum_value_micros"],
        }), batch_format="pyarrow")


ASOF_SCHEMA = pa.schema([
    ("purchase_id", pa.int64()),
    ("user_id", pa.int64()),
    ("signup_event", pa.int64()),     # null when no prior right event
    ("gap_us", pa.int64()),
])


def asof_join_events(sf_dir: str, left_type: str = "purchase",
                     right_type: str = "signup"):
    """As-of join — each ``left_type`` event matched to the LATEST
    ``right_type`` event of the same user with ``right.ts <= left.ts``
    (DuckDB ``ASOF LEFT JOIN`` semantics, inclusive).

    Ray Data has no asof operator, so it composes from the primitives the
    engine already owns (brief §custom-operators, path (a)): ONE exchange
    partitions both sides by ``user_id`` — the partitioning assumption is
    that a user's history fits a partition, the same contract as
    ``sessionize_events`` — and inside each partition the match is a
    vectorized composite-key bisect (user ⊕ ts packed into one int64; no
    per-row Python). Right-side (user, ts) duplicates collapse to the max
    event_id first, making the match deterministic on both engines. At
    100 TB: rows shuffled = the two filtered event streams, each row 24
    bytes, one all-to-all."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    uni = pa.schema([("user_id", pa.int64()), ("side", pa.int8()),
                     ("event_id", pa.int64()), ("ts_us", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        keep = pc.is_in(et, value_set=pa.array([left_type, right_type]))
        t = batch.filter(keep)
        side = pc.if_else(pc.equal(t["event_type"], left_type),
                          pa.scalar(0, pa.int8()), pa.scalar(1, pa.int8()))
        return pa.table({
            "user_id": t["user_id"],
            "side": side,
            "event_id": t["event_id"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
        }).cast(uni)

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(_tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    return exchange_map_groups(ds, "user_id", n_parts,
                               asof_merge_partition, ASOF_SCHEMA)


def asof_merge_partition(part: pa.Table) -> pa.Table:
    """Per-partition asof kernel (module-level: hypothesis-tested
    directly against a nested-loop oracle in ``tests/test_join.py``)."""
    import numpy as np

    if part.num_rows == 0:
        return ASOF_SCHEMA.empty_table()
    side = np.asarray(part["side"], np.int8)
    u = np.asarray(part["user_id"], np.int64)
    eid = np.asarray(part["event_id"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    lm = side == 0
    if not lm.any():
        return ASOF_SCHEMA.empty_table()
    rm = ~lm
    ru, rts, rid = u[rm], ts[rm], eid[rm]
    # collapse right (user, ts) duplicates to max event_id: after this
    # lexsort the LAST row of each (user, ts) run has the max id
    order = np.lexsort((rid, rts, ru))
    ru, rts, rid = ru[order], rts[order], rid[order]
    if ru.size:
        last = np.r_[(ru[1:] != ru[:-1]) | (rts[1:] != rts[:-1]), True]
        ru, rts, rid = ru[last], rts[last], rid[last]
    # composite int64 key: user * span + (ts - tmin + 1); right rows
    # get +0, left probes +0 with side='right' so equal ts matches
    tmin = int(ts.min())
    span = int(ts.max()) - tmin + 2
    if u.size and int(u.max()) >= (2**63 - 1) // max(span, 1):
        raise ValueError("user_id × ts span overflows the composite "
                         "asof key; re-partition finer")
    rkey = ru * span + (rts - tmin + 1)
    lkey = u[lm] * span + (ts[lm] - tmin + 1)
    pos = np.searchsorted(rkey, lkey, side="right") - 1
    posc = np.maximum(pos, 0)
    hit = (pos >= 0) & (ru[posc] == u[lm]) if ru.size else \
        np.zeros(lkey.size, bool)
    sig = np.where(hit, rid[posc] if rid.size else 0, 0)
    gap = np.where(hit, ts[lm] - (rts[posc] if rts.size else 0), 0)
    return pa.table({
        "purchase_id": pa.array(eid[lm], pa.int64()),
        "user_id": pa.array(u[lm], pa.int64()),
        "signup_event": pa.array(sig, pa.int64(), mask=~hit),
        "gap_us": pa.array(gap, pa.int64(), mask=~hit),
    })


RANGE_PAIRS_SCHEMA = pa.schema([
    ("a_event", pa.int64()),
    ("b_event", pa.int64()),
    ("user_id", pa.int64()),
    ("dt_us", pa.int64()),
])


def pairs_within_window_events(sf_dir: str, window_minutes: int = 5,
                               chunk_pairs: int = 1 << 22):
    """Range join — ordered pairs of same-user events at most
    ``window_minutes`` apart (``(a.ts, a.id) < (b.ts, b.id)``
    lexicographically, ``b.ts - a.ts <= W``): the interval-join primitive
    behind burst detection / funnel mining.

    Composes like :func:`asof_join_events` (brief §custom-operators path
    (a)): one user-keyed exchange, then per partition ONE sort by
    (user, ts, id) and a single vectorized ``searchsorted`` upper bound
    per row on the same packed user⊕ts composite — the right-edge span
    guard keeps a window from leaking into the next user's run. Pair
    emission is repeat/arange (no Python loop over rows) in bounded
    chunks, so a pathological burst (one user, thousands of events in
    one window) costs memory proportional to the CHUNK, not the square.
    Partitioning assumption: one user's events fit a partition — same
    contract as ``sessionize_events``."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    w_us = int(window_minutes) * 60 * 1_000_000

    uni = pa.schema([("user_id", pa.int64()), ("event_id", pa.int64()),
                     ("ts_us", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "event_id": batch["event_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        }).cast(uni)

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"],
    ).map_batches(_tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    merge = functools.partial(range_merge_partition, w_us=w_us,
                              chunk_pairs=chunk_pairs)
    return exchange_map_groups(ds, "user_id", n_parts, merge,
                               RANGE_PAIRS_SCHEMA)



def range_merge_partition(part: pa.Table, w_us: int,
                          chunk_pairs: int) -> pa.Table:
    """Per-partition range-join kernel (module-level:
    hypothesis-tested against a nested-loop oracle)."""
    import numpy as np

    n = part.num_rows
    if n == 0:
        return RANGE_PAIRS_SCHEMA.empty_table()
    u = np.asarray(part["user_id"], np.int64)
    eid = np.asarray(part["event_id"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    order = np.lexsort((eid, ts, u))
    u, eid, ts = u[order], eid[order], ts[order]
    tmin = int(ts.min())
    # span covers ts+W so a probe key can never reach the next user
    span = int(ts.max()) - tmin + w_us + 2
    if int(u.max()) >= (2**63 - 1) // span:
        raise ValueError("user_id × ts span overflows the composite "
                         "range-join key; re-partition finer")
    key = u * span + (ts - tmin + 1)
    upper = np.searchsorted(key, key + w_us, side="right")
    counts = upper - np.arange(1, n + 1)       # partners after self
    out = []
    start = 0
    while start < n:
        stop = start
        acc = 0
        while stop < n and (acc == 0 or acc + counts[stop]
                            <= chunk_pairs):
            acc += counts[stop]
            stop += 1
        c = counts[start:stop]
        if acc:
            a_idx = np.repeat(np.arange(start, stop), c)
            offs = np.concatenate([np.arange(k) for k in c if k]) \
                if acc else np.empty(0, np.int64)
            b_idx = a_idx + 1 + offs
            out.append(pa.table({
                "a_event": pa.array(eid[a_idx], pa.int64()),
                "b_event": pa.array(eid[b_idx], pa.int64()),
                "user_id": pa.array(u[a_idx], pa.int64()),
                "dt_us": pa.array(ts[b_idx] - ts[a_idx], pa.int64()),
            }))
        start = stop
    return (pa.concat_tables(out) if out
            else RANGE_PAIRS_SCHEMA.empty_table())

def distinct_users_by_type(sf_dir: str):
    """``count(DISTINCT user_id), count(*) GROUP BY event_type`` — the
    grouped-cardinality primitive (unique contributors per slice) via
    :func:`sourmash_ray.stages.agg.grouped_distinct_count`: block-local
    combo dedup, one combo-hash exchange, one tiny partial-count
    exchange. The fact rows never shuffle."""
    from ..stages.agg import grouped_distinct_count

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])
    return grouped_distinct_count(ds, ["event_type"], "user_id",
                                  distinct_as="n_users",
                                  count_as="n_events")


def approx_distinct_users_by_type(sf_dir: str, p: int = 14):
    """HLL twin of `distinct_users_by_type` — constant-size per-group
    registers instead of the distinct-combo shuffle; the 100-TB path
    when combos outnumber sketch cells. Deterministic (murmur-based),
    ±~0.8% at p=14 (tolerance-tested against the exact op)."""
    from ..stages.approx import grouped_approx_distinct

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "user_id"])
    return grouped_approx_distinct(ds, ["event_type"], "user_id", p=p,
                                   distinct_as="approx_n_users")


ROLLING_SCHEMA = pa.schema([
    ("event_id", pa.int64()),
    ("user_id", pa.int64()),
    ("ts_us", pa.int64()),
    ("n_trailing", pa.int64()),
])


def rolling_merge_partition(part: pa.Table, w_us: int) -> pa.Table:
    """Per-partition trailing-window kernel (module-level:
    hypothesis-tested against a nested-loop oracle). For every event,
    the count of same-user events with ``ts in [cur - w, cur]`` — SQL
    ``count(*) OVER (PARTITION BY user ORDER BY ts RANGE BETWEEN w
    PRECEDING AND CURRENT ROW)``, peers (equal ts) included.

    Fully vectorized: one lexsort, then both frame edges are ONE
    ``searchsorted`` each over the composite ``user*span + ts`` key —
    the lower-edge key clips at the user's block start so an
    out-of-range ``ts - w`` can never bleed into the previous user."""
    import numpy as np

    if part.num_rows == 0:
        return ROLLING_SCHEMA.empty_table()
    u = np.asarray(part["user_id"], np.int64)
    eid = np.asarray(part["event_id"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    tmin = int(ts.min())
    span = int(ts.max()) - tmin + 2
    if int(u.max()) >= (2**63 - 1) // max(span, 1):
        raise ValueError("user_id × ts span overflows the composite "
                         "rolling key; re-partition finer")
    ckey = u * span + (ts - tmin + 1)
    order = np.argsort(ckey, kind="stable")
    csorted = ckey[order]
    hi = np.searchsorted(csorted, ckey, side="right")
    lo_key = u * span + np.maximum(ts - w_us - tmin + 1, 0)
    lo = np.searchsorted(csorted, lo_key, side="left")
    return pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "user_id": pa.array(u, pa.int64()),
        "ts_us": pa.array(ts, pa.int64()),
        "n_trailing": pa.array(hi - lo, pa.int64()),
    })


def rolling_rate_events(sf_dir: str, window_hours: int = 1):
    """Trailing time-RANGE window per user — each event's same-user
    event count over the preceding ``window_hours`` (rate limiting /
    burst detection, the frame-based window family the tumbling/hopping
    ops don't cover). One user-keyed exchange (24-byte rows), then the
    vectorized kernel above; same partitioning contract as
    ``sessionize_events`` (a user's history fits a partition)."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    w_us = window_hours * 3600 * 1_000_000

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"],
    ).map_batches(_key, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    return exchange_map_groups(
        ds, "user_id", n_parts,
        functools.partial(rolling_merge_partition, w_us=w_us),
        ROLLING_SCHEMA)


def value_quantiles_by_type(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-event-type exact value quantiles (cents — floats are scaled
    to integers PER ROW before the histogram, the engine's standard
    exactness rule). Rides the (group, value)-histogram exchange of
    `stages/agg.grouped_quantiles_disc`."""
    from ..stages.agg import grouped_quantiles_disc

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def _cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "value_cents": pc.cast(
                pc.round(pc.multiply(batch["value"], pa.scalar(1e2))),
                pa.int64()),
        })

    return grouped_quantiles_disc(
        ds.map_batches(_cents, batch_format="pyarrow"),
        "event_type", "value_cents", list(qs))


def props_key_stats(sf_dir: str):
    """Semi-structured extraction: pull the integer ``k`` out of the
    JSON ``props`` column with one RE2 pass per batch (same engine as
    the DuckDB oracle's ``regexp_extract``), then grouped integer sums
    — the 'parse a JSON-ish blob column at scale' shape. NULL/no-match
    rows are excluded on both sides."""
    from ..stages.agg import grouped_sums

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "props"])

    def _extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch["props"].combine_chunks(),
                             pattern=r"(?P<k>[0-9]+)")
        k = pc.cast(pc.struct_field(m, "k"), pa.int64())
        t = pa.table({"event_type": batch["event_type"], "k": k})
        return t.filter(pc.is_valid(t["k"]))

    return grouped_sums(ds.map_batches(_extract, batch_format="pyarrow"),
                        ["event_type"], ["k"], count_as="n_events")


def winsorized_value_totals(sf_dir: str, q: float = 0.9):
    """Outlier-clipped totals per event type (winsorization — the
    value-domain twin of the length-quantile curation gate): one
    histogram exchange computes each type's q-quantile cent threshold
    (`grouped_quantiles_disc`), the thresholds broadcast, and a second
    streaming pass clips and sums. Integer cents end-to-end."""
    from ..stages.agg import grouped_quantiles_disc, grouped_sums

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def _cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "cents": pc.cast(
                pc.round(pc.multiply(batch["value"], pa.scalar(1e2))),
                pa.int64()),
        })

    cents = ds.map_batches(_cents, batch_format="pyarrow")
    import numpy as np

    import ray as _r

    from ..functions.segscore import _to_bytes_array

    rows = grouped_quantiles_disc(cents, "event_type", "cents",
                                  [q]).to_pylist()
    keys = _to_bytes_array(pa.array([r["event_type"] for r in rows],
                                    pa.string()))
    order = np.argsort(keys, kind="stable")
    thr_ref = _r.put((keys[order],
                      np.array([rows[i]["value"] for i in order],
                               np.int64)))

    def _clip(batch: pa.Table) -> pa.Table:
        tk, tv = _r.get(thr_ref)
        et = batch["event_type"].combine_chunks()
        eb = _to_bytes_array(et)
        w = max(eb.dtype.itemsize, tk.dtype.itemsize, 1)
        pos = np.searchsorted(tk.astype(f"S{w}"), eb.astype(f"S{w}"))
        cap = tv[np.minimum(pos, len(tv) - 1)]
        c = np.minimum(np.asarray(batch["cents"], np.int64), cap)
        return pa.table({"event_type": et,
                         "clipped_cents": pa.array(c, pa.int64())})

    return grouped_sums(cents.map_batches(_clip, batch_format="pyarrow"),
                        ["event_type"], ["clipped_cents"],
                        count_as="n_events")


DEDUPE_CONSEC_SCHEMA = pa.schema([
    ("event_id", pa.int64()),
    ("user_id", pa.int64()),
    ("ts_us", pa.int64()),
    ("event_type", pa.string()),
])


def dedupe_consecutive_partition(part: pa.Table) -> pa.Table:
    """Per-partition kernel (module-level, oracle-tested): keep each
    user's event iff it is the user's first — by (ts, event_id) — or
    its type differs from the immediately preceding kept-or-dropped
    event's type. SQL: ``lag(event_type) OVER (PARTITION BY user_id
    ORDER BY ts, event_id) IS DISTINCT FROM event_type``. One lexsort,
    one shifted compare; type equality via the S-dtype bytes view
    (memcmp — no per-row Python)."""
    import numpy as np

    from ..functions.segscore import _to_bytes_array

    if part.num_rows == 0:
        return DEDUPE_CONSEC_SCHEMA.empty_table()
    u = np.asarray(part["user_id"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    eid = np.asarray(part["event_id"], np.int64)
    tb = _to_bytes_array(part["event_type"].combine_chunks())
    order = np.lexsort((eid, ts, u))
    u_s, t_s = u[order], tb[order]
    keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (t_s[1:] != t_s[:-1])]
    return part.take(pa.array(order[keep], pa.int64())).select(
        [f.name for f in DEDUPE_CONSEC_SCHEMA]).cast(DEDUPE_CONSEC_SCHEMA)


def dedupe_consecutive_events(sf_dir: str):
    """Sessionized event-stream compaction: drop every event whose type
    repeats the same user's immediately preceding event (bot retries /
    double-clicks / at-least-once delivery) — the streaming `DISTINCT
    ON (user, run)` curation op. One user-keyed exchange of 4-column
    rows, then the vectorized kernel above; same partitioning contract
    as ``sessionize_events`` (a user's history fits one partition)."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_type": batch["event_type"],
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(_key, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    return exchange_map_groups(ds, "user_id", n_parts,
                               dedupe_consecutive_partition,
                               DEDUPE_CONSEC_SCHEMA)


FUNNEL_SCHEMA = pa.schema([
    ("user_id", pa.int64()),
    ("a_ts_us", pa.int64()),
    ("b_ts_us", pa.int64()),
    ("converted", pa.int64()),
])


def funnel_merge_partition(part: pa.Table, w_us: int) -> pa.Table:
    """Per-partition funnel kernel: for every user with ≥1 A event,
    the first A timestamp and the first B event inside ``[a_ts,
    a_ts + w]`` (NULL when none — no conversion). Vectorized: per-user
    min-A via one lexsort + run boundaries; the B probe is ONE
    ``searchsorted`` over the composite ``user*span + ts`` key (the
    `rolling_merge_partition` trick)."""
    import numpy as np

    if part.num_rows == 0:
        return FUNNEL_SCHEMA.empty_table()
    u = np.asarray(part["user_id"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    is_a = np.asarray(part["is_a"], np.int64) == 1
    ua, tsa = u[is_a], ts[is_a]
    if ua.size == 0:
        return FUNNEL_SCHEMA.empty_table()
    order_a = np.lexsort((tsa, ua))
    ua_s, tsa_s = ua[order_a], tsa[order_a]
    first = np.r_[True, ua_s[1:] != ua_s[:-1]]
    users, a_ts = ua_s[first], tsa_s[first]

    ub, tsb = u[~is_a], ts[~is_a]
    tmin = int(ts.min())
    span = int(ts.max()) - tmin + 2
    if int(u.max()) >= (2**63 - 1) // max(span, 1):
        raise ValueError("user_id × ts span overflows the composite "
                         "funnel key; re-partition finer")
    ckey_b = ub * span + (tsb - tmin + 1)
    order_b = np.argsort(ckey_b, kind="stable")
    ckey_bs = ckey_b[order_b]
    pos = np.searchsorted(ckey_bs, users * span + (a_ts - tmin + 1),
                          side="left")
    ok = pos < len(ckey_bs)
    safe = np.minimum(pos, max(len(ckey_bs) - 1, 0))
    b_u = ub[order_b][safe] if len(ckey_bs) else np.zeros_like(users)
    b_ts = tsb[order_b][safe] if len(ckey_bs) else np.zeros_like(users)
    conv = ok & (b_u == users) & (b_ts <= a_ts + w_us)
    return pa.table({
        "user_id": pa.array(users, pa.int64()),
        "a_ts_us": pa.array(a_ts, pa.int64()),
        "b_ts_us": pa.array(np.where(conv, b_ts, 0), pa.int64(),
                            mask=~conv),
        "converted": pa.array(conv.astype(np.int64), pa.int64()),
    })


def funnel_conversions_events(sf_dir: str, first_type: str = "view",
                              then_type: str = "click",
                              window_minutes: int = 30):
    """Funnel conversion: per user, the first ``first_type`` event and
    whether a ``then_type`` event follows within ``window_minutes`` —
    the product-analytics conversion primitive. Both event streams
    filter at the scan (only two types' rows ever leave the read), one
    user-keyed exchange, then the vectorized kernel above."""
    import functools as _ft

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    w_us = window_minutes * 60 * 1_000_000

    def _key(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "is_a": pc.cast(pc.equal(batch["event_type"],
                                     pa.scalar(first_type)), pa.int64()),
            "keep": pc.is_in(batch["event_type"],
                             value_set=pa.array([first_type, then_type])),
        })
        return t.filter(t["keep"]).drop_columns(["keep"])

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_type"],
    ).map_batches(_key, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    return exchange_map_groups(
        ds, "user_id", n_parts,
        _ft.partial(funnel_merge_partition, w_us=w_us), FUNNEL_SCHEMA)


def top_event_type_by_user(sf_dir: str):
    """Per-user modal event type with a deterministic tiebreak
    (``row_number() OVER (PARTITION BY user ORDER BY n DESC, type) = 1``)
    — grouped mode, the categorical summary primitive. Composition of
    the two existing exchange aggregates: `grouped_sums` on
    (user, type) then `grouped_topk(k=1)`; the fact rows never shuffle,
    only (user, type, n) partials do."""
    from ..stages.agg import grouped_sums, grouped_topk

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "event_type"])
    counts = grouped_sums(ds, ["user_id", "event_type"], [], count_as="n")
    top = grouped_topk(counts, key="user_id", order_col="n", k=1,
                       tiebreak="event_type")
    return top.select_columns(["user_id", "event_type", "n"])


_US_PER_DAY = 86_400_000_000

RETENTION_PART_SCHEMA = pa.schema([
    ("cohort_day", pa.int64()),
    ("day_offset", pa.int64()),
    ("n", pa.int64()),
])


def retention_merge_partition(part: pa.Table) -> pa.Table:
    """Per-partition retention kernel: each user's full history is
    co-located, so the cohort day (user's first active day) and the
    distinct (user, day_offset) dedup are both exact in-partition —
    the output is partial counts per (cohort_day, day_offset) cell,
    summed exactly by a downstream `grouped_sums`. One lexsort for the
    per-user min, one for the dedup."""
    import numpy as np

    if part.num_rows == 0:
        return RETENTION_PART_SCHEMA.empty_table()
    u = np.asarray(part["user_id"], np.int64)
    day = np.asarray(part["ts_us"], np.int64) // _US_PER_DAY
    order = np.lexsort((day, u))
    u_s, d_s = u[order], day[order]
    new_user = np.r_[True, u_s[1:] != u_s[:-1]]
    run_id = np.cumsum(new_user) - 1
    cohort = d_s[new_user][run_id]          # per-row cohort day
    off = d_s - cohort
    # distinct (user, offset): sorted by user then day, so equal rows
    # are adjacent within a user's run
    keep = np.r_[True, (u_s[1:] != u_s[:-1]) | (off[1:] != off[:-1])]
    ck, ok = cohort[keep], off[keep]
    corder = np.lexsort((ok, ck))
    ck, ok = ck[corder], ok[corder]
    cell = np.r_[True, (ck[1:] != ck[:-1]) | (ok[1:] != ok[:-1])]
    cid = np.cumsum(cell) - 1
    n = np.bincount(cid)
    return pa.table({
        "cohort_day": pa.array(ck[cell], pa.int64()),
        "day_offset": pa.array(ok[cell], pa.int64()),
        "n": pa.array(n.astype(np.int64), pa.int64()),
    })


def user_retention_cohorts(sf_dir: str):
    """Cohort retention matrix: distinct active users per (cohort day =
    user's first active day, day offset since it) — the
    product-analytics retention primitive. One user-keyed exchange of
    16-byte rows does cohort assignment AND the distinct-user dedup
    in-partition (a user's history is co-located, so no self-join and
    no count-distinct shuffle); only ≤cells partial counts reach the
    final tiny `grouped_sums` exchange."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"],
    ).map_batches(_key, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "user_id", n_parts,
                                retention_merge_partition,
                                RETENTION_PART_SCHEMA)
    return grouped_sums(parts, ["cohort_day", "day_offset"], ["n"]
                        ).map_batches(
        lambda t: pa.table({"cohort_day": t["cohort_day"],
                            "day_offset": t["day_offset"],
                            "n_users": t["sum_n"]}),
        batch_format="pyarrow")


TRANSITION_PART_SCHEMA = pa.schema([
    ("prev_type", pa.string()),
    ("next_type", pa.string()),
    ("n", pa.int64()),
])


def transition_merge_partition(part: pa.Table) -> pa.Table:
    """Per-partition Markov-transition kernel: count (prev_type,
    next_type) over consecutive same-user events ordered by (ts,
    event_id). One lexsort; adjacent pairs within a user run pair up by
    a shifted view; pair counting is a second lexsort over the two
    S-dtype columns + run-length (no Python dict)."""
    import numpy as np

    from ..functions.segscore import _to_bytes_array

    if part.num_rows < 2:
        return TRANSITION_PART_SCHEMA.empty_table()
    u = np.asarray(part["user_id"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    eid = np.asarray(part["event_id"], np.int64)
    tcol = part["event_type"].combine_chunks()
    tb = _to_bytes_array(tcol)
    order = np.lexsort((eid, ts, u))
    u_s, t_s = u[order], tb[order]
    same = u_s[1:] == u_s[:-1]
    a, b = t_s[:-1][same], t_s[1:][same]
    if a.size == 0:
        return TRANSITION_PART_SCHEMA.empty_table()
    porder = np.lexsort((b, a))
    a_s, b_s = a[porder], b[porder]
    new_run = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]
    n = np.bincount(np.cumsum(new_run) - 1)
    # take the representative strings back out of the original Arrow
    # array (no bytes→str re-decode): map run firsts to source indices
    src = order[:-1][same][porder[new_run]]
    src_next = order[1:][same][porder[new_run]]
    return pa.table({
        "prev_type": tcol.take(pa.array(src, pa.int64())),
        "next_type": tcol.take(pa.array(src_next, pa.int64())),
        "n": pa.array(n.astype(np.int64), pa.int64()),
    }).cast(TRANSITION_PART_SCHEMA)


def event_transition_counts(sf_dir: str):
    """Event-type transition matrix (user-journey Markov counts): for
    every consecutive same-user event pair ordered by time, count
    (prev_type, next_type) — `lag() OVER (PARTITION BY user ORDER BY
    ts, event_id)` then GROUP BY. One user exchange emits ≤ types²
    partial cells per partition; a tiny `grouped_sums` finishes."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_type": batch["event_type"],
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(_key, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "user_id", n_parts,
                                transition_merge_partition,
                                TRANSITION_PART_SCHEMA)
    return grouped_sums(parts, ["prev_type", "next_type"], ["n"]
                        ).map_batches(
        lambda t: pa.table({"prev_type": t["prev_type"],
                            "next_type": t["next_type"],
                            "n_transitions": t["sum_n"]}),
        batch_format="pyarrow")


TRIGRAM_PART_SCHEMA = pa.schema([
    ("type_1", pa.string()),
    ("type_2", pa.string()),
    ("type_3", pa.string()),
    ("n", pa.int64()),
])


def trigram_merge_partition(part: pa.Table) -> pa.Table:
    """Per-partition second-order Markov kernel: count (t, t+1, t+2)
    event-type triples over consecutive same-user events ordered by
    (ts, event_id). Same lexsort discipline as
    :func:`transition_merge_partition`; the triple condition is the
    AND of two shifted same-user masks, and triple counting is one
    lexsort over three S-dtype views + run-length (no Python dict)."""
    import numpy as np

    from ..functions.segscore import _to_bytes_array

    if part.num_rows < 3:
        return TRIGRAM_PART_SCHEMA.empty_table()
    u = np.asarray(part["user_id"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    eid = np.asarray(part["event_id"], np.int64)
    tcol = part["event_type"].combine_chunks()
    tb = _to_bytes_array(tcol)
    order = np.lexsort((eid, ts, u))
    u_s, t_s = u[order], tb[order]
    same = u_s[1:] == u_s[:-1]
    tri = same[:-1] & same[1:]
    if not tri.any():
        return TRIGRAM_PART_SCHEMA.empty_table()
    a, b, c = t_s[:-2][tri], t_s[1:-1][tri], t_s[2:][tri]
    porder = np.lexsort((c, b, a))
    a_s, b_s, c_s = a[porder], b[porder], c[porder]
    new_run = np.r_[True, (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
                    | (c_s[1:] != c_s[:-1])]
    n = np.bincount(np.cumsum(new_run) - 1)
    # representative strings come back out of the source Arrow array:
    # map each run's first triple to its three ORIGINAL row indices
    first = porder[new_run]
    src1 = order[:-2][tri][first]
    src2 = order[1:-1][tri][first]
    src3 = order[2:][tri][first]
    return pa.table({
        "type_1": tcol.take(pa.array(src1, pa.int64())),
        "type_2": tcol.take(pa.array(src2, pa.int64())),
        "type_3": tcol.take(pa.array(src3, pa.int64())),
        "n": pa.array(n.astype(np.int64), pa.int64()),
    }).cast(TRIGRAM_PART_SCHEMA)


def event_transition_trigrams(sf_dir: str):
    """Second-order user-journey Markov counts: for every run of THREE
    consecutive same-user events ordered by time, count
    (type_1, type_2, type_3) — the `lead(), lead(,2)` twin of
    :func:`event_transition_counts`. One user exchange emits ≤ types³
    partial cells per partition; a tiny `grouped_sums` finishes."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_type": batch["event_type"],
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(_key, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "user_id", n_parts,
                                trigram_merge_partition,
                                TRIGRAM_PART_SCHEMA)
    return grouped_sums(parts, ["type_1", "type_2", "type_3"], ["n"]
                        ).map_batches(
        lambda t: pa.table({"type_1": t["type_1"],
                            "type_2": t["type_2"],
                            "type_3": t["type_3"],
                            "n_trigrams": t["sum_n"]}),
        batch_format="pyarrow")


_ONBOARD_PER_USER = pa.schema([
    ("first_type", pa.string()),
    ("gap_s", pa.int64()),
])


def onboarding_latency_quantiles(sf_dir: str,
                                 qs=(0.25, 0.5, 0.75, 0.9)):
    """Activation-speed profile: for every user with ≥ 2 events, the
    whole-second gap between their FIRST and SECOND event (under the
    deterministic (ts, event_id) ordering), quantiled by the type of
    the first event — how fast does each acquisition channel convert
    to a second touch. One user exchange folds each user to a single
    (first_type, gap_s) row; the shared grouped value-histogram
    quantile reduces ≤ types × distinct-gap cells, never users."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_quantiles_disc
    from ..stages.exchange import exchange_map_groups

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    def _first_two(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return _ONBOARD_PER_USER.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        tcol = part["event_type"].combine_chunks()
        order = np.lexsort((eid, ts, u))
        u_s, ts_s = u[order], ts[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        cnts = np.diff(np.r_[starts, len(u_s)])
        first = starts[cnts >= 2]
        if first.size == 0:
            return _ONBOARD_PER_USER.empty_table()
        gap_s = (ts_s[first + 1] - ts_s[first]) // 1_000_000
        return pa.table({
            "first_type": tcol.take(pa.array(order[first], pa.int64())),
            "gap_s": pa.array(gap_s, pa.int64()),
        }).cast(_ONBOARD_PER_USER)

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"]).map_batches(
        _tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    per = exchange_map_groups(ds, "user_id", n_parts, _first_two,
                              _ONBOARD_PER_USER)
    return grouped_quantiles_disc(per, "first_type", "gap_s", list(qs))


ACTIVE_DAY_SCHEMA = pa.schema([
    ("n_events", pa.int64()),
    ("n_user_days", pa.int64()),
])


def events_per_active_day_histogram(sf_dir: str):
    """Engagement-intensity histogram: events per (user, active day)
    cell, histogrammed — how heavy is a typical active day. Two
    partial-combining ``grouped_sums`` exchanges: fact rows reduce to
    ≤ users × active-days cells in the first, and only the tiny
    (count → n_user_days) histogram rides the second."""
    from ..stages.agg import grouped_sums

    def _day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "day": pc.divide(pc.cast(batch["ts"], pa.int64()),
                             pa.scalar(86_400_000_000, pa.int64())),
        })

    cells = grouped_sums(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"]).map_batches(
            _day, batch_format="pyarrow"),
        ["user_id", "day"], [], count_as="n_events")
    g = grouped_sums(cells.select_columns(["n_events"]), ["n_events"],
                     [], count_as="n_user_days")
    return g.map_batches(lambda t: t.cast(ACTIVE_DAY_SCHEMA),
                         batch_format="pyarrow")


SESS_COUNT_SCHEMA = pa.schema([
    ("n_sessions", pa.int64()),
    ("n_users", pa.int64()),
])

_SESS_PER_USER = pa.schema([("n_sessions", pa.int64())])


def user_session_count_histogram(sf_dir: str, gap_minutes: int = 30):
    """Activity-fragmentation histogram: sessions-per-user counts at
    the standard 30-minute gap rule. The user exchange co-locates every
    user's events, so one lexsort+diff pass yields per-user session
    counts (break flags summed per user run via ``add.reduceat``) and
    each user leaves its partition as ONE int row; the final histogram
    reduces ≤ |users| partial rows — never the event stream. Gap diffs
    are over the sorted per-user timestamp multiset, so timestamp ties
    need no tiebreak (equal values diff to 0 in any order)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    gap_us = gap_minutes * 60 * 1_000_000

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def _counts(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _SESS_PER_USER.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        order = np.lexsort((ts, u))
        u_s, ts_s = u[order], ts[order]
        brk = np.r_[True, (u_s[1:] != u_s[:-1]) | (np.diff(ts_s) > gap_us)]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        n_sessions = np.add.reduceat(brk.astype(np.int64), starts)
        return pa.table({"n_sessions": pa.array(n_sessions, pa.int64())})

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"]).map_batches(
        _tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    per = exchange_map_groups(ds, "user_id", n_parts, _counts,
                              _SESS_PER_USER)
    g = grouped_sums(per, ["n_sessions"], [], count_as="n_users")
    return g.map_batches(lambda t: t.cast(SESS_COUNT_SCHEMA),
                         batch_format="pyarrow")


def peak_hour_by_type(sf_dir: str):
    """Argmax window per group: for every event type, the hour-of-day
    with the most events (deterministic earliest-hour tiebreak) — the
    'when does each signal peak' reporting shape. Composition:
    `grouped_sums` on (type, hour-of-day) → `grouped_topk(k=1)` with a
    STRING group key (S-dtype run grouping); the fact rows shuffle
    only as ≤ types×24 partial cells."""
    from ..stages.agg import grouped_sums, grouped_topk

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def _hour(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "hour": pc.cast(pc.hour(batch["ts"]), pa.int64()),
        })

    counts = grouped_sums(ds.map_batches(_hour, batch_format="pyarrow"),
                          ["event_type", "hour"], [], count_as="n")
    top = grouped_topk(counts, key="event_type", order_col="n", k=1,
                       tiebreak="hour")
    return top.select_columns(["event_type", "hour", "n"])


COOC_PART_SCHEMA = pa.schema([
    ("type_a", pa.string()),
    ("type_b", pa.string()),
    ("n", pa.int64()),
])


def cooccurrence_merge_partition(part: pa.Table) -> pa.Table:
    """Per-partition basket kernel: distinct event types per (user,
    hour-truncated ts) cell, all unordered type pairs (a < b) per cell,
    partial pair counts. One lexsort dedups (cell, type); pair emission
    is run-length repeat/arange over cells (≤ C(types,2) pairs per
    cell, vectorized)."""
    import numpy as np

    from ..functions.segscore import _to_bytes_array

    if part.num_rows == 0:
        return COOC_PART_SCHEMA.empty_table()
    u = np.asarray(part["user_id"], np.int64)
    hr = np.asarray(part["hour_us"], np.int64)
    tcol = part["event_type"].combine_chunks()
    tb = _to_bytes_array(tcol)
    tmin = int(hr.min())
    span = int(hr.max()) - tmin + 2
    if int(u.max()) >= (2**63 - 1) // max(span, 1):
        raise ValueError("user_id × hour span overflows the composite "
                         "co-occurrence key; re-partition finer")
    cell = u * span + (hr - tmin + 1)
    order = np.lexsort((tb, cell))
    c_s, t_s = cell[order], tb[order]
    keep = np.r_[True, (c_s[1:] != c_s[:-1]) | (t_s[1:] != t_s[:-1])]
    c_k, src_k = c_s[keep], order[keep]
    # per-cell run lengths → all (i, j>i) index pairs within each run
    starts = np.flatnonzero(np.r_[True, c_k[1:] != c_k[:-1]])
    lens = np.diff(np.append(starts, len(c_k)))
    npairs = lens * (lens - 1) // 2
    if npairs.sum() == 0:
        return COOC_PART_SCHEMA.empty_table()
    # fully vectorized triangular pair emission: element at within-run
    # index w of a run of length L is 'a' in (L-1-w) pairs; partner is
    # the next 1..(L-1-w) elements — one repeat + one arange ramp
    within = np.arange(len(c_k)) - np.repeat(starts, lens)
    cnt = np.repeat(lens, lens) - 1 - within
    a_idx = np.repeat(np.arange(len(c_k)), cnt)
    csum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    off = np.arange(int(cnt.sum())) - np.repeat(csum, cnt) + 1
    b_idx = a_idx + off
    a = src_k[a_idx]
    b = src_k[b_idx]
    # count identical (type_a, type_b) pairs across cells in one lexsort
    ta, tb2 = tb[a], tb[b]
    porder = np.lexsort((tb2, ta))
    ta_s, tb_s = ta[porder], tb2[porder]
    new_run = np.r_[True, (ta_s[1:] != ta_s[:-1]) | (tb_s[1:] != tb_s[:-1])]
    n = np.bincount(np.cumsum(new_run) - 1)
    firsts = porder[new_run]
    return pa.table({
        "type_a": tcol.take(pa.array(a[firsts], pa.int64())),
        "type_b": tcol.take(pa.array(b[firsts], pa.int64())),
        "n": pa.array(n.astype(np.int64), pa.int64()),
    }).cast(COOC_PART_SCHEMA)


def event_cooccurrence_counts(sf_dir: str):
    """Market-basket co-occurrence: for every (user, hour) cell, the
    distinct unordered event-type pairs seen together, counted across
    cells — the 'which signals fire together' shape. One user exchange
    (hour cells are co-located per user), ≤ C(types,2) partial rows per
    partition, tiny `grouped_sums` finish."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "hour_us": pc.cast(pc.floor_temporal(batch["ts"],
                                                 unit="hour"), pa.int64()),
            "event_type": batch["event_type"],
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_type"],
    ).map_batches(_key, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "user_id", n_parts,
                                cooccurrence_merge_partition,
                                COOC_PART_SCHEMA)
    return grouped_sums(parts, ["type_a", "type_b"], ["n"]).map_batches(
        lambda t: pa.table({"type_a": t["type_a"],
                            "type_b": t["type_b"],
                            "n_cells": t["sum_n"]}),
        batch_format="pyarrow")


def lapsed_users(sf_dir: str, active: str = "2024-01-01",
                 lapsed: str = "2024-01-02"):
    """Set-difference shape (``EXCEPT``): users active on day A with no
    activity on day B. ONE scan computes per-user (any-A, any-B) 0/1
    flags — block-local dedup + max, then summed partials clipped at
    read-out (sum of deduped 0/1 partials > 0 ⇔ max = 1) — no second
    pass and no distinct shuffle."""
    import numpy as np

    from ..stages.agg import grouped_sums

    day = 86_400_000_000
    a0 = np.datetime64(active, "us").astype(np.int64)
    a1 = a0 + day
    b0 = np.datetime64(lapsed, "us").astype(np.int64)
    b1 = b0 + day

    def _flags(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch["ts"], pa.int64()), np.int64)
        u = np.asarray(batch["user_id"], np.int64)
        in_a = (ts >= a0) & (ts < a1)
        in_b = (ts >= b0) & (ts < b1)
        keep = in_a | in_b
        u, in_a, in_b = u[keep], in_a[keep], in_b[keep]
        # block-local dedup to one row per (user, flag-combo) so the
        # summed partials stay tiny and clip-at-merge is exact
        uniq, inv = np.unique(u, return_inverse=True)
        fa = np.zeros(len(uniq), np.int64)
        fb = np.zeros(len(uniq), np.int64)
        np.maximum.at(fa, inv, in_a.astype(np.int64))
        np.maximum.at(fb, inv, in_b.astype(np.int64))
        return pa.table({
            "user_id": pa.array(uniq, pa.int64()),
            "f_a": pa.array(fa, pa.int64()),
            "f_b": pa.array(fb, pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"])
    agg = grouped_sums(ds.map_batches(_flags, batch_format="pyarrow"),
                       ["user_id"], ["f_a", "f_b"])

    def _filter(t: pa.Table) -> pa.Table:
        fa = np.asarray(t["sum_f_a"], np.int64) > 0
        fb = np.asarray(t["sum_f_b"], np.int64) > 0
        keep = fa & ~fb
        return pa.table({"user_id": t["user_id"].filter(
            pa.array(keep))})

    return agg.map_batches(_filter, batch_format="pyarrow")


PATHS_SCHEMA = pa.schema([
    ("user_id", pa.int64()),
    ("path", pa.string()),
    ("n_events", pa.int64()),
])


def paths_merge_partition(part: pa.Table) -> pa.Table:
    """Ordered string-aggregation kernel: per user, the comma-joined
    event-type sequence ordered by (ts, event_id) — ``string_agg(type,
    ',' ORDER BY ts, id)``. One lexsort; the join itself is
    ``pc.binary_join`` over a ListArray built straight from the run
    offsets (no per-user Python, no bytes concatenation loop)."""
    import numpy as np

    if part.num_rows == 0:
        return PATHS_SCHEMA.empty_table()
    u = np.asarray(part["user_id"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    eid = np.asarray(part["event_id"], np.int64)
    order = np.lexsort((eid, ts, u))
    u_s = u[order]
    starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
    lens = np.diff(np.append(starts, len(u_s)))
    tcol = part["event_type"].combine_chunks()
    sorted_types = tcol.take(pa.array(order, pa.int64()))
    offsets = pa.array(np.append(starts, len(u_s)).astype(np.int32),
                       pa.int32())
    if isinstance(sorted_types, pa.ChunkedArray):
        sorted_types = sorted_types.combine_chunks()
    la = pa.ListArray.from_arrays(offsets, sorted_types)
    joined = pc.binary_join(la, ",")
    return pa.table({
        "user_id": pa.array(u_s[starts], pa.int64()),
        "path": joined,
        "n_events": pa.array(lens.astype(np.int64), pa.int64()),
    }).cast(PATHS_SCHEMA)


def user_event_paths(sf_dir: str):
    """Per-user ordered event sequence (behavior strings for sequence
    modeling / clickstream mining): `string_agg(event_type, ','
    ORDER BY ts, event_id)` per user — one user exchange, then the
    fully vectorized kernel above. Same co-location contract as
    `sessionize_events`."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_type": batch["event_type"],
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(_key, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    return exchange_map_groups(ds, "user_id", n_parts,
                               paths_merge_partition, PATHS_SCHEMA)


def session_length_histogram(sf_dir: str, gap_minutes: int = 30):
    """Distribution of session lengths (how many sessions have k events)
    — the engagement-shape summary on top of :func:`sessionize_events`.
    One extra constant-size combine over the session rows; the events
    table still crosses the wire exactly once (inside sessionize's user
    exchange), and the histogram cells are bounded by the session-length
    DOMAIN, not the row count."""
    from ..stages.agg import grouped_sums

    return grouped_sums(sessionize_events(sf_dir, gap_minutes),
                        ["n_events"], [], count_as="n_sessions")


GAPQ_SCHEMA = pa.schema([("event_type", pa.string()),
                         ("gap_s", pa.int64())])


def event_gap_quantiles_by_type(sf_dir: str,
                                qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-type inter-event gap quantiles (whole seconds) — the
    arrival-cadence summary behind rate-limit / anomaly thresholds.
    One user-keyed exchange computes every user's ordered gaps in a
    single lexsort+diff pass (the sessionize kernel shape); the gap is
    attributed to the LATER event's type. Gaps quantize to seconds so
    the downstream value-histogram quantile exchange
    (:func:`~sourmash_ray.stages.agg.grouped_quantiles_disc`) stays
    bounded by the value DOMAIN, not the event count."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_quantiles_disc
    from ..stages.exchange import exchange_map_groups

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"]).map_batches(
        _tag, batch_format="pyarrow")
    gaps = exchange_map_groups(ds, "user_id",
                               resolve_num_partitions(DEFAULT_CONFIG),
                               gap_rows_partition, GAPQ_SCHEMA)
    return grouped_quantiles_disc(gaps, "event_type", "gap_s", list(qs))


def gap_rows_partition(part: pa.Table) -> pa.Table:
    """Per-partition inter-event gap kernel (module-level for direct
    kernel tests): lexsort (user, ts, event_id), diff within user, gap
    attributed to the later event's type, quantized to whole seconds."""
    import numpy as np

    if part.num_rows == 0:
        return GAPQ_SCHEMA.empty_table()
    u = np.asarray(part["user_id"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    eid = np.asarray(part["event_id"], np.int64)
    order = np.lexsort((eid, ts, u))
    u_s, ts_s = u[order], ts[order]
    same = np.r_[False, u_s[1:] == u_s[:-1]]
    gap = ts_s - np.r_[np.int64(0), ts_s[:-1]]
    et = part["event_type"].combine_chunks().take(
        pa.array(order[same], pa.int64()))
    return pa.table({
        "event_type": et,
        "gap_s": pa.array(gap[same] // 1_000_000, pa.int64()),
    })


def daily_active_users(sf_dir: str):
    """DAU — ``count(DISTINCT user_id), count(*)`` per calendar day: the
    engagement time series every event pipeline reports. Day truncation
    happens in-kernel (integer floor of the epoch-us timestamp), then
    the grouped-distinct machinery runs with days as keys — fact rows
    never shuffle, only distinct (day, user) combos do."""
    import numpy as np

    from ..stages.agg import grouped_distinct_count

    day_us = 86_400_000_000

    def _day(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch["ts"], pa.int64()))
        return pa.table({
            "day": pa.array((ts // day_us) * day_us,
                            pa.int64()).cast(pa.timestamp("us")),
            "user_id": batch["user_id"],
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "user_id"]).map_batches(
        _day, batch_format="pyarrow")
    return grouped_distinct_count(ds, ["day"], "user_id",
                                  distinct_as="n_users",
                                  count_as="n_events")


def events_by_weekday(sf_dir: str):
    """Event counts + exact value micro-sums per (ISO weekday,
    event_type) — the weekly-seasonality profile (the calendar twin of
    the hourly histogram). Map-only partials + one tiny cell
    exchange."""
    import numpy as np

    from ..sources.tables import read_parquet_clean
    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch["ts"], pa.int64()))
        day = ts // 86_400_000_000
        # 1970-01-01 was a Thursday; ISO Monday=1..Sunday=7
        wd = ((day + 3) % 7) + 1
        # NULL values contribute 0 to the sum (== SQL sum() ignoring
        # NULL) while the row still counts in n_events (== count(*))
        micros = np.rint(np.asarray(
            pc.fill_null(batch["value"], 0.0), np.float64)
            * 1e6).astype(np.int64)
        return pa.table({
            "weekday": pa.array(wd.astype(np.int64), pa.int64()),
            "event_type": batch["event_type"],
            "value_micros": pa.array(micros, pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type",
                                     "value"]).map_batches(
        _prep, batch_format="pyarrow")
    out = grouped_sums(ds, ["weekday", "event_type"], ["value_micros"],
                       count_as="n_events")
    return out.map_batches(
        lambda t: pa.table({"weekday": t["weekday"],
                            "event_type": t["event_type"],
                            "n_events": t["n_events"],
                            "sum_value_micros": t["sum_value_micros"]}),
        batch_format="pyarrow")


def user_activity_span(sf_dir: str):
    """Per-user activity envelope: event count, first/last event time
    (µs) and the span between them — the account-age / activity-window
    profile an event-cohort analysis starts from. Grouped min/max
    partials through the key exchange; the span is a map over the
    already-aggregated rows."""
    from ..stages.agg import grouped_minmax

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"]).map_batches(
        _prep, batch_format="pyarrow")
    mm = grouped_minmax(ds, ["user_id"], "ts_us", count_as="n_events")
    return mm.map_batches(
        lambda t: pa.table({
            "user_id": t["user_id"],
            "n_events": t["n_events"],
            "first_ts_us": t["min_ts_us"],
            "last_ts_us": t["max_ts_us"],
            "span_us": pc.subtract(t["max_ts_us"], t["min_ts_us"]),
        }), batch_format="pyarrow")


def events_value_histogram(sf_dir: str, bucket_micros: int = 5_000_000):
    """Histogram of event values (µ-scaled, ``bucket_micros`` buckets)
    per event type — the payload-magnitude profile an ingest validator
    alerts on. Values are non-negative in this corpus but the bucketing
    still shifts (truncate-vs-floor discipline); NULL values are
    dropped, matching SQL's GROUP BY on a NULL-propagating expression.
    Map-only bucketing; only (type, bucket, count) cells shuffle."""
    import numpy as np

    from ..stages.agg import grouped_sums

    SHIFT = 1 << 40

    def _prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch["value"]))
        v = np.asarray(
            pc.cast(pc.round(pc.multiply(t["value"], pa.scalar(1e6))),
                    pa.int64()), np.int64)
        if v.size and v.min() < -SHIFT:
            raise ValueError("value below the bucket shift")
        b = ((v + SHIFT) // bucket_micros) * bucket_micros - SHIFT
        return pa.table({
            "event_type": t["event_type"],
            "bucket_micros": pa.array(b, pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"]).map_batches(
        _prep, batch_format="pyarrow")
    return grouped_sums(ds, ["event_type", "bucket_micros"], [],
                        count_as="n_events")


def event_hour_profile(sf_dir: str):
    """Turns-of-the-clock profile: events per (event_type, hour-of-day)
    — the diurnal-load matrix a capacity planner reads. Map-only;
    |types|×24 cells shuffle."""
    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        import numpy as np

        us = np.asarray(pc.cast(batch["ts"], pa.int64()), np.int64)
        hour = (us // 3_600_000_000) % 24
        return pa.table({
            "event_type": batch["event_type"],
            "hour": pa.array(hour, pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "ts"]).map_batches(
        _prep, batch_format="pyarrow")
    return grouped_sums(ds, ["event_type", "hour"], [],
                        count_as="n_events")


def user_event_type_diversity(sf_dir: str):
    """Histogram of per-user event-type breadth (n_types → n_users):
    the engagement-diversity profile — monocultures (1 type) are bots /
    scrapers, broad users are the retention cohort. Fact rows never
    shuffle: block-distinct (user, type) combos ride the
    `grouped_distinct_count` exchange, then one ≤|type-domain| cell
    exchange."""
    from ..stages.agg import grouped_distinct_count, grouped_sums

    per = grouped_distinct_count(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type"]),
        ["user_id"], "event_type", distinct_as="n_types")
    return grouped_sums(
        per.map_batches(lambda t: pa.table({"n_types": t["n_types"]}),
                        batch_format="pyarrow"),
        ["n_types"], [], count_as="n_users")


def events_weekday_hour_heatmap(sf_dir: str):
    """Weekday × hour activity heatmap (counts + exact value cents per
    cell) — the 2-D cross of `events_by_weekday` and
    `event_hour_profile`: the load-shape table capacity planning reads.
    Map-only cell assignment (two integer divisions off the epoch-us
    column), ≤ 168 cells ride the exchange. Weekday is ISO
    (1 = Monday … 7 = Sunday), the `events_by_weekday` convention."""
    import numpy as np

    from ..stages.agg import grouped_sums

    day_us = 86_400_000_000
    hour_us = 3_600_000_000

    def _cell(batch: pa.Table) -> pa.Table:
        ts = np.asarray(pc.cast(batch["ts"], pa.int64()), np.int64)
        # 1970-01-01 is a Thursday: epoch day 0 → isodow 4
        dow = ((ts // day_us + 3) % 7) + 1
        hour = (ts // hour_us) % 24
        val = np.asarray(
            pc.fill_null(pc.round(pc.multiply(
                batch["value"], pa.scalar(100.0))), 0), np.float64)
        return pa.table({
            "weekday": pa.array(dow, pa.int64()),
            "hour": pa.array(hour, pa.int64()),
            "cents": pa.array(np.rint(val).astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"]).map_batches(
        _cell, batch_format="pyarrow")
    g = grouped_sums(ds, ["weekday", "hour"], ["cents"],
                     count_as="n_events")
    return g.map_batches(
        lambda t: pa.table({
            "weekday": t["weekday"], "hour": t["hour"],
            "n_events": t["n_events"], "sum_cents": t["sum_cents"],
        }), batch_format="pyarrow")


SESSION_SWEEP_SCHEMA = pa.schema([
    ("gap_minutes", pa.int64()), ("n_sessions", pa.int64()),
])


def session_gap_threshold_sweep(sf_dir: str,
                                gaps_minutes=(5, 15, 30, 60, 120)):
    """Sessionization tuning curve: total session count at each
    inactivity-gap threshold, from ONE pass over the per-user gap lists
    — the `neardup_threshold_sweep` idea applied to sessionize
    (pick the knee before paying for the real run). n_sessions(g) =
    n_users + |inter-event gaps > g|, so each partition emits one
    vectorized `searchsorted` row over its SORTED gap array per
    threshold; k thresholds cost one extra sort, not k passes."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    thr_us = np.array(sorted(gaps_minutes), np.int64) * 60_000_000

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
        })

    part_schema = pa.schema([("gap_minutes", pa.int64()),
                             ("n", pa.int64())])

    def _counts(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s = u[order], ts[order]
        same = np.r_[False, u_s[1:] == u_s[:-1]]
        gaps = np.sort((ts_s - np.r_[np.int64(0), ts_s[:-1]])[same])
        n_users = int((~same).sum())
        # sessions at threshold g = users + gaps strictly greater than g
        over = len(gaps) - np.searchsorted(gaps, thr_us, side="right")
        return pa.table({
            "gap_minutes": pa.array(np.array(sorted(gaps_minutes),
                                             np.int64), pa.int64()),
            "n": pa.array(over.astype(np.int64) + n_users, pa.int64()),
        }).cast(part_schema)

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts",
                                     "event_id"]).map_batches(
        _tag, batch_format="pyarrow")
    parts = exchange_map_groups(ds, "user_id",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _counts, part_schema)
    g = grouped_sums(parts, ["gap_minutes"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"gap_minutes": t["gap_minutes"],
                            "n_sessions": t["sum_n"]}
                           ).cast(SESSION_SWEEP_SCHEMA),
        batch_format="pyarrow")


DAILY_STREAK_SCHEMA = pa.schema([
    ("streak_days", pa.int64()),
    ("n_users", pa.int64()),
])


def user_daily_streaks(sf_dir: str):
    """Longest consecutive-active-DAY streak per user, as a histogram
    (streak_days, n_users) — the gaps-and-islands engagement shape a
    retention dashboard runs daily. A "day" is the epoch-microsecond
    floor-division bucket ``ts_us // 24h`` (deterministic across
    engines; the testdata events span 30 days, so day grain is the one
    that yields a non-degenerate streak distribution).

    One user-keyed exchange; each partition does ONE lexsort over all
    its users: (user, day) dedup, island break where the user changes
    or the day step isn't +1, per-island lengths by ``np.diff`` over
    break positions, per-user max streak by ``np.maximum.reduceat`` (a
    user's islands are contiguous after the sort), then only the tiny
    (streak, count) partials reach the final combine — SQL's double
    row_number() gaps-and-islands without a window function in sight."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    day_us = 86_400 * 1_000_000

    def _tag(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())
        return pa.table({
            "user_id": batch["user_id"],
            "d": pc.divide(ts, pa.scalar(day_us, pa.int64())),
        })

    part_schema = DAILY_STREAK_SCHEMA

    def _streaks(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        w = np.asarray(part["d"], np.int64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        u, w = u[keep], w[keep]
        new_isl = np.r_[True, (u[1:] != u[:-1]) | (np.diff(w) != 1)]
        isl_len = np.diff(np.r_[np.flatnonzero(new_isl), len(u)])
        isl_user = u[new_isl]
        first_isl = np.flatnonzero(
            np.r_[True, isl_user[1:] != isl_user[:-1]])
        max_streak = np.maximum.reduceat(isl_len, first_isl)
        vals, cnts = np.unique(max_streak, return_counts=True)
        return pa.table({
            "streak_days": pa.array(vals.astype(np.int64), pa.int64()),
            "n_users": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"]).map_batches(
        _tag, batch_format="pyarrow")
    parts = exchange_map_groups(ds, "user_id",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _streaks, part_schema)
    g = grouped_sums(parts, ["streak_days"], ["n_users"])
    return g.map_batches(
        lambda t: pa.table({"streak_days": t["streak_days"],
                            "n_users": t["sum_n_users"]}
                           ).cast(DAILY_STREAK_SCHEMA),
        batch_format="pyarrow")


ENTRY_EXIT_SCHEMA = pa.schema([
    ("entry_type", pa.string()),
    ("exit_type", pa.string()),
    ("n_sessions", pa.int64()),
])


def session_entry_exit_matrix(sf_dir: str, gap_minutes: int = 30):
    """How sessions START vs how they END: sessionize per user at the
    ``gap_minutes`` inactivity threshold (same break rule as
    :func:`sessionize_events`), take the first and last event_type of
    every session under the deterministic (ts, event_id) order, and
    count sessions per (entry_type, exit_type) cell — the landing/exit
    matrix of web analytics, over the same single user exchange.

    Only (entry, exit, partial-count) rows leave the partitions; the
    event_id tiebreak makes the first/last picks reproducible when a
    user logs two events on the same microsecond (the same WINDOW
    ``ORDER BY ts, event_id`` the SQL twin uses)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..functions.segscore import _to_bytes_array
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    gap_us = gap_minutes * 60 * 1_000_000

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    part_schema = ENTRY_EXIT_SCHEMA

    def _matrix(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s = u[order], ts[order]
        new = np.r_[True, (u_s[1:] != u_s[:-1])
                    | (np.diff(ts_s) > gap_us)]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(u_s)] - 1
        et = part["event_type"].combine_chunks()
        entry_idx = order[starts]
        exit_idx = order[ends]
        ea = _to_bytes_array(et)[entry_idx]
        xa = _to_bytes_array(et)[exit_idx]
        o2 = np.lexsort((xa, ea))
        ea_s, xa_s = ea[o2], xa[o2]
        first = np.r_[True, (ea_s[1:] != ea_s[:-1])
                      | (xa_s[1:] != xa_s[:-1])]
        st = np.flatnonzero(first)
        cnt = np.diff(np.r_[st, len(ea_s)])
        pick = pa.array(o2[st], pa.int64())
        return pa.table({
            "entry_type": et.take(pa.array(entry_idx, pa.int64()).take(pick)),
            "exit_type": et.take(pa.array(exit_idx, pa.int64()).take(pick)),
            "n_sessions": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"]).map_batches(
        _tag, batch_format="pyarrow")
    parts = exchange_map_groups(ds, "user_id",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _matrix, part_schema)
    g = grouped_sums(parts, ["entry_type", "exit_type"], ["n_sessions"])
    return g.map_batches(
        lambda t: pa.table({"entry_type": t["entry_type"],
                            "exit_type": t["exit_type"],
                            "n_sessions": t["sum_n_sessions"]}
                           ).cast(ENTRY_EXIT_SCHEMA),
        batch_format="pyarrow")


SESSION_DUR_SCHEMA = pa.schema([
    ("entry_type", pa.string()),
    ("q", pa.float64()),
    ("dur_s", pa.int64()),
])


def session_duration_by_entry_type(sf_dir: str, gap_minutes: int = 30,
                                   qs=(0.25, 0.5, 0.75, 0.9)):
    """How long a session lasts depending on how it STARTED: sessionize
    per user (same break rule and (ts, event_id) tiebreak as
    :func:`session_entry_exit_matrix`), duration = last−first event in
    whole seconds (floor — both engines floor a non-negative integer
    division), then exact discrete quantiles per entry event_type.

    The user exchange emits one (entry_type, dur_s) row per session;
    `grouped_quantiles_disc` reduces the (type × distinct-duration)
    histogram driver-side — bounded by the value domain, not the
    session count."""
    import numpy as np

    import ray.data

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_quantiles_disc
    from ..stages.exchange import exchange_map_groups

    gap_us = gap_minutes * 60 * 1_000_000

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    part_schema = pa.schema([("entry_type", pa.string()),
                             ("dur_s", pa.int64())])

    def _durs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s = u[order], ts[order]
        new = np.r_[True, (u_s[1:] != u_s[:-1])
                    | (np.diff(ts_s) > gap_us)]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(u_s)] - 1
        dur = (ts_s[ends] - ts_s[starts]) // 1_000_000
        et = part["event_type"].combine_chunks()
        return pa.table({
            "entry_type": et.take(pa.array(order[starts], pa.int64())),
            "dur_s": pa.array(dur.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"]).map_batches(
        _tag, batch_format="pyarrow")
    sessions = exchange_map_groups(ds, "user_id",
                                   resolve_num_partitions(DEFAULT_CONFIG),
                                   _durs, part_schema)
    tbl = grouped_quantiles_disc(sessions, "entry_type", "dur_s",
                                 list(qs))
    return ray.data.from_arrow(pa.table({
        "entry_type": tbl["entry_type"],
        "q": tbl["q"],
        "dur_s": tbl["value"],
    }).cast(SESSION_DUR_SCHEMA))


DAYPART_SCHEMA = pa.schema([
    ("daypart", pa.string()),
    ("event_type", pa.string()),
    ("n_events", pa.int64()),
    ("sum_value_micros", pa.int64()),
])

_DAYPARTS = ("night", "morning", "afternoon", "evening")  # hour // 6


def event_daypart_profile(sf_dir: str):
    """Load shape by 6-hour daypart × event_type (count + exact-integer
    value sum) — the coarse daily-rhythm rollup next to
    :func:`events_weekday_hour_heatmap`'s 168-cell fine grid. Daypart =
    ``hour // 6`` mapped onto night/morning/afternoon/evening; value
    micros round per row before summing (the engine's cross-engine
    float contract)."""
    import numpy as np

    from ..stages.agg import grouped_sums

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type", "value"])
    parts = np.array(_DAYPARTS)

    def _bucket(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["ts"].combine_chunks().cast(pa.int64()))
        hour = (ts // 3_600_000_000) % 24
        vals = np.asarray(batch["value"], np.float64)
        return pa.table({
            "daypart": pa.array(parts[hour // 6]),
            "event_type": batch["event_type"],
            "value_micros": pa.array(
                np.round(vals * 1e6).astype(np.int64), pa.int64()),
        })

    agg = grouped_sums(ds.map_batches(_bucket, batch_format="pyarrow"),
                       ["daypart", "event_type"], ["value_micros"],
                       count_as="n_events")
    return agg.map_batches(
        lambda t: pa.table({
            "daypart": t["daypart"],
            "event_type": t["event_type"],
            "n_events": t["n_events"],
            "sum_value_micros": t["sum_value_micros"],
        }).cast(DAYPART_SCHEMA), batch_format="pyarrow")


ERROR_BURST_SCHEMA = pa.schema([
    ("user_id", pa.int64()),
    ("window_start", pa.timestamp("us")),
    ("n_errors", pa.int64()),
])


def error_burst_events(sf_dir: str, window_minutes: int = 5,
                       min_count: int = 2):
    """Error-burst detector: (user, 5-minute tumbling window) cells with
    ≥ ``min_count`` 'error' events — the alerting primitive over the
    same truncate-then-groupby shuffle as :func:`tumbling_window_counts`
    (filter to errors at the scan, so only error rows ever shuffle).
    Output keeps the cells, not the users, so downstream can join back
    to sessions or raise one alert per window."""
    import numpy as np

    from ..stages.agg import grouped_sums

    win_us = window_minutes * 60 * 1_000_000

    def _cells(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["event_type"], "error")
        t = batch.filter(keep)
        ts = np.asarray(t["ts"].combine_chunks().cast(pa.int64()))
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "win_us": pa.array((ts // win_us) * win_us, pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts",
                                     "event_type"]).map_batches(
        _cells, batch_format="pyarrow")
    g = grouped_sums(ds, ["user_id", "win_us"], [], count_as="n_errors")

    def _bursts(t: pa.Table) -> pa.Table:
        out = t.filter(pc.greater_equal(t["n_errors"], min_count))
        return pa.table({
            "user_id": out["user_id"],
            "window_start": pc.cast(out["win_us"], pa.timestamp("us")),
            "n_errors": out["n_errors"],
        }).cast(ERROR_BURST_SCHEMA)

    res = g.map_batches(_bursts, batch_format="pyarrow").materialize()
    if res.count() == 0:
        # a burst-free window set is legitimate — return it TYPED (an
        # all-empty Dataset loses its schema; the known engine quirk)
        return ERROR_BURST_SCHEMA.empty_table()
    return res


TYPE_SHARE_SCHEMA = pa.schema([
    ("wk", pa.int64()),
    ("event_type", pa.string()),
    ("n_events", pa.int64()),
    ("share_e4", pa.int64()),
])


def event_type_share_by_week(sf_dir: str):
    """Weekly mix shift: per epoch-week (``ts_us // 7d``), each event
    type's count and its share of the week in exact 1e4 integer units
    (``n·10000 // week_total`` — floor division, the only share both
    engines compute bit-identically). The corpus folds to
    weeks × types cells in one block-combined grouped_sums; the share
    normalization walks those dim-bounded cells driver-side."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    week_us = 7 * 86_400 * 1_000_000

    def _tag(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())
        return pa.table({
            "wk": pc.divide(ts, pa.scalar(week_us, pa.int64())),
            "event_type": batch["event_type"],
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"]).map_batches(
        _tag, batch_format="pyarrow")
    cells = grouped_sums(ds, ["wk", "event_type"], [],
                         count_as="n_events").take_all()
    totals: dict = {}
    for r in cells:
        totals[r["wk"]] = totals.get(r["wk"], 0) + r["n_events"]
    cells.sort(key=lambda r: (r["wk"], r["event_type"]))
    return ray.data.from_arrow(pa.table({
        "wk": pa.array([r["wk"] for r in cells], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in cells],
                               pa.string()),
        "n_events": pa.array([r["n_events"] for r in cells], pa.int64()),
        "share_e4": pa.array(
            [r["n_events"] * 10000 // totals[r["wk"]] for r in cells],
            pa.int64()),
    }).cast(TYPE_SHARE_SCHEMA))


VALUE_DECILE_SCHEMA = pa.schema([
    ("decile", pa.int64()),
    ("n_users", pa.int64()),
    ("sum_value_cents", pa.int64()),
])


def user_value_deciles(sf_dir: str, n_tiles: int = 10):
    """Spend-decile segmentation: users ranked by exact total value
    cents (descending, user_id tiebreak) and cut into SQL-``ntile``
    buckets — the first ``n_users mod n_tiles`` buckets take the extra
    row, exactly DuckDB's assignment given the deterministic total
    order. The per-user fold is distributed (block combiner + one
    exchange); the ranked cut walks the dim-bounded per-user table
    driver-side, the same contract as customer_rfm_segments."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    def _cents(batch: pa.Table) -> pa.Table:
        v = np.rint(np.asarray(
            pc.fill_null(batch["value"], 0.0), np.float64) * 100)
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "cents": pa.array(v.astype(np.int64), pa.int64()),
        })

    per_user = grouped_sums(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "value"]).map_batches(
            _cents, batch_format="pyarrow"),
        ["user_id"], ["cents"]).take_all()
    if not per_user:
        return ray.data.from_arrow(VALUE_DECILE_SCHEMA.empty_table())
    uid = np.array([r["user_id"] for r in per_user], np.int64)
    cents = np.array([r["sum_cents"] for r in per_user], np.int64)
    order = np.lexsort((uid, -cents))
    n = uid.size
    sizes = np.full(n_tiles, n // n_tiles, np.int64)
    sizes[: n % n_tiles] += 1
    tile_of = np.repeat(np.arange(1, n_tiles + 1, dtype=np.int64), sizes)
    sums = np.zeros(n_tiles + 1, np.int64)
    np.add.at(sums, tile_of, cents[order])
    used = np.flatnonzero(sizes > 0) + 1
    return ray.data.from_arrow(pa.table({
        "decile": pa.array(used, pa.int64()),
        "n_users": pa.array(sizes[used - 1], pa.int64()),
        "sum_value_cents": pa.array(sums[used], pa.int64()),
    }).cast(VALUE_DECILE_SCHEMA))


TTF_PURCHASE_SCHEMA = pa.schema([
    ("q", pa.float64()),
    ("delta_us", pa.int64()),
])


def time_to_first_purchase_quantiles(
        sf_dir: str, qs: tuple = (0.25, 0.5, 0.75, 0.9)):
    """Funnel latency: for users whose first ``purchase`` is at-or-after
    their first ``signup``, exact discrete quantiles (DuckDB
    ``quantile_disc`` rule: element at ``ceil(q·n)−1``) of
    ``first_purchase − first_signup`` in microseconds. Users whose
    first purchase precedes any signup are attribution-ambiguous and
    excluded on both sides. The per-(user, type) first-timestamp fold
    is distributed (block-min combiner + exchange); the pivot + ranked
    cut walks the dim-bounded per-user table driver-side, the same
    contract as user_value_deciles."""
    import math

    import numpy as np

    import ray.data

    from ..stages.agg import grouped_minmax

    def _pick(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["event_type"],
                     value_set=pa.array(["signup", "purchase"]))
        t = batch.filter(m)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "event_type": t["event_type"],
            "ts_us": pc.cast(t["ts"], pa.int64()),
        })

    firsts = grouped_minmax(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type",
                                    "ts"]).map_batches(
            _pick, batch_format="pyarrow"),
        ["user_id", "event_type"], "ts_us").take_all()
    s_by, p_by = {}, {}
    for r in firsts:
        (s_by if r["event_type"] == "signup" else p_by)[
            r["user_id"]] = r["min_ts_us"]
    deltas = np.sort(np.array(
        [p_by[u] - s_by[u] for u in s_by
         if u in p_by and p_by[u] >= s_by[u]], np.int64))
    n = deltas.size
    if n == 0:
        return ray.data.from_arrow(TTF_PURCHASE_SCHEMA.empty_table())
    return ray.data.from_arrow(pa.table({
        "q": pa.array([float(q) for q in qs], pa.float64()),
        "delta_us": pa.array(
            [int(deltas[max(0, math.ceil(q * n) - 1)]) for q in qs],
            pa.int64()),
    }).cast(TTF_PURCHASE_SCHEMA))


DAY_REGULARITY_SCHEMA = pa.schema([
    ("regularity_decile", pa.int64()),
    ("n_users", pa.int64()),
])


def user_day_regularity(sf_dir: str):
    """Habituality histogram: each user's active epoch-DAYS over their
    day span as the exact floor decile ``active·10 // span`` (10 =
    active every day of their lifetime; day, not week — the testdata's
    users are all-weeks-active, so the weekly decile is degenerate).
    One user exchange; per partition the distinct-(user, day) pass is a
    single lexsort and the per-user span/count folds are reduceat."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    day_us = 86_400 * 1_000_000

    def _tag(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["ts"], pa.int64())
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "wk": pc.divide(ts, pa.scalar(day_us, pa.int64())),
        })

    part_schema = DAY_REGULARITY_SCHEMA

    def _reg(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        w = np.asarray(part["wk"], np.int64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        u, w = u[keep], w[keep]
        first = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[first[1:], len(u)]
        active = ends - first
        span = w[ends - 1] - w[first] + 1   # w ascending inside a user
        dec = active * 10 // span
        vals, cnts = np.unique(dec, return_counts=True)
        return pa.table({
            "regularity_decile": pa.array(vals.astype(np.int64),
                                          pa.int64()),
            "n_users": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"]).map_batches(
        _tag, batch_format="pyarrow")
    parts = exchange_map_groups(ds, "user_id",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _reg, part_schema)
    g = grouped_sums(parts, ["regularity_decile"], ["n_users"])
    return g.map_batches(
        lambda t: pa.table({"regularity_decile": t["regularity_decile"],
                            "n_users": t["sum_n_users"]}
                           ).cast(DAY_REGULARITY_SCHEMA),
        batch_format="pyarrow")


P99_OUTLIER_SCHEMA = pa.schema([
    ("event_type", pa.string()),
    ("p99_cents", pa.int64()),
    ("n_above", pa.int64()),
])


def p99_outlier_counts(sf_dir: str, q: float = 0.99):
    """Tail-anomaly census: per event type, the exact discrete P99 of
    value cents (quantile_disc rule) and how many events sit strictly
    above it — the quantile-then-filter composition. Pass one is the
    shared grouped value-histogram quantile (per-block distinct values
    shuffle, not rows); the thresholds are dim-bounded and ride back
    into pass two inside the fold kernel."""
    import numpy as np

    from ..stages.agg import grouped_quantiles_disc, grouped_sums

    def _cents(batch: pa.Table) -> pa.Table:
        v = np.rint(np.asarray(
            pc.fill_null(batch["value"], 0.0), np.float64) * 100)
        return pa.table({
            "event_type": batch["event_type"],
            "cents": pa.array(v.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"]).map_batches(
        _cents, batch_format="pyarrow").materialize()
    qt = grouped_quantiles_disc(ds, "event_type", "cents", [q])
    thr = {t: v for t, _, v in zip(qt["event_type"].to_pylist(),
                                   qt["q"].to_pylist(),
                                   qt["value"].to_pylist())}

    def _above(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        enc = pc.dictionary_encode(et)
        # Python loop over the DICTIONARY (dim-bounded), then one
        # vectorized gather + compare over the rows
        dict_thr = np.array([thr[e] for e in enc.dictionary.to_pylist()],
                            np.int64)
        t = dict_thr[np.asarray(enc.indices, np.int64)]
        c = np.asarray(batch["cents"], np.int64)
        return pa.table({
            "event_type": et,
            "above": pa.array((c > t).astype(np.int64), pa.int64()),
        })

    g = grouped_sums(ds.map_batches(_above, batch_format="pyarrow"),
                     ["event_type"], ["above"])

    def _out(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pylist()
        return pa.table({
            "event_type": t["event_type"],
            "p99_cents": pa.array([thr[e] for e in et], pa.int64()),
            "n_above": t["sum_above"],
        }).cast(P99_OUTLIER_SCHEMA)

    return g.map_batches(_out, batch_format="pyarrow")


SESSION_CONV_SCHEMA = pa.schema([
    ("entry_type", pa.string()),
    ("n_sessions", pa.int64()),
    ("n_with_purchase", pa.int64()),
    ("rate_e4", pa.int64()),
])


def session_purchase_rate(sf_dir: str, gap_minutes: int = 30):
    """Sessionized conversion: per landing event type, how many 30-min
    sessions contain at least one ``purchase`` (exact floor-division
    rate in 1e4 units). Same break rule and (ts, event_id) tiebreak as
    the other session ops; the per-session purchase flag is one
    ``bincount`` over session ids inside the user partition, so each
    session leaves its partition as a single (entry_type, flag) row."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    gap_us = gap_minutes * 60 * 1_000_000

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    part_schema = pa.schema([("entry_type", pa.string()),
                             ("purchased", pa.int64())])

    def _flags(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s = u[order], ts[order]
        new = np.r_[True, (u_s[1:] != u_s[:-1])
                    | (np.diff(ts_s) > gap_us)]
        sid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        et = part["event_type"].combine_chunks()
        is_p = np.asarray(pc.equal(et, "purchase"),
                          np.bool_)[order].astype(np.int64)
        purchased = (np.bincount(sid, weights=is_p,
                                 minlength=starts.size) > 0)
        return pa.table({
            "entry_type": et.take(pa.array(order[starts], pa.int64())),
            "purchased": pa.array(purchased.astype(np.int64),
                                  pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"]).map_batches(
        _tag, batch_format="pyarrow")
    sessions = exchange_map_groups(ds, "user_id",
                                   resolve_num_partitions(DEFAULT_CONFIG),
                                   _flags, part_schema)
    g = grouped_sums(sessions, ["entry_type"], ["purchased"],
                     count_as="n_sessions")

    def _rate(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_sessions"], np.int64)
        p = np.asarray(t["sum_purchased"], np.int64)
        return pa.table({
            "entry_type": t["entry_type"], "n_sessions": t["n_sessions"],
            "n_with_purchase": t["sum_purchased"],
            "rate_e4": pa.array(p * 10000 // n, pa.int64()),
        }).cast(SESSION_CONV_SCHEMA)

    return g.map_batches(_rate, batch_format="pyarrow")


MAGNITUDE_SCHEMA = pa.schema([
    ("event_type", pa.string()),
    ("magnitude", pa.int64()),
    ("n_events", pa.int64()),
])


def value_magnitude_histogram(sf_dir: str):
    """Log-scale load shape: events per (type, decimal magnitude of
    value cents) where magnitude = digit count of the non-negative cent
    amount (0 cents → 1 digit) — the order-of-magnitude histogram that
    survives any value range without a quantile pass. Digit count is
    one vectorized searchsorted against the powers of ten; exact in
    both engines."""
    import numpy as np

    from ..stages.agg import grouped_sums

    pow10 = np.array([10 ** k for k in range(1, 19)], np.int64)

    def _mag(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(
            pc.fill_null(batch["value"], 0.0), np.float64) * 100
        ).astype(np.int64)
        if c.size and c.min() < 0:
            raise ValueError("value_magnitude: negative value")
        mag = np.searchsorted(pow10, c, side="right") + 1
        return pa.table({
            "event_type": batch["event_type"],
            "magnitude": pa.array(mag.astype(np.int64), pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "value"]).map_batches(
            _mag, batch_format="pyarrow"),
        ["event_type", "magnitude"], [], count_as="n_events")
    return g.map_batches(lambda t: t.cast(MAGNITUDE_SCHEMA),
                         batch_format="pyarrow")


USER_EE_SCHEMA = pa.schema([
    ("first_type", pa.string()),
    ("last_type", pa.string()),
    ("n_users", pa.int64()),
])


def user_entry_exit_matrix(sf_dir: str):
    """Lifecycle matrix at USER grain: (first event type, latest event
    type) cell counts — what people arrive doing vs what they were last
    seen doing. Deterministic first/last under the (ts, event_id)
    tiebreak, same discipline as the session entry/exit matrix; one
    user exchange, each user leaves as a single cell row."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    part_schema = pa.schema([("first_type", pa.string()),
                             ("last_type", pa.string())])

    def _bounds(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        order = np.lexsort((eid, ts, u))
        u_s = u[order]
        first = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        last = np.r_[first[1:], len(u_s)] - 1
        et = part["event_type"].combine_chunks()
        return pa.table({
            "first_type": et.take(pa.array(order[first], pa.int64())),
            "last_type": et.take(pa.array(order[last], pa.int64())),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"]).map_batches(
        _tag, batch_format="pyarrow")
    cells = exchange_map_groups(ds, "user_id",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _bounds, part_schema)
    g = grouped_sums(cells, ["first_type", "last_type"], [],
                     count_as="n_users")
    return g.map_batches(lambda t: t.cast(USER_EE_SCHEMA),
                         batch_format="pyarrow")


TYPE_RUN_SCHEMA = pa.schema([
    ("event_type", pa.string()),
    ("run_len", pa.int64()),
    ("n_runs", pa.int64()),
])


def user_type_run_lengths(sf_dir: str):
    """Habit bursts: maximal runs of the SAME event type inside a
    user's (ts, event_id)-ordered stream, histogrammed by (type, run
    length) — the events twin of the transcripts tool-run detector.
    One user exchange; runs are one boundary mask + reduceat per
    partition, and only (type × length) cells leave it."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    part_schema = TYPE_RUN_SCHEMA

    def _runs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        et = part["event_type"].combine_chunks()
        code = np.asarray(pc.dictionary_encode(et).indices, np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, c_s = u[order], code[order]
        new_run = np.r_[True, (u_s[1:] != u_s[:-1])
                        | (c_s[1:] != c_s[:-1])]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.r_[starts, len(u_s)])
        run_type = et.take(pa.array(order[starts], pa.int64()))
        key = pa.table({"event_type": run_type,
                        "run_len": pa.array(lens.astype(np.int64),
                                            pa.int64())})
        g = key.group_by(["event_type", "run_len"],
                         use_threads=False).aggregate(
            [("run_len", "count")])
        return pa.table({
            "event_type": g["event_type"],
            "run_len": g["run_len"],
            "n_runs": pc.cast(g["run_len_count"], pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"]).map_batches(
        _tag, batch_format="pyarrow")
    parts = exchange_map_groups(ds, "user_id",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _runs, part_schema)
    g = grouped_sums(parts, ["event_type", "run_len"], ["n_runs"])
    return g.map_batches(
        lambda t: pa.table({"event_type": t["event_type"],
                            "run_len": t["run_len"],
                            "n_runs": t["sum_n_runs"]}
                           ).cast(TYPE_RUN_SCHEMA),
        batch_format="pyarrow")


DECILE_MIX_SCHEMA = pa.schema([
    ("decile", pa.int64()),
    ("event_type", pa.string()),
    ("n_events", pa.int64()),
    ("share_e4", pa.int64()),
])


def type_mix_by_value_decile(sf_dir: str, n_tiles: int = 10):
    """Behavioral mix per spend decile: users cut into the same
    SQL-ntile buckets as :func:`user_value_deciles`, then each decile's
    event-type counts and exact floor shares — do heavy spenders click
    differently? The decile assignment is the dim-bounded driver cut;
    it broadcasts back as one dense array and the (decile, type) fold
    block-combines."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    def _cents(batch: pa.Table) -> pa.Table:
        v = np.rint(np.asarray(
            pc.fill_null(batch["value"], 0.0), np.float64) * 100)
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "cents": pa.array(v.astype(np.int64), pa.int64()),
        })

    per_user = grouped_sums(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "value"]).map_batches(
            _cents, batch_format="pyarrow"),
        ["user_id"], ["cents"]).take_all()
    if not per_user:
        return ray.data.from_arrow(DECILE_MIX_SCHEMA.empty_table())
    uid = np.array([r["user_id"] for r in per_user], np.int64)
    cents = np.array([r["sum_cents"] for r in per_user], np.int64)
    order = np.lexsort((uid, -cents))
    n = uid.size
    sizes = np.full(n_tiles, n // n_tiles, np.int64)
    sizes[: n % n_tiles] += 1
    tile_of = np.repeat(np.arange(1, n_tiles + 1, dtype=np.int64), sizes)
    # broadcast as (sorted ids, decile) — a dense array indexed by raw
    # user_id would blow up on sparse 64-bit ids; searchsorted is
    # O(log n) per row and id-distribution-agnostic
    uid_sorted = np.sort(uid)
    dec_sorted = tile_of[np.argsort(uid[order], kind="stable")]
    dec_ref = ray.put((uid_sorted, dec_sorted))

    def _tag(batch: pa.Table) -> pa.Table:
        ids, decs = ray.get(dec_ref)
        u = np.asarray(batch["user_id"], np.int64)
        pos = np.minimum(np.searchsorted(ids, u),
                         max(ids.size - 1, 0))
        if pos.size and not (ids.size and (ids[pos] == u).all()):
            raise ValueError("event user missing from the decile cut")
        return pa.table({
            "decile": pa.array(decs[pos], pa.int64()),
            "event_type": batch["event_type"],
        })

    cells = grouped_sums(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "event_type"]).map_batches(
            _tag, batch_format="pyarrow"),
        ["decile", "event_type"], [], count_as="n").take_all()
    totals: dict = {}
    for r in cells:
        totals[r["decile"]] = totals.get(r["decile"], 0) + r["n"]
    cells.sort(key=lambda r: (r["decile"], r["event_type"]))
    return ray.data.from_arrow(pa.table({
        "decile": pa.array([r["decile"] for r in cells], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in cells],
                               pa.string()),
        "n_events": pa.array([r["n"] for r in cells], pa.int64()),
        "share_e4": pa.array(
            [r["n"] * 10000 // totals[r["decile"]] for r in cells],
            pa.int64()),
    }).cast(DECILE_MIX_SCHEMA))


NEW_RETURNING_SCHEMA = pa.schema([
    ("week", pa.int64()),
    ("is_new", pa.bool_()),
    ("n_events", pa.int64()),
])


def new_vs_returning_weekly(sf_dir: str):
    """Acquisition-vs-retention split: per epoch week, events from
    users whose FIRST-ever week is this week (new) vs everyone else
    (returning) — the growth-accounting lifecycle series. The user
    exchange co-locates each user's history, so the per-user first
    week is one lexsort+repeat pass and each partition emits ≤ weeks×2
    partial cells; the event stream never re-shuffles."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    week_us = 7 * 86_400_000_000
    part_schema = pa.schema([("week", pa.int64()),
                             ("is_new", pa.bool_()),
                             ("n", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def _split(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        w = np.asarray(part["ts_us"], np.int64) // week_us
        order = np.lexsort((w, u))
        u_s, w_s = u[order], w[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        counts = np.diff(np.r_[starts, len(u_s)])
        fw = np.repeat(w_s[starts], counts)
        is_new = w_s == fw
        key = w_s * 2 + is_new
        uk, n = np.unique(key, return_counts=True)
        return pa.table({
            "week": pa.array(uk // 2, pa.int64()),
            "is_new": pa.array((uk % 2).astype(bool)),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"]).map_batches(
        _tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "user_id", n_parts, _split,
                                part_schema)
    g = grouped_sums(parts, ["week", "is_new"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"week": t["week"], "is_new": t["is_new"],
                            "n_events": t["sum_n"]}).cast(
            NEW_RETURNING_SCHEMA),
        batch_format="pyarrow")


LAG1_SCHEMA = pa.schema([
    ("n_pairs", pa.int64()), ("sum_ab", pa.int64()),
    ("sum_a", pa.int64()), ("sum_b", pa.int64()),
    ("sum_a2", pa.int64()), ("sum_b2", pa.int64()),
])


def value_lag1_suffstats(sf_dir: str):
    """Lag-1 autocovariance sufficient statistics of the value stream:
    over every consecutive same-user event pair (ts, event_id order),
    the exact-integer (n, Σab, Σa, Σb, Σa², Σb²) of the cent amounts —
    everything the consumer needs to derive the serial correlation of
    spend (is a big event followed by another big event) as one
    driver-side float. Windowed-PRODUCT stats: unlike plain moment
    sums, the ab term needs the user's temporal order, so the pairs
    form on the user exchange (one lexsort+shift per partition) and
    each partition leaves as ONE six-integer row. NULL values enter as
    0 cents (``coalesce``), matching the SQL twin; per-row cents are
    guarded at 2³¹ so products stay below 2⁶²."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([(f.name, f.type) for f in LAG1_SCHEMA])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "cents": pc.cast(pc.round(pc.multiply(
                pc.fill_null(batch["value"], 0.0),
                pa.scalar(100.0))), pa.int64()),
        })

    def _pairs(part: pa.Table) -> pa.Table:
        import numpy as np

        if part.num_rows < 2:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        v = np.asarray(part["cents"], np.int64)
        if np.abs(v).max() >= 2 ** 31:
            raise ValueError("value_lag1: cents overflow the exact-int "
                             "product envelope")
        order = np.lexsort((eid, ts, u))
        u_s, v_s = u[order], v[order]
        same = u_s[1:] == u_s[:-1]
        a, b = v_s[:-1][same], v_s[1:][same]
        if a.size == 0:
            return part_schema.empty_table()
        return pa.table({
            "n_pairs": pa.array([len(a)], pa.int64()),
            "sum_ab": pa.array([int((a * b).sum())], pa.int64()),
            "sum_a": pa.array([int(a.sum())], pa.int64()),
            "sum_b": pa.array([int(b.sum())], pa.int64()),
            "sum_a2": pa.array([int((a * a).sum())], pa.int64()),
            "sum_b2": pa.array([int((b * b).sum())], pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"]).map_batches(
        _tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "user_id", n_parts, _pairs,
                                part_schema)
    rows = parts.take_all()
    import numpy as np

    totals = {f.name: int(sum(r[f.name] for r in rows))
              for f in LAG1_SCHEMA}
    import ray.data

    return ray.data.from_arrow(pa.table(
        {k: pa.array([v], pa.int64()) for k, v in totals.items()}
    ).cast(LAG1_SCHEMA))


FIRST_SESS_SCHEMA = pa.schema([
    ("session_len", pa.int64()),
    ("n_users", pa.int64()),
])


def first_session_length_histogram(sf_dir: str, gap_minutes: int = 30):
    """Onboarding-depth histogram: the event count of every user's
    FIRST session (30-minute gap rule) — how much a user does on first
    touch, the activation-depth twin of the sessions-per-user
    histogram. On the user exchange each user's first session length
    is the distance from their stream start to the first gap break
    (one searchsorted over the break positions); each user leaves as
    one int row and ≤ distinct-lengths cells ride the final exchange.
    Timestamp ties need no tiebreak (equal values diff to 0)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    gap_us = gap_minutes * 60 * 1_000_000
    per_user = pa.schema([("session_len", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
        })

    def _first(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return per_user.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        order = np.lexsort((ts, u))
        u_s, ts_s = u[order], ts[order]
        newu = np.r_[True, u_s[1:] != u_s[:-1]]
        brk = np.r_[True, (u_s[1:] != u_s[:-1])
                    | (np.diff(ts_s) > gap_us)]
        ustarts = np.flatnonzero(newu)
        sess_starts = np.flatnonzero(brk)
        nxt = np.searchsorted(sess_starts, ustarts, side="right")
        end = np.where(nxt < len(sess_starts), sess_starts[nxt],
                       len(u_s))
        return pa.table({
            "session_len": pa.array(end - ustarts, pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"]).map_batches(
        _tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    per = exchange_map_groups(ds, "user_id", n_parts, _first, per_user)
    g = grouped_sums(per, ["session_len"], [], count_as="n_users")
    return g.map_batches(lambda t: t.cast(FIRST_SESS_SCHEMA),
                         batch_format="pyarrow")


PEAK_DOW_SCHEMA = pa.schema([
    ("isodow", pa.int64()),
    ("n_users", pa.int64()),
])


def user_peak_weekday_histogram(sf_dir: str):
    """Personal-rhythm census: each user's PEAK ISO weekday (most
    events; earliest-weekday tiebreak — `row_number() OVER (ORDER BY n
    DESC, isodow)`), histogrammed over users. Mode-per-user then
    histogram: `grouped_sums` folds the stream to ≤ users×7 cells,
    `grouped_topk(k=1)` picks each user's mode, and only 7 histogram
    cells ride the final exchange."""
    import numpy as np

    from ..stages.agg import grouped_sums, grouped_topk

    def _dow(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["ts"].combine_chunks().cast(pa.int64()),
                        np.int64)
        return pa.table({
            "user_id": batch["user_id"],
            "isodow": pa.array((ts // 86_400_000_000 + 3) % 7 + 1,
                               pa.int64()),
        })

    counts = grouped_sums(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"]).map_batches(
            _dow, batch_format="pyarrow"),
        ["user_id", "isodow"], [], count_as="n")
    top = grouped_topk(counts, key="user_id", order_col="n", k=1,
                       tiebreak="isodow")
    g = grouped_sums(top.select_columns(["isodow"]), ["isodow"], [],
                     count_as="n_users")
    return g.map_batches(lambda t: t.cast(PEAK_DOW_SCHEMA),
                         batch_format="pyarrow")


RECORD_EVENTS_SCHEMA = pa.schema([
    ("event_type", pa.string()),
    ("n_records", pa.int64()),
])


def record_values_by_type(sf_dir: str):
    """Record-breaking events: events whose cent value STRICTLY
    exceeds every prior event of the same user (running-max window
    with a strict compare; a user's first event never counts),
    tallied per event type — the 'escalating engagement' signal. The
    segmented running max is the shared composite-key cummax
    (``relational._prior_group_max``); one user exchange, ≤ types
    cells out per partition. NULL values enter as 0 cents."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..functions.segscore import _to_bytes_array
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups
    from .relational import _prior_group_max

    part_schema = pa.schema([("event_type", pa.string()),
                             ("n", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "cents": pc.cast(pc.round(pc.multiply(
                pc.fill_null(batch["value"], 0.0),
                pa.scalar(100.0))), pa.int64()),
            "event_type": batch["event_type"],
        })

    def _records(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        ce = np.asarray(part["cents"], np.int64)
        tcol = part["event_type"].combine_chunks()
        order = np.lexsort((eid, ts, u))
        u_s, ce_s = u[order], ce[order]
        grp = np.cumsum(np.r_[True, u_s[1:] != u_s[:-1]]) - 1
        has, prior = _prior_group_max(grp.astype(np.int64), ce_s)
        rec = has & (ce_s > prior)
        if not rec.any():
            return part_schema.empty_table()
        idx = order[rec]
        tb = _to_bytes_array(tcol)[idx]
        to = np.argsort(tb, kind="stable")
        tb_s = tb[to]
        st = np.flatnonzero(np.r_[True, tb_s[1:] != tb_s[:-1]])
        n = np.diff(np.r_[st, len(tb_s)])
        return pa.table({
            "event_type": tcol.take(pa.array(idx[to[st]], pa.int64())),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value",
                 "event_type"]).map_batches(_tag,
                                            batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "user_id", n_parts, _records,
                                part_schema)
    g = grouped_sums(parts, ["event_type"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"event_type": t["event_type"],
                            "n_records": t["sum_n"]}).cast(
            RECORD_EVENTS_SCHEMA),
        batch_format="pyarrow")


TRANS_GAP_SCHEMA = pa.schema([
    ("prev_type", pa.string()),
    ("next_type", pa.string()),
    ("median_gap_s", pa.int64()),
])

_PAIR_GAP = pa.schema([("pair", pa.string()), ("gap_s", pa.int64())])


def transition_gap_median_matrix(sf_dir: str):
    """Transition-latency matrix: the exact discrete MEDIAN
    whole-second gap for every (prev_type → next_type) consecutive
    same-user transition — which hops in the journey are slow. Pairs
    form on the user exchange (one lexsort+shift, pair key = the two
    type strings joined on an unprintable separator); the shared
    grouped value-histogram median reduces ≤ types² × distinct-gap
    cells, never the pair stream."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_quantiles_disc
    from ..stages.exchange import exchange_map_groups

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    def _pairs(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return _PAIR_GAP.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        tcol = part["event_type"].combine_chunks()
        order = np.lexsort((eid, ts, u))
        u_s, ts_s = u[order], ts[order]
        same = u_s[1:] == u_s[:-1]
        if not same.any():
            return _PAIR_GAP.empty_table()
        gap = ((ts_s[1:] - ts_s[:-1]) // 1_000_000)[same]
        prev = tcol.take(pa.array(order[:-1][same], pa.int64()))
        nxt = tcol.take(pa.array(order[1:][same], pa.int64()))
        pair = pc.binary_join_element_wise(prev, nxt, "\x1f")
        return pa.table({"pair": pair,
                         "gap_s": pa.array(gap, pa.int64())})

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).map_batches(_tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    pairs = exchange_map_groups(ds, "user_id", n_parts, _pairs,
                                _PAIR_GAP)
    tbl = grouped_quantiles_disc(pairs, "pair", "gap_s", [0.5])
    split = [p.split("\x1f") for p in tbl["pair"].to_pylist()]
    return pa.table({
        "prev_type": pa.array([s[0] for s in split], pa.string()),
        "next_type": pa.array([s[1] for s in split], pa.string()),
        "median_gap_s": tbl["value"],
    }).cast(TRANS_GAP_SCHEMA)


PEAK_HOURLY_SCHEMA = pa.schema([
    ("peak_hourly", pa.int64()),
    ("n_users", pa.int64()),
])


def peak_hourly_rate_histogram(sf_dir: str):
    """Burstiness census: each user's PEAK events-in-a-clock-hour,
    histogrammed — the rate-limit / abuse-detection sizing input (a
    user with peak 500/h is a bot regardless of their daily average).
    Two folds that never ship the stream: (user, hour) cells via one
    `grouped_sums`, per-user max + histogram in one partition pass of
    the user-keyed cell exchange."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("peak_hourly", pa.int64()),
                             ("n", pa.int64())])

    def _hour(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "hour": pc.floor_temporal(batch["ts"], unit="hour"),
        })

    cells = grouped_sums(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"]).map_batches(
            _hour, batch_format="pyarrow"),
        ["user_id", "hour"], [], count_as="n_events")

    def _peak(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        n = np.asarray(part["n_events"], np.int64)
        order = np.argsort(u, kind="stable")
        u_s, n_s = u[order], n[order]
        starts = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        peak = np.maximum.reduceat(n_s, starts)
        uk, cn = np.unique(peak, return_counts=True)
        return pa.table({
            "peak_hourly": pa.array(uk.astype(np.int64), pa.int64()),
            "n": pa.array(cn.astype(np.int64), pa.int64()),
        })

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(cells, "user_id", n_parts, _peak,
                                part_schema)
    g = grouped_sums(parts, ["peak_hourly"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"peak_hourly": t["peak_hourly"],
                            "n_users": t["sum_n"]}).cast(
            PEAK_HOURLY_SCHEMA),
        batch_format="pyarrow")


SESS_POS_SCHEMA = pa.schema([
    ("position", pa.int64()),
    ("n_events", pa.int64()),
    ("sum_cents", pa.int64()),
])


def session_position_value_profile(sf_dir: str, gap_minutes: int = 30):
    """Within-session value decay: events bucketed by their position
    inside their session (1st, 2nd, 3rd-or-later under the (ts,
    event_id) order; 30-minute gap rule), with exact cent totals — is
    the first touch of a session where the money is. One user exchange:
    session breaks and per-event positions fall out of a single
    lexsort+cumsum pass, and each partition leaves as ≤ 3 rows. NULL
    values enter as 0 cents (``coalesce``)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    gap_us = gap_minutes * 60 * 1_000_000
    part_schema = pa.schema([("position", pa.int64()),
                             ("n", pa.int64()),
                             ("cents", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "cents": pc.cast(pc.round(pc.multiply(
                pc.fill_null(batch["value"], 0.0),
                pa.scalar(100.0))), pa.int64()),
        })

    def _pos(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        ce = np.asarray(part["cents"], np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s, ce_s = u[order], ts[order], ce[order]
        brk = np.r_[True, (u_s[1:] != u_s[:-1])
                    | (np.diff(ts_s) > gap_us)]
        sess_starts = np.flatnonzero(brk)
        # position within session = index − session start, capped at 3
        idx = np.arange(len(u_s), dtype=np.int64)
        start_of = sess_starts[
            np.searchsorted(sess_starts, idx, side="right") - 1]
        pos = np.minimum(idx - start_of + 1, 3)
        out_p, out_n, out_c = [], [], []
        for p in (1, 2, 3):
            m = pos == p
            if m.any():
                out_p.append(p)
                out_n.append(int(m.sum()))
                out_c.append(int(ce_s[m].sum()))
        return pa.table({
            "position": pa.array(out_p, pa.int64()),
            "n": pa.array(out_n, pa.int64()),
            "cents": pa.array(out_c, pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"]).map_batches(
        _tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "user_id", n_parts, _pos,
                                part_schema)
    g = grouped_sums(parts, ["position"], ["n", "cents"])
    return g.map_batches(
        lambda t: pa.table({"position": t["position"],
                            "n_events": t["sum_n"],
                            "sum_cents": t["sum_cents"]}).cast(
            SESS_POS_SCHEMA),
        batch_format="pyarrow")


ASYMMETRY_SCHEMA = pa.schema([
    ("type_a", pa.string()),
    ("type_b", pa.string()),
    ("n_ab", pa.int64()),
    ("n_ba", pa.int64()),
])


def transition_asymmetry_matrix(sf_dir: str):
    """Journey reciprocity audit: for every UNORDERED type pair
    {a, b} (a < b, self-loops excluded) the two directed transition
    counts side by side — a one-way street (view→buy ≫ buy→view) is
    funnel structure, symmetry is browsing noise. Rides the same
    user-exchange transition partials as the Markov matrix; the
    directed→unordered fold runs on the ≤ types² driver-scale cell
    table."""
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups
    from ..config import DEFAULT_CONFIG, resolve_num_partitions

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch["event_id"],
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_type": batch["event_type"],
        })

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).map_batches(_key, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "user_id", n_parts,
                                transition_merge_partition,
                                TRANSITION_PART_SCHEMA)
    cells = grouped_sums(parts, ["prev_type", "next_type"],
                         ["n"]).take_all()
    cnt = {(r["prev_type"], r["next_type"]): int(r["sum_n"])
           for r in cells}
    pairs = sorted({(min(p, n), max(p, n)) for p, n in cnt if p != n})
    return pa.table({
        "type_a": pa.array([a for a, _ in pairs], pa.string()),
        "type_b": pa.array([b for _, b in pairs], pa.string()),
        "n_ab": pa.array([cnt.get((a, b), 0) for a, b in pairs],
                         pa.int64()),
        "n_ba": pa.array([cnt.get((b, a), 0) for a, b in pairs],
                         pa.int64()),
    }).cast(ASYMMETRY_SCHEMA)


WEEKEND_SHARE_SCHEMA = pa.schema([
    ("event_type", pa.string()),
    ("n_events", pa.int64()),
    ("n_weekend", pa.int64()),
    ("weekend_permille", pa.int64()),
])


def events_weekend_share_by_type(sf_dir: str):
    """Weekend traffic share per event type (exact integer permille):
    the weekday/weekend mix census behind capacity planning and the
    'is this type human- or cron-driven' smell test (a purchase type
    at 2/7 share is organic; one at 0 is a batch job). Map-only
    weekend flag off the int64 epoch-day view (Sunday=0 convention
    matches the SQL twin's ``dayofweek``: 1970-01-01 is Thursday=4);
    ≤ |types| cells shuffle, the permille divides on the cell."""
    import numpy as np

    from ..stages.agg import grouped_sums

    US_PER_DAY = 86_400_000_000

    def _prep(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["ts"], "datetime64[us]").astype(np.int64)
        if ts.size and ts.min() < 0:
            raise ValueError("pre-epoch timestamp: floor-div weekday "
                             "extraction assumes ts >= 1970")
        dow = ((ts // US_PER_DAY) + 4) % 7
        wk = ((dow == 0) | (dow == 6)).astype(np.int64)
        return pa.table({
            "event_type": batch["event_type"],
            "wk": pa.array(wk, pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["event_type", "ts"]).map_batches(
            _prep, batch_format="pyarrow"),
        ["event_type"], ["wk"], count_as="n_events")

    def _share(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_events"], np.int64)
        w = np.asarray(t["sum_wk"], np.int64)
        return pa.table({
            "event_type": t["event_type"],
            "n_events": pa.array(n, pa.int64()),
            "n_weekend": pa.array(w, pa.int64()),
            "weekend_permille": pa.array(1000 * w // n, pa.int64()),
        }).cast(WEEKEND_SHARE_SCHEMA)

    return g.map_batches(_share, batch_format="pyarrow")


SESS_DIVERSITY_SCHEMA = pa.schema([
    ("n_types", pa.int64()),
    ("n_sessions", pa.int64()),
])


def session_type_diversity_histogram(sf_dir: str,
                                     gap_minutes: int = 30):
    """Behavioral breadth per session: how many DISTINCT event types a
    session touches, contracted to a (n_types → n_sessions) census —
    single-type sessions are bots or bounces; broad sessions are real
    exploration. Same user exchange + one lexsort as `sessionize_events`
    (break on user change or gap > threshold), distinct types counted
    via a second in-partition lexsort over (session, type-code) —
    no per-session Python. ≤ |types| cells fold."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    gap_us = gap_minutes * 60_000_000
    part_schema = pa.schema([("n_types", pa.int64()),
                             ("n", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch["user_id"],
            "ts_us": pc.cast(batch["ts"], pa.int64()),
            "event_id": batch["event_id"],
            "event_type": batch["event_type"],
        })

    def _diversity(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["user_id"], np.int64)
        ts = np.asarray(part["ts_us"], np.int64)
        eid = np.asarray(part["event_id"], np.int64)
        enc = part["event_type"].combine_chunks().dictionary_encode()
        code = np.asarray(enc.indices, np.int64)
        order = np.lexsort((eid, ts, u))
        u_s, ts_s, code_s = u[order], ts[order], code[order]
        new_user = np.r_[True, u_s[1:] != u_s[:-1]]
        gap = ts_s - np.r_[np.int64(0), ts_s[:-1]]
        brk = new_user | (gap > gap_us)
        sess = np.cumsum(brk) - 1
        o2 = np.lexsort((code_s, sess))
        ss, cc = sess[o2], code_s[o2]
        uniq = np.r_[True, (ss[1:] != ss[:-1]) | (cc[1:] != cc[:-1])]
        div = np.bincount(ss[uniq])
        vals, n = np.unique(div, return_counts=True)
        return pa.table({
            "n_types": pa.array(vals.astype(np.int64), pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        }).cast(part_schema)

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"]
        ).map_batches(_tag, batch_format="pyarrow")
    parts = exchange_map_groups(ds, "user_id",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _diversity, part_schema)
    g = grouped_sums(parts, ["n_types"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"n_types": t["n_types"],
                            "n_sessions": t["sum_n"]}).cast(
            SESS_DIVERSITY_SCHEMA), batch_format="pyarrow")


WEEKEND_AFFINITY_SCHEMA = pa.schema([
    ("band", pa.string()),
    ("n_users", pa.int64()),
    ("sum_events", pa.int64()),
])


def user_weekend_affinity_census(sf_dir: str):
    """Weekend-affinity segmentation of the user base: each user's
    weekend share of events (exact integer permille, Sunday=0 epoch-day
    weekday convention shared with `events_weekend_share_by_type`)
    banded into weekday_heavy (< 250‰) / balanced / weekend_heavy
    (≥ 750‰), with user and event mass per band — the
    human-vs-cron-vs-leisure composition of the traffic. One user-cell
    fold (≤ |users| rows pre-combined per block), band decided on the
    exact permille; 3 cells leave."""
    import numpy as np

    from ..stages.agg import grouped_sums

    US_PER_DAY = 86_400_000_000
    bands = np.array(["weekday_heavy", "balanced", "weekend_heavy"],
                     dtype=object)

    def _prep(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch["ts"], "datetime64[us]").astype(np.int64)
        if ts.size and ts.min() < 0:
            raise ValueError("pre-epoch timestamp: floor-div weekday "
                             "extraction assumes ts >= 1970")
        dow = ((ts // US_PER_DAY) + 4) % 7
        wk = ((dow == 0) | (dow == 6)).astype(np.int64)
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "wk": pa.array(wk, pa.int64()),
        })

    per_user = grouped_sums(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["user_id", "ts"]).map_batches(
            _prep, batch_format="pyarrow"),
        ["user_id"], ["wk"], count_as="n_events")

    def _band(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_events"], np.int64)
        w = np.asarray(t["sum_wk"], np.int64)
        pm = 1000 * w // n
        b = np.where(pm < 250, 0, np.where(pm < 750, 1, 2))
        return pa.table({
            "band": pa.array(bands[b], pa.string()),
            "n": pa.array(np.ones(len(n), np.int64), pa.int64()),
            "n_events": pa.array(n, pa.int64()),
        })

    g = grouped_sums(per_user.map_batches(_band,
                                          batch_format="pyarrow"),
                     ["band"], ["n", "n_events"])
    return g.map_batches(
        lambda t: pa.table({
            "band": t["band"],
            "n_users": t["sum_n"],
            "sum_events": t["sum_n_events"],
        }).cast(WEEKEND_AFFINITY_SCHEMA), batch_format="pyarrow")

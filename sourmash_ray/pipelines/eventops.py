"""Windowed aggregation over the ``events`` stream table.

The reference's only streaming consumer is ``watch``
(``/root/reference/src/sourmash/commands.py:1389-1483``) — re-search every
10k records, no real windows. A training-data engine needs proper windowed
aggregates, so: tumbling windows = truncate-timestamp-then-groupby, which
Ray Data executes as one hash shuffle; no ordering assumption is needed
because the window key is computed per row (SURVEY.md §2.10: order-insensitive
set semantics)."""

from __future__ import annotations

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


def sessionize_events(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user: sort within user by ts, break on gaps >
    ``gap_minutes`` — a groupby(user).map_groups stage (per-group state,
    the watch-style incremental pattern made explicit). Output: one row per
    session (user_id, session_start, n_events)."""
    import numpy as np

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"])
    gap_us = gap_minutes * 60 * 1_000_000

    def _sessions(group: pa.Table) -> pa.Table:
        ts = np.sort(np.asarray(group["ts"].cast(pa.int64())))
        breaks = np.flatnonzero(np.diff(ts) > gap_us) + 1
        starts = np.concatenate([[0], breaks])
        ends = np.concatenate([breaks, [ts.size]])
        uid = group["user_id"][0].as_py()
        return pa.table({
            "user_id": pa.array([uid] * starts.size, pa.int64()),
            "session_start": pa.array(ts[starts], pa.timestamp("us")),
            "n_events": pa.array((ends - starts).astype("int64"), pa.int64()),
        })

    return ds.groupby("user_id").map_groups(_sessions, batch_format="pyarrow")


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

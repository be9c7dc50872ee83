"""Kernel tests for the round-4 window ops: NTILE split and
inter-event gap extraction, each vs a nested-loop python oracle."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sourmash_ray.pipelines.docops import ntile_partition
from sourmash_ray.pipelines.eventops import gap_rows_partition


def _ntile_oracle(rows, k):
    """SQL NTILE per lang over (n_chars, doc_id) order: first n%k tiles
    get ceil(n/k) rows."""
    out = {}
    by_lang = {}
    for did, lang, nch in rows:
        by_lang.setdefault(lang, []).append((nch, did))
    for lang, group in by_lang.items():
        group.sort()
        n = len(group)
        q, r = divmod(n, k)
        pos = 0
        for tile in range(1, k + 1):
            size = q + 1 if tile <= r else q
            for _ in range(size):
                if pos < n:
                    out[group[pos][1]] = tile
                    pos += 1
    return out


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 10_000),      # n_chars
                          st.sampled_from(["en", "de", "fr", "zh"])),
                min_size=0, max_size=120),
       st.integers(1, 7))
def test_ntile_partition_matches_oracle(items, k):
    rows = [(i, lang, nch) for i, (nch, lang) in enumerate(items)]
    part = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    })
    got = {r["doc_id"]: r["tile"]
           for r in ntile_partition(part, k).to_pylist()}
    assert got == _ntile_oracle(rows, k)


def _gap_oracle(rows):
    """gaps per user in (ts, event_id) order, attributed to the later
    event's type, floored to seconds."""
    by_user = {}
    for eid, uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, eid, et))
    out = []
    for uid, evs in by_user.items():
        evs.sort()
        for prev, cur in zip(evs, evs[1:]):
            out.append((cur[2], (cur[0] - prev[0]) // 1_000_000))
    return sorted(out)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5),                 # user
                          st.integers(0, 10**7),             # ts_us
                          st.sampled_from(["a", "b", "c"])),
                min_size=0, max_size=100))
def test_gap_rows_partition_matches_oracle(items):
    rows = [(i, u, ts, et) for i, (u, ts, et) in enumerate(items)]
    part = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts_us": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })
    got = sorted((r["event_type"], r["gap_s"])
                 for r in gap_rows_partition(part).to_pylist())
    assert got == _gap_oracle(rows)


def test_ntile_empty_and_single():
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "lang": pa.array([], pa.string()),
                      "n_chars": pa.array([], pa.int64())})
    assert ntile_partition(empty, 4).num_rows == 0
    one = pa.table({"doc_id": pa.array([7], pa.int64()),
                    "lang": pa.array(["en"], pa.string()),
                    "n_chars": pa.array([3], pa.int64())})
    assert ntile_partition(one, 4).to_pylist() == [
        {"doc_id": 7, "lang": "en", "tile": 1}]

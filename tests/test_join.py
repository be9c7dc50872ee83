"""Distributed hash join on the exchange — semantics vs an in-memory
pyarrow join oracle."""
from __future__ import annotations

import pyarrow as pa
import ray.data

from sourmash_ray.stages.join import hash_join_exchange


def _sorted(rows):
    return sorted(rows, key=lambda r: tuple(
        (v is None, v) for v in r.values()))


def test_inner_join_with_duplicates(ray_session):
    left = ray.data.from_arrow(pa.table({
        "k": [1, 1, 2, 3, 7], "lv": ["a", "b", "c", "d", "e"]}))
    right = ray.data.from_arrow(pa.table({
        "k": [1, 2, 2, 9], "rv": [10, 20, 21, 90]}))
    out = hash_join_exchange(left, right, "k", ["lv"], ["rv"],
                             n_parts=4).take_all()
    # duplicates cross-product: k=1 → 2×1 rows, k=2 → 1×2 rows
    expect = [
        {"k": 1, "lv": "a", "rv": 10}, {"k": 1, "lv": "b", "rv": 10},
        {"k": 2, "lv": "c", "rv": 20}, {"k": 2, "lv": "c", "rv": 21},
    ]
    assert _sorted(out) == _sorted(expect)


def test_left_outer_join(ray_session):
    left = ray.data.from_arrow(pa.table({"k": [1, 2], "lv": ["a", "b"]}))
    right = ray.data.from_arrow(pa.table({"k": [2], "rv": [20]}))
    out = hash_join_exchange(left, right, "k", ["lv"], ["rv"],
                             n_parts=4, join_type="left outer").take_all()
    assert _sorted(out) == _sorted([
        {"k": 1, "lv": "a", "rv": None},
        {"k": 2, "lv": "b", "rv": 20},
    ])


def test_differing_key_names(ray_session):
    left = ray.data.from_arrow(pa.table({"o_custkey": [5, 6],
                                         "o_orderkey": [100, 101]}))
    right = ray.data.from_arrow(pa.table({"c_custkey": [6],
                                          "c_nationkey": [3]}))
    out = hash_join_exchange(
        left, right, key="custkey", left_cols=["o_orderkey"],
        right_cols=["c_nationkey"], n_parts=2,
        left_key="o_custkey", right_key="c_custkey").take_all()
    assert out == [{"custkey": 6, "o_orderkey": 101, "c_nationkey": 3}]


def test_disjoint_sides_empty_result(ray_session):
    left = ray.data.from_arrow(pa.table({"k": [1, 2], "lv": [1.0, 2.0]}))
    right = ray.data.from_arrow(pa.table({"k": [3, 4], "rv": [3, 4]}))
    out = hash_join_exchange(left, right, "k", ["lv"], ["rv"],
                             n_parts=8).take_all()
    assert out == []


def test_matches_pyarrow_join_oracle(ray_session):
    import numpy as np

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 50, 400)
    rk = rng.integers(0, 50, 300)
    lt = pa.table({"k": pa.array(lk, pa.int64()),
                   "lv": pa.array(np.arange(400), pa.int64())})
    rt = pa.table({"k": pa.array(rk, pa.int64()),
                   "rv": pa.array(np.arange(300), pa.int64())})
    got = hash_join_exchange(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        "k", ["lv"], ["rv"], n_parts=6).take_all()
    want = lt.join(rt, keys="k", join_type="inner").to_pylist()
    assert _sorted(got) == _sorted(want)

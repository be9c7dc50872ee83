"""Unit tests for LSH pair-emission internals: capped-bucket marker and
the Arrow/numpy-native first-occurrence pair dedup (no pandas)."""

import numpy as np
import pyarrow as pa

from sourmash_ray.stages.lsh import (_emit_pairs_part,
                                     _first_distinct_pairs,
                                     _pair_indices_sorted,
                                     PAIRS_CAPPED_SCHEMA)


def _part(keys, ids):
    return pa.table({
        "band_key": pa.array(keys, pa.uint64()),
        "band_part": pa.array([0] * len(keys), pa.int64()),
        "conv_id": pa.array(ids, pa.string()),
    })


def test_capped_flag_marks_degraded_bucket():
    # bucket 1 has 5 members (> skew_limit=3 -> star+chain, capped);
    # bucket 2 has 3 members (full pairs, not capped)
    keys = [1] * 5 + [2] * 3
    ids = [f"c{i}" for i in range(5)] + ["x", "y", "z"]
    emit = _emit_pairs_part(cap=2, full_pairs=True, skew_limit=3,
                            capped_col=True)
    out = emit(_part(keys, ids))
    assert out.schema.equals(PAIRS_CAPPED_SCHEMA)
    capped = np.asarray(out["capped"], bool)
    # star+chain over g=5 emits 2g-3 = 7 capped edges
    assert capped.sum() == 7
    # bucket 2 emits C(3,2)=3 uncapped full pairs
    assert (~capped).sum() == 3
    uncapped_pairs = {(a.as_py(), b.as_py()) for a, b, c in
                      zip(out["a"], out["b"], out["capped"])
                      if not c.as_py()}
    assert uncapped_pairs == {("x", "y"), ("x", "z"), ("y", "z")}
    # capped edges still connect every bucket-1 member (clustering is
    # unaffected by the cap)
    touched = set()
    for a, b, c in zip(out["a"], out["b"], out["capped"]):
        if c.as_py():
            touched |= {a.as_py(), b.as_py()}
    assert touched == {f"c{i}" for i in range(5)}


def test_capped_col_false_keeps_legacy_schema():
    emit = _emit_pairs_part(cap=10, full_pairs=True)
    out = emit(_part([7, 7], ["a", "b"]))
    assert out.column_names == ["a", "b"]


def test_pair_indices_sorted_matches_triu():
    keys = np.array([1, 1, 1, 2, 2, 3], np.uint64)
    a, b, capped = _pair_indices_sorted(keys, cap=10, full_pairs=True,
                                        skew_limit=100)
    got = set(zip(a.tolist(), b.tolist()))
    assert got == {(0, 1), (0, 2), (1, 2), (3, 4)}
    assert not capped.any()


def test_first_distinct_pairs_matches_pandas():
    rng = np.random.default_rng(7)
    n = 500
    a = [f"id{v}" for v in rng.integers(0, 20, n)]
    b = [f"id{v}" for v in rng.integers(0, 20, n)]
    extra = rng.integers(0, 1000, n)
    tbl = pa.table({"a": pa.array(a), "b": pa.array(b),
                    "x": pa.array(extra, pa.int64())})
    got = _first_distinct_pairs(tbl)
    import pandas as pd

    want = pa.Table.from_pandas(
        tbl.to_pandas().drop_duplicates(["a", "b"]), preserve_index=False)
    assert got.equals(want)


def test_first_distinct_pairs_trivial():
    tbl = pa.table({"a": pa.array([], pa.string()),
                    "b": pa.array([], pa.string())})
    assert _first_distinct_pairs(tbl).num_rows == 0
    one = pa.table({"a": pa.array(["p"]), "b": pa.array(["q"])})
    assert _first_distinct_pairs(one).equals(one)


def test_pair_indices_sorted_property_vs_bruteforce():
    """Random sorted key vectors: with full_pairs and no cap pressure,
    emitted pairs == all in-run index pairs; with a small cap, uncapped
    runs still emit exactly triu and capped runs stay connected."""
    rng = np.random.default_rng(11)
    from sourmash_ray.stages.lsh import _pair_indices_sorted

    for trial in range(20):
        keys = np.sort(rng.integers(0, 12, rng.integers(0, 60)
                                    ).astype(np.uint64))
        a, b, capped = _pair_indices_sorted(keys, cap=100,
                                            full_pairs=True,
                                            skew_limit=1000)
        want = {(i, j) for i in range(len(keys))
                for j in range(i + 1, len(keys))
                if keys[i] == keys[j]}
        assert set(zip(a.tolist(), b.tolist())) == want
        assert not capped.any()
        assert (a < b).all()


def test_first_distinct_pairs_property():
    rng = np.random.default_rng(13)
    import pandas as pd

    from sourmash_ray.stages.lsh import _first_distinct_pairs

    for trial in range(10):
        n = int(rng.integers(0, 300))
        tbl = pa.table({
            "a": pa.array([f"x{v}" for v in rng.integers(0, 9, n)]),
            "b": pa.array([str(v) for v in rng.integers(0, 9, n)]),
            "p": pa.array(rng.integers(0, 100, n), pa.int64()),
        })
        got = _first_distinct_pairs(tbl)
        want = pa.Table.from_pandas(
            tbl.to_pandas().drop_duplicates(["a", "b"]),
            preserve_index=False)
        assert got.equals(want), trial

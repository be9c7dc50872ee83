"""SqliteIndex backend parity: reference schema (sourmash_internal /
sourmash_sketches / sourmash_hashes + covering indexes), signed-int64
hash storage for values >= 2^63, num/abundance/mixed-scaled rejection,
SQL overlap counter vs numpy (reference:
/root/reference/src/sourmash/index/sqlite_index.py)."""
from __future__ import annotations

import sqlite3

import numpy as np
import pyarrow as pa
import pytest


def _sig_table(n=6, seed=3, scaled=4):
    rng = np.random.default_rng(seed)
    mins_per = [np.unique(rng.integers(0, 2**64, 60,
                                       dtype=np.uint64))[:40]
                for _ in range(n)]
    return pa.table({
        "conv_id": pa.array([f"c{i:04d}" for i in range(n)], pa.string()),
        "ksize": pa.array([12] * n, pa.int32()),
        "scaled": pa.array([scaled] * n, pa.uint64()),
        "num": pa.array([0] * n, pa.uint32()),
        "seed": pa.array([42] * n, pa.uint64()),
        "mins": pa.array(mins_per, pa.list_(pa.uint64())),
        "abunds": pa.array([np.ones(40, np.uint64)] * n,
                           pa.list_(pa.uint64())),
        "md5": pa.array([f"{i:032x}" for i in range(n)], pa.string()),
    })


def test_roundtrip_and_schema(tmp_path):
    from sourmash_ray.sources.sqlite_index import (
        is_sqlite_index, load_sqlite_table, save_sqlite_index)

    tbl = _sig_table()
    db = str(tmp_path / "idx.sqldb")
    save_sqlite_index(tbl, db)
    assert is_sqlite_index(db)
    assert not is_sqlite_index(str(tmp_path / "missing.sqldb"))

    conn = sqlite3.connect(db)
    internal = dict(conn.execute(
        "SELECT key, value FROM sourmash_internal").fetchall())
    assert internal == {"SqliteIndex": "1.0", "SqliteManifest": "1.0"}
    cols = [r[1] for r in conn.execute(
        "PRAGMA table_info(sourmash_sketches)").fetchall()]
    assert cols == ["id", "name", "num", "scaled", "ksize", "filename",
                    "moltype", "with_abundance", "md5sum", "seed",
                    "n_hashes", "internal_location"]
    # hashes >= 2^63 stored as negative signed ints (convert_hash_to)
    n_neg = conn.execute("SELECT count(*) FROM sourmash_hashes "
                         "WHERE hashval < 0").fetchone()[0]
    big = sum(int((np.asarray(m) >= 2**63).sum())
              for m in tbl["mins"].to_pylist())
    assert n_neg == big > 0
    conn.close()

    back = load_sqlite_table(db)
    assert back["conv_id"].to_pylist() == tbl["conv_id"].to_pylist()
    for a, b in zip(back["mins"].to_pylist(), tbl["mins"].to_pylist()):
        assert a == b
    assert back["md5"].to_pylist() == tbl["md5"].to_pylist()

    # duplicate insert is idempotent on (internal_location, md5sum)
    save_sqlite_index(tbl, db, append=True)
    assert load_sqlite_table(db).num_rows == tbl.num_rows
    with pytest.raises(ValueError):
        save_sqlite_index(tbl, db)   # exists, no append


def test_select_pushdown(tmp_path):
    from sourmash_ray.sources.sqlite_index import (
        load_sqlite_table, save_sqlite_index)

    db = str(tmp_path / "sel.sqldb")
    save_sqlite_index(_sig_table(), db)
    assert load_sqlite_table(db, ksize=12).num_rows == 6
    assert load_sqlite_table(db, ksize=31).num_rows == 0
    assert load_sqlite_table(db, name_pattern="c000%").num_rows == 6
    assert load_sqlite_table(db, name_pattern="c0001").num_rows == 1


def test_restrictions(tmp_path):
    from sourmash_ray.sources.sqlite_index import save_sqlite_index

    num_tbl = _sig_table().set_column(
        3, "num", pa.array([16] * 6, pa.uint32()))
    with pytest.raises(ValueError, match="num"):
        save_sqlite_index(num_tbl, str(tmp_path / "a.sqldb"))

    ab = [np.ones(40, np.uint64) for _ in range(6)]
    ab[2] = np.arange(1, 41, dtype=np.uint64)
    ab_tbl = _sig_table().set_column(
        6, "abunds", pa.array(ab, pa.list_(pa.uint64())))
    with pytest.raises(ValueError, match="abundance"):
        save_sqlite_index(ab_tbl, str(tmp_path / "b.sqldb"))

    db = str(tmp_path / "c.sqldb")
    save_sqlite_index(_sig_table(scaled=4), db)
    with pytest.raises(ValueError, match="one scaled"):
        save_sqlite_index(_sig_table(scaled=8), db, append=True)


def test_overlap_counts_vs_numpy(tmp_path):
    from sourmash_ray.sources.sqlite_index import (
        save_sqlite_index, sqlite_overlap_counts)

    tbl = _sig_table(n=8, seed=11)
    db = str(tmp_path / "ov.sqldb")
    save_sqlite_index(tbl, db)

    rng = np.random.default_rng(5)
    mins0 = np.asarray(tbl["mins"].to_pylist()[0], dtype=np.uint64)
    q = np.concatenate([mins0[:25],
                        rng.integers(0, 2**64, 30, dtype=np.uint64)])
    got = {r["conv_id"]: r["overlap"]
           for r in sqlite_overlap_counts(db, q).to_pylist()}
    for i, m in enumerate(tbl["mins"].to_pylist()):
        exp = len(np.intersect1d(np.unique(q),
                                 np.asarray(m, dtype=np.uint64)))
        assert got.get(f"c{i:04d}", 0) == exp
    assert got["c0000"] >= 25


def test_plugin_registry(ray_session, tmp_path):
    import ray.data

    from sourmash_ray.plugins import load_any, save_any

    tbl = _sig_table()
    db = str(tmp_path / "reg.sqldb")
    save_any(ray.data.from_arrow(tbl), db)
    ds = load_any(db)
    assert sorted(r["conv_id"] for r in ds.take_all()) == \
        tbl["conv_id"].to_pylist()


def test_duplicate_append_inserts_no_orphan_hashes(tmp_path):
    from sourmash_ray.sources.sqlite_index import save_sqlite_index

    tbl = _sig_table()
    db = str(tmp_path / "dup.sqldb")
    save_sqlite_index(tbl, db)
    n0 = sqlite3.connect(db).execute(
        "SELECT count(*) FROM sourmash_hashes").fetchone()[0]
    save_sqlite_index(tbl, db, append=True)   # all rows OR-IGNOREd
    conn = sqlite3.connect(db)
    assert conn.execute(
        "SELECT count(*) FROM sourmash_hashes").fetchone()[0] == n0
    assert conn.execute(
        "SELECT count(*) FROM sourmash_hashes WHERE sketch_id NOT IN "
        "(SELECT id FROM sourmash_sketches)").fetchone()[0] == 0
    conn.close()

"""SQLite signature index — reference-compatible schema (stdlib sqlite3).

Schema ported from ``/root/reference/src/sourmash/index/sqlite_index.py``
(``sourmash_hashes(hashval, sketch_id)`` + three covering indexes,
``sourmash_sketches`` manifest rows, ``sourmash_internal`` type/version
table — ``:255-298,700-727``) and ``sqlite_utils.py`` (version
handshake). Hash sign handling matches ``convert_hash_to/from``
(``sqlite_index.py:102-107``): SQLite integers are signed 64-bit, so
hashes ≥ 2^63 are stored as their two's-complement reinterpretation —
here a zero-copy ``view(int64)`` over the uint64 mins.

Reference restrictions kept (``sqlite_index.py:312-335``): no ``num``
sketches, no abundance sketches, one ``scaled`` per database.

Scale note: a SQLite file is a single-machine artifact (the reference's
portable-index interchange format), so save streams batches driver-side
into one file and load reads it back into a Dataset; inside the engine
the scalable equivalents are the Parquet inverted index + hash exchange
(``stages/index.py``). Use this backend for interop, not for the 100-TB
path.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pyarrow as pa

_CREATE_INTERNAL = """
CREATE TABLE IF NOT EXISTS sourmash_internal (
   key TEXT UNIQUE,
   value TEXT
)
"""

_CREATE_SKETCHES = """
CREATE TABLE IF NOT EXISTS sourmash_sketches
  (id INTEGER PRIMARY KEY,
   name TEXT,
   num INTEGER NOT NULL,
   scaled INTEGER NOT NULL,
   ksize INTEGER NOT NULL,
   filename TEXT,
   moltype TEXT NOT NULL,
   with_abundance BOOLEAN NOT NULL,
   md5sum TEXT NOT NULL,
   seed INTEGER NOT NULL,
   n_hashes INTEGER NOT NULL,
   internal_location TEXT,
UNIQUE(internal_location, md5sum)
)
"""

_CREATE_HASHES = """
CREATE TABLE IF NOT EXISTS sourmash_hashes (
   hashval INTEGER NOT NULL,
   sketch_id INTEGER NOT NULL,
   FOREIGN KEY (sketch_id) REFERENCES sourmash_sketches (id)
)
"""

_HASH_INDEXES = (
    "CREATE INDEX IF NOT EXISTS sourmash_hashval_idx ON sourmash_hashes "
    "(hashval, sketch_id)",
    "CREATE INDEX IF NOT EXISTS sourmash_hashval_idx2 ON sourmash_hashes "
    "(hashval)",
    "CREATE INDEX IF NOT EXISTS sourmash_sketch_idx ON sourmash_hashes "
    "(sketch_id)",
)


def _add_internal(c: sqlite3.Cursor, use_type: str, version: str) -> None:
    """Version handshake (``sqlite_utils.py:49-77``): reject a DB whose
    recorded version for ``use_type`` differs."""
    c.execute(_CREATE_INTERNAL)
    c.execute("SELECT DISTINCT key, value FROM sourmash_internal")
    d = dict(c.fetchall())
    val = d.get(use_type)
    if val is not None:
        if val != version:
            raise ValueError(
                f"sqlite problem: for {use_type}, want version "
                f"{version}, got version {val}")
    else:
        c.execute("INSERT INTO sourmash_internal (key, value) "
                  "VALUES (?, ?)", (use_type, version))


def _to_signed(mins: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(mins, dtype=np.uint64).view(np.int64)


def _from_signed(vals: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(vals, dtype=np.int64).view(np.uint64)


def save_sqlite_index(sigs, dbfile: str, *, append: bool = False) -> str:
    """Stream a signature collection into a SqliteIndex database.

    ``sigs``: Dataset or pa.Table with the canonical sketch columns.
    Batches stream through ``iter_batches`` (no whole-collection
    materialization); the per-row boundary is the sqlite3 API itself.
    """
    import ray.data

    if os.path.exists(dbfile) and not append:
        raise ValueError(f"{dbfile} already exists")

    conn = sqlite3.connect(dbfile)
    try:
        c = conn.cursor()
        _add_internal(c, "SqliteIndex", "1.0")
        _add_internal(c, "SqliteManifest", "1.0")
        c.execute(_CREATE_SKETCHES)
        c.execute(_CREATE_HASHES)
        for stmt in _HASH_INDEXES:
            c.execute(stmt)

        cur = c.execute("SELECT DISTINCT scaled FROM sourmash_sketches")
        seen_scaled = {int(r[0]) for r in cur.fetchall()}

        if isinstance(sigs, pa.Table):
            batches = [sigs]
        else:
            batches = sigs.iter_batches(batch_size=4096,
                                        batch_format="pyarrow")

        for batch in batches:
            nums = np.asarray(batch["num"], dtype=np.int64)
            if (nums > 0).any():
                raise ValueError(
                    "cannot store 'num' signatures in SqliteIndex")
            scaleds = np.asarray(batch["scaled"], dtype=np.int64)
            seen_scaled.update(int(s) for s in np.unique(scaleds))
            if len(seen_scaled) > 1:
                raise ValueError(
                    "this database can only store one scaled value")
            if "abunds" in batch.column_names:
                ab = batch["abunds"].combine_chunks()
                ab_flat = ab.values.to_numpy(zero_copy_only=False)
                offs = ab.offsets.to_numpy()
                if (ab_flat[offs[0]:offs[-1]] != 1).any():
                    raise ValueError("cannot store signatures with "
                                     "abundance in SqliteIndex")

            mins = batch["mins"].combine_chunks()
            offs = mins.offsets.to_numpy()
            flat = _to_signed(mins.values.to_numpy(
                zero_copy_only=False)[offs[0]:offs[-1]])
            lens = np.diff(offs)
            for i in range(batch.num_rows):
                c.execute(
                    "INSERT OR IGNORE INTO sourmash_sketches "
                    "(name, num, scaled, ksize, filename, md5sum, moltype,"
                    " seed, n_hashes, with_abundance, internal_location) "
                    "VALUES (?, 0, ?, ?, '-', ?, 'text/shingle', ?, ?, 0,"
                    " ?)",
                    (batch["conv_id"][i].as_py(), int(scaleds[i]),
                     batch["ksize"][i].as_py(), batch["md5"][i].as_py(),
                     batch["seed"][i].as_py(), int(lens[i]), dbfile))
                if c.rowcount == 0:
                    # OR IGNORE hit the (internal_location, md5sum)
                    # unique constraint: last_insert_rowid() would be
                    # stale — inserting hashes under it orphans them
                    continue
                sketch_id = c.execute(
                    "SELECT last_insert_rowid()").fetchone()[0]
                lo = int(offs[i] - offs[0])
                row_mins = flat[lo:lo + int(lens[i])]
                c.executemany(
                    "INSERT INTO sourmash_hashes (hashval, sketch_id) "
                    "VALUES (?, ?)",
                    ((int(h), sketch_id) for h in row_mins))
        conn.commit()
    finally:
        conn.close()
    return dbfile


def is_sqlite_index(path: str) -> bool:
    """Sniff: SQLite magic + a ``sourmash_internal`` SqliteIndex row
    (``sqlite_utils.py:10-46`` behavior, without creating the file)."""
    if not os.path.exists(path) or os.path.getsize(path) < 16:
        return False
    with open(path, "rb") as f:
        if f.read(16) != b"SQLite format 3\x00":
            return False
    try:
        conn = sqlite3.connect(path)
        try:
            cur = conn.execute(
                "SELECT value FROM sourmash_internal WHERE key = ?",
                ("SqliteIndex",))
            return cur.fetchone() is not None
        finally:
            conn.close()
    except (sqlite3.OperationalError, sqlite3.DatabaseError):
        return False


def load_sqlite_table(dbfile: str, *, ksize: int | None = None,
                      name_pattern: str | None = None) -> pa.Table:
    """Read a SqliteIndex back into the canonical sketch table.

    ``ksize`` / ``name_pattern`` push selection into SQL on the manifest
    (``SqliteIndex.select`` / ``_make_select`` analogue) so non-matching
    sketches' hashes never leave the database."""
    conn = sqlite3.connect(dbfile)
    try:
        where, params = [], []
        if ksize is not None:
            where.append("ksize = ?")
            params.append(int(ksize))
        if name_pattern is not None:
            where.append("name LIKE ?")
            params.append(name_pattern)
        wsql = (" WHERE " + " AND ".join(where)) if where else ""
        man = conn.execute(
            f"SELECT id, name, ksize, scaled, seed, md5sum "
            f"FROM sourmash_sketches{wsql} ORDER BY id",
            params).fetchall()
        if not man:
            return _empty_sketch_table()
        ids = [r[0] for r in man]
        qmarks = ",".join("?" * len(ids))
        rows = conn.execute(
            f"SELECT sketch_id, hashval FROM sourmash_hashes "
            f"WHERE sketch_id IN ({qmarks}) ORDER BY sketch_id, hashval",
            ids).fetchall()
    finally:
        conn.close()

    sk = np.array([r[0] for r in rows], dtype=np.int64)
    hv = _from_signed(np.array([r[1] for r in rows], dtype=np.int64))
    bounds = np.searchsorted(sk, np.array(ids, dtype=np.int64))
    bounds = np.append(bounds, len(sk))
    mins_per = [np.sort(hv[bounds[j]:bounds[j + 1]])
                for j in range(len(ids))]
    return pa.table({
        "conv_id": pa.array([r[1] for r in man], pa.string()),
        "ksize": pa.array([r[2] for r in man], pa.int32()),
        "scaled": pa.array([r[3] for r in man], pa.uint64()),
        "num": pa.array([0] * len(man), pa.uint32()),
        "seed": pa.array([r[4] for r in man], pa.uint64()),
        "mins": pa.array(mins_per, pa.list_(pa.uint64())),
        "abunds": pa.array([np.ones(len(m), np.uint64) for m in mins_per],
                           pa.list_(pa.uint64())),
        "md5": pa.array([r[5] for r in man], pa.string()),
    })


def _empty_sketch_table() -> pa.Table:
    return pa.table({
        "conv_id": pa.array([], pa.string()),
        "ksize": pa.array([], pa.int32()),
        "scaled": pa.array([], pa.uint64()),
        "num": pa.array([], pa.uint32()),
        "seed": pa.array([], pa.uint64()),
        "mins": pa.array([], pa.list_(pa.uint64())),
        "abunds": pa.array([], pa.list_(pa.uint64())),
        "md5": pa.array([], pa.string()),
    })


def sqlite_overlap_counts(dbfile: str, query_mins: np.ndarray,
                          max_hash: int = 0) -> pa.Table:
    """Per-sketch overlap counter straight in SQL — the reference's
    ``_get_matching_sketches`` (``sqlite_index.py:576-623``:
    ``SELECT sketch_id, COUNT(hashval) ... WHERE hashval IN (...)
    GROUP BY sketch_id``). Returns ``(conv_id, md5, overlap)`` descending."""
    q = _to_signed(np.unique(np.asarray(query_mins, dtype=np.uint64)))
    conn = sqlite3.connect(dbfile)
    try:
        conn.execute("CREATE TEMP TABLE _query_hashes (hashval INTEGER)")
        conn.executemany("INSERT INTO _query_hashes VALUES (?)",
                         ((int(h),) for h in q))
        cond = ""
        params: list = []
        if max_hash:
            cond = " AND h.hashval >= 0 AND h.hashval <= ?"
            params.append(int(max_hash))
        rows = conn.execute(
            "SELECT s.name, s.md5sum, COUNT(h.hashval) AS overlap "
            "FROM sourmash_hashes h "
            "JOIN _query_hashes q ON h.hashval = q.hashval "
            "JOIN sourmash_sketches s ON s.id = h.sketch_id"
            + cond +
            " GROUP BY h.sketch_id ORDER BY overlap DESC, s.name",
            params).fetchall()
    finally:
        conn.close()
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "md5": pa.array([r[1] for r in rows], pa.string()),
        "overlap": pa.array([r[2] for r in rows], pa.int64()),
    })

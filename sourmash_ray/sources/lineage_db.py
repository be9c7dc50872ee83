"""Taxonomy lineage databases — CSV and SQLite backends.

Reference: ``/root/reference/src/sourmash/tax/tax_utils.py`` —
``LineageDB`` (CSV with ``ident`` + rank columns, ``:1210-1450``),
``LineageDB_Sqlite`` (``sourmash_taxonomy`` table, reserved-word
``order_`` column, ``SqliteLineage 1.0`` internal row, ``:1455-1590``;
legacy pre-internal databases use a bare ``taxonomy`` table) and
``MultiLineageDB`` (most-recently-added database wins on duplicate
idents, ``:1591-1650``).

The engine consumes lineages as a plain ``ident -> ';'-joined string``
dict broadcast into ``tax_metagenome`` / the rollup joins (a lineage DB
is a small dimension table — ``ray.put`` once, look up per batch; never
a shuffle join)."""

from __future__ import annotations

import csv
import gzip
import sqlite3

TAX_COLUMNS = ("superkingdom", "phylum", "class", "order_", "family",
               "genus", "species", "strain")
# CSV headers spell 'order' without the SQL-reserved-word underscore
_CSV_RANKS = tuple(c.rstrip("_") for c in TAX_COLUMNS)


def write_lineage_sqlite(lineages: dict[str, str], dbfile: str) -> str:
    """``tax_utils.py:1695-1750`` writer: ``sourmash_taxonomy`` table with
    the eight fixed rank columns, unique ident index, ``SqliteLineage
    1.0`` handshake. Lineage strings shorter than eight ranks pad with
    ''."""
    from .sqlite_index import _add_internal

    conn = sqlite3.connect(dbfile)
    try:
        c = conn.cursor()
        _add_internal(c, "SqliteLineage", "1.0")
        c.execute(
            "CREATE TABLE IF NOT EXISTS sourmash_taxonomy (ident TEXT "
            "NOT NULL, " + ", ".join(f'"{col}" TEXT' for col in
                                     TAX_COLUMNS) + ")")
        c.execute("CREATE UNIQUE INDEX IF NOT EXISTS "
                  "sourmash_taxonomy_ident ON sourmash_taxonomy(ident)")
        for ident, lin in lineages.items():
            parts = (lin.split(";") if lin else [])[:8]
            parts += [""] * (8 - len(parts))
            c.execute(
                "INSERT OR REPLACE INTO sourmash_taxonomy (ident, "
                + ", ".join(f'"{col}"' for col in TAX_COLUMNS)
                + ") VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
                (ident, *parts))
        conn.commit()
    finally:
        conn.close()
    return dbfile


def load_lineage_sqlite(dbfile: str) -> dict[str, str]:
    """``LineageDB_Sqlite.load`` analogue: require ``SqliteLineage 1.0``
    when the internal table exists; fall back to a legacy bare
    ``taxonomy`` table otherwise (``sqlite_utils.py:38-44``)."""
    conn = sqlite3.connect(dbfile)
    try:
        table = "sourmash_taxonomy"
        try:
            info = dict(conn.execute(
                "SELECT DISTINCT key, value FROM sourmash_internal"))
            ver = info.get("SqliteLineage")
            if ver is not None and ver != "1.0":
                raise ValueError(f"unknown SqliteLineage version '{ver}'")
        except sqlite3.OperationalError:
            table = "taxonomy"          # legacy pre-internal database
        cols = ", ".join(f'"{c}"' for c in TAX_COLUMNS)
        try:
            rows = conn.execute(
                f"SELECT DISTINCT ident, {cols} FROM {table}").fetchall()
        except (sqlite3.OperationalError, sqlite3.DatabaseError):
            raise ValueError("not a taxonomy database")
    finally:
        conn.close()
    out = {}
    for ident, *names in rows:
        ranks = [n for n in names if n]
        out[ident] = ";".join(ranks)
    return out


def load_lineage_csv(path: str, *, keep_identifier_versions: bool = True
                     ) -> dict[str, str]:
    """``LineageDB.load`` analogue: header must contain ``ident`` (or
    ``accession``) plus rank columns; empty trailing ranks drop. Rows
    keep input order; a duplicate ident raises like the reference."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", newline="") as f:
        r = csv.DictReader(f)
        fields = r.fieldnames or []
        key = ("ident" if "ident" in fields
               else "accession" if "accession" in fields else None)
        if key is None:
            raise ValueError(
                "no 'ident' or 'accession' column in lineage CSV")
        ranks = [c for c in fields if c in _CSV_RANKS]
        if not ranks:
            raise ValueError("no rank columns in lineage CSV")
        out: dict[str, str] = {}
        for row in r:
            ident = row[key]
            if not keep_identifier_versions:
                ident = ident.split(".")[0]
            if ident in out:
                raise ValueError(
                    f"multiple lineages for identifier {ident}")
            names = [row.get(c, "") or "" for c in ranks]
            while names and not names[-1]:
                names.pop()
            out[ident] = ";".join(names)
    return out


def merge_lineage_dbs(*dbs: dict[str, str]) -> dict[str, str]:
    """``MultiLineageDB`` masking: the FIRST argument wins on duplicate
    idents (callers pass most-recently-added first, matching
    ``.add``'s ``insert(0)``)."""
    out: dict[str, str] = {}
    for db in dbs:
        for k, v in db.items():
            out.setdefault(k, v)
    return out

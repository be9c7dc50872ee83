"""Lineage DB loaders — CSV / SQLite / multi-DB masking.

Mirrors the reference's ``tests/test_tax_utils.py`` LineageDB coverage:
CSV header detection (ident vs accession), version stripping, duplicate
rejection, SQLite ``SqliteLineage 1.0`` handshake plus the legacy bare
``taxonomy`` table, and MultiLineageDB first-wins masking.
"""

import gzip
import sqlite3

import pytest

from sourmash_ray.sources.lineage_db import (
    TAX_COLUMNS,
    load_lineage_csv,
    load_lineage_sqlite,
    merge_lineage_dbs,
    write_lineage_sqlite,
)

CSV_TEXT = (
    "ident,superkingdom,phylum,class,order,family,genus,species\n"
    "GCF_001.1,d__Bacteria,p__Proteo,c__Gamma,o__Entero,f__Entero,"
    "g__Esch,s__coli\n"
    "GCF_002.2,d__Bacteria,p__Firmi,,,,,\n"
)


def test_csv_basic(tmp_path):
    p = tmp_path / "tax.csv"
    p.write_text(CSV_TEXT)
    db = load_lineage_csv(str(p))
    assert db["GCF_001.1"].startswith("d__Bacteria;p__Proteo;c__Gamma")
    assert db["GCF_001.1"].endswith("s__coli")
    # trailing empty ranks drop
    assert db["GCF_002.2"] == "d__Bacteria;p__Firmi"


def test_csv_gzip_and_version_strip(tmp_path):
    p = tmp_path / "tax.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write(CSV_TEXT)
    db = load_lineage_csv(str(p), keep_identifier_versions=False)
    assert set(db) == {"GCF_001", "GCF_002"}


def test_csv_accession_column(tmp_path):
    p = tmp_path / "tax.csv"
    p.write_text("accession,superkingdom,phylum\nA1,d__X,p__Y\n")
    assert load_lineage_csv(str(p)) == {"A1": "d__X;p__Y"}


def test_csv_duplicate_ident_raises(tmp_path):
    p = tmp_path / "tax.csv"
    p.write_text("ident,superkingdom\nA,d__X\nA,d__Y\n")
    with pytest.raises(ValueError, match="multiple lineages"):
        load_lineage_csv(str(p))


def test_csv_missing_ident_raises(tmp_path):
    p = tmp_path / "tax.csv"
    p.write_text("name,superkingdom\nA,d__X\n")
    with pytest.raises(ValueError, match="ident"):
        load_lineage_csv(str(p))


def test_csv_no_rank_columns_raises(tmp_path):
    p = tmp_path / "tax.csv"
    p.write_text("ident,foo\nA,x\n")
    with pytest.raises(ValueError, match="rank columns"):
        load_lineage_csv(str(p))


def test_sqlite_round_trip(tmp_path):
    lineages = {"A": "d__X;p__Y;c__Z", "B": "d__X", "C": ""}
    dbfile = str(tmp_path / "tax.sqldb")
    write_lineage_sqlite(lineages, dbfile)
    back = load_lineage_sqlite(dbfile)
    assert back == {"A": "d__X;p__Y;c__Z", "B": "d__X", "C": ""}


def test_sqlite_replace_on_duplicate(tmp_path):
    dbfile = str(tmp_path / "tax.sqldb")
    write_lineage_sqlite({"A": "d__X"}, dbfile)
    write_lineage_sqlite({"A": "d__Y;p__Z"}, dbfile)
    assert load_lineage_sqlite(dbfile) == {"A": "d__Y;p__Z"}


def test_sqlite_legacy_bare_taxonomy_table(tmp_path):
    dbfile = str(tmp_path / "legacy.sqldb")
    conn = sqlite3.connect(dbfile)
    cols = ", ".join(f'"{c}" TEXT' for c in TAX_COLUMNS)
    conn.execute(f"CREATE TABLE taxonomy (ident TEXT, {cols})")
    conn.execute(
        "INSERT INTO taxonomy VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
        ("L1", "d__X", "p__Y", "", "", "", "", "", ""))
    conn.commit()
    conn.close()
    assert load_lineage_sqlite(dbfile) == {"L1": "d__X;p__Y"}


def test_sqlite_bad_version_raises(tmp_path):
    dbfile = str(tmp_path / "tax.sqldb")
    write_lineage_sqlite({"A": "d__X"}, dbfile)
    conn = sqlite3.connect(dbfile)
    conn.execute("UPDATE sourmash_internal SET value='9.9' "
                 "WHERE key='SqliteLineage'")
    conn.commit()
    conn.close()
    with pytest.raises(ValueError, match="SqliteLineage"):
        load_lineage_sqlite(dbfile)


def test_sqlite_not_a_tax_db_raises(tmp_path):
    dbfile = str(tmp_path / "other.sqldb")
    conn = sqlite3.connect(dbfile)
    conn.execute("CREATE TABLE unrelated (x INT)")
    conn.commit()
    conn.close()
    with pytest.raises(ValueError, match="not a taxonomy"):
        load_lineage_sqlite(dbfile)


def test_merge_first_wins():
    newest = {"A": "d__NEW", "B": "d__B"}
    older = {"A": "d__OLD", "C": "d__C"}
    merged = merge_lineage_dbs(newest, older)
    assert merged == {"A": "d__NEW", "B": "d__B", "C": "d__C"}


def test_csv_sqlite_parity(tmp_path):
    """CSV load → sqlite write → sqlite load is the identity (the
    reference's ``tax prepare`` CSV→sql conversion)."""
    p = tmp_path / "tax.csv"
    p.write_text(CSV_TEXT)
    db = load_lineage_csv(str(p))
    dbfile = str(tmp_path / "tax.sqldb")
    write_lineage_sqlite(db, dbfile)
    assert load_lineage_sqlite(dbfile) == db


def test_feeds_tax_metagenome(tmp_path):
    """A loaded lineage DB plugs straight into tax_metagenome's
    lineage_of dict argument."""
    import pyarrow as pa

    from sourmash_ray.stages.tax import tax_metagenome

    p = tmp_path / "tax.csv"
    p.write_text(CSV_TEXT)
    lineage_of = load_lineage_csv(str(p))
    gather_tbl = pa.table({
        "match": ["GCF_001.1", "GCF_002.2"],
        "f_unique_to_query": [0.4, 0.2],
        "f_unique_weighted": [0.4, 0.2],
        "unique_intersect_bp": [400, 200],
    })
    out = tax_metagenome(gather_tbl, lineage_of)
    rows = out.to_pylist()
    sk = [r for r in rows if r["rank"] == 0        # rank 0 = superkingdom
          and r["lineage"] == "d__Bacteria"]
    assert len(sk) == 1
    assert sk[0]["fraction"] == pytest.approx(0.6)

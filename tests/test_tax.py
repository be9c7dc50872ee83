"""tax metagenome summarization (tax_utils.py:2328-2420 semantics)."""
import pyarrow as pa
import pytest

from sourmash_ray.stages.tax import tax_metagenome


def _gather(rows):
    return pa.table({
        "match": pa.array([r[0] for r in rows], pa.string()),
        "f_unique_to_query": pa.array([r[1] for r in rows], pa.float64()),
        "f_unique_weighted": pa.array([r[2] for r in rows], pa.float64()),
        "unique_intersect_bp": pa.array([r[3] for r in rows], pa.int64()),
    })


LINEAGES = {"gA": "d__Bact;p__Firm", "gB": "d__Bact;p__Prot",
            "gC": "d__Arch;p__Eury"}


def test_rank_rollup_and_unclassified():
    g = _gather([("gA", 0.4, 0.5, 400), ("gB", 0.2, 0.2, 200),
                 ("gC", 0.1, 0.05, 100)])
    out = tax_metagenome(g, LINEAGES).to_pylist()
    r0 = {r["lineage"]: r for r in out if r["rank"] == 0}
    assert r0["d__Bact"]["fraction"] == pytest.approx(0.6)
    assert r0["d__Bact"]["f_weighted_at_rank"] == pytest.approx(0.7)
    assert r0["d__Bact"]["bp_match_at_rank"] == 600
    assert r0["d__Arch"]["fraction"] == pytest.approx(0.1)
    # uncovered remainder -> unclassified
    assert r0["unclassified"]["fraction"] == pytest.approx(0.3)
    r1 = {r["lineage"]: r for r in out if r["rank"] == 1}
    assert r1["d__Bact;p__Firm"]["fraction"] == pytest.approx(0.4)
    # sorted desc by fraction within rank (unclassified last)
    fr0 = [r["fraction"] for r in out
           if r["rank"] == 0 and r["lineage"] != "unclassified"]
    assert fr0 == sorted(fr0, reverse=True)


def test_unannotated_match_counts_unclassified():
    g = _gather([("gA", 0.4, 0.4, 400), ("unknown", 0.3, 0.3, 300)])
    out = tax_metagenome(g, LINEAGES).to_pylist()
    r0 = {r["lineage"]: r for r in out if r["rank"] == 0}
    # 0.3 from the unannotated match + 0.3 uncovered remainder
    assert r0["unclassified"]["fraction"] == pytest.approx(0.6)


def test_overlapping_fractions_raise():
    g = _gather([("gA", 0.8, 0.8, 1), ("gB", 0.5, 0.5, 1)])
    with pytest.raises(ValueError, match="fraction > 1"):
        tax_metagenome(g, LINEAGES)


def test_gather_csv_round_trip_feeds_tax(tmp_path):
    import pyarrow as pa

    from sourmash_ray.stages.tax import (load_gather_csv, tax_metagenome,
                                         write_gather_csv)

    tbl = pa.table({
        "match": ["g1", "g2"],
        "f_unique_to_query": [0.5, 0.25],
        "f_unique_weighted": [0.6, 0.2],
        "unique_intersect_bp": [500, 250],
    })
    p = str(tmp_path / "gather.csv")
    write_gather_csv(tbl, p)
    back = load_gather_csv(p)
    lin = {"g1": "pA;gB", "g2": "pA;gC"}
    assert tax_metagenome(back, lin).to_pylist() == \
        tax_metagenome(tbl, lin).to_pylist()


def test_load_gather_csv_rejects_non_gather(tmp_path):
    import pytest

    from sourmash_ray.stages.tax import load_gather_csv

    p = tmp_path / "other.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="missing columns"):
        load_gather_csv(str(p))


def test_write_bioboxes_format(tmp_path):
    import pyarrow as pa

    from sourmash_ray.stages.tax import tax_metagenome, write_bioboxes

    tbl = pa.table({
        "match": ["g1", "g2"],
        "f_unique_to_query": [0.5, 0.25],
        "f_unique_weighted": [0.6, 0.2],
        "unique_intersect_bp": [500, 250],
    })
    lin = {"g1": "pA;gB", "g2": "pA;gC"}
    out = tax_metagenome(tbl, lin)
    p = str(tmp_path / "profile.bioboxes")
    write_bioboxes(out, p, sample_id="s1")
    lines = open(p).read().splitlines()
    assert lines[0] == "# Taxonomic Profiling Output"
    assert "@SampleID:s1" in lines
    assert lines[5].startswith("@@TAXID\tRANK\tTAXPATH")
    data = [ln.split("\t") for ln in lines[6:]]
    # rank 0 row: both matches roll into pA at 80.00%
    assert ["pA", "superkingdom", "pA", "pA", "80.00"] in data
    # rank 1 rows keep the full name path; unclassified skipped
    assert ["gB", "phylum", "pA|gB", "pA|gB", "60.00"] in data
    assert not any(r[0] == "unclassified" for r in data)


# --------------------------------------------------------------------------
# tax genome classification + tax annotate
# --------------------------------------------------------------------------

def _gather(rows):
    import pyarrow as pa
    return pa.table({
        "match": pa.array([r[0] for r in rows], pa.string()),
        "f_unique_to_query": pa.array([r[1] for r in rows], pa.float64()),
        "f_unique_weighted": pa.array([r[2] for r in rows], pa.float64()),
        "unique_intersect_bp": pa.array([r[3] for r in rows], pa.int64()),
    })


def test_tax_genome_climbs_to_matching_rank():
    from sourmash_ray.stages.tax import tax_genome

    lin = {"g1": "d__A;p__X;s__1", "g2": "d__A;p__X;s__2",
           "g3": "d__A;p__Y;s__3"}
    tbl = _gather([("g1", 0.06, 0.05, 600), ("g2", 0.06, 0.05, 600),
                   ("g3", 0.03, 0.02, 300)])
    # species rank: best 0.06 < 0.1 → climb; phylum: p__X sums 0.12 ≥ 0.1
    row = tax_genome(tbl, lin,
                     containment_threshold=0.1).to_pylist()[0]
    assert row["status"] == "match"
    assert row["rank"] == 1 and row["lineage"] == "d__A;p__X"
    assert abs(row["fraction"] - 0.12) < 1e-12
    assert row["bp_match_at_rank"] == 1200


def test_tax_genome_single_rank_below_threshold():
    from sourmash_ray.stages.tax import tax_genome

    lin = {"g1": "d__A;p__X;s__1"}
    tbl = _gather([("g1", 0.05, 0.04, 500)])
    row = tax_genome(tbl, lin, rank=2,
                     containment_threshold=0.1).to_pylist()[0]
    assert row["status"] == "below_threshold"
    assert row["rank"] == 2 and row["lineage"] == "d__A;p__X;s__1"


def test_tax_genome_nomatch_and_empty():
    from sourmash_ray.stages.tax import tax_genome

    row = tax_genome(_gather([]), {}).to_pylist()[0]
    assert row["status"] == "nomatch"
    # gather rows exist but none annotated → nomatch too
    row = tax_genome(_gather([("gX", 0.5, 0.5, 100)]), {}).to_pylist()[0]
    assert row["status"] == "nomatch"


def test_tax_genome_ani_threshold_overrides_containment():
    from sourmash_ray.stages.tax import tax_genome

    lin = {"g1": "d__A"}
    tbl = _gather([("g1", 0.05, 0.04, 500)])
    # containment 0.05 → ANI = 1 - (1 - 0.05^(1/31)) ≈ 0.908 ≥ 0.9 →
    # match even though containment_threshold would say below
    row = tax_genome(tbl, lin, containment_threshold=0.5,
                     ani_threshold=0.9,
                     query_n_hashes=10000).to_pylist()[0]
    assert row["status"] == "match"
    assert row["query_ani_at_rank"] > 0.9


def test_tax_annotate_attaches_lineage():
    from sourmash_ray.stages.tax import tax_annotate

    tbl = _gather([("g1", 0.5, 0.4, 100), ("gX", 0.1, 0.1, 10)])
    out = tax_annotate(tbl, {"g1": "d__A;p__X"})
    assert out.column_names[-1] == "lineage"
    assert out["lineage"].to_pylist() == ["d__A;p__X", ""]
    assert out["match"].to_pylist() == ["g1", "gX"]


def test_compare_lineage_dicts():
    from sourmash_ray.stages.tax import compare_lineage_dicts

    a = {"s1": "d__A;p__X;c__1", "s2": "d__A;p__X", "s3": "d__A;p__Y",
         "s4": "d__B", "only_a": "d__A"}
    b = {"s1": "d__A;p__X;c__1", "s2": "d__A;p__X;c__2",
         "s3": "d__A;p__Z", "s4": "d__C", "only_b": "d__A"}
    tbl, summary = compare_lineage_dicts(a, b)
    rows = {r["ident"]: (r["status"], r["lca"]) for r in tbl.to_pylist()}
    assert rows == {
        "s2": ("compatible", "d__A;p__X"),     # ancestor relation
        "s3": ("incompatible", "d__A"),        # diverge at rank 1
        "s4": ("incompatible", ""),            # diverge at root
    }
    assert summary == {
        "n_total": 4, "n_different": 3, "n_compatible": 1,
        "n_incompatible": 2, "missing_in_a": 1, "missing_in_b": 1,
        "incompatible_at_depth": {1: 1, 0: 1},
    }


# ---------------------------------------------------------------------------
# tax summarize / tax grep (reference tax/__main__.py:561-684)
# ---------------------------------------------------------------------------

_LIN = {
    "gA": "Bacteria;Proteobacteria;Gammaproteo",
    "gB": "Bacteria;Proteobacteria;Alphaproteo",
    "gC": "Bacteria;Firmicutes",
    "gD": "Archaea;Euryarchaeota;Gammaproteo",   # reuses a deep name
}


def test_tax_summarize_counts_and_prefixes():
    from sourmash_ray.stages.tax import tax_summarize

    summary, tbl = tax_summarize(_LIN)
    assert summary["n_lineages"] == 4
    # name_seen is GLOBAL across ranks (reference quirk): 'Gammaproteo'
    # counts once at class even though gD carries it under Archaea too
    assert summary["rank_counts"] == {
        "superkingdom": 2, "phylum": 3, "class": 2}
    by_lin = {r["lineage"]: r for r in tbl.to_pylist()}
    assert by_lin["Bacteria"]["lineage_count"] == 3
    assert by_lin["Bacteria"]["rank"] == "superkingdom"
    assert by_lin["Bacteria;Proteobacteria"]["lineage_count"] == 2
    assert by_lin["Archaea;Euryarchaeota;Gammaproteo"][
        "lineage_count"] == 1
    # every prefix of every lineage appears
    assert len(by_lin) == 8
    # ordered by count desc, lineage asc
    counts = [r["lineage_count"] for r in tbl.to_pylist()]
    assert counts == sorted(counts, reverse=True)


def test_tax_grep_rank_invert_case():
    from sourmash_ray.stages.tax import tax_grep

    out = tax_grep(_LIN, "proteo")
    # case-sensitive: matches Gammaproteo/Alphaproteo (class), not
    # Proteobacteria
    assert out["ident"].to_pylist() == ["gA", "gB", "gD"]
    # rank restriction: phylum only -> class-level matches drop
    out = tax_grep(_LIN, "Proteo", rank="phylum")
    assert out["ident"].to_pylist() == ["gA", "gB"]
    # invert
    out = tax_grep(_LIN, "Proteo", invert=True)
    assert out["ident"].to_pylist() == ["gC", "gD"]
    # ignore_case
    out = tax_grep(_LIN, "bacteria", ignore_case=True,
                   rank="superkingdom")
    assert out["ident"].to_pylist() == ["gA", "gB", "gC"]
    assert out.column_names == ["ident", "superkingdom", "phylum",
                                "class"]
    import pytest

    with pytest.raises(ValueError, match="unknown rank"):
        tax_grep(_LIN, "x", rank="kingdom")


def test_tax_summarize_grep_cli(ray_session, tmp_path, capsys):
    import csv as _csv
    import json

    from sourmash_ray.__main__ import main

    path = tmp_path / "lin.csv"
    with open(path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["ident", "superkingdom", "phylum", "class"])
        for k, v in _LIN.items():
            w.writerow([k] + v.split(";"))

    out_csv = str(tmp_path / "counts.csv")
    main(["tax-summarize", "--csv", str(path), "--out", out_csv])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["n_lineages"] == 4
    with open(out_csv) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 8

    main(["tax-grep", "Proteo", "--csv", str(path), "--count"])
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["matches"] == 2


def test_tax_summarize_property_vs_bruteforce():
    """Random lineage dicts: prefix counts == brute-force Counter over
    all prefixes; rank_counts == first-seen-name histogram."""
    import numpy as np

    from sourmash_ray.stages.tax import tax_summarize

    rng = np.random.default_rng(5)
    names = [f"n{i}" for i in range(6)]
    for trial in range(15):
        lin = {}
        for i in range(int(rng.integers(0, 25))):
            depth = int(rng.integers(0, 4))
            lin[f"id{i}"] = ";".join(
                names[int(rng.integers(0, len(names)))]
                for _ in range(depth))
        summary, tbl = tax_summarize(lin)
        from collections import Counter

        want = Counter()
        for v in lin.values():
            parts = v.split(";") if v else []
            for d in range(1, len(parts) + 1):
                want[";".join(parts[:d])] += 1
        got = {r["lineage"]: r["lineage_count"] for r in tbl.to_pylist()}
        assert got == dict(want), trial
        assert summary["n_lineages"] == len(lin)
        seen = set()
        want_rc: dict = {}
        ranks = ("superkingdom", "phylum", "class", "order", "family",
                 "genus", "species", "strain")
        for v in lin.values():
            for d, nm in enumerate(v.split(";") if v else []):
                if nm not in seen:
                    seen.add(nm)
                    want_rc[ranks[d]] = want_rc.get(ranks[d], 0) + 1
        assert summary["rank_counts"] == want_rc


def test_tax_grep_customers_segment_rank(ray_session):
    """Distributed tax_grep over the per-row segment rank equals the
    DuckDB regex filter (regex memoized per distinct value)."""
    import duckdb

    from sourmash_ray.pipelines.relational import tax_grep_customers

    sf = "/root/testdata/sf0.001"
    got = sorted(r["ident"] for r in tax_grep_customers(
        sf, pattern="^SEG", rank="segment").take_all())
    want = sorted(str(r[0]) for r in duckdb.sql(f"""
        SELECT c_custkey FROM read_parquet('{sf}/customer.parquet')
        WHERE regexp_matches(c_mktsegment, '^SEG')""").fetchall())
    assert got == want
    inv = sorted(r["ident"] for r in tax_grep_customers(
        sf, pattern="^SEG", rank="segment", invert=True).take_all())
    alln = sorted(str(r[0]) for r in duckdb.sql(f"""
        SELECT c_custkey FROM read_parquet('{sf}/customer.parquet')
        """).fetchall())
    assert sorted(got + inv) == alln

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

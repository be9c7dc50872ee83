"""Picklist coltype preprocessing parity with the reference's lambdas
(``/root/reference/src/sourmash/picklist.py:20-46``)."""
import pyarrow as pa
import pytest

from sourmash_ray.stages.picklist import (
    PickStyle, combine_ident_md5, picklist_filter, preprocess_column,
)

NAMES = ["GCF_0001.1 some descr", "plainname", "a.b.c x", "  leading"]
MD5S = ["0123456789abcdef" * 2, "fedcba9876543210" * 2,
        "aaaabbbbccccdddd" * 2, "1111222233334444" * 2]


def _ref_ident(x):
    return x.split(" ")[0]


def _ref_identprefix(x):
    return x.split(" ")[0].split(".")[0]


def test_coltype_preprocessors_match_reference_lambdas():
    col = pa.array(NAMES, pa.string())
    assert preprocess_column(col, "name").to_pylist() == NAMES
    assert preprocess_column(col, "ident").to_pylist() == \
        [_ref_ident(x) for x in NAMES]
    assert preprocess_column(col, "identprefix").to_pylist() == \
        [_ref_identprefix(x) for x in NAMES]
    md5 = pa.array(MD5S, pa.string())
    assert preprocess_column(md5, "md5short").to_pylist() == \
        [x[:8] for x in MD5S]
    assert preprocess_column(md5, "md5prefix8").to_pylist() == \
        [x[:8] for x in MD5S]
    with pytest.raises(ValueError):
        preprocess_column(col, "nope")


def test_combine_ident_md5_matches_reference():
    got = combine_ident_md5(pa.array(NAMES), pa.array(MD5S)).to_pylist()
    exp = [f"{n.split(' ')[0]}|{m[:8]}" for n, m in zip(NAMES, MD5S)]
    assert got == exp


def test_picklist_filter_include_exclude_and_meta(ray_session):
    import ray.data

    tbl = pa.table({"name": pa.array(NAMES), "md5": pa.array(MD5S)})
    ds = ray.data.from_arrow(tbl)
    inc = picklist_filter(ds, "name", {"GCF_0001", "a"},
                          coltype="identprefix").take_all()
    assert sorted(r["name"] for r in inc) == [NAMES[0], NAMES[2]]
    exc = picklist_filter(ds, "name", {"GCF_0001", "a"},
                          coltype="identprefix",
                          style=PickStyle.EXCLUDE).take_all()
    assert sorted(r["name"] for r in exc) == sorted([NAMES[1], NAMES[3]])
    meta = picklist_filter(ds, "name",
                           {f"plainname|{MD5S[1][:8]}"},
                           coltype="manifest", md5_column="md5").take_all()
    assert [r["name"] for r in meta] == ["plainname"]

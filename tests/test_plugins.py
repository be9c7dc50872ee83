"""Extension registry (load_from/save_to/picklist hooks) —
``/root/reference/src/sourmash/plugins.py:45-188`` semantics."""
import numpy as np
import pyarrow as pa
import pytest

from sourmash_ray import plugins


def test_priority_order_first_non_none_wins(tmp_path):
    calls = []

    def a(loc):
        calls.append("a")
        return None

    def b(loc):
        calls.append("b")
        return "B"

    plugins.register_loader("zz_test_a", a, priority=1)
    plugins.register_loader("zz_test_b", b, priority=2)
    try:
        assert plugins.load_any("whatever://x") == "B"
        assert calls == ["a", "b"]
    finally:
        plugins._LOADERS[:] = [t for t in plugins._LOADERS
                               if not t[1].startswith("zz_test")]


def test_load_save_roundtrip_sigjson(ray_session, tmp_path):
    rows = [{"conv_id": "c1", "mins": np.array([5, 9, 11], np.uint64),
             "md5": "ab", "abunds": None, "ksize": 31, "scaled": 16}]
    p = str(tmp_path / "out.sig")
    plugins.save_any(rows, p)
    ds = plugins.load_any(p)
    got = ds.take_all()
    assert got[0]["conv_id"] == "c1"
    assert list(got[0]["mins"]) == [5, 9, 11]


def test_load_save_roundtrip_parquet(ray_session, tmp_path):
    import ray.data

    tbl = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    ds = ray.data.from_arrow(tbl)
    out = str(tmp_path / "pq_dir")
    plugins.save_any(ds, f"parquet://{out}")
    back = plugins.load_any(out)
    assert sorted(r["x"] for r in back.take_all()) == [1, 2, 3]


def test_unknown_location_raises():
    with pytest.raises(ValueError, match="no registered loader"):
        plugins.load_any("/nonexistent/blob.xyz")
    with pytest.raises(ValueError, match="no saver registered"):
        plugins.save_any([], "foo://bar")


def test_register_picklist_coltype(ray_session):
    import pyarrow.compute as pc

    from sourmash_ray.stages.picklist import PREPROCESS, preprocess_column

    plugins.register_picklist_coltype(
        "zz_upper", lambda c: pc.utf8_upper(c))
    try:
        out = preprocess_column(pa.array(["ab", "cd"]), "zz_upper")
        assert out.to_pylist() == ["AB", "CD"]
    finally:
        PREPROCESS.pop("zz_upper", None)


def test_csv_loader_and_krona_writer(ray_session, tmp_path):
    import csv

    p = str(tmp_path / "pick.csv")
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["ident"])
        w.writerows([["a"], ["b"]])
    ds = plugins.load_any(p)
    assert sorted(r["ident"] for r in ds.take_all()) == ["a", "b"]

    from sourmash_ray.pipelines.relational import krona_rows, write_krona

    header, rows = krona_rows("/root/testdata/sf0.001", rank=1)
    assert header == ("fraction", "region", "nation")
    fracs = [r[0] for r in rows]
    assert fracs == sorted(fracs, reverse=True)
    assert abs(sum(fracs) - 1.0) < 1e-9
    out = write_krona("/root/testdata/sf0.001", str(tmp_path / "k.tsv"))
    first = open(out).readline().strip().split("\t")
    assert first == ["fraction", "region", "nation"]


def test_cli_script_plugin_round_trip(ray_session, tmp_path, capsys):
    """The cli_script hook (reference plugins.py:91-188): a registered
    CommandLinePlugin subclass becomes a `scripts <command>` subcommand
    that parses its own args, runs under the live Ray session, and
    returns its exit code through the CLI entry point."""
    import json

    import ray

    from sourmash_ray.__main__ import main
    from sourmash_ray.plugins import (CommandLinePlugin, _CLI_SCRIPTS,
                                      cli_scripts,
                                      get_cli_scripts_descriptions,
                                      register_cli_script)

    class CountDocs(CommandLinePlugin):
        command = "count-docs"
        description = "count documents rows via Ray Data"

        def __init__(self, parser):
            super().__init__(parser)
            parser.add_argument("--sf", required=True)

        def main(self, args):
            import ray.data

            n = ray.data.read_parquet(
                f"{args.sf}/documents.parquet").count()
            print(json.dumps({"docs": n, "quiet": args.quiet}))
            return 0

    class NoCommand(CommandLinePlugin):
        pass

    import pytest

    with pytest.raises(ValueError, match="no 'command'"):
        register_cli_script(NoCommand)

    register_cli_script(CountDocs)
    try:
        assert "count-docs" in cli_scripts()
        assert any("count-docs" in line
                   for line in get_cli_scripts_descriptions())
        rc = main(["scripts", "count-docs", "--sf",
                   "/root/testdata/sf0.001", "-q"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["docs"] > 0
        assert out["quiet"] is True
        # the CLI must NOT shut down a session it did not create
        assert ray.is_initialized()
    finally:
        _CLI_SCRIPTS.pop("count-docs", None)

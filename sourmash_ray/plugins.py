"""Extension registry: load_from / save_to / picklist-coltype seams.

The reference exposes plugin hooks through Python entry points
(``/root/reference/src/sourmash/plugins.py:45-188``: ``load_from`` and
``save_to`` plugins tried in priority order, plus CLI subcommand
plugins). This engine's analogue is an in-process registry keyed by URI
scheme / priority:

- loaders: ``(priority, name, fn)`` where ``fn(location) ->
  ray.data.Dataset | None`` — first non-None wins, reference semantics of
  ``_load_database`` trying load_from plugins in priority order.
- savers: scheme → ``fn(sig_rows_or_dataset, location)``; picked by the
  location's scheme (``scheme://path``) or file suffix, mirroring
  ``save_to``'s ``SaveSignaturesToLocation`` dispatch
  (``sourmash_args.py`` suffix table).
- picklist coltypes: third-party coltype preprocessors can be added to
  ``stages.picklist.PREPROCESS`` through :func:`register_picklist_coltype`.

Entry-point discovery is replaced by explicit registration (no package
metadata machinery in a pipeline container); the built-in Parquet and
``.sig`` JSON codecs register themselves below, so ``load_any`` /
``save_any`` work out of the box.
"""
from __future__ import annotations

import os
from bisect import insort

_LOADERS: list[tuple[int, str, object]] = []  # (priority, name, fn)
_SAVERS: dict[str, object] = {}               # scheme/suffix -> fn
_CLI_SCRIPTS: dict[str, type] = {}            # command -> CommandLinePlugin


class CommandLinePlugin:
    """Base class for ``cli_script`` plugins — the reference's
    plugin-registered-subcommand surface (``plugins.py:91-110``): a
    subclass sets ``command`` (the subcommand name) and ``description``,
    extends the argparse subparser in ``__init__(parser)`` (calling
    ``super().__init__(parser)`` for the common flags), and implements
    ``main(args)``. Registered classes appear under
    ``python -m sourmash_ray scripts <command>``.
    """

    command: str | None = None
    description: str | None = None

    def __init__(self, parser):
        parser.add_argument("-q", "--quiet", action="store_true",
                            help="suppress non-error output")
        parser.add_argument("-d", "--debug", action="store_true",
                            help="provide debugging output")

    def main(self, args):  # pragma: no cover - overridden by plugins
        return 0


def register_cli_script(script_cls: type) -> None:
    """Register a :class:`CommandLinePlugin` subclass as a CLI
    subcommand (the ``cli_script`` entry-point hook; explicit
    registration replaces package-metadata discovery, as for loaders)."""
    command = getattr(script_cls, "command", None)
    if not command:
        raise ValueError(
            f"cli_script plugin {script_cls!r} provides no 'command'")
    _CLI_SCRIPTS[command] = script_cls


def cli_scripts() -> dict[str, type]:
    return dict(_CLI_SCRIPTS)


def get_cli_scripts_descriptions():
    """One-line description per registered script (for ``scripts``
    help text; reference ``get_cli_scripts_descriptions``)."""
    for command in sorted(_CLI_SCRIPTS):
        cls = _CLI_SCRIPTS[command]
        description = (cls.description or "").strip().splitlines()
        desc = (description[0] if description
                else f"(no description provided by plugin {command!r})")
        yield f"scripts {command:16s} - {desc}"


def add_cli_scripts(subparsers) -> dict[str, "CommandLinePlugin"]:
    """Wire every registered script into an argparse subparsers object;
    returns ``{command: plugin instance}`` for dispatch (reference
    ``add_cli_scripts``)."""
    objs = {}
    for command in sorted(_CLI_SCRIPTS):
        cls = _CLI_SCRIPTS[command]
        sp = subparsers.add_parser(
            command,
            usage=getattr(cls, "usage", None),
            description=getattr(cls, "description", None),
            epilog=getattr(cls, "epilog", None))
        objs[command] = cls(sp)
    return objs


def register_loader(name: str, fn, priority: int = 50) -> None:
    """``fn(location) -> Dataset | None`` (None = not mine). Lower
    priority runs first (reference: plugin priority attribute)."""
    insort(_LOADERS, (priority, name, fn), key=lambda t: (t[0], t[1]))


def register_saver(scheme_or_suffix: str, fn) -> None:
    """``fn(rows_or_dataset, location)``; key is a URI scheme ('parquet')
    or a filename suffix ('.sig', '.sig.gz')."""
    _SAVERS[scheme_or_suffix] = fn


def register_picklist_coltype(name: str, fn) -> None:
    """Add a picklist coltype preprocessor (pa.Array -> pa.Array) —
    the ``picklist_filters`` plugin hook."""
    from .stages.picklist import PREPROCESS

    PREPROCESS[name] = fn


def loaders() -> list[tuple[int, str, object]]:
    return list(_LOADERS)


def load_any(location: str):
    """Try every registered loader in priority order; first non-None
    wins (``plugins.py:45-66`` + ``sourmash_args.py`` load chain)."""
    errors = []
    for _, name, fn in _LOADERS:
        try:
            out = fn(location)
        except Exception as e:  # a loader that can't parse it → next
            errors.append(f"{name}: {e}")
            continue
        if out is not None:
            return out
    raise ValueError(
        f"no registered loader recognized {location!r}"
        + (f" (tried: {'; '.join(errors)})" if errors else ""))


def save_any(rows_or_dataset, location: str):
    """Dispatch on 'scheme://path' or file suffix."""
    if "://" in location:
        scheme, path = location.split("://", 1)
        if scheme not in _SAVERS:
            raise ValueError(f"no saver registered for scheme {scheme!r}")
        return _SAVERS[scheme](rows_or_dataset, path)
    for suffix in sorted(_SAVERS, key=len, reverse=True):
        if location.endswith(suffix):
            return _SAVERS[suffix](rows_or_dataset, location)
    raise ValueError(f"no saver registered for {location!r}")


# ---------------------------------------------------------------------------
# built-in codecs
# ---------------------------------------------------------------------------


def _load_parquet_dir(location: str):
    if location.endswith(".parquet") or (
            os.path.isdir(location) and any(
                f.endswith(".parquet") for f in os.listdir(location))):
        from .sources.tables import read_parquet_clean

        return read_parquet_clean(location)
    return None


def _load_sigjson(location: str):
    if location.endswith((".sig", ".sig.gz", ".sig.json")):
        import ray.data

        from .sources.sigjson import read_sig_json

        return ray.data.from_arrow(read_sig_json(location))
    return None


def _save_parquet(rows_or_dataset, path: str):
    import ray.data

    if isinstance(rows_or_dataset, ray.data.Dataset):
        rows_or_dataset.write_parquet(path)
        return path
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pylist(rows_or_dataset), path)
    return path


def _save_sigjson(rows_or_dataset, path: str):
    import ray.data

    from .sources.sigjson import write_sig_json

    rows = (rows_or_dataset.take_all()
            if isinstance(rows_or_dataset, ray.data.Dataset)
            else rows_or_dataset)
    write_sig_json(rows, path)
    return path


def _load_stdin(location: str):
    """'-' reads signature JSON from stdin (``sourmash_args.py`` stdin
    loader): the whole stream is one .sig document."""
    if location != "-":
        return None
    import json as _json
    import sys

    import ray.data

    from .sources.sigjson import sig_json_to_table

    return ray.data.from_arrow(sig_json_to_table(_json.load(sys.stdin)))


def _load_sbt(location: str):
    """``.sbt.json`` / ``.sbt.zip`` SBT index → leaf-signature Dataset
    (``sbtmh.load_sbt_index`` analogue; the tree itself is available via
    ``stages.sbt.SBT.load`` for pruned search)."""
    if location.endswith((".sbt.json", ".sbt.zip")):
        import ray.data

        from .stages.sbt import SBT

        return ray.data.from_arrow(SBT.load(location).leaf_table)
    return None


def _save_sbt(rows_or_dataset, path: str):
    """Build + save an SBT from a signature collection
    (``commands.py:501-604`` ``index`` analogue)."""
    import ray.data

    from .stages.sbt import build_sbt

    sigs = rows_or_dataset
    if not isinstance(sigs, ray.data.Dataset):
        import pyarrow as pa

        if not isinstance(sigs, pa.Table):
            from .sources.sigjson import sig_json_to_table, sigs_to_json

            sigs = sig_json_to_table(sigs_to_json(list(sigs)))
    return build_sbt(sigs).save(path)


def _load_sqlite(location: str):
    """SqliteIndex database → signature Dataset (``.sqldb`` suffix or
    sqlite-magic + ``sourmash_internal`` sniff, ``sqlite_utils.py:10-46``
    analogue)."""
    from .sources.sqlite_index import is_sqlite_index, load_sqlite_table

    if location.endswith(".sqldb") or is_sqlite_index(location):
        import ray.data

        return ray.data.from_arrow(load_sqlite_table(location))
    return None


def _save_sqlite(rows_or_dataset, path: str):
    import ray.data

    from .sources.sqlite_index import save_sqlite_index

    sigs = rows_or_dataset
    if not isinstance(sigs, ray.data.Dataset):
        import pyarrow as pa

        if not isinstance(sigs, pa.Table):
            from .sources.sigjson import sig_json_to_table, sigs_to_json

            sigs = sig_json_to_table(sigs_to_json(list(sigs)))
    return save_sqlite_index(sigs, path)


def _load_csv(location: str):
    if location.endswith((".csv", ".csv.gz")):
        import ray.data

        return ray.data.read_csv(location)
    return None


register_loader("stdin", _load_stdin, priority=5)
register_loader("sbt", _load_sbt, priority=8)
register_loader("sqlite", _load_sqlite, priority=12)
register_loader("csv", _load_csv, priority=30)
register_loader("parquet", _load_parquet_dir, priority=20)
register_loader("sigjson", _load_sigjson, priority=10)
register_saver("parquet", _save_parquet)
register_saver(".parquet", _save_parquet)
register_saver("sig", _save_sigjson)
register_saver(".sig", _save_sigjson)
register_saver(".sig.gz", _save_sigjson)
register_saver(".sbt.json", _save_sbt)
register_saver(".sbt.zip", _save_sbt)
register_saver(".sqldb", _save_sqlite)

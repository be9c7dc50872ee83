"""LCA database JSON interop — the reference's ``sourmash_lca`` v2.x
on-disk format as a conversion utility.

Format (``/root/reference/src/sourmash/lca/lca_db.py:296-466``):
one JSON object with ``version`` (≥2.0) / ``type: "sourmash_lca"`` /
``ksize`` / ``scaled`` / ``moltype``, identifier maps (``ident_to_idx``,
``ident_to_name``, ``idx_to_lid``), ``lid_to_lineage`` as
``{lid: [[rank, name], ...]}`` (the save path's final overwrite at
``:464`` leaves the pair-list form on disk; the loader at ``:369-380``
reads exactly that) and ``hashval_to_idx`` with stringified u64 keys
(JSON has no 64-bit int type, ``:384-390``).

The engine consumes an LCA DB as (a) the exploded ``(hash, conv_id)``
inverted-index table (``stages/index.build_inverted_index`` shape) and
(b) an ``ident -> ';'-joined lineage`` dict for ``lca_summarize`` /
``tax_metagenome`` — both produced here on load. Like ``sigjson``, this
is an edge conversion: at scale the index lives as Parquet
(``stages/index.write_index``), not JSON.
"""

from __future__ import annotations

import gzip
import json
import os

import numpy as np
import pyarrow as pa

# lca_utils.taxlist() rank order — lineage strings map positionally
TAXLIST = ("superkingdom", "phylum", "class", "order", "family",
           "genus", "species", "strain")


def write_lca_json(path: str, entries, *, ksize: int, scaled: int,
                   moltype: str = "DNA") -> str:
    """``entries``: iterable of ``(ident, name, lineage_str, mins)``.
    Writes the reference's v2.1 JSON (gzip when the name ends ``.gz``);
    refuses to overwrite, like ``save_to_json:426-428``."""
    if os.path.exists(path):
        raise ValueError(
            f"LCA database {path} already exists; not overwriting")

    ident_to_idx: dict[str, int] = {}
    ident_to_name: dict[str, str] = {}
    idx_to_lid: dict[int, int] = {}
    lineage_to_lid: dict[str, int] = {}
    lid_to_lineage: dict[int, list] = {}
    hashval_to_idx: dict[int, list] = {}

    for ident, name, lineage, mins in entries:
        idx = ident_to_idx.setdefault(ident, len(ident_to_idx))
        ident_to_name[ident] = name
        if lineage:
            lid = lineage_to_lid.get(lineage)
            if lid is None:
                lid = lineage_to_lid[lineage] = len(lineage_to_lid)
                parts = lineage.split(";")
                lid_to_lineage[lid] = [
                    [TAXLIST[i] if i < len(TAXLIST) else str(i), p]
                    for i, p in enumerate(parts)]
            idx_to_lid[idx] = lid
        for h in np.asarray(mins, dtype=np.uint64):
            hashval_to_idx.setdefault(int(h), []).append(idx)

    save_d = {
        "version": "2.1",
        "type": "sourmash_lca",
        "license": "CC0",
        "ksize": ksize,
        "scaled": scaled,
        "moltype": moltype,
        "lid_to_lineage": {str(k): v for k, v in lid_to_lineage.items()},
        "hashval_to_idx": {str(k): v for k, v in hashval_to_idx.items()},
        "ident_to_name": ident_to_name,
        "ident_to_idx": ident_to_idx,
        "idx_to_lid": {str(k): v for k, v in idx_to_lid.items()},
    }
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as f:
        json.dump(save_d, f)
    return path


def load_lca_json(path: str) -> dict:
    """Load a ``sourmash_lca`` JSON DB. Returns ``{ksize, scaled,
    moltype, index_table, lineages, names}`` where ``index_table`` is the
    exploded ``(hash uint64, conv_id string)`` pa.Table (the
    ``build_inverted_index`` shape) and ``lineages`` maps ident →
    ';'-joined lineage. Validation mirrors ``lca_db.py:296-360``:
    not-a-file / non-JSON / wrong type / pre-2.0 all raise ValueError."""
    if not os.path.isfile(path):
        raise ValueError(
            f"'{path}' is not a file and cannot be loaded as an LCA "
            "database")
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        first = f.read(1)
        if first != "{":
            raise ValueError(f"'{path}' is not an LCA database file.")
        f.seek(0)
        try:
            d = json.load(f)
        except json.JSONDecodeError:
            raise ValueError(
                f"cannot parse database file '{path}' as JSON; "
                "invalid format.")
    if d.get("type") != "sourmash_lca":
        raise ValueError(f"database file '{path}' is not an LCA db.")
    if float(d.get("version", 0)) < 2.0 or "lid_to_lineage" not in d:
        raise ValueError("old-style LCA DB; rebuild required")

    idx_to_ident = {v: k for k, v in d["ident_to_idx"].items()}
    lid_to_lin = {int(k): ";".join(name for _, name in v if name)
                  for k, v in d["lid_to_lineage"].items()}
    lineages = {}
    for idx_s, lid in d["idx_to_lid"].items():
        ident = idx_to_ident.get(int(idx_s))
        if ident is not None:
            lineages[ident] = lid_to_lin.get(int(lid), "")

    hashes, idents = [], []
    for h_s, idxs in d["hashval_to_idx"].items():
        h = int(h_s)
        for idx in idxs:
            hashes.append(h)
            idents.append(idx_to_ident[idx])
    index_table = pa.table({
        "hash": pa.array(np.array(hashes, np.uint64), pa.uint64()),
        "conv_id": pa.array(idents, pa.string()),
    })
    return {
        "ksize": int(d["ksize"]),
        "scaled": int(d["scaled"]),
        "moltype": d.get("moltype", "DNA"),
        "index_table": index_table,
        "lineages": lineages,
        "names": dict(d["ident_to_name"]),
    }

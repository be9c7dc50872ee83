"""Sourmash-compatible ``.sig`` JSON import/export (conversion utility).

Field layout mirrors the reference's serde structs
(``/root/reference/src/core/src/signature.rs:103-147``: top-level list of
signature objects with ``class/email/hash_function/filename/name/version``
and per-sketch ``num, ksize, seed, max_hash, mins, md5sum, abundances?,
molecule``). Kept as an interop utility (SURVEY.md §2.1 ".sig JSON loader"
row) — inside the engine, signatures live as Parquet/Arrow.
"""

from __future__ import annotations

import gzip
import json

import numpy as np
import pyarrow as pa

from ..functions.sketch import max_hash_for_scaled, scaled_for_max_hash


def sigs_to_json(sig_rows: list[dict], hash_function: str = "text/shingle",
                 version: float = 0.4) -> list[dict]:
    out = []
    for r in sig_rows:
        mins = [int(m) for m in r["mins"]]
        sk = {
            "num": int(r.get("num", 0)),
            "ksize": int(r["ksize"]),
            "seed": int(r.get("seed", 42)),
            "max_hash": int(max_hash_for_scaled(int(r.get("scaled", 0)))),
            "mins": mins,
            "md5sum": r["md5"],
            "molecule": hash_function,
        }
        ab = r.get("abunds")
        if ab is not None and len(ab):
            sk["abundances"] = [int(x) for x in ab]
        out.append({
            "class": "sourmash_signature",
            "email": "",
            "hash_function": "0.murmur64",
            "filename": "-",
            "name": r["conv_id"],
            "license": "CC0",
            "signatures": [sk],
            "version": version,
        })
    return out


def write_sig_json(sig_rows: list[dict], path: str):
    payload = json.dumps(sigs_to_json(sig_rows))
    if path.endswith(".gz"):
        with gzip.open(path, "wt") as f:
            f.write(payload)
    else:
        with open(path, "w") as f:
            f.write(payload)
    return path


def read_sig_json(path: str) -> pa.Table:
    """Load a .sig JSON (optionally gzip) into the signatures-table shape
    (subset of columns: conv_id, ksize, scaled, num, seed, mins, abunds,
    md5). Flattens one sketch per signature (the 1-sketch-per-row
    invariant, ``signature.rs:584-659`` filtered-load analogue)."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    return sig_json_to_table(data)


def sig_json_to_table(data: list) -> pa.Table:
    """Parsed .sig JSON document list → signatures table (shared by the
    file and stdin loaders)."""
    rows = {k: [] for k in ("conv_id", "ksize", "scaled", "num", "seed",
                            "mins", "abunds", "md5")}
    for sig in data:
        for sk in sig["signatures"]:
            rows["conv_id"].append(sig.get("name", ""))
            rows["ksize"].append(int(sk["ksize"]))
            rows["scaled"].append(
                int(scaled_for_max_hash(int(sk.get("max_hash", 0)))))
            rows["num"].append(int(sk.get("num", 0)))
            rows["seed"].append(int(sk.get("seed", 42)))
            mins = np.array(sorted(int(m) for m in sk["mins"]),
                            dtype=np.uint64)
            rows["mins"].append(mins)
            ab = sk.get("abundances")
            rows["abunds"].append(
                np.array([int(x) for x in ab], dtype=np.uint64)
                if ab is not None else np.ones(mins.size, np.uint64))
            rows["md5"].append(sk.get("md5sum", ""))
    return pa.table({
        "conv_id": pa.array(rows["conv_id"], pa.string()),
        "ksize": pa.array(rows["ksize"], pa.int32()),
        "scaled": pa.array(rows["scaled"], pa.uint64()),
        "num": pa.array(rows["num"], pa.uint32()),
        "seed": pa.array(rows["seed"], pa.uint64()),
        "mins": pa.array(rows["mins"], pa.list_(pa.uint64())),
        "abunds": pa.array(rows["abunds"], pa.list_(pa.uint64())),
        "md5": pa.array(rows["md5"], pa.string()),
    })


def export_mash_json(sigs, conv_id: str, path: str) -> str:
    """``sig export`` (``sig/__main__.py:1059-1084``): write one
    signature as a mash-compatible JSON dict — kmer size, sketch size,
    hash type/bits/seed, and the hash list. One row leaves the Dataset
    (predicate pushdown)."""
    import json

    rows = sigs.filter(expr=f"conv_id == '{conv_id}'").take_all()
    if not rows:
        raise ValueError(f"signature not found: {conv_id}")
    r = rows[0]
    from ..functions.murmur import DEFAULT_SEED

    x = {
        "kmer": int(r["ksize"]),
        "sketchSize": len(r["mins"]),
        "hashType": "MurmurHash3_x64_128",
        "hashBits": 64,
        "hashSeed": DEFAULT_SEED,
        "sketches": [{"hashes": [int(h) for h in r["mins"]]}],
    }
    with open(path, "w") as f:
        json.dump(x, f)
    return path


def import_mash_csv(path: str) -> pa.Table:
    """``sourmash import_csv`` (``commands.py:455-480``): read the legacy
    mash CSV (``hashfn,seed,ksize,name,space-separated-hashes`` per row)
    into signature rows. Same validation as the reference: only
    ``murmur64`` seed 42 is accepted."""
    import csv

    import numpy as np

    from ..functions.sketch import md5_of_mins

    rows = []
    with open(path, newline="") as fp:
        for row in csv.reader(fp):
            hashfn, hashseed, ksize, name, hashes = row
            if hashfn != "murmur64":
                raise ValueError(f"unsupported hash function: {hashfn}")
            if int(hashseed) != 42:
                raise ValueError(f"unsupported hash seed: {hashseed}")
            mins = np.sort(np.array(
                [int(h) for h in hashes.strip().split(" ")], np.uint64))
            rows.append({
                "conv_id": name,
                "ksize": int(ksize),
                "scaled": 0,
                "num": len(mins),
                "mins": mins.tolist(),
                "abunds": None,
                "md5": md5_of_mins(mins, int(ksize)),
            })
    return pa.Table.from_pylist(rows)

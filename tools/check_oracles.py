"""Local simulation of the driver's correctness gate: run every queries()
entry at a given sf against its oracle_sql() twin in DuckDB and compare
row count, schema (column names), and order-insensitive value hash."""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] or None
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(df.astype(str).itertuples(index=False, name=None))
    return hashlib.md5(str(rows).encode()).hexdigest()


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")

    qs = e.queries()
    oracles = e.oracle_sql()
    # transcript-grain oracles embed the DRIVER's sf0.01 cache path
    # (oracle_sql() takes no sf); when this harness sweeps another sf,
    # point them at that sf's cache so the comparison stays like-for-like
    from sourmash_ray.sources.transcripts import transcripts_path

    default_turns = transcripts_path("/root/testdata/sf0.01")
    this_turns = transcripts_path(SF_DIR)
    if this_turns != default_turns:
        oracles = {k: v.replace(default_turns, this_turns)
                   for k, v in oracles.items()}
    from sourmash_ray.stages.multimodal import media_path

    default_media = media_path("/root/testdata/sf0.01")
    this_media = media_path(SF_DIR)
    if this_media != default_media:
        oracles = {k: v.replace(default_media, this_media)
                   for k, v in oracles.items()}
    fails = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(SF_DIR))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        wall = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok-rows-only {name}: {len(mine)} rows  {wall:.1f}s")
            continue
        ref = con.sql(oracles[name]).df()
        problems = []
        if len(mine) != len(ref):
            problems.append(f"rows {len(mine)} != {len(ref)}")
        if sorted(mine.columns) != sorted(ref.columns):
            problems.append(f"cols {sorted(mine.columns)} != {sorted(ref.columns)}")
        if not problems and value_hash(mine) != value_hash(ref):
            problems.append("value hash mismatch")
            m = mine[sorted(mine.columns)].astype(str)
            r = ref[sorted(ref.columns)].astype(str)
            ms = set(map(tuple, m.itertuples(index=False, name=None)))
            rs = set(map(tuple, r.itertuples(index=False, name=None)))
            print("   only-mine:", list(ms - rs)[:3])
            print("   only-ref :", list(rs - ms)[:3])
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}  {wall:.1f}s")
            fails.append(name)
        else:
            print(f"OK   {name}: {len(mine)} rows  {wall:.1f}s")
    print("\n==", "ALL OK" if not fails else f"FAILURES: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

"""Relational parity operators.

The reference's manifest/picklist machinery is ordinary relational algebra
(SURVEY.md §2.4): metadata predicates (``Index.select``,
``/root/reference/src/sourmash/index/__init__.py:349-394``), semi/anti joins
against picked-value sets (``picklist.py:54-325``), top-k result sorting
(``search.py:693-694`` + ``--num-results``), and collection summaries.
Here each is expressed over the TPC-H-ish testdata tables so the DuckDB
oracle can check it exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..sources.tables import read_parquet_clean


def manifest_select(sf_dir: str):
    """Predicate + projection with pushdown at the Parquet scan — the
    ``select_signature`` pattern: only needed columns leave storage.

    lineitem where l_quantity > 45, projected to 4 columns.
    """
    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"],
    )
    return ds.filter(expr="l_quantity > 45")


# A picklist is "small by definition" — until it isn't (this pick grows
# linearly with the customer table). Above this many picked keys the
# broadcast set would strain the driver/worker heaps, so the op switches
# to the big-big semi/anti exchange join (same switch pattern as verify's
# broadcast-vs-co-group budget).
PICKLIST_BROADCAST_BUDGET = 200_000


def _picklist_join_orders(sf_dir: str, anti: bool,
                          broadcast_budget: int = PICKLIST_BROADCAST_BUDGET):
    """Shared body of the picklist include/exclude joins: orders whose
    customer is (semi) / is not (anti) in the picked set.

    Within ``broadcast_budget`` picked keys: ray.put the sorted key set
    once, ``pc.is_in`` filter inside map_batches — zero shuffle. Beyond
    it: route through :func:`stages.join.hash_join_exchange`
    (``left semi`` / ``left anti``) — both sides ship through the key
    exchange, nothing materializes on the driver. Both branches are
    equality-tested against each other (``tests/test_join.py`` pattern).
    """
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    picked = cust.filter(expr="c_mktsegment == 'BUILDING'")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    # One bounded pull decides the branch AND supplies the broadcast set:
    # limit() stops the scan early when the pick is over budget.
    head = (picked.select_columns(["c_custkey"])
            .limit(broadcast_budget + 1).take_all())
    if len(head) <= broadcast_budget:
        keys = pa.array(sorted({r["c_custkey"] for r in head}), pa.int64())
        keys_ref = ray.put(keys)

        def _filter(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch["o_custkey"], value_set=ray.get(keys_ref))
            if anti:
                mask = pc.invert(mask)
            return batch.filter(mask)

        return orders.map_batches(_filter, batch_format="pyarrow")

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.join import hash_join_exchange

    joined = hash_join_exchange(
        orders, picked.select_columns(["c_custkey"]),
        key="o_custkey", left_cols=["o_orderkey", "o_totalprice"],
        right_cols=[], n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        join_type="left anti" if anti else "left semi",
        right_key="c_custkey")
    return joined.select_columns(["o_orderkey", "o_custkey",
                                  "o_totalprice"])


def picklist_semi_join(sf_dir: str):
    """Picklist include-style semi join (``picklist.py:265-319``,
    PickStyle.INCLUDE): orders whose customer is in the picked set —
    broadcast within budget, key exchange beyond
    (:func:`_picklist_join_orders`)."""
    return _picklist_join_orders(sf_dir, anti=False)


def picklist_anti_join(sf_dir: str):
    """Picklist exclude-style anti join (PickStyle.EXCLUDE,
    ``picklist.py:49-52``) — broadcast within budget, key exchange
    beyond (:func:`_picklist_join_orders`)."""
    return _picklist_join_orders(sf_dir, anti=True)


def topk_orders(sf_dir: str, k: int = 25):
    """Global top-k — the ``--num-results``/``best_containment`` pattern
    (``index/__init__.py:258-270``: score desc, key tiebreak). Each
    block keeps only its own top-k (vectorized argpartition), so the
    final sort+limit runs over ≤ k×blocks candidate rows instead of a
    full-dataset sort shuffle."""
    import numpy as np

    def _block_topk(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n <= k:
            return batch
        price = np.asarray(batch["o_totalprice"], np.float64)
        okey = np.asarray(batch["o_orderkey"], np.int64)
        idx = np.lexsort((okey, -price))[:k]
        return batch.take(pa.array(np.sort(idx), pa.int64()))

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_totalprice"])
    return (ds.map_batches(_block_topk, batch_format="pyarrow")
            .sort(["o_totalprice", "o_orderkey"],
                  descending=[True, False]).limit(k))


def pricing_summary(sf_dir: str):
    """groupby + multi-aggregate — TPC-H Q1 shape, the ``sig describe``
    collection-stats analogue.

    Money/quantity are converted to exact integers (cents) PER ROW before
    summing: float sums differ between engines in the last ulp, so every
    oracle-checked aggregate in this repo is integer-valued by design.
    """
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice"])

    def _to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty": pc.cast(pc.round(batch["l_quantity"]), pa.int64()),
            "price_cents": pc.cast(
                pc.round(pc.multiply(batch["l_extendedprice"],
                                     pa.scalar(100.0))), pa.int64()),
        })

    # block-local partial aggregation (Arrow group_by inside the task,
    # single-threaded) shrinks the exchange to blocks × n_groups rows —
    # the fact rows never enter a shuffle
    from ..functions.segscore import hash_strings64
    from ..stages.exchange import exchange_map_groups
    from ..config import DEFAULT_CONFIG, resolve_num_partitions

    out_schema = pa.schema([
        ("l_returnflag", pa.string()),
        ("l_linestatus", pa.string()),
        ("sum_qty", pa.int64()),
        ("sum_price_cents", pa.int64()),
        ("count_order", pa.int64()),
    ])

    def _partial(batch: pa.Table) -> pa.Table:
        t = _to_cents(batch)
        g = t.group_by(["l_returnflag", "l_linestatus"],
                       use_threads=False).aggregate(
            [("qty", "sum"), ("price_cents", "sum"), ("qty", "count")])
        key = pc.binary_join_element_wise(
            g["l_returnflag"].combine_chunks(),
            g["l_linestatus"].combine_chunks(), "|")
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": pc.cast(g["qty_sum"], pa.int64()),
            "sum_price_cents": pc.cast(g["price_cents_sum"], pa.int64()),
            "count_order": pc.cast(g["qty_count"], pa.int64()),
            "grp_part": pa.array(hash_strings64(key) % 1024, pa.int64()),
        })

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return out_schema.empty_table()
        g = part.group_by(["l_returnflag", "l_linestatus"],
                       use_threads=False).aggregate(
            [("sum_qty", "sum"), ("sum_price_cents", "sum"),
             ("count_order", "sum")])
        return pa.table({
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": pc.cast(g["sum_qty_sum"], pa.int64()),
            "sum_price_cents": pc.cast(g["sum_price_cents_sum"],
                                       pa.int64()),
            "count_order": pc.cast(g["count_order_sum"], pa.int64()),
        })

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    return exchange_map_groups(parts, "grp_part",
                               resolve_num_partitions(DEFAULT_CONFIG),
                               _merge, out_schema)


def union_collections(sf_dir: str):
    """``sig cat`` / MultiIndex union (``sig/__main__.py:114-163``):
    concatenate two sources then deduplicate by key — count rows per
    nation key across the union of supplier and customer tables."""
    from ..stages.agg import grouped_sums

    sup = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                                columns=["s_nationkey"]).rename_columns(
                                    {"s_nationkey": "nationkey"})
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                                 columns=["c_nationkey"]).rename_columns(
                                     {"c_nationkey": "nationkey"})
    return grouped_sums(sup.union(cust), ["nationkey"], [],
                        count_as="n_rows")


def broadcast_lookup_join(sf_dir: str):
    """Small-dimension broadcast join (the lineage-lookup pattern,
    ``tax_utils.py:1210-1455``): customer × nation × region names,
    aggregated to (r_name, n_name, n_customers)."""
    import numpy as np

    from ..stages.agg import grouped_sums

    nation = {r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    region = {r["r_regionkey"]: r["r_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/region.parquet").take_all()}
    # dense lookup arrays indexed by nationkey — vectorized gather per
    # batch instead of a per-row dict probe
    max_nk = max(nation)
    r_by_nk = np.empty(max_nk + 1, dtype=object)
    n_by_nk = np.empty(max_nk + 1, dtype=object)
    for nk, (name, rk) in nation.items():
        r_by_nk[nk] = region[rk]
        n_by_nk[nk] = name
    hole = np.array([v is None for v in r_by_nk])  # in-range but no dim row
    lookup_ref = ray.put((r_by_nk, n_by_nk, hole))

    def _attach(batch: pa.Table) -> pa.Table:
        r_a, n_a, hole_a = ray.get(lookup_ref)
        nk = np.asarray(batch["c_nationkey"], dtype=np.int64)
        # a negative key would WRAP via numpy indexing and silently attach
        # a wrong lineage; a key past or missing from the dim would attach
        # a null — raise like the dict probe this replaced (ADVICE r2)
        if nk.size and (nk.min() < 0 or nk.max() >= r_a.size
                        or hole_a[nk].any()):
            bad = nk[(nk < 0) | (nk >= r_a.size)
                     | hole_a[np.clip(nk, 0, r_a.size - 1)]]
            raise ValueError(
                f"c_nationkey values outside the nation dim: {bad[:5]!r}")
        return pa.table({
            "r_name": pa.array(r_a[nk], pa.string()),
            "n_name": pa.array(n_a[nk], pa.string()),
        })

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                                 columns=["c_nationkey"])
    return grouped_sums(cust.map_batches(_attach, batch_format="pyarrow"),
                        ["r_name", "n_name"], [],
                        count_as="n_customers")


def picklist_ident_parts(sf_dir: str):
    """Picklist with the ``ident`` coltype (``picklist.py:27``: first
    space-delimited token of the name): keep parts whose name-ident is
    among the idents of size-5 parts. The picked set is collected small
    (distinct idents), broadcast, matched vectorized per batch."""
    from ..stages.picklist import PickStyle, picklist_filter, preprocess_column

    parts = read_parquet_clean(f"{sf_dir}/part.parquet",
                               columns=["p_partkey", "p_name", "p_size"])
    small = parts.filter(expr="p_size == 5")
    picked = set()
    for b in small.map_batches(
            lambda t: pa.table({"ident": preprocess_column(
                t["p_name"].combine_chunks(), "ident")}),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        picked.update(b["ident"].to_pylist())

    kept = picklist_filter(
        parts.select_columns(["p_partkey", "p_name"]),
        "p_name", picked, coltype="ident", style=PickStyle.INCLUDE)

    def _out(batch: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": batch["p_partkey"],
            "ident": preprocess_column(batch["p_name"].combine_chunks(),
                                       "ident"),
        })

    return kept.map_batches(_out, batch_format="pyarrow")


def tax_rollup_customers(sf_dir: str):
    """Rank-rollup aggregation (``tax_utils.py:985-1018``
    aggregate_by_lineage_at_rank / summarize-at-rank family): customers
    carry the lineage region;nation (broadcast dim lookup), and the
    operator aggregates count + exact acctbal cents at EVERY rank prefix
    — one output row per (rank, lineage), like ``tax metagenome``'s
    per-rank summary rows.

    Scale shape: dims broadcast (tiny), the fact table explodes ×n_ranks
    inside map_batches, then block-local combiner + coarse exchange
    (``grouped_sums``) — only per-block (rank, lineage) partials shuffle."""
    from ..stages.agg import grouped_sums

    nation = {r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    region = {r["r_regionkey"]: r["r_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/region.parquet").take_all()}
    import numpy as np

    # dense lookup arrays indexed by nationkey — one vectorized gather
    # per batch instead of a per-row dict probe
    max_nk = max(nation)
    full_by_nk = np.empty(max_nk + 1, dtype=object)
    rank0_by_nk = np.empty(max_nk + 1, dtype=object)
    for nk, (name, rk) in nation.items():
        rank0_by_nk[nk] = region[rk]
        full_by_nk[nk] = f"{region[rk]};{name}"
    hole = np.array([v is None for v in full_by_nk])
    lin_ref = ray.put((rank0_by_nk, full_by_nk, hole))

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey",
                                       "c_acctbal"])

    def _explode(batch: pa.Table) -> pa.Table:
        import numpy as np

        rank0_a, full_a, hole_a = ray.get(lin_ref)
        nk = np.asarray(batch["c_nationkey"], dtype=np.int64)
        # range + hole guard: negative keys wrap, missing keys null (ADVICE)
        if nk.size and (nk.min() < 0 or nk.max() >= full_a.size
                        or hole_a[nk].any()):
            bad = nk[(nk < 0) | (nk >= full_a.size)
                     | hole_a[np.clip(nk, 0, full_a.size - 1)]]
            raise ValueError(
                f"c_nationkey values outside the nation dim: {bad[:5]!r}")
        cents = pc.cast(pc.round(pc.multiply(
            batch["c_acctbal"], pa.scalar(100.0))), pa.int64())
        n = batch.num_rows
        return pa.table({
            "lineage_rank": pa.array([0] * n + [1] * n, pa.int64()),
            "lineage": pa.array(np.concatenate([rank0_a[nk], full_a[nk]]),
                                pa.string()),
            "acctbal_cents": pa.concat_arrays(
                [cents.combine_chunks()] * 2),
        })

    exploded = cust.map_batches(_explode, batch_format="pyarrow")
    return grouped_sums(exploded, ["lineage_rank", "lineage"],
                        ["acctbal_cents"], count_as="n_customers")


def krona_rows(sf_dir: str, rank: int = 1):
    """Krona-format rows from the lineage rollup
    (``tax_utils.py:1019-1085`` format_for_krona/write_krona): header
    (fraction, rank names...), then one row per lineage at ``rank``
    sorted by fraction desc, lineage split into per-rank columns.
    Fractions are of total customer count (the f_weighted analogue)."""
    rows = [r for r in tax_rollup_customers(sf_dir).take_all()
            if r["lineage_rank"] == rank]
    total = sum(r["n_customers"] for r in rows) or 1
    rows.sort(key=lambda r: (-r["n_customers"], r["lineage"]))
    header = ("fraction", "region", "nation")[: rank + 2]
    out = [(r["n_customers"] / total, *r["lineage"].split(";"))
           for r in rows]
    return header, out


def write_krona(sf_dir: str, out_path: str, rank: int = 1, sep: str = "\t"):
    """``write_krona`` (``tax_utils.py:1075-1085``): TSV with header."""
    import csv

    header, rows = krona_rows(sf_dir, rank)
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f, delimiter=sep)
        w.writerow(header)
        w.writerows(rows)
    return out_path


def grouped_topk_orders(sf_dir: str, k: int = 3):
    """Per-key top-k: the 3 highest-price orders of every customer with
    rank (``row_number() OVER (PARTITION BY o_custkey ORDER BY
    o_totalprice DESC, o_orderkey)``) — the best-k-samples-per-group
    primitive of a training-data pipeline, shaped as a partial top-k
    combiner + key exchange (:func:`sourmash_ray.stages.agg.grouped_topk`;
    the analogue of the reference's per-query best-match retention,
    ``index/__init__.py:258-270``, applied per group)."""
    from ..stages.agg import grouped_topk

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return grouped_topk(ds, "o_custkey", "o_totalprice", k, "o_orderkey")


def revenue_by_nation(sf_dir: str):
    """TPC-H-Q5-style revenue rollup exercising the big-big distributed
    hash join (`stages/join.hash_join_exchange`): customer ⋈ orders on
    custkey, the result ⋈ lineitem on orderkey — both all-to-all
    exchanges that ship each projected row exactly once — then the tiny
    nation dim attaches by broadcast and `grouped_sums` rolls up. Revenue
    is integer 1e4-scale (`cents × (100 - discount_bp)`) so the sum is
    order-independent and hash-exact vs DuckDB."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey"])
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    co = hash_join_exchange(
        orders, cust, key="custkey",
        left_cols=["o_orderkey"], right_cols=["c_nationkey"],
        n_parts=n_parts, left_key="o_custkey", right_key="c_custkey")

    def _rev(batch: pa.Table) -> pa.Table:
        # block-local combine to one row per orderkey BEFORE the shuffle
        # (lineitem clusters by orderkey, so ~4:1 fewer rows exchanged);
        # n_li carries the pre-combined row count for the n_items total
        price = np.asarray(batch["l_extendedprice"], np.float64)
        disc = np.asarray(batch["l_discount"], np.float64)
        cents = np.rint(price * 100).astype(np.int64)
        bp = np.rint(disc * 100).astype(np.int64)
        rev = cents * (100 - bp)
        ok = np.asarray(batch["l_orderkey"], np.int64)
        uniq, inv = np.unique(ok, return_inverse=True)
        sums = np.bincount(inv, weights=rev.astype(np.float64),
                           minlength=len(uniq))
        # revenue_e4 ≤ ~1e9 per item × ~7 items: float64 exact (< 2^53)
        counts = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "l_orderkey": pa.array(uniq, pa.int64()),
            "revenue_e4": pa.array(sums.astype(np.int64), pa.int64()),
            "n_li": pa.array(counts.astype(np.int64), pa.int64()),
        })

    items = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(_rev, batch_format="pyarrow")
    col = hash_join_exchange(
        co, items, key="orderkey",
        left_cols=["c_nationkey"], right_cols=["revenue_e4", "n_li"],
        n_parts=n_parts, left_key="o_orderkey", right_key="l_orderkey")

    nation = {r["n_nationkey"]: r["n_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    names = np.empty(max(nation) + 1, dtype=object)
    for nk, name in nation.items():
        names[nk] = name
    names_ref = ray.put(names)

    def _name(batch: pa.Table) -> pa.Table:
        nm = ray.get(names_ref)
        nk = np.asarray(batch["c_nationkey"], np.int64)
        if nk.size and (nk.min() < 0 or nk.max() >= nm.size):
            raise ValueError("c_nationkey outside the nation dim")
        return pa.table({
            "n_name": pa.array(nm[nk], pa.string()),
            "revenue_e4": batch["revenue_e4"],
            "n_li": batch["n_li"],
        })

    agg = grouped_sums(col.map_batches(_name, batch_format="pyarrow"),
                       ["n_name"], ["revenue_e4", "n_li"])
    return agg.map_batches(
        lambda t: pa.table({"n_name": t["n_name"],
                            "sum_revenue_e4": t["sum_revenue_e4"],
                            "n_items": t["sum_n_li"]}),
        batch_format="pyarrow")


def _customers_vs_urgent(sf_dir: str, join_type: str):
    """Big-big semi/anti join on the exchange: customers that do (semi) /
    do not (anti) have a ``1-URGENT`` order. Unlike the picklist variants
    (broadcast set — right side must fit in memory), both sides here ship
    through the key exchange, so the shape survives a right side far
    larger than any worker's heap. The right side is projected to its key
    and block-locally deduplicated before the shuffle — a semi/anti join
    only needs distinct keys, so dup orders per customer never travel.
    Reference semantics: picklist include/exclude (``picklist.py:265-319``)
    at collection scale."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.join import hash_join_exchange

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"])

    def _urgent_keys(batch: pa.Table) -> pa.Table:
        pri = np.asarray(batch["o_orderpriority"]) == "1-URGENT"
        keys = np.unique(np.asarray(batch["o_custkey"], np.int64)[pri])
        return pa.table({"o_custkey": pa.array(keys, pa.int64())})

    urgent = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
    ).map_batches(_urgent_keys, batch_format="pyarrow")

    return hash_join_exchange(
        cust, urgent, key="custkey",
        left_cols=["c_name", "c_mktsegment"], right_cols=[],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        join_type=join_type, left_key="c_custkey", right_key="o_custkey")


def customers_with_urgent_orders(sf_dir: str):
    """Left-semi exchange join: customers holding ≥1 URGENT order."""
    return _customers_vs_urgent(sf_dir, "left semi")


def customers_no_urgent_orders(sf_dir: str):
    """Left-anti exchange join: customers with no URGENT order."""
    return _customers_vs_urgent(sf_dir, "left anti")


RUNNING_SCHEMA = pa.schema([
    ("o_custkey", pa.int64()), ("o_orderkey", pa.int64()),
    ("ts_us", pa.int64()), ("price_cents", pa.int64()),
    ("running_cents", pa.int64()), ("gap_us", pa.int64()),
])


def running_totals_partition(part: pa.Table) -> pa.Table:
    """Per-key ordered window kernel: running sum + lag gap for every
    customer in the partition in ONE lexsort — ``sum(...) OVER
    (PARTITION BY custkey ORDER BY date, orderkey ROWS UNBOUNDED
    PRECEDING)`` and ``ts - lag(ts) OVER w`` with SQL semantics
    (first-of-key gap is NULL). No per-group Python: run boundaries via
    diff, prefix sums rebased per run."""
    import numpy as np

    ck = np.asarray(part["o_custkey"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    ok = np.asarray(part["o_orderkey"], np.int64)
    cents = np.asarray(part["price_cents"], np.int64)
    order = np.lexsort((ok, ts, ck))
    ck_s, ts_s, ok_s, c_s = ck[order], ts[order], ok[order], cents[order]
    n = len(ck_s)
    if n == 0:
        return RUNNING_SCHEMA.empty_table()
    new_run = np.r_[True, ck_s[1:] != ck_s[:-1]]
    starts = np.flatnonzero(new_run)
    lens = np.diff(np.append(starts, n))
    cs = np.cumsum(c_s)
    base = np.repeat(cs[starts] - c_s[starts], lens)
    running = cs - base
    prev_ts = np.empty(n, np.int64)
    prev_ts[1:] = ts_s[:-1]
    prev_ts[0] = 0
    gap = ts_s - prev_ts
    return pa.table({
        "o_custkey": pa.array(ck_s, pa.int64()),
        "o_orderkey": pa.array(ok_s, pa.int64()),
        "ts_us": pa.array(ts_s, pa.int64()),
        "price_cents": pa.array(c_s, pa.int64()),
        "running_cents": pa.array(running, pa.int64()),
        "gap_us": pa.array(np.where(new_run, 0, gap), pa.int64(),
                           mask=new_run),
    }).cast(RUNNING_SCHEMA)


def running_order_totals(sf_dir: str):
    """Ordered window functions per key — running revenue total and
    inter-order gap per customer (``sum() OVER`` / ``lag() OVER``): one
    custkey-hash exchange co-locates each customer's history, then one
    vectorized lexsort+prefix-sum pass per partition. Partitioning
    assumption: one key's history fits a partition (the sessionize
    contract). Money is integer cents so the prefix sums are
    order-exact vs DuckDB."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        price = np.asarray(batch["o_totalprice"], np.float64)
        ts = batch["o_orderdate"].combine_chunks().cast(
            pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "o_custkey": batch["o_custkey"].combine_chunks()
                .cast(pa.int64()),
            "o_orderkey": batch["o_orderkey"].combine_chunks()
                .cast(pa.int64()),
            "ts_us": ts,
            "price_cents": pa.array(
                np.rint(price * 100).astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    ).map_batches(_prep, batch_format="pyarrow")
    return exchange_map_groups(
        ds, "o_custkey", resolve_num_partitions(DEFAULT_CONFIG),
        running_totals_partition, RUNNING_SCHEMA)


def top_building_orders(sf_dir: str, segment: str = "BUILDING",
                        cutoff: str = "1998-06-01", k: int = 10):
    """TPC-H-Q3-style shipping-priority query — the full composition
    test of the join family: segment-filtered customers SEMI-join
    date-filtered orders (big-big, keys only ship), shipdate-filtered
    lineitem revenue pre-combines per orderkey inside each block, one
    more exchange joins revenue to orders, `grouped_sums` finishes the
    per-order rollup, and the global top-k runs block-truncated (the
    `topk_orders` shape — candidates sort, never the dataset). Revenue
    is integer 1e4-scale per row so the sum is order-independent and
    hash-exact vs DuckDB."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    cut_us = int(np.datetime64(cutoff, "us").astype(np.int64))

    def _cust(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["c_mktsegment"], segment))
        return t.select(["c_custkey"])

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"],
    ).map_batches(_cust, batch_format="pyarrow")

    def _orders(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["o_orderdate"], pa.int64())
        t = pa.table({"o_orderkey": batch["o_orderkey"],
                      "o_custkey": batch["o_custkey"],
                      "o_date_us": d})
        return t.filter(pc.less(t["o_date_us"], cut_us))

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(_orders, batch_format="pyarrow")

    qualified = hash_join_exchange(
        orders, cust, key="custkey",
        left_cols=["o_orderkey", "o_date_us"], right_cols=[],
        n_parts=n_parts, left_key="o_custkey", right_key="c_custkey",
        join_type="left semi")

    def _rev(batch: pa.Table) -> pa.Table:
        ship = pc.cast(batch["l_shipdate"], pa.int64())
        t = batch.filter(pc.greater(ship, cut_us))
        price = np.asarray(t["l_extendedprice"], np.float64)
        disc = np.asarray(t["l_discount"], np.float64)
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        ok = np.asarray(t["l_orderkey"], np.int64)
        uniq, inv = np.unique(ok, return_inverse=True)
        sums = np.bincount(inv, weights=rev.astype(np.float64),
                           minlength=len(uniq))
        return pa.table({
            "l_orderkey": pa.array(uniq, pa.int64()),
            "revenue_e4": pa.array(sums.astype(np.int64), pa.int64()),
        })

    items = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(_rev, batch_format="pyarrow")

    joined = hash_join_exchange(
        qualified, items, key="orderkey",
        left_cols=["o_date_us"], right_cols=["revenue_e4"],
        n_parts=n_parts, left_key="o_orderkey", right_key="l_orderkey")

    # the exchange join names its key column `orderkey`; restore the
    # TPC-H spelling for the output/oracle schema
    agg = grouped_sums(joined, ["orderkey", "o_date_us"],
                       ["revenue_e4"], n_parts=n_parts).map_batches(
        lambda t: t.rename_columns(
            ["o_orderkey", "o_date_us", "sum_revenue_e4"]),
        batch_format="pyarrow")

    def _block_topk(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n <= k:
            return batch
        rev = np.asarray(batch["sum_revenue_e4"], np.int64)
        okey = np.asarray(batch["o_orderkey"], np.int64)
        idx = np.lexsort((okey, -rev))[:k]
        return batch.take(pa.array(np.sort(idx), pa.int64()))

    return (agg.map_batches(_block_topk, batch_format="pyarrow")
            .sort(["sum_revenue_e4", "o_orderkey"],
                  descending=[True, False]).limit(k))


def order_count_histogram(sf_dir: str):
    """Count-of-counts re-aggregation (orders-per-customer histogram):
    two chained `grouped_sums` exchanges — the fact table reduces to one
    row per customer in the first partial pass, and only per-block
    partials ever shuffle in either stage."""
    from ..stages.agg import grouped_sums

    per_cust = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey"]),
        ["o_custkey"], [], count_as="n_orders")
    hist = grouped_sums(per_cust, ["n_orders"], [],
                        count_as="n_customers")
    return hist


def order_priority_counts(sf_dir: str, ship_after: str = "2000-01-01"):
    """TPC-H Q4 shape: per order priority, how many orders have ≥1
    lineitem shipped after ``ship_after`` — EXISTS-subquery semantics as
    a big-big left-semi exchange join. The lineitem side filters at the
    scan and block-locally dedups to distinct orderkeys (a semi join
    only needs distinct keys), the surviving orders roll up through
    `grouped_sums`; fact rows never shuffle twice."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    cutoff = np.datetime64(ship_after).astype("datetime64[us]").astype(
        np.int64)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])

    def _shipped_keys(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch["l_shipdate"], pa.int64())
        late = np.asarray(ts, np.int64) > cutoff
        keys = np.unique(np.asarray(batch["l_orderkey"], np.int64)[late])
        return pa.table({"l_orderkey": pa.array(keys, pa.int64())})

    shipped = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"],
    ).map_batches(_shipped_keys, batch_format="pyarrow")

    hit = hash_join_exchange(
        orders, shipped, key="orderkey",
        left_cols=["o_orderpriority"], right_cols=[],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        join_type="left semi", left_key="o_orderkey",
        right_key="l_orderkey")
    return grouped_sums(hit, ["o_orderpriority"], [], count_as="n_orders")


def brand_revenue(sf_dir: str):
    """Star join: discounted revenue per part brand (Q19 shape without
    the predicate soup). The part table is the DIMENSION side — small
    relative to the fact table at any scale — so this rides
    `broadcast_join` (build table ``ray.put`` once, per-batch pyarrow
    join in-task, zero shuffle, zero skew sensitivity); lineitem rows
    pre-combine per (partkey) per block before even the broadcast probe
    so the join input is already collapsed. One tiny `grouped_sums` on
    brand finishes."""
    import numpy as np

    from ..stages.agg import grouped_sums
    from ..stages.join import broadcast_join

    def _rev(batch: pa.Table) -> pa.Table:
        price = np.asarray(batch["l_extendedprice"], np.float64)
        disc = np.asarray(batch["l_discount"], np.float64)
        rev = np.rint(price * 100).astype(np.int64) \
            * (100 - np.rint(disc * 100).astype(np.int64))
        pk = np.asarray(batch["l_partkey"], np.int64)
        uniq, inv = np.unique(pk, return_inverse=True)
        # per-item revenue_e4 ≤ ~1e9 × ~7 items/part/block: exact float64
        sums = np.bincount(inv, weights=rev.astype(np.float64),
                           minlength=len(uniq))
        counts = np.bincount(inv, minlength=len(uniq))
        return pa.table({
            "l_partkey": pa.array(uniq, pa.int64()),
            "revenue_e4": pa.array(sums.astype(np.int64), pa.int64()),
            "n_li": pa.array(counts.astype(np.int64), pa.int64()),
        })

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(_rev, batch_format="pyarrow")

    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_brand"])
    part_tbl = pa.concat_tables(ray.get(part.to_arrow_refs()))
    joined = broadcast_join(
        li, part_tbl, key="partkey",
        left_cols=["revenue_e4", "n_li"], right_cols=["p_brand"],
        left_key="l_partkey", right_key="p_partkey")
    agg = grouped_sums(joined, ["p_brand"], ["revenue_e4", "n_li"])
    return agg.map_batches(
        lambda t: pa.table({"p_brand": t["p_brand"],
                            "sum_revenue_e4": t["sum_revenue_e4"],
                            "n_items": t["sum_n_li"]}),
        batch_format="pyarrow")


MONTHLY_SCHEMA = pa.schema([
    ("month", pa.timestamp("us")),
    ("n_orders", pa.int64()),
    ("sum_cents", pa.int64()),
    ("prev_cents", pa.int64()),
    ("delta_cents", pa.int64()),
])


def monthly_order_stats(sf_dir: str):
    """Month-over-month order totals with lag/delta — the time-series
    reporting shape (`lag(sum) OVER (ORDER BY month)`). The heavy part
    is one `grouped_sums` exchange over (month) keys; the lag pass runs
    on the ≤ dozens-of-rows aggregate repartitioned to one block (a
    global ordered window over an already-aggregated series is
    driver-scale by construction)."""
    import numpy as np

    from ..stages.agg import grouped_sums

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"])

    def _month(batch: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.floor_temporal(batch["o_orderdate"],
                                       unit="month"),
            "cents": pc.cast(
                pc.round(pc.multiply(batch["o_totalprice"],
                                     pa.scalar(1e2))), pa.int64()),
        })

    agg = grouped_sums(ds.map_batches(_month, batch_format="pyarrow"),
                       ["month"], ["cents"], count_as="n_orders")

    def _lag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return MONTHLY_SCHEMA.empty_table()
        m = np.asarray(pc.cast(t["month"], pa.int64()), np.int64)
        order = np.argsort(m, kind="stable")
        cents = np.asarray(t["sum_cents"], np.int64)[order]
        n = np.asarray(t["n_orders"], np.int64)[order]
        prev = np.r_[0, cents[:-1]]
        first = np.zeros(len(cents), bool)
        first[0] = True
        return pa.table({
            "month": t["month"].take(pa.array(order, pa.int64())),
            "n_orders": pa.array(n, pa.int64()),
            "sum_cents": pa.array(cents, pa.int64()),
            "prev_cents": pa.array(prev, pa.int64(), mask=first),
            "delta_cents": pa.array(cents - prev, pa.int64()),
        }).cast(MONTHLY_SCHEMA)

    return agg.repartition(1).map_batches(_lag, batch_format="pyarrow",
                                          batch_size=None)


def above_avg_orders(sf_dir: str):
    """Correlated-aggregate filter: orders strictly above their own
    customer's average order value (`WHERE price > (SELECT avg(...)
    ... same custkey)`). The per-customer aggregate (sum_cents, n) is
    ONE `grouped_sums` exchange; the comparison joins it back to the
    fact rows through the big-big exchange join and evaluates
    ``price_cents · n > sum_cents`` — integer cross-multiplication, so
    'above average' needs no division and is exact on both engines."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    def _cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "price_cents": pc.cast(
                pc.round(pc.multiply(batch["o_totalprice"],
                                     pa.scalar(1e2))), pa.int64()),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(_cents, batch_format="pyarrow")

    agg = grouped_sums(orders, ["o_custkey"], ["price_cents"],
                       count_as="n_orders")
    joined = hash_join_exchange(
        orders, agg, key="o_custkey",
        left_cols=["o_orderkey", "price_cents"],
        right_cols=["sum_price_cents", "n_orders"],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG))

    def _above(t: pa.Table) -> pa.Table:
        p = np.asarray(t["price_cents"], np.int64)
        s = np.asarray(t["sum_price_cents"], np.int64)
        n = np.asarray(t["n_orders"], np.int64)
        keep = p * n > s           # cents·count < 2^53: exact, no divide
        out = t.filter(pa.array(keep))
        return pa.table({
            "o_orderkey": out["o_orderkey"],
            "o_custkey": out["o_custkey"],
            "price_cents": out["price_cents"],
        })

    return joined.map_batches(_above, batch_format="pyarrow")


MOVING_SCHEMA = pa.schema([
    ("o_custkey", pa.int64()), ("o_orderkey", pa.int64()),
    ("ts_us", pa.int64()), ("price_cents", pa.int64()),
    ("moving3_cents", pa.int64()),
])


def moving_totals_partition(part: pa.Table, k: int = 3) -> pa.Table:
    """ROWS-frame window kernel: per customer ordered by (date,
    orderkey), the sum of the last ``k`` orders including the current —
    ``sum(price) OVER (PARTITION BY custkey ORDER BY date, key ROWS
    BETWEEN k-1 PRECEDING AND CURRENT ROW)``. One lexsort, one prefix
    sum, one shifted difference clipped at each run start (no per-key
    Python) — the ROWS sibling of the RANGE-frame
    `rolling_merge_partition`."""
    import numpy as np

    if part.num_rows == 0:
        return MOVING_SCHEMA.empty_table()
    ck = np.asarray(part["o_custkey"], np.int64)
    ts = np.asarray(part["ts_us"], np.int64)
    ok = np.asarray(part["o_orderkey"], np.int64)
    cents = np.asarray(part["price_cents"], np.int64)
    order = np.lexsort((ok, ts, ck))
    ck_s, c_s = ck[order], cents[order]
    n = len(ck_s)
    csum = np.concatenate([[0], np.cumsum(c_s)])
    starts = np.flatnonzero(np.r_[True, ck_s[1:] != ck_s[:-1]])
    lens = np.diff(np.append(starts, n))
    within = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
    lo = np.arange(n, dtype=np.int64) - np.minimum(within, k - 1)
    moving = csum[np.arange(1, n + 1)] - csum[lo]
    return pa.table({
        "o_custkey": pa.array(ck_s, pa.int64()),
        "o_orderkey": pa.array(ok[order], pa.int64()),
        "ts_us": pa.array(ts[order], pa.int64()),
        "price_cents": pa.array(c_s, pa.int64()),
        "moving3_cents": pa.array(moving, pa.int64()),
    })


def moving_order_totals(sf_dir: str, k: int = 3):
    """ROWS-frame moving window per key (last-k-orders revenue per
    customer) — completes the window-frame family (running = unbounded,
    rolling = time RANGE, this = ROWS). Same one-exchange contract as
    `running_order_totals`."""
    import functools as _ft

    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    def _prep(batch: pa.Table) -> pa.Table:
        price = np.asarray(batch["o_totalprice"], np.float64)
        ts = batch["o_orderdate"].combine_chunks().cast(
            pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "o_orderkey": batch["o_orderkey"],
            "ts_us": ts,
            "price_cents": pa.array(
                np.rint(price * 100).astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"],
    ).map_batches(_prep, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    return exchange_map_groups(
        ds, "o_custkey", n_parts,
        _ft.partial(moving_totals_partition, k=k), MOVING_SCHEMA)


def customer_order_span(sf_dir: str):
    """Grouped MIN/MAX: each customer's first and last order date + order
    count (`grouped_minmax` — min-of-block-minima / max-of-block-maxima
    partials through the exchange, the remaining core aggregate family
    beyond sums/counts/quantiles/topk)."""
    from ..stages.agg import grouped_minmax

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "date_us": pc.cast(batch["o_orderdate"], pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate"],
    ).map_batches(_prep, batch_format="pyarrow")
    return grouped_minmax(ds, ["o_custkey"], "date_us",
                          count_as="n_orders")


def first_order_per_customer(sf_dir: str):
    """Argmin ROW fetch: each customer's FIRST order (whole row, not
    just the min date — the `row_number() = 1` fetch that
    `customer_order_span`'s min/max cannot give). Rides `grouped_topk`
    with the order key negated (topk is DESC-ordered), deterministic
    orderkey tiebreak; ≤1 candidate row per customer per block ever
    shuffles."""
    import numpy as np

    from ..stages.agg import grouped_topk

    def _prep(batch: pa.Table) -> pa.Table:
        date_us = pc.cast(batch["o_orderdate"], pa.int64())
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "o_orderkey": batch["o_orderkey"],
            "date_us": date_us,
            "neg_date_us": pc.negate_checked(date_us),
            "price_cents": pc.cast(
                pc.round(pc.multiply(batch["o_totalprice"],
                                     pa.scalar(1e2))), pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate",
                 "o_totalprice"],
    ).map_batches(_prep, batch_format="pyarrow")
    top = grouped_topk(ds, key="o_custkey", order_col="neg_date_us",
                       k=1, tiebreak="o_orderkey")
    return top.select_columns(
        ["o_custkey", "o_orderkey", "date_us", "price_cents"])


def forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — the pure filter + global aggregate: shipped in
    1996, discount in [5%, 7%], quantity < 24; revenue = Σ price·discount
    as an exact integer (cents × basis points = 1e-4 dollars).

    The cheapest possible distributed plan: a 4-column pruned scan,
    in-kernel predicate, ONE partial row per block through a
    constant-key combine — at 100 TB this moves n_blocks rows, total.
    """
    import numpy as np

    from ..stages.agg import grouped_sums

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    def _partial(batch: pa.Table) -> pa.Table:
        ship = np.asarray(batch["l_shipdate"], "datetime64[us]")
        disc = np.asarray(batch["l_discount"], np.float64)
        qty = np.asarray(batch["l_quantity"], np.float64)
        price = np.asarray(batch["l_extendedprice"], np.float64)
        keep = ((ship >= lo) & (ship < hi)
                & (disc >= 0.05) & (disc <= 0.07) & (qty < 24))
        rev = (np.rint(price[keep] * 100).astype(np.int64)
               * np.rint(disc[keep] * 100).astype(np.int64))
        return pa.table({
            "one": pa.array([0], pa.int64()),
            "rev_e4": pa.array([int(rev.sum())], pa.int64()),
            "n": pa.array([int(keep.sum())], pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"]).map_batches(
        _partial, batch_format="pyarrow")
    out = grouped_sums(ds, ["one"], ["rev_e4", "n"])
    return out.map_batches(
        lambda t: pa.table({"revenue_e4": t["sum_rev_e4"],
                            "n_items": t["sum_n"]}),
        batch_format="pyarrow")


def linestatus_priority_counts(sf_dir: str):
    """TPC-H Q12 shape — big-big join + conditional aggregation: per
    lineitem linestatus, how many items belong to high-priority orders
    (1-URGENT / 2-HIGH) vs the rest.

    The lineitem side pre-aggregates to (orderkey, linestatus, n) inside
    the map (block-local combine — multi-line orders collapse before the
    wire), then one key exchange joins it against the orders projection
    and two conditional partial sums ride :func:`grouped_sums`.
    """
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    def _line_partial(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"], np.int64)
        st = np.asarray(
            pc.fill_null(pc.index_in(
                batch["l_linestatus"],
                value_set=pa.array(["F", "O"])), -1), np.int64)
        if len(st) and st.min() < 0:
            # a status outside {F, O} would collide in the composite
            # key (ok*2 - 1 == (ok-1)*2 + 1) and wrap statuses[-1]
            raise ValueError(
                "unknown l_linestatus value (expected F or O)")
        key = ok * 2 + st
        order = np.argsort(key, kind="stable")
        k_s = key[order]
        first = np.r_[True, k_s[1:] != k_s[:-1]]
        cnt = np.diff(np.r_[np.flatnonzero(first), len(k_s)])
        u = k_s[first]
        return pa.table({
            "l_orderkey": pa.array(u // 2, pa.int64()),
            "status_idx": pa.array(u % 2, pa.int64()),
            "n": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus"]).map_batches(
        _line_partial, batch_format="pyarrow")

    def _ord_prep(batch: pa.Table) -> pa.Table:
        hi = pc.is_in(batch["o_orderpriority"],
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "is_high": pc.cast(hi, pa.int64()),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"]).map_batches(
        _ord_prep, batch_format="pyarrow")

    joined = hash_join_exchange(
        lines, orders, key="okey", left_cols=["status_idx", "n"],
        right_cols=["is_high"],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        left_key="l_orderkey", right_key="o_orderkey")

    statuses = np.array(["F", "O"])

    def _cond(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], np.int64)
        hi = np.asarray(batch["is_high"], np.int64)
        si = np.asarray(batch["status_idx"], np.int64)
        return pa.table({
            "l_linestatus": pa.array(statuses[si], pa.string()),
            "hi_n": pa.array(n * hi, pa.int64()),
            "lo_n": pa.array(n * (1 - hi), pa.int64()),
        })

    out = grouped_sums(joined.map_batches(_cond, batch_format="pyarrow"),
                       ["l_linestatus"], ["hi_n", "lo_n"])
    return out.map_batches(
        lambda t: pa.table({"l_linestatus": t["l_linestatus"],
                            "high_line_count": t["sum_hi_n"],
                            "low_line_count": t["sum_lo_n"]}),
        batch_format="pyarrow")


def promo_revenue_monthly(sf_dir: str,
                          broadcast_budget: int = 2_000_000):
    """TPC-H Q14 shape — star join + conditional aggregation: per ship
    month, PROMO-part revenue vs total revenue (both exact integers at
    1e-4 dollars; the ratio is the reader's one division).

    Within ``broadcast_budget`` part rows (parquet metadata count — no
    scan) the part dimension broadcasts once as two sorted numpy arrays
    (partkey, is-promo) and lineitem streams through one vectorized
    searchsorted pass — zero shuffle. Beyond it (Q14 at TPC-H sf1000
    has 200M parts) the op routes through the big-big key exchange:
    lineitem pre-reduces to (partkey, month, rev) cells per block,
    joins part's (partkey, is_promo) projection on the exchange, and
    only (month, 2 sums) cells reach the final combine. Both branches
    are equality-tested (``tests/test_join.py`` pattern)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..stages.agg import grouped_sums

    def _rev_month(batch: pa.Table):
        price = np.asarray(batch["l_extendedprice"], np.float64)
        disc = np.asarray(batch["l_discount"], np.float64)
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        ship = np.asarray(batch["l_shipdate"], "datetime64[us]")
        month = ship.astype("datetime64[M]").astype("datetime64[us]") \
            .astype(np.int64)
        return rev, month

    line_cols = ["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"]
    n_parts_dim = pq.read_metadata(f"{sf_dir}/part.parquet").num_rows

    if n_parts_dim <= broadcast_budget:
        part = read_parquet_clean(f"{sf_dir}/part.parquet",
                                  columns=["p_partkey", "p_type"])
        rows = part.take_all()
        pk = np.fromiter((r["p_partkey"] for r in rows), np.int64,
                         len(rows))
        promo = np.fromiter((r["p_type"] == "PROMO" for r in rows),
                            bool, len(rows))
        order = np.argsort(pk)
        lookup_ref = ray.put((pk[order], promo[order]))

        def _partial(batch: pa.Table) -> pa.Table:
            pk_s, promo_s = ray.get(lookup_ref)
            lpk = np.asarray(batch["l_partkey"], np.int64)
            rev, month = _rev_month(batch)
            if len(pk_s) == 0:
                # empty dimension: inner join produces no rows
                matched = np.zeros(len(lpk), bool)
                is_promo = matched
            else:
                pos = np.minimum(np.searchsorted(pk_s, lpk),
                                 len(pk_s) - 1)
                matched = pk_s[pos] == lpk
                is_promo = matched & promo_s[pos]
            # inner-join semantics: lineitems whose partkey is absent
            # from part are DROPPED (matches the exchange branch and
            # the SQL oracle), not counted in total revenue
            return pa.table({
                "ship_month": pa.array(month[matched], pa.int64()),
                "promo_rev_e4": pa.array(
                    rev[matched] * is_promo[matched], pa.int64()),
                "total_rev_e4": pa.array(rev[matched], pa.int64()),
            })

        ds = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=line_cols).map_batches(_partial,
                                           batch_format="pyarrow")
        out = grouped_sums(ds, ["ship_month"],
                           ["promo_rev_e4", "total_rev_e4"])
    else:
        from ..config import DEFAULT_CONFIG, resolve_num_partitions
        from ..stages.join import hash_join_exchange

        def _line_cells(batch: pa.Table) -> pa.Table:
            rev, month = _rev_month(batch)
            # small month ORDINAL for the composite cell key (epoch-us
            # values modulo anything can collide two months)
            mo = np.asarray(batch["l_shipdate"], "datetime64[us]") \
                .astype("datetime64[M]").astype(np.int64)
            if len(mo) and (mo.min() < 0 or mo.max() >= (1 << 20)):
                raise ValueError("ship month ordinal out of key range")
            lpk = np.asarray(batch["l_partkey"], np.int64)
            if len(lpk) and lpk.max() >= (1 << 43):
                raise ValueError("partkey overflows the composite key")
            key = lpk * np.int64(1 << 20) + mo
            order = np.argsort(key, kind="stable")
            k_s = key[order]
            first = np.r_[True, k_s[1:] != k_s[:-1]] if len(k_s) else \
                np.empty(0, bool)
            starts = np.flatnonzero(first)
            sums = np.add.reduceat(rev[order], starts) if starts.size \
                else np.empty(0, np.int64)
            return pa.table({
                "l_partkey": pa.array(lpk[order][first], pa.int64()),
                "ship_month": pa.array(month[order][first], pa.int64()),
                "rev": pa.array(sums.astype(np.int64), pa.int64()),
            })

        lines = read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=line_cols).map_batches(_line_cells,
                                           batch_format="pyarrow")

        def _dim(batch: pa.Table) -> pa.Table:
            promo = np.asarray(batch["p_type"]) == "PROMO"
            return pa.table({
                "p_partkey": batch["p_partkey"],
                "is_promo": pa.array(promo.astype(np.int64), pa.int64()),
            })

        dim = read_parquet_clean(f"{sf_dir}/part.parquet",
                                 columns=["p_partkey", "p_type"]
                                 ).map_batches(_dim,
                                               batch_format="pyarrow")
        joined = hash_join_exchange(
            lines, dim, key="pkey", left_cols=["ship_month", "rev"],
            right_cols=["is_promo"],
            n_parts=resolve_num_partitions(DEFAULT_CONFIG),
            left_key="l_partkey", right_key="p_partkey")

        def _cells(batch: pa.Table) -> pa.Table:
            rev = np.asarray(batch["rev"], np.int64)
            promo = np.asarray(batch["is_promo"], np.int64)
            return pa.table({
                "ship_month": batch["ship_month"],
                "promo_rev_e4": pa.array(rev * promo, pa.int64()),
                "total_rev_e4": pa.array(rev, pa.int64()),
            })

        out = grouped_sums(
            joined.map_batches(_cells, batch_format="pyarrow"),
            ["ship_month"], ["promo_rev_e4", "total_rev_e4"])
    return out.map_batches(
        lambda t: pa.table({
            "ship_month": pc.cast(t["ship_month"],
                                  pa.timestamp("us")),
            "promo_rev_e4": t["sum_promo_rev_e4"],
            "total_rev_e4": t["sum_total_rev_e4"]}),
        batch_format="pyarrow")


def top_supplier_revenue(sf_dir: str, k: int = 10):
    """TPC-H Q15 shape — per-supplier revenue leaderboard: exact-integer
    revenue per l_suppkey through the partial-sum exchange, per-block
    top-k truncation, global sort over ≤ k×blocks candidates, supplier
    names attached from the broadcast dimension. The fact table never
    sorts; only (suppkey, sum) cells and then ≤ k×blocks candidates
    move."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _rev(batch: pa.Table) -> pa.Table:
        price = np.asarray(batch["l_extendedprice"], np.float64)
        disc = np.asarray(batch["l_discount"], np.float64)
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        return pa.table({
            "l_suppkey": batch["l_suppkey"],
            "rev": pa.array(rev, pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(_rev, batch_format="pyarrow")
    sums = grouped_sums(ds, ["l_suppkey"], ["rev"])

    def _block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows > k:
            rev = np.asarray(batch["sum_rev"], np.int64)
            key = np.asarray(batch["l_suppkey"], np.int64)
            idx = np.sort(np.lexsort((key, -rev))[:k])
            batch = batch.take(pa.array(idx, pa.int64()))
        return batch

    top = (sums.map_batches(_block_topk, batch_format="pyarrow")
           .sort(["sum_rev", "l_suppkey"], descending=[True, False])
           .limit(k).take_all())
    # only the ≤ k winners' names leave the supplier dimension — the
    # dimension itself never materializes on the driver (it can be 10M
    # rows at TPC-H sf1000)
    keys = pa.array([r["l_suppkey"] for r in top], pa.int64())
    revs = {r["l_suppkey"]: r["sum_rev"] for r in top}

    def _names(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["s_suppkey"], value_set=keys))
        return pa.table({
            "s_suppkey": hit["s_suppkey"],
            "s_name": hit["s_name"],
            "revenue_e4": pa.array(
                [revs[c] for c in hit["s_suppkey"].to_pylist()],
                pa.int64()),
        })

    return read_parquet_clean(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name"]).map_batches(
        _names, batch_format="pyarrow")


def returned_item_revenue(sf_dir: str, k: int = 20):
    """TPC-H Q10 shape — the two-join revenue leaderboard: revenue of
    RETURNED lineitems rolled up to the ordering customer, top-k
    customers with names attached.

    Plan: lineitem pre-combines (orderkey, returned-revenue) per block
    inside the map (the Q5 pre-aggregate rule), ONE key exchange joins
    it to the orders projection, partial sums ride the custkey exchange,
    per-block top-k truncation bounds the final sort to ≤ k×blocks
    candidates, and only the ≤ k winners' names are fetched from the
    customer table (is_in filter — the dimension never shuffles and the
    fact rows never carry strings)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    def _line_partial(batch: pa.Table) -> pa.Table:
        flag = np.asarray(batch["l_returnflag"]) == "R"
        ok = np.asarray(batch["l_orderkey"], np.int64)[flag]
        price = np.asarray(batch["l_extendedprice"], np.float64)[flag]
        disc = np.asarray(batch["l_discount"], np.float64)[flag]
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        order = np.argsort(ok, kind="stable")
        ok_s, rev_s = ok[order], rev[order]
        first = np.r_[True, ok_s[1:] != ok_s[:-1]] if len(ok_s) else \
            np.empty(0, bool)
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(rev_s, starts) if starts.size else \
            np.empty(0, np.int64)
        return pa.table({
            "l_orderkey": pa.array(ok_s[first], pa.int64()),
            "rev": pa.array(sums.astype(np.int64), pa.int64()),
        })

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"]).map_batches(_line_partial,
                                            batch_format="pyarrow")
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
    joined = hash_join_exchange(
        lines, orders, key="okey", left_cols=["rev"],
        right_cols=["o_custkey"],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        left_key="l_orderkey", right_key="o_orderkey")
    by_cust = grouped_sums(joined, ["o_custkey"], ["rev"])

    def _block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= k:
            return batch
        rev = np.asarray(batch["sum_rev"], np.int64)
        key = np.asarray(batch["o_custkey"], np.int64)
        idx = np.sort(np.lexsort((key, -rev))[:k])
        return batch.take(pa.array(idx, pa.int64()))

    top = (by_cust.map_batches(_block_topk, batch_format="pyarrow")
           .sort(["sum_rev", "o_custkey"], descending=[True, False])
           .limit(k).take_all())
    keys = pa.array([r["o_custkey"] for r in top], pa.int64())
    revs = {r["o_custkey"]: r["sum_rev"] for r in top}

    def _names(batch: pa.Table) -> pa.Table:
        hit = batch.filter(pc.is_in(batch["c_custkey"], value_set=keys))
        ck = hit["c_custkey"].to_pylist()
        return pa.table({
            "c_custkey": hit["c_custkey"],
            "c_name": hit["c_name"],
            "revenue_e4": pa.array([revs[c] for c in ck], pa.int64()),
        })

    return read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"]).map_batches(
        _names, batch_format="pyarrow")


def daily_activity_reconciliation(sf_dir: str):
    """Cross-stream reconciliation — daily order counts FULL OUTER JOIN
    daily event counts on the calendar day: days present in either
    stream survive, the missing side stays NULL (the data-quality diff
    two ingest pipelines run against each other). Both sides reduce to
    day-grain cells first (constant-size), then the full-outer key
    exchange joins them — the only driver query exercising
    ``hash_join_exchange``'s full-outer path."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    day_us = 86_400_000_000

    def _order_day(batch: pa.Table) -> pa.Table:
        d = np.asarray(pc.cast(batch["o_orderdate"], pa.int64()))
        return pa.table({"oday": pa.array((d // day_us) * day_us,
                                          pa.int64())})

    def _event_day(batch: pa.Table) -> pa.Table:
        d = np.asarray(pc.cast(batch["ts"], pa.int64()))
        return pa.table({"eday": pa.array((d // day_us) * day_us,
                                          pa.int64())})

    orders = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderdate"]).map_batches(
            _order_day, batch_format="pyarrow"),
        ["oday"], [], count_as="n_orders")
    events = grouped_sums(
        read_parquet_clean(f"{sf_dir}/events.parquet",
                           columns=["ts"]).map_batches(
            _event_day, batch_format="pyarrow"),
        ["eday"], [], count_as="n_events")

    joined = hash_join_exchange(
        orders, events, key="day", left_cols=["n_orders"],
        right_cols=["n_events"],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        join_type="full outer", left_key="oday", right_key="eday")
    return joined.map_batches(
        lambda t: pa.table({
            "day": pc.cast(t["day"], pa.timestamp("us")),
            "n_orders": t["n_orders"],
            "n_events": t["n_events"]}),
        batch_format="pyarrow")


def _customer_lineage_arrays(sf_dir: str):
    """Broadcast lookup arrays for the customer lineage
    region → nation (+ segment appended per row): dense object arrays
    indexed by nationkey, the `tax_rollup_customers` pattern."""
    nation = {r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    region = {r["r_regionkey"]: r["r_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/region.parquet").take_all()}
    import numpy as np

    max_nk = max(nation) if nation else -1
    region_by_nk = np.empty(max_nk + 1, dtype=object)
    nation_by_nk = np.empty(max_nk + 1, dtype=object)
    for nk, (name, rk) in nation.items():
        region_by_nk[nk] = region[rk]
        nation_by_nk[nk] = name
    hole = np.array([v is None for v in nation_by_nk], bool)
    return region_by_nk, nation_by_nk, hole


def tax_summarize_customers(sf_dir: str):
    """``tax summarize`` over the customer lineage spreadsheet
    (reference ``tax/__main__.py summarize():617-684`` ``-o`` output):
    each customer carries the 3-rank lineage region;nation;mktsegment;
    the operator counts every lineage PREFIX and emits
    (rank, lineage, lineage_count) rows — the detailed lineage-count CSV.

    Scale shape: dims broadcast, ×3 explode inside map_batches, then the
    block-local combiner + coarse exchange of :func:`grouped_sums` —
    only (rank, lineage) partials shuffle (cardinality is bounded by the
    lineage tree, not the fact table)."""
    import numpy as np

    from ..stages.agg import grouped_sums

    lin_ref = ray.put(_customer_lineage_arrays(sf_dir))
    rank_names = np.array(["region", "nation", "segment"])

    def _explode(batch: pa.Table) -> pa.Table:
        region_a, nation_a, hole_a = ray.get(lin_ref)
        nk = np.asarray(batch["c_nationkey"], dtype=np.int64)
        if nk.size and (nk.min() < 0 or nk.max() >= nation_a.size
                        or hole_a[nk].any()):
            raise ValueError("c_nationkey outside the nation dim")
        seg = np.asarray(batch["c_mktsegment"], dtype=object)
        r = region_a[nk]
        rn = r + ";" + nation_a[nk]
        rns = rn + ";" + seg
        n = batch.num_rows
        return pa.table({
            "rank": pa.array(np.repeat(rank_names, n), pa.string()),
            "lineage": pa.array(np.concatenate([r, rn, rns]),
                                pa.string()),
        })

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_nationkey", "c_mktsegment"])
    out = grouped_sums(cust.map_batches(_explode, batch_format="pyarrow"),
                       ["rank", "lineage"], [],
                       count_as="lineage_count")
    return out.map_batches(
        lambda t: t.select(["rank", "lineage_count", "lineage"]),
        batch_format="pyarrow")


def tax_grep_customers(sf_dir: str, pattern: str = "_1[0-9]$",
                       rank: str = "nation", invert: bool = False):
    """``tax grep`` over the customer lineage spreadsheet (reference
    ``tax/__main__.py grep():561-614``): regex search over lineage
    NAMES restricted to one rank, emitting the picklist rows
    (ident + rank columns, ident = customer key as string).

    The regex is evaluated ONCE per dimension value (25 nations — the
    rank being searched lives in the broadcast dim); the fact table
    only gathers the precomputed hit mask, so the per-batch work is a
    vectorized take — no per-row regex at scale. ``invert`` flips the
    match (reference ``-v``)."""
    import re

    import numpy as np

    region_a, nation_a, hole_a = _customer_lineage_arrays(sf_dir)
    pat = re.compile(pattern)
    seg_rank = rank == "segment"
    if rank == "region":
        hit = np.array([bool(v) and bool(pat.search(v))
                        for v in region_a], bool)
    elif rank == "nation":
        hit = np.array([bool(v) and bool(pat.search(v))
                        for v in nation_a], bool)
    elif seg_rank:
        # segment lives on the fact row, not a dim — but it is a
        # low-cardinality column, so the regex still evaluates once per
        # DISTINCT value per batch (memoized), never per row
        hit = np.zeros(0, bool)
    else:
        raise ValueError(f"unknown lineage rank {rank!r} "
                         "(use the pure stages.tax.tax_grep for "
                         "arbitrary ranks)")
    if invert and not seg_rank:
        hit = ~hit & ~hole_a
    lin_ref = ray.put((region_a, nation_a, hole_a, hit))
    seg_memo: dict = {}

    def _filter(batch: pa.Table) -> pa.Table:
        region_b, nation_b, hole_b, hit_b = ray.get(lin_ref)
        nk = np.asarray(batch["c_nationkey"], dtype=np.int64)
        if nk.size and (nk.min() < 0 or nk.max() >= nation_b.size
                        or hole_b[nk].any()):
            raise ValueError("c_nationkey outside the nation dim")
        if seg_rank:
            seg_col = batch["c_mktsegment"].combine_chunks()
            for v in seg_col.unique().to_pylist():
                if v not in seg_memo:
                    seg_memo[v] = bool(v) and bool(pat.search(v))
            matched = pa.array(
                [v for v, ok in seg_memo.items() if ok], pa.string())
            keep = np.asarray(pc.is_in(seg_col, value_set=matched))
            if invert:
                keep = ~keep
        else:
            keep = hit_b[nk]
        ck = np.asarray(batch["c_custkey"], np.int64)[keep]
        seg = batch["c_mktsegment"].combine_chunks().filter(
            pa.array(keep))
        return pa.table({
            "ident": pa.array(ck.astype(str), pa.string()),
            "region": pa.array(region_b[nk[keep]], pa.string()),
            "nation": pa.array(nation_b[nk[keep]], pa.string()),
            "segment": seg,
        })

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_nationkey",
                                       "c_mktsegment"])
    return cust.map_batches(_filter, batch_format="pyarrow")


def large_orders(sf_dir: str, min_qty: int = 150):
    """TPC-H Q18 shape (large-volume orders): orders whose lineitems sum
    to more than ``min_qty`` units, with customer attribution.

    Scale shape: lineitem pre-reduces to (orderkey, qty) cells inside
    the map (block-local combine), ONE key exchange finishes the sums
    and filters, the surviving handful of large orders joins the orders
    projection on a second key exchange, and the customer name attaches
    from a broadcast dim (customers are 1/10th of orders; beyond a
    broadcast budget the same hash_join_exchange path applies)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    def _line_partial(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"], np.int64)
        qty = np.rint(np.asarray(batch["l_quantity"],
                                 np.float64)).astype(np.int64)
        order = np.argsort(ok, kind="stable")
        k_s = ok[order]
        first = np.r_[True, k_s[1:] != k_s[:-1]] if len(k_s) else \
            np.empty(0, bool)
        starts = np.flatnonzero(first)
        sums = np.add.reduceat(qty[order], starts) if starts.size else \
            np.empty(0, np.int64)
        return pa.table({
            "l_orderkey": pa.array(k_s[first], pa.int64()),
            "qty": pa.array(sums.astype(np.int64), pa.int64()),
        })

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_quantity"]).map_batches(
        _line_partial, batch_format="pyarrow")
    sums = grouped_sums(lines, ["l_orderkey"], ["qty"])
    big = sums.map_batches(
        lambda t: t.filter(pc.greater(t["sum_qty"], min_qty)),
        batch_format="pyarrow")

    def _ord(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "o_custkey": batch["o_custkey"],
            "total_price_cents": pc.cast(pc.round(pc.multiply(
                batch["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        _ord, batch_format="pyarrow")
    joined = hash_join_exchange(
        big, orders, key="okey", left_cols=["sum_qty"],
        right_cols=["o_custkey", "total_price_cents"],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        left_key="l_orderkey", right_key="o_orderkey")

    cust = {r["c_custkey"]: r["c_name"]
            for r in read_parquet_clean(
                f"{sf_dir}/customer.parquet",
                columns=["c_custkey", "c_name"]).take_all()}
    import numpy as np

    max_ck = max(cust) if cust else -1
    name_by_ck = np.empty(max_ck + 1, dtype=object)
    for ck, nm in cust.items():
        name_by_ck[ck] = nm
    name_ref = ray.put(name_by_ck)

    def _attach(batch: pa.Table) -> pa.Table:
        names = ray.get(name_ref)
        ck = np.asarray(batch["o_custkey"], np.int64)
        # inner-join semantics: orders whose custkey is absent from the
        # customer dim DROP (matches the SQL oracle on FK-broken data)
        ok = (ck >= 0) & (ck < names.size)
        ok[ok] &= np.array([names[c] is not None for c in ck[ok]], bool)
        sel = pa.array(np.flatnonzero(ok), pa.int64())
        ckk = ck[ok]
        return pa.table({
            "o_orderkey": batch["okey"].take(sel),
            "c_custkey": pa.array(ckk, pa.int64()),
            "c_name": pa.array(names[ckk], pa.string()),
            "total_price_cents": batch["total_price_cents"].take(sel),
            "sum_qty": batch["sum_qty"].take(sel),
        })

    return joined.map_batches(_attach, batch_format="pyarrow")


def rich_idle_customers(sf_dir: str, max_orders: int = 6):
    """TPC-H Q22 shape: customers with above-average account balance
    (among positive balances) but LOW purchasing activity (fewer than
    ``max_orders`` orders; Q22's literal no-orders predicate is
    degenerate on this corpus — every customer orders), counted per
    nation.

    The average comparison is EXACT integer arithmetic — cross-multiply
    ``cents * n_pos > sum_pos_cents`` instead of comparing against a
    float average (double sums are addition-order dependent across
    engines, so a borderline customer could flip). The activity test is
    a left-outer join against per-customer order counts on the key
    exchange; the nation name attaches from the broadcast dim."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def _cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(batch["c_acctbal"],
                                         pa.scalar(100.0))), pa.int64())
        return pa.table({"c_custkey": batch["c_custkey"],
                         "c_nationkey": batch["c_nationkey"],
                         "cents": c})

    cents = cust.map_batches(_cents, batch_format="pyarrow").materialize()

    def _pos_partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["cents"], np.int64)
        pos = v[v > 0]
        return pa.table({"one": pa.array([0], pa.int64()),
                         "s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    tot = grouped_sums(cents.map_batches(_pos_partial,
                                         batch_format="pyarrow"),
                       ["one"], ["s", "n"]).take_all()
    sum_pos = int(tot[0]["sum_s"]) if tot else 0
    n_pos = int(tot[0]["sum_n"]) if tot else 0

    def _rich(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch["cents"], np.int64)
        keep = v * n_pos > sum_pos          # cents > sum/n, exactly
        return batch.filter(pa.array(keep))

    rich = cents.map_batches(_rich, batch_format="pyarrow")
    order_counts = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey"]),
        ["o_custkey"], [], count_as="n_orders")
    joined = hash_join_exchange(
        rich, order_counts, key="ck",
        left_cols=["c_nationkey", "cents"], right_cols=["n_orders"],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        join_type="left outer", left_key="c_custkey",
        right_key="o_custkey")

    def _low_activity(batch: pa.Table) -> pa.Table:
        n = np.asarray(pc.fill_null(batch["n_orders"], 0), np.int64)
        return batch.filter(pa.array(n < max_orders))

    idle = joined.map_batches(_low_activity, batch_format="pyarrow")

    nation = {r["n_nationkey"]: r["n_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    max_nk = max(nation) if nation else -1
    nm = np.empty(max_nk + 1, dtype=object)
    for k, v in nation.items():
        nm[k] = v
    nm_ref = ray.put(nm)

    def _bynation(batch: pa.Table) -> pa.Table:
        names = ray.get(nm_ref)
        nk = np.asarray(batch["c_nationkey"], np.int64)
        ok = (nk >= 0) & (nk < names.size)
        ok[ok] &= np.array([names[k] is not None for k in nk[ok]], bool)
        sel = pa.array(np.flatnonzero(ok), pa.int64())
        return pa.table({
            "nation": pa.array(names[nk[ok]], pa.string()),
            "cents": batch["cents"].take(sel),
        })

    # materialize the (nation, cents) rows: the anti-join's union plan
    # reports no schema until executed, and grouped_sums needs the key
    # type up front (rows here are one per idle customer — two thin
    # columns, object-store resident)
    named = idle.map_batches(_bynation,
                             batch_format="pyarrow").materialize()
    if named.count() == 0:     # e.g. no positive balances at all
        from ray.data import from_arrow

        return from_arrow(pa.table({
            "nation": pa.array([], pa.string()),
            "n_customers": pa.array([], pa.int64()),
            "sum_acctbal_cents": pa.array([], pa.int64())}))
    out = grouped_sums(named, ["nation"], ["cents"],
                       count_as="n_customers")
    return out.map_batches(
        lambda t: pa.table({"nation": t["nation"],
                            "n_customers": t["n_customers"],
                            "sum_acctbal_cents": t["sum_cents"]}),
        batch_format="pyarrow")


def small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape: lineitems whose quantity is below 20% of their
    part's average quantity — count + revenue at exact cents. The
    threshold test is integer cross-multiplied (``5*qty*n_part <
    sum_qty_part``) so both engines decide borderline rows identically.

    Scale shape: per-part (sum, count) cells pre-reduce in the map, one
    key exchange finishes them, and the same exchange joins the cells
    back to the lineitem cells keyed by partkey — the classic
    self-join-through-aggregate expressed as two passes over one
    partitioning."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    def _cells(batch: pa.Table) -> pa.Table:
        pk = np.asarray(batch["l_partkey"], np.int64)
        qty = np.rint(np.asarray(batch["l_quantity"],
                                 np.float64)).astype(np.int64)
        price = np.asarray(batch["l_extendedprice"], np.float64)
        cents = np.rint(price * 100).astype(np.int64)
        return pa.table({
            "l_partkey": pa.array(pk, pa.int64()),
            "qty": pa.array(qty, pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        })

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(_cells, batch_format="pyarrow").materialize()

    stats = grouped_sums(lines.select_columns(["l_partkey", "qty"]),
                         ["l_partkey"], ["qty"], count_as="n")

    joined = hash_join_exchange(
        lines, stats, key="pk", left_cols=["qty", "cents"],
        right_cols=["sum_qty", "n"],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        left_key="l_partkey", right_key="l_partkey")

    def _filter_sum(batch: pa.Table) -> pa.Table:
        qty = np.asarray(batch["qty"], np.int64)
        sq = np.asarray(batch["sum_qty"], np.int64)
        n = np.asarray(batch["n"], np.int64)
        keep = 5 * qty * n < sq
        cents = np.asarray(batch["cents"], np.int64)[keep]
        return pa.table({
            "one": pa.array([0], pa.int64()),
            "rev": pa.array([int(cents.sum())], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64()),
        })

    out = grouped_sums(joined.map_batches(_filter_sum,
                                          batch_format="pyarrow"),
                       ["one"], ["rev", "n_items"])
    return out.map_batches(
        lambda t: pa.table({"revenue_cents": t["sum_rev"],
                            "n_items": t["sum_n_items"]}),
        batch_format="pyarrow")


def volume_shipping(sf_dir: str):
    """TPC-H Q7 shape: revenue flow between (supplier nation, customer
    nation) pairs per ship year. Supplier and customer nationkeys attach
    from broadcast dims (dense int arrays — 8 bytes/key; beyond a
    broadcast budget the lookup becomes one more hash_join_exchange);
    lineitem joins orders on ONE key exchange; (snation, cnation, year,
    rev) cells pre-reduce before the final combine."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey",
                                       "s_nationkey"]).take_all()
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey",
                                       "c_nationkey"]).take_all()
    nation = {r["n_nationkey"]: r["n_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}

    def _dense(rows, kf, vf):
        mx = max((r[kf] for r in rows), default=-1)
        a = np.full(mx + 1, -1, np.int64)
        for r in rows:
            a[r[kf]] = r[vf]
        return a

    s_nk = _dense(supp, "s_suppkey", "s_nationkey")
    c_nk = _dense(cust, "c_custkey", "c_nationkey")
    lut_ref = ray.put((s_nk, c_nk))

    def _line(batch: pa.Table) -> pa.Table:
        s_a, _ = ray.get(lut_ref)
        sk = np.asarray(batch["l_suppkey"], np.int64)
        # inner-join semantics: unmatched suppkeys drop, as in the oracle
        ok = (sk >= 0) & (sk < s_a.size)
        ok[ok] &= s_a[sk[ok]] >= 0
        sel = pa.array(np.flatnonzero(ok), pa.int64())
        sk = sk[ok]
        price = np.asarray(batch["l_extendedprice"], np.float64)[ok]
        disc = np.asarray(batch["l_discount"], np.float64)[ok]
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        year = np.asarray(batch["l_shipdate"], "datetime64[us]")[ok] \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "l_orderkey": batch["l_orderkey"].take(sel),
            "snk": pa.array(s_a[sk], pa.int64()),
            "year": pa.array(year, pa.int64()),
            "rev_e4": pa.array(rev, pa.int64()),
        })

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"]).map_batches(
        _line, batch_format="pyarrow")

    def _ord(batch: pa.Table) -> pa.Table:
        _, c_a = ray.get(lut_ref)
        ck = np.asarray(batch["o_custkey"], np.int64)
        ok = (ck >= 0) & (ck < c_a.size)
        ok[ok] &= c_a[ck[ok]] >= 0
        sel = pa.array(np.flatnonzero(ok), pa.int64())
        return pa.table({
            "o_orderkey": batch["o_orderkey"].take(sel),
            "cnk": pa.array(c_a[ck[ok]], pa.int64()),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"]).map_batches(
        _ord, batch_format="pyarrow")

    joined = hash_join_exchange(
        lines, orders, key="okey", left_cols=["snk", "year", "rev_e4"],
        right_cols=["cnk"],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        left_key="l_orderkey", right_key="o_orderkey")

    max_nk = max(nation) if nation else -1
    nm = np.empty(max_nk + 1, dtype=object)
    for k, v in nation.items():
        nm[k] = v
    nm_ref = ray.put(nm)

    def _name(batch: pa.Table) -> pa.Table:
        names = ray.get(nm_ref)
        snk = np.asarray(batch["snk"], np.int64)
        cnk = np.asarray(batch["cnk"], np.int64)
        return pa.table({
            "supp_nation": pa.array(names[snk], pa.string()),
            "cust_nation": pa.array(names[cnk], pa.string()),
            "year": batch["year"],
            "rev_e4": batch["rev_e4"],
        })

    out = grouped_sums(joined.map_batches(_name, batch_format="pyarrow"),
                       ["supp_nation", "cust_nation", "year"],
                       ["rev_e4"])
    return out.map_batches(
        lambda t: pa.table({"supp_nation": t["supp_nation"],
                            "cust_nation": t["cust_nation"],
                            "year": t["year"],
                            "revenue_e4": t["sum_rev_e4"]}),
        batch_format="pyarrow")


def totalprice_quantiles_by_priority(sf_dir: str,
                                     qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-priority order-value quantiles (exact discrete quantiles over
    cents) — the relational instance of the grouped-quantile machinery
    (``stages.agg.grouped_quantiles_disc``)."""
    from ..stages.agg import grouped_quantiles_disc

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"]).map_batches(
        lambda t: pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "cents": pc.cast(pc.round(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        }), batch_format="pyarrow")
    return grouped_quantiles_disc(ds, "o_orderpriority", "cents",
                                  list(qs))


def orders_reconciliation(sf_dir: str):
    """Key-level referential-integrity check: ONE row with the count of
    orders that have no lineitems, distinct lineitem orderkeys with no
    order, and matched keys — the data-quality gate a pipeline runs
    before trusting a join. Both sides pre-dedup per block, meet on one
    key exchange, and only three counters leave each partition."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _okeys(batch: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(batch["o_orderkey"], np.int64))
        return pa.table({
            "key": pa.array(k, pa.int64()),
            "side": pa.array(np.zeros(len(k), np.int8), pa.int8()),
            "part": pa.array(k % n_parts, pa.int64()),
        })

    def _lkeys(batch: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(batch["l_orderkey"], np.int64))
        return pa.table({
            "key": pa.array(k, pa.int64()),
            "side": pa.array(np.ones(len(k), np.int8), pa.int8()),
            "part": pa.array(k % n_parts, pa.int64()),
        })

    o = read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderkey"]).map_batches(
        _okeys, batch_format="pyarrow")
    l = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey"]).map_batches(
        _lkeys, batch_format="pyarrow")

    counts_schema = pa.schema([("one", pa.int64()),
                               ("orders_only", pa.int64()),
                               ("lineitems_only", pa.int64()),
                               ("matched", pa.int64())])

    def _count(part: pa.Table) -> pa.Table:
        key = np.asarray(part["key"], np.int64)
        side = np.asarray(part["side"], np.int8)
        okeys = np.unique(key[side == 0])
        lkeys = np.unique(key[side == 1])
        m = np.intersect1d(okeys, lkeys, assume_unique=True).size
        return pa.table({
            "one": pa.array([0], pa.int64()),
            "orders_only": pa.array([len(okeys) - m], pa.int64()),
            "lineitems_only": pa.array([len(lkeys) - m], pa.int64()),
            "matched": pa.array([m], pa.int64()),
        })

    parts = exchange_map_groups(o.union(l), "part", n_parts, _count,
                                counts_schema)
    out = grouped_sums(parts, ["one"],
                       ["orders_only", "lineitems_only", "matched"])
    return out.map_batches(
        lambda t: pa.table({
            "orders_without_lineitems": t["sum_orders_only"],
            "lineitem_orderkeys_without_order": t["sum_lineitems_only"],
            "matched_orderkeys": t["sum_matched"]}),
        batch_format="pyarrow")


def supplier_balance_by_nation(sf_dir: str):
    """Supplier dimension rollup: per nation, supplier count + exact
    account-balance cents (broadcast nation dim; map-only partials +
    one tiny cell exchange)."""
    import numpy as np

    from ..stages.agg import grouped_sums

    nation = {r["n_nationkey"]: r["n_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    max_nk = max(nation) if nation else -1
    nm = np.empty(max_nk + 1, dtype=object)
    for k, v in nation.items():
        nm[k] = v
    nm_ref = ray.put(nm)

    def _prep(batch: pa.Table) -> pa.Table:
        names = ray.get(nm_ref)
        nk = np.asarray(batch["s_nationkey"], np.int64)
        ok = (nk >= 0) & (nk < names.size)
        ok[ok] &= np.array([names[k] is not None for k in nk[ok]], bool)
        sel = pa.array(np.flatnonzero(ok), pa.int64())
        return pa.table({
            "nation": pa.array(names[nk[ok]], pa.string()),
            "cents": pc.cast(pc.round(pc.multiply(
                batch["s_acctbal"].take(sel), pa.scalar(100.0))),
                pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                            columns=["s_nationkey",
                                     "s_acctbal"]).map_batches(
        _prep, batch_format="pyarrow")
    out = grouped_sums(ds, ["nation"], ["cents"],
                       count_as="n_suppliers")
    return out.map_batches(
        lambda t: pa.table({"nation": t["nation"],
                            "n_suppliers": t["n_suppliers"],
                            "sum_acctbal_cents": t["sum_cents"]}),
        batch_format="pyarrow")


def profit_by_nation_year(sf_dir: str, token: str = "red"):
    """TPC-H Q9 shape (minus the absent partsupp cost side): revenue by
    (supplier nation, ship year) for lineitems of parts whose name
    contains ``token``. Both dimension attaches are broadcast lookups
    (part → bool mask, supplier → nationkey: dense int/bool arrays,
    1 bit–8 B per key), so the fact table never shuffles — the only
    exchange is the tiny (nation, year) cell combine. Money kept as the
    engine-wide e4 integer (cents × (100 − disc_cents)) so the DuckDB
    twin hashes exactly."""
    import numpy as np

    from ..stages.agg import grouped_sums

    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey", "p_name"]).take_all()
    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey",
                                       "s_nationkey"]).take_all()
    nation = {r["n_nationkey"]: r["n_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    max_pk = max((r["p_partkey"] for r in part), default=-1)
    p_ok = np.zeros(max_pk + 1, bool)
    for r in part:
        if token in (r["p_name"] or ""):
            p_ok[r["p_partkey"]] = True
    max_sk = max((r["s_suppkey"] for r in supp), default=-1)
    s_nk = np.full(max_sk + 1, -1, np.int64)
    for r in supp:
        s_nk[r["s_suppkey"]] = r["s_nationkey"]
    max_nk = max(nation, default=-1)
    nm = np.empty(max_nk + 1, dtype=object)
    for k, v in nation.items():
        nm[k] = v
    lut_ref = ray.put((p_ok, s_nk, nm))

    def _line(batch: pa.Table) -> pa.Table:
        p_a, s_a, names = ray.get(lut_ref)
        pk = np.asarray(batch["l_partkey"], np.int64)
        sk = np.asarray(batch["l_suppkey"], np.int64)
        # inner-join semantics throughout: rows whose part misses the
        # pattern, or whose FK misses the dimension, drop
        ok = (pk >= 0) & (pk < p_a.size) & (sk >= 0) & (sk < s_a.size)
        ok[ok] &= p_a[pk[ok]] & (s_a[sk[ok]] >= 0)
        nk = s_a[sk[ok]]
        ok2 = np.array([names[k] is not None for k in nk], bool) \
            if nk.size else np.empty(0, bool)
        sel = np.flatnonzero(ok)[ok2]
        nk = nk[ok2]
        take = pa.array(sel, pa.int64())
        price = np.asarray(batch["l_extendedprice"], np.float64)[sel]
        disc = np.asarray(batch["l_discount"], np.float64)[sel]
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        year = np.asarray(batch["l_shipdate"], "datetime64[us]")[sel] \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "nation": pa.array(names[nk], pa.string()),
            "year": pa.array(year, pa.int64()),
            "rev_e4": pa.array(rev, pa.int64()),
        })

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"]).map_batches(
        _line, batch_format="pyarrow")
    out = grouped_sums(lines, ["nation", "year"], ["rev_e4"])
    return out.map_batches(
        lambda t: pa.table({"nation": t["nation"],
                            "year": t["year"],
                            "profit_e4": t["sum_rev_e4"]}),
        batch_format="pyarrow")


def supplier_part_breadth(sf_dir: str, min_parts: int = 8):
    """TPC-H Q20 shape (minus partsupp): suppliers that shipped at least
    ``min_parts`` DISTINCT parts, with their nation. The distinct-count
    never shuffles raw facts: each block emits its distinct (suppkey,
    partkey) combos (bounded by the true distinct count), ONE key
    exchange co-locates a supplier's combos, and only (suppkey,
    n_parts ≥ threshold) survivors fetch their name/nation."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    n_parts_ex = resolve_num_partitions(DEFAULT_CONFIG)
    group_parts = DEFAULT_CONFIG.exec.group_parts

    def _combos(batch: pa.Table) -> pa.Table:
        sk = np.asarray(batch["l_suppkey"], np.int64)
        pk = np.asarray(batch["l_partkey"], np.int64)
        u = np.unique(np.stack([sk, pk], axis=1), axis=0)
        return pa.table({
            "suppkey": pa.array(u[:, 0], pa.int64()),
            "partkey": pa.array(u[:, 1], pa.int64()),
            "sk_part": pa.array(u[:, 0] % group_parts, pa.int64()),
        })

    combo_schema = pa.schema([("suppkey", pa.int64()),
                              ("n_parts", pa.int64())])

    def _count(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return combo_schema.empty_table()
        sk = np.asarray(part["suppkey"], np.int64)
        pk = np.asarray(part["partkey"], np.int64)
        u = np.unique(np.stack([sk, pk], axis=1), axis=0)
        s, counts = np.unique(u[:, 0], return_counts=True)
        keep = counts >= min_parts
        return pa.table({
            "suppkey": pa.array(s[keep], pa.int64()),
            "n_parts": pa.array(counts[keep].astype(np.int64),
                                pa.int64()),
        })

    combos = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_partkey"]).map_batches(
        _combos, batch_format="pyarrow")
    winners = exchange_map_groups(combos, "sk_part", n_parts_ex,
                                  _count, combo_schema).take_all()
    # names fetched only for winners (post-threshold, Q15/Q10 pattern)
    supp = {r["s_suppkey"]: (r["s_name"], r["s_nationkey"])
            for r in read_parquet_clean(
                f"{sf_dir}/supplier.parquet",
                columns=["s_suppkey", "s_name",
                         "s_nationkey"]).take_all()}
    nation = {r["n_nationkey"]: r["n_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    rows = []
    for r in winners:
        hit = supp.get(r["suppkey"])
        if hit is None:
            continue                      # inner-join: FK miss drops
        name, nk = hit
        if nk not in nation:
            continue
        rows.append({"s_name": name, "nation": nation[nk],
                     "n_parts": r["n_parts"]})
    import ray.data

    tbl_schema = pa.schema([("s_name", pa.string()),
                            ("nation", pa.string()),
                            ("n_parts", pa.int64())])
    if not rows:
        return ray.data.from_arrow(tbl_schema.empty_table())
    return ray.data.from_arrow(
        pa.Table.from_pylist(rows, schema=tbl_schema))


def brand_size_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape (minus the absent partsupp/comment columns):
    DISTINCT supplier count per (p_brand, p_size), derived from shipped
    lineitems. The part attributes attach from broadcast dense arrays
    (brand dictionary index + size, 8 B/partkey), each block emits its
    distinct (brand, size, suppkey) combos, ONE composite-key exchange
    co-locates a cell's combos, and only (brand, size, count) cells
    leave the partitions."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.exchange import exchange_map_groups

    part = read_parquet_clean(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"]).take_all()
    brands = sorted({r["p_brand"] for r in part})
    b_idx = {b: i for i, b in enumerate(brands)}
    max_pk = max((r["p_partkey"] for r in part), default=-1)
    p_b = np.full(max_pk + 1, -1, np.int64)
    p_s = np.full(max_pk + 1, -1, np.int64)
    for r in part:
        p_b[r["p_partkey"]] = b_idx[r["p_brand"]]
        p_s[r["p_partkey"]] = r["p_size"]
    lut_ref = ray.put((p_b, p_s))
    group_parts = DEFAULT_CONFIG.exec.group_parts
    # composite cell key: sizes are small ints, brands a tiny dict —
    # overflow-guarded like the month-ordinal keys elsewhere
    max_size = max((r["p_size"] for r in part), default=0) + 1

    def _combos(batch: pa.Table) -> pa.Table:
        b_a, s_a = ray.get(lut_ref)
        pk = np.asarray(batch["l_partkey"], np.int64)
        sk = np.asarray(batch["l_suppkey"], np.int64)
        ok = (pk >= 0) & (pk < b_a.size)
        ok[ok] &= b_a[pk[ok]] >= 0      # inner join: FK miss drops
        pk, sk = pk[ok], sk[ok]
        cell = (b_a[pk] * max_size + s_a[pk])
        u = np.unique(np.stack([cell, sk], axis=1), axis=0)
        return pa.table({
            "cell": pa.array(u[:, 0], pa.int64()),
            "suppkey": pa.array(u[:, 1], pa.int64()),
            "cell_part": pa.array(u[:, 0] % group_parts, pa.int64()),
        })

    out_schema = pa.schema([("cell", pa.int64()),
                            ("supplier_cnt", pa.int64())])

    def _count(p: pa.Table) -> pa.Table:
        if p.num_rows == 0:
            return out_schema.empty_table()
        c = np.asarray(p["cell"], np.int64)
        s = np.asarray(p["suppkey"], np.int64)
        u = np.unique(np.stack([c, s], axis=1), axis=0)
        cells, counts = np.unique(u[:, 0], return_counts=True)
        return pa.table({
            "cell": pa.array(cells, pa.int64()),
            "supplier_cnt": pa.array(counts.astype(np.int64),
                                     pa.int64()),
        })

    combos = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey"]).map_batches(
        _combos, batch_format="pyarrow")
    cells = exchange_map_groups(combos, "cell_part",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _count, out_schema)
    b_names = np.array(brands, dtype=object)
    nm_ref = ray.put(b_names)

    def _name(batch: pa.Table) -> pa.Table:
        names = ray.get(nm_ref)
        cell = np.asarray(batch["cell"], np.int64)
        return pa.table({
            "p_brand": pa.array(names[cell // max_size], pa.string()),
            "p_size": pa.array((cell % max_size).astype(np.int32),
                               pa.int32()),
            "supplier_cnt": batch["supplier_cnt"],
        })

    return cells.map_batches(_name, batch_format="pyarrow")


def cheapest_supplier_per_brand(sf_dir: str):
    """TPC-H Q2 shape (minus partsupp): per part brand, the single
    cheapest shipped lineitem (min extendedprice cents, supplier key as
    the deterministic tiebreak) with its supplier's name and nation.
    Grouped ARGMIN: each block keeps one candidate per brand, the
    driver folds the tiny (brands × blocks) candidate set, and names
    are fetched only for the ≤|brands| winners (Q15/Q10 pattern)."""
    import numpy as np

    import ray.data

    part = read_parquet_clean(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand"]).take_all()
    brands = sorted({r["p_brand"] for r in part})
    b_idx = {b: i for i, b in enumerate(brands)}
    max_pk = max((r["p_partkey"] for r in part), default=-1)
    p_b = np.full(max_pk + 1, -1, np.int64)
    for r in part:
        p_b[r["p_partkey"]] = b_idx[r["p_brand"]]
    lut_ref = ray.put(p_b)

    def _cand(batch: pa.Table) -> pa.Table:
        b_a = ray.get(lut_ref)
        pk = np.asarray(batch["l_partkey"], np.int64)
        sk = np.asarray(batch["l_suppkey"], np.int64)
        ok = (pk >= 0) & (pk < b_a.size)
        ok[ok] &= b_a[pk[ok]] >= 0
        b = b_a[pk[ok]]
        sk = sk[ok]
        cents = np.rint(np.asarray(batch["l_extendedprice"],
                                   np.float64)[ok] * 100).astype(np.int64)
        order = np.lexsort((sk, cents, b))
        b_s = b[order]
        first = np.concatenate([[True], b_s[1:] != b_s[:-1]]) \
            if b_s.size else np.empty(0, bool)
        sel = order[first] if b_s.size else np.empty(0, np.int64)
        return pa.table({
            "brand_idx": pa.array(b[sel], pa.int64()),
            "cents": pa.array(cents[sel], pa.int64()),
            "suppkey": pa.array(sk[sel], pa.int64()),
        })

    cands = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey",
                 "l_extendedprice"]).map_batches(
        _cand, batch_format="pyarrow").take_all()
    best: dict[int, tuple[int, int]] = {}
    for r in cands:
        key = (r["cents"], r["suppkey"])
        if r["brand_idx"] not in best or key < best[r["brand_idx"]]:
            best[r["brand_idx"]] = key
    supp = {r["s_suppkey"]: (r["s_name"], r["s_nationkey"])
            for r in read_parquet_clean(
                f"{sf_dir}/supplier.parquet",
                columns=["s_suppkey", "s_name",
                         "s_nationkey"]).take_all()}
    nation = {r["n_nationkey"]: r["n_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    schema = pa.schema([("p_brand", pa.string()),
                        ("min_price_cents", pa.int64()),
                        ("s_name", pa.string()),
                        ("nation", pa.string())])
    rows = []
    for bi in sorted(best):
        cents, sk = best[bi]
        hit = supp.get(sk)
        if hit is None or hit[1] not in nation:
            continue                      # inner-join: FK miss drops
        rows.append({"p_brand": brands[bi], "min_price_cents": cents,
                     "s_name": hit[0], "nation": nation[hit[1]]})
    if not rows:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


def region_order_rollup(sf_dir: str):
    """GROUP BY ROLLUP shape: order count + revenue at (region, nation),
    per-region subtotal, and grand total — the multi-level report a
    warehouse rollup produces in one pass. Fact rows never shuffle: the
    customer→nation→region attach is a broadcast dense-array lookup,
    grouped_sums reduces to ≤|nations| cells, and the subtotal levels
    expand from that tiny cell table on the driver. Subtotal marker is
    '*' (COALESCE in the SQL twin) so no NULL rides the hash compare."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey",
                                       "c_nationkey"]).take_all()
    nation = {r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    region = {r["r_regionkey"]: r["r_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/region.parquet").take_all()}
    max_ck = max((r["c_custkey"] for r in cust), default=-1)
    c_nk = np.full(max_ck + 1, -1, np.int64)
    for r in cust:
        c_nk[r["c_custkey"]] = r["c_nationkey"]
    lut_ref = ray.put(c_nk)

    def _ord(batch: pa.Table) -> pa.Table:
        c_a = ray.get(lut_ref)
        ck = np.asarray(batch["o_custkey"], np.int64)
        ok = (ck >= 0) & (ck < c_a.size)
        ok[ok] &= c_a[ck[ok]] >= 0        # inner join: FK miss drops
        sel = pa.array(np.flatnonzero(ok), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            batch["o_totalprice"].take(sel), pa.scalar(100.0))),
            pa.int64())
        return pa.table({
            "nk": pa.array(c_a[ck[ok]], pa.int64()),
            "cents": cents,
        })

    cells = grouped_sums(
        read_parquet_clean(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice"]).map_batches(
            _ord, batch_format="pyarrow"),
        ["nk"], ["cents"], count_as="n_orders").take_all()
    schema = pa.schema([("region", pa.string()), ("nation", pa.string()),
                        ("n_orders", pa.int64()),
                        ("total_cents", pa.int64())])
    rows = []
    reg_tot: dict[str, list[int]] = {}
    g = [0, 0]
    for c in cells:
        nk = c["nk"]
        if nk not in nation or nation[nk][1] not in region:
            continue
        n_name, rk = nation[nk]
        r_name = region[rk]
        rows.append({"region": r_name, "nation": n_name,
                     "n_orders": c["n_orders"],
                     "total_cents": c["sum_cents"]})
        t = reg_tot.setdefault(r_name, [0, 0])
        t[0] += c["n_orders"]
        t[1] += c["sum_cents"]
        g[0] += c["n_orders"]
        g[1] += c["sum_cents"]
    for r_name, (n, s) in reg_tot.items():
        rows.append({"region": r_name, "nation": "*", "n_orders": n,
                     "total_cents": s})
    if rows:
        rows.append({"region": "*", "nation": "*", "n_orders": g[0],
                     "total_cents": g[1]})
    if not rows:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


def quantity_value_histogram(sf_dir: str):
    """Lineitem quantity spectrum: per integer quantity, row count and
    exact revenue sum (e4 integer) — the fact-table twin of
    ``doc_length_histogram``. Pure block-local bincount partials on a
    bounded key domain; the exchange carries ≤|distinct quantities|
    rows per block."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        qty = np.rint(np.asarray(batch["l_quantity"],
                                 np.float64)).astype(np.int64)
        price = np.asarray(batch["l_extendedprice"], np.float64)
        disc = np.asarray(batch["l_discount"], np.float64)
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        return pa.table({
            "quantity": pa.array(qty, pa.int64()),
            "rev_e4": pa.array(rev, pa.int64()),
        })

    out = grouped_sums(
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_quantity", "l_extendedprice",
                     "l_discount"]).map_batches(
            _prep, batch_format="pyarrow"),
        ["quantity"], ["rev_e4"], count_as="n_lines")
    return out.map_batches(
        lambda t: pa.table({"quantity": t["quantity"],
                            "n_lines": t["n_lines"],
                            "revenue_e4": t["sum_rev_e4"]}),
        batch_format="pyarrow")


def orders_yoy_growth(sf_dir: str):
    """Year-over-year order growth: per order year, count + revenue and
    their deltas vs the previous year (LAG window shape; first year's
    delta is 0 by the lag-default convention so no NULL rides the hash
    compare). One grouped_sums to ≤|years| cells; the window math runs
    on the driver over that tiny table."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        year = np.asarray(batch["o_orderdate"], "datetime64[us]") \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        cents = pc.cast(pc.round(pc.multiply(
            batch["o_totalprice"], pa.scalar(100.0))), pa.int64())
        return pa.table({
            "year": pa.array(year, pa.int64()),
            "cents": cents,
        })

    cells = grouped_sums(
        read_parquet_clean(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderdate", "o_totalprice"]).map_batches(
            _prep, batch_format="pyarrow"),
        ["year"], ["cents"], count_as="n_orders").take_all()
    cells.sort(key=lambda r: r["year"])
    schema = pa.schema([("year", pa.int64()), ("n_orders", pa.int64()),
                        ("total_cents", pa.int64()),
                        ("orders_delta", pa.int64()),
                        ("cents_delta", pa.int64())])
    rows = []
    for i, c in enumerate(cells):
        pn = cells[i - 1]["n_orders"] if i else c["n_orders"]
        ps = cells[i - 1]["sum_cents"] if i else c["sum_cents"]
        rows.append({"year": c["year"], "n_orders": c["n_orders"],
                     "total_cents": c["sum_cents"],
                     "orders_delta": c["n_orders"] - pn,
                     "cents_delta": c["sum_cents"] - ps})
    if not rows:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


def customer_segment_profile(sf_dir: str):
    """Per market segment: customer count, DISTINCT nation count, and
    exact account-balance cents sum — the mixed count/distinct/sum
    profile row a segmentation report opens with. Blocks emit
    (segment, nation) distinct pairs plus (segment, count, cents)
    partials; both are ≤|segments × nations| per block, so the driver
    fold is dimension-sized."""
    import numpy as np

    import ray.data

    def _partial(batch: pa.Table) -> pa.Table:
        seg = batch["c_mktsegment"].combine_chunks()
        nk = np.asarray(batch["c_nationkey"], np.int64)
        cents = np.rint(np.asarray(batch["c_acctbal"],
                                   np.float64) * 100).astype(np.int64)
        import pyarrow.compute as _pc

        d = _pc.dictionary_encode(seg)
        si = np.asarray(d.indices, np.int64)
        n_seg = len(d.dictionary)
        cnt = np.bincount(si, minlength=n_seg).astype(np.int64)
        # exact int sums (bincount weights would go through float64)
        sums = np.zeros(n_seg, np.int64)
        np.add.at(sums, si, cents)
        pairs = np.unique(si * 1_000_003 + nk)
        return pa.table({
            "segment": pa.concat_arrays(
                [d.dictionary,
                 d.dictionary.take(pa.array(pairs // 1_000_003,
                                            pa.int64()))]),
            "n_customers": pa.array(
                np.concatenate([cnt, np.zeros(len(pairs), np.int64)]),
                pa.int64()),
            "cents": pa.array(
                np.concatenate([sums, np.zeros(len(pairs), np.int64)]),
                pa.int64()),
            "nationkey": pa.array(
                np.concatenate([np.full(n_seg, -1, np.int64),
                                pairs % 1_000_003]), pa.int64()),
        })

    parts = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_mktsegment", "c_nationkey",
                 "c_acctbal"]).map_batches(
        _partial, batch_format="pyarrow").take_all()
    agg: dict[str, list] = {}
    for r in parts:
        a = agg.setdefault(r["segment"], [0, 0, set()])
        if r["nationkey"] < 0:
            a[0] += r["n_customers"]
            a[1] += r["cents"]
        else:
            a[2].add(r["nationkey"])
    schema = pa.schema([("segment", pa.string()),
                        ("n_customers", pa.int64()),
                        ("n_nations", pa.int64()),
                        ("sum_acctbal_cents", pa.int64())])
    rows = [{"segment": s, "n_customers": v[0],
             "n_nations": len(v[2]), "sum_acctbal_cents": v[1]}
            for s, v in sorted(agg.items())]
    if not rows:
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


_WAIT_PART_SCHEMA = pa.schema([
    ("ok", pa.int64()), ("sk", pa.int64()), ("ts", pa.int64()),
    ("is_order", pa.bool_()), ("part", pa.int64())])
_WAIT_SUPP_SCHEMA = pa.schema([("s_suppkey", pa.int64())])


def waiting_suppliers(sf_dir: str, late_days: int = 90):
    """TPC-H Q21 shape adapted to this corpus's columns (lineitem has no
    receipt/commit dates): among 'F'-status orders with ≥ 2 distinct
    suppliers, credit the supplier that was the ONLY late one (its last
    line shipped > ``late_days`` after the order date) — per supplier,
    how many orders it alone kept waiting.

    ONE orderkey exchange carries both sides: lineitem block-combines to
    (orderkey, suppkey, max_shipdate) partials (≤ distinct pairs per
    block, never raw lines) and unions with the filtered (orderkey,
    orderdate) order rows; the per-order EXISTS / NOT-EXISTS logic runs
    vectorized inside each partition merge. The surviving one-row-per-
    waiting-order stream is supplier-sized, so the count rollup and the
    broadcast name attach are dimension-scale."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    group_parts = DEFAULT_CONFIG.exec.group_parts
    late_us = np.int64(late_days) * 86_400_000_000

    def _lines(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"], np.int64)
        sk = np.asarray(batch["l_suppkey"], np.int64)
        ts = np.asarray(batch["l_shipdate"],
                        "datetime64[us]").astype(np.int64)
        order = np.lexsort((sk, ok))
        ok, sk, ts = ok[order], sk[order], ts[order]
        first = np.concatenate([[True], (ok[1:] != ok[:-1])
                                | (sk[1:] != sk[:-1])]) \
            if ok.size else np.empty(0, bool)
        starts = np.flatnonzero(first)
        ms = np.maximum.reduceat(ts, starts) if ok.size else \
            np.empty(0, np.int64)
        ok, sk = ok[starts], sk[starts]
        return pa.table({
            "ok": pa.array(ok, pa.int64()),
            "sk": pa.array(sk, pa.int64()),
            "ts": pa.array(ms, pa.int64()),
            "is_order": pa.array(np.zeros(ok.size, bool)),
            "part": pa.array(ok % group_parts, pa.int64()),
        })

    def _orders(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["o_orderstatus"], pa.scalar("F"))
        t = batch.filter(keep)
        ok = np.asarray(t["o_orderkey"], np.int64)
        od = np.asarray(t["o_orderdate"],
                        "datetime64[us]").astype(np.int64)
        return pa.table({
            "ok": pa.array(ok, pa.int64()),
            "sk": pa.array(np.full(ok.size, -1, np.int64), pa.int64()),
            "ts": pa.array(od, pa.int64()),
            "is_order": pa.array(np.ones(ok.size, bool)),
            "part": pa.array(ok % group_parts, pa.int64()),
        })

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"]).map_batches(
        _lines, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus",
                 "o_orderdate"]).map_batches(
        _orders, batch_format="pyarrow")

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _WAIT_SUPP_SCHEMA.empty_table()
        ok = np.asarray(part["ok"], np.int64)
        sk = np.asarray(part["sk"], np.int64)
        ts = np.asarray(part["ts"], np.int64)
        iso = np.asarray(part["is_order"], bool)
        o_ok, o_ts = ok[iso], ts[iso]
        p_ok, p_sk, p_ts = ok[~iso], sk[~iso], ts[~iso]
        # cross-block max per (orderkey, suppkey) pair
        order = np.lexsort((p_sk, p_ok))
        p_ok, p_sk, p_ts = p_ok[order], p_sk[order], p_ts[order]
        if p_ok.size:
            first = np.concatenate([[True], (p_ok[1:] != p_ok[:-1])
                                    | (p_sk[1:] != p_sk[:-1])])
            starts = np.flatnonzero(first)
            p_ts = np.maximum.reduceat(p_ts, starts)
            p_ok, p_sk = p_ok[starts], p_sk[starts]
        # inner join: order date per pair row ('F' orders only)
        so = np.argsort(o_ok)
        o_ok, o_ts = o_ok[so], o_ts[so]
        pos = np.searchsorted(o_ok, p_ok)
        posc = np.minimum(pos, max(o_ok.size - 1, 0))
        hit = o_ok.size > 0
        m = (o_ok[posc] == p_ok) if hit else np.zeros(p_ok.size, bool)
        p_ok, p_sk, p_ts, posc = p_ok[m], p_sk[m], p_ts[m], posc[m]
        late = p_ts > (o_ts[posc] + late_us)
        # per-order supplier count + late count (+ the single late sk)
        if not p_ok.size:
            return _WAIT_SUPP_SCHEMA.empty_table()
        first_o = np.concatenate([[True], p_ok[1:] != p_ok[:-1]])
        starts = np.flatnonzero(first_o)
        n_supp = np.diff(np.concatenate([starts, [p_ok.size]]))
        n_late = np.add.reduceat(late.astype(np.int64), starts)
        keep_o = (n_supp >= 2) & (n_late == 1)
        grp = np.cumsum(first_o) - 1
        credit = late & keep_o[grp]
        return pa.table({"s_suppkey": pa.array(p_sk[credit],
                                               pa.int64())})

    waited = exchange_map_groups(lines.union(orders), "part", n_parts,
                                 _merge, _WAIT_SUPP_SCHEMA)
    counts = grouped_sums(waited, ["s_suppkey"], [], count_as="numwait")

    supp = {r["s_suppkey"]: r["s_name"]
            for r in read_parquet_clean(
                f"{sf_dir}/supplier.parquet",
                columns=["s_suppkey", "s_name"]).take_all()}
    name_ref = ray.put(supp)

    def _name(batch: pa.Table) -> pa.Table:
        names = ray.get(name_ref)
        sks = np.asarray(batch["s_suppkey"], np.int64)
        keep = np.array([k in names for k in sks], bool) \
            if sks.size else np.empty(0, bool)
        return pa.table({
            "s_name": pa.array([names[k] for k in sks[keep]],
                               pa.string()),
            "numwait": pc.filter(batch["numwait"], pa.array(keep)),
        })

    return counts.map_batches(_name, batch_format="pyarrow")


def nation_market_share(sf_dir: str, nation_name: str = "NATION_7"):
    """TPC-H Q8 shape: per order year, the share of region revenue
    supplied by one nation — revenue of lineitems whose supplier is from
    ``nation_name``, over all revenue from orders placed by customers in
    that nation's REGION.

    Scale plan mirrors Q5's two-exchange spine: orders ⋈ customer on
    custkey (customers outside the region drop at the join — inner
    semantics), then lineitem partials ⋈ that on orderkey. The lineitem
    side block-combines to one (orderkey, total_e4, nation_e4) row per
    orderkey per block BEFORE the shuffle, with the supplier→nation
    lookup a dense broadcast array (dim-sized). share_e4 =
    floor(1e4·nation/total) — floor, not round: half-to-even vs
    half-away can disagree at an exact .5, floor cannot."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    nation = read_parquet_clean(f"{sf_dir}/nation.parquet").take_all()
    target = [r for r in nation if r["n_name"] == nation_name]
    if not target:
        return ray.data.from_arrow(pa.schema(
            [("year", pa.int64()), ("nation_rev_e4", pa.int64()),
             ("total_rev_e4", pa.int64()),
             ("share_e4", pa.int64())]).empty_table())
    target_nk = target[0]["n_nationkey"]
    region_key = target[0]["n_regionkey"]
    region_nks = {r["n_nationkey"] for r in nation
                  if r["n_regionkey"] == region_key}

    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey",
                                       "s_nationkey"]).take_all()
    max_sk = max((r["s_suppkey"] for r in supp), default=-1)
    s_nk = np.full(max_sk + 1, -1, np.int64)
    for r in supp:
        s_nk[r["s_suppkey"]] = r["s_nationkey"]
    lut_ref = ray.put(s_nk)

    def _lines(batch: pa.Table) -> pa.Table:
        s_a = ray.get(lut_ref)
        sk = np.asarray(batch["l_suppkey"], np.int64)
        ok = np.asarray(batch["l_orderkey"], np.int64)
        # inner-join semantics: lines whose supplier misses the dim drop
        m = (sk >= 0) & (sk < s_a.size)
        m[m] &= s_a[sk[m]] >= 0
        ok, sk = ok[m], sk[m]
        price = np.asarray(batch["l_extendedprice"], np.float64)[m]
        disc = np.asarray(batch["l_discount"], np.float64)[m]
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        is_t = (s_a[sk] == target_nk).astype(np.int64)
        uniq, inv = np.unique(ok, return_inverse=True)
        tot = np.bincount(inv, weights=rev.astype(np.float64),
                          minlength=len(uniq))
        tgt = np.bincount(inv, weights=(rev * is_t).astype(np.float64),
                          minlength=len(uniq))
        # per-order e4 sums < 2^53: float64 bincount is exact
        return pa.table({
            "l_orderkey": pa.array(uniq, pa.int64()),
            "tot_e4": pa.array(tot.astype(np.int64), pa.int64()),
            "tgt_e4": pa.array(tgt.astype(np.int64), pa.int64()),
        })

    rk_arr = pa.array(sorted(region_nks), pa.int64())

    def _cust(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(batch["c_nationkey"], pa.int64()),
                        value_set=rk_arr)
        t = batch.filter(keep)
        return pa.table({
            "c_custkey": pc.cast(t["c_custkey"], pa.int64()),
        })

    def _orders(batch: pa.Table) -> pa.Table:
        year = np.asarray(batch["o_orderdate"], "datetime64[us]") \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "year": pa.array(year, pa.int64()),
        })

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).map_batches(
        _cust, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey",
                 "o_orderdate"]).map_batches(
        _orders, batch_format="pyarrow")
    co = hash_join_exchange(orders, cust, key="custkey",
                            left_cols=["o_orderkey", "year"],
                            right_cols=[], n_parts=n_parts,
                            left_key="o_custkey",
                            right_key="c_custkey")
    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]).map_batches(
        _lines, batch_format="pyarrow")
    col = hash_join_exchange(co, lines, key="orderkey",
                             left_cols=["year"],
                             right_cols=["tot_e4", "tgt_e4"],
                             n_parts=n_parts, left_key="o_orderkey",
                             right_key="l_orderkey")
    agg = grouped_sums(col, ["year"], ["tot_e4", "tgt_e4"])

    def _share(batch: pa.Table) -> pa.Table:
        tot = np.asarray(batch["sum_tot_e4"], np.int64)
        tgt = np.asarray(batch["sum_tgt_e4"], np.int64)
        share = np.floor(1e4 * tgt / np.maximum(tot, 1)).astype(np.int64)
        return pa.table({
            "year": batch["year"],
            "nation_rev_e4": pa.array(tgt, pa.int64()),
            "total_rev_e4": pa.array(tot, pa.int64()),
            "share_e4": pa.array(share, pa.int64()),
        })

    return agg.map_batches(_share, batch_format="pyarrow")


_DELAY_SHIFT_DAYS = 100_000


def ship_delay_histogram(sf_dir: str, bucket_days: int = 7):
    """Order→ship latency profile: histogram of (l_shipdate −
    o_orderdate) in ``bucket_days`` buckets — the fulfillment-latency
    rollup that needs the big-big orderkey join before it can aggregate.
    One orderkey exchange (lineitem ⋈ orders ships each projected row
    once), then only (bucket, count) cells move.

    Bucketing shifts delays by +100000 days first: DuckDB's ``//``
    truncates toward zero while numpy floors, so both engines bucket on
    a non-negative operand (where they agree) and shift back. Delays
    below the shift raise rather than silently diverge (the composite
    month-key overflow-guard discipline)."""
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    lhs = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"]).map_batches(
        lambda t: pa.table({
            "okey": pc.cast(t["l_orderkey"], pa.int64()),
            "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
        }), batch_format="pyarrow")
    rhs = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: pa.table({
            "okey": pc.cast(t["o_orderkey"], pa.int64()),
            "order_us": pc.cast(t["o_orderdate"], pa.int64()),
        }), batch_format="pyarrow")
    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions

    joined = hash_join_exchange(lhs, rhs, "okey", ["ship_us"],
                                ["order_us"],
                                resolve_num_partitions(_cfg))

    def _bucket(batch: pa.Table) -> pa.Table:
        import numpy as np

        us = np.asarray(batch["ship_us"], np.int64) \
            - np.asarray(batch["order_us"], np.int64)
        days = us // 86_400_000_000
        if days.size and days.min() < -_DELAY_SHIFT_DAYS:
            raise ValueError("ship delay below the bucket shift — "
                             "raise _DELAY_SHIFT_DAYS")
        b = ((days + _DELAY_SHIFT_DAYS) // bucket_days) * bucket_days \
            - _DELAY_SHIFT_DAYS
        return pa.table({"delay_bucket_days": pa.array(b, pa.int64())})

    return grouped_sums(joined.map_batches(_bucket,
                                           batch_format="pyarrow"),
                        ["delay_bucket_days"], [], count_as="n_items")


def order_fanout_histogram(sf_dir: str):
    """Distribution of lineitems-per-order — the fanout profile that
    sizes the orderkey exchange's skew risk. Two-level aggregate: the
    per-order count rides one orderkey exchange (block partials
    pre-combine), the histogram over those counts is a second tiny cell
    exchange — the same derived-table composition as
    ``order_count_histogram`` one level down."""
    from ..stages.agg import grouped_sums

    per_order = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey"]).map_batches(
            lambda t: pa.table({
                "okey": pc.cast(t["l_orderkey"], pa.int64())}),
            batch_format="pyarrow"),
        ["okey"], [], count_as="n_items")
    return grouped_sums(
        per_order.map_batches(
            lambda t: pa.table({"n_items": t["n_items"]}),
            batch_format="pyarrow"),
        ["n_items"], [], count_as="n_orders")


def order_status_priority_matrix(sf_dir: str):
    """Order count + total value by (status, priority) — the queue-state
    contingency a fulfillment dashboard leads with. Map-only cents
    quantization; |statuses|×|priorities| cells shuffle."""
    from ..stages.agg import grouped_sums

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority",
                 "o_totalprice"]).map_batches(
        lambda t: pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "o_orderpriority": t["o_orderpriority"],
            "cents": pc.cast(pc.round(pc.multiply(
                t["o_totalprice"], pa.scalar(1e2))), pa.int64()),
        }), batch_format="pyarrow")
    out = grouped_sums(ds, ["o_orderstatus", "o_orderpriority"],
                       ["cents"], count_as="n_orders")
    return out.map_batches(
        lambda t: pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "o_orderpriority": t["o_orderpriority"],
            "n_orders": t["n_orders"],
            "total_cents": t["sum_cents"],
        }), batch_format="pyarrow")


GAP_DAYS_SCHEMA = pa.schema([
    ("o_custkey", pa.int64()), ("gap_days", pa.int64()),
])


def _order_gap_rows(part: pa.Table) -> pa.Table:
    """Per-partition inter-order gap kernel: lexsort (custkey, orderdate,
    orderkey), diff within customer, whole days (orderdates are
    midnight-aligned so DuckDB's day-boundary diff equals the floor)."""
    import numpy as np

    if part.num_rows == 0:
        return GAP_DAYS_SCHEMA.empty_table()
    ck = np.asarray(part["o_custkey"], np.int64)
    ts = np.asarray(part["date_us"], np.int64)
    ok = np.asarray(part["o_orderkey"], np.int64)
    order = np.lexsort((ok, ts, ck))
    ck_s, ts_s = ck[order], ts[order]
    same = np.r_[False, ck_s[1:] == ck_s[:-1]]
    gap = ts_s - np.r_[np.int64(0), ts_s[:-1]]
    return pa.table({
        "o_custkey": pa.array(ck_s[same], pa.int64()),
        "gap_days": pa.array(gap[same] // 86_400_000_000, pa.int64()),
    }).cast(GAP_DAYS_SCHEMA)


def customer_order_gap_quantiles(sf_dir: str, qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-market-segment quantiles of a customer's days between
    consecutive orders — the purchase-cadence profile (the relational
    twin of `event_gap_quantiles_by_type`, with the grouping dimension
    living in ANOTHER table). One custkey exchange computes every
    customer's ordered gaps in a single lexsort+diff pass, the gap rows
    (|orders| − |customers|) join segment on the custkey-keyed exchange
    join, and the per-segment quantiles ride the value-histogram
    exchange (bounded by segments × day domain, not order count)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_quantiles_disc
    from ..stages.exchange import exchange_map_groups
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "date_us": pc.cast(batch["o_orderdate"], pa.int64()),
            "o_orderkey": batch["o_orderkey"],
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey"]).map_batches(
        _tag, batch_format="pyarrow")
    gaps = exchange_map_groups(orders, "o_custkey", n_parts,
                               _order_gap_rows, GAP_DAYS_SCHEMA)
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    joined = hash_join_exchange(
        gaps, cust, key="custkey", left_key="o_custkey",
        right_key="c_custkey", left_cols=["gap_days"],
        right_cols=["c_mktsegment"], n_parts=n_parts)
    return grouped_quantiles_disc(joined, "c_mktsegment", "gap_days",
                                  list(qs))


RFM_SCHEMA = pa.schema([
    ("r_tier", pa.int64()), ("f_tier", pa.int64()),
    ("m_tier", pa.int64()), ("n_customers", pa.int64()),
])

_RFM_PER_CUST = pa.schema([
    ("o_custkey", pa.int64()), ("last_us", pa.int64()),
    ("n_orders", pa.int64()), ("cents", pa.int64()),
])


def customer_rfm_segments(sf_dir: str,
                          recency_days=(90, 270),
                          frequency=(12, 9),
                          monetary_cents=(280_000_000, 200_000_000)):
    """RFM segmentation: every customer bucketed into
    (recency, frequency, monetary) tiers — tier 0 best — and counted
    per cell; the classic CRM contingency, all-integer (days since
    the GLOBAL latest order, order count, exact cents). One custkey
    exchange folds each customer's orders into (last_ts, n, cents) in
    a lexsort+reduceat pass; the global anchor date is a Ray `max()`
    over the per-customer table (one tiny column pass); tiering is
    map-only and only ≤ 27 cells ride the final exchange. Thresholds
    are fixed operator parameters (mirrored in the SQL twin), not
    data-dependent quantiles — rerun-stable across shards and sf."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "date_us": pc.cast(batch["o_orderdate"], pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                batch["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        })

    def _per_cust(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _RFM_PER_CUST.empty_table()
        ck = np.asarray(part["o_custkey"], np.int64)
        ts = np.asarray(part["date_us"], np.int64)
        ce = np.asarray(part["cents"], np.int64)
        order = np.argsort(ck, kind="stable")
        ck_s = ck[order]
        starts = np.flatnonzero(np.r_[True, ck_s[1:] != ck_s[:-1]])
        return pa.table({
            "o_custkey": pa.array(ck_s[starts], pa.int64()),
            "last_us": pa.array(np.maximum.reduceat(ts[order], starts),
                                pa.int64()),
            "n_orders": pa.array(
                np.diff(np.r_[starts, len(ck_s)]).astype(np.int64),
                pa.int64()),
            "cents": pa.array(np.add.reduceat(ce[order], starts),
                              pa.int64()),
        }).cast(_RFM_PER_CUST)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"]).map_batches(
        _tag, batch_format="pyarrow")
    per = exchange_map_groups(orders, "o_custkey", n_parts, _per_cust,
                              _RFM_PER_CUST).materialize()
    gmax = per.max("last_us")
    day_us = 86_400_000_000
    r1, r2 = recency_days
    f1, f2 = frequency
    m1, m2 = monetary_cents

    def _tiers(t: pa.Table) -> pa.Table:
        rec = (np.int64(gmax) - np.asarray(t["last_us"], np.int64)) \
            // day_us
        n = np.asarray(t["n_orders"], np.int64)
        ce = np.asarray(t["cents"], np.int64)
        return pa.table({
            "r_tier": pa.array(
                np.where(rec <= r1, 0, np.where(rec <= r2, 1, 2))
                .astype(np.int64), pa.int64()),
            "f_tier": pa.array(
                np.where(n >= f1, 0, np.where(n >= f2, 1, 2))
                .astype(np.int64), pa.int64()),
            "m_tier": pa.array(
                np.where(ce >= m1, 0, np.where(ce >= m2, 1, 2))
                .astype(np.int64), pa.int64()),
        })

    agg = grouped_sums(per.map_batches(_tiers, batch_format="pyarrow"),
                       ["r_tier", "f_tier", "m_tier"],
                       [], count_as="n_customers")
    return agg.map_batches(lambda t: t.cast(RFM_SCHEMA),
                           batch_format="pyarrow")


CROSS_BORDER_SCHEMA = pa.schema([
    ("nation", pa.string()),
    ("local_rev_e4", pa.int64()),
    ("cross_rev_e4", pa.int64()),
])


def _nation_pair_revenue(sf_dir: str):
    """The Q7 trade-flow join spine shared by :func:`cross_border_trade`
    and :func:`nation_flow_matrix`: returns ``(col, nk_name)`` where
    ``col`` is a Dataset of (orderkey-joined) rows carrying the customer
    nationkey ``c_nk``, supplier nationkey ``s_nk`` and the exact-integer
    line revenue ``rev_e4`` already block-combined to one row per
    (orderkey, supp_nation) pair, and ``nk_name`` maps nationkey→name.

    Scale plan mirrors Q8 (`nation_market_share`): orders ⋈ customer on
    custkey carries the customer nationkey; the lineitem side resolves
    supplier→nation through a dense broadcast array and block-combines
    to one (orderkey, supp_nation, rev_e4) partial per pair per block
    BEFORE the orderkey exchange; the final combine keys on the 25-value
    nation pair, so only dim-sized cells move after the two joins.
    Revenue stays exact-integer (cents × discount-percent, e4)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    nation = read_parquet_clean(f"{sf_dir}/nation.parquet").take_all()
    nk_name = {r["n_nationkey"]: r["n_name"] for r in nation}

    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey",
                                       "s_nationkey"]).take_all()
    max_sk = max((r["s_suppkey"] for r in supp), default=-1)
    s_nk = np.full(max_sk + 1, -1, np.int64)
    for r in supp:
        s_nk[r["s_suppkey"]] = r["s_nationkey"]
    lut_ref = ray.put(s_nk)

    def _lines(batch: pa.Table) -> pa.Table:
        s_a = ray.get(lut_ref)
        sk = np.asarray(batch["l_suppkey"], np.int64)
        ok = np.asarray(batch["l_orderkey"], np.int64)
        # inner-join semantics: lines whose supplier misses the dim drop
        m = (sk >= 0) & (sk < s_a.size)
        m[m] &= s_a[sk[m]] >= 0
        ok, sk = ok[m], sk[m]
        price = np.asarray(batch["l_extendedprice"], np.float64)[m]
        disc = np.asarray(batch["l_discount"], np.float64)[m]
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        snk = s_a[sk]
        # block combiner: one row per (orderkey, supp_nation) pair
        key = ok * np.int64(64) + snk        # nationkey < 64 by far
        uniq, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=rev.astype(np.float64),
                          minlength=len(uniq))
        return pa.table({
            "l_orderkey": pa.array(uniq // 64, pa.int64()),
            "s_nk": pa.array(uniq % 64, pa.int64()),
            "rev_e4": pa.array(tot.astype(np.int64), pa.int64()),
        })

    def _cust(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
            "c_nk": pc.cast(batch["c_nationkey"], pa.int64()),
        })

    def _orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
        })

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).map_batches(
        _cust, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"]).map_batches(
        _orders, batch_format="pyarrow")
    co = hash_join_exchange(orders, cust, key="custkey",
                            left_cols=["o_orderkey"],
                            right_cols=["c_nk"], n_parts=n_parts,
                            left_key="o_custkey",
                            right_key="c_custkey")
    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount"]).map_batches(
        _lines, batch_format="pyarrow")
    col = hash_join_exchange(co, lines, key="orderkey",
                             left_cols=["c_nk"],
                             right_cols=["s_nk", "rev_e4"],
                             n_parts=n_parts, left_key="o_orderkey",
                             right_key="l_orderkey")
    return col, nk_name


def cross_border_trade(sf_dir: str):
    """Local vs cross-border revenue per CUSTOMER nation: every lineitem
    is "local" when its supplier sits in the buying customer's nation,
    "cross" otherwise — the trade-flow split under TPC-H Q7's join spine
    (:func:`_nation_pair_revenue`) but aggregated to one row per nation
    with both columns side by side."""
    import numpy as np

    from ..stages.agg import grouped_sums

    col, nk_name = _nation_pair_revenue(sf_dir)

    def _split(batch: pa.Table) -> pa.Table:
        cnk = np.asarray(batch["c_nk"], np.int64)
        snk = np.asarray(batch["s_nk"], np.int64)
        rev = np.asarray(batch["rev_e4"], np.int64)
        local = np.where(cnk == snk, rev, 0)
        return pa.table({
            "c_nk": pa.array(cnk, pa.int64()),
            "local_e4": pa.array(local, pa.int64()),
            "cross_e4": pa.array(rev - local, pa.int64()),
        })

    agg = grouped_sums(col.map_batches(_split, batch_format="pyarrow"),
                       ["c_nk"], ["local_e4", "cross_e4"])

    def _name(batch: pa.Table) -> pa.Table:
        # customers whose nationkey misses the dim drop here — inner-join
        # semantics with the SQL twin (dim-sized Python loop, 25 rows)
        names = [nk_name.get(k) for k in batch["c_nk"].to_pylist()]
        out = pa.table({
            "nation": pa.array(names, pa.string()),
            "local_rev_e4": batch["sum_local_e4"],
            "cross_rev_e4": batch["sum_cross_e4"],
        }).cast(CROSS_BORDER_SCHEMA)
        return out.filter(pc.is_valid(out["nation"]))

    return agg.map_batches(_name, batch_format="pyarrow")


DISCOUNT_PROFILE_SCHEMA = pa.schema([
    ("discount_pct", pa.int64()),
    ("n_lines", pa.int64()),
    ("sum_qty", pa.int64()),
    ("revenue_e4", pa.int64()),
])


def discount_profile(sf_dir: str):
    """Volume and revenue by discount tier (whole percent, 0–10): does
    discounting move quantity? One map-only bucketing over the pruned
    lineitem scan + a dim-bounded grouped_sums; all three measures stay
    exact-integer (qty and cents round per row, revenue =
    cents × (100−pct) at e4)."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _tiers(batch: pa.Table) -> pa.Table:
        disc = np.asarray(batch["l_discount"], np.float64)
        qty = np.asarray(batch["l_quantity"], np.float64)
        price = np.asarray(batch["l_extendedprice"], np.float64)
        pct = np.rint(disc * 100).astype(np.int64)
        cents = np.rint(price * 100).astype(np.int64)
        return pa.table({
            "discount_pct": pa.array(pct, pa.int64()),
            "qty": pa.array(np.rint(qty).astype(np.int64), pa.int64()),
            "rev_e4": pa.array(cents * (100 - pct), pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_discount", "l_quantity",
                                     "l_extendedprice"]).map_batches(
        _tiers, batch_format="pyarrow")
    g = grouped_sums(ds, ["discount_pct"], ["qty", "rev_e4"],
                     count_as="n_lines")
    return g.map_batches(
        lambda t: pa.table({"discount_pct": t["discount_pct"],
                            "n_lines": t["n_lines"],
                            "sum_qty": t["sum_qty"],
                            "revenue_e4": t["sum_rev_e4"]}
                           ).cast(DISCOUNT_PROFILE_SCHEMA),
        batch_format="pyarrow")


TOP_SUPP_SCHEMA = pa.schema([
    ("nation", pa.string()),
    ("s_suppkey", pa.int64()),
    ("revenue_e4", pa.int64()),
    ("rn", pa.int64()),
])


def top_suppliers_per_nation(sf_dir: str, k: int = 3):
    """Top-k suppliers by lineitem revenue WITHIN each nation — the
    grouped-ranking shape (`row_number() OVER (PARTITION BY nation
    ORDER BY rev DESC, suppkey)`) on a joined fact: revenue folds to
    one exact-integer row per supplier (dim-bounded) in a block-combined
    grouped_sums, the supplier→nation hop is a dense broadcast array,
    and `grouped_topk` runs its two-level candidate exchange so only
    ≤ k·keys rows move. Suppliers with no lineitems don't rank
    (inner semantics, same as the SQL join)."""
    import numpy as np

    from ..stages.agg import grouped_sums, grouped_topk

    nation = read_parquet_clean(f"{sf_dir}/nation.parquet").take_all()
    nk_name = {r["n_nationkey"]: r["n_name"] for r in nation}
    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey",
                                       "s_nationkey"]).take_all()
    max_sk = max((r["s_suppkey"] for r in supp), default=-1)
    s_nk = np.full(max_sk + 1, -1, np.int64)
    for r in supp:
        s_nk[r["s_suppkey"]] = r["s_nationkey"]
    lut_ref = ray.put(s_nk)

    def _rev(batch: pa.Table) -> pa.Table:
        sk = np.asarray(batch["l_suppkey"], np.int64)
        price = np.asarray(batch["l_extendedprice"], np.float64)
        disc = np.asarray(batch["l_discount"], np.float64)
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        return pa.table({
            "s_suppkey": pa.array(sk, pa.int64()),
            "rev_e4": pa.array(rev, pa.int64()),
        })

    per_supp = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_suppkey", "l_extendedprice",
                                    "l_discount"]).map_batches(
            _rev, batch_format="pyarrow"),
        ["s_suppkey"], ["rev_e4"])

    def _nation(batch: pa.Table) -> pa.Table:
        s_a = ray.get(lut_ref)
        sk = np.asarray(batch["s_suppkey"], np.int64)
        m = (sk >= 0) & (sk < s_a.size)
        m[m] &= s_a[sk[m]] >= 0
        sk = sk[m]
        rev = np.asarray(batch["sum_rev_e4"], np.int64)[m]
        names = [nk_name.get(int(n)) for n in s_a[sk]]  # dim-sized
        out = pa.table({
            "nation": pa.array(names, pa.string()),
            "s_suppkey": pa.array(sk, pa.int64()),
            "revenue_e4": pa.array(rev, pa.int64()),
        })
        return out.filter(pc.is_valid(out["nation"]))

    scored = per_supp.map_batches(_nation, batch_format="pyarrow")
    ranked = grouped_topk(scored, "nation", "revenue_e4", k,
                          "s_suppkey")
    return ranked.map_batches(
        lambda t: pa.table({"nation": t["nation"],
                            "s_suppkey": t["s_suppkey"],
                            "revenue_e4": t["revenue_e4"],
                            "rn": pc.cast(t["rn"], pa.int64())}
                           ).cast(TOP_SUPP_SCHEMA),
        batch_format="pyarrow")


MONTH_STREAK_SCHEMA = pa.schema([
    ("streak_months", pa.int64()),
    ("n_customers", pa.int64()),
])


def customer_active_month_streaks(sf_dir: str):
    """Longest consecutive-active-MONTH ordering streak per customer
    (month = year·12 + month−1 of o_orderdate), as a histogram — the
    purchase-cadence twin of eventops.user_daily_streaks on the orders
    carrier. One custkey exchange; per partition the (customer, month)
    dedup + island pass is a single lexsort, and per-customer max
    streaks fold with ``np.maximum.reduceat``."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _tag(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["o_orderdate"], "datetime64[us]")
        months = d.astype("datetime64[M]").astype(np.int64)  # epoch-month
        return pa.table({
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "mo": pa.array(months, pa.int64()),
        })

    part_schema = MONTH_STREAK_SCHEMA

    def _streaks(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["o_custkey"], np.int64)
        w = np.asarray(part["mo"], np.int64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (w[1:] != w[:-1])]
        u, w = u[keep], w[keep]
        new_isl = np.r_[True, (u[1:] != u[:-1]) | (np.diff(w) != 1)]
        isl_len = np.diff(np.r_[np.flatnonzero(new_isl), len(u)])
        isl_user = u[new_isl]
        first_isl = np.flatnonzero(
            np.r_[True, isl_user[1:] != isl_user[:-1]])
        mx = np.maximum.reduceat(isl_len, first_isl)
        vals, cnts = np.unique(mx, return_counts=True)
        return pa.table({
            "streak_months": pa.array(vals.astype(np.int64), pa.int64()),
            "n_customers": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey",
                                     "o_orderdate"]).map_batches(
        _tag, batch_format="pyarrow")
    parts = exchange_map_groups(ds, "o_custkey",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _streaks, part_schema)
    g = grouped_sums(parts, ["streak_months"], ["n_customers"])
    return g.map_batches(
        lambda t: pa.table({"streak_months": t["streak_months"],
                            "n_customers": t["sum_n_customers"]}
                           ).cast(MONTH_STREAK_SCHEMA),
        batch_format="pyarrow")


TAX_CHARGE_SCHEMA = pa.schema([
    ("l_returnflag", pa.string()),
    ("l_linestatus", pa.string()),
    ("n_lines", pa.int64()),
    ("charge_e6", pa.int64()),
    ("tax_e6", pa.int64()),
])


def tax_charge_summary(sf_dir: str):
    """Q1's tax leg in exact integers — the only op that touches
    ``l_tax``: per (returnflag, linestatus), the full charge
    ``Σ cents·(100−d)·(100+t)`` and its tax component
    ``Σ cents·(100−d)·t`` (both 1e6-scaled: cents × two whole-percent
    factors). One block-combined grouped_sums; the fact table never
    shuffles, only blocks × 6 partial cells do."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _charge(batch: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(batch["l_extendedprice"],
                                   np.float64) * 100).astype(np.int64)
        d = np.rint(np.asarray(batch["l_discount"],
                               np.float64) * 100).astype(np.int64)
        t = np.rint(np.asarray(batch["l_tax"],
                               np.float64) * 100).astype(np.int64)
        disc = cents * (100 - d)
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "charge_e6": pa.array(disc * (100 + t), pa.int64()),
            "tax_e6": pa.array(disc * t, pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_returnflag", "l_linestatus",
                                    "l_extendedprice", "l_discount",
                                    "l_tax"]).map_batches(
            _charge, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], ["charge_e6", "tax_e6"],
        count_as="n_lines")
    return g.map_batches(
        lambda t: pa.table({"l_returnflag": t["l_returnflag"],
                            "l_linestatus": t["l_linestatus"],
                            "n_lines": t["n_lines"],
                            "charge_e6": t["sum_charge_e6"],
                            "tax_e6": t["sum_tax_e6"]}
                           ).cast(TAX_CHARGE_SCHEMA),
        batch_format="pyarrow")


LINE_INTEGRITY_SCHEMA = pa.schema([
    ("n_lines", pa.int64()),
    ("is_contiguous", pa.int64()),
    ("n_orders", pa.int64()),
])


def order_linenumber_integrity(sf_dir: str):
    """Referential-quality audit of ``l_linenumber``: per order, test
    whether its line numbers are exactly the permutation 1..n via the
    moment fingerprint (count = n, Σln = n(n+1)/2, Σln² =
    n(n+1)(2n+1)/6 — exact for permutations; an adversarial multiset
    matching both moments at the same n would pass, which the SQL twin
    shares by construction), then histogram orders by
    (n_lines, is_contiguous). Shape: one grouped_sums folds the fact to
    per-order moment rows (block partials pre-combine, so the exchange
    carries blocks × orders-per-block rows), a map classifies, and a
    dim-bounded cell fold finishes."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _mom(batch: pa.Table) -> pa.Table:
        ln = np.asarray(batch["l_linenumber"], np.int64)
        return pa.table({
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "ln": pa.array(ln, pa.int64()),
            "ln2": pa.array(ln * ln, pa.int64()),
        })

    per_order = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey",
                                    "l_linenumber"]).map_batches(
            _mom, batch_format="pyarrow"),
        ["l_orderkey"], ["ln", "ln2"], count_as="n")

    def _classify(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n"], np.int64)
        s = np.asarray(batch["sum_ln"], np.int64)
        s2 = np.asarray(batch["sum_ln2"], np.int64)
        ok = (2 * s == n * (n + 1)) & (6 * s2 == n * (n + 1) * (2 * n + 1))
        return pa.table({
            "n_lines": pa.array(n, pa.int64()),
            "is_contiguous": pa.array(ok.astype(np.int64), pa.int64()),
        })

    g = grouped_sums(per_order.map_batches(_classify,
                                           batch_format="pyarrow"),
                     ["n_lines", "is_contiguous"], [],
                     count_as="n_orders")
    return g.map_batches(lambda t: t.cast(LINE_INTEGRITY_SCHEMA),
                         batch_format="pyarrow")


SHIP_MONTH_SCHEMA = pa.schema([
    ("month", pa.int64()),
    ("l_returnflag", pa.string()),
    ("n_lines", pa.int64()),
    ("qty_e2", pa.int64()),
])


def ship_month_profile(sf_dir: str):
    """Shipping seasonality: month-of-year (1–12) × returnflag load
    shape (line count + exact 1e2 quantity mass). Epoch-month modulo
    twelve off the timestamp column; one grouped_sums, 36 cells."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _tag(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["l_shipdate"], "datetime64[us]")
        mo = d.astype("datetime64[M]").astype(np.int64)
        if mo.size and mo.min() < 0:  # pre-1970 needs floor-mod care
            raise ValueError("ship_month_profile: pre-epoch shipdate")
        qty = np.rint(np.asarray(batch["l_quantity"],
                                 np.float64) * 100).astype(np.int64)
        return pa.table({
            "month": pa.array(mo % 12 + 1, pa.int64()),
            "l_returnflag": batch["l_returnflag"],
            "qty_e2": pa.array(qty, pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_shipdate", "l_returnflag",
                                    "l_quantity"]).map_batches(
            _tag, batch_format="pyarrow"),
        ["month", "l_returnflag"], ["qty_e2"], count_as="n_lines")
    return g.map_batches(
        lambda t: pa.table({"month": t["month"],
                            "l_returnflag": t["l_returnflag"],
                            "n_lines": t["n_lines"],
                            "qty_e2": t["sum_qty_e2"]}
                           ).cast(SHIP_MONTH_SCHEMA),
        batch_format="pyarrow")


RETURN_RATE_SCHEMA = pa.schema([
    ("month", pa.int64()),
    ("n_lines", pa.int64()),
    ("n_returned", pa.int64()),
    ("rate_e4", pa.int64()),
])


def return_rate_by_month(sf_dir: str):
    """Return-rate seasonality: per ship month-of-year, line count,
    'R'-flag count, and the exact floor-division rate
    ``returned·10000 // lines``. One grouped_sums over
    (month, returned-indicator) sums — the rate is cell-local, no
    second pass."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _tag(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["l_shipdate"], "datetime64[us]")
        mo = d.astype("datetime64[M]").astype(np.int64)
        if mo.size and mo.min() < 0:
            raise ValueError("return_rate_by_month: pre-epoch shipdate")
        ret = pc.equal(batch["l_returnflag"], "R")
        return pa.table({
            "month": pa.array(mo % 12 + 1, pa.int64()),
            "ret": pc.cast(ret, pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_shipdate",
                                    "l_returnflag"]).map_batches(
            _tag, batch_format="pyarrow"),
        ["month"], ["ret"], count_as="n_lines")

    def _rate(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_lines"], np.int64)
        r = np.asarray(t["sum_ret"], np.int64)
        return pa.table({
            "month": t["month"], "n_lines": t["n_lines"],
            "n_returned": t["sum_ret"],
            "rate_e4": pa.array(r * 10000 // n, pa.int64()),
        }).cast(RETURN_RATE_SCHEMA)

    return g.map_batches(_rate, batch_format="pyarrow")


ACCTBAL_ACTIVITY_SCHEMA = pa.schema([
    ("bal_neg", pa.int64()),
    ("orders_bucket", pa.int64()),
    ("n_customers", pa.int64()),
    ("sum_acctbal_cents", pa.int64()),
])


def acctbal_activity_matrix(sf_dir: str, bucket_cap: int = 10):
    """Credit-risk × activity contingency: customers cross-tabulated by
    account-balance sign and order-count bucket (``least(n_orders,
    cap)``), with the exact cent mass per cell. Shape: one custkey fold
    of orders (block combiner, per-customer counts), a hash-join
    exchange against the customer table (customers are fact-sized at
    100 TB — no broadcast), then a dim-bounded cell fold. Inner join:
    the testdata guarantees every customer has ≥1 order; a customer
    without orders would drop, same as the SQL twin."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    per_cust = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey"]),
        ["o_custkey"], [], count_as="n_orders")

    def _cents(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch["c_acctbal"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({
            "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
            "bal_cents": pa.array(c, pa.int64()),
        })

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey",
                                       "c_acctbal"]).map_batches(
        _cents, batch_format="pyarrow")
    joined = hash_join_exchange(
        per_cust, cust, "custkey", ["n_orders"], ["bal_cents"],
        n_parts, left_key="o_custkey", right_key="c_custkey")

    def _cells(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["n_orders"], np.int64)
        bal = np.asarray(batch["bal_cents"], np.int64)
        return pa.table({
            "bal_neg": pa.array((bal < 0).astype(np.int64), pa.int64()),
            "orders_bucket": pa.array(np.minimum(n, bucket_cap),
                                      pa.int64()),
            "bal_cents": pa.array(bal, pa.int64()),
        })

    g = grouped_sums(joined.map_batches(_cells, batch_format="pyarrow"),
                     ["bal_neg", "orders_bucket"], ["bal_cents"],
                     count_as="n_customers")
    return g.map_batches(
        lambda t: pa.table({"bal_neg": t["bal_neg"],
                            "orders_bucket": t["orders_bucket"],
                            "n_customers": t["n_customers"],
                            "sum_acctbal_cents": t["sum_bal_cents"]}
                           ).cast(ACCTBAL_ACTIVITY_SCHEMA),
        batch_format="pyarrow")


NATION_FLOW_SCHEMA = pa.schema([
    ("cust_nation", pa.string()),
    ("supp_nation", pa.string()),
    ("revenue_e4", pa.int64()),
])


def nation_flow_matrix(sf_dir: str):
    """The full customer-nation × supplier-nation trade-flow matrix
    (25×25 cells, exact e4 revenue) — :func:`cross_border_trade`'s
    local/cross split un-collapsed. Rides the shared Q7 spine
    (:func:`_nation_pair_revenue`); after the two joins only the
    dim-bounded nation-pair cells move. Rows whose customer nationkey
    misses the dim drop (inner-join discipline)."""
    import numpy as np

    from ..stages.agg import grouped_sums

    col, nk_name = _nation_pair_revenue(sf_dir)
    agg = grouped_sums(col, ["c_nk", "s_nk"], ["rev_e4"])

    def _name(batch: pa.Table) -> pa.Table:
        cn = [nk_name.get(k) for k in batch["c_nk"].to_pylist()]
        sn = [nk_name.get(k) for k in batch["s_nk"].to_pylist()]
        out = pa.table({
            "cust_nation": pa.array(cn, pa.string()),
            "supp_nation": pa.array(sn, pa.string()),
            "revenue_e4": batch["sum_rev_e4"],
        }).cast(NATION_FLOW_SCHEMA)
        return out.filter(pc.and_(pc.is_valid(out["cust_nation"]),
                                  pc.is_valid(out["supp_nation"])))

    return agg.map_batches(_name, batch_format="pyarrow")


PARETO_SCHEMA = pa.schema([
    ("p_pct", pa.int64()),
    ("n_customers", pa.int64()),
    ("cum_cents", pa.int64()),
])


def revenue_pareto_customers(sf_dir: str,
                             ps: tuple = (50, 80, 90, 95)):
    """Revenue concentration (the Pareto curve): for each coverage
    target p, the smallest count of top customers (by exact order-value
    cents, custkey tiebreak) whose cumulative cents reach p% of total
    — tested as ``cum·100 ≥ p·total`` in integers, never a float
    share. The per-customer fold is distributed; the ranked cumsum
    walks the dim-bounded per-customer table driver-side (the
    user_value_deciles contract)."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    def _cents(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch["o_totalprice"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "cents": pa.array(c, pa.int64()),
        })

    per = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey",
                                    "o_totalprice"]).map_batches(
            _cents, batch_format="pyarrow"),
        ["o_custkey"], ["cents"]).take_all()
    if not per:
        return ray.data.from_arrow(PARETO_SCHEMA.empty_table())
    ck = np.array([r["o_custkey"] for r in per], np.int64)
    c = np.array([r["sum_cents"] for r in per], np.int64)
    order = np.lexsort((ck, -c))
    cum = np.cumsum(c[order])
    tot = int(cum[-1])
    out_p, out_n, out_c = [], [], []
    for p in ps:
        # smallest rank with cum*100 >= p*tot (exact integers)
        k = int(np.searchsorted(cum * 100, p * tot))
        out_p.append(int(p))
        out_n.append(k + 1)
        out_c.append(int(cum[k]))
    return ray.data.from_arrow(pa.table({
        "p_pct": pa.array(out_p, pa.int64()),
        "n_customers": pa.array(out_n, pa.int64()),
        "cum_cents": pa.array(out_c, pa.int64()),
    }).cast(PARETO_SCHEMA))


ALL_PRIO_SCHEMA = pa.schema([
    ("c_mktsegment", pa.string()),
    ("n_customers", pa.int64()),
    ("n_cover_all", pa.int64()),
])


def customers_all_priorities(sf_dir: str):
    """Relational division per market segment: how many of a segment's
    (ordering) customers have placed orders in EVERY order-priority
    class that exists corpus-wide. The (custkey, priority) distinct
    pass is one grouped fold (block combiner — dup pairs collapse
    before the exchange), the per-customer coverage count a second
    dim-bounded fold, then a hash-join exchange against the customer
    fact carries the segment; the global priority count rides in as a
    driver scalar (dim-bounded distinct)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderpriority"])
    pairs = grouped_sums(orders, ["o_custkey", "o_orderpriority"], [])
    n_prio = len({r["o_orderpriority"]
                  for r in grouped_sums(
                      orders.select_columns(["o_orderpriority"]),
                      ["o_orderpriority"], []).take_all()})
    per_cust = grouped_sums(pairs.select_columns(["o_custkey"]),
                            ["o_custkey"], [], count_as="np")

    def _cust(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
            "c_mktsegment": batch["c_mktsegment"],
        })

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey",
                                       "c_mktsegment"]).map_batches(
        _cust, batch_format="pyarrow")
    joined = hash_join_exchange(per_cust, cust, "custkey", ["np"],
                                ["c_mktsegment"], n_parts,
                                left_key="o_custkey",
                                right_key="c_custkey")

    def _flag(batch: pa.Table) -> pa.Table:
        cov = np.asarray(batch["np"], np.int64)
        return pa.table({
            "c_mktsegment": batch["c_mktsegment"],
            "cover": pa.array((cov == n_prio).astype(np.int64),
                              pa.int64()),
        })

    g = grouped_sums(joined.map_batches(_flag, batch_format="pyarrow"),
                     ["c_mktsegment"], ["cover"],
                     count_as="n_customers")
    return g.map_batches(
        lambda t: pa.table({"c_mktsegment": t["c_mktsegment"],
                            "n_customers": t["n_customers"],
                            "n_cover_all": t["sum_cover"]}
                           ).cast(ALL_PRIO_SCHEMA),
        batch_format="pyarrow")


TOP_VALUES_SCHEMA = pa.schema([
    ("o_orderpriority", pa.string()),
    ("cents", pa.int64()),
    ("n_orders", pa.int64()),
    ("rn", pa.int64()),
])


def top3_order_values_by_priority(sf_dir: str, k: int = 3):
    """Tie-aware ranking: the top-k DISTINCT order values per priority
    class with the count of orders hitting each — ``dense_rank()`` over
    values, expressed as row_number over the deduplicated (priority,
    cents) fold (values are unique within a class after the fold, so
    both ranks coincide and no tiebreak ambiguity exists). The fold's
    block combiner collapses dup values before the exchange; the
    ranking exchange then moves ≤ k·classes candidate rows."""
    import numpy as np

    from ..stages.agg import grouped_sums, grouped_topk

    def _cents(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch["o_totalprice"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({
            "o_orderpriority": batch["o_orderpriority"],
            "cents": pa.array(c, pa.int64()),
        })

    d = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderpriority",
                                    "o_totalprice"]).map_batches(
            _cents, batch_format="pyarrow"),
        ["o_orderpriority", "cents"], [], count_as="n_orders")
    ranked = grouped_topk(d, "o_orderpriority", "cents", k, "n_orders")
    return ranked.map_batches(
        lambda t: pa.table({"o_orderpriority": t["o_orderpriority"],
                            "cents": t["cents"],
                            "n_orders": t["n_orders"],
                            "rn": pc.cast(t["rn"], pa.int64())}
                           ).cast(TOP_VALUES_SCHEMA),
        batch_format="pyarrow")


NATION_SHARE_SCHEMA = pa.schema([
    ("region", pa.string()),
    ("nation", pa.string()),
    ("revenue_cents", pa.int64()),
    ("share_e4", pa.int64()),
])


def nation_share_within_region(sf_dir: str):
    """Percent-of-parent rollup: each nation's exact order-value cents
    and its floor-division share of its REGION's total (1e4 units).
    Orders hash-join the customer fact on custkey; the customer's
    nation→region hop is a dense broadcast array; the share
    normalization walks the 25 dim-bounded cells driver-side."""
    import numpy as np

    import ray.data

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    nation = read_parquet_clean(f"{sf_dir}/nation.parquet").take_all()
    region = read_parquet_clean(f"{sf_dir}/region.parquet").take_all()
    nk_name = {r["n_nationkey"]: r["n_name"] for r in nation}
    nk_rk = {r["n_nationkey"]: r["n_regionkey"] for r in nation}
    rk_name = {r["r_regionkey"]: r["r_name"] for r in region}

    def _ord(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch["o_totalprice"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "cents": pa.array(c, pa.int64()),
        })

    def _cust(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
            "c_nk": pc.cast(batch["c_nationkey"], pa.int64()),
        })

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey",
                                         "o_totalprice"]).map_batches(
        _ord, batch_format="pyarrow")
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey",
                                       "c_nationkey"]).map_batches(
        _cust, batch_format="pyarrow")
    joined = hash_join_exchange(orders, cust, "custkey", ["cents"],
                                ["c_nk"], n_parts,
                                left_key="o_custkey",
                                right_key="c_custkey")
    cells = grouped_sums(joined, ["c_nk"], ["cents"]).take_all()
    rows = []
    for r in cells:
        nk = r["c_nk"]
        if nk in nk_name and nk_rk.get(nk) in rk_name:  # inner drop
            rows.append((rk_name[nk_rk[nk]], nk_name[nk],
                         r["sum_cents"]))
    totals: dict = {}
    for reg, _, cents in rows:
        totals[reg] = totals.get(reg, 0) + cents
    rows.sort()
    return ray.data.from_arrow(pa.table({
        "region": pa.array([r[0] for r in rows], pa.string()),
        "nation": pa.array([r[1] for r in rows], pa.string()),
        "revenue_cents": pa.array([r[2] for r in rows], pa.int64()),
        "share_e4": pa.array([r[2] * 10000 // totals[r[0]]
                              for r in rows], pa.int64()),
    }).cast(NATION_SHARE_SCHEMA))


CUBE_SCHEMA = pa.schema([
    ("o_orderpriority", pa.string()),
    ("o_orderstatus", pa.string()),
    ("n_orders", pa.int64()),
    ("cents", pa.int64()),
])


def priority_status_cube(sf_dir: str):
    """GROUP BY CUBE (priority, status): all four grouping sets —
    (p,s), (p,·), (·,s), (·,·) — in ONE fact pass: grouped_sums reduces
    to the ≤ |priorities|·|statuses| base cells and the three margin
    levels expand from that dim-bounded cell table on the driver.
    Subtotal marker is '*' (COALESCE in the SQL twin) so no NULL rides
    the hash compare."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    def _cents(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch["o_totalprice"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({
            "o_orderpriority": batch["o_orderpriority"],
            "o_orderstatus": batch["o_orderstatus"],
            "cents": pa.array(c, pa.int64()),
        })

    cells = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderpriority", "o_orderstatus",
                                    "o_totalprice"]).map_batches(
            _cents, batch_format="pyarrow"),
        ["o_orderpriority", "o_orderstatus"], ["cents"],
        count_as="n").take_all()
    out: dict = {}
    for r in cells:
        for key in ((r["o_orderpriority"], r["o_orderstatus"]),
                    (r["o_orderpriority"], "*"),
                    ("*", r["o_orderstatus"]),
                    ("*", "*")):
            n, c = out.get(key, (0, 0))
            out[key] = (n + r["n"], c + r["sum_cents"])
    keys = sorted(out)
    return ray.data.from_arrow(pa.table({
        "o_orderpriority": pa.array([k[0] for k in keys], pa.string()),
        "o_orderstatus": pa.array([k[1] for k in keys], pa.string()),
        "n_orders": pa.array([out[k][0] for k in keys], pa.int64()),
        "cents": pa.array([out[k][1] for k in keys], pa.int64()),
    }).cast(CUBE_SCHEMA))


ABOVE_NATION_SCHEMA = pa.schema([
    ("nation", pa.string()),
    ("n_orders", pa.int64()),
    ("n_above_avg", pa.int64()),
])


def orders_above_nation_avg(sf_dir: str):
    """Theta self-comparison: per nation, how many orders are STRICTLY
    above that nation's average order value — decided by the integer
    cross-multiply ``cents·n > sum_cents`` (never a float average, so
    both engines agree bit-for-bit). Two passes over the same joined
    rows: the custkey hash-join exchange is materialized once, pass one
    folds (n, sum) per nation (dim-bounded — it broadcasts back inside
    the second map), pass two counts the strict winners."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    nation = read_parquet_clean(f"{sf_dir}/nation.parquet").take_all()
    nk_name = {r["n_nationkey"]: r["n_name"] for r in nation}

    def _ord(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch["o_totalprice"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "cents": pa.array(c, pa.int64()),
        })

    def _cust(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
            "c_nk": pc.cast(batch["c_nationkey"], pa.int64()),
        })

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey",
                                         "o_totalprice"]).map_batches(
        _ord, batch_format="pyarrow")
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey",
                                       "c_nationkey"]).map_batches(
        _cust, batch_format="pyarrow")
    joined = hash_join_exchange(orders, cust, "custkey", ["cents"],
                                ["c_nk"], n_parts,
                                left_key="o_custkey",
                                right_key="c_custkey").materialize()
    stats = {r["c_nk"]: (r["n"], r["sum_cents"])
             for r in grouped_sums(joined, ["c_nk"], ["cents"],
                                   count_as="n").take_all()}
    max_nk = max(stats, default=-1)
    n_arr = np.zeros(max_nk + 1, np.int64)
    s_arr = np.zeros(max_nk + 1, np.int64)
    for k, (n, s) in stats.items():
        n_arr[k], s_arr[k] = n, s
    thr_ref = ray.put((n_arr, s_arr))

    def _above(batch: pa.Table) -> pa.Table:
        n_a, s_a = ray.get(thr_ref)
        nk = np.asarray(batch["c_nk"], np.int64)
        c = np.asarray(batch["cents"], np.int64)
        above = c * n_a[nk] > s_a[nk]
        return pa.table({
            "c_nk": pa.array(nk, pa.int64()),
            "above": pa.array(above.astype(np.int64), pa.int64()),
        })

    g = grouped_sums(joined.map_batches(_above, batch_format="pyarrow"),
                     ["c_nk"], ["above"], count_as="n_orders")

    def _name(batch: pa.Table) -> pa.Table:
        names = [nk_name.get(k) for k in batch["c_nk"].to_pylist()]
        out = pa.table({
            "nation": pa.array(names, pa.string()),
            "n_orders": batch["n_orders"],
            "n_above_avg": batch["sum_above"],
        }).cast(ABOVE_NATION_SCHEMA)
        return out.filter(pc.is_valid(out["nation"]))

    return g.map_batches(_name, batch_format="pyarrow")


SEG_QUANTILE_SCHEMA = pa.schema([
    ("c_mktsegment", pa.string()),
    ("q", pa.float64()),
    ("cents", pa.int64()),
])


def order_value_quantiles_by_segment(sf_dir: str,
                                     qs=(0.25, 0.5, 0.75, 0.9)):
    """Exact discrete order-value quantiles per market segment — the
    join-then-quantile composition: orders hash-join the customer fact
    on custkey to pick up the segment, then the shared grouped
    value-histogram quantile reduces (segment × distinct cents)
    partials, never the order rows."""
    import numpy as np

    import ray.data

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_quantiles_disc
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _ord(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch["o_totalprice"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "cents": pa.array(c, pa.int64()),
        })

    def _cust(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
            "c_mktsegment": batch["c_mktsegment"],
        })

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey",
                                         "o_totalprice"]).map_batches(
        _ord, batch_format="pyarrow")
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey",
                                       "c_mktsegment"]).map_batches(
        _cust, batch_format="pyarrow")
    joined = hash_join_exchange(orders, cust, "custkey", ["cents"],
                                ["c_mktsegment"], n_parts,
                                left_key="o_custkey",
                                right_key="c_custkey")
    tbl = grouped_quantiles_disc(joined, "c_mktsegment", "cents",
                                 list(qs))
    return ray.data.from_arrow(pa.table({
        "c_mktsegment": tbl["c_mktsegment"],
        "q": tbl["q"],
        "cents": tbl["value"],
    }).cast(SEG_QUANTILE_SCHEMA))


CHURN_SCHEMA = pa.schema([
    ("quarter", pa.int64()),
    ("n_active", pa.int64()),
    ("n_churned", pa.int64()),
    ("churn_e4", pa.int64()),
])


def customer_churn_by_quarter(sf_dir: str):
    """Quarter-over-quarter churn: for every epoch-quarter before the
    last, how many of its active customers place NO order the next
    quarter (exact floor rate, 1e4). The distinct (custkey, quarter)
    fold block-combines before one custkey exchange; inside a partition
    churn detection is the next-row test on the lexsorted pairs and each
    partition leaves only quarter-cell partials. The global max quarter
    rides in as a driver scalar (dim-bounded fold)."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _tag(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["o_orderdate"], "datetime64[us]")
        m = d.astype("datetime64[M]").astype(np.int64)
        if m.size and m.min() < 0:
            raise ValueError("customer_churn_by_quarter: pre-epoch date")
        q = (m // 12) * 4 + (m % 12) // 3
        return pa.table({
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "q": pa.array(q, pa.int64()),
        })

    pairs = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey",
                                    "o_orderdate"]).map_batches(
            _tag, batch_format="pyarrow"),
        ["o_custkey", "q"], []).materialize()
    max_q = max(r["q"] for r in grouped_sums(
        pairs.select_columns(["q"]), ["q"], []).take_all())

    cell_schema = pa.schema([("quarter", pa.int64()),
                             ("active", pa.int64()),
                             ("churned", pa.int64())])

    def _cells(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return cell_schema.empty_table()
        u = np.asarray(part["o_custkey"], np.int64)
        q = np.asarray(part["q"], np.int64)
        order = np.lexsort((q, u))
        u, q = u[order], q[order]
        live = q < max_q                      # churn defined before last
        nxt_same = np.r_[(u[1:] == u[:-1]) & (q[1:] == q[:-1] + 1),
                         False]
        churned = live & ~nxt_same
        qs = q[live]
        vals_a, cnt_a = np.unique(qs, return_counts=True)
        vals_c, cnt_c = np.unique(q[churned], return_counts=True)
        c_map = dict(zip(vals_c.tolist(), cnt_c.tolist()))
        return pa.table({
            "quarter": pa.array(vals_a, pa.int64()),
            "active": pa.array(cnt_a.astype(np.int64), pa.int64()),
            "churned": pa.array(
                np.array([c_map.get(v, 0) for v in vals_a.tolist()],
                         np.int64), pa.int64()),
        })

    parts = exchange_map_groups(pairs, "o_custkey",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _cells, cell_schema)
    g = grouped_sums(parts, ["quarter"], ["active", "churned"])

    def _rate(t: pa.Table) -> pa.Table:
        a = np.asarray(t["sum_active"], np.int64)
        c = np.asarray(t["sum_churned"], np.int64)
        return pa.table({
            "quarter": t["quarter"],
            "n_active": t["sum_active"],
            "n_churned": t["sum_churned"],
            "churn_e4": pa.array(c * 10000 // a, pa.int64()),
        }).cast(CHURN_SCHEMA)

    return g.map_batches(_rate, batch_format="pyarrow")


AFFINITY_SCHEMA = pa.schema([
    ("c_mktsegment", pa.string()),
    ("o_orderpriority", pa.string()),
    ("n_orders", pa.int64()),
    ("share_e4", pa.int64()),
])


def customer_priority_affinity(sf_dir: str):
    """Segment × priority mix: order counts per cell and each cell's
    exact floor share of its SEGMENT's orders (1e4) — does a market
    segment skew toward urgent orders? Custkey hash-join exchange picks
    up the segment; the 25 cells normalize driver-side."""
    import numpy as np

    import ray.data

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderpriority"])

    def _cust(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
            "c_mktsegment": batch["c_mktsegment"],
        })

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey",
                                       "c_mktsegment"]).map_batches(
        _cust, batch_format="pyarrow")
    joined = hash_join_exchange(orders, cust, "custkey",
                                ["o_orderpriority"], ["c_mktsegment"],
                                n_parts, left_key="o_custkey",
                                right_key="c_custkey")
    cells = grouped_sums(joined, ["c_mktsegment", "o_orderpriority"],
                         [], count_as="n").take_all()
    totals: dict = {}
    for r in cells:
        totals[r["c_mktsegment"]] = (totals.get(r["c_mktsegment"], 0)
                                     + r["n"])
    cells.sort(key=lambda r: (r["c_mktsegment"], r["o_orderpriority"]))
    return ray.data.from_arrow(pa.table({
        "c_mktsegment": pa.array([r["c_mktsegment"] for r in cells],
                                 pa.string()),
        "o_orderpriority": pa.array([r["o_orderpriority"]
                                     for r in cells], pa.string()),
        "n_orders": pa.array([r["n"] for r in cells], pa.int64()),
        "share_e4": pa.array(
            [r["n"] * 10000 // totals[r["c_mktsegment"]] for r in cells],
            pa.int64()),
    }).cast(AFFINITY_SCHEMA))


BRAND_SPREAD_SCHEMA = pa.schema([
    ("p_brand", pa.string()),
    ("n_parts", pa.int64()),
    ("min_cents", pa.int64()),
    ("max_cents", pa.int64()),
])


def part_brand_price_spread(sf_dir: str):
    """Retail-price spread per brand: part count + exact min/max cents
    — one grouped_minmax block-combined fold over the part table (min
    of minima / max of maxima are exact for any distribution)."""
    import numpy as np

    from ..stages.agg import grouped_minmax

    def _cents(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch["p_retailprice"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({
            "p_brand": batch["p_brand"],
            "cents": pa.array(c, pa.int64()),
        })

    g = grouped_minmax(
        read_parquet_clean(f"{sf_dir}/part.parquet",
                           columns=["p_brand",
                                    "p_retailprice"]).map_batches(
            _cents, batch_format="pyarrow"),
        ["p_brand"], "cents", count_as="n_parts")
    return g.map_batches(
        lambda t: pa.table({"p_brand": t["p_brand"],
                            "n_parts": t["n_parts"],
                            "min_cents": t["min_cents"],
                            "max_cents": t["max_cents"]}
                           ).cast(BRAND_SPREAD_SCHEMA),
        batch_format="pyarrow")


BENFORD_SCHEMA = pa.schema([
    ("first_digit", pa.int64()),
    ("n_orders", pa.int64()),
    ("share_e4", pa.int64()),
])


def benford_first_digit_orders(sf_dir: str):
    """Benford's-law audit: the distribution of the FIRST significant
    digit of the order value in cents (fabricated ledgers skew uniform;
    organic ones decay ~log10(1+1/d)). The digit is integer math —
    divide by 10 until one digit is left — so both engines agree
    bit-for-bit; one grouped fold + a 9-cell driver share pass."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    def _digit(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch["o_totalprice"],
                               np.float64) * 100).astype(np.int64)
        if c.size and c.min() <= 0:
            raise ValueError("benford: non-positive order value")
        # first significant digit by repeated integer division
        while np.any(c >= 10):
            c = np.where(c >= 10, c // 10, c)
        return pa.table({"first_digit": pa.array(c, pa.int64())})

    cells = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_totalprice"]).map_batches(
            _digit, batch_format="pyarrow"),
        ["first_digit"], [], count_as="n").take_all()
    total = sum(r["n"] for r in cells)
    cells.sort(key=lambda r: r["first_digit"])
    return ray.data.from_arrow(pa.table({
        "first_digit": pa.array([r["first_digit"] for r in cells],
                                pa.int64()),
        "n_orders": pa.array([r["n"] for r in cells], pa.int64()),
        "share_e4": pa.array([r["n"] * 10000 // total for r in cells],
                             pa.int64()),
    }).cast(BENFORD_SCHEMA))


UNIT_PRICE_SCHEMA = pa.schema([
    ("p_brand", pa.string()),
    ("q", pa.float64()),
    ("unit_cents", pa.int64()),
])


def unit_price_quantiles_by_brand(sf_dir: str,
                                  qs=(0.25, 0.5, 0.75, 0.9)):
    """Per-brand unit-price spread: exact discrete quantiles of
    ``price_cents // qty`` (integer floor — the only per-unit price
    both engines compute identically) per part brand. The part→brand
    hop is a dense broadcast array over the pruned lineitem scan; the
    shared grouped value-histogram quantile reduces
    (brand × distinct unit price) partials, never the fact rows.
    Zero-quantity lines would be dropped (guard matches the SQL
    ``WHERE qty > 0``)."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_quantiles_disc

    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey",
                                       "p_brand"]).take_all()
    max_pk = max((r["p_partkey"] for r in part), default=-1)
    brands = sorted({r["p_brand"] for r in part})
    b_idx = {b: i for i, b in enumerate(brands)}
    pk_b = np.full(max_pk + 1, -1, np.int64)
    for r in part:
        pk_b[r["p_partkey"]] = b_idx[r["p_brand"]]
    lut_ref = ray.put(pk_b)

    def _unit(batch: pa.Table) -> pa.Table:
        b_a = ray.get(lut_ref)
        pk = np.asarray(batch["l_partkey"], np.int64)
        qty = np.rint(np.asarray(batch["l_quantity"],
                                 np.float64)).astype(np.int64)
        cents = np.rint(np.asarray(batch["l_extendedprice"],
                                   np.float64) * 100).astype(np.int64)
        m = (pk >= 0) & (pk < b_a.size) & (qty > 0)
        m[m] &= b_a[pk[m]] >= 0
        bi = b_a[pk[m]]
        return pa.table({
            "brand_i": pa.array(bi, pa.int64()),
            "unit_cents": pa.array(cents[m] // qty[m], pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_partkey", "l_quantity",
                                     "l_extendedprice"]).map_batches(
        _unit, batch_format="pyarrow")
    tbl = grouped_quantiles_disc(ds, "brand_i", "unit_cents", list(qs))
    bi = tbl["brand_i"].to_pylist()
    return ray.data.from_arrow(pa.table({
        "p_brand": pa.array([brands[i] for i in bi], pa.string()),
        "q": tbl["q"],
        "unit_cents": tbl["value"],
    }).cast(UNIT_PRICE_SCHEMA))


DELTA_HIST_SCHEMA = pa.schema([
    ("sign", pa.int64()),
    ("magnitude", pa.int64()),
    ("n_deltas", pa.int64()),
])


def order_value_delta_histogram(sf_dir: str):
    """Purchase-trajectory shape: for every customer's consecutive
    order pair (ordered by o_orderdate, o_orderkey), the CHANGE in
    order value, histogrammed by (sign, decimal magnitude of the cent
    delta) — are repeat purchases trending up or down, and by how many
    orders of magnitude. Exact-integer throughout: cents before the
    diff, digit count via one searchsorted against powers of ten
    (0-delta → magnitude 0, matching ``length(CAST(abs(d) AS
    VARCHAR))`` in the SQL twin). One custkey exchange computes every
    customer's deltas in a lexsort+shift pass and folds them to ≤ 3×19
    (sign, magnitude) partial cells per partition; the fact rows never
    re-shuffle."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    pow10 = np.array([10 ** k for k in range(1, 19)], np.int64)
    part_schema = pa.schema([("sign", pa.int64()),
                             ("magnitude", pa.int64()),
                             ("n", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "date_us": pc.cast(batch["o_orderdate"], pa.int64()),
            "o_orderkey": batch["o_orderkey"],
            "cents": pc.cast(pc.round(pc.multiply(
                batch["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        })

    def _deltas(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return part_schema.empty_table()
        ck = np.asarray(part["o_custkey"], np.int64)
        dt = np.asarray(part["date_us"], np.int64)
        ok = np.asarray(part["o_orderkey"], np.int64)
        ce = np.asarray(part["cents"], np.int64)
        order = np.lexsort((ok, dt, ck))
        ck_s, c_s = ck[order], ce[order]
        same = ck_s[1:] == ck_s[:-1]
        d = (c_s[1:] - c_s[:-1])[same]
        if d.size == 0:
            return part_schema.empty_table()
        sign = np.sign(d).astype(np.int64)
        mag = np.where(
            d == 0, 0,
            np.searchsorted(pow10, np.abs(d), side="right") + 1)
        key = (sign + 1) * 32 + mag
        uk, n = np.unique(key, return_counts=True)
        return pa.table({
            "sign": pa.array(uk // 32 - 1, pa.int64()),
            "magnitude": pa.array(uk % 32, pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey",
                 "o_totalprice"]).map_batches(_tag,
                                              batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "o_custkey", n_parts, _deltas,
                                part_schema)
    return grouped_sums(parts, ["sign", "magnitude"], ["n"]).map_batches(
        lambda t: pa.table({"sign": t["sign"],
                            "magnitude": t["magnitude"],
                            "n_deltas": t["sum_n"]}).cast(
            DELTA_HIST_SCHEMA),
        batch_format="pyarrow")


ABOVE_MEDIAN_SCHEMA = pa.schema([
    ("o_orderpriority", pa.string()),
    ("n_orders", pa.int64()),
])


def orders_above_customer_median(sf_dir: str):
    """Self-referential threshold count: orders STRICTLY above their
    own customer's discrete median order value (exact cents,
    ``quantile_disc(0.5)`` lower-median semantics: element at
    ⌈n/2⌉−1 of the sorted values), counted per priority — the 'which
    priorities carry a customer's above-typical spend' profile. One
    custkey exchange computes every customer's median AND the per-row
    comparison in a single lexsort pass (median index per user run,
    repeat, compare); only ≤ priorities cells leave each partition."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..functions.segscore import _to_bytes_array
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("o_orderpriority", pa.string()),
                             ("n", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "cents": pc.cast(pc.round(pc.multiply(
                batch["o_totalprice"], pa.scalar(100.0))), pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
        })

    def _above(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        ck = np.asarray(part["o_custkey"], np.int64)
        ce = np.asarray(part["cents"], np.int64)
        pcol = part["o_orderpriority"].combine_chunks()
        order = np.lexsort((ce, ck))
        ck_s, ce_s = ck[order], ce[order]
        starts = np.flatnonzero(np.r_[True, ck_s[1:] != ck_s[:-1]])
        counts = np.diff(np.r_[starts, len(ck_s)])
        # quantile_disc(0.5): sorted value at ceil(n/2)-1 per customer
        med = ce_s[starts + (counts + 1) // 2 - 1]
        above = ce_s > np.repeat(med, counts)
        if not above.any():
            return part_schema.empty_table()
        idx = order[above]
        pb = _to_bytes_array(pcol)[idx]
        po = np.argsort(pb, kind="stable")
        pb_s = pb[po]
        st = np.flatnonzero(np.r_[True, pb_s[1:] != pb_s[:-1]])
        n = np.diff(np.r_[st, len(pb_s)])
        return pa.table({
            "o_orderpriority": pcol.take(
                pa.array(idx[po[st]], pa.int64())),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice",
                 "o_orderpriority"]).map_batches(
        _tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "o_custkey", n_parts, _above,
                                part_schema)
    g = grouped_sums(parts, ["o_orderpriority"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"o_orderpriority": t["o_orderpriority"],
                            "n_orders": t["sum_n"]}).cast(
            ABOVE_MEDIAN_SCHEMA),
        batch_format="pyarrow")


WEEKDAY_PRIORITY_SCHEMA = pa.schema([
    ("isodow", pa.int64()),
    ("o_orderpriority", pa.string()),
    ("n_orders", pa.int64()),
])


def order_weekday_priority_matrix(sf_dir: str):
    """Order-intake seasonality matrix: ISO weekday (1 = Monday) ×
    priority counts — does urgency cluster on particular weekdays.
    ISO dow from the epoch-day via ((day + 3) mod 7) + 1 (1970-01-01
    is a Thursday), exactly DuckDB's ``isodow()``; one map +
    partial-combining exchange of ≤ 7 × priorities cells."""
    from ..stages.agg import grouped_sums

    import numpy as np

    def _dow(batch: pa.Table) -> pa.Table:
        day = np.asarray(
            batch["o_orderdate"].combine_chunks().cast(pa.int64()),
            np.int64) // 86_400_000_000
        return pa.table({
            "isodow": pa.array((day + 3) % 7 + 1, pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderdate",
                                    "o_orderpriority"]).map_batches(
            _dow, batch_format="pyarrow"),
        ["isodow", "o_orderpriority"], [], count_as="n_orders")
    return g.map_batches(lambda t: t.cast(WEEKDAY_PRIORITY_SCHEMA),
                         batch_format="pyarrow")


SUPP_DIVERSITY_SCHEMA = pa.schema([
    ("n_suppliers", pa.int64()),
    ("n_parts", pa.int64()),
])


def part_supplier_diversity_histogram(sf_dir: str):
    """Sourcing-redundancy audit: distinct suppliers per part,
    histogrammed — single-sourced SKUs are the supply-chain risk tier.
    ``grouped_distinct_count`` ships only distinct (part, supplier)
    combos (never the fact rows), and the final histogram exchange
    carries ≤ distinct diversity levels."""
    from ..stages.agg import grouped_distinct_count, grouped_sums

    per_part = grouped_distinct_count(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey", "l_suppkey"]),
        ["l_partkey"], "l_suppkey", distinct_as="n_suppliers")
    g = grouped_sums(per_part.select_columns(["n_suppliers"]),
                     ["n_suppliers"], [], count_as="n_parts")
    return g.map_batches(lambda t: t.cast(SUPP_DIVERSITY_SCHEMA),
                         batch_format="pyarrow")


DEMAND_HIST_SCHEMA = pa.schema([
    ("p_brand", pa.string()),
    ("n_lineitems", pa.int64()),
    ("n_parts", pa.int64()),
])


def part_demand_histogram(sf_dir: str):
    """SKU-velocity tiers: per brand, the histogram of lineitem counts
    per part — demand concentration at the part grain (the part-side
    twin of ``order_fanout_histogram``). Stage 1 reduces the fact rows
    to ≤ |parts| (partkey, count) cells via the partial-combining
    ``grouped_sums``; stage 2 hops part→brand through the broadcast
    dimension array (inner-join semantics per the FK-broken
    discipline: unmatched partkeys DROP, mirroring the SQL JOIN) and a
    second tiny ``grouped_sums`` folds the cells to ≤ brands ×
    distinct-counts rows."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    part = read_parquet_clean(f"{sf_dir}/part.parquet",
                              columns=["p_partkey",
                                       "p_brand"]).take_all()
    max_pk = max((r["p_partkey"] for r in part), default=-1)
    brands = sorted({r["p_brand"] for r in part})
    b_idx = {b: i for i, b in enumerate(brands)}
    pk_b = np.full(max_pk + 1, -1, np.int64)
    for r in part:
        pk_b[r["p_partkey"]] = b_idx[r["p_brand"]]
    lut_ref = ray.put(pk_b)

    counts = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_partkey"]),
        ["l_partkey"], [], count_as="n_lineitems")

    def _brand(batch: pa.Table) -> pa.Table:
        b_a = ray.get(lut_ref)
        pk = np.asarray(batch["l_partkey"], np.int64)
        n = np.asarray(batch["n_lineitems"], np.int64)
        m = (pk >= 0) & (pk < b_a.size)
        m[m] &= b_a[pk[m]] >= 0
        return pa.table({
            "brand_i": pa.array(b_a[pk[m]], pa.int64()),
            "n_lineitems": pa.array(n[m], pa.int64()),
        })

    g = grouped_sums(counts.map_batches(_brand, batch_format="pyarrow"),
                     ["brand_i", "n_lineitems"], [], count_as="n_parts")

    def _names(t: pa.Table) -> pa.Table:
        bi = np.asarray(t["brand_i"], np.int64)
        return pa.table({
            "p_brand": pa.array([brands[i] for i in bi], pa.string()),
            "n_lineitems": t["n_lineitems"],
            "n_parts": t["n_parts"],
        }).cast(DEMAND_HIST_SCHEMA)

    return g.map_batches(_names, batch_format="pyarrow")


MAD_SCHEMA = pa.schema([
    ("median_cents", pa.int64()),
    ("mad_cents", pa.int64()),
])


def order_value_mad(sf_dir: str):
    """Robust spread of order values: the exact discrete median m of
    cents, then the exact discrete median of |cents − m| — MAD, the
    outlier-immune sigma. Two value-histogram quantile passes (each
    ships per-block distinct values, not rows); the deviation pass is
    map-only off the driver-scalar median."""
    import numpy as np

    import ray.data

    from ..stages.agg import quantiles_disc

    def _cents(batch: pa.Table) -> pa.Table:
        c = np.rint(np.asarray(batch["o_totalprice"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({"cents": pa.array(c, pa.int64())})

    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_totalprice"]).map_batches(
        _cents, batch_format="pyarrow").materialize()
    med = int(quantiles_disc(ds, "cents", [0.5])["value"][0].as_py())

    def _dev(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["cents"], np.int64)
        return pa.table({"dev": pa.array(np.abs(c - med), pa.int64())})

    mad = int(quantiles_disc(ds.map_batches(_dev,
                                            batch_format="pyarrow"),
                             "dev", [0.5])["value"][0].as_py())
    return ray.data.from_arrow(pa.table({
        "median_cents": pa.array([med], pa.int64()),
        "mad_cents": pa.array([mad], pa.int64()),
    }).cast(MAD_SCHEMA))


COPURCHASE_SCHEMA = pa.schema([
    ("part_a", pa.int64()),
    ("part_b", pa.int64()),
    ("n_orders", pa.int64()),
])


def copurchase_part_pairs(sf_dir: str, k: int = 20):
    """Market-basket: the top-k part pairs by co-purchase support
    (orders containing both), ordered (support desc, part_a, part_b).
    The pair explosion is bounded by (lines-per-order choose 2) — the
    distinct (orderkey, partkey) fold block-combines, ONE orderkey
    exchange groups baskets, and each partition emits its pairs by
    basket-size class (reshape + triu per distinct size — no Python
    loop over orders). The support fold + top-k then runs the
    top_tokens exchange shape over pair keys."""
    import numpy as np

    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups
    from ..config import DEFAULT_CONFIG, resolve_num_partitions

    pairs_schema = pa.schema([("part_a", pa.int64()),
                              ("part_b", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "l_partkey": pc.cast(batch["l_partkey"], pa.int64()),
        })

    items = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey",
                                    "l_partkey"]).map_batches(
            _tag, batch_format="pyarrow"),
        ["l_orderkey", "l_partkey"], [])

    def _pairs(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return pairs_schema.empty_table()
        ok = np.asarray(part["l_orderkey"], np.int64)
        pk = np.asarray(part["l_partkey"], np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        first = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        lens = np.diff(np.r_[first, len(ok)])
        out_a, out_b = [], []
        for l in np.unique(lens):         # ≤ max-basket-size classes
            if l < 2:
                continue
            sel = first[lens == l]
            # baskets of size l, parts sorted ascending inside each
            mat = pk[(sel[:, None] + np.arange(l)[None, :]).ravel()
                     ].reshape(-1, l)
            ii, jj = np.triu_indices(l, 1)
            out_a.append(mat[:, ii].ravel())
            out_b.append(mat[:, jj].ravel())
        if not out_a:
            return pairs_schema.empty_table()
        return pa.table({
            "part_a": pa.array(np.concatenate(out_a), pa.int64()),
            "part_b": pa.array(np.concatenate(out_b), pa.int64()),
        })

    baskets = exchange_map_groups(items, "l_orderkey",
                                  resolve_num_partitions(DEFAULT_CONFIG),
                                  _pairs, pairs_schema)
    g = grouped_sums(baskets, ["part_a", "part_b"], [],
                     count_as="n_orders")

    def _blk_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t.cast(COPURCHASE_SCHEMA)
        n = np.asarray(t["n_orders"], np.int64)
        a = np.asarray(t["part_a"], np.int64)
        b = np.asarray(t["part_b"], np.int64)
        idx = np.lexsort((b, a, -n))[:k]
        return t.take(pa.array(np.sort(idx),
                               pa.int64())).cast(COPURCHASE_SCHEMA)

    return (g.map_batches(_blk_topk, batch_format="pyarrow")
            .sort(["n_orders", "part_a", "part_b"],
                  descending=[True, False, False])
            .limit(k))


SUFFSTATS_SCHEMA = pa.schema([
    ("l_returnflag", pa.string()),
    ("n", pa.int64()),
    ("sum_q", pa.int64()),
    ("sum_d", pa.int64()),
    ("sum_qd", pa.int64()),
    ("sum_q2", pa.int64()),
    ("sum_d2", pa.int64()),
])


def qty_discount_suffstats(sf_dir: str):
    """Pushdown-covariance sufficient statistics per returnflag:
    (n, Σq, Σd, Σqd, Σq², Σd²) with q = whole quantity, d = whole
    discount percent — everything Pearson/OLS needs, all exact
    integers, one block-combined fold. The correlation itself is a
    driver-side float the CONSUMER derives; the engine ships only
    exact sums so partial/merge order can't perturb anything."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _qd(batch: pa.Table) -> pa.Table:
        q = np.rint(np.asarray(batch["l_quantity"],
                               np.float64)).astype(np.int64)
        d = np.rint(np.asarray(batch["l_discount"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "q": pa.array(q, pa.int64()),
            "d": pa.array(d, pa.int64()),
            "qd": pa.array(q * d, pa.int64()),
            "q2": pa.array(q * q, pa.int64()),
            "d2": pa.array(d * d, pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_returnflag", "l_quantity",
                                    "l_discount"]).map_batches(
            _qd, batch_format="pyarrow"),
        ["l_returnflag"], ["q", "d", "qd", "q2", "d2"], count_as="n")
    return g.map_batches(
        lambda t: pa.table({"l_returnflag": t["l_returnflag"],
                            "n": t["n"], "sum_q": t["sum_q"],
                            "sum_d": t["sum_d"], "sum_qd": t["sum_qd"],
                            "sum_q2": t["sum_q2"],
                            "sum_d2": t["sum_d2"]}
                           ).cast(SUFFSTATS_SCHEMA),
        batch_format="pyarrow")


PRIORITY_DRIFT_SCHEMA = pa.schema([
    ("first_priority", pa.string()),
    ("last_priority", pa.string()),
    ("n_customers", pa.int64()),
])


def customer_priority_drift(sf_dir: str):
    """Lifecycle drift: (priority of a customer's FIRST order, priority
    of their LATEST order) cell counts under the deterministic
    (o_orderdate, o_orderkey) tiebreak — do customers escalate to
    urgent over their lifetime? One custkey exchange; each customer
    leaves its partition as a single cell row."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "d_us": pc.cast(batch["o_orderdate"], pa.int64()),
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
        })

    part_schema = pa.schema([("first_priority", pa.string()),
                             ("last_priority", pa.string())])

    def _bounds(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(part["o_custkey"], np.int64)
        d = np.asarray(part["d_us"], np.int64)
        ok = np.asarray(part["o_orderkey"], np.int64)
        order = np.lexsort((ok, d, u))
        u_s = u[order]
        first = np.flatnonzero(np.r_[True, u_s[1:] != u_s[:-1]])
        last = np.r_[first[1:], len(u_s)] - 1
        pr = part["o_orderpriority"].combine_chunks()
        return pa.table({
            "first_priority": pr.take(pa.array(order[first], pa.int64())),
            "last_priority": pr.take(pa.array(order[last], pa.int64())),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey",
                 "o_orderpriority"]).map_batches(
        _tag, batch_format="pyarrow")
    cells = exchange_map_groups(ds, "o_custkey",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _bounds, part_schema)
    g = grouped_sums(cells, ["first_priority", "last_priority"], [],
                     count_as="n_customers")
    return g.map_batches(lambda t: t.cast(PRIORITY_DRIFT_SCHEMA),
                         batch_format="pyarrow")


DELAY_Q_SCHEMA = pa.schema([
    ("o_orderpriority", pa.string()),
    ("q", pa.float64()),
    ("delay_days", pa.int64()),
])


def ship_delay_quantiles_by_priority(sf_dir: str,
                                     qs=(0.25, 0.5, 0.75, 0.9)):
    """Does priority actually buy shipping speed? Exact discrete
    quantiles of ``l_shipdate − o_orderdate`` in whole days per order
    priority — the join-then-quantile shape on the orderkey exchange
    (lineitem side carries only the day delta after the join)."""
    import numpy as np

    import ray.data

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_quantiles_disc
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _ord(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(batch["o_orderkey"], pa.int64()),
            "od_us": pc.cast(batch["o_orderdate"], pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
        })

    def _line(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(batch["l_orderkey"], pa.int64()),
            "sd_us": pc.cast(batch["l_shipdate"], pa.int64()),
        })

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate",
                                         "o_orderpriority"]).map_batches(
        _ord, batch_format="pyarrow")
    lines = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey",
                                        "l_shipdate"]).map_batches(
        _line, batch_format="pyarrow")
    joined = hash_join_exchange(lines, orders, "orderkey",
                                ["sd_us"], ["od_us", "o_orderpriority"],
                                n_parts, left_key="l_orderkey",
                                right_key="o_orderkey")

    day_us = 86_400 * 1_000_000
    shift = 100_000  # the repo's shift-before-floor contract: this
    # corpus ships lines BEFORE the order date, and DuckDB's integer //
    # truncates toward zero while numpy floors — shifting positive
    # first makes both floor, exactly (ship_delay_histogram's trick)

    def _delay(batch: pa.Table) -> pa.Table:
        sd = np.asarray(batch["sd_us"], np.int64)
        od = np.asarray(batch["od_us"], np.int64)
        d = sd - od + shift * day_us
        if d.size and d.min() < 0:
            raise ValueError("delay below -100000 days: raise the shift")
        return pa.table({
            "o_orderpriority": batch["o_orderpriority"],
            "delay_days": pa.array(d // day_us - shift, pa.int64()),
        })

    tbl = grouped_quantiles_disc(
        joined.map_batches(_delay, batch_format="pyarrow"),
        "o_orderpriority", "delay_days", list(qs))
    return ray.data.from_arrow(pa.table({
        "o_orderpriority": tbl["o_orderpriority"],
        "q": tbl["q"],
        "delay_days": tbl["value"],
    }).cast(DELAY_Q_SCHEMA))


COHORT_SIZE_SCHEMA = pa.schema([
    ("cohort_month", pa.int64()),
    ("n_customers", pa.int64()),
])


def customer_cohort_sizes(sf_dir: str):
    """Acquisition curve: customers grouped by the epoch-month of their
    FIRST order. One grouped-min fold (block-min combiner — exact for
    any distribution) then a dim-bounded month histogram."""
    import numpy as np

    from ..stages.agg import grouped_minmax, grouped_sums

    def _tag(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["o_orderdate"], "datetime64[us]")
        m = d.astype("datetime64[M]").astype(np.int64)
        if m.size and m.min() < 0:
            raise ValueError("customer_cohort_sizes: pre-epoch date")
        return pa.table({
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "mo": pa.array(m, pa.int64()),
        })

    firsts = grouped_minmax(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey",
                                    "o_orderdate"]).map_batches(
            _tag, batch_format="pyarrow"),
        ["o_custkey"], "mo")

    def _cohort(batch: pa.Table) -> pa.Table:
        return pa.table({"cohort_month": batch["min_mo"]})

    g = grouped_sums(firsts.map_batches(_cohort,
                                        batch_format="pyarrow"),
                     ["cohort_month"], [], count_as="n_customers")
    return g.map_batches(lambda t: t.cast(COHORT_SIZE_SCHEMA),
                         batch_format="pyarrow")


PUSHDOWN_SCHEMA = pa.schema([
    ("month", pa.int64()),
    ("n_orders", pa.int64()),
    ("cents", pa.int64()),
])


def pushdown_urgent_revenue(sf_dir: str,
                            min_totalprice: float = 200_000.0):
    """Predicate pushdown AT THE SCAN: urgent orders above a value
    floor, monthly count + exact cents — the filter rides into
    ``read_parquet(filter=)`` as a pyarrow dataset expression, so
    row groups whose min/max statistics exclude the predicate are
    never read and non-matching rows never enter the object store
    (vs the engine's usual in-kernel masks, which scan then drop).
    At 100 TB this is the difference between reading a month and
    reading the lake; tests assert pushdown ≡ late filter."""
    import numpy as np

    from ..stages.agg import grouped_sums

    expr = ((pc.field("o_orderpriority") == "1-URGENT")
            & (pc.field("o_totalprice") > min_totalprice))
    ds = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_orderdate", "o_totalprice"],
                            filter=expr)

    def _tag(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["o_orderdate"], "datetime64[us]")
        m = d.astype("datetime64[M]").astype(np.int64)
        if m.size and m.min() < 0:
            raise ValueError("pushdown_urgent_revenue: pre-epoch date")
        c = np.rint(np.asarray(batch["o_totalprice"],
                               np.float64) * 100).astype(np.int64)
        return pa.table({
            "month": pa.array(m, pa.int64()),
            "cents": pa.array(c, pa.int64()),
        })

    g = grouped_sums(ds.map_batches(_tag, batch_format="pyarrow"),
                     ["month"], ["cents"], count_as="n_orders")
    return g.map_batches(
        lambda t: pa.table({"month": t["month"],
                            "n_orders": t["n_orders"],
                            "cents": t["sum_cents"]}
                           ).cast(PUSHDOWN_SCHEMA),
        batch_format="pyarrow")


TOP_LINE_SCHEMA = pa.schema([
    ("share_decile", pa.int64()),
    ("n_orders", pa.int64()),
])


def order_top_line_share(sf_dir: str):
    """Within-order value concentration: for every order, the exact
    floor decile of its LARGEST line's share of order line revenue
    (``max_rev·10 // total_rev``; 10 = single-line order), histogrammed
    — the intra-group skew profile. Max and sum are both partial-
    combinable, so per-block (order → max, sum) partials exchange once
    on orderkey and merge as max-of-max / sum-of-sum."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("mx", pa.int64()), ("tot", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        ok = np.asarray(batch["l_orderkey"], np.int64)
        price = np.asarray(batch["l_extendedprice"], np.float64)
        disc = np.asarray(batch["l_discount"], np.float64)
        rev = (np.rint(price * 100).astype(np.int64)
               * (100 - np.rint(disc * 100).astype(np.int64)))
        order = np.argsort(ok, kind="stable")
        ok_s, rev_s = ok[order], rev[order]
        first = np.flatnonzero(np.r_[True, ok_s[1:] != ok_s[:-1]])
        return pa.table({
            "l_orderkey": pa.array(ok_s[first], pa.int64()),
            "mx": pa.array(np.maximum.reduceat(rev_s, first), pa.int64()),
            "tot": pa.array(np.add.reduceat(rev_s, first), pa.int64()),
        })

    partials = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice",
                 "l_discount"]).map_batches(
        _partial, batch_format="pyarrow")

    cell_schema = pa.schema([("share_decile", pa.int64()),
                             ("n", pa.int64())])

    def _merge(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return cell_schema.empty_table()
        ok = np.asarray(part["l_orderkey"], np.int64)
        mx = np.asarray(part["mx"], np.int64)
        tot = np.asarray(part["tot"], np.int64)
        order = np.argsort(ok, kind="stable")
        ok_s = ok[order]
        first = np.flatnonzero(np.r_[True, ok_s[1:] != ok_s[:-1]])
        m = np.maximum.reduceat(mx[order], first)
        t = np.add.reduceat(tot[order], first)
        dec = m * 10 // t
        vals, cnts = np.unique(dec, return_counts=True)
        return pa.table({
            "share_decile": pa.array(vals.astype(np.int64), pa.int64()),
            "n": pa.array(cnts.astype(np.int64), pa.int64()),
        })

    cells = exchange_map_groups(partials, "l_orderkey",
                                resolve_num_partitions(DEFAULT_CONFIG),
                                _merge, cell_schema)
    g = grouped_sums(cells, ["share_decile"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"share_decile": t["share_decile"],
                            "n_orders": t["sum_n"]}
                           ).cast(TOP_LINE_SCHEMA),
        batch_format="pyarrow")


HHI_SCHEMA = pa.schema([
    ("nation", pa.string()),
    ("n_customers", pa.int64()),
    ("total_dollars", pa.int64()),
    ("sumsq_dollars", pa.int64()),
])


def revenue_hhi_by_nation(sf_dir: str):
    """Customer-concentration Herfindahl per nation as exact integer
    parts: per-customer order value in WHOLE dollars (cents would
    square past int64 at scale), then per nation Σx and Σx² — HHI =
    sumsq/total². Raises if any square exceeds 2^62 (the
    label_dispersion overflow discipline). One custkey join exchange +
    a per-customer fold; the nation fold moves customer-count rows."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    nation = read_parquet_clean(f"{sf_dir}/nation.parquet").take_all()
    nk_name = {r["n_nationkey"]: r["n_name"] for r in nation}

    def _ord(batch: pa.Table) -> pa.Table:
        # whole dollars = exact cents // 100 (floor) — round() at the
        # dollar grain would hit the half-even vs half-away split on
        # .50 prices; floor of the exact cent integer can't
        cents = np.rint(np.asarray(batch["o_totalprice"],
                                   np.float64) * 100).astype(np.int64)
        return pa.table({
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "dollars": pa.array(cents // 100, pa.int64()),
        })

    per_cust = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey",
                                    "o_totalprice"]).map_batches(
            _ord, batch_format="pyarrow"),
        ["o_custkey"], ["dollars"])

    def _cust(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch["c_custkey"], pa.int64()),
            "c_nk": pc.cast(batch["c_nationkey"], pa.int64()),
        })

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey",
                                       "c_nationkey"]).map_batches(
        _cust, batch_format="pyarrow")
    joined = hash_join_exchange(per_cust, cust, "custkey",
                                ["sum_dollars"], ["c_nk"], n_parts,
                                left_key="o_custkey",
                                right_key="c_custkey")

    def _sq(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch["sum_dollars"], np.int64)
        if x.size and (np.abs(x) >> 31).max() > 0:
            # x² must stay below 2^62: |x| < 2^31
            raise ValueError("revenue_hhi: per-customer dollars exceed "
                             "2^31; rescale the unit")
        return pa.table({
            "c_nk": pa.array(np.asarray(batch["c_nk"], np.int64),
                             pa.int64()),
            "x": pa.array(x, pa.int64()),
            "x2": pa.array(x * x, pa.int64()),
        })

    g = grouped_sums(joined.map_batches(_sq, batch_format="pyarrow"),
                     ["c_nk"], ["x", "x2"], count_as="n_customers")

    def _name(batch: pa.Table) -> pa.Table:
        names = [nk_name.get(k) for k in batch["c_nk"].to_pylist()]
        out = pa.table({
            "nation": pa.array(names, pa.string()),
            "n_customers": batch["n_customers"],
            "total_dollars": batch["sum_x"],
            "sumsq_dollars": batch["sum_x2"],
        }).cast(HHI_SCHEMA)
        return out.filter(pc.is_valid(out["nation"]))

    return g.map_batches(_name, batch_format="pyarrow")


SUPP_BAL_REGION_SCHEMA = pa.schema([
    ("r_name", pa.string()),
    ("q", pa.float64()),
    ("value", pa.int64()),
])


def supplier_balance_quantiles_by_region(sf_dir: str,
                                         qs=(0.25, 0.5, 0.75, 0.9)):
    """Supplier credit-health spread per REGION: exact discrete
    quantiles of s_acctbal cents (negatives included — quantile_disc
    sorts signed ints identically in both engines) with the supplier →
    nation → region hop as one composed broadcast array over the
    supplier scan; the shared grouped value-histogram quantile reduces
    ≤ regions × distinct-cent cells, never supplier rows."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_quantiles_disc

    nation = read_parquet_clean(f"{sf_dir}/nation.parquet",
                                columns=["n_nationkey",
                                         "n_regionkey"]).take_all()
    region = read_parquet_clean(f"{sf_dir}/region.parquet").take_all()
    rk_nm = {r["r_regionkey"]: r["r_name"] for r in region}
    max_nk = max((r["n_nationkey"] for r in nation), default=-1)
    names = sorted(rk_nm.values())
    name_i = {nm: i for i, nm in enumerate(names)}
    nk_ri = np.full(max_nk + 1, -1, np.int64)
    for r in nation:
        nk_ri[r["n_nationkey"]] = name_i[rk_nm[r["n_regionkey"]]]
    lut_ref = ray.put(nk_ri)

    def _cents(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        nk = np.asarray(batch["s_nationkey"], np.int64)
        if nk.size and (nk.min() < 0 or nk.max() >= lut.size
                        or (lut[nk] < 0).any()):
            raise ValueError("s_nationkey outside the nation dim")
        cents = np.rint(np.asarray(batch["s_acctbal"],
                                   np.float64) * 100).astype(np.int64)
        return pa.table({
            "region_i": pa.array(lut[nk], pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                            columns=["s_nationkey",
                                     "s_acctbal"]).map_batches(
        _cents, batch_format="pyarrow")
    tbl = grouped_quantiles_disc(ds, "region_i", "cents", list(qs))
    ri = tbl["region_i"].to_pylist()
    return pa.table({
        "r_name": pa.array([names[i] for i in ri], pa.string()),
        "q": tbl["q"],
        "value": tbl["value"],
    }).cast(SUPP_BAL_REGION_SCHEMA)


TYPE_HEAD_SIZE_SCHEMA = pa.schema([
    ("type_head", pa.string()),
    ("p_size", pa.int64()),
    ("n_parts", pa.int64()),
])


def part_type_head_size_matrix(sf_dir: str):
    """Catalog-shape matrix: the FIRST word of p_type (the family
    prefix, e.g. STANDARD / PROMO) × p_size cell counts — the SKU-grid
    census that shows whether families cover the size range evenly.
    Map-only head extraction (one split, element 0) + one tiny
    exchange of ≤ heads × sizes cells."""
    from ..stages.agg import grouped_sums

    def _head(batch: pa.Table) -> pa.Table:
        splits = pc.split_pattern(
            pc.fill_null(batch["p_type"].combine_chunks(), ""), " ")
        if isinstance(splits, pa.ChunkedArray):
            splits = splits.combine_chunks()
        return pa.table({
            "type_head": pc.list_element(splits, 0),
            "p_size": pc.cast(batch["p_size"], pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/part.parquet",
                           columns=["p_type", "p_size"]).map_batches(
            _head, batch_format="pyarrow"),
        ["type_head", "p_size"], [], count_as="n_parts")
    return g.map_batches(lambda t: t.cast(TYPE_HEAD_SIZE_SCHEMA),
                         batch_format="pyarrow")


REPEAT_RATE_SCHEMA = pa.schema([
    ("month", pa.timestamp("us")),
    ("n_orders", pa.int64()),
    ("n_customers", pa.int64()),
])


def orders_repeat_rate_by_month(sf_dir: str):
    """Repeat-purchase intensity per month: order count AND distinct
    ordering customers per calendar month in one pass — the
    orders-per-customer ratio is the month's repeat rate, and shipping
    both exact integers (not the float ratio) keeps the cross-engine
    compare bit-stable. Rides ``grouped_distinct_count``: only distinct
    (month, customer) combos leave the blocks, never the order rows."""
    from ..stages.agg import grouped_distinct_count

    def _month(batch: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.floor_temporal(batch["o_orderdate"],
                                       unit="month"),
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
        })

    g = grouped_distinct_count(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderdate",
                                    "o_custkey"]).map_batches(
            _month, batch_format="pyarrow"),
        ["month"], "o_custkey", distinct_as="n_customers",
        count_as="n_orders")
    return g.map_batches(
        lambda t: pa.table({"month": t["month"],
                            "n_orders": t["n_orders"],
                            "n_customers": t["n_customers"]}).cast(
            REPEAT_RATE_SCHEMA),
        batch_format="pyarrow")


TAX_DISC_SCHEMA = pa.schema([
    ("tax_bp", pa.int64()),
    ("discount_bp", pa.int64()),
    ("n_lines", pa.int64()),
])


def tax_discount_matrix(sf_dir: str):
    """Pricing-lever interaction census: (tax basis points × discount
    basis points) cell counts over lineitem — do discounts co-occur
    with particular tax bands (a pricing-policy audit; independence
    shows as a rank-1 table). Map-only integer bp extraction + one
    exchange of ≤ tax-bands × discount-bands cells."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _bp(batch: pa.Table) -> pa.Table:
        tax = np.rint(np.asarray(batch["l_tax"],
                                 np.float64) * 100).astype(np.int64)
        dis = np.rint(np.asarray(batch["l_discount"],
                                 np.float64) * 100).astype(np.int64)
        return pa.table({
            "tax_bp": pa.array(tax, pa.int64()),
            "discount_bp": pa.array(dis, pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_tax", "l_discount"]).map_batches(
            _bp, batch_format="pyarrow"),
        ["tax_bp", "discount_bp"], [], count_as="n_lines")
    return g.map_batches(lambda t: t.cast(TAX_DISC_SCHEMA),
                         batch_format="pyarrow")


COHORT_SEG_SCHEMA = pa.schema([
    ("month", pa.timestamp("us")),
    ("c_mktsegment", pa.string()),
    ("n_customers", pa.int64()),
])


def customer_cohort_segment_matrix(sf_dir: str):
    """Acquisition-cohort × segment matrix: customers bucketed by the
    calendar month of their FIRST order, crossed with market segment —
    which segments each acquisition wave drew from. `grouped_minmax`
    folds orders to one (custkey, first-date) row each, the segment
    attaches on the custkey exchange join, and ≤ months × segments
    cells ride the final exchange."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_minmax, grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "date_us": pc.cast(batch["o_orderdate"], pa.int64()),
        })

    first = grouped_minmax(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey",
                                    "o_orderdate"]).map_batches(
            _tag, batch_format="pyarrow"),
        ["o_custkey"], "date_us")

    def _month(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "month": pc.floor_temporal(
                pc.cast(batch["min_date_us"], pa.timestamp("us")),
                unit="month"),
        })

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    joined = hash_join_exchange(
        first.map_batches(_month, batch_format="pyarrow"), cust,
        key="custkey", left_key="o_custkey", right_key="c_custkey",
        left_cols=["month"], right_cols=["c_mktsegment"],
        n_parts=n_parts)
    g = grouped_sums(joined, ["month", "c_mktsegment"], [],
                     count_as="n_customers")
    return g.map_batches(lambda t: t.cast(COHORT_SEG_SCHEMA),
                         batch_format="pyarrow")


FANOUT_PRI_SCHEMA = pa.schema([
    ("o_orderpriority", pa.string()),
    ("n_lines", pa.int64()),
    ("n_orders", pa.int64()),
])


def order_fanout_by_priority(sf_dir: str):
    """Order-size mix per priority: lineitem count per order crossed
    with the order's priority — do urgent orders run smaller. The fact
    rows reduce to one (orderkey, count) cell each BEFORE the priority
    attaches on the orderkey exchange join; ≤ priorities ×
    distinct-fanouts cells ride the final exchange."""
    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    counts = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey"]),
        ["l_orderkey"], [], count_as="n_lines")
    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey",
                                         "o_orderpriority"])
    joined = hash_join_exchange(
        counts, orders, key="orderkey", left_key="l_orderkey",
        right_key="o_orderkey", left_cols=["n_lines"],
        right_cols=["o_orderpriority"], n_parts=n_parts)
    g = grouped_sums(joined, ["o_orderpriority", "n_lines"], [],
                     count_as="n_orders")
    return g.map_batches(lambda t: t.cast(FANOUT_PRI_SCHEMA),
                         batch_format="pyarrow")


def _prior_group_max(grp: "np.ndarray", vals: "np.ndarray"):
    """Segmented running-max-of-PRIOR-rows without a Python loop:
    with rows sorted so ``grp`` is non-decreasing, the cummax of the
    composite ``grp·K + normalized-value`` (K > value range) is always
    dominated by the current group, so decomposing the PREVIOUS row's
    cummax yields (group of prior max, prior max value); a row has a
    valid prior max only when that group equals its own. Returns
    (has_prior, prior_max) aligned to the input rows."""
    import numpy as np

    if vals.size == 0:
        return (np.zeros(0, bool), np.zeros(0, np.int64))
    base = int(vals.min())
    vn = vals - base
    k = int(vn.max()) + 1
    if int(grp.max()) + 1 >= 2 ** 62 // max(k, 1):
        raise ValueError("segmented cummax composite overflows int64; "
                         "re-partition finer")
    comp = grp * k + vn
    cm = np.maximum.accumulate(comp)
    prior = np.r_[np.int64(-1), cm[:-1]]
    has = (prior >= 0) & (prior // k == grp)
    return has, np.where(has, prior % k + base, 0)


RECORD_ORDERS_SCHEMA = pa.schema([
    ("o_orderpriority", pa.string()),
    ("n_records", pa.int64()),
])


def personal_record_orders(sf_dir: str):
    """Running-max window audit: orders that STRICTLY exceed every
    prior order of the same customer (the 'new personal record'
    events; `max() OVER (... ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING)` then a strict compare — first orders have a NULL
    prior and never count), tallied per priority. One custkey
    exchange; the segmented running max is one composite-key cummax
    (:func:`_prior_group_max`), and ≤ priorities cells leave each
    partition."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..functions.segscore import _to_bytes_array
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    part_schema = pa.schema([("o_orderpriority", pa.string()),
                             ("n", pa.int64())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "date_us": pc.cast(batch["o_orderdate"], pa.int64()),
            "o_orderkey": batch["o_orderkey"],
            "cents": pc.cast(pc.round(pc.multiply(
                batch["o_totalprice"], pa.scalar(100.0))), pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
        })

    def _records(part: pa.Table) -> pa.Table:
        if part.num_rows < 2:
            return part_schema.empty_table()
        ck = np.asarray(part["o_custkey"], np.int64)
        dt = np.asarray(part["date_us"], np.int64)
        ok = np.asarray(part["o_orderkey"], np.int64)
        ce = np.asarray(part["cents"], np.int64)
        pcol = part["o_orderpriority"].combine_chunks()
        order = np.lexsort((ok, dt, ck))
        ck_s, ce_s = ck[order], ce[order]
        grp = np.cumsum(np.r_[True, ck_s[1:] != ck_s[:-1]]) - 1
        has, prior = _prior_group_max(grp.astype(np.int64), ce_s)
        rec = has & (ce_s > prior)
        if not rec.any():
            return part_schema.empty_table()
        idx = order[rec]
        pb = _to_bytes_array(pcol)[idx]
        po = np.argsort(pb, kind="stable")
        pb_s = pb[po]
        st = np.flatnonzero(np.r_[True, pb_s[1:] != pb_s[:-1]])
        n = np.diff(np.r_[st, len(pb_s)])
        return pa.table({
            "o_orderpriority": pcol.take(
                pa.array(idx[po[st]], pa.int64())),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey",
                 "o_totalprice", "o_orderpriority"]).map_batches(
        _tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    parts = exchange_map_groups(ds, "o_custkey", n_parts, _records,
                                part_schema)
    g = grouped_sums(parts, ["o_orderpriority"], ["n"])
    return g.map_batches(
        lambda t: pa.table({"o_orderpriority": t["o_orderpriority"],
                            "n_records": t["sum_n"]}).cast(
            RECORD_ORDERS_SCHEMA),
        batch_format="pyarrow")


WMEDIAN_SCHEMA = pa.schema([
    ("o_orderpriority", pa.string()),
    ("median_cents", pa.int64()),
])


def line_weighted_value_median_by_priority(sf_dir: str):
    """WEIGHTED discrete median per priority: order value cents with
    each order weighted by its lineitem count — 'the order value a
    typical LINE sits in', which differs from the plain median
    whenever big orders carry more lines. Convention: the smallest
    value whose cumulative weight reaches ⌈total/2⌉ (integer, exactly
    the SQL window-cumsum twin). Weights attach on the orderkey
    exchange join; the (priority, value)-histogram `grouped_sums`
    ships only distinct cells, and the cumsum scan runs on the
    driver-scale histogram, never the rows."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    counts = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey"]),
        ["l_orderkey"], [], count_as="n_lines")

    def _cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "cents": pc.cast(pc.round(pc.multiply(
                batch["o_totalprice"], pa.scalar(100.0))), pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice",
                 "o_orderpriority"]).map_batches(
        _cents, batch_format="pyarrow")
    joined = hash_join_exchange(
        counts, orders, key="orderkey", left_key="l_orderkey",
        right_key="o_orderkey", left_cols=["n_lines"],
        right_cols=["cents", "o_orderpriority"], n_parts=n_parts)
    hist = grouped_sums(joined, ["o_orderpriority", "cents"],
                        ["n_lines"]).take_all()
    by_p: dict = {}
    for r in hist:
        by_p.setdefault(r["o_orderpriority"], []).append(
            (r["cents"], r["sum_n_lines"]))
    out_p, out_v = [], []
    for p in sorted(by_p):
        cells = sorted(by_p[p])
        cw = np.cumsum([w for _, w in cells])
        half = (int(cw[-1]) + 1) // 2
        out_p.append(p)
        out_v.append(int(cells[int(np.searchsorted(cw, half))][0]))
    return pa.table({
        "o_orderpriority": pa.array(out_p, pa.string()),
        "median_cents": pa.array(out_v, pa.int64()),
    }).cast(WMEDIAN_SCHEMA)


SEASONALITY_SCHEMA = pa.schema([
    ("year", pa.int64()),
    ("month", pa.int64()),
    ("n_orders", pa.int64()),
    ("permille", pa.int64()),
])


def orders_month_seasonality(sf_dir: str):
    """Seasonality index: each (year, month)'s share of its year's
    orders as integer PERMILLE (floor of n·1000/year-total — exact in
    both engines, no float share) — flat ≈ 83‰/month; the deviation IS
    the seasonality. One (year, month) `grouped_sums`; the permille
    normalization runs on the ≤ years×12 driver-scale cells."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _ym(batch: pa.Table) -> pa.Table:
        return pa.table({
            "year": pc.cast(pc.year(batch["o_orderdate"]), pa.int64()),
            "month": pc.cast(pc.month(batch["o_orderdate"]),
                             pa.int64()),
        })

    cells = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderdate"]).map_batches(
            _ym, batch_format="pyarrow"),
        ["year", "month"], [], count_as="n_orders").take_all()
    y = np.array([r["year"] for r in cells], np.int64)
    m = np.array([r["month"] for r in cells], np.int64)
    n = np.array([r["n_orders"] for r in cells], np.int64)
    totals = {int(yy): int(n[y == yy].sum()) for yy in np.unique(y)}
    permille = np.array([int(nn) * 1000 // totals[int(yy)]
                         for yy, nn in zip(y, n)], np.int64)
    return pa.table({
        "year": pa.array(y, pa.int64()),
        "month": pa.array(m, pa.int64()),
        "n_orders": pa.array(n, pa.int64()),
        "permille": pa.array(permille, pa.int64()),
    }).cast(SEASONALITY_SCHEMA)


TREND_SEG_SCHEMA = pa.schema([
    ("c_mktsegment", pa.string()),
    ("trend_sign", pa.int64()),
    ("n_customers", pa.int64()),
])

_TREND_PER_CUST = pa.schema([
    ("o_custkey", pa.int64()), ("trend_sign", pa.int64()),
])


def value_trend_by_segment(sf_dir: str):
    """Lifecycle spend trend × segment: the SIGN of (last order value −
    first order value) per customer under the (o_orderdate, o_orderkey)
    tiebreak, cell-counted per market segment — which segments trade up
    over their lifetime. One custkey exchange folds each customer to a
    single sign row, the segment attaches on the exchange join, and ≤
    segments × 3 cells leave."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch["o_custkey"],
            "date_us": pc.cast(batch["o_orderdate"], pa.int64()),
            "o_orderkey": batch["o_orderkey"],
            "cents": pc.cast(pc.round(pc.multiply(
                batch["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        })

    def _trend(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return _TREND_PER_CUST.empty_table()
        ck = np.asarray(part["o_custkey"], np.int64)
        dt = np.asarray(part["date_us"], np.int64)
        ok = np.asarray(part["o_orderkey"], np.int64)
        ce = np.asarray(part["cents"], np.int64)
        order = np.lexsort((ok, dt, ck))
        ck_s, ce_s = ck[order], ce[order]
        starts = np.flatnonzero(np.r_[True, ck_s[1:] != ck_s[:-1]])
        ends = np.r_[starts[1:], len(ck_s)] - 1
        return pa.table({
            "o_custkey": pa.array(ck_s[starts], pa.int64()),
            "trend_sign": pa.array(
                np.sign(ce_s[ends] - ce_s[starts]).astype(np.int64),
                pa.int64()),
        })

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey",
                 "o_totalprice"]).map_batches(_tag,
                                              batch_format="pyarrow")
    per = exchange_map_groups(ds, "o_custkey", n_parts, _trend,
                              _TREND_PER_CUST)
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    joined = hash_join_exchange(
        per, cust, key="custkey", left_key="o_custkey",
        right_key="c_custkey", left_cols=["trend_sign"],
        right_cols=["c_mktsegment"], n_parts=n_parts)
    g = grouped_sums(joined, ["c_mktsegment", "trend_sign"], [],
                     count_as="n_customers")
    return g.map_batches(lambda t: t.cast(TREND_SEG_SCHEMA),
                         batch_format="pyarrow")


IDENT_INTEGRITY_SCHEMA = pa.schema([
    ("dim", pa.string()),
    ("n_rows", pa.int64()),
    ("n_matched", pa.int64()),
])


def dim_ident_integrity(sf_dir: str):
    """Dimension-key reconciliation gate: do the embedded name idents
    (``Supplier#000000001`` / ``Customer#…``) agree with the surrogate
    keys — the referential-integrity smoke test an ingest pipeline
    runs before trusting joins on either column. Map-only per
    dimension (split on '#', strict integer cast, compare), one
    two-row union; any mismatch shows as n_matched < n_rows."""
    import ray.data

    from ..stages.agg import grouped_sums

    def _check(name_col: str, key_col: str, label: str):
        def _m(batch: pa.Table) -> pa.Table:
            nm = pc.fill_null(batch[name_col].combine_chunks(), "")
            splits = pc.split_pattern(nm, "#")
            if isinstance(splits, pa.ChunkedArray):
                splits = splits.combine_chunks()
            ident = pc.cast(pc.list_element(splits, 1), pa.int64())
            ok = pc.cast(pc.equal(ident, pc.cast(batch[key_col],
                                                 pa.int64())),
                         pa.int64())
            return pa.table({
                "dim": pa.array([label] * batch.num_rows, pa.string()),
                "ok": ok,
            })

        table = {"supplier": ("supplier", [name_col, key_col]),
                 "customer": ("customer", [name_col, key_col])}[label]
        ds = read_parquet_clean(f"{sf_dir}/{table[0]}.parquet",
                                columns=table[1]).map_batches(
            _m, batch_format="pyarrow")
        return grouped_sums(ds, ["dim"], ["ok"], count_as="n_rows")

    parts = [
        _check("s_name", "s_suppkey", "supplier"),
        _check("c_name", "c_custkey", "customer"),
    ]
    rows = []
    for p in parts:
        rows.extend(p.take_all())
    return pa.table({
        "dim": pa.array([r["dim"] for r in rows], pa.string()),
        "n_rows": pa.array([r["n_rows"] for r in rows], pa.int64()),
        "n_matched": pa.array([r["sum_ok"] for r in rows], pa.int64()),
    }).cast(IDENT_INTEGRITY_SCHEMA)


FIRST_SHIP_SCHEMA = pa.schema([
    ("o_orderpriority", pa.string()),
    ("q", pa.float64()),
    ("value", pa.int64()),
])


def time_to_first_shipment_quantiles(sf_dir: str,
                                     qs=(0.25, 0.5, 0.75, 0.9)):
    """Fulfillment-latency SLO per priority: exact discrete quantiles
    of (first shipment day − order day), at ORDER grain (the earliest
    line ships the order, unlike the per-line delay histogram). The
    corpus ships lines BEFORE order dates, so the value carries the
    engine's standard +100000-day shift (floor division on negatives
    differs between engines; a raise guards the shift envelope).
    `grouped_sums`-style min fold per order, priority attaches on the
    orderkey exchange join, quantiles ride the value histogram."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_minmax, grouped_quantiles_disc
    from ..stages.join import hash_join_exchange

    n_parts = resolve_num_partitions(DEFAULT_CONFIG)

    def _ship(batch: pa.Table) -> pa.Table:
        import numpy as np

        sd = np.asarray(
            batch["l_shipdate"].combine_chunks().cast(pa.int64()),
            np.int64) // 86_400_000_000
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "ship_day": pa.array(sd, pa.int64()),
        })

    first = grouped_minmax(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey",
                                    "l_shipdate"]).map_batches(
            _ship, batch_format="pyarrow"),
        ["l_orderkey"], "ship_day")

    def _order(batch: pa.Table) -> pa.Table:
        import numpy as np

        od = np.asarray(
            batch["o_orderdate"].combine_chunks().cast(pa.int64()),
            np.int64) // 86_400_000_000
        return pa.table({
            "o_orderkey": batch["o_orderkey"],
            "order_day": pa.array(od, pa.int64()),
            "o_orderpriority": batch["o_orderpriority"],
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate",
                 "o_orderpriority"]).map_batches(
        _order, batch_format="pyarrow")
    joined = hash_join_exchange(
        first, orders, key="orderkey", left_key="l_orderkey",
        right_key="o_orderkey", left_cols=["min_ship_day"],
        right_cols=["order_day", "o_orderpriority"], n_parts=n_parts)

    def _delay(batch: pa.Table) -> pa.Table:
        import numpy as np

        d = (np.asarray(batch["min_ship_day"], np.int64)
             - np.asarray(batch["order_day"], np.int64) + 100_000)
        if d.size and d.min() < 0:
            raise ValueError("first-shipment delay below the "
                             "+100000-day shift envelope")
        return pa.table({
            "o_orderpriority": batch["o_orderpriority"],
            "delay": pa.array(d, pa.int64()),
        })

    return grouped_quantiles_disc(
        joined.map_batches(_delay, batch_format="pyarrow"),
        "o_orderpriority", "delay", list(qs))


RETURNS_SIZE_SCHEMA = pa.schema([
    ("n_lines", pa.int64()),
    ("has_return", pa.bool_()),
    ("n_orders", pa.int64()),
])


def returns_by_order_size(sf_dir: str):
    """Return-risk × order-size interaction: orders cell-counted by
    (line count, contains-a-returned-line) — do bigger baskets return
    more. One orderkey-keyed fold computes (count, any-R max) per
    order; ≤ fanout-domain × 2 cells ride the final exchange."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.exchange import exchange_map_groups

    per_order = pa.schema([("n_lines", pa.int64()),
                           ("has_return", pa.bool_())])

    def _tag(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch["l_orderkey"],
            "is_r": pc.cast(pc.equal(batch["l_returnflag"], "R"),
                            pa.int64()),
        })

    def _fold(part: pa.Table) -> pa.Table:
        if part.num_rows == 0:
            return per_order.empty_table()
        k = np.asarray(part["l_orderkey"], np.int64)
        r = np.asarray(part["is_r"], np.int64)
        order = np.argsort(k, kind="stable")
        k_s, r_s = k[order], r[order]
        starts = np.flatnonzero(np.r_[True, k_s[1:] != k_s[:-1]])
        n = np.diff(np.r_[starts, len(k_s)])
        hr = np.maximum.reduceat(r_s, starts) > 0
        return pa.table({
            "n_lines": pa.array(n.astype(np.int64), pa.int64()),
            "has_return": pa.array(hr),
        })

    ds = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey",
                                     "l_returnflag"]).map_batches(
        _tag, batch_format="pyarrow")
    n_parts = resolve_num_partitions(DEFAULT_CONFIG)
    per = exchange_map_groups(ds, "l_orderkey", n_parts, _fold,
                              per_order)
    g = grouped_sums(per, ["n_lines", "has_return"], [],
                     count_as="n_orders")
    return g.map_batches(lambda t: t.cast(RETURNS_SIZE_SCHEMA),
                         batch_format="pyarrow")


SEG_NATION_SCHEMA = pa.schema([
    ("n_name", pa.string()),
    ("c_mktsegment", pa.string()),
    ("n_customers", pa.int64()),
])


def segment_nation_matrix(sf_dir: str):
    """Customer-base composition matrix: market segment × nation cell
    counts — the geography-of-demand census behind regional campaign
    sizing. The nation dim attaches as a broadcast array over the
    customer scan (inner-join FK discipline: unknown nationkeys
    raise — the dim is closed); ≤ nations × segments cells shuffle."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    nation = read_parquet_clean(f"{sf_dir}/nation.parquet",
                                columns=["n_nationkey",
                                         "n_name"]).take_all()
    names = np.empty(max((r["n_nationkey"] for r in nation),
                         default=-1) + 1, dtype=object)
    for r in nation:
        names[r["n_nationkey"]] = r["n_name"]
    names_ref = ray.put(names)

    def _name(batch: pa.Table) -> pa.Table:
        nm = ray.get(names_ref)
        nk = np.asarray(batch["c_nationkey"], np.int64)
        if nk.size and (nk.min() < 0 or nk.max() >= nm.size):
            raise ValueError("c_nationkey outside the nation dim")
        return pa.table({
            "n_name": pa.array(nm[nk], pa.string()),
            "c_mktsegment": batch["c_mktsegment"],
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_nationkey",
                                    "c_mktsegment"]).map_batches(
            _name, batch_format="pyarrow"),
        ["n_name", "c_mktsegment"], [], count_as="n_customers")
    return g.map_batches(lambda t: t.cast(SEG_NATION_SCHEMA),
                         batch_format="pyarrow")


CORPUS_COUNTS_SCHEMA = pa.schema([
    ("table_name", pa.string()),
    ("n_rows", pa.int64()),
])


def corpus_table_counts(sf_dir: str):
    """Corpus manifest: one row per table with its exact row count —
    every fact and dimension Parquet plus the derived transcript and
    media caches. The `sig fileinfo` of the whole corpus: the first
    gate of any ingest run (row-count drift between snapshots is the
    cheapest corruption detector). Counts are metadata-only reads
    (Parquet row-group stats via Dataset.count()); nothing shuffles."""
    import ray.data

    from ..sources.transcripts import transcripts_path
    from ..stages.multimodal import media_path

    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents",
              "embeddings"]
    names, counts = [], []
    for t in tables:
        names.append(t)
        counts.append(read_parquet_clean(
            f"{sf_dir}/{t}.parquet").count())
    names.append("transcripts")
    counts.append(ray.data.read_parquet(
        transcripts_path(sf_dir)).count())
    names.append("media")
    counts.append(ray.data.read_parquet(media_path(sf_dir)).count())
    return pa.table({
        "table_name": pa.array(names, pa.string()),
        "n_rows": pa.array(counts, pa.int64()),
    }).cast(CORPUS_COUNTS_SCHEMA)


PART_WORD_SCHEMA = pa.schema([
    ("adj", pa.string()),
    ("noun", pa.string()),
    ("n_parts", pa.int64()),
    ("sum_retail_e2", pa.int64()),
    ("sum_size", pa.int64()),
])


def part_name_word_matrix(sf_dir: str):
    """Catalog-vocabulary census: split ``p_name`` into its
    (adjective, noun) word pair and emit per-cell part count, exact
    retail-price cents, and size mass — the naming-convention ×
    price-mass matrix a catalog-hygiene pass reads before trusting
    name-derived idents (``picklist_ident_parts`` keys on the same
    first word). Map-only split over the dimension scan; only
    |adjectives| × |nouns| cells shuffle. Names with more or fewer
    than two words raise (the convention is closed, like the
    closed-dim FK raises elsewhere)."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _split(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern(batch["p_name"].combine_chunks(), " ")
        nw = np.asarray(pc.list_value_length(words), np.int64)
        if nw.size and not (nw == 2).all():
            raise ValueError("p_name outside the 'adj noun' convention")
        flat = words.flatten()
        price = np.rint(np.asarray(batch["p_retailprice"],
                                   np.float64) * 100).astype(np.int64)
        return pa.table({
            "adj": flat.take(pa.array(np.arange(0, 2 * len(nw), 2),
                                      pa.int64())),
            "noun": flat.take(pa.array(np.arange(1, 2 * len(nw), 2),
                                       pa.int64())),
            "retail_e2": pa.array(price, pa.int64()),
            "size": pc.cast(batch["p_size"], pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/part.parquet",
                           columns=["p_name", "p_retailprice",
                                    "p_size"]).map_batches(
            _split, batch_format="pyarrow"),
        ["adj", "noun"], ["retail_e2", "size"], count_as="n_parts")
    return g.map_batches(
        lambda t: pa.table({
            "adj": t["adj"], "noun": t["noun"],
            "n_parts": t["n_parts"],
            "sum_retail_e2": t["sum_retail_e2"],
            "sum_size": t["sum_size"],
        }).cast(PART_WORD_SCHEMA), batch_format="pyarrow")


NATION_PARTICIPANT_SCHEMA = pa.schema([
    ("n_name", pa.string()),
    ("n_customers", pa.int64()),
    ("n_suppliers", pa.int64()),
])


def nation_participant_counts(sf_dir: str):
    """Marketplace-balance reconciliation: per nation, how many
    customers AND how many suppliers sit in it — the two sides of
    ``segment_nation_matrix`` / ``supplier_balance_by_nation`` folded
    into one row so demand/supply imbalance is one subtraction. Both
    dimension scans tag (is_cust, is_supp) indicator columns and union
    into ONE nationkey exchange (block partials pre-combine, so ≤
    |nations| cells per block cross the wire); the nation name attaches
    as a broadcast array with the closed-dim raise. Nations with no
    participant on either side emit nothing (matching the SQL twin's
    inner join against the union)."""
    import numpy as np

    import ray.data

    from ..stages.agg import grouped_sums

    nation = read_parquet_clean(f"{sf_dir}/nation.parquet",
                                columns=["n_nationkey",
                                         "n_name"]).take_all()
    names = np.empty(max((r["n_nationkey"] for r in nation),
                         default=-1) + 1, dtype=object)
    for r in nation:
        names[r["n_nationkey"]] = r["n_name"]
    names_ref = ray.put(names)

    def _tag(key_col: str, is_cust: int):
        def _fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "nk": pc.cast(batch[key_col], pa.int64()),
                "is_cust": pa.array(np.full(n, is_cust, np.int64)),
                "is_supp": pa.array(np.full(n, 1 - is_cust, np.int64)),
            })
        return _fn

    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_nationkey"]).map_batches(
        _tag("c_nationkey", 1), batch_format="pyarrow")
    supp = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                              columns=["s_nationkey"]).map_batches(
        _tag("s_nationkey", 0), batch_format="pyarrow")
    g = grouped_sums(cust.union(supp), ["nk"], ["is_cust", "is_supp"])

    def _name(batch: pa.Table) -> pa.Table:
        nm = ray.get(names_ref)
        nk = np.asarray(batch["nk"], np.int64)
        if nk.size and (nk.min() < 0 or nk.max() >= nm.size):
            raise ValueError("nationkey outside the nation dim")
        return pa.table({
            "n_name": pa.array(nm[nk], pa.string()),
            "n_customers": batch["sum_is_cust"],
            "n_suppliers": batch["sum_is_supp"],
        }).cast(NATION_PARTICIPANT_SCHEMA)

    return g.map_batches(_name, batch_format="pyarrow")


SEG_STATUS_SCHEMA = pa.schema([
    ("c_mktsegment", pa.string()),
    ("o_orderstatus", pa.string()),
    ("n_orders", pa.int64()),
    ("sum_totalprice_e2", pa.int64()),
])


def segment_status_matrix(sf_dir: str):
    """Fulfillment-state composition per market segment: segment ×
    order-status cell counts with exact totalprice cents — which
    customer segments sit on open ('O') vs fulfilled ('F') demand, and
    how much money is parked in each state. The segment attaches to
    orders on the custkey exchange join (customer is a same-key
    projection, orders pre-project to (custkey, status, price_e2));
    only ≤ segments × statuses cells ride the final fold."""
    import numpy as np

    from ..config import DEFAULT_CONFIG, resolve_num_partitions
    from ..stages.agg import grouped_sums
    from ..stages.join import hash_join_exchange

    def _ord(batch: pa.Table) -> pa.Table:
        price = np.rint(np.asarray(batch["o_totalprice"],
                                   np.float64) * 100).astype(np.int64)
        return pa.table({
            "o_custkey": pc.cast(batch["o_custkey"], pa.int64()),
            "o_orderstatus": batch["o_orderstatus"],
            "price_e2": pa.array(price, pa.int64()),
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus",
                 "o_totalprice"]).map_batches(_ord,
                                              batch_format="pyarrow")
    cust = read_parquet_clean(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    joined = hash_join_exchange(
        orders, cust, key="ck",
        left_cols=["o_orderstatus", "price_e2"],
        right_cols=["c_mktsegment"],
        n_parts=resolve_num_partitions(DEFAULT_CONFIG),
        left_key="o_custkey", right_key="c_custkey")
    g = grouped_sums(joined.map_batches(
        lambda t: pa.table({"c_mktsegment": t["c_mktsegment"],
                            "o_orderstatus": t["o_orderstatus"],
                            "price_e2": t["price_e2"]}),
        batch_format="pyarrow"),
        ["c_mktsegment", "o_orderstatus"], ["price_e2"],
        count_as="n_orders")
    return g.map_batches(
        lambda t: pa.table({
            "c_mktsegment": t["c_mktsegment"],
            "o_orderstatus": t["o_orderstatus"],
            "n_orders": t["n_orders"],
            "sum_totalprice_e2": t["sum_price_e2"],
        }).cast(SEG_STATUS_SCHEMA), batch_format="pyarrow")


SUPP_BAND_SCHEMA = pa.schema([
    ("n_name", pa.string()),
    ("band", pa.string()),
    ("n_suppliers", pa.int64()),
    ("sum_acctbal_e2", pa.int64()),
])


def supplier_acctbal_band_census(sf_dir: str):
    """Credit-band composition of the supply base per nation: suppliers
    bucketed into negative / low (< $5000) / high account-balance bands
    with exact cent mass per (nation, band) cell — which procurement
    regions lean on financially stressed suppliers. Band edges are
    evaluated on the EXACT cent integers (never the float), so the
    boundary rows land identically on both engines. Broadcast nation
    dim via `ray.put`, map-only partials, ≤ nations × 3 cells fold;
    an s_nationkey outside the closed dim raises."""
    import numpy as np

    from ..stages.agg import grouped_sums

    nation = {r["n_nationkey"]: r["n_name"]
              for r in read_parquet_clean(
                  f"{sf_dir}/nation.parquet").take_all()}
    max_nk = max(nation) if nation else -1
    nm = np.empty(max_nk + 1, dtype=object)
    for k, v in nation.items():
        nm[k] = v
    nm_ref = ray.put(nm)
    bands = np.array(["negative", "low", "high"], dtype=object)

    def _prep(batch: pa.Table) -> pa.Table:
        names = ray.get(nm_ref)
        nk = np.asarray(batch["s_nationkey"], np.int64)
        if nk.size and (nk.min() < 0 or nk.max() >= names.size):
            raise ValueError("s_nationkey outside nation dimension")
        cents = np.rint(np.asarray(batch["s_acctbal"],
                                   np.float64) * 100).astype(np.int64)
        band = np.where(cents < 0, 0, np.where(cents < 500000, 1, 2))
        return pa.table({
            "n_name": pa.array(names[nk], pa.string()),
            "band": pa.array(bands[band], pa.string()),
            "cents": pa.array(cents, pa.int64()),
        })

    ds = read_parquet_clean(f"{sf_dir}/supplier.parquet",
                            columns=["s_nationkey", "s_acctbal"]
                            ).map_batches(_prep, batch_format="pyarrow")
    g = grouped_sums(ds, ["n_name", "band"], ["cents"],
                     count_as="n_suppliers")
    return g.map_batches(
        lambda t: pa.table({
            "n_name": t["n_name"], "band": t["band"],
            "n_suppliers": t["n_suppliers"],
            "sum_acctbal_e2": t["sum_cents"],
        }).cast(SUPP_BAND_SCHEMA), batch_format="pyarrow")


DOM_CENSUS_SCHEMA = pa.schema([
    ("day_of_month", pa.int64()),
    ("n_orders", pa.int64()),
    ("sum_totalprice_e2", pa.int64()),
])


def orders_day_of_month_census(sf_dir: str):
    """Month-end batch-effect detector: order count + exact totalprice
    cents per calendar day-of-month (1..31). Real order flow is ~flat
    across the month modulo the 29-31 tail; a spike at day 1 or the
    last day flags batch postings or date truncation upstream. Map-only
    `pc.day` extraction, ≤ 31 cells ride the fold."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _dom(batch: pa.Table) -> pa.Table:
        price = np.rint(np.asarray(batch["o_totalprice"],
                                   np.float64) * 100).astype(np.int64)
        return pa.table({
            "day_of_month": pc.cast(pc.day(batch["o_orderdate"]),
                                    pa.int64()),
            "cents": pa.array(price, pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_orderdate", "o_totalprice"]
                           ).map_batches(_dom, batch_format="pyarrow"),
        ["day_of_month"], ["cents"], count_as="n_orders")
    return g.map_batches(
        lambda t: pa.table({
            "day_of_month": t["day_of_month"],
            "n_orders": t["n_orders"],
            "sum_totalprice_e2": t["sum_cents"],
        }).cast(DOM_CENSUS_SCHEMA), batch_format="pyarrow")


SHIP_SPAN_SCHEMA = pa.schema([
    ("span_days", pa.int64()),
    ("n_orders", pa.int64()),
])


def order_ship_span_histogram(sf_dir: str):
    """Fulfillment-window histogram: per order, days between its FIRST
    and LAST line shipment (0 = single-shipment order), contracted to a
    (span_days → n_orders) census — long spans flag split shipments and
    backorder churn that per-line latency histograms can't see. Block
    combiner via `grouped_minmax` (min of minima / max of maxima exact
    for any distribution), then span cells fold; the span is
    non-negative by construction so floor and truncating division
    agree across engines."""
    import numpy as np

    from ..config import DEFAULT_CONFIG as _cfg
    from ..config import resolve_num_partitions
    from ..stages.agg import grouped_minmax, grouped_sums

    lines = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate"]).map_batches(
        lambda t: pa.table({
            "okey": pc.cast(t["l_orderkey"], pa.int64()),
            "ship_us": pc.cast(t["l_shipdate"], pa.int64()),
        }), batch_format="pyarrow")
    per = grouped_minmax(lines, ["okey"], "ship_us",
                         n_parts=resolve_num_partitions(_cfg))

    def _span(batch: pa.Table) -> pa.Table:
        lo = np.asarray(batch["min_ship_us"], np.int64)
        hi = np.asarray(batch["max_ship_us"], np.int64)
        return pa.table({
            "span_days": pa.array((hi - lo) // 86_400_000_000,
                                  pa.int64()),
        })

    g = grouped_sums(per.map_batches(_span, batch_format="pyarrow"),
                     ["span_days"], [], count_as="n_orders")
    return g.map_batches(lambda t: t.cast(SHIP_SPAN_SCHEMA),
                         batch_format="pyarrow")


CUST_BAND_SEG_SCHEMA = pa.schema([
    ("c_mktsegment", pa.string()),
    ("band", pa.string()),
    ("n_customers", pa.int64()),
    ("sum_acctbal_e2", pa.int64()),
])


def customer_acctbal_band_by_segment(sf_dir: str):
    """Credit-band composition per MARKET SEGMENT (the demand-side twin
    of `supplier_acctbal_band_census`): customers bucketed into
    negative / low (< $5000) / high balance bands with exact cent mass
    per (segment, band) cell — which segments carry deadbeat risk.
    Band edges evaluate on the exact cent integers; map-only,
    ≤ segments × 3 cells fold."""
    import numpy as np

    from ..stages.agg import grouped_sums

    bands = np.array(["negative", "low", "high"], dtype=object)

    def _prep(batch: pa.Table) -> pa.Table:
        cents = np.rint(np.asarray(batch["c_acctbal"],
                                   np.float64) * 100).astype(np.int64)
        band = np.where(cents < 0, 0, np.where(cents < 500000, 1, 2))
        return pa.table({
            "c_mktsegment": batch["c_mktsegment"],
            "band": pa.array(bands[band], pa.string()),
            "cents": pa.array(cents, pa.int64()),
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/customer.parquet",
                           columns=["c_mktsegment", "c_acctbal"]
                           ).map_batches(_prep, batch_format="pyarrow"),
        ["c_mktsegment", "band"], ["cents"], count_as="n_customers")
    return g.map_batches(
        lambda t: pa.table({
            "c_mktsegment": t["c_mktsegment"], "band": t["band"],
            "n_customers": t["n_customers"],
            "sum_acctbal_e2": t["sum_cents"],
        }).cast(CUST_BAND_SEG_SCHEMA), batch_format="pyarrow")


CENTS_CENSUS_SCHEMA = pa.schema([
    ("cents", pa.int64()),
    ("n_orders", pa.int64()),
])


def order_cents_census(sf_dir: str):
    """Sub-dollar digit census: order count per cents value (0..99) of
    o_totalprice — the rounding/fraud audit that complements
    `benford_first_digit_orders` at the OTHER end of the number
    (organic prices are ~uniform in cents; a spike at .00/.99 flags
    hand-entered or synthetic amounts). Cents derive from the same
    exact round(×100) integers every money op uses; map-only, ≤ 100
    cells fold."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _cents(batch: pa.Table) -> pa.Table:
        e2 = np.rint(np.asarray(batch["o_totalprice"],
                                np.float64) * 100).astype(np.int64)
        if e2.size and e2.min() < 0:
            raise ValueError("negative totalprice: %% convention "
                             "differs across engines below zero")
        return pa.table({"cents": pa.array(e2 % 100, pa.int64())})

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_totalprice"]).map_batches(
            _cents, batch_format="pyarrow"),
        ["cents"], [], count_as="n_orders")
    return g.map_batches(lambda t: t.cast(CENTS_CENSUS_SCHEMA),
                         batch_format="pyarrow")


LINEPOS_RETURN_SCHEMA = pa.schema([
    ("l_linenumber", pa.int64()),
    ("n_lines", pa.int64()),
    ("n_returned", pa.int64()),
    ("returned_permille", pa.int64()),
])


def returns_by_line_position(sf_dir: str):
    """Return share by LINE POSITION within the order (linenumber 1..n):
    do later add-on lines come back more often than the anchor line? —
    the positional bias slice `return_rate_by_month` (time) and
    `returns_by_order_size` (breadth) can't see. Map-only flag fold,
    ≤ max-linenumber cells; permille on exact integers."""
    import numpy as np

    from ..stages.agg import grouped_sums

    def _prep(batch: pa.Table) -> pa.Table:
        r = pc.cast(pc.equal(batch["l_returnflag"], "R"), pa.int64())
        return pa.table({
            "l_linenumber": pc.cast(batch["l_linenumber"], pa.int64()),
            "r": r,
        })

    g = grouped_sums(
        read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                           columns=["l_linenumber", "l_returnflag"]
                           ).map_batches(_prep, batch_format="pyarrow"),
        ["l_linenumber"], ["r"], count_as="n_lines")

    def _share(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_lines"], np.int64)
        r = np.asarray(t["sum_r"], np.int64)
        return pa.table({
            "l_linenumber": t["l_linenumber"],
            "n_lines": pa.array(n, pa.int64()),
            "n_returned": pa.array(r, pa.int64()),
            "returned_permille": pa.array(1000 * r // n, pa.int64()),
        }).cast(LINEPOS_RETURN_SCHEMA)

    return g.map_batches(_share, batch_format="pyarrow")

"""grouped_sums (combiner + exchange) ≡ pandas groupby on random data."""
import numpy as np
import pandas as pd
import pyarrow as pa


def test_grouped_sums_matches_pandas(ray_session):
    import ray.data

    from sourmash_ray.stages.agg import grouped_sums

    rng = np.random.default_rng(21)
    n = 20_000
    df = pd.DataFrame({
        "k1": rng.choice(["a", "b", "c", "d"], n),
        "k2": rng.integers(0, 7, n),
        "v1": rng.integers(-100, 100, n),
        "v2": rng.integers(0, 10**9, n),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(9)
    out = grouped_sums(ds, ["k1", "k2"], ["v1", "v2"],
                       count_as="n").take_all()
    got = {(r["k1"], r["k2"]): (r["sum_v1"], r["sum_v2"], r["n"])
           for r in out}
    exp = df.groupby(["k1", "k2"]).agg(
        sum_v1=("v1", "sum"), sum_v2=("v2", "sum"), n=("v1", "count"))
    assert len(got) == len(exp)
    for (k1, k2), row in exp.iterrows():
        assert got[(k1, k2)] == (row["sum_v1"], row["sum_v2"], row["n"])


def test_grouped_sums_count_only(ray_session):
    import ray.data

    from sourmash_ray.stages.agg import grouped_sums

    tbl = pa.table({"k": pa.array([1, 1, 2, 3, 3, 3], pa.int64())})
    out = grouped_sums(ray.data.from_arrow(tbl), ["k"], [],
                       count_as="n").take_all()
    assert {(r["k"], r["n"]) for r in out} == {(1, 2), (2, 1), (3, 3)}


def test_grouped_topk_matches_pandas(ray_session):
    """Partial top-k combiner + exchange ≡ a global row_number() pass,
    across many blocks (dup order values exercise the tiebreak)."""
    import ray.data

    from sourmash_ray.stages.agg import grouped_topk

    rng = np.random.default_rng(5)
    n = 30_000
    df = pd.DataFrame({
        "key": rng.integers(0, 900, n),
        "score": np.round(rng.normal(0, 100, n), 2),
        "id": rng.permutation(n).astype(np.int64),
    })
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(11)
    for k in (1, 3, 7):
        out = grouped_topk(ds, "key", "score", k, "id").take_all()
        got = {(r["key"], r["id"]): (r["score"], r["rn"]) for r in out}
        exp = df.sort_values(["key", "score", "id"],
                             ascending=[True, False, True])
        exp = exp.assign(rn=exp.groupby("key").cumcount() + 1)
        exp = exp[exp["rn"] <= k]
        assert len(got) == len(exp)
        for _, row in exp.iterrows():
            assert got[(row["key"], row["id"])] == \
                (row["score"], row["rn"]), row

def test_grouped_topk_empty_and_single(ray_session):
    import ray.data

    from sourmash_ray.stages.agg import grouped_topk

    tbl = pa.table({"key": pa.array([], pa.int64()),
                    "score": pa.array([], pa.float64()),
                    "id": pa.array([], pa.int64())})
    assert grouped_topk(ray.data.from_arrow(tbl), "key", "score", 3,
                        "id").count() == 0
    one = pa.table({"key": pa.array([9], pa.int64()),
                    "score": pa.array([1.5], pa.float64()),
                    "id": pa.array([4], pa.int64())})
    rows = grouped_topk(ray.data.from_arrow(one), "key", "score", 3,
                        "id").take_all()
    assert rows == [{"key": 9, "score": 1.5, "id": 4, "rn": 1}]


def test_quantiles_disc_matches_duckdb_semantics(ray_session):
    """quantiles_disc == sorted-column element at max(0, ceil(q*n)-1)
    (DuckDB quantile_disc), on random integer data across blocks."""
    import ray.data

    from sourmash_ray.stages.agg import quantiles_disc

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 500, 25_000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(7)
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    out = quantiles_disc(ds, "v", qs).to_pylist()
    s = np.sort(vals)
    import math

    for r in out:
        idx = max(0, math.ceil(r["q"] * len(s)) - 1)
        assert r["value"] == s[idx], r
    assert [r["q"] for r in out] == qs


def test_hex8_to_int_matches_python():
    import hashlib

    from sourmash_ray.pipelines.docops import _hex8_to_int

    hexes = [hashlib.md5(str(i).encode()).hexdigest() for i in range(200)]
    got = _hex8_to_int(pa.array(hexes, pa.string()))
    want = np.array([int(h[:8], 16) for h in hexes], np.uint64)
    assert (got == want).all()


def test_grouped_quantiles_matches_per_group_reference(ray_session):
    import math

    import ray.data

    from sourmash_ray.stages.agg import grouped_quantiles_disc

    rng = np.random.default_rng(3)
    n = 12_000
    tbl = pa.table({
        "g": pa.array(rng.choice(["x", "y", "z"], n)),
        "v": pa.array(rng.integers(0, 300, n).astype(np.int64)),
    })
    ds = ray.data.from_arrow(tbl).repartition(5)
    qs = [0.25, 0.5, 0.9]
    out = grouped_quantiles_disc(ds, "g", "v", qs).to_pylist()
    df = tbl.to_pandas()
    for r in out:
        s = np.sort(df[df["g"] == r["g"]]["v"].to_numpy())
        idx = max(0, math.ceil(r["q"] * len(s)) - 1)
        assert r["value"] == s[idx], r
    assert len(out) == 3 * len(qs)


def test_shard_shuffle_docs_is_a_permutation(ray_session):
    """Every doc appears exactly once; positions are dense 0..n_s-1 per
    shard; shard order is a pure function of identity (rerun-stable)."""
    import numpy as np

    from sourmash_ray.pipelines.docops import shard_shuffle_docs

    sf = "/root/testdata/sf0.001"
    rows = shard_shuffle_docs(sf, n_shards=4).take_all()
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))
    # deterministic across runs
    rows2 = shard_shuffle_docs(sf, n_shards=4).take_all()
    key = lambda r: (r["shard"], r["pos"], r["doc_id"])
    assert sorted(rows, key=key) == sorted(rows2, key=key)


def test_repetition_stats_edge_cases(ray_session, tmp_path):
    """Empty text counts one empty token (string_split semantics);
    repeated tokens drive top_count; NULL text behaves like ''."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import repetition_stats_docs

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["a a a b", "", None, "x"], pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["src0"] * 4, pa.string()),
        "n_chars": pa.array([7, 0, 0, 1], pa.int64()),
    })
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["top_count"])
           for r in repetition_stats_docs(str(tmp_path)).take_all()}
    assert got == {0: (4, 2, 3), 1: (1, 1, 1), 2: (1, 1, 1),
                   3: (1, 1, 1)}


def test_decontaminate_docs_flags_shared_trigrams(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.docops import decontaminate_docs

    texts = ["the quick brown fox",          # bench doc 0
             "lazy dog sleeps here",         # bench doc 1
             "a quick brown fox runs",       # shares 'quick brown fox'
             "completely different words entirely",
             "the quick brown fox jumps",    # shares two positions
             "xy"]                           # too short for any trigram
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["src0"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r["n_hits"]
           for r in decontaminate_docs(str(tmp_path),
                                       n_bench=2).take_all()}
    assert got == {2: 1, 3: 0, 4: 2, 5: 0}


def test_curate_docs_composed_gates(ray_session):
    """curate = length band ∩ repetition gate ∩ decontamination-clean."""
    from sourmash_ray.pipelines.docops import (curate_docs,
                                               decontaminate_docs)

    sf = "/root/testdata/sf0.001"
    kept = {r["doc_id"] for r in curate_docs(sf).take_all()}
    assert kept                                     # gate is non-trivial
    clean = {r["doc_id"] for r in decontaminate_docs(sf).take_all()
             if r["n_hits"] == 0}
    assert kept <= clean                            # never keeps a hit
    # deterministic
    assert kept == {r["doc_id"] for r in curate_docs(sf).take_all()}


def test_grouped_distinct_count_matches_naive(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sourmash_ray.stages.agg import grouped_distinct_count

    rng = np.random.default_rng(5)
    n = 5000
    ks = [f"t{i}" for i in rng.integers(0, 4, n)]
    vs = rng.integers(0, 300, n).astype(object)
    # sprinkle NULLs: excluded from distinct, included in count(*)
    vs[rng.integers(0, n, 200)] = None
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(ks, pa.string()),
        "v": pa.array(list(vs), pa.int64()),
    })).repartition(7)
    got = {r["k"]: (r["nd"], r["nr"]) for r in grouped_distinct_count(
        ds, ["k"], "v", distinct_as="nd", count_as="nr").take_all()}
    want = {}
    for k in set(ks):
        rows = [v for kk, v in zip(ks, vs) if kk == k]
        want[k] = (len({v for v in rows if v is not None}), len(rows))
    assert got == want


def test_grouped_distinct_count_multikey_string_values(ray_session):
    import pyarrow as pa
    import ray.data

    from sourmash_ray.stages.agg import grouped_distinct_count

    rows = [("a", 1, "x"), ("a", 1, "x"), ("a", 1, "y"), ("a", 2, "x"),
            ("b", 1, None), ("b", 1, "z"), ("b", 1, "z")]
    ds = ray.data.from_arrow(pa.table({
        "g1": pa.array([r[0] for r in rows], pa.string()),
        "g2": pa.array([r[1] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(3)
    got = {(r["g1"], r["g2"]): (r["nd"], r["nr"])
           for r in grouped_distinct_count(
               ds, ["g1", "g2"], "v", distinct_as="nd",
               count_as="nr").take_all()}
    assert got == {("a", 1): (2, 3), ("a", 2): (1, 1), ("b", 1): (1, 3)}


def test_grouped_approx_distinct_within_tolerance(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from sourmash_ray.stages.agg import grouped_distinct_count
    from sourmash_ray.stages.approx import grouped_approx_distinct

    rng = np.random.default_rng(31)
    n = 40_000
    ks = [f"g{i}" for i in rng.integers(0, 3, n)]
    vs = rng.integers(0, 5000, n)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(ks, pa.string()),
        "v": pa.array(vs, pa.int64()),
    })).repartition(9)
    exact = {r["k"]: r["nd"] for r in grouped_distinct_count(
        ds, ["k"], "v", distinct_as="nd").take_all()}
    approx = {r["k"]: r["ad"] for r in grouped_approx_distinct(
        ds, ["k"], "v", p=14, distinct_as="ad").take_all()}
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(0.05 * exact[k], 3), \
            (k, approx[k], exact[k])


def test_grouped_approx_distinct_null_and_small(ray_session):
    import pyarrow as pa
    import ray.data

    from sourmash_ray.stages.approx import grouped_approx_distinct

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "a", "a", "b"], pa.string()),
        "v": pa.array(["x", "x", None, "y"], pa.string()),
    }))
    got = {r["k"]: r["ad"] for r in grouped_approx_distinct(
        ds, ["k"], "v", distinct_as="ad").take_all()}
    # small-range HLL is exact; NULL excluded
    assert got == {"a": 1, "b": 1}


# running-window kernel vs nested-loop oracle (no Ray needed)

from hypothesis import given, settings
from hypothesis import strategies as st

_orders = st.lists(
    st.tuples(st.integers(0, 3),      # custkey
              st.integers(0, 20),     # ts (ties likely)
              st.integers(-50, 50)),  # cents
    min_size=0, max_size=40)


@settings(max_examples=80, deadline=None)
@given(_orders)
def test_running_totals_kernel_matches_nested_loop(rows):
    import pyarrow as pa

    from sourmash_ray.pipelines.relational import running_totals_partition

    part = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderkey": pa.array(list(range(len(rows))), pa.int64()),
        "ts_us": pa.array([r[1] for r in rows], pa.int64()),
        "price_cents": pa.array([r[2] for r in rows], pa.int64()),
    })
    got = {r["o_orderkey"]: (r["running_cents"], r["gap_us"])
           for r in running_totals_partition(part).to_pylist()}
    want = {}
    for i, (ck, ts, c) in enumerate(rows):
        hist = sorted((t, j, cc) for j, (k, t, cc) in enumerate(rows)
                      if k == ck and (t, j) <= (ts, i))
        run = sum(cc for _, _, cc in hist)
        gap = ts - hist[-2][0] if len(hist) > 1 else None
        want[i] = (run, gap)
    assert got == want


def test_grouped_topk_string_key(ray_session):
    """String group keys group by exact value (S-dtype runs) — includes
    keys that collide on any prefix and empty string."""
    import pyarrow as pa

    import ray

    from sourmash_ray.stages.agg import grouped_topk

    rows = [("apple", 5, 1), ("apple", 7, 2), ("app", 9, 3),
            ("", 4, 4), ("banana", 7, 5), ("banana", 7, 6),
            ("apple", 7, 7)]
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.string()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
        "id": pa.array([r[2] for r in rows], pa.int64()),
    }))
    got = sorted((r["k"], r["v"], r["id"], r["rn"]) for r in
                 grouped_topk(ds, key="k", order_col="v", k=2,
                              tiebreak="id", n_parts=3).take_all())
    want = []
    for k in {r[0] for r in rows}:
        grp = sorted((r for r in rows if r[0] == k),
                     key=lambda r: (-r[1], r[2]))[:2]
        want += [(r[0], r[1], r[2], i + 1) for i, r in enumerate(grp)]
    assert got == sorted(want)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20),
                          st.integers(0, 99)),
                min_size=0, max_size=30),
       st.integers(1, 5))
def test_moving_totals_kernel_matches_nested_loop(rows, k):
    """ROWS-frame last-k sum per key vs brute force."""
    import pyarrow as pa

    from sourmash_ray.pipelines.relational import moving_totals_partition

    part = pa.table({
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderkey": pa.array(list(range(len(rows))), pa.int64()),
        "ts_us": pa.array([r[1] for r in rows], pa.int64()),
        "price_cents": pa.array([r[2] for r in rows], pa.int64()),
    })
    got = {r["o_orderkey"]: r["moving3_cents"]
           for r in moving_totals_partition(part, k=k).to_pylist()}
    for i, (ck, ts, c) in enumerate(rows):
        hist = sorted((t, j, cc) for j, (kk, t, cc) in enumerate(rows)
                      if kk == ck and (t, j) <= (ts, i))
        want = sum(cc for _, _, cc in hist[-k:])
        assert got[i] == want, (rows, k, i)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 4), st.integers(-50, 50)),
                min_size=1, max_size=40))
def test_grouped_minmax_matches_python(ray_session, rows):
    import pyarrow as pa

    import ray

    from sourmash_ray.stages.agg import grouped_minmax

    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[1] for r in rows], pa.int64()),
    })).repartition(3)
    got = {r["k"]: (r["min_v"], r["max_v"], r["n"])
           for r in grouped_minmax(ds, ["k"], "v",
                                   count_as="n").take_all()}
    want = {}
    for k, v in rows:
        lo, hi, n = want.get(k, (v, v, 0))
        want[k] = (min(lo, v), max(hi, v), n + 1)
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 120)),
                min_size=1, max_size=30),
       st.integers(1, 10))
def test_sessionize_matches_nested_loop(ray_session, tmp_path_factory,
                                        evs, gap_min):
    """Session windows vs a brute-force grouper (gap > threshold breaks
    a session; per-user, exchange-partitioned)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sourmash_ray.pipelines.eventops import sessionize_events

    d = tmp_path_factory.mktemp("sess")
    base = 1_700_000_000_000_000
    minute = 60_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(evs))), pa.int64()),
        "ts": pa.array([base + t * minute for _, t in evs],
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in evs], pa.int64()),
        "event_type": pa.array(["view"] * len(evs), pa.string()),
        "value": pa.array([1.0] * len(evs), pa.float64()),
        "props": pa.array(["{}"] * len(evs), pa.string()),
    }), f"{d}/events.parquet")

    got = sorted((r["user_id"], r["session_start"].timestamp(),
                  r["n_events"])
                 for r in sessionize_events(str(d),
                                            gap_minutes=gap_min)
                 .take_all())
    want = []
    for u in set(e[0] for e in evs):
        ts = sorted(t for ou, t in evs if ou == u)
        start, n = ts[0], 1
        for prev, cur in zip(ts, ts[1:]):
            if cur - prev > gap_min:
                want.append((u, (base + start * minute) / 1e6, n))
                start, n = cur, 1
            else:
                n += 1
        want.append((u, (base + start * minute) / 1e6, n))
    assert got == sorted(want), (evs, gap_min)


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
       st.floats(0.01, 0.99))
def test_quantiles_disc_matches_duckdb_property(ray_session, vals, q):
    """quantile_disc parity over arbitrary int lists and q — the driver
    hash check only exercises the four fixed qs."""
    import duckdb
    import pyarrow as pa

    import ray

    from sourmash_ray.stages.agg import quantiles_disc

    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})
                             ).repartition(3)
    got = quantiles_disc(ds, "v", [q]).to_pylist()[0]["value"]
    want = duckdb.connect().execute(
        "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)",
        [q, vals]).fetchone()[0]
    assert got == want, (vals, q)

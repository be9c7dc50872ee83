"""waiting_suppliers (Q21-style only-late-supplier logic) and
nation_market_share (Q8-style regional share) — hand fixtures for the
per-order EXISTS / NOT-EXISTS edge cases plus DuckDB twins at sf0.001."""
import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
DAY_US = 86_400_000_000


def _write_fixture(tmp_path):
    """4 orders exercising every Q21 branch:
    o1 (F): s1 late, s2 on time, 2 suppliers  -> credit s1
    o2 (F): s1 late, s2 late                  -> nobody (2 late)
    o3 (F): s1 late alone                     -> nobody (1 supplier)
    o4 (O): s1 late, s2 on time               -> nobody (not 'F')
    plus o5 (F): s2's later line is late even though its first line is
    on time (max-shipdate semantics), s3 on time -> credit s2
    """
    base = np.datetime64("2024-01-01T00:00:00", "us")
    late = base + np.timedelta64(100 * 86_400_000_000, "us")
    ok_ = base + np.timedelta64(5 * 86_400_000_000, "us")
    orders = {
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_custkey": [1] * 5,
        "o_orderstatus": ["F", "F", "F", "O", "F"],
        "o_totalprice": [1.0] * 5,
        "o_orderdate": pa.array([base] * 5, pa.timestamp("us")),
        "o_orderpriority": ["1-URGENT"] * 5,
    }
    li = [
        (1, 1, late), (1, 2, ok_),
        (2, 1, late), (2, 2, late),
        (3, 1, late),
        (4, 1, late), (4, 2, ok_),
        (5, 2, ok_), (5, 2, late), (5, 3, ok_),
    ]
    lineitem = {
        "l_orderkey": [r[0] for r in li],
        "l_suppkey": [r[1] for r in li],
        "l_shipdate": pa.array([r[2] for r in li], pa.timestamp("us")),
    }
    supplier = {
        "s_suppkey": [1, 2, 3],
        "s_name": ["SUPP_1", "SUPP_2", "SUPP_3"],
        "s_nationkey": [0, 0, 0],
    }
    pq.write_table(pa.table(orders), f"{tmp_path}/orders.parquet")
    pq.write_table(pa.table(lineitem), f"{tmp_path}/lineitem.parquet")
    pq.write_table(pa.table(supplier), f"{tmp_path}/supplier.parquet")


def test_waiting_suppliers_hand_fixture(ray_session, tmp_path):
    from sourmash_ray.pipelines.relational import waiting_suppliers

    _write_fixture(tmp_path)
    got = {r["s_name"]: r["numwait"]
           for r in waiting_suppliers(str(tmp_path)).take_all()}
    assert got == {"SUPP_1": 1, "SUPP_2": 1}


def test_waiting_suppliers_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import waiting_suppliers

    got = {r["s_name"]: r["numwait"]
           for r in waiting_suppliers(SF).take_all()}
    want = dict(duckdb.connect().execute(f"""
        WITH f AS (SELECT o_orderkey, o_orderdate
                   FROM read_parquet('{SF}/orders.parquet')
                   WHERE o_orderstatus = 'F'),
        g AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms
              FROM read_parquet('{SF}/lineitem.parquet') GROUP BY 1, 2),
        j AS (SELECT g.l_orderkey AS ok, g.l_suppkey AS sk,
                     CASE WHEN g.ms > f.o_orderdate + INTERVAL 90 DAY
                          THEN 1 ELSE 0 END AS late
              FROM g JOIN f ON g.l_orderkey = f.o_orderkey),
        o AS (SELECT ok, count(*) AS n_supp, sum(late) AS n_late,
                     max(CASE WHEN late = 1 THEN sk END) AS late_sk
              FROM j GROUP BY 1)
        SELECT s.s_name, count(*) FROM o
        JOIN read_parquet('{SF}/supplier.parquet') s
          ON s.s_suppkey = o.late_sk
        WHERE o.n_supp >= 2 AND o.n_late = 1 GROUP BY 1
    """).fetchall())
    assert got == want
    assert got  # non-degenerate at sf0.001


def test_nation_market_share_matches_duckdb(ray_session):
    from sourmash_ray.pipelines.relational import nation_market_share

    got = {r["year"]: (r["nation_rev_e4"], r["total_rev_e4"],
                       r["share_e4"])
           for r in nation_market_share(SF).take_all()}
    want = {int(y): (int(n), int(t), int(s))
            for y, n, t, s in duckdb.connect().execute(f"""
        WITH nat AS (SELECT * FROM
                     read_parquet('{SF}/nation.parquet')),
        tn AS (SELECT n_nationkey, n_regionkey FROM nat
               WHERE n_name = 'NATION_7'),
        rn AS (SELECT n_nationkey FROM nat
               WHERE n_regionkey = (SELECT n_regionkey FROM tn)),
        l AS (SELECT l_orderkey,
                     CAST(round(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(round(l_discount * 100) AS BIGINT))
                       AS rev,
                     CASE WHEN s.s_nationkey =
                              (SELECT n_nationkey FROM tn)
                          THEN 1 ELSE 0 END AS is_t
              FROM read_parquet('{SF}/lineitem.parquet')
              JOIN read_parquet('{SF}/supplier.parquet') s
                ON s.s_suppkey = l_suppkey),
        j AS (SELECT year(o.o_orderdate) AS year, l.rev, l.is_t
              FROM l JOIN read_parquet('{SF}/orders.parquet') o
                ON o.o_orderkey = l.l_orderkey
              JOIN read_parquet('{SF}/customer.parquet') c
                ON c.c_custkey = o.o_custkey
              WHERE c.c_nationkey IN (SELECT n_nationkey FROM rn))
        SELECT year, sum(rev * is_t), sum(rev),
               CAST(floor(10000.0 * sum(rev * is_t)
                          / greatest(sum(rev), 1)) AS BIGINT)
        FROM j GROUP BY 1
    """).fetchall()}
    assert got == want
    # non-degenerate denominator (the numerator can be 0 at sf0.001 —
    # the target nation may simply have no in-region revenue there)
    assert any(v[1] > 0 for v in got.values())


def test_nation_market_share_unknown_nation_typed_empty(ray_session):
    from sourmash_ray.pipelines.relational import nation_market_share

    out = nation_market_share(SF, nation_name="NO_SUCH_NATION")
    assert out.count() == 0
    assert set(out.schema().names) == {"year", "nation_rev_e4",
                                       "total_rev_e4", "share_e4"}


def test_cross_source_dup_matrix_hand_fixture(ray_session, tmp_path):
    """Groups: m1 = {A, A, B} -> (A,A) + (A,B); m2 = {B, C} -> (B,C);
    m3 = {C} singleton -> nothing. Diagonal counts same-source >=2."""
    from sourmash_ray.pipelines.docops import cross_source_dup_matrix

    docs = [
        (0, "x y z", "A"), (1, "x  y z ", "A"), (2, "X Y Z", "B"),
        (3, "q r", "B"), (4, "q r", "C"),
        (5, "unique text", "C"),
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "source": pa.array([d[2] for d in docs], pa.string()),
    }), f"{tmp_path}/documents.parquet")
    res = cross_source_dup_matrix(str(tmp_path))
    rows = (res.take_all() if hasattr(res, "take_all")
            else res.to_pylist())
    got = {(r["src_a"], r["src_b"]): r["n_groups"] for r in rows}
    # "x y z" normalizes ws-equal across all three docs (lower+collapse)
    assert got == {("A", "A"): 1, ("A", "B"): 1, ("B", "C"): 1}


def test_snapshot_diff_docs_hand_fixture(ray_session, tmp_path):
    from sourmash_ray.pipelines.docops import snapshot_diff_docs

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["same", "will change", "gone", None],
                         pa.string()),
    }), f"{a}/documents.parquet")
    pq.write_table(pa.table({
        # doc 4: None in A vs "" in B — ws-normalize-equal, NOT changed
        "doc_id": pa.array([1, 2, 4, 5], pa.int64()),
        "text": pa.array(["same", "did change", "", "brand new"],
                         pa.string()),
    }), f"{b}/documents.parquet")
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff_docs(str(a), str(b)).take_all()}
    assert got == {2: "changed", 3: "removed", 5: "added"}


def test_waiting_suppliers_random_fixtures_match_duckdb(ray_session,
                                                        tmp_path):
    """Seeded random order/lineitem tables (heavy key reuse, status mix,
    ship dates straddling the 90-day fence) — the only-late-supplier
    logic must equal the DuckDB formulation on every draw."""
    from sourmash_ray.pipelines.relational import waiting_suppliers

    rng = np.random.default_rng(7)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    for trial in range(6):
        d = tmp_path / f"t{trial}"
        d.mkdir()
        n_ord, n_li = 30, 150
        pq.write_table(pa.table({
            "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
            "o_custkey": pa.array([1] * n_ord, pa.int64()),
            "o_orderstatus": pa.array(
                rng.choice(["F", "O", "P"], n_ord).tolist()),
            "o_totalprice": pa.array([1.0] * n_ord),
            "o_orderdate": pa.array(
                [base + np.timedelta64(int(x) * DAY_US, "us")
                 for x in rng.integers(0, 30, n_ord)],
                pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT"] * n_ord),
        }), f"{d}/orders.parquet")
        pq.write_table(pa.table({
            "l_orderkey": pa.array(
                rng.integers(1, n_ord + 1, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(1, 6, n_li), pa.int64()),
            "l_shipdate": pa.array(
                [base + np.timedelta64(int(x) * DAY_US, "us")
                 for x in rng.integers(0, 200, n_li)],
                pa.timestamp("us")),
        }), f"{d}/lineitem.parquet")
        pq.write_table(pa.table({
            "s_suppkey": pa.array(range(1, 6), pa.int64()),
            "s_name": pa.array([f"S{i}" for i in range(1, 6)]),
            "s_nationkey": pa.array([0] * 5, pa.int64()),
        }), f"{d}/supplier.parquet")

        got = {r["s_name"]: r["numwait"]
               for r in waiting_suppliers(str(d)).take_all()}
        want = dict(duckdb.connect().execute(f"""
            WITH f AS (SELECT o_orderkey, o_orderdate
                       FROM read_parquet('{d}/orders.parquet')
                       WHERE o_orderstatus = 'F'),
            g AS (SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms
                  FROM read_parquet('{d}/lineitem.parquet')
                  GROUP BY 1, 2),
            j AS (SELECT g.l_orderkey AS ok, g.l_suppkey AS sk,
                         CASE WHEN g.ms > f.o_orderdate
                                       + INTERVAL 90 DAY
                              THEN 1 ELSE 0 END AS late
                  FROM g JOIN f ON g.l_orderkey = f.o_orderkey),
            o AS (SELECT ok, count(*) AS n_supp, sum(late) AS n_late,
                         max(CASE WHEN late = 1 THEN sk END) AS late_sk
                  FROM j GROUP BY 1)
            SELECT s.s_name, count(*) FROM o
            JOIN read_parquet('{d}/supplier.parquet') s
              ON s.s_suppkey = o.late_sk
            WHERE o.n_supp >= 2 AND o.n_late = 1 GROUP BY 1
        """).fetchall())
        assert got == want, f"trial {trial}"

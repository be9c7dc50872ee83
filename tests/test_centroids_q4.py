"""label_centroids (grouped vector aggregate) and order_priority_counts
(Q4-style EXISTS semi-join rollup)."""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_label_centroids_hand_values(ray_session, tmp_path):
    """Two labels, known sums — including a negative sum so the
    truncating (not flooring) integer division is exercised."""
    from sourmash_ray.pipelines.ann import label_centroids

    emb = [
        (0, [0.1, -0.2]),     # q = (1000, -2000)
        (0, [0.2, -0.05]),    # q = (2000, -500)
        (1, [-0.3, 0.4]),     # q = (-3000, 4000)
        (1, [0.0001, 0.0]),   # q = (1, 0) — makes label-1 dim-1 sum odd
    ]
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(emb)), pa.int64()),
        "embedding": pa.array([e[1] for e in emb],
                              pa.list_(pa.float32())),
        "label": pa.array([e[0] for e in emb], pa.int32()),
    }), f"{tmp_path}/embeddings.parquet")

    got = {(r["label"], r["dim"]): (r["sum_e4"], r["n_vecs"],
                                    r["centroid_e4"])
           for r in label_centroids(str(tmp_path)).take_all()}
    assert got[(0, 1)] == (3000, 2, 1500)
    assert got[(0, 2)] == (-2500, 2, -1250)
    # -2999 / 2: truncation gives -1499 (DuckDB //); a floor division
    # would give -1500 — the case the sign·(|s|÷n) kernel exists for
    assert got[(1, 1)] == (-2999, 2, -1499)
    assert got[(1, 2)] == (4000, 2, 2000)


def test_truncating_division_matches_duckdb_on_negatives():
    """The kernel's sign·(|s|//n) == DuckDB // (truncation) — explicitly
    on a case where numpy's floor // would differ."""
    import duckdb

    s, n = np.int64(-7), np.int64(2)
    kernel = np.sign(s) * (np.abs(s) // n)
    assert kernel == -3                      # trunc
    assert s // n == -4                      # numpy floors — must NOT ship
    assert duckdb.connect().execute(
        "SELECT -7 // 2").fetchone()[0] == kernel


def test_label_centroids_and_q4_match_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("embeddings", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    q, o = e.queries(), e.oracle_sql()
    for name in ("label_centroids", "order_priority_counts"):
        got = sorted(tuple(r[c] for c in r)
                     for r in q[name](sf).take_all())
        want = sorted(tuple(r) for r in con.sql(o[name]).fetchall())
        assert got == want, name


def test_brand_revenue_and_monthly_match_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("orders", "lineitem", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    q, o = e.queries(), e.oracle_sql()
    for name in ("brand_revenue", "monthly_order_stats"):
        got = sorted(tuple(r[c] for c in r)
                     for r in q[name](sf).take_all())
        want = sorted(tuple(r) for r in con.sql(o[name]).fetchall())
        assert got == want, name


def test_above_avg_orders_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{sf}/orders.parquet')")
    got = sorted(tuple(r[c] for c in r) for r in
                 e.queries()["above_avg_orders"](sf).take_all())
    want = sorted(tuple(r) for r in
                  con.sql(e.oracle_sql()["above_avg_orders"]).fetchall())
    assert got == want
    assert 0 < len(got)   # strictly-above filter is non-degenerate


def test_first_order_per_customer_matches_duckdb(ray_session):
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{sf}/orders.parquet')")
    got = sorted(tuple(r[c] for c in r) for r in
                 e.queries()["first_order_per_customer"](sf).take_all())
    want = sorted(tuple(r) for r in con.sql(
        e.oracle_sql()["first_order_per_customer"]).fetchall())
    assert got == want

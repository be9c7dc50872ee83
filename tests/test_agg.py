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

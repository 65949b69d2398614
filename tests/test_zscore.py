"""Per-group z-score anomaly filter (stages/stats.py zscore_outliers)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.stats import zscore_outliers


def _ds(groups, values, ids=None):
    import ray.data as rd
    ids = list(range(len(values))) if ids is None else ids
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, type=pa.int64()),
        "g": pa.array(groups, type=pa.string()),
        "x": pa.array(values, type=pa.int64()),
    }))


def _run(groups, values, k):
    out = zscore_outliers(_ds(groups, values), "g", "x", k=k).to_pandas()
    if out.empty:   # schema is lost at to_pandas on an empty result
        return pd.DataFrame(columns=["id", "g", "x", "zscore"])
    return out.sort_values("id").reset_index(drop=True)


def test_matches_numpy_reference(ray_session):
    rng = np.random.RandomState(3)
    groups = rng.choice(["a", "b", "c"], 3000).tolist()
    values = rng.randint(0, 5000, 3000).tolist()
    k = 1.5
    got = _run(groups, values, k)

    df = pd.DataFrame({"id": range(3000), "g": groups, "x": values})
    stats = df.groupby("g")["x"].agg(["mean", "var", "count"])
    # population variance, float op order matching the operator
    mu = df.groupby("g")["x"].transform(
        lambda s: s.sum() / len(s))
    var = df.groupby("g")["x"].transform(
        lambda s: (s * s).sum() / len(s)) - mu * mu
    d = df["x"].astype(float) - mu
    want = df[(d * d) > (k * k) * var]
    assert list(got["id"]) == list(want["id"])
    z = (want["x"].astype(float) - mu[want.index]) / np.sqrt(var[want.index])
    np.testing.assert_allclose(got["zscore"].to_numpy(), z.to_numpy(),
                               rtol=1e-12)


def test_zero_variance_group_never_emits(ray_session):
    groups = ["a"] * 10 + ["b"] * 4
    values = [7] * 10 + [1, 1, 1, 100]
    out = _run(groups, values, 1.0)
    assert all(out["g"] == "b")
    assert 100 in set(out["x"])


def test_obvious_outlier_flagged(ray_session):
    values = [10] * 50 + [11] * 50 + [10_000]
    out = _run(["g"] * 101, values, 3.0)
    assert list(out["x"]) == [10_000]
    assert out["zscore"].iloc[0] > 3.0


def test_k_large_emits_nothing(ray_session):
    out = _run(["g"] * 20, list(range(20)), 100.0)
    assert len(out) == 0


def test_mad_outliers_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import mad_outliers

    # group 'a': tight cluster around 10 with one wild point;
    # scale=1 keeps the integers human-readable
    vals = [9.0, 10.0, 10.0, 10.0, 11.0, 11.0, 10.0, 100.0]
    t = pa.table({
        "event_id": pa.array(np.arange(len(vals)), type=pa.int64()),
        "event_type": pa.array(["a"] * len(vals)),
        "value": pa.array(vals, type=pa.float64()),
    })
    out = mad_outliers(rd.from_arrow(t).repartition(2),
                       scale=1).to_pandas().sort_values("event_id")
    # type-1 median of [9,10,10,10,10,11,11,100] = 10; |d| sorted
    # [0,0,0,0,1,1,1,90] -> mad = 0: any deviation flags
    assert (out["med"] == 10).all() and (out["mad"] == 0).all()
    assert out["is_out"].tolist() == [1, 0, 0, 0, 1, 1, 0, 1]


def test_mad_outliers_matches_brute(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import mad_outliers

    rng = np.random.default_rng(12)
    n = 400
    types = rng.choice(["a", "b", "c"], n)
    vals = rng.normal(50, 10, n)
    t = pa.table({
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(vals, type=pa.float64()),
    })
    out = mad_outliers(rd.from_arrow(t).repartition(3)).to_pandas()
    out = out.set_index("event_id").sort_index()

    def t1_median(a):
        a = np.sort(a)
        return a[int(np.ceil(0.5 * len(a))) - 1]

    x = np.floor(vals * 64).astype(np.int64)
    for g in "abc":
        m = types == g
        med = t1_median(x[m])
        mad = t1_median(np.abs(x[m] - med))
        sel = out[out["event_type"] == g]
        assert (sel["med"] == med).all() and (sel["mad"] == mad).all()
        want = (np.abs(x[m] - med) > 3 * mad).astype(int)
        got = sel.sort_index()["is_out"].to_numpy()
        np.testing.assert_array_equal(got, want)


def test_gini_exact_cases(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import gini

    # perfectly equal: 4 keys x 3 rows -> G = 0 exactly
    eq = pa.table({"source": pa.array(
        [f"s{i}" for i in range(4) for _ in range(3)])})
    out = gini(rd.from_arrow(eq).repartition(2), key="source")
    assert out["gini"].iloc[0] == 0.0
    assert out["n_keys"].iloc[0] == 4 and out["total"].iloc[0] == 12

    # total concentration: one key holds everything but singletons;
    # check against the closed form
    vals = ["big"] * 96 + ["a", "b", "c", "d"]
    cc = pa.table({"source": pa.array(vals)})
    out = gini(rd.from_arrow(cc).repartition(3), key="source")
    c = np.array([1, 1, 1, 1, 96], dtype=np.int64)
    i = np.arange(1, 6)
    n, tot = 5, c.sum()
    num = 2 * (i * c).sum() - (n + 1) * tot
    assert out["num"].iloc[0] == num
    assert out["gini"].iloc[0] == num / float(n * tot)
    assert out["gini"].iloc[0] > 0.7


def test_gini_weighted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import gini

    t = pa.table({"source": pa.array(["a", "a", "b"]),
                  "w": pa.array([1, 2, 3], type=pa.int64())})
    out = gini(rd.from_arrow(t), key="source", weight="w")
    # masses: a=3, b=3 -> equal -> 0
    assert out["gini"].iloc[0] == 0.0


def test_ks_two_sample_identical_and_disjoint(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import ks_two_sample

    # identical distributions -> D = 0
    vals = list(range(10)) * 2
    t = pa.table({"g": pa.array(["a"] * 10 + ["b"] * 10),
                  "v": pa.array(np.array(vals, dtype=np.float64))})
    out = ks_two_sample(rd.from_arrow(t).repartition(2), group="g",
                        value_col="v", a="a", b="b", scale=1)
    assert out["d"].iloc[0] == 0.0
    # fully disjoint supports -> D = 1
    t = pa.table({"g": pa.array(["a"] * 5 + ["b"] * 5),
                  "v": pa.array([1.0] * 5 + [100.0] * 5)})
    out = ks_two_sample(rd.from_arrow(t).repartition(2), group="g",
                        value_col="v", a="a", b="b", scale=1)
    assert out["d"].iloc[0] == 1.0
    assert out["num"].iloc[0] == 25  # max |5*5 - 0*5|


def test_ks_two_sample_matches_scipy_formula(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import ks_two_sample

    rng = np.random.default_rng(3)
    va = rng.normal(0, 1, 200)
    vb = rng.normal(0.5, 1.2, 150)
    t = pa.table({"g": pa.array(["a"] * 200 + ["b"] * 150),
                  "v": pa.array(np.concatenate([va, vb]))})
    out = ks_two_sample(rd.from_arrow(t).repartition(3), group="g",
                        value_col="v", a="a", b="b", scale=64)
    xa = np.floor(va * 64).astype(np.int64)
    xb = np.floor(vb * 64).astype(np.int64)
    grid = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(np.sort(xa), grid, side="right")
    fb = np.searchsorted(np.sort(xb), grid, side="right")
    num = np.abs(fa * 150 - fb * 200).max()
    assert out["num"].iloc[0] == num
    assert out["d"].iloc[0] == num / float(200 * 150)


def test_benford_exact_counts(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import benford

    # cents: 123 (digit 1), 19 (1), 250 (2), 3 (3), 999 (9); 0 excluded
    vals = np.array([1.23, 0.19, 2.50, 0.03, 9.99, 0.0])
    t = pa.table({"v": pa.array(vals, type=pa.float64())})
    out = benford(rd.from_arrow(t).repartition(2), value_col="v")
    assert len(out) == 9
    got = dict(zip(out["digit"], out["n"]))
    assert got == {1: 2, 2: 1, 3: 1, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1}
    assert out["n"].sum() == 5
    # expectation column matches the closed form
    for _, r in out.iterrows():
        assert r["benford"] == round(np.log10(1 + 1 / r["digit"]), 6)
    # fractions sum to 1 over observed digits
    assert out["frac"].sum() == pytest.approx(1.0)


def test_mannwhitney_matches_scipy_convention(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import mannwhitney_u

    rng = np.random.default_rng(7)
    va = rng.normal(0.5, 1, 120)
    vb = rng.normal(0.0, 1, 100)
    t = pa.table({"g": pa.array(["a"] * 120 + ["b"] * 100),
                  "v": pa.array(np.concatenate([va, vb]))})
    out = mannwhitney_u(rd.from_arrow(t).repartition(3), group="g",
                        value_col="v", a="a", b="b", scale=64)
    # brute-force U1 with midranks
    xa = np.floor(va * 64).astype(np.int64)
    xb = np.floor(vb * 64).astype(np.int64)
    allv = np.concatenate([xa, xb])
    import pandas as _pd

    ranks = _pd.Series(allv).rank(method="average").to_numpy()
    r1 = ranks[:120].sum()
    u1 = r1 - 120 * 121 / 2
    assert out["u2"].iloc[0] == int(round(2 * u1))
    assert out["auc"].iloc[0] == out["u2"].iloc[0] / float(2 * 120 * 100)
    # distribution a is shifted up: AUC > 0.5
    assert out["auc"].iloc[0] > 0.5


def test_mannwhitney_identical_is_half(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import mannwhitney_u

    t = pa.table({"g": pa.array(["a"] * 50 + ["b"] * 50),
                  "v": pa.array(list(range(50)) * 2, type=pa.float64())})
    out = mannwhitney_u(rd.from_arrow(t), group="g", value_col="v",
                        a="a", b="b", scale=1)
    assert out["auc"].iloc[0] == 0.5

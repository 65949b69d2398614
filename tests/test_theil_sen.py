import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ref_theil_sen(t, v):
    slopes = []
    for i in range(len(t)):
        for j in range(len(t)):
            if t[j] > t[i]:
                slopes.append((v[j] - v[i]) / float(t[j] - t[i]))
    slopes.sort()
    m = len(slopes)
    return slopes[(m + 1) // 2 - 1], m


def test_theil_sen_matches_rowwise_reference(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import grouped_theil_sen

    rng = np.random.default_rng(41)
    rows = []
    for g in range(6):
        n = int(rng.integers(5, 40))
        t = np.sort(rng.choice(100_000, size=n, replace=False)).astype(np.int64)
        v = rng.normal(size=n) * 10
        for k in range(n):
            rows.append((g, t[k], v[k]))
    df = pd.DataFrame(rows, columns=["g", "t", "v"])
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    got = grouped_theil_sen(ds, "g", "t", "v").to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    for _, r in got.iterrows():
        sub = df[df["g"] == r["g"]]
        exp, m = _ref_theil_sen(sub["t"].to_numpy(), sub["v"].to_numpy())
        assert r["n_pairs"] == m
        assert r["theil_sen"] == exp   # bit-exact: selection, not average


def test_theil_sen_robust_to_outliers(ray_session):
    """A perfect slope-2 line with 20% wild outliers still reports ~2;
    OLS would not."""
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import grouped_theil_sen

    t = np.arange(50, dtype=np.int64)
    v = 2.0 * t
    v[::5] += 1e6   # 10 of 50 points corrupted
    df = pd.DataFrame({"g": np.zeros(50, dtype=np.int64), "t": t, "v": v})
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    got = grouped_theil_sen(ds, "g", "t", "v").to_pandas()
    assert abs(got["theil_sen"].iloc[0] - 2.0) < 1e-9


def test_theil_sen_group_budget(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import grouped_theil_sen

    df = pd.DataFrame({"g": np.zeros(100, dtype=np.int64),
                       "t": np.arange(100, dtype=np.int64),
                       "v": np.zeros(100)})
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    with pytest.raises(Exception, match="n\\^2|O\\(n"):
        grouped_theil_sen(ds, "g", "t", "v", max_group_rows=50).to_pandas()


def test_theil_sen_equal_timestamps_only(ray_session):
    """All-equal timestamps -> zero pairs, NaN slope (documented)."""
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import grouped_theil_sen

    df = pd.DataFrame({"g": [1, 1, 1], "t": [7, 7, 7], "v": [1.0, 2.0, 3.0]})
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    got = grouped_theil_sen(ds, "g", "t", "v").to_pandas()
    assert got["n_pairs"].iloc[0] == 0
    assert np.isnan(got["theil_sen"].iloc[0])

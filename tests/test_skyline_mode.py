"""Skyline vs O(n^2) dominance brute force; grouped mode tie-breaks."""

import numpy as np
import pandas as pd
import pytest

from fast_carpenter_ray.stages.skyline import _local_skyline, skyline
from fast_carpenter_ray.stages.stats import grouped_mode


def _brute_skyline(df):
    x = df["x"].to_numpy()
    y = df["y"].to_numpy()
    keep = []
    for i in range(len(df)):
        dominated = ((x >= x[i]) & (y >= y[i])
                     & ((x > x[i]) | (y > y[i]))).any()
        if not dominated:
            keep.append(i)
    return df.iloc[keep]


@pytest.mark.parametrize("seed", [3, 17])
def test_skyline_matches_brute(ray_session, seed):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    n = 900
    x = rng.integers(0, 100, n).astype(np.int64)
    # anti-correlated: large skyline
    y = (100 - x + rng.integers(-20, 20, n)).astype(np.int64)
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "x": x, "y": y})
    got = skyline(rd.from_pandas(df).repartition(6), x="x", y="y",
                  keep=["doc_id"])
    exp = (_brute_skyline(df)
           .sort_values(["x", "y", "doc_id"], ascending=[False, False, True])
           .reset_index(drop=True))
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert len(got) > 5  # the anti-correlated cloud has a real frontier


def test_local_skyline_keeps_duplicate_optima():
    df = pd.DataFrame({"x": [5, 5, 3], "y": [7, 7, 9]})
    out = _local_skyline(df, "x", "y")
    # both (5,7) duplicates survive (neither strictly dominates the other)
    assert sorted(zip(out["x"], out["y"])) == [(3, 9), (5, 7), (5, 7)]


def test_grouped_mode_tie_breaks_to_smallest(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 3,
                       "v": [2, 2, 1, 1, 9, 9, 3]})
    got = grouped_mode(rd.from_pandas(df).repartition(3), "g", "v")
    assert got[got["g"] == "a"]["value"].iloc[0] == 1  # tie 2x1 vs 2x2 -> 1
    assert got[got["g"] == "b"]["value"].iloc[0] == 9
    assert got[got["g"] == "a"]["n"].iloc[0] == 2


def test_zipf_slope_on_planted_power_law(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import zipf_slope

    # exact power law f(r) = 1000 / r  ->  slope must be ~-1
    texts = []
    for r in range(1, 30):
        texts += [f"tok{r:02d}"] * (1000 // r)
    df = pd.DataFrame({"text": [" ".join(texts)]})
    out = zipf_slope(rd.from_pandas(df))
    assert out["n_tokens"].iloc[0] == 29
    assert out["slope"].iloc[0] == pytest.approx(-1.0, abs=0.02)


def test_zipf_slope_degenerate(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import zipf_slope

    assert zipf_slope(rd.from_pandas(pd.DataFrame({"text": ["one"]}))).empty

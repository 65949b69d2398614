"""grouped_corr vs numpy, inverted_index vs brute force, dataset_diff
classification."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.diff import dataset_diff
from fast_carpenter_ray.stages.index import inverted_index
from fast_carpenter_ray.stages.stats import grouped_corr


def test_grouped_corr_matches_numpy(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(41)
    n = 4000
    g = rng.integers(0, 4, n)
    x = rng.integers(0, 500, n).astype(np.int64)
    y = (x // 2 + rng.integers(0, 100, n)).astype(np.int64)  # correlated
    df = pd.DataFrame({"g": g, "x": x, "y": y})
    got = grouped_corr(rd.from_pandas(df).repartition(6), "g", "x", "y")
    for _, row in got.iterrows():
        sub = df[df["g"] == row["g"]]
        exp = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert row["corr"] == pytest.approx(exp, abs=1e-12)
        assert row["n"] == len(sub)


def test_grouped_corr_drops_zero_variance(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"g": [0, 0, 1, 1], "x": [5, 5, 1, 2],
                       "y": [1, 2, 3, 4]})
    got = grouped_corr(rd.from_pandas(df), "g", "x", "y")
    assert got["g"].tolist() == [1]  # group 0 has var(x) == 0


def test_inverted_index_matches_brute(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "text": [" ".join(f"w{(i * 7 + j) % 5}" for j in range(6))
                 for i in range(20)],
    })
    got = (inverted_index(rd.from_pandas(docs).repartition(4), k=3)
           .to_pandas().sort_values("token").reset_index(drop=True))
    pairs = (docs.assign(token=docs["text"].str.split())
             .explode("token")[["doc_id", "token"]].drop_duplicates())
    for _, row in got.iterrows():
        d = np.sort(pairs[pairs["token"] == row["token"]]["doc_id"].unique())
        assert row["df"] == len(d)
        assert row["postings"] == ",".join(map(str, d[:3].tolist()))
    assert set(got["token"]) == set(pairs["token"])


def test_dataset_diff_classifies(ray_session):
    import ray.data as rd

    old = pd.DataFrame({"k": np.arange(10, dtype=np.int64),
                        "v": np.arange(10, dtype=np.int64) * 10})
    new = old[old["k"] != 3].copy()          # 3 removed
    new.loc[new["k"] == 5, "v"] = 999        # 5 changed
    new = pd.concat([new, pd.DataFrame({"k": [100], "v": [1]})])  # added
    got = (dataset_diff(rd.from_pandas(old).repartition(3),
                        rd.from_pandas(new).repartition(2),
                        key="k", cols=["v"])
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == [3, 5, 100]
    assert got["change"].tolist() == ["removed", "changed", "added"]


def test_dataset_diff_include_unchanged(ray_session):
    import ray.data as rd

    old = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
    got = (dataset_diff(rd.from_pandas(old), rd.from_pandas(old),
                        key="k", cols=["v"], include_unchanged=True)
           .to_pandas())
    assert sorted(got["change"]) == ["unchanged", "unchanged"]


def test_grouped_entropy_matches_numpy(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import grouped_entropy

    rng = np.random.default_rng(53)
    g = rng.integers(0, 6, 3000)
    lab = rng.choice(list("abcd"), 3000)
    df = pd.DataFrame({"g": g, "lab": lab})
    got = grouped_entropy(rd.from_pandas(df).repartition(5), "g", "lab")
    for _, row in got.iterrows():
        sub = df[df["g"] == row["g"]]["lab"].value_counts().to_numpy()
        p = sub / sub.sum()
        assert row["entropy"] == pytest.approx(-(p * np.log(p)).sum(),
                                               abs=1e-12)
        assert row["n"] == sub.sum()


def test_grouped_entropy_single_label_is_positive_zero(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import grouped_entropy

    df = pd.DataFrame({"g": [1, 1, 1], "lab": ["x", "x", "x"]})
    got = grouped_entropy(rd.from_pandas(df), "g", "lab")
    assert got["entropy"].iloc[0] == 0.0
    assert not np.signbit(got["entropy"].iloc[0])  # +0.0, never -0.0


def test_latest_by_key_packed_max(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.diff import latest_by_key

    df = pd.DataFrame({
        "k": np.array([1, 1, 1, 2, 2, 3], dtype=np.int64),
        "ver": np.array([1, 3, 2, 1, 1, 5], dtype=np.int64),
        "v": np.array([10, 30, 20, 7, 9, 4], dtype=np.int64),
    })
    got = (latest_by_key(rd.from_pandas(df).repartition(3),
                         key="k", version="ver", value="v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    # k=1 -> ver 3; k=2 -> ver tie 1/1, larger value 9 wins; k=3 -> 4
    assert got["ver"].tolist() == [3, 1, 5]
    assert got["v"].tolist() == [30, 9, 4]


def test_latest_by_key_bound_checks(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.diff import latest_by_key

    df = pd.DataFrame({"k": [1], "ver": [1], "v": [-1]})
    with pytest.raises(Exception, match="pack"):
        latest_by_key(rd.from_pandas(df), key="k", version="ver",
                      value="v").to_pandas()


def test_grouped_ols_matches_numpy_polyfit(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import grouped_ols

    rng = np.random.default_rng(9)
    n = 300
    g = rng.integers(0, 3, n)
    x = rng.integers(0, 100, n)
    y = 3 * x + rng.integers(-10, 10, n)
    ds = rd.from_arrow(pa.table({
        "g": pa.array(g, type=pa.int64()),
        "x": pa.array(x, type=pa.int64()),
        "y": pa.array(y, type=pa.int64())})).repartition(4)
    out = grouped_ols(ds, "g", "x", "y")
    for _, row in out.iterrows():
        m = g == row["g"]
        slope, intercept = np.polyfit(x[m].astype(float), y[m].astype(float), 1)
        assert abs(row["slope"] - slope) < 1e-9
        assert abs(row["intercept"] - intercept) < 1e-7
        assert 2.8 < row["slope"] < 3.2

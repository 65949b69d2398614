"""grouped_collect_set and pivot_counts (stages/stats.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from fast_carpenter_ray.stages.stats import grouped_collect_set, pivot_counts


def _ds():
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 400
    return rd.from_arrow(pa.table({
        "g": pa.array(rng.integers(0, 5, n), type=pa.int64()),
        "v": pa.array([f"t{int(x)}" for x in rng.integers(0, 7, n)]),
    })).repartition(4)


def test_collect_set(ray_session):
    got = grouped_collect_set(_ds(), "g", "v")
    df = _ds().to_pandas()
    want = (df.groupby("g")["v"]
            .agg(lambda v: ",".join(sorted(set(v)))).reset_index()
            .rename(columns={"v": "values"}))
    want["n_distinct"] = df.groupby("g")["v"].nunique().to_numpy()
    assert got["g"].tolist() == want["g"].tolist()
    assert got["values"].tolist() == want["values"].tolist()
    assert got["n_distinct"].tolist() == want["n_distinct"].astype(int).tolist()


def test_pivot_counts(ray_session):
    got = pivot_counts(_ds(), "g", "v")
    df = _ds().to_pandas()
    want = df.pivot_table(index="g", columns="v", aggfunc="size",
                          fill_value=0).astype(np.int64)
    want = want[sorted(want.columns)]
    assert got["g"].tolist() == list(want.index)
    for c in want.columns:
        assert got[c].tolist() == want[c].tolist()


def test_pivot_empty(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"g": pa.array([], type=pa.int64()),
                                 "v": pa.array([], type=pa.string())}))
    out = pivot_counts(ds, "g", "v")
    assert out.empty


def test_collect_set_hash_mode_is_distributed(ray_session):
    import pandas as pd

    t = grouped_collect_set(_ds(), "g", "v", mode="tree")
    h_ds = grouped_collect_set(_ds(), "g", "v", mode="hash")
    assert not isinstance(h_ds, pd.DataFrame)  # Dataset: no driver merge
    h = h_ds.to_pandas().sort_values("g").reset_index(drop=True)
    assert t["g"].tolist() == h["g"].tolist()
    assert t["values"].tolist() == h["values"].tolist()
    assert t["n_distinct"].tolist() == h["n_distinct"].astype(int).tolist()


def test_pivot_hash_mode_is_distributed(ray_session):
    import pandas as pd

    t = pivot_counts(_ds(), "g", "v", mode="tree")
    h_ds = pivot_counts(_ds(), "g", "v", mode="hash")
    assert not isinstance(h_ds, pd.DataFrame)
    h = h_ds.to_pandas().sort_values("g").reset_index(drop=True)
    assert list(t.columns) == list(h.columns)
    for c in t.columns:
        assert t[c].tolist() == h[c].astype(t[c].dtype).tolist()

"""Hierarchical ROLLUP aggregation (stages/rollup.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from fast_carpenter_ray.stages.rollup import rollup


def _ds(tab):
    import ray.data as rd

    return rd.from_arrow(tab).repartition(3)


def _tab():
    rng = np.random.default_rng(3)
    n = 500
    return pa.table({
        "a": pa.array(rng.integers(0, 4, n), type=pa.int64()),
        "b": pa.array(rng.integers(0, 6, n), type=pa.int64()),
        "v": pa.array(rng.integers(-50, 50, n), type=pa.int64()),
    })


def _brute(df, keys):
    frames = []
    for depth in range(len(keys), -1, -1):
        pk = keys[:depth]
        if pk:
            g = df.groupby(pk)[["v"]].sum()
            g["n"] = df.groupby(pk).size()
            g = g.reset_index()
        else:
            g = pd.DataFrame({"v": [df["v"].sum()], "n": [len(df)]})
        for k in keys[depth:]:
            g[k] = -1
        g["_lvl"] = depth
        frames.append(g[keys + ["v", "n", "_lvl"]])
    out = pd.concat(frames, ignore_index=True).astype(np.int64)
    return out.sort_values(keys + ["_lvl"]).reset_index(drop=True)


def test_rollup_two_keys(ray_session):
    tab = _tab()
    got = rollup(_ds(tab), keys=["a", "b"], sums=["v"])
    want = _brute(tab.to_pandas(), ["a", "b"])
    assert got.astype(np.int64).equals(want)
    # grand total present exactly once
    assert (got["_lvl"] == 0).sum() == 1
    assert got.loc[got["_lvl"] == 0, "n"].iloc[0] == 500


def test_rollup_hash_mode_matches_tree(ray_session):
    # hash mode returns a DATASET (fine level never driver-materialized)
    tab = _tab()
    t = rollup(_ds(tab), keys=["a", "b"], sums=["v"], mode="tree")
    h_ds = rollup(_ds(tab), keys=["a", "b"], sums=["v"], mode="hash")
    assert not isinstance(h_ds, pd.DataFrame)
    h = (h_ds.to_pandas()[["a", "b", "v", "n", "_lvl"]]
         .sort_values(["a", "b", "_lvl"]).reset_index(drop=True)
         .astype(np.int64))
    assert t.astype(np.int64).equals(h)


def test_cube_hash_mode_matches_tree(ray_session):
    from fast_carpenter_ray.stages.rollup import cube

    tab = _tab()
    t = cube(_ds(tab), keys=["a", "b"], sums=["v"], mode="tree")
    h_ds = cube(_ds(tab), keys=["a", "b"], sums=["v"], mode="hash")
    assert not isinstance(h_ds, pd.DataFrame)
    h = (h_ds.to_pandas()[["a", "b", "v", "n", "_gset"]]
         .sort_values(["a", "b", "_gset"]).reset_index(drop=True)
         .astype(np.int64))
    assert t.astype(np.int64).equals(h)


def test_rollup_single_key(ray_session):
    tab = _tab()
    got = rollup(_ds(tab), keys=["a"], sums=["v"])
    want = _brute(tab.to_pandas(), ["a"])
    assert got.astype(np.int64).equals(want)


def test_cube_two_keys(ray_session):
    from itertools import combinations

    from fast_carpenter_ray.stages.rollup import cube

    tab = _tab()
    got = cube(_ds(tab), keys=["a", "b"], sums=["v"])
    df = tab.to_pandas()
    frames = []
    for r in range(2, -1, -1):
        for kept in combinations(range(2), r):
            pk = [["a", "b"][i] for i in kept]
            if pk:
                g = df.groupby(pk)[["v"]].sum()
                g["n"] = df.groupby(pk).size()
                g = g.reset_index()
            else:
                g = pd.DataFrame({"v": [df["v"].sum()], "n": [len(df)]})
            gset = 0
            for i in range(2):
                if i not in kept:
                    g[["a", "b"][i]] = -1
                    gset |= 1 << (1 - i)
            g["_gset"] = gset
            frames.append(g[["a", "b", "v", "n", "_gset"]])
    want = (pd.concat(frames, ignore_index=True).astype(np.int64)
            .sort_values(["a", "b", "_gset"]).reset_index(drop=True))
    assert got.astype(np.int64).equals(want)
    # 4 grouping sets for 2 keys
    assert sorted(got["_gset"].unique().tolist()) == [0, 1, 2, 3]

"""Trajectory statistics: flat vs brute force, bucketed vs flat."""
import pyarrow as pa

import numpy as np
import pandas as pd
import pytest

from fast_carpenter_ray.stages.trajectory import (trajectory_stats,
                                                  trajectory_stats_bucketed)

COLS = ["user_id", "n_points", "path_d2", "net_dx", "net_dy",
        "min_x", "max_x", "min_y", "max_y"]


def _points(seed=11, n=700, keys=6):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": rng.integers(0, keys, n).astype(np.int64),
        "ts": rng.integers(0, 50_000, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "x": rng.integers(-500, 500, n).astype(np.int64),
        "y": rng.integers(-500, 500, n).astype(np.int64),
    })


def _brute(df):
    rows = []
    for uid, g in df.sort_values(["ts", "event_id"],
                                 kind="stable").groupby("user_id"):
        x, y = g["x"].to_numpy(), g["y"].to_numpy()
        dx, dy = np.diff(x), np.diff(y)
        rows.append({"user_id": uid, "n_points": len(g),
                     "path_d2": int((dx * dx + dy * dy).sum()),
                     "net_dx": int(x[-1] - x[0]), "net_dy": int(y[-1] - y[0]),
                     "min_x": int(x.min()), "max_x": int(x.max()),
                     "min_y": int(y.min()), "max_y": int(y.max())})
    return pd.DataFrame(rows).sort_values("user_id").reset_index(drop=True)


def test_trajectory_stats_matches_brute(ray_session):
    import ray.data as rd

    df = _points()
    got = (trajectory_stats(rd.from_pandas(df).repartition(5))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = _brute(df)
    assert len(got) == len(exp)
    for c in COLS:
        np.testing.assert_array_equal(got[c].to_numpy().astype(np.int64),
                                      exp[c].to_numpy(), err_msg=c)


@pytest.mark.parametrize("bucket_width", [20_000, 500, 1])
def test_trajectory_bucketed_equals_flat(ray_session, bucket_width):
    """Width 1 makes every point its own bucket: the whole path length
    flows through boundary-segment merging."""
    import ray.data as rd

    df = _points(seed=23, n=400, keys=4)
    ds = rd.from_pandas(df).repartition(4)
    flat = (trajectory_stats(ds).to_pandas()
            .sort_values("user_id").reset_index(drop=True))
    buck = (trajectory_stats_bucketed(ds, bucket_width=bucket_width)
            .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert len(flat) == len(buck)
    for c in COLS:
        np.testing.assert_array_equal(buck[c].to_numpy().astype(np.int64),
                                      flat[c].to_numpy().astype(np.int64),
                                      err_msg=c)


def test_trajectory_bucketed_rejects_bad_width(ray_session):
    import ray.data as rd

    with pytest.raises(ValueError, match="bucket_width"):
        trajectory_stats_bucketed(rd.from_pandas(_points(n=10)),
                                  bucket_width=0)


def test_radius_of_gyration_matches_numpy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.trajectory import radius_of_gyration

    rng = np.random.RandomState(51)
    n = 3000
    t = pa.table({
        "user_id": pa.array(rng.randint(0, 25, n), type=pa.int64()),
        "x": pa.array(rng.randint(0, 1024, n), type=pa.int64()),
        "y": pa.array(rng.randint(0, 1024, n), type=pa.int64()),
    })
    got = radius_of_gyration(rd.from_arrow(t)).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    df = t.to_pandas()
    for r in got.itertuples():
        g = df[df["user_id"] == r.user_id]
        cx, cy = g["x"].mean(), g["y"].mean()
        rog = np.sqrt(((g["x"] - cx) ** 2 + (g["y"] - cy) ** 2).mean())
        assert r.rog == pytest.approx(rog, rel=1e-12)
        assert int(r.n) == len(g)


def test_radius_of_gyration_degenerate(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.trajectory import radius_of_gyration

    t = pa.table({
        "user_id": pa.array([1, 2, 2], type=pa.int64()),
        "x": pa.array([7, 3, 3], type=pa.int64()),
        "y": pa.array([9, 4, 4], type=pa.int64()),
    })
    got = radius_of_gyration(rd.from_arrow(t)).to_pandas() \
        .sort_values("user_id")
    # single point and co-located points: rog exactly 0
    assert got["rog"].tolist() == [0.0, 0.0]
    assert got["rog2_num"].tolist() == [0, 0]


def test_impossible_travel_planted(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.trajectory import impossible_travel

    us = 1_000_000
    # user 1: walks 3 units over 10 s (ok), then jumps 100 units in 2 s
    # (flag), then zero-gap move (flag on any movement)
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1], type=pa.int64()),
        "ts": pa.array([0, 10 * us, 12 * us, 12 * us], type=pa.int64()),
        "event_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "x": pa.array([0, 3, 103, 104], type=pa.int64()),
        "y": pa.array([0, 0, 0, 0], type=pa.int64()),
    })
    out = impossible_travel(rd.from_arrow(t).repartition(2),
                            v_num=5, t_den=1).to_pandas()
    out = out.sort_values("event_id")
    assert out["event_id"].tolist() == [2, 3]
    assert out[out["event_id"] == 2]["d2"].iloc[0] == 100 * 100
    assert out[out["event_id"] == 3]["gap_s"].iloc[0] == 0


def test_impossible_travel_matches_brute(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.trajectory import impossible_travel

    rng = np.random.default_rng(19)
    n = 300
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 6, n), type=pa.int64()),
        "ts": pa.array(rng.integers(0, 10**7, n) * 100, type=pa.int64()),
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "x": pa.array(rng.integers(0, 1024, n), type=pa.int64()),
        "y": pa.array(rng.integers(0, 1024, n), type=pa.int64()),
    })
    out = impossible_travel(rd.from_arrow(t).repartition(3),
                            v_num=5, t_den=1).to_pandas()
    df = t.to_pandas()
    want = set()
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        tt = g["ts"].to_numpy()
        xs, ys = g["x"].to_numpy(), g["y"].to_numpy()
        for i in range(1, len(g)):
            gap = (tt[i] - tt[i - 1]) // 1_000_000
            d2 = (xs[i] - xs[i - 1]) ** 2 + (ys[i] - ys[i - 1]) ** 2
            if d2 > (5 * gap) ** 2:
                want.add(int(g["event_id"].iloc[i]))
    assert set(out["event_id"]) == want

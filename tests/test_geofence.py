"""Geofence entry/exit detection (stages/geofence.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.geofence import box_fence, geofence_events


def _events(rows):
    """rows: (user_id, ts_us, event_id, cell)"""
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "cell": pa.array([r[3] for r in rows], type=pa.int64()),
    }))


def _run(rows, fence):
    out = geofence_events(_events(rows), fence).to_pandas()
    if out.empty:   # an all-quiet stream loses its schema at to_pandas
        return pd.DataFrame(columns=["user_id", "event_id", "ts_us",
                                     "transition"])
    out["transition"] = out["transition"].astype(str)
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def test_box_fence_cells():
    f = box_fence(2, 4, 1, 3, n_grid=8)
    assert sorted(f) == [2 * 8 + 1, 2 * 8 + 2, 3 * 8 + 1, 3 * 8 + 2]


def test_enter_exit_sequence(ray_session):
    fence = np.array([10, 11], dtype=np.int64)
    rows = [
        (1, 100, 1, 5),    # outside (first event: never emits)
        (1, 200, 2, 10),   # enter
        (1, 300, 3, 11),   # still inside: no row
        (1, 400, 4, 7),    # exit
        (1, 500, 5, 10),   # enter again
    ]
    out = _run(rows, fence)
    assert list(out["event_id"]) == [2, 4, 5]
    assert list(out["transition"]) == ["enter", "exit", "enter"]
    assert list(out["ts_us"]) == [200, 400, 500]


def test_first_event_inside_emits_nothing(ray_session):
    fence = np.array([3], dtype=np.int64)
    rows = [(1, 100, 1, 3), (1, 200, 2, 3)]
    assert len(_run(rows, fence)) == 0


def test_no_cross_user_bridging(ray_session):
    fence = np.array([3], dtype=np.int64)
    # user 1 ends inside, user 2 starts outside: no phantom exit
    rows = [(1, 100, 1, 3), (2, 200, 2, 5), (2, 300, 3, 3)]
    out = _run(rows, fence)
    assert list(out["user_id"]) == [2]
    assert list(out["transition"]) == ["enter"]


def test_tied_timestamps_deterministic(ray_session):
    fence = np.array([3], dtype=np.int64)
    # same ts: order falls back to event_id (total order)
    rows = [(1, 100, 2, 3), (1, 100, 1, 5), (1, 100, 3, 5)]
    out = _run(rows, fence)
    assert list(out["event_id"]) == [2, 3]
    assert list(out["transition"]) == ["enter", "exit"]


def test_matches_pandas_reference(ray_session):
    rng = np.random.RandomState(11)
    n = 2000
    rows = list(zip(rng.randint(0, 40, n).tolist(),
                    rng.randint(0, 10**6, n).tolist(),
                    range(1, n + 1),
                    rng.randint(0, 64, n).tolist()))
    fence = box_fence(2, 5, 3, 6, n_grid=8)
    got = _run(rows, fence)

    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "cell"])
    df["inside"] = df["cell"].isin(fence).astype(int)
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["prev"] = df.groupby("user_id")["inside"].shift()
    want = df[(df["prev"].notna()) & (df["inside"] != df["prev"])]
    want = want.sort_values(["user_id", "event_id"])
    assert list(got["event_id"]) == list(want["event_id"])
    assert list(got["transition"]) == [
        "enter" if i else "exit" for i in want["inside"]]


def test_dwell_pairs_enter_with_next_exit(ray_session):
    from fast_carpenter_ray.stages.geofence import geofence_dwell
    fence = np.array([3], dtype=np.int64)
    rows = [
        (1, 100, 1, 5),   # out
        (1, 200, 2, 3),   # enter
        (1, 300, 3, 3),   # in
        (1, 400, 4, 5),   # exit -> dwell 200
        (1, 500, 5, 3),   # enter (open visit, never exits)
        (2, 100, 6, 3),   # starts inside: no enter transition
        (2, 200, 7, 5),   # exit transition with no prior enter: no pair
    ]
    out = geofence_dwell(_events(rows), fence).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["user_id"], r["enter_id"], r["exit_id"], r["dwell_us"]) == \
        (1, 2, 4, 200)


def test_dwell_matches_transitions_replay(ray_session):
    from fast_carpenter_ray.stages.geofence import geofence_dwell
    rng = np.random.RandomState(12)
    n = 1500
    rows = list(zip(rng.randint(0, 30, n).tolist(),
                    rng.randint(0, 10**6, n).tolist(),
                    range(1, n + 1),
                    rng.randint(0, 64, n).tolist()))
    fence = box_fence(2, 5, 3, 6, n_grid=8)
    dw = geofence_dwell(_events(rows), fence).to_pandas() \
        .sort_values(["user_id", "enter_id"]).reset_index(drop=True)
    tr = _run(rows, fence)
    want = []
    for uid, g in tr.groupby("user_id"):
        g = g.sort_values(["ts_us", "event_id"])
        ks = list(g["transition"])
        for i in range(len(ks) - 1):
            if ks[i] == "enter" and ks[i + 1] == "exit":
                want.append((uid, int(g["event_id"].iloc[i]),
                             int(g["event_id"].iloc[i + 1]),
                             int(g["ts_us"].iloc[i + 1])
                             - int(g["ts_us"].iloc[i])))
    got = [(int(r.user_id), int(r.enter_id), int(r.exit_id),
            int(r.dwell_us)) for r in dw.itertuples()]
    assert got == sorted(want)


def _run_bucketed(rows, fence, w):
    from fast_carpenter_ray.stages.geofence import geofence_events_bucketed
    out = geofence_events_bucketed(_events(rows), fence,
                                   bucket_width=w).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["user_id", "event_id", "ts_us",
                                     "transition"])
    out["transition"] = out["transition"].astype(str)
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


@pytest.mark.parametrize("w", [100, 1000, 50_000, 10**9])
def test_bucketed_equals_flat(ray_session, w):
    rng = np.random.RandomState(14)
    n = 1500
    rows = list(zip(rng.randint(0, 20, n).tolist(),
                    rng.randint(0, 10**6, n).tolist(),
                    range(1, n + 1),
                    rng.randint(0, 64, n).tolist()))
    fence = box_fence(2, 5, 3, 6, n_grid=8)
    flat = _run(rows, fence)
    buck = _run_bucketed(rows, fence, w)
    pd.testing.assert_frame_equal(flat, buck)


def test_bucketed_boundary_transition(ray_session):
    fence = np.array([3], dtype=np.int64)
    # cross the fence exactly at a bucket boundary: first event of the
    # second bucket must emit the transition
    rows = [(1, 10, 1, 5), (1, 99, 2, 5), (1, 100, 3, 3), (1, 150, 4, 3)]
    out = _run_bucketed(rows, fence, 100)
    assert list(out["event_id"]) == [3]
    assert list(out["transition"]) == ["enter"]
    # width=1: every event its own bucket -> pure boundary path
    out1 = _run_bucketed(rows, fence, 1)
    assert list(out1["event_id"]) == [3]

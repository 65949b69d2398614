"""Stay-point run detection (stages/staypoints.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.staypoints import stay_points


def _events(rows):
    """rows: (user_id, ts_us, event_id, cell)"""
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "cell": pa.array([r[3] for r in rows], type=pa.int64()),
    }))


def _run(rows, k):
    out = stay_points(_events(rows), min_events=k).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["user_id", "cell", "start_id",
                                     "end_id", "start_us", "end_us",
                                     "n_events", "span_us"])
    return out.sort_values(["user_id", "start_us"]).reset_index(drop=True)


def test_basic_runs(ray_session):
    rows = [
        (1, 100, 1, 7), (1, 200, 2, 7), (1, 300, 3, 7),   # run of 3
        (1, 400, 4, 9),                                     # singleton
        (1, 500, 5, 7), (1, 600, 6, 7),                     # new run of 2
    ]
    out = _run(rows, 2)
    assert len(out) == 2
    a, b = out.iloc[0], out.iloc[1]
    assert (a["cell"], a["n_events"], a["start_id"], a["end_id"],
            a["span_us"]) == (7, 3, 1, 3, 200)
    assert (b["n_events"], b["start_us"]) == (2, 500)
    # min_events=4 filters everything
    assert len(_run(rows, 4)) == 0


def test_revisits_are_separate_runs(ray_session):
    rows = [(1, 100, 1, 5), (1, 200, 2, 6), (1, 300, 3, 5)]
    assert len(_run(rows, 2)) == 0          # no consecutive repeats
    assert len(_run(rows, 1)) == 3          # every event its own run


def test_matches_pandas_reference(ray_session):
    rng = np.random.RandomState(17)
    n = 3000
    rows = list(zip(rng.randint(0, 20, n).tolist(),
                    rng.randint(0, 10**6, n).tolist(),
                    range(1, n + 1),
                    rng.randint(0, 8, n).tolist()))
    got = _run(rows, 2)
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "cell"])
    df = df.sort_values(["user_id", "ts", "event_id"])
    want = []
    for uid, g in df.groupby("user_id"):
        run = []
        for r in g.itertuples():
            if run and run[-1].cell == r.cell:
                run.append(r)
            else:
                if len(run) >= 2:
                    want.append((uid, run[0].cell, run[0].event_id,
                                 run[-1].event_id, run[0].ts, run[-1].ts,
                                 len(run), run[-1].ts - run[0].ts))
                run = [r]
        if len(run) >= 2:
            want.append((uid, run[0].cell, run[0].event_id,
                         run[-1].event_id, run[0].ts, run[-1].ts,
                         len(run), run[-1].ts - run[0].ts))
    got_t = [tuple(int(v) for v in r) for r in got.to_numpy()]
    assert got_t == sorted(want, key=lambda r: (r[0], r[4]))


def test_min_events_validation(ray_session):
    with pytest.raises(ValueError):
        stay_points(_events([]), min_events=0)

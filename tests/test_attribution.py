"""Last-touch attribution (stages/attribution.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.attribution import last_touch_attribution


def _events(rows):
    """rows: (user_id, ts_us, event_id, event_type)"""
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
    }))


def _run(rows, lookback):
    out = last_touch_attribution(
        _events(rows), ["click"], ["purchase"], lookback).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["user_id", "conv_id", "conv_us",
                                     "src_id", "src_us", "gap_us"])
    return out.sort_values(["user_id", "conv_id"]).reset_index(drop=True)


def test_latest_source_wins(ray_session):
    rows = [
        (1, 100, 1, "click"),
        (1, 200, 2, "click"),
        (1, 300, 3, "purchase"),   # -> click 2
        (1, 400, 4, "view"),       # ignored type
        (1, 500, 5, "purchase"),   # -> still click 2
    ]
    out = _run(rows, 10_000)
    assert list(out["conv_id"]) == [3, 5]
    assert list(out["src_id"]) == [2, 2]
    assert list(out["gap_us"]) == [100, 300]


def test_lookback_excludes_stale_sources(ray_session):
    rows = [(1, 100, 1, "click"), (1, 5000, 2, "purchase")]
    assert len(_run(rows, 1000)) == 0
    assert len(_run(rows, 4900)) == 1


def test_tied_timestamp_deterministic(ray_session):
    # source at the same ts counts only with a smaller event_id
    rows = [(1, 100, 5, "click"), (1, 100, 7, "purchase"),
            (2, 100, 9, "purchase"), (2, 100, 11, "click")]
    out = _run(rows, 10_000)
    assert list(out["user_id"]) == [1]
    assert list(out["src_id"]) == [5]


def test_no_cross_user_attribution(ray_session):
    rows = [(1, 100, 1, "click"), (2, 200, 2, "purchase")]
    assert len(_run(rows, 10_000)) == 0


def test_overlapping_types_rejected(ray_session):
    with pytest.raises(ValueError):
        last_touch_attribution(_events([]), ["click"], ["click"], 1)


def test_matches_pandas_reference(ray_session):
    rng = np.random.RandomState(13)
    n = 2000
    types = rng.choice(["click", "purchase", "view"], n).tolist()
    rows = list(zip(rng.randint(0, 25, n).tolist(),
                    rng.randint(0, 10**6, n).tolist(),
                    range(1, n + 1), types))
    look = 50_000
    got = _run(rows, look)

    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "type"])
    df = df.sort_values(["user_id", "ts", "event_id"])
    want = []
    for uid, g in df.groupby("user_id"):
        last = None
        for r in g.itertuples():
            if r.type == "click":
                last = r
            elif r.type == "purchase" and last is not None \
                    and r.ts - last.ts <= look:
                want.append((uid, r.event_id, r.ts, last.event_id,
                             last.ts, r.ts - last.ts))
    got_t = [tuple(int(v) for v in r) for r in got.to_numpy()]
    assert got_t == sorted(want)

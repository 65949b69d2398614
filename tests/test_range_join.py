"""Range join (broadcast + bucketed) — brute-force equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.range_join import range_join, range_join_bucketed


def _fixture():
    rng = np.random.default_rng(5)
    pts = pa.table({
        "pid": pa.array(np.arange(400), type=pa.int64()),
        "x": rng.uniform(-50, 150, 400),
    })
    n = 30
    lo = rng.uniform(-60, 140, n)
    span = rng.uniform(0.5, 40, n)  # overlapping, widely varying spans
    ivl = pa.table({
        "band": pa.array(np.arange(n), type=pa.int64()),
        "lo": lo,
        "hi": lo + span,
    })
    return pts, ivl


def _brute(pts, ivl, closed):
    p = pts.to_pandas()
    i = ivl.to_pandas()
    rows = []
    for _, ir in i.iterrows():
        inside = (p["x"] >= ir["lo"]) & (
            (p["x"] < ir["hi"]) if closed == "left" else (p["x"] <= ir["hi"]))
        sub = p[inside].copy()
        sub["band"] = int(ir["band"])
        rows.append(sub)
    out = pd.concat(rows, ignore_index=True)
    return out.sort_values(["pid", "band"]).reset_index(drop=True)


@pytest.mark.parametrize("closed", ["left", "both"])
def test_range_join_broadcast_matches_brute(ray_session, closed):
    import ray.data as rd

    pts, ivl = _fixture()
    got = range_join(rd.from_arrow(pts).repartition(4), ivl, "x",
                     closed=closed, chunk=7).to_pandas()
    got = got.sort_values(["pid", "band"]).reset_index(drop=True)
    exp = _brute(pts, ivl, closed)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["pid"], exp["pid"])
    np.testing.assert_array_equal(got["band"], exp["band"])
    np.testing.assert_allclose(got["x"], exp["x"])


@pytest.mark.parametrize("closed", ["left", "both"])
def test_range_join_bucketed_matches_brute(ray_session, closed):
    import ray.data as rd

    pts, ivl = _fixture()
    got = range_join_bucketed(
        rd.from_arrow(pts).repartition(4),
        rd.from_arrow(ivl).repartition(2),
        "x", bucket_width=10.0, point_payload=["pid"],
        interval_payload=["band"], closed=closed).to_pandas()
    got = got.sort_values(["pid", "band"]).reset_index(drop=True)
    exp = _brute(pts, ivl, closed)
    assert len(got) == len(exp), "bucketed join must emit each pair exactly once"
    np.testing.assert_array_equal(got["pid"].to_numpy().astype(np.int64),
                                  exp["pid"])
    np.testing.assert_array_equal(got["band"].to_numpy().astype(np.int64),
                                  exp["band"])
    np.testing.assert_allclose(got["x"], exp["x"])


def test_range_join_rejects_bad_intervals(ray_session):
    import ray.data as rd

    pts, _ = _fixture()
    bad = pa.table({"band": [0], "lo": [5.0], "hi": [1.0]})
    with pytest.raises(ValueError, match="hi < lo"):
        range_join(rd.from_arrow(pts), bad, "x")
    with pytest.raises(ValueError, match="bucket_width"):
        range_join_bucketed(rd.from_arrow(pts), rd.from_arrow(bad), "x",
                            bucket_width=0.0)


def test_range_join_point_in_no_interval_dropped(ray_session):
    import ray.data as rd

    pts = pa.table({"pid": pa.array([0, 1], type=pa.int64()),
                    "x": [1.0, 100.0]})
    ivl = pa.table({"band": pa.array([7], type=pa.int64()),
                    "lo": [0.0], "hi": [2.0]})
    got = range_join(rd.from_arrow(pts), ivl, "x").to_pandas()
    assert got["pid"].tolist() == [0]
    assert got["band"].tolist() == [7]

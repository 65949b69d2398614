"""Focal (neighborhood) smoothing over the cell grid (stages/raster.py)."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.geo.cells import cell_id, k_ring
from fast_carpenter_ray.stages.raster import focal_mean


def _points(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "lat": pa.array([r[0] for r in rows], type=pa.float64()),
        "lng": pa.array([r[1] for r in rows], type=pa.float64()),
        "weight": pa.array([r[2] for r in rows], type=pa.float64()),
    }))


def _brute(rows, res, k):
    """Reference: per-cell aggregates, then a k_ring gather."""
    agg = {}
    for lat, lng, w in rows:
        c = int(cell_id(np.array([lat]), np.array([lng]), res)[0])
        if c < 0:
            continue
        s, n = agg.get(c, (0.0, 0))
        agg[c] = (s + w, n + 1)
    out = {}
    for c, (s, n) in agg.items():
        ring = k_ring(c, res, k)
        fs = sum(agg[r][0] for r in ring if r in agg)
        fn = sum(agg[r][1] for r in ring if r in agg)
        out[c] = (n, fn, fs, fs / fn)
    return out


def test_matches_bruteforce_ring_gather(ray_session):
    rng = np.random.RandomState(7)
    rows = [(float(lat), float(lng), float(w / 1024.0))
            for lat, lng, w in zip(rng.uniform(-89, 89, 200),
                                   rng.uniform(-179, 179, 200),
                                   rng.randint(1, 2048, 200))]
    res, k = 4, 1
    got = focal_mean(_points(rows), res=res, value_col="weight", k=k
                     ).to_pandas().set_index("cell").sort_index()
    want = _brute(rows, res, k)
    assert set(got.index) == set(want)
    for c, (n, fn, fs, fm) in want.items():
        assert got.loc[c, "n"] == n
        assert got.loc[c, "focal_n"] == fn
        assert got.loc[c, "focal_sum"] == fs
        assert got.loc[c, "focal_mean"] == fm


def test_longitude_wraps_latitude_drops(ray_session):
    # res=2: 4x4 grid, 90-degree cells.  Two points in the same latitude
    # band on either side of the antimeridian are Chebyshev-1 neighbors
    # (wrap); a pole-band cell has no row above it (drop, not clamp).
    rows = [(0.0, -179.0, 1.0), (0.0, 179.0, 3.0)]
    out = focal_mean(_points(rows), res=2, value_col="weight", k=1
                     ).to_pandas().set_index("cell")
    assert len(out) == 2
    # each sees the other through the wrap
    assert (out["focal_n"] == 2).all()
    assert (out["focal_mean"] == 2.0).all()


def test_k_zero_is_per_cell_mean(ray_session):
    rows = [(10.0, 10.0, 1.0), (10.0, 10.0, 3.0), (-40.0, 100.0, 5.0)]
    out = focal_mean(_points(rows), res=6, value_col="weight", k=0
                     ).to_pandas()
    assert (out["n"] == out["focal_n"]).all()
    assert sorted(out["focal_mean"]) == [2.0, 5.0]


def test_hash_mode_matches_tree(ray_session):
    rng = np.random.RandomState(3)
    rows = [(float(lat), float(lng), float(w / 1024.0))
            for lat, lng, w in zip(rng.uniform(-89, 89, 100),
                                   rng.uniform(-179, 179, 100),
                                   rng.randint(1, 2048, 100))]
    a = focal_mean(_points(rows), res=4, k=1, mode="tree"
                   ).to_pandas().sort_values("cell").reset_index(drop=True)
    b = focal_mean(_points(rows), res=4, k=1, mode="hash"
                   ).to_pandas().sort_values("cell").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_neighborhood_wider_than_grid_raises(ray_session):
    with pytest.raises(ValueError, match="wider than the grid"):
        focal_mean(_points([(0.0, 0.0, 1.0)]), res=1, k=2)

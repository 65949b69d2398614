"""Raster sampling + raster zonal stats."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.raster import (
    WorldRaster, make_test_raster, raster_sample, raster_zonal)


def test_world_raster_rejects_non_2d():
    with pytest.raises(ValueError, match="2-D"):
        WorldRaster(np.arange(4.0))


def test_sample_edges_and_nan():
    r = make_test_raster(8, 8)
    lat = np.array([-90.0, 89.999, 0.0, np.nan])
    lng = np.array([-180.0, 179.999, 0.0, 5.0])
    v = r.sample(lat, lng)
    # corner cells: (0,0) and (7,7); centre cell (4,4)
    assert v[0] == ((0 * 31 + 0 * 17) % 1000) / 1024.0
    assert v[1] == ((7 * 31 + 7 * 17) % 1000) / 1024.0
    assert v[2] == ((4 * 31 + 4 * 17) % 1000) / 1024.0
    assert np.isnan(v[3])


def test_sample_clamps_out_of_range():
    r = make_test_raster(8, 8)
    v = r.sample(np.array([90.0, -90.5]), np.array([180.0, -180.5]))
    assert v[0] == ((7 * 31 + 7 * 17) % 1000) / 1024.0
    assert v[1] == ((0 * 31 + 0 * 17) % 1000) / 1024.0


def test_raster_sample_stage_matches_local(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    n = 500
    lat = rng.uniform(-90, 90, n)
    lng = rng.uniform(-180, 180, n)
    lat[::50] = np.nan
    tab = pa.table({"i": pa.array(np.arange(n), type=pa.int64()),
                    "lat": lat, "lng": lng})
    r = make_test_raster(64, 64)
    out = raster_sample(rd.from_arrow(tab).repartition(4), r).to_pandas()
    out = out.sort_values("i").reset_index(drop=True)
    exp = r.sample(lat, lng)
    np.testing.assert_array_equal(np.isnan(out["raster_value"]), np.isnan(exp))
    m = ~np.isnan(exp)
    np.testing.assert_array_equal(out["raster_value"].to_numpy()[m], exp[m])


@pytest.mark.parametrize("mode", ["tree", "hash"])
def test_raster_zonal_matches_local(ray_session, mode):
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(10)
    n = 1000
    lat = rng.uniform(-90, 90, n)
    lng = rng.uniform(-180, 180, n)
    lat[::100] = np.nan
    tab = pa.table({"lat": lat, "lng": lng})
    r = make_test_raster(64, 64)
    res = 3
    got = raster_zonal(rd.from_arrow(tab).repartition(4), r, res=res,
                       mode=mode).to_pandas()
    got = got.sort_values("cell").reset_index(drop=True)

    from fast_carpenter_ray.geo.cells import cell_id

    v = r.sample(lat, lng)
    cell = cell_id(lat, lng, res)
    ok = cell >= 0
    exp = (pd.DataFrame({"cell": cell[ok], "v": v[ok]})
           .groupby("cell").agg(sum_value=("v", "sum"), n=("v", "size"))
           .reset_index().sort_values("cell").reset_index(drop=True))
    np.testing.assert_array_equal(got["cell"], exp["cell"])
    np.testing.assert_array_equal(got["n"], exp["n"])
    np.testing.assert_allclose(got["sum_value"], exp["sum_value"])
    np.testing.assert_allclose(got["mean_value"], exp["sum_value"] / exp["n"])


def test_areal_interpolate_full_and_half_overlap(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.raster import areal_interpolate

    # grid res 1 -> 2x2 cells, cell size 90 deg lat x 180 deg lng.
    # 8 points in cell (iy=1, ix=1) == cell 3 (lat>0, lng>0)
    t = pa.table({"cell": pa.array([3] * 8, type=pa.int64())})
    ds = rd.from_arrow(t).repartition(2)
    # zone 0 covers the cell fully; zone 1 covers its lower half in lat
    zones = [(0, 0.0, 90.0, 0.0, 180.0),
             (1, 0.0, 45.0, 0.0, 180.0)]
    out = areal_interpolate(ds, zones, res=1)
    out = out.set_index("poly_id")
    assert out.loc[0, "est"] == pytest.approx(8.0)
    assert out.loc[1, "est"] == pytest.approx(4.0)
    # integer numerators are exact: half overlap = 500000 * 1000000
    assert out.loc[1, "num"] == 8 * 500_000 * 1_000_000


def test_areal_interpolate_disjoint_zone_absent(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.raster import areal_interpolate

    t = pa.table({"cell": pa.array([0] * 5, type=pa.int64())})  # SW cell
    out = areal_interpolate(rd.from_arrow(t), [(9, 0.0, 90.0, 0.0, 180.0)],
                            res=1)
    assert len(out) == 0 or (out["num"] == 0).all()


def test_areal_interpolate_conserves_mass(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.raster import areal_interpolate

    # a partition of the whole world into two zones conserves total count
    rng = np.random.default_rng(2)
    cells = rng.integers(0, 4, 100).astype(np.int64)
    ds = rd.from_arrow(pa.table({"cell": pa.array(cells)})).repartition(3)
    zones = [(0, -90.0, 0.0, -180.0, 180.0), (1, 0.0, 90.0, -180.0, 180.0)]
    out = areal_interpolate(ds, zones, res=1)
    assert out["est"].sum() == pytest.approx(100.0)

"""Radius join — exactness vs brute force for both metrics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.geo.distance import haversine_m
from fast_carpenter_ray.stages.radius_join import radius_join


def _fixture(n_pts=300, n_sites=40, seed=19):
    rng = np.random.default_rng(seed)
    pts = pa.table({
        "pid": pa.array(np.arange(n_pts), type=pa.int64()),
        "lat": rng.uniform(-85, 85, n_pts),
        "lng": rng.uniform(-180, 180, n_pts),
    })
    sites = pa.table({
        "site_id": pa.array(np.arange(n_sites), type=pa.int64()),
        "lat": rng.uniform(-85, 85, n_sites),
        "lng": rng.uniform(-180, 180, n_sites),
    })
    return pts, sites


def _brute(pts, sites, radius, metric):
    p = pts.to_pandas()
    s = sites.to_pandas()
    rows = []
    for _, pr in p.iterrows():
        if metric == "euclid":
            d = ((pr["lat"] - s["lat"]) ** 2 + (pr["lng"] - s["lng"]) ** 2)
            hit = d <= radius * radius
        else:
            d = haversine_m(pr["lat"], pr["lng"], s["lat"].to_numpy(),
                            s["lng"].to_numpy())
            d = pd.Series(d, index=s.index)
            hit = d <= radius
        for i in s.index[hit]:
            rows.append({"pid": int(pr["pid"]), "site_id": int(s.loc[i, "site_id"]),
                         "dist": float(d[i])})
    return (pd.DataFrame(rows, columns=["pid", "site_id", "dist"])
            .sort_values(["pid", "site_id"]).reset_index(drop=True))


@pytest.mark.parametrize("radius,metric", [
    (8.0, "euclid"), (25.0, "euclid"),
    (800_000.0, "haversine"), (3_000_000.0, "haversine"),
])
def test_radius_join_matches_brute(ray_session, radius, metric):
    import ray.data as rd

    pts, sites = _fixture()
    got = radius_join(rd.from_arrow(pts).repartition(4), sites, radius,
                      res=5, metric=metric).to_pandas()
    got = got.sort_values(["pid", "site_id"]).reset_index(drop=True)
    exp = _brute(pts, sites, radius, metric)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["pid"], exp["pid"])
    np.testing.assert_array_equal(got["site_id"], exp["site_id"])
    np.testing.assert_allclose(got["dist"], exp["dist"], rtol=1e-12)


def test_radius_join_near_pole_haversine(ray_session):
    """Query discs touching the pole fall back to a full candidate scan —
    still exact."""
    import ray.data as rd

    pts = pa.table({"pid": pa.array([0, 1], type=pa.int64()),
                    "lat": [89.5, -89.5], "lng": [10.0, -170.0]})
    sites = pa.table({"site_id": pa.array([0, 1, 2], type=pa.int64()),
                      "lat": [89.0, -89.0, 0.0],
                      "lng": [-170.0, 10.0, 0.0]})
    got = radius_join(rd.from_arrow(pts), sites, 300_000.0, res=5,
                      metric="haversine").to_pandas()
    exp = _brute(pts, sites, 300_000.0, "haversine")
    g = got.sort_values(["pid", "site_id"]).reset_index(drop=True)
    np.testing.assert_array_equal(g["pid"], exp["pid"])
    np.testing.assert_array_equal(g["site_id"], exp["site_id"])


def test_radius_join_validates(ray_session):
    import ray.data as rd

    pts, sites = _fixture(10, 5)
    with pytest.raises(ValueError, match="radius"):
        radius_join(rd.from_arrow(pts), sites, 0.0)
    with pytest.raises(ValueError, match="metric"):
        radius_join(rd.from_arrow(pts), sites, 1.0, metric="manhattan")


def test_hotspot_cells_matches_brute(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.geo.cells import cell_id, k_ring
    from fast_carpenter_ray.stages.hotspot import hotspot_cells

    rng = np.random.default_rng(43)
    n = 2000
    lat = rng.uniform(-89.9, 89.9, n)
    lng = rng.uniform(-180, 180, n)
    lat[::100] = np.nan
    res, ring = 4, 1
    ds = rd.from_arrow(pa.table({"lat": lat, "lng": lng})).repartition(4)
    got = hotspot_cells(ds, res=res, ring=ring).to_pandas()
    got = got.sort_values("cell").reset_index(drop=True)

    cells = cell_id(lat, lng, res)
    cells = cells[cells >= 0]
    from collections import Counter

    counts = Counter(cells.tolist())
    exp = []
    for c, cn in sorted(counts.items()):
        nb = sum(counts.get(int(x), 0) for x in k_ring(int(c), res, ring))
        exp.append({"cell": c, "n": cn, "nbhd_n": nb})
    exp = pd.DataFrame(exp)
    np.testing.assert_array_equal(got["cell"], exp["cell"])
    np.testing.assert_array_equal(got["n"], exp["n"])
    np.testing.assert_array_equal(got["nbhd_n"], exp["nbhd_n"])


def test_hotspot_rejects_bad_ring(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.hotspot import hotspot_cells

    ds = rd.from_arrow(pa.table({"lat": [0.0], "lng": [0.0]}))
    with pytest.raises(ValueError, match="ring"):
        hotspot_cells(ds, ring=0)


def test_radius_join_tiny_radius_at_extreme_pole(ray_session):
    """Regression: a tiny disc at lat 89.999 spans ~all longitudes; the
    longitude-ring math must not under-size (the old code clamped phi to
    89.9 and missed the site 40 deg of longitude away, ~78 m distant)."""
    import ray.data as rd

    pts = pa.table({"pid": pa.array([0], type=pa.int64()),
                    "lat": [89.999], "lng": [0.0]})
    sites = pa.table({"site_id": pa.array([0, 1], type=pa.int64()),
                      "lat": [89.999, 0.0], "lng": [40.0, 0.0]})
    got = radius_join(rd.from_arrow(pts), sites, 200.0, res=6,
                      metric="haversine").to_pandas()
    assert got["site_id"].tolist() == [0]


def test_radius_anti_complements_join(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.fixtures import sites_table
    from fast_carpenter_ray.stages.radius_join import radius_anti, radius_join

    rng = np.random.RandomState(23)
    n = 1500
    t = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "lat": pa.array(rng.uniform(-85, 85, n)),
        "lng": pa.array(rng.uniform(-179, 179, n)),
    })
    ds = rd.from_arrow(t)
    r = 12.0
    joined = radius_join(ds, sites_table(), radius=r, res=6,
                         metric="euclid").to_pandas()
    anti = radius_anti(rd.from_arrow(t), sites_table(), radius=r,
                       metric="euclid").to_pandas()
    matched = set(joined["doc_id"].astype(int))
    gaps = set(anti["doc_id"].astype(int))
    assert matched.isdisjoint(gaps)
    assert matched | gaps == set(range(n))


def test_radius_anti_null_coords_dropped(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.fixtures import sites_table
    from fast_carpenter_ray.stages.radius_join import radius_anti

    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "lat": pa.array([None, 89.0], type=pa.float64()),
        "lng": pa.array([None, 179.0], type=pa.float64()),
    })
    out = radius_anti(rd.from_arrow(t), sites_table(), radius=0.001,
                      metric="euclid").to_pandas()
    assert list(out["doc_id"]) == [2]

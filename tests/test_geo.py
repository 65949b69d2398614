import numpy as np
import pytest

from fast_carpenter_ray.geo import (
    PolygonIndex, Polygon, cell_bounds, cell_id, haversine_m, k_ring, parent,
    points_in_polygon)


def test_cell_id_basic():
    # res 1 -> 2x2 grid
    np.testing.assert_array_equal(
        cell_id([-45.0, -45.0, 45.0, 45.0], [-90.0, 90.0, -90.0, 90.0], 1),
        [0, 1, 2, 3])


def test_cell_id_nan():
    assert cell_id([np.nan], [0.0], 6)[0] == -1


def test_cell_id_clamps_edges():
    out = cell_id([90.0, -90.0], [180.0, -180.0], 4)
    n = 16
    assert out[0] == (n - 1) * n + (n - 1)
    assert out[1] == 0


def test_parent():
    c = cell_id([40.71], [-74.0], 8)
    p = parent(c, 8, 4)
    assert p[0] == cell_id([40.71], [-74.0], 4)[0]
    assert parent(np.array([-1]), 8, 4)[0] == -1


def test_k_ring():
    c = int(cell_id([0.0], [0.0], 4)[0])
    ring = k_ring(c, 4, 1)
    assert c in ring
    assert len(ring) == 9
    # pole clamp: cell in top row has only 6 neighbours
    top = int(cell_id([89.0], [0.0], 4)[0])
    assert len(k_ring(top, 4, 1)) == 6
    # antimeridian wrap: left column wraps to right column
    left = int(cell_id([0.0], [-179.9], 4)[0])
    ring = k_ring(left, 4, 1)
    n = 16
    assert any(c % n == n - 1 for c in ring)


def test_cell_bounds_roundtrip():
    c = cell_id([40.71], [-74.0], 6)
    lat0, lat1, lng0, lng1 = cell_bounds(c, 6)
    assert lat0[0] <= 40.71 < lat1[0]
    assert lng0[0] <= -74.0 < lng1[0]


def test_haversine_known_values():
    # London -> Paris ~343.5 km
    d = haversine_m(51.5074, -0.1278, 48.8566, 2.3522)
    assert 340_000 < d < 348_000
    assert haversine_m(10.0, 20.0, 10.0, 20.0) == 0.0


SQUARE = Polygon(0, "sq", [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)])


def test_pip_square_half_open():
    rlat, rlng = SQUARE.edge_arrays()
    lat = np.array([5.0, 0.0, 10.0, 5.0, 5.0, -1.0])
    lng = np.array([5.0, 5.0, 5.0, 0.0, 10.0, 5.0])
    hit = points_in_polygon(lat, lng, rlat, rlng)
    # interior in; bottom & left edges in; top & right edges out
    np.testing.assert_array_equal(hit, [True, True, False, True, False, False])


def test_pip_concave():
    poly = Polygon(1, "concave", [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
                                  (4.0, 5.0), (0.0, 10.0)])
    rlat, rlng = poly.edge_arrays()
    # notch dips to (lat=4, lng=5); (lat=5, lng=8) sits in the notch -> outside
    hit = points_in_polygon(np.array([2.0, 5.0]), np.array([5.0, 8.0]), rlat, rlng)
    np.testing.assert_array_equal(hit, [True, False])


def test_polygon_index_matches_bruteforce():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-20, 30, 500)
    lng = rng.uniform(-20, 30, 500)
    polys = [
        Polygon(0, "a", [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]),
        Polygon(1, "b", [(5.0, 5.0), (5.0, 25.0), (25.0, 25.0), (25.0, 5.0)]),
        Polygon(2, "c", [(-15.0, -15.0), (-15.0, -5.0), (-5.0, -5.0), (-5.0, -15.0)]),
    ]
    index = PolygonIndex(polys, res=5)
    rows, pids = index.query(lat, lng)
    expected = set()
    for p in polys:
        rlat, rlng = p.edge_arrays()
        hit = points_in_polygon(lat, lng, rlat, rlng)
        expected |= {(i, p.poly_id) for i in np.nonzero(hit)[0]}
    assert set(zip(rows.tolist(), pids.tolist())) == expected


def test_adjacent_polygons_no_double_assign():
    left = Polygon(0, "l", [(0.0, 0.0), (0.0, 5.0), (10.0, 5.0), (10.0, 0.0)])
    right = Polygon(1, "r", [(0.0, 5.0), (0.0, 10.0), (10.0, 10.0), (10.0, 5.0)])
    index = PolygonIndex([left, right], res=5)
    # a point exactly on the shared edge lng=5 belongs to exactly one polygon
    rows, pids = index.query(np.array([2.0]), np.array([5.0]))
    assert len(rows) == 1 and pids[0] == 1  # on right's left edge -> inside right

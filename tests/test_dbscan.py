"""Grid DBSCAN (stages/dbscan.py): roles, cluster labels, wrap, modes."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.geo.cells import cell_id, k_ring
from fast_carpenter_ray.stages.dbscan import dbscan_cells


def _points(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "lat": pa.array([r[0] for r in rows], type=pa.float64()),
        "lng": pa.array([r[1] for r in rows], type=pa.float64()),
    }))


def _brute(rows, res, min_pts):
    """Reference: per-cell counts, ring sums, CC over core, border attach."""
    counts = {}
    for lat, lng in rows:
        c = int(cell_id(np.array([lat]), np.array([lng]), res)[0])
        if c >= 0:
            counts[c] = counts.get(c, 0) + 1
    nbhd = {c: sum(counts.get(r, 0) for r in k_ring(c, res, 1))
            for c in counts}
    core = sorted(c for c in counts if nbhd[c] >= min_pts)
    # union-find over core adjacency
    lab = {c: c for c in core}

    def find(x):
        while lab[x] != x:
            lab[x] = lab[lab[x]]
            x = lab[x]
        return x

    for c in core:
        for r in k_ring(c, res, 1):
            if r != c and r in lab:
                ra, rb = find(c), find(r)
                if ra != rb:
                    lab[max(ra, rb)] = min(ra, rb)
    comp = {c: find(c) for c in core}
    out = {}
    for c in counts:
        if c in comp:
            out[c] = (counts[c], nbhd[c], 0, comp[c])
        else:
            adj = [comp[r] for r in k_ring(c, res, 1)
                   if r != c and r in comp]
            if adj:
                out[c] = (counts[c], nbhd[c], 1, min(adj))
            else:
                out[c] = (counts[c], nbhd[c], 2, -1)
    return out


def _as_dict(df):
    return {int(r.cell): (int(r.n), int(r.nbhd_n), int(r.role),
                          int(r.cluster))
            for r in df.itertuples()}


def _grid_rows(res, pairs):
    """(iy, ix) cell coords -> one point per entry at the cell center."""
    n = 1 << res
    return [(-90.0 + (iy + 0.5) * 180.0 / n, -180.0 + (ix + 0.5) * 360.0 / n)
            for iy, ix in pairs]


def test_two_blobs_and_noise(ray_session):
    res = 4
    # dense blob A (3x1 cells, 3 points each), dense blob B far away,
    # a lone point in between
    blob_a = [(5, 3), (5, 4), (5, 5)] * 3
    blob_b = [(10, 12), (10, 13)] * 4
    lone = [(2, 9)]
    rows = _grid_rows(res, blob_a + blob_b + lone)
    got = _as_dict(dbscan_cells(_points(rows), res=res,
                                min_pts=6).to_pandas())
    exp = _brute(rows, res, 6)
    assert got == exp
    roles = {v[2] for v in got.values()}
    assert roles == {0, 2}  # cores + the lone noise cell
    clusters = {v[3] for v in got.values() if v[2] == 0}
    assert len(clusters) == 2  # two separate blobs


def test_border_attachment(ray_session):
    res = 4
    # two medium cells + a light tail: only the middle cell sees 13
    # points in its ring, so its flanks are border cells
    rows = _grid_rows(res, [(8, 6)] * 6 + [(8, 7)] * 6 + [(8, 8)])
    got = _as_dict(dbscan_cells(_points(rows), res=res,
                                min_pts=13).to_pandas())
    exp = _brute(rows, res, 13)
    assert got == exp
    n = 1 << res
    left, core, tail = 8 * n + 6, 8 * n + 7, 8 * n + 8
    assert got[core] == (6, 13, 0, core)
    assert got[left] == (6, 12, 1, core)   # border, joins the core
    assert got[tail] == (1, 7, 1, core)    # border, joins the core


def test_longitude_wrap_merges_cluster(ray_session):
    res = 4
    n = 1 << res
    # dense cells at ix=0 and ix=n-1 on the same row: adjacent via wrap
    rows = _grid_rows(res, [(7, 0)] * 5 + [(7, n - 1)] * 5)
    got = _as_dict(dbscan_cells(_points(rows), res=res,
                                min_pts=5).to_pandas())
    exp = _brute(rows, res, 5)
    assert got == exp
    labels = {v[3] for v in got.values()}
    assert len(labels) == 1  # one component across the antimeridian


def test_all_noise_when_min_pts_huge(ray_session):
    res = 4
    rows = _grid_rows(res, [(3, 3), (12, 12)])
    got = dbscan_cells(_points(rows), res=res, min_pts=99).to_pandas()
    assert set(got["role"]) == {2}
    assert set(got["cluster"]) == {-1}


def test_shuffle_mode_matches_broadcast(ray_session):
    res = 4
    rng = np.random.default_rng(7)
    # 60 sparse points -> small core components (diameter <= 2), so the
    # shuffle path's diameter-bounded propagation stays at a few rounds
    rows = [(float(la), float(ln))
            for la, ln in zip(rng.uniform(-60, 60, 60),
                              rng.uniform(-170, 170, 60))]
    # plant a dense blob so all three roles appear
    rows += _grid_rows(res, [(6, 6)] * 8 + [(6, 7)])
    b = dbscan_cells(_points(rows), res=res, min_pts=5,
                     mode="broadcast").to_pandas()
    s = dbscan_cells(_points(rows), res=res, min_pts=5,
                     mode="shuffle").to_pandas()
    assert _as_dict(b) == _as_dict(s)
    assert {0, 1, 2} <= set(b["role"])


def test_invalid_args(ray_session):
    with pytest.raises(ValueError):
        dbscan_cells(_points([(0.0, 0.0)]), mode="nope")
    with pytest.raises(ValueError):
        dbscan_cells(_points([(0.0, 0.0)]), min_pts=0)

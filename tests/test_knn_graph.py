"""Radius-capped kNN self-graph (stages/knn_graph.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.knn_graph import knn_graph


def _ds(pts):
    """pts: (doc_id, lat, lng)"""
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([p[0] for p in pts], type=pa.int64()),
        "lat": pa.array([p[1] for p in pts], type=pa.float64()),
        "lng": pa.array([p[2] for p in pts], type=pa.float64()),
    }))


def _brute(pts, k, r):
    out = []
    for i, la, lo in pts:
        cands = []
        for j, lb, lo2 in pts:
            if j == i:
                continue
            d = (la - lb) ** 2 + (lo - lo2) ** 2
            if d <= r * r:
                cands.append((d, j))
        cands.sort()
        for rank, (d, j) in enumerate(cands[:k], 1):
            out.append((i, j, d, rank))
    return sorted(out)


def _run(pts, k, r, res=6):
    out = knn_graph(_ds(pts), k=k, radius=r, res=res).to_pandas()
    if out.empty:
        return []
    return sorted((int(a), int(b), float(d), int(rk))
                  for a, b, d, rk in
                  zip(out["id"], out["nbr_id"], out["dist"], out["rank"]))


@pytest.mark.parametrize("seed,n,k,r,res", [
    (1, 300, 3, 10.0, 6), (2, 150, 5, 25.0, 5), (3, 400, 1, 3.0, 6)])
def test_matches_bruteforce(ray_session, seed, n, k, r, res):
    rng = np.random.RandomState(seed)
    pts = list(zip(range(1, n + 1),
                   rng.uniform(-85, 85, n).tolist(),
                   rng.uniform(-179.9, 179.9, n).tolist()))
    assert _run(pts, k, r, res) == _brute(pts, k, r)


def test_antimeridian_wrap_neighbours(ray_session):
    # points straddling the date line are in wrapping cells; the
    # euclid metric itself does NOT wrap (planar convention), so they
    # are neighbours only if their raw lng difference is small
    pts = [(1, 0.0, 179.5), (2, 0.0, -179.5), (3, 0.0, 178.9)]
    got = _run(pts, 2, 1.0)
    assert (1, 3, pytest.approx(0.36)) in [
        (a, b, pytest.approx(d)) for a, b, d, _ in got]
    assert all(not (a == 1 and b == 2) for a, b, _, _ in got)


def test_colocated_twins_are_neighbours(ray_session):
    pts = [(1, 10.0, 10.0), (2, 10.0, 10.0), (3, 50.0, 50.0)]
    got = _run(pts, 2, 5.0)
    assert (1, 2, 0.0, 1) in got and (2, 1, 0.0, 1) in got
    assert all(a != 3 for a, *_ in got)


def test_tie_breaks_on_neighbour_id(ray_session):
    pts = [(5, 0.0, 0.0), (9, 0.0, 1.0), (7, 0.0, -1.0)]
    got = _run(pts, 1, 2.0)
    # both neighbours of 5 at dist 1.0 -> rank 1 goes to smaller id 7
    assert (5, 7, 1.0, 1) in got


def test_validation(ray_session):
    with pytest.raises(ValueError):
        knn_graph(_ds([]), k=0, radius=1.0)
    with pytest.raises(ValueError):
        knn_graph(_ds([]), k=1, radius=0.0)

"""Multi-source grid BFS distance (stages/griddist.py)."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.geo.cells import cell_id, k_ring
from fast_carpenter_ray.stages.griddist import grid_bfs_distance


def _points(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "lat": pa.array([r[0] for r in rows], type=pa.float64()),
        "lng": pa.array([r[1] for r in rows], type=pa.float64()),
    }))


def _brute_bfs(occ, seeds, res, max_dist):
    occ = set(int(c) for c in occ)
    dist = {c: 0 for c in seeds if c in occ}
    frontier = set(dist)
    for d in range(1, max_dist + 1):
        nxt = set()
        for c in frontier:
            for nb in k_ring(c, res, 1):
                nb = int(nb)
                if nb in occ and nb not in dist:
                    nxt.add(nb)
        for c in nxt:
            dist[c] = d
        frontier = nxt
    return dist


def test_matches_bruteforce_bfs(ray_session):
    rng = np.random.RandomState(61)
    rows = [(float(a), float(b)) for a, b in
            zip(rng.uniform(-85, 85, 600), rng.uniform(-179, 179, 600))]
    occ = np.unique(cell_id(np.array([r[0] for r in rows]),
                            np.array([r[1] for r in rows]), 4))
    occ = occ[occ >= 0]
    seeds = occ[::7]
    got = grid_bfs_distance(_points(rows), seeds, res=4, max_dist=5)
    want = _brute_bfs(occ, seeds, 4, 5)
    assert dict(zip(got["cell"].astype(int),
                    got["dist"].astype(int))) == want


def test_gap_blocks_path(ray_session):
    # res 3 (8x8 grid): a seed cell and a target cell two apart with the
    # bridge cell UNOCCUPIED -> unreachable even though Chebyshev dist 2
    # cell centers at res 3: lat band height 22.5 deg, lng width 45 deg
    def pt(iy, ix):
        return (-90 + (iy + 0.5) * 22.5, -180 + (ix + 0.5) * 45.0)

    rows = [pt(2, 2), pt(2, 4)]          # occupied: seed + island
    seeds = cell_id(np.array([rows[0][0]]), np.array([rows[0][1]]), 3)
    got = grid_bfs_distance(_points(rows), seeds, res=3, max_dist=6)
    assert dict(zip(got["cell"].astype(int), got["dist"].astype(int))) \
        == {int(seeds[0]): 0}
    # with the bridge occupied the island becomes reachable at dist 2
    rows2 = rows + [pt(2, 3)]
    got2 = grid_bfs_distance(_points(rows2), seeds, res=3, max_dist=6)
    assert sorted(got2["dist"].astype(int)) == [0, 1, 2]


def test_unoccupied_seed_ignored(ray_session):
    rows = [(10.0, 10.0)]
    occ = cell_id(np.array([10.0]), np.array([10.0]), 4)
    far_seed = cell_id(np.array([-80.0]), np.array([-170.0]), 4)
    got = grid_bfs_distance(_points(rows), far_seed, res=4, max_dist=6)
    assert len(got) == 0
    got2 = grid_bfs_distance(_points(rows), occ, res=4, max_dist=0)
    assert dict(zip(got2["cell"].astype(int),
                    got2["dist"].astype(int))) == {int(occ[0]): 0}


def test_res_guard(ray_session):
    with pytest.raises(ValueError):
        grid_bfs_distance(_points([(0.0, 0.0)]), np.array([0]), res=10)


def _brute_dijkstra(occ_counts, seeds, res, dense_t, max_cost):
    import heapq

    cost = {int(c): (2 if n >= dense_t else 1)
            for c, n in occ_counts.items()}
    dist = {}
    pq = [(0, int(s)) for s in seeds if int(s) in cost]
    while pq:
        d, c = heapq.heappop(pq)
        if c in dist:
            continue
        dist[c] = d
        for nb in k_ring(c, res, 1):
            nb = int(nb)
            if nb in cost and nb not in dist:
                heapq.heappush(pq, (d + cost[nb], nb))
    return {c: d for c, d in dist.items() if d <= max_cost}


def test_grid_dijkstra_congestion_detour(ray_session):
    from fast_carpenter_ray.stages.griddist import grid_dijkstra_distance

    # a 1-degree grid: a corridor of cells east of a seed, middle cell
    # congested (5 points) so entering it costs 2
    res = 4  # 16x16
    rows = [(5.0, 5.0)]                     # seed cell, 1 point
    rows += [(5.0, 30.0)] * 5               # congested next cell east
    rows += [(5.0, 55.0)]                   # beyond it
    ds = _points(rows)
    seed = cell_id(np.array([5.0]), np.array([5.0]), res)
    out = grid_dijkstra_distance(ds, seed, res=res, dense_threshold=4,
                                 max_cost=8)
    cells = cell_id(np.array([5.0, 5.0, 5.0]),
                    np.array([5.0, 30.0, 55.0]), res)
    got = dict(zip(out["cell"], out["dist"]))
    assert got[int(cells[0])] == 0
    assert got[int(cells[1])] == 2          # congested enter cost
    assert got[int(cells[2])] == 3          # 2 + 1


def test_grid_dijkstra_matches_heap_reference(ray_session):
    from fast_carpenter_ray.stages.griddist import grid_dijkstra_distance

    rng = np.random.default_rng(8)
    res = 4
    lat = rng.uniform(-80, 80, 400)
    lng = rng.uniform(-170, 170, 400)
    ds = _points(list(zip(lat, lng)))
    cells = cell_id(lat, lng, res)
    uniq, counts = np.unique(cells, return_counts=True)
    seeds = uniq[::7]
    out = grid_dijkstra_distance(ds, seeds, res=res, dense_threshold=3,
                                 max_cost=6)
    want = _brute_dijkstra(dict(zip(uniq, counts)), seeds, res, 3, 6)
    assert dict(zip(out["cell"], out["dist"])) == want


def test_grid_dijkstra_reduces_to_bfs_without_congestion(ray_session):
    from fast_carpenter_ray.stages.griddist import grid_dijkstra_distance

    rng = np.random.default_rng(11)
    res = 4
    lat = rng.uniform(-60, 60, 300)
    lng = rng.uniform(-150, 150, 300)
    ds = _points(list(zip(lat, lng)))
    cells = np.unique(cell_id(lat, lng, res))
    seeds = cells[::9]
    dj = grid_dijkstra_distance(ds, seeds, res=res,
                                dense_threshold=10**9, max_cost=5)
    bfs = grid_bfs_distance(ds, seeds, res=res, max_dist=5)
    assert dict(zip(dj["cell"], dj["dist"])) == dict(
        zip(bfs["cell"], bfs["dist"]))

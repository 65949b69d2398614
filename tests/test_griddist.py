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

"""Adaptive quadtree tiling (stages/compact_cells.py quadtree_leaves)."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.geo.cells import parent
from fast_carpenter_ray.stages.compact_cells import quadtree_leaves


def _ds(cells):
    import ray.data as rd
    return rd.from_arrow(pa.table({"cell": pa.array(cells,
                                                    type=pa.int64())}))


def _brute(cells, res, min_res, thr):
    cells = np.asarray(cells, dtype=np.int64)
    cells = cells[cells >= 0]
    out = {}

    def counts_at(r):
        p = parent(cells, res, r)
        u, n = np.unique(p, return_counts=True)
        return dict(zip(u.tolist(), n.tolist()))

    level = {r: counts_at(r) for r in range(min_res, res + 1)}
    split = set()
    for c, n in level[min_res].items():
        if n > thr:
            split.add((min_res, c))
        else:
            out[(c, min_res)] = n
    for r in range(min_res + 1, res + 1):
        nxt = set()
        for c, n in level[r].items():
            pp = int(parent(np.array([c]), r, r - 1)[0])
            if (r - 1, pp) not in split:
                continue
            if r == res or n <= thr:
                out[(c, r)] = n
            else:
                nxt.add((r, c))
        split = nxt
    return out


def _as_dict(df):
    return {(int(r.cell), int(r.res)): int(r.n) for r in df.itertuples()}


def test_matches_brute_force(ray_session):
    rng = np.random.default_rng(21)
    # skewed occupancy: a hot corner plus uniform background
    hot = rng.integers(0, 16, 600) * 64 + rng.integers(0, 16, 600)
    bg = rng.integers(0, 64 * 64, 400)
    cells = np.concatenate([hot, bg, [-1, -1]]).astype(np.int64)
    got = _as_dict(quadtree_leaves(_ds(cells), res=6, min_res=2,
                                   threshold=20).to_pandas())
    exp = _brute(cells, 6, 2, 20)
    assert got == exp
    # the hot corner must be tiled deeper than the background
    depths = {}
    for (c, r) in got:
        depths.setdefault(r, 0)
        depths[r] += 1
    assert max(depths) > min(depths)


def test_leaves_partition_all_points(ray_session):
    rng = np.random.default_rng(22)
    cells = rng.integers(0, 64 * 64, 1000).astype(np.int64)
    got = quadtree_leaves(_ds(cells), res=6, min_res=2,
                          threshold=10).to_pandas()
    # leaf counts sum to the total: the cover is exact and disjoint
    assert got["n"].sum() == len(cells)
    # no leaf is an ancestor of another
    keys = {(int(r.cell), int(r.res)) for r in got.itertuples()}
    for c, r in keys:
        for rr in range(2, r):
            assert (int(parent(np.array([c]), r, rr)[0]), rr) not in keys


def test_all_under_threshold_is_root_level(ray_session):
    cells = np.arange(20, dtype=np.int64)  # 20 points, huge threshold
    got = quadtree_leaves(_ds(cells), res=6, min_res=2,
                          threshold=100).to_pandas()
    assert set(got["res"]) == {2}
    assert got["n"].sum() == 20


def test_validation(ray_session):
    with pytest.raises(ValueError):
        quadtree_leaves(_ds([1]), res=6, min_res=6)
    with pytest.raises(ValueError):
        quadtree_leaves(_ds([1]), threshold=0)

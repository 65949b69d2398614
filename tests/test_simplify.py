"""RDP simplification + convex hulls (stages/simplify.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.simplify import (
    _hull, _rdp_keep, convex_hulls, rdp_simplify)


def _ref_rdp(x, y, eps2):
    """Independent recursive reference with exact integer predicates."""
    n = len(x)
    keep = [False] * n
    keep[0] = keep[-1] = True

    def rec(i0, i1):
        if i1 - i0 < 2:
            return
        ax, ay, bx, by = int(x[i0]), int(y[i0]), int(x[i1]), int(y[i1])
        dx, dy = bx - ax, by - ay
        len2 = dx * dx + dy * dy
        best, bj = -1, None
        for j in range(i0 + 1, i1):
            px, py = int(x[j]) - ax, int(y[j]) - ay
            if len2 == 0:
                d2, thr = px * px + py * py, eps2
            else:
                c = dx * py - dy * px
                d2, thr = c * c, eps2 * len2
            if d2 > best:
                best, bj = d2, j
        if best > (eps2 * len2 if len2 else eps2):
            keep[bj] = True
            rec(i0, bj)
            rec(bj, i1)

    rec(0, n - 1)
    return np.array(keep)


def _ref_hull_set(pts):
    """Hull vertex set by the O(n^3) corner characterization."""
    pts = [tuple(map(int, p)) for p in
           np.unique(np.asarray(pts), axis=0)]
    if len(pts) <= 2:
        return set(pts)
    out = set()
    for p in pts:
        for q in pts:
            if q == p:
                continue
            ok = True
            for r in pts:
                if r in (p, q):
                    continue
                cr = (q[0] - p[0]) * (r[1] - p[1]) \
                    - (q[1] - p[1]) * (r[0] - p[0])
                dt = (q[0] - p[0]) * (r[0] - p[0]) \
                    + (q[1] - p[1]) * (r[1] - p[1])
                if not (cr > 0 or (cr == 0 and dt > 0)):
                    ok = False
                    break
            if ok:
                out.add(p)
                break
    return out


@pytest.mark.parametrize("seed,n,eps", [(1, 60, 10), (2, 200, 50),
                                        (3, 33, 1)])
def test_rdp_kernel_matches_recursive_reference(seed, n, eps):
    rng = np.random.RandomState(seed)
    x = rng.randint(0, 1024, n).astype(np.int64)
    y = rng.randint(0, 1024, n).astype(np.int64)
    got = _rdp_keep(x, y, eps * eps)
    want = _ref_rdp(x, y, eps * eps)
    assert got.tolist() == want.tolist()


def test_rdp_collinear_path_collapses():
    x = np.arange(10, dtype=np.int64)
    y = 2 * x
    keep = _rdp_keep(x, y, 1)
    assert keep.tolist() == [True] + [False] * 8 + [True]


def test_rdp_stage_orders_and_passes_small(ray_session):
    import ray.data as rd
    t = pa.table({
        "user_id": pa.array([1] * 4 + [2], type=pa.int64()),
        "ts": pa.array([3, 1, 2, 4, 1], type=pa.int64()),
        "event_id": pa.array([10, 11, 12, 13, 14], type=pa.int64()),
        "x": pa.array([100, 0, 50, 150, 7], type=pa.int64()),
        "y": pa.array([0, 0, 500, 0, 7], type=pa.int64()),
    })
    out = rdp_simplify(rd.from_arrow(t), eps=5).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("t")
    # path ordered by ts: (0,0) -> (50,500) -> (100,0) -> (150,0):
    # the spike survives, the flat tail point between kept ends too
    assert set(u1["event_id"]) == {11, 12, 10, 13}
    # single-point entity passes through
    assert (out["user_id"] == 2).sum() == 1


def test_rdp_coordinate_guard(ray_session):
    import ray.data as rd
    t = pa.table({
        "user_id": pa.array([1, 1, 1], type=pa.int64()),
        "ts": pa.array([1, 2, 3], type=pa.int64()),
        "event_id": pa.array([1, 2, 3], type=pa.int64()),
        "x": pa.array([0, 1 << 20, 5], type=pa.int64()),
        "y": pa.array([0, 1, 2], type=pa.int64()),
    })
    with pytest.raises(Exception):
        rdp_simplify(rd.from_arrow(t), eps=5).materialize()


@pytest.mark.parametrize("seed,n", [(4, 40), (5, 9), (6, 120)])
def test_hull_kernel_matches_corner_characterization(seed, n):
    rng = np.random.RandomState(seed)
    pts = rng.randint(0, 64, (n, 2)).astype(np.int64)  # dense: collinears
    got = _hull(pts)
    assert set(map(tuple, got.tolist())) == _ref_hull_set(pts)


def test_hull_ccw_orientation_and_no_collinear():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 0], [2, 2]],
                   dtype=np.int64)
    h = _hull(pts)
    assert set(map(tuple, h.tolist())) == {(0, 0), (4, 0), (4, 4), (0, 4)}
    # CCW: the signed area of the polygon is positive
    xs, ys = h[:, 0], h[:, 1]
    area2 = np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys)
    assert area2 > 0


def test_hull_stage_degenerate_entities(ray_session):
    import ray.data as rd
    t = pa.table({
        "user_id": pa.array([1, 2, 2, 3, 3, 3], type=pa.int64()),
        "x": pa.array([5, 0, 9, 1, 1, 1], type=pa.int64()),
        "y": pa.array([5, 0, 9, 2, 2, 2], type=pa.int64()),
    })
    out = convex_hulls(rd.from_arrow(t)).to_pandas()
    assert (out["user_id"] == 1).sum() == 1      # single point
    assert (out["user_id"] == 2).sum() == 2      # two points
    assert (out["user_id"] == 3).sum() == 1      # duplicates collapse

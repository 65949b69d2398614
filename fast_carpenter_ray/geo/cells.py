"""Hierarchical lat/lng grid-cell index (H3/S2-style int API).

The north star asks for a "vectorized H3/S2 cell-encode stage (batched
lat/lng-to-cell via h3 int API)".  No ``h3`` wheel exists in this sandbox
(SURVEY.md §7.0), so this module implements an equal-angle hierarchical grid
with the same int-API *shape* — ``cell_id(lat, lng, res) -> int64``,
``parent(cell, res, parent_res)``, ``k_ring(cell, res, k)`` — in pure
vectorized NumPy.  It is deliberately swappable for the real ``h3`` int API
on a real cluster: every call site goes through these functions.

Cell id layout at resolution ``r``: ``cell = iy * 2**r + ix`` with
``ix = floor((lng+180)/360 * 2**r)``, ``iy = floor((lat+90)/180 * 2**r)``,
clamped into range (a row-major grid index).  This exact arithmetic is chosen
to be reproducible in ANSI SQL for the DuckDB oracle:
``floor((lng + 180.0) / 360.0 * n)`` uses the same IEEE-754 double ops in the
same order in NumPy and DuckDB, so cell assignments match bit-for-bit.
"""

from __future__ import annotations

import numpy as np

RESOLUTION_DEFAULT = 6  # 64 x 64 grid; ~2.8 deg cells


def _n(res: int) -> int:
    return 1 << res


def cell_xy(lat, lng, res: int = RESOLUTION_DEFAULT):
    """Vectorized (ix, iy) grid coordinates; NaN lat/lng -> (-1, -1)."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    n = _n(res)
    fx = np.floor((lng + 180.0) / 360.0 * n)
    fy = np.floor((lat + 90.0) / 180.0 * n)
    with np.errstate(invalid="ignore"):
        ix = np.clip(fx, 0, n - 1)
        iy = np.clip(fy, 0, n - 1)
    bad = ~(np.isfinite(fx) & np.isfinite(fy))
    ix = np.where(bad, -1, ix).astype(np.int64)
    iy = np.where(bad, -1, iy).astype(np.int64)
    return ix, iy


def cell_id(lat, lng, res: int = RESOLUTION_DEFAULT) -> np.ndarray:
    """Vectorized lat/lng -> int64 cell id; NaN coordinates -> -1."""
    ix, iy = cell_xy(lat, lng, res)
    cell = iy * _n(res) + ix
    return np.where((ix < 0) | (iy < 0), -1, cell)


def parent(cell, res: int, parent_res: int) -> np.ndarray:
    """Coarsen cell ids from ``res`` to ``parent_res`` (h3 cell_to_parent)."""
    if parent_res > res:
        raise ValueError("parent_res must be <= res")
    cell = np.asarray(cell, dtype=np.int64)
    n, pn = _n(res), _n(parent_res)
    shift = res - parent_res
    iy, ix = cell // n, cell % n
    out = (iy >> shift) * pn + (ix >> shift)
    return np.where(cell < 0, -1, out)


def k_ring(cell: int, res: int, k: int = 1) -> np.ndarray:
    """Cells within Chebyshev distance ``k`` of ``cell`` (h3 grid_disk).

    Longitude wraps around the antimeridian; latitude clamps at the poles.
    Returns a 1-D int64 array (the cell itself included).
    """
    n = _n(res)
    iy, ix = int(cell) // n, int(cell) % n
    ys = np.arange(iy - k, iy + k + 1)
    ys = ys[(ys >= 0) & (ys < n)]
    xs = (np.arange(ix - k, ix + k + 1)) % n
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return np.unique(yy.ravel() * n + xx.ravel())


def cell_bounds(cell, res: int = RESOLUTION_DEFAULT):
    """(lat0, lat1, lng0, lng1) bounding box of each cell (half-open)."""
    cell = np.asarray(cell, dtype=np.int64)
    n = _n(res)
    iy, ix = cell // n, cell % n
    lat0 = iy / n * 180.0 - 90.0
    lat1 = (iy + 1) / n * 180.0 - 90.0
    lng0 = ix / n * 360.0 - 180.0
    lng1 = (ix + 1) / n * 360.0 - 180.0
    return lat0, lat1, lng0, lng1

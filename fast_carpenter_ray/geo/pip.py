"""Point-in-polygon kernel + cell-cover index (the "STRtree" role).

No ``shapely`` in this sandbox (SURVEY.md §7.0), so the PIP join is built on
a vectorized ray-casting crossing-number kernel over polygon edge arrays,
with a two-level prefilter: per-polygon bbox, and a coarse cell-cover map
``{cell -> candidate poly ids}`` built once per actor in ``__init__`` (the
Ray analogue of loading an STRtree once per worker process).

Boundary convention: **half-open** — a point exactly on a polygon's lower or
left edge is inside; on the upper or right edge it is outside.  This mirrors
the reference's closed-left bin intervals
(``fast_carpenter/summary/binning_config.py:80``, ``right=False`` in
``summary/binned_dataframe.py:262``) and makes adjacent polygons partition
the plane without double-assignment.  The standard even-odd ray-casting rule
with half-open edge tests ``(y1 <= y) != (y2 <= y)`` implements exactly this
for axis-aligned edges and is deterministic for general ones.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from .cells import cell_id, k_ring, RESOLUTION_DEFAULT


@dataclass
class Polygon:
    poly_id: int
    name: str
    ring: List[Tuple[float, float]]  # [(lat, lng), ...] closed or open ring

    def edge_arrays(self):
        lat = np.asarray([p[0] for p in self.ring], dtype=np.float64)
        lng = np.asarray([p[1] for p in self.ring], dtype=np.float64)
        if lat[0] != lat[-1] or lng[0] != lng[-1]:
            lat = np.append(lat, lat[0])
            lng = np.append(lng, lng[0])
        return lat, lng

    def bbox(self):
        lat, lng = self.edge_arrays()
        return lat.min(), lat.max(), lng.min(), lng.max()


def points_in_polygon(lat, lng, ring_lat: np.ndarray, ring_lng: np.ndarray) -> np.ndarray:
    """Even-odd (crossing number) test, vectorized over points.

    Treat lng as x and lat as y.  Edge rule ``(y1 <= y) != (y2 <= y)`` plus a
    strict ``x < x_intersect`` makes boundaries half-open: bottom/left edges
    inside, top/right outside (verified by unit tests).
    """
    x = np.asarray(lng, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    inside = np.zeros(x.shape, dtype=bool)
    x1, y1 = ring_lng[:-1], ring_lat[:-1]
    x2, y2 = ring_lng[1:], ring_lat[1:]
    for i in range(len(x1)):
        cond = (y1[i] <= y) != (y2[i] <= y)
        if not cond.any():
            continue
        # x coordinate where the edge crosses the horizontal line at y
        xint = x1[i] + (y - y1[i]) * (x2[i] - x1[i]) / (y2[i] - y1[i])
        inside ^= cond & (x < xint)
    return inside


class PolygonIndex:
    """Cell-cover prefilter + exact PIP refinement.

    Built once (per actor, in ``__init__`` of the join stage) from the
    polygon table; ``query(lat, lng)`` returns (row_indices, poly_ids) of all
    containment pairs.  Covers the STRtree role in the north star with a
    dict ``cell -> [poly_id]`` at a coarse resolution.
    """

    def __init__(self, polygons: Sequence[Polygon], res: int = RESOLUTION_DEFAULT):
        self.res = res
        self.polygons = list(polygons)
        self._edges = {}
        self._bboxes = {}
        self.cover: Dict[int, List[int]] = {}
        for poly in self.polygons:
            rlat, rlng = poly.edge_arrays()
            self._edges[poly.poly_id] = (rlat, rlng)
            bbox = (rlat.min(), rlat.max(), rlng.min(), rlng.max())
            self._bboxes[poly.poly_id] = bbox
            for c in self._cover_cells(bbox):
                self.cover.setdefault(int(c), []).append(poly.poly_id)

    def _cover_cells(self, bbox) -> np.ndarray:
        lat0, lat1, lng0, lng1 = bbox
        corners_lat = np.asarray([lat0, lat0, lat1, lat1])
        corners_lng = np.asarray([lng0, lng1, lng0, lng1])
        cells = cell_id(corners_lat, corners_lng, self.res)
        # expand to the full rectangle of covered cells via k_ring union of
        # corners when the bbox spans multiple cells
        n = 1 << self.res
        iy0, ix0 = int(cells.min()) // n, int(cells.min()) % n
        iy1, ix1 = int(cells.max()) // n, int(cells.max()) % n
        ys = np.arange(min(iy0, iy1), max(iy0, iy1) + 1)
        xs = np.arange(min(ix0, ix1), max(ix0, ix1) + 1)
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        return np.unique(yy.ravel() * n + xx.ravel())

    def query(self, lat: np.ndarray, lng: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """All (point_index, poly_id) containment pairs for a batch of points."""
        lat = np.asarray(lat, dtype=np.float64)
        lng = np.asarray(lng, dtype=np.float64)
        cells = cell_id(lat, lng, self.res)
        out_rows: List[np.ndarray] = []
        out_polys: List[np.ndarray] = []
        # group points by candidate polygon via the cover map: vectorized per
        # polygon over only the points whose cell the polygon covers
        order = np.argsort(cells, kind="stable")
        sorted_cells = cells[order]
        uniq, starts = np.unique(sorted_cells, return_index=True)
        bounds = np.append(starts, len(sorted_cells))
        cand_points: Dict[int, List[np.ndarray]] = {}
        for u, s, t in zip(uniq, bounds[:-1], bounds[1:]):
            if u < 0:
                continue
            for pid in self.cover.get(int(u), ()):
                cand_points.setdefault(pid, []).append(order[s:t])
        for pid, idx_lists in cand_points.items():
            idx = np.concatenate(idx_lists)
            blat0, blat1, blng0, blng1 = self._bboxes[pid]
            plat, plng = lat[idx], lng[idx]
            inbox = (plat >= blat0) & (plat <= blat1) & (plng >= blng0) & (plng <= blng1)
            idx = idx[inbox]
            if idx.size == 0:
                continue
            rlat, rlng = self._edges[pid]
            hit = points_in_polygon(lat[idx], lng[idx], rlat, rlng)
            idx = idx[hit]
            if idx.size:
                out_rows.append(idx)
                out_polys.append(np.full(idx.size, pid, dtype=np.int64))
        if not out_rows:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        rows = np.concatenate(out_rows)
        polys = np.concatenate(out_polys)
        # deterministic output order: by point index then poly id
        o = np.lexsort((polys, rows))
        return rows[o], polys[o]

"""Snap-to-segment map matching against a broadcast polyline set.

:class:`SnapToSegments` assigns every point the nearest line segment
from a small reference set (road links, admin-boundary edges) by exact
planar point-to-segment distance — the "map matching lite" step of every
trajectory/geo pipeline, and the "distance to nearest boundary" signal
for tiles.

Ray shape: the segment table is tiny reference state captured at plan
time (pickled once per task with the fn — the BlocklistFilter broadcast
pattern; swap to an actor pool only if the segment set grows past
closure size).  The per-batch kernel is one dense ``[n_points,
n_segments]`` NumPy broadcast — no Python per row, no shuffle; the
operator fuses into the read's map chain.  At 100 TB the segment set is
``ray.put`` once and looked up per batch, points stream.

Exactness: projection parameter, clamp, closest-point and squared
distance are each a fixed IEEE float64 expression, written identically
in the SQL oracle — results hash bit-identically (the knn_euclid
contract).  Ties on distance break to the smaller ``seg_id``
(ascending-storage argmin == SQL ``ORDER BY d2, seg_id``).

Reference analogue: none (SURVEY §2.5 spatial extension, like
stages/radius_join.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import pyarrow as pa

__all__ = ["SnapToSegments", "boundary_segments"]


def boundary_segments(zones: Sequence[Tuple]) -> np.ndarray:
    """Rectangle zones ``(poly_id, lat0, lat1, lng0, lng1)`` -> the 4
    boundary edges of each as ``[m, 5]`` rows ``(seg_id, ax, ay, bx,
    by)`` with ``seg_id = poly_id * 4 + edge``, (lat, lng) = (x, y),
    edges ordered S, E, N, W."""
    rows = []
    for pid, lat0, lat1, lng0, lng1 in zones:
        corners = [(lat0, lng0), (lat0, lng1), (lat1, lng1), (lat1, lng0)]
        for e in range(4):
            ax, ay = corners[e]
            bx, by = corners[(e + 1) % 4]
            rows.append((pid * 4 + e, ax, ay, bx, by))
    out = np.asarray(rows, dtype=np.float64)
    return out[np.argsort(out[:, 0], kind="stable")]


class SnapToSegments:
    """Append ``seg_id`` / ``seg_t`` / ``seg_dist`` columns: the nearest
    segment, the clamped projection parameter along it, and the planar
    distance to the closest point on it."""

    def __init__(self, segments: np.ndarray, lat_col: str = "lat",
                 lng_col: str = "lng"):
        seg = np.asarray(segments, dtype=np.float64)
        if seg.ndim != 2 or seg.shape[1] != 5:
            raise ValueError("segments must be [m, 5] rows "
                             "(seg_id, ax, ay, bx, by)")
        order = np.argsort(seg[:, 0], kind="stable")  # tie-break contract
        seg = seg[order]
        self.seg_ids = seg[:, 0].astype(np.int64)
        self.ax, self.ay = seg[:, 1], seg[:, 2]
        self.dx = seg[:, 3] - seg[:, 1]
        self.dy = seg[:, 4] - seg[:, 2]
        l2 = self.dx * self.dx + self.dy * self.dy
        if (l2 == 0).any():
            raise ValueError("zero-length segment")
        self.l2 = l2
        self.lat_col = lat_col
        self.lng_col = lng_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch[self.lat_col].to_numpy(zero_copy_only=False)
        py = batch[self.lng_col].to_numpy(zero_copy_only=False)
        # [n, m] broadcast; expression order mirrors the SQL oracle exactly
        t = ((px[:, None] - self.ax) * self.dx
             + (py[:, None] - self.ay) * self.dy) / self.l2
        t = np.minimum(np.maximum(t, 0.0), 1.0)
        cx = self.ax + t * self.dx
        cy = self.ay + t * self.dy
        d2 = (px[:, None] - cx) ** 2 + (py[:, None] - cy) ** 2
        j = np.argmin(d2, axis=1)  # first occurrence == smallest seg_id
        rows = np.arange(len(px))
        return (batch
                .append_column("seg_id", pa.array(self.seg_ids[j],
                                                  type=pa.int64()))
                .append_column("seg_t", pa.array(t[rows, j],
                                                 type=pa.float64()))
                .append_column("seg_dist", pa.array(np.sqrt(d2[rows, j]),
                                                    type=pa.float64())))

    def apply(self, ds, **kw):
        return ds.map_batches(self, batch_format="pyarrow", **kw)

"""Per-entity polyline simplification (Ramer–Douglas–Peucker) and
convex hulls — the vector-geometry reduction ops of a tiling engine.

Both are classic sequential geometry algorithms (RDP 1972/1973, Andrew
monotone chain 1979 — public literature) that do NOT decompose into
per-batch partials: they need the entity's whole ordered point set.
They therefore run as ``groupby(key).map_groups`` kernels — the same
partitioning contract as ``stages/trajectory.py`` (one shuffle of slim
``(key, t, x, y)`` int rows; each group's memory is the entity's own
point count).

Exactness: coordinates are int64 and every geometric predicate is an
exact integer comparison —

* RDP split test: ``cross((B-A), (P-A))^2 > eps2 * |B-A|^2`` with the
  farthest point chosen by ``(dist2_scaled, index)`` max, so results
  are bit-deterministic (no float perpendicular distances anywhere);
  degenerate segments (A == B) fall back to squared point distance.
* hull turn test: integer cross-product orientation, collinear points
  dropped, ties impossible.

Neither is SQL-expressible (recursive argmax splitting / ordered stack
fold), so their driver oracle is rows-only; correctness is pinned by
pytest against independent reference implementations.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["rdp_simplify", "convex_hulls"]


def _rdp_keep(x: np.ndarray, y: np.ndarray, eps2: int) -> np.ndarray:
    """Boolean keep-mask via an iterative stack RDP over int64 coords.
    Split when max squared perpendicular distance (scaled by |AB|^2)
    exceeds ``eps2 * |AB|^2`` — all int64 arithmetic."""
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 - i0 < 2:
            continue
        ax, ay = x[i0], y[i0]
        bx, by = x[i1], y[i1]
        px = x[i0 + 1:i1]
        py = y[i0 + 1:i1]
        dx, dy = bx - ax, by - ay
        len2 = int(dx) * int(dx) + int(dy) * int(dy)
        if len2 == 0:
            # degenerate segment: plain squared distance to the point A
            d2 = (px - ax) ** 2 + (py - ay) ** 2
            thr = eps2
        else:
            cross = dx * (py - ay) - dy * (px - ax)
            d2 = cross * cross          # == (perp dist)^2 * len2
            thr = eps2 * len2
        j = int(np.argmax(d2))          # first max -> deterministic
        if int(d2[j]) > thr:
            k = i0 + 1 + j
            keep[k] = True
            stack.append((i0, k))
            stack.append((k, i1))
    return keep


def rdp_simplify(ds, eps: int, key: str = "user_id", ts: str = "ts",
                 x: str = "x", y: str = "y", id_col: str = "event_id",
                 num_partitions: Optional[int] = None):
    """Per-entity RDP polyline simplification with integer tolerance
    ``eps``: keeps the subset of each entity's ``(ts, id)``-ordered
    points whose removal would move the path by more than ``eps``.

    Returns the kept rows ``(key, id, t, x, y)`` — entities with one
    or two points pass through unchanged (endpoints always survive).
    """
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)
    eps2 = int(eps) * int(eps)
    k_c, t_c, x_c, y_c, i_c = key, ts, x, y, id_col

    def slim(batch: pa.Table) -> pa.Table:
        xs = batch[x_c].cast(pa.int64())
        ys = batch[y_c].cast(pa.int64())
        # cross^2 must stay in int64: |coord| <= 2^14 keeps
        # (8*C^2)^2 = 64*C^4 < 2^63 (grid/pixel coords by design)
        for col in (xs, ys):
            mm = pa.compute.min_max(pa.compute.abs(col))["max"]
            if mm.is_valid and mm.as_py() > 16384:
                raise ValueError(
                    "rdp_simplify: |coords| must be <= 16384 so the "
                    "integer cross^2 predicate cannot overflow int64")
        return pa.table({
            k_c: batch[k_c],
            i_c: batch[i_c].cast(pa.int64()),
            "t": batch[t_c].cast(pa.int64()),
            "x": xs,
            "y": ys,
        })

    def simplify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", i_c], kind="stable")
        xs = g["x"].to_numpy()
        ys = g["y"].to_numpy()
        if len(g) <= 2:
            return g
        return g.loc[_rdp_keep(xs, ys, eps2)]

    rows = ds.map_batches(slim, batch_format="pyarrow")
    return rows.groupby(k_c, num_partitions=num_partitions).map_groups(
        simplify, batch_format="pandas")


def _hull(points: np.ndarray) -> np.ndarray:
    """Andrew monotone chain over int64 [n,2] points (sorted, deduped).
    Returns hull vertices in counter-clockwise order starting from the
    lexicographically smallest point.  Collinear points are dropped."""
    pts = np.unique(points, axis=0)          # lexicographic sort + dedup
    n = len(pts)
    if n <= 2:
        return pts

    def half(idx_iter):
        out = []
        for i in idx_iter:
            p = pts[i]
            while len(out) >= 2:
                o, a = pts[out[-2]], pts[out[-1]]
                cr = (int(a[0]) - int(o[0])) * (int(p[1]) - int(o[1])) \
                    - (int(a[1]) - int(o[1])) * (int(p[0]) - int(o[0]))
                if cr <= 0:                  # clockwise or collinear: pop
                    out.pop()
                else:
                    break
            out.append(i)
        return out

    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    return pts[lower[:-1] + upper[:-1]]


def convex_hulls(ds, key: str = "user_id", x: str = "x", y: str = "y",
                 num_partitions: Optional[int] = None):
    """Per-entity convex hull: ``(key, seq, x, y)`` rows, hull vertices
    in CCW order (``seq`` = position along the hull).  Entities with
    <= 2 distinct points return those points."""
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)
    k_c, x_c, y_c = key, x, y

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            k_c: batch[k_c],
            "x": batch[x_c].cast(pa.int64()),
            "y": batch[y_c].cast(pa.int64()),
        })

    def hull_group(g: pd.DataFrame) -> pd.DataFrame:
        pts = _hull(g[["x", "y"]].to_numpy().astype(np.int64))
        return pd.DataFrame({
            k_c: np.repeat(g[k_c].iloc[0], len(pts)),
            "seq": np.arange(len(pts), dtype=np.int64),
            "x": pts[:, 0].astype(np.int64),
            "y": pts[:, 1].astype(np.int64),
        })

    rows = ds.map_batches(slim, batch_format="pyarrow")
    return rows.groupby(k_c, num_partitions=num_partitions).map_groups(
        hull_group, batch_format="pandas")

"""Radius (within-distance) spatial join: every site within R of each point.

The third classic spatial join next to PIP (stages/pip_join.py) and kNN
(stages/knn_join.py): geofencing, catchment areas, "stores near user".

Shape mirrors the kNN join: the site table is broadcast once; each task
holds a ``cell -> site indices`` bucket index; a point's candidate set is
the union of buckets within a ring RADIUS COVER — the Chebyshev ring count
that provably contains every cell intersecting the query disc:

* ``metric="euclid"`` (squared degrees, the SQL-oracle metric):
  ``r = ceil(radius_deg / cell_height_deg)`` rows and
  ``ceil(radius_deg / cell_width_deg)`` columns; the square ring of the
  max covers both.  Exact filter ``dx*dx + dy*dy <= radius_deg^2`` in the
  same IEEE-754 op order as the oracle (NO longitude wrap in this metric,
  matching the plain-arithmetic SQL).
* ``metric="haversine"`` (meters): latitude extent ``radius_rad``;
  longitude extent ``radius_rad / cos(clamped |lat| + lat extent)`` —
  when the cosine vanishes (query disc touches a pole) the candidate set
  falls back to ALL sites for that cell group (correct, still exact after
  the distance filter).

Per batch the points are grouped by cell so every point in a cell shares
one candidate gather + one vectorized distance evaluation.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np
import pyarrow as pa

from ..geo.cells import cell_id, k_ring
from ..geo.distance import EARTH_RADIUS_M, haversine_m

__all__ = ["radius_join", "radius_anti"]


def radius_join(ds, sites, radius: float, res: int = 6,
                metric: str = "euclid", lat: str = "lat", lng: str = "lng"):
    """Inner join of each point to every site within ``radius``.

    ``radius`` is squared-degrees' square root (i.e. degrees) for
    ``metric="euclid"`` and meters for ``metric="haversine"``.  Emits the
    point row + ``site_id`` + ``dist`` (squared degrees / meters), one row
    per match; points with no site in range produce nothing.
    """
    if metric not in ("euclid", "haversine"):
        raise ValueError(f"radius_join: unknown metric {metric!r}")
    if radius <= 0:
        raise ValueError("radius_join: radius must be > 0")
    if isinstance(sites, pa.Table):
        sites = {c: sites[c].to_numpy(zero_copy_only=False)
                 for c in sites.column_names}
    s_lat = np.asarray(sites["lat"], dtype=np.float64)
    s_lng = np.asarray(sites["lng"], dtype=np.float64)
    s_id = np.asarray(sites["site_id"], dtype=np.int64)
    n = 1 << res
    cell_h_deg = 180.0 / n
    cell_w_deg = 360.0 / n

    site_cells = cell_id(s_lat, s_lng, res)
    bucket: Dict[int, np.ndarray] = {}
    order = np.argsort(site_cells, kind="stable")
    sc = site_cells[order]
    uniq, starts = np.unique(sc, return_index=True)
    bounds = np.append(starts, len(sc))
    for u, s0, s1 in zip(uniq, bounds[:-1], bounds[1:]):
        bucket[int(u)] = order[s0:s1]

    if metric == "euclid":
        ring = int(math.ceil(radius / cell_h_deg)) + 1
        r2 = radius * radius
    else:
        rad = radius / EARTH_RADIUS_M
        lat_extent_deg = math.degrees(rad)
        ring = None  # computed per cell group (longitude shrink)

    def probe(batch: pa.Table) -> pa.Table:
        plat = batch[lat].to_numpy(zero_copy_only=False)
        plng = batch[lng].to_numpy(zero_copy_only=False)
        cells = cell_id(plat, plng, res)
        out_rows = []
        out_sids = []
        out_dist = []
        order_p = np.argsort(cells, kind="stable")
        cs = cells[order_p]
        u, st = np.unique(cs, return_index=True)
        bd = np.append(st, len(cs))
        for cell, a, b in zip(u, bd[:-1], bd[1:]):
            if cell < 0:
                continue  # no-geo rows never match
            rows = order_p[a:b]
            if metric == "euclid":
                rr = ring
            else:
                # longitude extent grows with |lat|; conservative cosine at
                # the disc's pole-most latitude.  NEVER clamp phi downward
                # (that would under-size the ring and silently drop
                # matches); discs reaching within 1 deg of a pole take the
                # full-scan fallback instead.
                iy = int(cell) // n
                lat0 = abs(iy / n * 180.0 - 90.0)
                lat1 = abs((iy + 1) / n * 180.0 - 90.0)
                phi = max(lat0, lat1) + lat_extent_deg
                if phi >= 89.0:
                    cand = np.arange(len(s_id))
                    rr = None
                else:
                    cosphi = math.cos(math.radians(phi))
                    ry = math.ceil(lat_extent_deg / cell_h_deg)
                    rx = math.ceil(lat_extent_deg / (cell_w_deg * cosphi))
                    rr = int(max(rx, ry)) + 1
            if rr is not None:
                ring_cells = k_ring(int(cell), res, rr)
                cand_lists = [bucket[c] for c in ring_cells.tolist()
                              if c in bucket]
                if not cand_lists:
                    continue
                cand = np.concatenate(cand_lists)
            if len(cand) == 0:
                continue
            pl = plat[rows]
            pg = plng[rows]
            if metric == "euclid":
                dx = pl[:, None] - s_lat[cand][None, :]
                dy = pg[:, None] - s_lng[cand][None, :]
                d = dx * dx + dy * dy
                hit = d <= r2
            else:
                d = haversine_m(pl[:, None], pg[:, None],
                                s_lat[cand][None, :], s_lng[cand][None, :])
                hit = d <= radius
            pi, si = np.nonzero(hit)
            out_rows.append(rows[pi])
            out_sids.append(cand[si])
            out_dist.append(d[pi, si])
        if out_rows:
            rows_all = np.concatenate(out_rows)
            sids_all = np.concatenate(out_sids)
            dist_all = np.concatenate(out_dist)
        else:
            rows_all = np.array([], dtype=np.int64)
            sids_all = np.array([], dtype=np.int64)
            dist_all = np.array([], dtype=np.float64)
        out = {c: batch[c].take(pa.array(rows_all))
               for c in batch.column_names}
        out["site_id"] = pa.array(s_id[sids_all.astype(np.int64)]
                                  if len(sids_all) else
                                  np.array([], dtype=np.int64),
                                  type=pa.int64())
        out["dist"] = pa.array(dist_all, type=pa.float64())
        return pa.table(out)

    return ds.map_batches(probe, batch_format="pyarrow")


def radius_anti(ds, sites, radius: float, metric: str = "euclid",
                lat: str = "lat", lng: str = "lng"):
    """Anti form of :func:`radius_join`: rows with NO site within
    ``radius`` (coverage gaps).  Points with null coordinates are
    dropped (they match no site but are not meaningful gaps).

    Scale shape: the site table is the broadcast side by definition —
    one ``ray.put``, a per-batch vectorized min-distance test, ZERO
    shuffles; the stream is filtered in place.  The site axis is
    chunked so the distance scratch stays bounded for large site
    tables.
    """
    import ray

    if metric not in ("euclid", "haversine"):
        raise ValueError(f"radius_anti: unknown metric {metric!r}")
    if radius <= 0:
        raise ValueError("radius_anti: radius must be > 0")
    if isinstance(sites, pa.Table):
        sites = {c: sites[c].to_numpy(zero_copy_only=False)
                 for c in sites.column_names}
    s_lat = np.asarray(sites["lat"], dtype=np.float64)
    s_lng = np.asarray(sites["lng"], dtype=np.float64)
    ref = ray.put((s_lat, s_lng))
    r2 = float(radius) * float(radius)
    rad_m = float(radius)
    CH = 256   # site-axis chunk: batch x 256 doubles scratch

    def keep_far(batch: pa.Table) -> pa.Table:
        sl, sg = ray.get(ref)
        plat = batch[lat].to_numpy(zero_copy_only=False)
        plng = batch[lng].to_numpy(zero_copy_only=False)
        ok = np.isfinite(plat) & np.isfinite(plng)
        near = np.zeros(len(plat), dtype=bool)
        for s0 in range(0, len(sl), CH):
            a_lat = sl[s0:s0 + CH]
            a_lng = sg[s0:s0 + CH]
            if metric == "euclid":
                dx = plat[:, None] - a_lat[None, :]
                dy = plng[:, None] - a_lng[None, :]
                near |= ((dx * dx + dy * dy) <= r2).any(axis=1)
            else:
                d = haversine_m(plat[:, None], plng[:, None],
                                a_lat[None, :], a_lng[None, :])
                near |= (d <= rad_m).any(axis=1)
        return batch.filter(pa.array(ok & ~near))

    return ds.map_batches(keep_far, batch_format="pyarrow")

"""kNN join — k-ring candidate expansion + haversine refinement (actor pool).

North star: "kNN via H3 k-ring expansion with distance refinement".  The
site table (small side) is broadcast via ``ray.put``; each actor builds a
``cell -> site indices`` bucket index once in ``__init__`` and probes each
batch vectorized, grouping points by cell so every point in a cell shares
one candidate set.

Exactness: after expanding to ring ``r``, the best-k candidates are final
only if the k-th distance is below a lower bound on the distance to any
site *outside* ring ``r``.  For the equal-angle grid, any such site differs
by >= r cells in x or y, giving (conservatively, valid across the globe
including near poles via the chord inequality sin(x) >= (2/pi) x):

    bound_m = (2/pi) * (r-1) * cell_height_rad * R * min(1, cos(phi_eff))

with phi_eff = |lat| + r * cell_height (clamped < 90 deg).  Points that
fail to converge by ``max_ring`` fall back to brute force over all sites —
the k-ring path is a locality optimization, never a correctness tradeoff
(tests assert ring-based == brute-force haversine kNN).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
import pyarrow as pa

from ..geo.cells import cell_id, k_ring
from ..geo.distance import EARTH_RADIUS_M, haversine_m

__all__ = ["KNNJoiner", "knn_join", "brute_force_knn"]


def _unit_vectors(lat, lng) -> np.ndarray:
    """[n, 3] unit vectors on the sphere (4 trig calls per point)."""
    latr = np.radians(np.asarray(lat, dtype=np.float64))
    lngr = np.radians(np.asarray(lng, dtype=np.float64))
    cl = np.cos(latr)
    return np.stack([cl * np.cos(lngr), cl * np.sin(lngr), np.sin(latr)], axis=1)


def brute_force_knn(lat, lng, site_lat, site_lng, site_id, k,
                    metric: str = "haversine"):
    """Exact kNN over the given sites; ties by site_id.  Returns
    (ids, dists) arrays of shape [n_points, k].

    ``metric="haversine"``: ranking by the chord dot product (one matmul —
    great-circle distance is strictly monotone decreasing in the dot
    product, so the ranking is exact while avoiding per-pair trig:
    haversine at ~1us/elem on this VM dominated the join otherwise);
    haversine meters evaluated only for the selected k neighbours.

    ``metric="euclid"``: squared euclidean distance in DEGREES —
    ``(lat-slat)^2 + (lng-slng)^2`` with the exact IEEE-754 op order an
    ANSI-SQL oracle reproduces bit-for-bit, so rankings (incl. ties by
    site_id) match ``row_number() OVER (ORDER BY d2, site_id)`` exactly.
    Emitted distance is the squared value."""
    order = np.argsort(site_id, kind="stable")
    slat, slng, sid = site_lat[order], site_lng[order], site_id[order]
    kk = min(k, len(sid))
    plat = np.asarray(lat, dtype=np.float64)
    plng = np.asarray(lng, dtype=np.float64)
    if metric == "euclid":
        dx = plat[:, None] - slat[None, :]
        dy = plng[:, None] - slng[None, :]
        d2 = dx * dx + dy * dy  # [n, n_sites]
        idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]  # stable => id ties
        return sid[idx], np.take_along_axis(d2, idx, axis=1)
    p = _unit_vectors(lat, lng)
    s = _unit_vectors(slat, slng)
    dots = p @ s.T  # [n, n_sites]; larger dot = closer
    idx = np.argsort(-dots, axis=1, kind="stable")[:, :kk]  # stable => id ties
    sel_lat = slat[idx]
    sel_lng = slng[idx]
    d = haversine_m(plat[:, None], plng[:, None], sel_lat, sel_lng)
    return sid[idx], d


class KNNJoiner:
    def __init__(self, sites, k: int = 3, res: int = 6, max_ring: int = 4,
                 lat: str = "lat", lng: str = "lng", explode: bool = True,
                 metric: str = "haversine",
                 brute_force_sites: Optional[int] = None):
        import ray

        if metric not in ("haversine", "euclid"):
            raise ValueError(f"unknown kNN metric {metric!r}")
        if isinstance(sites, ray.ObjectRef):
            sites = ray.get(sites)  # broadcast read: once per actor
        if isinstance(sites, pa.Table):
            sites = {c: sites[c].to_numpy(zero_copy_only=False) for c in sites.column_names}
        self.site_lat = np.asarray(sites["lat"], dtype=np.float64)
        self.site_lng = np.asarray(sites["lng"], dtype=np.float64)
        self.site_id = np.asarray(sites["site_id"], dtype=np.int64)
        self.k = k
        self.res = res
        self.max_ring = max_ring
        self.lat_col = lat
        self.lng_col = lng
        self.explode = explode
        self.metric = metric
        if brute_force_sites is not None:
            self.brute_force_sites = int(brute_force_sites)
        # cell -> site row indices, built once per actor
        site_cells = cell_id(self.site_lat, self.site_lng, res)
        self.bucket: Dict[int, np.ndarray] = {}
        order = np.argsort(site_cells, kind="stable")
        sc = site_cells[order]
        uniq, starts = np.unique(sc, return_index=True)
        bounds = np.append(starts, len(sc))
        for u, s, t in zip(uniq, bounds[:-1], bounds[1:]):
            self.bucket[int(u)] = order[s:t]
        self._cell_h_rad = math.radians(180.0 / (1 << res))

    def _bound_m(self, ring: int, abs_lat_deg: float) -> float:
        if ring <= 1:
            return 0.0
        phi = min(89.99, abs_lat_deg + ring * math.degrees(self._cell_h_rad))
        cosphi = min(1.0, math.cos(math.radians(phi)))
        return (2.0 / math.pi) * (ring - 1) * self._cell_h_rad * EARTH_RADIUS_M * cosphi

    def _bound_d2(self, ring: int) -> float:
        """Lower bound on squared-euclid-degrees to any site OUTSIDE ring r.

        Such a site's cell is at Chebyshev cell-distance >= r+1 (k_ring
        covers <= r; longitude wrap only ADDS candidate cells, so the
        unwrapped distance is >= the wrapped one), hence |dlat| >=
        r * (180/N) or |dlng| >= r * (360/N); the conservative minimum is
        (r * 180/N)^2.  Used with a STRICT comparison so a boundary tie
        can never admit an unseen site."""
        cell_h_deg = math.degrees(self._cell_h_rad)
        return (ring * cell_h_deg) ** 2

    def _converged(self, dists: np.ndarray, ring: int, max_abs_lat: float) -> bool:
        k = self.k
        if dists.shape[1] < k:
            return False
        worst = float(dists[:, k - 1].max())
        if self.metric == "euclid":
            return worst < self._bound_d2(ring)
        return worst <= self._bound_m(ring, max_abs_lat)

    def _query_group(self, lat: np.ndarray, lng: np.ndarray, cell: int):
        """kNN for all points sharing one cell."""
        k = self.k
        max_abs_lat = float(np.max(np.abs(lat)))
        for ring in range(1, self.max_ring + 1):
            cells = k_ring(cell, self.res, ring)
            cand_lists = [self.bucket[c] for c in cells.tolist() if int(c) in self.bucket]
            if not cand_lists:
                continue
            cand = np.concatenate(cand_lists)
            if len(cand) < k:
                continue
            ids, dists = brute_force_knn(
                lat, lng, self.site_lat[cand], self.site_lng[cand],
                self.site_id[cand], k, metric=self.metric)
            if self._converged(dists, ring, max_abs_lat):
                return ids, dists
        # fallback: exact brute force over all sites
        return brute_force_knn(lat, lng, self.site_lat, self.site_lng,
                               self.site_id, k, metric=self.metric)

    #: below this site count the k-ring candidate machinery costs more than
    #: one whole-batch distance matrix — brute force the batch in a single
    #: vectorized pass (the ring path is the scale story for large site
    #: tables, where candidates per cell << total sites).  Instance
    #: override via the ``brute_force_sites`` constructor arg (0 forces
    #: the ring path — used by the oracle-checked euclid query so the
    #: k-ring/stop-bound machinery itself is what gets verified).
    brute_force_sites = 2048

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        lng = batch[self.lng_col].to_numpy(zero_copy_only=False)
        cells = cell_id(lat, lng, self.res)
        n = len(batch)
        kk = min(self.k, len(self.site_id))
        out_ids = np.full((n, kk), -1, dtype=np.int64)
        out_d = np.full((n, kk), np.nan)
        valid = cells >= 0
        if len(self.site_id) <= self.brute_force_sites:
            if valid.any():
                ids, dists = brute_force_knn(
                    lat[valid], lng[valid],
                    self.site_lat, self.site_lng, self.site_id, kk,
                    metric=self.metric)
                out_ids[valid] = ids
                out_d[valid] = dists
            return self._emit(batch, valid, out_ids, out_d, kk)
        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        uniq, starts = np.unique(sc, return_index=True)
        bounds = np.append(starts, len(sc))
        for u, s, t in zip(uniq, bounds[:-1], bounds[1:]):
            if u < 0:
                continue
            idx = order[s:t]
            ids, dists = self._query_group(lat[idx], lng[idx], int(u))
            out_ids[idx] = ids
            out_d[idx] = dists
        return self._emit(batch, valid, out_ids, out_d, kk)

    @property
    def dist_col(self) -> str:
        return "dist_m" if self.metric == "haversine" else "d2_deg"

    def _emit(self, batch, valid, out_ids, out_d, kk):
        n = len(batch)
        dcol = self.dist_col

        if self.explode:
            rows = np.repeat(np.arange(n)[valid], kk)
            out = batch.take(pa.array(rows))
            out = out.append_column("site_id", pa.array(out_ids[valid].ravel(), type=pa.int64()))
            out = out.append_column(dcol, pa.array(out_d[valid].ravel()))
            out = out.append_column(
                "rank", pa.array(np.tile(np.arange(1, kk + 1), int(valid.sum())),
                                 type=pa.int32()))
            return out
        # vectorized list<struct> assembly straight from the dense [n, kk]
        # id/dist arrays: a StructArray over the valid rows' flattened
        # values + a ListArray with cumulative offsets (invalid rows are
        # zero-length + null via mask) — no per-row Python in the
        # flagship chain (round-2 verdict #3)
        counts = np.where(valid, kk, 0).astype(np.int32)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(counts, out=offsets[1:])
        values = pa.StructArray.from_arrays(
            [pa.array(out_ids[valid].ravel(), type=pa.int64()),
             pa.array(out_d[valid].ravel(), type=pa.float64())],
            names=["site_id", dcol])
        neighbors = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), values,
            mask=pa.array(~valid))
        return batch.append_column("neighbors", neighbors)


def knn_join(ds, sites: pa.Table, k: int = 3, res: int = 6, max_ring: int = 4,
             concurrency=None, batch_size=None, explode: bool = True,
             lat: str = "lat", lng: str = "lng", metric: str = "haversine",
             brute_force_sites: Optional[int] = None):
    """Dataset-level wiring for the kNN join.

    ``concurrency=None`` (default): driver-built site index shipped in the
    task closure — elastic stateless tasks (see pip_join rationale).
    ``concurrency=(min,max)``: actor pool reading a ``ray.put`` broadcast
    once per actor — for site tables too large to ship per task.
    ``metric``: "haversine" (meters, chord-ranked) or "euclid" (squared
    degrees, bit-reproducible in ANSI SQL — the oracle-checked path).
    """
    import ray

    kwargs = {"k": k, "res": res, "max_ring": max_ring, "explode": explode,
              "lat": lat, "lng": lng, "metric": metric,
              "brute_force_sites": brute_force_sites}
    if concurrency is None:
        joiner = KNNJoiner(sites, **kwargs)
        return ds.map_batches(joiner, batch_format="pyarrow",
                              batch_size=batch_size)
    ref = ray.put(sites)
    return ds.map_batches(
        KNNJoiner,
        fn_constructor_kwargs={"sites": ref, **kwargs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

"""Raster sampling + raster<->vector zonal stats.

The north star names "raster<->vector zonal tiling" as a first-class engine
capability.  ``ZonalAggregate`` (stages/zonal.py) covers the vector->tile
direction (aggregate point rows per grid cell); this module adds the
raster side:

* :class:`WorldRaster` — an equal-angle global grid of float64 values
  (rows = latitude bands south->north, cols = longitude west->east), the
  in-memory stand-in for a reprojected GeoTIFF band.  Real raster IO
  (rasterio/GDAL) is not in this sandbox; the loader seam is
  :func:`WorldRaster.from_array` and everything downstream is format-
  agnostic.  The grid math reuses the exact floor arithmetic of
  ``geo/cells.py`` so a DuckDB SQL oracle reproduces sampling bit-for-bit.

* :func:`raster_sample` — broadcast the raster ONCE via ``ray.put`` and
  append ``value_col`` to a streaming Dataset by vectorized nearest-cell
  lookup per batch (two integer index ops + one fancy-index gather; no
  Python row loop).  Tasks read the broadcast array zero-copy from the
  local object store — it is never re-shipped per batch.

* :func:`raster_zonal` — raster values aggregated per vector zone
  (grid-cell tile): sample, then the ZonalAggregate partial/combine path.
  100-TB shape: the only shuffle is the zonal combine's (tiny, per-cell
  partials); the raster itself never moves after the one broadcast.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["WorldRaster", "raster_sample", "raster_zonal",
           "focal_mean", "make_test_raster", "areal_interpolate"]


class WorldRaster:
    """Global equal-angle raster: ``values[iy, ix]`` with
    ``iy = floor((lat+90)/180*ny)``, ``ix = floor((lng+180)/360*nx)``
    (clamped) — the same IEEE-754 op order as ``geo.cells.cell_xy`` so the
    SQL oracle matches bit-for-bit."""

    def __init__(self, values: np.ndarray):
        values = np.asarray(values, dtype=np.float64)
        if values.ndim != 2:
            raise ValueError("WorldRaster: values must be 2-D [ny, nx]")
        self.values = values
        self.ny, self.nx = values.shape

    @classmethod
    def from_array(cls, values) -> "WorldRaster":
        return cls(np.asarray(values))

    def sample(self, lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
        """Vectorized value lookup; NaN coordinates -> NaN."""
        lat = np.asarray(lat, dtype=np.float64)
        lng = np.asarray(lng, dtype=np.float64)
        fy = np.floor((lat + 90.0) / 180.0 * self.ny)
        fx = np.floor((lng + 180.0) / 360.0 * self.nx)
        with np.errstate(invalid="ignore"):
            iy = np.clip(fy, 0, self.ny - 1)
            ix = np.clip(fx, 0, self.nx - 1)
        bad = ~(np.isfinite(fy) & np.isfinite(fx))
        out = self.values[np.where(bad, 0, iy).astype(np.int64),
                          np.where(bad, 0, ix).astype(np.int64)]
        return np.where(bad, np.nan, out)


def make_test_raster(ny: int = 64, nx: int = 64) -> WorldRaster:
    """Deterministic synthetic raster (no external data in this sandbox):
    ``value[iy, ix] = ((iy*31 + ix*17) % 1000) / 1024.0`` — integer
    arithmetic, reproducible in ANSI SQL for the oracle."""
    iy, ix = np.meshgrid(np.arange(ny, dtype=np.int64),
                         np.arange(nx, dtype=np.int64), indexing="ij")
    return WorldRaster(((iy * 31 + ix * 17) % 1000) / 1024.0)


def raster_sample(ds, raster: WorldRaster, lat_col: str = "lat",
                  lng_col: str = "lng", value_col: str = "raster_value"):
    """Append ``value_col`` (float64; null where coordinates are null/NaN)
    by nearest-cell raster lookup.  The raster array is ``ray.put`` once;
    each task reads it zero-copy from the local object store."""
    import ray

    ny, nx = raster.ny, raster.nx
    ref = ray.put(raster.values)

    def sample(batch: pa.Table) -> pa.Table:
        grid = WorldRaster(ray.get(ref))
        assert grid.ny == ny and grid.nx == nx
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lng = batch[lng_col].to_numpy(zero_copy_only=False)
        v = grid.sample(lat, lng)
        return batch.append_column(
            value_col, pa.array(v, type=pa.float64(), from_pandas=True))

    return ds.map_batches(sample, batch_format="pyarrow")


def raster_zonal(ds, raster: WorldRaster, res: int,
                 lat_col: str = "lat", lng_col: str = "lng",
                 mode: str = "tree",
                 max_driver_rows: Optional[int] = None):
    """Zonal statistics of a raster over grid-cell zones: per cell,
    ``n`` samples, ``sum`` and ``mean`` of the raster value at each
    point's location.  Points with null coordinates are dropped (their
    cell id is -1)."""
    from ..geo.cells import cell_id
    from ..agg import combine_partials

    sampled = raster_sample(ds, raster, lat_col, lng_col, "_rv")

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lng = batch[lng_col].to_numpy(zero_copy_only=False)
        cell = cell_id(lat, lng, res)
        v = batch["_rv"].to_numpy(zero_copy_only=False)
        ok = cell >= 0
        cell, v = cell[ok], v[ok]
        import pandas as pd

        df = pd.DataFrame({"cell": cell, "sum_value": v})
        out = df.groupby("cell", sort=False).agg(
            sum_value=("sum_value", "sum"), n=("sum_value", "size")
        ).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = sampled.map_batches(partial, batch_format="pyarrow")
    kwargs = {} if max_driver_rows is None else {
        "max_driver_rows": max_driver_rows}
    combined = combine_partials(parts, keys=["cell"],
                                value_cols=["sum_value", "n"],
                                mode=mode, **kwargs)
    def finish(batch: pa.Table) -> pa.Table:
        s = batch["sum_value"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        return batch.append_column("mean_value", pa.array(s / n))

    return combined.map_batches(finish, batch_format="pyarrow")


def focal_mean(ds, res: int, value_col: str = "weight",
               lat_col: str = "lat", lng_col: str = "lng", k: int = 1,
               mode: str = "auto",
               num_partitions: Optional[int] = None):
    """Focal (neighborhood) smoothing over the hierarchical cell grid —
    the classic raster focal-statistics op (each cell averaged with its
    Chebyshev-``k`` ring), computed from POINT data in one shuffle.

    Per batch, points shrink to ``(cell, sum, n)`` partials; each
    partial is then EXPANDED to its ``(2k+1)^2`` neighborhood (longitude
    wraps, latitude rows off the grid drop — exactly ``geo.cells.k_ring``
    semantics) carrying ``own_n`` only on the center copy, and ONE
    cell-keyed combine produces the focal sums.  Only cells with their
    own data are emitted.  ``focal_mean = focal_sum / focal_n`` is a
    single IEEE division of exact aggregates (dyadic weights sum exactly
    in any order), so a SQL oracle reproduces it bit-for-bit.

    Scale shape: the shuffle carries (2k+1)^2 x per-batch-cell-count
    small rows — never points; ``mode='auto'`` combines driver-side
    (tree) while the cell space is summary-sized (4^res <= 65536) and
    switches to the distributed hash combine above that.
    """
    from ..agg import combine_partials
    from ..geo.cells import cell_id

    import pandas as pd

    n_grid = 1 << res
    if 2 * k + 1 > n_grid:
        raise ValueError("focal_mean: neighborhood wider than the grid")
    offsets = [(dy, dx) for dy in range(-k, k + 1) for dx in range(-k, k + 1)]

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lng = batch[lng_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        cell = cell_id(lat, lng, res)
        ok = cell >= 0
        df = pd.DataFrame({"cell": cell[ok], "s": v[ok]})
        z = df.groupby("cell", sort=False).agg(
            s=("s", "sum"), n=("s", "size")).reset_index()
        cells = z["cell"].to_numpy()
        s = z["s"].to_numpy()
        n = z["n"].to_numpy().astype(np.int64)
        iy, ix = cells // n_grid, cells % n_grid
        out_c, out_s, out_n, out_own = [], [], [], []
        for dy, dx in offsets:
            ny = iy + dy
            valid = (ny >= 0) & (ny < n_grid)
            nx = (ix[valid] + dx) % n_grid
            out_c.append(ny[valid] * n_grid + nx)
            out_s.append(s[valid])
            out_n.append(n[valid])
            own = n[valid] if (dy == 0 and dx == 0) else np.zeros(
                int(valid.sum()), dtype=np.int64)
            out_own.append(own)
        return pa.table({
            "cell": pa.array(np.concatenate(out_c), type=pa.int64()),
            "focal_sum": pa.array(np.concatenate(out_s), type=pa.float64()),
            "focal_n": pa.array(np.concatenate(out_n), type=pa.int64()),
            "n": pa.array(np.concatenate(out_own), type=pa.int64()),
        })

    if mode == "auto":
        mode = "tree" if (1 << (2 * res)) <= 65536 else "hash"
    parts = ds.map_batches(partial, batch_format="pyarrow")
    kwargs = {} if num_partitions is None else {
        "num_partitions": num_partitions}
    combined = combine_partials(parts, keys=["cell"],
                                value_cols=["focal_sum", "focal_n", "n"],
                                mode=mode, **kwargs)

    def finish(batch: pa.Table) -> pa.Table:
        t = batch.filter(pa.compute.greater(batch["n"], 0))
        s = t["focal_sum"].to_numpy(zero_copy_only=False)
        fn = t["focal_n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cell": t["cell"].cast(pa.int64()),
            "n": t["n"].cast(pa.int64()),
            "focal_n": t["focal_n"].cast(pa.int64()),
            "focal_sum": t["focal_sum"],
            "focal_mean": pa.array(s / fn, type=pa.float64()),
        })

    return combined.map_batches(finish, batch_format="pyarrow")


def areal_interpolate(ds, zones, res: int, cell_col: str = "cell",
                      micro: int = 1_000_000):
    """Areal interpolation: apportion per-cell point counts to overlapping
    rectangular zones by exact area fraction (the classic area-weighted
    interpolation of GIS — Goodchild & Lam 1980, public literature).

    Each grid cell's count ``n`` contributes ``n * overlap_area /
    cell_area`` to every zone it overlaps — the dasymetric-lite answer to
    "how many points fall in this polygon" when only gridded counts are
    kept.

    Exact-integer formulation: zone bounds are floored to ``micro``
    units of INDEX space (``floor((deg+90)/180 * N * micro)``), cell
    edges are exact multiples of ``micro``, so every 1-D overlap and the
    per-cell contribution ``n * ov_lat * ov_lng`` is int64.  Per-zone
    numerators sum exactly (int64 bound: ~9.2M points per zone at
    micro=1e6 — split the accumulator before that scale); the final
    ``est = num / micro²`` is one exact IEEE division, so a SQL replay
    hashes bit-identically.

    Scale shape: per-cell counts shrink via ``agg.combine_partials``
    (bounded by the grid, not the data); the zone table is tiny
    broadcast state; per-zone sums are one summary-sized combine.  The
    point stream shuffles only its cell ids.

    ``zones``: iterable of ``(poly_id, lat0, lat1, lng0, lng1)``.
    Returns a pandas DataFrame (poly_id, num, est), one row per zone
    that overlaps at least one occupied cell (zones with no overlap are
    omitted, matching the SQL oracle's inner-join semantics).
    """
    from ..agg import combine_partials

    n_grid = 1 << res
    z = np.asarray([list(map(float, zz)) for zz in zones], dtype=np.float64)
    pid = z[:, 0].astype(np.int64)
    # index-space micro-unit bounds; expression order mirrors the oracle
    zy0 = np.floor((z[:, 1] + 90.0) / 180.0 * n_grid * micro).astype(np.int64)
    zy1 = np.floor((z[:, 2] + 90.0) / 180.0 * n_grid * micro).astype(np.int64)
    zx0 = np.floor((z[:, 3] + 180.0) / 360.0 * n_grid * micro).astype(np.int64)
    zx1 = np.floor((z[:, 4] + 180.0) / 360.0 * n_grid * micro).astype(np.int64)

    def cell_counts(batch: pa.Table) -> pa.Table:
        c = batch[cell_col].to_numpy(zero_copy_only=False)
        c = c[c >= 0]
        items, counts = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(items, type=pa.int64()),
                         "n": pa.array(counts.astype(np.int64))})

    cells = combine_partials(
        ds.map_batches(cell_counts, batch_format="pyarrow"),
        keys=["cell"], value_cols=["n"], mode="hash")

    def zone_partials(batch: pa.Table) -> pa.Table:
        cell = batch["cell"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        iy = (cell // n_grid) * micro
        ix = (cell % n_grid) * micro
        out_pid, out_num = [], []
        for k in range(len(pid)):  # loop over ZONES (tiny), not cells
            ovy = (np.minimum(iy + micro, zy1[k])
                   - np.maximum(iy, zy0[k]))
            ovx = (np.minimum(ix + micro, zx1[k])
                   - np.maximum(ix, zx0[k]))
            hit = (ovy > 0) & (ovx > 0)
            if hit.any():
                out_pid.append(np.full(1, pid[k], dtype=np.int64))
                out_num.append(np.array(
                    [(n[hit] * ovy[hit] * ovx[hit]).sum()], dtype=np.int64))
        if not out_pid:
            return pa.table({"poly_id": pa.array([], pa.int64()),
                             "num": pa.array([], pa.int64())})
        return pa.table({"poly_id": pa.array(np.concatenate(out_pid)),
                         "num": pa.array(np.concatenate(out_num))})

    out = combine_partials(
        cells.map_batches(zone_partials, batch_format="pyarrow"),
        keys=["poly_id"], value_cols=["num"], mode="hash").to_pandas()
    if "poly_id" not in out.columns:
        return pd.DataFrame({"poly_id": pd.Series([], dtype=np.int64),
                             "num": pd.Series([], dtype=np.int64),
                             "est": pd.Series([], dtype=np.float64)})
    out["num"] = out["num"].astype(np.int64)
    out["est"] = out["num"].to_numpy().astype(np.float64) / float(
        micro * micro)
    return out.sort_values("poly_id").reset_index(drop=True)

"""Cell-prefix-partitioned spatial layout + read-pruned bbox queries.

The geo counterpart of the IVF index (`stages/ann.py build_ivf_index`):
pages are written as a hive-partitioned Parquet layout keyed on their
PARENT cell at a coarse resolution (``cell_prefix=<p>/``), so a bounding
-box query prunes whole fragments at the READ — only partitions whose
prefix cell intersects the box leave storage, then one exact vectorized
filter finishes the job.  This is the "prune at the read" story for the
spatial axis: at 100 TB a city-scale bbox touches a handful of the
``4^prefix_res`` partitions instead of the whole corpus.

Rows with no coordinates land in a ``cell_prefix=-1`` partition (never
read by a bbox query, but preserved for completeness).
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

from ..geo.cells import _n

__all__ = ["build_spatial_index", "bbox_query",
           "build_time_index", "time_range_query"]


def _ts_int_us(t):
    """Timestamp column -> int64 MICROSECONDS regardless of the stored
    unit.  A plain ``cast(int64)`` keeps the source unit, so a
    ``timestamp[ns]`` input would bucket by ``ns // bucket_us`` (~86 s
    buckets) and compare ns values against microsecond bounds — silently
    wrong.  Normalising through ``timestamp('us')`` pins the contract."""
    if pa.types.is_timestamp(t.type):
        t = t.cast(pa.timestamp("us")).cast(pa.int64())
    return t


def _empty_like(files: Sequence[str], columns) -> "object":
    """Empty Dataset carrying the index's schema (so callers can chain
    ``.to_pandas()``/``select_columns`` without a None special case)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    schema = pq.read_schema(files[0])
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    return rd.from_arrow(schema.empty_table())


def _prefix_xy(lat: np.ndarray, lng: np.ndarray, prefix_res: int):
    """Clamped integer grid coordinates at ``prefix_res`` (the cell_xy
    convention: floor((lat+90)/180 * 2^r), edge-clamped)."""
    n = _n(prefix_res)
    y = np.clip(np.floor((lat + 90.0) / 180.0 * n), 0, n - 1)
    x = np.clip(np.floor((lng + 180.0) / 360.0 * n), 0, n - 1)
    return y.astype(np.int64), x.astype(np.int64)


def build_spatial_index(ds, index_dir: str, prefix_res: int = 2,
                        lat_col: str = "lat", lng_col: str = "lng"):
    """Write ``ds`` as a hive layout partitioned on the prefix cell."""
    n = _n(prefix_res)

    def assign(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lng = batch[lng_col].to_numpy(zero_copy_only=False)
        ok = np.isfinite(lat) & np.isfinite(lng)
        y, x = _prefix_xy(np.where(ok, lat, 0.0), np.where(ok, lng, 0.0),
                          prefix_res)
        p = np.where(ok, y * n + x, -1).astype(np.int64)
        return batch.append_column("cell_prefix", pa.array(p, type=pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["cell_prefix"])
    return index_dir


def bbox_query(index_dir: str, lat0: float, lat1: float,
               lng0: float, lng1: float, prefix_res: int = 2,
               columns: Optional[Sequence[str]] = None,
               lat_col: str = "lat", lng_col: str = "lng"):
    """Rows with ``lat0 <= lat <= lat1 AND lng0 <= lng <= lng1``.

    Reads ONLY the partitions whose prefix cell intersects the box (the
    fragment-pruning win), then applies the exact closed-interval filter.
    Returns ``(dataset, stats)`` with ``files_read``/``files_total`` and
    ``prefixes_read``/``prefixes_total`` recording the measured pruning.
    """
    import ray.data as rd

    if lat0 > lat1 or lng0 > lng1:
        raise ValueError(
            f"inverted bbox: need lat0 <= lat1 and lng0 <= lng1, got "
            f"lat [{lat0}, {lat1}], lng [{lng0}, {lng1}] — antimeridian-"
            "crossing boxes must be issued as two queries")
    n = _n(prefix_res)
    y0, x0 = _prefix_xy(np.array([lat0]), np.array([lng0]), prefix_res)
    y1, x1 = _prefix_xy(np.array([lat1]), np.array([lng1]), prefix_res)
    ys = np.arange(int(y0[0]), int(y1[0]) + 1)
    xs = np.arange(int(x0[0]), int(x1[0]) + 1)
    want = {int(p) for p in (ys[:, None] * n + xs[None, :]).ravel()}

    all_parts = sorted(glob.glob(os.path.join(index_dir, "cell_prefix=*")))
    files_total = len(glob.glob(os.path.join(index_dir, "**", "*.parquet"),
                                recursive=True))
    read_dirs = [d for d in all_parts
                 if int(os.path.basename(d).split("=")[1]) in want]
    files = [f for d in read_dirs
             for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    stats = {"prefixes_total": len(all_parts),
             "prefixes_read": len(read_dirs),
             "files_total": files_total, "files_read": len(files)}
    if not files:
        all_files = sorted(glob.glob(
            os.path.join(index_dir, "**", "*.parquet"), recursive=True))
        if not all_files:
            raise FileNotFoundError(f"no parquet under {index_dir}")
        return _empty_like(all_files, columns), stats

    read_cols = (list(dict.fromkeys([*columns, lat_col, lng_col]))
                 if columns else None)
    ds = rd.read_parquet(files, columns=read_cols)

    def exact(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lng = batch[lng_col].to_numpy(zero_copy_only=False)
        keep = ((lat >= lat0) & (lat <= lat1)
                & (lng >= lng0) & (lng <= lng1))
        # NaN compares false on every side -> no-coord rows drop
        return batch.filter(pa.array(np.where(np.isfinite(lat)
                                              & np.isfinite(lng),
                                              keep, False)))

    out = ds.map_batches(exact, batch_format="pyarrow")
    if columns:
        out = out.select_columns(list(columns))
    return out, stats


def build_time_index(ds, index_dir: str, ts_col: str = "ts",
                     bucket_us: int = 86_400_000_000):
    """Time-partitioned hive layout: one partition per ``ts // bucket_us``
    bucket (default: day).  The crawl-snapshot counterpart of
    :func:`build_spatial_index` — time-range scans prune whole fragments
    at the read."""

    def assign(batch: pa.Table) -> pa.Table:
        t = _ts_int_us(batch[ts_col])
        b = t.to_numpy(zero_copy_only=False) // bucket_us
        return batch.append_column("ts_bucket",
                                   pa.array(b.astype(np.int64)))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["ts_bucket"])
    return index_dir


def time_range_query(index_dir: str, ts0: int, ts1: int,
                     bucket_us: int = 86_400_000_000,
                     columns: Optional[Sequence[str]] = None,
                     ts_col: str = "ts"):
    """Rows with ``ts0 <= ts < ts1`` (microsecond ints, half-open — the
    window-operator convention).  Reads ONLY buckets overlapping the
    range; same ``(dataset, stats)`` contract as :func:`bbox_query`."""
    import ray.data as rd

    if ts0 > ts1:
        raise ValueError(f"inverted time range: ts0 {ts0} > ts1 {ts1}")
    b0 = int(ts0) // bucket_us
    b1 = (int(ts1) - 1) // bucket_us
    all_parts = sorted(glob.glob(os.path.join(index_dir, "ts_bucket=*")))
    files_total = len(glob.glob(os.path.join(index_dir, "**", "*.parquet"),
                                recursive=True))
    read_dirs = [d for d in all_parts
                 if b0 <= int(os.path.basename(d).split("=")[1]) <= b1]
    files = [f for d in read_dirs
             for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    stats = {"buckets_total": len(all_parts),
             "buckets_read": len(read_dirs),
             "files_total": files_total, "files_read": len(files)}
    if not files:
        all_files = sorted(glob.glob(
            os.path.join(index_dir, "**", "*.parquet"), recursive=True))
        if not all_files:
            raise FileNotFoundError(f"no parquet under {index_dir}")
        return _empty_like(all_files, columns), stats
    read_cols = (list(dict.fromkeys([*columns, ts_col]))
                 if columns else None)
    ds = rd.read_parquet(files, columns=read_cols)

    def exact(batch: pa.Table) -> pa.Table:
        tv = _ts_int_us(batch[ts_col]).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((tv >= ts0) & (tv < ts1)))

    out = ds.map_batches(exact, batch_format="pyarrow")
    if columns:
        out = out.select_columns(list(columns))
    return out, stats

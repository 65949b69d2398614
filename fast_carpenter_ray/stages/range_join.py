"""Range (interval) join — match each point to every interval containing
it, with NO equality key.

The reference has no joins at all (SURVEY.md §2.5); a range join is one of
the custom operators the project brief names explicitly (as-of join, range
join, windowed aggregate).  Canonical uses: value banding (acctbal ->
rating band), time-range attribution (event ts -> campaign window), IP ->
CIDR-range geolocation.

Two shapes, mirroring ``stages/joins.py``:

* :func:`range_join` — the interval side is SMALL (bands, campaigns,
  config tables).  Intervals ship once into the probe closure; every probe
  batch builds a chunked boolean containment matrix (pure NumPy, no row
  loop).  O(points x intervals) compares per batch, vectorized, with the
  interval axis chunked so scratch memory stays bounded.  No shuffle; the
  point side streams.

* :func:`range_join_bucketed` — BOTH sides large.  Quantize the value
  axis into fixed-width buckets: each point lands in exactly ONE bucket
  (``floor(p/w)``), each interval is flat-mapped to EVERY bucket its span
  covers, then one hash shuffle (``groupby(bucket)``) co-locates them and
  an in-group vectorized containment match emits pairs.  Because a point
  belongs to exactly one bucket, every matching (point, interval) pair is
  produced exactly once — no dedup pass.  Partitioning assumptions
  (documented per the project brief): interval spans are bounded (span/w
  buckets per interval is the fan-out) and no single bucket is hot enough
  to overwhelm one group task; pick ``bucket_width`` near the median span,
  and salt ultra-hot buckets upstream if the value axis is skewed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["range_join", "range_join_bucketed"]


def _interval_arrays(intervals: pa.Table, lo_col: str, hi_col: str,
                     payload: Sequence[str]):
    lo = np.asarray(intervals[lo_col].to_numpy(zero_copy_only=False),
                    dtype=np.float64)
    hi = np.asarray(intervals[hi_col].to_numpy(zero_copy_only=False),
                    dtype=np.float64)
    if np.any(hi < lo):
        raise ValueError("range_join: interval with hi < lo")
    cols = {c: intervals[c] for c in payload}
    return lo, hi, cols


def range_join(ds, intervals: pa.Table, point_col: str,
               lo_col: str = "lo", hi_col: str = "hi",
               payload: Optional[Sequence[str]] = None,
               closed: str = "left", chunk: int = 4096):
    """Broadcast range join: stream ``ds``, matching ``point_col`` into a
    small interval table (``lo_col``/``hi_col`` + ``payload`` columns).

    Emits one output row per (point row, containing interval) — a point in
    k overlapping intervals yields k rows; a point in none yields none
    (inner semantics).  ``closed``: "left" = ``[lo, hi)``, "both" =
    ``[lo, hi]``.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"range_join: unknown closed={closed!r}")
    payload = list(payload or [c for c in intervals.column_names
                               if c not in (lo_col, hi_col)])
    lo, hi, pay = _interval_arrays(intervals, lo_col, hi_col, payload)
    pay_np = {c: a.to_numpy(zero_copy_only=False) for c, a in pay.items()}

    def probe(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch[point_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        rows, ivls = [], []
        # chunk the interval axis: scratch is len(p) x chunk bools, bounded
        for s in range(0, len(lo), chunk):
            e = min(s + chunk, len(lo))
            m = p[:, None] >= lo[None, s:e]
            if closed == "left":
                m &= p[:, None] < hi[None, s:e]
            else:
                m &= p[:, None] <= hi[None, s:e]
            r, c = np.nonzero(m)
            rows.append(r)
            ivls.append(c + s)
        r = np.concatenate(rows) if rows else np.array([], dtype=np.int64)
        c = np.concatenate(ivls) if ivls else np.array([], dtype=np.int64)
        out = {name: batch[name].take(pa.array(r)) for name in batch.column_names}
        for name, arr in pay_np.items():
            out[name] = pa.array(arr[c])
        return pa.table(out)

    return ds.map_batches(probe, batch_format="pyarrow")


def range_join_bucketed(points, intervals, point_col: str,
                        lo_col: str = "lo", hi_col: str = "hi",
                        bucket_width: float = 1.0,
                        point_payload: Optional[Sequence[str]] = None,
                        interval_payload: Optional[Sequence[str]] = None,
                        closed: str = "left"):
    """Big x big range join via value-axis bucketing (one hash shuffle).

    ``points`` and ``intervals`` are both Datasets.  Each point row goes to
    bucket ``floor(point/bucket_width)``; each interval row is replicated
    to every bucket its ``[lo, hi]`` span covers; ``groupby("__bucket")``
    co-locates them; the in-group match is one vectorized containment
    matrix.  Output column set: point payload + interval payload.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"range_join_bucketed: unknown closed={closed!r}")
    w = float(bucket_width)
    if not (w > 0):
        raise ValueError("range_join_bucketed: bucket_width must be > 0")
    ppay = list(point_payload or [])
    ipay = list(interval_payload or [])
    _SIDE, _B = "__rj_side", "__bucket"

    def tag_points(batch: pa.Table) -> pa.Table:
        p = np.asarray(batch[point_col].to_numpy(zero_copy_only=False),
                       dtype=np.float64)
        cols = {
            _B: pa.array(np.floor(p / w).astype(np.int64)),
            _SIDE: pa.array(np.zeros(len(p), dtype=np.int8)),
            point_col: pa.array(p),
            "_lo": pa.nulls(len(p), type=pa.float64()),
            "_hi": pa.nulls(len(p), type=pa.float64()),
        }
        for c in ppay:
            cols[c] = batch[c]
        for c in ipay:
            cols[c] = pa.nulls(len(p), type=intervals.schema().base_schema
                               .field(c).type)
        return pa.table(cols)

    def explode_intervals(batch: pa.Table) -> pa.Table:
        lo = np.asarray(batch[lo_col].to_numpy(zero_copy_only=False),
                        dtype=np.float64)
        hi = np.asarray(batch[hi_col].to_numpy(zero_copy_only=False),
                        dtype=np.float64)
        b0 = np.floor(lo / w).astype(np.int64)
        b1 = np.floor(hi / w).astype(np.int64)  # inclusive end bucket
        reps = (b1 - b0 + 1).clip(min=0)
        idx = np.repeat(np.arange(len(lo)), reps)
        # bucket sequence per interval: b0[i] .. b1[i]
        off = np.arange(reps.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        cols = {
            _B: pa.array(b0[idx] + off),
            _SIDE: pa.array(np.ones(len(idx), dtype=np.int8)),
            point_col: pa.nulls(len(idx), type=pa.float64()),
            "_lo": pa.array(lo[idx]),
            "_hi": pa.array(hi[idx]),
        }
        for c in ppay:
            cols[c] = pa.nulls(len(idx), type=points.schema().base_schema
                               .field(c).type)
        for c in ipay:
            cols[c] = batch[c].take(pa.array(idx))
        return pa.table(cols)

    tagged = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.map_batches(explode_intervals, batch_format="pyarrow"))

    def match(group: pd.DataFrame) -> pd.DataFrame:
        is_i = group[_SIDE].to_numpy() == 1
        pts = group[~is_i]
        ivl = group[is_i]
        out_cols = [point_col] + ppay + ["_lo", "_hi"] + ipay
        if len(pts) == 0 or len(ivl) == 0:
            return pts.iloc[:0].reindex(columns=out_cols)
        p = pts[point_col].to_numpy()
        lo = ivl["_lo"].to_numpy()
        hi = ivl["_hi"].to_numpy()
        m = p[:, None] >= lo[None, :]
        if closed == "left":
            m &= p[:, None] < hi[None, :]
        else:
            m &= p[:, None] <= hi[None, :]
        r, c = np.nonzero(m)
        out = pts.iloc[r][[point_col] + ppay].reset_index(drop=True)
        ivl_sel = ivl.iloc[c][["_lo", "_hi"] + ipay].reset_index(drop=True)
        return pd.concat([out, ivl_sel], axis=1).reindex(columns=out_cols)

    from ..agg import default_partitions

    out = tagged.groupby(_B, num_partitions=default_partitions()).map_groups(
        match, batch_format="pandas")

    def rename(batch: pa.Table) -> pa.Table:
        names = [{"_lo": lo_col, "_hi": hi_col}.get(n, n)
                 for n in batch.column_names]
        return batch.rename_columns(names)

    return out.map_batches(rename, batch_format="pyarrow")

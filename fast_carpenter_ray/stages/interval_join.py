"""Interval-overlap join: pairs of time intervals that intersect.

The temporal analogue of the spatial radius join: neither Ray Data nor
the reference has a native non-equi interval join, so it is composed
from the engine's standard bucket-and-canonicalize pattern:

1. each interval ``[s, e]`` expands to the time buckets it spans
   (``s // w .. e // w``; with ``w`` ~ the max interval length that is
   <= 2 copies per row);
2. ONE ``groupby(bucket)`` co-locates both sides; inside a bucket a
   vectorized cross-pair kernel (chunked like ``SimHashDedup`` to
   bound scratch memory) tests ``s_a <= e_b AND s_b <= e_a``;
3. **canonical-bucket attribution** removes cross-bucket duplicates
   for free: a pair is emitted ONLY by the bucket containing
   ``max(s_a, s_b)``.  Any overlapping pair has its later start inside
   BOTH intervals, so exactly one bucket owns it — no pair-keyed
   dedupe shuffle exists in this operator at all (the hazard
   BASELINE.md lesson 7 measures).

Scale shape: the only shuffle is bucket-keyed over slimmed
``(bucket, id, s, e, side)`` int rows; output rows carry the exact
integer ``overlap_us = min(e_a, e_b) - max(s_a, s_b)``.  Skew: a
bucket's work is |L|x|R| — callers pick ``w`` near the typical
interval length so buckets stay small; hot buckets degrade gracefully
via the chunked kernel (linear memory) and are the caller's signal to
shrink ``w``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["interval_join"]

_PAIR_CHUNK = 1_000_000


def interval_join(left, right=None, start: str = "s", end: str = "e",
                  id_col: str = "id", bucket_width: int = 1_000_000,
                  num_partitions: Optional[int] = None,
                  side_col: Optional[str] = None):
    """Dataset of ``(id_a, id_b, overlap_us)`` — every pair of a left
    and a right interval with ``s_a <= e_b AND s_b <= e_a`` (closed
    ends; touching intervals overlap with ``overlap_us == 0``).

    Two input forms:

    * ``left`` + ``right``: two Datasets with int64 ``id_col``,
      ``start``, ``end`` columns (``start <= end`` per row).
    * ``left`` + ``side_col`` (``right=None``): ONE Dataset carrying
      both sides, ``side_col`` 0 = left / 1 = right — saves a second
      read+map pass when both sides derive from the same stream.
    """
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("interval_join: bucket_width must be positive")
    if (right is None) == (side_col is None):
        raise ValueError("interval_join: pass exactly one of right/side_col")

    def expand(side_flag: Optional[int]):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            s = batch[start].to_numpy(zero_copy_only=False).astype(np.int64)
            e = batch[end].to_numpy(zero_copy_only=False).astype(np.int64)
            if side_flag is None:
                side = batch[side_col].to_numpy(
                    zero_copy_only=False).astype(np.int8)
            else:
                side = np.full(len(ids), side_flag, dtype=np.int8)
            b0 = s // w
            b1 = e // w
            reps = (b1 - b0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(ids)), reps)
            # bucket = b0[i] + offset within each row's span
            offs = np.arange(reps.sum(), dtype=np.int64) - np.repeat(
                np.concatenate([[0], np.cumsum(reps)[:-1]]), reps)
            return pa.table({
                "bucket": pa.array(b0[idx] + offs, type=pa.int64()),
                "iv_id": pa.array(ids[idx], type=pa.int64()),
                "s": pa.array(s[idx], type=pa.int64()),
                "e": pa.array(e[idx], type=pa.int64()),
                "side": pa.array(side[idx]),
            })
        return fn

    if side_col is not None:
        rows = left.map_batches(expand(None), batch_format="pyarrow")
    else:
        rows = left.map_batches(expand(0), batch_format="pyarrow").union(
            right.map_batches(expand(1), batch_format="pyarrow"))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["bucket"].iloc[0])
        la = g[g["side"] == 0]
        rb = g[g["side"] == 1]
        empty = pd.DataFrame({
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "overlap_us": pd.Series([], dtype="int64"),
        })
        if len(la) == 0 or len(rb) == 0:
            return empty
        sa = la["s"].to_numpy()
        ea = la["e"].to_numpy()
        ia = la["iv_id"].to_numpy()
        sb = rb["s"].to_numpy()
        eb = rb["e"].to_numpy()
        ib = rb["iv_id"].to_numpy()
        out_a, out_b, out_o = [], [], []
        # chunk the left axis so the |L|x|R| scratch stays bounded
        step = max(1, _PAIR_CHUNK // max(1, len(rb)))
        for i0 in range(0, len(la), step):
            A = slice(i0, i0 + step)
            saa, eaa = sa[A][:, None], ea[A][:, None]
            later = np.maximum(saa, sb[None, :])
            hit = ((saa <= eb[None, :]) & (sb[None, :] <= eaa)
                   & (later // w == bucket))   # canonical bucket owns it
            ai, bi = np.nonzero(hit)
            out_a.append(ia[A][ai])
            out_b.append(ib[bi])
            out_o.append(np.minimum(eaa[ai, 0], eb[bi]) - later[ai, bi])
        if not out_a:
            return empty
        return pd.DataFrame({
            "id_a": np.concatenate(out_a).astype(np.int64),
            "id_b": np.concatenate(out_b).astype(np.int64),
            "overlap_us": np.concatenate(out_o).astype(np.int64),
        })

    return rows.groupby("bucket", num_partitions=num_partitions).map_groups(
        bucket_pairs, batch_format="pandas")

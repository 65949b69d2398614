"""2-D Pareto skyline: rows not dominated on a pair of maximize-columns.

``a`` dominates ``b`` iff ``a.x >= b.x and a.y >= b.y`` and at least one
is strict; equal points do not dominate each other (duplicated optima all
survive — the SQL NOT EXISTS oracle agrees).

Scale shape: the skyline operator is algebraic —
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` — so each batch
shrinks to its LOCAL skyline (vectorized sort + running max, no row
loop), the tiny local skylines union on the driver (budget-guarded), and
one final local pass finishes.  The stream is never shuffled; for random
data a local skyline is O(log n) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["skyline"]


def _local_skyline(df: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Vectorized 2-D skyline of one frame (maximize both columns)."""
    if df.empty:
        return df
    s = df.sort_values([x, y], ascending=False, kind="stable")
    xv = s[x].to_numpy()
    yv = s[y].to_numpy()
    # per-x-group max y, and the running max of y over STRICTLY greater x
    grp_max = pd.Series(yv).groupby(pd.Series(xv), sort=False).transform("max").to_numpy()
    new_x = np.concatenate(([True], xv[1:] != xv[:-1]))
    # cummax of grp_max at each new-x boundary, shifted one group back
    boundary_max = np.maximum.accumulate(np.where(new_x, grp_max, -np.inf))
    prev_sentinel = np.int64(np.iinfo(np.int64).min)
    prev = np.concatenate(([prev_sentinel], boundary_max[:-1]))
    # broadcast "previous strictly-greater-x running max" across x groups
    prev_group = pd.Series(np.where(new_x, prev, prev_sentinel)).groupby(
        pd.Series(xv), sort=False).transform("max").to_numpy()
    survive = (yv == grp_max) & (yv > prev_group)
    return s[survive]


def skyline(ds, x: str, y: str, keep=None, max_driver_rows: int = 5_000_000):
    """Global skyline; returns a pandas frame of the surviving rows
    (``keep`` columns + the two criteria), sorted by ``(x desc, y desc,
    keep...)``."""
    keep = list(keep or [])
    cols = keep + [x, y]

    def local(batch: pa.Table) -> pa.Table:
        df = batch.select(cols).to_pandas()
        return pa.Table.from_pandas(_local_skyline(df, x, y),
                                    preserve_index=False)

    parts = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    if len(parts) > max_driver_rows:
        raise ValueError(
            f"skyline: {len(parts)} local-skyline rows exceed the driver "
            f"budget — pathologically anti-correlated data")
    if parts.empty or x not in parts.columns:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64) for c in cols})
    out = _local_skyline(parts, x, y)
    return (out.sort_values([x, y, *keep], ascending=[False, False]
                            + [True] * len(keep))
            .reset_index(drop=True))

"""Space-time cube and density-outlier detection over the cell grid.

* :func:`spacetime_cube` — per (cell, time-bucket) counts and weight
  sums: the movement-analytics primitive behind "activity per tile per
  day" dashboards.  The key space is cells × time and grows with the
  data, so the combine defaults to ``mode="hash"`` (distributed; never a
  driver merge); pass ``mode="tree"`` only for bounded studies.
* :func:`outlier_cells` — cells whose count is at least ``factor`` times
  the EXACT median per-cell count.  Median uses the engine's established
  exact-quantile definition (smallest v with cumulative count >=
  ceil(q*n), ``stages/quantile.py``) so the result is integer-exact
  against a SQL window oracle — no float stddev involved.

Reference analogue: none (SURVEY §2.5 north-star extensions alongside
``hotspot_cells``).  Both shrink the point stream to per-block partials
before anything wide happens.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["spacetime_cube", "outlier_cells"]

DAY_US = 86_400_000_000


def spacetime_cube(ds, cell: str = "cell", ts: str = "warc_ts",
                   bucket_us: int = DAY_US, weight: str | None = None,
                   mode: str = "hash"):
    """Per (cell, bucket) rollup: ``cell, bucket, n[, sum_w]`` rows.

    ``bucket`` is the floor-divided epoch-microsecond index (day by
    default) — integer arithmetic, bit-exact against SQL ``//``.  Rows
    with ``cell < 0`` (missing geo) are dropped.
    """
    from ..agg import combine_partials

    value_cols = ["n"] + (["sum_w"] if weight else [])

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        t = batch[ts].to_numpy(zero_copy_only=False)
        if np.issubdtype(t.dtype, np.datetime64):
            t = t.astype("datetime64[us]").astype(np.int64)
        else:
            t = t.astype(np.int64)
        keep = c >= 0
        df = pd.DataFrame({cell: c[keep], "bucket": t[keep] // bucket_us})
        if weight:
            df["w"] = batch[weight].to_numpy(zero_copy_only=False)[keep]
            out = (df.groupby([cell, "bucket"], sort=False)
                   .agg(n=("w", "size"), sum_w=("w", "sum")).reset_index())
        else:
            out = (df.groupby([cell, "bucket"], sort=False).size()
                   .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return combine_partials(ds.map_batches(partial, batch_format="pyarrow"),
                            keys=[cell, "bucket"], value_cols=value_cols,
                            mode=mode)


def outlier_cells(ds, cell: str = "cell", factor: int = 3,
                  q: float = 0.5):
    """Cells with ``n >= factor * exact-quantile(per-cell counts, q)``.

    The per-cell count table is summary-sized (bounded by the cell
    space), so it tree-combines and the quantile + threshold run on the
    driver — zero shuffles.  Returns ``cell, n`` sorted by cell.
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        u, n = np.unique(c[c >= 0], return_counts=True)
        return pa.table({cell: pa.array(u),
                         "n": pa.array(n.astype(np.int64))})

    counts = combine_partials(ds.map_batches(partial, batch_format="pyarrow"),
                              keys=[cell], value_cols=["n"],
                              mode="tree").to_pandas()
    if not len(counts):
        return counts
    v = np.sort(counts["n"].to_numpy(dtype=np.int64))
    med = int(v[int(math.ceil(q * len(v))) - 1])
    out = counts[counts["n"] >= factor * med].copy()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(cell).reset_index(drop=True)

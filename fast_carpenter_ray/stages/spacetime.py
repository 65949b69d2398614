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

__all__ = ["spacetime_cube", "outlier_cells", "time_autocorr"]

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


def time_autocorr(ds, ts: str = "ts", bucket_us: int = 86_400_000_000,
                  lag: int = 1, mode: str = "tree") -> "pd.DataFrame":
    """Lag-``lag`` temporal autocorrelation of the event-count series.

    The stream shrinks per batch to ``(tb, n)`` partials
    (``tb = t // bucket_us``); one summary-sized combine; the driver
    densifies the bucket range [min_tb, max_tb] WITH ZEROS (an empty
    bucket is a real observation of the series) and computes the
    Pearson correlation between ``c[:-lag]`` and ``c[lag:]`` from six
    exact int64 moments in the grouped_corr closed form — so a SQL
    oracle (generate_series + lag window + identical float expression)
    matches bit-for-bit.  Returns ONE row
    ``(n_pairs, sx, sy, sxx, syy, sxy, corr)``; corr is NaN when either
    side has zero variance or there are no pairs.
    """
    import pandas as pd

    from ..agg import combine_partials

    if lag < 1:
        raise ValueError("time_autocorr: lag must be >= 1")
    w = int(bucket_us)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch[ts].cast(pa.int64()).to_numpy(zero_copy_only=False)
        tb, counts = np.unique(t // w, return_counts=True)
        return pa.table({
            "tb": pa.array(tb, type=pa.int64()),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
        })

    got = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["tb"], value_cols=["n"], mode=mode).to_pandas()

    def row(n_pairs, sx, sy, sxx, syy, sxy):
        num = n_pairs * sxy - sx * sy
        dx = n_pairs * sxx - sx * sx
        dy = n_pairs * syy - sy * sy
        corr = (float(num) / (np.sqrt(float(dx)) * np.sqrt(float(dy)))
                if n_pairs > 0 and dx > 0 and dy > 0 else np.nan)
        return pd.DataFrame({
            "n_pairs": pd.Series([n_pairs], dtype="int64"),
            "sx": pd.Series([sx], dtype="int64"),
            "sy": pd.Series([sy], dtype="int64"),
            "sxx": pd.Series([sxx], dtype="int64"),
            "syy": pd.Series([syy], dtype="int64"),
            "sxy": pd.Series([sxy], dtype="int64"),
            "corr": pd.Series([corr], dtype="float64"),
        })

    if len(got) == 0:
        return row(0, 0, 0, 0, 0, 0)
    tb = got["tb"].to_numpy()
    lo, hi = int(tb.min()), int(tb.max())
    c = np.zeros(hi - lo + 1, dtype=np.int64)
    c[tb - lo] = got["n"].to_numpy()
    if len(c) <= lag:
        return row(0, 0, 0, 0, 0, 0)
    x, y = c[:-lag], c[lag:]
    return row(len(x), int(x.sum()), int(y.sum()),
               int((x * x).sum()), int((y * y).sum()),
               int((x * y).sum()))

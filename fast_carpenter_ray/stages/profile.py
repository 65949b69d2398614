"""Dataset profiling: per-column summary statistics in one pass.

Corpus-curation pipelines start with a profile (row counts, null rates,
value ranges) before any transform choice; at 100 TB this must be one
streaming pass, not a ``describe()`` on a driver-side pandas frame.

Shape: per-batch partials (one TINY row per column per block: n, nulls,
min, max, sum) -> tree combine (key space == column list, summary-sized by
construction, so the driver merge is exact and bounded).  All statistics
are algebraic (merge by min/max/sum), so partials compose exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["profile_columns"]


def profile_columns(ds, cols: Optional[Sequence[str]] = None):
    """Profile numeric columns: returns one row per column with
    ``column, n, n_null, min, max, sum`` (min/max/sum over non-null
    values; NaN counts as null).  Non-numeric columns are rejected —
    profile them via ``distinct``/``vocab_count`` instead.
    """
    schema = ds.schema().base_schema
    cols = list(cols or schema.names)
    for c in cols:
        t = schema.field(c).type
        if not (pa.types.is_integer(t) or pa.types.is_floating(t)):
            raise ValueError(f"profile_columns: column {c!r} is {t}, not numeric")
    if cols != list(dict.fromkeys(cols)):
        raise ValueError("profile_columns: duplicate columns")
    ds = ds.select_columns(cols)

    def partial(batch: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            arr = batch[c]
            v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
            ok = ~np.isnan(v)
            nn = int(ok.sum())
            rows.append({
                "column": c,
                "n": len(v),
                "n_null": len(v) - nn,
                "min": float(v[ok].min()) if nn else np.nan,
                "max": float(v[ok].max()) if nn else np.nan,
                "sum": float(v[ok].sum()) if nn else 0.0,
            })
        out = pd.DataFrame(rows)
        out["n"] = out["n"].astype(np.int64)
        out["n_null"] = out["n_null"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    import ray.data as rd

    local = parts.to_pandas()  # bounded: #blocks x #cols tiny rows
    final = (local.groupby("column", sort=True)
             .agg(n=("n", "sum"), n_null=("n_null", "sum"),
                  min=("min", "min"), max=("max", "max"),
                  sum=("sum", "sum"))
             .reset_index())
    final["n"] = final["n"].astype(np.int64)
    final["n_null"] = final["n_null"].astype(np.int64)
    return rd.from_pandas(final)

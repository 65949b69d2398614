"""Knox space-time interaction statistic over the cell grid.

The classic epidemiology test (Knox 1964, public literature): count
event PAIRS that are close in BOTH space (Chebyshev-1 cell adjacency;
x rows clamp like latitude, y columns wrap like longitude) and time
(``|dt| <= tau_us``).  An excess over chance indicates space-time
clustering (outbreaks, coordinated activity).

Scale shape — no pair-keyed shuffle, no all-pairs scan:

* each event emits ONE "home" row at its own ``(cell, tb)``
  (``tb = t // tau_us``) and 18 "probe" rows covering its 9-cell ring
  x two time buckets ``{tb, tb+1}``;
* ONE groupby over ``(cell, tb)`` co-locates candidates.  For a pair
  with ``0 <= t_h - t_p <= tau``, the LATER event's home bucket is
  reached by the earlier event's probes exactly once (bucket width =
  tau means the bucket delta is 0 or 1) — so counting in-group
  (home, probe) pairs with the strict ``(t, id)`` order and the exact
  time filter counts every qualifying unordered pair EXACTLY once:
  canonical attribution again, no dedupe anywhere;
* per-group counts shrink to one int row each; a tree sum finishes.

The in-group kernel is a chunked vectorized cross filter (bounded
scratch, like ``interval_join``).  Result: ONE row
``(st_pairs, n_events)`` of exact int64 — SQL-oracle reproducible by a
brute range self-join.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["knox_pairs"]

_CHUNK = 1_000_000


def knox_pairs(ds, tau_us: int, n_grid: int = 8, key_cols=None,
               ts: str = "ts", id_col: str = "event_id",
               cell: str = "cell",
               num_partitions: Optional[int] = None) -> pd.DataFrame:
    """ONE-ROW pandas frame ``(st_pairs, n_events)``: the Knox count of
    event pairs adjacent on the ``n_grid`` x ``n_grid`` cell grid
    (x clamps, y wraps) with time gap ``<= tau_us``.  ``cell`` must be
    ``xc * n_grid + yc``."""
    if tau_us <= 0:
        raise ValueError("knox_pairs: tau_us must be positive")
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)
    tau = int(tau_us)
    g = int(n_grid)
    ts_c, id_c, cell_c = ts, id_col, cell

    def expand(batch: pa.Table) -> pa.Table:
        t = batch[ts_c].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = batch[id_c].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cells = batch[cell_c].to_numpy(zero_copy_only=False).astype(np.int64)
        tb = t // tau
        xc, yc = cells // g, cells % g
        out_cell, out_tb, out_t, out_id, out_home = [], [], [], [], []
        # home row
        out_cell.append(cells)
        out_tb.append(tb)
        out_t.append(t)
        out_id.append(ids)
        out_home.append(np.ones(len(t), dtype=np.int8))
        # probe rows: 9-cell ring x {tb, tb+1}
        for dx in (-1, 0, 1):
            nx = xc + dx
            valid = (nx >= 0) & (nx < g)        # x clamps (lat-like)
            for dy in (-1, 0, 1):
                ny = (yc[valid] + dy) % g       # y wraps (lng-like)
                pc = nx[valid] * g + ny
                for dtb in (0, 1):
                    out_cell.append(pc)
                    out_tb.append(tb[valid] + dtb)
                    out_t.append(t[valid])
                    out_id.append(ids[valid])
                    out_home.append(np.zeros(int(valid.sum()),
                                             dtype=np.int8))
        cat = np.concatenate
        return pa.table({
            "cell": pa.array(cat(out_cell), type=pa.int64()),
            "tb": pa.array(cat(out_tb), type=pa.int64()),
            "t": pa.array(cat(out_t), type=pa.int64()),
            "eid": pa.array(cat(out_id), type=pa.int64()),
            "home": pa.array(cat(out_home)),
        })

    # grouping directly on (cell, tb) spawns one tiny task per occupied
    # space-time bucket (tens of thousands); instead hash the key into a
    # BOUNDED bucket space (<= 8 x partitions groups, the
    # dedup_pair_stream pattern) and pair all of a task's sub-buckets
    # with ONE vectorized pandas merge
    n_buckets = max(64, int(num_partitions) * 8)

    def add_bucket(b: pa.Table) -> pa.Table:
        h = (b["cell"].to_numpy(zero_copy_only=False) * 1000003
             + b["tb"].to_numpy(zero_copy_only=False)) % n_buckets
        return b.append_column("_bkt", pa.array(h, type=pa.int64()))

    def bucket_count(grp: pd.DataFrame) -> pd.DataFrame:
        h = grp[grp["home"] == 1]
        p = grp[grp["home"] == 0]
        if len(h) == 0 or len(p) == 0:
            return pd.DataFrame({"c": pd.Series([0], dtype="int64")})
        total = 0
        # chunk the home side so the merge's pair materialization is
        # bounded regardless of hot buckets
        step = max(1, _CHUNK // max(1, int(len(p) / max(1, grp["cell"]
                                                        .nunique()))))
        for i0 in range(0, len(h), step):
            m = h.iloc[i0:i0 + step].merge(
                p, on=["cell", "tb"], suffixes=("_h", "_p"))
            if len(m) == 0:
                continue
            dt = m["t_h"].to_numpy() - m["t_p"].to_numpy()
            later = (dt > 0) | ((dt == 0)
                                & (m["eid_h"].to_numpy()
                                   > m["eid_p"].to_numpy()))
            total += int((later & (dt <= tau)).sum())
        return pd.DataFrame({"c": pd.Series([total], dtype="int64")})

    rows = ds.map_batches(expand, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pyarrow")
    counts = rows.groupby("_bkt", num_partitions=num_partitions).map_groups(
        bucket_count, batch_format="pandas")
    st_pairs = int(counts.to_pandas()["c"].sum())
    n_events = int(ds.count())
    return pd.DataFrame({
        "st_pairs": pd.Series([st_pairs], dtype="int64"),
        "n_events": pd.Series([n_events], dtype="int64"),
    })

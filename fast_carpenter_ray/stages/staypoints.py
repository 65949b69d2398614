"""Stay-point detection: maximal runs of consecutive events in the
same cell.

The trajectory-mining primitive (stay/dwell segmentation — Li et al.
2008 stay-point literature) in its grid form: per entity, events are
ordered by ``(ts, id)`` and every maximal run of >= ``min_events``
consecutive events in the SAME cell becomes one stay row with its
span and event count.

Scale shape: per batch the stream slims to ``(key, id, t, cell)`` int
rows; ONE key-keyed shuffle; per group the run segmentation is the
vectorized gaps-and-islands trick (``run_id = cumsum(cell != lag)``)
— no per-row Python.  Output is bounded by the run count.  The SQL
oracle uses the same islands construction with window functions.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["stay_points"]


def stay_points(ds, min_events: int = 3, key: str = "user_id",
                ts: str = "ts", id_col: str = "event_id",
                cell: str = "cell",
                num_partitions: Optional[int] = None):
    """Dataset of ``(key, cell, start_id, end_id, start_us, end_us,
    n_events, span_us)`` — one row per maximal same-cell run with at
    least ``min_events`` events."""
    if min_events < 1:
        raise ValueError("stay_points: min_events must be >= 1")
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)
    key_c, ts_c, id_c, cell_c = key, ts, id_col, cell
    k = int(min_events)

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_c: batch[key_c],
            id_c: batch[id_c].cast(pa.int64()),
            "t": batch[ts_c].cast(pa.int64()),
            "cell": batch[cell_c].cast(pa.int64()),
        })

    def runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", id_c], kind="stable")
        c = g["cell"].to_numpy()
        t = g["t"].to_numpy()
        ids = g[id_c].to_numpy()
        new_run = np.ones(len(c), dtype=bool)
        new_run[1:] = c[1:] != c[:-1]
        run_id = np.cumsum(new_run) - 1
        starts = np.nonzero(new_run)[0]
        ends = np.concatenate([starts[1:] - 1, [len(c) - 1]])
        n = ends - starts + 1
        keep = n >= k
        s, e = starts[keep], ends[keep]
        return pd.DataFrame({
            key_c: g[key_c].to_numpy()[s],
            "cell": pd.Series(c[s], dtype="int64"),
            "start_id": pd.Series(ids[s], dtype="int64"),
            "end_id": pd.Series(ids[e], dtype="int64"),
            "start_us": pd.Series(t[s], dtype="int64"),
            "end_us": pd.Series(t[e], dtype="int64"),
            "n_events": pd.Series(n[keep], dtype="int64"),
            "span_us": pd.Series(t[e] - t[s], dtype="int64"),
        })

    rows = ds.map_batches(slim, batch_format="pyarrow")
    return rows.groupby(key_c, num_partitions=num_partitions).map_groups(
        runs, batch_format="pandas")

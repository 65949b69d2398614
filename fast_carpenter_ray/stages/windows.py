"""Windowed aggregates over event streams: tumbling and session windows.

Tumbling windows are pure arithmetic on the timestamp (``ts // width``)
and live as a partial-aggregate + hash combine (``pipelines/queries.py
q_window_agg``).  SESSION windows (gap-based: a new session starts when
the idle gap to the previous event exceeds ``gap``) cannot be keyed by
arithmetic — session membership depends on the key's full sorted event
sequence — so they are the canonical "stateful window" custom operator:

1. ONE hash shuffle co-locates each key's events (``groupby(key)``);
2. per-group vectorized sessionization: sort by time, ``diff > gap``
   marks session starts, ``cumsum`` assigns session ids, one pandas
   groupby aggregates per session — no Python row loop.

Partitioning assumption (documented per the project brief): one key's
events fit in one group task (same entity-key argument as asof_join.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["session_windows"]


def session_windows(ds, key: str = "user_id", ts: str = "ts",
                    gap_us: int = 3_600_000_000,
                    value: Optional[str] = "value"):
    """Per-key gap-based sessions.

    Returns one row per (key, session): ``session_start`` (int64
    microseconds), ``n`` events, and ``sum_<value>`` when ``value`` is
    given.  ``ts`` may be a timestamp (cast to int64 us) or an integer
    column.
    """
    val_col = f"sum_{value}" if value else None

    def to_us(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        cols = {key: batch[key], "_t": t}
        if value:
            cols["_v"] = batch[value]
        return pa.table(cols)

    slim = ds.map_batches(to_us, batch_format="pyarrow")

    def sessionize(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("_t", kind="stable")
        t = g["_t"].to_numpy()
        new = np.ones(len(t), dtype=np.int64)
        if len(t) > 1:
            new[1:] = (np.diff(t) > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        agg = {"session_start": ("_t", "min"), "n": ("_t", "size")}
        frame = pd.DataFrame({key: g[key].to_numpy(), "_t": t, "_sid": sid})
        if value:
            frame["_v"] = g["_v"].to_numpy()
            agg[val_col] = ("_v", "sum")
        out = (frame.groupby([key, "_sid"], sort=True)
               .agg(**agg).reset_index().drop(columns="_sid"))
        out["n"] = out["n"].astype(np.int64)
        return out

    return slim.groupby(key).map_groups(sessionize, batch_format="pandas")

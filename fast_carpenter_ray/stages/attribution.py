"""Last-touch conversion attribution within a lookback window.

The standard web-analytics join: every conversion event is credited to
the entity's MOST RECENT source event that happened no more than
``lookback_us`` earlier.  "Most recent" is defined on the total order
``(ts, event_id)`` — a source strictly earlier in that order wins, so
tied timestamps are deterministic.

Scale shape: the stream shrinks per batch to
``(key, id, t, kind)`` int rows (kind: 1 = source, 2 = conversion,
membership evaluated BEFORE the shuffle); ONE key-keyed shuffle; per
group the match is a vectorized running-maximum scan (no per-row
Python, no self-join — the SQL oracle's O(conversions x sources) join
is the thing this operator avoids at scale).  Output is bounded by the
conversion count.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["last_touch_attribution"]


def last_touch_attribution(ds, source_types: Sequence[str],
                           conversion_types: Sequence[str],
                           lookback_us: int,
                           key: str = "user_id", ts: str = "ts",
                           id_col: str = "event_id",
                           type_col: str = "event_type",
                           num_partitions: Optional[int] = None):
    """Dataset of ``(key, conv_id, conv_us, src_id, src_us, gap_us)`` —
    one row per conversion that has a qualifying source; conversions
    with no source inside the lookback emit nothing.  An event may be
    both source and conversion type only if the two sets are disjoint
    (enforced)."""
    if set(source_types) & set(conversion_types):
        raise ValueError("last_touch_attribution: source and conversion "
                         "types must be disjoint")
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)
    src = list(source_types)
    conv = list(conversion_types)
    look = int(lookback_us)
    key_c, ts_c, id_c, ty_c = key, ts, id_col, type_col

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts_c].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ty = batch[ty_c].to_pandas()
        kind = np.zeros(len(t), dtype=np.int8)
        kind[ty.isin(src).to_numpy()] = 1
        kind[ty.isin(conv).to_numpy()] = 2
        keep = kind > 0
        return pa.table({
            key_c: batch[key_c].filter(pa.array(keep)),
            id_c: batch[id_c].cast(pa.int64()).filter(pa.array(keep)),
            "t": pa.array(t[keep], type=pa.int64()),
            "kind": pa.array(kind[keep]),
        })

    def match(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", id_c], kind="stable")
        t = g["t"].to_numpy()
        ids = g[id_c].to_numpy()
        kind = g["kind"].to_numpy()
        idx = np.arange(len(g))
        # last source position at-or-before each row in the total order,
        # then shifted so a conversion only sees STRICTLY earlier rows
        src_pos = np.where(kind == 1, idx, -1)
        last_at = np.maximum.accumulate(src_pos)
        last_before = np.empty_like(last_at)
        last_before[0] = -1
        last_before[1:] = last_at[:-1]
        ci = idx[kind == 2]
        si = last_before[ci]
        ok = si >= 0
        ci, si = ci[ok], si[ok]
        gap = t[ci] - t[si]
        ok2 = gap <= look
        ci, si, gap = ci[ok2], si[ok2], gap[ok2]
        return pd.DataFrame({
            key_c: g[key_c].to_numpy()[ci],
            "conv_id": pd.Series(ids[ci], dtype="int64"),
            "conv_us": pd.Series(t[ci], dtype="int64"),
            "src_id": pd.Series(ids[si], dtype="int64"),
            "src_us": pd.Series(t[si], dtype="int64"),
            "gap_us": pd.Series(gap, dtype="int64"),
        })

    rows = ds.map_batches(slim, batch_format="pyarrow")
    return rows.groupby(key_c, num_partitions=num_partitions).map_groups(
        match, batch_format="pandas")

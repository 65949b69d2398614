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

__all__ = ["session_windows", "session_windows_bucketed", "hop_windows", "funnel"]


def hop_windows(ds, ts: str = "ts", width_us: int = 3_600_000_000,
                slide_us: int = 900_000_000,
                value: Optional[str] = "value", mode: str = "hash"):
    """Hopping (sliding) window aggregate: window ``w`` covers
    ``[w*slide, w*slide + width)``; every event lands in
    ``width/slide`` overlapping windows.

    Shape: per-batch vectorized window expansion (``np.repeat`` — each
    event's window ids are ``(t-width)//slide + 1 .. t//slide``) fused
    with a per-batch partial aggregate, then ONE hash combine keyed on the
    window id.  The window key space grows with the data's time span, so
    the default combine is ``mode="hash"`` (never a driver merge);
    ``mode="tree"`` is allowed for short spans.  Returns
    ``win, window_start, n, sum_<value>``.
    """
    if width_us <= 0 or slide_us <= 0 or width_us % slide_us:
        raise ValueError("hop_windows: width_us must be a positive "
                         "multiple of slide_us")
    from ..agg import combine_partials

    val_col = f"sum_{value}" if value else None

    def expand(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        t = t.to_numpy(zero_copy_only=False).astype(np.int64)
        hi = t // slide_us                      # numpy floor division ==
        lo = (t - width_us) // slide_us + 1     # DuckDB // on any sign
        reps = hi - lo + 1
        idx = np.repeat(np.arange(len(t)), reps)
        off = np.arange(reps.sum()) - np.repeat(
            np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
        win = lo[idx] + off
        frame = pd.DataFrame({"win": win})
        agg = {"n": ("win", "size")}
        if value:
            frame["_v"] = batch[value].to_numpy(zero_copy_only=False)[idx]
            agg[val_col] = ("_v", "sum")
        out = frame.groupby("win", sort=False).agg(**agg).reset_index()
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(expand, batch_format="pyarrow")
    vcols = ["n"] + ([val_col] if value else [])
    combined = combine_partials(parts, keys=["win"], value_cols=vcols,
                                mode=mode)

    def finish(batch: pa.Table) -> pa.Table:
        win = batch["win"].to_numpy(zero_copy_only=False)
        return batch.append_column("window_start", pa.array(win * slide_us))

    return combined.map_batches(finish, batch_format="pyarrow")


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

    from ..agg import default_partitions

    return slim.groupby(key, num_partitions=default_partitions()).map_groups(
        sessionize, batch_format="pandas")


def session_windows_bucketed(ds, key: str = "user_id", ts: str = "ts",
                             gap_us: int = 3_600_000_000,
                             value: Optional[str] = "value",
                             bucket_width: Optional[int] = None):
    """Hot-key-safe session windows: no task ever holds one key's full
    event sequence.

    1. ``groupby(key, ts // bucket_width)``: local sessionization inside
       each time bucket -> SESSION SUMMARY rows (start, end, n, sum);
    2. ``groupby(key)`` over the summaries (span/width + sessions rows per
       key, independent of event count): sort by start, re-check every
       boundary (``start - prev_end > gap``), ``cumsum`` merge — sessions
       split at bucket edges fuse back exactly.

    Identical output to :func:`session_windows` (pytest pins equality).
    ``bucket_width`` defaults to ``16 * gap_us``.
    """
    w = int(bucket_width if bucket_width is not None else 16 * gap_us)
    if w <= 0:
        raise ValueError("session_windows_bucketed: bucket_width must be > 0")
    val_col = f"sum_{value}" if value else None
    _B = "__sw_bucket"

    def to_us(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        tv = t.to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {key: batch[key], _B: pa.array(tv // w), "_t": pa.array(tv)}
        if value:
            cols["_v"] = batch[value]
        return pa.table(cols)

    slim = ds.map_batches(to_us, batch_format="pyarrow")

    def local_sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("_t", kind="stable")
        t = g["_t"].to_numpy()
        new = np.ones(len(t), dtype=np.int64)
        if len(t) > 1:
            new[1:] = (np.diff(t) > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        frame = pd.DataFrame({key: g[key].to_numpy(), "_t": t, "_sid": sid})
        agg = {"_start": ("_t", "min"), "_end": ("_t", "max"),
               "n": ("_t", "size")}
        if value:
            frame["_v"] = g["_v"].to_numpy()
            agg["_sumv"] = ("_v", "sum")
        out = (frame.groupby([key, "_sid"], sort=True)
               .agg(**agg).reset_index().drop(columns="_sid"))
        out["n"] = out["n"].astype(np.int64)
        return out

    from ..agg import default_partitions

    np_ = default_partitions()
    partial = slim.groupby([key, _B], num_partitions=np_).map_groups(
        local_sessions, batch_format="pandas")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("_start", kind="stable")
        start = g["_start"].to_numpy()
        end = g["_end"].to_numpy()
        new = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new[1:] = (start[1:] - end[:-1] > gap_us).astype(np.int64)
        sid = np.cumsum(new)
        frame = pd.DataFrame({key: g[key].to_numpy(), "_sid": sid,
                              "_start": start, "n": g["n"].to_numpy()})
        agg = {"session_start": ("_start", "min"), "n": ("n", "sum")}
        if value:
            frame["_sumv"] = g["_sumv"].to_numpy()
            agg[val_col] = ("_sumv", "sum")
        out = (frame.groupby([key, "_sid"], sort=True)
               .agg(**agg).reset_index().drop(columns="_sid"))
        out["n"] = out["n"].astype(np.int64)
        return out

    return partial.groupby(key, num_partitions=np_).map_groups(
        merge, batch_format="pandas")


def funnel(ds, steps, key: str = "user_id", ts: str = "ts",
           type_col: str = "event_type"):
    """Ordered funnel analysis: how many keys completed each prefix of
    ``steps`` IN ORDER (step i+1 strictly after the earliest qualifying
    step i — the standard product-analytics funnel).

    One hash shuffle co-locates each key's (type, time) pairs — slimmed
    per batch to the relevant steps only — then a vectorized per-key
    sequential min-search assigns the deepest completed prefix; a tiny
    driver reduction turns depth counts into the cumulative funnel table
    ``(step, step_name, n_keys)``.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel: need at least 2 steps")
    _S = "__funnel_step"

    step_idx = {s: i for i, s in enumerate(steps)}

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        types = batch[type_col].to_pandas()
        si = types.map(step_idx).to_numpy(na_value=-1, dtype=np.int64)
        keep = si >= 0
        return pa.table({
            key: batch[key].filter(pa.array(keep)),
            _S: pa.array(si[keep]),
            "_t": t.filter(pa.array(keep)),
        })

    slimmed = ds.map_batches(slim, batch_format="pyarrow")

    def depth(group: pd.DataFrame) -> pd.DataFrame:
        t = group["_t"].to_numpy()
        s = group[_S].to_numpy()
        reached = -1
        cutoff = -np.inf
        for i in range(len(steps)):
            mask = (s == i) & (t > cutoff)
            if not mask.any():
                break
            cutoff = t[mask].min()
            reached = i
        return pd.DataFrame({key: [group[key].iloc[0]],
                             "_depth": np.array([reached], dtype=np.int64)})

    from ..agg import combine_partials, default_partitions

    depths = slimmed.groupby(key, num_partitions=default_partitions()).map_groups(
        depth, batch_format="pandas")

    # depth histogram DISTRIBUTIVELY (key count scales with the data; one
    # row per key must never land on the driver) — the depth domain is
    # len(steps)+1 values, a summary-sized tree combine
    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        out = (batch.groupby("_depth", sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = depths.map_batches(hist, batch_format="pandas")
    local = combine_partials(parts, keys=["_depth"], value_cols=["n"],
                             mode="tree").to_pandas()
    counts = dict(zip(local["_depth"].astype(np.int64),
                      local["n"].astype(np.int64)))
    # cumulative funnel: keys reaching step i = depth >= i
    return pd.DataFrame({
        "step": np.arange(len(steps), dtype=np.int64),
        "step_name": steps,
        "n_keys": np.array(
            [sum(v for d, v in counts.items() if d >= i)
             for i in range(len(steps))], dtype=np.int64),
    })

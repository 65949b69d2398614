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

__all__ = ["session_windows", "session_windows_bucketed", "hop_windows", "ewma",
           "funnel", "window_funcs", "window_funcs_bucketed", "transitions",
           "cusum_changepoints", "rolling_median_counts"]


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


def window_funcs(ds, key: str = "user_id", ts: str = "ts",
                 id_col: str = "event_id", value: str = "value",
                 scale: int = 64):
    """Per-key ordered window functions — the running/cumulative analytics
    leg (``row_number`` / running ``sum`` / ``lag`` gap) the reference's
    per-event Define stages cannot express (they are stateless per row;
    cf. ``fast_carpenter/define/variables.py`` one-row-in-one-row-out).

    For every input event emits ``(key, id_col, rn, running_v, gap_us)``:

    - ``rn``       1-based rank within the key, ordered by ``(ts, id)``;
    - ``running_v`` inclusive running sum of ``floor(value * scale)`` as
      int64 — ``scale`` must be a power of two so the product is exact in
      f64 and the integer running sum is associative, i.e. bit-exact
      against SQL no matter the accumulation order;
    - ``gap_us``   microseconds since the key's previous event (``-1``
      sentinel on the first event — gaps are always >= 0, and a non-null
      int64 keeps the engine/SQL schema compare exact, since DuckDB's
      pandas export widens nullable BIGINT to float64).

    Shape: slim per-batch projection, ONE hash shuffle (``groupby(key)``),
    per-group vectorized sort + ``cumsum`` — no Python row loop.
    Partitioning assumption: one key's events fit in a group task; use
    :func:`window_funcs_bucketed` when keys can be hot.
    """
    if scale & (scale - 1):
        raise ValueError("window_funcs: scale must be a power of two")

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        v = batch[value].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            key: batch[key], id_col: batch[id_col], "_t": t,
            "_v": pa.array(np.floor(v * scale).astype(np.int64)),
        })

    def wf(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["_t", id_col], kind="stable")
        t = g["_t"].to_numpy()
        gap = np.empty(len(g), dtype=np.int64)
        if len(g):
            gap[0] = -1
            gap[1:] = np.diff(t)
        return pd.DataFrame({
            key: g[key].to_numpy(), id_col: g[id_col].to_numpy(),
            "rn": np.arange(1, len(g) + 1, dtype=np.int64),
            "running_v": np.cumsum(g["_v"].to_numpy()),
            "gap_us": gap,
        })

    from ..agg import default_partitions

    return (ds.map_batches(slim, batch_format="pyarrow")
            .groupby(key, num_partitions=default_partitions())
            .map_groups(wf, batch_format="pandas"))


def window_funcs_bucketed(ds, key: str = "user_id", ts: str = "ts",
                          id_col: str = "event_id", value: str = "value",
                          scale: int = 64,
                          bucket_width: int = 86_400_000_000):
    """Hot-key-safe :func:`window_funcs`: group tasks are keyed on
    ``(key, ts // bucket_width)`` so no task ever holds one key's full
    event sequence; exactness across bucket edges via an offsets pass.

    1. per-batch partial shrink of the slim projection to one row per
       ``(key, bucket)`` (count, int-sum, last ts) + ONE small shuffle
       (``groupby(key)`` over summaries — span/width rows per key,
       independent of event count) computing per-bucket OFFSETS: events
       and int-sum in strictly-earlier buckets, and the previous present
       bucket's last timestamp (for the first-row gap);
    2. row pass: local rank/cumsum/gap inside each ``(key, bucket)``
       group, then the tagged offset row (unioned into the same shuffle)
       shifts them — pure integer adds, so the result is bit-identical
       to the flat operator (pytest pins equality).
    """
    if scale & (scale - 1):
        raise ValueError("window_funcs_bucketed: scale must be a power of two")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("window_funcs_bucketed: bucket_width must be > 0")
    _B = "__wf_bucket"

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        tv = t.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[value].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            key: batch[key], id_col: batch[id_col],
            _B: pa.array(tv // w), "_t": pa.array(tv),
            "_v": pa.array(np.floor(v * scale).astype(np.int64)),
        })

    from ..agg import default_partitions

    np_ = default_partitions()
    slimmed = ds.map_batches(slim, batch_format="pyarrow")

    # ---- offsets: per-(key, bucket) summaries -> per-key prefix scan ---
    def summarize(batch: pa.Table) -> pa.Table:
        df = pa.Table.to_pandas(batch)
        out = (df.groupby([key, _B], sort=False)
               .agg(_n=("_v", "size"), _s=("_v", "sum"), _lt=("_t", "max"))
               .reset_index())
        out["_n"] = out["_n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def offsets(group: pd.DataFrame) -> pd.DataFrame:
        g = (group.groupby(_B, sort=True)
             .agg(_n=("_n", "sum"), _s=("_s", "sum"), _lt=("_lt", "max"))
             .reset_index())
        n = g["_n"].to_numpy()
        s = g["_s"].to_numpy()
        lt = g["_lt"].to_numpy()
        return pd.DataFrame({
            key: group[key].iloc[0], _B: g[_B].to_numpy(),
            "_rn_off": np.concatenate(([0], np.cumsum(n)[:-1])),
            "_v_off": np.concatenate(([0], np.cumsum(s)[:-1])),
            # previous PRESENT bucket's last ts; int64-min sentinel on
            # the first (a real ts can be negative, so -1 would be
            # ambiguous; int64-min cannot be a valid last-ts because the
            # gap computation would have overflowed long before)
            "_plt": np.concatenate(([np.iinfo(np.int64).min], lt[:-1])),
        })

    offs = (slimmed.map_batches(summarize, batch_format="pyarrow")
            .groupby(key, num_partitions=np_)
            .map_groups(offsets, batch_format="pandas"))

    # ---- row pass: union(tagged offsets, rows) -> one grouped shuffle --
    def tag_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            key: batch[key], _B: batch[_B], id_col: batch[id_col],
            "_t": batch["_t"], "_v": batch["_v"],
            "_rn_off": pa.nulls(n, type=pa.int64()),
            "_v_off": pa.nulls(n, type=pa.int64()),
            "_plt": pa.nulls(n, type=pa.int64()),
        })

    def tag_offs(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            key: batch[key], _B: batch[_B],
            id_col: pa.nulls(n, type=pa.int64()),
            "_t": pa.nulls(n, type=pa.int64()),
            "_v": pa.nulls(n, type=pa.int64()),
            "_rn_off": batch["_rn_off"], "_v_off": batch["_v_off"],
            "_plt": batch["_plt"],
        })

    unioned = (slimmed.map_batches(tag_rows, batch_format="pyarrow")
               .union(offs.map_batches(tag_offs, batch_format="pyarrow")))

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        is_off = group[id_col].isna().to_numpy()
        off = group[is_off]
        rows = group[~is_off]
        if not len(rows):
            z = np.array([], dtype=np.int64)
            return pd.DataFrame({key: z, id_col: z, "rn": z,
                                 "running_v": z, "gap_us": z})
        rn_off = int(off["_rn_off"].iloc[0]) if len(off) else 0
        v_off = int(off["_v_off"].iloc[0]) if len(off) else 0
        sent = np.iinfo(np.int64).min
        plt = int(off["_plt"].iloc[0]) if len(off) else sent
        g = rows.sort_values(["_t", id_col], kind="stable")
        t = g["_t"].to_numpy().astype(np.int64)
        gap = np.empty(len(g), dtype=np.int64)
        # no earlier bucket => key's first event ever => -1 sentinel
        gap[0] = t[0] - plt if plt != sent else -1
        if len(g) > 1:
            gap[1:] = np.diff(t)
        return pd.DataFrame({
            key: g[key].to_numpy(),
            id_col: g[id_col].to_numpy().astype(np.int64),
            "rn": np.arange(1, len(g) + 1, dtype=np.int64) + rn_off,
            "running_v": np.cumsum(g["_v"].to_numpy().astype(np.int64)) + v_off,
            "gap_us": gap,
        })

    return unioned.groupby([key, _B], num_partitions=np_).map_groups(
        finish, batch_format="pandas")


def ewma(ds, key: str = "user_id", ts: str = "ts", id_col: str = "event_id",
         value: str = "value", alpha: float = 0.3):
    """Final exponential moving average per key over the time-ordered
    value sequence (``ewma_1 = x_1``;
    ``ewma_t = alpha*x_t + (1-alpha)*ewma_{t-1}``).

    The sequential recursion is re-expressed as the closed-form weighted
    sum ``(1-a)^(n-1) x_1 + sum_{i>=2} a (1-a)^(n-i) x_i`` so the
    per-key fold is one vectorized power+dot instead of a scan — the
    same ordered-shuffle shape as :func:`window_funcs` (slim projection,
    ONE key shuffle, no row loop).  Returns ``(key, n, ewma)``;
    round before hashing (power() differs from SQL's by <=1 ulp).
    """
    from ..agg import default_partitions

    a = float(alpha)

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        return pa.table({key: batch[key], "_t": t, "_id": batch[id_col],
                         "_v": batch[value]})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["_t", "_id"], kind="stable")
        x = s["_v"].to_numpy().astype(np.float64)
        n = len(x)
        w = a * np.power(1.0 - a, n - 1 - np.arange(n))
        w[0] = np.power(1.0 - a, n - 1)   # init convention: ewma_1 = x_1
        return pd.DataFrame({key: [s[key].iloc[0]],
                             "n": np.array([n], dtype=np.int64),
                             "ewma": [float(np.dot(w, x))]})

    return (ds.map_batches(slim, batch_format="pyarrow")
            .groupby(key, num_partitions=default_partitions())
            .map_groups(fold, batch_format="pandas"))


def transitions(ds, key: str = "user_id", ts: str = "ts",
                type_col: str = "event_type", order_col: str = "event_id",
                mode: str = "tree"):
    """Per-key event-sequence transition counts — the clickstream Markov
    matrix: order each key's events by ``(ts, order_col)`` (the explicit
    tie-break keeps tied timestamps deterministic) and count adjacent
    ``prev_type -> next_type`` pairs corpus-wide.

    One key-hash shuffle of slimmed ``(key, t, order, type)`` rows, a
    vectorized per-key shift, then a summary-sized combine — the
    transition domain is ``|types|^2``, so partials tree-merge and
    nothing data-scaled ever reaches the driver.  Returns a pandas
    DataFrame ``(prev_type, next_type, n)``.
    """
    from ..agg import combine_partials, default_partitions

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        return pa.table({key: batch[key], "_t": t,
                         "_o": batch[order_col], type_col: batch[type_col]})

    slimmed = ds.map_batches(slim, batch_format="pyarrow")

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["_t", "_o"], kind="mergesort")
        s = g[type_col].to_numpy()
        if len(s) < 2:
            return pd.DataFrame({"prev_type": pd.Series([], dtype=object),
                                 "next_type": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        out = (pd.DataFrame({"prev_type": s[:-1], "next_type": s[1:]})
               .groupby(["prev_type", "next_type"], sort=False)
               .size().rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = slimmed.groupby(key, num_partitions=default_partitions()
                            ).map_groups(pairs, batch_format="pandas")
    out = combine_partials(parts, keys=["prev_type", "next_type"],
                           value_cols=["n"], mode=mode).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def cusum_changepoints(ds, key: str = "user_id", ts: str = "ts",
                       id_col: str = "event_id", value: str = "value",
                       scale: int = 64):
    """Per-key CUSUM changepoint: the position maximizing the absolute
    cumulative deviation from the key's mean (Page 1954, public
    literature).

    Exact-integer formulation: with ``x_i = floor(value * scale)`` as
    int64 and prefix sums ``cs_i``, the deviation ``cs_i − i·mean`` is
    scaled by ``n`` to ``D_i = n·cs_i − i·total`` — all int64, so the
    statistic and its argmax are exact with NO float arithmetic and a
    SQL window replay matches bit-for-bit.  Ties on ``|D_i|`` break to
    the earliest position.

    Returns one row per key: ``(key, n, change_idx [1-based], d_max)``.
    Scale shape: the stream slims to four narrow columns before the one
    hash shuffle; per-key series run in group tasks (same frontier-fits-
    one-task assumption as crawl_order/trajectory; the bucketed window
    machinery above is the fallback for pathological keys).
    """
    from ..agg import default_partitions

    def slim(batch: pa.Table) -> pa.Table:
        v = batch[value].to_numpy(zero_copy_only=False)
        # drop non-finite rows BEFORE the int cast (NaN casts to garbage
        # int64); matches the SQL oracle's NULL-row exclusion (ADVICE r3)
        fin = np.isfinite(v)
        if not fin.all():
            batch, v = batch.filter(pa.array(fin)), v[fin]
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        x = np.floor(v * scale).astype(np.int64)
        return pa.table({key: batch[key], "_t": t, "_i": batch[id_col],
                         "_x": pa.array(x, type=pa.int64())})

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["_t", "_i"], kind="stable")
        x = g["_x"].to_numpy()
        n = np.int64(len(x))
        cs = np.cumsum(x)
        idx = np.arange(1, len(x) + 1, dtype=np.int64)
        d = np.abs(n * cs - idx * cs[-1])
        j = int(np.argmax(d))  # first occurrence == earliest position
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "n": np.array([n], dtype=np.int64),
            "change_idx": np.array([j + 1], dtype=np.int64),
            "d_max": np.array([d[j]], dtype=np.int64),
        })

    return (ds.map_batches(slim, batch_format="pyarrow")
            .groupby(key, num_partitions=default_partitions())
            .map_groups(per_key, batch_format="pandas"))


def rolling_median_counts(ds, key: str = "event_type", ts: str = "ts",
                          bucket_us: int = 86_400_000_000, window: int = 4):
    """Trailing rolling-median smoothing of the per-key bucket-count
    series — the robust denoiser for spiky activity time series (median
    filters, classic signal processing).

    Per (key, bucket) counts shrink via one hash combine; each key's
    ordered series then takes the median of the last ``window`` buckets
    (partial windows included, the SQL ``ROWS window-1 PRECEDING``
    frame).  Counts are exact int64; an even-width median is the exact
    average of two ints (an x.5 float64, exactly representable), so the
    SQL window replay is bit-identical.

    Returns ``(key, bucket, n, med)`` rows.
    """
    from ..agg import combine_partials, default_partitions

    def partial(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        b = t.to_numpy(zero_copy_only=False) // bucket_us
        df = pd.DataFrame({key: batch[key].to_pandas(), "bucket": b})
        out = (df.groupby([key, "bucket"], sort=False).size()
               .reset_index(name="n"))
        out["n"] = out["n"].astype(np.int64)
        out["bucket"] = out["bucket"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[key, "bucket"], value_cols=["n"], mode="hash")

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values("bucket", kind="stable")
        med = (s["n"].rolling(window, min_periods=1).median()
               .to_numpy().astype(np.float64))
        return pd.DataFrame({
            key: s[key].to_numpy(),
            "bucket": s["bucket"].to_numpy().astype(np.int64),
            "n": s["n"].to_numpy().astype(np.int64),
            "med": med,
        })

    return counts.groupby(key, num_partitions=default_partitions()) \
        .map_groups(smooth, batch_format="pandas")

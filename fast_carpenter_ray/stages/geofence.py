"""Geofence entry/exit detection against a broadcast cell set.

The H3-style geofencing pattern (cells, not polygons, are the runtime
representation): a fence is a SET of grid-cell ids (the cell cover of
an arbitrary polygon — see ``stages/pip_join.py`` / ``polygon_cover``
for producing one).  Membership is a vectorized ``np.isin`` against
the sorted fence array, broadcast ONCE via ``ray.put`` and read
zero-copy by every task — never re-shipped per batch.

``geofence_events`` then emits one row per entry/exit transition: per
entity, events are ordered by ``(ts, id)`` (a total order, so tied
timestamps are deterministic) and an event whose membership differs
from its predecessor's yields ``'enter'`` or ``'exit'``.

Scale shape: the corpus shrinks per batch to ``(key, t, id, inside)``
int rows — membership is evaluated BEFORE the shuffle, so the only
all-to-all carries four ints per event; output is bounded by the
transition count.  Hot keys: per-entity ordering groups on the entity
key like ``window_funcs``; for adversarial single-entity streams the
same time-bucket + boundary-carry refactor documented in
``stages/windows.py window_funcs_bucketed`` applies.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["geofence_events", "geofence_events_bucketed",
           "geofence_dwell", "box_fence"]


def box_fence(x_lo: int, x_hi: int, y_lo: int, y_hi: int,
              n_grid: int = 8) -> np.ndarray:
    """Cell ids (``xc * n_grid + yc``) of an axis-aligned box on an
    ``n_grid`` x ``n_grid`` grid — a deterministic test fence; real
    fences come from a polygon cell cover."""
    xs, ys = np.meshgrid(np.arange(x_lo, x_hi, dtype=np.int64),
                         np.arange(y_lo, y_hi, dtype=np.int64),
                         indexing="ij")
    return np.sort((xs * n_grid + ys).ravel())


def geofence_events(ds, fence_cells: np.ndarray, key: str = "user_id",
                    ts: str = "ts", id_col: str = "event_id",
                    cell: str = "cell",
                    num_partitions: Optional[int] = None):
    """Dataset of ``(key, id, ts_us, transition)`` rows — one per
    fence boundary crossing, ``transition`` in {'enter', 'exit'}.

    The first event of an entity never emits (no predecessor); an
    entity wholly inside or wholly outside emits nothing.
    """
    import ray

    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)

    fence = np.sort(np.asarray(fence_cells, dtype=np.int64))
    fence_ref = ray.put(fence)
    key_c, ts_c, id_c = key, ts, id_col

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts_c].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cells = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        inside = np.isin(cells, ray.get(fence_ref)).astype(np.int8)
        return pa.table({
            key_c: batch[key_c],
            id_c: batch[id_c].cast(pa.int64()),
            "t": pa.array(t, type=pa.int64()),
            "inside": pa.array(inside, type=pa.int8()),
        })

    def crossings(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", id_c], kind="stable")
        inside = g["inside"].to_numpy()
        prev = np.empty_like(inside)
        prev[0] = inside[0]          # first event: no transition
        prev[1:] = inside[:-1]
        hit = inside != prev
        sub = g.loc[hit]
        # explicit dtypes so an all-quiet group emits a typed empty frame
        # (Arrow must not infer a null column type on empties)
        return pd.DataFrame({
            key_c: sub[key_c].reset_index(drop=True),
            id_c: pd.Series(sub[id_c].to_numpy(), dtype="int64"),
            "ts_us": pd.Series(sub["t"].to_numpy(), dtype="int64"),
            "transition": pd.Series(
                np.where(sub["inside"].to_numpy() == 1, "enter", "exit"),
                dtype="string"),
        })

    rows = ds.map_batches(slim, batch_format="pyarrow")
    return rows.groupby(key_c, num_partitions=num_partitions).map_groups(
        crossings, batch_format="pandas")


def geofence_dwell(ds, fence_cells: np.ndarray, key: str = "user_id",
                   ts: str = "ts", id_col: str = "event_id",
                   cell: str = "cell",
                   num_partitions: Optional[int] = None):
    """Per-visit dwell intervals: each ``enter`` transition paired with
    the next ``exit`` of the same entity — ``(key, enter_id, exit_id,
    enter_us, exit_us, dwell_us)``.

    An entity still inside at stream end yields no row (open visit);
    the first event landing inside (no prior outside event) opens a
    visit only when a real ``enter`` transition exists, matching
    :func:`geofence_events` semantics.  Same scale shape as
    ``geofence_events`` — the pairing happens inside the SAME per-key
    group pass, so no second shuffle.
    """
    import ray

    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)

    fence = np.sort(np.asarray(fence_cells, dtype=np.int64))
    fence_ref = ray.put(fence)
    key_c, ts_c, id_c = key, ts, id_col

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts_c].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cells = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        inside = np.isin(cells, ray.get(fence_ref)).astype(np.int8)
        return pa.table({
            key_c: batch[key_c],
            id_c: batch[id_c].cast(pa.int64()),
            "t": pa.array(t, type=pa.int64()),
            "inside": pa.array(inside, type=pa.int8()),
        })

    def visits(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", id_c], kind="stable")
        inside = g["inside"].to_numpy()
        prev = np.empty_like(inside)
        prev[0] = inside[0]
        prev[1:] = inside[:-1]
        hit = inside != prev
        ids = g[id_c].to_numpy()[hit]
        t = g["t"].to_numpy()[hit]
        kinds = inside[hit]            # 1 = enter, 0 = exit
        # transitions strictly alternate within an entity, so pairing is
        # positional: an enter at position i pairs with the exit at i+1
        ent = kinds == 1
        pair = ent[:-1] & (kinds[1:] == 0) if len(kinds) > 1 else \
            np.array([], dtype=bool)
        i = np.nonzero(pair)[0]
        return pd.DataFrame({
            key_c: pd.Series(np.repeat(g[key_c].iloc[0], len(i))),
            "enter_id": pd.Series(ids[i], dtype="int64"),
            "exit_id": pd.Series(ids[i + 1], dtype="int64"),
            "enter_us": pd.Series(t[i], dtype="int64"),
            "exit_us": pd.Series(t[i + 1], dtype="int64"),
            "dwell_us": pd.Series(t[i + 1] - t[i], dtype="int64"),
        })

    rows = ds.map_batches(slim, batch_format="pyarrow")
    return rows.groupby(key_c, num_partitions=num_partitions).map_groups(
        visits, batch_format="pandas")


def geofence_events_bucketed(ds, fence_cells: np.ndarray,
                             key: str = "user_id", ts: str = "ts",
                             id_col: str = "event_id", cell: str = "cell",
                             bucket_width: int = 86_400_000_000,
                             num_partitions: Optional[int] = None):
    """Hot-key-safe :func:`geofence_events`: group tasks keyed on
    ``(key, ts // bucket_width)`` detect each bucket's transitions
    locally and emit ONE summary row per bucket carrying its first/last
    membership state; a second, summary-sized shuffle per key adds the
    boundary transition between each bucket's last state and the next
    bucket's first event.  Bit-identical to the flat operator (pytest
    pins it) — an adversarial single-entity stream splits into
    span/width bounded tasks instead of one giant group.
    """
    import ray

    w = int(bucket_width)
    if w <= 0:
        raise ValueError("geofence_events_bucketed: bucket_width must "
                         "be > 0")
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)

    fence = np.sort(np.asarray(fence_cells, dtype=np.int64))
    fence_ref = ray.put(fence)
    key_c, ts_c, id_c = key, ts, id_col
    _B = "__gf_bucket"

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts_c].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cells = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        inside = np.isin(cells, ray.get(fence_ref)).astype(np.int8)
        return pa.table({
            key_c: batch[key_c],
            id_c: batch[id_c].cast(pa.int64()),
            "t": pa.array(t, type=pa.int64()),
            "inside": pa.array(inside, type=pa.int8()),
            _B: pa.array(t // w, type=pa.int64()),
        })

    def local(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["t", id_c], kind="stable")
        inside = s["inside"].to_numpy()
        prev = np.empty_like(inside)
        prev[0] = inside[0]          # first event: resolved at merge
        prev[1:] = inside[:-1]
        hit = inside != prev
        sub = s.loc[hit]
        rows = pd.DataFrame({
            key_c: sub[key_c].reset_index(drop=True),
            _B: pd.Series(np.full(int(hit.sum()), s[_B].iloc[0]),
                          dtype="int64"),
            id_c: pd.Series(sub[id_c].to_numpy(), dtype="int64"),
            "ts_us": pd.Series(sub["t"].to_numpy(), dtype="int64"),
            "inside": pd.Series(sub["inside"].to_numpy(), dtype="int64"),
            "_summary": pd.Series(np.zeros(int(hit.sum())), dtype="int64"),
            "_first_in": pd.Series(np.zeros(int(hit.sum())),
                                   dtype="int64"),
            "_last_in": pd.Series(np.zeros(int(hit.sum())), dtype="int64"),
        })
        summary = pd.DataFrame({
            key_c: [s[key_c].iloc[0]],
            _B: pd.Series([s[_B].iloc[0]], dtype="int64"),
            id_c: pd.Series([s[id_c].iloc[0]], dtype="int64"),
            "ts_us": pd.Series([s["t"].iloc[0]], dtype="int64"),
            "inside": pd.Series([int(inside[0])], dtype="int64"),
            "_summary": pd.Series([1], dtype="int64"),
            "_first_in": pd.Series([int(inside[0])], dtype="int64"),
            "_last_in": pd.Series([int(inside[-1])], dtype="int64"),
        })
        return pd.concat([rows, summary], ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        summ = g[g["_summary"] == 1].sort_values(_B, kind="stable")
        first_in = summ["_first_in"].to_numpy()
        last_in = summ["_last_in"].to_numpy()
        # boundary: previous bucket's final state vs this bucket's first
        # event (bucket 0's first event never emits)
        cross = np.zeros(len(summ), dtype=bool)
        cross[1:] = first_in[1:] != last_in[:-1]
        b = summ.loc[cross]
        boundary = pd.DataFrame({
            key_c: b[key_c].reset_index(drop=True),
            id_c: pd.Series(b[id_c].to_numpy(), dtype="int64"),
            "ts_us": pd.Series(b["ts_us"].to_numpy(), dtype="int64"),
            "transition": pd.Series(
                np.where(b["_first_in"].to_numpy() == 1, "enter",
                         "exit"), dtype="string"),
        })
        inner = g[g["_summary"] == 0]
        inner_rows = pd.DataFrame({
            key_c: inner[key_c].reset_index(drop=True),
            id_c: pd.Series(inner[id_c].to_numpy(), dtype="int64"),
            "ts_us": pd.Series(inner["ts_us"].to_numpy(), dtype="int64"),
            "transition": pd.Series(
                np.where(inner["inside"].to_numpy() == 1, "enter",
                         "exit"), dtype="string"),
        })
        return pd.concat([inner_rows, boundary], ignore_index=True)

    rows = ds.map_batches(slim, batch_format="pyarrow")
    parts = rows.groupby([key_c, _B],
                         num_partitions=num_partitions).map_groups(
        local, batch_format="pandas")
    return parts.groupby(key_c, num_partitions=num_partitions).map_groups(
        merge, batch_format="pandas")

"""As-of join — for each left row, the most recent right row at or before
it, matched by key.

The reference has no temporal joins (SURVEY.md §2.5); this is one of the
custom operators the north rule's engine class needs (event streams:
attribute each purchase to the latest prior page view, join quotes to
trades, ...).

Ray-native shape (option (a) of the custom-operator ladder: a composition
of ``map_batches`` + ``groupby().map_groups``):

1. tag both sides and align their schemas inside ``map_batches`` (right
   payload columns renamed with ``suffix``; each side carries typed nulls
   for the other side's payload — Arrow unions need one schema);
2. ONE hash shuffle: ``groupby(by)`` co-locates each key's rows;
3. per-group vectorized resolution: sort the right side's times once,
   ``np.searchsorted`` every left time against them — O((l+r) log r) per
   group, no Python pair loop.

Partitioning assumption (documented per the project brief): all rows of
one ``by`` key fit in one group task.  Keys here are entities (users,
instruments) whose per-key row count does not grow with corpus breadth;
for genuinely hot keys, range-partition ``on`` within the key upstream and
as-of join each range with the previous range's tail broadcast.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["asof_join", "asof_join_bucketed"]

_SIDE = "__asof_side"


def _make_resolver(by, on, lcols, on_r, rcols, r_out, how):
    """Shared per-group as-of resolution (flat AND bucketed paths — one
    implementation so a semantics fix can never drift between them):
    sort the right side's times once, searchsorted every left time,
    null-fill or drop unmatched per ``how``.

    Tie determinism: right rows sharing one ``on`` value within a key are
    ordered by ``(on, *payload)``, so the matched row is the PAYLOAD-MAX
    of the tied set — a pure function of the data, never of distributed
    union arrival order (two tied rows with identical payloads are
    interchangeable by definition)."""

    def resolve(group: pd.DataFrame) -> pd.DataFrame:
        is_r = group[_SIDE].to_numpy() == 1
        lrows = group[~is_r]
        rrows = group[is_r]
        out_cols = [by, on] + lcols + [on_r] + r_out
        if len(lrows) == 0:
            return lrows.reindex(columns=out_cols)
        lvals = lrows[on].to_numpy()
        if len(rrows) == 0:
            matched = np.zeros(len(lrows), dtype=bool)
            out = lrows.copy()
            out[on_r] = pd.NA
        else:
            rs = rrows.sort_values([on] + r_out, kind="stable")
            rvals = rs[on].to_numpy()
            idx = np.searchsorted(rvals, lvals, side="right") - 1
            matched = idx >= 0
            take = np.clip(idx, 0, None)
            out = lrows.copy()
            out[on_r] = rvals[take]
            out.loc[~matched, on_r] = pd.NA
            for c, co in zip(rcols, r_out):
                out[co] = rs[co].to_numpy()[take]
                out.loc[~matched, co] = pd.NA
        if how == "inner":
            out = out[matched]
        return out.reindex(columns=out_cols)

    return resolve


def asof_join(left, right, on: str, by: str,
              left_cols: Optional[Sequence[str]] = None,
              right_cols: Optional[Sequence[str]] = None,
              suffix: str = "_r", how: str = "inner"):
    """For each left row, the right row with the greatest ``on`` value
    <= the left row's ``on``, within the same ``by`` key.

    ``on`` must be a totally ordered column (int/float/timestamp).
    ``how="inner"`` drops left rows with no prior right row;
    ``how="left"`` keeps them with null right payload.
    Right payload columns are emitted as ``<name><suffix>``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join: unknown how={how!r}")

    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    lcols = [c for c in (left_cols or l_schema.names) if c not in (on, by)]
    rcols = [c for c in (right_cols or r_schema.names) if c not in (on, by)]
    r_out = [f"{c}{suffix}" for c in rcols]
    on_r = f"{on}{suffix}"
    l_types = {c: l_schema.field(c).type for c in lcols}
    r_types = {c: r_schema.field(c).type for c in rcols}

    def _tag_left(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {by: batch[by], on: batch[on],
                _SIDE: pa.array(np.zeros(n, dtype=np.int8))}
        for c in lcols:
            cols[c] = batch[c]
        for c, co in zip(rcols, r_out):
            cols[co] = pa.nulls(n, type=r_types[c])
        return pa.table(cols)

    def _tag_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {by: batch[by], on: batch[on],
                _SIDE: pa.array(np.ones(n, dtype=np.int8))}
        for c in lcols:
            cols[c] = pa.nulls(n, type=l_types[c])
        for c, co in zip(rcols, r_out):
            cols[co] = batch[c]
        return pa.table(cols)

    tagged = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow"))

    from ..agg import default_partitions

    resolve = _make_resolver(by, on, lcols, on_r, rcols, r_out, how)
    return tagged.groupby(by, num_partitions=default_partitions()).map_groups(
        resolve, batch_format="pandas")


def asof_join_bucketed(left, right, on: str, by: str, bucket_width: int,
                       left_cols: Optional[Sequence[str]] = None,
                       right_cols: Optional[Sequence[str]] = None,
                       suffix: str = "_r", how: str = "inner"):
    """As-of join without the one-key-per-task assumption: group tasks are
    keyed on ``(by, on // bucket_width)``, so a hot key's events split
    across time buckets and no task sees more than one bucket's rows.

    Exactness across bucket boundaries via a carry pass:

    1. shrink both sides per batch to one row per ``(by, bucket)`` — the
       latest right row, and (for the left) bucket presence;
    2. ONE small shuffle + per-key forward-fill turns those into a CARRY
       row per (by, bucket): the latest right row from any EARLIER bucket
       (the per-key data here is span/bucket_width rows, not row count);
    3. final ``groupby(by, bucket)``: in-group searchsorted as-of over
       in-bucket rights + the single carry row.

    ``on`` must be integer (or timestamp, cast to int64 microseconds).
    Same semantics/columns as :func:`asof_join`; pytest pins equality.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join_bucketed: unknown how={how!r}")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("asof_join_bucketed: bucket_width must be > 0")

    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    lcols = [c for c in (left_cols or l_schema.names) if c not in (on, by)]
    rcols = [c for c in (right_cols or r_schema.names) if c not in (on, by)]
    r_out = [f"{c}{suffix}" for c in rcols]
    on_r = f"{on}{suffix}"
    l_types = {c: l_schema.field(c).type for c in lcols}
    r_types = {c: r_schema.field(c).type for c in rcols}
    _B = "__asof_bucket"

    def _on_i64(batch: pa.Table) -> np.ndarray:
        t = batch[on]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        return t.to_numpy(zero_copy_only=False).astype(np.int64)

    # ---- pass 1 partials: per-(key, bucket) shrink ---------------------
    def latest_right(batch: pa.Table) -> pa.Table:
        t = _on_i64(batch)
        df = pd.DataFrame({by: batch[by].to_numpy(zero_copy_only=False),
                           _B: t // w, on: t})
        for c in rcols:
            df[c] = batch[c].to_numpy(zero_copy_only=False)
        # per (key, bucket) keep the (on, *payload)-max row — the same
        # deterministic tie-break as _make_resolver, so bucketed == flat
        # even when right rows tie on ``on``
        df = df.sort_values([on] + rcols, kind="stable")
        keep = df.groupby([by, _B], sort=False).tail(1)
        return pa.Table.from_pandas(keep, preserve_index=False)

    def left_buckets(batch: pa.Table) -> pa.Table:
        t = _on_i64(batch)
        df = pd.DataFrame({by: batch[by].to_numpy(zero_copy_only=False),
                           _B: t // w})
        return pa.Table.from_pandas(df.drop_duplicates(), preserve_index=False)

    rl = right.map_batches(latest_right, batch_format="pyarrow")
    lb = left.map_batches(left_buckets, batch_format="pyarrow")

    def lb_align(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {by: batch[by], _B: batch[_B],
                on: pa.nulls(n, type=pa.int64())}
        for c in rcols:
            cols[c] = pa.nulls(n, type=r_types[c])
        return pa.table(cols)

    shrunk = rl.union(lb.map_batches(lb_align, batch_format="pyarrow"))

    # ---- pass 2: per-key forward-fill -> carry rows --------------------
    def carry(group: pd.DataFrame) -> pd.DataFrame:
        # one row per (bucket): latest right row from any earlier bucket
        g = (group.sort_values([_B, on] + rcols, kind="stable",
                               na_position="first")
             .drop_duplicates(_B, keep="last")  # per bucket: (on, payload)-max right, else presence row
             .reset_index(drop=True))
        has_right = g[on].notna().to_numpy()
        n = len(g)
        # index of the last right-bearing bucket at or before i, then shift
        # one bucket so carry[i] sees only buckets strictly earlier
        last = np.maximum.accumulate(
            np.where(has_right, np.arange(n), -1))
        prev = np.concatenate(([-1], last[:-1]))
        mask = prev >= 0
        if not mask.any():
            return pd.DataFrame(columns=[by, _B, on] + rcols)
        src = g.iloc[prev[mask]].reset_index(drop=True)
        out = pd.DataFrame({
            by: group[by].iloc[0],
            _B: g[_B].to_numpy()[mask],
            on: src[on].to_numpy(),
        })
        for c in rcols:
            out[c] = src[c].to_numpy()
        return out

    from ..agg import default_partitions

    np_ = default_partitions()
    carries = shrunk.groupby(by, num_partitions=np_).map_groups(
        carry, batch_format="pandas")

    # ---- pass 3: bucket-keyed resolution -------------------------------
    def tag_left(batch: pa.Table) -> pa.Table:
        t = _on_i64(batch)
        n = len(batch)
        cols = {by: batch[by], _B: pa.array(t // w), on: pa.array(t),
                _SIDE: pa.array(np.zeros(n, dtype=np.int8))}
        for c in lcols:
            cols[c] = batch[c]
        for c, co in zip(rcols, r_out):
            cols[co] = pa.nulls(n, type=r_types[c])
        return pa.table(cols)

    def tag_right(batch: pa.Table) -> pa.Table:
        t = _on_i64(batch)
        n = len(batch)
        cols = {by: batch[by], _B: pa.array(t // w), on: pa.array(t),
                _SIDE: pa.array(np.ones(n, dtype=np.int8))}
        for c in lcols:
            cols[c] = pa.nulls(n, type=l_types[c])
        for c, co in zip(rcols, r_out):
            cols[co] = batch[c]
        return pa.table(cols)

    def tag_carry(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {by: batch[by], _B: batch[_B].cast(pa.int64()),
                on: batch[on].cast(pa.int64()),
                _SIDE: pa.array(np.ones(n, dtype=np.int8))}
        for c in lcols:
            cols[c] = pa.nulls(n, type=l_types[c])
        for c, co in zip(rcols, r_out):
            cols[co] = batch[c].cast(r_types[c])
        return pa.table(cols)

    tagged = (left.map_batches(tag_left, batch_format="pyarrow")
              .union(right.map_batches(tag_right, batch_format="pyarrow"))
              .union(carries.map_batches(tag_carry, batch_format="pyarrow")))

    resolve = _make_resolver(by, on, lcols, on_r, rcols, r_out, how)
    return tagged.groupby([by, _B], num_partitions=np_).map_groups(
        resolve, batch_format="pandas")

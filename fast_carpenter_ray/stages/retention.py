"""User-activity retention and origin-destination transition operators.

The event-analytics leg of the engine (a stateful per-entity rollup the
reference's per-event stages cannot express — ``fast_carpenter/define/
variables.py`` is stateless per row, and its BinnedDataframe summary
(``fast_carpenter/summary/binned_dataframe.py:118``) has no notion of
"the same entity seen on two different days"):

* :func:`retention` — day-over-day retention: for each day ``d``, how
  many distinct users were active on ``d`` (``active``) and how many of
  those were also active on ``d+1`` (``retained``).
* :func:`cohort_retention` — classic cohort matrix: users grouped by
  their FIRST active day (the cohort), counted at each later day offset.
* :func:`od_matrix` — origin→destination transition counts: per entity,
  order events by time and count consecutive cell-to-cell moves — the
  flow-map primitive of geospatial analytics.
  :func:`od_matrix_bucketed` is the hot-key-safe variant (time-bucket
  group tasks + boundary-transition merge, same shape as
  ``trajectory.trajectory_stats_bucketed``).

Scale shape (all three): the stream is shrunk PER BATCH before any
shuffle (distinct ``(key, day)`` pairs / slim 4-column projection), then
ONE hash shuffle co-locates each entity's rows, each group folds
vectorized (``np.unique`` / sorted ``!=`` shift — no Python row loop)
into summary-sized partial rows, and a final combine keyed on the small
output key space finishes.  Nothing entity-keyed ever reaches the
driver: the per-day retention key space is bounded by the time span
(tree combine), the cohort×offset and cell×cell spaces scale with
span²/resolution² and default to the hash combine.

Partitioning assumption (documented per the project brief): one
entity's distinct-day set / per-bucket event run fits in a group task —
the same argument as ``windows.session_windows``; ``od_matrix_bucketed``
removes it for the transition operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["retention", "cohort_retention", "od_matrix", "od_gravity",
           "od_matrix_bucketed", "audience_overlap"]

DAY_US = 86_400_000_000


def _day_pairs(ds, key: str, ts: str, day_us: int):
    """Per-batch DISTINCT ``(key, day)`` pairs — shrinks the event stream
    to at most one row per entity-day before the shuffle."""

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        tv = t.to_numpy(zero_copy_only=False).astype(np.int64)
        frame = pd.DataFrame({
            key: batch[key].to_numpy(zero_copy_only=False).astype(np.int64),
            "day": tv // day_us,                # numpy floor div == DuckDB //
        }).drop_duplicates()
        return pa.Table.from_pandas(frame, preserve_index=False)

    return ds.map_batches(slim, batch_format="pyarrow")


def retention(ds, key: str = "user_id", ts: str = "ts",
              day_us: int = DAY_US, mode: str = "tree"):
    """Day-over-day retention; see module docstring.

    Returns one row per day: ``(day, active, retained)`` where
    ``retained`` counts users active on both ``day`` and ``day + 1``.
    The per-day key space is bounded by the time SPAN, not the data
    volume, so the default combine is the tree (guarded by
    ``agg.MAX_DRIVER_ROWS``); pass ``mode="hash"`` for multi-century
    spans.
    """
    from ..agg import combine_partials, default_partitions

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(g["day"].to_numpy())
        ret = np.isin(days + 1, days, assume_unique=True)
        return pd.DataFrame({
            "day": days,
            "active": np.ones(len(days), dtype=np.int64),
            "retained": ret.astype(np.int64),
        })

    parts = (_day_pairs(ds, key, ts, day_us)
             .groupby(key, num_partitions=default_partitions())
             .map_groups(fold, batch_format="pandas"))
    return combine_partials(parts, keys=["day"],
                            value_cols=["active", "retained"], mode=mode)


def cohort_retention(ds, key: str = "user_id", ts: str = "ts",
                     day_us: int = DAY_US, mode: str = "hash"):
    """Cohort retention matrix; see module docstring.

    Returns ``(cohort, day_offset, n_users)``: for each first-active-day
    cohort, how many of its users were active ``day_offset`` days later
    (``day_offset = 0`` row is the cohort size).  The cohort×offset key
    space grows with the span squared — default combine is ``hash``.
    """
    from ..agg import combine_partials, default_partitions

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(g["day"].to_numpy())
        cohort = days[0]
        return pd.DataFrame({
            "cohort": np.full(len(days), cohort, dtype=np.int64),
            "day_offset": days - cohort,
            "n_users": np.ones(len(days), dtype=np.int64),
        })

    parts = (_day_pairs(ds, key, ts, day_us)
             .groupby(key, num_partitions=default_partitions())
             .map_groups(fold, batch_format="pandas"))
    return combine_partials(parts, keys=["cohort", "day_offset"],
                            value_cols=["n_users"], mode=mode)


def _od_slim(ds, key, ts, id_col, cell, extra=None):
    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        cols = {key: batch[key], "_t": t, "_id": batch[id_col],
                "_c": batch[cell].cast(pa.int64())}
        if extra:
            tv = t.to_numpy(zero_copy_only=False).astype(np.int64)
            cols[extra[0]] = pa.array(tv // extra[1])
        return pa.table(cols)

    return ds.map_batches(slim, batch_format="pyarrow")


def _pair_counts(prev: np.ndarray, cur: np.ndarray) -> pd.DataFrame:
    """Partial counts of ``prev[i] -> cur[i]`` moves where the cell
    actually changed (vectorized mask + groupby, no row loop)."""
    m = prev != cur
    out = (pd.DataFrame({"cell_from": prev[m], "cell_to": cur[m]})
           .groupby(["cell_from", "cell_to"], sort=False)
           .size().reset_index(name="n"))
    out["n"] = out["n"].astype(np.int64)
    return out


def _transitions(cells: np.ndarray) -> pd.DataFrame:
    """Distinct-pair partial counts of consecutive cell changes in one
    ordered cell sequence."""
    return _pair_counts(cells[:-1], cells[1:])


def od_matrix(ds, key: str = "user_id", ts: str = "ts",
              id_col: str = "event_id", cell: str = "cell",
              mode: str = "hash"):
    """Origin→destination matrix; see module docstring.

    Returns ``(cell_from, cell_to, n)``: counts of consecutive
    (time-ordered per entity, ties broken by ``id_col``) transitions
    between DIFFERENT cells.  The cell×cell key space scales with the
    grid resolution squared — default combine is ``hash``.
    """
    from ..agg import combine_partials, default_partitions

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["_t", "_id"], kind="stable")
        return _transitions(s["_c"].to_numpy().astype(np.int64))

    parts = (_od_slim(ds, key, ts, id_col, cell)
             .groupby(key, num_partitions=default_partitions())
             .map_groups(fold, batch_format="pandas"))
    return combine_partials(parts, keys=["cell_from", "cell_to"],
                            value_cols=["n"], mode=mode)


def od_matrix_bucketed(ds, key: str = "user_id", ts: str = "ts",
                       id_col: str = "event_id", cell: str = "cell",
                       bucket_width: int = DAY_US, mode: str = "hash"):
    """Hot-key-safe :func:`od_matrix`: group tasks keyed on
    ``(key, ts // bucket_width)`` count each bucket's transitions locally
    and emit partial rows plus ONE summary row per bucket carrying the
    bucket's first/last cell; a second, summary-sized shuffle per key
    (span/width rows, independent of event count) adds the boundary
    transition between each bucket's last cell and the next bucket's
    first.  Bit-identical to the flat operator (pytest pins it).
    """
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("od_matrix_bucketed: bucket_width must be > 0")
    from ..agg import combine_partials, default_partitions

    _B = "__od_bucket"

    def local(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["_t", "_id"], kind="stable")
        c = s["_c"].to_numpy().astype(np.int64)
        out = _transitions(c)
        out.insert(0, key, s[key].iloc[0])
        out.insert(1, _B, np.int64(s[_B].iloc[0]))
        out["_first"] = np.int64(0)
        out["_last"] = np.int64(0)
        out["_summary"] = np.int64(0)
        summary = pd.DataFrame({
            key: [s[key].iloc[0]], _B: [np.int64(s[_B].iloc[0])],
            "cell_from": np.array([0], dtype=np.int64),
            "cell_to": np.array([0], dtype=np.int64),
            "n": np.array([0], dtype=np.int64),
            "_first": np.array([c[0]], dtype=np.int64),
            "_last": np.array([c[-1]], dtype=np.int64),
            "_summary": np.array([1], dtype=np.int64),
        })
        return pd.concat([out, summary], ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        summ = (g[g["_summary"] == 1]
                .sort_values(_B, kind="stable"))
        # boundary moves: previous bucket's last cell -> this bucket's first
        boundary = _pair_counts(summ["_last"].to_numpy()[:-1],
                                summ["_first"].to_numpy()[1:])
        inner = g.loc[g["_summary"] == 0, ["cell_from", "cell_to", "n"]]
        out = (pd.concat([inner, boundary], ignore_index=True)
               .groupby(["cell_from", "cell_to"], sort=False)["n"]
               .sum().reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    np_ = default_partitions()
    parts = (_od_slim(ds, key, ts, id_col, cell, extra=(_B, w))
             .groupby([key, _B], num_partitions=np_)
             .map_groups(local, batch_format="pandas"))
    merged = parts.groupby(key, num_partitions=np_).map_groups(
        merge, batch_format="pandas")
    return combine_partials(merged, keys=["cell_from", "cell_to"],
                            value_cols=["n"], mode=mode)


def audience_overlap(ds, key: str = "user_id", label: str = "event_type",
                     mode: str = "tree"):
    """Audience-overlap matrix: for every unordered label pair
    ``(a, b)`` with ``a < b``, the number of entities that carry BOTH
    labels (users who did both event types, readers of both domains...).

    Shape: per-batch DISTINCT (key, label) shrink -> ONE key-keyed
    shuffle -> per-entity vectorized pair expansion (an entity with m
    labels emits m*(m-1)/2 pair rows — m is the LABEL-space size, tiny)
    -> a label-pair combine (label² key space, summary-sized).  The
    entity stream shuffles once, as slim 2-column rows.
    """
    from ..agg import combine_partials, default_partitions

    def slim(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: batch[key].to_pandas(),
                           label: batch[label].to_pandas()}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        labs = np.unique(g[label].to_numpy())
        if len(labs) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object),
                                 "n_users": pd.Series([], dtype=np.int64)})
        i, j = np.triu_indices(len(labs), k=1)
        return pd.DataFrame({"a": labs[i], "b": labs[j],
                             "n_users": np.ones(len(i), dtype=np.int64)})

    parts = (ds.map_batches(slim, batch_format="pyarrow")
             .groupby(key, num_partitions=default_partitions())
             .map_groups(pairs, batch_format="pandas"))
    return combine_partials(parts, keys=["a", "b"], value_cols=["n_users"],
                            mode=mode)


def od_gravity(ds, key: str = "user_id", ts: str = "ts",
               id_col: str = "event_id", cell: str = "cell",
               mode: str = "hash"):
    """Gravity-model deviation of the OD flow matrix: per (from, to)
    pair, ``ratio = n_ij * T / (row_i * col_j)`` — observed over the
    independence expectation built from the matrix's own margins
    (T = total transitions, row_i = outflow of i, col_j = inflow of j).
    ratio > 1 flags corridors with MORE flow than the margins predict.

    All inputs are exact int64 counts (the od_matrix combine) and the
    ratio is one IEEE division, so a SQL oracle matches bit-for-bit.
    The margin/ratio step runs on the OD matrix itself — summary-sized
    (occupied cell pairs), so a driver pandas finish, exactly like the
    other summary-result composites.
    """
    od = od_matrix(ds, key=key, ts=ts, id_col=id_col, cell=cell,
                   mode=mode)
    df = od.to_pandas() if hasattr(od, "to_pandas") else od
    df = df.astype({"cell_from": np.int64, "cell_to": np.int64,
                    "n": np.int64})
    total = int(df["n"].sum())
    row = df.groupby("cell_from")["n"].sum()
    col = df.groupby("cell_to")["n"].sum()
    row_n = row.loc[df["cell_from"]].to_numpy().astype(np.int64)
    col_n = col.loc[df["cell_to"]].to_numpy().astype(np.int64)
    n = df["n"].to_numpy()
    ratio = (n * total).astype(np.float64) / (row_n * col_n).astype(
        np.float64)
    return pd.DataFrame({
        "cell_from": df["cell_from"].to_numpy(),
        "cell_to": df["cell_to"].to_numpy(),
        "n": n,
        "row_n": row_n,
        "col_n": col_n,
        "ratio": ratio,
    }).sort_values(["cell_from", "cell_to"]).reset_index(drop=True)

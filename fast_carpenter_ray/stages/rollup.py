"""Hierarchical ROLLUP aggregation (OLAP multi-level summary).

The reference's BinnedDataframe produces one summary per binned key tuple
(``fast_carpenter/summary/binned_dataframe.py`` — cited for semantics
only); a training-data curation dashboard additionally wants every
PREFIX level of the hierarchy (e.g. (day, hour), (day), ()) in one pass.

Ray-native shape — the data is scanned ONCE:

1. per-batch partial aggregate at the FINEST level (vectorized pandas
   groupby inside ``map_batches``);
2. one combine (``agg.combine_partials``; tree or hash, caller-routed by
   key cardinality like every other aggregate in this engine);
3. each coarser level derives from the NEXT-FINER summary — a cascade of
   combines over already-summary-sized tables, never a re-scan of the
   input;
4. rolled-up key columns take the sentinel ``-1`` (all-int output: the
   SQL oracle reproduces it via ``CASE WHEN GROUPING(k)=1 THEN -1``,
   and the hash compare never meets a NULL/NaN dtype pothole).

Aggregates are integer ``sum``s and ``count``s, so every level is exact
in any combination order.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["rollup", "cube"]


def rollup(ds, keys: Sequence[str], sums: Sequence[str],
           mode: str = "tree", count_col: str = "n"):
    """All-levels ROLLUP over integer ``keys``: one row per key prefix
    (finest -> grand total), rolled-up keys = -1.

    Returns a pandas frame (levels are summary-sized by definition of a
    rollup; the hash path keeps the FINEST combine distributed and only
    the summaries reach the driver).
    """
    from ..agg import combine_partials

    keys = list(keys)
    sums = list(sums)
    val_cols = sums + [count_col]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + sums).to_pandas()
        df[count_col] = np.int64(1)
        out = df.groupby(keys, sort=False)[val_cols].sum().reset_index()
        for c in keys + val_cols:
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    fine = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=keys, value_cols=val_cols, mode=mode)
    if not isinstance(fine, pd.DataFrame):
        fine = fine.to_pandas()  # hash mode returns a (summary) Dataset

    levels: List[pd.DataFrame] = []
    cur = fine.copy()
    cur["_lvl"] = np.int64(len(keys))
    levels.append(cur)
    prev = fine
    for depth in range(len(keys) - 1, -1, -1):
        pk = keys[:depth]
        if pk:
            nxt = prev.groupby(pk, sort=False)[val_cols].sum().reset_index()
        else:
            nxt = prev[val_cols].sum().to_frame().T
        for k in keys[depth:]:
            nxt[k] = np.int64(-1)
        for c in keys + val_cols:
            nxt[c] = nxt[c].astype(np.int64)
        nxt["_lvl"] = np.int64(depth)
        levels.append(nxt[keys + val_cols + ["_lvl"]])
        prev = nxt[pk + val_cols] if pk else nxt
    out = pd.concat([lv[keys + val_cols + ["_lvl"]] for lv in levels],
                    ignore_index=True)
    return out.sort_values(keys + ["_lvl"]).reset_index(drop=True)


def cube(ds, keys: Sequence[str], sums: Sequence[str],
         mode: str = "tree", count_col: str = "n"):
    """All-subsets CUBE over integer ``keys``: one row per grouping set,
    rolled-up keys = -1, ``_gset`` = the GROUPING bitmask (bit i set =
    keys[i] rolled up, matching SQL's multi-arg GROUPING order).

    Same one-scan shape as :func:`rollup`; every grouping set derives
    from the FINEST summary, never from a re-scan.
    """
    from itertools import combinations

    from ..agg import combine_partials

    keys = list(keys)
    sums = list(sums)
    val_cols = sums + [count_col]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(keys + sums).to_pandas()
        df[count_col] = np.int64(1)
        out = df.groupby(keys, sort=False)[val_cols].sum().reset_index()
        for c in keys + val_cols:
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    fine = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=keys, value_cols=val_cols, mode=mode)
    if not isinstance(fine, pd.DataFrame):
        fine = fine.to_pandas()

    levels: List[pd.DataFrame] = []
    for r in range(len(keys), -1, -1):
        for kept in combinations(range(len(keys)), r):
            pk = [keys[i] for i in kept]
            if pk:
                g = fine.groupby(pk, sort=False)[val_cols].sum().reset_index()
            else:
                g = fine[val_cols].sum().to_frame().T
            gset = 0
            for i in range(len(keys)):
                if i not in kept:
                    g[keys[i]] = np.int64(-1)
                    gset |= 1 << (len(keys) - 1 - i)
            for c in keys + val_cols:
                g[c] = g[c].astype(np.int64)
            g["_gset"] = np.int64(gset)
            levels.append(g[keys + val_cols + ["_gset"]])
    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(keys + ["_gset"]).reset_index(drop=True)

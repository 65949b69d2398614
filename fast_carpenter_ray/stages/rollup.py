"""Hierarchical ROLLUP / CUBE aggregation (OLAP multi-level summary).

The reference's BinnedDataframe produces one summary per binned key tuple
(``fast_carpenter/summary/binned_dataframe.py`` — cited for semantics
only); a training-data curation dashboard additionally wants every
PREFIX level (ROLLUP) or every SUBSET (CUBE) of the hierarchy in one
pass.

Ray-native shape — the data is scanned ONCE:

1. per-batch partial aggregate at the FINEST level (vectorized pandas
   groupby inside ``map_batches``);
2. one combine (``agg.combine_partials``; tree or hash, caller-routed by
   key cardinality like every other aggregate in this engine);
3. each coarser grouping set derives from the FINE summary, never from a
   re-scan of the input.  ``mode="tree"`` (summary-sized key spaces)
   cascades on the driver and returns a pandas frame; ``mode="hash"``
   (key spaces that scale with the data) NEVER materializes the fine
   table on the driver — each grouping set is its own distributed hash
   combine over the fine Dataset and the result is the streamed UNION of
   all sets, returned as a Dataset;
4. rolled-up key columns take the sentinel ``-1`` (all-int output: the
   SQL oracle reproduces it via ``CASE WHEN GROUPING(k)=1 THEN -1``,
   and the hash compare never meets a NULL/NaN dtype pothole).

Aggregates are integer ``sum``s and ``count``s, so every level is exact
in any combination order.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["rollup", "cube"]


def _fine_combine(ds, keys, sums, count_col, mode):
    from ..agg import combine_partials

    val_cols = list(sums) + [count_col]

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(list(keys) + list(sums)).to_pandas()
        df[count_col] = np.int64(1)
        out = df.groupby(list(keys), sort=False)[val_cols].sum().reset_index()
        for c in list(keys) + val_cols:
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=list(keys), value_cols=val_cols, mode=mode)


def _grouping_sets(keys):
    """ROLLUP prefixes, finest first: [keys, keys[:-1], ..., []]."""
    return [keys[:d] for d in range(len(keys), -1, -1)]


def _cube_sets(keys):
    from itertools import combinations

    out = []
    for r in range(len(keys), -1, -1):
        for kept in combinations(range(len(keys)), r):
            out.append([keys[i] for i in kept])
    return out


def _set_tag(keys, pk, kind):
    """The grouping-set label column: prefix depth for ROLLUP (_lvl),
    SQL GROUPING bitmask for CUBE (_gset)."""
    if kind == "rollup":
        return "_lvl", len(pk)
    gset = 0
    for i, k in enumerate(keys):
        if k not in pk:
            gset |= 1 << (len(keys) - 1 - i)
    return "_gset", gset


def _driver_sets(fine: pd.DataFrame, keys, val_cols, sets, kind):
    """tree mode: cascade/derive every grouping set from the driver-side
    fine summary."""
    levels: List[pd.DataFrame] = []
    for pk in sets:
        if pk == keys:
            g = fine.copy()
        elif pk:
            g = fine.groupby(pk, sort=False)[val_cols].sum().reset_index()
        else:
            g = fine[val_cols].sum().to_frame().T
        tag, tv = _set_tag(keys, pk, kind)
        for k in keys:
            if k not in pk:
                g[k] = np.int64(-1)
        for c in keys + val_cols:
            g[c] = g[c].astype(np.int64)
        g[tag] = np.int64(tv)
        levels.append(g[keys + val_cols + [tag]])
    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(keys + [tag]).reset_index(drop=True)


def _distributed_sets(fine, keys, val_cols, sets, kind):
    """hash mode: every grouping set is its own distributed combine over
    the (materialized, reused) fine Dataset; nothing reaches the driver.
    Returns the unioned Dataset."""
    from ..agg import combine_partials

    fine = fine.materialize()
    parts = []
    for pk in sets:
        tag, tv = _set_tag(keys, pk, kind)

        def finish(batch: pa.Table, pk=tuple(pk), tag=tag, tv=tv) -> pa.Table:
            df = batch.to_pandas()
            for k in keys:
                if k not in pk:
                    df[k] = np.int64(-1)
            df[tag] = np.int64(tv)
            for c in keys + val_cols + [tag]:
                df[c] = df[c].astype(np.int64)
            return pa.Table.from_pandas(df[keys + val_cols + [tag]],
                                        preserve_index=False)

        if pk == keys:
            lvl = fine
        elif pk:
            lvl = combine_partials(fine.select_columns(list(pk) + val_cols),
                                   keys=list(pk), value_cols=val_cols,
                                   mode="hash")
        else:
            # grand total: per-block shrink + one tiny combine; a single
            # row can live on the driver by definition
            lvl = combine_partials(
                fine.map_batches(
                    lambda t: pa.table({"_g": pa.array([0], pa.int64()),
                                        **{c: pa.array(
                                            [t[c].to_pandas().sum()],
                                            pa.int64()) for c in val_cols}}),
                    batch_format="pyarrow"),
                keys=["_g"], value_cols=val_cols, mode="hash").drop_columns(
                ["_g"])
        parts.append(lvl.map_batches(finish, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _multi_level(ds, keys, sums, mode, count_col, kind):
    keys = list(keys)
    sums = list(sums)
    val_cols = sums + [count_col]
    sets = _grouping_sets(keys) if kind == "rollup" else _cube_sets(keys)
    fine = _fine_combine(ds, keys, sums, count_col, mode)
    if mode == "tree":
        # combine_partials(tree) guards the driver-row budget itself
        fine = fine if isinstance(fine, pd.DataFrame) else fine.to_pandas()
        if fine.empty and len(fine.columns) == 0:
            # Ray's to_pandas drops the schema on zero rows — rebuild
            fine = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in keys + val_cols})
        return _driver_sets(fine, keys, val_cols, sets, kind)
    return _distributed_sets(fine, keys, val_cols, sets, kind)


def rollup(ds, keys: Sequence[str], sums: Sequence[str],
           mode: str = "tree", count_col: str = "n"):
    """All-levels ROLLUP over integer ``keys``: one row per key prefix
    (finest -> grand total), rolled-up keys = -1, ``_lvl`` = prefix
    depth.

    ``mode="tree"`` returns a sorted pandas frame (summary-sized
    contract); ``mode="hash"`` returns an UNSORTED Dataset and never
    materializes the fine level on the driver.
    """
    return _multi_level(ds, keys, sums, mode, count_col, "rollup")


def cube(ds, keys: Sequence[str], sums: Sequence[str],
         mode: str = "tree", count_col: str = "n"):
    """All-subsets CUBE over integer ``keys``: one row per grouping set,
    rolled-up keys = -1, ``_gset`` = the GROUPING bitmask (bit i set =
    keys[i] rolled up, matching SQL's multi-arg GROUPING order).

    Same tree/hash contract as :func:`rollup`.
    """
    return _multi_level(ds, keys, sums, mode, count_col, "cube")

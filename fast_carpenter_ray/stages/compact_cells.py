"""Hierarchical cell-set compaction (the H3 ``compact_cells`` analog).

Given a point stream, produce the MINIMAL multi-resolution cell set
covering exactly the occupied cells: wherever all four children of a
coarser cell are occupied, the parent replaces them, recursively up to
``min_res``.  This is the canonical "tile pyramid" reduction a
tiling/serving layer runs after zonal assignment (cf. the north star's
raster<->vector zonal tiling; reference analogue: the BinnedDataframe
summary collapse, ``fast_carpenter/summary/binned_dataframe.py``, which
densifies bins — compaction is its sparse inverse).

Shape: the point stream is shrunk ONCE to its distinct-cell set via a
distributed hash combine (``agg.combine_partials(mode="hash")`` — no
driver materialization of anything row-count-sized).  Then one tiny
``groupby(parent)`` per level over the CELL SET (never the points):
groups are <= 4 rows; complete quads promote, the rest emit.  The level
result is ``materialize()``d before branching into kept/promoted — the
materialized set is bounded by the occupied-cell count at that level
(<= 4**res, and shrinking per level), NOT by the input row count, so the
documented no-mid-pipeline-materialization rule is respected.

Cell ids follow ``geo/cells.py``: ``cell = iy * 2**res + ix``; the
parent at ``res-1`` is ``(iy >> 1) * 2**(res-1) + (ix >> 1)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["compact_cells"]


def compact_cells(ds, cell: str = "cell", res: int = 6, min_res: int = 4):
    """Compact the distinct cells of ``ds[cell]`` (at resolution ``res``)
    up to ``min_res``.  Returns a Dataset of ``(cell, res)`` int64 rows —
    the minimal exact cover.  Input cells < 0 (missing geo) are dropped.
    """
    if min_res < 0 or min_res > res:
        raise ValueError("compact_cells: need 0 <= min_res <= res")
    from ..agg import combine_partials, default_partitions

    np_ = default_partitions()

    def distinct_batch(batch: pa.Table) -> pa.Table:
        c = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.unique(c[c >= 0])
        return pa.table({cell: pa.array(c),
                         "n": pa.array(np.ones(len(c), dtype=np.int64))})

    level = combine_partials(
        ds.map_batches(distinct_batch, batch_format="pyarrow"),
        keys=[cell], value_cols=["n"], mode="hash",
        num_partitions=np_).select_columns([cell])

    outputs = []
    for r in range(res, min_res, -1):
        n_r, n_p = 1 << r, 1 << (r - 1)

        def add_parent(batch: pa.Table, n_r=n_r, n_p=n_p) -> pa.Table:
            c = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
            p = (c // n_r // 2) * n_p + (c % n_r) // 2
            return pa.table({cell: pa.array(c), "_p": pa.array(p)})

        def decide(group, r=r):
            import pandas as pd

            if len(group) == 4:  # complete quad -> promote the parent
                return pd.DataFrame({
                    cell: group["_p"].iloc[:1].astype(np.int64),
                    "res": np.array([r - 1], dtype=np.int64),
                    "_prom": [True]})
            return pd.DataFrame({
                cell: group[cell].astype(np.int64),
                "res": np.full(len(group), r, dtype=np.int64),
                "_prom": np.zeros(len(group), dtype=bool)})

        decided = (level.map_batches(add_parent, batch_format="pyarrow")
                   .groupby("_p", num_partitions=np_)
                   .map_groups(decide, batch_format="pandas")
                   .materialize())
        outputs.append(decided.map_batches(
            lambda t: t.filter(pc.invert(t["_prom"])).select([cell, "res"]),
            batch_format="pyarrow"))
        level = decided.map_batches(
            lambda t: t.filter(t["_prom"]).select([cell]),
            batch_format="pyarrow")

    # whatever survived to min_res is output as-is
    outputs.append(level.map_batches(
        lambda t: t.append_column(
            "res", pa.array(np.full(len(t), min_res, dtype=np.int64))),
        batch_format="pyarrow"))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    return out

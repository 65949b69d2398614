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

__all__ = ["compact_cells", "uncompact_cells", "tile_pyramid", "quadtree_leaves"]


#: Cell spaces up to this size (4**res <= budget, i.e. res <= 11) are
#: summary-sized: the distinct-cell table fits a driver merge and the
#: level recursion runs as local NumPy — same routing rule as
#: ``agg.combine_partials`` (tree for summary-sized keys, hash beyond).
_BROADCAST_CELL_BUDGET = 1 << 22


def _compact_local(cells: np.ndarray, res: int, min_res: int):
    """Vectorized single-machine compaction of a distinct cell array."""
    out_c, out_r = [], []
    level = np.unique(cells[cells >= 0])
    for r in range(res, min_res, -1):
        n, pn = 1 << r, 1 << (r - 1)
        p = (level // n // 2) * pn + (level % n) // 2
        ps, cnt = np.unique(p, return_counts=True)
        comp = cnt == 4
        keep = ~comp[np.searchsorted(ps, p)]
        out_c.append(level[keep])
        out_r.append(np.full(int(keep.sum()), r, dtype=np.int64))
        level = ps[comp]
    out_c.append(level)
    out_r.append(np.full(len(level), min_res, dtype=np.int64))
    return np.concatenate(out_c), np.concatenate(out_r)


def compact_cells(ds, cell: str = "cell", res: int = 6, min_res: int = 4,
                  mode: str = "auto"):
    """Compact the distinct cells of ``ds[cell]`` (at resolution ``res``)
    up to ``min_res``.  Returns a Dataset of ``(cell, res)`` int64 rows —
    the minimal exact cover.  Input cells < 0 (missing geo) are dropped.

    ``mode="auto"`` routes by cell-space size: for ``4**res`` within the
    broadcast budget (res <= 11) the point stream is shrunk to per-block
    distinct partials, driver-merged (bounded by the CELL space, never the
    row count) and compacted as local NumPy — zero shuffles.  Beyond the
    budget (``mode="shuffle"``) each level is a distributed quad groupby.
    Both paths are bit-identical (pytest pins it).
    """
    if min_res < 0 or min_res > res:
        raise ValueError("compact_cells: need 0 <= min_res <= res")
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"compact_cells: unknown mode={mode!r}")
    from ..agg import combine_partials, default_partitions

    np_ = default_partitions()

    def distinct_batch(batch: pa.Table) -> pa.Table:
        c = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.unique(c[c >= 0])
        return pa.table({cell: pa.array(c),
                         "n": pa.array(np.ones(len(c), dtype=np.int64))})

    parts = ds.map_batches(distinct_batch, batch_format="pyarrow")

    small = (1 << (2 * res)) <= _BROADCAST_CELL_BUDGET
    if mode == "broadcast" or (mode == "auto" and small):
        import ray.data as rd

        import pandas as pd

        local = combine_partials(parts, keys=[cell], value_cols=["n"],
                                 mode="tree").to_pandas()
        c_out, r_out = _compact_local(
            local[cell].to_numpy().astype(np.int64), res, min_res)
        return rd.from_pandas(pd.DataFrame({cell: c_out, "res": r_out}))

    level = combine_partials(
        parts, keys=[cell], value_cols=["n"], mode="hash",
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


def uncompact_cells(ds, res: int, cell: str = "cell", res_col: str = "res"):
    """Inverse of :func:`compact_cells`: expand a multi-resolution cell
    set back to the uniform ``res`` children (h3 ``uncompact_cells``).

    Pure per-batch vectorized expansion (``np.repeat`` + grid offsets) —
    no shuffle at all; output rows = sum of ``4**(res - r)`` per input.
    ``compact -> uncompact`` round-trips to exactly the occupied cell
    set (pytest pins it).
    """

    def expand(batch: pa.Table) -> pa.Table:
        c = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch[res_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if np.any(r > res):
            raise ValueError(f"uncompact_cells: input res above target {res}")
        n_in = 1 << r                      # per-row source grid width
        depth = res - r
        width = np.int64(1) << depth       # children per axis
        reps = width * width
        idx = np.repeat(np.arange(len(c)), reps)
        starts = np.concatenate(([0], np.cumsum(reps)[:-1]))
        pos = np.arange(int(reps.sum()), dtype=np.int64) - starts[idx]
        w = width[idx]
        iy = (c[idx] // n_in[idx]) * w + pos // w
        ix = (c[idx] % n_in[idx]) * w + pos % w
        return pa.table({cell: pa.array(iy * (1 << res) + ix)})

    return ds.map_batches(expand, batch_format="pyarrow")


def tile_pyramid(ds, cell: str = "cell", res: int = 6, min_res: int = 4,
                 mode: str = "auto"):
    """Multi-resolution tile-count pyramid: occupancy counts per cell at
    EVERY resolution ``min_res..res`` in one pass — what a map-tile
    serving layer precomputes (reference analogue: the BinnedDataframe
    at several binnings, ``fast_carpenter/summary/binned_dataframe.py``,
    run once per resolution; here the coarser levels are rolled up from
    the finest counts without touching the points again).

    Shape: per-batch partial counts at ``res`` + ONE hash combine over
    the points; each coarser level is a parent-sum hash combine over the
    CELL TABLE of the level below (<= 4**r rows — never the points).
    Returns ``(cell, res, n)`` int64 rows.  Cells < 0 are dropped.

    ``mode="auto"``: same size routing as :func:`compact_cells` — within
    the broadcast budget the per-block count partials driver-merge
    (bounded by the cell space) and the rollup is local NumPy with zero
    shuffles; beyond it every level is a distributed hash combine.
    """
    if min_res < 0 or min_res > res:
        raise ValueError("tile_pyramid: need 0 <= min_res <= res")
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"tile_pyramid: unknown mode={mode!r}")
    from ..agg import combine_partials, default_partitions

    np_ = default_partitions()

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        u, n = np.unique(c[c >= 0], return_counts=True)
        return pa.table({cell: pa.array(u),
                         "n": pa.array(n.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    small = (1 << (2 * res)) <= _BROADCAST_CELL_BUDGET
    if mode == "broadcast" or (mode == "auto" and small):
        import pandas as pd
        import ray.data as rd

        local = combine_partials(parts, keys=[cell], value_cols=["n"],
                                 mode="tree").to_pandas()
        c_lvl = local[cell].to_numpy().astype(np.int64)
        n_lvl = local["n"].to_numpy().astype(np.int64)
        frames = [pd.DataFrame({cell: c_lvl,
                                "res": np.full(len(c_lvl), res,
                                               dtype=np.int64),
                                "n": n_lvl})]
        for r in range(res, min_res, -1):
            n_r, n_p = 1 << r, 1 << (r - 1)
            p = (c_lvl // n_r // 2) * n_p + (c_lvl % n_r) // 2
            c_lvl, inv = np.unique(p, return_inverse=True)
            n_lvl = np.bincount(inv, weights=n_lvl).astype(np.int64)
            frames.append(pd.DataFrame({
                cell: c_lvl,
                "res": np.full(len(c_lvl), r - 1, dtype=np.int64),
                "n": n_lvl}))
        return rd.from_pandas(pd.concat(frames, ignore_index=True))

    # each level is branched twice (emitted + rolled up): materialize the
    # CELL TABLE (<= 4**r rows, never the points) so the point scan and
    # earlier combines run exactly once
    level = combine_partials(
        parts, keys=[cell], value_cols=["n"], mode="hash",
        num_partitions=np_).materialize()

    def with_res(lvl, r):
        return lvl.map_batches(
            lambda t, r=r: t.append_column(
                "res", pa.array(np.full(len(t), r, dtype=np.int64)))
            .select([cell, "res", "n"]),
            batch_format="pyarrow")

    out = with_res(level, res)
    for r in range(res, min_res, -1):
        n_r, n_p = 1 << r, 1 << (r - 1)

        def to_parent(batch: pa.Table, n_r=n_r, n_p=n_p) -> pa.Table:
            c = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
            p = (c // n_r // 2) * n_p + (c % n_r) // 2
            return pa.table({cell: pa.array(p), "n": batch["n"]})

        level = combine_partials(
            level.map_batches(to_parent, batch_format="pyarrow"),
            keys=[cell], value_cols=["n"], mode="hash",
            num_partitions=np_).materialize()
        out = out.union(with_res(level, r - 1))
    return out


def quadtree_leaves(ds, cell: str = "cell", res: int = 6, min_res: int = 2,
                    threshold: int = 64, split_budget: int = 5_000_000):
    """Adaptive quadtree tiling by COUNT threshold: starting at
    ``min_res``, any cell holding more than ``threshold`` points splits
    into its occupied children, recursively down to ``res``; everything
    else is a leaf.  Output ``(cell, res, n)`` leaves — the
    variable-resolution cover a tile-serving layer wants (dense cities
    deep, oceans shallow).  Complements :func:`compact_cells`, which
    merges by OCCUPANCY; this splits by LOAD.

    Scale shape: per-level counts are one hash combine over the CELL
    SET at that level (points shrink to max-res counts once; coarser
    levels roll up by integer parent mapping).  The only driver pulls
    are the per-level SPLIT sets, each bounded by ``total_points /
    threshold`` cells (every split cell holds > threshold points) and
    budget-guarded; leaf rows stream out unioned, never pulled.
    """
    if not (0 <= min_res < res):
        raise ValueError("quadtree_leaves: need 0 <= min_res < res")
    if threshold < 1:
        raise ValueError("quadtree_leaves: threshold must be >= 1")
    import ray

    from ..agg import combine_partials, default_partitions
    from ..geo.cells import parent

    def partial(batch: pa.Table) -> pa.Table:
        c = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        u, n = np.unique(c[c >= 0], return_counts=True)
        return pa.table({"cell": pa.array(u),
                         "n": pa.array(n.astype(np.int64))})

    fine = combine_partials(ds.map_batches(partial, batch_format="pyarrow"),
                            keys=["cell"], value_cols=["n"],
                            mode="hash").materialize()

    def level_counts(r: int):
        if r == res:
            return fine

        def up(batch: pa.Table) -> pa.Table:
            c = batch["cell"].to_numpy(zero_copy_only=False)
            return pa.table({"cell": pa.array(parent(c, res, r)),
                             "n": batch["n"]})

        return combine_partials(
            fine.map_batches(up, batch_format="pyarrow"),
            keys=["cell"], value_cols=["n"], mode="hash").materialize()

    counts = {r: level_counts(r) for r in range(min_res, res + 1)}

    def pull_split(level_ds, r: int) -> np.ndarray:
        sp = level_ds.map_batches(
            lambda t: t.filter(pc.greater(t["n"], threshold)),
            batch_format="pyarrow").materialize()
        n_sp = sp.count()
        if n_sp > split_budget:
            raise ValueError(
                f"quadtree_leaves: {n_sp} split cells at res {r} exceed "
                f"the {split_budget} budget — raise threshold (split "
                "count is bounded by points/threshold)")
        if n_sp == 0:
            return np.array([], dtype=np.int64)
        return np.sort(sp.to_pandas()["cell"].to_numpy().astype(np.int64))

    def leaves_of(level_ds, r: int, keep: "np.ndarray | None"):
        """Filter a level to (candidate AND leaf) rows; keep=None means
        every cell is a candidate (the root level)."""
        keep_ref = None if keep is None else ray.put(keep)
        last = r == res

        def f(batch: pa.Table) -> pa.Table:
            c = batch["cell"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = np.ones(len(c), dtype=bool)
            if keep_ref is not None:
                par = parent(c, r, r - 1)
                ks = ray.get(keep_ref)
                pos = np.searchsorted(ks, par)
                inb = pos < ks.size
                m = inb.copy()
                m[inb] = ks[pos[inb]] == par[inb]
            if not last:
                m &= n <= threshold
            return pa.table({
                "cell": pa.array(c[m]),
                "res": pa.array(np.full(int(m.sum()), r, dtype=np.int64)),
                "n": pa.array(n[m])})

        return level_ds.map_batches(f, batch_format="pyarrow")

    out = leaves_of(counts[min_res], min_res, None)
    split = pull_split(counts[min_res], min_res)
    for r in range(min_res + 1, res + 1):
        # candidates at r = occupied children of the previous split set
        keep = split
        if len(keep) == 0:
            break
        out = out.union(leaves_of(counts[r], r, keep))
        if r < res:
            lvl = counts[r].map_batches(
                lambda t, _k=keep, _r=r: _filter_children(t, _k, _r,
                                                          parent),
                batch_format="pyarrow")
            split = pull_split(lvl, r)
    return out


def _filter_children(batch: pa.Table, keep: np.ndarray, r: int,
                     parent_fn) -> pa.Table:
    """Rows of a level whose parent is in the sorted ``keep`` set."""
    c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    par = parent_fn(c, r, r - 1)
    pos = np.searchsorted(keep, par)
    inb = pos < keep.size
    m = inb.copy()
    m[inb] = keep[pos[inb]] == par[inb]
    return pa.table({"cell": pa.array(c[m]), "n": batch["n"].take(
        pa.array(np.nonzero(m)[0]))})

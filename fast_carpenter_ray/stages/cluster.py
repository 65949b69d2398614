"""Grid connected-components clustering (DBSCAN-style cluster detection
over occupied cells).

Labels every occupied cell (occupancy >= ``min_count`` points) with the
MINIMUM cell id of its 8-connected component (Chebyshev adjacency, with
longitude wrap and latitude clamp exactly like ``geo/cells.k_ring``) —
the grid-bucketed equivalent of density clustering: each component is a
contiguous region of occupied tiles (reference analogue: none; this is a
SURVEY §2.5 north-star extension alongside hotspot detection).

Routing mirrors ``compact_cells``: the point stream always shrinks to
per-block (cell, count) partials first; within the broadcast budget
(``4**res`` cells) the component labeling runs as vectorized local NumPy
min-label propagation after a driver merge bounded by the CELL space —
zero shuffles.  Beyond the budget, ``mode="shuffle"`` runs distributed
min-label propagation: per round, every cell scatters its label to its 9
neighbors and a hash combine keeps the min on occupied cells; rounds are
bounded by the component diameter (pointer-free label propagation — the
documented trade-off for arbitrarily large grids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .compact_cells import _BROADCAST_CELL_BUDGET

__all__ = ["cluster_cells", "propagate_min_labels"]

_OFFS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _label_local(occ: np.ndarray, res: int) -> np.ndarray:
    """Vectorized min-label propagation over a sorted occupied-cell array."""
    n = 1 << res
    iy, ix = occ // n, occ % n
    labels = occ.copy()
    # precompute, per offset, (src index, neighbor index) pairs
    pairs = []
    for dy, dx in _OFFS:
        if dy == 0 and dx == 0:
            continue
        ny = iy + dy
        nx = (ix + dx) % n          # lng wraps; lat clamps (drop outside)
        ok = (ny >= 0) & (ny < n)
        cand = ny[ok] * n + nx[ok]
        j = np.searchsorted(occ, cand)
        j = np.clip(j, 0, len(occ) - 1)
        hit = occ[j] == cand
        pairs.append((np.nonzero(ok)[0][hit], j[hit]))
    while True:
        new = labels.copy()
        for src, nbr in pairs:
            np.minimum.at(new, src, labels[nbr])
        if np.array_equal(new, labels):
            return labels
        labels = new


def cluster_cells(ds, cell: str = "cell", res: int = 6, min_count: int = 1,
                  mode: str = "auto", max_rounds: int = 10_000):
    """Label occupied cells with their component minimum; returns
    ``(cell, cluster)`` int64 rows.  Cells < 0 are dropped; cells with
    fewer than ``min_count`` points are not occupied.
    """
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"cluster_cells: unknown mode={mode!r}")
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
        import ray.data as rd

        local = combine_partials(parts, keys=[cell], value_cols=["n"],
                                 mode="tree").to_pandas()
        occ = local.loc[local["n"] >= min_count, cell].to_numpy().astype(
            np.int64)
        occ = np.sort(occ)
        labels = _label_local(occ, res) if len(occ) else occ
        return rd.from_pandas(pd.DataFrame({cell: occ, "cluster": labels}))

    # ---- distributed min-label propagation -----------------------------
    counts = combine_partials(parts, keys=[cell], value_cols=["n"],
                              mode="hash", num_partitions=np_)
    def init_label(t: pa.Table) -> pa.Table:
        f = t.filter(pa.compute.greater_equal(t["n"], min_count))
        return pa.table({cell: f[cell], "label": f[cell]})

    state = counts.map_batches(init_label,
                               batch_format="pyarrow").materialize()
    labels = propagate_min_labels(state, cell=cell, res=res,
                                  num_partitions=np_, max_rounds=max_rounds)
    return labels.map_batches(
        lambda t: pa.table({cell: t[cell], "cluster": t["label"]}),
        batch_format="pyarrow")


def propagate_min_labels(state, cell: str = "cell", res: int = 6,
                         num_partitions=None, max_rounds: int = 10_000):
    """Distributed min-label propagation to a fixpoint over a materialized
    ``(cell, label)`` Dataset (8-connected Chebyshev adjacency, lng wrap /
    lat clamp — ``geo.cells.k_ring`` semantics).  Per round every cell
    scatters its label to its 9 neighbors and a groupby keeps the min on
    the ORIGINAL cell set (labels never leak onto absent cells); rounds
    are bounded by the component diameter.  Shared by
    :func:`cluster_cells` and ``dbscan.dbscan_cells``.
    """
    from ..agg import default_partitions

    np_ = num_partitions if num_partitions is not None else (
        default_partitions())

    n_grid = 1 << res

    def scatter(batch: pa.Table) -> pa.Table:
        c = batch[cell].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy, ix = c // n_grid, c % n_grid
        outs_c, outs_l = [], []
        for dy, dx in _OFFS:
            ny = iy + dy
            nx = (ix + dx) % n_grid
            ok = (ny >= 0) & (ny < n_grid)
            outs_c.append(ny[ok] * n_grid + nx[ok])
            outs_l.append(lab[ok])
        return pa.table({cell: pa.array(np.concatenate(outs_c)),
                         "label": pa.array(np.concatenate(outs_l))})

    sent = np.int64(1) << 62  # > any cell id; Min ignores it when real

    def occupied_filter(labels_ds):
        # inner-join the propagated minima back onto the occupied set so
        # labels never leak onto unoccupied cells.  Fully vectorized: the
        # occupied marker rows carry a sentinel label (the scatter always
        # includes the cell's own current label via the (0,0) offset, so
        # Min over real labels is correct) and occ=1; one native hash
        # aggregate keeps Min(label) + Max(occ), then a filter drops the
        # unoccupied scatter targets.
        from ray.data.aggregate import Max, Min

        tagged_occ = state.map_batches(
            lambda t: pa.table({cell: t[cell],
                                "label": pa.array(
                                    np.full(len(t), sent, dtype=np.int64)),
                                "occ": pa.array(
                                    np.ones(len(t), dtype=np.int64))}),
            batch_format="pyarrow")
        tagged_lab = labels_ds.map_batches(
            lambda t: pa.table({cell: t[cell], "label": t["label"],
                                "occ": pa.array(
                                    np.zeros(len(t), dtype=np.int64))}),
            batch_format="pyarrow")

        agg = (tagged_lab.union(tagged_occ)
               .groupby(cell, num_partitions=np_)
               .aggregate(Min("label"), Max("occ")))

        def finish(t: pa.Table) -> pa.Table:
            f = t.filter(pa.compute.equal(t["max(occ)"], 1))
            return pa.table({cell: f[cell], "label": f["min(label)"]})

        return agg.map_batches(finish, batch_format="pyarrow")

    def label_sum(st) -> int:
        # labels only ever decrease; an unchanged sum means a fixpoint
        return int(st.map_batches(
            lambda t: pa.table({"s": pa.array(
                [t["label"].to_numpy(zero_copy_only=False).sum()])}),
            batch_format="pyarrow").sum("s"))

    prev = label_sum(state)
    for _ in range(max_rounds):
        nxt = occupied_filter(
            state.map_batches(scatter, batch_format="pyarrow")).materialize()
        cur = label_sum(nxt)
        state = nxt
        if cur == prev:
            break
        prev = cur
    return state

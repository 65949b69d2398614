"""Multi-source BFS distance over the occupied-cell graph.

The isochrone primitive: hop distance from SEED cells to every other
occupied cell, where a hop moves between queen-adjacent cells
(longitude wraps, latitude rows drop — ``geo.cells.k_ring`` semantics)
and paths may only pass THROUGH occupied cells (the passable set).
Unlike plain Chebyshev distance, this is genuine graph BFS: a gap in
the occupied set blocks the path around it.

Scale shape: the corpus shrinks to its DISTINCT occupied cells (one
combine — the only distributed pass over points); the BFS itself runs
on the driver as dense-grid frontier dilation (8 vectorized shifted
ORs per round, masked to the passable set) — bounded by the 4^res
summary-size guard, the same regime contract as
``spatial_autocorr``'s tree mode.  Data-scaled cell spaces would need
round-based label propagation (the ``distributed_components``
machinery); that is out of scope here and guarded explicitly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["grid_bfs_distance", "grid_dijkstra_distance"]


def grid_bfs_distance(ds, seed_cells: np.ndarray, res: int,
                      lat_col: str = "lat", lng_col: str = "lng",
                      max_dist: int = 64,
                      num_partitions: Optional[int] = None) -> pd.DataFrame:
    """Pandas frame ``(cell, dist)`` — BFS hop distance from the
    nearest occupied seed cell, for every occupied cell reachable
    within ``max_dist`` hops through occupied cells.  Seeds that are
    not occupied are ignored (nothing to stand on)."""
    from ..agg import combine_partials
    from ..geo.cells import cell_id

    n_grid = 1 << res
    if (1 << (2 * res)) > 65536:
        raise ValueError(
            "grid_bfs_distance: 4^res exceeds the 65536-cell driver-grid "
            "budget — coarsen res or run round-based label propagation")
    if max_dist < 0:
        raise ValueError("grid_bfs_distance: max_dist must be >= 0")

    def partial(batch: pa.Table) -> pa.Table:
        cells = cell_id(batch[lat_col].to_numpy(zero_copy_only=False),
                        batch[lng_col].to_numpy(zero_copy_only=False), res)
        cells = np.unique(cells[cells >= 0])
        return pa.table({
            "cell": pa.array(cells, type=pa.int64()),
            "one": pa.array(np.ones(len(cells), dtype=np.int64)),
        })

    occ_df = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["cell"], value_cols=["one"], mode="tree").to_pandas()
    occ_cells = occ_df["cell"].to_numpy()
    passable = np.zeros((n_grid, n_grid), dtype=bool)
    passable[occ_cells // n_grid, occ_cells % n_grid] = True

    seeds = np.asarray(seed_cells, dtype=np.int64)
    seeds = seeds[np.isin(seeds, occ_cells)]
    dist = np.full((n_grid, n_grid), -1, dtype=np.int64)
    frontier = np.zeros((n_grid, n_grid), dtype=bool)
    frontier[seeds // n_grid, seeds % n_grid] = True
    dist[frontier] = 0

    for d in range(1, max_dist + 1):
        if not frontier.any():
            break
        grown = np.zeros_like(frontier)
        for dy in (-1, 0, 1):
            # lng wraps via roll; lat rows shift and drop
            rolled_m1 = np.roll(frontier, -1, axis=1)
            rolled_p1 = np.roll(frontier, 1, axis=1)
            for src in (frontier, rolled_m1, rolled_p1):
                if dy == 0:
                    grown |= src
                elif dy > 0:
                    grown[dy:, :] |= src[:-dy, :]
                else:
                    grown[:dy, :] |= src[-dy:, :]
        frontier = grown & passable & (dist < 0)
        dist[frontier] = d

    iy, ix = occ_cells // n_grid, occ_cells % n_grid
    dv = dist[iy, ix]
    keep = dv >= 0
    return pd.DataFrame({
        "cell": pd.Series(occ_cells[keep], dtype="int64"),
        "dist": pd.Series(dv[keep], dtype="int64"),
    }).sort_values("cell").reset_index(drop=True)


def grid_dijkstra_distance(ds, seed_cells: np.ndarray, res: int,
                           lat_col: str = "lat", lng_col: str = "lng",
                           dense_threshold: int = 4, max_cost: int = 12,
                           num_partitions: Optional[int] = None) -> pd.DataFrame:
    """Weighted isochrone: minimum total ENTER-cost from the nearest
    occupied seed cell through occupied cells, where entering a cell
    costs ``1`` normally and ``2`` when the cell holds at least
    ``dense_threshold`` points (congestion).  King-move adjacency with
    longitude wrap — the same graph as :func:`grid_bfs_distance`; with
    ``dense_threshold = inf`` the two coincide.

    Exact integers throughout.  The relaxation is Bellman-Ford over the
    driver grid (same 65536-cell budget as the BFS): ``max_cost`` sweeps
    suffice because every edge costs >= 1, each a vectorized 8-direction
    shifted-min — no heap, no per-cell Python.  Cells whose best cost
    exceeds ``max_cost`` are excluded (the SQL recursion bound).

    Returns a pandas frame ``(cell, dist)`` over occupied cells.
    """
    from ..agg import combine_partials
    from ..geo.cells import cell_id

    n_grid = 1 << res
    if (1 << (2 * res)) > 65536:
        raise ValueError(
            "grid_dijkstra_distance: 4^res exceeds the 65536-cell "
            "driver-grid budget — coarsen res")
    if max_cost < 0:
        raise ValueError("grid_dijkstra_distance: max_cost must be >= 0")

    def partial(batch: pa.Table) -> pa.Table:
        cells = cell_id(batch[lat_col].to_numpy(zero_copy_only=False),
                        batch[lng_col].to_numpy(zero_copy_only=False), res)
        cells = cells[cells >= 0]
        items, counts = np.unique(cells, return_counts=True)
        return pa.table({
            "cell": pa.array(items, type=pa.int64()),
            "n": pa.array(counts.astype(np.int64)),
        })

    occ_df = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["cell"], value_cols=["n"], mode="tree").to_pandas()
    occ_cells = occ_df["cell"].to_numpy()
    occ_n = occ_df["n"].to_numpy()
    passable = np.zeros((n_grid, n_grid), dtype=bool)
    passable[occ_cells // n_grid, occ_cells % n_grid] = True
    cost = np.ones((n_grid, n_grid), dtype=np.int64)
    dense = occ_n >= dense_threshold
    cost[occ_cells[dense] // n_grid, occ_cells[dense] % n_grid] = 2

    seeds = np.asarray(seed_cells, dtype=np.int64)
    seeds = seeds[np.isin(seeds, occ_cells)]
    big = np.int64(np.iinfo(np.int64).max // 4)
    dist = np.full((n_grid, n_grid), big, dtype=np.int64)
    dist[seeds // n_grid, seeds % n_grid] = 0

    for _ in range(max_cost):
        prev = dist
        best_nb = np.full_like(dist, big)
        for dy in (-1, 0, 1):
            rolled = [dist, np.roll(dist, -1, axis=1),
                      np.roll(dist, 1, axis=1)]
            for src in rolled:
                if dy == 0:
                    if src is dist:
                        continue  # self is not a neighbor
                    cand = src
                elif dy > 0:
                    cand = np.full_like(dist, big)
                    cand[dy:, :] = src[:-dy, :]
                else:
                    cand = np.full_like(dist, big)
                    cand[:dy, :] = src[-dy:, :]
                best_nb = np.minimum(best_nb, cand)
        relaxed = np.minimum(dist, best_nb + cost)
        dist = np.where(passable, relaxed, big)
        dist[seeds // n_grid, seeds % n_grid] = 0
        if np.array_equal(dist, prev):
            break

    iy, ix = occ_cells // n_grid, occ_cells % n_grid
    dv = dist[iy, ix]
    keep = dv <= max_cost
    return (pd.DataFrame({"cell": occ_cells[keep],
                          "dist": dv[keep].astype(np.int64)})
            .sort_values("cell").reset_index(drop=True))

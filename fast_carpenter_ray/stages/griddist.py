"""Multi-source shortest-path distance over the occupied-cell graph.

The isochrone primitives: distance from SEED cells to every other
occupied cell, where a step moves between queen-adjacent cells
(longitude wraps, latitude rows drop — ``geo.cells.k_ring`` semantics)
and paths may only pass THROUGH occupied cells (the passable set).
Unlike plain Chebyshev distance, this is genuine graph search: a gap in
the occupied set blocks the path around it.

* :func:`grid_bfs_distance` — unit edge cost (hop count).
* :func:`grid_dijkstra_distance` — integer ENTER-costs: congested cells
  (>= ``dense_threshold`` points) cost 2, others 1.  With an
  unreachable threshold the two coincide exactly (pinned by test).

Scale shape: the corpus shrinks to its occupied-cell counts (one
combine — the only distributed pass over points); the search itself
runs on the driver as dense-grid Bellman-Ford relaxation (8 vectorized
shifted-mins per sweep, masked to the passable set; every edge costs
>= 1 so ``max_cost`` sweeps reach the fixpoint) — bounded by the 4^res
summary-size guard, the same regime contract as ``spatial_autocorr``'s
tree mode.  Data-scaled cell spaces would need round-based label
propagation (the ``distributed_components`` machinery); that is out of
scope here and guarded explicitly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["grid_bfs_distance", "grid_dijkstra_distance"]

_BIG = np.int64(np.iinfo(np.int64).max // 4)


def _min_cost_sweep(ds, seed_cells, res, lat_col, lng_col,
                    dense_threshold, max_cost, name):
    """Shared core: occupied-cell counts -> driver Bellman-Ford over the
    wrap-adjacency grid with integer enter-costs.  Returns (cell, dist)
    for occupied cells whose best cost is <= max_cost."""
    from ..agg import combine_partials
    from ..geo.cells import cell_id

    n_grid = 1 << res
    if (1 << (2 * res)) > 65536:
        raise ValueError(
            f"{name}: 4^res exceeds the 65536-cell driver-grid budget — "
            f"coarsen res or run round-based label propagation")
    if max_cost < 0:
        raise ValueError(f"{name}: the distance bound must be >= 0")

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
    iy, ix = occ_cells // n_grid, occ_cells % n_grid
    passable = np.zeros((n_grid, n_grid), dtype=bool)
    passable[iy, ix] = True
    cost = np.ones((n_grid, n_grid), dtype=np.int64)
    if dense_threshold is not None:
        dense = occ_n >= dense_threshold
        cost[iy[dense], ix[dense]] = 2

    seeds = np.asarray(seed_cells, dtype=np.int64)
    seeds = seeds[np.isin(seeds, occ_cells)]
    dist = np.full((n_grid, n_grid), _BIG, dtype=np.int64)
    dist[seeds // n_grid, seeds % n_grid] = 0

    for _ in range(max_cost):
        prev = dist
        # lng wraps via roll; lat rows shift and drop — computed ONCE
        # per sweep, reused by all three dy shifts
        rolled = (dist, np.roll(dist, -1, axis=1), np.roll(dist, 1, axis=1))
        best_nb = np.full_like(dist, _BIG)
        for dy in (-1, 0, 1):
            for src in rolled:
                if dy == 0:
                    if src is rolled[0]:
                        continue  # self is not a neighbor
                    cand = src
                elif dy > 0:
                    cand = np.full_like(dist, _BIG)
                    cand[dy:, :] = src[:-dy, :]
                else:
                    cand = np.full_like(dist, _BIG)
                    cand[:dy, :] = src[-dy:, :]
                best_nb = np.minimum(best_nb, cand)
        relaxed = np.minimum(dist, best_nb + cost)
        dist = np.where(passable, relaxed, _BIG)
        dist[seeds // n_grid, seeds % n_grid] = 0
        if np.array_equal(dist, prev):
            break

    dv = dist[iy, ix]
    keep = dv <= max_cost
    return pd.DataFrame({
        "cell": pd.Series(occ_cells[keep], dtype="int64"),
        "dist": pd.Series(dv[keep], dtype="int64"),
    }).sort_values("cell").reset_index(drop=True)


def grid_bfs_distance(ds, seed_cells: np.ndarray, res: int,
                      lat_col: str = "lat", lng_col: str = "lng",
                      max_dist: int = 64,
                      num_partitions: Optional[int] = None) -> pd.DataFrame:
    """Pandas frame ``(cell, dist)`` — BFS hop distance from the
    nearest occupied seed cell, for every occupied cell reachable
    within ``max_dist`` hops through occupied cells.  Seeds that are
    not occupied are ignored (nothing to stand on).

    Unit-cost case of the shared min-cost sweep (with unit edges the
    Bellman-Ford fixpoint IS the BFS distance)."""
    return _min_cost_sweep(ds, seed_cells, res, lat_col, lng_col,
                           dense_threshold=None, max_cost=max_dist,
                           name="grid_bfs_distance")


def grid_dijkstra_distance(ds, seed_cells: np.ndarray, res: int,
                           lat_col: str = "lat", lng_col: str = "lng",
                           dense_threshold: int = 4, max_cost: int = 12,
                           num_partitions: Optional[int] = None) -> pd.DataFrame:
    """Weighted isochrone: minimum total ENTER-cost from the nearest
    occupied seed cell through occupied cells, where entering a cell
    costs ``1`` normally and ``2`` when the cell holds at least
    ``dense_threshold`` points (congestion).  King-move adjacency with
    longitude wrap — the same graph as :func:`grid_bfs_distance`.

    Exact integers throughout; cells whose best cost exceeds
    ``max_cost`` are excluded (the SQL recursion bound).  Returns a
    pandas frame ``(cell, dist)`` over occupied cells.
    """
    return _min_cost_sweep(ds, seed_cells, res, lat_col, lng_col,
                           dense_threshold=dense_threshold,
                           max_cost=max_cost,
                           name="grid_dijkstra_distance")

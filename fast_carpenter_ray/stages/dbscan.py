"""Grid DBSCAN: density clustering over cells with core / border / noise.

Cell-bucketed DBSCAN (the GriDBSCAN family, public literature): points
bucket into grid cells at resolution ``res``; a cell is CORE when the
point count over its 3x3 Chebyshev neighborhood (lng wrap, lat clamp —
``geo.cells.k_ring`` semantics, own cell included) reaches ``min_pts``.
Clusters are connected components of core cells (8-adjacency), labeled by
the minimum core cell id.  An occupied non-core cell adjacent to at least
one core cell is BORDER and joins the minimum cluster label among its
adjacent cores; the remaining occupied cells are NOISE (cluster = -1).

This extends :mod:`cluster` (plain occupancy connected components) with
the density threshold — the distinction DBSCAN adds over flood fill.
Reference analogue: none; a SURVEY §2.5 north-star extension alongside
``hotspot_cells`` / ``cluster_cells``.

Shape (both paths start from :func:`hotspot.hotspot_cells`: per-batch
count partials -> ONE hash combine -> symmetric ring scatter -> ONE
groupby => ``(cell, n, nbhd_n)``):

* broadcast (``4**res`` within the cell budget): the per-cell table is
  bounded by the CELL SPACE, not the data — pull it once and run the
  vectorized local min-label propagation + border attach;
* shuffle (arbitrarily large grids): core labels via the shared
  :func:`cluster.propagate_min_labels` rounds, then ONE tagged-union
  groupby joins counts + core labels + scattered border candidates
  without ever materializing the grid on the driver.

Output columns: ``cell, n, nbhd_n, role, cluster`` with role 0=core,
1=border, 2=noise (int64), cluster -1 for noise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .cluster import _OFFS, _label_local, propagate_min_labels
from .compact_cells import _BROADCAST_CELL_BUDGET
from .hotspot import hotspot_cells

__all__ = ["dbscan_cells"]

ROLE_CORE, ROLE_BORDER, ROLE_NOISE = 0, 1, 2


def _neighbor_min_labels(targets: np.ndarray, core: np.ndarray,
                         core_labels: np.ndarray, res: int) -> np.ndarray:
    """For each target cell, the min core-cluster label over its 8
    neighbors (-1 when none is core).  ``core`` must be sorted."""
    n = 1 << res
    iy, ix = targets // n, targets % n
    best = np.full(len(targets), -1, dtype=np.int64)
    for dy, dx in _OFFS:
        if dy == 0 and dx == 0:
            continue
        ny = iy + dy
        nx = (ix + dx) % n          # lng wraps; lat clamps (drop outside)
        ok = (ny >= 0) & (ny < n)
        cand = ny[ok] * n + nx[ok]
        j = np.searchsorted(core, cand)
        j = np.clip(j, 0, max(len(core) - 1, 0))
        hit = core[j] == cand if len(core) else np.zeros(len(cand), bool)
        idx = np.nonzero(ok)[0][hit]
        lab = core_labels[j[hit]]
        cur = best[idx]
        best[idx] = np.where(cur < 0, lab, np.minimum(cur, lab))
    return best


def _assemble(cells, n, nbhd, core_mask, cluster_of_core, border_label):
    """Rows for all occupied cells given per-cell core mask, the core
    cluster labels (aligned to core cells), and per-non-core border
    candidate labels (aligned to non-core cells, -1 = noise)."""
    cluster = np.empty(len(cells), dtype=np.int64)
    role = np.empty(len(cells), dtype=np.int64)
    cluster[core_mask] = cluster_of_core
    role[core_mask] = ROLE_CORE
    nc = ~core_mask
    cluster[nc] = border_label
    role[nc] = np.where(border_label >= 0, ROLE_BORDER, ROLE_NOISE)
    return pd.DataFrame({"cell": cells, "n": n, "nbhd_n": nbhd,
                         "role": role, "cluster": cluster})


def dbscan_cells(ds, res: int = 6, min_pts: int = 4,
                 lat: str = "lat", lng: str = "lng",
                 mode: str = "auto", max_rounds: int = 10_000):
    """Density-cluster the point stream into ``(cell, n, nbhd_n, role,
    cluster)`` rows over every occupied cell (see module docstring)."""
    if mode not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"dbscan_cells: unknown mode={mode!r}")
    if min_pts < 1:
        raise ValueError("dbscan_cells: min_pts must be >= 1")

    hs = hotspot_cells(ds, res=res, ring=1, lat=lat, lng=lng)

    small = (1 << (2 * res)) <= _BROADCAST_CELL_BUDGET
    if mode == "broadcast" or (mode == "auto" and small):
        import ray.data as rd

        # bounded by the cell space (<= 4**res rows), not the data
        local = hs.to_pandas().sort_values("cell")
        cells = local["cell"].to_numpy().astype(np.int64)
        n = local["n"].to_numpy().astype(np.int64)
        nbhd = local["nbhd_n"].to_numpy().astype(np.int64)
        core_mask = nbhd >= min_pts
        core = cells[core_mask]
        core_lab = _label_local(core, res) if len(core) else core
        border = _neighbor_min_labels(cells[~core_mask], core, core_lab, res)
        return rd.from_pandas(
            _assemble(cells, n, nbhd, core_mask, core_lab, border))

    # ---- distributed path ----------------------------------------------
    from ..agg import default_partitions

    np_ = default_partitions()
    hs = hs.materialize()

    def init_core(t: pa.Table) -> pa.Table:
        f = t.filter(pa.compute.greater_equal(t["nbhd_n"], min_pts))
        return pa.table({"cell": f["cell"], "label": f["cell"]})

    core_state = hs.map_batches(init_core,
                                batch_format="pyarrow").materialize()
    core_labels = propagate_min_labels(core_state, cell="cell", res=res,
                                       num_partitions=np_,
                                       max_rounds=max_rounds)

    n_grid = 1 << res

    sent = np.int64(1) << 62  # > any cell id; Min ignores it when real

    def scatter_labels(batch: pa.Table) -> pa.Table:
        # border candidates: each core cell offers its final cluster
        # label to its 8 neighbors
        c = batch["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy, ix = c // n_grid, c % n_grid
        outs_c, outs_l = [], []
        for dy, dx in _OFFS:
            if dy == 0 and dx == 0:
                continue
            ny = iy + dy
            nx = (ix + dx) % n_grid
            ok = (ny >= 0) & (ny < n_grid)
            outs_c.append(ny[ok] * n_grid + nx[ok])
            outs_l.append(lab[ok])
        cells = (np.concatenate(outs_c) if outs_c
                 else np.array([], dtype=np.int64))
        labs = (np.concatenate(outs_l) if outs_l
                else np.array([], dtype=np.int64))
        z = np.zeros(len(cells), dtype=np.int64)
        return pa.table({"cell": pa.array(cells),
                         "occ": pa.array(z), "n": pa.array(z),
                         "nbhd_n": pa.array(z),
                         "core_lab": pa.array(np.full(len(cells), sent,
                                                      dtype=np.int64)),
                         "cand": pa.array(labs)})

    # tagged union, one native hash aggregate per cell:
    #   occupied rows carry (n, nbhd_n, occ=1); core rows carry their final
    #   cluster in core_lab; scattered rows offer it in cand.  Sentinels
    #   make Min correct, Max recovers the single real n / nbhd_n.
    counts_t = hs.map_batches(
        lambda t: pa.table({"cell": t["cell"],
                            "occ": pa.array(np.ones(len(t), np.int64)),
                            "n": t["n"], "nbhd_n": t["nbhd_n"],
                            "core_lab": pa.array(np.full(len(t), sent,
                                                         dtype=np.int64)),
                            "cand": pa.array(np.full(len(t), sent,
                                                     dtype=np.int64))}),
        batch_format="pyarrow")
    core_t = core_labels.map_batches(
        lambda t: pa.table({"cell": t["cell"],
                            "occ": pa.array(np.zeros(len(t), np.int64)),
                            "n": pa.array(np.zeros(len(t), np.int64)),
                            "nbhd_n": pa.array(np.zeros(len(t), np.int64)),
                            "core_lab": t["label"],
                            "cand": pa.array(np.full(len(t), sent,
                                                     dtype=np.int64))}),
        batch_format="pyarrow")
    cand_t = core_labels.map_batches(scatter_labels, batch_format="pyarrow")

    from ray.data.aggregate import Max, Min

    agg = (counts_t.union(core_t).union(cand_t)
           .groupby("cell", num_partitions=np_)
           .aggregate(Max("occ"), Max("n"), Max("nbhd_n"),
                      Min("core_lab"), Min("cand")))

    def resolve(t: pa.Table) -> pa.Table:
        occ = t["max(occ)"].to_numpy(zero_copy_only=False) == 1
        cells = t["cell"].to_numpy(zero_copy_only=False)[occ]
        n = t["max(n)"].to_numpy(zero_copy_only=False)[occ]
        nbhd = t["max(nbhd_n)"].to_numpy(zero_copy_only=False)[occ]
        core_lab = t["min(core_lab)"].to_numpy(zero_copy_only=False)[occ]
        cand = t["min(cand)"].to_numpy(zero_copy_only=False)[occ]
        is_core = core_lab < sent
        has_cand = cand < sent
        role = np.where(is_core, ROLE_CORE,
                        np.where(has_cand, ROLE_BORDER, ROLE_NOISE))
        cluster = np.where(is_core, core_lab,
                           np.where(has_cand, cand, -1))
        return pa.table({"cell": pa.array(cells.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64)),
                         "nbhd_n": pa.array(nbhd.astype(np.int64)),
                         "role": pa.array(role.astype(np.int64)),
                         "cluster": pa.array(cluster.astype(np.int64))})

    return agg.map_batches(resolve, batch_format="pyarrow")

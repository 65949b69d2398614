"""Global spatial autocorrelation (Moran's I) over the cell grid.

The classic lattice statistic (Moran 1950, public literature): with
``x_i`` the event count of occupied cell ``i``, queen (Chebyshev-1)
adjacency weights ``w_ij = 1`` between occupied neighbours (longitude
wraps, latitude rows off the grid drop — exactly ``geo.cells.k_ring``
semantics), and ``x̄ = sum_x / N``:

    I = (N / W) * Σ_ij w_ij (x_i - x̄)(x_j - x̄) / Σ_i (x_i - x̄)²

Everything is derived from SIX integer sufficient statistics, each an
exact int64 sum:

* ``n_cells``   — N, occupied-cell count
* ``sum_x``     — Σ x_i
* ``sum_x2``    — Σ x_i²
* ``w_edges``   — W = Σ_ij w_ij (ordered adjacent occupied pairs)
* ``cross_sum`` — Σ_ij w_ij x_i x_j
* ``edge_sum``  — Σ_ij w_ij x_i  (= Σ_i x_i · deg_i)

Clearing denominators gives the exact integer form

    I = (N²·cross − 2·N·sum_x·edge + sum_x²·W) / (W·(N·sum_x2 − sum_x²))

evaluated with arbitrary-precision Python ints on the driver (the six
scalars are one row) and rounded ONCE by the final float division — a
SQL oracle computing the same numerator/denominator in HUGEINT and
casting to DOUBLE reproduces ``morans_i`` bit-for-bit.

Scale shape: points shrink to ``(cell, n)`` partials per batch; ONE
cell-keyed combine produces the per-cell totals (bounded by the cell
space, 4^res).  The adjacency terms need FINAL counts (degree and
cross-products are not linear in partials), so they are computed from
the combined totals: on the summary-sized tree path entirely in NumPy
on the driver; on the hash path via an 8-way ring expansion of the
totals + one more cell-keyed combine + one cell-keyed join — all three
shuffles carry per-cell summary rows, never points.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["spatial_autocorr", "local_autocorr", "join_counts"]

#: queen-adjacency offsets (center excluded — w_ii = 0 by definition)
_OFFS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
         if not (dy == 0 and dx == 0)]


def _finish_row(n_cells: int, sum_x: int, sum_x2: int, w_edges: int,
                cross_sum: int, edge_sum: int) -> pd.DataFrame:
    """One-row result from the six exact integer sufficient statistics.
    num/den are evaluated with Python big ints so no intermediate
    overflows; the ONLY rounding is the final float division (and the
    two int->double conversions, which round-to-nearest exactly like
    the SQL oracle's HUGEINT -> DOUBLE casts)."""
    num = (n_cells * n_cells * cross_sum
           - 2 * n_cells * sum_x * edge_sum
           + sum_x * sum_x * w_edges)
    den = w_edges * (n_cells * sum_x2 - sum_x * sum_x)
    morans = float(num) / float(den) if den != 0 else np.nan
    return pd.DataFrame({
        "n_cells": pd.Series([n_cells], dtype="int64"),
        "sum_x": pd.Series([sum_x], dtype="int64"),
        "sum_x2": pd.Series([sum_x2], dtype="int64"),
        "w_edges": pd.Series([w_edges], dtype="int64"),
        "cross_sum": pd.Series([cross_sum], dtype="int64"),
        "edge_sum": pd.Series([edge_sum], dtype="int64"),
        "morans_i": pd.Series([morans], dtype="float64"),
    })


def spatial_autocorr(ds, res: int, lat_col: str = "lat",
                     lng_col: str = "lng", mode: str = "auto",
                     num_partitions: Optional[int] = None) -> pd.DataFrame:
    """Moran's I of per-cell event counts at resolution ``res``.

    Returns a ONE-ROW pandas DataFrame (the six integer sufficient
    statistics + ``morans_i``) — a global statistic, so a driver-sized
    result by construction.  ``mode='auto'`` computes the adjacency
    terms driver-side while the cell space is summary-sized
    (4^res <= 65536) and switches to the distributed
    expand/combine/join path above that.
    """
    from ..agg import combine_partials
    from ..geo.cells import cell_id

    n_grid = 1 << res

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lng = batch[lng_col].to_numpy(zero_copy_only=False)
        cell = cell_id(lat, lng, res)
        cell = cell[cell >= 0]
        cells, counts = np.unique(cell, return_counts=True)
        return pa.table({
            "cell": pa.array(cells, type=pa.int64()),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
        })

    if mode == "auto":
        mode = "tree" if (1 << (2 * res)) <= 65536 else "hash"

    parts = ds.map_batches(partial, batch_format="pyarrow")

    if mode == "tree":
        totals = combine_partials(
            parts, keys=["cell"], value_cols=["n"], mode="tree").to_pandas()
        cells = totals["cell"].to_numpy()
        n = totals["n"].to_numpy()
        n_cells = int(len(cells))
        sum_x = int(n.sum())
        sum_x2 = int((n.astype(object) * n.astype(object)).sum())
        # dense count grid (bounded by the 4^res guard above): the ring
        # gather is 8 vectorized shifted adds, no Python cell loop
        grid = np.zeros((n_grid, n_grid), dtype=np.int64)
        iy, ix = cells // n_grid, cells % n_grid
        grid[iy, ix] = n
        occ = (grid > 0).astype(np.int64)
        nbr_sum = np.zeros_like(grid)
        nbr_deg = np.zeros_like(grid)
        for dy, dx in _OFFS:
            shifted = np.roll(grid, dx, axis=1)  # lng wraps
            occ_sh = np.roll(occ, dx, axis=1)
            if dy > 0:      # lat rows off the grid drop
                nbr_sum[dy:, :] += shifted[:-dy, :]
                nbr_deg[dy:, :] += occ_sh[:-dy, :]
            elif dy < 0:
                nbr_sum[:dy, :] += shifted[-dy:, :]
                nbr_deg[:dy, :] += occ_sh[-dy:, :]
            else:
                nbr_sum += shifted
                nbr_deg += occ_sh
        ns = nbr_sum[iy, ix]
        nd = nbr_deg[iy, ix]
        w_edges = int(nd.sum())
        cross_sum = int((n.astype(object) * ns.astype(object)).sum())
        edge_sum = int((n.astype(object) * nd.astype(object)).sum())
        return _finish_row(n_cells, sum_x, sum_x2, w_edges, cross_sum,
                           edge_sum)

    # ---- distributed path: data-scaled cell spaces ----
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)

    totals = combine_partials(
        parts, keys=["cell"], value_cols=["n"], mode="hash",
        num_partitions=num_partitions).materialize()

    def expand(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        iy, ix = cells // n_grid, cells % n_grid
        out_c, out_s = [], []
        for dy, dx in _OFFS:
            ny = iy + dy
            valid = (ny >= 0) & (ny < n_grid)
            nx = (ix[valid] + dx) % n_grid
            out_c.append(ny[valid] * n_grid + nx)
            out_s.append(n[valid])
        cat = np.concatenate
        return pa.table({
            "cell": pa.array(cat(out_c), type=pa.int64()),
            "nbr_sum": pa.array(cat(out_s), type=pa.int64()),
            "nbr_deg": pa.array(
                np.ones(sum(len(c) for c in out_c), dtype=np.int64)),
        })

    nbr = combine_partials(
        totals.map_batches(expand, batch_format="pyarrow"),
        keys=["cell"], value_cols=["nbr_sum", "nbr_deg"], mode="hash",
        num_partitions=num_partitions)
    joined = totals.join(nbr, join_type="inner", on=("cell",),
                         num_partitions=num_partitions)

    def scalar_partial(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        ns = batch["nbr_sum"].to_numpy(zero_copy_only=False)
        nd = batch["nbr_deg"].to_numpy(zero_copy_only=False)
        return pa.table({
            "w_edges": pa.array([int(nd.sum())], type=pa.int64()),
            "cross_sum": pa.array([int((n * ns).sum())], type=pa.int64()),
            "edge_sum": pa.array([int((n * nd).sum())], type=pa.int64()),
        })

    def total_partial(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_cells": pa.array([len(n)], type=pa.int64()),
            "sum_x": pa.array([int(n.sum())], type=pa.int64()),
            "sum_x2": pa.array([int((n * n).sum())], type=pa.int64()),
        })

    # one partial row per block on each side — driver pulls are tiny
    adj = joined.map_batches(scalar_partial, batch_format="pyarrow").to_pandas()
    tot = totals.map_batches(total_partial, batch_format="pyarrow").to_pandas()
    return _finish_row(
        int(tot["n_cells"].sum()), int(tot["sum_x"].sum()),
        int(tot["sum_x2"].sum()), int(adj["w_edges"].sum()),
        int(adj["cross_sum"].sum()), int(adj["edge_sum"].sum()))


def local_autocorr(ds, res: int, lat_col: str = "lat",
                   lng_col: str = "lng", mode: str = "auto",
                   num_partitions: Optional[int] = None):
    """Local Moran's I (Anselin 1995 LISA, public literature) per
    occupied cell: with ``u_i = N*x_i - S`` (the mean-centered count
    scaled by N, an exact int) and ``nbr_u_i = N*nbr_sum_i - S*deg_i``
    (same scaling over the queen ring, occupied neighbours only),

        I_i = u_i * nbr_u_i / (N*Q - S^2)

    where ``S = Σx``, ``Q = Σx²``, ``N`` = occupied cells — algebraic
    identity of the textbook ``(x_i-x̄)/m2 * Σ_j w_ij (x_j-x̄)``.  The
    numerator/denominator inputs are exact int64 and the final value is
    ``(double(u) * double(nbr_u)) / double(N*Q - S²)`` — a fixed float
    op chain a SQL oracle replays bit-for-bit.  Positive I_i = the cell
    sits in a cluster of like values (hot/cold spot); negative = a
    spatial outlier.

    Scale shape: identical to :func:`spatial_autocorr` — ``mode='auto'``
    gathers the ring in NumPy on the driver while the cell space is
    summary-sized (4^res <= 65536, one combine, pandas result) and
    above that runs the distributed path (per-batch count partials,
    one cell combine, an 8-way ring expansion of per-cell totals, one
    more combine, one cell left join; Dataset result); points never
    shuffle in either mode.  Cells with no occupied neighbour are
    emitted with ``nbr_u = 0`` and ``lisa = 0``.

    Envelope: ``N * max(x)`` must stay well under 2^31 so the int64
    products are exact (any realistic cell grid: N <= 4^res, counts
    bounded by skew splitting upstream).
    """
    from ..agg import combine_partials
    from ..geo.cells import cell_id

    n_grid = 1 << res
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lng = batch[lng_col].to_numpy(zero_copy_only=False)
        cell = cell_id(lat, lng, res)
        cell = cell[cell >= 0]
        cells, counts = np.unique(cell, return_counts=True)
        return pa.table({
            "cell": pa.array(cells, type=pa.int64()),
            "n": pa.array(counts.astype(np.int64), type=pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    if mode == "auto":
        mode = "tree" if (1 << (2 * res)) <= 65536 else "hash"

    if mode == "tree":
        # summary-sized cell space: ONE combine, ring gather in NumPy
        t = combine_partials(parts, keys=["cell"], value_cols=["n"],
                             mode="tree").to_pandas()
        cells = t["cell"].to_numpy()
        n = t["n"].to_numpy()
        n_cells = int(len(cells))
        sum_x = int(n.sum())
        sum_x2 = int((n.astype(object) * n.astype(object)).sum())
        denom = n_cells * sum_x2 - sum_x * sum_x
        grid = np.zeros((n_grid, n_grid), dtype=np.int64)
        iy, ix = cells // n_grid, cells % n_grid
        grid[iy, ix] = n
        occ = (grid > 0).astype(np.int64)
        nbr_sum = np.zeros_like(grid)
        nbr_deg = np.zeros_like(grid)
        for dy, dx in _OFFS:
            shifted = np.roll(grid, dx, axis=1)
            occ_sh = np.roll(occ, dx, axis=1)
            if dy > 0:
                nbr_sum[dy:, :] += shifted[:-dy, :]
                nbr_deg[dy:, :] += occ_sh[:-dy, :]
            elif dy < 0:
                nbr_sum[:dy, :] += shifted[-dy:, :]
                nbr_deg[:dy, :] += occ_sh[-dy:, :]
            else:
                nbr_sum += shifted
                nbr_deg += occ_sh
        u = n_cells * n - sum_x
        nbr_u = n_cells * nbr_sum[iy, ix] - sum_x * nbr_deg[iy, ix]
        lisa = (u.astype(np.float64) * nbr_u.astype(np.float64)) \
            / float(denom) if denom != 0 else np.full(len(u), np.nan)
        return pd.DataFrame({
            "cell": pd.Series(cells, dtype="int64"),
            "n": pd.Series(n, dtype="int64"),
            "u": pd.Series(u, dtype="int64"),
            "nbr_u": pd.Series(nbr_u, dtype="int64"),
            "lisa": pd.Series(lisa, dtype="float64"),
        })

    totals = combine_partials(parts, keys=["cell"], value_cols=["n"],
                              mode="hash",
                              num_partitions=num_partitions).materialize()

    def total_partial(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_cells": pa.array([len(n)], type=pa.int64()),
            "sum_x": pa.array([int(n.sum())], type=pa.int64()),
            "sum_x2": pa.array([int((n * n).sum())], type=pa.int64()),
        })

    tot = totals.map_batches(total_partial, batch_format="pyarrow").to_pandas()
    n_cells = int(tot["n_cells"].sum())
    sum_x = int(tot["sum_x"].sum())
    sum_x2 = int(tot["sum_x2"].sum())
    denom = n_cells * sum_x2 - sum_x * sum_x     # Python int: no overflow
    denom_f = float(denom)

    def expand(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        iy, ix = cells // n_grid, cells % n_grid
        out_c, out_s = [], []
        for dy, dx in _OFFS:
            ny = iy + dy
            valid = (ny >= 0) & (ny < n_grid)
            nx = (ix[valid] + dx) % n_grid
            out_c.append(ny[valid] * n_grid + nx)
            out_s.append(n[valid])
        cat = np.concatenate
        return pa.table({
            "cell": pa.array(cat(out_c), type=pa.int64()),
            "nbr_sum": pa.array(cat(out_s), type=pa.int64()),
            "nbr_deg": pa.array(
                np.ones(sum(len(c) for c in out_c), dtype=np.int64)),
        })

    nbr = combine_partials(
        totals.map_batches(expand, batch_format="pyarrow"),
        keys=["cell"], value_cols=["nbr_sum", "nbr_deg"], mode="hash",
        num_partitions=num_partitions)
    joined = totals.join(nbr, join_type="left_outer", on=("cell",),
                         num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        ns = np.nan_to_num(batch["nbr_sum"].to_numpy(
            zero_copy_only=False).astype(np.float64)).astype(np.int64)
        nd = np.nan_to_num(batch["nbr_deg"].to_numpy(
            zero_copy_only=False).astype(np.float64)).astype(np.int64)
        u = n_cells * n - sum_x
        nbr_u = n_cells * ns - sum_x * nd
        lisa = (u.astype(np.float64) * nbr_u.astype(np.float64)) / denom_f \
            if denom != 0 else np.full(len(u), np.nan)
        return pa.table({
            "cell": pa.array(cells, type=pa.int64()),
            "n": pa.array(n, type=pa.int64()),
            "u": pa.array(u, type=pa.int64()),
            "nbr_u": pa.array(nbr_u, type=pa.int64()),
            "lisa": pa.array(lisa, type=pa.float64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def join_counts(ds, res: int, lat_col: str = "lat", lng_col: str = "lng",
                lang_col: str = "lang", target: str = "en") -> pd.DataFrame:
    """Black-white join-count statistics (Cliff & Ord 1973, public
    literature): the binary-attribute counterpart of Moran's I.  A cell
    is "black" when a strict majority of its pages carry ``target``'s
    language; adjacent occupied cell pairs are then classified BB / BW /
    WW — clustered attributes show high BB+WW, dispersed ones high BW.

    Adjacency is the queen ring with longitude wrap and latitude drop
    (identical to spatial_autocorr / grid_bfs), each unordered pair
    counted ONCE (four forward directions on the driver grid — exact
    for grids wider than 2, guarded).  All counts are exact int64; the
    per-cell label is the integer test ``2·n_target > n_total``; the
    only float is the final ``bw_ratio`` IEEE quotient.  One
    (cell, n, n_target) combine; the grid finish is driver-side under
    the 4^res <= 65536 summary-size contract.

    Returns one row: ``(n_cells, n_black, n_edges, bb, bw, ww,
    bw_ratio)``.
    """
    from ..agg import combine_partials
    from ..geo.cells import cell_id

    n_grid = 1 << res
    if (1 << (2 * res)) > 65536:
        raise ValueError("join_counts: 4^res exceeds the 65536-cell "
                         "driver-grid budget — coarsen res")
    if n_grid <= 2:
        raise ValueError("join_counts: grid too narrow — the forward-"
                         "direction pair enumeration double-counts at "
                         "width <= 2")

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lng = batch[lng_col].to_numpy(zero_copy_only=False)
        cell = cell_id(lat, lng, res)
        is_t = (batch[lang_col].to_pandas().to_numpy(dtype=object)
                == target).astype(np.int64)
        keep = cell >= 0
        df = pd.DataFrame({"cell": cell[keep], "nt": 1,
                           "ne": is_t[keep]})
        out = df.groupby("cell", sort=False).sum().reset_index()
        for c in ("nt", "ne"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    cc = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["cell"], value_cols=["nt", "ne"], mode="tree").to_pandas()

    lab = np.full((n_grid, n_grid), -1, dtype=np.int64)  # -1 unoccupied
    cells = cc["cell"].to_numpy()
    black = (2 * cc["ne"].to_numpy() > cc["nt"].to_numpy()).astype(np.int64)
    lab[cells // n_grid, cells % n_grid] = black

    bb = bw = ww = edges = 0
    # forward directions (dy, dx): E, SE, S, SW — each unordered queen
    # pair exactly once; lng wraps via roll, lat rows drop
    for dy, dx in ((0, 1), (1, 1), (1, 0), (1, -1)):
        nb = np.roll(lab, -dx, axis=1) if dx else lab
        if dy:
            a = lab[:-dy, :]
            b = nb[dy:, :]
        else:
            a, b = lab, nb
        both = (a >= 0) & (b >= 0)
        edges += int(both.sum())
        bb += int(((a == 1) & (b == 1) & both).sum())
        ww += int(((a == 0) & (b == 0) & both).sum())
        bw += int(((a != b) & both).sum())

    # zero-edge degenerate: NaN (the SQL oracle's NULL/0 -> NULL becomes
    # NaN in pandas), not 0.0 — aligns both sides (ADVICE r3)
    ratio = (np.float64(bw) / np.float64(edges)) if edges else np.float64("nan")
    return pd.DataFrame({
        "n_cells": np.array([len(cells)], dtype=np.int64),
        "n_black": np.array([int(black.sum())], dtype=np.int64),
        "n_edges": np.array([edges], dtype=np.int64),
        "bb": np.array([bb], dtype=np.int64),
        "bw": np.array([bw], dtype=np.int64),
        "ww": np.array([ww], dtype=np.int64),
        "bw_ratio": np.array([ratio], dtype=np.float64),
    })

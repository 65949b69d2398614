"""Hotspot detection: per-cell counts smoothed over the k-ring neighborhood.

Spatial density analysis (Getis-Ord-style local statistics, simplified to
exact integer counts): for every grid cell, its own point count ``n`` and
the total count ``nbhd_n`` over all cells within Chebyshev distance
``ring`` (longitude wraps, latitude clamps — ``geo.cells.k_ring``
semantics).  Hot cells are where ``n`` is large relative to the smoothed
neighborhood — the skew diagnostic feeding salt/bucket decisions.

Shape:

1. per-batch per-cell count partials -> ONE hash combine (key space =
   occupied cells, grows with resolution -> ``mode="hash"`` default);
2. neighborhood sums WITHOUT a join: the k-ring relation is symmetric
   (wrap/clamp preserve a-in-ring(b) <=> b-in-ring(a)), so each cell row
   flat-maps its count to every neighbor and one ``groupby(cell)`` sums
   what each cell received;
3. counts and neighborhood sums concat through the same groupby (tagged
   columns), so steps 2+3 cost ONE shuffle total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, k_ring

__all__ = ["hotspot_cells", "gi_star"]


def hotspot_cells(ds, res: int = 6, ring: int = 1,
                  lat: str = "lat", lng: str = "lng"):
    """Per occupied cell: ``n`` (own count) and ``nbhd_n`` (count over the
    (2*ring+1)^2 wrap/clamp neighborhood).  Cells with zero own count are
    not emitted (their neighborhood sum is only needed for z-scoring
    against occupied cells, which the caller can do).  Rows with invalid
    coordinates (cell id -1) are dropped.
    """
    if ring < 1:
        raise ValueError("hotspot_cells: ring must be >= 1")
    from ..agg import combine_partials, default_partitions

    def partial(batch: pa.Table) -> pa.Table:
        c = cell_id(batch[lat].to_numpy(zero_copy_only=False),
                    batch[lng].to_numpy(zero_copy_only=False), res)
        c = c[c >= 0]
        cells, counts = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(cells, type=pa.int64()),
                         "n": pa.array(counts, type=pa.int64())})

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["cell"], value_cols=["n"], mode="hash")

    def scatter(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        out_cell = [cells, ]  # own-count rows (tagged own=n, nbhd=n)
        out_own = [n, ]
        out_nb = [n, ]
        for c, cn in zip(cells.tolist(), n.tolist()):
            nbrs = k_ring(int(c), res, ring)
            nbrs = nbrs[nbrs != c]  # own cell already counted above
            out_cell.append(nbrs)
            out_own.append(np.zeros(len(nbrs), dtype=np.int64))
            out_nb.append(np.full(len(nbrs), cn, dtype=np.int64))
        return pa.table({
            "cell": pa.array(np.concatenate(out_cell), type=pa.int64()),
            "own": pa.array(np.concatenate(out_own), type=pa.int64()),
            "nb": pa.array(np.concatenate(out_nb), type=pa.int64()),
        })

    scattered = counts.map_batches(scatter, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    summed = scattered.groupby(
        "cell", num_partitions=default_partitions()).aggregate(
        Sum("own", alias_name="n"), Sum("nb", alias_name="nbhd_n"))

    def occupied(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch["n"], 0))

    return summed.map_batches(occupied, batch_format="pyarrow")


def gi_star(ds, res: int = 6, ring: int = 1,
            lat: str = "lat", lng: str = "lng"):
    """Getis-Ord Gi* hotspot z-scores over occupied cells (Getis & Ord
    1992/1995, public literature), binary weights over the Chebyshev-
    ``ring`` neighborhood INCLUDING the cell itself, study region = the
    occupied cells:

        Gi*_i = num_i / (sqrt(A) * sqrt(B_i / (N - 1)))

    with exact int64 ``num_i = N * nbhd_n_i - S * W_i``,
    ``A = N * Q - S**2``, ``B_i = N * W_i - W_i**2`` (N = occupied
    cells, S = Σn, Q = Σn², ``nbhd_n_i`` the ring count sum and ``W_i``
    the occupied-neighbor count incl. self) — the algebraic expansion
    of the textbook statistic.  The only float ops are the final fixed
    chain, so a SQL oracle matches bit-for-bit.  Positive Gi* = hot
    spot, negative = cold spot.

    Shape: identical to :func:`hotspot_cells` — per-batch count
    partials, one hash combine, the symmetric-ring scatter (carrying an
    extra occupancy column), one groupby; the global scalars are a
    per-block partial sum on the combined counts (driver-tiny).
    """
    from ..agg import combine_partials, default_partitions

    def partial(batch: pa.Table) -> pa.Table:
        c = cell_id(batch[lat].to_numpy(zero_copy_only=False),
                    batch[lng].to_numpy(zero_copy_only=False), res)
        c = c[c >= 0]
        cells, counts = np.unique(c, return_counts=True)
        return pa.table({"cell": pa.array(cells, type=pa.int64()),
                         "n": pa.array(counts, type=pa.int64())})

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["cell"], value_cols=["n"], mode="hash").materialize()

    def glob(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "N": pa.array([len(n)], type=pa.int64()),
            "S": pa.array([int(n.sum())], type=pa.int64()),
            "Q": pa.array([int((n * n).sum())], type=pa.int64()),
        })

    g = counts.map_batches(glob, batch_format="pyarrow").to_pandas()
    n_cells = int(g["N"].sum())
    sum_x = int(g["S"].sum())
    sum_x2 = int(g["Q"].sum())
    a_int = n_cells * sum_x2 - sum_x * sum_x
    if n_cells < 2 or a_int <= 0:
        return pd.DataFrame({
            "cell": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "nbhd_n": pd.Series([], dtype="int64"),
            "w_i": pd.Series([], dtype="int64"),
            "gi_star": pd.Series([], dtype="float64"),
        })
    sqrt_a = np.sqrt(float(a_int))
    nm1 = float(n_cells - 1)

    def scatter(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        out_cell = [cells]
        out_own = [n]
        out_nb = [n]          # self included in the neighborhood
        out_occ = [np.ones(len(cells), dtype=np.int64)]
        for c, cn in zip(cells.tolist(), n.tolist()):
            nbrs = k_ring(int(c), res, ring)
            nbrs = nbrs[nbrs != c]
            out_cell.append(nbrs)
            out_own.append(np.zeros(len(nbrs), dtype=np.int64))
            out_nb.append(np.full(len(nbrs), cn, dtype=np.int64))
            out_occ.append(np.ones(len(nbrs), dtype=np.int64))
        return pa.table({
            "cell": pa.array(np.concatenate(out_cell), type=pa.int64()),
            "own": pa.array(np.concatenate(out_own), type=pa.int64()),
            "nb": pa.array(np.concatenate(out_nb), type=pa.int64()),
            "occ": pa.array(np.concatenate(out_occ), type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    summed = counts.map_batches(scatter, batch_format="pyarrow").groupby(
        "cell", num_partitions=default_partitions()).aggregate(
        Sum("own", alias_name="n"), Sum("nb", alias_name="nbhd_n"),
        Sum("occ", alias_name="w_i"))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.greater(batch["n"], 0))
        nb = t["nbhd_n"].to_numpy(zero_copy_only=False)
        wi = t["w_i"].to_numpy(zero_copy_only=False)
        num = n_cells * nb - sum_x * wi
        b_int = n_cells * wi - wi * wi
        gi = num.astype(np.float64) / (
            sqrt_a * np.sqrt(b_int.astype(np.float64) / nm1))
        return pa.table({
            "cell": t["cell"].cast(pa.int64()),
            "n": t["n"].cast(pa.int64()),
            "nbhd_n": t["nbhd_n"].cast(pa.int64()),
            "w_i": t["w_i"].cast(pa.int64()),
            "gi_star": pa.array(gi, type=pa.float64()),
        })

    return summed.map_batches(finish, batch_format="pyarrow")

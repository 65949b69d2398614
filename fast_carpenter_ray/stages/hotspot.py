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

__all__ = ["hotspot_cells", "gi_star", "emerging_hotspots"]


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


def emerging_hotspots(ds, res: int = 6, ring: int = 1,
                      lat: str = "lat", lng: str = "lng",
                      ts: str = "warc_ts",
                      bucket_us: int = 14_400_000_000,
                      z_hot: float = 1.96):
    """Emerging space-time hotspot taxonomy (the public "emerging hot
    spot analysis" idea, simplified to deterministic integer rules):
    Gi* is computed INDEPENDENTLY per time bucket (study region = that
    bucket's occupied cells), a cell-bucket is "hot" when its z-score
    reaches ``z_hot``, and each cell's hot/not series over the B global
    buckets classifies it:

        0 none          never hot
        1 new           hot only in the final bucket
        2 persistent    hot in every bucket
        3 intensifying  hot in the final bucket and 1 < k < B
        4 former        hot somewhere but not in the final bucket

    Returns ``(cell, n_hot, last_hot, category)`` for every cell
    occupied in any bucket.  Buckets whose variance term is degenerate
    (< 2 occupied cells or A <= 0) contribute no hot flags — mirrored in
    the SQL oracle.

    Shape: one (cell, bucket)-keyed hash combine for counts; per-bucket
    global scalars tree-combine (B buckets — summary-sized); the
    symmetric ring scatter + ONE (cell, bucket) groupby exactly as
    :func:`gi_star`; classification is two native aggregates per cell.
    """
    from ray.data.aggregate import Max, Sum

    from ..agg import combine_partials, default_partitions

    def partial(batch: pa.Table) -> pa.Table:
        c = cell_id(batch[lat].to_numpy(zero_copy_only=False),
                    batch[lng].to_numpy(zero_copy_only=False), res)
        t = batch[ts].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        b = t // bucket_us
        ok = c >= 0
        key = np.stack([c[ok], b[ok]], axis=1)
        uniq, counts = np.unique(key, axis=0, return_counts=True)
        return pa.table({
            "cell": pa.array(uniq[:, 0], type=pa.int64()),
            "bucket": pa.array(uniq[:, 1], type=pa.int64()),
            "n": pa.array(counts.astype(np.int64))})

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["cell", "bucket"], value_cols=["n"], mode="hash").materialize()

    def glob(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("bucket")["n"].agg(
            N="size", S="sum", Q=lambda x: int((x.to_numpy() ** 2).sum()))
        g = g.reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    gl = combine_partials(
        counts.map_batches(glob, batch_format="pyarrow"),
        keys=["bucket"], value_cols=["N", "S", "Q"], mode="tree").to_pandas()
    if not len(gl):
        return pd.DataFrame({
            "cell": pd.Series([], dtype="int64"),
            "n_hot": pd.Series([], dtype="int64"),
            "last_hot": pd.Series([], dtype="int64"),
            "category": pd.Series([], dtype="int64")})
    buckets = gl["bucket"].to_numpy().astype(np.int64)
    n_buckets = len(buckets)
    max_b = int(buckets.max())
    scal = {}
    for _, r in gl.iterrows():
        nc, sx, q = int(r["N"]), int(r["S"]), int(r["Q"])
        a_int = nc * q - sx * sx
        if nc >= 2 and a_int > 0:
            scal[int(r["bucket"])] = (nc, sx, np.sqrt(float(a_int)),
                                      float(nc - 1))

    def scatter(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        bk = batch["bucket"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        out_cell = [cells]
        out_bkt = [bk]
        out_own = [n]
        out_nb = [n]
        out_occ = [np.ones(len(cells), dtype=np.int64)]
        for c, b, cn in zip(cells.tolist(), bk.tolist(), n.tolist()):
            nbrs = k_ring(int(c), res, ring)
            nbrs = nbrs[nbrs != c]
            out_cell.append(nbrs)
            out_bkt.append(np.full(len(nbrs), b, dtype=np.int64))
            out_own.append(np.zeros(len(nbrs), dtype=np.int64))
            out_nb.append(np.full(len(nbrs), cn, dtype=np.int64))
            out_occ.append(np.ones(len(nbrs), dtype=np.int64))
        return pa.table({
            "cell": pa.array(np.concatenate(out_cell), type=pa.int64()),
            "bucket": pa.array(np.concatenate(out_bkt), type=pa.int64()),
            "own": pa.array(np.concatenate(out_own), type=pa.int64()),
            "nb": pa.array(np.concatenate(out_nb), type=pa.int64()),
            "occ": pa.array(np.concatenate(out_occ), type=pa.int64()),
        })

    summed = counts.map_batches(scatter, batch_format="pyarrow").groupby(
        ["cell", "bucket"], num_partitions=default_partitions()).aggregate(
        Sum("own", alias_name="n"), Sum("nb", alias_name="nbhd_n"),
        Sum("occ", alias_name="w_i"))

    def hot_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = batch.filter(pc.greater(batch["n"], 0))
        cells = t["cell"].to_numpy(zero_copy_only=False)
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        nb = t["nbhd_n"].to_numpy(zero_copy_only=False)
        wi = t["w_i"].to_numpy(zero_copy_only=False)
        hot = np.zeros(len(cells), dtype=np.int64)
        for b in np.unique(bk):
            if int(b) not in scal:
                continue
            nc, sx, sqrt_a, nm1 = scal[int(b)]
            m = bk == b
            num = nc * nb[m] - sx * wi[m]
            b_int = nc * wi[m] - wi[m] * wi[m]
            z = num.astype(np.float64) / (
                sqrt_a * np.sqrt(b_int.astype(np.float64) / nm1))
            hot[m] = (z >= z_hot).astype(np.int64)
        return pa.table({
            "cell": pa.array(cells, type=pa.int64()),
            "hot": pa.array(hot),
            "hot_last": pa.array(hot * (bk == max_b).astype(np.int64))})

    per_cell = (summed.map_batches(hot_rows, batch_format="pyarrow")
                .groupby("cell", num_partitions=default_partitions())
                .aggregate(Sum("hot", alias_name="n_hot"),
                           Max("hot_last", alias_name="last_hot")))

    def classify(t: pa.Table) -> pa.Table:
        k = t["n_hot"].to_numpy(zero_copy_only=False).astype(np.int64)
        last = t["last_hot"].to_numpy(zero_copy_only=False).astype(np.int64)
        cat = np.zeros(len(k), dtype=np.int64)
        cat[(k == n_buckets)] = 2                       # persistent
        new = (last == 1) & (k == 1) & (n_buckets > 1)
        cat[new] = 1                                    # new
        inten = (last == 1) & (k > 1) & (k < n_buckets)
        cat[inten] = 3                                  # intensifying
        former = (k >= 1) & (last == 0)
        cat[former] = 4                                 # former
        return pa.table({"cell": t["cell"].cast(pa.int64()),
                         "n_hot": pa.array(k),
                         "last_hot": pa.array(last),
                         "category": pa.array(cat)})

    return per_cell.map_batches(classify, batch_format="pyarrow")

"""Ripley's K function over the page point pattern.

The canonical second-order point-pattern statistic (Ripley 1976, public
literature): ``K(r) = |A| / (n(n−1)) · Σ_{i≠j} 1[d_ij <= r]`` —
clustered patterns run above the Poisson expectation ``πr²``, dispersed
ones below.  Distances are planar degrees with antimeridian wrap
(``dlng = min(|Δlng|, 360 − |Δlng|)``), the same convention as
``knn_graph``.

Scale shape — no all-pairs scan, no pair-keyed shuffle:

* each point emits ONE home row at its own cell plus probe rows to its
  queen ring (cell width >= max radius, enforced, so every qualifying
  pair is co-located);
* ONE groupby over the cell co-locates candidates; a pair is counted
  exactly once via canonical attribution (only ``home_id < probe_id``
  fires — the symmetric occurrence at the other point's home cell has
  the ids reversed);
* the in-group kernel is a chunked vectorized cross filter (bounded
  scratch), emitting one int64 count per radius per group — a tree sum
  finishes.

Exactness: pair counts are exact int64 (the ``d² <= r²`` comparison is
a fixed IEEE chain identical in the SQL replay); ``k_hat`` is one float
chain over exact ints.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["ripley_k"]

_CHUNK = 1_000_000
_WORLD_AREA = 360.0 * 180.0  # planar degree^2, matching the distance


def ripley_k(ds, radii: Sequence[float], res: int,
             lat_col: str = "lat", lng_col: str = "lng",
             id_col: str = "doc_id",
             num_partitions: Optional[int] = None) -> pd.DataFrame:
    """Pandas frame ``(r, n_pairs, k_hat)``, one row per radius.

    ``n_pairs`` counts unordered point pairs with ``d <= r``;
    ``k_hat = world_area * 2 * n_pairs / (n * (n - 1))``.
    """
    from ..agg import combine_partials, default_partitions
    from ..geo.cells import cell_id, k_ring

    radii = sorted(float(r) for r in radii)
    if not radii or radii[0] <= 0:
        raise ValueError("ripley_k: radii must be positive")
    n_grid = 1 << res
    if radii[-1] > 180.0 / n_grid:
        raise ValueError(
            f"ripley_k: max radius {radii[-1]} exceeds the cell width "
            f"{180.0 / n_grid} at res={res} — the queen-ring cover would "
            f"miss pairs; coarsen res")
    if num_partitions is None:
        num_partitions = default_partitions(4)
    r2s = np.array([r * r for r in radii], dtype=np.float64)

    def expand(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        lng = batch[lng_col].to_numpy(zero_copy_only=False)
        pid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = ~np.isnan(lat)
        lat, lng, pid = lat[ok], lng[ok], pid[ok]
        home = cell_id(lat, lng, res)
        buckets, ids, las, lns, homes = [], [], [], [], []
        # home rows
        buckets.append(home)
        ids.append(pid)
        las.append(lat)
        lns.append(lng)
        homes.append(np.ones(len(pid), dtype=np.int8))
        # probe rows: ring cover per distinct home cell (vectorized per
        # cell — ring size is 9, cells per batch are bounded by 4^res)
        for c in np.unique(home):
            ring = k_ring(int(c), res, 1)
            m = home == c
            k = int(m.sum())
            for rc in ring.tolist():
                buckets.append(np.full(k, rc, dtype=np.int64))
                ids.append(pid[m])
                las.append(lat[m])
                lns.append(lng[m])
                homes.append(np.zeros(k, dtype=np.int8))
        return pa.table({
            "bucket": pa.array(np.concatenate(buckets), type=pa.int64()),
            "pid": pa.array(np.concatenate(ids), type=pa.int64()),
            "lat": pa.array(np.concatenate(las), type=pa.float64()),
            "lng": pa.array(np.concatenate(lns), type=pa.float64()),
            "is_home": pa.array(np.concatenate(homes), type=pa.int8()),
        })

    _out_schema = pa.schema([("ri", pa.int64()), ("n_pairs", pa.int64())])

    def count_group(g: pd.DataFrame) -> pa.Table:
        h = g[g["is_home"] == 1]
        p = g[g["is_home"] == 0]
        if not len(h) or not len(p):
            return _out_schema.empty_table()
        hid = h["pid"].to_numpy()
        hla, hln = h["lat"].to_numpy(), h["lng"].to_numpy()
        pid_ = p["pid"].to_numpy()
        pla, pln = p["lat"].to_numpy(), p["lng"].to_numpy()
        counts = np.zeros(len(r2s), dtype=np.int64)
        step = max(1, _CHUNK // max(1, len(pid_)))
        for s in range(0, len(hid), step):
            e = min(s + step, len(hid))
            dlat = hla[s:e, None] - pla[None, :]
            dl = np.abs(hln[s:e, None] - pln[None, :])
            dlng = np.minimum(dl, 360.0 - dl)
            d2 = dlat * dlat + dlng * dlng
            canon = hid[s:e, None] < pid_[None, :]
            for k in range(len(r2s)):
                counts[k] += int((canon & (d2 <= r2s[k])).sum())
        return pa.table({
            "ri": pa.array(np.arange(len(r2s), dtype=np.int64)),
            "n_pairs": pa.array(counts),
        }).cast(_out_schema)

    parts = (ds.map_batches(expand, batch_format="pyarrow")
             .groupby("bucket", num_partitions=num_partitions)
             .map_groups(count_group, batch_format="pandas"))
    agg = combine_partials(parts, keys=["ri"], value_cols=["n_pairs"],
                           mode="tree").to_pandas()

    # n points: derived exactly from the home-row total is cheapest via
    # a separate tiny aggregate over the input
    import ray.data  # noqa: F401  (ds API already imported upstream)

    def n_partial(batch: pa.Table) -> pa.Table:
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        return pa.table({"one": pa.array(
            [int((~np.isnan(lat)).sum())], type=pa.int64())})

    from ray.data.aggregate import Sum

    n_pts = int(ds.map_batches(n_partial, batch_format="pyarrow")
                .aggregate(Sum("one", alias_name="n"))["n"])

    got = dict(zip(agg["ri"].astype(int), agg["n_pairs"].astype(np.int64))) \
        if "ri" in agg.columns else {}
    rows = []
    for k, r in enumerate(radii):
        np_k = int(got.get(k, 0))
        if n_pts > 1:
            k_hat = (np.float64(_WORLD_AREA) * np.float64(2 * np_k)
                     / np.float64(n_pts * (n_pts - 1)))
        else:
            k_hat = np.float64(0)
        rows.append({"r": np.float64(r), "n_pairs": np.int64(np_k),
                     "k_hat": k_hat})
    return pd.DataFrame(rows)

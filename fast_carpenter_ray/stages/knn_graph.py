"""Radius-capped kNN graph: each point's k nearest OTHER points
within a distance cap — the spatial self-join.

``knn_join`` (stages/knn_join.py) joins a stream against a BROADCAST
site table; a self-graph over the corpus cannot broadcast the corpus,
so this operator uses the engine's co-location pattern instead (the
``knox_pairs`` shape): each point emits one "home" row in its own grid
cell plus "probe" copies to every cell its ``radius`` ball can touch
(lng wraps, lat clamps).  ONE cell-keyed shuffle co-locates each
home with every point that could be within ``radius`` — the cover is
complete, so the radius-capped kNN is EXACT.  The radius cap is what
makes the graph distributable: an uncapped kNN needs adaptive ring
expansion against a global index (that is ``knn_join``'s job).

In-group work is a chunked vectorized distance kernel + one
``lexsort``-free pandas ``sort_values`` / ``groupby.head(k)`` — no
per-row Python.  Groups hash into a bounded bucket space (the
``dedup_pair_stream`` pattern) so tiny cells don't each pay task
overhead.

Distances are squared degrees (``dx*dx + dy*dy``), the engine's
bit-reproducible euclid convention; ranking ties break on
``(dist, nbr_id)`` so output is deterministic.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["knn_graph"]

_CHUNK = 1_000_000


def knn_graph(ds, k: int, radius: float, res: int = 6,
              id_col: str = "doc_id", lat: str = "lat", lng: str = "lng",
              num_partitions: Optional[int] = None):
    """Dataset of ``(id, nbr_id, dist, rank)`` — for each point with
    valid coordinates, its up-to-``k`` nearest OTHER points within
    ``radius`` degrees (euclid on the lat/lng plane, ``dist`` in
    squared degrees), rank 1..k by ``(dist, nbr_id)``.

    Duplicate locations are distinct points (a point is never its own
    neighbour, but a co-located twin is, at dist 0).
    """
    if k < 1:
        raise ValueError("knn_graph: k must be >= 1")
    if radius <= 0:
        raise ValueError("knn_graph: radius must be > 0")
    from ..geo.cells import cell_xy

    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)

    n = 1 << res
    ring_y = int(math.ceil(radius / (180.0 / n)))
    ring_x = int(math.ceil(radius / (360.0 / n)))
    if (2 * ring_x + 1) > n:
        ring_x = n // 2      # ball wraps the globe: cover every column
    r2 = float(radius) * float(radius)
    id_c, lat_c, lng_c = id_col, lat, lng
    n_buckets = max(64, int(num_partitions) * 8)

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch[id_c].cast(pa.int64()).to_numpy(zero_copy_only=False)
        plat = batch[lat_c].to_numpy(zero_copy_only=False)
        plng = batch[lng_c].to_numpy(zero_copy_only=False)
        ix, iy = cell_xy(plat, plng, res)
        ok = (ix >= 0) & (iy >= 0)
        ids, plat, plng, ix, iy = (a[ok] for a in (ids, plat, plng, ix, iy))
        out = {"cell": [], "pid": [], "plat": [], "plng": [], "home": []}
        for dy in range(-ring_y, ring_y + 1):
            ny = iy + dy
            valid = (ny >= 0) & (ny < n)
            for dx in range(-ring_x, ring_x + 1):
                nx = (ix[valid] + dx) % n
                out["cell"].append(ny[valid] * n + nx)
                out["pid"].append(ids[valid])
                out["plat"].append(plat[valid])
                out["plng"].append(plng[valid])
                home = np.full(int(valid.sum()),
                               1 if (dy == 0 and dx == 0) else 0,
                               dtype=np.int8)
                out["home"].append(home)
        cat = np.concatenate
        t = pa.table({
            "cell": pa.array(cat(out["cell"]), type=pa.int64()),
            "pid": pa.array(cat(out["pid"]), type=pa.int64()),
            "plat": pa.array(cat(out["plat"]), type=pa.float64()),
            "plng": pa.array(cat(out["plng"]), type=pa.float64()),
            "home": pa.array(cat(out["home"])),
        })
        bkt = (t["cell"].to_numpy(zero_copy_only=False) * 1000003
               ) % n_buckets
        return t.append_column("_bkt", pa.array(bkt, type=pa.int64()))

    empty = pd.DataFrame({
        "id": pd.Series([], dtype="int64"),
        "nbr_id": pd.Series([], dtype="int64"),
        "dist": pd.Series([], dtype="float64"),
        "rank": pd.Series([], dtype="int64"),
    })

    def bucket_knn(grp: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in grp.groupby("cell", sort=False):
            h = g[g["home"] == 1]
            if len(h) == 0:
                continue
            hlat = h["plat"].to_numpy()
            hlng = h["plng"].to_numpy()
            hid = h["pid"].to_numpy()
            plat = g["plat"].to_numpy()
            plng = g["plng"].to_numpy()
            pid = g["pid"].to_numpy()
            step = max(1, _CHUNK // max(1, len(g)))
            for i0 in range(0, len(h), step):
                A = slice(i0, i0 + step)
                dx = hlat[A][:, None] - plat[None, :]
                dy = hlng[A][:, None] - plng[None, :]
                d = dx * dx + dy * dy
                hit = (d <= r2) & (hid[A][:, None] != pid[None, :])
                ai, bi = np.nonzero(hit)
                if len(ai) == 0:
                    continue
                frames.append(pd.DataFrame({
                    "id": hid[A][ai], "nbr_id": pid[bi],
                    "dist": d[ai, bi],
                }))
        if not frames:
            return empty
        cand = pd.concat(frames, ignore_index=True)
        cand = cand.sort_values(["id", "dist", "nbr_id"],
                                kind="stable")
        top = cand.groupby("id", sort=False).head(k).reset_index(drop=True)
        top["rank"] = top.groupby("id", sort=False).cumcount() + 1
        return top.astype({"id": "int64", "nbr_id": "int64",
                           "rank": "int64"})

    rows = ds.map_batches(expand, batch_format="pyarrow")
    return rows.groupby("_bkt", num_partitions=num_partitions).map_groups(
        bucket_knn, batch_format="pandas")

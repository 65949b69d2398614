"""Distributed Lloyd k-means over an embedding column.

The iterative-ML leg of the engine (reference has nothing iterative;
``stages/ann.py`` ivf_topk already fits a DRIVER-SAMPLE quantizer — this
is the full-data distributed version):

* broadcast the (k x d) centroid matrix into the per-batch closure
  (summary-sized by construction);
* per batch: one matmul assignment
  (``|x|^2 - 2 x.C^T + |c|^2``, argmin; ties -> lowest centroid id) fused
  with per-cluster partial sums (k rows x d+1 scalars);
* ONE tree combine per iteration (k x (d+1) values — independent of the
  corpus size); new centroids on the driver; empty clusters keep their
  previous centroid.
* final pass: the same broadcast assignment emitting ``(id, cluster)``.

The embedding stream is never shuffled, sorted or materialized — each
Lloyd iteration is one fused map pass + a constant-size combine, the
same per-iteration shape as ``linkgraph.pagerank``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["kmeans_assign", "kmeans"]


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    return np.stack(
        [np.asarray(e, dtype=np.float64) for e in batch[vec_col].to_pylist()])


def _assign(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    d2 = (X * X).sum(1)[:, None] - 2.0 * X @ C.T + (C * C).sum(1)[None, :]
    return np.argmin(d2, axis=1)  # first occurrence == lowest centroid id


def kmeans_assign(ds, centroids: np.ndarray,
                  centroid_ids: Optional[Sequence[int]] = None,
                  vec_col: str = "embedding", id_col: str = "vec_id"):
    """One broadcast assignment pass: ``(id_col, cluster)`` rows, cluster
    being the centroid id of the nearest centroid (squared-euclid, ties
    to the lowest id)."""
    C = np.asarray(centroids, dtype=np.float64)
    cid = (np.arange(len(C), dtype=np.int64) if centroid_ids is None
           else np.asarray(centroid_ids, dtype=np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        a = _assign(_batch_matrix(batch, vec_col), C)
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         "cluster": pa.array(cid[a])})

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans(ds, k: int = 8, iters: int = 5, vec_col: str = "embedding",
           id_col: str = "vec_id"):
    """Full Lloyd iteration; returns ``(assignments Dataset, centroids)``.

    Deterministic init: the centroids seed from the k rows with the
    smallest ``id_col`` (reproducible across runs and partitionings —
    the k-means++ alternative would need a random source, which this
    repo's resume discipline forbids inside operators).
    """
    from ..agg import combine_partials

    seed = ds.map_batches(
        lambda t: t.filter(pa.compute.less(t[id_col], int(k))),
        batch_format="pyarrow").to_pandas()
    if len(seed):
        seed = seed.sort_values(id_col)
    if len(seed) < k:
        raise ValueError(f"kmeans: need ids 0..{k - 1} present to seed "
                         f"(got {len(seed)})")
    C = np.stack([np.asarray(e, dtype=np.float64) for e in seed[vec_col]])
    d = C.shape[1]
    scols = [f"s{j}" for j in range(d)]

    for _ in range(iters):
        Cb = C  # rebind: broadcast the CURRENT centroids into the closure

        def partial(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 **{c: pa.array([], pa.float64())
                                    for c in scols}})
            X = _batch_matrix(batch, vec_col)
            a = _assign(X, Cb)
            u = np.unique(a)
            sums = np.zeros((len(u), d))
            cnt = np.zeros(len(u), dtype=np.int64)
            for i, c in enumerate(u.tolist()):  # <= k rows, not a row loop
                m = a == c
                sums[i] = X[m].sum(0)
                cnt[i] = int(m.sum())
            cols = {"cluster": pa.array(u.astype(np.int64)),
                    "n": pa.array(cnt)}
            for j, cname in enumerate(scols):
                cols[cname] = pa.array(sums[:, j])
            return pa.table(cols)

        agg = combine_partials(ds.map_batches(partial, batch_format="pyarrow"),
                               keys=["cluster"], value_cols=["n", *scols],
                               mode="tree").to_pandas()
        newC = C.copy()  # empty clusters keep their previous centroid
        cl = agg["cluster"].to_numpy().astype(np.int64)
        n = agg["n"].to_numpy().astype(np.float64)
        S = agg[scols].to_numpy()
        newC[cl] = S / n[:, None]
        C = newC

    return kmeans_assign(ds, C, vec_col=vec_col, id_col=id_col), C

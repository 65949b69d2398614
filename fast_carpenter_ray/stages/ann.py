"""Similarity search over an embedding column (list<float>).

Two paths, per the project brief:

* :func:`ann_topk` — brute-force cosine top-k as the exact baseline: the
  query matrix is broadcast (``ray.put``) once, every batch computes a
  vectorized matmul of its rows against the queries and emits its LOCAL
  top-k per query; a tiny ``groupby(query_id)`` re-top-k merges the
  partials.  Shuffle volume: O(n_batches * n_queries * k), never the
  embeddings.

* :class:`LSHBuckets` + :func:`near_dup_cosine` — the scale path:
  random-hyperplane signatures bucket vectors so candidate generation is a
  groupby, with exact cosine verification inside each bucket.  Recall < 1
  by construction (documented); the brute-force path is the oracle.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["ann_topk", "ivf_topk", "train_centroids", "LSHBuckets",
           "near_dup_cosine", "build_ivf_index", "ivf_search"]


def _matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col].combine_chunks() if isinstance(batch[col], pa.ChunkedArray) else batch[col]
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _merge_topk(local_df: pd.DataFrame, k: int):
    """Driver-side re-top-k of per-batch partial (query_id, neighbor_id,
    cosine) rows — the agg.py tree pattern; ties broken by neighbor_id."""
    import ray.data as rd

    out = []
    for _, g in local_df.groupby("query_id", sort=True):
        g = g.sort_values(["cosine", "neighbor_id"],
                          ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        out.append(g)
    merged = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
        {"query_id": pd.Series([], dtype="int64"),
         "neighbor_id": pd.Series([], dtype="int64"),
         "cosine": pd.Series([], dtype="float64"),
         "rank": pd.Series([], dtype="int32")})
    return rd.from_pandas(merged)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _LocalTopK:
    """Per-batch local top-k against the broadcast query matrix."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str,
                 exclude_self: bool):
        import ray

        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.query_ids = np.asarray(q["id"], dtype=np.int64)
        self.qm = _normalize(np.asarray(q["matrix"], dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.exclude_self = exclude_self

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(batch, self.vec_col))
        sims = self.qm @ m.T  # [n_queries, n_rows]
        if self.exclude_self:
            self_mask = self.query_ids[:, None] == ids[None, :]
            sims = np.where(self_mask, -np.inf, sims)
        kk = min(self.k, sims.shape[1])
        # stable partial sort: ties by candidate id (ids ascending within batch
        # is not guaranteed -> sort by (-sim, id) explicitly)
        out_q, out_i, out_s = [], [], []
        order_ids = np.argsort(ids, kind="stable")
        sims = sims[:, order_ids]
        sorted_ids = ids[order_ids]
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argsort(-row, kind="stable")[:kk]  # stable => id ties
            out_q.extend([int(self.query_ids[qi])] * len(top))
            out_i.extend(sorted_ids[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_i, type=pa.int64()),
            "cosine": pa.array(out_s, type=pa.float64()),
        })


def ann_topk(ds, queries: dict, k: int = 5, id_col: str = "vec_id",
             vec_col: str = "embedding", exclude_self: bool = True,
             concurrency=None, batch_size: int = 4096):
    """Exact cosine top-k of each query over the dataset.

    ``queries``: {"id": [...], "matrix": 2-D array}.  Returns a Dataset of
    (query_id, neighbor_id, cosine, rank) with exactly k rows per query.

    Default is a TASK pool: per-task setup is one zero-copy ``ray.get``
    of the broadcast query matrix plus a [Q, d] normalize — too cheap to
    justify an actor-pool ceiling (the earlier ``(1, 4)`` cap starved the
    stage at 32 CPUs).  Pass ``concurrency`` to opt into an actor pool
    when swapping in a real embedding model.
    """
    import ray

    ref = ray.put(queries)
    kw = dict(batch_format="pyarrow", batch_size=batch_size)
    ctor = {"queries_ref": ref, "k": k, "id_col": id_col,
            "vec_col": vec_col, "exclude_self": exclude_self}
    if concurrency is None:
        local = ds.map_batches(lambda b: _LocalTopK(**ctor)(b), **kw)
    else:
        local = ds.map_batches(_LocalTopK, fn_constructor_kwargs=ctor,
                               concurrency=concurrency, **kw)

    # merge partial top-ks: the partials are O(n_batches * n_queries * k)
    # rows — tiny by construction — so the final re-top-k happens ON THE
    # DRIVER (the agg.py tree-combine pattern).  Deliberately NOT a
    # repartition(1): an AllToAll op downstream of the map chain strangles
    # the upstream task budget under Ray 2.49's reservation-based resource
    # allocator (BASELINE.md lesson #2) and triggered actor-restart
    # object-store warnings in the round-1 bench log.
    import ray.data as rd

    return _merge_topk(local.to_pandas(), k)  # bounded: partials only


def train_centroids(matrix: np.ndarray, n_centroids: int, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Deterministic Lloyd k-means on a (small, driver-side) sample for
    the IVF coarse quantizer.  Cosine metric: everything normalized,
    assignment by max dot product."""
    m = _normalize(np.asarray(matrix, dtype=np.float64))
    rng = np.random.default_rng(seed)
    cents = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            members = m[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(ds, queries: dict, k: int = 5, n_centroids: int = 16,
             nprobe: int = 4, sample_size: int = 4096, seed: int = 42,
             id_col: str = "vec_id", vec_col: str = "embedding",
             exclude_self: bool = True, batch_size: int = 4096):
    """IVF (inverted-file) approximate cosine top-k — the scale path next
    to :func:`ann_topk`'s exact scan.

    Coarse quantizer: Lloyd k-means on a deterministic driver-side sample
    (``ds.limit(sample_size)``).  Each batch scores each query only
    against rows assigned to the query's ``nprobe`` nearest centroids —
    the per-batch win is the skipped distance computations, and with a
    centroid-partitioned layout whole blocks are skipped.  Recall < 1 for
    nprobe < n_centroids (documented approximation); ``nprobe ==
    n_centroids`` is exactly the brute-force ranking (pytest pins both
    properties).

    The probe state (query matrix + centroids + per-query shortlists,
    computed once on the driver) is a few KB — shipped in the task closure
    per BASELINE.md lesson 5 (broadcast-state stages run as stateless
    tasks unless per-actor state is genuinely heavy; an actor pool here
    also trips Ray's constructor-args-in-object-store restart hazard,
    ray-project/ray#53727)."""
    sample = ds.limit(sample_size).to_pandas()
    sm = np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    cents = train_centroids(sm, n_centroids, seed=seed)
    query_ids = np.asarray(queries["id"], dtype=np.int64)
    qm = _normalize(np.asarray(queries["matrix"], dtype=np.float64))
    # per-query probe shortlist: nprobe nearest centroids
    order = np.argsort(-(qm @ cents.T), axis=1, kind="stable")
    probe = order[:, :int(nprobe)]  # [n_queries, nprobe]

    def local_ivf(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(batch, vec_col))
        assign = np.argmax(m @ cents.T, axis=1)  # [n_rows]
        out_q, out_i, out_s = [], [], []
        order_ids = np.argsort(ids, kind="stable")
        m2, ids2, assign2 = m[order_ids], ids[order_ids], assign[order_ids]
        for qi in range(len(query_ids)):
            cand = np.isin(assign2, probe[qi])
            if exclude_self:
                cand &= ids2 != query_ids[qi]
            if not cand.any():
                continue
            sims = m2[cand] @ qm[qi]
            cids = ids2[cand]
            kk = min(k, len(sims))
            top = np.argsort(-sims, kind="stable")[:kk]  # stable => id ties
            out_q.extend([int(query_ids[qi])] * kk)
            out_i.extend(cids[top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_i, type=pa.int64()),
            "cosine": pa.array(out_s, type=pa.float64()),
        })

    local = ds.map_batches(local_ivf, batch_format="pyarrow",
                           batch_size=batch_size)
    import ray.data as rd

    return _merge_topk(local.to_pandas(), k)  # bounded: partials only


def build_ivf_index(ds, index_dir: str, n_centroids: int = 16,
                    sample_size: int = 4096, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Write a CENTROID-PARTITIONED Parquet layout: one hive partition per
    coarse-cluster id (``ivf_cell=<c>/``) plus a ``_ivf_centroids.json``
    sidecar.  This is the IVF *block-pruning* story :func:`ivf_topk`
    lacks: there every block is still scanned (the shortlist only skips
    distance math); here :func:`ivf_search` prunes whole fragments at the
    READ — only partitions in the union of the queries' probe sets leave
    storage.  Returns the trained centroid matrix."""
    import json
    import os

    sample = ds.limit(sample_size).to_pandas()
    sm = np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    cents = train_centroids(sm, n_centroids, seed=seed)

    def assign(batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch, vec_col))
        a = np.argmax(m @ cents.T, axis=1).astype(np.int64)
        return batch.append_column("ivf_cell", pa.array(a, type=pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["ivf_cell"])
    with open(os.path.join(index_dir, "_ivf_centroids.json"), "w") as f:
        json.dump({"centroids": cents.tolist()}, f)
    return cents


def ivf_search(index_dir: str, queries: dict, k: int = 5, nprobe: int = 4,
               id_col: str = "vec_id", vec_col: str = "embedding",
               exclude_self: bool = True, batch_size: int = 4096):
    """Search a :func:`build_ivf_index` layout, reading ONLY the probed
    partitions.  Returns ``(result_dataset, stats)`` where stats records
    ``files_read``/``files_total`` (the measured block-pruning win) and
    ``cells_probed``/``cells_total``.  At ``nprobe == n_centroids`` the
    ranking is exactly brute force (pytest pins it against
    :func:`ann_topk`); below, recall < 1 by construction."""
    import glob
    import json
    import os

    import ray.data as rd

    with open(os.path.join(index_dir, "_ivf_centroids.json")) as f:
        cents = np.asarray(json.load(f)["centroids"], dtype=np.float64)
    query_ids = np.asarray(queries["id"], dtype=np.int64)
    qm = _normalize(np.asarray(queries["matrix"], dtype=np.float64))
    order = np.argsort(-(qm @ cents.T), axis=1, kind="stable")
    probe = order[:, :int(nprobe)]  # [n_queries, nprobe]

    all_cells = sorted(
        int(d.split("=", 1)[1]) for d in os.listdir(index_dir)
        if d.startswith("ivf_cell="))
    probed = sorted(set(int(c) for c in probe.ravel()) & set(all_cells))
    count_files = (lambda cell: len(glob.glob(
        os.path.join(index_dir, f"ivf_cell={cell}", "*.parquet"))))
    stats = {
        "cells_probed": len(probed), "cells_total": len(all_cells),
        "files_read": sum(count_files(c) for c in probed),
        "files_total": sum(count_files(c) for c in all_cells),
    }
    if not probed:
        return _merge_topk(pd.DataFrame(
            {"query_id": pd.Series([], dtype="int64"),
             "neighbor_id": pd.Series([], dtype="int64"),
             "cosine": pd.Series([], dtype="float64")}), k), stats

    # only the probed FILES are ever handed to the reader (Ray's
    # read_parquet does not expand directories given in a list); the
    # partition column is re-derived per batch (one small matmul) rather
    # than relying on hive-column inference across readers
    paths = [p for c in probed for p in sorted(glob.glob(
        os.path.join(index_dir, f"ivf_cell={c}", "*.parquet")))]
    ds = rd.read_parquet(paths, columns=[id_col, vec_col])

    def local(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(_matrix(batch, vec_col))
        assign = np.argmax(m @ cents.T, axis=1)
        out_q, out_i, out_s = [], [], []
        o = np.argsort(ids, kind="stable")
        m2, ids2, assign2 = m[o], ids[o], assign[o]
        for qi in range(len(query_ids)):
            cand = np.isin(assign2, probe[qi])
            if exclude_self:
                cand &= ids2 != query_ids[qi]
            if not cand.any():
                continue
            sims = m2[cand] @ qm[qi]
            cids = ids2[cand]
            kk = min(k, len(sims))
            top = np.argsort(-sims, kind="stable")[:kk]
            out_q.extend([int(query_ids[qi])] * kk)
            out_i.extend(cids[top].tolist())
            out_s.extend(sims[top].tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_i, type=pa.int64()),
            "cosine": pa.array(out_s, type=pa.float64()),
        })

    local_ds = ds.map_batches(local, batch_format="pyarrow",
                              batch_size=batch_size)
    return _merge_topk(local_ds.to_pandas(), k), stats


class LSHBuckets:
    """Random-hyperplane (SimHash-for-vectors) bucketing stage."""

    def __init__(self, n_planes: int = 12, vec_col: str = "embedding",
                 dim: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch, self.vec_col)
        signs = (m @ self.planes) > 0
        bucket = (signs @ (1 << np.arange(signs.shape[1]))).astype(np.int64)
        return batch.append_column("lsh_bucket", pa.array(bucket, type=pa.int64()))


def near_dup_cosine(ds, threshold: float = 0.9, id_col: str = "vec_id",
                    vec_col: str = "embedding", dim: int = 64,
                    n_planes: int = 12, seed: int = 42):
    """Embedding near-dup pairs via LSH buckets + exact in-bucket cosine.

    Approximate (bucket recall < 1); exact verification within buckets.
    """
    bucketed = ds.map_batches(
        LSHBuckets,
        fn_constructor_kwargs={"n_planes": n_planes, "vec_col": vec_col,
                               "dim": dim, "seed": seed},
        batch_format="pyarrow", concurrency=(1, 2))

    def empty():
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return empty()
        g = group.sort_values(id_col)
        ids = g[id_col].to_numpy()
        m = _normalize(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        sims = m @ m.T
        iu = np.triu_indices(len(ids), k=1)
        hit = sims[iu] >= threshold
        if not hit.any():
            return empty()
        return pd.DataFrame({
            "id_a": ids[iu[0][hit]].astype(np.int64),
            "id_b": ids[iu[1][hit]].astype(np.int64),
            "cosine": sims[iu][hit].astype(np.float64),
        })

    from ..agg import default_partitions

    np_ = default_partitions(4)
    # Each vector has exactly ONE signature bucket (single hyperplane sign
    # vector, not banded like MinHash), so a pair can only be emitted by the
    # one bucket both members share — pairs are globally unique already and
    # no cross-bucket dedupe shuffle is needed.
    return bucketed.groupby("lsh_bucket", num_partitions=np_).map_groups(
        pairs, batch_format="pandas")

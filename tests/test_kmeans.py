"""Distributed Lloyd k-means vs a local NumPy reference."""

import numpy as np
import pandas as pd
import pytest

from fast_carpenter_ray.stages.kmeans import kmeans, kmeans_assign


def _data(n=600, d=8, k=4, seed=29):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (k, d))
    X = centers[rng.integers(0, k, n)] + rng.normal(0, 1, (n, d))
    # ids 0..k-1 become the seeds; keep them one per true cluster
    X[:k] = centers + rng.normal(0, 0.1, (k, d))
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
    })


def _local_lloyd(df, k, iters):
    X = np.stack([np.asarray(e, dtype=np.float64) for e in df["embedding"]])
    C = X[np.argsort(df["vec_id"].to_numpy())[:k]]
    for _ in range(iters):
        d2 = (X * X).sum(1)[:, None] - 2 * X @ C.T + (C * C).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(0)
    d2 = (X * X).sum(1)[:, None] - 2 * X @ C.T + (C * C).sum(1)[None, :]
    return np.argmin(d2, axis=1), C


def test_kmeans_matches_local_reference(ray_session):
    import ray.data as rd

    df = _data()
    got_ds, C = kmeans(rd.from_pandas(df).repartition(5), k=4, iters=3)
    got = got_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    exp_a, exp_C = _local_lloyd(df, 4, 3)
    # well-separated synthetic clusters: assignments must agree exactly
    np.testing.assert_array_equal(got["cluster"].to_numpy(), exp_a)
    np.testing.assert_allclose(C, exp_C, rtol=0, atol=1e-9)


def test_kmeans_assign_tie_breaks_to_lowest_id(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "vec_id": np.array([0, 1], dtype=np.int64),
        "embedding": [np.zeros(4, np.float32), np.ones(4, np.float32)],
    })
    # two identical centroids: every point must pick centroid id 10
    C = np.ones((2, 4))
    got = (kmeans_assign(rd.from_pandas(df), C, centroid_ids=[10, 20])
           .to_pandas().sort_values("vec_id"))
    assert got["cluster"].tolist() == [10, 10]


def test_kmeans_requires_seed_ids(ray_session):
    import ray.data as rd

    df = _data(n=20)
    df["vec_id"] += 100  # ids 0..k-1 absent
    with pytest.raises(ValueError, match="seed"):
        kmeans(rd.from_pandas(df), k=4, iters=1)

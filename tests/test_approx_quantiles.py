"""Deterministic mergeable quantile summary (stages/quantile.py
approx_quantiles)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.quantile import approx_quantiles


def _ds(vals, blocks=8):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "value": pa.array(np.asarray(vals, dtype=np.float64)),
    })).repartition(blocks)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "bimodal"])
def test_rank_error_within_bound(ray_session, dist):
    rng = np.random.RandomState(31)
    n = 100_000
    if dist == "uniform":
        v = rng.uniform(0, 1, n)
    elif dist == "lognormal":
        v = rng.lognormal(0, 2, n)
    else:
        v = np.concatenate([rng.normal(-50, 1, n // 2),
                            rng.normal(50, 1, n - n // 2)])
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    k = 512
    out = approx_quantiles(_ds(v, blocks=16), "value", qs, k_per_block=k)
    sv = np.sort(v)
    for q, est, bound in zip(out["q"], out["value"],
                             out["rank_error_bound"]):
        true_rank = q * n
        est_rank = np.searchsorted(sv, est, side="left")
        # bound is n/k per the merge analysis; allow the searchsorted
        # rank discretization on top
        assert abs(est_rank - true_rank) <= bound + 16, (q, dist)
    # values are actual data points
    assert all(val in set(np.round(v, 12)) or val in v
               for val in out["value"])


def test_small_input_exact(ray_session):
    v = np.arange(100, dtype=np.float64)
    out = approx_quantiles(_ds(v, blocks=2), "value", [0.5],
                           k_per_block=1024)
    # every point survives when n <= k per block: read-off is exact
    assert abs(out["value"].iloc[0] - 49.0) <= 1.0


def test_nan_and_empty(ray_session):
    v = np.array([np.nan, 1.0, np.nan, 2.0])
    out = approx_quantiles(_ds(v, blocks=1), "value", [0.5], 16)
    assert out["value"].iloc[0] in (1.0, 2.0)
    empty = approx_quantiles(_ds(np.array([np.nan])), "value", [0.5], 16)
    assert np.isnan(empty["value"].iloc[0])


def test_validation(ray_session):
    with pytest.raises(ValueError):
        approx_quantiles(_ds([1.0]), "value", [])
    with pytest.raises(ValueError):
        approx_quantiles(_ds([1.0]), "value", [0.5], k_per_block=1)

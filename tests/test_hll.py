"""HyperLogLog registers + estimate (stages/sketch.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.sketch import (
    _bit_length_u64, hll_estimate, hll_registers)
from fast_carpenter_ray.stages.sample import mix64


def _ds(ids):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "user_id": pa.array(np.asarray(ids, dtype=np.int64)),
    }))


def test_bit_length_exact_vs_python():
    rng = np.random.RandomState(5)
    vals = np.concatenate([
        np.array([0, 1, 2, 3, (1 << 52) - 1, 1 << 52, (1 << 63) - 1,
                  1 << 63, (1 << 64) - 1], dtype=np.uint64),
        rng.randint(0, 1 << 62, 500).astype(np.uint64),
    ])
    got = _bit_length_u64(vals)
    want = [int(v).bit_length() for v in vals]
    assert got.tolist() == want


def _brute_registers(ids, p, seed=0):
    z = mix64(np.asarray(ids, dtype=np.int64), seed)
    w = 64 - p
    regs = {}
    for v in z:
        b = int(v) >> w
        rem = int(v) & ((1 << w) - 1)
        rho = (w + 1) - rem.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


@pytest.mark.parametrize("p", [4, 10])
def test_registers_match_bruteforce(ray_session, p):
    ids = np.arange(1, 1500)
    got = hll_registers(_ds(ids), "user_id", p=p).to_pandas()
    want = _brute_registers(ids, p)
    assert dict(zip(got["bucket"].astype(int),
                    got["max_rho"].astype(int))) == want


def test_duplicates_cannot_change_registers(ray_session):
    ids = np.arange(1, 400)
    a = hll_registers(_ds(ids), "user_id", p=8).to_pandas()
    b = hll_registers(_ds(np.tile(ids, 7)), "user_id", p=8).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("bucket").reset_index(drop=True),
        b.sort_values("bucket").reset_index(drop=True))


def test_registers_merge_elementwise_max(ray_session):
    left = np.arange(1, 900)
    right = np.arange(500, 2000)
    ra = _brute_registers(left, 10)
    rb = _brute_registers(right, 10)
    merged = {b: max(ra.get(b, 0), rb.get(b, 0))
              for b in set(ra) | set(rb)}
    got = hll_registers(
        _ds(np.concatenate([left, right])), "user_id", p=10).to_pandas()
    assert dict(zip(got["bucket"].astype(int),
                    got["max_rho"].astype(int))) == merged


@pytest.mark.parametrize("n,p,tol", [(5000, 12, 0.05), (50000, 12, 0.05)])
def test_estimate_error_bound(ray_session, n, p, tol):
    ids = np.arange(1, n + 1)
    regs = hll_registers(_ds(ids), "user_id", p=p).to_pandas()
    est = hll_estimate(regs, p=p)
    assert abs(est - n) / n < tol   # ~3x the 1.04/sqrt(4096) sigma


def test_p_validation(ray_session):
    with pytest.raises(ValueError):
        hll_registers(_ds([1]), "user_id", p=2)

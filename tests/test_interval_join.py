"""Interval-overlap join (stages/interval_join.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.interval_join import interval_join


def _ds(ivs, side=None):
    """ivs: list of (id, s, e)."""
    import ray.data as rd
    t = {
        "id": pa.array([r[0] for r in ivs], type=pa.int64()),
        "s": pa.array([r[1] for r in ivs], type=pa.int64()),
        "e": pa.array([r[2] for r in ivs], type=pa.int64()),
    }
    if side is not None:
        t["side"] = pa.array(side, type=pa.int8())
    return rd.from_arrow(pa.table(t))


def _norm(out):
    if out.empty:
        return pd.DataFrame(columns=["id_a", "id_b", "overlap_us"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _brute(left, right):
    rows = []
    for ia, sa, ea in left:
        for ib, sb, eb in right:
            if sa <= eb and sb <= ea:
                rows.append((ia, ib, min(ea, eb) - max(sa, sb)))
    return sorted(rows)


@pytest.mark.parametrize("w", [10, 100, 1000, 7])
def test_matches_bruteforce_any_bucket_width(ray_session, w):
    rng = np.random.RandomState(4)
    def mk(n, base):
        s = rng.randint(0, 2000, n)
        return [(base + i, int(x), int(x + rng.randint(0, 150)))
                for i, x in enumerate(s)]
    left, right = mk(120, 0), mk(130, 1000)
    got = _norm(interval_join(_ds(left), _ds(right),
                              bucket_width=w).to_pandas())
    assert list(map(tuple, got.to_numpy())) == _brute(left, right)


def test_single_pass_side_column_equals_two_dataset_form(ray_session):
    rng = np.random.RandomState(9)
    ivs, sides = [], []
    for i in range(200):
        s = int(rng.randint(0, 3000))
        ivs.append((i, s, s + int(rng.randint(0, 200))))
        sides.append(i % 2)
    left = [iv for iv, sd in zip(ivs, sides) if sd == 0]
    right = [iv for iv, sd in zip(ivs, sides) if sd == 1]
    a = _norm(interval_join(_ds(left), _ds(right),
                            bucket_width=64).to_pandas())
    b = _norm(interval_join(_ds(ivs, side=sides), side_col="side",
                            bucket_width=64).to_pandas())
    pd.testing.assert_frame_equal(a, b)


def test_touching_intervals_overlap_zero(ray_session):
    got = _norm(interval_join(_ds([(1, 0, 100)]), _ds([(2, 100, 200)]),
                              bucket_width=64).to_pandas())
    assert list(map(tuple, got.to_numpy())) == [(1, 2, 0)]


def test_no_overlap_emits_nothing(ray_session):
    got = _norm(interval_join(_ds([(1, 0, 10)]), _ds([(2, 11, 20)]),
                              bucket_width=4).to_pandas())
    assert len(got) == 0


def test_spanning_interval_emitted_once(ray_session):
    # one huge left interval overlapping many right ones across buckets:
    # canonical attribution must yield exactly one row per pair
    left = [(1, 0, 10_000)]
    right = [(100 + i, i * 50, i * 50 + 10) for i in range(100)]
    got = _norm(interval_join(_ds(left), _ds(right),
                              bucket_width=100).to_pandas())
    assert len(got) == 100
    assert got["id_b"].is_unique


def test_arg_validation(ray_session):
    with pytest.raises(ValueError):
        interval_join(_ds([(1, 0, 1)]))
    with pytest.raises(ValueError):
        interval_join(_ds([(1, 0, 1)]), _ds([(2, 0, 1)]), side_col="side")
    with pytest.raises(ValueError):
        interval_join(_ds([(1, 0, 1)]), _ds([(2, 0, 1)]), bucket_width=0)

"""Knox space-time interaction count (stages/knox.py)."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.knox import knox_pairs


def _ds(rows):
    """rows: (ts_us, event_id, cell)"""
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "ts": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_id": pa.array([r[1] for r in rows], type=pa.int64()),
        "cell": pa.array([r[2] for r in rows], type=pa.int64()),
    }))


def _brute(rows, tau, g):
    total = 0
    for i, (ta, ia, ca) in enumerate(rows):
        for tb, ib, cb in rows[:i] + rows[i + 1:]:
            if not (0 <= ta - tb <= tau):
                continue
            if ta == tb and ia <= ib:
                continue
            xa, ya = ca // g, ca % g
            xb, yb = cb // g, cb % g
            if abs(xa - xb) > 1:
                continue
            if min((ya - yb) % g, (yb - ya) % g) > 1:
                continue
            total += 1
    return total


@pytest.mark.parametrize("seed,n,tau", [(1, 300, 100), (2, 500, 1000),
                                        (3, 200, 7)])
def test_matches_bruteforce(ray_session, seed, n, tau):
    rng = np.random.RandomState(seed)
    rows = list(zip(rng.randint(0, 5000, n).tolist(),
                    range(1, n + 1),
                    rng.randint(0, 64, n).tolist()))
    got = knox_pairs(_ds(rows), tau_us=tau, n_grid=8).iloc[0]
    assert int(got["st_pairs"]) == _brute(rows, tau, 8)
    assert int(got["n_events"]) == n


def test_wrap_and_clamp_adjacency(ray_session):
    # y wraps: columns 0 and 7 are adjacent; x clamps: rows 0 and 7 not
    same_t = 100
    wrap = [(same_t, 1, 0 * 8 + 0), (same_t, 2, 0 * 8 + 7)]
    clamp = [(same_t, 1, 0 * 8 + 3), (same_t, 2, 7 * 8 + 3)]
    assert int(knox_pairs(_ds(wrap), tau_us=10).iloc[0]["st_pairs"]) == 1
    assert int(knox_pairs(_ds(clamp), tau_us=10).iloc[0]["st_pairs"]) == 0


def test_boundary_gap_exactly_tau_counts(ray_session):
    rows = [(0, 1, 9), (1000, 2, 9), (2001, 3, 9)]
    got = knox_pairs(_ds(rows), tau_us=1000).iloc[0]
    # (1,2) gap 1000 counts; (2,3) gap 1001 does not; (1,3) gap 2001 no
    assert int(got["st_pairs"]) == 1


def test_tau_validation(ray_session):
    with pytest.raises(ValueError):
        knox_pairs(_ds([(0, 1, 0)]), tau_us=0)

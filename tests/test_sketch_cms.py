"""Count-Min sketch (stages/sketch.py cms_registers / cms_query)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from fast_carpenter_ray.stages.sketch import cms_query, cms_registers


def _ds(ids):
    import ray.data as rd
    return rd.from_arrow(pa.table({"user_id": pa.array(ids,
                                                       type=pa.int64())}))


def test_never_underestimates_and_heavy_hitters_exact(ray_session):
    rng = np.random.default_rng(2)
    ids = np.concatenate([
        np.full(500, 7, dtype=np.int64),          # heavy hitter
        np.full(200, 42, dtype=np.int64),
        rng.integers(1000, 5000, 800).astype(np.int64)])
    reg = cms_registers(_ds(ids), "user_id", width=1024,
                        depth=4).to_pandas()
    probe = np.array([7, 42, 999999], dtype=np.int64)
    est = cms_query(reg, probe, width=1024, depth=4)
    true = np.array([(ids == p).sum() for p in probe])
    assert (est >= true).all()                    # CMS property
    # heavy hitters dominate their counters: estimates within eps*N
    assert est[0] - true[0] <= len(ids) * 2 / 1024 * 4
    assert est[1] - true[1] <= len(ids) * 2 / 1024 * 4


def test_registers_merge_by_sum(ray_session):
    a = np.arange(0, 400, dtype=np.int64) % 37
    b = np.arange(400, 900, dtype=np.int64) % 37
    w, d = 256, 3
    ra = cms_registers(_ds(a), "user_id", width=w, depth=d).to_pandas()
    rb = cms_registers(_ds(b), "user_id", width=w, depth=d).to_pandas()
    rab = cms_registers(_ds(np.concatenate([a, b])), "user_id",
                        width=w, depth=d).to_pandas()
    merged = (pd.concat([ra, rb]).groupby(["row", "col"], as_index=False)
              ["n"].sum())
    key = lambda df: {(int(r.row), int(r.col)): int(r.n)
                      for r in df.itertuples()}
    assert key(merged) == key(rab)


def test_total_mass_per_row(ray_session):
    ids = np.arange(1000, dtype=np.int64)
    reg = cms_registers(_ds(ids), "user_id", width=128,
                        depth=3).to_pandas()
    per_row = reg.groupby("row")["n"].sum()
    assert (per_row == 1000).all()

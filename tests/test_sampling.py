"""Leakage-safe group split (stages/sample.py group_split)."""

import numpy as np
import pyarrow as pa
import pytest


def test_group_split_no_leakage(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.sample import group_split

    t = pa.table({
        "rid": pa.array(np.arange(200), type=pa.int64()),
        "host": pa.array([f"h{i % 17}.example" for i in range(200)]),
    })
    out = group_split(rd.from_arrow(t).repartition(3),
                      group_col="host").to_pandas()
    # every host maps to exactly one split, across all partitions
    assert (out.groupby("host")["split"].nunique() == 1).all()
    assert set(out["split"]) <= {"train", "val", "test"}
    # deterministic across runs
    out2 = group_split(rd.from_arrow(t), group_col="host").to_pandas()
    m1 = dict(zip(out["host"], out["split"]))
    m2 = dict(zip(out2["host"], out2["split"]))
    assert m1 == m2


def test_group_split_seed_changes_assignment(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.sample import group_split

    t = pa.table({"host": pa.array([f"h{i}.example" for i in range(300)])})
    a = group_split(rd.from_arrow(t), group_col="host",
                    seed=0).to_pandas()
    b = group_split(rd.from_arrow(t), group_col="host",
                    seed=1).to_pandas()
    assert (a["bucket"].to_numpy() != b["bucket"].to_numpy()).any()
    # fractions roughly respected at 300 hosts (coarse sanity)
    frac = (a["split"] == "train").mean()
    assert 0.6 < frac < 0.95


def test_group_split_rejects_bad_fractions(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.sample import group_split

    with pytest.raises(ValueError):
        group_split(rd.range(5), group_col="id",
                    fractions={"a": 0.5, "b": 0.1})

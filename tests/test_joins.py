import numpy as np
import pyarrow as pa

from fast_carpenter_ray.stages.joins import hash_join, lookup_join


def test_lookup_join(ray_session):
    import ray.data as rd

    probe = rd.from_arrow(pa.table({"k": [1, 2, 3, 2], "x": [10.0, 20.0, 30.0, 40.0]}))
    dim = pa.table({"k": [1, 2], "name": ["a", "b"]})
    out = lookup_join(probe, dim, key="k", how="inner").to_pandas()
    assert sorted(out["name"]) == ["a", "b", "b"]
    left = lookup_join(probe, dim, key="k", how="left").to_pandas()
    assert len(left) == 4 and left["name"].isna().sum() == 1


def test_hash_join_matches_pandas(ray_session):
    import pandas as pd
    import ray.data as rd

    rng = np.random.default_rng(7)
    l = pa.table({"k": rng.integers(0, 50, 500), "v": rng.standard_normal(500)})
    r = pa.table({"k": np.arange(40), "w": np.arange(40) * 2.0})
    out = hash_join(rd.from_arrow(l).repartition(4), rd.from_arrow(r).repartition(2),
                    key="k", num_partitions=4).to_pandas()
    expect = l.to_pandas().merge(r.to_pandas(), on="k")
    assert len(out) == len(expect)
    assert out["w"].sum() == expect["w"].sum()

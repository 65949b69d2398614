import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.encode import target_encode


def _ds(keys, vals):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "rid": pa.array(np.arange(len(keys)), type=pa.int64()),
        "k": pa.array(keys),
        "x": pa.array(np.asarray(vals, dtype=np.float64)),
    })).repartition(3)


def test_target_encode_basic(ray_session):
    # key a: values 1, 2, 3 -> loo = (6-x)/2; key b singleton -> global loo
    out = target_encode(_ds(["a", "a", "a", "b"], [1, 2, 3, 10]),
                        key="k", target="x", id_cols=["rid"]).to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)
    assert out.loc[0, "loo_mean"] == pytest.approx((6 - 1) / 2)
    assert out.loc[1, "loo_mean"] == pytest.approx((6 - 2) / 2)
    assert out.loc[2, "loo_mean"] == pytest.approx((6 - 3) / 2)
    # singleton b: global leave-one-out = (16 - 10) / 3
    assert out.loc[3, "loo_mean"] == pytest.approx((16 - 10) / 3)


def test_target_encode_matches_brute(ray_session):
    rng = np.random.default_rng(9)
    keys = [f"k{int(i)}" for i in rng.integers(0, 12, 300)]
    vals = rng.integers(0, 100, 300).astype(np.float64)
    out = target_encode(_ds(keys, vals), key="k", target="x",
                        id_cols=["rid"]).to_pandas()
    out = out.sort_values("rid").reset_index(drop=True)
    gs, gn = vals.sum(), len(vals)
    for i, (k, x) in enumerate(zip(keys, vals)):
        same = [v for kk, v in zip(keys, vals) if kk == k]
        if len(same) > 1:
            want = (sum(same) - x) / (len(same) - 1)
        else:
            want = (gs - x) / (gn - 1)
        assert out.loc[i, "loo_mean"] == pytest.approx(want)


def test_target_encode_keeps_all_columns_without_idcols(ray_session):
    out = target_encode(_ds(["a", "a"], [1, 3]), key="k",
                        target="x").to_pandas()
    assert set(out.columns) == {"rid", "k", "x", "loo_mean"}
    assert sorted(out["loo_mean"]) == [1.0, 3.0]


def test_target_encode_join_fallback_matches_broadcast(ray_session):
    rng = np.random.default_rng(13)
    keys = [f"k{int(i)}" for i in rng.integers(0, 30, 500)]
    vals = rng.integers(0, 50, 500).astype(np.float64)
    ds = _ds(keys, vals)
    bc = target_encode(ds, key="k", target="x", id_cols=["rid"]).to_pandas()
    jn = target_encode(ds, key="k", target="x", id_cols=["rid"],
                       broadcast_budget=0).to_pandas()
    bc = bc.sort_values("rid").reset_index(drop=True)
    jn = jn.sort_values("rid").reset_index(drop=True)
    assert (bc["loo_mean"] == jn["loo_mean"]).all()

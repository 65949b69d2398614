"""Misra-Gries heavy hitters — guarantee, mergeability, exactness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.sketch import heavy_hitters, mg_compress, mg_merge


def test_mg_compress_bounds_and_guarantee():
    counts = {i: 1 for i in range(100)}
    counts[500] = 60  # heavy: 60/160 of the stream
    c = mg_compress(counts, 8)
    assert len(c) <= 8
    assert 500 in c  # freq > n/(k+1) must survive
    # counters are lower bounds under-estimating by <= n/(k+1)
    assert c[500] <= 60


def test_mg_merge_keeps_heavy():
    rng = np.random.default_rng(31)
    stream = np.concatenate([rng.integers(0, 1000, 5000),
                             np.full(2000, 7), np.full(1500, 13)])
    rng.shuffle(stream)
    halves = np.array_split(stream, 2)
    summaries = []
    for h in halves:
        items, counts = np.unique(h, return_counts=True)
        summaries.append(mg_compress(dict(zip(items.tolist(), counts.tolist())), 16))
    merged = mg_merge(summaries[0], summaries[1], 16)
    assert 7 in merged and 13 in merged


@pytest.mark.parametrize("exact", [True, False])
def test_heavy_hitters_finds_planted(ray_session, exact):
    import ray.data as rd

    rng = np.random.default_rng(37)
    light = rng.integers(0, 10_000, 20_000)
    heavy = np.concatenate([np.full(5_000, 42), np.full(3_000, 99)])
    v = np.concatenate([light, heavy])
    rng.shuffle(v)
    ds = rd.from_arrow(pa.table({"x": v.astype(np.int64)})).repartition(8)
    out = heavy_hitters(ds, "x", min_frac=0.05, exact=exact)
    assert set(out["item"]) == {42, 99}
    if exact:
        n = len(v)
        exp42 = int((v == 42).sum())
        exp99 = int((v == 99).sum())
        assert out.set_index("item").loc[42, "n"] == exp42
        assert out.set_index("item").loc[99, "n"] == exp99


def test_heavy_hitters_validates_params(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": pa.array([1, 2], type=pa.int64())}))
    with pytest.raises(ValueError, match="min_frac"):
        heavy_hitters(ds, "x", min_frac=0.0)
    with pytest.raises(ValueError, match="k too small"):
        heavy_hitters(ds, "x", min_frac=0.1, k=5)


def test_exact_quantiles_match_numpy_definition(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.quantile import exact_quantiles

    rng = np.random.default_rng(41)
    v = rng.integers(0, 500, 10_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": v})).repartition(8)
    got = exact_quantiles(ds, "x", [0.25, 0.5, 0.9, 1.0])
    sv = np.sort(v)
    for _, r in got.iterrows():
        target = int(np.ceil(r["q"] * len(v)))
        assert r["value"] == sv[target - 1]


def test_exact_quantiles_validates(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.quantile import exact_quantiles

    ds = rd.from_arrow(pa.table({"x": pa.array([1, 2, 3], type=pa.int64())}))
    with pytest.raises(ValueError, match="fractions"):
        exact_quantiles(ds, "x", [0.0])
    with pytest.raises(ValueError, match="driver budget"):
        exact_quantiles(ds, "x", [0.5], max_driver_rows=1)


def test_grouped_quantiles_match_numpy(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.quantile import grouped_quantiles

    rng = np.random.default_rng(53)
    n = 8000
    g = rng.integers(0, 4, n).astype(np.int64)
    v = rng.integers(0, 300, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "v": v})).repartition(6)
    got = grouped_quantiles(ds, "g", "v", [0.5, 0.9]).to_pandas()
    got = got.sort_values(["g", "q"]).reset_index(drop=True)
    for _, r in got.iterrows():
        sub = np.sort(v[g == r["g"]])
        target = int(np.ceil(r["q"] * len(sub)))
        assert r["value"] == sub[target - 1]


def test_percentile_rank_matches_scipy_style_rank(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.quantile import percentile_rank

    rng = np.random.default_rng(67)
    n = 9000
    v = rng.integers(0, 400, n).astype(np.int64)  # heavy ties
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "x": v})).repartition(7)
    got = (percentile_rank(ds, "x", keep=["doc_id"], out="rnk")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # SQL rank(): 1 + number of strictly smaller values
    order = np.argsort(v, kind="stable")
    sv = v[order]
    expect = np.searchsorted(sv, v, side="left") + 1
    assert got["rnk"].to_numpy().tolist() == expect.tolist()
    assert got["x"].to_numpy().tolist() == v.tolist()


def test_percentile_rank_driver_budget(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.quantile import percentile_rank

    v = np.arange(100, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": v, "x": v}))
    with pytest.raises(ValueError, match="budget"):
        percentile_rank(ds, "x", max_driver_rows=3)


def test_grouped_weighted_median_matches_expansion(ray_session):
    """Weighted lower median == unweighted lower median of the
    weight-expanded multiset (np.repeat reference)."""
    import ray.data as rd

    from fast_carpenter_ray.stages.quantile import grouped_weighted_median

    rng = np.random.default_rng(91)
    n = 6000
    g = rng.integers(0, 5, n).astype(np.int64)
    v = rng.integers(-50, 50, n).astype(np.int64)
    w = rng.integers(1, 7, n).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": g, "v": v, "w": w})).repartition(5)
    got = grouped_weighted_median(ds, "g", "v", "w").to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    assert len(got) == 5
    for _, r in got.iterrows():
        sub = np.sort(np.repeat(v[g == r["g"]], w[g == r["g"]]))
        # lower median: smallest value with 2*cumw >= total
        expect = sub[int(np.ceil(len(sub) / 2)) - 1]
        assert r["wmedian"] == expect


def test_grouped_weighted_median_unit_weights_match_median(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.quantile import (grouped_quantiles,
                                                    grouped_weighted_median)

    rng = np.random.default_rng(92)
    n = 4000
    g = rng.integers(0, 3, n).astype(np.int64)
    v = rng.integers(0, 200, n).astype(np.int64)
    t = pa.table({"g": g, "v": v, "w": np.ones(n, dtype=np.int64)})
    ds = rd.from_arrow(t).repartition(4)
    wm = grouped_weighted_median(ds, "g", "v", "w").to_pandas()
    q5 = grouped_quantiles(ds, "g", "v", [0.5]).to_pandas()
    merged = wm.merge(q5[["g", "value"]], on="g")
    assert (merged["wmedian"] == merged["value"]).all()


def test_quantile_bucket_quartiles(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.quantile import quantile_bucket

    # 1..100: quartile edges (type-1) at 25, 50, 75; bucket = 1 + #{e < x}
    t = pa.table({"doc_id": pa.array(np.arange(100), type=pa.int64()),
                  "v": pa.array(np.arange(1.0, 101.0))})
    out = quantile_bucket(rd.from_arrow(t).repartition(4), col="v", k=4,
                          keep=("doc_id",)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    v = np.arange(1, 101)
    want = 1 + (v > 25).astype(int) + (v > 50).astype(int) + (v > 75).astype(int)
    np.testing.assert_array_equal(out["bucket"].to_numpy(), want)
    # perfectly balanced: 25 rows per bucket
    assert out["bucket"].value_counts().tolist() == [25, 25, 25, 25]


def test_quantile_bucket_ties_never_split(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.quantile import quantile_bucket

    # 90% of the mass on one value: all copies share a bucket
    vals = np.array([5.0] * 90 + list(range(100, 110)))
    t = pa.table({"doc_id": pa.array(np.arange(100), type=pa.int64()),
                  "v": pa.array(vals)})
    out = quantile_bucket(rd.from_arrow(t).repartition(3), col="v", k=4,
                          keep=("doc_id",)).to_pandas()
    assert out[out["doc_id"] < 90]["bucket"].nunique() == 1


def test_quantile_bucket_rejects_k1(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.quantile import quantile_bucket

    with pytest.raises(ValueError):
        quantile_bucket(rd.range(10), col="id", k=1)

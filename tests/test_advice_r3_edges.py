"""ADVICE r3 edge-case pins: non-finite guards before int casts, HITS
canonical accumulation order, join_counts zero-edge convention,
target_encode 1-row degenerate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_mad_outliers_drops_nonfinite(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import mad_outliers

    tab = pa.table({
        "event_id": pa.array(np.arange(8), type=pa.int64()),
        "event_type": ["a"] * 8,
        "value": [1.0, 1.1, 0.9, 1.0, 50.0, np.nan, np.inf, -np.inf],
    })
    out = mad_outliers(rd.from_arrow(tab)).to_pandas()
    # the NaN/inf rows are excluded (the oracle's NULL rows), never cast
    # to garbage int64 that would poison the group median
    assert sorted(out["event_id"]) == [0, 1, 2, 3, 4]
    assert bool(out.loc[out["event_id"] == 4, "is_out"].iloc[0])
    assert not out.loc[out["event_id"] != 4, "is_out"].any()


def test_ks_and_mannwhitney_exclude_nonfinite(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import ks_two_sample, mannwhitney_u

    tab = pa.table({
        "event_type": ["a", "a", "a", "b", "b", "b"],
        "value": [1.0, 2.0, np.nan, 3.0, 4.0, np.inf],
    })
    clean = pa.table({
        "event_type": ["a", "a", "b", "b"],
        "value": [1.0, 2.0, 3.0, 4.0],
    })
    got = ks_two_sample(rd.from_arrow(tab), "event_type", "value",
                        a="a", b="b")
    want = ks_two_sample(rd.from_arrow(clean), "event_type", "value",
                         a="a", b="b")
    pd.testing.assert_frame_equal(got, want)
    got = mannwhitney_u(rd.from_arrow(tab), "event_type", "value",
                        a="a", b="b")
    want = mannwhitney_u(rd.from_arrow(clean), "event_type", "value",
                         a="a", b="b")
    pd.testing.assert_frame_equal(got, want)


def test_cusum_excludes_nonfinite(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import cusum_changepoints

    def tab(vals, ids):
        return pa.table({
            "user_id": pa.array([1] * len(vals), type=pa.int64()),
            "ts": pa.array(list(range(len(vals))), type=pa.int64()),
            "event_id": pa.array(ids, type=pa.int64()),
            "value": vals,
        })

    got = cusum_changepoints(
        rd.from_arrow(tab([1.0, np.nan, 1.0, 5.0, 5.0], [0, 1, 2, 3, 4]))
    ).to_pandas()
    want = cusum_changepoints(
        rd.from_arrow(tab([1.0, 1.0, 5.0, 5.0], [0, 2, 3, 4]))).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


def test_hits_deterministic_across_block_orders(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.linkgraph import hits

    edges = pd.DataFrame({
        "src_domain": ["a", "b", "c", "a", "d", "b"],
        "dst_domain": ["b", "c", "a", "c", "a", "a"],
        "n": np.array([3, 1, 2, 1, 5, 2], dtype=np.int64),
    })
    ds1 = rd.from_pandas(edges).repartition(1)
    ds2 = rd.from_pandas(edges.iloc[::-1].reset_index(drop=True)).repartition(3)
    h1 = hits(None, edges=ds1).sort_values("domain").reset_index(drop=True)
    h2 = hits(None, edges=ds2).sort_values("domain").reset_index(drop=True)
    # bit-identical, not just close: the driver path sums in canonical
    # (dst, src) order regardless of block arrival order
    pd.testing.assert_frame_equal(h1, h2)


def test_join_counts_zero_edges_nan(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.autocorr import join_counts

    # two occupied cells far apart -> zero adjacent pairs
    tab = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "lang": ["en", "de"],
        "lat": [-80.0, 80.0],
        "lng": [-170.0, 170.0],
    })

    out = join_counts(rd.from_arrow(tab), res=6)
    assert int(out["n_edges"].iloc[0]) == 0
    assert np.isnan(out["bw_ratio"].iloc[0])
    assert int(out["bb"].iloc[0]) == 0


def test_target_encode_single_row_null(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.encode import target_encode

    tab = pa.table({
        "l_orderkey": pa.array([1], type=pa.int64()),
        "l_partkey": pa.array([7], type=pa.int64()),
        "l_quantity": [5.0],
    })
    out = target_encode(rd.from_arrow(tab), key="l_partkey",
                        target="l_quantity").to_pandas()
    assert len(out) == 1
    assert out["loo_mean"].isna().all()

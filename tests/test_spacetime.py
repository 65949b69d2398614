import numpy as np
import pytest
import pandas as pd

from fast_carpenter_ray.stages.spacetime import (
    DAY_US, outlier_cells, spacetime_cube)


def test_spacetime_cube_buckets(ray_session):
    import ray.data as rd

    ts = np.array([0, DAY_US - 1, DAY_US, 2 * DAY_US + 5], dtype=np.int64)
    df = pd.DataFrame({
        "cell": np.array([7, 7, 7, 9], dtype=np.int64),
        "warc_ts": pd.to_datetime(ts, unit="us"),
        "w": np.array([0.5, 0.25, 1.0, 2.0]),
    })
    out = (spacetime_cube(rd.from_pandas(df), weight="w")
           .to_pandas().sort_values(["cell", "bucket"])
           .reset_index(drop=True))
    # day 0 holds the first two rows; day 1 the third; cell 9 on day 2
    assert out[["cell", "bucket"]].to_numpy().tolist() == [
        [7, 0], [7, 1], [9, 2]]
    assert out["n"].tolist() == [2, 1, 1]
    np.testing.assert_array_equal(out["sum_w"].to_numpy(), [0.75, 1.0, 2.0])


def test_spacetime_cube_drops_missing_geo(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "cell": np.array([-1, 3], dtype=np.int64),
        "warc_ts": pd.to_datetime([0, 0], unit="us"),
    })
    out = spacetime_cube(rd.from_pandas(df)).to_pandas()
    assert out["cell"].tolist() == [3]


def test_outlier_cells_exact_median(ray_session):
    import ray.data as rd

    # counts per cell: 1,1,1,2,6 -> sorted [1,1,1,2,6], ceil(0.5*5)=3rd -> 1
    cells = [0] * 1 + [1] * 1 + [2] * 1 + [3] * 2 + [4] * 6 + [-1] * 3
    ds = rd.from_pandas(pd.DataFrame({
        "cell": np.array(cells, dtype=np.int64)}))
    out = outlier_cells(ds, factor=2)
    # threshold 2*1=2 -> cells 3 (n=2) and 4 (n=6)
    assert out["cell"].tolist() == [3, 4]
    assert out["n"].tolist() == [2, 6]
    # even cell-count: counts [1,2] -> ceil(0.5*2)=1st -> median 1
    ds2 = rd.from_pandas(pd.DataFrame({
        "cell": np.array([0, 1, 1], dtype=np.int64)}))
    out2 = outlier_cells(ds2, factor=2)
    assert out2["cell"].tolist() == [1]


def test_time_autocorr_matches_numpy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.spacetime import time_autocorr

    rng = np.random.RandomState(29)
    ts = rng.randint(0, 40 * 1000, 5000).astype(np.int64)
    got = time_autocorr(
        rd.from_arrow(pa.table({"ts": pa.array(ts, type=pa.int64())})),
        bucket_us=1000, lag=1).iloc[0]
    tb = ts // 1000
    lo, hi = tb.min(), tb.max()
    c = np.zeros(hi - lo + 1, dtype=np.int64)
    for v in tb:
        c[v - lo] += 1
    x, y = c[:-1], c[1:]
    assert int(got["n_pairs"]) == len(x)
    assert int(got["sxy"]) == int((x * y).sum())
    want = np.corrcoef(x, y)[0, 1]
    assert got["corr"] == pytest.approx(want, rel=1e-12)


def test_time_autocorr_counts_empty_buckets_as_zero(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.spacetime import time_autocorr

    # events in buckets 0 and 5 only: the densified series has zeros
    ts = np.array([10, 20, 5_500], dtype=np.int64)
    got = time_autocorr(
        rd.from_arrow(pa.table({"ts": pa.array(ts)})),
        bucket_us=1000, lag=1).iloc[0]
    assert int(got["n_pairs"]) == 5          # buckets 0..5 -> 5 lag pairs
    assert int(got["sx"]) == 2 + 0 + 0 + 0 + 0
    assert int(got["sy"]) == 0 + 0 + 0 + 0 + 1


def test_time_autocorr_degenerate(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.spacetime import time_autocorr

    one = rd.from_arrow(pa.table({"ts": pa.array([5], type=pa.int64())}))
    got = time_autocorr(one, bucket_us=1000, lag=1).iloc[0]
    assert int(got["n_pairs"]) == 0 and np.isnan(got["corr"])
    with pytest.raises(ValueError):
        time_autocorr(one, lag=0)

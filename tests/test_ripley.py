import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.ripley import ripley_k


def _pts(lat, lng):
    import ray.data as rd

    n = len(lat)
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "lat": pa.array(np.asarray(lat, dtype=np.float64)),
        "lng": pa.array(np.asarray(lng, dtype=np.float64)),
    })).repartition(2)


def test_ripley_planted_cluster(ray_session):
    # three points within 1 degree of each other + one isolated
    lat = [10.0, 10.3, 10.6, -40.0]
    lng = [20.0, 20.4, 20.0, 100.0]
    out = ripley_k(_pts(lat, lng), radii=[1.0, 2.0], res=6)
    assert out["n_pairs"].tolist() == [3, 3]
    n = 4
    want = 360.0 * 180.0 * (2 * 3) / (n * (n - 1))
    assert out["k_hat"].iloc[0] == pytest.approx(want)


def test_ripley_antimeridian_wrap(ray_session):
    # points straddling +-180: wrap distance 0.4 deg, naive 359.6
    out = ripley_k(_pts([0.0, 0.0], [179.8, -179.8]),
                    radii=[1.0], res=6)
    assert out["n_pairs"].iloc[0] == 1


def test_ripley_matches_brute(ray_session):
    rng = np.random.default_rng(23)
    n = 150
    lat = rng.uniform(-80, 80, n)
    lng = rng.uniform(-179, 179, n)
    out = ripley_k(_pts(lat, lng), radii=[0.5, 1.5, 2.5], res=6)
    for row_i, r in enumerate([0.5, 1.5, 2.5]):
        cnt = 0
        for i in range(n):
            for j in range(i + 1, n):
                dlat = lat[i] - lat[j]
                dl = abs(lng[i] - lng[j])
                dlng = min(dl, 360.0 - dl)
                if dlat * dlat + dlng * dlng <= r * r:
                    cnt += 1
        assert out["n_pairs"].iloc[row_i] == cnt


def test_ripley_radius_guard(ray_session):
    with pytest.raises(ValueError):
        ripley_k(_pts([0.0], [0.0]), radii=[10.0], res=6)

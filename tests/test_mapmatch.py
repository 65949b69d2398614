import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.mapmatch import SnapToSegments, boundary_segments


def _pts(lat, lng):
    return pa.table({
        "doc_id": pa.array(np.arange(len(lat)), type=pa.int64()),
        "lat": pa.array(np.asarray(lat, dtype=np.float64)),
        "lng": pa.array(np.asarray(lng, dtype=np.float64)),
    })


def test_snap_interior_projection():
    # one horizontal segment y in [0, 10] at x = 0
    segs = np.array([[7.0, 0.0, 0.0, 0.0, 10.0]])
    out = SnapToSegments(segs)(_pts([1.0, -2.0], [4.0, 11.0]))
    assert out["seg_id"].to_pylist() == [7, 7]
    # first point projects to (0, 4): t = 0.4, dist = 1
    assert out["seg_t"].to_pylist()[0] == pytest.approx(0.4)
    assert out["seg_dist"].to_pylist()[0] == pytest.approx(1.0)
    # second clamps to endpoint (0, 10): dist = sqrt(4 + 1)
    assert out["seg_t"].to_pylist()[1] == 1.0
    assert out["seg_dist"].to_pylist()[1] == pytest.approx(np.sqrt(5.0))


def test_snap_nearest_of_many_with_tiebreak():
    # two parallel segments equidistant from the origin -> smaller seg_id
    segs = np.array([
        [3.0, -1.0, -5.0, -1.0, 5.0],
        [1.0, 1.0, -5.0, 1.0, 5.0],
    ])
    out = SnapToSegments(segs)(_pts([0.0], [0.0]))
    assert out["seg_id"].to_pylist() == [1]
    assert out["seg_dist"].to_pylist()[0] == pytest.approx(1.0)


def test_snap_brute_force_agreement():
    rng = np.random.default_rng(5)
    segs = boundary_segments([(i, *np.sort(rng.uniform(-50, 50, 2)),
                               *np.sort(rng.uniform(-100, 100, 2)))
                              for i in range(5)])
    pts = rng.uniform(-60, 60, (200, 2))
    out = SnapToSegments(segs)(_pts(pts[:, 0], pts[:, 1]))

    def seg_dist2(p, s):
        _, ax, ay, bx, by = s
        dx, dy = bx - ax, by - ay
        t = np.clip(((p[0] - ax) * dx + (p[1] - ay) * dy)
                    / (dx * dx + dy * dy), 0, 1)
        return (p[0] - (ax + t * dx)) ** 2 + (p[1] - (ay + t * dy)) ** 2

    for i, p in enumerate(pts):
        d2 = [seg_dist2(p, s) for s in segs]
        j = int(np.argmin(d2))
        assert out["seg_id"][i].as_py() == int(segs[j][0])
        assert out["seg_dist"][i].as_py() == pytest.approx(np.sqrt(d2[j]))


def test_boundary_segments_shape():
    segs = boundary_segments([(0, -1.0, 1.0, -2.0, 2.0)])
    assert segs.shape == (4, 5)
    assert segs[:, 0].tolist() == [0, 1, 2, 3]
    # edges chain around the rectangle and close
    for e in range(4):
        nxt = segs[(e + 1) % 4]
        assert segs[e][3] == nxt[1] and segs[e][4] == nxt[2]


def test_zero_length_segment_raises():
    with pytest.raises(ValueError):
        SnapToSegments(np.array([[0.0, 1.0, 1.0, 1.0, 1.0]]))

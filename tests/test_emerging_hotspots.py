"""Emerging space-time hotspot taxonomy (stages/hotspot.py)."""

import numpy as np
import pyarrow as pa

from fast_carpenter_ray.geo.cells import cell_id, k_ring
from fast_carpenter_ray.stages.hotspot import emerging_hotspots

US = 1_000_000
BUCKET_US = 3600 * US  # 1h test buckets


def _points(rows):
    """rows: (lat, lng, ts_us)"""
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "lat": pa.array([r[0] for r in rows], type=pa.float64()),
        "lng": pa.array([r[1] for r in rows], type=pa.float64()),
        "warc_ts": pa.array([r[2] for r in rows],
                            type=pa.timestamp("us")),
    }))


def _brute(rows, res, z_hot=1.96):
    counts = {}
    for lat, lng, ts in rows:
        c = int(cell_id(np.array([lat]), np.array([lng]), res)[0])
        if c < 0:
            continue
        b = ts // BUCKET_US
        counts[(b, c)] = counts.get((b, c), 0) + 1
    buckets = sorted({b for b, _ in counts})
    max_b = max(buckets)
    hot = {}
    for b in buckets:
        cs = {c: n for (bb, c), n in counts.items() if bb == b}
        nc, sx = len(cs), sum(cs.values())
        q = sum(n * n for n in cs.values())
        a = nc * q - sx * sx
        if nc < 2 or a <= 0:
            continue
        for c in cs:
            ring_cells = [r for r in k_ring(c, res, 1) if r in cs]
            nb = sum(cs[r] for r in ring_cells)
            wi = len(ring_cells)
            num = nc * nb - sx * wi
            z = float(num) / (np.sqrt(float(a))
                              * np.sqrt(float(nc * wi - wi * wi)
                                        / float(nc - 1)))
            if z >= z_hot:
                hot[(b, c)] = 1
    out = {}
    all_cells = {c for _, c in counts}
    B = len(buckets)
    for c in all_cells:
        k = sum(hot.get((b, c), 0) for b in buckets)
        last = hot.get((max_b, c), 0)
        if k == B:
            cat = 2
        elif last and k == 1 and B > 1:
            cat = 1
        elif last and k > 1:
            cat = 3
        elif k >= 1:
            cat = 4
        else:
            cat = 0
        out[c] = (k, last, cat)
    return out


def _as_dict(df):
    return {int(r.cell): (int(r.n_hot), int(r.last_hot), int(r.category))
            for r in df.itertuples()}


def _grid(res, iy, ix):
    n = 1 << res
    return (-90.0 + (iy + 0.5) * 180.0 / n,
            -180.0 + (ix + 0.5) * 360.0 / n)


def test_new_and_former_categories(ray_session):
    res = 4
    # bucket 0: dense blob at A + scattered singles; bucket 1 (final):
    # dense blob at B + the same scatter, nothing at A
    scatter = [(2, 2), (2, 12), (12, 2), (12, 12), (7, 1), (1, 7),
               (14, 7), (7, 14)]
    rows = []
    for b, blob in ((0, (5, 5)), (1, (10, 10))):
        ts = b * BUCKET_US + 10
        rows += [(*_grid(res, *blob), ts)] * 12
        rows += [(*_grid(res, iy, ix), ts) for iy, ix in scatter]
    got = _as_dict(emerging_hotspots(
        _points(rows), res=res, bucket_us=BUCKET_US).to_pandas())
    exp = _brute(rows, res)
    assert got == exp
    n = 1 << res
    cell_a, cell_b = 5 * n + 5, 10 * n + 10
    assert got[cell_a][2] == 4   # former: hot only in bucket 0
    assert got[cell_b][2] == 1   # new: hot only in the final bucket
    cats = {v[2] for v in got.values()}
    assert {0, 1, 4} <= cats


def test_persistent_and_intensifying(ray_session):
    res = 4
    scatter = [(2, 2), (2, 12), (12, 2), (12, 12), (7, 1), (1, 7),
               (14, 7), (7, 14), (3, 8), (8, 3)]
    rows = []
    for b in range(3):
        ts = b * BUCKET_US + 10
        # blob A (two cells) hot every bucket; blob B (three cells)
        # appears from bucket 1 on
        rows += [(*_grid(res, 5, 5), ts)] * 12
        rows += [(*_grid(res, 5, 6), ts)] * 6
        if b >= 1:
            for ix in (10, 11, 12):
                rows += [(*_grid(res, 10, ix), ts)] * 8
        rows += [(*_grid(res, iy, ix), ts) for iy, ix in scatter]
    got = _as_dict(emerging_hotspots(
        _points(rows), res=res, bucket_us=BUCKET_US).to_pandas())
    exp = _brute(rows, res)
    assert got == exp
    n = 1 << res
    assert got[5 * n + 5][2] == 2      # persistent
    assert got[10 * n + 11][2] == 3    # intensifying


def test_random_matches_brute(ray_session):
    res = 4
    rng = np.random.default_rng(13)
    rows = [(float(la), float(ln), int(b) * BUCKET_US + 5)
            for la, ln, b in zip(rng.uniform(-60, 60, 400),
                                 rng.uniform(-170, 170, 400),
                                 rng.integers(0, 4, 400))]
    got = _as_dict(emerging_hotspots(
        _points(rows), res=res, bucket_us=BUCKET_US).to_pandas())
    assert got == _brute(rows, res)


def test_single_bucket_is_persistent_or_none(ray_session):
    res = 4
    rows = ([(*_grid(res, 5, 5), 10)] * 12
            + [(*_grid(res, iy, ix), 10) for iy, ix in
               [(2, 2), (2, 12), (12, 2), (12, 12)]])
    got = _as_dict(emerging_hotspots(
        _points(rows), res=res, bucket_us=BUCKET_US).to_pandas())
    assert got == _brute(rows, res)
    assert {v[2] for v in got.values()} <= {0, 2}

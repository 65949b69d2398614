"""Language-frontier cells (stages/frontier.py)."""

import numpy as np
import pyarrow as pa

from fast_carpenter_ray.geo.cells import cell_id, k_ring
from fast_carpenter_ray.stages.frontier import language_frontiers


def _points(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "lat": pa.array([r[0] for r in rows], type=pa.float64()),
        "lng": pa.array([r[1] for r in rows], type=pa.float64()),
        "lang": pa.array([r[2] for r in rows], type=pa.string()),
    }))


def _brute(rows, res):
    counts = {}
    for lat, lng, lg in rows:
        c = int(cell_id(np.array([lat]), np.array([lng]), res)[0])
        if c < 0:
            continue
        counts.setdefault(c, {})
        counts[c][lg] = counts[c].get(lg, 0) + 1

    def argmax(d):
        # max count, ties broken by language ascending
        return min(d, key=lambda k: (-d[k], k))

    out = {}
    for c in counts:
        own = argmax(counts[c])
        nb = {}
        for r in k_ring(c, res, 1):
            for lg, n in counts.get(r, {}).items():
                nb[lg] = nb.get(lg, 0) + n
        nd = argmax(nb)
        out[c] = (own, nd, int(own != nd))
    return out


def _as_dict(df):
    return {int(r.cell): (r.own_lang, r.nbhd_lang, int(r.frontier))
            for r in df.itertuples()}


def _grid(res, iy, ix):
    n = 1 << res
    return (-90.0 + (iy + 0.5) * 180.0 / n,
            -180.0 + (ix + 0.5) * 360.0 / n)


def test_planted_frontier(ray_session):
    res = 4
    rows = []
    # an "en" region around (5,5) and a "fr" region around (5,8) — the
    # touching columns are frontier cells
    for iy in (4, 5, 6):
        for ix in (4, 5, 6):
            rows += [(*_grid(res, iy, ix), "en")] * 2
        for ix in (7, 8, 9):
            rows += [(*_grid(res, iy, ix), "fr")] * 5
    got = _as_dict(language_frontiers(_points(rows), res=res).to_pandas())
    exp = _brute(rows, res)
    assert got == exp
    n = 1 << res
    # the en column touching the fr block: its ring holds 6 en cells x2
    # = 12 vs 3 fr cells x5 = 15 -> neighborhood dominant flips to fr
    assert got[5 * n + 6][2] == 1
    assert got[5 * n + 5][2] == 0       # interior en cell: no frontier
    assert any(v[2] == 1 for v in got.values())


def test_tie_breaks_lang_ascending(ray_session):
    res = 4
    # equal counts in one cell -> dominant = lexicographically smallest
    rows = [(*_grid(res, 3, 3), "fr"), (*_grid(res, 3, 3), "de")]
    got = _as_dict(language_frontiers(_points(rows), res=res).to_pandas())
    exp = _brute(rows, res)
    assert got == exp
    n = 1 << res
    assert got[3 * n + 3][0] == "de"


def test_random_matches_brute(ray_session):
    res = 4
    rng = np.random.default_rng(5)
    langs = np.array(["en", "fr", "de", "es"], dtype=object)
    rows = [(float(la), float(ln), str(lg))
            for la, ln, lg in zip(rng.uniform(-60, 60, 300),
                                  rng.uniform(-170, 170, 300),
                                  rng.choice(langs, 300))]
    got = _as_dict(language_frontiers(_points(rows), res=res).to_pandas())
    assert got == _brute(rows, res)

"""Moran's I spatial autocorrelation (stages/autocorr.py)."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.geo.cells import cell_id, k_ring
from fast_carpenter_ray.stages.autocorr import spatial_autocorr


def _points(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "lat": pa.array([r[0] for r in rows], type=pa.float64()),
        "lng": pa.array([r[1] for r in rows], type=pa.float64()),
    }))


def _brute(rows, res):
    """Reference: per-cell counts, queen-ring gather, textbook Moran's I."""
    counts = {}
    for lat, lng in rows:
        c = int(cell_id(np.array([lat]), np.array([lng]), res)[0])
        if c >= 0:
            counts[c] = counts.get(c, 0) + 1
    cells = sorted(counts)
    n_cells = len(cells)
    sum_x = sum(counts.values())
    sum_x2 = sum(v * v for v in counts.values())
    w_edges = cross_sum = edge_sum = 0
    for c in cells:
        ring = [r for r in k_ring(c, res, 1) if r != c and r in counts]
        w_edges += len(ring)
        edge_sum += counts[c] * len(ring)
        cross_sum += counts[c] * sum(counts[r] for r in ring)
    num = (n_cells * n_cells * cross_sum - 2 * n_cells * sum_x * edge_sum
           + sum_x * sum_x * w_edges)
    den = w_edges * (n_cells * sum_x2 - sum_x * sum_x)
    morans = float(num) / float(den) if den else np.nan
    # sanity: the integer form equals the textbook mean-centered form
    if den:
        xbar = sum_x / n_cells
        sw = sum((counts[c] - xbar) * (counts[r] - xbar)
                 for c in cells
                 for r in k_ring(c, res, 1) if r != c and r in counts)
        sv = sum((v - xbar) ** 2 for v in counts.values())
        assert morans == pytest.approx((n_cells / w_edges) * sw / sv, rel=1e-9)
    return dict(n_cells=n_cells, sum_x=sum_x, sum_x2=sum_x2,
                w_edges=w_edges, cross_sum=cross_sum, edge_sum=edge_sum,
                morans_i=morans)


def _rand_rows(n, seed):
    rng = np.random.RandomState(seed)
    return [(float(lat), float(lng))
            for lat, lng in zip(rng.uniform(-89, 89, n),
                                rng.uniform(-180, 180, n))]


@pytest.mark.parametrize("res,n,seed", [(3, 400, 1), (4, 1000, 2)])
def test_matches_bruteforce(ray_session, res, n, seed):
    rows = _rand_rows(n, seed)
    got = spatial_autocorr(_points(rows), res=res).iloc[0]
    want = _brute(rows, res)
    for k, v in want.items():
        if k == "morans_i":
            assert got[k] == pytest.approx(v, rel=1e-12)
        else:
            assert int(got[k]) == v, k


def test_tree_equals_hash(ray_session):
    rows = _rand_rows(600, 3)
    ds = _points(rows)
    tree = spatial_autocorr(ds, res=3, mode="tree").iloc[0]
    hsh = spatial_autocorr(_points(rows), res=3, mode="hash",
                           num_partitions=2).iloc[0]
    for k in ("n_cells", "sum_x", "sum_x2", "w_edges", "cross_sum",
              "edge_sum"):
        assert int(tree[k]) == int(hsh[k]), k
    assert tree["morans_i"] == hsh["morans_i"]


def test_clustered_positive_dispersed_negative(ray_session):
    # points piled into one tight hotspot plus a dispersed background:
    # the statistic must be finite and the count conservation exact
    rows = [(10.0, 20.0)] * 50 + [(10.0, 20.01)] * 45 + \
        [(float(lat), float(lng)) for lat, lng in
         zip(np.linspace(-80, 80, 30), np.linspace(-170, 170, 30))]
    got = spatial_autocorr(_points(rows), res=4).iloc[0]
    assert np.isfinite(got["morans_i"])
    assert int(got["sum_x"]) == len(rows)


def test_degenerate_no_edges(ray_session):
    # two occupied cells far apart: W = 0 -> NaN statistic, stats intact
    rows = [(0.5, 0.5), (60.0, 120.0)]
    got = spatial_autocorr(_points(rows), res=4).iloc[0]
    assert int(got["w_edges"]) == 0
    assert np.isnan(got["morans_i"])


def _lisa_brute(rows, res):
    """Reference LISA from the brute sufficient stats."""
    from fast_carpenter_ray.geo.cells import k_ring
    counts = {}
    for lat, lng in rows:
        c = int(cell_id(np.array([lat]), np.array([lng]), res)[0])
        if c >= 0:
            counts[c] = counts.get(c, 0) + 1
    n_cells = len(counts)
    sx = sum(counts.values())
    q = sum(v * v for v in counts.values())
    denom = n_cells * q - sx * sx
    out = {}
    for c, n in counts.items():
        ring = [r for r in k_ring(c, res, 1) if r != c and r in counts]
        u = n_cells * n - sx
        nbr_u = n_cells * sum(counts[r] for r in ring) - sx * len(ring)
        out[c] = (n, u, nbr_u, float(u) * float(nbr_u) / float(denom))
    return out


def test_local_autocorr_matches_bruteforce(ray_session):
    from fast_carpenter_ray.stages.autocorr import local_autocorr
    rows = _rand_rows(800, 21)
    got = local_autocorr(_points(rows), res=3)
    want = _lisa_brute(rows, 3)
    assert len(got) == len(want)
    for r in got.itertuples():
        n, u, nbr_u, lisa = want[int(r.cell)]
        assert (int(r.n), int(r.u), int(r.nbr_u)) == (n, u, nbr_u)
        assert r.lisa == lisa


def test_local_autocorr_tree_equals_hash(ray_session):
    from fast_carpenter_ray.stages.autocorr import local_autocorr
    rows = _rand_rows(500, 22)
    tree = local_autocorr(_points(rows), res=3, mode="tree") \
        .sort_values("cell").reset_index(drop=True)
    hsh = local_autocorr(_points(rows), res=3, mode="hash",
                         num_partitions=2).to_pandas() \
        .sort_values("cell").reset_index(drop=True)
    for c in ("cell", "n", "u", "nbr_u"):
        assert tree[c].astype("int64").tolist() == \
            hsh[c].astype("int64").tolist(), c
    assert tree["lisa"].tolist() == hsh["lisa"].tolist()


def test_local_autocorr_hotspot_positive(ray_session):
    from fast_carpenter_ray.stages.autocorr import local_autocorr
    # dense 2x2 block of heavy cells + sparse singles far away: the
    # heavy cells' LISA must be positive (like-with-like cluster)
    rows = ([(10.0, 10.0)] * 30 + [(10.0, 60.0)] * 30
            + [(35.0, 10.0)] * 30 + [(35.0, 60.0)] * 30
            + [(-60.0, -120.0), (-60.0, -90.0), (60.0, 120.0)])
    out = local_autocorr(_points(rows), res=3)
    heavy = out[out["n"] == 30]
    assert len(heavy) >= 1
    assert (heavy["lisa"] > 0).all()


def _gi_brute(rows, res):
    from fast_carpenter_ray.geo.cells import k_ring
    counts = {}
    for lat, lng in rows:
        c = int(cell_id(np.array([lat]), np.array([lng]), res)[0])
        if c >= 0:
            counts[c] = counts.get(c, 0) + 1
    n_cells = len(counts)
    sx = sum(counts.values())
    q = sum(v * v for v in counts.values())
    a = n_cells * q - sx * sx
    out = {}
    for c, n in counts.items():
        ring = [r for r in k_ring(c, res, 1) if r in counts]  # incl self
        nb = sum(counts[r] for r in ring)
        w = len(ring)
        num = n_cells * nb - sx * w
        b = n_cells * w - w * w
        gi = float(num) / (np.sqrt(float(a))
                           * np.sqrt(float(b) / float(n_cells - 1)))
        out[c] = (n, nb, w, gi)
    return out


def test_gi_star_matches_bruteforce(ray_session):
    from fast_carpenter_ray.stages.hotspot import gi_star

    rows = _rand_rows(700, 33)
    got = gi_star(_points(rows), res=3).to_pandas()
    want = _gi_brute(rows, 3)
    assert len(got) == len(want)
    for r in got.itertuples():
        n, nb, w, gi = want[int(r.cell)]
        assert (int(r.n), int(r.nbhd_n), int(r.w_i)) == (n, nb, w)
        assert r.gi_star == gi


def test_gi_star_hot_cell_positive(ray_session):
    from fast_carpenter_ray.stages.hotspot import gi_star

    rows = [(10.0, 10.0)] * 80 + [(10.0, 60.0)] * 70 + \
        [(float(lat), float(lng)) for lat, lng in
         zip(np.linspace(-80, 80, 25), np.linspace(-170, 170, 25))]
    out = gi_star(_points(rows), res=3).to_pandas()
    hot = out[out["n"] >= 70]
    assert (hot["gi_star"] > 0).all()
    cold = out[out["n"] == 1]
    assert (cold["gi_star"] < 0.5).all()


def test_join_counts_planted(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.autocorr import join_counts

    # res 2 -> 4x4 grid (90-deg lng columns). Two horizontally adjacent
    # occupied cells: one all-'en' (black), one all-'de' (white)
    # -> 1 edge, BW=1
    t = pa.table({
        "lat": pa.array([10.0, 10.0, 10.0], type=pa.float64()),
        "lng": pa.array([10.0, 10.0, 100.0], type=pa.float64()),
        "lang": pa.array(["en", "en", "de"]),
    })
    out = join_counts(rd.from_arrow(t).repartition(2), res=2)
    assert out["n_cells"].iloc[0] == 2 and out["n_black"].iloc[0] == 1
    assert out["n_edges"].iloc[0] == 1
    assert out["bb"].iloc[0] == 0 and out["ww"].iloc[0] == 0
    assert out["bw"].iloc[0] == 1 and out["bw_ratio"].iloc[0] == 1.0


def test_join_counts_matches_brute(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.geo.cells import cell_id, k_ring
    from fast_carpenter_ray.stages.autocorr import join_counts

    rng = np.random.default_rng(41)
    n = 400
    lat = rng.uniform(-80, 80, n)
    lng = rng.uniform(-170, 170, n)
    lang = rng.choice(["en", "de", "fr"], n)
    t = pa.table({"lat": pa.array(lat), "lng": pa.array(lng),
                  "lang": pa.array(lang)})
    res = 3
    out = join_counts(rd.from_arrow(t).repartition(3), res=res)
    cells = cell_id(lat, lng, res)
    import collections

    nt = collections.Counter(cells.tolist())
    ne = collections.Counter(cells[lang == "en"].tolist())
    label = {c: int(2 * ne.get(c, 0) > nt[c]) for c in nt}
    seen, bb, bw, ww = set(), 0, 0, 0
    for c in label:
        for nb in k_ring(c, res, 1):
            nb = int(nb)
            if nb == c or nb not in label:
                continue
            key = (min(c, nb), max(c, nb))
            if key in seen:
                continue
            seen.add(key)
            if label[c] and label[nb]:
                bb += 1
            elif not label[c] and not label[nb]:
                ww += 1
            else:
                bw += 1
    assert out["bb"].iloc[0] == bb and out["bw"].iloc[0] == bw
    assert out["ww"].iloc[0] == ww
    assert out["n_edges"].iloc[0] == bb + bw + ww

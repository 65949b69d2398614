import numpy as np
import pytest
import pyarrow as pa
import pyarrow.parquet as pq

from fast_carpenter_ray.fixtures import (
    extra_polygons, geo_columns, rect_polygons, sites_table, synth_pages_batch)
from fast_carpenter_ray.geo import cell_id, haversine_m, points_in_polygon
from fast_carpenter_ray.stages.cell_encode import CellEncode
from fast_carpenter_ray.stages.knn_join import KNNJoiner, brute_force_knn
from fast_carpenter_ray.stages.pip_join import PIPJoiner
from fast_carpenter_ray.stages.zonal import ZonalAggregate


def geo_batch(sf_dir, n=200):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").slice(0, n)
    ids = docs["doc_id"].to_numpy()
    g = geo_columns(ids)
    return pa.table({
        "doc_id": ids,
        "lat": g["lat"],
        "lng": g["lng"],
        "weight": g["weight"],
    })


def test_cell_encode(sf_dir):
    batch = geo_batch(sf_dir)
    out = CellEncode(res=6, parent_res=3)(batch)
    cells = out["cell"].to_numpy(zero_copy_only=False)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    assert (cells[np.isnan(lat)] == -1).all()
    expect = cell_id(lat, batch["lng"].to_numpy(zero_copy_only=False), 6)
    np.testing.assert_array_equal(cells, expect)
    assert "cell_r3" in out.column_names


def test_pip_join_modes(sf_dir):
    batch = geo_batch(sf_dir)
    polys = rect_polygons() + extra_polygons()
    inner = PIPJoiner(polys, mode="inner")(batch)
    semi = PIPJoiner(polys, mode="semi")(batch)
    anti = PIPJoiner(polys, mode="anti")(batch)
    left = PIPJoiner(polys, mode="left")(batch)
    assert len(semi) + len(anti) == len(batch)
    assert len(left) >= len(batch)
    # oracle: brute-force PIP over every polygon
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    ids = batch["doc_id"].to_numpy()
    expected = set()
    ok = ~np.isnan(lat)
    for p in polys:
        rlat, rlng = p.edge_arrays()
        hit = np.zeros(len(lat), dtype=bool)
        hit[ok] = points_in_polygon(lat[ok], lng[ok], rlat, rlng)
        expected |= {(int(ids[i]), p.poly_id) for i in np.nonzero(hit)[0]}
    got = set(zip(inner["doc_id"].to_pylist(), inner["poly_id"].to_pylist()))
    assert got == expected


def test_knn_ring_equals_bruteforce(sf_dir):
    batch = geo_batch(sf_dir, n=300)
    sites = sites_table()
    # brute_force_sites=0 forces the k-ring expansion path
    joiner = KNNJoiner(sites, k=3, res=6, max_ring=3, brute_force_sites=0)
    out = joiner(batch)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    ok = ~np.isnan(lat)
    ids, dists = brute_force_knn(
        lat[ok], lng[ok],
        sites["lat"].to_numpy(), sites["lng"].to_numpy(),
        sites["site_id"].to_numpy(), 3)
    got = out["site_id"].to_numpy(zero_copy_only=False).reshape(-1, 3)
    np.testing.assert_array_equal(got, ids)
    np.testing.assert_allclose(
        out["dist_m"].to_numpy(zero_copy_only=False).reshape(-1, 3), dists)


def test_knn_euclid_ring_equals_bruteforce(sf_dir):
    """The oracle-checked metric: ring path == brute force, exactly
    (ids AND squared distances bit-equal), including near the poles and
    the antimeridian."""
    batch = geo_batch(sf_dir, n=300)
    # append adversarial points: poles, antimeridian, exact site location
    sites = sites_table()
    extra = pa.table({
        "doc_id": pa.array([900001, 900002, 900003, 900004], type=pa.int64()),
        "lat": pa.array([89.9, -89.9, 10.0, float(sites["lat"][0].as_py())]),
        "lng": pa.array([0.0, 0.0, 179.95, float(sites["lng"][0].as_py())]),
        "weight": pa.array([1.0, 1.0, 1.0, 1.0]),
    })
    batch = pa.concat_tables([batch, extra])
    for max_ring in (2, 6):
        joiner = KNNJoiner(sites, k=3, res=6, max_ring=max_ring,
                           metric="euclid", brute_force_sites=0)
        out = joiner(batch)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(lat)
        ids, dists = brute_force_knn(
            lat[ok], lng[ok],
            sites["lat"].to_numpy(), sites["lng"].to_numpy(),
            sites["site_id"].to_numpy(), 3, metric="euclid")
        got = out["site_id"].to_numpy(zero_copy_only=False).reshape(-1, 3)
        np.testing.assert_array_equal(got, ids)
        # squared-degree distances must be BIT-equal (same IEEE ops)
        np.testing.assert_array_equal(
            out["d2_deg"].to_numpy(zero_copy_only=False).reshape(-1, 3), dists)


def test_knn_list_mode(sf_dir):
    batch = geo_batch(sf_dir, n=50)
    joiner = KNNJoiner(sites_table(), k=2, explode=False)
    out = joiner(batch)
    assert "neighbors" in out.column_names
    assert len(out) == len(batch)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    nb = out["neighbors"].to_pylist()
    for i, row in enumerate(nb):
        if np.isnan(lat[i]):
            assert row is None
        else:
            assert len(row) == 2 and row[0]["dist_m"] <= row[1]["dist_m"]


def test_zonal_salted_equals_unsalted(ray_session, sf_dir):
    import ray.data as rd

    batch = geo_batch(sf_dir)
    cells = CellEncode(res=4)(batch)
    ds = rd.from_arrow(cells).repartition(5)
    plain = ZonalAggregate("z", keys=["cell"], weights={"w": "weight"})
    salted = ZonalAggregate("z", keys=["cell"], weights={"w": "weight"}, salt_buckets=7)
    a = plain.aggregate(ds).to_pandas()
    b = salted.aggregate(ds).to_pandas()
    b = b[a.columns]
    # dyadic weights => sums are exact in any order
    assert a.equals(b)


def test_zonal_matches_pandas_oracle(ray_session, sf_dir):
    import pandas as pd
    import ray.data as rd

    batch = geo_batch(sf_dir)
    cells = CellEncode(res=4)(batch)
    ds = rd.from_arrow(cells).repartition(3)
    z = ZonalAggregate("z", keys=["cell"], weights={"w": "weight"})
    got = z.aggregate(ds).to_pandas()
    df = cells.to_pandas()
    exp = df.groupby("cell").agg(
        n=("cell", "size"), sumw_w=("weight", "sum")).reset_index()
    exp["sumw2_w"] = df.assign(w2=df.weight ** 2).groupby("cell")["w2"].sum().values
    merged = got.merge(exp, on="cell", suffixes=("", "_exp"))
    assert (merged["n"] == merged["n_exp"]).all()
    np.testing.assert_array_equal(merged["sumw_w"], merged["sumw_w_exp"])


def test_zonal_hash_mode_salted_equals_tree(ray_session, sf_dir):
    """The true-shuffle path (hash mode + salt splitting) must agree with
    the tree combine exactly (dyadic weights => order-free sums)."""
    import ray.data as rd

    batch = geo_batch(sf_dir)
    cells = CellEncode(res=4)(batch)
    ds = rd.from_arrow(cells).repartition(5)
    tree = ZonalAggregate("z", keys=["cell"], weights={"w": "weight"})
    hash_salted = ZonalAggregate("z", keys=["cell"], weights={"w": "weight"},
                                 salt_buckets=5)
    a = tree.aggregate(ds, mode="tree").to_pandas()
    b = hash_salted.aggregate(ds, mode="hash").to_pandas()[a.columns]
    a = a.sort_values("cell").reset_index(drop=True)
    b = b.sort_values("cell").reset_index(drop=True)
    assert a.equals(b)


def _brute_compact(cells, res, min_res):
    """Reference compaction: promote complete quads level by level."""
    out = []
    level = sorted(set(int(c) for c in cells if c >= 0))
    for r in range(res, min_res, -1):
        n, pn = 1 << r, 1 << (r - 1)
        from collections import defaultdict
        groups = defaultdict(list)
        for c in level:
            groups[(c // n // 2) * pn + (c % n) // 2].append(c)
        nxt = []
        for p, ch in groups.items():
            if len(ch) == 4:
                nxt.append(p)
            else:
                out.extend((c, r) for c in ch)
        level = sorted(nxt)
    out.extend((c, min_res) for c in level)
    return sorted(out)


def test_compact_cells_minimal_cover(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fast_carpenter_ray.stages.compact_cells import compact_cells

    res = 6
    n = 1 << res
    # one complete res-4 block (4x4 = 16 cells), one complete res-5 quad,
    # three strays, a missing-geo cell (-1), and duplicates
    full16 = [(8 + dy) * n + (12 + dx) for dy in range(4) for dx in range(4)]
    quad4 = [(40 + dy) * n + (2 + dx) for dy in range(2) for dx in range(2)]
    strays = [0, 5 * n + 5, 63 * n + 63]
    cells = full16 + quad4 + strays + [-1] + full16[:3]
    ds = rd.from_pandas(pd.DataFrame({"cell": np.array(cells, dtype=np.int64)}))
    got = sorted(map(tuple, compact_cells(ds, res=res, min_res=4)
                     .to_pandas()[["cell", "res"]].to_numpy()))
    exp = _brute_compact(cells, res, 4)
    assert got == exp
    # the distributed quad-groupby path must agree with the broadcast path
    got_shuffle = sorted(map(tuple, compact_cells(ds, res=res, min_res=4,
                                                  mode="shuffle")
                             .to_pandas()[["cell", "res"]].to_numpy()))
    assert got_shuffle == exp
    # the complete 16-block compacted to ONE res-4 cell, the quad to one
    # res-5 cell, strays untouched
    by_res = {}
    for c, r in got:
        by_res.setdefault(r, []).append(c)
    assert len(by_res[4]) == 1 and len(by_res[5]) == 1
    assert sorted(by_res[6]) == sorted(strays)


def test_compact_cells_rejects_bad_res(ray_session):
    import pandas as pd
    import pytest as _pt
    import ray.data as rd

    from fast_carpenter_ray.stages.compact_cells import compact_cells

    with _pt.raises(ValueError, match="min_res"):
        compact_cells(rd.from_pandas(pd.DataFrame({"cell": [1]})),
                      res=4, min_res=5)


def test_uncompact_expands_and_roundtrips(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fast_carpenter_ray.stages.compact_cells import (compact_cells,
                                                         uncompact_cells)

    # direct expansion: one res-4 cell -> 16 res-6 children
    inp = rd.from_pandas(pd.DataFrame({
        "cell": np.array([8 * 16 + 3, 5], dtype=np.int64),
        "res": np.array([4, 6], dtype=np.int64)}))
    got = sorted(uncompact_cells(inp, res=6).to_pandas()["cell"])
    # res-4 cell (iy=8, ix=3) expands 2 levels: iy' in [32,36), ix' in [12,16)
    exp = sorted([(32 + dy) * 64 + (12 + dx)
                  for dy in range(4) for dx in range(4)] + [5])
    assert got == exp

    # round trip: compact -> uncompact == distinct occupied set
    res, n = 6, 64
    cells = ([(8 + dy) * n + (12 + dx) for dy in range(4) for dx in range(4)]
             + [0, 7 * n + 9, 63 * n + 1])
    ds = rd.from_pandas(pd.DataFrame({
        "cell": np.array(cells * 2, dtype=np.int64)}))
    rt = sorted(uncompact_cells(compact_cells(ds, res=res, min_res=4),
                                res=res).to_pandas()["cell"])
    assert rt == sorted(set(cells))

    with pytest.raises(Exception, match="res above target"):
        uncompact_cells(rd.from_pandas(pd.DataFrame(
            {"cell": np.array([1], dtype=np.int64),
             "res": np.array([7], dtype=np.int64)})), res=6).to_pandas()


def test_tile_pyramid_matches_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fast_carpenter_ray.stages.compact_cells import tile_pyramid

    rng = np.random.default_rng(41)
    n = 64
    cells = rng.integers(0, n * n, 3000).astype(np.int64)
    cells[::97] = -1  # missing geo dropped
    ds = rd.from_pandas(pd.DataFrame({"cell": cells})).repartition(5)
    got = (tile_pyramid(ds, res=6, min_res=4).to_pandas()
           .sort_values(["res", "cell"]).reset_index(drop=True))
    got_shuffle = (tile_pyramid(ds, res=6, min_res=4, mode="shuffle")
                   .to_pandas().sort_values(["res", "cell"])
                   .reset_index(drop=True))
    assert got.equals(got_shuffle)
    ok = cells[cells >= 0]
    frames = []
    for r, shift in [(6, 0), (5, 1), (4, 2)]:
        c = (ok // n >> shift) * (n >> shift) + ((ok % n) >> shift)
        u, cnt = np.unique(c, return_counts=True)
        frames.append(pd.DataFrame({"cell": u,
                                    "res": np.full(len(u), r, dtype=np.int64),
                                    "n": cnt.astype(np.int64)}))
    exp = (pd.concat(frames).sort_values(["res", "cell"])
           .reset_index(drop=True))
    assert len(got) == len(exp)
    for c in ["cell", "res", "n"]:
        np.testing.assert_array_equal(got[c].to_numpy().astype(np.int64),
                                      exp[c].to_numpy(), err_msg=c)


def _brute_components(cells, res, min_count):
    """Reference clustering: BFS over occupied cells, 8-connected with
    longitude wrap and latitude clamp; label = min cell id in component."""
    import collections

    n = 1 << res
    cells = np.asarray(cells, dtype=np.int64)
    u, cnt = np.unique(cells[cells >= 0], return_counts=True)
    occ = set(int(c) for c, k in zip(u, cnt) if k >= min_count)
    label = {}
    for start in sorted(occ):
        if start in label:
            continue
        comp, q = [], collections.deque([start])
        seen = {start}
        while q:
            c = q.popleft()
            comp.append(c)
            iy, ix = c // n, c % n
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ny, nx = iy + dy, (ix + dx) % n
                    if not (0 <= ny < n):
                        continue
                    nb = ny * n + nx
                    if nb in occ and nb not in seen:
                        seen.add(nb)
                        q.append(nb)
        lab = min(comp)
        for c in comp:
            label[c] = lab
    return sorted(label.items())


def test_cluster_cells_components(ray_session):
    import pandas as pd
    import ray.data as rd

    from fast_carpenter_ray.stages.cluster import cluster_cells

    res, n = 6, 64
    # an L-shaped blob, a diagonally-linked pair, a longitude-wrap pair,
    # a singleton, a below-threshold cell, and missing geo (-1)
    blob = [10 * n + 10, 10 * n + 11, 11 * n + 10]
    diag = [20 * n + 20, 21 * n + 21]
    wrap = [30 * n + 0, 30 * n + 63]        # connect across the antimeridian
    single = [47 * n + 5]
    sparse = [55 * n + 55]                  # occupancy 1 < min_count
    cells = (blob + diag + wrap + single) * 2 + sparse + [-1, -1]
    ds = rd.from_pandas(pd.DataFrame({"cell": np.array(cells,
                                                       dtype=np.int64)}))
    exp = _brute_components(cells, res, min_count=2)

    got = sorted(map(tuple, cluster_cells(ds, res=res, min_count=2)
                     .to_pandas()[["cell", "cluster"]].to_numpy()))
    assert got == exp

    got_sh = sorted(map(tuple,
                        cluster_cells(ds, res=res, min_count=2,
                                      mode="shuffle")
                        .to_pandas()[["cell", "cluster"]].to_numpy()))
    assert got_sh == exp

    # wrap pair is ONE component labelled by the min id; sparse dropped
    d = dict(got)
    assert d[30 * n + 63] == 30 * n + 0
    assert (55 * n + 55) not in d
    # diagonal adjacency merges (8-connectivity)
    assert d[21 * n + 21] == 20 * n + 20


def test_cluster_cells_random_agrees(ray_session):
    import pandas as pd
    import ray.data as rd

    from fast_carpenter_ray.stages.cluster import cluster_cells

    rng = np.random.default_rng(7)
    res = 5
    cells = rng.integers(0, 1 << (2 * res), size=400).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"cell": cells}))
    exp = _brute_components(cells, res, min_count=1)
    got = sorted(map(tuple, cluster_cells(ds, res=res, min_count=1)
                     .to_pandas()[["cell", "cluster"]].to_numpy()))
    assert got == exp


def test_knn_list_mode_schema_and_vectorized_values(sf_dir):
    """Pins the exact list<struct<site_id,dist>> schema of the flagship
    neighbors column and cross-checks the vectorized ListArray assembly
    against a per-row reference construction (round-2 verdict #3)."""
    batch = geo_batch(sf_dir, n=40)
    joiner = KNNJoiner(sites_table(), k=3, explode=False)
    out = joiner(batch)
    typ = out.schema.field("neighbors").type
    assert typ == pa.list_(pa.struct(
        [("site_id", pa.int64()), ("dist_m", pa.float64())]))
    # reference per-row construction from the same dense kNN answer
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lng = batch["lng"].to_numpy(zero_copy_only=False)
    ok = ~np.isnan(lat)
    sites = sites_table()
    ids, dists = brute_force_knn(
        lat[ok], lng[ok], sites["lat"].to_numpy(), sites["lng"].to_numpy(),
        sites["site_id"].to_numpy(), 3)
    want, j = [], 0
    for valid in ok:
        if not valid:
            want.append(None)
            continue
        want.append([{"site_id": int(i), "dist_m": float(d)}
                     for i, d in zip(ids[j], dists[j])])
        j += 1
    assert out["neighbors"].to_pylist() == want

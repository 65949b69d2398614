"""Link-graph operators: regex extraction vs fixture arithmetic,
PageRank vs a local NumPy reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fast_carpenter_ray.fixtures import outlink_sites, synth_pages_batch
from fast_carpenter_ray.stages.linkgraph import (domain_degrees,
                                                 extract_links, pagerank)


def _pages_ds(sf_dir, n=200):
    import ray.data as rd

    docs = pq.read_table(f"{sf_dir}/documents.parquet").slice(0, n)
    return rd.from_arrow(synth_pages_batch(docs)).repartition(5)


def _expected_edges(sf_dir, n=200):
    doc_id = (pq.read_table(f"{sf_dir}/documents.parquet").slice(0, n)
              ["doc_id"].to_numpy())
    rows = []
    for d in doc_id.tolist():
        src = f"site{d % 20}.example"
        for s in outlink_sites(d):
            rows.append((src, f"site{s}.example"))
    return (pd.DataFrame(rows, columns=["src_domain", "dst_domain"])
            .groupby(["src_domain", "dst_domain"]).size().rename("n")
            .reset_index().sort_values(["src_domain", "dst_domain"])
            .reset_index(drop=True))


def test_extract_links_matches_fixture_arithmetic(ray_session, sf_dir):
    got = (extract_links(_pages_ds(sf_dir)).to_pandas()
           .sort_values(["src_domain", "dst_domain"]).reset_index(drop=True))
    exp = _expected_edges(sf_dir)
    assert got["src_domain"].tolist() == exp["src_domain"].tolist()
    assert got["dst_domain"].tolist() == exp["dst_domain"].tolist()
    np.testing.assert_array_equal(got["n"].to_numpy().astype(np.int64),
                                  exp["n"].to_numpy())


def test_domain_degrees(ray_session, sf_dir):
    e = _expected_edges(sf_dir)
    out = (e.groupby("src_domain")
           .agg(out_degree=("n", "size"), out_links=("n", "sum")))
    got = domain_degrees(_pages_ds(sf_dir))
    row = got[got["domain"] == out.index[0]].iloc[0]
    assert row["out_degree"] == out["out_degree"].iloc[0]
    assert row["out_links"] == out["out_links"].iloc[0]
    # conservation: total out-links == total in-links == 3 * pages
    assert got["out_links"].sum() == got["in_links"].sum() == 3 * 200


def test_pagerank_matches_local_power_iteration(ray_session, sf_dir):
    e = _expected_edges(sf_dir)
    doms = np.union1d(e["src_domain"].unique(), e["dst_domain"].unique())
    n = len(doms)
    si = np.searchsorted(doms, e["src_domain"].to_numpy())
    di = np.searchsorted(doms, e["dst_domain"].to_numpy())
    w = e["n"].to_numpy().astype(np.float64)
    ol = np.bincount(si, weights=w, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        contrib = np.bincount(di, weights=r[si] * w / ol[si], minlength=n)
        r = (1.0 - 0.85) / n + 0.85 * contrib
    got = (pagerank(_pages_ds(sf_dir), damping=0.85, iters=3)
           .sort_values("domain").reset_index(drop=True))
    assert got["domain"].tolist() == doms.tolist()
    np.testing.assert_allclose(got["rank"].to_numpy(), r, rtol=0, atol=1e-12)
    # ranks stay a (sub-)distribution
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"url": pa.array([], pa.string()),
                                    "html": pa.array([], pa.binary())}))
    out = pagerank(empty)
    assert out.empty


def _edge_ds(pairs):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "src_domain": pa.array([a for a, _ in pairs], pa.string()),
        "dst_domain": pa.array([b for _, b in pairs], pa.string()),
        "n": pa.array(np.ones(len(pairs), dtype=np.int64)),
    })).repartition(3)


def _brute_triangles(pairs):
    import collections

    und = set((min(a, b), max(a, b)) for a, b in pairs if a != b)
    adj = collections.defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    cnt = collections.Counter()
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:
                cnt[a] += 1
                cnt[b] += 1
                cnt[c] += 1
    return dict(cnt)


def test_count_triangles_planted(ray_session):
    from fast_carpenter_ray.stages.linkgraph import count_triangles

    # K4 on a..d (4 triangles, 3 per vertex) + a pendant + a 4-cycle
    # (no triangle) + duplicate/reversed edges exercising the dedupe
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("p", "q"), ("q", "r"), ("r", "s"),
             ("s", "p"), ("b", "a"), ("a", "b"), ("c", "c")]
    got = count_triangles(edges=_edge_ds(pairs))
    want = _brute_triangles(pairs)
    assert dict(zip(got["domain"], got["n_tri"])) == want
    assert want == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_count_triangles_random_vs_brute(ray_session):
    from fast_carpenter_ray.stages.linkgraph import count_triangles

    rng = np.random.default_rng(11)
    nodes = [f"n{i:02d}" for i in range(30)]
    pairs = [(nodes[int(i)], nodes[int(j)])
             for i, j in rng.integers(0, 30, size=(300, 2)) if i != j]
    got = count_triangles(edges=_edge_ds(pairs))
    assert dict(zip(got["domain"], got["n_tri"])) == _brute_triangles(pairs)


def test_count_triangles_triangle_free(ray_session):
    from fast_carpenter_ray.stages.linkgraph import count_triangles

    got = count_triangles(edges=_edge_ds([("a", "b"), ("b", "c"),
                                          ("c", "d"), ("d", "a")]))
    assert got.empty


def _brute_components(edges_df):
    """Union-find over string domains, labels = min domain per comp."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges_df["src_domain"], edges_df["dst_domain"]):
        for v in (a, b):
            parent.setdefault(v, v)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    comp = {}
    for v in parent:
        comp.setdefault(find(v), []).append(v)
    out = {}
    for members in comp.values():
        lbl = min(members)
        for m in members:
            out[m] = lbl
    return out


def test_link_components_matches_union_find(ray_session, sf_dir):
    from fast_carpenter_ray.stages.linkgraph import link_components

    got = link_components(_pages_ds(sf_dir))
    want = _brute_components(_expected_edges(sf_dir))
    assert dict(zip(got["domain"], got["component"])) == want


def test_link_components_distributed_equals_driver(ray_session, sf_dir):
    """The distributed label-propagation path must produce the same
    (domain, component) map as link_components' driver union-find."""
    import fast_carpenter_ray.stages.linkgraph as lg

    driver = lg.link_components(_pages_ds(sf_dir))
    edges = lg.extract_links(_pages_ds(sf_dir)).to_pandas()
    from fast_carpenter_ray.stages.dedup import (_stable_token_hash,
                                                 distributed_components)
    import ray.data as rd

    def sid(d):
        h = _stable_token_hash(d)
        return h - (1 << 64) if h >= (1 << 63) else h

    nid = {d: sid(d) for d in
           pd.unique(pd.concat([edges["src_domain"],
                                edges["dst_domain"]]))}
    pairs = pd.DataFrame({
        "id_a": edges["src_domain"].map(nid).astype(np.int64),
        "id_b": edges["dst_domain"].map(nid).astype(np.int64),
    }).drop_duplicates()
    comp = distributed_components(rd.from_pandas(pairs)).to_pandas()
    back = {v: k for k, v in nid.items()}
    lbl = comp.assign(domain=comp["doc_id"].map(back))
    canon = lbl.groupby("cluster_id")["domain"].min()
    dist_map = dict(zip(lbl["domain"], lbl["cluster_id"].map(canon)))
    assert dist_map == dict(zip(driver["domain"], driver["component"]))


def test_clustering_coefficients_planted(ray_session):
    from fast_carpenter_ray.stages.linkgraph import clustering_coefficients

    # K4 on a..d + pendant e + triangle-free 4-cycle p-q-r-s
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("p", "q"), ("q", "r"), ("r", "s"),
             ("s", "p")]
    got = clustering_coefficients(edges=_edge_ds(pairs))
    by = got.set_index("domain")
    # K4 interior vertices: 3 triangles over C(3,2)=3 wedges -> 1.0
    for v in "abc":
        assert by.loc[v, "n_tri"] == 3 and by.loc[v, "coeff"] == 1.0
    # d has the pendant: deg 4 -> 6 wedges, still 3 triangles
    assert by.loc["d", "n_wedges"] == 6 and by.loc["d", "coeff"] == 3 / 6
    # pendant: deg 1 -> 0 wedges, coeff defined as 0.0
    assert by.loc["e", "n_wedges"] == 0 and by.loc["e", "coeff"] == 0.0
    # 4-cycle vertices: 1 wedge each, no triangles
    for v in "pqrs":
        assert by.loc[v, "n_tri"] == 0 and by.loc[v, "coeff"] == 0.0
    # every vertex of the graph appears, including zero-triangle ones
    assert set(got["domain"]) == set("abcde") | set("pqrs")


def test_clustering_coefficients_random_vs_brute(ray_session):
    from fast_carpenter_ray.stages.linkgraph import clustering_coefficients

    rng = np.random.default_rng(23)
    nodes = [f"n{i:02d}" for i in range(25)]
    pairs = [(nodes[int(i)], nodes[int(j)])
             for i, j in rng.integers(0, 25, size=(200, 2)) if i != j]
    got = clustering_coefficients(edges=_edge_ds(pairs))
    tri = _brute_triangles(pairs)
    und = set((min(a, b), max(a, b)) for a, b in pairs if a != b)
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for _, row in got.iterrows():
        d = deg[row["domain"]]
        assert row["n_wedges"] == d * (d - 1) // 2
        assert row["n_tri"] == tri.get(row["domain"], 0)
        want = (row["n_tri"] / row["n_wedges"]) if row["n_wedges"] else 0.0
        assert row["coeff"] == want
    assert set(got["domain"]) == set(deg)


def test_hits_star_graph(ray_session):
    from fast_carpenter_ray.stages.linkgraph import hits

    # hub h points at authorities a1, a2, a3; plus one reverse edge
    pairs = [("h", "a1"), ("h", "a2"), ("h", "a3"), ("a1", "h")]
    got = hits(edges=_edge_ds(pairs)).set_index("domain")
    # h is the dominant hub, a1..a3 the authorities
    assert got.loc["h", "hub"] > got.loc["a1", "hub"]
    for a in ("a1", "a2", "a3"):
        assert got.loc[a, "authority"] > got.loc["h", "authority"] or \
            got.loc["h", "authority"] < 0.5
    # L1 normalization
    assert got["hub"].sum() == pytest.approx(1.0)
    assert got["authority"].sum() == pytest.approx(1.0)


def test_hits_distributed_matches_driver(ray_session):
    from fast_carpenter_ray.stages.linkgraph import hits

    rng = np.random.default_rng(17)
    nodes = [f"n{i}" for i in range(15)]
    pairs = [(nodes[int(i)], nodes[int(j)])
             for i, j in rng.integers(0, 15, size=(80, 2)) if i != j]
    fast = hits(edges=_edge_ds(pairs)).set_index("domain")
    slow = hits(edges=_edge_ds(pairs), edge_budget=0).set_index("domain")
    assert set(fast.index) == set(slow.index)
    for d in fast.index:
        assert fast.loc[d, "hub"] == pytest.approx(slow.loc[d, "hub"],
                                                   abs=1e-9)
        assert fast.loc[d, "authority"] == pytest.approx(
            slow.loc[d, "authority"], abs=1e-9)


def test_bib_coupling_planted(ray_session):
    from fast_carpenter_ray.stages.linkgraph import bib_coupling

    # a and b both cite x, y, z (coupling 3); c cites x only (couplings
    # of 1 drop below min_shared=2); duplicate edges collapse
    pairs = [("a", "x"), ("a", "y"), ("a", "z"),
             ("b", "x"), ("b", "y"), ("b", "z"), ("b", "x"),
             ("c", "x")]
    out = bib_coupling(edges=_edge_ds(pairs), min_shared=2)
    assert out.to_dict("records") == [
        {"src_a": "a", "src_b": "b", "shared": 3}]


def test_bib_coupling_matches_brute(ray_session):
    import collections

    from fast_carpenter_ray.stages.linkgraph import bib_coupling

    rng = np.random.default_rng(21)
    nodes = [f"n{i}" for i in range(12)]
    pairs = [(nodes[int(i)], nodes[int(j)])
             for i, j in rng.integers(0, 12, size=(120, 2))]
    out = bib_coupling(edges=_edge_ds(pairs), min_shared=1)
    cited = collections.defaultdict(set)
    for s, d in pairs:
        cited[d].add(s)
    want = collections.Counter()
    for d, srcs in cited.items():
        srcs = sorted(srcs)
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                want[(srcs[i], srcs[j])] += 1
    got = {(r["src_a"], r["src_b"]): r["shared"]
           for r in out.to_dict("records")}
    assert got == dict(want)


def test_reciprocity_planted(ray_session):
    from fast_carpenter_ray.stages.linkgraph import reciprocity

    # a<->b mutual; a->c one-way; c->a means a-c IS mutual; b->d one-way;
    # self-loop dropped
    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
             ("b", "d"), ("d", "d")]
    out = reciprocity(edges=_edge_ds(pairs)).set_index("domain")
    assert out.loc["a", "n_out"] == 2 and out.loc["a", "n_mutual"] == 2
    assert out.loc["a", "ratio"] == 1.0
    assert out.loc["b", "n_out"] == 2 and out.loc["b", "n_mutual"] == 1
    assert out.loc["b", "ratio"] == 0.5
    assert out.loc["c", "n_out"] == 1 and out.loc["c", "ratio"] == 1.0
    # d has no out-edges after the self-loop drop -> absent
    assert "d" not in out.index


def test_reciprocity_matches_brute(ray_session):
    from fast_carpenter_ray.stages.linkgraph import reciprocity

    rng = np.random.default_rng(31)
    nodes = [f"n{i}" for i in range(10)]
    pairs = [(nodes[int(i)], nodes[int(j)])
             for i, j in rng.integers(0, 10, size=(100, 2)) if i != j]
    out = reciprocity(edges=_edge_ds(pairs))
    eset = set(pairs)
    for _, r in out.iterrows():
        outs = {d for s, d in eset if s == r["domain"]}
        mut = {d for d in outs if (d, r["domain"]) in eset}
        assert r["n_out"] == len(outs) and r["n_mutual"] == len(mut)
        assert r["ratio"] == len(mut) / len(outs)
    assert set(out["domain"]) == {s for s, _ in eset}


def test_count_triangles_distributed_matches_driver(ray_session):
    from fast_carpenter_ray.stages.linkgraph import count_triangles

    rng = np.random.default_rng(29)
    nodes = [f"n{i:02d}" for i in range(25)]
    pairs = [(nodes[int(i)], nodes[int(j)])
             for i, j in rng.integers(0, 25, size=(200, 2)) if i != j]
    fast = count_triangles(edges=_edge_ds(pairs))
    slow = count_triangles(edges=_edge_ds(pairs), edge_budget=0)
    assert dict(zip(fast["domain"], fast["n_tri"])) == dict(
        zip(slow["domain"], slow["n_tri"]))
    # degrees agree too
    ft, fd = count_triangles(edges=_edge_ds(pairs), return_degrees=True)
    st, sd = count_triangles(edges=_edge_ds(pairs), return_degrees=True,
                             edge_budget=0)
    assert dict(zip(fd["domain"], fd["deg"])) == dict(
        zip(sd["domain"], sd["deg"]))


def test_link_components_accepts_prebuilt_edges(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.linkgraph import link_components

    edf = pd.DataFrame({
        "src_domain": ["a", "b", "x"],
        "dst_domain": ["b", "c", "y"],
        "n": np.ones(3, dtype=np.int64),
    })
    out = link_components(edges=rd.from_pandas(edf))
    comp = dict(zip(out["domain"], out["component"]))
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"


def test_attack_tolerance_splits_hub_graph(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.linkgraph import link_components

    # star through hub h: removing h separates the leaves
    edf = pd.DataFrame({
        "src_domain": ["h", "h", "h", "l1"],
        "dst_domain": ["l1", "l2", "l3", "l2"],
        "n": np.ones(4, dtype=np.int64),
    })
    keep = edf[(edf.src_domain != "h") & (edf.dst_domain != "h")]
    out = link_components(edges=rd.from_pandas(keep.reset_index(drop=True)))
    comp = dict(zip(out["domain"], out["component"]))
    assert comp == {"l1": "l1", "l2": "l1"}  # l3 isolated -> absent

"""Hyperlink graph operators over crawled pages: edge extraction,
degree statistics, PageRank.

The web-graph leg of a Common-Crawl-style pipeline.  The reference has
no graph notion at all (its stages are per-event masks and summaries —
``fast_carpenter/summary/binned_dataframe.py``); these operators treat
the html payload as the edge source and keep everything Ray-Data-shaped:

* :func:`extract_links` — per-batch compiled-regex href scan of the raw
  ``html`` bytes -> partial ``(src_domain, dst_domain)`` counts fused
  into the map stage, then ONE hash combine.  The page stream (html
  payloads, the heavy part) is touched exactly once and never shuffled —
  only the summary-sized edge partials move.
* :func:`domain_degrees` — out/in degree (distinct neighbor count) and
  link totals per domain, a second summary-sized combine over the edge
  table.
* :func:`pagerank` — damped power iteration.  The EDGE table stays a
  distributed Dataset (materialized once, reused every iteration); the
  RANK vector is the broadcast small side (one float per domain —
  summary-sized for domain-level graphs, the documented partitioning
  assumption).  Each iteration: broadcast ranks -> per-batch vectorized
  ``searchsorted`` contribution partials over edges -> one combine ->
  new rank vector.  No per-iteration shuffle of anything
  proportional to the page count.

Scale notes: href scanning is a per-row loop over a compiled RE2-style
pattern (linear, same budget class as ``text.py`` lang_id); the edge key
space is domains x avg-degree and always hash-combined by default.
"""

from __future__ import annotations

import logging
import re

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["extract_links", "domain_degrees", "pagerank", "count_triangles",
           "link_components", "hits", "clustering_coefficients",
           "bib_coupling", "reciprocity"]

#: absolute http(s) links only; captures the host. Relative links (nav
#: chrome) are deliberately out of scope for the domain graph.
_HREF_RE = re.compile(rb'href="https?://([a-z0-9.-]+)/')
_HOST_RE = re.compile(r"https?://([a-z0-9.-]+)/")


def _edge_partials(batch: pa.Table, html: str, url: str) -> pa.Table:
    """Per-batch (src_domain, dst_domain) partial counts."""
    pages = batch[html].to_pylist()
    urls = batch[url].to_pylist()
    src, dst = [], []
    for u, h in zip(urls, pages):
        m = _HOST_RE.match(u)
        if m is None or h is None:
            continue
        s = m.group(1)
        for d in _HREF_RE.findall(h):
            src.append(s)
            dst.append(d.decode("ascii"))
    out = (pd.DataFrame({"src_domain": src, "dst_domain": dst})
           .groupby(["src_domain", "dst_domain"], sort=False)
           .size().reset_index(name="n"))
    out["n"] = out["n"].astype(np.int64)
    # explicit schema: empty object columns would otherwise become
    # Arrow null type and break cross-batch schema unification
    return pa.Table.from_pandas(out, preserve_index=False, schema=pa.schema(
        [("src_domain", pa.string()), ("dst_domain", pa.string()),
         ("n", pa.int64())]))


def extract_links(ds, html: str = "html", url: str = "url",
                  mode: str = "hash"):
    """Domain-level edge table ``(src_domain, dst_domain, n)``; see
    module docstring."""
    from ..agg import combine_partials

    parts = ds.map_batches(
        lambda b: _edge_partials(b, html, url), batch_format="pyarrow")
    return combine_partials(parts, keys=["src_domain", "dst_domain"],
                            value_cols=["n"], mode=mode)


def domain_degrees(ds, html: str = "html", url: str = "url",
                   mode: str = "tree"):
    """Per-domain degree stats: ``(domain, out_degree, out_links,
    in_degree, in_links)`` — distinct-neighbor counts and total link
    counts, both directions.  One edge extraction + two summary-sized
    combines (the per-domain key space is the SMALL side of the graph)."""
    from ..agg import combine_partials

    edges = extract_links(ds, html=html, url=url, mode="hash")

    def direction(batch: pa.Table, key: str, deg: str, links: str) -> pa.Table:
        df = batch.to_pandas()
        if key not in df.columns:  # schemaless empty block (empty input)
            df = pd.DataFrame({key: pd.Series([], dtype=object),
                               "n": pd.Series([], dtype=np.int64)})
        out = (df.groupby(key, sort=False)
               .agg(**{deg: ("n", "size"), links: ("n", "sum")})
               .reset_index().rename(columns={key: "domain"}))
        for c in (deg, links):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False, schema=pa.schema(
            [("domain", pa.string()), (deg, pa.int64()), (links, pa.int64())]))

    outs = combine_partials(
        edges.map_batches(
            lambda b: direction(b, "src_domain", "out_degree", "out_links"),
            batch_format="pyarrow"),
        keys=["domain"], value_cols=["out_degree", "out_links"], mode=mode)
    ins = combine_partials(
        edges.map_batches(
            lambda b: direction(b, "dst_domain", "in_degree", "in_links"),
            batch_format="pyarrow"),
        keys=["domain"], value_cols=["in_degree", "in_links"], mode=mode)

    # full outer merge of two summary-sized per-domain tables
    o = outs.to_pandas()
    i = ins.to_pandas()
    out = o.merge(i, on="domain", how="outer").fillna(0)
    for c in ["out_degree", "out_links", "in_degree", "in_links"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("domain").reset_index(drop=True)


def pagerank(ds, html: str = "html", url: str = "url",
             damping: float = 0.85, iters: int = 3,
             max_domains: int = 50_000_000):
    """Damped PageRank over the domain graph, link-multiplicity
    weighted; see module docstring for the broadcast-iterate shape.

    Returns a pandas frame ``(domain, rank)``; ranks start uniform at
    ``1/N`` and take ``iters`` power steps
    ``r' = (1-d)/N + d * sum_in(r_src * n_edge / out_links_src)``
    (dangling domains' mass is dropped, the convention the SQL oracle
    mirrors).  ``max_domains`` guards the driver-resident rank vector.
    """
    from ..agg import combine_partials

    edges = extract_links(ds, html=html, url=url, mode="hash").materialize()

    # domain index + out-link totals: summary-sized by assumption
    def out_totals(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        if "src_domain" not in df.columns:  # schemaless empty block
            df = pd.DataFrame({"src_domain": pd.Series([], dtype=object),
                               "n": pd.Series([], dtype=np.int64)})
        df = df.groupby("src_domain", sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(df, preserve_index=False, schema=pa.schema(
            [("src_domain", pa.string()), ("n", pa.int64())]))

    totals = combine_partials(
        edges.map_batches(out_totals, batch_format="pyarrow"),
        keys=["src_domain"], value_cols=["n"], mode="tree").to_pandas()
    def dst_ones(b: pa.Table) -> pa.Table:
        dst = (b["dst_domain"] if "dst_domain" in b.column_names
               else pa.array([], pa.string()))
        return pa.table({"dst_domain": dst,
                         "one": pa.array(np.ones(len(dst), dtype=np.int64))})

    dst_doms = combine_partials(
        edges.map_batches(dst_ones, batch_format="pyarrow"),
        keys=["dst_domain"], value_cols=["one"], mode="tree").to_pandas()

    if "src_domain" not in totals.columns:  # fully-empty round trip
        totals = pd.DataFrame({"src_domain": pd.Series([], dtype=object),
                               "n": pd.Series([], dtype=np.int64)})
    if "dst_domain" not in dst_doms.columns:
        dst_doms = pd.DataFrame({"dst_domain": pd.Series([], dtype=object)})

    domains = np.union1d(totals["src_domain"].to_numpy(),
                         dst_doms["dst_domain"].to_numpy())
    n_dom = len(domains)
    if n_dom > max_domains:
        raise ValueError(
            f"pagerank: {n_dom} domains exceeds the {max_domains} "
            f"driver budget for the broadcast rank vector")
    if n_dom == 0:
        return pd.DataFrame({"domain": pd.Series([], dtype=object),
                             "rank": pd.Series([], dtype=np.float64)})
    out_links = np.zeros(n_dom, dtype=np.float64)
    idx = np.searchsorted(domains, totals["src_domain"].to_numpy())
    out_links[idx] = totals["n"].to_numpy().astype(np.float64)

    ranks = np.full(n_dom, 1.0 / n_dom)
    for _ in range(iters):
        r, ol, dom = ranks, out_links, domains  # broadcast into the closure

        def contrib(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            si = np.searchsorted(dom, df["src_domain"].to_numpy())
            w = r[si] * df["n"].to_numpy() / ol[si]
            out = (pd.DataFrame({"dst_domain": df["dst_domain"], "w": w})
                   .groupby("dst_domain", sort=False)["w"].sum()
                   .reset_index())
            return pa.Table.from_pandas(
                out, preserve_index=False, schema=pa.schema(
                    [("dst_domain", pa.string()), ("w", pa.float64())]))

        agg = combine_partials(
            edges.map_batches(contrib, batch_format="pyarrow"),
            keys=["dst_domain"], value_cols=["w"], mode="tree").to_pandas()
        new = np.full(n_dom, (1.0 - damping) / n_dom)
        di = np.searchsorted(domains, agg["dst_domain"].to_numpy())
        new[di] += damping * agg["w"].to_numpy()
        ranks = new

    return pd.DataFrame({"domain": domains, "rank": ranks})


def count_triangles(ds=None, html: str = "html", url: str = "url",
                    num_partitions=None, max_out: int = 100_000,
                    edges=None, return_degrees: bool = False,
                    edge_budget: int = 50_000):
    """Per-domain triangle participation counts over the UNDIRECTED
    domain graph: ``(domain, n_tri)``, each triangle counted once at
    each of its three vertices.

    Degree-ordered orientation (the standard compact-forward /
    node-iterator++ scheme — Schank & Wagner 2005, public literature):
    orient every undirected edge from the (degree, name)-smaller
    endpoint to the larger, so each node's out-degree is O(sqrt(m)) and
    each triangle has exactly ONE "apex" whose two out-edges form the
    wedge.  Stages:

    1. canonical undirected edges (a < b, self-loops dropped), deduped
       with the bounded-bucket pattern (never a pair-keyed shuffle);
    2. degree table via one hash combine; the degree VECTOR broadcasts
       (domain count is summary-sized for domain graphs — the same
       documented assumption ``pagerank`` makes for its rank vector);
    3. per-apex wedge generation: ``groupby(apex)`` over oriented
       edges, vectorized triu pairing, out-lists capped at ``max_out``
       with a logged drop (orientation makes the cap theoretical);
    4. wedge closure: ONE distributed hash join of the wedge set
       against the oriented edge set — a triangle per match;
    5. per-vertex counts via one last summary-sized hash combine.

    ``edges``: a pre-built ``(src_domain, dst_domain, ...)`` Dataset
    overrides the page scan (composition with planted-edge corpora and
    other edge sources).
    """
    import ray

    from ..agg import combine_partials, default_partitions

    if num_partitions is None:
        num_partitions = default_partitions(4)

    if edges is None:
        edges = extract_links(ds, html=html, url=url, mode="hash")

    def canon(batch: pa.Table) -> pa.Table:
        if "src_domain" not in batch.column_names:  # schemaless empty
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        s = batch["src_domain"].to_pandas().to_numpy()
        d = batch["dst_domain"].to_pandas().to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string())})

    n_buckets = max(64, num_partitions * 8)

    def add_bucket(batch: pa.Table) -> pa.Table:
        # pd.util.hash_pandas_object: vectorized AND deterministic across
        # worker processes (fixed default key; Python's hash() is salted
        # per process and would split a pair's copies across buckets,
        # breaking the dedupe)
        h = (pd.util.hash_pandas_object(
            batch["a"].to_pandas() + "|" + batch["b"].to_pandas(),
            index=False).to_numpy() % n_buckets).astype(np.int64)
        return batch.append_column("_bkt", pa.array(h, type=pa.int64()))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b"]]

    und = edges.map_batches(canon, batch_format="pyarrow").map_batches(
        add_bucket, batch_format="pyarrow").groupby(
        "_bkt", num_partitions=num_partitions).map_groups(
        dedup_bucket, batch_format="pandas").materialize()

    n_edges = und.count()
    if n_edges == 0:
        empty = pd.DataFrame({"domain": pd.Series([], dtype=object),
                              "n_tri": pd.Series([], dtype=np.int64)})
        if return_degrees:
            return empty, pd.DataFrame({"domain": pd.Series([], dtype=object),
                                        "deg": pd.Series([], dtype=np.int64)})
        return empty

    if n_edges <= edge_budget:
        # driver fast path (the hits contract): the deduped undirected
        # edge set is summary-sized — pull it once and run the same
        # degree-ordered compact-forward count in NumPy, skipping four
        # distributed rounds.  Identical integer outputs by construction.
        df = und.to_pandas()
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        domains, inv = np.unique(np.concatenate([a, b]),
                                 return_inverse=True)
        ai, bi = inv[:len(a)], inv[len(a):]
        deg = np.bincount(np.concatenate([ai, bi]),
                          minlength=len(domains)).astype(np.int64)
        # orient apex -> leaf by (deg, name); domains sorted => index
        # order IS name order
        a_first = (deg[ai] < deg[bi]) | ((deg[ai] == deg[bi]) & (ai < bi))
        apex = np.where(a_first, ai, bi)
        leaf = np.where(a_first, bi, ai)
        adj = {}
        order = np.argsort(apex, kind="stable")
        edge_set = set(zip(ai.tolist(), bi.tolist()))
        for x, y in zip(apex[order].tolist(), leaf[order].tolist()):
            adj.setdefault(x, []).append(y)
        tri = np.zeros(len(domains), dtype=np.int64)
        for x, leaves in adj.items():
            leaves = sorted(set(leaves))
            for i2 in range(len(leaves)):
                for j2 in range(i2 + 1, len(leaves)):
                    v, w = leaves[i2], leaves[j2]
                    if (min(v, w), max(v, w)) in edge_set:
                        tri[x] += 1
                        tri[v] += 1
                        tri[w] += 1
        keep = tri > 0
        out = pd.DataFrame({"domain": domains[keep],
                            "n_tri": tri[keep]}).sort_values(
            "domain").reset_index(drop=True)
        if return_degrees:
            degs = pd.DataFrame({"domain": domains, "deg": deg}) \
                .sort_values("domain").reset_index(drop=True)
            return out, degs
        return out

    # degree table (summary-sized): one hash combine over both endpoints
    def deg_partials(batch: pa.Table) -> pa.Table:
        dom = np.concatenate([batch["a"].to_pandas().to_numpy(),
                              batch["b"].to_pandas().to_numpy()])
        out = pd.Series(dom).value_counts().rename_axis("domain").reset_index(
            name="deg")
        out["deg"] = out["deg"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False, schema=pa.schema(
            [("domain", pa.string()), ("deg", pa.int64())]))

    degs = combine_partials(
        und.map_batches(deg_partials, batch_format="pyarrow"),
        keys=["domain"], value_cols=["deg"], mode="hash").to_pandas()
    dom_sorted = np.sort(degs["domain"].to_numpy())
    deg_vec = np.empty(len(dom_sorted), dtype=np.int64)
    deg_vec[np.searchsorted(dom_sorted, degs["domain"].to_numpy())] = (
        degs["deg"].to_numpy())
    dom_ref = ray.put(dom_sorted)
    deg_ref = ray.put(deg_vec)

    def orient(batch: pa.Table) -> pa.Table:
        """apex -> leaf by (deg, name) order."""
        dom = ray.get(dom_ref)
        dv = ray.get(deg_ref)
        a = batch["a"].to_pandas().to_numpy()
        b = batch["b"].to_pandas().to_numpy()
        da = dv[np.searchsorted(dom, a)]
        db = dv[np.searchsorted(dom, b)]
        a_first = (da < db) | ((da == db) & (a < b))
        return pa.table({
            "apex": pa.array(np.where(a_first, a, b), pa.string()),
            "leaf": pa.array(np.where(a_first, b, a), pa.string()),
        })

    oriented = und.map_batches(orient, batch_format="pyarrow").materialize()

    _wedge_schema = pa.schema([("apex", pa.string()), ("v", pa.string()),
                               ("w", pa.string())])

    def wedges(group: pd.DataFrame) -> pa.Table:
        # explicit Arrow schema: an empty pandas frame would otherwise
        # become a null-typed block and break the closure join's
        # cross-block schema unification
        leaves = np.unique(group["leaf"].to_numpy())
        if len(leaves) < 2:
            return _wedge_schema.empty_table()
        if len(leaves) > max_out:
            logging.getLogger("fast_carpenter_ray.linkgraph").warning(
                "count_triangles: apex out-list capped at %d of %d "
                "(degree orientation should bound this — investigate)",
                max_out, len(leaves))
            leaves = leaves[:max_out]
        iu = np.triu_indices(len(leaves), k=1)
        return pa.table({
            "apex": pa.array(np.repeat(group["apex"].iloc[0], len(iu[0]))),
            "v": pa.array(leaves[iu[0]]), "w": pa.array(leaves[iu[1]]),
        }).cast(_wedge_schema)

    wset = oriented.groupby("apex", num_partitions=num_partitions).map_groups(
        wedges, batch_format="pandas")

    # closure: wedge (v, w) is a triangle iff the UNDIRECTED edge {v, w}
    # exists; und is canonical (a < b) and wedge emission keeps v < w.
    # Implemented as a bucket co-group (hash both sides on the pair,
    # groupby the bounded bucket id, local vectorized merge) rather than
    # Dataset.join: Ray 2.49's join finalize crashes on a partition whose
    # left side received zero blocks (schemaless empty), which any sparse
    # graph produces.
    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "apex": pa.nulls(len(t), pa.string()),
            "v": t["a"], "w": t["b"],
            "_is_edge": pa.array(np.ones(len(t), dtype=np.int8)),
        })

    def tag_wedges(t: pa.Table) -> pa.Table:
        return pa.table({
            "apex": t["apex"], "v": t["v"], "w": t["w"],
            "_is_edge": pa.array(np.zeros(len(t), dtype=np.int8)),
        })

    def add_pair_bucket(t: pa.Table) -> pa.Table:
        # vectorized deterministic bucket hash — the wedge set is the
        # largest intermediate in the operator (O(m^1.5) rows), so no
        # per-row Python here
        h = (pd.util.hash_pandas_object(
            t["v"].to_pandas() + "|" + t["w"].to_pandas(),
            index=False).to_numpy() % n_buckets).astype(np.int64)
        return t.append_column("_bkt", pa.array(h, type=pa.int64()))

    both = und.map_batches(tag_edges, batch_format="pyarrow").union(
        wset.map_batches(tag_wedges, batch_format="pyarrow")).map_batches(
        add_pair_bucket, batch_format="pyarrow")

    def close_bucket(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["_is_edge"] == 1][["v", "w"]]
        wdg = g[g["_is_edge"] == 0][["apex", "v", "w"]]
        return wdg.merge(e, on=["v", "w"], how="inner")

    tri = both.groupby("_bkt", num_partitions=num_partitions).map_groups(
        close_bucket, batch_format="pandas")

    def vertex_partials(batch: pa.Table) -> pa.Table:
        if "apex" not in batch.column_names:  # schemaless empty block
            return pa.table({"domain": pa.array([], pa.string()),
                             "n_tri": pa.array([], pa.int64())})
        dom = np.concatenate([batch[c].to_pandas().to_numpy()
                              for c in ("apex", "v", "w")])
        out = pd.Series(dom).value_counts().rename_axis("domain").reset_index(
            name="n_tri")
        out["n_tri"] = out["n_tri"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False, schema=pa.schema(
            [("domain", pa.string()), ("n_tri", pa.int64())]))

    out = combine_partials(
        tri.map_batches(vertex_partials, batch_format="pyarrow"),
        keys=["domain"], value_cols=["n_tri"], mode="hash").to_pandas()
    if "domain" not in out.columns:  # no triangles at all
        out = pd.DataFrame({"domain": pd.Series([], dtype=object),
                            "n_tri": pd.Series([], dtype=np.int64)})
    out["n_tri"] = out["n_tri"].astype(np.int64)
    out = out.sort_values("domain").reset_index(drop=True)
    if return_degrees:
        return out, degs.sort_values("domain").reset_index(drop=True)
    return out


def clustering_coefficients(ds=None, html: str = "html", url: str = "url",
                            num_partitions=None, edges=None):
    """Per-domain local clustering coefficient over the undirected domain
    graph: ``coeff = n_tri / (deg * (deg - 1) / 2)``.

    Rides entirely on :func:`count_triangles` — the per-vertex triangle
    counts AND the degree table it already computes (one canonical-edge
    dedupe, one degree combine, one wedge-closure join; nothing extra is
    shuffled).  Every vertex of the graph appears in the output, zero-
    triangle vertices included.  ``n_tri`` and ``n_wedges`` are exact
    int64; ``coeff`` is their exact IEEE float64 quotient (0.0 when
    ``deg < 2``), so a SQL replay hashes bit-identically.

    Reference analogue: none (SURVEY §2.5 extension, alongside
    ``count_triangles`` — Schank & Wagner 2005 / Watts-Strogatz 1998,
    public literature).
    """
    tri, degs = count_triangles(ds, html=html, url=url,
                                num_partitions=num_partitions, edges=edges,
                                return_degrees=True)
    out = degs.merge(tri, on="domain", how="left")
    out["n_tri"] = out["n_tri"].fillna(0).astype(np.int64)
    deg = out.pop("deg").to_numpy()
    out["n_wedges"] = (deg * (deg - 1) // 2).astype(np.int64)
    nw = out["n_wedges"].to_numpy().astype(np.float64)
    out["coeff"] = np.where(
        nw > 0, out["n_tri"].to_numpy().astype(np.float64) / np.where(nw > 0, nw, 1.0),
        0.0)
    return out.sort_values("domain").reset_index(drop=True)


def link_components(ds=None, html: str = "html", url: str = "url",
                    max_domains: int = 50_000_000, edges=None):
    """Connected components of the (undirected) domain link graph:
    pandas frame ``(domain, component)`` with ``component`` = the
    lexicographically smallest domain in the component — isolated
    domains (no edges) never appear in the edge table and are absent,
    matching the SQL closure.

    Shape: one edge extraction (html never shuffles), then
    ``stages.dedup.distributed_components``'s min-label propagation
    over int64 domain-hash ids (node-keyed joins only, never the
    pair), then a driver relabel of the summary-sized (domain, label)
    table to the min-domain canonical name — guarded by
    ``max_domains`` exactly like :func:`pagerank`'s broadcast.
    """
    from .dedup import (_stable_token_hash, cluster_pairs,
                        distributed_components)

    if edges is None:
        edges = extract_links(ds, html=html, url=url, mode="hash")
    edf = edges.to_pandas()
    if len(edf) == 0:
        return pd.DataFrame({"domain": pd.Series([], dtype="object"),
                             "component": pd.Series([], dtype="object")})
    doms = pd.unique(pd.concat([edf["src_domain"], edf["dst_domain"]]))
    if len(doms) > max_domains:
        raise ValueError(
            f"link_components: {len(doms)} domains exceed the "
            f"{max_domains} relabel budget — raise max_domains (the "
            "label table is ~50 B/domain)")
    # signed-int64 view of the uint64 hash so the ids survive the
    # Arrow int64 round trip and the reverse map stays total
    def _sid(d: str) -> int:
        h = _stable_token_hash(d)
        return h - (1 << 64) if h >= (1 << 63) else h

    nid = {d: _sid(d) for d in doms}
    pair_df = pd.DataFrame({
        "id_a": edf["src_domain"].map(nid).astype(np.int64),
        "id_b": edf["dst_domain"].map(nid).astype(np.int64),
    }).drop_duplicates()
    if len(pair_df) <= 500_000:
        # the edge table already sits on the driver (it had to, for the
        # relabel map) — a union-find here beats rounds of label joins
        comp = cluster_pairs(pair_df)
    else:
        import ray.data as rd

        comp = distributed_components(rd.from_pandas(pair_df)).to_pandas()
    back = {v: k for k, v in nid.items()}
    out = pd.DataFrame({
        "domain": comp["doc_id"].map(back),
        "cluster": comp["cluster_id"],
    })
    canon = out.groupby("cluster")["domain"].min()
    out["component"] = out["cluster"].map(canon)
    return (out[["domain", "component"]]
            .sort_values("domain").reset_index(drop=True))


def hits(ds=None, html: str = "html", url: str = "url", iters: int = 2,
         max_domains: int = 50_000_000, edges=None,
         edge_budget: int = 2_000_000):
    """HITS hubs & authorities over the directed domain graph
    (Kleinberg 1999, public literature), link-multiplicity weighted.

    Same broadcast-iterate shape as :func:`pagerank`: the hub/authority
    vectors are driver-resident (summary-sized by the same
    ``max_domains`` contract) and broadcast into one edge-stream combine
    per half-step; edges never leave their partitions.  Per iteration:
    ``a = normalize(Aᵀ h)`` then ``h = normalize(A a)`` (L1).  Hubs
    start uniform at 1.0.  Returns ``(domain, hub, authority)`` raw
    float64 — callers round (the pagerank float contract).
    """
    from ..agg import combine_partials

    if edges is None:
        edges = extract_links(ds, html=html, url=url, mode="hash")
    edges = edges.materialize()

    # fast path: the combined edge table is domains x avg-degree —
    # summary-sized for domain graphs.  Under the budget, pull it ONCE
    # and run the iterations in NumPy on the driver (4 distributed
    # combine rounds -> 0; the round-6 caller contract absorbs the
    # summation-order ulps).  Above it, the distributed half-steps below.
    if edges.count() <= edge_budget:
        df = edges.to_pandas()
        if "src_domain" not in df.columns or not len(df):
            return pd.DataFrame({"domain": pd.Series([], dtype=object),
                                 "hub": pd.Series([], dtype=np.float64),
                                 "authority": pd.Series([], dtype=np.float64)})
        # canonical edge order: np.add.at accumulates in row order, and
        # Ray block arrival order is nondeterministic — sort so repeated
        # runs produce bit-identical float sums (ADVICE r3)
        df = (df.sort_values(["dst_domain", "src_domain"], kind="stable")
              .reset_index(drop=True))
        domains = np.union1d(df["src_domain"].to_numpy(),
                             df["dst_domain"].to_numpy())
        si = np.searchsorted(domains, df["src_domain"].to_numpy())
        di = np.searchsorted(domains, df["dst_domain"].to_numpy())
        n = df["n"].to_numpy().astype(np.float64)
        hub = np.ones(len(domains), dtype=np.float64)
        auth = np.zeros(len(domains), dtype=np.float64)
        for _ in range(iters):
            auth = np.zeros(len(domains), dtype=np.float64)
            np.add.at(auth, di, hub[si] * n)
            tot = auth.sum()
            if tot > 0:
                auth /= tot
            hub = np.zeros(len(domains), dtype=np.float64)
            np.add.at(hub, si, auth[di] * n)
            tot = hub.sum()
            if tot > 0:
                hub /= tot
        return pd.DataFrame({"domain": domains, "hub": hub,
                             "authority": auth})

    def side_ones(col):
        def fn(b: pa.Table) -> pa.Table:
            v = (b[col] if col in b.column_names
                 else pa.array([], pa.string()))
            return pa.table({col: v, "one": pa.array(
                np.ones(len(v), dtype=np.int64))})
        return fn

    srcs = combine_partials(
        edges.map_batches(side_ones("src_domain"), batch_format="pyarrow"),
        keys=["src_domain"], value_cols=["one"], mode="tree").to_pandas()
    dsts = combine_partials(
        edges.map_batches(side_ones("dst_domain"), batch_format="pyarrow"),
        keys=["dst_domain"], value_cols=["one"], mode="tree").to_pandas()
    s_col = (srcs["src_domain"].to_numpy() if "src_domain" in srcs.columns
             else np.array([], dtype=object))
    d_col = (dsts["dst_domain"].to_numpy() if "dst_domain" in dsts.columns
             else np.array([], dtype=object))
    domains = np.union1d(s_col, d_col)
    n_dom = len(domains)
    if n_dom > max_domains:
        raise ValueError(f"hits: {n_dom} domains exceeds the "
                         f"{max_domains} driver budget")
    if n_dom == 0:
        return pd.DataFrame({"domain": pd.Series([], dtype=object),
                             "hub": pd.Series([], dtype=np.float64),
                             "authority": pd.Series([], dtype=np.float64)})

    def half_step(vec, from_col, to_col):
        """combine over edges: out(to) = Σ vec[from] * n, L1-normalized."""
        v, dom = vec, domains

        def contrib(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            if from_col not in df.columns:  # schemaless empty block
                return pa.table({to_col: pa.array([], pa.string()),
                                 "w": pa.array([], pa.float64())})
            fi = np.searchsorted(dom, df[from_col].to_numpy())
            w = v[fi] * df["n"].to_numpy()
            out = (pd.DataFrame({to_col: df[to_col], "w": w})
                   .groupby(to_col, sort=False)["w"].sum().reset_index())
            return pa.Table.from_pandas(
                out, preserve_index=False,
                schema=pa.schema([(to_col, pa.string()),
                                  ("w", pa.float64())]))

        agg = combine_partials(
            edges.map_batches(contrib, batch_format="pyarrow"),
            keys=[to_col], value_cols=["w"], mode="tree").to_pandas()
        new = np.zeros(n_dom, dtype=np.float64)
        if to_col in agg.columns and len(agg):
            ti = np.searchsorted(domains, agg[to_col].to_numpy())
            new[ti] = agg["w"].to_numpy()
        tot = new.sum()
        return new / tot if tot > 0 else new

    hub = np.ones(n_dom, dtype=np.float64)
    auth = np.zeros(n_dom, dtype=np.float64)
    for _ in range(iters):
        auth = half_step(hub, "src_domain", "dst_domain")
        hub = half_step(auth, "dst_domain", "src_domain")

    return pd.DataFrame({"domain": domains, "hub": hub, "authority": auth})


def bib_coupling(ds=None, html: str = "html", url: str = "url",
                 min_shared: int = 2, max_in: int = 2_000,
                 on_cap: str = "raise", num_partitions=None, edges=None):
    """Bibliographic coupling over the domain graph (Kessler 1963,
    public literature): two source domains are coupled by the number of
    DISTINCT targets they both link to — the classic "related sites"
    signal.

    Shape: the combined edge table is already distinct (src, dst); a
    ``groupby(dst)`` emits the citing-source pairs of each target
    (vectorized triu), pre-aggregated per group task, then ONE hash
    combine keyed on the (a, b) pair — the pair key space is domains x
    coupling degree, the same summary-size contract as
    ``domain_degrees``.  A target's in-degree is bounded by ``max_in``
    (default 2000 -> <= ~2M pairs per group task): exceeding it RAISES
    by default, because silently truncating would break the exact
    coupling counts — pass ``on_cap="warn"`` to accept a documented
    lexicographic truncation instead.  Returns ``(src_a, src_b,
    shared)`` with ``shared >= min_shared``, ``src_a < src_b``.
    """
    from ..agg import combine_partials, default_partitions

    if num_partitions is None:
        num_partitions = default_partitions(4)
    if edges is None:
        edges = extract_links(ds, html=html, url=url, mode="hash")

    _pair_schema = pa.schema([("src_a", pa.string()),
                              ("src_b", pa.string()),
                              ("shared", pa.int64())])

    def pairs(group: pd.DataFrame) -> pa.Table:
        srcs = np.unique(group["src_domain"].to_numpy())
        if len(srcs) < 2:
            return _pair_schema.empty_table()
        if len(srcs) > max_in:
            if on_cap != "warn":
                raise ValueError(
                    f"bib_coupling: a target has {len(srcs)} citing "
                    f"sources (> max_in={max_in}); its pair table would "
                    f"be O(max_in^2) — raise max_in deliberately or pass "
                    f"on_cap='warn' to accept truncated counts")
            logging.getLogger("fast_carpenter_ray.linkgraph").warning(
                "bib_coupling: in-list capped at %d of %d (coupling "
                "counts for the dropped sources are LOST)", max_in,
                len(srcs))
            srcs = srcs[:max_in]
        iu = np.triu_indices(len(srcs), k=1)
        return pa.table({
            "src_a": pa.array(srcs[iu[0]]),
            "src_b": pa.array(srcs[iu[1]]),
            "shared": pa.array(np.ones(len(iu[0]), dtype=np.int64)),
        }).cast(_pair_schema)

    pair_parts = edges.groupby("dst_domain", num_partitions=num_partitions) \
        .map_groups(pairs, batch_format="pandas")
    out = combine_partials(pair_parts, keys=["src_a", "src_b"],
                           value_cols=["shared"], mode="hash",
                           num_partitions=num_partitions).to_pandas()
    if "src_a" not in out.columns:
        return pd.DataFrame({"src_a": pd.Series([], dtype=object),
                             "src_b": pd.Series([], dtype=object),
                             "shared": pd.Series([], dtype=np.int64)})
    out["shared"] = out["shared"].astype(np.int64)
    out = out[out["shared"] >= min_shared]
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)


def reciprocity(ds=None, html: str = "html", url: str = "url",
                num_partitions=None, edges=None):
    """Per-domain edge reciprocity: of a domain's distinct out-
    neighbors, how many link back — the mutual-linking signal that
    separates organic link exchanges from one-way spam farms
    (Garlaschelli & Loffredo 2004, public literature).

    Shape: the distinct directed edge set tags each (a, b) pair in
    canonical order with direction bits; ONE bounded-bucket pair-hash
    groupby (the lesson-7 pattern — never keyed on the raw pair at
    group-task granularity) finds mutual pairs; per-domain counts are
    two summary-sized combines.  ``ratio`` is one IEEE division of
    exact ints.  Returns ``(domain, n_out, n_mutual, ratio)``.
    """
    from ..agg import combine_partials, default_partitions

    if num_partitions is None:
        num_partitions = default_partitions(4)
    if edges is None:
        edges = extract_links(ds, html=html, url=url, mode="hash")

    n_buckets = max(64, num_partitions * 8)

    def canon_dir(batch: pa.Table) -> pa.Table:
        if "src_domain" not in batch.column_names:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "fwd": pa.array([], pa.int64()),
                             "rev": pa.array([], pa.int64()),
                             "_bkt": pa.array([], pa.int64())})
        s = batch["src_domain"].to_pandas().to_numpy()
        d = batch["dst_domain"].to_pandas().to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        fwd = (s == a).astype(np.int64)   # edge runs a -> b
        h = (pd.util.hash_pandas_object(
            pd.Series(a) + "|" + pd.Series(b),
            index=False).to_numpy() % n_buckets).astype(np.int64)
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string()),
                         "fwd": pa.array(fwd),
                         "rev": pa.array(1 - fwd),
                         "_bkt": pa.array(h)})

    def pair_stats(g: pd.DataFrame) -> pd.DataFrame:
        agg = (g.groupby(["a", "b"], sort=False)
               .agg(fwd=("fwd", "max"), rev=("rev", "max")).reset_index())
        agg["mutual"] = (agg["fwd"].astype(np.int64)
                         & agg["rev"].astype(np.int64)).astype(np.int64)
        return agg[["a", "b", "fwd", "rev", "mutual"]]

    pairs = (edges.map_batches(canon_dir, batch_format="pyarrow")
             .groupby("_bkt", num_partitions=num_partitions)
             .map_groups(pair_stats, batch_format="pandas"))

    def domain_partials(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if "a" not in df.columns or not len(df):
            return pa.table({"domain": pa.array([], pa.string()),
                             "n_out": pa.array([], pa.int64()),
                             "n_mutual": pa.array([], pa.int64())})
        rows = pd.concat([
            pd.DataFrame({"domain": df["a"], "n_out": df["fwd"],
                          "n_mutual": df["mutual"]}),
            pd.DataFrame({"domain": df["b"], "n_out": df["rev"],
                          "n_mutual": df["mutual"]}),
        ])
        out = rows.groupby("domain", sort=False).sum().reset_index()
        for c in ("n_out", "n_mutual"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False,
                                    schema=pa.schema(
                                        [("domain", pa.string()),
                                         ("n_out", pa.int64()),
                                         ("n_mutual", pa.int64())]))

    out = combine_partials(
        pairs.map_batches(domain_partials, batch_format="pyarrow"),
        keys=["domain"], value_cols=["n_out", "n_mutual"],
        mode="hash").to_pandas()
    if "domain" not in out.columns:
        return pd.DataFrame({"domain": pd.Series([], dtype=object),
                             "n_out": pd.Series([], dtype=np.int64),
                             "n_mutual": pd.Series([], dtype=np.int64),
                             "ratio": pd.Series([], dtype=np.float64)})
    out = out[out["n_out"] > 0]
    out["n_out"] = out["n_out"].astype(np.int64)
    out["n_mutual"] = out["n_mutual"].astype(np.int64)
    out["ratio"] = (out["n_mutual"].to_numpy().astype(np.float64)
                    / out["n_out"].to_numpy().astype(np.float64))
    return out.sort_values("domain").reset_index(drop=True)

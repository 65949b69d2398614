"""Driver-contract queries: one Ray pipeline per operator + DuckDB oracles.

Each ``QUERIES[name](sf_dir)`` runs a real engine pipeline over the
driver-generated parquet at ``sf_dir`` and returns a small result
(Dataset / pandas / Arrow).  ``ORACLES[name]`` is the ANSI-SQL equivalent
DuckDB runs on the same tables (views ``documents``, ``lineitem``,
``events``, ``embeddings``, ... pre-registered by the driver).  Column
names and types match pairwise by construction; float aggregates of
non-dyadic inputs are rounded identically on both sides (see comments).

Geo queries operate on the deterministic synthetic pages derived from
``documents`` (fixtures.py): lat/lng/weight are pure integer-arithmetic
functions of doc_id mirrored bit-for-bit by ``sql_geo_exprs``, and the
engine recovers them by actually parsing the synthesized html (%.17g
round-trip), so the comparison exercises the full extract path.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np
import pandas as pd
import pyarrow as pa

from ..fixtures import (
    WARC_EPOCH_US, WARC_STEP_S, geo_columns, pages_dataset, rect_polygons,
    rect_zones_sql_values, sites_table, sites_sql_values, sql_geo_exprs)
from ..geo.cells import RESOLUTION_DEFAULT
from ..stages import (
    BinnedDataframe, CellEncode, CutFlow, Define, EventByEventDataframe,
    ExactDedup, ExtractText, Fingerprint, HashCompare, LangId, MinHashDedup,
    QualityScore, SelectPhaseSpace, SimHashDedup, SystematicWeights,
    TokenCount, ann_topk, near_dup_cosine, pip_join)
from ..stages.knn_join import knn_join

RES = RESOLUTION_DEFAULT  # 6 -> 64x64 grid
_N = 1 << RES

# ----------------------------------------------------------------------
# shared pipeline fragments


def _pages_geo(sf_dir: str, replicate: int = 1, concurrency=None,
               num_blocks=None):
    """documents -> synthetic pages -> extracted text + lat/lng (+ weight).

    The weight column is part of the synthetic spec (dyadic k/1024 so sums
    are order-independent-exact; fixtures.py docstring).  ``num_blocks``
    sets the read's block count — the parallelism driver for the whole
    fused map chain.
    """
    ds = pages_dataset(sf_dir, replicate=replicate, num_blocks=num_blocks)
    ds = ExtractText.apply(ds, concurrency=concurrency)

    def add_weight(batch: pa.Table) -> pa.Table:
        g = geo_columns(batch["doc_id"].to_numpy(zero_copy_only=False))
        return batch.append_column("weight", pa.array(g["weight"]))

    return ds.map_batches(add_weight, batch_format="pyarrow")


def _geo_sql_base() -> str:
    e = sql_geo_exprs("doc_id")
    return (
        f"SELECT doc_id, lang, text, {e['lat']} AS lat, {e['lng']} AS lng, "
        f"{e['weight']} AS weight FROM documents"
    )


def _cell_sql(lat: str = "lat", lng: str = "lng") -> str:
    return (
        f"(CAST(least(greatest(floor(({lat} + 90.0) / 180.0 * {_N}), 0), {_N - 1}) AS BIGINT) * {_N} "
        f"+ CAST(least(greatest(floor(({lng} + 180.0) / 360.0 * {_N}), 0), {_N - 1}) AS BIGINT))"
    )


# ----------------------------------------------------------------------
# individual queries (Ray side)


def q_hash_invariant(sf_dir: str):
    """Per-row invariant: sha256(extracted text) per doc — oracle recomputes
    from the source text with DuckDB's independent sha256."""
    ds = pages_dataset(sf_dir)
    ds = ExtractText.apply(ds)
    ds = HashCompare.apply(ds)  # raises on any mismatch (strict)
    return ds.select_columns(["doc_id", "text_sha256"])


def q_cell_encode(sf_dir: str):
    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["cell"], 0)),
        batch_format="pyarrow")
    return ds.select_columns(["doc_id", "lat", "lng", "cell"])


def q_compact_cells(sf_dir: str):
    """Hierarchical cell-set compaction (stages/compact_cells.py): the
    minimal multi-resolution cover of the occupied cells, res 6 -> 4;
    one distributed distinct + one tiny per-level quad groupby."""
    from ..stages.compact_cells import compact_cells

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    return compact_cells(ds, cell="cell", res=RES, min_res=RES - 2)


def q_local_hour(sf_dir: str):
    """Crawl activity by local SOLAR hour: each page's UTC crawl
    timestamp shifted by its longitude (15 degrees per hour, the
    geo-temporal join of the two page axes), counted per (local_hour,
    lang).  24 x langs keys — summary-sized, zero-shuffle tree combine.
    Float ops are one division + one addition + floor in both engines,
    so the oracle hashes bit-exactly."""

    from ..agg import combine_partials

    ds = _pages_geo(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        ts = batch["warc_ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        ok = ~np.isnan(lat)
        lh = (np.floor(ts[ok].astype(np.float64) / 3600000000.0
                       + lng[ok] / 15.0).astype(np.int64) % 24)
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)[ok]
        df = pd.DataFrame({"local_hour": lh, "lang": lang})
        out = (df.groupby(["local_hour", "lang"], as_index=False)
               .size().rename(columns={"size": "n_pages"}))
        out["n_pages"] = out["n_pages"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    out = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["local_hour", "lang"], value_cols=["n_pages"],
        mode="tree").to_pandas()
    return out.sort_values(["local_hour", "lang"]).reset_index(drop=True)


def q_spacetime(sf_dir: str):
    """Space-time cube (stages/spacetime.py): per (cell, day) counts +
    exact dyadic weight sums over the page stream — keyed on a space
    that grows with data, so the combine is the distributed hash path."""
    from ..stages.spacetime import spacetime_cube

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    out = spacetime_cube(ds, cell="cell", ts="warc_ts",
                         weight="weight").to_pandas()
    out["n"] = out["n"].astype(np.int64)
    out["bucket"] = out["bucket"].astype(np.int64)
    return out.sort_values(["cell", "bucket"]).reset_index(drop=True)


def q_outlier_cells(sf_dir: str):
    """Density outliers (stages/spacetime.py outlier_cells): cells with
    n >= 2x the EXACT median per-cell count — integer arithmetic only,
    window-function SQL oracle."""
    from ..stages.spacetime import outlier_cells

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    return outlier_cells(ds, cell="cell", factor=2)


def q_domain_stats(sf_dir: str):
    """Per-domain rollup (stages/urls.py): ParseURL (one RE2 pass, the
    same engine as DuckDB's regexp_extract) then count + exact dyadic
    weight sum per host.  Domain space is bounded (curation reality:
    ~1e7 hosts at crawl scale — still summary-sized next to docs), so
    the partials tree-combine; no shuffle."""
    from ..agg import combine_partials
    from ..stages.urls import ParseURL

    ds = pages_dataset(sf_dir)
    ds = ParseURL(keep=("host",)).apply(ds)

    def partial(batch: pa.Table) -> pa.Table:
        g = geo_columns(batch["doc_id"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({
            "host": batch["host"].to_numpy(zero_copy_only=False),
            "w": g["weight"]})
        out = (df.groupby("host", sort=False)
               .agg(n=("w", "size"), sum_w=("w", "sum")).reset_index())
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    out = combine_partials(ds.map_batches(partial, batch_format="pyarrow"),
                           keys=["host"], value_cols=["n", "sum_w"],
                           mode="tree").to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out


BLOCKED_HOSTS = ["site3.example", "site7.example", "site13.example"]


def q_domain_footprint(sf_dir: str):
    """Per-domain geographic footprint: scaled-int (milli-degree)
    centroid and 2D RMS dispersion per host — where on the globe a
    site's pages concentrate and how spread out they are.  Coordinates
    quantize to exact int64 milli-degrees (floor(x*1000 + 0.5) in both
    engines), so all sums are exact and the centroid/dispersion are one
    fixed float chain each — hash-exact.  Host space is summary-sized:
    tree combine, no shuffle."""
    from ..agg import combine_partials
    from ..stages.urls import ParseURL

    ds = pages_dataset(sf_dir)
    ds = ParseURL(keep=("host",)).apply(ds)

    def partial(batch: pa.Table) -> pa.Table:
        g = geo_columns(batch["doc_id"].to_numpy(zero_copy_only=False))
        ok = ~np.isnan(g["lat"])
        la = np.floor(g["lat"][ok] * 1000.0 + 0.5).astype(np.int64)
        lo = np.floor(g["lng"][ok] * 1000.0 + 0.5).astype(np.int64)
        host = np.asarray(batch["host"].to_pylist(), dtype=object)[ok]
        df = pd.DataFrame({"host": host, "la": la, "lo": lo})
        df["qa"] = df["la"] * df["la"]
        df["qo"] = df["lo"] * df["lo"]
        out = (df.groupby("host", sort=False)
               .agg(n=("la", "size"), s_lat=("la", "sum"),
                    q_lat=("qa", "sum"), s_lng=("lo", "sum"),
                    q_lng=("qo", "sum")).reset_index())
        for c in ("n", "s_lat", "q_lat", "s_lng", "q_lng"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["host"], value_cols=["n", "s_lat", "q_lat", "s_lng",
                                   "q_lng"], mode="tree").to_pandas()
    n = agg["n"].to_numpy().astype(np.int64)
    s_lat = agg["s_lat"].to_numpy().astype(np.int64)
    s_lng = agg["s_lng"].to_numpy().astype(np.int64)
    qq = (agg["q_lat"].to_numpy() + agg["q_lng"].to_numpy()).astype(
        np.int64)
    d = (n.astype(np.float64) * qq.astype(np.float64)
         - s_lat.astype(np.float64) * s_lat.astype(np.float64)
         - s_lng.astype(np.float64) * s_lng.astype(np.float64))
    out = pd.DataFrame({
        "host": agg["host"],
        "n": n,
        "lat_c": s_lat.astype(np.float64) / n / 1000.0,
        "lng_c": s_lng.astype(np.float64) / n / 1000.0,
        "disp": np.sqrt(np.maximum(d, 0.0)) / n / 1000.0})
    return out.sort_values("host").reset_index(drop=True)


def q_blocklist(sf_dir: str):
    """Domain blocklist anti-filter (stages/urls.py): parse hosts, drop
    blocked domains via a broadcast is_in — the row-level curation gate
    every crawl pipeline runs first.  Pure fused map chain."""
    from ..stages.urls import BlocklistFilter, ParseURL

    ds = pages_dataset(sf_dir)
    ds = ParseURL(keep=("host",)).apply(ds)
    ds = BlocklistFilter(BLOCKED_HOSTS).apply(ds)
    return ds.select_columns(["doc_id", "host"])


def q_url_canon_groups(sf_dir: str):
    """Canonical-URL grouping via stages/urls.py CanonicalizeURL — the
    Arrow-native RFC-3986-style normalizer (scheme-preserving, default
    ports, gclid/fbclid trackers, '?'-separator repair), i.e. the rules
    url_dedup's pandas normalize_urls does NOT cover.  Five deterministic
    spellings per page group (uppercase-host:443 / leading-utm / trailing-
    gclid+fragment / slash+fbclid) collapse onto two canonical forms; the
    output is per-canonical-group (keeper = min doc_id, n_variants).
    The whole regex chain is RE2 on both sides, hash-exact."""
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    from ..agg import default_partitions
    from ..stages.urls import CanonicalizeURL

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = d - (d % 5)
        host = pd.Series(pid % 20).map(lambda h: f"site{h}.example")
        base = "https://" + host + "/p" + pd.Series(pid).astype(str)
        upper = ("https://" + host.str.upper() + ":443/p"
                 + pd.Series(pid).astype(str))
        ref = "r" + pd.Series(pid % 7).astype(str)
        v = d % 5
        url = np.select(
            [v == 0, v == 1, v == 2, v == 3],
            [base, upper,
             base + "?utm_source=feed&ref=" + ref,
             base + "?ref=" + ref + "&gclid=g" + pd.Series(pid % 11).astype(str)
             + "#frag"],
            default=base + "/?fbclid=x")
        return pa.table({"doc_id": pa.array(d, type=pa.int64()),
                         "url": pa.array(url.astype(object), type=pa.string())})

    ds = docs.map_batches(make, batch_format="pyarrow")
    ds = CanonicalizeURL().apply(ds)
    out = ds.groupby("canon_url", num_partitions=default_partitions(4)).aggregate(
        Min("doc_id", alias_name="keeper"),
        Count(alias_name="n_variants")).to_pandas()
    out["keeper"] = out["keeper"].astype(np.int64)
    out["n_variants"] = out["n_variants"].astype(np.int64)
    return out.sort_values("canon_url").reset_index(drop=True)


def q_snap_segments(sf_dir: str):
    """Snap-to-segment map matching (stages/mapmatch.py): every geo page
    is assigned the nearest admin-boundary edge (the 24 rect-zone edges,
    broadcast) by exact planar point-to-segment distance, with the
    clamped projection parameter and the distance.  One dense [n, 24]
    NumPy broadcast per batch, fused into the read chain; the oracle is
    a cross join + row_number over the identical IEEE expressions."""
    import pyarrow.compute as pc

    from ..fixtures import RECT_ZONES
    from ..stages.mapmatch import SnapToSegments, boundary_segments

    ds = _pages_geo(sf_dir)
    ds = ds.map_batches(
        lambda t: t.filter(pc.invert(pc.is_nan(t["lat"]))),
        batch_format="pyarrow")
    ds = SnapToSegments(boundary_segments(RECT_ZONES)).apply(ds)
    return ds.select_columns(["doc_id", "seg_id", "seg_t", "seg_dist"])


def q_target_encode(sf_dir: str):
    """Leave-one-out target encoding (stages/encode.py): per-l_partkey
    mean of l_quantity excluding the row itself, singleton keys falling
    back to the global leave-one-out mean.  Combiner-shrunken stats
    table + one hash join; quantities are integer-valued so every sum
    and the final quotient are exact IEEE — hash-exact vs SQL."""
    import ray.data as rd

    from ..stages.encode import target_encode

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"])
    out = target_encode(ds, key="l_partkey", target="l_quantity",
                        id_cols=["l_orderkey", "l_linenumber"])
    df = out.to_pandas().drop(columns=["l_quantity"])
    return df.sort_values(["l_orderkey", "l_linenumber"]).reset_index(
        drop=True)


#: robots.txt-style path rules (host, path_prefix, allow) — even hosts
#: get an explicit root allow + a /de disallow, every fourth host carves
#: an allow back out under /de/p1 (longest prefix wins); odd hosts have
#: no rules and exercise the default-allow path.
ROBOTS_RULES = tuple(
    [(f"site{h}.example", "/", True) for h in range(0, 20, 2)]
    + [(f"site{h}.example", "/de", False) for h in range(0, 20, 2)]
    + [(f"site{h}.example", "/de/p1", True) for h in range(0, 20, 4)])


def q_robots_rules(sf_dir: str):
    """Longest-prefix-wins robots rules (stages/crawl.py RobotsRules,
    RFC 9309 most-specific-match semantics): per page, the matched rule
    prefix and the allow verdict, default-allow when the host has no
    matching rule.  Broadcast rule set, one vectorized prefix test per
    rule per batch, no shuffle; the oracle replays it as a prefix join
    + row_number over prefix length."""
    import ray.data as rd

    from ..stages.crawl import RobotsRules
    from ..stages.urls import ParseURL

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])

    def make(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = pd.Series(batch["lang"].to_pylist(), dtype=object)
        url = ("https://site" + pd.Series(d % 20).astype(str)
               + ".example/" + lang + "/p" + pd.Series(d).astype(str))
        return pa.table({"doc_id": pa.array(d, type=pa.int64()),
                         "url": pa.array(url.to_numpy(dtype=object),
                                         type=pa.string())})

    ds = docs.map_batches(make, batch_format="pyarrow")
    ds = ParseURL(keep=("host", "path")).apply(ds)
    ds = RobotsRules(ROBOTS_RULES).apply(ds)
    return ds.select_columns(["doc_id", "rule_prefix", "allowed"])


def q_cusum(sf_dir: str):
    """Per-user CUSUM changepoint (stages/windows.py cusum_changepoints):
    the event position maximizing |n*cumsum - i*total| over the user's
    (ts, event_id)-ordered integer series — the classic Page 1954
    statistic in an all-int64 formulation, zero float arithmetic, exact
    SQL window replay."""
    import ray.data as rd

    from ..stages.windows import cusum_changepoints

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    out = cusum_changepoints(ds).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_quantile_bucket(sf_dir: str):
    """Equal-frequency feature bucketing (stages/quantile.py
    quantile_bucket): quartile buckets of integer-cents l_extendedprice
    via exact type-1 quantile edges broadcast to a stateless digitize
    pass — no corpus sort, ties never split.  Exact int64 end to end."""
    import ray.data as rd

    from ..stages.quantile import quantile_bucket

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice"])
    out = quantile_bucket(ds, col="l_extendedprice", k=4,
                          keep=("l_orderkey", "l_linenumber"), scale=100)
    return out.to_pandas().sort_values(
        ["l_orderkey", "l_linenumber"]).reset_index(drop=True)


def q_crawl_pipeline(sf_dir: str):
    """End-to-end crawl-frontier curation composite under ONE SQL
    oracle: two deterministic messy spellings per page -> canonicalize
    (stages/urls.py CanonicalizeURL) -> robots longest-prefix gate
    (stages/crawl.py RobotsRules) -> domain blocklist -> canonical
    dedupe (min-id keeper) -> politeness round-robin schedule
    (stages/crawl.py crawl_order, k=50).  Every stage is the oracle-
    checked operator the standalone queries use; the composite pins
    their composition."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from ..agg import default_partitions
    from ..stages.crawl import RobotsRules, crawl_order
    from ..stages.urls import BlocklistFilter, CanonicalizeURL, ParseURL

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])

    def make(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = pd.Series(batch["lang"].to_pylist(), dtype=object)
        host = "site" + pd.Series(d % 20).astype(str) + ".example"
        path = "/" + lang + "/p" + pd.Series(d).astype(str)
        base = "https://" + host + path

        def spell(v):
            return np.select(
                [v == 0, v == 1, v == 2, v == 3],
                [base,
                 "https://" + host.str.upper() + ":443" + path,
                 base + "?utm_source=feed",
                 base + "?gclid=g7#frag"],
                default=base + "/?fbclid=x").astype(object)

        ids = np.concatenate([d, d + 10_000_000])
        urls = np.concatenate([spell(d % 5), spell((d + 2) % 5)])
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "url": pa.array(urls, type=pa.string())})

    ds = docs.map_batches(make, batch_format="pyarrow")
    ds = CanonicalizeURL().apply(ds)
    ds = ParseURL(col="canon_url", keep=("host", "path")).apply(ds)
    ds = RobotsRules(ROBOTS_RULES).apply(ds)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["allowed"], 1)),
        batch_format="pyarrow")
    ds = BlocklistFilter(BLOCKED_HOSTS).apply(ds)
    ded = ds.groupby("canon_url", num_partitions=default_partitions(4)) \
        .aggregate(Min("doc_id", alias_name="keeper"))
    ded = ParseURL(col="canon_url", keep=("host",)).apply(ded)

    def prio(batch: pa.Table) -> pa.Table:
        k = batch["keeper"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "prio", pa.array((k * 37) % 101, type=pa.int64()))

    ded = ded.map_batches(prio, batch_format="pyarrow")
    return crawl_order(ded, domain="host", id_col="keeper",
                       priority="prio", k=50)


def q_areal_interp(sf_dir: str):
    """Areal interpolation (stages/raster.py areal_interpolate): per-cell
    page counts apportioned to the rect zones by exact overlap-area
    fraction in integer micro-index units — the gridded-counts answer to
    point-in-polygon when only the grid survives.  Per-cell counts
    shrink to the 64x64 grid before any zone math; zones broadcast."""
    from ..fixtures import RECT_ZONES
    from ..stages.raster import areal_interpolate

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    return areal_interpolate(ds, RECT_ZONES, res=RES)


def q_cluster_cells(sf_dir: str):
    """Grid connected-components clustering (stages/cluster.py): label
    every occupied cell with the minimum cell id of its 8-connected
    component (DBSCAN-style density clusters over tiles).  At res 6 the
    cell space fits the broadcast budget, so the point stream shrinks to
    (cell, count) partials and the labeling is local NumPy min-label
    propagation — zero shuffles; the oracle is a recursive CTE."""
    from ..stages.cluster import cluster_cells

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    return cluster_cells(ds, cell="cell", res=RES, min_count=1)


def q_site_visits(sf_dir: str):
    """Composite reverse-geocode rollup: assign every page to its NEAREST
    site (engine kNN join, k=1, ring path, oracle-exact euclid metric)
    then a weighted per-site visit aggregate — the classic
    'attribute traffic to the closest POI' serving query.  Shape: the
    per-batch kNN map fuses with a per-batch partial aggregate; one
    summary-sized combine (site count is fixture-bounded)."""
    from ..agg import combine_partials

    ds = _pages_geo(sf_dir)
    ds = knn_join(ds, sites_table(), k=1, res=RES, max_ring=6,
                  metric="euclid", brute_force_sites=0)

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "site_id": batch["site_id"].to_numpy(zero_copy_only=False),
            "w": batch["weight"].to_numpy(zero_copy_only=False)})
        out = (df.groupby("site_id", sort=False)
               .agg(n=("w", "size"), sum_w=("w", "sum")).reset_index())
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    out = combine_partials(ds.map_batches(partial, batch_format="pyarrow"),
                           keys=["site_id"], value_cols=["n", "sum_w"],
                           mode="tree").to_pandas()
    out["site_id"] = out["site_id"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


def q_uncompact_roundtrip(sf_dir: str):
    """compact -> uncompact round trip: must reproduce EXACTLY the
    occupied distinct cell set (the oracle is a plain SELECT DISTINCT),
    proving the multi-res cover is exact in both directions."""
    from ..stages.compact_cells import compact_cells, uncompact_cells

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    compacted = compact_cells(ds, cell="cell", res=RES, min_res=RES - 2)
    return uncompact_cells(compacted, res=RES)


def q_tile_pyramid(sf_dir: str):
    """Multi-resolution tile-count pyramid (stages/compact_cells.py):
    per-cell occupancy at res 6/5/4 — one point-level hash combine, then
    cell-table parent rollups."""
    from ..stages.compact_cells import tile_pyramid

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    return tile_pyramid(ds, cell="cell", res=RES, min_res=RES - 2)


def q_pip_join(sf_dir: str):
    ds = _pages_geo(sf_dir)
    ds = pip_join(ds, rect_polygons(), res=RES, mode="inner")
    return ds.select_columns(["doc_id", "poly_id"])


def q_pip_semi(sf_dir: str):
    """Semi join: pages matched by >=1 rectangle zone, once."""
    ds = _pages_geo(sf_dir)
    ds = pip_join(ds, rect_polygons(), res=RES, mode="semi")
    return ds.select_columns(["doc_id"])


def q_pip_anti(sf_dir: str):
    """Anti join: pages matched by no rectangle zone (incl. no-geo rows)."""
    ds = _pages_geo(sf_dir)
    ds = pip_join(ds, rect_polygons(), res=RES, mode="anti")
    return ds.select_columns(["doc_id"])


def q_cell_parent(sf_dir: str):
    """Hierarchical cell rollup: res-6 cells coarsened to res-4 parents,
    counted — the h3 cell_to_parent aggregation path."""
    from ..geo.cells import parent as cell_parent

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES, parent_res=4).apply(ds)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["cell"], 0)),
        batch_format="pyarrow")

    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"parent_cell": batch["cell_r4"].to_numpy(zero_copy_only=False)})
        out = df.groupby("parent_cell", sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # hash mode: at fine resolutions the parent-cell key space scales with
    # the grid — keep the combine a distributed shuffle, never a driver
    # merge.  The query result itself is small; sort on the driver only
    # for deterministic compare output.
    out = combine_partials(parts, ["parent_cell"], ["n"], mode="hash").to_pandas()
    out = out.sort_values("parent_cell").reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out


def q_knn_euclid(sf_dir: str):
    """THE ENGINE kNN join (stages/knn_join.py) under the oracle:
    ``metric="euclid"`` ranks by squared-euclidean-in-degrees — pure
    float64 arithmetic bit-identical in SQL, so the k-ring expansion /
    cell-bucket index / stop-bound machinery itself is what the
    rows+schema+hash compare verifies.  ``brute_force_sites=0`` forces
    the ring path (the small fixture site table would otherwise take the
    whole-batch brute shortcut)."""
    ds = _pages_geo(sf_dir)
    ds = knn_join(ds, sites_table(), k=3, res=RES, max_ring=6,
                  metric="euclid", brute_force_sites=0)
    out = ds.select_columns(["doc_id", "site_id", "rank"])
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("rank"), "rank",
                               t["rank"].cast(pa.int64())),
        batch_format="pyarrow")


def q_knn_haversine(sf_dir: str):
    """The real engine kNN join (k-ring + haversine refinement) under a
    neighbour-rank SQL oracle: the oracle recomputes great-circle
    distances with DuckDB's own trig and ranks with the same site_id
    tie-break.  Only (doc_id, site_id, rank) is compared — rank is
    invariant to the sub-ulp trig differences between numpy's SIMD
    kernels and libm, while still pinning the k-ring path's neighbour
    SETS and ORDER exactly.  Metre values are separately asserted against
    brute force in pytest."""
    ds = _pages_geo(sf_dir)
    ds = knn_join(ds, sites_table(), k=3, res=RES)
    out = ds.select_columns(["doc_id", "site_id", "rank"])
    return out.map_batches(
        lambda t: t.set_column(
            t.column_names.index("rank"), "rank",
            t["rank"].cast(pa.int64())),
        batch_format="pyarrow")


def q_hotspots(sf_dir: str):
    """Hotspot cells (stages/hotspot.py): per-cell counts + ring-1
    neighborhood sums (wrap/clamp semantics) — scatter-groupby, no join."""
    from ..stages.hotspot import hotspot_cells

    ds = _pages_geo(sf_dir)
    out = hotspot_cells(ds, res=RES, ring=1).to_pandas()
    out = out.sort_values("cell").reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    out["nbhd_n"] = out["nbhd_n"].astype(np.int64)
    return out[["cell", "n", "nbhd_n"]]


def q_radius_join(sf_dir: str):
    """Radius (within-distance) join (stages/radius_join.py): every site
    within 15 squared-degrees' root of each page, euclid metric — the
    ring-cover candidate machinery under a bit-exact non-equi SQL oracle."""
    from ..stages.radius_join import radius_join

    ds = _pages_geo(sf_dir)
    out = radius_join(ds, sites_table(), radius=15.0, res=RES,
                      metric="euclid")
    out = out.select_columns(["doc_id", "site_id", "dist"])
    # DuckDB's and NumPy's dx*dx + dy*dy differ by 1-2 ulp (the membership
    # test itself is unaffected at this radius); round for the value hash
    return out.map_batches(
        lambda t: t.set_column(t.column_names.index("dist"), "dist",
                               pa.compute.round(t["dist"], 6)),
        batch_format="pyarrow")


def q_cell_top_quality(sf_dir: str):
    """Best document per occupied cell (geo x curation crossover):
    group_topk keyed on the res-6 cell ordered by extracted text length
    (the quality proxy), ties to the larger doc_id — the 'one
    representative page per tile' selection step.  Shuffle volume is
    O(cells x blocks), never the corpus."""
    from ..stages import CellEncode
    from ..stages.sample import group_topk

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["cell"], 0))
        .append_column("n_chars", pa.compute.utf8_length(
            t.filter(pa.compute.greater_equal(t["cell"], 0))["text"])
            .cast(pa.int64())),
        batch_format="pyarrow")
    out = group_topk(ds, group="cell", order_by="n_chars", k=1,
                     tie_break="doc_id",
                     cols=["doc_id"]).to_pandas()
    out = out[["cell", "doc_id", "n_chars"]].astype(
        {"cell": np.int64, "doc_id": np.int64, "n_chars": np.int64})
    return out.sort_values("cell").reset_index(drop=True)


def q_user_entropy(sf_dir: str):
    """Per-user mobility predictability: Shannon entropy of each
    user's visited-cell distribution on the synthetic 8x8 event grid
    (Song et al. 2010 predictability literature) — grouped_entropy
    keyed on the user instead of the cell; same exact-count machinery
    and rounding contract as `cell_entropy`."""
    from ..stages.stats import grouped_entropy

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id"])

    def cellify(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 2654435761) % 1024
        y = (eid * 40503 + 12345) % 1024
        return pa.table({
            "user_id": batch["user_id"],
            "cell": pa.array((x // 128) * 8 + y // 128, type=pa.int64()),
        })

    out = grouped_entropy(ds.map_batches(cellify, batch_format="pyarrow"),
                          group="user_id", label="cell")
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    out["entropy"] = out["entropy"].round(6)  # same hash contract as
    return out.sort_values("user_id").reset_index(drop=True)  # cell_entropy


def q_cell_mixture(sf_dir: str):
    """Spatially stratified rebalancing (geo x curation crossover):
    cap every res-6 cell at ~5 pages via mixture_sample on the cell
    key — hot cells downsample, sparse cells pass through; the corpus
    streams once and never shuffles (only (cell,1) count pairs do)."""
    from ..stages import CellEncode
    from ..stages.sample import mixture_sample

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["cell"], 0)),
        batch_format="pyarrow")
    out = mixture_sample(ds, group_col="cell", cap=5,
                         id_col="doc_id").to_pandas()
    return (out[["doc_id", "cell"]]
            .sort_values("doc_id").reset_index(drop=True))


def q_grid_bfs(sf_dir: str):
    """Isochrone BFS (stages/griddist.py grid_bfs_distance): hop
    distance from the nearest site-occupied cell through occupied
    page-cells only (gaps block paths — genuine graph BFS, not
    Chebyshev distance).  Oracle: recursive min-reachability CTE over
    the same adjacency, capped at 6 hops."""
    from ..fixtures import sites_table
    from ..geo.cells import cell_id
    from ..stages.griddist import grid_bfs_distance

    sites = sites_table()
    seed = np.unique(cell_id(sites["lat"].to_numpy(),
                             sites["lng"].to_numpy(), RES - 2))
    ds = _pages_geo(sf_dir)
    # res 4 (16x16): dense enough occupancy for multi-hop paths
    return grid_bfs_distance(ds, seed, res=RES - 2, max_dist=6)


def q_grid_dijkstra(sf_dir: str):
    """Congestion-weighted isochrone (stages/griddist.py
    grid_dijkstra_distance): minimum total enter-cost from the nearest
    site-occupied cell through occupied page-cells, dense cells
    (>= 4 pages) costing 2 — Bellman-Ford shifted-min sweeps on the
    bounded driver grid, exact integers.  Oracle: cost-bounded
    recursive min-reachability CTE over the identical adjacency."""
    from ..fixtures import sites_table
    from ..geo.cells import cell_id
    from ..stages.griddist import grid_dijkstra_distance

    sites = sites_table()
    seed = np.unique(cell_id(sites["lat"].to_numpy(),
                             sites["lng"].to_numpy(), RES - 2))
    ds = _pages_geo(sf_dir)
    return grid_dijkstra_distance(ds, seed, res=RES - 2,
                                  dense_threshold=4, max_cost=8)


def q_bot_scores(sf_dir: str):
    """Bot-likeness per user (stages/bots.py): high event volume +
    unnaturally regular inter-arrival gaps (cv² < 0.1 via exact integer
    cross-multiplication — no floats anywhere).  One slim hash shuffle;
    SQL window replay is bit-exact."""
    import ray.data as rd

    from ..stages.bots import bot_scores

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    out = bot_scores(ds, rate_threshold=50).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_radius_of_gyration(sf_dir: str):
    """Per-user radius of gyration on the synthetic 1024-grid positions
    (stages/trajectory.py radius_of_gyration): exact int64 moment
    numerator + sqrt/n, hash-exact vs the moment SQL."""
    from ..stages.trajectory import radius_of_gyration

    out = radius_of_gyration(_xy_events(sf_dir)).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_incremental_dedup(sf_dir: str):
    """Incremental dedup lifecycle (stages/dedup.py build_dedup_index +
    incremental_dedup): index the even-id half of the corpus (with
    planted cross-half duplicate payloads for ids % 5 == 3), then dedup
    the odd-id increment against index + itself.  Oracle: NOT IN SQL
    over the same sha256 hashes."""
    import tempfile

    import ray.data as rd

    from ..stages.dedup import build_dedup_index, incremental_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def planted(parity: int):
        def fn(batch: pa.Table) -> pa.Table:
            d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            keep = (d % 2) == parity
            d = d[keep]
            texts = [t for t, k in zip(batch["text"].to_pylist(), keep)
                     if k]
            t2 = [f"dup-{i % 7}" if i % 5 == 3 else t
                  for i, t in zip(d.tolist(), texts)]
            return pa.table({"doc_id": pa.array(d, type=pa.int64()),
                             "text": pa.array(t2, type=pa.string())})
        return fn

    idx = tempfile.mkdtemp(prefix="dedup_index_", dir="/tmp")
    build_dedup_index(ds.map_batches(planted(0), batch_format="pyarrow"),
                      idx, run_id="base")
    out = incremental_dedup(
        ds.map_batches(planted(1), batch_format="pyarrow"), idx,
        run_id="inc1").to_pandas()
    return (out[["doc_id", "_content_hash"]]
            .rename(columns={"_content_hash": "content_hash"})
            .sort_values("doc_id").reset_index(drop=True))


def q_geo_composite(sf_dir: str):
    """End-to-end geospatial insight pipeline under ONE SQL oracle:
    cell encode -> Gi* hotspot z-scores -> top-3 hottest cells
    (gi_star DESC, cell — float ranking is safe because both sides
    compute bit-identical gi values) -> each expanded to its queen
    ring (the fence cover) -> per-fence-cell page count and site
    count.  Composes gi_star + ring cover + broadcast site lookup."""
    from ..fixtures import sites_table
    from ..geo.cells import cell_id, k_ring
    from ..stages.hotspot import gi_star

    ds = _pages_geo(sf_dir)
    gi = gi_star(ds, res=RES, ring=1).to_pandas()
    top = gi.sort_values(["gi_star", "cell"],
                         ascending=[False, True]).head(3)
    fence = np.unique(np.concatenate(
        [k_ring(int(c), RES, 1) for c in top["cell"]]))

    # per-fence-cell page counts: one streaming filtered partial pass
    import ray

    fence_ref = ray.put(fence)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lng = batch["lng"].to_numpy(zero_copy_only=False)
        cells = cell_id(lat, lng, RES)
        cells = cells[np.isin(cells, ray.get(fence_ref))]
        u, c = np.unique(cells, return_counts=True)
        return pa.table({"cell": pa.array(u, type=pa.int64()),
                         "n": pa.array(c.astype(np.int64))})

    from ..agg import combine_partials

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["cell"], value_cols=["n"], mode="tree").to_pandas()

    sites = sites_table()
    scell = cell_id(sites["lat"].to_numpy(), sites["lng"].to_numpy(), RES)
    svals, scnt = np.unique(scell[np.isin(scell, fence)],
                            return_counts=True)
    smap = dict(zip(svals.tolist(), scnt.tolist()))
    nmap = dict(zip(counts["cell"].astype(int), counts["n"].astype(int)))
    return pd.DataFrame({
        "cell": pd.Series(fence, dtype="int64"),
        "n_pages": pd.Series([nmap.get(int(c), 0) for c in fence],
                             dtype="int64"),
        "n_sites": pd.Series([smap.get(int(c), 0) for c in fence],
                             dtype="int64"),
    })


def q_compression_ratio(sf_dir: str):
    """zlib compression-ratio quality signal over extracted page text
    (stages/text.py compression_ratio): pure per-batch map, zero
    shuffles.  DEFLATE is not SQL-expressible -> rows-only driver
    check; pytest pins a direct recompute."""
    from ..stages.text import compression_ratio

    ds = pages_dataset(sf_dir)
    from ..stages import ExtractText

    ds = ExtractText.apply(ds)
    out = compression_ratio(ds).to_pandas()
    return (out[["doc_id", "raw_len", "comp_len", "ratio"]]
            .sort_values("doc_id").reset_index(drop=True))


def q_gi_star(sf_dir: str):
    """Getis-Ord Gi* hotspot z-scores per occupied res-6 cell
    (stages/hotspot.py gi_star): exact int numerators + one fixed float
    chain, hash-exact vs the offsets-join SQL."""
    from ..stages.hotspot import gi_star

    ds = _pages_geo(sf_dir)
    out = gi_star(ds, res=RES, ring=1).to_pandas()
    return out.sort_values("cell").reset_index(drop=True)


def q_emerging_hotspots(sf_dir: str):
    """Emerging space-time hotspots (stages/hotspot.py
    emerging_hotspots): Gi* per 4h bucket, hot at z >= 1.96, integer
    taxonomy per cell (0 none / 1 new / 2 persistent / 3 intensifying /
    4 former).  The z chain is the gi_star fixed float chain per bucket,
    so the SQL replay hashes bit-exactly."""
    from ..stages.hotspot import emerging_hotspots

    ds = _pages_geo(sf_dir)
    out = emerging_hotspots(ds, res=RES, ring=1).to_pandas()
    out = out.astype({c: np.int64 for c in out.columns})
    return out.sort_values("cell").reset_index(drop=True)


def q_k_anonymity(sf_dir: str):
    """k-anonymity audit over the (cell, lang) quasi-identifier pair:
    groups with fewer than k=4 members — each row in one is
    re-identifiable by its tile + language alone (the privacy gate a
    geo-tagged crawl needs before release).  One (cell, lang) hash
    combine + a filter; rows never shuffle."""
    from ..agg import combine_partials
    from ..stages import CellEncode

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)

    def partial(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        ok = cells >= 0
        df = pd.DataFrame({"cell": cells[ok], "lang": lang[ok]})
        out = (df.groupby(["cell", "lang"], as_index=False).size()
               .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["cell", "lang"], value_cols=["n"], mode="hash")
    out = counts.map_batches(
        lambda t: t.filter(pa.compute.less(t["n"], 4)),
        batch_format="pyarrow").to_pandas()
    return out.sort_values(["cell", "lang"]).reset_index(drop=True)


def q_k_anon_generalize(sf_dir: str):
    """k-anonymity enforcement by spatial generalization: docs whose
    (cell, lang) group has fewer than k=4 members get their cell
    coarsened to the res-4 parent tile (16x coarser), everyone else
    keeps the fine cell.  The small-group set is budget-guarded and
    broadcast (ray.put once); the doc stream re-maps in ONE streaming
    pass — no row shuffle.  Output (doc_id, cell_out, generalized)."""
    import ray

    from ..agg import combine_partials
    from ..geo.cells import parent
    from ..stages import CellEncode

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds).materialize()

    def cpart(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        ok = cells >= 0
        df = pd.DataFrame({"cell": cells[ok], "lang": lang[ok]})
        out = (df.groupby(["cell", "lang"], as_index=False).size()
               .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = combine_partials(
        ds.map_batches(cpart, batch_format="pyarrow"),
        keys=["cell", "lang"], value_cols=["n"], mode="hash")
    small = counts.map_batches(
        lambda t: t.filter(pa.compute.less(t["n"], 4)),
        batch_format="pyarrow").materialize()
    if small.count() > 2_000_000:
        raise ValueError("k_anon_generalize: small-group set exceeds the "
                         "broadcast budget — generalize at a coarser "
                         "starting resolution instead")
    sm = small.to_pandas()
    # integer composite key: langs are a handful, so a broadcast code
    # map turns (cell, lang) membership into one sorted-array search
    langs = sorted(set(sm["lang"])) or [""]
    code = {l: i for i, l in enumerate(langs)}
    k_langs = len(langs)
    sm_keys = np.sort(
        sm["cell"].to_numpy().astype(np.int64) * k_langs
        + sm["lang"].map(code).to_numpy().astype(np.int64))
    key_ref = ray.put(sm_keys)

    def remap(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        lang = np.asarray(batch["lang"].to_pylist(), dtype=object)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        ok = cells >= 0
        cells, lang, ids = cells[ok], lang[ok], ids[ok]
        cd = np.fromiter((code.get(x, -1) for x in lang),
                         dtype=np.int64, count=len(lang))
        key = cells.astype(np.int64) * k_langs + cd
        sml = ray.get(key_ref)
        pos = np.searchsorted(sml, key)
        inb = pos < sml.size
        gen = (cd >= 0) & inb
        gen[gen] = sml[pos[gen]] == key[gen]
        par = parent(cells, RES, RES - 2)
        out_cell = np.where(gen, par, cells)
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "cell_out": pa.array(out_cell.astype(np.int64)),
            "generalized": pa.array(gen.astype(np.int64))})

    out = ds.map_batches(remap, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_quadtree(sf_dir: str):
    """Adaptive quadtree tiling (stages/compact_cells.py
    quadtree_leaves): cells holding more than 24 points split into
    occupied children from res 2 down to res 6 — variable-resolution
    cover, dense cities deep.  Split sets (bounded by points/threshold)
    are the only driver pulls; leaves stream.  Oracle: per-level CTE
    chain with the identical integer parent mapping."""
    from ..stages import CellEncode
    from ..stages.compact_cells import quadtree_leaves

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    out = quadtree_leaves(ds, res=RES, min_res=2,
                          threshold=24).to_pandas()
    return out.sort_values(["res", "cell"]).reset_index(drop=True)


def q_cell_terms(sf_dir: str):
    """Per-tile vocabulary signature (stages/text.py cell_terms): top-3
    terms per occupied cell by count, ties token-ascending.  Vectorized
    explode shrinks to (cell, tok) partials in-task; the two-phase
    top-k bounds the final shuffle to O(cells x k per block)."""
    from ..stages import CellEncode
    from ..stages.text import cell_terms

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    out = cell_terms(ds, k=3).to_pandas()
    out = out[["cell", "tok", "n", "rank"]]
    return out.sort_values(["cell", "rank"]).reset_index(drop=True)


def q_lang_frontier(sf_dir: str):
    """Language-frontier cells (stages/frontier.py language_frontiers):
    occupied cells whose dominant page language differs from the ring
    neighborhood's dominant — argmaxes computed with native Max over a
    (count, tie-break) score encoding, no per-group Python.  Oracle:
    row_number argmax with the identical (n DESC, lang) tie-break."""
    from ..stages.frontier import language_frontiers

    ds = _pages_geo(sf_dir)
    out = language_frontiers(ds, res=RES, ring=1).to_pandas()
    return out.sort_values("cell").reset_index(drop=True)


def q_dbscan(sf_dir: str):
    """Grid DBSCAN (stages/dbscan.py dbscan_cells): density clustering
    with core/border/noise roles — core cells have >= min_pts points in
    their 3x3 wrap/clamp neighborhood, clusters are min-label connected
    components of core cells, borders attach to the min adjacent core
    cluster.  Oracle = recursive-CTE components over the same adjacency."""
    from ..stages.dbscan import dbscan_cells

    ds = _pages_geo(sf_dir)
    out = dbscan_cells(ds, res=RES, min_pts=4).to_pandas()
    return out.sort_values("cell").reset_index(drop=True)


def q_fuzzy_join(sf_dir: str):
    """Typo-tolerant fuzzy value join (stages/fuzzy.py fuzzy_pairs_d1):
    part names vs deterministically perturbed part names (delete /
    substitute-one-char by partkey arithmetic, replayed verbatim in
    SQL).  Deletion-neighborhood blocking + exact <=1 verify; oracle =
    the brute levenshtein cross join."""
    from ..stages.fuzzy import fuzzy_pairs_d1

    import ray.data as rd

    left = rd.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"]) \
        .map_batches(lambda t: t.rename_columns(["name"]),
                     batch_format="pyarrow")

    def perturb(batch: pa.Table) -> pa.Table:
        ks = batch["p_partkey"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        names = batch["p_name"].to_pylist()
        out = []
        for k, nm in zip(ks.tolist(), names):
            pos = k % len(nm)          # 0-based here; SQL uses pos+1
            if k % 3 == 0:
                out.append(nm[:pos] + nm[pos + 1:])
            elif k % 3 == 1:
                out.append(nm[:pos] + "q" + nm[pos + 1:])
            else:
                out.append(nm)
        return pa.table({"name": pa.array(out, type=pa.string())})

    right = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_name"]) \
        .map_batches(perturb, batch_format="pyarrow")
    out = fuzzy_pairs_d1(left, right, col="name").to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["name_a", "name_b", "dist"])
    return out.sort_values(["name_a", "name_b"]).reset_index(drop=True)


def q_approx_quantiles(sf_dir: str):
    """Deterministic mergeable-summary quantiles of the CONTINUOUS
    event value column (stages/quantile.py approx_quantiles): k
    weighted order statistics per block, driver read-off, rank error
    <= n/k.  Approximate by design -> rows-only driver check; the
    error bound is pytest-pinned against exact quantiles."""
    from ..stages.quantile import approx_quantiles

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return approx_quantiles(ds, "value", qs=[0.1, 0.25, 0.5, 0.75, 0.9],
                            k_per_block=1024)


def q_link_components(sf_dir: str):
    """Connected components of the domain link graph
    (stages/linkgraph.py link_components): min-label propagation over
    domain-hash ids (node-keyed joins, never the pair), canonical
    min-domain labels.  Oracle: recursive min-reachability CTE."""
    from ..stages.linkgraph import link_components

    return link_components(pages_dataset(sf_dir))


def q_knn_graph(sf_dir: str):
    """Radius-capped kNN self-graph over pages (stages/knn_graph.py):
    home/probe cell co-location (the corpus is never broadcast), one
    cell shuffle, exact within the 10-degree cap.  Oracle: self-join +
    row_number SQL."""
    from ..stages.knn_graph import knn_graph

    ds = _pages_geo(sf_dir)
    out = knn_graph(ds, k=3, radius=10.0, res=RES).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["id", "nbr_id", "dist", "rank"])
    out["dist"] = out["dist"].round(6)
    return out.sort_values(["id", "rank"]).reset_index(drop=True)


def q_radius_anti(sf_dir: str):
    """Coverage gaps (stages/radius_join.py radius_anti): pages with NO
    site within 15 degrees — broadcast sites, per-batch vectorized
    min-distance filter, zero shuffles.  Oracle: NOT EXISTS SQL."""
    from ..fixtures import sites_table
    from ..stages.radius_join import radius_anti

    ds = _pages_geo(sf_dir)
    out = radius_anti(ds, sites_table(), radius=15.0, metric="euclid")
    return out.select_columns(["doc_id", "lat", "lng"])


def q_time_autocorr(sf_dir: str):
    """Lag-1 day-over-day autocorrelation of the event-count series
    (stages/spacetime.py time_autocorr): six exact int64 moments over
    the ZERO-densified daily series + the grouped_corr float closed
    form — hash-exact vs a generate_series + lag window SQL."""
    from ..stages.spacetime import time_autocorr

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts"])
    return time_autocorr(ds, bucket_us=86_400_000_000, lag=1)


def q_zonal(sf_dir: str):
    from ..stages import ZonalAggregate

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["cell"], 0)),
        batch_format="pyarrow")
    z = ZonalAggregate("zonal", keys=["cell"], weights={"weight": "weight"},
                       salt_buckets=8)
    out = z.aggregate(ds).to_pandas()
    out = out.rename(columns={"sumw_weight": "sumw", "sumw2_weight": "sumw2"})
    out["n"] = out["n"].astype(np.int64)
    return out[["cell", "n", "sumw", "sumw2"]]


def q_topk_cells(sf_dir: str):
    df = q_zonal(sf_dir)
    out = df.sort_values(["n", "cell"], ascending=[False, True]).head(10)
    return out[["cell", "n"]].reset_index(drop=True)


CUTFLOW_SELECTION = {"All": ["lang == 'en'", {"Any": ["lat > 0.0", "lng < 0.0"]}]}


def q_cutflow(sf_dir: str):
    ds = _pages_geo(sf_dir)
    cf = CutFlow("cutflow", CUTFLOW_SELECTION, weights="weight", is_mc=True)
    out = cf.cutflow(ds).to_pandas()
    for c in ("passed_only_cut", "passed_incl", "totals_incl"):
        out[c] = out[c].astype(np.int64)
    out["depth"] = out["depth"].astype(np.int64)
    cols = ["unique_id", "depth", "cut", "passed_only_cut", "passed_only_cut_weight",
            "passed_incl", "passed_incl_weight", "totals_incl", "totals_incl_weight"]
    return out[cols].sort_values("unique_id").reset_index(drop=True)


def q_select_phasespace(sf_dir: str):
    ds = _pages_geo(sf_dir)
    sps = SelectPhaseSpace("region", "(lang == 'en') & (lat > 0.0)",
                           region_name="region_en_north", weights=None)
    out = ds.map_batches(sps, batch_format="pyarrow")
    return out.select_columns(["doc_id", "region_en_north"])


def q_define_events(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    d = Define("derive", [
        {"v2": "value * 2.0 + 1.0"},
        {"rv": "sqrt(value * value)"},
    ])
    ds = d.apply(ds)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.equal(t["event_type"], "click")),
        batch_format="pyarrow")
    return ds.select_columns(["event_id", "v2", "rv"])


def q_systematic_weights(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_discount", "l_tax"])
    sw = SystematicWeights("sysw", {
        "disc": {"nominal": "1.0 - l_discount", "up": "1.0 - l_discount * 0.5"},
        "tax": "1.0 + l_tax",
    }, is_mc=True)
    ds = sw.apply(ds)
    return ds.select_columns(
        ["l_orderkey", "l_linenumber", "weight_nominal", "weight_disc_up"])


def q_binned_lineitem(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"])
    hist = BinnedDataframe("hist", [
        {"in": "l_returnflag"},
        {"in": "l_quantity", "out": "qty_bin",
         "bins": {"edges": [0.0, 10.0, 20.0, 30.0, 40.0, 50.0]}},
    ], weights={"w": "l_discount"})
    out = hist.aggregate(ds).to_pandas()
    out = out.rename(columns={"sumw_w": "sumw", "sumw2_w": "sumw2"})
    out["n"] = out["n"].astype(np.int64)
    out["qty_bin"] = out["qty_bin"].astype(np.int64)
    # non-dyadic float sums: round identically on both sides (1e-6)
    out["sumw"] = out["sumw"].round(6)
    out["sumw2"] = out["sumw2"].round(6)
    return out[["l_returnflag", "qty_bin", "n", "sumw", "sumw2"]]


def q_skim(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"])
    skim = EventByEventDataframe(
        "skim", ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
        mask="l_quantity > 45.0")
    return skim.apply(ds)


def q_window_agg(sf_dir: str):
    """Stream-shaped tumbling-window aggregate over the events table:
    (user_id, hour window) -> count + sum(value).  Integer microsecond
    floor-division keeps the window id exact on both sides."""
    import ray.data as rd

    from ..agg import combine_partials

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "win": us // 3_600_000_000,
            "value": batch["value"].to_numpy(zero_copy_only=False),
        })
        out = df.groupby(["user_id", "win"], sort=False).agg(
            n=("value", "size"), sum_value=("value", "sum")).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # (user_id x window) cardinality GROWS WITH THE DATA — this must be the
    # distributed hash-shuffle combine, never the tree/driver merge (at
    # 100 TB the driver merge is an OOM).  Sorting below is driver-side
    # presentation of the (small at this sf) compare output only.
    out = combine_partials(parts, ["user_id", "win"], ["n", "sum_value"],
                           mode="hash").to_pandas()
    out = out.sort_values(["user_id", "win"]).reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    out["sum_value"] = out["sum_value"].round(6)
    return out[["user_id", "win", "n", "sum_value"]]


def q_lookup_join(sf_dir: str):
    """Broadcast dimension join: orders x customer (small side broadcast,
    probe side streams; no shuffle)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.joins import lookup_join

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "c_custkey", "o_totalprice"]),
        batch_format="pyarrow")
    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
    out = lookup_join(orders, customer, key="c_custkey", how="inner")
    return out.select_columns(["o_orderkey", "c_custkey", "o_totalprice",
                               "c_mktsegment"])


def _semi_anti_inputs(sf_dir: str):
    import pyarrow.parquet as pq
    import ray.data as rd

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    orders = orders.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "c_custkey"]),
        batch_format="pyarrow")
    customer = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_acctbal"])
    rich = customer.filter(pa.compute.greater(customer["c_acctbal"], 5000.0))
    return orders, rich.select(["c_custkey"])


def q_lookup_semi(sf_dir: str):
    """Broadcast SEMI join (lookup_join how='semi' — Arrow's left-semi
    kernel): orders whose customer has acctbal > 5000."""
    from ..stages.joins import lookup_join

    orders, rich = _semi_anti_inputs(sf_dir)
    return lookup_join(orders, rich, key="c_custkey", how="semi")


def q_lookup_anti(sf_dir: str):
    """Broadcast ANTI join (lookup_join how='anti'): orders whose
    customer does NOT have acctbal > 5000."""
    from ..stages.joins import lookup_join

    orders, rich = _semi_anti_inputs(sf_dir)
    return lookup_join(orders, rich, key="c_custkey", how="anti")


def q_hash_join(sf_dir: str):
    """Large x large hash-partitioned join: lineitem x orders, then a
    grouped revenue rollup per order priority."""
    import ray.data as rd

    from ..agg import combine_partials
    from ..stages.joins import hash_join

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])
    lineitem = lineitem.map_batches(
        lambda t: t.rename_columns(["o_orderkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    joined = hash_join(lineitem, orders, key="o_orderkey", num_partitions=4)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        out = df.groupby("o_orderpriority", sort=False).agg(
            n=("revenue", "size"), revenue=("revenue", "sum")).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = joined.map_batches(partial, batch_format="pyarrow")
    out = combine_partials(parts, ["o_orderpriority"], ["n", "revenue"],
                           mode="tree").to_pandas()
    out["n"] = out["n"].astype(np.int64)
    out["revenue"] = out["revenue"].round(4)
    return out


def q_dedup_exact(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # num_partitions bounds shuffle task count (per-block scheduling
    # overhead dominates at this input size; at 100 TB it scales with data)
    out = ExactDedup("dedup", key="text", id_col="doc_id").survivors(
        ds, num_partitions=8)
    return out.select_columns(["doc_id"])


def q_distinct_lang(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Min

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    out = ds.groupby("lang").aggregate(
        Min("doc_id", alias_name="first_doc"), Count(alias_name="n")).to_pandas()
    out["first_doc"] = out["first_doc"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out[["lang", "first_doc", "n"]]


def q_text_clean(sf_dir: str):
    """Unicode text normalization (stages/text.py TextClean): NFC +
    control-strip + whitespace collapse + trim over a deterministically
    dirtied corpus (combining accent, C0 controls, tab runs appended per
    doc — both engines construct the identical mess).  Oracle: DuckDB
    nfc_normalize + the same two RE2 char-class replaces."""
    import ray.data as rd

    from ..stages.text import TextClean

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def dirty(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        messy = [t + " \t\t" + "e" + chr(769) + "clair" + chr(1 + int(i) % 8)
                 for i, t in zip(d, texts)]
        return pa.table({"doc_id": batch["doc_id"],
                         "text": pa.array(messy, type=pa.string())})

    out = TextClean().apply(ds.map_batches(dirty, batch_format="pyarrow"))

    def lengths(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "text_clean": batch["text_clean"],
            "orig_len": batch["text"].str.len().astype(np.int64),
            "clean_len": batch["text_clean"].str.len().astype(np.int64),
        })

    return out.map_batches(lengths, batch_format="pandas")


def q_chunk_docs(sf_dir: str):
    """RAG-style chunking (stages/text.py chunk_documents): 64-token
    windows, stride 48, whitespace-normalized chunk text.  Oracle:
    list-slice + array_to_string replay of the same RE2 token stream."""
    import ray.data as rd

    from ..stages.text import chunk_documents

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return chunk_documents(ds, chunk_tokens=64, stride=48)


def q_bbox_query(sf_dir: str):
    """Read-pruned bounding-box query over a cell-prefix-partitioned
    layout (stages/spatial_index.py — the IVF fragment-pruning story for
    the spatial axis).  Builds the hive layout under /tmp, queries a
    mid-latitude box, ASSERTS strictly fewer parquet files were read than
    the layout holds, and returns the exact row set.  Oracle: the plain
    SQL bbox filter over the same geo base."""
    import tempfile

    from ..stages.spatial_index import bbox_query, build_spatial_index

    ds = _pages_geo(sf_dir).select_columns(["doc_id", "lat", "lng"])
    with tempfile.TemporaryDirectory(prefix="spatial_idx_") as d:
        build_spatial_index(ds, d, prefix_res=2)
        out, stats = bbox_query(d, lat0=-10.0, lat1=60.0,
                                lng0=-120.0, lng1=40.0, prefix_res=2,
                                columns=["doc_id", "lat", "lng"])
        assert stats["files_read"] < stats["files_total"], stats
        df = out.to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def q_time_range(sf_dir: str):
    """Read-pruned time-range query over a day-partitioned layout
    (stages/spatial_index.py build_time_index/time_range_query — the
    crawl-snapshot pruning story).  Builds the hive layout under /tmp,
    queries [2024-01-10, 2024-01-20), ASSERTS fragment pruning, returns
    the exact row set.  Oracle: a plain SQL timestamp-range filter."""
    import tempfile

    import ray.data as rd

    from ..stages.spatial_index import build_time_index, time_range_query

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])
    ts0 = 1_704_844_800_000_000  # 2024-01-10T00:00:00Z in us
    ts1 = 1_705_708_800_000_000  # 2024-01-20T00:00:00Z
    with tempfile.TemporaryDirectory(prefix="time_idx_") as d:
        build_time_index(ds, d)
        out, stats = time_range_query(
            d, ts0, ts1, columns=["event_id", "user_id", "ts", "value"])
        assert stats["files_read"] < stats["files_total"], stats
        df = out.to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


def q_rag_retrieve(sf_dir: str):
    """RAG retrieval composite (stages/rag.py): chunk_documents (32-token
    windows) -> hashed bag-of-words chunk vectors (dim=64 sha256 buckets)
    -> broadcast query matrix -> int64 dot-product top-3 per query.
    Queries are tokens [3..8] of every doc_id % 100 == 0 doc.  Oracle:
    bucket-join + sum(nq*nc) + row_number replay, hash-exact (the dot is
    exact int64 end to end)."""
    import ray.data as rd

    from ..stages.rag import hashed_chunk_retrieval
    from ..stages.text import chunk_documents

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    qdf = (docs.map_batches(
        lambda t: t.filter(pa.array(
            t["doc_id"].to_numpy(zero_copy_only=False) % 100 == 0)),
        batch_format="pyarrow").to_pandas()
        .sort_values("doc_id").reset_index(drop=True))
    qdf["query_text"] = [" ".join((t or "").split()[2:8])
                         for t in qdf["text"]]
    qdf = qdf.rename(columns={"doc_id": "query_id"})[
        ["query_id", "query_text"]]
    chunks = chunk_documents(docs, chunk_tokens=32, stride=32)
    out = hashed_chunk_retrieval(chunks, qdf, dim=64, k=3)
    out["rank"] = out["rank"].astype(np.int64)
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_winnow_fp(sf_dir: str):
    """MOSS winnowing fingerprints (stages/winnow.py, Schleimer et al.
    2003): k=3-gram sha256-prefix rolling hashes, window w=4, per-window
    minimum with the rightmost tie-break, distinct selected positions.
    Oracle: the same fold in HUGEINT arithmetic + a min-over-frame window
    and a correlated rightmost-argmin read-off, hash-exact."""
    import ray.data as rd

    from ..stages.winnow import winnow_fingerprints

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    return winnow_fingerprints(ds, k=3, w=4)


def q_winnow_pairs(sf_dir: str):
    """Winnowing plagiarism candidates (stages/winnow.py winnow_pairs):
    docs sharing >= 2 distinct selected fingerprints, over a corpus where
    every 10th doc gets a shifted copy (distinct prefix, shared body) —
    the copies MUST pair.  Oracle: the winnow_fp CTE self-joined on the
    gram, hash-exact."""
    import ray.data as rd

    from ..stages.winnow import winnow_pairs

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def add_copies(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        keep = d % 10 == 0
        extra = pa.table({
            "doc_id": pa.array(d[keep] + 10_000_000, type=pa.int64()),
            "text": pa.array([f"shifted prefix {int(i)} " + t
                              for i, t in zip(d[keep],
                                              np.asarray(texts,
                                                         dtype=object)[keep])],
                             type=pa.string()),
        })
        return pa.concat_tables([batch.select(["doc_id", "text"]), extra])

    corpus = docs.map_batches(add_copies, batch_format="pyarrow")
    out = winnow_pairs(corpus, min_shared=2).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_strip_boilerplate(sf_dir: str):
    """Per-domain boilerplate line removal (stages/boilerplate.py,
    CCNet/Dolma-style): a 3-line page is synthesized per doc (NAV header
    + unique content line + COPY footer, domain = doc_id%20); the NAV and
    COPY lines appear in every doc of their domain and are stripped, the
    content line survives.  Oracle: UNION-ALL line table + distinct-doc
    counts + string_agg reassembly, hash-exact."""
    import ray.data as rd

    from ..stages.boilerplate import strip_boilerplate

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def dirty(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch["text"].to_pylist()
        doms = [f"site{int(i) % 20}" for i in d]
        pages = [f"NAV {dom}\nDOC {int(i)} {t[:40]}\nCOPY {dom}"
                 for i, dom, t in zip(d, doms, texts)]
        return pa.table({
            "doc_id": batch["doc_id"],
            "domain": pa.array(doms, type=pa.string()),
            "text": pa.array(pages, type=pa.string()),
        })

    pages = ds.map_batches(dirty, batch_format="pyarrow")
    out = strip_boilerplate(pages, min_docs=3, min_frac=0.5)
    return out.select_columns(["doc_id", "text_clean", "n_lines",
                               "n_removed"])


def q_audio_features(sf_dir: str):
    """REAL audio decode through the actor-pool stage: a deterministic
    160-sample 8 kHz 16-bit PCM WAV is synthesized per doc (sample j =
    ``(doc_id*31 + j*17) % 4096 - 2048``), decoded by the pure-NumPy
    RIFF parser (stages/multimodal.py decode_wav), decimated to 4 kHz
    (factor 2) and windowed into 8 exact int64 sum-of-squares energies —
    all SQL-replayable."""
    import ray.data as rd

    from ..stages.multimodal import AudioResample, encode_wav

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.arange(160, dtype=np.int64)
        vals = ((d[:, None] * 31 + j[None, :] * 17) % 4096 - 2048)
        payloads = [encode_wav(v.astype(np.int16), 8000) for v in vals]
        return pa.table({
            "media_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.binary()),
        })

    media = ds.map_batches(to_media, batch_format="pyarrow")
    feats = AudioResample.apply(media, target_hz=4000)

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        nw = AudioResample.N_WINDOWS
        e = np.asarray([list(w) for w in batch["window_energy"].to_pylist()],
                       dtype=np.int64).reshape(-1)
        return pa.table({
            "media_id": pa.array(np.repeat(ids, nw), type=pa.int64()),
            "window": pa.array(np.tile(np.arange(nw, dtype=np.int64),
                                       len(ids))),
            "energy": pa.array(e, type=pa.int64()),
        })

    return feats.map_batches(explode, batch_format="pyarrow")


def q_video_frames(sf_dir: str):
    """REAL video frame sampling: each doc's payload is a concatenation
    of ``2 + doc_id % 5`` deterministic 2x2 P6 frames (pixel j of frame f
    = ``(doc_id*7 + f*13 + j*29) % 256``); FrameSample splits the
    container, samples 3 evenly (``floor(k*T/3)``), decodes each frame
    for real and emits its exact integer pixel sum — SQL-replayable."""
    import ray.data as rd

    from ..stages.multimodal import FrameSample, encode_ppm

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.arange(12, dtype=np.int64)
        payloads = []
        for did in d:
            t = 2 + int(did) % 5
            frames = [((did * 7 + f * 13 + j * 29) % 256).astype(np.uint8)
                      .reshape(2, 2, 3) for f in range(t)]
            payloads.append(b"".join(encode_ppm(fr) for fr in frames))
        return pa.table({
            "media_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.binary()),
        })

    media = ds.map_batches(to_media, batch_format="pyarrow")
    frames = FrameSample.apply(media, n_frames=3)

    def widen(batch: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": batch["media_id"],
            "sample_k": batch["sample_k"].cast(pa.int64()),
            "frame_idx": batch["frame_idx"].cast(pa.int64()),
            "frame_sum": batch["frame_sum"],
        })

    return frames.map_batches(widen, batch_format="pyarrow")


def q_token_count(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = TokenCount().apply(ds)
    return out.select_columns(["doc_id", "n_tokens"])


def q_quality(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = QualityScore().apply(ds).to_pandas()
    # half-away-from-zero rounding to mirror DuckDB's round() exactly
    # (numpy's round is half-to-even; ratios here are often dyadic, landing
    # exactly on the .5 boundary)
    for c in ("mean_word_len", "alpha_ratio"):
        out[c] = np.floor(out[c] * 1e6 + 0.5) / 1e6
    return out[["doc_id", "mean_word_len", "alpha_ratio"]]


def q_repetition(sf_dir: str):
    """Gopher-style within-doc repetition signals (stages/text.py
    RepetitionStats): duplicate-token / duplicate-bigram fractions and
    top-token ratio, exact ints + single f64 divisions — bit-exact vs
    the SQL oracle's regexp tokenization."""
    import ray.data as rd

    from ..stages.text import RepetitionStats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = RepetitionStats().apply(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_lang_id(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = LangId().apply(ds)
    return out.select_columns(["doc_id", "lang_pred"])


def q_fingerprint(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return Fingerprint().apply(ds).select_columns(["doc_id", "fingerprint"])


def q_lang_confusion(sf_dir: str):
    """Language-ID confusion matrix: declared ``lang`` column vs the
    stopword-heuristic prediction, ``(lang, lang_pred, n_docs)`` rows.
    The key space is langs x langs (summary-sized), so per-batch
    value-count partials tree-combine with zero shuffle; the oracle
    replays the heuristic via the shared stopword VALUES join."""
    import ray.data as rd

    from ..agg import combine_partials

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    ds = LangId().apply(ds)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (batch.groupby(["lang", "lang_pred"], as_index=False)
               .size().rename(columns={"size": "n_docs"}))
        out["n_docs"] = out["n_docs"].astype(np.int64)
        return out

    out = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["lang", "lang_pred"], value_cols=["n_docs"],
        mode="tree").to_pandas()
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def _neardup_corpus(sf_dir: str):
    """documents plus deterministic perturbed copies of every 10th doc
    (planted near-duplicates for the MinHash/SimHash pipelines)."""
    import ray.data as rd

    base = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def perturb(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % 10 == 0
        texts = [t + " near duplicate suffix tokens"
                 for t, k in zip(batch["text"].to_pylist(), keep) if k]
        return pa.table({
            "doc_id": pa.array(ids[keep] + 10_000_000, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        })

    return base.union(base.map_batches(perturb, batch_format="pyarrow"))


def q_near_dedup(sf_dir: str):
    """End-to-end near-duplicate removal (stages/dedup.py near_dedup):
    LSH pairs -> union-find clusters -> min-id survivor per cluster.
    Oracle: the full MinHash replay in SQL plus a recursive
    min-reachability CTE for the connected components (_near_dedup_sql)."""
    ds = _neardup_corpus(sf_dir)
    from ..stages.dedup import near_dedup

    mh = MinHashDedup("near_dedup", threshold=0.5)
    out = near_dedup(ds, mh).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def q_near_dedup_fast(sf_dir: str):
    """near_dedup under ``hash_mode="fast"`` — the corpus-scale
    throughput path (vectorized siphash token hashing + preallocated
    permutation math; x200-stress 9.2s -> 6.1s vs sha256 mode).
    Rows-only by declared design: the fast token hash is not
    SQL-replayable and borderline pairs can differ from the sha256
    oracle path; survivor parity on unambiguous corpora is pinned by
    tests/test_dedup_fast.py."""
    ds = _neardup_corpus(sf_dir)
    from ..stages.dedup import near_dedup

    mh = MinHashDedup("near_dedup_fast", threshold=0.5, hash_mode="fast")
    out = near_dedup(ds, mh).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def q_url_dedup(sf_dir: str):
    """Syntactic URL canonicalization + canonical-key dedup
    (stages/redirects.py normalize_urls + stages/dedup.py ExactDedup):
    a deterministically perturbed corpus (fragment / utm param / http+WWW
    host case / trailing slash variants of every page url) collapses back
    to one row per page, keeping the min doc_id.  The regexp_replace
    chain is RE2/Python-re bit-exact (the PII contract)."""
    import ray.data as rd

    from ..stages.dedup import ExactDedup
    from ..stages.redirects import normalize_urls

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])

    def make(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = batch["lang"].to_pylist()
        base = [f"https://site{i % 20}.example/{lg}/p{i}"
                for i, lg in zip(d.tolist(), lang)]
        var = []
        for i, lg, b in zip(d.tolist(), lang, base):
            m = i % 4
            if m == 0:
                var.append("http://www." + f"site{i % 20}.example".upper()
                           + f"/{lg}/p{i}")
            elif m == 1:
                var.append(b + "?utm_source=feed")
            elif m == 2:
                var.append(b + "#section-2")
            else:
                var.append(b + "/")
        return pa.table({
            "doc_id": pa.array(np.concatenate([d, d + 10_000_000]),
                               type=pa.int64()),
            "url": pa.array(base + var, type=pa.string()),
        })

    ds = normalize_urls(docs.map_batches(make, batch_format="pyarrow"))
    out = ExactDedup("url_dedup", key="canon_url").apply(ds).to_pandas()
    return (out[["doc_id", "canon_url"]]
            .sort_values("doc_id").reset_index(drop=True))


def q_near_dedup_quality(sf_dir: str):
    """near_dedup with quality-based survivor selection (score_col):
    each cluster keeps its highest-token-count doc (ties to min id)
    instead of the min id — the representative-selection rule of
    production curation.  On the planted corpus the suffixed copies are
    LONGER than their originals, so the survivors flip to the copies —
    discriminating this path from the default.  Oracle: the recursive
    component CTE plus a row_number() (score DESC, id) pick."""
    from ..stages.dedup import near_dedup, tokenize

    ds = _neardup_corpus(sf_dir)

    def with_score(t: pa.Table) -> pa.Table:
        n = np.asarray([len(tokenize(x or ""))
                        for x in t["text"].to_pylist()], dtype=np.int64)
        return t.append_column("n_tokens", pa.array(n))

    ds = ds.map_batches(with_score, batch_format="pyarrow")
    mh = MinHashDedup("near_dedup", threshold=0.5)
    out = near_dedup(ds, mh, score_col="n_tokens").to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def _decontam_parts(sf_dir: str):
    """Corpus = all documents; eval set = every 50th document (a small
    benchmark-sized subset, verbatim rows of the corpus — the planted
    contamination signal: eval docs themselves must score 1.0)."""
    import ray.data as rd

    from ..stages.decontam import Decontaminate

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def eval_filter(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 50 == 0))

    d = Decontaminate("decontam", width=3, threshold=0.5)
    ev = d.eval_ngrams(docs.map_batches(eval_filter, batch_format="pyarrow"))
    return d, docs, ev


def q_decontam(sf_dir: str):
    """Benchmark decontamination scoring (stages/decontam.py): per-doc
    distinct-shingle counts, eval-set hits, overlap fraction and the
    contamination flag.  Counts are exact ints and overlap_frac one IEEE
    division of exact ints, so the oracle's sha256-prefix + FNV-roll
    shingle replay hashes bit-exactly."""
    d, docs, ev = _decontam_parts(sf_dir)
    out = d.stats(docs, ev).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_decontam_clean(sf_dir: str):
    """Decontamination filtering: surviving doc_ids (overlap below the
    0.5 threshold) — the streaming ``clean`` pass, corpus never shuffles."""
    d, docs, ev = _decontam_parts(sf_dir)
    out = d.clean(docs, ev).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)


def q_bloom_decontam(sf_dir: str):
    """Bloom-prefilter decontamination (stages/bloom.py): exact stats for
    contaminated docs with the eval side streamed through an m-bit Bloom
    bitmap instead of a driver-side hash array — the shape for eval sets
    beyond the broadcast budget.  Same corpus/eval split as ``decontam``;
    the verify pass makes the output bit-identical to the exact stage's
    contaminated rows, so the oracle is the decontam stats SQL filtered
    to overlap >= threshold."""
    import ray.data as rd

    from ..stages.bloom import BloomDecontaminate

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def eval_filter(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 50 == 0))

    ev_ds = docs.map_batches(eval_filter, batch_format="pyarrow")
    d = BloomDecontaminate("bloom_decontam", width=3, threshold=0.5,
                           m_bits=1 << 20)
    return d.stats(docs, ev_ds)


def _plant_pii_batch(batch: pa.Table, keep_lang: bool) -> pa.Table:
    """Deterministic planted PII (the base synthetic text contains
    none): every 7th doc gains an email, every 11th a phone number,
    every 13th an IPv4 — appended in that fixed order.  SINGLE SOURCE
    for the engine side; :func:`_pii_corpus_sql` is its SQL mirror —
    the two must stay byte-identical or every PII/curation oracle
    breaks."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    texts = batch["text"].to_pylist()
    out = []
    for i, t in zip(ids, texts):
        t = t or ""
        if i % 7 == 0:
            t += f" contact user{i}@example.com"
        if i % 11 == 0:
            t += f" call +1-555-{i % 10000:04d}"
        if i % 13 == 0:
            t += f" from 10.{i % 256}.0.1"
        out.append(t)
    cols = {"doc_id": batch["doc_id"],
            "text": pa.array(out, type=pa.string())}
    if keep_lang:
        cols["lang"] = batch["lang"]
    return pa.table(cols)


def _pii_corpus(sf_dir: str, with_lang: bool = False):
    """documents with the planted PII of :func:`_plant_pii_batch`."""
    import ray.data as rd

    cols = ["doc_id", "text"] + (["lang"] if with_lang else [])
    base = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
    return base.map_batches(
        lambda b, k=with_lang: _plant_pii_batch(b, k),
        batch_format="pyarrow")


def _pii_corpus_sql(with_lang: bool = False) -> str:
    """SQL mirror of :func:`_plant_pii_batch`'s planted suffixes."""
    lang = ", lang" if with_lang else ""
    return (
        "SELECT doc_id, coalesce(text, '') "
        "|| CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id "
        "|| '@example.com' ELSE '' END "
        "|| CASE WHEN doc_id % 11 = 0 THEN ' call +1-555-' "
        "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END "
        "|| CASE WHEN doc_id % 13 = 0 THEN ' from 10.' "
        "|| CAST(doc_id % 256 AS VARCHAR) || '.0.1' ELSE '' END AS text"
        f"{lang} FROM documents")


#: backwards-compat alias used by the pii_stats/pii_redact oracles
_PII_CORPUS_SQL = _pii_corpus_sql()


def q_pii_stats(sf_dir: str):
    """PII detection counts (stages/pii.py PIIStats) over the planted
    corpus — non-overlapping regex match counts, bit-identical between
    pandas str.count and DuckDB regexp_extract_all (RE2) for the
    alternation-free patterns in PII_PATTERNS."""
    from ..stages.pii import PIIStats

    out = PIIStats().apply(_pii_corpus(sf_dir)).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pii_redact(sf_dir: str):
    """PII redaction (stages/pii.py redact): typed placeholders applied
    in pattern order; compared as sha256 of the rewritten text (DuckDB
    sha256 == hashlib, verified)."""
    import hashlib

    from ..stages.pii import redact

    def digest(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "redacted_sha": pa.array(
                [hashlib.sha256(t.encode("utf-8")).hexdigest()
                 for t in batch["text"].to_pylist()], type=pa.string()),
        })

    out = (redact(_pii_corpus(sf_dir))
           .map_batches(digest, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


def q_train_order(sf_dir: str):
    """Deterministic training-order shuffle (stages/sample.py
    train_order): the first 200 docs of the seed-0 permutation with
    their rank — the engine path is a real distributed sort by the
    splitmix-style key; the oracle replays the hash and ORDER BYs it."""
    import ray.data as rd

    from ..stages.sample import train_order

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id"])
    head = train_order(ds, id_col="doc_id", seed=0).limit(200).to_pandas()
    head["rank"] = np.arange(1, len(head) + 1, dtype=np.int64)
    return head[["rank", "doc_id", "shuffle_key"]]


def q_mixture_sample(sf_dir: str):
    """Domain rebalancing (stages/sample.py mixture_sample): cap each
    language at ~100 docs with the exact-integer per-group hash
    threshold; corpus streams, only the tiny lang-count table shuffles."""
    import ray.data as rd

    from ..stages.sample import mixture_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    out = mixture_sample(ds, "lang", cap=100, id_col="doc_id").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_PACK_L, _PACK_B = 64, 8


def _TRAIN_KEY():
    from ..stages.sample import mix_hash_sql
    return mix_hash_sql("doc_id", 0)


def _mix_doc_sql():
    from ..stages.sample import mix_hash_sql
    return mix_hash_sql("d.doc_id", 0)


def q_pack_sequences(sf_dir: str):
    """Sequence-packing placement map (stages/packing.py): docs
    hash-bucketed, concatenated in id order, cut into 64-token windows;
    all-int64 outputs so the DuckDB window-cumsum oracle hashes
    bit-exactly.  Only (id, bucket, n_tokens) rows enter the shuffle."""
    import ray.data as rd

    from ..stages.packing import pack_sequences

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = pack_sequences(ds, seq_len=_PACK_L, n_buckets=_PACK_B).to_pandas()
    return (out[["doc_id", "bucket", "n_tokens", "start_tok",
                 "first_seq", "last_seq"]]
            .sort_values("doc_id").reset_index(drop=True))


def q_pack_summary(sf_dir: str):
    """Per-bucket packing manifest (stages/packing.py bucket_summary):
    doc/token totals and ceil-divided sequence counts."""
    import ray.data as rd

    from ..stages.packing import bucket_summary

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = bucket_summary(ds, seq_len=_PACK_L, n_buckets=_PACK_B).to_pandas()
    return out.sort_values("bucket").reset_index(drop=True)


_BM25_TERMS = ["spark", "window", "hash"]


def q_bm25(sf_dir: str):
    """BM25 ranked retrieval (stages/bm25.py): top-20 docs for a fixed
    query-term set.  Rank-only oracle (row_number over score DESC, id)
    — immune to sub-ulp ln() drift between NumPy and DuckDB; all inputs
    to the score (tf, dl, N, Σdl, df) are exact ints."""
    import ray.data as rd

    from ..stages.bm25 import bm25_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = bm25_topk(ds, _BM25_TERMS, k=20)
    return out[["rank", "doc_id"]]


def q_classifier(sf_dir: str):
    """Hashed-feature linear classifier scoring (stages/classifier.py):
    integer weights x token counts give an exact int64 logit, so the
    full model-scoring chain sits under a hash-exact SQL replay
    (sha256-prefix bucket hash + splitmix-style weight derivation)."""
    import ray.data as rd

    from ..stages.classifier import LinearTextClassifier

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    clf = LinearTextClassifier(dim=65536, seed=7)
    out = clf.apply(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_llm_curation(sf_dir: str):
    """The full LLM-corpus curation story as ONE streaming chain —
    classifier gate -> PII redaction -> benchmark decontamination ->
    exact dedup -> domain-mixture rebalance -> sequence packing — over
    the planted-PII corpus.  Every stage is individually hash-exact
    against SQL, so the COMPOSITE sits under a single end-to-end DuckDB
    replay too (stage outputs feed stage inputs on both sides).

    Shuffle inventory of the whole chain: one content-hash exchange
    (dedup), one tiny lang-count aggregate, one int-rows packing
    shuffle — the text stream itself crosses the wire only for the
    dedup co-location; everything else is map_batches."""
    import ray.data as rd

    from ..stages.classifier import LinearTextClassifier
    from ..stages.decontam import Decontaminate
    from ..stages.dedup import ExactDedup
    from ..stages.packing import pack_sequences
    from ..stages.pii import redact
    from ..stages.sample import mixture_sample

    ds = _pii_corpus(sf_dir, with_lang=True)
    ds = LinearTextClassifier(dim=65536, seed=7).filter_positive(ds)
    ds = redact(ds)
    d = Decontaminate("curation", width=3, threshold=0.5)

    def eval_filter(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 50 == 0))

    ev = d.eval_ngrams(ds.map_batches(eval_filter, batch_format="pyarrow"))
    ds = d.clean(ds, ev)
    ds = ExactDedup("curation", key="text").apply(ds) \
        .drop_columns(["_content_hash"])
    ds = mixture_sample(ds, "lang", cap=100, id_col="doc_id")
    out = pack_sequences(ds, seq_len=_PACK_L, n_buckets=_PACK_B).to_pandas()
    return (out[["doc_id", "bucket", "n_tokens", "start_tok",
                 "first_seq", "last_seq"]]
            .sort_values("doc_id").reset_index(drop=True))


def q_similarity_join(sf_dir: str):
    """Exact all-pairs token-Jaccard self-join (stages/simjoin.py):
    prefix-filter inverted index -> capped posting-list candidates ->
    exact set-intersection verification.  Exact by construction, so the
    oracle is the naive DISTINCT-token self-join; inter/sz_a/sz_b are
    ints and jaccard one f64 division of exact ints — bit-identical."""
    import ray.data as rd

    from ..stages.simjoin import similarity_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = similarity_join(ds, threshold=0.9).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_containment_join(sf_dir: str):
    """Exact set-containment self-join (stages/simjoin.py
    containment_join): ordered pairs with |S_a & S_b| / |S_a| >= 0.8 —
    the asymmetric doc-in-doc inclusion signal.  Probe-prefix candidate
    generation is lossless and verification exact, so the oracle is the
    naive ordered DISTINCT-token self-join; containment is one f64
    division of exact ints."""
    import ray.data as rd

    from ..stages.simjoin import containment_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = containment_join(ds, threshold=0.8).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _token_val_lists(sf_dir: str):
    """documents -> (doc_id, vals) with ``vals`` a jagged int64 list
    column (sha256-prefix token hash mod 1000 per token) — the list
    payload the reference's jagged operators (M8, A2) work over."""
    import ray.data as rd

    from ..stages.dedup import _stable_token_hash, tokenize

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def to_lists(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        vals = [[cache.setdefault(w, _stable_token_hash(w) % 1000)
                 for w in tokenize(t or "")]
                for t in batch["text"].to_pylist()]
        return pa.table({
            "doc_id": batch["doc_id"],
            "vals": pa.array(vals, type=pa.list_(pa.int64())),
        })

    return ds.map_batches(to_lists, batch_format="pyarrow")


def q_jagged_reduce(sf_dir: str):
    """The reference's jagged-array reductions (M8 — arrays.py
    reduce_list / nth / counts, reference tree_wrapper JaggedMethod)
    under a SQL oracle: per-list sum/max/min/count/first/argmax over a
    synthesized int list column, all exact ints."""
    from ..arrays import counts, nth, reduce_list

    ds = _token_val_lists(sf_dir)

    def reduce_batch(batch: pa.Table) -> pa.Table:
        col = batch["vals"]
        return pa.table({
            "doc_id": batch["doc_id"],
            "n": pa.array(counts(col).astype(np.int64)),
            "vsum": pa.array(reduce_list(col, "sum").astype(np.int64)),
            "vmax": pa.array(reduce_list(col, "max").astype(np.int64)),
            "vmin": pa.array(reduce_list(col, "min").astype(np.int64)),
            "first": pa.array(nth(col, 0, fill_missing=-1).astype(np.int64)),
            "amax": pa.array(reduce_list(col, "argmax").astype(np.int64)),
        })

    return ds.map_batches(reduce_batch, batch_format="pyarrow")


def q_jagged_explode(sf_dir: str):
    """The reference's equal-jagged explode (A2 — binned_dataframe
    _explode: list columns must share offsets, flat columns repeat)
    under a SQL oracle: explode (vals, position) against doc_id and
    aggregate the exploded rows so the output is order-insensitive."""
    from ..stages.binned_dataframe import _explode

    ds = _token_val_lists(sf_dir)

    def explode_batch(batch: pa.Table) -> pa.Table:
        col = batch["vals"]
        from ..arrays import list_offsets_values

        offsets, values = list_offsets_values(col)
        pos = np.arange(len(values), dtype=np.int64) - np.repeat(
            offsets[:-1], np.diff(offsets))
        flat = _explode({"doc_id": batch["doc_id"].to_numpy(
            zero_copy_only=False), "v": col}, len(batch))
        return pa.table({
            "doc_id": pa.array(flat["doc_id"], type=pa.int64()),
            "pos": pa.array(pos, type=pa.int64()),
            "v": pa.array(np.asarray(flat["v"], dtype=np.int64)),
        })

    out = ds.map_batches(explode_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


def q_reduce_cut(sf_dir: str):
    """The reference's jagged reduce cuts (F2 ReduceSingleCut — 'any'
    and nth-element with fill_missing=False) as SelectPhaseSpace region
    columns over the jagged token-value column, under a SQL oracle."""
    from ..stages.selection import SelectPhaseSpace

    ds = _token_val_lists(sf_dir)
    ds = SelectPhaseSpace("s1", {"reduce": "any", "formula": "vals > 900"},
                          region_name="any_gt").apply(ds)
    ds = SelectPhaseSpace("s2", {"reduce": 0, "formula": "vals > 900"},
                          region_name="first_gt").apply(ds)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "any_gt": batch["any_gt"].cast(pa.int64()),
            "first_gt": batch["first_gt"].cast(pa.int64()),
        })

    return ds.map_batches(finish, batch_format="pyarrow")


def q_binned_padded(sf_dir: str):
    """BinnedDataframe with pad_missing=True (A3 densify): the full bin
    product appears, empty bins carried as zero rows — edges extend past
    the data range so padding is observable.  Oracle: a generated bin
    table LEFT JOINed onto the counts."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    hist = BinnedDataframe("hist", [
        {"in": "n_chars", "out": "chars_bin",
         "bins": {"edges": [float(x) for x in range(0, 4001, 250)]}},
    ], pad_missing=True)
    # densify happens in the reference-shaped collect() rendering; the
    # engine pads the full interval index INCLUDING the +/-inf guard
    # bins (reference semantics), so the bin code is the position - 1:
    # -1 = (-inf, 0), 0..15 = the finite bins, 16 = [4000, inf)
    df = hist.collect(hist.aggregate(ds)).reset_index()
    out = pd.DataFrame({
        "chars_bin": np.arange(len(df), dtype=np.int64) - 1,
        "n": df["n"].fillna(0).astype(np.int64),
    })
    return out.sort_values("chars_bin").reset_index(drop=True)


def q_polygon_cover(sf_dir: str):
    """The PIP stage's cell-cover prefilter index itself (geo/pip.py
    PolygonIndex.cover — the machinery every pip_join query rides on)
    under a SQL oracle: (poly_id, cell) rows of the full cover
    rectangle, reproduced in SQL from the corner-cell grid math."""
    from ..geo.pip import PolygonIndex

    idx = PolygonIndex(rect_polygons(), res=RES)
    rows = [(pid, cell) for cell, pids in sorted(idx.cover.items())
            for pid in pids]
    out = pd.DataFrame(rows, columns=["poly_id", "cell"])
    out = out.astype({"poly_id": np.int64, "cell": np.int64})
    return out.sort_values(["poly_id", "cell"]).reset_index(drop=True)


def q_chunk_dup(sf_dir: str):
    """Cross-document duplicated-chunk fraction (stages/dedup.py
    chunk_dup_stats) over the planted-dup corpus: each planted copy is
    its original plus a suffix, so the original's full chunks recur in
    the copy.  Counts are exact ints; the fraction one f64 division —
    the SQL oracle replays the sha256-prefix rolling chunk hash."""
    from ..stages.dedup import chunk_dup_stats

    ds = _neardup_corpus(sf_dir)
    out = chunk_dup_stats(ds, chunk_tokens=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dedup_spans(sf_dir: str):
    """Duplicated-span removal (stages/dedup.py remove_dup_spans) over
    the planted-dup corpus: every full chunk of a copied original occurs
    in >= 2 distinct docs, so those spans vanish from BOTH the original
    and the copy while unique tail/suffix tokens survive.  Oracle: the
    chunk_dup rolling-hash replay plus an ordered string_agg
    reconstruction of the surviving tokens."""
    from ..stages.dedup import remove_dup_spans

    ds = _neardup_corpus(sf_dir)
    out = remove_dup_spans(ds, chunk_tokens=8, min_count=2).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_minhash_pairs(sf_dir: str):
    """Full MinHash+LSH chain (signatures -> band rows -> bucket pairs ->
    signature verification) under a bit-exact SQL oracle: the oracle
    recomputes sha256-prefix token hashes, the HUGEINT rolling shingle
    hash, the universal-hash signature mins, the FNV band fold and the
    equality-fraction verification entirely in DuckDB.  est_jaccard is
    k/128 (k integer) — exactly representable in f64, so no rounding is
    needed for the hash compare."""
    ds = _neardup_corpus(sf_dir)
    mh = MinHashDedup("minhash", threshold=0.5)
    out = mh.candidate_pairs(ds).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_simhash_pairs(sf_dir: str):
    """Full SimHash chain under a bit-exact SQL oracle (see
    _simhash_pairs_sql): token-vote fingerprints, 16-bit bank LSH, and
    Hamming verification all recomputed independently in DuckDB."""
    ds = _neardup_corpus(sf_dir)
    out = SimHashDedup("simhash").candidate_pairs(ds).to_pandas()
    out["hamming"] = out["hamming"].astype(np.int64)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_ann_cosine(sf_dir: str):
    """Top-5 cosine neighbours of the first 10 vectors; ranking by
    (round(cos, 4) DESC, vec_id) — rounding makes the f64-summation-order
    difference between numpy and DuckDB irrelevant."""
    import pyarrow.parquet as pq
    import ray.data as rd

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qmask = pa.compute.less(emb["vec_id"], 10)
    qtab = emb.filter(qmask)
    queries = {
        "id": qtab["vec_id"].to_numpy(zero_copy_only=False),
        "matrix": np.stack([np.asarray(v, dtype=np.float64)
                            for v in qtab["embedding"].to_pylist()]),
    }
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = ann_topk(ds, queries, k=10, exclude_self=True).to_pandas()
    got["r4"] = got["cosine"].round(4)
    got = got.sort_values(["query_id", "r4", "neighbor_id"],
                          ascending=[True, False, True])
    got = got.groupby("query_id", group_keys=False).head(5)
    got["rank"] = got.groupby("query_id").cumcount() + 1
    out = got[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return out


def q_embed_neardup(sf_dir: str):
    """Embedding near-dup via LSH buckets + exact cosine verification.
    The base table has no natural near-dups (max pairwise cosine ~0.48),
    so perturbed copies of every 20th vector are planted deterministically
    (id + 10M) — found pairs must link originals to their copies."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def perturb(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        keep = ids % 20 == 0
        vecs = [np.asarray(v, dtype=np.float32) for v, k in
                zip(batch["embedding"].to_pylist(), keep) if k]
        out_ids = ids[keep] + 10_000_000
        # deterministic tiny rotation: flip sign of a small epsilon component
        pert = [(v + np.float32(0.01) * np.sign(v)).tolist() for v in vecs]
        return pa.table({
            "vec_id": pa.array(out_ids, type=pa.int64()),
            "embedding": pa.array(pert, type=pa.list_(pa.float32())),
        })

    corpus = ds.union(ds.map_batches(perturb, batch_format="pyarrow"))
    out = near_dup_cosine(corpus, threshold=0.95, dim=64).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    out["cosine"] = out["cosine"].round(4)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _parity_pages(sf_dir: str, parity: int):
    """Deterministic dataset split: pages with doc_id % 2 == parity."""
    def build():
        ds = _pages_geo(sf_dir)
        return ds.map_batches(
            lambda t, p=parity: t.filter(pa.compute.equal(
                pa.compute.bit_wise_and(t["doc_id"], 1), p)),
            batch_format="pyarrow")
    return build


def q_multi_cutflow(sf_dir: str):
    """Multi-dataset layer (reference A4 / __main__.py:66-80): two named
    datasets — 'mc_even' (eventtype mc) and 'data_odd' (eventtype data) —
    through the SAME selection; the data dataset counts raw events into
    the weighted slots (filters.py:48-50), concatenated under a leading
    ``dataset`` column."""
    from .datasets import DatasetSpec, MultiDatasetRun

    specs = [DatasetSpec("mc_even", "mc", build=_parity_pages(sf_dir, 0)),
             DatasetSpec("data_odd", "data", build=_parity_pages(sf_dir, 1))]
    out = MultiDatasetRun(specs).cutflow(CUTFLOW_SELECTION, weights="weight")
    for c in ("passed_only_cut", "passed_incl", "totals_incl"):
        out[c] = out[c].astype(np.int64)
    out["depth"] = out["depth"].astype(np.int64)
    cols = ["dataset", "unique_id", "depth", "cut",
            "passed_only_cut", "passed_only_cut_weight",
            "passed_incl", "passed_incl_weight",
            "totals_incl", "totals_incl_weight"]
    return out[cols].sort_values(["dataset", "unique_id"]).reset_index(drop=True)


def q_multi_binned(sf_dir: str):
    """Multi-dataset BinnedDataframe, concat collection (reference
    summary/binned_dataframe.py:69-88): per-dataset histograms stacked
    under a ``dataset`` column.  The sum collection's algebra (merge by
    addition, binned_dataframe.py:89-100) is pinned in pytest against the
    single-run histogram."""
    import ray.data as rd

    from .datasets import DatasetSpec, MultiDatasetRun

    def make(parity):
        def build():
            ds = rd.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_returnflag", "l_quantity", "l_discount"])
            return ds.map_batches(
                lambda t, p=parity: t.filter(pa.compute.equal(
                    pa.compute.bit_wise_and(t["l_orderkey"], 1), p)),
                batch_format="pyarrow")
        return build

    hist = BinnedDataframe("hist", [
        {"in": "l_returnflag"},
        {"in": "l_quantity", "out": "qty_bin",
         "bins": {"edges": [0.0, 10.0, 20.0, 30.0, 40.0, 50.0]}},
    ], weights={"w": "l_discount"})
    specs = [DatasetSpec("mc_even", "mc", build=make(0)),
             DatasetSpec("data_odd", "data", build=make(1))]
    out = MultiDatasetRun(specs).binned(hist, collect="concat")
    out = out.rename(columns={"sumw_w": "sumw", "sumw2_w": "sumw2"})
    out["n"] = out["n"].astype(np.int64)
    out["qty_bin"] = out["qty_bin"].astype(np.int64)
    out["sumw"] = out["sumw"].round(6)
    out["sumw2"] = out["sumw2"].round(6)
    return out[["dataset", "l_returnflag", "qty_bin", "n", "sumw", "sumw2"]]


def _asof_events(sf_dir: str, join_fn):
    """Shared purchase->latest-prior-view as-of pipeline; ``join_fn``
    selects the flat or bucketed engine path (same DuckDB ASOF oracle)."""
    import ray.data as rd

    def load(etype: str):
        ds = rd.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "value", "event_type"])

        def prep(t: pa.Table, e=etype) -> pa.Table:
            t = t.filter(pa.compute.equal(t["event_type"], e))
            return pa.table({
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "t_us": t["ts"].cast(pa.int64()),
                "value": t["value"],
            })

        return ds.map_batches(prep, batch_format="pyarrow")

    out = join_fn(load("purchase"), load("view"))
    df = out.to_pandas().rename(columns={
        "event_id_r": "view_event_id", "value_r": "view_value"})
    # pandas map_groups upcasts int columns that carried typed nulls on the
    # other side's rows; restore the parquet int64 ids.
    df["event_id"] = df["event_id"].astype(np.int64)
    df["view_event_id"] = df["view_event_id"].astype(np.int64)
    cols = ["user_id", "event_id", "value", "view_event_id", "view_value"]
    return df[cols].sort_values("event_id").reset_index(drop=True)


def q_asof_join(sf_dir: str):
    """As-of join (stages/asof_join.py): each purchase attributed to the
    user's latest prior view — one hash shuffle, vectorized per-group
    searchsorted.  Oracle: DuckDB's native ASOF JOIN."""
    from ..stages.asof_join import asof_join

    return _asof_events(sf_dir, lambda l, r: asof_join(
        l, r, on="t_us", by="user_id", left_cols=["event_id", "value"],
        right_cols=["event_id", "value"], how="inner"))


def q_asof_join_bucketed(sf_dir: str):
    """Hot-key-safe as-of join (time-bucketed groups + carry pass) — the
    scale path, same ASOF oracle and identical answer as q_asof_join."""
    from ..stages.asof_join import asof_join_bucketed

    return _asof_events(sf_dir, lambda l, r: asof_join_bucketed(
        l, r, on="t_us", by="user_id", bucket_width=86_400_000_000,
        left_cols=["event_id", "value"],
        right_cols=["event_id", "value"], how="inner"))


def q_transitions(sf_dir: str):
    """Clickstream Markov transition matrix (stages/windows.py
    transitions): per-user (ts, event_id)-ordered adjacent event-type
    pairs counted corpus-wide.  All-int counts over a |types|^2 domain
    - hash-exact under the lag-window SQL replay."""
    import ray.data as rd

    from ..stages.windows import transitions

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    return transitions(ds)


def q_funnel(sf_dir: str):
    """Ordered view->click->purchase funnel (stages/windows.py funnel):
    one hash shuffle of slimmed (key, step, t) rows, per-key sequential
    min-search, cumulative step counts."""
    import ray.data as rd

    from ..stages.windows import funnel

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    out = funnel(ds, ["view", "click", "purchase"])
    return out[["step", "step_name", "n_keys"]]


def q_session_windows(sf_dir: str):
    """Gap-based session windows (stages/windows.py): per-user sessions
    with a 2-hour idle gap; one shuffle, vectorized sessionization."""
    import ray.data as rd

    from ..stages.windows import session_windows

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    out = session_windows(ds, key="user_id", ts="ts",
                          gap_us=7_200_000_000, value="value").to_pandas()
    out = out.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    out["sum_value"] = out["sum_value"].round(6)
    return out[["user_id", "session_start", "n", "sum_value"]]


def _window_funcs_events(sf_dir: str, fn):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    return fn(ds)


def q_window_funcs(sf_dir: str):
    """Per-key ordered window functions (stages/windows.py window_funcs):
    row_number / running int-quantized sum / lag gap per event — one hash
    shuffle, per-group vectorized cumsum."""
    from ..stages.windows import window_funcs

    return _window_funcs_events(
        sf_dir, lambda ds: window_funcs(
            ds, key="user_id", ts="ts", id_col="event_id", value="value"))


def q_window_funcs_bucketed(sf_dir: str):
    """Hot-key-safe window functions (time-bucketed groups + integer
    offset pass); bit-identical to q_window_funcs, same SQL oracle."""
    from ..stages.windows import window_funcs_bucketed

    return _window_funcs_events(
        sf_dir, lambda ds: window_funcs_bucketed(
            ds, key="user_id", ts="ts", id_col="event_id", value="value",
            bucket_width=86_400_000_000))


def _trajectory_events(sf_dir: str, fn):
    """Events with deterministic synthetic integer positions: pure int64
    multiply/mod of event_id, mirrored verbatim in the oracle SQL (same
    single-source-of-truth discipline as fixtures.sql_geo_exprs)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def pos(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "x", pa.array((eid * 2654435761) % 1024)).append_column(
            "y", pa.array((eid * 40503 + 12345) % 1024))

    return fn(ds.map_batches(pos, batch_format="pyarrow"))


def q_trajectory(sf_dir: str):
    """Per-entity trajectory statistics (stages/trajectory.py): ordered
    path fold per user — squared-segment-length sum, net displacement,
    visited bbox; one hash shuffle."""
    from ..stages.trajectory import trajectory_stats

    return _trajectory_events(
        sf_dir, lambda ds: trajectory_stats(
            ds, key="user_id", ts="ts", x="x", y="y", id_col="event_id"))


def q_trajectory_bucketed(sf_dir: str):
    """Hot-key-safe trajectory fold (time-bucketed partials + boundary
    segment merge); bit-identical to q_trajectory, same SQL oracle."""
    from ..stages.trajectory import trajectory_stats_bucketed

    return _trajectory_events(
        sf_dir, lambda ds: trajectory_stats_bucketed(
            ds, key="user_id", ts="ts", x="x", y="y", id_col="event_id",
            bucket_width=86_400_000_000))


def q_teleports(sf_dir: str):
    """Impossible-travel detection (stages/trajectory.py
    impossible_travel): transitions whose implied speed exceeds 5
    units/s via the exact integer cross-multiplied gate
    d2 * t_den^2 > (v_num * gap_s)^2 — zero floats, lag-window SQL
    replay."""
    from ..stages.trajectory import impossible_travel

    out = _trajectory_events(
        sf_dir,
        lambda ds: impossible_travel(ds, v_num=5, t_den=1)).to_pandas()
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def _docs_with_tokens(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text", "n_chars"])

    def with_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("")
        batch["n_tokens"] = s.str.split().str.len().fillna(0).astype(np.int64)
        return batch

    return ds.map_batches(with_tokens, batch_format="pandas")


def q_zipf(sf_dir: str):
    """Zipf's-law slope over the corpus vocabulary (stages/stats.py
    zipf_slope): hash-combined vocab, driver closed-form fit."""
    import ray.data as rd

    from ..stages.stats import zipf_slope

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = zipf_slope(ds)
    out["slope"] = out["slope"].round(6)
    return out


def q_ewma(sf_dir: str):
    """Per-user exponential moving average (stages/windows.py ewma): the
    sequential recursion as a closed-form vectorized weighted sum — one
    ordered key shuffle, no scan.  Rounded to 6 decimals (power() ulp
    + sum order)."""
    import ray.data as rd

    from ..stages.windows import ewma

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id", "value"])
    out = ewma(ds, alpha=0.3).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    out["ewma"] = out["ewma"].round(6)
    return out.sort_values("user_id").reset_index(drop=True)


def q_audience_overlap(sf_dir: str):
    """Audience-overlap matrix (stages/retention.py audience_overlap):
    users doing BOTH of each event-type pair — distinct-pair shrink, one
    user shuffle, vectorized per-user pair expansion, label² combine."""
    import ray.data as rd

    from ..stages.retention import audience_overlap

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    out = audience_overlap(ds, key="user_id", label="event_type").to_pandas()
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_winsorize(sf_dir: str):
    """Winsorization composite: exact p05/p95 of document length
    (stages/quantile.py) broadcast as driver scalars, then a fused
    per-batch clamp — distributed quantile + zero-shuffle transform."""
    import ray.data as rd

    from ..stages.quantile import exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    qs = exact_quantiles(ds, "n_chars", [0.05, 0.95])
    lo, hi = int(qs["value"].iloc[0]), int(qs["value"].iloc[1])

    def clamp(batch: pa.Table, lo=lo, hi=hi) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"],
                         "n_chars_w": pa.array(np.clip(v, lo, hi))})

    out = ds.map_batches(clamp, batch_format="pyarrow").to_pandas()
    for c in ["doc_id", "n_chars_w"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_latest_by_key(sf_dir: str):
    """CDC compaction (stages/diff.py latest_by_key): three synthetic
    versions of the documents table (version 2 touches doc_id%3==0,
    version 3 touches doc_id%5==0, values perturbed arithmetically)
    compacted to latest-wins by the packed-max trick — one Max combine,
    no argmax group tasks."""
    import ray.data as rd

    from ..stages.diff import latest_by_key

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "n_chars"])

    def versions(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = [pa.table({"doc_id": pa.array(d),
                           "version": pa.array(np.ones_like(d)),
                           "n_chars": pa.array(n)})]
        m2 = d % 3 == 0
        parts.append(pa.table({"doc_id": pa.array(d[m2]),
                               "version": pa.array(np.full(m2.sum(), 2,
                                                           dtype=np.int64)),
                               "n_chars": pa.array(n[m2] + 7)}))
        m3 = d % 5 == 0
        parts.append(pa.table({"doc_id": pa.array(d[m3]),
                               "version": pa.array(np.full(m3.sum(), 3,
                                                           dtype=np.int64)),
                               "n_chars": pa.array(n[m3] + 11)}))
        return pa.concat_tables(parts)

    ds = docs.map_batches(versions, batch_format="pyarrow")
    out = latest_by_key(ds, key="doc_id", version="version",
                        value="n_chars").to_pandas()
    for c in ["doc_id", "version", "n_chars"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_skyline(sf_dir: str):
    """2-D Pareto skyline over (n_chars, n_tokens) (stages/skyline.py):
    per-batch local skyline shrink (the operator is algebraic), driver
    union + final pass — the stream never shuffles."""
    from ..stages.skyline import skyline

    out = skyline(_docs_with_tokens(sf_dir), x="n_chars", y="n_tokens",
                  keep=["doc_id"])
    for c in ["doc_id", "n_chars", "n_tokens"]:
        out[c] = out[c].astype(np.int64)
    return out[["doc_id", "n_chars", "n_tokens"]]


def q_grouped_mode(sf_dir: str):
    """Most frequent document length per language (stages/stats.py
    grouped_mode): exact count partials, one combine, deterministic
    count-desc/value-asc tie-break."""
    import ray.data as rd

    from ..stages.stats import grouped_mode

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])
    out = grouped_mode(ds, group="lang", col="n_chars")
    out["value"] = out["value"].astype(np.int64)
    return out


def q_kmeans_assign(sf_dir: str):
    """Broadcast nearest-centroid assignment (stages/kmeans.py
    kmeans_assign): seed centroids = embeddings of vec_id 0..7, one
    fused matmul pass, no shuffle.  Oracle ranks with list_distance +
    row_number (assignment is a discrete argmin — float-path differences
    cannot flip it away from ties, and ties break to the lowest id on
    both sides)."""
    import ray.data as rd

    from ..stages.kmeans import kmeans_assign

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    seed = (ds.map_batches(
        lambda t: t.filter(pa.compute.less(t["vec_id"], 8)),
        batch_format="pyarrow").to_pandas().sort_values("vec_id"))
    C = np.stack([np.asarray(e, dtype=np.float64) for e in seed["embedding"]])
    out = kmeans_assign(ds, C, centroid_ids=seed["vec_id"].to_numpy()
                        ).to_pandas()
    for c in ["vec_id", "cluster"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


def q_kmeans(sf_dir: str):
    """Full distributed Lloyd k-means, k=8, 4 iterations
    (stages/kmeans.py): per-iteration fused assign+partial-sum pass and
    a constant-size combine; rows-only check (float centroid drift has
    no SQL equivalent; pytest pins engine==local-reference
    assignments)."""
    import ray.data as rd

    from ..stages.kmeans import kmeans

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    assignments, _ = kmeans(ds, k=8, iters=4)
    out = assignments.to_pandas()
    for c in ["vec_id", "cluster"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("vec_id").reset_index(drop=True)


def q_term_trends(sf_dir: str):
    """Day-over-day trending terms (stages/text.py term_trends): per-day
    token counts from the crawl timestamp (warc_ts arithmetic mirrored
    in SQL), hash combine, token-keyed lag ratio — one IEEE division of
    exact counts, bit-equal to the SQL lag window."""
    import ray.data as rd

    from ..stages.text import term_trends

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def add_day(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = WARC_EPOCH_US + did * (WARC_STEP_S * 1_000_000)
        # 4-hour buckets: the sf0.01 corpus spans <1 day, so day-grain
        # trends would be a single observation per token
        return batch.append_column("day", pa.array(ts // 14_400_000_000))

    out = term_trends(ds.map_batches(add_day, batch_format="pyarrow"),
                      day_col="day").to_pandas()
    out["n"] = out["n"].astype(np.int64)
    out["day"] = out["day"].astype(np.int64)
    return out.sort_values(["token", "day"]).reset_index(drop=True)


def q_vocab_drift(sf_dir: str):
    """Per-token chi-squared vocabulary drift between alternating 4-hour
    crawl periods (stages/text.py vocab_drift, Kilgarriff corpus-
    comparison chi²): exact int64 signed numerator, one fixed float
    chain mirrored in SQL, min-support 5."""
    import ray.data as rd

    from ..stages.text import vocab_drift

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def add_period(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = WARC_EPOCH_US + did * (WARC_STEP_S * 1_000_000)
        return batch.append_column(
            "period", pa.array((ts // 14_400_000_000) % 2))

    out = vocab_drift(ds.map_batches(add_period, batch_format="pyarrow"),
                      min_support=5).to_pandas()
    return out.sort_values("token").reset_index(drop=True)


def q_rolling_median(sf_dir: str):
    """Rolling-median smoothing of per-type daily event counts
    (stages/windows.py rolling_median_counts): trailing 4-bucket median
    over exact int counts — even-width medians are exact x.5 float64,
    bit-equal to the SQL median window."""
    import ray.data as rd

    from ..stages.windows import rolling_median_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    out = rolling_median_counts(ds, bucket_us=14_400_000_000).to_pandas()
    return out.sort_values(["event_type", "bucket"]).reset_index(drop=True)


def q_ks_test(sf_dir: str):
    """Two-sample KS distance between click and view value
    distributions (stages/stats.py ks_two_sample): exact int64 max
    |A_v*n2 - B_v*n1| over the merged value grid, one IEEE quotient —
    hash-exact vs the cumulative-window SQL replay."""
    import ray.data as rd

    from ..stages.stats import ks_two_sample

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return ks_two_sample(ds, group="event_type", value_col="value",
                         a="click", b="view")


def q_group_split(sf_dir: str):
    """Leakage-safe train/val/test split by domain (stages/sample.py
    group_split): every page of a host lands in one split via the
    sha256-prefix stable hash mod 1e6 against cumulative integer
    thresholds — hash-exact SQL replay."""
    import ray.data as rd

    from ..stages.sample import group_split
    from ..stages.urls import ParseURL

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])

    def make(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = pd.Series(batch["lang"].to_pylist(), dtype=object)
        url = ("https://site" + pd.Series(d % 20).astype(str)
               + ".example/" + lang + "/p" + pd.Series(d).astype(str))
        return pa.table({"doc_id": pa.array(d, type=pa.int64()),
                         "url": pa.array(url.to_numpy(dtype=object),
                                         type=pa.string())})

    ds = docs.map_batches(make, batch_format="pyarrow")
    ds = ParseURL(keep=("host",)).apply(ds)
    ds = group_split(ds, group_col="host")
    return ds.select_columns(["doc_id", "host", "bucket", "split"])


def q_ripley(sf_dir: str):
    """Ripley's K at r = 1 and 2 degrees (stages/ripley.py ripley_k):
    exact unordered pair counts within radius via home/probe cell
    co-location with canonical id attribution — no all-pairs scan; the
    oracle is the brute self-join."""
    from ..stages.ripley import ripley_k

    ds = _pages_geo(sf_dir)
    return ripley_k(ds, radii=[1.0, 2.0], res=RES)


def q_join_counts(sf_dir: str):
    """Black-white join counts (stages/autocorr.py join_counts): binary
    spatial autocorrelation of en-majority cells over queen adjacency —
    exact int64 BB/BW/WW, one IEEE ratio."""
    from ..stages.autocorr import join_counts

    ds = _pages_geo(sf_dir)
    return join_counts(ds, res=RES)


def q_crawl_budget(sf_dir: str):
    """Hamilton largest-remainder crawl-budget apportionment
    (stages/crawl.py crawl_budget): 1000 fetch slots split across
    sources proportional to page counts — exact integer quotas, floors
    first, leftovers to the largest remainders with a name tie-break."""
    import ray.data as rd

    from ..stages.crawl import crawl_budget

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    return crawl_budget(ds, key="source", slots=1000)


def q_mannwhitney(sf_dir: str):
    """Mann-Whitney U / AUC between click and view value distributions
    (stages/stats.py mannwhitney_u): exact doubled-midrank int64
    arithmetic, one IEEE AUC quotient — hash-exact SQL window replay."""
    import ray.data as rd

    from ..stages.stats import mannwhitney_u

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])
    return mannwhitney_u(ds, group="event_type", value_col="value",
                         a="click", b="view")


def q_benford(sf_dir: str):
    """Benford first-digit screen over order totals (stages/stats.py
    benford): exact string-based digit extraction on integer cents —
    no float log near the counts; one 9-key combine."""
    import ray.data as rd

    from ..stages.stats import benford

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_totalprice"])
    return benford(ds, value_col="o_totalprice")


def q_gini(sf_dir: str):
    """Gini concentration of page volume across sources
    (stages/stats.py gini): exact int64 numerator
    2*sum(i*c_i) - (n+1)*sum(c) over rank-sorted per-source counts,
    one IEEE quotient — hash-exact vs the row_number window replay."""
    import ray.data as rd

    from ..stages.stats import gini

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    return gini(ds, key="source")


def q_burstiness(sf_dir: str):
    """Goh-Barabási burstiness per user (stages/bots.py burstiness):
    B = (sqrt(V) - sum_gap)/(sqrt(V) + sum_gap) with V = m*sum_gap2 -
    sum_gap^2 exact int64 — one correctly-rounded sqrt + fixed float
    chain, bit-equal to the SQL replay."""
    import ray.data as rd

    from ..stages.bots import burstiness

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    out = burstiness(ds).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_mad_outliers(sf_dir: str):
    """Robust per-type outlier flags via exact integer medians
    (stages/stats.py mad_outliers, Hampel MAD rule): |x - med| * k_den >
    k_num * mad on floor(value*64) ints — zero float arithmetic, two
    quantile-shrink combines, raw rows never shuffle."""
    import ray.data as rd

    from ..stages.stats import mad_outliers

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    out = mad_outliers(ds).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_redirects(sf_dir: str):
    """Redirect-chain canonicalization (stages/redirects.py): synthetic
    301 chains (doc_id -> doc_id-3 while doc_id%3==0 and (doc_id//3)%7!=0)
    collapsed by driver pointer doubling (log2 rounds), then the full doc
    stream resolved by one broadcast searchsorted per batch — zero
    shuffles of the stream.  Oracle: recursive CTE walking each chain."""
    import ray.data as rd

    from ..stages.redirects import resolve_redirects

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def make_redirects(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (d % 3 == 0) & ((d // 3) % 7 != 0) & (d >= 3)
        return pa.table({"src": pa.array(d[m]), "dst": pa.array(d[m] - 3)})

    redirects = docs.map_batches(make_redirects, batch_format="pyarrow")
    out = resolve_redirects(docs, redirects, key="doc_id").to_pandas()
    for c in ["doc_id", "terminal"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_cell_entropy(sf_dir: str):
    """Language-diversity Shannon entropy per spatial cell
    (stages/stats.py grouped_entropy over the cell-encoded page stream):
    exact (cell, lang) count partials, one combine, vectorized entropy
    finish; rounded to 6 decimals for FP sum-order parity."""
    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["cell"], 0)),
        batch_format="pyarrow")

    from ..stages.stats import grouped_entropy

    out = grouped_entropy(ds, group="cell", label="lang")
    out["cell"] = out["cell"].astype(np.int64)
    out["entropy"] = out["entropy"].round(6)
    return out


def q_idw(sf_dir: str):
    """Inverse-distance-weighted interpolation of a site-valued field at
    every geotagged page (engine kNN join k=5, oracle-exact euclid
    metric, then a fully in-batch weighted fold — each page's k rows
    are emitted contiguously, so the IDW needs ZERO shuffles)."""
    ds = _pages_geo(sf_dir)
    ds = knn_join(ds, sites_table(), k=5, res=RES, max_ring=6,
                  metric="euclid", brute_force_sites=0)

    def idw(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
            "site_id": batch["site_id"].to_numpy(zero_copy_only=False),
            "d2": batch["d2_deg"].to_numpy(zero_copy_only=False)})
        v = ((df["site_id"].to_numpy() * 37) % 100).astype(np.float64)
        df["_num"] = v / df["d2"].to_numpy()
        df["_den"] = 1.0 / df["d2"].to_numpy()
        out = (df.groupby("doc_id", sort=False)[["_num", "_den"]]
               .sum().reset_index())
        out["idw"] = (out["_num"] / out["_den"]).round(6)
        return pa.Table.from_pandas(out[["doc_id", "idw"]],
                                    preserve_index=False)

    out = ds.map_batches(idw, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_grouped_corr(sf_dir: str):
    """Exact per-language Pearson corr(n_chars, n_tokens)
    (stages/stats.py grouped_corr): one pass of six int64 moment
    partials per lang, tree combine, closed-form driver finish.  The
    SQL oracle computes the identical expression from identical exact
    integer sums — bit-equal before the round(6)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text", "n_chars"])

    def with_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("")
        batch["n_tokens"] = s.str.split().str.len().fillna(0).astype(np.int64)
        return batch

    from ..stages.stats import grouped_corr

    out = grouped_corr(ds.map_batches(with_tokens, batch_format="pandas"),
                       group="lang", x="n_chars", y="n_tokens")
    out["corr"] = out["corr"].round(6)
    out["n"] = out["n"].astype(np.int64)
    return out


def q_weighted_sample(sf_dir: str):
    """Deterministic weighted Bernoulli sample (stages/sample.py
    weighted_sample): keep probability min(1, rate*weight), the exact
    int64 hash-uniform predicate the SQL oracle replays verbatim
    (weights are dyadic k/1024, so the quantization is exact)."""
    from ..stages.sample import weighted_sample

    ds = _pages_geo(sf_dir)
    out = weighted_sample(ds, "doc_id", "weight", rate=0.6)
    return out.select_columns(["doc_id", "weight"])


def q_grouped_ols(sf_dir: str):
    """Exact per-language OLS fit of n_tokens on n_chars
    (stages/stats.py grouped_ols — the regression leg of the
    grouped_corr moment machinery): slope and intercept from exactly-
    summed int64 moments, round(6) for the hash like corr."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "text", "n_chars"])

    def with_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["text"].fillna("")
        batch["n_tokens"] = s.str.split().str.len().fillna(0).astype(np.int64)
        return batch

    from ..stages.stats import grouped_ols

    out = grouped_ols(ds.map_batches(with_tokens, batch_format="pandas"),
                      group="lang", x="n_chars", y="n_tokens")
    out["slope"] = out["slope"].round(6)
    out["intercept"] = out["intercept"].round(6)
    out["n"] = out["n"].astype(np.int64)
    return out


def q_inverted_index(sf_dir: str):
    """Inverted index with capped postings (stages/index.py): distinct
    (token, doc) dedup -> one token-keyed shuffle -> df + first-10
    sorted posting list per token."""
    import ray.data as rd

    from ..stages.index import inverted_index

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = inverted_index(ds, k=10).to_pandas()
    out["df"] = out["df"].astype(np.int64)
    return out.sort_values("token").reset_index(drop=True)


def q_dataset_diff(sf_dir: str):
    """Snapshot diff (stages/diff.py dataset_diff): documents vs a
    deterministically mutated re-ingest (drop doc_id%97==3, bump
    n_chars for doc_id%31==4, add shifted ids for doc_id%53==5) —
    union + one summary combine, NO join, classified per key."""
    import ray.data as rd

    from ..stages.diff import dataset_diff

    old = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "n_chars"])

    def mutate(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = did % 97 != 3
        bumped = np.where(did % 31 == 4, nch + 1, nch)
        base = pa.table({"doc_id": pa.array(did[keep]),
                         "n_chars": pa.array(bumped[keep])})
        extra_m = did % 53 == 5
        extra = pa.table({"doc_id": pa.array(did[extra_m] + 10_000_000),
                          "n_chars": pa.array(nch[extra_m])})
        return pa.concat_tables([base, extra])

    new = old.map_batches(mutate, batch_format="pyarrow")
    out = dataset_diff(old, new, key="doc_id", cols=["n_chars"]).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_link_graph(sf_dir: str):
    """Domain-level hyperlink edge table (stages/linkgraph.py
    extract_links): compiled-regex href scan of raw html bytes fused
    with per-batch edge partials, one hash combine.  Oracle mirrors the
    fixture's deterministic outlink arithmetic (fixtures.outlink_sites)."""
    from ..stages.linkgraph import extract_links

    out = extract_links(pages_dataset(sf_dir)).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return (out.sort_values(["src_domain", "dst_domain"])
            .reset_index(drop=True))


def q_domain_degrees(sf_dir: str):
    """Per-domain in/out degree + link totals (stages/linkgraph.py
    domain_degrees): two summary-sized combines over the edge table."""
    from ..stages.linkgraph import domain_degrees

    return domain_degrees(pages_dataset(sf_dir))


def q_pagerank(sf_dir: str):
    """Damped PageRank, 3 power iterations (stages/linkgraph.py
    pagerank): distributed edge contributions, broadcast rank vector;
    ranks rounded to 6 decimals for FP parity with the SQL oracle
    (per-dst sums differ only in association order — see BASELINE.md
    FP-parity notes)."""
    from ..stages.linkgraph import pagerank

    out = pagerank(pages_dataset(sf_dir), damping=0.85, iters=3)
    out["rank"] = out["rank"].round(6)
    return out.sort_values("domain").reset_index(drop=True)


#: deterministic planted edges closing wedges in the page-derived domain
#: graph (the fixture's outlink arithmetic happens to be triangle-free, so
#: the triangle query unions a clique over the first 6 sites plus two
#: extra chords).  Mirrored literally in the SQL oracle.
_PLANTED_TRI_EDGES = sorted(
    {(f"site{i}.example", f"site{j}.example")
     for i in range(6) for j in range(6) if i != j}
    | {("site7.example", "site12.example"), ("site9.example", "site14.example")})


def q_triangles(sf_dir: str):
    """Per-domain triangle participation counts (stages/linkgraph.py
    count_triangles): degree-ordered orientation, groupby-apex wedge
    generation, one distributed wedge-closure join.  The oracle is the
    classic three-way self-join over the canonical undirected edge set."""
    import ray.data as rd

    from ..stages.linkgraph import count_triangles, extract_links

    edges = extract_links(pages_dataset(sf_dir))
    planted = pa.table({
        "src_domain": pa.array([a for a, _ in _PLANTED_TRI_EDGES]),
        "dst_domain": pa.array([b for _, b in _PLANTED_TRI_EDGES]),
        "n": pa.array(np.ones(len(_PLANTED_TRI_EDGES), dtype=np.int64)),
    })
    out = count_triangles(edges=edges.union(rd.from_arrow(planted)))
    return out


def q_clustering_coeff(sf_dir: str):
    """Per-domain local clustering coefficient (stages/linkgraph.py
    clustering_coefficients): n_tri / (deg choose 2) over the undirected
    domain graph, riding on count_triangles' one wedge-closure join.
    n_tri/n_wedges are exact ints; coeff is their exact IEEE quotient, so
    the SQL replay hashes bit-identically."""
    import ray.data as rd

    from ..stages.linkgraph import clustering_coefficients, extract_links

    edges = extract_links(pages_dataset(sf_dir))
    planted = pa.table({
        "src_domain": pa.array([a for a, _ in _PLANTED_TRI_EDGES]),
        "dst_domain": pa.array([b for _, b in _PLANTED_TRI_EDGES]),
        "n": pa.array(np.ones(len(_PLANTED_TRI_EDGES), dtype=np.int64)),
    })
    return clustering_coefficients(edges=edges.union(rd.from_arrow(planted)))


def q_hits(sf_dir: str):
    """HITS hubs & authorities (stages/linkgraph.py hits): two L1-
    normalized power half-steps over the domain graph, broadcast-iterate
    like pagerank (edges stay put, the vectors move).  Round-6 float
    contract, unrolled-CTE SQL replay."""
    from ..stages.linkgraph import hits

    out = hits(pages_dataset(sf_dir))
    out["hub"] = out["hub"].round(6)
    out["authority"] = out["authority"].round(6)
    return out.sort_values("domain").reset_index(drop=True)


def q_bib_coupling(sf_dir: str):
    """Bibliographic coupling of source domains (stages/linkgraph.py
    bib_coupling, Kessler 1963): pairs of domains ranked by the number
    of distinct targets both link to.  groupby(dst) pair emission with
    in-degree caps, one pair-keyed combine of pre-aggregated partials."""
    from ..stages.linkgraph import bib_coupling

    return bib_coupling(pages_dataset(sf_dir), min_shared=2)


def q_reciprocity(sf_dir: str):
    """Per-domain link reciprocity (stages/linkgraph.py reciprocity):
    distinct out-neighbors vs how many link back; bounded-bucket pair
    co-location (never a raw-pair-keyed group), exact ints + one IEEE
    ratio."""
    from ..stages.linkgraph import reciprocity

    return reciprocity(pages_dataset(sf_dir))


def q_attack_tolerance(sf_dir: str):
    """Attack-tolerance components: connected components of the domain
    graph AFTER removing the top-2 out-degree hubs (ties by name) —
    the scale-free-network robustness probe (Albert, Jeong & Barabási
    2000, public literature).  Composes extract_links (summary-sized
    pull, the link_components contract) + hub filter +
    link_components(edges=...)."""
    import ray.data as rd

    from ..stages.linkgraph import extract_links, link_components

    edf = extract_links(pages_dataset(sf_dir)).to_pandas()
    deg = (edf.groupby("src_domain")["dst_domain"].nunique()
           .rename("od").reset_index())
    hubs = set(deg.sort_values(["od", "src_domain"],
                               ascending=[False, True])
               .head(2)["src_domain"])
    keep = (~edf["src_domain"].isin(hubs)) & (~edf["dst_domain"].isin(hubs))
    filtered = edf[keep].reset_index(drop=True)
    return link_components(edges=rd.from_pandas(filtered))


def q_rollup(sf_dir: str):
    """Hierarchical ROLLUP over (day, hour) of the events stream
    (stages/rollup.py): one scan, finest-level combine, coarser levels
    cascaded from the summary.  value is int64-quantized (floor(v*64),
    a power-of-two scale => exact f64 product) so every level's sum is
    order-independent; the oracle is GROUP BY ROLLUP with GROUPING()
    sentinels."""
    import ray.data as rd

    from ..stages.rollup import rollup

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        hour = (us // 3_600_000_000) % 24
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 64.0).astype(np.int64)
        return pa.table({"day": pa.array(day, type=pa.int64()),
                         "hour": pa.array(hour, type=pa.int64()),
                         "v": pa.array(v, type=pa.int64())})

    out = rollup(ds.map_batches(prep, batch_format="pyarrow"),
                 keys=["day", "hour"], sums=["v"])
    return out


def _events_day_type(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "day": pa.array(us // 86_400_000_000, type=pa.int64()),
            "event_type": batch["event_type"],
        })

    return ds.map_batches(prep, batch_format="pyarrow")


def q_collect_set(sf_dir: str):
    """Per-day sorted distinct event types (stages/stats.py
    grouped_collect_set): distinct-pair shrink -> one combine -> sorted
    join.  Values are strings, so the engine's sort and SQL's ORDER BY
    agree lexicographically."""
    from ..stages.stats import grouped_collect_set

    return grouped_collect_set(_events_day_type(sf_dir), "day", "event_type")


def q_pivot(sf_dir: str):
    """Day x event-type count pivot (stages/stats.py pivot_counts): one
    combine shuffles only (day, type, n) partials; the summary-sized long
    table pivots on the driver.  Oracle: portable CASE-sum pivot."""
    from ..stages.stats import pivot_counts

    return pivot_counts(_events_day_type(sf_dir), "day", "event_type")


def q_cube(sf_dir: str):
    """All-subsets CUBE over (dow, hour) of the events stream
    (stages/rollup.py cube): every grouping set derived from one finest
    combine; _gset mirrors SQL's multi-arg GROUPING bitmask."""
    import ray.data as rd

    from ..stages.rollup import cube

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dow = (us // 86_400_000_000 + 4) % 7  # epoch day 0 = Thursday
        hour = (us // 3_600_000_000) % 24
        v = np.floor(batch["value"].to_numpy(zero_copy_only=False)
                     * 64.0).astype(np.int64)
        return pa.table({"dow": pa.array(dow, type=pa.int64()),
                         "hour": pa.array(hour, type=pa.int64()),
                         "v": pa.array(v, type=pa.int64())})

    return cube(ds.map_batches(prep, batch_format="pyarrow"),
                keys=["dow", "hour"], sums=["v"])


def q_retention(sf_dir: str):
    """Day-over-day retention (stages/retention.py): per-batch distinct
    (user, day) shrink -> one user-keyed shuffle -> per-user day-set fold
    -> span-bounded tree combine.  Nothing user-keyed hits the driver."""
    import ray.data as rd

    from ..stages.retention import retention

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    out = retention(ds).to_pandas()
    for c in ["day", "active", "retained"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("day").reset_index(drop=True)


def q_cohort_retention(sf_dir: str):
    """Cohort retention matrix (stages/retention.py cohort_retention):
    first-active-day cohorts x day offset, hash-combined (the cohort x
    offset key space grows with the span squared — never tree-merged)."""
    import ray.data as rd

    from ..stages.retention import cohort_retention

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])
    out = cohort_retention(ds).to_pandas()
    for c in ["cohort", "day_offset", "n_users"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["cohort", "day_offset"]).reset_index(drop=True)


def _od_events(sf_dir: str, fn):
    """Events on the synthetic deterministic 8x8 cell grid: the same
    int64 multiply/mod positions as _trajectory_events, coarsened to a
    cell id mirrored verbatim in the oracle SQL."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def cellify(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 2654435761) % 1024
        y = (eid * 40503 + 12345) % 1024
        return batch.append_column("cell", pa.array((x // 128) * 8 + y // 128))

    out = fn(ds.map_batches(cellify, batch_format="pyarrow")).to_pandas()
    for c in ["cell_from", "cell_to", "n"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values(["cell_from", "cell_to"]).reset_index(drop=True)


def q_od_matrix(sf_dir: str):
    """Origin->destination flow matrix (stages/retention.py od_matrix):
    per-user time-ordered cell transitions, counted per (from, to) pair —
    one user-keyed shuffle + one hash combine."""
    from ..stages.retention import od_matrix

    return _od_events(sf_dir, od_matrix)


def q_od_matrix_bucketed(sf_dir: str):
    """Hot-key-safe OD matrix (time-bucketed group tasks + boundary
    transition merge); bit-identical to q_od_matrix, same SQL oracle."""
    from ..stages.retention import od_matrix_bucketed

    return _od_events(
        sf_dir, lambda ds: od_matrix_bucketed(
            ds, bucket_width=86_400_000_000))


def q_quantiles(sf_dir: str):
    """Exact distributed quantiles of document length (stages/quantile.py):
    per-block value-count shrink + one hash combine + driver read-off."""
    import ray.data as rd

    from ..stages.quantile import exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return exact_quantiles(ds, "n_chars", [0.25, 0.5, 0.9, 0.99])


def q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event type (stages/sample.py
    count_distinct): per-block pair dedup, one hash shuffle."""
    import ray.data as rd

    from ..stages.sample import count_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    out = count_distinct(ds, "event_type", "user_id").to_pandas()
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def q_curation_pipeline(sf_dir: str):
    """Composite curation pipeline: exact median document length
    (stages/quantile.py) -> broadcast-scalar filter -> token counting
    (stages/text.py) -> per-language totals.  Demonstrates operator
    composition: the quantile is a driver scalar, the stream is filtered
    and aggregated without materializing."""
    import ray.data as rd

    from ..stages.quantile import exact_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text", "n_chars"])
    p50 = int(exact_quantiles(ds, "n_chars", [0.5])["value"].iloc[0])

    filtered = ds.map_batches(
        lambda t, p=p50: t.filter(pa.compute.greater(t["n_chars"], p)),
        batch_format="pyarrow")
    counted = TokenCount().apply(filtered)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby("lang", sort=False).agg(
            n_docs=("doc_id", "size"),
            total_tokens=("n_tokens", "sum")).reset_index()
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["total_tokens"] = out["total_tokens"].astype(np.int64)
        return out

    from ..agg import combine_partials

    parts = counted.map_batches(partial, batch_format="pandas")
    out = combine_partials(parts, keys=["lang"],
                           value_cols=["n_docs", "total_tokens"],
                           mode="tree").to_pandas()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["total_tokens"] = out["total_tokens"].astype(np.int64)
    return out[["lang", "n_docs", "total_tokens"]]


def q_lang_quantiles(sf_dir: str):
    """Per-language exact length quantiles (stages/quantile.py
    grouped_quantiles): (lang, value) count partials -> hash combine ->
    per-group cumulative read-off."""
    import ray.data as rd

    from ..stages.quantile import grouped_quantiles

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["lang", "n_chars"])
    out = grouped_quantiles(ds, "lang", "n_chars", [0.5, 0.9]).to_pandas()
    out["value"] = out["value"].astype(np.int64)
    return out.sort_values(["lang", "q"]).reset_index(drop=True)


def q_theil_sen(sf_dir: str):
    """Per-user Theil-Sen robust trend of event value over time
    (stages/stats.py grouped_theil_sen): lower median of pairwise slopes —
    a pure selection, so the float hashes bit-exactly vs the SQL replay."""
    import ray.data as rd

    from ..stages.stats import grouped_theil_sen

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    out = grouped_theil_sen(ds, "user_id", "ts", "value").to_pandas()
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def q_crawl_order(sf_dir: str):
    """Politeness round-robin crawl schedule (stages/crawl.py): per-domain
    wave rank in group tasks, an EXACT wave<=k prune (position >= wave),
    then one schedule-sized sort — the frontier never globally sorts."""
    import ray.data as rd

    from ..stages.crawl import crawl_order

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"])
    return crawl_order(ds, domain="source", id_col="doc_id",
                       priority="n_chars", k=100)


def q_weighted_median(sf_dir: str):
    """Per-group exact WEIGHTED lower median (stages/quantile.py
    grouped_weighted_median): lineitem quantity weighted by line number —
    (group, value) weight-sum partials, one hash combine, per-group
    integer cumulative read-off; the row stream never sorts."""
    import ray.data as rd

    from ..stages.quantile import grouped_weighted_median

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_linenumber"])

    def to_int(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "qty": pa.array(batch["l_quantity"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
            "w": pa.array(batch["l_linenumber"].to_numpy(
                zero_copy_only=False).astype(np.int64)),
        })

    ds = ds.map_batches(to_int, batch_format="pyarrow")
    out = grouped_weighted_median(ds, "l_returnflag", "qty", "w").to_pandas()
    out["wmedian"] = out["wmedian"].astype(np.int64)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_percentile_rank(sf_dir: str):
    """Global SQL ``rank() OVER (ORDER BY n_chars)`` per document WITHOUT a
    global sort (stages/quantile.py percentile_rank): distinct-value count
    histogram (tree combine, bounded by the value DOMAIN not the row count)
    -> exclusive cumsum on the driver -> broadcast searchsorted per batch.
    The doc stream itself never shuffles."""
    import ray.data as rd

    from ..stages.quantile import percentile_rank

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    out = percentile_rank(ds, "n_chars", keep=["doc_id"], out="rnk").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_hot_cells(sf_dir: str):
    """Heavy-hitter cells (stages/sketch.py): Misra-Gries sketch pass +
    exact verification pass — EXACT items >= 2% of geotagged pages (the
    three hot-city cells plus any dense base cells), no shuffle at all."""
    from ..stages.sketch import heavy_hitters

    ds = _pages_geo(sf_dir)
    ds = CellEncode(res=RES).apply(ds)
    ds = ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["cell"], 0)),
        batch_format="pyarrow").select_columns(["cell"])
    out = heavy_hitters(ds, "cell", min_frac=0.02)
    return out.rename(columns={"item": "cell"})


def q_profile(sf_dir: str):
    """One-pass dataset profile (stages/profile.py): per-column
    n/nulls/min/max/sum over integer columns — exact in float64, so the
    oracle needs no rounding."""
    import ray.data as rd

    from ..stages.profile import profile_columns

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "n_chars"])
    out = profile_columns(ds).to_pandas()
    return out.sort_values("column").reset_index(drop=True)


def q_doc_sample(sf_dir: str):
    """Deterministic hash sampling (stages/sample.py): 37% of documents by
    doc_id hash — same row set on any partitioning / resume."""
    import ray.data as rd

    from ..stages.sample import hash_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    out = hash_sample(ds, "doc_id", 0.37).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_stratified_sample(sf_dir: str):
    """Per-language rebalancing (stages/sample.py stratified_sample):
    en 50%, de 20%, everything else 5% — deterministic id-hash predicate
    reproduced exactly in the SQL oracle."""
    import ray.data as rd

    from ..stages.sample import stratified_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    out = stratified_sample(ds, "doc_id", "lang",
                            {"en": 0.5, "de": 0.2}, default=0.05).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_top_docs(sf_dir: str):
    """Per-group top-k (stages/sample.py): 5 longest documents per
    language — partial top-k per block, one hash shuffle, final top-k."""
    import ray.data as rd

    from ..stages.sample import group_topk

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    out = group_topk(ds, group="lang", order_by="n_chars", k=5,
                     tie_break="doc_id").to_pandas()
    out = out.sort_values(["lang", "rank"]).reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return out[["lang", "doc_id", "n_chars", "rank"]]


def q_bigrams(sf_dir: str):
    """Corpus bigram counts (stages/text.py ngram_count): vectorized
    shifted-view pairing + local partials + one hash combine."""
    import ray.data as rd

    from ..stages.text import ngram_count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = ngram_count(ds, n=2, min_count=5).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("ngram").reset_index(drop=True)


def q_familiarity(sf_dir: str):
    """CCNet-style corpus-familiarity head/middle/tail split
    (stages/text.py token_familiarity): per-doc mean corpus token
    frequency bucketed around the occurrence-weighted corpus mean.
    Exact int counts + two IEEE float ops per row keep the whole chain
    hash-exact under the SQL replay."""
    import ray.data as rd

    from ..stages.text import token_familiarity

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = token_familiarity(ds, tail_factor=0.97).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_vocab(sf_dir: str):
    """Corpus vocabulary (stages/text.py vocab_count): token frequency
    table, n >= 10 — per-block distinct-token partials, one hash combine."""
    import ray.data as rd

    from ..stages.text import vocab_count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = vocab_count(ds, min_count=10).to_pandas()
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("token").reset_index(drop=True)


def q_doc_frequency(sf_dir: str):
    """Token document frequency (stages/text.py doc_frequency) — the exact
    DF leg of TF-IDF, df >= 10."""
    import ray.data as rd

    from ..stages.text import doc_frequency

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = doc_frequency(ds, min_df=10).to_pandas()
    out["df"] = out["df"].astype(np.int64)
    return out.sort_values("token").reset_index(drop=True)


def q_top_terms(sf_dir: str):
    """Most distinctive term per document (stages/text.py top_terms):
    integer-exact TF-IDF argmax — (tf DESC, df ASC, token ASC).  DF table
    broadcast; the doc stream never shuffles."""
    import ray.data as rd

    from ..stages.text import top_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    out = top_terms(ds).to_pandas()
    for c in ("doc_id", "tf", "df"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pmi(sf_dir: str):
    """Bigram PMI association (stages/text.py pmi_bigrams): ratio
    N*c_ab/(c_a*c_b) emitted instead of its log — one IEEE division,
    bit-exact vs SQL; log is monotone so rankings are unchanged."""
    import ray.data as rd

    from ..stages.text import pmi_bigrams

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    out = pmi_bigrams(ds, min_count=5)
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values("ngram").reset_index(drop=True)


def q_hop_window(sf_dir: str):
    """Hopping-window aggregate (stages/windows.py): 1-hour windows
    sliding every 15 minutes over the events stream — per-batch window
    expansion fused with partial aggregation, one hash combine."""
    import ray.data as rd

    from ..stages.windows import hop_windows

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])
    out = hop_windows(ds, ts="ts", width_us=3_600_000_000,
                      slide_us=900_000_000, mode="hash").to_pandas()
    out = out.sort_values("win").reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    out["sum_value"] = out["sum_value"].round(6)
    return out[["win", "window_start", "n", "sum_value"]]


def q_raster_zonal(sf_dir: str):
    """Raster<->vector zonal stats (stages/raster.py): a deterministic
    64x64 dyadic-valued world raster sampled at every geotagged page,
    aggregated per res-4 zone cell.  Values are multiples of 2^-10 so
    partial sums are exact in any order — the SQL oracle matches with no
    rounding."""
    from ..stages.raster import make_test_raster, raster_zonal

    ds = _pages_geo(sf_dir)
    out = raster_zonal(ds, make_test_raster(64, 64), res=4).to_pandas()
    out = out.sort_values("cell").reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    return out[["cell", "n", "sum_value", "mean_value"]]


def q_focal_mean(sf_dir: str):
    """Focal (neighborhood) smoothing over the res-6 cell grid
    (stages/raster.py focal_mean): each occupied cell's weight mean over
    its Chebyshev-1 ring, from point data in one shuffle.  Dyadic
    weights sum exactly in any order; the mean is one IEEE division —
    the SQL oracle (offset cross join with lng wrap + lat drop) matches
    bit-for-bit."""
    from ..stages.raster import focal_mean

    ds = _pages_geo(sf_dir)
    out = focal_mean(ds, res=RES, value_col="weight", k=1).to_pandas()
    return out.sort_values("cell").reset_index(drop=True)


def _acctbal_bands(sf_dir: str) -> pa.Table:
    """Deterministic overlapping value bands derived from `nation` (step
    400 < width 700, so adjacent bands overlap and customers can land in
    0, 1 or 2 bands) — both engine and SQL oracle derive the same table."""
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    key = nat["n_nationkey"].to_numpy().astype(np.float64)
    return pa.table({
        "band_id": pa.array(key.astype(np.int64)),
        "lo": pa.array(key * 400.0 - 1000.0),
        "hi": pa.array(key * 400.0 - 300.0),
    })


def q_range_join(sf_dir: str):
    """Broadcast range join (stages/range_join.py): customer acctbal into
    overlapping rating bands; intervals ship once, probe side streams,
    chunked containment matrix per batch — no shuffle."""
    import ray.data as rd

    from ..stages.range_join import range_join

    bands = _acctbal_bands(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_acctbal"])
    out = range_join(ds, bands, "c_acctbal", payload=["band_id"],
                     closed="left").to_pandas()
    out = out.sort_values(["c_custkey", "band_id"]).reset_index(drop=True)
    out["c_acctbal"] = out["c_acctbal"].round(2)
    return out[["c_custkey", "c_acctbal", "band_id"]]


def q_range_join_big(sf_dir: str):
    """Big x big range join (value-axis bucketing + one hash shuffle);
    same bands, same answer as q_range_join, through the groupby path."""
    import ray.data as rd

    from ..stages.range_join import range_join_bucketed

    bands = _acctbal_bands(sf_dir)
    pts = rd.read_parquet(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_acctbal"])
    out = range_join_bucketed(
        pts, rd.from_arrow(bands), "c_acctbal", bucket_width=500.0,
        point_payload=["c_custkey"], interval_payload=["band_id"],
        closed="left").to_pandas()
    out["c_custkey"] = out["c_custkey"].astype(np.int64)
    out["band_id"] = out["band_id"].astype(np.int64)
    out = out.sort_values(["c_custkey", "band_id"]).reset_index(drop=True)
    out["c_acctbal"] = out["c_acctbal"].round(2)
    return out[["c_custkey", "c_acctbal", "band_id"]]


def q_session_windows_bucketed(sf_dir: str):
    """Hot-key-safe sessionization (local sessions per time bucket +
    summary merge) — same answer and window-function oracle as
    q_session_windows."""
    import ray.data as rd

    from ..stages.windows import session_windows_bucketed

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])
    out = session_windows_bucketed(ds, key="user_id", ts="ts",
                                   gap_us=7_200_000_000,
                                   value="value").to_pandas()
    out = out.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    out["sum_value"] = out["sum_value"].round(6)
    return out[["user_id", "session_start", "n", "sum_value"]]


def q_ann_ivf(sf_dir: str):
    """IVF approximate top-k (rows-only: recall < 1 by construction;
    pytest pins nprobe==n_centroids == exact brute-force ranking)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.ann import ivf_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qtab = emb.filter(pa.compute.less(emb["vec_id"], 10))
    queries = {
        "id": qtab["vec_id"].to_numpy(zero_copy_only=False),
        "matrix": np.stack([np.asarray(v, dtype=np.float64)
                            for v in qtab["embedding"].to_pylist()]),
    }
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    got = ivf_topk(ds, queries, k=5, n_centroids=16, nprobe=8).to_pandas()
    got["cosine"] = got["cosine"].round(4)
    got["rank"] = got["rank"].astype(np.int64)
    return got.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_ann_ivf_pruned(sf_dir: str):
    """Centroid-partitioned IVF index with READ-time block pruning
    (stages/ann.py build_ivf_index + ivf_search).  The query searches at
    full probe (== exact brute-force ranking, under the same SQL oracle
    as ann_cosine) and ASSERTS that a partial-probe search of the same
    index reads strictly fewer parquet files than the layout holds — the
    measured fragment-pruning win the flat ivf_topk path lacks."""
    import tempfile

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.ann import build_ivf_index, ivf_search

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qtab = emb.filter(pa.compute.less(emb["vec_id"], 10))
    queries = {
        "id": qtab["vec_id"].to_numpy(zero_copy_only=False),
        "matrix": np.stack([np.asarray(v, dtype=np.float64)
                            for v in qtab["embedding"].to_pylist()]),
    }
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    import shutil

    idx = tempfile.mkdtemp(prefix="fcr_ivf_")
    try:
        build_ivf_index(ds, idx, n_centroids=16)
        part, pstats = ivf_search(idx, queries, k=10, nprobe=4)
        if not pstats["files_read"] < pstats["files_total"]:
            raise AssertionError(
                f"IVF partial probe read {pstats['files_read']} of "
                f"{pstats['files_total']} files - no block pruning")
        full, _ = ivf_search(idx, queries, k=10, nprobe=16)
        got = full.to_pandas()
    finally:
        # the index dir holds a full partitioned copy of the embeddings
        # table — repeated oracle runs would fill /tmp without this
        shutil.rmtree(idx, ignore_errors=True)
    got["r4"] = got["cosine"].round(4)
    got = got.sort_values(["query_id", "r4", "neighbor_id"],
                          ascending=[True, False, True])
    got = got.groupby("query_id", group_keys=False).head(5)
    got["rank"] = got.groupby("query_id").cumcount() + 1
    out = got[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
    out["rank"] = out["rank"].astype(np.int64)
    return out


def q_image_features(sf_dir: str):
    """REAL image decode through the actor-pool stage: a deterministic
    4x4 P6 PPM is synthesized per doc (pixel j channel value =
    ``(doc_id * 2654435761 + j * 40503) % 256``), decoded by the
    pure-NumPy netpbm codec (stages/multimodal.py decode_ppm), and the
    per-channel means are reconstructed to integer pixel SUMS (exact:
    16 px/channel, and float64 division by 16 is lossless) — so the
    whole decode path sits under a hash-exact SQL replay of the pixel
    formula."""
    import ray.data as rd

    from ..stages import ImageDecode
    from ..stages.multimodal import encode_ppm

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_media(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = np.arange(48, dtype=np.int64)
        vals = ((d[:, None] * 2654435761 + j[None, :] * 40503) % 256)
        payloads = [encode_ppm(v.astype(np.uint8).reshape(4, 4, 3))
                    for v in vals]
        return pa.table({
            "media_id": batch["doc_id"],
            "payload": pa.array(payloads, type=pa.binary()),
        })

    media = ds.map_batches(to_media, batch_format="pyarrow")
    feats = ImageDecode.apply(media)  # real PPM decode, no fake

    def summarize(batch: pa.Table) -> pa.Table:
        m = np.stack([np.asarray(f) for f in batch["features"].to_pylist()])
        return pa.table({
            "media_id": batch["media_id"],
            "height": pa.array(m[:, 0].astype(np.int64)),
            "width": pa.array(m[:, 1].astype(np.int64)),
            "sum_r": pa.array(np.rint(m[:, 4] * 16).astype(np.int64)),
            "sum_g": pa.array(np.rint(m[:, 5] * 16).astype(np.int64)),
            "sum_b": pa.array(np.rint(m[:, 6] * 16).astype(np.int64)),
        })

    return feats.map_batches(summarize, batch_format="pyarrow")


def _xy_events(sf_dir: str):
    """Events with the synthetic deterministic 1024-grid positions
    (same multiply/mod as _trajectory_events)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def posify(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": batch["user_id"],
            "ts": batch["ts"].cast(pa.int64()),
            "event_id": pa.array(eid, type=pa.int64()),
            "x": pa.array((eid * 2654435761) % 1024, type=pa.int64()),
            "y": pa.array((eid * 40503 + 12345) % 1024, type=pa.int64()),
        })

    return ds.map_batches(posify, batch_format="pyarrow")


def q_knox(sf_dir: str):
    """Knox space-time interaction count (stages/knox.py): pairs
    adjacent on the 8x8 event grid within a 1-hour gap, counted with
    home/probe bucket expansion and canonical attribution — no pair
    shuffle, no all-pairs scan.  Oracle: brute range self-join."""
    from ..stages.knox import knox_pairs

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_id"])

    def cellify(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 2654435761) % 1024
        y = (eid * 40503 + 12345) % 1024
        return batch.append_column("cell", pa.array((x // 128) * 8 + y // 128))

    return knox_pairs(ds.map_batches(cellify, batch_format="pyarrow"),
                      tau_us=3_600_000_000, n_grid=8)


def q_od_gravity(sf_dir: str):
    """Gravity-model deviation over the OD matrix (stages/retention.py
    od_gravity): ratio of observed corridor flow to the independence
    expectation from the matrix's own margins — one IEEE division of
    exact int counts; margins finish on the summary-sized matrix."""
    from ..stages.retention import od_gravity

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def cellify(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 2654435761) % 1024
        y = (eid * 40503 + 12345) % 1024
        return batch.append_column("cell", pa.array((x // 128) * 8 + y // 128))

    return od_gravity(ds.map_batches(cellify, batch_format="pyarrow"))


def q_stay_points(sf_dir: str):
    """Maximal same-cell runs per user on the synthetic 8x8 event grid
    (stages/staypoints.py): vectorized gaps-and-islands after one key
    shuffle; oracle = the same islands construction in window SQL."""
    from ..stages.staypoints import stay_points

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def cellify(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 2654435761) % 1024
        y = (eid * 40503 + 12345) % 1024
        return batch.append_column("cell", pa.array((x // 256) * 4 + y // 256))

    out = stay_points(
        ds.map_batches(cellify, batch_format="pyarrow"),
        min_events=2).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["user_id", "cell", "start_id",
                                     "end_id", "start_us", "end_us",
                                     "n_events", "span_us"])
    return out.sort_values(["user_id", "start_id"]).reset_index(drop=True)


def q_attribution(sf_dir: str):
    """Last-touch attribution of purchases to clicks within a 3-day
    lookback (stages/attribution.py): vectorized running-max scan per
    user after one key shuffle — the SQL oracle's conversions x sources
    join is exactly what the operator avoids at scale."""
    from ..stages.attribution import last_touch_attribution

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id",
                                  "event_type"])
    out = last_touch_attribution(
        ds, source_types=["click"], conversion_types=["purchase"],
        lookback_us=3 * 86_400_000_000).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["user_id", "conv_id", "conv_us",
                                     "src_id", "src_us", "gap_us"])
    return out.sort_values(["user_id", "conv_id"]).reset_index(drop=True)


def q_local_autocorr(sf_dir: str):
    """Local Moran's I (LISA) per occupied res-6 cell
    (stages/autocorr.py local_autocorr): exact scaled-integer
    numerators, one float chain for the statistic — hash-exact vs the
    HUGEINT SQL replay."""
    from ..stages.autocorr import local_autocorr

    ds = _pages_geo(sf_dir)
    out = local_autocorr(ds, res=RES)
    if hasattr(out, "to_pandas"):   # hash path returns a Dataset
        out = out.to_pandas()
    return out.sort_values("cell").reset_index(drop=True)


def q_zorder(sf_dir: str):
    """Morton locality keys over the synthetic 1024-grid positions
    (stages/zorder.py): pure per-batch bit interleave, replayed by a
    generated power-of-two SQL expansion — hash-exact."""
    from ..stages.zorder import zorder_key

    ds = zorder_key(_xy_events(sf_dir), bits=10)
    return ds.select_columns(["event_id", "x", "y", "zkey"])


def q_hilbert(sf_dir: str):
    """Hilbert curve locality keys over the synthetic 1024-grid
    positions (stages/zorder.py hilbert_key): the xy2d bit walk restated
    with per-level [0, s) reduction so every intermediate is nonnegative
    — replayed bit-for-bit by a generated CTE chain (no bit intrinsics).
    Strictly better box-locality than Morton (no diagonal jumps)."""
    from ..stages.zorder import hilbert_key

    ds = hilbert_key(_xy_events(sf_dir), bits=10)
    return ds.select_columns(["event_id", "x", "y", "hkey"])


def q_rdp_simplify(sf_dir: str):
    """Per-user RDP polyline simplification (stages/simplify.py) at
    eps=256 on the synthetic 1024-grid paths.  Recursive argmax
    splitting is not SQL-expressible — rows-only driver check; pytest
    pins the kernel against an independent recursive reference."""
    from ..stages.simplify import rdp_simplify

    out = rdp_simplify(_xy_events(sf_dir), eps=256).to_pandas()
    return out.sort_values(["user_id", "t", "event_id"]).reset_index(
        drop=True)


def q_convex_hulls(sf_dir: str):
    """Per-user convex hull vertex SET (stages/simplify.py): monotone
    chain per entity after one key shuffle of slim int rows.  The SQL
    oracle uses the exact corner characterization (exists a companion
    point with every other point strictly left or collinear-ahead) —
    hash-exact on the vertex set."""
    from ..stages.simplify import convex_hulls

    out = convex_hulls(_xy_events(sf_dir)).to_pandas()
    out = out[["user_id", "x", "y"]].drop_duplicates()
    return out.sort_values(["user_id", "x", "y"]).reset_index(drop=True)


def q_colocation(sf_dir: str):
    """Spatial co-location lift per event-type pair on the synthetic
    8x8 event grid (stages/colocation.py): distinct (cell,label) shrink
    -> ONE cell shuffle -> label/pair marker combine; lift is one IEEE
    division of exact ints, hash-exact vs the self-join SQL."""
    from ..stages.colocation import colocation

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type"])

    def cellify(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 2654435761) % 1024
        y = (eid * 40503 + 12345) % 1024
        return pa.table({
            "cell": pa.array((x // 128) * 8 + y // 128, type=pa.int64()),
            "label": batch["event_type"],
        })

    return colocation(ds.map_batches(cellify, batch_format="pyarrow"))


def q_interval_join(sf_dir: str):
    """Interval-overlap join (stages/interval_join.py): deterministic
    event intervals (dur from the event-id hash), even ids vs odd ids.
    One bucket-keyed shuffle; canonical-bucket attribution means no
    pair-dedupe shuffle exists.  Oracle: the plain non-equi cross
    join."""
    from ..stages.interval_join import interval_join

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts"])

    def to_iv(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        s = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dur = ((eid * 2654435761) % 1024 + 1) * 1_000_000
        return pa.table({
            "id": pa.array(eid, type=pa.int64()),
            "s": pa.array(s, type=pa.int64()),
            "e": pa.array(s + dur, type=pa.int64()),
            "side": pa.array((eid % 2).astype(np.int8)),
        })

    out = interval_join(ds.map_batches(to_iv, batch_format="pyarrow"),
                        side_col="side",
                        bucket_width=1024 * 1_000_000).to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_zscore_outliers(sf_dir: str):
    """Per-language document-length anomalies (stages/stats.py
    zscore_outliers): integer moment partials -> broadcast (mu, k^2*var)
    scalars -> one vectorized filter pass.  Both sides evaluate the same
    IEEE op chain, so the row set and zscore column hash-match."""
    from ..stages.stats import zscore_outliers

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "text"])

    def with_len(batch: pa.Table) -> pa.Table:
        ln = pa.compute.utf8_length(batch["text"]).cast(pa.int64())
        return pa.table({"doc_id": batch["doc_id"], "lang": batch["lang"],
                         "len": ln})

    out = zscore_outliers(
        ds.map_batches(with_len, batch_format="pyarrow"),
        group="lang", value="len", k=1.5).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_geofence_dwell(sf_dir: str):
    """Per-visit dwell intervals inside the box fence (stages/geofence.py
    geofence_dwell): enter/exit pairing happens inside the same per-key
    group pass as transition detection — no second shuffle.  Oracle:
    lag+lead window SQL over the same transitions."""
    from ..stages.geofence import box_fence, geofence_dwell

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def cellify(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 2654435761) % 1024
        y = (eid * 40503 + 12345) % 1024
        return batch.append_column("cell", pa.array((x // 128) * 8 + y // 128))

    fence = box_fence(2, 5, 3, 6, n_grid=8)
    out = geofence_dwell(
        ds.map_batches(cellify, batch_format="pyarrow"), fence).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["user_id", "enter_id", "exit_id",
                                     "enter_us", "exit_us", "dwell_us"])
    return out.sort_values(["user_id", "enter_id"]).reset_index(drop=True)


def q_geofence_bucketed(sf_dir: str):
    """Hot-key-safe geofence transitions (stages/geofence.py
    geofence_events_bucketed): bit-identical to q_geofence under the
    same lag-window oracle; span/width-bounded group tasks + boundary
    merge instead of one group per entity."""
    from ..stages.geofence import box_fence, geofence_events_bucketed

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def cellify(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 2654435761) % 1024
        y = (eid * 40503 + 12345) % 1024
        return batch.append_column("cell", pa.array((x // 128) * 8 + y // 128))

    fence = box_fence(2, 5, 3, 6, n_grid=8)
    out = geofence_events_bucketed(
        ds.map_batches(cellify, batch_format="pyarrow"), fence,
        bucket_width=86_400_000_000).to_pandas()
    if out.empty:
        return pd.DataFrame(columns=["user_id", "event_id", "ts_us",
                                     "transition"])
    out["transition"] = out["transition"].astype(str)
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def q_cms_users(sf_dir: str):
    """Count-Min register table over event user ids (stages/sketch.py
    cms_registers): counter increments are exact integer functions of
    the input multiset and sum-mergeable, so the sketch itself is
    hash-checked against a SQL replay of the per-row splitmix64
    column addressing; only cms_query (pytest-pinned no-underestimate
    property) is approximate."""
    from ..stages.sketch import cms_registers

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    out = cms_registers(ds, "user_id", width=512, depth=3).to_pandas()
    return out.sort_values(["row", "col"]).reset_index(drop=True)


def q_hll_users(sf_dir: str):
    """HyperLogLog register table over event user ids (stages/sketch.py
    hll_registers): registers are exact integer functions of the input
    set, so the sketch itself is hash-checked against a SQL replay of
    the splitmix64 hash + exact bin()-based leading-zero count; only
    hll_estimate (pytest-pinned error bound) is approximate."""
    from ..stages.sketch import hll_registers

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    out = hll_registers(ds, "user_id", p=10).to_pandas()
    out = out.astype({"bucket": np.int64, "max_rho": np.int64})
    return out.sort_values("bucket").reset_index(drop=True)


def q_geofence(sf_dir: str):
    """Geofence entry/exit events (stages/geofence.py): broadcast
    fence-cell membership evaluated before the one key-keyed shuffle;
    the lag-window SQL oracle evaluates the same box by integer
    inequality — two independent membership paths, hash-exact."""
    from ..stages.geofence import box_fence, geofence_events

    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_id"])

    def cellify(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 2654435761) % 1024
        y = (eid * 40503 + 12345) % 1024
        return batch.append_column("cell", pa.array((x // 128) * 8 + y // 128))

    fence = box_fence(2, 5, 3, 6, n_grid=8)
    out = geofence_events(
        ds.map_batches(cellify, batch_format="pyarrow"), fence).to_pandas()
    if out.empty:   # schema is lost at to_pandas on an all-quiet stream
        return pd.DataFrame(columns=["user_id", "event_id", "ts_us",
                                     "transition"])
    out["transition"] = out["transition"].astype(str)
    return out.sort_values(["user_id", "event_id"]).reset_index(drop=True)


def q_spatial_autocorr(sf_dir: str):
    """Global Moran's I of per-cell page counts at res 6 with queen
    adjacency (stages/autocorr.py): six exact int64 sufficient
    statistics + one final float division, so the HUGEINT SQL oracle
    matches bit-for-bit.  One cell-keyed combine; points never
    shuffle."""
    from ..stages.autocorr import spatial_autocorr

    ds = _pages_geo(sf_dir)
    return spatial_autocorr(ds, res=RES)


# ----------------------------------------------------------------------
# oracle SQL


def _zorder_sql() -> str:
    from ..stages.zorder import zorder_sql

    return (
        "WITH p AS (SELECT event_id, "
        "(event_id * 2654435761) % 1024 AS x, "
        "(event_id * 40503 + 12345) % 1024 AS y FROM events) "
        f"SELECT event_id, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y, "
        f"{zorder_sql('x', 'y', 10)} AS zkey FROM p")


def _hilbert_sql() -> str:
    from ..stages.zorder import hilbert_sql

    return (
        "WITH p AS (SELECT event_id, "
        "(event_id * 2654435761) % 1024 AS x, "
        "(event_id * 40503 + 12345) % 1024 AS y FROM events), "
        + hilbert_sql("p", "event_id, x, y", "x", "y", 10)
        .replace("SELECT event_id, x, y, hd AS hkey",
                 "SELECT event_id, CAST(x AS BIGINT) AS x, "
                 "CAST(y AS BIGINT) AS y, hd AS hkey"))


def _quadtree_sql(min_res: int = 2, res: int = 6,
                  thr: int = 24) -> str:
    """Per-level CTE chain replaying quadtree_leaves: max-res counts,
    integer parent rollups, split/candidate/leaf per level."""
    geo = _geo_sql_base()
    n6 = 1 << res
    parts = [f"base AS ({geo})",
             f"p6 AS (SELECT {_cell_sql()} AS cell FROM base "
             "WHERE lat IS NOT NULL)",
             f"c{res} AS (SELECT cell, CAST(count(*) AS BIGINT) AS n "
             f"FROM p6 GROUP BY 1)"]
    for r in range(min_res, res):
        sh = 1 << (res - r)
        parts.append(
            f"c{r} AS (SELECT ((cell // {n6}) // {sh}) * {1 << r} "
            f"+ ((cell % {n6}) // {sh}) AS cell, "
            f"CAST(sum(n) AS BIGINT) AS n FROM c{res} GROUP BY 1)")
    parts.append(f"split{min_res} AS (SELECT cell FROM c{min_res} "
                 f"WHERE n > {thr})")
    parts.append(f"leaf{min_res} AS (SELECT cell, "
                 f"CAST({min_res} AS BIGINT) AS res, n FROM c{min_res} "
                 f"WHERE n <= {thr})")
    for r in range(min_res + 1, res + 1):
        nr, npp = 1 << r, 1 << (r - 1)
        parts.append(
            f"cand{r} AS (SELECT c.cell, c.n FROM c{r} c "
            f"JOIN split{r - 1} s ON ((c.cell // {nr}) // 2) * {npp} "
            f"+ ((c.cell % {nr}) // 2) = s.cell)")
        if r < res:
            parts.append(f"split{r} AS (SELECT cell FROM cand{r} "
                         f"WHERE n > {thr})")
            parts.append(f"leaf{r} AS (SELECT cell, "
                         f"CAST({r} AS BIGINT) AS res, n FROM cand{r} "
                         f"WHERE n <= {thr})")
        else:
            parts.append(f"leaf{r} AS (SELECT cell, "
                         f"CAST({r} AS BIGINT) AS res, n FROM cand{r})")
    union = " UNION ALL ".join(
        f"SELECT * FROM leaf{r}" for r in range(min_res, res + 1))
    return "WITH " + ", ".join(parts) + " " + union


def _cell_mixture_sql() -> str:
    from ..stages.sample import mixture_sample_sql

    geo = _geo_sql_base()
    cell = _cell_sql()
    inner = (f"(SELECT doc_id, {cell} AS cell FROM ({geo}) g "
             "WHERE lat IS NOT NULL)")
    return ("SELECT doc_id, cell FROM ("
            + mixture_sample_sql(inner, "cell", 5, "doc_id") + ") q")


def _cms_sql(width: int = 512, depth: int = 3) -> str:
    """Bit-exact SQL replay of cms_registers: one UNION ALL leg per hash
    row, column = mix64(user_id, seed=row+1) % width in UBIGINT."""
    from ..stages.sample import mix64_sql

    legs = []
    for j in range(depth):
        z = mix64_sql("user_id", j + 1)
        legs.append(f"SELECT CAST({j} AS BIGINT) AS row, "
                    f"CAST({z} % {width} AS BIGINT) AS col FROM events")
    u = " UNION ALL ".join(legs)
    return (f"WITH a AS ({u}) SELECT row, col, "
            "CAST(count(*) AS BIGINT) AS n FROM a GROUP BY 1, 2")


def _hll_sql(p: int = 10, seed: int = 0) -> str:
    """Bit-exact SQL replay of hll_registers: the splitmix64 mix64 hash
    in HUGEINT mod-2^64 arithmetic, bucket/remainder by shift/mask, and
    the leading-zero count via length(bin(rem)) — DuckDB's bin() is an
    exact integer-to-binary string, so no float log2 is involved."""
    from ..stages.sample import mix64_sql

    w = 64 - p
    mask = (1 << w) - 1
    z = mix64_sql("user_id", seed)
    return (
        f"WITH h AS (SELECT {z} AS z FROM events), "
        f"r AS (SELECT CAST(z >> {w} AS BIGINT) AS bucket, "
        f"CAST(z & CAST({mask} AS UBIGINT) AS BIGINT) AS rem FROM h) "
        f"SELECT bucket, CAST(max(CASE WHEN rem = 0 THEN {w + 1} "
        f"ELSE {w + 1} - length(bin(rem)) END) AS BIGINT) AS max_rho "
        f"FROM r GROUP BY bucket"
    )


def _cutflow_sql() -> str:
    base = _geo_sql_base()
    c1 = "(lang = 'en')"
    g0 = "(lat > 0.0)"
    g1 = "(lng < 0.0)"
    anym = f"({g0} OR {g1})"
    final = f"({c1} AND {anym})"

    def row(uid, depth, cut, excl, incl, tot):
        def cnt(cond):
            if cond is None:
                return "CAST(count(*) AS BIGINT)"
            return f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"

        def wsum(cond):
            if cond is None:
                return "sum(weight)"
            return f"sum(CASE WHEN {cond} THEN weight ELSE 0.0 END)"

        cut_sql = cut.replace("'", "''")
        return (
            f"SELECT '{uid}' AS unique_id, CAST({depth} AS BIGINT) AS depth, "
            f"'{cut_sql}' AS cut, "
            f"{cnt(excl)} AS passed_only_cut, {wsum(excl)} AS passed_only_cut_weight, "
            f"{cnt(incl)} AS passed_incl, {wsum(incl)} AS passed_incl_weight, "
            f"{cnt(tot)} AS totals_incl, {wsum(tot)} AS totals_incl_weight "
            f"FROM base"
        )

    rows = [
        row("0", 0, "All", final, final, None),
        row("0,0", 1, "lang == 'en'", c1, c1, None),
        row("0,1", 1, "Any", anym, final, c1),
        row("0,1,0", 2, "lat > 0.0", g0, f"({g0} AND {c1})", c1),
        row("0,1,1", 2, "lng < 0.0", g1, f"({anym} AND {c1})", c1),
    ]
    return f"WITH base AS ({base}) " + " UNION ALL ".join(rows)


def _multi_cutflow_sql() -> str:
    """Two-dataset cut-flow: 'mc_even' weighted, 'data_odd' raw counts in
    the weighted slots (filters.py:48-50)."""
    base = _geo_sql_base()
    c1 = "(lang = 'en')"
    g0 = "(lat > 0.0)"
    g1 = "(lng < 0.0)"
    anym = f"({g0} OR {g1})"
    final = f"({c1} AND {anym})"

    def rows_for(src: str, dataset: str, is_mc: bool) -> list:
        def cnt(cond):
            if cond is None:
                return "CAST(count(*) AS BIGINT)"
            return f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)"

        def wsum(cond):
            if not is_mc:  # data: raw counts fill the weighted slots
                if cond is None:
                    return "CAST(count(*) AS DOUBLE)"
                return f"CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DOUBLE)"
            if cond is None:
                return "sum(weight)"
            return f"sum(CASE WHEN {cond} THEN weight ELSE 0.0 END)"

        def row(uid, depth, cut, excl, incl, tot):
            cut_sql = cut.replace("'", "''")
            return (
                f"SELECT '{dataset}' AS dataset, '{uid}' AS unique_id, "
                f"CAST({depth} AS BIGINT) AS depth, '{cut_sql}' AS cut, "
                f"{cnt(excl)} AS passed_only_cut, {wsum(excl)} AS passed_only_cut_weight, "
                f"{cnt(incl)} AS passed_incl, {wsum(incl)} AS passed_incl_weight, "
                f"{cnt(tot)} AS totals_incl, {wsum(tot)} AS totals_incl_weight "
                f"FROM {src}"
            )

        return [
            row("0", 0, "All", final, final, None),
            row("0,0", 1, "lang == 'en'", c1, c1, None),
            row("0,1", 1, "Any", anym, final, c1),
            row("0,1,0", 2, "lat > 0.0", g0, f"({g0} AND {c1})", c1),
            row("0,1,1", 2, "lng < 0.0", g1, f"({anym} AND {c1})", c1),
        ]

    rows = (rows_for("mc_even", "mc_even", True)
            + rows_for("data_odd", "data_odd", False))
    return (
        f"WITH base AS ({base}), "
        f"mc_even AS (SELECT * FROM base WHERE doc_id % 2 = 0), "
        f"data_odd AS (SELECT * FROM base WHERE doc_id % 2 = 1) "
        + " UNION ALL ".join(rows))


def _lang_id_sql() -> str:
    """lang_id oracle: the SAME stopword table (single source of truth:
    stages.text._STOPWORDS) as a VALUES join, per-language occurrence
    counts, argmax with the engine's (count DESC, lang) tie-break, 'und'
    when nothing scores."""
    from ..stages.text import _STOPWORDS

    vals = ", ".join(
        f"('{lang}', '{w}')"
        for lang in sorted(_STOPWORDS) for w in sorted(_STOPWORDS[lang]))
    return (
        "WITH d AS (SELECT doc_id, regexp_split_to_array("
        "lower(coalesce(text, '')), '\\s+') AS toks FROM documents), "
        "u AS (SELECT doc_id, unnest(toks) AS w FROM d), "
        f"sw(lang, w) AS (SELECT * FROM (VALUES {vals})), "
        "hits AS (SELECT u.doc_id, sw.lang, count(*) AS c "
        "FROM u JOIN sw ON u.w = sw.w GROUP BY 1, 2), "
        "best AS (SELECT doc_id, lang, row_number() OVER ("
        "PARTITION BY doc_id ORDER BY c DESC, lang) AS rk FROM hits) "
        "SELECT d.doc_id, coalesce(b.lang, 'und') AS lang_pred "
        "FROM d LEFT JOIN (SELECT doc_id, lang FROM best WHERE rk = 1) b "
        "USING (doc_id)")


#: 2^64 as a HUGEINT literal (uint64 wrap modulus) and FNV-1a constants,
#: shared by the hash-replay oracles below.
_POW64 = "18446744073709551616::HUGEINT"
_FNV_P = 1099511628211
_FNV_OFF = 14695981039346656037


def _minhash_corpus_sig_sql(mh: "MinHashDedup") -> str:
    """CTE prefix computing the neardup-corpus MinHash signature table
    ``sig(doc_id, k, v)`` in pure SQL — the same math as
    ``MinHashDedup.signature_batch``: lowercase whitespace tokenization,
    chr(0) padding to the shingle width, sha256-prefix token hashes, the
    FNV-multiplier rolling shingle hash mod 2^64, distinct shingles, and
    min over the universal-hash family (a*x+b) mod (2^31-1) whose a/b
    coefficients (seeded numpy PRNG) are embedded as literals."""
    p = (1 << 31) - 1
    a_list = "[" + ",".join(str(int(v)) for v in mh.a) + "]"
    b_list = "[" + ",".join(str(int(v)) for v in mh.b) + "]"
    w = mh.shingle_width
    return (
        "WITH corpus AS ("
        "SELECT doc_id, text FROM documents "
        "UNION ALL "
        "SELECT doc_id + 10000000, text || ' near duplicate suffix tokens' "
        "FROM documents WHERE doc_id % 10 = 0), "
        "toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "lower(coalesce(text, '')), '\\s+'), t -> t != '') AS t0 FROM corpus), "
        f"padded AS (SELECT doc_id, list_concat(t0, list_transform("
        f"range(greatest(0, {w} - len(t0))), x -> chr(0))) AS t FROM toks), "
        "th AS (SELECT doc_id, list_transform(t, s -> "
        "('0x' || substring(sha256(s), 1, 16))::UBIGINT) AS h FROM padded), "
        "sh AS (SELECT DISTINCT doc_id, CAST(("
        f"(h[i]::HUGEINT * {_FNV_P} + h[i+1]) % {_POW64} "
        f"* {_FNV_P} + h[i+2]) % {_POW64} AS UBIGINT) AS shingle "
        "FROM th, unnest(range(1, len(h) - 1)) AS u(i)), "
        f"perms AS (SELECT unnest(range({mh.num_perm})) AS k, "
        f"unnest({a_list}) AS a, unnest({b_list}) AS b), "
        "sig AS (SELECT doc_id, k, "
        f"min((a * (shingle % {p}) + b) % {p}) AS v "
        "FROM sh CROSS JOIN perms GROUP BY doc_id, k)")


def _minhash_verified_cte(mh: "MinHashDedup") -> str:
    """CTE chain ending in ``verified(id_a, id_b, est_jaccard)``: FNV
    band-key fold over each band's rows_per_band signature values ->
    equi-join candidates -> equality-fraction verification."""
    r = mh.rows_per_band
    return (
        _minhash_corpus_sig_sql(mh) + ", "
        f"bands AS (SELECT doc_id, CAST(k // {r} AS INTEGER) AS band, "
        f"list_reduce(list_prepend({_FNV_OFF}::UBIGINT, "
        "list(CAST(v AS UBIGINT) ORDER BY k)), "
        f"(acc, x) -> CAST((CAST(xor(acc, x) AS HUGEINT) * {_FNV_P}) "
        f"% {_POW64} AS UBIGINT)) AS band_key "
        "FROM sig GROUP BY doc_id, band), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM bands a JOIN bands b "
        "ON a.band = b.band AND a.band_key = b.band_key "
        "WHERE a.doc_id < b.doc_id), "
        "verified AS (SELECT c.id_a, c.id_b, "
        "CAST(sum(CASE WHEN s1.v = s2.v THEN 1 ELSE 0 END) AS DOUBLE) "
        f"/ {mh.num_perm} AS est_jaccard "
        "FROM cand c JOIN sig s1 ON s1.doc_id = c.id_a "
        "JOIN sig s2 ON s2.doc_id = c.id_b AND s2.k = s1.k "
        "GROUP BY c.id_a, c.id_b "
        f"HAVING est_jaccard >= {mh.threshold})")


def _minhash_pairs_sql() -> str:
    """minhash_pairs oracle: the verified-pair CTE chain at the query's
    threshold (0.5)."""
    mh = MinHashDedup("minhash", threshold=0.5)
    return (_minhash_verified_cte(mh)
            + " SELECT id_a, id_b, est_jaccard FROM verified")


def _near_dedup_sql() -> str:
    """near_dedup oracle: connected components over the verified MinHash
    pair set (recursive min-reachability CTE over the symmetric edge
    closure — the SQL analogue of ``dedup.cluster_pairs``'s union-find),
    then drop every corpus doc that is not its component's minimum id."""
    mh = MinHashDedup("near_dedup", threshold=0.5)
    return (
        _minhash_verified_cte(mh).replace("WITH ", "WITH RECURSIVE ", 1) + ", "
        "sym AS (SELECT id_a AS a, id_b AS b FROM verified "
        "UNION ALL SELECT id_b, id_a FROM verified), "
        "reach(id, root) AS ("
        "SELECT DISTINCT a, a FROM sym "
        "UNION "
        "SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.id), "
        "comp AS (SELECT id, min(root) AS cluster FROM reach GROUP BY id) "
        "SELECT doc_id FROM corpus WHERE doc_id NOT IN "
        "(SELECT id FROM comp WHERE id != cluster)")


def _near_dedup_quality_sql() -> str:
    """near_dedup_quality oracle: the same recursive components as
    ``_near_dedup_sql``, but each cluster's survivor is its
    (token-count DESC, id ASC) winner instead of the min id."""
    mh = MinHashDedup("near_dedup", threshold=0.5)
    return (
        _minhash_verified_cte(mh).replace("WITH ", "WITH RECURSIVE ", 1) + ", "
        "sym AS (SELECT id_a AS a, id_b AS b FROM verified "
        "UNION ALL SELECT id_b, id_a FROM verified), "
        "reach(id, root) AS ("
        "SELECT DISTINCT a, a FROM sym "
        "UNION "
        "SELECT s.b, r.root FROM reach r JOIN sym s ON s.a = r.id), "
        "comp AS (SELECT id, min(root) AS cluster FROM reach GROUP BY id), "
        "sc AS (SELECT doc_id, len(list_filter(regexp_split_to_array("
        "lower(coalesce(text, '')), '\\s+'), t -> t != '')) AS n_tokens "
        "FROM corpus), "
        "best AS (SELECT id FROM ("
        "SELECT c.id, row_number() OVER (PARTITION BY c.cluster "
        "ORDER BY s.n_tokens DESC, c.id) AS rn "
        "FROM comp c JOIN sc s ON s.doc_id = c.id) WHERE rn = 1) "
        "SELECT doc_id FROM corpus WHERE doc_id NOT IN "
        "(SELECT id FROM comp) OR doc_id IN (SELECT id FROM best)")


def _decontam_cte(src: str, prefix: str = "") -> str:
    """CTE chain (no leading WITH) ending in ``<prefix>stats(doc_id,
    n_sh, n_hit)`` over source relation ``src`` — the decontamination
    shingle math replayed in SQL: the same lowercase whitespace
    tokenization, chr(0) padding to the shingle width, sha256-prefix
    token hashes and FNV-multiplier rolling window hash mod 2^64 as
    ``dedup.shingle_hashes`` (width=3), distinct per doc; eval set =
    distinct shingles of every 50th doc; n_hit = membership count of
    the doc's distinct shingles in the eval set."""
    w = 3
    p = prefix
    return (
        f"{p}toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
        f"lower(coalesce(text, '')), '\\s+'), t -> t != '') AS t0 "
        f"FROM {src}), "
        f"{p}padded AS (SELECT doc_id, list_concat(t0, list_transform("
        f"range(greatest(0, {w} - len(t0))), x -> chr(0))) AS t "
        f"FROM {p}toks), "
        f"{p}th AS (SELECT doc_id, list_transform(t, s -> "
        f"('0x' || substring(sha256(s), 1, 16))::UBIGINT) AS h "
        f"FROM {p}padded), "
        f"{p}sh AS (SELECT DISTINCT doc_id, CAST(("
        f"(h[i]::HUGEINT * {_FNV_P} + h[i+1]) % {_POW64} "
        f"* {_FNV_P} + h[i+2]) % {_POW64} AS UBIGINT) AS shingle "
        f"FROM {p}th, unnest(range(1, len(h) - 1)) AS u(i)), "
        f"{p}ev AS (SELECT DISTINCT shingle FROM {p}sh "
        "WHERE doc_id % 50 = 0), "
        f"{p}stats AS (SELECT s.doc_id, count(*) AS n_sh, "
        "sum(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS n_hit "
        f"FROM {p}sh s LEFT JOIN {p}ev e ON s.shingle = e.shingle "
        "GROUP BY s.doc_id)")


def _decontam_stats_sql() -> str:
    """decontam oracle CTE prefix over the documents table."""
    return "WITH " + _decontam_cte("documents")


def _pii_stats_sql() -> str:
    """pii_stats oracle: RE2 regexp_extract_all counts over the planted
    corpus — PII_PATTERNS is the single source of truth, shared with the
    engine stage (the patterns were chosen for bit-exact Python-re /
    RE2 agreement, pinned by tests/test_curation.py)."""
    from ..stages.pii import PII_PATTERNS

    counts = ", ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{kind}"
        for kind, (pat, _) in PII_PATTERNS.items())
    total = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))"
        for pat, _ in PII_PATTERNS.values())
    return (
        f"WITH c AS ({_PII_CORPUS_SQL}) "
        f"SELECT doc_id, {counts}, "
        f"CAST(CASE WHEN {total} > 0 THEN 1 ELSE 0 END AS BIGINT) "
        "AS has_pii FROM c")


def _pii_redact_sql() -> str:
    """pii_redact oracle: nested global regexp_replace in PII_PATTERNS
    order, hashed with DuckDB's sha256 (== hashlib, verified)."""
    from ..stages.pii import PII_PATTERNS

    red = "text"
    for pat, repl in PII_PATTERNS.values():
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return (
        f"WITH c AS ({_PII_CORPUS_SQL}) "
        f"SELECT doc_id, sha256({red}) AS redacted_sha FROM c")


def _pack_lens_sql() -> str:
    """CTE ``n1(doc_id, bucket, n)``: whitespace token counts and the
    mix-hash bucket assignment shared by the packing oracles."""
    from ..stages.sample import mix_hash_sql

    return (
        "WITH n0 AS (SELECT doc_id, CAST(len(list_filter("
        "regexp_split_to_array(coalesce(text, ''), '\\s+'), "
        "t -> t != '')) AS BIGINT) AS n FROM documents), "
        f"n1 AS (SELECT doc_id, ({mix_hash_sql('doc_id', 0)}) % {_PACK_B} "
        "AS bucket, n FROM n0 WHERE n > 0)")


def _bm25_sql() -> str:
    """bm25 oracle: the exact-int corpus stats (tf/dl/N/Σdl/df) and the
    engine's fixed order of float operations, compared rank-only."""
    k1, b, k = 1.2, 0.75, 20
    m = len(_BM25_TERMS)
    tfs = ", ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf{j}"
        for j, t in enumerate(_BM25_TERMS))
    dfs = ", ".join(
        f"CAST(sum(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df{j}"
        for j in range(m))
    score = " + ".join(
        f"greatest(ln((n - df{j} + 0.5) / (df{j} + 0.5)), 0) "
        f"* (tf{j} * ({k1} + 1.0)) "
        f"/ (tf{j} + {k1} * (1.0 - {b} + {b} * (dl / (sum_dl / n))))"
        for j in range(m))
    any_tf = " + ".join(f"tf{j}" for j in range(m))
    return (
        "WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "coalesce(text, ''), '\\s+'), x -> x != '') AS toks "
        "FROM documents), "
        f"s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, {tfs} "
        "FROM t), "
        "g AS (SELECT CAST(count(*) AS DOUBLE) AS n, "
        f"CAST(sum(dl) AS DOUBLE) AS sum_dl, {dfs} FROM s), "
        f"sc AS (SELECT doc_id, {score} AS score FROM s, g "
        f"WHERE {any_tf} > 0) "
        "SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) "
        "AS BIGINT) AS rank, doc_id FROM sc "
        f"ORDER BY score DESC, doc_id LIMIT {k}")


def _classifier_sql() -> str:
    """classifier oracle: sha256-prefix bucket hash % dim, splitmix-style
    integer weight per bucket, per-doc sum — all exact ints."""
    from ..stages.classifier import LinearTextClassifier

    clf = LinearTextClassifier(dim=65536, seed=7)
    w = clf.weight_sql("b")
    return (
        "WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "coalesce(text, ''), '\\s+'), x -> x != '') AS toks "
        "FROM documents), "
        "u AS (SELECT doc_id, unnest(toks) AS w FROM t), "
        "h AS (SELECT doc_id, CAST(('0x' || substring(sha256(w), 1, 16))"
        f"::UBIGINT % {clf.dim} AS BIGINT) AS b FROM u), "
        f"z AS (SELECT doc_id, CAST(sum({w}) AS BIGINT) AS logit "
        "FROM h GROUP BY doc_id) "
        "SELECT t.doc_id, coalesce(z.logit, 0) AS logit, "
        "CAST(CASE WHEN coalesce(z.logit, 0) >= 0 THEN 1 ELSE 0 END "
        "AS BIGINT) AS label FROM t LEFT JOIN z USING (doc_id)")


def _llm_curation_sql() -> str:
    """llm_curation oracle: the six curation stages composed as one
    CTE chain — classifier gate (sha-prefix bucket + splitmix weight),
    PII regexp_replace, decontamination shingle filter, GROUP BY text
    dedup (min id — sha256 content hash is injective on text), mixture
    threshold join, window-cumsum packing."""
    from ..stages.classifier import LinearTextClassifier
    from ..stages.pii import PII_PATTERNS
    from ..stages.sample import mix_hash_sql

    clf = LinearTextClassifier(dim=65536, seed=7)
    red = "text"
    for pat, repl in PII_PATTERNS.values():
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    return (
        f"WITH corpus AS ({_pii_corpus_sql(with_lang=True)}), "
        "ctoks AS (SELECT doc_id, list_filter(regexp_split_to_array("
        "coalesce(text, ''), '\\s+'), x -> x != '') AS toks FROM corpus), "
        "cu AS (SELECT doc_id, unnest(toks) AS w FROM ctoks), "
        "ch AS (SELECT doc_id, CAST(('0x' || substring(sha256(w), 1, 16))"
        f"::UBIGINT % {clf.dim} AS BIGINT) AS b FROM cu), "
        f"cz AS (SELECT doc_id, CAST(sum({clf.weight_sql('b')}) AS BIGINT) "
        "AS logit FROM ch GROUP BY doc_id), "
        "keep1 AS (SELECT c.doc_id, c.text, c.lang FROM corpus c "
        "LEFT JOIN cz USING (doc_id) WHERE coalesce(cz.logit, 0) >= 0), "
        f"red AS (SELECT doc_id, lang, {red} AS text FROM keep1), "
        + _decontam_cte("red", "d") + ", "
        "keep2 AS (SELECT r.doc_id, r.lang, r.text FROM red r "
        "JOIN dstats s USING (doc_id) "
        "WHERE CAST(n_hit AS DOUBLE) / n_sh < 0.5), "
        "ddup AS (SELECT min(doc_id) AS doc_id FROM keep2 GROUP BY text), "
        "keep3 AS (SELECT k.* FROM keep2 k JOIN ddup USING (doc_id)), "
        "mn AS (SELECT lang, count(*) AS n FROM keep3 GROUP BY lang), "
        "keep4 AS (SELECT k.doc_id, k.text FROM keep3 k "
        "JOIN mn USING (lang) "
        f"WHERE {mix_hash_sql('k.doc_id', 0)} < "
        "least(1000000, 100 * 1000000 // mn.n)), "
        "p0 AS (SELECT doc_id, CAST(len(list_filter("
        "regexp_split_to_array(coalesce(text, ''), '\\s+'), "
        "t -> t != '')) AS BIGINT) AS n FROM keep4), "
        f"p1 AS (SELECT doc_id, ({mix_hash_sql('doc_id', 0)}) % {_PACK_B} "
        "AS bucket, n FROM p0 WHERE n > 0), "
        "pp AS (SELECT doc_id, bucket, n, CAST(coalesce(sum(n) OVER ("
        "PARTITION BY bucket ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS BIGINT) AS start FROM p1) "
        "SELECT doc_id, bucket, n AS n_tokens, start AS start_tok, "
        f"start // {_PACK_L} AS first_seq, "
        f"(start + n - 1) // {_PACK_L} AS last_seq FROM pp")


def _simhash_pairs_sql() -> str:
    """simhash_pairs oracle: per-token sha256-prefix hashes vote on each
    of the 64 bits (+1/-1, multiplicity counted); bit set iff the vote is
    strictly positive; 4 x 16-bit bank bucketing; xor + bit_count Hamming
    verification at max_hamming=3 — the same math as
    ``SimHashDedup.simhash`` / ``bank_rows`` / ``_bucket_pairs``."""
    return (
        "WITH corpus AS ("
        "SELECT doc_id, text FROM documents "
        "UNION ALL "
        "SELECT doc_id + 10000000, text || ' near duplicate suffix tokens' "
        "FROM documents WHERE doc_id % 10 = 0), "
        "u AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array("
        "lower(coalesce(text, '')), '\\s+'), t -> t != '')) AS w FROM corpus), "
        "th AS (SELECT doc_id, "
        "('0x' || substring(sha256(w), 1, 16))::UBIGINT AS h FROM u), "
        "bits AS (SELECT doc_id, j, "
        "sum(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS vote "
        "FROM th CROSS JOIN range(64) r(j) GROUP BY doc_id, j), "
        "sh0 AS (SELECT doc_id, CAST(sum(CASE WHEN vote > 0 "
        "THEN (1::UBIGINT << j)::HUGEINT ELSE 0 END) AS UBIGINT) AS sh "
        "FROM bits GROUP BY doc_id), "
        "sh AS (SELECT c.doc_id, coalesce(s.sh, 0::UBIGINT) AS sh "
        "FROM corpus c LEFT JOIN sh0 s USING (doc_id)), "
        "banks AS (SELECT doc_id, b, "
        "CAST((sh >> (16 * b)) & 65535 AS BIGINT) AS key, sh "
        "FROM sh CROSS JOIN range(4) r(b)), "
        "cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, "
        "a.sh AS sh_a, b.sh AS sh_b "
        "FROM banks a JOIN banks b ON a.b = b.b AND a.key = b.key "
        "WHERE a.doc_id < b.doc_id) "
        "SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) "
        "AS hamming FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= 3")


#: Shared oracle for q_window_funcs / q_window_funcs_bucketed.  The
#: running sum is over the int64 quantization floor(value * 64) (power-of-
#: two scale => exact f64 product), so every output column is integer and
#: the hash compare is FP-order-independent.  DuckDB's sum(BIGINT) widens
#: to HUGEINT — cast back.
_WINDOW_FUNCS_SQL = (
    "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, "
    "CAST(floor(value * 64) AS BIGINT) AS v FROM events) "
    "SELECT user_id, event_id, "
    "row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS rn, "
    "CAST(sum(v) OVER (PARTITION BY user_id ORDER BY t, event_id "
    "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_v, "
    "coalesce(t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id), "
    "-1) AS gap_us "
    "FROM e")


#: Shared oracle for q_trajectory / q_trajectory_bucketed.  Positions are
#: the same int64 multiply/mod of event_id the engine query computes;
#: every output column is integer, so the fold is exact and
#: accumulation-order independent.
#: one row per hyperlink, mirroring fixtures.outlink_sites verbatim
_LINK_EDGES_SQL = (
    "SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' "
    "AS src_domain, 'site' || CAST((doc_id*7+3) % 20 AS VARCHAR) || "
    "'.example' AS dst_domain FROM documents "
    "UNION ALL SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) || "
    "'.example', 'site' || CAST((doc_id*13+5) % 20 AS VARCHAR) || "
    "'.example' FROM documents "
    "UNION ALL SELECT 'site' || CAST(doc_id % 20 AS VARCHAR) || "
    "'.example', 'site' || CAST((doc_id*3+11) % 20 AS VARCHAR) || "
    "'.example' FROM documents")

_PAGERANK_SQL = (
    f"WITH l AS ({_LINK_EDGES_SQL}), "
    "e AS (SELECT src_domain, dst_domain, CAST(count(*) AS DOUBLE) AS n "
    "FROM l GROUP BY 1, 2), "
    "ol AS (SELECT src_domain, sum(n) AS t FROM e GROUP BY 1), "
    "d AS (SELECT src_domain AS domain FROM e "
    "UNION SELECT dst_domain FROM e), "
    "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d), "
    "r0 AS (SELECT domain, CAST(1 AS DOUBLE) / nn.n AS rank FROM d, nn), "
    "c1 AS (SELECT e.dst_domain AS domain, "
    "sum(r0.rank * e.n / ol.t) AS c FROM e "
    "JOIN r0 ON r0.domain = e.src_domain "
    "JOIN ol ON ol.src_domain = e.src_domain GROUP BY 1), "
    "r1 AS (SELECT d.domain, CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) "
    "+ CAST(0.85 AS DOUBLE) * coalesce(c1.c, 0) AS rank "
    "FROM d LEFT JOIN c1 ON c1.domain = d.domain), "
    "c2 AS (SELECT e.dst_domain AS domain, "
    "sum(r1.rank * e.n / ol.t) AS c FROM e "
    "JOIN r1 ON r1.domain = e.src_domain "
    "JOIN ol ON ol.src_domain = e.src_domain GROUP BY 1), "
    "r2 AS (SELECT d.domain, CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) "
    "+ CAST(0.85 AS DOUBLE) * coalesce(c2.c, 0) AS rank "
    "FROM d LEFT JOIN c2 ON c2.domain = d.domain), "
    "c3 AS (SELECT e.dst_domain AS domain, "
    "sum(r2.rank * e.n / ol.t) AS c FROM e "
    "JOIN r2 ON r2.domain = e.src_domain "
    "JOIN ol ON ol.src_domain = e.src_domain GROUP BY 1), "
    "r3 AS (SELECT d.domain, CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) "
    "+ CAST(0.85 AS DOUBLE) * coalesce(c3.c, 0) AS rank "
    "FROM d LEFT JOIN c3 ON c3.domain = d.domain) "
    "SELECT domain, round(rank, 6) AS rank FROM r3 ORDER BY domain")

_OD_SQL = (
    "WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t, "
    "(event_id * 2654435761) % 1024 AS x, "
    "(event_id * 40503 + 12345) % 1024 AS y FROM events), "
    "c AS (SELECT user_id, t, event_id, "
    "(x // 128) * 8 + (y // 128) AS cell FROM p), "
    "l AS (SELECT cell, lag(cell) OVER (PARTITION BY user_id "
    "ORDER BY t, event_id) AS prev FROM c) "
    "SELECT CAST(prev AS BIGINT) AS cell_from, "
    "CAST(cell AS BIGINT) AS cell_to, CAST(count(*) AS BIGINT) AS n "
    "FROM l WHERE prev IS NOT NULL AND prev <> cell "
    "GROUP BY 1, 2 ORDER BY 1, 2")

_TRAJECTORY_SQL = (
    "WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t, "
    "(event_id * 2654435761) % 1024 AS x, "
    "(event_id * 40503 + 12345) % 1024 AS y FROM events), "
    "o AS (SELECT user_id, x, y, "
    "lag(x) OVER w AS px, lag(y) OVER w AS py, "
    "first_value(x) OVER w AS fx, first_value(y) OVER w AS fy, "
    "last_value(x) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "UNBOUNDED FOLLOWING) AS lx, "
    "last_value(y) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "UNBOUNDED FOLLOWING) AS ly "
    "FROM p WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)) "
    "SELECT user_id, CAST(count(*) AS BIGINT) AS n_points, "
    "CAST(sum(coalesce((x-px)*(x-px)+(y-py)*(y-py), 0)) AS BIGINT) "
    "AS path_d2, "
    "CAST(max(lx - fx) AS BIGINT) AS net_dx, "
    "CAST(max(ly - fy) AS BIGINT) AS net_dy, "
    "CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x, "
    "CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y "
    "FROM o GROUP BY user_id")


def _canon_chain_sql(src: str, id_col: str = "doc_id") -> str:
    """CTE chain replaying stages/urls.py CanonicalizeURL bit-exactly:
    canonicalizes column ``url`` of CTE ``src`` into a final CTE
    ``canon(id_col, u)``.  Splice after a comma inside a WITH list."""
    return (
        f"u1 AS (SELECT {id_col}, regexp_replace(url, '#.*$', '') AS u "
        f"FROM {src}), "
        f"p AS (SELECT {id_col}, u, "
        "lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) "
        "AS scheme, "
        "lower(regexp_extract(u, "
        "'^[A-Za-z][A-Za-z0-9+.\\-]*://([^/?#]+)', 1)) AS hostport, "
        "regexp_extract(u, "
        "'^[A-Za-z][A-Za-z0-9+.\\-]*://[^/?#]+(.*)$', 1) AS rest FROM u1), "
        f"r AS (SELECT {id_col}, CASE WHEN scheme = '' THEN u ELSE "
        "scheme || '://' || "
        "(CASE WHEN scheme = 'https' THEN regexp_replace(hostport, "
        "':443$', '') WHEN scheme = 'http' THEN "
        "regexp_replace(hostport, ':80$', '') ELSE hostport END) "
        "|| rest END AS u FROM p), "
        f"t1 AS (SELECT {id_col}, regexp_replace(u, "
        "'\\?(?:utm_[a-z]+|fbclid|gclid)=[^&]*&', '?', 'g') AS u FROM r), "
        f"t2 AS (SELECT {id_col}, regexp_replace(u, "
        "'[?&](?:utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g') AS u FROM t1), "
        f"t3 AS (SELECT {id_col}, regexp_replace(u, '^([^?]*)&', '\\1?') "
        "AS u FROM t2), "
        f"s1 AS (SELECT {id_col}, regexp_replace(u, '^([^?]*)/\\?', "
        "'\\1?') AS u FROM t3), "
        f"canon AS (SELECT {id_col}, regexp_replace(u, '([^:/])/$', '\\1') "
        "AS u FROM s1)")


def build_oracles() -> Dict[str, str]:
    from ..stages.sample import (mix_hash_sql, sample_sql,
                                 weighted_sample_sql)

    geo = _geo_sql_base()
    cell = _cell_sql()
    zones = rect_zones_sql_values()
    sites = sites_sql_values()

    from ..fixtures import RECT_ZONES
    from ..stages.mapmatch import boundary_segments

    _segs = boundary_segments(RECT_ZONES)
    # float() before !r: np.float64 reprs as 'np.float64(x)' under
    # NumPy >= 2 and would be invalid SQL
    segs_values = ("(VALUES " + ", ".join(
        f"({int(s)}, {float(ax)!r}, {float(ay)!r}, "
        f"{float(bx)!r}, {float(by)!r})"
        for s, ax, ay, bx, by in _segs)
        + ") AS s(seg_id, ax, ay, bx, by)")
    oracles = {
        "hash_invariant": "SELECT doc_id, sha256(text) AS text_sha256 FROM documents",
        "cell_encode": (
            f"WITH base AS ({geo}) SELECT doc_id, lat, lng, {cell} AS cell "
            f"FROM base WHERE lat IS NOT NULL"),
        "snap_segments": (
            f"WITH base AS ({geo}), "
            "pts AS (SELECT doc_id, lat, lng FROM base "
            "WHERE lat IS NOT NULL), "
            f"seg0 AS (SELECT seg_id, CAST(ax AS DOUBLE) AS ax, "
            "CAST(ay AS DOUBLE) AS ay, CAST(bx AS DOUBLE) AS bx, "
            f"CAST(by AS DOUBLE) AS by FROM {segs_values}), "
            "seg AS (SELECT seg_id, ax, ay, bx - ax AS dx, by - ay AS dy, "
            "(bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS l2 FROM seg0), "
            "c AS (SELECT doc_id, seg_id, "
            "least(greatest(((lat - ax) * dx + (lng - ay) * dy) / l2, 0.0), "
            "1.0) AS t, lat, lng, ax, ay, dx, dy FROM pts CROSS JOIN seg), "
            "d AS (SELECT doc_id, seg_id, t, "
            "(lat - (ax + t * dx)) * (lat - (ax + t * dx)) "
            "+ (lng - (ay + t * dy)) * (lng - (ay + t * dy)) AS d2 FROM c) "
            "SELECT doc_id, CAST(seg_id AS BIGINT) AS seg_id, t AS seg_t, "
            "sqrt(d2) AS seg_dist FROM d "
            "QUALIFY row_number() OVER "
            "(PARTITION BY doc_id ORDER BY d2, seg_id) = 1"),
        "target_encode": (
            "WITH g AS (SELECT l_partkey, sum(l_quantity) AS s, "
            "count(*) AS n FROM lineitem GROUP BY 1), "
            "t AS (SELECT sum(l_quantity) AS gs, count(*) AS gn "
            "FROM lineitem) "
            "SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, "
            "CASE WHEN g.n > 1 THEN "
            "(g.s - l.l_quantity) / CAST(g.n - 1 AS DOUBLE) "
            # gn > 1 guard: a 1-row dataset has no leave-one-out
            # information — NULL on both sides (ADVICE r3; the engine
            # emits a null-masked value there)
            "WHEN t.gn > 1 "
            "THEN (t.gs - l.l_quantity) / CAST(t.gn - 1 AS DOUBLE) "
            "ELSE NULL END AS loo_mean "
            "FROM lineitem l JOIN g USING (l_partkey) CROSS JOIN t"),
        "robots_rules": (
            "WITH u AS (SELECT doc_id, "
            "'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS host, "
            "'/' || lang || '/p' || CAST(doc_id AS VARCHAR) AS path "
            "FROM documents), "
            "r AS (SELECT * FROM (VALUES "
            + ", ".join(f"('{h}', '{p}', {int(a)})" for h, p, a in ROBOTS_RULES)
            + ") AS r(host, prefix, allow)), "
            "m AS (SELECT u.doc_id, r.prefix, r.allow FROM u JOIN r "
            "ON r.host = u.host "
            "AND substr(u.path, 1, length(r.prefix)) = r.prefix "
            "QUALIFY row_number() OVER (PARTITION BY u.doc_id "
            "ORDER BY length(r.prefix) DESC) = 1) "
            "SELECT u.doc_id, coalesce(m.prefix, '') AS rule_prefix, "
            "CAST(coalesce(m.allow, 1) AS BIGINT) AS allowed "
            "FROM u LEFT JOIN m ON m.doc_id = u.doc_id"),
        "cusum": (
            "WITH e AS (SELECT user_id, ts, event_id, "
            "CAST(floor(value * 64) AS BIGINT) AS x FROM events), "
            "w AS (SELECT user_id, "
            "row_number() OVER win AS idx, "
            "sum(x) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS cs "
            "FROM e WINDOW win AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)), "
            "t AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(x) AS BIGINT) AS total FROM e GROUP BY 1), "
            "d AS (SELECT w.user_id, w.idx, t.n, "
            "abs(t.n * w.cs - w.idx * t.total) AS ad "
            "FROM w JOIN t USING (user_id)) "
            "SELECT user_id, n, CAST(idx AS BIGINT) AS change_idx, "
            "CAST(ad AS BIGINT) AS d_max FROM d "
            "QUALIFY row_number() OVER (PARTITION BY user_id "
            "ORDER BY ad DESC, idx ASC) = 1"),
        "quantile_bucket": (
            "WITH e AS (SELECT l_orderkey, l_linenumber, "
            "CAST(floor(l_extendedprice * 100) AS BIGINT) AS x "
            "FROM lineitem), "
            "c AS (SELECT x AS v, count(*) OVER (ORDER BY x RANGE BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            "(SELECT count(*) FROM lineitem) AS n FROM e), "
            "ed AS (SELECT min(v) AS edge FROM c WHERE cum >= ceil(0.25 * n) "
            "UNION ALL SELECT min(v) FROM c WHERE cum >= ceil(0.5 * n) "
            "UNION ALL SELECT min(v) FROM c WHERE cum >= ceil(0.75 * n)) "
            "SELECT l_orderkey, l_linenumber, "
            "CAST(1 + (SELECT count(*) FROM ed WHERE ed.edge < e.x) "
            "AS BIGINT) AS bucket FROM e"),
        "areal_interp": (
            f"WITH base AS ({geo}), "
            "pts AS (SELECT doc_id, lat, lng FROM base "
            "WHERE lat IS NOT NULL), "
            f"cc AS (SELECT {cell} AS cell, CAST(count(*) AS BIGINT) AS n "
            "FROM pts GROUP BY 1), "
            "zi AS (SELECT poly_id, "
            "CAST(floor((CAST(lat0 AS DOUBLE) + 90.0) / 180.0 "
            f"* {_N} * 1000000) AS BIGINT) AS zy0, "
            "CAST(floor((CAST(lat1 AS DOUBLE) + 90.0) / 180.0 "
            f"* {_N} * 1000000) AS BIGINT) AS zy1, "
            "CAST(floor((CAST(lng0 AS DOUBLE) + 180.0) / 360.0 "
            f"* {_N} * 1000000) AS BIGINT) AS zx0, "
            "CAST(floor((CAST(lng1 AS DOUBLE) + 180.0) / 360.0 "
            f"* {_N} * 1000000) AS BIGINT) AS zx1 "
            f"FROM {zones}), "
            "ov AS (SELECT zi.poly_id, cc.n, "
            f"least((cc.cell // {_N}) * 1000000 + 1000000, zi.zy1) "
            f"- greatest((cc.cell // {_N}) * 1000000, zi.zy0) AS ovy, "
            f"least((cc.cell % {_N}) * 1000000 + 1000000, zi.zx1) "
            f"- greatest((cc.cell % {_N}) * 1000000, zi.zx0) AS ovx "
            "FROM cc CROSS JOIN zi), "
            "agg AS (SELECT poly_id, sum(n * ovy * ovx) AS num FROM ov "
            "WHERE ovy > 0 AND ovx > 0 GROUP BY 1) "
            "SELECT CAST(poly_id AS BIGINT) AS poly_id, "
            "CAST(num AS BIGINT) AS num, "
            "CAST(num AS DOUBLE) / 1000000000000.0 AS est FROM agg"),
        "crawl_pipeline": (
            "WITH b AS (SELECT doc_id, "
            "'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS host, "
            "'/' || lang || '/p' || CAST(doc_id AS VARCHAR) AS path "
            "FROM documents), "
            "m AS (SELECT doc_id AS id, doc_id % 5 AS v, host, path FROM b "
            "UNION ALL SELECT doc_id + 10000000, (doc_id + 2) % 5, host, "
            "path FROM b), "
            "u0 AS (SELECT id AS doc_id, CASE v "
            "WHEN 0 THEN 'https://' || host || path "
            "WHEN 1 THEN 'https://' || upper(host) || ':443' || path "
            "WHEN 2 THEN 'https://' || host || path || '?utm_source=feed' "
            "WHEN 3 THEN 'https://' || host || path || '?gclid=g7#frag' "
            "ELSE 'https://' || host || path || '/?fbclid=x' END AS url "
            "FROM m), "
            + _canon_chain_sql("u0") + ", "
            "hp AS (SELECT doc_id, u, "
            "regexp_extract(u, '^(?:[a-z][a-z0-9+.\\-]*)://([^/]+)', 1) "
            "AS host, "
            "regexp_extract(u, '^(?:[a-z][a-z0-9+.\\-]*)://[^/]+(/.*)$', 1) "
            "AS path FROM canon), "
            "rules AS (SELECT * FROM (VALUES "
            + ", ".join(f"('{h}', '{p}', {int(a)})" for h, p, a in ROBOTS_RULES)
            + ") AS r(host, prefix, allow)), "
            "mt AS (SELECT hp.doc_id, r.allow FROM hp JOIN rules r "
            "ON r.host = hp.host "
            "AND substr(hp.path, 1, length(r.prefix)) = r.prefix "
            "QUALIFY row_number() OVER (PARTITION BY hp.doc_id "
            "ORDER BY length(r.prefix) DESC) = 1), "
            "keep AS (SELECT hp.doc_id, hp.u, hp.host FROM hp "
            "LEFT JOIN mt ON mt.doc_id = hp.doc_id "
            "WHERE coalesce(mt.allow, 1) = 1 AND hp.host NOT IN "
            "('site3.example', 'site7.example', 'site13.example')), "
            "ded AS (SELECT u, min(doc_id) AS keeper, min(host) AS host "
            "FROM keep GROUP BY u), "
            "pr AS (SELECT host, CAST(keeper AS BIGINT) AS keeper, "
            "(keeper * 37) % 101 AS prio FROM ded), "
            "r2 AS (SELECT host, keeper, "
            "CAST(row_number() OVER (PARTITION BY host "
            "ORDER BY prio DESC, keeper) AS BIGINT) AS wave FROM pr), "
            "s AS (SELECT host, keeper, wave, "
            "CAST(row_number() OVER (ORDER BY wave, host, keeper) "
            "AS BIGINT) AS schedule_pos FROM r2) "
            "SELECT schedule_pos, wave, host, keeper FROM s "
            "WHERE schedule_pos <= 50"),
        "polygon_cover": (
            "WITH z AS (SELECT poly_id, "
            "CAST(least(greatest(floor((lng0 + 180.0) / 360.0 * 64), 0), "
            "63) AS BIGINT) AS ix0, "
            "CAST(least(greatest(floor((lng1 + 180.0) / 360.0 * 64), 0), "
            "63) AS BIGINT) AS ix1, "
            "CAST(least(greatest(floor((lat0 + 90.0) / 180.0 * 64), 0), "
            "63) AS BIGINT) AS iy0, "
            "CAST(least(greatest(floor((lat1 + 90.0) / 180.0 * 64), 0), "
            f"63) AS BIGINT) AS iy1 FROM {zones}) "
            "SELECT CAST(poly_id AS BIGINT) AS poly_id, "
            "CAST(y * 64 + x AS BIGINT) AS cell "
            "FROM z, unnest(range(iy0, iy1 + 1)) AS ys(y), "
            "unnest(range(ix0, ix1 + 1)) AS xs(x)"),
        "pip_join": (
            f"WITH base AS ({geo}) "
            f"SELECT doc_id, CAST(poly_id AS BIGINT) AS poly_id FROM base, {zones} "
            f"WHERE lat >= lat0 AND lat < lat1 AND lng >= lng0 AND lng < lng1"),
        "pip_semi": (
            f"WITH base AS ({geo}) "
            f"SELECT doc_id FROM base b WHERE EXISTS ("
            f"SELECT 1 FROM {zones} "
            f"WHERE b.lat >= lat0 AND b.lat < lat1 "
            f"AND b.lng >= lng0 AND b.lng < lng1)"),
        "pip_anti": (
            f"WITH base AS ({geo}) "
            f"SELECT doc_id FROM base b WHERE NOT EXISTS ("
            f"SELECT 1 FROM {zones} "
            f"WHERE b.lat >= lat0 AND b.lat < lat1 "
            f"AND b.lng >= lng0 AND b.lng < lng1)"),
        "cell_parent": (
            f"WITH base AS ({geo}), z AS (SELECT {cell} AS cell FROM base "
            f"WHERE lat IS NOT NULL) "
            f"SELECT ((cell // {_N}) // 4) * 16 + ((cell % {_N}) // 4) AS parent_cell, "
            f"CAST(count(*) AS BIGINT) AS n FROM z GROUP BY parent_cell"),
        "knn_euclid": (
            f"WITH base AS ({geo}), "
            f"d AS (SELECT doc_id, site_id, "
            f"(lat - site_lat)*(lat - site_lat) + (lng - site_lng)*(lng - site_lng) AS d2 "
            f"FROM base, {sites} WHERE lat IS NOT NULL) "
            f"SELECT doc_id, CAST(site_id AS BIGINT) AS site_id, rank FROM ("
            f"SELECT doc_id, site_id, "
            f"row_number() OVER (PARTITION BY doc_id ORDER BY d2, site_id) AS rank "
            f"FROM d) WHERE rank <= 3"),
        "knn_haversine": (
            f"WITH base AS ({geo}), "
            f"d AS (SELECT doc_id, site_id, "
            f"2*6371008.8*asin(sqrt(least(1.0, greatest(0.0, "
            f"sin(radians(site_lat - lat)/2)*sin(radians(site_lat - lat)/2) "
            f"+ cos(radians(lat))*cos(radians(site_lat))"
            f"*sin(radians(site_lng - lng)/2)*sin(radians(site_lng - lng)/2)"
            f")))) AS dist "
            f"FROM base, {sites} WHERE lat IS NOT NULL) "
            f"SELECT doc_id, CAST(site_id AS BIGINT) AS site_id, rank FROM ("
            f"SELECT doc_id, site_id, "
            f"row_number() OVER (PARTITION BY doc_id ORDER BY dist, site_id) "
            f"AS rank FROM d) WHERE rank <= 3"),
        "compact_cells": (
            f"WITH base AS ({geo}), "
            f"z AS (SELECT DISTINCT {cell} AS cell FROM base "
            f"WHERE lat IS NOT NULL), "
            f"p6 AS (SELECT cell, ((cell // {_N}) // 2) * {_N // 2} "
            f"+ ((cell % {_N}) // 2) AS p FROM z), "
            f"g5 AS (SELECT p, count(*) AS c FROM p6 GROUP BY p), "
            f"keep6 AS (SELECT p6.cell AS cell, {RES} AS res FROM p6 "
            f"JOIN g5 USING (p) WHERE g5.c < 4), "
            f"l5 AS (SELECT p AS cell FROM g5 WHERE c = 4), "
            f"p5 AS (SELECT cell, ((cell // {_N // 2}) // 2) * {_N // 4} "
            f"+ ((cell % {_N // 2}) // 2) AS p FROM l5), "
            f"g4 AS (SELECT p, count(*) AS c FROM p5 GROUP BY p), "
            f"keep5 AS (SELECT p5.cell AS cell, {RES - 1} AS res FROM p5 "
            f"JOIN g4 USING (p) WHERE g4.c < 4), "
            f"keep4 AS (SELECT p AS cell, {RES - 2} AS res FROM g4 "
            f"WHERE c = 4) "
            f"SELECT CAST(cell AS BIGINT) AS cell, CAST(res AS BIGINT) AS res "
            f"FROM (SELECT * FROM keep6 UNION ALL SELECT * FROM keep5 "
            f"UNION ALL SELECT * FROM keep4)"),
        "spacetime": (
            f"WITH base AS ({geo}), "
            f"z AS (SELECT doc_id, weight, {cell} AS cell FROM base "
            f"WHERE lat IS NOT NULL) "
            f"SELECT cell, ({WARC_EPOCH_US} + doc_id * "
            f"{WARC_STEP_S * 1_000_000}) // 86400000000 AS bucket, "
            f"CAST(count(*) AS BIGINT) AS n, sum(weight) AS sum_w "
            f"FROM z GROUP BY cell, bucket"),
        "outlier_cells": (
            f"WITH base AS ({geo}), "
            f"z AS (SELECT {cell} AS cell FROM base "
            f"WHERE lat IS NOT NULL), "
            f"c AS (SELECT cell, CAST(count(*) AS BIGINT) AS n "
            f"FROM z GROUP BY cell), "
            f"w AS (SELECT n AS v, count(*) OVER (ORDER BY n "
            f"RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            f"(SELECT count(*) FROM c) AS m FROM c), "
            f"med AS (SELECT min(v) AS med FROM w "
            f"WHERE cum >= ceil(0.5 * m)) "
            f"SELECT cell, n FROM c, med WHERE n >= 2 * med"),
        "domain_stats": (
            f"WITH base AS ({geo}), "
            f"u AS (SELECT doc_id, weight, "
            f"'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/' "
            f"|| lang || '/p' || CAST(doc_id AS VARCHAR) AS url FROM base), "
            f"h AS (SELECT weight, regexp_extract(url, "
            f"'^(?:[a-z][a-z0-9+.-]*)://([^/]+)', 1) AS host FROM u) "
            f"SELECT host, CAST(count(*) AS BIGINT) AS n, "
            f"sum(weight) AS sum_w FROM h GROUP BY host"),
        "domain_footprint": (
            f"WITH base AS ({geo}), "
            f"u AS (SELECT doc_id, lat, lng, "
            f"'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/' "
            f"|| lang || '/p' || CAST(doc_id AS VARCHAR) AS url FROM base), "
            "h AS (SELECT regexp_extract(url, "
            "'^(?:[a-z][a-z0-9+.-]*)://([^/]+)', 1) AS host, "
            "CAST(floor(lat * 1000.0 + 0.5) AS BIGINT) AS la, "
            "CAST(floor(lng * 1000.0 + 0.5) AS BIGINT) AS lo "
            "FROM u WHERE lat IS NOT NULL), "
            "a AS (SELECT host, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(la) AS BIGINT) AS s_lat, "
            "CAST(sum(la * la) AS BIGINT) AS q_lat, "
            "CAST(sum(lo) AS BIGINT) AS s_lng, "
            "CAST(sum(lo * lo) AS BIGINT) AS q_lng FROM h GROUP BY 1) "
            "SELECT host, n, "
            "CAST(s_lat AS DOUBLE) / n / 1000.0 AS lat_c, "
            "CAST(s_lng AS DOUBLE) / n / 1000.0 AS lng_c, "
            "sqrt(greatest(CAST(n AS DOUBLE) "
            "* CAST(q_lat + q_lng AS DOUBLE) "
            "- CAST(s_lat AS DOUBLE) * CAST(s_lat AS DOUBLE) "
            "- CAST(s_lng AS DOUBLE) * CAST(s_lng AS DOUBLE), 0.0)) "
            "/ n / 1000.0 AS disp FROM a"),
        "blocklist": (
            f"WITH u AS (SELECT doc_id, "
            f"'https://site' || CAST(doc_id % 20 AS VARCHAR) || '.example/' "
            f"|| lang || '/p' || CAST(doc_id AS VARCHAR) AS url "
            f"FROM documents), "
            f"h AS (SELECT doc_id, regexp_extract(url, "
            f"'^(?:[a-z][a-z0-9+.-]*)://([^/]+)', 1) AS host FROM u) "
            f"SELECT doc_id, host FROM h WHERE host NOT IN "
            f"('site3.example', 'site7.example', 'site13.example')"),
        "url_canon_groups": (
            "WITH d AS (SELECT doc_id, doc_id - (doc_id % 5) AS pid "
            "FROM documents), "
            "m AS (SELECT doc_id, doc_id % 5 AS v, "
            "'site' || CAST(pid % 20 AS VARCHAR) || '.example' AS host, "
            "'/p' || CAST(pid AS VARCHAR) AS path, "
            "'r' || CAST(pid % 7 AS VARCHAR) AS ref, "
            "'g' || CAST(pid % 11 AS VARCHAR) AS gc FROM d), "
            "u0 AS (SELECT doc_id, CASE v "
            "WHEN 0 THEN 'https://' || host || path "
            "WHEN 1 THEN 'https://' || upper(host) || ':443' || path "
            "WHEN 2 THEN 'https://' || host || path "
            "|| '?utm_source=feed&ref=' || ref "
            "WHEN 3 THEN 'https://' || host || path || '?ref=' || ref "
            "|| '&gclid=' || gc || '#frag' "
            "ELSE 'https://' || host || path || '/?fbclid=x' END AS url "
            "FROM m), "
            + _canon_chain_sql("u0") + " "
            "SELECT u AS canon_url, CAST(min(doc_id) AS BIGINT) AS keeper, "
            "CAST(count(*) AS BIGINT) AS n_variants FROM canon GROUP BY u"),
        "cluster_cells": (
            f"WITH RECURSIVE base AS ({geo}), "
            f"z AS (SELECT DISTINCT {cell} AS cell FROM base "
            f"WHERE lat IS NOT NULL), "
            f"o2 AS (SELECT cell, cell // {_N} AS iy, cell % {_N} AS ix "
            f"FROM z), "
            f"offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),"
            f"(0,1),(1,-1),(1,0),(1,1)), "
            f"edges AS (SELECT t.cell AS src, s.cell AS dst "
            f"FROM o2 t CROSS JOIN offs o JOIN o2 s "
            f"ON s.iy = t.iy + o.dy "
            f"AND s.ix = ((t.ix + o.dx) % {_N} + {_N}) % {_N}), "
            f"reach(cell, lab) AS (SELECT cell, cell FROM z "
            f"UNION SELECT e.dst, r.lab FROM reach r "
            f"JOIN edges e ON e.src = r.cell) "
            f"SELECT cell, min(lab) AS cluster FROM reach GROUP BY cell"),
        "site_visits": (
            f"WITH base AS ({geo}), "
            f"d AS (SELECT doc_id, weight, site_id, "
            f"(lat - site_lat)*(lat - site_lat) "
            f"+ (lng - site_lng)*(lng - site_lng) AS d2 "
            f"FROM base, {sites} WHERE lat IS NOT NULL), "
            f"r AS (SELECT doc_id, weight, site_id, row_number() OVER ("
            f"PARTITION BY doc_id ORDER BY d2, site_id) AS rk FROM d) "
            f"SELECT CAST(site_id AS BIGINT) AS site_id, "
            f"CAST(count(*) AS BIGINT) AS n, sum(weight) AS sum_w "
            f"FROM r WHERE rk = 1 GROUP BY site_id"),
        "uncompact_roundtrip": (
            f"WITH base AS ({geo}) "
            f"SELECT DISTINCT {cell} AS cell FROM base "
            f"WHERE lat IS NOT NULL"),
        "tile_pyramid": (
            f"WITH base AS ({geo}), "
            f"z AS (SELECT {cell} AS cell FROM base WHERE lat IS NOT NULL) "
            f"SELECT CAST(cell AS BIGINT) AS cell, "
            f"CAST({RES} AS BIGINT) AS res, "
            f"CAST(count(*) AS BIGINT) AS n FROM z GROUP BY cell "
            f"UNION ALL "
            f"SELECT CAST(((cell // {_N}) // 2) * {_N // 2} "
            f"+ ((cell % {_N}) // 2) AS BIGINT) AS cell, "
            f"CAST({RES - 1} AS BIGINT) AS res, "
            f"CAST(count(*) AS BIGINT) AS n FROM z GROUP BY 1 "
            f"UNION ALL "
            f"SELECT CAST(((cell // {_N}) // 4) * {_N // 4} "
            f"+ ((cell % {_N}) // 4) AS BIGINT) AS cell, "
            f"CAST({RES - 2} AS BIGINT) AS res, "
            f"CAST(count(*) AS BIGINT) AS n FROM z GROUP BY 1"),
        "hotspots": (
            f"WITH base AS ({geo}), "
            f"pts AS (SELECT CAST(least(greatest(floor((lat + 90.0) / 180.0 * 64), 0), 63) AS BIGINT) AS iy, CAST(least(greatest(floor((lng + 180.0) / 360.0 * 64), 0), 63) AS BIGINT) AS ix "
            f"FROM base WHERE lat IS NOT NULL), "
            f"c AS (SELECT iy, ix, CAST(count(*) AS BIGINT) AS n "
            f"FROM pts GROUP BY iy, ix), "
            f"offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),"
            f"(0,1),(1,-1),(1,0),(1,1)) "
            f"SELECT t.iy * 64 + t.ix AS cell, t.n, "
            f"CAST(sum(s.n) AS BIGINT) AS nbhd_n "
            f"FROM c t CROSS JOIN offs o JOIN c s "
            f"ON s.iy = t.iy + o.dy "
            f"AND s.ix = ((t.ix + o.dx) % 64 + 64) % 64 "
            f"GROUP BY t.iy, t.ix, t.n"),
        "dbscan": (
            f"WITH RECURSIVE base AS ({geo}), "
            f"pts AS (SELECT CAST(least(greatest(floor((lat + 90.0) / 180.0 * {_N}), 0), {_N - 1}) AS BIGINT) AS iy, "
            f"CAST(least(greatest(floor((lng + 180.0) / 360.0 * {_N}), 0), {_N - 1}) AS BIGINT) AS ix "
            f"FROM base WHERE lat IS NOT NULL), "
            "c AS (SELECT iy, ix, CAST(count(*) AS BIGINT) AS n "
            "FROM pts GROUP BY iy, ix), "
            "offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),"
            "(0,1),(1,-1),(1,0),(1,1)), "
            "nb AS (SELECT t.iy, t.ix, t.n, "
            "CAST(sum(s.n) AS BIGINT) AS nbhd_n "
            "FROM c t CROSS JOIN offs o JOIN c s "
            "ON s.iy = t.iy + o.dy "
            f"AND s.ix = ((t.ix + o.dx) % {_N} + {_N}) % {_N} "
            "GROUP BY t.iy, t.ix, t.n), "
            f"core AS (SELECT iy, ix, iy * {_N} + ix AS cell, n, nbhd_n "
            "FROM nb WHERE nbhd_n >= 4), "
            "edge AS (SELECT a.cell AS a, b.cell AS b "
            "FROM core a CROSS JOIN offs o JOIN core b "
            "ON b.iy = a.iy + o.dy "
            f"AND b.ix = ((a.ix + o.dx) % {_N} + {_N}) % {_N} "
            "AND b.cell <> a.cell), "
            "reach(cell, root) AS (SELECT cell, cell FROM core "
            "UNION SELECT e.b, r.root FROM reach r JOIN edge e "
            "ON e.a = r.cell), "
            "comp AS (SELECT cell, min(root) AS cluster "
            "FROM reach GROUP BY cell), "
            f"noncore AS (SELECT iy, ix, iy * {_N} + ix AS cell, n, nbhd_n "
            "FROM nb WHERE nbhd_n < 4), "
            "bcand AS (SELECT t.cell, min(comp.cluster) AS cluster "
            "FROM noncore t CROSS JOIN offs o JOIN core s "
            "ON s.iy = t.iy + o.dy "
            f"AND s.ix = ((t.ix + o.dx) % {_N} + {_N}) % {_N} "
            "JOIN comp ON comp.cell = s.cell GROUP BY t.cell) "
            "SELECT core.cell, core.n, core.nbhd_n, "
            "CAST(0 AS BIGINT) AS role, comp.cluster "
            "FROM core JOIN comp USING (cell) "
            "UNION ALL "
            "SELECT nc.cell, nc.n, nc.nbhd_n, CAST(1 AS BIGINT) AS role, "
            "b.cluster FROM noncore nc JOIN bcand b USING (cell) "
            "UNION ALL "
            "SELECT nc.cell, nc.n, nc.nbhd_n, CAST(2 AS BIGINT) AS role, "
            "CAST(-1 AS BIGINT) AS cluster FROM noncore nc "
            "LEFT JOIN bcand b USING (cell) WHERE b.cell IS NULL"),
        "cell_mixture": _cell_mixture_sql(),
        "cell_top_quality": (
            f"WITH base AS ({geo}), "
            f"d AS (SELECT doc_id, {cell} AS cell, "
            "CAST(length(text) AS BIGINT) AS n_chars FROM base "
            "WHERE lat IS NOT NULL), "
            "r AS (SELECT cell, doc_id, n_chars, "
            "row_number() OVER (PARTITION BY cell "
            "ORDER BY n_chars DESC, doc_id DESC) AS rk FROM d) "
            "SELECT cell, CAST(doc_id AS BIGINT) AS doc_id, n_chars "
            "FROM r WHERE rk = 1"),
        "user_entropy": (
            "WITH p AS (SELECT user_id, "
            "(((event_id * 2654435761) % 1024) // 128) * 8 "
            "+ ((event_id * 40503 + 12345) % 1024) // 128 AS cell "
            "FROM events), "
            "c AS (SELECT user_id, cell, count(*) AS c FROM p "
            "GROUP BY 1, 2), "
            "t AS (SELECT user_id, sum(c) AS n FROM c GROUP BY 1) "
            "SELECT c.user_id, CAST(t.n AS BIGINT) AS n, "
            "round(0.0 - sum((CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE)) * "
            "ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))), 6) AS entropy "
            "FROM c JOIN t ON c.user_id = t.user_id "
            "GROUP BY c.user_id, t.n"),
        "grid_bfs": (
            f"WITH RECURSIVE base AS ({geo}), "
            "occ AS (SELECT DISTINCT "
            "(CAST(least(greatest(floor((lat + 90.0) / 180.0 * 16), 0), 15) AS BIGINT) * 16 "
            "+ CAST(least(greatest(floor((lng + 180.0) / 360.0 * 16), 0), 15) AS BIGINT)) AS cell "
            "FROM base WHERE lat IS NOT NULL), "
            "sc AS (SELECT DISTINCT "
            "(CAST(least(greatest(floor((CAST(site_lat AS DOUBLE) + 90.0) / 180.0 * 16), 0), 15) AS BIGINT) * 16 "
            "+ CAST(least(greatest(floor((CAST(site_lng AS DOUBLE) + 180.0) / 360.0 * 16), 0), 15) AS BIGINT)) AS cell "
            f"FROM {sites}), "
            "r(cell, d) AS ("
            "SELECT cell, 0 FROM occ WHERE cell IN (SELECT cell FROM sc) "
            "UNION "
            "SELECT o.cell, r.d + 1 FROM r JOIN occ o "
            "ON abs(o.cell // 16 - r.cell // 16) <= 1 "
            "AND least(((o.cell % 16) - (r.cell % 16) + 16) % 16, "
            "((r.cell % 16) - (o.cell % 16) + 16) % 16) <= 1 "
            "AND o.cell <> r.cell WHERE r.d < 6) "
            "SELECT cell, CAST(min(d) AS BIGINT) AS dist "
            "FROM r GROUP BY cell"),
        "bot_scores": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id "
            "FROM events), "
            "g AS (SELECT user_id, (t - lag(t) OVER (PARTITION BY user_id "
            "ORDER BY t, event_id)) // 1000000 AS gap FROM e), "
            "s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
            "CAST(coalesce(sum(gap), 0) AS BIGINT) AS sum_gap, "
            "CAST(coalesce(sum(gap * gap), 0) AS BIGINT) AS sum_gap2, "
            "CAST(count(gap) AS BIGINT) AS m FROM g GROUP BY 1) "
            "SELECT user_id, n, sum_gap, sum_gap2, "
            "CAST(n >= 50 AS BIGINT) AS high_rate, "
            "CAST(m >= 3 AND sum_gap > 0 AND "
            "(m * sum_gap2 - sum_gap * sum_gap) * 10 < "
            "sum_gap * sum_gap * 1 AS BIGINT) AS regular, "
            "CAST(n >= 50 AND m >= 3 AND sum_gap > 0 AND "
            "(m * sum_gap2 - sum_gap * sum_gap) * 10 < "
            "sum_gap * sum_gap * 1 AS BIGINT) AS is_bot FROM s"),
        "ks_test": (
            "WITH e AS (SELECT event_type, "
            "CAST(floor(value * 64) AS BIGINT) AS v FROM events "
            "WHERE event_type IN ('click', 'view')), "
            "c AS (SELECT v, CAST(sum(CASE WHEN event_type = 'click' "
            "THEN 1 ELSE 0 END) AS BIGINT) AS ca, "
            "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS cb FROM e GROUP BY v), "
            "w AS (SELECT sum(ca) OVER (ORDER BY v) AS cuma, "
            "sum(cb) OVER (ORDER BY v) AS cumb, "
            "(SELECT sum(ca) FROM c) AS n1, "
            "(SELECT sum(cb) FROM c) AS n2 FROM c) "
            "SELECT CAST(max(n1) AS BIGINT) AS n1, "
            "CAST(max(n2) AS BIGINT) AS n2, "
            "CAST(max(abs(cuma * n2 - cumb * n1)) AS BIGINT) AS num, "
            "CAST(max(abs(cuma * n2 - cumb * n1)) AS DOUBLE) "
            "/ CAST(max(n1) * max(n2) AS DOUBLE) AS d FROM w"),
        "group_split": (
            "WITH u AS (SELECT doc_id, "
            "'site' || CAST(doc_id % 20 AS VARCHAR) || '.example' AS host "
            "FROM documents), "
            "h AS (SELECT doc_id, host, "
            "CAST(('0x' || substring(sha256(host || '#0'), 1, 16))::UBIGINT "
            "% 1000000 AS BIGINT) AS bucket FROM u) "
            "SELECT doc_id, host, bucket, "
            "CASE WHEN bucket < 800000 THEN 'train' "
            "WHEN bucket < 900000 THEN 'val' ELSE 'test' END AS split "
            "FROM h"),
        "ripley": (
            f"WITH base AS ({geo}), "
            "pts AS (SELECT doc_id, lat, lng FROM base "
            "WHERE lat IS NOT NULL), "
            "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts), "
            "pairs AS (SELECT (a.lat - b.lat) * (a.lat - b.lat) "
            "+ least(abs(a.lng - b.lng), 360.0 - abs(a.lng - b.lng)) "
            "* least(abs(a.lng - b.lng), 360.0 - abs(a.lng - b.lng)) "
            "AS d2 FROM pts a JOIN pts b ON a.doc_id < b.doc_id), "
            "c AS (SELECT CAST(1.0 AS DOUBLE) AS r, "
            "CAST(sum(CASE WHEN d2 <= 1.0 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_pairs FROM pairs "
            "UNION ALL SELECT CAST(2.0 AS DOUBLE), "
            "CAST(sum(CASE WHEN d2 <= 4.0 THEN 1 ELSE 0 END) AS BIGINT) "
            "FROM pairs) "
            "SELECT c.r, c.n_pairs, "
            "CAST(64800.0 AS DOUBLE) * (2 * c.n_pairs) "
            "/ CAST(nn.n * (nn.n - 1) AS DOUBLE) AS k_hat "
            "FROM c CROSS JOIN nn"),
        "join_counts": (
            f"WITH base AS ({geo}), "
            f"p AS (SELECT {cell} AS cell, lang FROM base "
            "WHERE lat IS NOT NULL), "
            "c AS (SELECT cell, CAST(count(*) AS BIGINT) AS nt, "
            "CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) "
            "AS ne FROM p GROUP BY cell), "
            "lbl AS (SELECT cell, CASE WHEN 2 * ne > nt THEN 1 ELSE 0 END "
            "AS b FROM c), "
            "adj AS (SELECT l1.b AS b1, l2.b AS b2 FROM lbl l1 "
            "JOIN lbl l2 ON l1.cell < l2.cell "
            f"AND abs(l1.cell // {_N} - l2.cell // {_N}) <= 1 "
            f"AND least(((l1.cell % {_N}) - (l2.cell % {_N}) + {_N}) % {_N}, "
            f"((l2.cell % {_N}) - (l1.cell % {_N}) + {_N}) % {_N}) <= 1) "
            # coalesce()/CASE: with zero adjacent pairs the bare aggregates
            # give NULL sums and a NULL ratio while the engine emits 0
            # counts and a NaN ratio — align both sides (ADVICE r3)
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM lbl) AS n_cells, "
            "(SELECT CAST(coalesce(sum(b), 0) AS BIGINT) FROM lbl) "
            "AS n_black, "
            "CAST(count(*) AS BIGINT) AS n_edges, "
            "CAST(coalesce(sum(b1 * b2), 0) AS BIGINT) AS bb, "
            "CAST(coalesce(sum(CASE WHEN b1 != b2 THEN 1 ELSE 0 END), 0) "
            "AS BIGINT) AS bw, "
            "CAST(coalesce(sum(CASE WHEN b1 = 0 AND b2 = 0 THEN 1 ELSE 0 "
            "END), 0) AS BIGINT) AS ww, "
            "CASE WHEN count(*) > 0 THEN "
            "CAST(sum(CASE WHEN b1 != b2 THEN 1 ELSE 0 END) AS DOUBLE) "
            "/ CAST(count(*) AS DOUBLE) ELSE CAST('nan' AS DOUBLE) END "
            "AS bw_ratio FROM adj"),
        "crawl_budget": (
            "WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n "
            "FROM documents GROUP BY source), "
            "t AS (SELECT CAST(sum(n) AS BIGINT) AS total, "
            "CAST(sum((1000 * n) // (SELECT sum(n) FROM c)) AS BIGINT) "
            "AS base_sum FROM c), "
            "q AS (SELECT source, n, (1000 * n) // t.total AS base, "
            "(1000 * n) % t.total AS rem, t.base_sum FROM c CROSS JOIN t), "
            "r AS (SELECT source, n, base, "
            "CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT) "
            "AS rk, 1000 - base_sum AS give FROM q) "
            "SELECT source, n AS n_pages, "
            "CAST(base + CASE WHEN rk <= give THEN 1 ELSE 0 END AS BIGINT) "
            "AS alloc FROM r"),
        "mannwhitney": (
            "WITH e AS (SELECT event_type, "
            "CAST(floor(value * 64) AS BIGINT) AS v FROM events "
            "WHERE event_type IN ('click', 'view')), "
            "c AS (SELECT v, CAST(sum(CASE WHEN event_type = 'click' "
            "THEN 1 ELSE 0 END) AS BIGINT) AS ca, "
            "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS cb FROM e GROUP BY v), "
            "w AS (SELECT ca, cb, ca + cb AS ct, "
            "CAST(coalesce(sum(ca + cb) OVER (ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS BIGINT) AS cum FROM c), "
            "s AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, "
            "CAST(sum(cb) AS BIGINT) AS n2, "
            "CAST(sum(ca * (2 * cum + ct + 1)) AS BIGINT) AS r1d FROM w) "
            "SELECT n1, n2, CAST(r1d - n1 * (n1 + 1) AS BIGINT) AS u2, "
            "CAST(r1d - n1 * (n1 + 1) AS DOUBLE) "
            "/ CAST(2 * n1 * n2 AS DOUBLE) AS auc FROM s"),
        "benford": (
            "WITH c AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) "
            "AS c FROM orders WHERE floor(o_totalprice * 100) > 0), "
            "d AS (SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) "
            "AS BIGINT) AS digit FROM c), "
            "n AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d "
            "GROUP BY digit), "
            "f AS (SELECT unnest([1, 2, 3, 4, 5, 6, 7, 8, 9]) AS digit), "
            "t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM n) "
            "SELECT CAST(f.digit AS BIGINT) AS digit, "
            "CAST(coalesce(n.n, 0) AS BIGINT) AS n, "
            "CAST(coalesce(n.n, 0) AS DOUBLE) / t.total AS frac, "
            "round(log10(1.0 + 1.0 / f.digit), 6) AS benford "
            "FROM f LEFT JOIN n ON n.digit = f.digit CROSS JOIN t"),
        "gini": (
            "WITH c AS (SELECT source AS k, CAST(count(*) AS BIGINT) AS c "
            "FROM documents GROUP BY 1), "
            "r AS (SELECT c, CAST(row_number() OVER (ORDER BY c, k) "
            "AS BIGINT) AS i FROM c), "
            "s AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(c) AS BIGINT) AS total, "
            "CAST(2 * sum(i * c) - (count(*) + 1) * sum(c) AS BIGINT) "
            "AS num FROM r) "
            "SELECT n AS n_keys, total, num, "
            "CAST(num AS DOUBLE) / CAST(n * total AS DOUBLE) AS gini "
            "FROM s"),
        "burstiness": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS t, event_id "
            "FROM events), "
            "g AS (SELECT user_id, (t - lag(t) OVER (PARTITION BY user_id "
            "ORDER BY t, event_id)) // 1000000 AS gap FROM e), "
            "s AS (SELECT user_id, CAST(count(gap) AS BIGINT) AS m, "
            "CAST(coalesce(sum(gap), 0) AS BIGINT) AS sum_gap, "
            "CAST(coalesce(sum(gap * gap), 0) AS BIGINT) AS sum_gap2 "
            "FROM g GROUP BY 1) "
            "SELECT user_id, m, sum_gap, sum_gap2, "
            "(sqrt(CAST(m * sum_gap2 - sum_gap * sum_gap AS DOUBLE)) "
            "- sum_gap) / "
            "(sqrt(CAST(m * sum_gap2 - sum_gap * sum_gap AS DOUBLE)) "
            "+ sum_gap) AS burstiness "
            "FROM s WHERE m >= 2 AND sum_gap > 0"),
        "grid_dijkstra": (
            f"WITH RECURSIVE base AS ({geo}), "
            "occ AS (SELECT "
            "(CAST(least(greatest(floor((lat + 90.0) / 180.0 * 16), 0), 15) AS BIGINT) * 16 "
            "+ CAST(least(greatest(floor((lng + 180.0) / 360.0 * 16), 0), 15) AS BIGINT)) AS cell, "
            "count(*) AS n FROM base WHERE lat IS NOT NULL GROUP BY 1), "
            "c AS (SELECT cell, CASE WHEN n >= 4 THEN 2 ELSE 1 END AS cost "
            "FROM occ), "
            "sc AS (SELECT DISTINCT "
            "(CAST(least(greatest(floor((CAST(site_lat AS DOUBLE) + 90.0) / 180.0 * 16), 0), 15) AS BIGINT) * 16 "
            "+ CAST(least(greatest(floor((CAST(site_lng AS DOUBLE) + 180.0) / 360.0 * 16), 0), 15) AS BIGINT)) AS cell "
            f"FROM {sites}), "
            "r(cell, d) AS ("
            "SELECT cell, 0 FROM c WHERE cell IN (SELECT cell FROM sc) "
            "UNION "
            "SELECT o.cell, r.d + o.cost FROM r JOIN c o "
            "ON abs(o.cell // 16 - r.cell // 16) <= 1 "
            "AND least(((o.cell % 16) - (r.cell % 16) + 16) % 16, "
            "((r.cell % 16) - (o.cell % 16) + 16) % 16) <= 1 "
            "AND o.cell <> r.cell WHERE r.d + o.cost <= 8) "
            "SELECT cell, CAST(min(d) AS BIGINT) AS dist "
            "FROM r GROUP BY cell"),
        "radius_of_gyration": (
            "WITH p AS (SELECT user_id, "
            "(event_id * 2654435761) % 1024 AS x, "
            "(event_id * 40503 + 12345) % 1024 AS y FROM events), "
            "m AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
            "CAST(sum(x*x) AS BIGINT) AS qx, "
            "CAST(sum(y*y) AS BIGINT) AS qy FROM p GROUP BY user_id) "
            "SELECT user_id, n, "
            "CAST(n * (qx + qy) - sx*sx - sy*sy AS BIGINT) AS rog2_num, "
            "sqrt(CAST(n * (qx + qy) - sx*sx - sy*sy AS DOUBLE)) "
            "/ CAST(n AS DOUBLE) AS rog FROM m"),
        "incremental_dedup": (
            "WITH d AS (SELECT doc_id, CASE WHEN doc_id % 5 = 3 "
            "THEN 'dup-' || CAST(doc_id % 7 AS VARCHAR) ELSE text END "
            "AS t FROM documents), "
            "b AS (SELECT DISTINCT sha256(t) AS h FROM d "
            "WHERE doc_id % 2 = 0), "
            "inc AS (SELECT doc_id, sha256(t) AS h FROM d "
            "WHERE doc_id % 2 = 1) "
            "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, "
            "h AS content_hash FROM inc "
            "WHERE h NOT IN (SELECT h FROM b) GROUP BY h"),
        "geo_composite": (
            f"WITH base AS ({geo}), "
            f"pts AS (SELECT CAST(least(greatest(floor((lat + 90.0) / 180.0 * {_N}), 0), {_N - 1}) AS BIGINT) AS iy, "
            f"CAST(least(greatest(floor((lng + 180.0) / 360.0 * {_N}), 0), {_N - 1}) AS BIGINT) AS ix "
            f"FROM base WHERE lat IS NOT NULL), "
            "c AS (SELECT iy, ix, CAST(count(*) AS BIGINT) AS n "
            "FROM pts GROUP BY iy, ix), "
            "gl AS (SELECT CAST(count(*) AS BIGINT) AS nc, "
            "CAST(sum(n) AS BIGINT) AS sx, "
            "CAST(sum(n*n) AS BIGINT) AS q FROM c), "
            "offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),"
            "(0,1),(1,-1),(1,0),(1,1)), "
            f"agg AS (SELECT t.iy * {_N} + t.ix AS cell, "
            "CAST(sum(s.n) AS BIGINT) AS nbhd_n, "
            "CAST(count(*) AS BIGINT) AS w_i "
            "FROM c t CROSS JOIN offs o JOIN c s "
            "ON s.iy = t.iy + o.dy "
            f"AND s.ix = ((t.ix + o.dx) % {_N} + {_N}) % {_N} "
            "GROUP BY t.iy, t.ix), "
            "gi AS (SELECT cell, "
            "CAST(CAST(nc AS HUGEINT) * nbhd_n "
            "- CAST(sx AS HUGEINT) * w_i AS DOUBLE) "
            "/ (sqrt(CAST(CAST(nc AS HUGEINT) * q "
            "- CAST(sx AS HUGEINT) * sx AS DOUBLE)) "
            "* sqrt(CAST(CAST(nc AS HUGEINT) * w_i - "
            "CAST(w_i AS HUGEINT) * w_i AS DOUBLE) "
            "/ CAST(nc - 1 AS DOUBLE))) AS g FROM agg, gl), "
            "top3 AS (SELECT cell FROM gi ORDER BY g DESC, cell LIMIT 3), "
            f"fence AS (SELECT DISTINCT (cell // {_N} + dy) * {_N} + "
            f"(((cell % {_N}) + dx) % {_N} + {_N}) % {_N} AS cell "
            f"FROM top3, offs "
            f"WHERE cell // {_N} + dy BETWEEN 0 AND {_N - 1}), "
            f"pcnt AS (SELECT {cell} AS cell, "
            "CAST(count(*) AS BIGINT) AS n FROM base "
            "WHERE lat IS NOT NULL GROUP BY 1), "
            "scnt AS (SELECT "
            f"(CAST(least(greatest(floor((CAST(site_lat AS DOUBLE) + 90.0) / 180.0 * {_N}), 0), {_N - 1}) AS BIGINT) * {_N} "
            f"+ CAST(least(greatest(floor((CAST(site_lng AS DOUBLE) + 180.0) / 360.0 * {_N}), 0), {_N - 1}) AS BIGINT)) AS cell, "
            f"CAST(count(*) AS BIGINT) AS n FROM {sites} GROUP BY 1) "
            "SELECT f.cell, coalesce(p.n, 0) AS n_pages, "
            "coalesce(s.n, 0) AS n_sites "
            "FROM fence f LEFT JOIN pcnt p ON p.cell = f.cell "
            "LEFT JOIN scnt s ON s.cell = f.cell"),
        "gi_star": (
            f"WITH base AS ({geo}), "
            f"pts AS (SELECT CAST(least(greatest(floor((lat + 90.0) / 180.0 * {_N}), 0), {_N - 1}) AS BIGINT) AS iy, "
            f"CAST(least(greatest(floor((lng + 180.0) / 360.0 * {_N}), 0), {_N - 1}) AS BIGINT) AS ix "
            f"FROM base WHERE lat IS NOT NULL), "
            "c AS (SELECT iy, ix, CAST(count(*) AS BIGINT) AS n "
            "FROM pts GROUP BY iy, ix), "
            "gl AS (SELECT CAST(count(*) AS BIGINT) AS nc, "
            "CAST(sum(n) AS BIGINT) AS sx, "
            "CAST(sum(n*n) AS BIGINT) AS q FROM c), "
            "offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),"
            "(0,1),(1,-1),(1,0),(1,1)), "
            f"agg AS (SELECT t.iy * {_N} + t.ix AS cell, t.n, "
            "CAST(sum(s.n) AS BIGINT) AS nbhd_n, "
            "CAST(count(*) AS BIGINT) AS w_i "
            "FROM c t CROSS JOIN offs o JOIN c s "
            "ON s.iy = t.iy + o.dy "
            f"AND s.ix = ((t.ix + o.dx) % {_N} + {_N}) % {_N} "
            "GROUP BY t.iy, t.ix, t.n) "
            "SELECT cell, n, nbhd_n, w_i, "
            "CAST(CAST(nc AS HUGEINT) * nbhd_n "
            "- CAST(sx AS HUGEINT) * w_i AS DOUBLE) "
            "/ (sqrt(CAST(CAST(nc AS HUGEINT) * q "
            "- CAST(sx AS HUGEINT) * sx AS DOUBLE)) "
            "* sqrt(CAST(CAST(nc AS HUGEINT) * w_i - "
            "CAST(w_i AS HUGEINT) * w_i AS DOUBLE) "
            "/ CAST(nc - 1 AS DOUBLE))) AS gi_star "
            "FROM agg, gl"),
        "k_anonymity": (
            f"WITH base AS ({geo}), "
            f"d AS (SELECT {_cell_sql()} AS cell, lang FROM base "
            "WHERE lat IS NOT NULL), "
            "c AS (SELECT cell, lang, CAST(count(*) AS BIGINT) AS n "
            "FROM d GROUP BY 1, 2) "
            "SELECT cell, lang, n FROM c WHERE n < 4"),
        "k_anon_generalize": (
            f"WITH base AS ({geo}), "
            f"d AS (SELECT doc_id, {_cell_sql()} AS cell, lang FROM base "
            "WHERE lat IS NOT NULL), "
            "c AS (SELECT cell, lang, count(*) AS n FROM d GROUP BY 1, 2) "
            "SELECT d.doc_id, "
            f"CAST(CASE WHEN c.n < 4 THEN ((d.cell // {_N}) // 4) * {_N // 4} "
            "+ ((d.cell % " f"{_N}) // 4) ELSE d.cell END AS BIGINT) AS cell_out, "
            "CAST(CASE WHEN c.n < 4 THEN 1 ELSE 0 END AS BIGINT) "
            "AS generalized FROM d JOIN c USING (cell, lang)"),
        "quadtree": _quadtree_sql(),
        "cell_terms": (
            f"WITH base AS ({geo}), "
            f"d AS (SELECT {_cell_sql()} AS cell, "
            "unnest(regexp_split_to_array(lower(coalesce(text, '')), "
            "'\\s+')) AS tok FROM base WHERE lat IS NOT NULL), "
            "c AS (SELECT cell, tok, CAST(count(*) AS BIGINT) AS n "
            "FROM d WHERE tok != '' GROUP BY 1, 2), "
            "r AS (SELECT cell, tok, n, row_number() OVER ("
            "PARTITION BY cell ORDER BY n DESC, tok) AS rk FROM c) "
            "SELECT cell, tok, n, CAST(rk AS BIGINT) AS rank "
            "FROM r WHERE rk <= 3"),
        "lang_frontier": (
            f"WITH base AS ({geo}), "
            f"pts AS (SELECT CAST(least(greatest(floor((lat + 90.0) / 180.0 * {_N}), 0), {_N - 1}) AS BIGINT) AS iy, "
            f"CAST(least(greatest(floor((lng + 180.0) / 360.0 * {_N}), 0), {_N - 1}) AS BIGINT) AS ix, "
            "lang FROM base WHERE lat IS NOT NULL), "
            "c AS (SELECT iy, ix, lang, CAST(count(*) AS BIGINT) AS n "
            "FROM pts GROUP BY 1, 2, 3), "
            "occ AS (SELECT DISTINCT iy, ix FROM c), "
            "offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),"
            "(0,1),(1,-1),(1,0),(1,1)), "
            "own AS (SELECT iy, ix, lang, row_number() OVER ("
            "PARTITION BY iy, ix ORDER BY n DESC, lang) AS rk FROM c), "
            "nbsum AS (SELECT t.iy, t.ix, s.lang, "
            "CAST(sum(s.n) AS BIGINT) AS n "
            "FROM occ t CROSS JOIN offs o JOIN c s "
            "ON s.iy = t.iy + o.dy "
            f"AND s.ix = ((t.ix + o.dx) % {_N} + {_N}) % {_N} "
            "GROUP BY 1, 2, 3), "
            "nbd AS (SELECT iy, ix, lang, row_number() OVER ("
            "PARTITION BY iy, ix ORDER BY n DESC, lang) AS rk FROM nbsum) "
            f"SELECT t.iy * {_N} + t.ix AS cell, o.lang AS own_lang, "
            "d.lang AS nbhd_lang, "
            "CAST(o.lang != d.lang AS BIGINT) AS frontier "
            "FROM occ t "
            "JOIN own o ON o.iy = t.iy AND o.ix = t.ix AND o.rk = 1 "
            "JOIN nbd d ON d.iy = t.iy AND d.ix = t.ix AND d.rk = 1"),
        "emerging_hotspots": (
            f"WITH base AS ({geo}), "
            f"pts AS (SELECT CAST(least(greatest(floor((lat + 90.0) / 180.0 * {_N}), 0), {_N - 1}) AS BIGINT) AS iy, "
            f"CAST(least(greatest(floor((lng + 180.0) / 360.0 * {_N}), 0), {_N - 1}) AS BIGINT) AS ix, "
            f"({WARC_EPOCH_US} + doc_id * {WARC_STEP_S * 1_000_000}) "
            "// 14400000000 AS bucket "
            "FROM base WHERE lat IS NOT NULL), "
            "c AS (SELECT bucket, iy, ix, CAST(count(*) AS BIGINT) AS n "
            "FROM pts GROUP BY 1, 2, 3), "
            "gl AS (SELECT bucket, CAST(count(*) AS BIGINT) AS nc, "
            "CAST(sum(n) AS BIGINT) AS sx, "
            "CAST(sum(n*n) AS BIGINT) AS q FROM c GROUP BY 1), "
            "glb AS (SELECT CAST(count(DISTINCT bucket) AS BIGINT) "
            "AS nb_all, CAST(max(bucket) AS BIGINT) AS maxb FROM c), "
            "offs(dy, dx) AS (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),"
            "(0,1),(1,-1),(1,0),(1,1)), "
            f"agg AS (SELECT t.bucket, t.iy * {_N} + t.ix AS cell, t.n, "
            "CAST(sum(s.n) AS BIGINT) AS nbhd_n, "
            "CAST(count(*) AS BIGINT) AS w_i "
            "FROM c t CROSS JOIN offs o JOIN c s "
            "ON s.bucket = t.bucket AND s.iy = t.iy + o.dy "
            f"AND s.ix = ((t.ix + o.dx) % {_N} + {_N}) % {_N} "
            "GROUP BY 1, 2, 3), "
            "z AS (SELECT agg.bucket, cell, "
            "CASE WHEN gl.nc >= 2 "
            "AND CAST(gl.nc AS HUGEINT) * gl.q "
            "- CAST(gl.sx AS HUGEINT) * gl.sx > 0 "
            "AND CAST(CAST(gl.nc AS HUGEINT) * nbhd_n "
            "- CAST(gl.sx AS HUGEINT) * w_i AS DOUBLE) "
            "/ (sqrt(CAST(CAST(gl.nc AS HUGEINT) * gl.q "
            "- CAST(gl.sx AS HUGEINT) * gl.sx AS DOUBLE)) "
            "* sqrt(CAST(CAST(gl.nc AS HUGEINT) * w_i - "
            "CAST(w_i AS HUGEINT) * w_i AS DOUBLE) "
            "/ CAST(gl.nc - 1 AS DOUBLE))) >= 1.96 "
            "THEN 1 ELSE 0 END AS hot "
            "FROM agg JOIN gl USING (bucket)), "
            "per AS (SELECT cell, CAST(sum(hot) AS BIGINT) AS n_hot, "
            "CAST(max(CASE WHEN z.bucket = glb.maxb THEN hot ELSE 0 END) "
            "AS BIGINT) AS last_hot FROM z, glb GROUP BY cell) "
            "SELECT cell, n_hot, last_hot, "
            "CAST(CASE WHEN n_hot = glb.nb_all THEN 2 "
            "WHEN last_hot = 1 AND n_hot = 1 AND glb.nb_all > 1 THEN 1 "
            "WHEN last_hot = 1 AND n_hot > 1 THEN 3 "
            "WHEN n_hot >= 1 THEN 4 ELSE 0 END AS BIGINT) AS category "
            "FROM per, glb"),
        "radius_join": (
            f"WITH base AS ({geo}), "
            f"d AS (SELECT doc_id, site_id, "
            f"(lat - site_lat)*(lat - site_lat) + (lng - site_lng)*(lng - site_lng) AS dist "
            f"FROM base, {sites} WHERE lat IS NOT NULL) "
            f"SELECT doc_id, CAST(site_id AS BIGINT) AS site_id, "
            f"round(dist, 6) AS dist "
            f"FROM d WHERE dist <= 225.0"),
        "raster_zonal": (
            f"WITH base AS ({geo}), v AS (SELECT "
            f"(CAST(least(greatest(floor((lat + 90.0) / 180.0 * 16), 0), 15) AS BIGINT) * 16 "
            f"+ CAST(least(greatest(floor((lng + 180.0) / 360.0 * 16), 0), 15) AS BIGINT)) AS cell, "
            f"((CAST(least(greatest(floor((lat + 90.0) / 180.0 * 64), 0), 63) AS BIGINT) * 31 "
            f"+ CAST(least(greatest(floor((lng + 180.0) / 360.0 * 64), 0), 63) AS BIGINT) * 17) "
            f"% 1000) / 1024.0 AS rv "
            f"FROM base WHERE lat IS NOT NULL) "
            f"SELECT cell, CAST(count(*) AS BIGINT) AS n, "
            f"sum(rv) AS sum_value, sum(rv) / count(*) AS mean_value "
            f"FROM v GROUP BY cell"),
        "zonal": (
            f"WITH base AS ({geo}) SELECT {cell} AS cell, "
            f"CAST(count(*) AS BIGINT) AS n, sum(weight) AS sumw, "
            f"sum(weight*weight) AS sumw2 "
            f"FROM base WHERE lat IS NOT NULL GROUP BY cell"),
        "topk_cells": (
            f"WITH base AS ({geo}), z AS (SELECT {cell} AS cell, "
            f"CAST(count(*) AS BIGINT) AS n FROM base WHERE lat IS NOT NULL "
            f"GROUP BY cell) SELECT cell, n FROM z ORDER BY n DESC, cell LIMIT 10"),
        "focal_mean": (
            f"WITH base AS ({geo}), "
            f"z AS (SELECT {cell} AS cell, CAST(count(*) AS BIGINT) AS n, "
            "sum(weight) AS s FROM base WHERE lat IS NOT NULL "
            "GROUP BY cell), "
            "off AS (SELECT dy, dx FROM unnest([-1, 0, 1]) AS a(dy), "
            "unnest([-1, 0, 1]) AS b(dx)), "
            f"exp AS (SELECT (z.cell // {_N} + dy) * {_N} + "
            f"(((z.cell % {_N}) + dx) % {_N} + {_N}) % {_N} AS cell, "
            "z.s, z.n, CASE WHEN dy = 0 AND dx = 0 THEN z.n ELSE 0 END "
            "AS own_n FROM z, off "
            f"WHERE z.cell // {_N} + dy BETWEEN 0 AND {_N - 1}), "
            "f AS (SELECT cell, sum(s) AS focal_sum, "
            "CAST(sum(n) AS BIGINT) AS focal_n, "
            "CAST(sum(own_n) AS BIGINT) AS n FROM exp GROUP BY cell) "
            "SELECT cell, n, focal_n, focal_sum, "
            "focal_sum / focal_n AS focal_mean FROM f WHERE n > 0"),
        "hll_users": _hll_sql(),
        "cms_users": _cms_sql(),
        "zorder": _zorder_sql(),
        "hilbert": _hilbert_sql(),
        "knn_graph": (
            f"WITH base AS ({geo}), "
            f"p AS (SELECT doc_id, lat, lng FROM base "
            f"WHERE lat IS NOT NULL), "
            "d AS (SELECT a.doc_id AS id, b.doc_id AS nbr_id, "
            "(a.lat - b.lat)*(a.lat - b.lat) "
            "+ (a.lng - b.lng)*(a.lng - b.lng) AS dist "
            "FROM p a JOIN p b ON a.doc_id <> b.doc_id), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY id "
            "ORDER BY dist, nbr_id) AS rank FROM d WHERE dist <= 100.0) "
            "SELECT id, nbr_id, round(dist, 6) AS dist, "
            "CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 3"),
        "radius_anti": (
            f"WITH base AS ({geo}) "
            f"SELECT doc_id, lat, lng FROM base WHERE lat IS NOT NULL "
            f"AND NOT EXISTS (SELECT 1 FROM {sites} WHERE "
            f"(lat - site_lat)*(lat - site_lat) "
            f"+ (lng - site_lng)*(lng - site_lng) <= 225.0)"),
        "time_autocorr": (
            "WITH b AS (SELECT epoch_us(ts) // 86400000000 AS tb, "
            "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1), "
            "rng AS (SELECT unnest(generate_series("
            "(SELECT min(tb) FROM b), (SELECT max(tb) FROM b))) AS tb), "
            "c AS (SELECT rng.tb, coalesce(b.n, 0) AS n "
            "FROM rng LEFT JOIN b ON b.tb = rng.tb), "
            "l AS (SELECT n AS y, lag(n) OVER (ORDER BY tb) AS x FROM c), "
            "p AS (SELECT CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y "
            "FROM l WHERE x IS NOT NULL), "
            "s AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, "
            "CAST(sum(x*x) AS BIGINT) AS sxx, "
            "CAST(sum(y*y) AS BIGINT) AS syy, "
            "CAST(sum(x*y) AS BIGINT) AS sxy FROM p) "
            "SELECT n_pairs, sx, sy, sxx, syy, sxy, "
            "CAST(CAST(n_pairs AS HUGEINT) * sxy "
            "- CAST(sx AS HUGEINT) * sy AS DOUBLE) "
            "/ (sqrt(CAST(CAST(n_pairs AS HUGEINT) * sxx "
            "- CAST(sx AS HUGEINT) * sx AS DOUBLE)) "
            "* sqrt(CAST(CAST(n_pairs AS HUGEINT) * syy "
            "- CAST(sy AS HUGEINT) * sy AS DOUBLE))) AS corr FROM s"),
        "knox": (
            "WITH e AS (SELECT event_id AS id, epoch_us(ts) AS t, "
            "((event_id * 2654435761) % 1024) // 128 AS xc, "
            "((event_id * 40503 + 12345) % 1024) // 128 AS yc FROM events) "
            "SELECT CAST(count(*) AS BIGINT) AS st_pairs, "
            "(SELECT CAST(count(*) AS BIGINT) FROM e) AS n_events "
            "FROM e a JOIN e b ON a.t - b.t BETWEEN 0 AND 3600000000 "
            "AND (a.t > b.t OR (a.t = b.t AND a.id > b.id)) "
            "AND abs(a.xc - b.xc) <= 1 "
            "AND least((a.yc - b.yc + 8) % 8, (b.yc - a.yc + 8) % 8) <= 1"),
        "od_gravity": (
            "WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t, "
            "(event_id * 2654435761) % 1024 AS x, "
            "(event_id * 40503 + 12345) % 1024 AS y FROM events), "
            "c AS (SELECT user_id, t, event_id, "
            "(x // 128) * 8 + (y // 128) AS cell FROM p), "
            "l AS (SELECT cell, lag(cell) OVER (PARTITION BY user_id "
            "ORDER BY t, event_id) AS prev FROM c), "
            "od AS (SELECT CAST(prev AS BIGINT) AS cell_from, "
            "CAST(cell AS BIGINT) AS cell_to, CAST(count(*) AS BIGINT) AS n "
            "FROM l WHERE prev IS NOT NULL AND prev <> cell GROUP BY 1, 2), "
            "tt AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM od), "
            "r AS (SELECT cell_from, CAST(sum(n) AS BIGINT) AS row_n "
            "FROM od GROUP BY 1), "
            "cc AS (SELECT cell_to, CAST(sum(n) AS BIGINT) AS col_n "
            "FROM od GROUP BY 1) "
            "SELECT od.cell_from, od.cell_to, od.n, r.row_n, cc.col_n, "
            "CAST(od.n * total AS DOUBLE) / (r.row_n * cc.col_n) AS ratio "
            "FROM od JOIN r ON r.cell_from = od.cell_from "
            "JOIN cc ON cc.cell_to = od.cell_to, tt"),
        "stay_points": (
            "WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t, "
            "(((event_id * 2654435761) % 1024) // 256) * 4 "
            "+ ((event_id * 40503 + 12345) % 1024) // 256 AS cell "
            "FROM events), "
            "o AS (SELECT *, "
            "row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) "
            "AS rn, "
            "row_number() OVER (PARTITION BY user_id, cell "
            "ORDER BY t, event_id) AS rnc FROM p), "
            "sel AS (SELECT user_id, cell, rn - rnc AS grp, event_id, t, "
            "row_number() OVER w AS rr, "
            "count(*) OVER (PARTITION BY user_id, cell, rn - rnc) AS n, "
            "first_value(event_id) OVER w AS start_id, "
            "first_value(t) OVER w AS start_us, "
            "last_value(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND UNBOUNDED FOLLOWING) AS end_id, "
            "last_value(t) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND UNBOUNDED FOLLOWING) AS end_us "
            "FROM o WINDOW w AS (PARTITION BY user_id, cell, rn - rnc "
            "ORDER BY t, event_id)) "
            "SELECT user_id, CAST(cell AS BIGINT) AS cell, "
            "CAST(start_id AS BIGINT) AS start_id, "
            "CAST(end_id AS BIGINT) AS end_id, "
            "CAST(start_us AS BIGINT) AS start_us, "
            "CAST(end_us AS BIGINT) AS end_us, "
            "CAST(n AS BIGINT) AS n_events, "
            "CAST(end_us - start_us AS BIGINT) AS span_us "
            "FROM sel WHERE rr = 1 AND n >= 2"),
        "attribution": (
            "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, "
            "event_type FROM events), "
            "c AS (SELECT * FROM e WHERE event_type = 'purchase'), "
            "s AS (SELECT * FROM e WHERE event_type = 'click') "
            "SELECT c.user_id, CAST(c.event_id AS BIGINT) AS conv_id, "
            "CAST(c.t AS BIGINT) AS conv_us, "
            "CAST(s.event_id AS BIGINT) AS src_id, "
            "CAST(s.t AS BIGINT) AS src_us, "
            "CAST(c.t - s.t AS BIGINT) AS gap_us "
            "FROM c JOIN s ON s.user_id = c.user_id "
            "AND (s.t < c.t OR (s.t = c.t AND s.event_id < c.event_id)) "
            "AND c.t - s.t <= 259200000000 "
            "QUALIFY row_number() OVER (PARTITION BY c.user_id, c.event_id "
            "ORDER BY s.t DESC, s.event_id DESC) = 1"),
        "local_autocorr": (
            f"WITH base AS ({geo}), "
            f"z AS (SELECT {cell} AS cell, CAST(count(*) AS BIGINT) AS n "
            "FROM base WHERE lat IS NOT NULL GROUP BY cell), "
            "s AS (SELECT CAST(count(*) AS BIGINT) AS nc, "
            "CAST(sum(n) AS BIGINT) AS sx, "
            "CAST(sum(n*n) AS BIGINT) AS q FROM z), "
            "off AS (SELECT dy, dx FROM unnest([-1, 0, 1]) AS a(dy), "
            "unnest([-1, 0, 1]) AS b(dx) WHERE NOT (dy = 0 AND dx = 0)), "
            f"exp AS (SELECT (z.cell // {_N} + dy) * {_N} + "
            f"(((z.cell % {_N}) + dx) % {_N} + {_N}) % {_N} AS cell, "
            f"z.n AS nsrc FROM z, off "
            f"WHERE z.cell // {_N} + dy BETWEEN 0 AND {_N - 1}), "
            "nb AS (SELECT cell, CAST(sum(nsrc) AS BIGINT) AS nbr_sum, "
            "CAST(count(*) AS BIGINT) AS nbr_deg FROM exp GROUP BY cell) "
            "SELECT z.cell, z.n, "
            "CAST(s.nc * z.n - s.sx AS BIGINT) AS u, "
            "CAST(s.nc * coalesce(nb.nbr_sum, 0) "
            "- s.sx * coalesce(nb.nbr_deg, 0) AS BIGINT) AS nbr_u, "
            "(CAST(s.nc * z.n - s.sx AS DOUBLE) "
            "* CAST(s.nc * coalesce(nb.nbr_sum, 0) "
            "- s.sx * coalesce(nb.nbr_deg, 0) AS DOUBLE)) "
            "/ CAST(CAST(s.nc AS HUGEINT) * s.q "
            "- CAST(s.sx AS HUGEINT) * s.sx AS DOUBLE) AS lisa "
            "FROM z LEFT JOIN nb ON z.cell = nb.cell, s"),
        "convex_hulls": (
            "WITH pts AS (SELECT DISTINCT user_id, "
            "(event_id * 2654435761) % 1024 AS x, "
            "(event_id * 40503 + 12345) % 1024 AS y FROM events), "
            "cnt AS (SELECT user_id, count(*) AS n FROM pts GROUP BY 1) "
            "SELECT p.user_id, CAST(p.x AS BIGINT) AS x, "
            "CAST(p.y AS BIGINT) AS y "
            "FROM pts p JOIN cnt ON cnt.user_id = p.user_id "
            "WHERE cnt.n = 1 OR EXISTS (SELECT 1 FROM pts q "
            "WHERE q.user_id = p.user_id "
            "AND NOT (q.x = p.x AND q.y = p.y) "
            "AND NOT EXISTS (SELECT 1 FROM pts r "
            "WHERE r.user_id = p.user_id "
            "AND NOT (r.x = p.x AND r.y = p.y) "
            "AND NOT (r.x = q.x AND r.y = q.y) "
            "AND NOT ("
            "(q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x) > 0 "
            "OR ((q.x - p.x) * (r.y - p.y) - (q.y - p.y) * (r.x - p.x) = 0 "
            "AND (q.x - p.x) * (r.x - p.x) "
            "+ (q.y - p.y) * (r.y - p.y) > 0))))"),
        "colocation": (
            "WITH p AS (SELECT DISTINCT "
            "(((event_id * 2654435761) % 1024) // 128) * 8 "
            "+ ((event_id * 40503 + 12345) % 1024) // 128 AS cell, "
            "event_type AS label FROM events), "
            "nc AS (SELECT CAST(count(DISTINCT cell) AS BIGINT) AS n_cells "
            "FROM p), "
            "la AS (SELECT label, CAST(count(*) AS BIGINT) AS n "
            "FROM p GROUP BY label), "
            "pp AS (SELECT a.label AS label_a, b.label AS label_b, "
            "CAST(count(*) AS BIGINT) AS n_ab FROM p a "
            "JOIN p b ON a.cell = b.cell AND a.label < b.label "
            "GROUP BY 1, 2) "
            "SELECT label_a, label_b, la1.n AS n_a, la2.n AS n_b, n_ab, "
            "CAST(n_cells * n_ab AS DOUBLE) / (la1.n * la2.n) AS lift "
            "FROM pp JOIN la la1 ON la1.label = pp.label_a "
            "JOIN la la2 ON la2.label = pp.label_b, nc"),
        "interval_join": (
            "WITH iv AS (SELECT event_id AS id, epoch_us(ts) AS s, "
            "epoch_us(ts) + ((event_id * 2654435761) % 1024 + 1) * 1000000 "
            "AS e FROM events), "
            "l AS (SELECT * FROM iv WHERE id % 2 = 0), "
            "r AS (SELECT * FROM iv WHERE id % 2 = 1) "
            "SELECT l.id AS id_a, r.id AS id_b, "
            "CAST(least(l.e, r.e) - greatest(l.s, r.s) AS BIGINT) "
            "AS overlap_us "
            "FROM l, r WHERE l.s <= r.e AND r.s <= l.e"),
        "zscore_outliers": (
            "WITH d AS (SELECT doc_id, lang, "
            "CAST(length(text) AS BIGINT) AS len FROM documents), "
            "g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(len) AS BIGINT) AS s, "
            "CAST(sum(len * len) AS BIGINT) AS q FROM d GROUP BY lang), "
            "m AS (SELECT lang, CAST(s AS DOUBLE) / n AS mu, "
            "CAST(q AS DOUBLE) / n - (CAST(s AS DOUBLE) / n) "
            "* (CAST(s AS DOUBLE) / n) AS var FROM g) "
            "SELECT d.doc_id, d.lang, d.len, "
            "(d.len - mu) / sqrt(var) AS zscore "
            "FROM d JOIN m ON d.lang = m.lang "
            "WHERE (d.len - mu) * (d.len - mu) > 2.25 * var"),
        "geofence": (
            "WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t, "
            "(event_id * 2654435761) % 1024 AS x, "
            "(event_id * 40503 + 12345) % 1024 AS y FROM events), "
            "c AS (SELECT user_id, event_id, t, "
            "CASE WHEN (x // 128) BETWEEN 2 AND 4 "
            "AND (y // 128) BETWEEN 3 AND 5 THEN 1 ELSE 0 END AS inside "
            "FROM p), "
            "l AS (SELECT user_id, event_id, t, inside, "
            "lag(inside) OVER (PARTITION BY user_id ORDER BY t, event_id) "
            "AS prev FROM c) "
            "SELECT user_id, CAST(event_id AS BIGINT) AS event_id, "
            "CAST(t AS BIGINT) AS ts_us, "
            "CASE WHEN inside = 1 THEN 'enter' ELSE 'exit' END AS transition "
            "FROM l WHERE prev IS NOT NULL AND inside <> prev"),
        "geofence_dwell": (
            "WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t, "
            "(event_id * 2654435761) % 1024 AS x, "
            "(event_id * 40503 + 12345) % 1024 AS y FROM events), "
            "c AS (SELECT user_id, event_id, t, "
            "CASE WHEN (x // 128) BETWEEN 2 AND 4 "
            "AND (y // 128) BETWEEN 3 AND 5 THEN 1 ELSE 0 END AS inside "
            "FROM p), "
            "l AS (SELECT user_id, event_id, t, inside, "
            "lag(inside) OVER (PARTITION BY user_id ORDER BY t, event_id) "
            "AS prev FROM c), "
            "tr AS (SELECT user_id, event_id, t, inside FROM l "
            "WHERE prev IS NOT NULL AND inside <> prev), "
            "w AS (SELECT user_id, event_id AS enter_id, t AS enter_us, "
            "inside, "
            "lead(event_id) OVER (PARTITION BY user_id ORDER BY t, event_id) "
            "AS exit_id, "
            "lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) "
            "AS exit_us, "
            "lead(inside) OVER (PARTITION BY user_id ORDER BY t, event_id) "
            "AS nxt FROM tr) "
            "SELECT user_id, CAST(enter_id AS BIGINT) AS enter_id, "
            "CAST(exit_id AS BIGINT) AS exit_id, "
            "CAST(enter_us AS BIGINT) AS enter_us, "
            "CAST(exit_us AS BIGINT) AS exit_us, "
            "CAST(exit_us - enter_us AS BIGINT) AS dwell_us "
            "FROM w WHERE inside = 1 AND nxt = 0"),
        "spatial_autocorr": (
            f"WITH base AS ({geo}), "
            f"z AS (SELECT {cell} AS cell, CAST(count(*) AS BIGINT) AS n "
            "FROM base WHERE lat IS NOT NULL GROUP BY cell), "
            "off AS (SELECT dy, dx FROM unnest([-1, 0, 1]) AS a(dy), "
            "unnest([-1, 0, 1]) AS b(dx) WHERE NOT (dy = 0 AND dx = 0)), "
            f"exp AS (SELECT (z.cell // {_N} + dy) * {_N} + "
            f"(((z.cell % {_N}) + dx) % {_N} + {_N}) % {_N} AS cell, "
            f"z.n AS nsrc FROM z, off "
            f"WHERE z.cell // {_N} + dy BETWEEN 0 AND {_N - 1}), "
            "nb AS (SELECT cell, CAST(sum(nsrc) AS BIGINT) AS nbr_sum, "
            "CAST(count(*) AS BIGINT) AS nbr_deg FROM exp GROUP BY cell), "
            "s AS (SELECT "
            "(SELECT CAST(count(*) AS BIGINT) FROM z) AS n_cells, "
            "(SELECT CAST(sum(n) AS BIGINT) FROM z) AS sum_x, "
            "(SELECT CAST(sum(n*n) AS BIGINT) FROM z) AS sum_x2, "
            "CAST(coalesce(sum(nbr_deg), 0) AS BIGINT) AS w_edges, "
            "CAST(coalesce(sum(z.n * nbr_sum), 0) AS BIGINT) AS cross_sum, "
            "CAST(coalesce(sum(z.n * nbr_deg), 0) AS BIGINT) AS edge_sum "
            "FROM z JOIN nb ON z.cell = nb.cell) "
            "SELECT n_cells, sum_x, sum_x2, w_edges, cross_sum, edge_sum, "
            "CAST(CAST(n_cells AS HUGEINT) * n_cells * cross_sum "
            "- 2 * CAST(n_cells AS HUGEINT) * sum_x * edge_sum "
            "+ CAST(sum_x AS HUGEINT) * sum_x * w_edges AS DOUBLE) "
            "/ CAST(CAST(w_edges AS HUGEINT) * "
            "(CAST(n_cells AS HUGEINT) * sum_x2 - CAST(sum_x AS HUGEINT) * sum_x) "
            "AS DOUBLE) AS morans_i FROM s"),
        "cutflow": _cutflow_sql(),
        "multi_cutflow": _multi_cutflow_sql(),
        "multi_binned": (
            "WITH b AS (SELECT "
            "CASE WHEN l_orderkey % 2 = 0 THEN 'mc_even' ELSE 'data_odd' END AS dataset, "
            "l_returnflag, l_discount, "
            "CAST(CASE WHEN l_quantity < 0 THEN 0 WHEN l_quantity < 10 THEN 1 "
            "WHEN l_quantity < 20 THEN 2 WHEN l_quantity < 30 THEN 3 "
            "WHEN l_quantity < 40 THEN 4 WHEN l_quantity < 50 THEN 5 "
            "ELSE 6 END AS BIGINT) AS qty_bin FROM lineitem) "
            "SELECT dataset, l_returnflag, qty_bin, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(l_discount), 6) AS sumw, "
            "round(sum(l_discount*l_discount), 6) AS sumw2 "
            "FROM b GROUP BY dataset, l_returnflag, qty_bin"),
        "select_phasespace": (
            f"WITH base AS ({geo}) SELECT doc_id, "
            f"(lang = 'en' AND coalesce(lat > 0.0, FALSE)) AS region_en_north "
            f"FROM base"),
        "define_events": (
            "SELECT event_id, value * 2.0 + 1.0 AS v2, sqrt(value * value) AS rv "
            "FROM events WHERE event_type = 'click'"),
        "systematic_weights": (
            "SELECT l_orderkey, l_linenumber, "
            "(1.0 - l_discount)*(1.0 + l_tax) AS weight_nominal, "
            "(1.0 - l_discount * 0.5)*(1.0 + l_tax) AS weight_disc_up "
            "FROM lineitem"),
        "binned_lineitem": (
            "WITH b AS (SELECT l_returnflag, l_discount, "
            "CAST(CASE WHEN l_quantity < 0 THEN 0 WHEN l_quantity < 10 THEN 1 "
            "WHEN l_quantity < 20 THEN 2 WHEN l_quantity < 30 THEN 3 "
            "WHEN l_quantity < 40 THEN 4 WHEN l_quantity < 50 THEN 5 "
            "ELSE 6 END AS BIGINT) AS qty_bin FROM lineitem) "
            "SELECT l_returnflag, qty_bin, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(l_discount), 6) AS sumw, "
            "round(sum(l_discount*l_discount), 6) AS sumw2 "
            "FROM b GROUP BY l_returnflag, qty_bin"),
        "skim": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice "
            "FROM lineitem WHERE l_quantity > 45.0"),
        "window_agg": (
            "SELECT user_id, epoch_us(ts) // 3600000000 AS win, "
            "CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS sum_value "
            "FROM events GROUP BY user_id, win"),
        "asof_join": (
            "WITH p AS (SELECT event_id, user_id, ts, value FROM events "
            "WHERE event_type = 'purchase'), "
            "v AS (SELECT event_id, user_id, ts, value FROM events "
            "WHERE event_type = 'view') "
            "SELECT p.user_id, p.event_id, p.value, "
            "v.event_id AS view_event_id, v.value AS view_value "
            "FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts"),
        "quantiles": (
            "WITH c AS (SELECT n_chars AS v, count(*) OVER (ORDER BY n_chars RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, (SELECT count(*) FROM documents) AS n FROM documents) "
            "SELECT 0.25 AS q, CAST(min(v) AS BIGINT) AS value FROM c WHERE cum >= ceil(0.25 * n) UNION ALL SELECT 0.5 AS q, CAST(min(v) AS BIGINT) AS value FROM c WHERE cum >= ceil(0.5 * n) UNION ALL SELECT 0.9 AS q, CAST(min(v) AS BIGINT) AS value FROM c WHERE cum >= ceil(0.9 * n) UNION ALL SELECT 0.99 AS q, CAST(min(v) AS BIGINT) AS value FROM c WHERE cum >= ceil(0.99 * n)"),
        "distinct_users": (
            "SELECT event_type, "
            "CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct "
            "FROM events GROUP BY event_type"),
        "curation_pipeline": (
            "WITH c AS (SELECT n_chars AS v, count(*) OVER (ORDER BY n_chars "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            "(SELECT count(*) FROM documents) AS n FROM documents), "
            "p AS (SELECT min(v) AS p50 FROM c WHERE cum >= ceil(0.5 * n)) "
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)) AS BIGINT) AS total_tokens "
            "FROM documents WHERE n_chars > (SELECT p50 FROM p) "
            "GROUP BY lang"),
        "lang_quantiles": (
            "WITH c AS (SELECT lang AS g, n_chars AS v, "
            "count(*) OVER (PARTITION BY lang ORDER BY n_chars "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            "count(*) OVER (PARTITION BY lang) AS n FROM documents) "
            "SELECT g AS lang, 0.5 AS q, CAST(min(v) AS BIGINT) AS value FROM c WHERE cum >= ceil(0.5 * n) GROUP BY g UNION ALL SELECT g AS lang, 0.9 AS q, CAST(min(v) AS BIGINT) AS value FROM c WHERE cum >= ceil(0.9 * n) GROUP BY g"),
        "theil_sen": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS t, value AS v "
            "FROM events), "
            "p AS (SELECT a.user_id, "
            "(b.v - a.v) / CAST(b.t - a.t AS DOUBLE) AS slope "
            "FROM e a JOIN e b ON a.user_id = b.user_id AND b.t > a.t), "
            "r AS (SELECT user_id, slope, "
            "row_number() OVER (PARTITION BY user_id ORDER BY slope) AS rk, "
            "count(*) OVER (PARTITION BY user_id) AS m FROM p) "
            "SELECT user_id, slope AS theil_sen, CAST(m AS BIGINT) "
            "AS n_pairs FROM r WHERE rk = (m + 1) // 2"),
        "crawl_order": (
            "WITH r AS (SELECT source, doc_id, "
            "CAST(row_number() OVER (PARTITION BY source "
            "ORDER BY n_chars DESC, doc_id) AS BIGINT) AS wave "
            "FROM documents), "
            "s AS (SELECT source, doc_id, wave, "
            "CAST(row_number() OVER (ORDER BY wave, source, doc_id) "
            "AS BIGINT) AS schedule_pos FROM r) "
            "SELECT schedule_pos, wave, source, doc_id FROM s "
            "WHERE schedule_pos <= 100"),
        "weighted_median": (
            "WITH w AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) "
            "AS v, CAST(l_linenumber AS BIGINT) AS wt FROM lineitem), "
            "g AS (SELECT l_returnflag, v, sum(wt) AS wv FROM w "
            "GROUP BY l_returnflag, v), "
            "c AS (SELECT l_returnflag, v, "
            "sum(wv) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw, "
            "sum(wv) OVER (PARTITION BY l_returnflag) AS tw FROM g) "
            "SELECT l_returnflag, CAST(min(v) AS BIGINT) AS wmedian "
            "FROM c WHERE 2 * cw >= tw GROUP BY l_returnflag"),
        "percentile_rank": (
            "SELECT doc_id, n_chars, "
            "CAST(rank() OVER (ORDER BY n_chars) AS BIGINT) AS rnk "
            "FROM documents"),
        "hot_cells": (
            f"WITH base AS ({geo}), c AS (SELECT {cell} AS cell FROM base "
            f"WHERE lat IS NOT NULL), tot AS (SELECT count(*) AS t FROM c) "
            f"SELECT cell, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY cell "
            f"HAVING count(*) >= ceil((SELECT t FROM tot) * 0.02)"),
        "profile": (
            "SELECT 'doc_id' AS \"column\", CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) - count(doc_id) AS BIGINT) AS n_null, "
            "CAST(min(doc_id) AS DOUBLE) AS min, "
            "CAST(max(doc_id) AS DOUBLE) AS max, "
            "CAST(sum(doc_id) AS DOUBLE) AS sum FROM documents "
            "UNION ALL "
            "SELECT 'n_chars', CAST(count(*) AS BIGINT), "
            "CAST(count(*) - count(n_chars) AS BIGINT), "
            "CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE), "
            "CAST(sum(n_chars) AS DOUBLE) FROM documents"),
        "doc_sample": (
            f"SELECT doc_id, lang FROM documents "
            f"WHERE {sample_sql('doc_id', 0.37)}"),
        "stratified_sample": (
            f"SELECT doc_id, lang FROM documents "
            f"WHERE {mix_hash_sql('doc_id')} < "
            f"(CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 200000 "
            f"ELSE 50000 END)"),
        "top_docs": (
            "WITH r AS (SELECT lang, doc_id, n_chars, "
            "row_number() OVER (PARTITION BY lang "
            "ORDER BY n_chars DESC, doc_id DESC) AS rank FROM documents) "
            "SELECT lang, doc_id, n_chars, CAST(rank AS BIGINT) AS rank "
            "FROM r WHERE rank <= 5"),
        "lang_id": _lang_id_sql(),
        "lang_confusion": (
            f"WITH pred AS ({_lang_id_sql()}) "
            "SELECT d.lang, p.lang_pred, "
            "CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents d JOIN pred p USING (doc_id) "
            "GROUP BY 1, 2"),
        "repetition": (
            "WITH toks AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), "
            "t -> t != '') AS t FROM documents), "
            "u AS (SELECT doc_id, generate_subscripts(t, 1) AS j, "
            "unnest(t) AS w, len(t) AS n_tok FROM toks), "
            "per AS (SELECT doc_id, w, count(*) AS c FROM u "
            "GROUP BY doc_id, w), "
            "d AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_distinct, "
            "CAST(max(c) AS BIGINT) AS top_n FROM per GROUP BY doc_id), "
            "b AS (SELECT a.doc_id, a.w || ' ' || c.w AS bg FROM u a "
            "JOIN u c ON c.doc_id = a.doc_id AND c.j = a.j + 1), "
            "db AS (SELECT doc_id, CAST(count(DISTINCT bg) AS BIGINT) "
            "AS n_distinct_bigrams FROM b GROUP BY doc_id), "
            "base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tok, "
            "CAST(greatest(len(t) - 1, 0) AS BIGINT) AS n_bigrams "
            "FROM toks) "
            "SELECT base.doc_id, base.n_tok, "
            "coalesce(d.n_distinct, 0) AS n_distinct, "
            "coalesce(d.top_n, 0) AS top_n, base.n_bigrams, "
            "coalesce(db.n_distinct_bigrams, 0) AS n_distinct_bigrams, "
            "CAST(base.n_tok - coalesce(d.n_distinct, 0) AS DOUBLE) "
            "/ greatest(base.n_tok, 1) AS dup_token_ratio, "
            "CAST(coalesce(d.top_n, 0) AS DOUBLE) "
            "/ greatest(base.n_tok, 1) AS top_token_ratio, "
            "CAST(base.n_bigrams - coalesce(db.n_distinct_bigrams, 0) "
            "AS DOUBLE) / greatest(base.n_bigrams, 1) AS dup_bigram_ratio "
            "FROM base LEFT JOIN d USING (doc_id) "
            "LEFT JOIN db USING (doc_id)"),
        "similarity_join": (
            "WITH toks AS (SELECT doc_id, list_distinct(list_filter("
            "regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), "
            "t -> t != '')) AS t FROM documents), "
            "u AS (SELECT doc_id, unnest(t) AS w, len(t) AS sz FROM toks), "
            "i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS inter, any_value(a.sz) AS sz_a, "
            "any_value(b.sz) AS sz_b "
            "FROM u a JOIN u b ON a.w = b.w AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT id_a, id_b, inter, sz_a, sz_b, "
            "CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) AS jaccard "
            "FROM i WHERE CAST(inter AS DOUBLE) / (sz_a + sz_b - inter) "
            ">= 0.9"),
        "containment_join": (
            "WITH toks AS (SELECT doc_id, list_distinct(list_filter("
            "regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), "
            "t -> t != '')) AS t FROM documents), "
            "u AS (SELECT doc_id, unnest(t) AS w, len(t) AS sz FROM toks), "
            "i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "count(*) AS inter, any_value(a.sz) AS sz_a, "
            "any_value(b.sz) AS sz_b "
            "FROM u a JOIN u b ON a.w = b.w AND a.doc_id != b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT id_a, id_b, inter, sz_a, sz_b, "
            "CAST(inter AS DOUBLE) / sz_a AS containment "
            "FROM i WHERE CAST(inter AS DOUBLE) / sz_a >= 0.8"),
        "reduce_cut": (
            "WITH toks AS (SELECT doc_id, list_transform(list_filter("
            "regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), "
            "t -> t != ''), s -> "
            "('0x' || substring(sha256(s), 1, 16))::UBIGINT % 1000) AS l "
            "FROM documents) "
            "SELECT doc_id, "
            "CAST(len(list_filter(l, x -> x > 900)) > 0 AS BIGINT) "
            "AS any_gt, "
            "CAST(coalesce(l[1] > 900, false) AS BIGINT) AS first_gt "
            "FROM toks"),
        "binned_padded": (
            "WITH bins AS (SELECT unnest(range(-1, 17)) AS chars_bin), "
            "c AS (SELECT CAST(CASE WHEN n_chars < 0 THEN -1 "
            "ELSE least(floor(n_chars / 250.0), 16) END AS BIGINT) "
            "AS chars_bin, count(*) AS n FROM documents "
            "WHERE n_chars IS NOT NULL GROUP BY 1) "
            "SELECT CAST(bins.chars_bin AS BIGINT) AS chars_bin, "
            "CAST(coalesce(c.n, 0) AS BIGINT) AS n "
            "FROM bins LEFT JOIN c USING (chars_bin)"),
        "jagged_reduce": (
            "WITH toks AS (SELECT doc_id, list_transform(list_filter("
            "regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), "
            "t -> t != ''), s -> "
            "('0x' || substring(sha256(s), 1, 16))::UBIGINT % 1000) AS v "
            "FROM documents) "
            "SELECT doc_id, CAST(len(v) AS BIGINT) AS n, "
            "CAST(list_aggregate(v, 'sum') AS BIGINT) AS vsum, "
            "CAST(list_max(v) AS BIGINT) AS vmax, "
            "CAST(list_min(v) AS BIGINT) AS vmin, "
            "CAST(coalesce(v[1], -1) AS BIGINT) AS first, "
            "CAST(list_position(v, list_max(v)) - 1 AS BIGINT) AS amax "
            "FROM toks"),
        "jagged_explode": (
            "WITH toks AS (SELECT doc_id, list_transform(list_filter("
            "regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), "
            "t -> t != ''), s -> "
            "('0x' || substring(sha256(s), 1, 16))::UBIGINT % 1000) AS l "
            "FROM documents) "
            "SELECT doc_id, CAST(generate_subscripts(l, 1) - 1 AS BIGINT) "
            "AS pos, CAST(unnest(l) AS BIGINT) AS v FROM toks"),
        "chunk_dup": (
            "WITH corpus AS ("
            "SELECT doc_id, text FROM documents "
            "UNION ALL "
            "SELECT doc_id + 10000000, text || ' near duplicate suffix "
            "tokens' FROM documents WHERE doc_id % 10 = 0), "
            "toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
            "lower(coalesce(text, '')), '\\s+'), t -> t != '') AS t "
            "FROM corpus), "
            "th AS (SELECT doc_id, list_transform(t, s -> "
            "('0x' || substring(sha256(s), 1, 16))::UBIGINT) AS h "
            "FROM toks WHERE len(t) >= 8), "
            "ch AS (SELECT doc_id, CAST(list_reduce("
            "list_prepend(0::UBIGINT, list_slice(h, 8*i + 1, 8*i + 8)), "
            f"(acc, x) -> CAST((acc::HUGEINT * {_FNV_P} + x) % {_POW64} "
            "AS UBIGINT)) AS UBIGINT) AS chunk "
            "FROM th, unnest(range(len(h) // 8)) AS r(i)), "
            "cnt AS (SELECT chunk, count(DISTINCT doc_id) AS total "
            "FROM ch GROUP BY chunk), "
            "d AS (SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks, "
            "CAST(sum(CASE WHEN cnt.total > 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_dup_chunks "
            "FROM ch JOIN cnt USING (chunk) GROUP BY ch.doc_id) "
            "SELECT doc_id, n_chunks, n_dup_chunks, "
            "CAST(n_dup_chunks AS DOUBLE) / n_chunks AS dup_chunk_frac "
            "FROM d"),
        "dedup_spans": (
            "WITH corpus AS ("
            "SELECT doc_id, text FROM documents "
            "UNION ALL "
            "SELECT doc_id + 10000000, text || ' near duplicate suffix "
            "tokens' FROM documents WHERE doc_id % 10 = 0), "
            "toks AS (SELECT doc_id, list_filter(regexp_split_to_array("
            "lower(coalesce(text, '')), '\\s+'), t -> t != '') AS t "
            "FROM corpus), "
            "th AS (SELECT doc_id, list_transform(t, s -> "
            "('0x' || substring(sha256(s), 1, 16))::UBIGINT) AS h "
            "FROM toks), "
            "ch AS (SELECT doc_id, i AS cid, CAST(list_reduce("
            "list_prepend(0::UBIGINT, list_slice(h, 8*i + 1, 8*i + 8)), "
            f"(acc, x) -> CAST((acc::HUGEINT * {_FNV_P} + x) % {_POW64} "
            "AS UBIGINT)) AS UBIGINT) AS chunk "
            "FROM th, unnest(range(len(h) // 8)) AS r(i)), "
            "com AS (SELECT chunk FROM (SELECT chunk, "
            "count(DISTINCT doc_id) AS c FROM ch GROUP BY chunk) "
            "WHERE c >= 2), "
            "rem AS (SELECT doc_id, cid FROM ch "
            "WHERE chunk IN (SELECT chunk FROM com)), "
            "tok_rows AS (SELECT doc_id, unnest(t) AS tok, "
            "generate_subscripts(t, 1) - 1 AS pos FROM toks), "
            "keep AS (SELECT k.doc_id, k.tok, k.pos FROM tok_rows k "
            "LEFT JOIN rem ON rem.doc_id = k.doc_id "
            "AND rem.cid = k.pos // 8 WHERE rem.cid IS NULL), "
            "agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) "
            "AS clean_text FROM keep GROUP BY doc_id), "
            "nstat AS (SELECT doc_id, CAST(len(h) // 8 AS BIGINT) "
            "AS n_chunks FROM th), "
            "rstat AS (SELECT doc_id, CAST(count(*) AS BIGINT) "
            "AS n_removed FROM rem GROUP BY doc_id) "
            "SELECT c.doc_id, coalesce(a.clean_text, '') AS clean_text, "
            "n.n_chunks, CAST(coalesce(r.n_removed, 0) AS BIGINT) "
            "AS n_removed "
            "FROM corpus c JOIN nstat n USING (doc_id) "
            "LEFT JOIN agg a USING (doc_id) "
            "LEFT JOIN rstat r USING (doc_id)"),
        "minhash_pairs": _minhash_pairs_sql(),
        "simhash_pairs": _simhash_pairs_sql(),
        "url_dedup": (
            "WITH base AS (SELECT doc_id, 'https://site' || (doc_id % 20) "
            "|| '.example/' || lang || '/p' || doc_id AS url, lang "
            "FROM documents), "
            "var AS (SELECT b.doc_id + 10000000 AS doc_id, "
            "CASE b.doc_id % 4 "
            "WHEN 0 THEN 'http://www.' || upper('site' || (b.doc_id % 20) "
            "|| '.example') || '/' || b.lang || '/p' || b.doc_id "
            "WHEN 1 THEN b.url || '?utm_source=feed' "
            "WHEN 2 THEN b.url || '#section-2' "
            "ELSE b.url || '/' END AS url FROM base b), "
            "corpus AS (SELECT doc_id, url FROM base "
            "UNION ALL SELECT doc_id, url FROM var), "
            "c1 AS (SELECT doc_id, regexp_replace(regexp_replace("
            "regexp_replace(regexp_replace(url, '#.*$', '', 'g'), "
            "'[?&]utm_[^&#]*', '', 'g'), '^http://', 'https://'), "
            "'^https://www\\.', 'https://') AS u FROM corpus), "
            "c2 AS (SELECT doc_id, CASE WHEN regexp_matches(u, "
            "'^https://') THEN 'https://' || lower(regexp_extract(u, "
            "'^https://([^/]*)(.*)$', 1)) || regexp_extract(u, "
            "'^https://([^/]*)(.*)$', 2) ELSE u END AS u FROM c1), "
            "canon AS (SELECT doc_id, regexp_replace(u, '/$', '') "
            "AS canon_url FROM c2) "
            "SELECT min(doc_id) AS doc_id, canon_url FROM canon "
            "GROUP BY canon_url"),
        "near_dedup": _near_dedup_sql(),
        "near_dedup_quality": _near_dedup_quality_sql(),
        "decontam": (
            _decontam_stats_sql()
            + " SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles, "
            "CAST(n_hit AS BIGINT) AS n_hit, "
            "CAST(n_hit AS DOUBLE) / n_sh AS overlap_frac, "
            "CAST(CASE WHEN CAST(n_hit AS DOUBLE) / n_sh >= 0.5 "
            "THEN 1 ELSE 0 END AS BIGINT) AS contaminated FROM stats"),
        "decontam_clean": (
            _decontam_stats_sql()
            + " SELECT doc_id FROM stats "
            "WHERE CAST(n_hit AS DOUBLE) / n_sh < 0.5"),
        "bloom_decontam": (
            _decontam_stats_sql()
            + " SELECT doc_id, CAST(n_sh AS BIGINT) AS n_shingles, "
            "CAST(n_hit AS BIGINT) AS n_hit, "
            "CAST(n_hit AS DOUBLE) / n_sh AS overlap_frac FROM stats "
            "WHERE CAST(n_hit AS DOUBLE) / n_sh >= 0.5"),
        "bm25": _bm25_sql(),
        "llm_curation": _llm_curation_sql(),
        "classifier": _classifier_sql(),
        "pii_stats": _pii_stats_sql(),
        "pii_redact": _pii_redact_sql(),
        "train_order": (
            "SELECT CAST(row_number() OVER (ORDER BY "
            f"{_TRAIN_KEY()}, doc_id) AS BIGINT) AS rank, doc_id, "
            f"{_TRAIN_KEY()} AS shuffle_key FROM documents "
            f"ORDER BY shuffle_key, doc_id LIMIT 200"),
        "mixture_sample": (
            "WITH n AS (SELECT lang, count(*) AS n FROM documents "
            "GROUP BY lang) "
            "SELECT d.doc_id, d.lang FROM documents d JOIN n USING (lang) "
            f"WHERE {_mix_doc_sql()} < least(1000000, 100 * 1000000 // n.n)"),
        "pack_sequences": (
            _pack_lens_sql() + ", "
            "p AS (SELECT doc_id, bucket, n, CAST(coalesce(sum(n) OVER ("
            "PARTITION BY bucket ORDER BY doc_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS BIGINT) AS start FROM n1) "
            "SELECT doc_id, bucket, n AS n_tokens, start AS start_tok, "
            f"start // {_PACK_L} AS first_seq, "
            f"(start + n - 1) // {_PACK_L} AS last_seq FROM p"),
        "pack_summary": (
            _pack_lens_sql()
            + " SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(n) AS BIGINT) AS total_tokens, "
            f"CAST((sum(n) + {_PACK_L - 1}) // {_PACK_L} AS BIGINT) "
            "AS n_seqs FROM n1 GROUP BY bucket"),
        # the rolling-hash fingerprint recomputed entirely in SQL: same
        # RE2 tokenization, same sha256-prefix token hash, same
        # 128-bit (HUGEINT) roll mod 2^64, same 63-bit mask — bit-exact
        "fingerprint": (
            "SELECT doc_id, CAST(list_reduce("
            "list_prepend(14695981039346656037::HUGEINT, "
            "list_transform("
            "list_filter(regexp_split_to_array(lower(coalesce(text, '')), "
            "'\\s+'), t -> t != ''), "
            "t -> ('0x' || substring(sha256(t), 1, 15))::BIGINT::HUGEINT)), "
            "(acc, th) -> (acc * 1099511628211 + th) "
            "% 18446744073709551616::HUGEINT"
            ") % 9223372036854775808::HUGEINT AS BIGINT) AS fingerprint "
            "FROM documents"),
        "bigrams": (
            "WITH u AS (SELECT doc_id, "
            "generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) "
            "AS i, unnest(regexp_split_to_array(text, '\\s+')) AS w "
            "FROM documents), "
            "f AS (SELECT * FROM u WHERE w != ''), "
            "r AS (SELECT doc_id, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY i) AS j, w FROM f), "
            "b AS (SELECT a.w || ' ' || c.w AS ngram FROM r a "
            "JOIN r c ON a.doc_id = c.doc_id AND c.j = a.j + 1) "
            "SELECT ngram, CAST(count(*) AS BIGINT) AS n FROM b "
            "GROUP BY ngram HAVING count(*) >= 5"),
        "familiarity": (
            "WITH toks AS (SELECT doc_id, unnest(list_filter("
            "regexp_split_to_array(coalesce(text, ''), '\\s+'), "
            "t -> t != '')) AS tok FROM documents), "
            "th AS (SELECT doc_id, "
            "('0x' || substring(sha256(tok), 1, 16))::UBIGINT AS h "
            "FROM toks), "
            "cnt AS (SELECT h, CAST(count(*) AS BIGINT) AS c "
            "FROM th GROUP BY h), "
            "tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t1, "
            "CAST(sum(c*c) AS DOUBLE) AS t2 FROM cnt), "
            "d AS (SELECT th.doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(cnt.c) AS BIGINT) AS sum_tf "
            "FROM th JOIN cnt USING (h) GROUP BY th.doc_id) "
            "SELECT doc_id, n_tokens, sum_tf, "
            "CAST(sum_tf AS DOUBLE) / n_tokens AS familiarity, "
            "CAST(CASE WHEN CAST(sum_tf AS DOUBLE) / n_tokens >= t2 / t1 "
            "THEN 0 WHEN CAST(sum_tf AS DOUBLE) / n_tokens < "
            "0.97 * (t2 / t1) THEN 2 ELSE 1 END AS BIGINT) AS bucket "
            "FROM d, tot"),
        "vocab": (
            "WITH w AS (SELECT unnest(regexp_split_to_array(text, '\\s+')) "
            "AS token FROM documents) "
            "SELECT token, CAST(count(*) AS BIGINT) AS n FROM w "
            "WHERE token != '' GROUP BY token HAVING count(*) >= 10"),
        "top_terms": (
            "WITH t AS (SELECT doc_id, "
            "unnest(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents), "
            "tt AS (SELECT doc_id, token FROM t WHERE token != ''), "
            "tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf "
            "FROM tt GROUP BY doc_id, token), "
            "df AS (SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) "
            "AS df FROM tt GROUP BY token), "
            "r AS (SELECT f.doc_id, f.token, f.tf, d.df, "
            "row_number() OVER (PARTITION BY f.doc_id "
            "ORDER BY f.tf DESC, d.df ASC, f.token ASC) AS rk "
            "FROM tf f JOIN df d ON d.token = f.token) "
            "SELECT doc_id, token, tf, df FROM r WHERE rk = 1"),
        "pmi": (
            "WITH u AS (SELECT doc_id, "
            "generate_subscripts(regexp_split_to_array(text, '\\s+'), 1) "
            "AS i, unnest(regexp_split_to_array(text, '\\s+')) AS w "
            "FROM documents), "
            "f AS (SELECT * FROM u WHERE w != ''), "
            "r AS (SELECT doc_id, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY i) AS j, w FROM f), "
            "b AS (SELECT a.w AS w1, c.w AS w2 FROM r a "
            "JOIN r c ON a.doc_id = c.doc_id AND c.j = a.j + 1), "
            "cab AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n "
            "FROM b GROUP BY w1, w2), "
            "nt AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM b), "
            "uni AS (SELECT w AS token, CAST(count(*) AS BIGINT) AS c "
            "FROM f GROUP BY w) "
            "SELECT cab.w1 || ' ' || cab.w2 AS ngram, cab.n, "
            "CAST(nt.nb * cab.n AS DOUBLE) / CAST(ua.c * ub.c AS DOUBLE) "
            "AS ratio FROM cab CROSS JOIN nt "
            "JOIN uni ua ON ua.token = cab.w1 "
            "JOIN uni ub ON ub.token = cab.w2 WHERE cab.n >= 5"),
        "doc_frequency": (
            "WITH w AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents) "
            "SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
            "FROM w WHERE token != '' GROUP BY token "
            "HAVING count(DISTINCT doc_id) >= 10"),
        "hop_window": (
            "WITH e AS (SELECT epoch_us(ts) AS t, value FROM events), "
            "wins AS (SELECT unnest(generate_series("
            "(SELECT min(t) FROM e) // 900000000 - 3, "
            "(SELECT max(t) FROM e) // 900000000)) AS win) "
            "SELECT win, win * 900000000 AS window_start, "
            "CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS sum_value "
            "FROM e JOIN wins "
            "ON win BETWEEN (e.t - 3600000000) // 900000000 + 1 "
            "AND e.t // 900000000 "
            "GROUP BY win"),
        "range_join": (
            "WITH bands AS (SELECT CAST(n_nationkey AS BIGINT) AS band_id, "
            "n_nationkey * 400.0 - 1000.0 AS lo, "
            "n_nationkey * 400.0 - 300.0 AS hi FROM nation) "
            "SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal, band_id "
            "FROM customer JOIN bands "
            "ON c_acctbal >= lo AND c_acctbal < hi"),
        "range_join_big": (
            "WITH bands AS (SELECT CAST(n_nationkey AS BIGINT) AS band_id, "
            "n_nationkey * 400.0 - 1000.0 AS lo, "
            "n_nationkey * 400.0 - 300.0 AS hi FROM nation) "
            "SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal, band_id "
            "FROM customer JOIN bands "
            "ON c_acctbal >= lo AND c_acctbal < hi"),
        "asof_join_bucketed": (
            "WITH p AS (SELECT event_id, user_id, ts, value FROM events "
            "WHERE event_type = 'purchase'), "
            "v AS (SELECT event_id, user_id, ts, value FROM events "
            "WHERE event_type = 'view') "
            "SELECT p.user_id, p.event_id, p.value, "
            "v.event_id AS view_event_id, v.value AS view_value "
            "FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts"),
        "transitions": (
            "WITH l AS (SELECT event_type AS next_type, "
            "lag(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev_type FROM events) "
            "SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n "
            "FROM l WHERE prev_type IS NOT NULL "
            "GROUP BY prev_type, next_type"),
        "funnel": (
            "WITH u0 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events "
            "WHERE event_type = 'view' GROUP BY user_id), "
            "u1 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e "
            "JOIN u0 ON e.user_id = u0.user_id "
            "WHERE e.event_type = 'click' AND epoch_us(e.ts) > u0.t "
            "GROUP BY e.user_id), "
            "u2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e "
            "JOIN u1 ON e.user_id = u1.user_id "
            "WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > u1.t "
            "GROUP BY e.user_id) "
            "SELECT CAST(0 AS BIGINT) AS step, 'view' AS step_name, "
            "(SELECT CAST(count(*) AS BIGINT) FROM u0) AS n_keys "
            "UNION ALL SELECT 1, 'click', "
            "(SELECT CAST(count(*) AS BIGINT) FROM u1) "
            "UNION ALL SELECT 2, 'purchase', "
            "(SELECT CAST(count(*) AS BIGINT) FROM u2)"),
        "session_windows": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events), "
            "m AS (SELECT user_id, t, value, CASE WHEN "
            "t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 7200000000 "
            "OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL "
            "THEN 1 ELSE 0 END AS new FROM e), "
            "s AS (SELECT user_id, t, value, sum(new) OVER ("
            "PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid "
            "FROM m) "
            "SELECT user_id, min(t) AS session_start, "
            "CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS sum_value "
            "FROM s GROUP BY user_id, sid"),
        "session_windows_bucketed": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events), "
            "m AS (SELECT user_id, t, value, CASE WHEN "
            "t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > 7200000000 "
            "OR lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL "
            "THEN 1 ELSE 0 END AS new FROM e), "
            "s AS (SELECT user_id, t, value, sum(new) OVER ("
            "PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS sid "
            "FROM m) "
            "SELECT user_id, min(t) AS session_start, "
            "CAST(count(*) AS BIGINT) AS n, round(sum(value), 6) AS sum_value "
            "FROM s GROUP BY user_id, sid"),
        "window_funcs": _WINDOW_FUNCS_SQL,
        "window_funcs_bucketed": _WINDOW_FUNCS_SQL,
        "trajectory": _TRAJECTORY_SQL,
        "trajectory_bucketed": _TRAJECTORY_SQL,
        "teleports": (
            "WITH p AS (SELECT user_id, event_id, epoch_us(ts) AS t, "
            "(event_id * 2654435761) % 1024 AS x, "
            "(event_id * 40503 + 12345) % 1024 AS y FROM events), "
            "o AS (SELECT user_id, event_id, "
            "(t - lag(t) OVER w) // 1000000 AS gap_s, "
            "(x - lag(x) OVER w) * (x - lag(x) OVER w) "
            "+ (y - lag(y) OVER w) * (y - lag(y) OVER w) AS d2 "
            "FROM p WINDOW w AS (PARTITION BY user_id "
            "ORDER BY t, event_id)) "
            "SELECT user_id, event_id, CAST(gap_s AS BIGINT) AS gap_s, "
            "CAST(d2 AS BIGINT) AS d2 FROM o "
            "WHERE d2 IS NOT NULL AND d2 * 1 > (5 * gap_s) * (5 * gap_s)"),
        "zipf": (
            "WITH w AS (SELECT unnest(regexp_split_to_array(text, '\\s+')) "
            "AS token FROM documents), "
            "v AS (SELECT token, count(*) AS n FROM w WHERE token != '' "
            "GROUP BY token), "
            "r AS (SELECT ln(CAST(row_number() OVER (ORDER BY n DESC, "
            "token) AS DOUBLE)) AS lr, ln(CAST(n AS DOUBLE)) AS lf FROM v), "
            "s AS (SELECT CAST(count(*) AS DOUBLE) AS k, sum(lr) AS sx, "
            "sum(lf) AS sy, sum(lr*lf) AS sxy, sum(lr*lr) AS sxx FROM r) "
            "SELECT CAST(k AS BIGINT) AS n_tokens, "
            "round((k*sxy - sx*sy) / (k*sxx - sx*sx), 6) AS slope FROM s"),
        "ewma": (
            "WITH o AS (SELECT user_id, value, "
            "row_number() OVER w AS i, "
            "count(*) OVER (PARTITION BY user_id) AS n FROM events "
            "WINDOW w AS (PARTITION BY user_id "
            "ORDER BY epoch_us(ts), event_id)) "
            "SELECT user_id, CAST(max(n) AS BIGINT) AS n, "
            "round(sum(CASE WHEN i = 1 THEN power(0.7, n - 1) * value "
            "ELSE 0.3 * power(0.7, n - i) * value END), 6) AS ewma "
            "FROM o GROUP BY user_id ORDER BY user_id"),
        "audience_overlap": (
            "WITH p AS (SELECT DISTINCT user_id, event_type FROM events) "
            "SELECT a.event_type AS a, b.event_type AS b, "
            "CAST(count(*) AS BIGINT) AS n_users "
            "FROM p a JOIN p b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "winsorize": (
            "WITH c AS (SELECT n_chars AS v, count(*) OVER (ORDER BY "
            "n_chars RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS cum, (SELECT count(*) FROM documents) AS n FROM documents), "
            "lo AS (SELECT min(v) AS v FROM c WHERE cum >= ceil(0.05 * n)), "
            "hi AS (SELECT min(v) AS v FROM c WHERE cum >= ceil(0.95 * n)) "
            "SELECT doc_id, CAST(least(greatest(n_chars, "
            "(SELECT v FROM lo)), (SELECT v FROM hi)) AS BIGINT) "
            "AS n_chars_w FROM documents ORDER BY doc_id"),
        "latest_by_key": (
            "WITH v AS ("
            "SELECT doc_id, 1 AS version, n_chars FROM documents "
            "UNION ALL SELECT doc_id, 2, n_chars + 7 FROM documents "
            "WHERE doc_id % 3 = 0 "
            "UNION ALL SELECT doc_id, 3, n_chars + 11 FROM documents "
            "WHERE doc_id % 5 = 0) "
            "SELECT doc_id, CAST(version AS BIGINT) AS version, "
            "CAST(n_chars AS BIGINT) AS n_chars FROM ("
            "SELECT doc_id, version, n_chars, row_number() OVER ("
            "PARTITION BY doc_id ORDER BY version DESC, n_chars DESC) "
            "AS rn FROM v) WHERE rn = 1 ORDER BY doc_id"),
        "skyline": (
            "WITH t AS (SELECT doc_id, n_chars, "
            "CAST(CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) "
            "AS n_tokens FROM documents) "
            "SELECT doc_id, n_chars, n_tokens FROM t b "
            "WHERE NOT EXISTS (SELECT 1 FROM t a "
            "WHERE a.n_chars >= b.n_chars AND a.n_tokens >= b.n_tokens "
            "AND (a.n_chars > b.n_chars OR a.n_tokens > b.n_tokens)) "
            "ORDER BY n_chars DESC, n_tokens DESC, doc_id"),
        "grouped_mode": (
            "WITH c AS (SELECT lang, n_chars AS value, count(*) AS n "
            "FROM documents GROUP BY 1, 2) "
            "SELECT lang, CAST(value AS BIGINT) AS value, "
            "CAST(n AS BIGINT) AS n FROM ("
            "SELECT lang, value, n, row_number() OVER ("
            "PARTITION BY lang ORDER BY n DESC, value) AS rn FROM c) "
            "WHERE rn = 1 ORDER BY lang"),
        "kmeans_assign": (
            "WITH c AS (SELECT vec_id AS cid, embedding AS cemb "
            "FROM embeddings WHERE vec_id < 8), "
            "d AS (SELECT e.vec_id, c.cid, "
            "list_distance(e.embedding, c.cemb) AS dist "
            "FROM embeddings e, c) "
            "SELECT vec_id, CAST(cid AS BIGINT) AS cluster FROM ("
            "SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id "
            "ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1 "
            "ORDER BY vec_id"),
        "local_hour": (
            f"WITH base AS ({geo}) "
            f"SELECT CAST(floor(CAST(({WARC_EPOCH_US} + doc_id * "
            f"{WARC_STEP_S * 1_000_000}) AS DOUBLE) / 3600000000.0 "
            "+ lng / 15.0) AS BIGINT) % 24 AS local_hour, lang, "
            "CAST(count(*) AS BIGINT) AS n_pages "
            "FROM base WHERE lat IS NOT NULL GROUP BY 1, 2"),
        "term_trends": (
            f"WITH d AS (SELECT ({WARC_EPOCH_US} + doc_id * "
            f"{WARC_STEP_S * 1_000_000}) // 14400000000 AS day, "
            "unnest(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents), "
            "c AS (SELECT token, day, count(*) AS n FROM d "
            "WHERE token != '' GROUP BY 1, 2), "
            "l AS (SELECT token, day, n, "
            "lag(n) OVER (PARTITION BY token ORDER BY day) AS p FROM c) "
            "SELECT token, day, CAST(n AS BIGINT) AS n, "
            "CAST(n AS DOUBLE) / p AS ratio FROM l WHERE p IS NOT NULL "
            "ORDER BY token, day"),
        "rolling_median": (
            "WITH e AS (SELECT event_type, "
            "epoch_us(ts) // 14400000000 AS bucket FROM events), "
            "c AS (SELECT event_type, bucket, "
            "CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1, 2) "
            "SELECT event_type, bucket, n, "
            "median(n) OVER (PARTITION BY event_type ORDER BY bucket "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS med FROM c"),
        "mad_outliers": (
            "WITH e AS (SELECT event_id, event_type, "
            "CAST(floor(value * 64) AS BIGINT) AS x FROM events), "
            "c1 AS (SELECT event_type, x AS v, "
            "count(*) OVER (PARTITION BY event_type ORDER BY x "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            "count(*) OVER (PARTITION BY event_type) AS n FROM e), "
            "m1 AS (SELECT event_type, CAST(min(v) AS BIGINT) AS med "
            "FROM c1 WHERE cum >= ceil(0.5 * n) GROUP BY 1), "
            "d AS (SELECT e.event_id, e.event_type, e.x, m1.med "
            "FROM e JOIN m1 USING (event_type)), "
            "c2 AS (SELECT event_type, abs(x - med) AS v, "
            "count(*) OVER (PARTITION BY event_type ORDER BY abs(x - med) "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            "count(*) OVER (PARTITION BY event_type) AS n FROM d), "
            "m2 AS (SELECT event_type, CAST(min(v) AS BIGINT) AS mad "
            "FROM c2 WHERE cum >= ceil(0.5 * n) GROUP BY 1) "
            "SELECT d.event_id, d.event_type, d.x, d.med, m2.mad, "
            "CAST(abs(d.x - d.med) * 1 > 3 * m2.mad AS BIGINT) AS is_out "
            "FROM d JOIN m2 USING (event_type)"),
        "vocab_drift": (
            f"WITH d AS (SELECT (({WARC_EPOCH_US} + doc_id * "
            f"{WARC_STEP_S * 1_000_000}) // 14400000000) % 2 AS period, "
            "unnest(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents), "
            "c AS (SELECT token, period, CAST(count(*) AS BIGINT) AS n "
            "FROM d WHERE token != '' GROUP BY 1, 2), "
            "t AS (SELECT CAST(coalesce(sum(CASE WHEN period = 0 THEN n "
            "END), 0) AS BIGINT) AS na, "
            "CAST(coalesce(sum(CASE WHEN period = 1 THEN n END), 0) "
            "AS BIGINT) AS nb FROM c), "
            "p AS (SELECT token, "
            "CAST(coalesce(sum(CASE WHEN period = 0 THEN n END), 0) "
            "AS BIGINT) AS a, "
            "CAST(coalesce(sum(CASE WHEN period = 1 THEN n END), 0) "
            "AS BIGINT) AS b FROM c GROUP BY 1) "
            "SELECT token, a, b, "
            "CAST(na + nb AS DOUBLE) * (a * (nb - b) - b * (na - a)) "
            "* (a * (nb - b) - b * (na - a)) "
            "/ (CAST(na AS DOUBLE) * nb * (a + b) * (na + nb - a - b)) "
            "AS chi2 "
            "FROM p CROSS JOIN t "
            "WHERE a + b >= 5 AND na + nb - a - b > 0"),
        "redirects": (
            "WITH RECURSIVE r AS ("
            "SELECT doc_id AS start, doc_id AS cur FROM documents "
            "UNION ALL SELECT start, cur - 3 FROM r "
            "WHERE cur % 3 = 0 AND (cur // 3) % 7 != 0 AND cur >= 3) "
            "SELECT start AS doc_id, CAST(cur AS BIGINT) AS terminal "
            "FROM r WHERE NOT (cur % 3 = 0 AND (cur // 3) % 7 != 0 "
            "AND cur >= 3) ORDER BY doc_id"),
        "cell_entropy": (
            f"WITH base AS ({geo}), "
            f"cl AS (SELECT {cell} AS cell, lang FROM base "
            f"WHERE lat IS NOT NULL), "
            "c AS (SELECT cell, lang, count(*) AS c FROM cl GROUP BY 1, 2), "
            "t AS (SELECT cell, sum(c) AS n FROM c GROUP BY 1) "
            "SELECT c.cell, CAST(t.n AS BIGINT) AS n, "
            "round(0.0 - sum((CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE)) * "
            "ln(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))), 6) AS entropy "
            "FROM c JOIN t ON c.cell = t.cell GROUP BY c.cell, t.n "
            "ORDER BY c.cell"),
        "idw": (
            f"WITH base AS ({geo}), "
            f"d AS (SELECT doc_id, site_id, "
            f"(lat - site_lat)*(lat - site_lat) + "
            f"(lng - site_lng)*(lng - site_lng) AS d2 "
            f"FROM base, {sites} WHERE lat IS NOT NULL), "
            "k AS (SELECT doc_id, site_id, d2, "
            "row_number() OVER (PARTITION BY doc_id ORDER BY d2, site_id) "
            "AS rn FROM d) "
            "SELECT doc_id, "
            "round(sum(CAST((site_id*37)%100 AS DOUBLE) / d2) "
            "/ sum(1.0 / d2), 6) AS idw "
            "FROM k WHERE rn <= 5 GROUP BY doc_id ORDER BY doc_id"),
        "grouped_corr": (
            "WITH t AS (SELECT lang, n_chars AS x, "
            "CAST(CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS y "
            "FROM documents), "
            "s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n, "
            "sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, "
            "sum(x*x) AS sxx, sum(y*y) AS syy FROM t GROUP BY lang) "
            "SELECT lang, n, "
            "round(CAST(n*sxy - sx*sy AS DOUBLE) / "
            "(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * "
            "sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6) AS corr "
            "FROM s WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0 "
            "ORDER BY lang"),
        "weighted_sample": (
            f"WITH base AS ({geo}) SELECT doc_id, weight FROM base "
            f"WHERE {weighted_sample_sql('doc_id', 'weight', rate=0.6)}"),
        "grouped_ols": (
            "WITH t AS (SELECT lang, n_chars AS x, "
            "CAST(CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS y "
            "FROM documents), "
            "s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n, "
            "sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, "
            "sum(x*x) AS sxx FROM t GROUP BY lang), "
            "f AS (SELECT lang, n, "
            "CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) "
            "AS slope, CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd "
            "FROM s WHERE n*sxx - sx*sx > 0) "
            "SELECT lang, n, round(slope, 6) AS slope, "
            "round((syd - slope * sxd) / n, 6) AS intercept FROM f"),
        "inverted_index": (
            "WITH w AS (SELECT DISTINCT doc_id, "
            "unnest(regexp_split_to_array(text, '\\s+')) AS token "
            "FROM documents), "
            "w2 AS (SELECT token, doc_id, "
            "row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn, "
            "count(*) OVER (PARTITION BY token) AS df "
            "FROM w WHERE token != '') "
            "SELECT token, CAST(max(df) AS BIGINT) AS df, "
            "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
            "AS postings FROM w2 WHERE rn <= 10 GROUP BY token "
            "ORDER BY token"),
        "dataset_diff": (
            "WITH o AS (SELECT doc_id, n_chars FROM documents), "
            "nw AS (SELECT doc_id, CASE WHEN doc_id % 31 = 4 "
            "THEN n_chars + 1 ELSE n_chars END AS n_chars "
            "FROM documents WHERE doc_id % 97 != 3 "
            "UNION ALL SELECT doc_id + 10000000, n_chars FROM documents "
            "WHERE doc_id % 53 = 5) "
            "SELECT coalesce(o.doc_id, nw.doc_id) AS doc_id, "
            "CASE WHEN o.doc_id IS NULL THEN 'added' "
            "WHEN nw.doc_id IS NULL THEN 'removed' "
            "ELSE 'changed' END AS change "
            "FROM o FULL OUTER JOIN nw ON o.doc_id = nw.doc_id "
            "WHERE o.doc_id IS NULL OR nw.doc_id IS NULL "
            "OR o.n_chars != nw.n_chars ORDER BY doc_id"),
        "fuzzy_join": (
            "WITH ln AS (SELECT DISTINCT p_name AS name FROM part), "
            "rn0 AS (SELECT p_partkey AS k, p_name AS name, "
            "(p_partkey % length(p_name)) + 1 AS pos FROM part), "
            "rn1 AS (SELECT DISTINCT CASE "
            "WHEN k % 3 = 0 THEN substr(name, 1, pos - 1) "
            "|| substr(name, pos + 1) "
            "WHEN k % 3 = 1 THEN substr(name, 1, pos - 1) || 'q' "
            "|| substr(name, pos + 1) "
            "ELSE name END AS name FROM rn0) "
            "SELECT a.name AS name_a, b.name AS name_b, "
            "CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist "
            "FROM ln a, rn1 b WHERE levenshtein(a.name, b.name) <= 1"),
        "link_components": (
            f"WITH RECURSIVE l AS ({_LINK_EDGES_SQL}), "
            "ed AS (SELECT DISTINCT src_domain AS a, dst_domain AS b "
            "FROM l), "
            "sym AS (SELECT a, b FROM ed UNION SELECT b, a FROM ed), "
            "reach(id, root) AS (SELECT DISTINCT a, a FROM sym "
            "UNION SELECT s.b, r.root FROM reach r JOIN sym s "
            "ON s.a = r.id) "
            "SELECT id AS domain, min(root) AS component "
            "FROM reach GROUP BY id"),
        "attack_tolerance": (
            f"WITH RECURSIVE l AS ({_LINK_EDGES_SQL}), "
            "ed0 AS (SELECT DISTINCT src_domain AS a, dst_domain AS b "
            "FROM l), "
            "degs AS (SELECT a AS s, count(*) AS od FROM ed0 GROUP BY a), "
            "hubs AS (SELECT s FROM degs "
            "QUALIFY row_number() OVER (ORDER BY od DESC, s) <= 2), "
            "ed AS (SELECT a, b FROM ed0 "
            "WHERE a NOT IN (SELECT s FROM hubs) "
            "AND b NOT IN (SELECT s FROM hubs)), "
            "sym AS (SELECT a, b FROM ed UNION SELECT b, a FROM ed), "
            "reach(id, root) AS (SELECT DISTINCT a, a FROM sym "
            "UNION SELECT s.b, r.root FROM reach r JOIN sym s "
            "ON s.a = r.id) "
            "SELECT id AS domain, min(root) AS component "
            "FROM reach GROUP BY id"),
        "link_graph": (
            f"WITH l AS ({_LINK_EDGES_SQL}) "
            "SELECT src_domain, dst_domain, CAST(count(*) AS BIGINT) AS n "
            "FROM l GROUP BY 1, 2 ORDER BY 1, 2"),
        "cube": (
            "WITH e AS (SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow, "
            "(epoch_us(ts) // 3600000000) % 24 AS hour, "
            "CAST(floor(value * 64) AS BIGINT) AS v FROM events) "
            "SELECT CASE WHEN GROUPING(dow) = 1 THEN -1 ELSE dow END AS dow, "
            "CASE WHEN GROUPING(hour) = 1 THEN -1 ELSE hour END AS hour, "
            "CAST(sum(v) AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS n, "
            "CAST(GROUPING(dow, hour) AS BIGINT) AS _gset "
            "FROM e GROUP BY CUBE(dow, hour)"),
        "collect_set": (
            "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "event_type FROM events) "
            "SELECT day, "
            "string_agg(DISTINCT event_type, ',' ORDER BY event_type) "
            "AS values, "
            "CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct "
            "FROM e GROUP BY day"),
        "pivot": (
            "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "event_type FROM events) "
            "SELECT day, "
            "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS click, "
            "CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS error, "
            "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS purchase, "
            "CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS signup, "
            "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS view "
            "FROM e GROUP BY day"),
        "rollup": (
            "WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day, "
            "(epoch_us(ts) // 3600000000) % 24 AS hour, "
            "CAST(floor(value * 64) AS BIGINT) AS v FROM events) "
            "SELECT CASE WHEN GROUPING(day) = 1 THEN -1 ELSE day END AS day, "
            "CASE WHEN GROUPING(hour) = 1 THEN -1 ELSE hour END AS hour, "
            "CAST(sum(v) AS BIGINT) AS v, "
            "CAST(count(*) AS BIGINT) AS n, "
            "CAST(2 - GROUPING(day) - GROUPING(hour) AS BIGINT) AS _lvl "
            "FROM e GROUP BY ROLLUP(day, hour)"),
        "triangles": (
            f"WITH l AS ({_LINK_EDGES_SQL}), "
            "alle AS (SELECT src_domain AS s, dst_domain AS d FROM l "
            "UNION ALL SELECT * FROM (VALUES "
            + ", ".join(f"('{a}', '{b}')" for a, b in _PLANTED_TRI_EDGES)
            + ") AS p(s, d)), "
            "und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b "
            "FROM alle WHERE s != d), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "FROM und e1 JOIN und e2 ON e2.a = e1.b "
            "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b), "
            "v AS (SELECT x AS domain FROM tri UNION ALL "
            "SELECT y FROM tri UNION ALL SELECT z FROM tri) "
            "SELECT domain, CAST(count(*) AS BIGINT) AS n_tri "
            "FROM v GROUP BY domain"),
        "clustering_coeff": (
            f"WITH l AS ({_LINK_EDGES_SQL}), "
            "alle AS (SELECT src_domain AS s, dst_domain AS d FROM l "
            "UNION ALL SELECT * FROM (VALUES "
            + ", ".join(f"('{a}', '{b}')" for a, b in _PLANTED_TRI_EDGES)
            + ") AS p(s, d)), "
            "und AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b "
            "FROM alle WHERE s != d), "
            "deg AS (SELECT domain, CAST(count(*) AS BIGINT) AS deg FROM "
            "(SELECT a AS domain FROM und UNION ALL SELECT b FROM und) "
            "GROUP BY domain), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "FROM und e1 JOIN und e2 ON e2.a = e1.b "
            "JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b), "
            "v AS (SELECT x AS domain FROM tri UNION ALL "
            "SELECT y FROM tri UNION ALL SELECT z FROM tri), "
            "nt AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_tri "
            "FROM v GROUP BY domain) "
            "SELECT deg.domain AS domain, "
            "CAST(coalesce(nt.n_tri, 0) AS BIGINT) AS n_tri, "
            "CAST((deg.deg * (deg.deg - 1)) // 2 AS BIGINT) AS n_wedges, "
            "CASE WHEN deg.deg >= 2 THEN "
            "CAST(coalesce(nt.n_tri, 0) AS DOUBLE) / "
            "CAST((deg.deg * (deg.deg - 1)) // 2 AS DOUBLE) "
            "ELSE 0.0 END AS coeff "
            "FROM deg LEFT JOIN nt ON nt.domain = deg.domain"),
        "domain_degrees": (
            f"WITH l AS ({_LINK_EDGES_SQL}), "
            "e AS (SELECT src_domain, dst_domain, count(*) AS n FROM l "
            "GROUP BY 1, 2), "
            "o AS (SELECT src_domain AS domain, count(*) AS out_degree, "
            "sum(n) AS out_links FROM e GROUP BY 1), "
            "i AS (SELECT dst_domain AS domain, count(*) AS in_degree, "
            "sum(n) AS in_links FROM e GROUP BY 1) "
            "SELECT coalesce(o.domain, i.domain) AS domain, "
            "CAST(coalesce(out_degree, 0) AS BIGINT) AS out_degree, "
            "CAST(coalesce(out_links, 0) AS BIGINT) AS out_links, "
            "CAST(coalesce(in_degree, 0) AS BIGINT) AS in_degree, "
            "CAST(coalesce(in_links, 0) AS BIGINT) AS in_links "
            "FROM o FULL OUTER JOIN i ON o.domain = i.domain "
            "ORDER BY domain"),
        "pagerank": _PAGERANK_SQL,
        "reciprocity": (
            f"WITH l AS ({_LINK_EDGES_SQL}), "
            "e AS (SELECT DISTINCT src_domain AS s, dst_domain AS d "
            "FROM l WHERE src_domain != dst_domain), "
            "m AS (SELECT e1.s, e1.d, CASE WHEN EXISTS(SELECT 1 FROM e e2 "
            "WHERE e2.s = e1.d AND e2.d = e1.s) THEN 1 ELSE 0 END AS mut "
            "FROM e e1) "
            "SELECT s AS domain, CAST(count(*) AS BIGINT) AS n_out, "
            "CAST(sum(mut) AS BIGINT) AS n_mutual, "
            "CAST(sum(mut) AS DOUBLE) / count(*) AS ratio "
            "FROM m GROUP BY s"),
        "bib_coupling": (
            f"WITH l AS ({_LINK_EDGES_SQL}), "
            "e AS (SELECT DISTINCT src_domain, dst_domain FROM l), "
            "p AS (SELECT e1.src_domain AS src_a, e2.src_domain AS src_b, "
            "CAST(count(*) AS BIGINT) AS shared FROM e e1 "
            "JOIN e e2 ON e1.dst_domain = e2.dst_domain "
            "AND e1.src_domain < e2.src_domain GROUP BY 1, 2) "
            "SELECT src_a, src_b, shared FROM p WHERE shared >= 2"),
        "hits": (
            f"WITH l AS ({_LINK_EDGES_SQL}), "
            "e AS (SELECT src_domain, dst_domain, "
            "CAST(count(*) AS DOUBLE) AS n FROM l GROUP BY 1, 2), "
            "d AS (SELECT src_domain AS domain FROM e "
            "UNION SELECT dst_domain FROM e), "
            "a1 AS (SELECT dst_domain AS domain, sum(1.0 * n) AS w "
            "FROM e GROUP BY 1), "
            "a1n AS (SELECT domain, w / (SELECT sum(w) FROM a1) AS v "
            "FROM a1), "
            "h1 AS (SELECT e.src_domain AS domain, sum(a1n.v * e.n) AS w "
            "FROM e JOIN a1n ON a1n.domain = e.dst_domain GROUP BY 1), "
            "h1n AS (SELECT domain, w / (SELECT sum(w) FROM h1) AS v "
            "FROM h1), "
            "a2 AS (SELECT e.dst_domain AS domain, sum(h1n.v * e.n) AS w "
            "FROM e JOIN h1n ON h1n.domain = e.src_domain GROUP BY 1), "
            "a2n AS (SELECT domain, w / (SELECT sum(w) FROM a2) AS v "
            "FROM a2), "
            "h2 AS (SELECT e.src_domain AS domain, sum(a2n.v * e.n) AS w "
            "FROM e JOIN a2n ON a2n.domain = e.dst_domain GROUP BY 1), "
            "h2n AS (SELECT domain, w / (SELECT sum(w) FROM h2) AS v "
            "FROM h2) "
            "SELECT d.domain, round(coalesce(h2n.v, 0), 6) AS hub, "
            "round(coalesce(a2n.v, 0), 6) AS authority "
            "FROM d LEFT JOIN h2n ON h2n.domain = d.domain "
            "LEFT JOIN a2n ON a2n.domain = d.domain"),
        "retention": (
            "WITH a AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events), "
            "act AS (SELECT day, count(*) AS active FROM a GROUP BY day), "
            "ret AS (SELECT a.day AS day, count(*) AS retained "
            "FROM a JOIN a AS b ON b.user_id = a.user_id "
            "AND b.day = a.day + 1 GROUP BY a.day) "
            "SELECT act.day AS day, CAST(act.active AS BIGINT) AS active, "
            "CAST(coalesce(ret.retained, 0) AS BIGINT) AS retained "
            "FROM act LEFT JOIN ret USING (day) ORDER BY day"),
        "cohort_retention": (
            "WITH a AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS day FROM events), "
            "f AS (SELECT user_id, min(day) AS cohort FROM a "
            "GROUP BY user_id) "
            "SELECT f.cohort AS cohort, a.day - f.cohort AS day_offset, "
            "CAST(count(*) AS BIGINT) AS n_users "
            "FROM a JOIN f USING (user_id) GROUP BY 1, 2 "
            "ORDER BY cohort, day_offset"),
        "od_matrix": _OD_SQL,
        "od_matrix_bucketed": _OD_SQL,
        "lookup_join": (
            "SELECT o_orderkey, o_custkey AS c_custkey, "
            "o_totalprice, c_mktsegment "
            "FROM orders JOIN customer ON o_custkey = c_custkey"),
        "lookup_semi": (
            "SELECT o_orderkey, o_custkey AS c_custkey FROM orders "
            "WHERE o_custkey IN "
            "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)"),
        "lookup_anti": (
            "SELECT o_orderkey, o_custkey AS c_custkey FROM orders "
            "WHERE o_custkey NOT IN "
            "(SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)"),
        "hash_join": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n, "
            "round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"),
        "dedup_exact": "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text",
        "distinct_lang": (
            "SELECT lang, CAST(min(doc_id) AS BIGINT) AS first_doc, "
            "CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang"),
        "token_count": (
            "SELECT doc_id, CAST(CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS n_tokens "
            "FROM documents"),
        "quality": (
            "SELECT doc_id, "
            "floor((length(replace(text, ' ', '')) "
            "/ greatest(CASE WHEN trim(text) = '' THEN 0 ELSE "
            "len(string_split_regex(trim(text), '\\s+')) END, 1)) * 1000000 + 0.5) "
            "/ 1000000 AS mean_word_len, "
            "floor((length(regexp_replace(text, '[^A-Za-z]', '', 'g')) "
            "/ greatest(length(text), 1)) * 1000000 + 0.5) / 1000000 AS alpha_ratio "
            "FROM documents"),
        "ann_cosine": (
            "WITH q AS (SELECT vec_id AS query_id, "
            "CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id < 10), "
            "p AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 4) AS r4 "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id) "
            "SELECT query_id, neighbor_id, rank FROM ("
            "SELECT query_id, neighbor_id, "
            "row_number() OVER (PARTITION BY query_id ORDER BY r4 DESC, neighbor_id) AS rank "
            "FROM p) WHERE rank <= 5"),
        "ann_ivf_pruned": (
            "WITH q AS (SELECT vec_id AS query_id, "
            "CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id < 10), "
            "p AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "round(list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])), 4) AS r4 "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id != q.query_id) "
            "SELECT query_id, neighbor_id, rank FROM ("
            "SELECT query_id, neighbor_id, "
            "row_number() OVER (PARTITION BY query_id ORDER BY r4 DESC, neighbor_id) AS rank "
            "FROM p) WHERE rank <= 5"),
        "text_clean": (
            "WITH m AS (SELECT doc_id, text || ' ' || chr(9) || chr(9) || "
            "'e' || chr(769) || 'clair' || "
            "chr(CAST(1 + doc_id % 8 AS INTEGER)) AS text "
            "FROM documents), "
            "c AS (SELECT doc_id, text, trim(regexp_replace(regexp_replace("
            "nfc_normalize(text), "
            r"'[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'), "
            r"'[ \t\r\n\f]+', ' ', 'g'), ' ') AS text_clean FROM m) "
            "SELECT doc_id, text_clean, "
            "CAST(length(text) AS BIGINT) AS orig_len, "
            "CAST(length(text_clean) AS BIGINT) AS clean_len FROM c"),
        "time_range": (
            "SELECT event_id, user_id, ts, value FROM events "
            "WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' "
            "AND ts < TIMESTAMP '2024-01-20 00:00:00'"),
        "bbox_query": (
            f"WITH base AS ({_geo_sql_base()}) "
            "SELECT doc_id, lat, lng FROM base "
            "WHERE lat IS NOT NULL "
            "AND lat >= -10.0 AND lat <= 60.0 "
            "AND lng >= -120.0 AND lng <= 40.0"),
        "rag_retrieve": (
            "WITH toks AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(coalesce(text, ''), '\\s+'), "
            "x -> x != '') AS tk FROM documents), "
            "base AS (SELECT doc_id, tk, len(tk) AS n FROM toks), "
            "ch AS (SELECT doc_id, tk, n, unnest(range(0, n, 32)) AS s "
            "FROM base WHERE n > 0), "
            "ctok AS (SELECT doc_id, CAST(s // 32 AS BIGINT) AS chunk_id, "
            "unnest(tk[s+1:s+32]) AS w FROM ch), "
            "cb AS (SELECT doc_id, chunk_id, "
            "('0x' || substring(sha256(w), 1, 16))::UBIGINT % 64 AS b, "
            "count(*) AS nc FROM ctok GROUP BY 1, 2, 3), "
            "q AS (SELECT doc_id AS query_id, tk FROM base "
            "WHERE doc_id % 100 = 0), "
            "qtok AS (SELECT query_id, unnest(tk[3:8]) AS w FROM q), "
            "qb AS (SELECT query_id, "
            "('0x' || substring(sha256(w), 1, 16))::UBIGINT % 64 AS b, "
            "count(*) AS nq FROM qtok GROUP BY 1, 2), "
            "dots AS (SELECT qb.query_id, cb.doc_id, cb.chunk_id, "
            "CAST(sum(qb.nq * cb.nc) AS BIGINT) AS dot "
            "FROM qb JOIN cb ON qb.b = cb.b GROUP BY 1, 2, 3) "
            "SELECT query_id, doc_id, chunk_id, dot, CAST(rank AS BIGINT) "
            "AS rank FROM (SELECT *, row_number() OVER ("
            "PARTITION BY query_id ORDER BY dot DESC, doc_id, chunk_id) "
            "AS rank FROM dots) WHERE rank <= 3"),
        "chunk_docs": (
            "WITH toks AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(coalesce(text, ''), '\\s+'), "
            "x -> x != '') AS tk FROM documents), "
            "base AS (SELECT doc_id, tk, len(tk) AS n FROM toks), "
            "ch AS (SELECT doc_id, tk, n, unnest(range(0, n, 48)) AS s "
            "FROM base WHERE n > 0) "
            "SELECT doc_id, CAST(s // 48 AS BIGINT) AS chunk_id, "
            "CAST(s AS BIGINT) AS chunk_start, "
            "CAST(least(64, n - s) AS BIGINT) AS n_tokens, "
            "array_to_string(tk[s+1:s+64], ' ') AS chunk_text FROM ch"),
        "winnow_pairs": (
            "WITH corpus AS (SELECT doc_id, text FROM documents "
            "UNION ALL SELECT doc_id + 10000000, "
            "'shifted prefix ' || CAST(doc_id AS VARCHAR) || ' ' || text "
            "FROM documents WHERE doc_id % 10 = 0), "
            "toks AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), "
            "t -> t != '') AS t0 FROM corpus), "
            "padded AS (SELECT doc_id, list_concat(t0, list_transform("
            "range(greatest(0, 3 - len(t0))), x -> chr(0))) AS t "
            "FROM toks), "
            "th AS (SELECT doc_id, list_transform(t, s -> "
            "('0x' || substring(sha256(s), 1, 16))::UBIGINT) AS h "
            "FROM padded), "
            "g AS (SELECT doc_id, i - 1 AS pos, CAST(("
            f"(h[i]::HUGEINT * {_FNV_P} + h[i+1]) % {_POW64} "
            f"* {_FNV_P} + h[i+2]) % {_POW64} AS UBIGINT) AS gm "
            "FROM th, unnest(range(1, len(h) - 1)) AS u(i)), "
            "win AS (SELECT doc_id, pos AS wend, "
            "min(gm) OVER (PARTITION BY doc_id ORDER BY pos "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mn, "
            "count(*) OVER (PARTITION BY doc_id) AS cnt FROM g), "
            "sel AS (SELECT DISTINCT w.doc_id, "
            "(SELECT max(g2.pos) FROM g g2 WHERE g2.doc_id = w.doc_id "
            "AND g2.pos BETWEEN w.wend - 3 AND w.wend AND g2.gm = w.mn) "
            "AS pos FROM win w WHERE w.wend >= least(4, w.cnt) - 1), "
            "fp AS (SELECT DISTINCT s.doc_id, g.gm FROM sel s JOIN g "
            "ON g.doc_id = s.doc_id AND g.pos = s.pos) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(count(*) AS BIGINT) AS n_shared "
            "FROM fp a JOIN fp b ON a.gm = b.gm AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2 HAVING count(*) >= 2"),
        "winnow_fp": (
            "WITH toks AS (SELECT doc_id, list_filter("
            "regexp_split_to_array(lower(coalesce(text, '')), '\\s+'), "
            "t -> t != '') AS t0 FROM documents), "
            "padded AS (SELECT doc_id, list_concat(t0, list_transform("
            "range(greatest(0, 3 - len(t0))), x -> chr(0))) AS t "
            "FROM toks), "
            "th AS (SELECT doc_id, list_transform(t, s -> "
            "('0x' || substring(sha256(s), 1, 16))::UBIGINT) AS h "
            "FROM padded), "
            "g AS (SELECT doc_id, i - 1 AS pos, CAST(("
            f"(h[i]::HUGEINT * {_FNV_P} + h[i+1]) % {_POW64} "
            f"* {_FNV_P} + h[i+2]) % {_POW64} AS UBIGINT) AS gm "
            "FROM th, unnest(range(1, len(h) - 1)) AS u(i)), "
            "win AS (SELECT doc_id, pos AS wend, "
            "min(gm) OVER (PARTITION BY doc_id ORDER BY pos "
            "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mn, "
            "count(*) OVER (PARTITION BY doc_id) AS cnt FROM g), "
            "sel AS (SELECT DISTINCT w.doc_id, "
            "(SELECT max(g2.pos) FROM g g2 WHERE g2.doc_id = w.doc_id "
            "AND g2.pos BETWEEN w.wend - 3 AND w.wend AND g2.gm = w.mn) "
            "AS pos FROM win w WHERE w.wend >= least(4, w.cnt) - 1) "
            "SELECT s.doc_id, CAST(s.pos AS BIGINT) AS pos, "
            "CAST(g.gm % CAST('9223372036854775808' AS UBIGINT) AS BIGINT) "
            "AS gram FROM sel s JOIN g "
            "ON g.doc_id = s.doc_id AND g.pos = s.pos"),
        "strip_boilerplate": (
            "WITH m AS (SELECT doc_id, "
            "'site' || CAST(doc_id % 20 AS VARCHAR) AS domain, "
            "'NAV site' || CAST(doc_id % 20 AS VARCHAR) AS l0, "
            "'DOC ' || CAST(doc_id AS VARCHAR) || ' ' || substr(text, 1, 40) "
            "AS l1, "
            "'COPY site' || CAST(doc_id % 20 AS VARCHAR) AS l2 "
            "FROM documents), "
            "lines AS (SELECT doc_id, domain, 0 AS idx, l0 AS line FROM m "
            "UNION ALL SELECT doc_id, domain, 1, l1 FROM m "
            "UNION ALL SELECT doc_id, domain, 2, l2 FROM m), "
            "cnt AS (SELECT domain, line, count(DISTINCT doc_id) AS n "
            "FROM lines GROUP BY 1, 2), "
            "dd AS (SELECT domain, count(DISTINCT doc_id) AS nd "
            "FROM m GROUP BY 1), "
            "freq AS (SELECT c.domain, c.line FROM cnt c JOIN dd "
            "USING (domain) "
            "WHERE c.n >= greatest(3, CAST(ceil(0.5 * dd.nd) AS BIGINT))), "
            "kept AS (SELECT l.doc_id, l.idx, l.line FROM lines l "
            "LEFT JOIN freq f ON f.domain = l.domain AND f.line = l.line "
            "WHERE f.line IS NULL), "
            "k AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) "
            "AS text_clean, count(*) AS nk FROM kept GROUP BY doc_id) "
            "SELECT m.doc_id, coalesce(k.text_clean, '') AS text_clean, "
            "CAST(3 AS BIGINT) AS n_lines, "
            "CAST(3 - coalesce(k.nk, 0) AS BIGINT) AS n_removed "
            "FROM m LEFT JOIN k USING (doc_id)"),
        # replays the deterministic 160-sample PCM formula; the engine side
        # goes through the REAL RIFF/WAVE parser + decimation
        "audio_features": (
            "WITH s AS (SELECT d.doc_id, k.k, "
            "(d.doc_id * 31 + (2 * k.k) * 17) % 4096 - 2048 AS v "
            "FROM documents d CROSS JOIN "
            "(SELECT unnest(range(80)) AS k) k) "
            "SELECT doc_id AS media_id, CAST(k // 10 AS BIGINT) AS window, "
            "CAST(sum(v * v) AS BIGINT) AS energy "
            "FROM s GROUP BY doc_id, k // 10"),
        # replays the per-frame pixel formula at the evenly-sampled frame
        # indices; the engine splits + decodes the P6 container for real
        "video_frames": (
            "WITH t AS (SELECT doc_id, 2 + doc_id % 5 AS T FROM documents), "
            "s AS (SELECT doc_id, T, k.k, (k.k * T) // 3 AS fidx "
            "FROM t CROSS JOIN (SELECT unnest(range(3)) AS k) k), "
            "px AS (SELECT doc_id, k, fidx, "
            "(doc_id * 7 + fidx * 13 + j.j * 29) % 256 AS v "
            "FROM s CROSS JOIN (SELECT unnest(range(12)) AS j) j) "
            "SELECT doc_id AS media_id, CAST(k AS BIGINT) AS sample_k, "
            "CAST(fidx AS BIGINT) AS frame_idx, "
            "CAST(sum(v) AS BIGINT) AS frame_sum "
            "FROM px GROUP BY doc_id, k, fidx"),
        # replays the deterministic 4x4 PPM pixel formula; the engine side
        # goes through the REAL netpbm decoder (stages/multimodal.py)
        "image_features": (
            "WITH px AS (SELECT d.doc_id, j.j, "
            "(d.doc_id * 2654435761 + j.j * 40503) % 256 AS v "
            "FROM documents d CROSS JOIN (SELECT unnest(range(48)) AS j) j) "
            "SELECT doc_id AS media_id, CAST(4 AS BIGINT) AS height, "
            "CAST(4 AS BIGINT) AS width, "
            "CAST(sum(CASE WHEN j % 3 = 0 THEN v END) AS BIGINT) AS sum_r, "
            "CAST(sum(CASE WHEN j % 3 = 1 THEN v END) AS BIGINT) AS sum_g, "
            "CAST(sum(CASE WHEN j % 3 = 2 THEN v END) AS BIGINT) AS sum_b "
            "FROM px GROUP BY doc_id"),
    }
    # bucketed variants are bit-identical to their flat operators and
    # share the same oracle SQL (the od/window/session pattern)
    oracles["geofence_bucketed"] = oracles["geofence"]
    return oracles


def build_queries() -> Dict[str, Callable]:
    """Query registry, ordered for the driver's 50-row CORRECTNESS window.

    The driver checks the FIRST 50 entries each round. Ordering policy
    (round 5): slots 1-50 = oracle-backed queries never yet confirmed by
    a driver round in r01-r04 (the rotating window: text_clean ...
    colocation); then the remaining 54 unconfirmed oracle-backed queries
    (a future window); then the 107 queries already driver-confirmed in
    rounds 1-4; the 7 rows-only (no-oracle) queries go last so they
    never burn a window slot on an `err: no_oracle` row.
    """
    return {
        "text_clean": q_text_clean,
        "strip_boilerplate": q_strip_boilerplate,
        "winnow_fp": q_winnow_fp,
        "winnow_pairs": q_winnow_pairs,
        "chunk_docs": q_chunk_docs,
        "rag_retrieve": q_rag_retrieve,
        "bbox_query": q_bbox_query,
        "time_range": q_time_range,
        "audio_features": q_audio_features,
        "video_frames": q_video_frames,
        "clustering_coeff": q_clustering_coeff,
        "domain_degrees": q_domain_degrees,
        "pagerank": q_pagerank,
        "retention": q_retention,
        "cohort_retention": q_cohort_retention,
        "od_matrix": q_od_matrix,
        "od_matrix_bucketed": q_od_matrix_bucketed,
        "compact_cells": q_compact_cells,
        "spacetime": q_spacetime,
        "outlier_cells": q_outlier_cells,
        "domain_stats": q_domain_stats,
        "domain_footprint": q_domain_footprint,
        "blocklist": q_blocklist,
        "cluster_cells": q_cluster_cells,
        "site_visits": q_site_visits,
        "uncompact_roundtrip": q_uncompact_roundtrip,
        "tile_pyramid": q_tile_pyramid,
        "lang_quantiles": q_lang_quantiles,
        "weighted_median": q_weighted_median,
        "crawl_order": q_crawl_order,
        "theil_sen": q_theil_sen,
        "percentile_rank": q_percentile_rank,
        "distinct_users": q_distinct_users,
        "hot_cells": q_hot_cells,
        "doc_sample": q_doc_sample,
        "stratified_sample": q_stratified_sample,
        "top_docs": q_top_docs,
        "familiarity": q_familiarity,
        "hop_window": q_hop_window,
        "raster_zonal": q_raster_zonal,
        "focal_mean": q_focal_mean,
        "spatial_autocorr": q_spatial_autocorr,
        "geofence": q_geofence,
        "hll_users": q_hll_users,
        "cms_users": q_cms_users,
        "geofence_dwell": q_geofence_dwell,
        "geofence_bucketed": q_geofence_bucketed,
        "zscore_outliers": q_zscore_outliers,
        "interval_join": q_interval_join,
        "colocation": q_colocation,
        "zorder": q_zorder,
        "hilbert": q_hilbert,
        "local_autocorr": q_local_autocorr,
        "attribution": q_attribution,
        "stay_points": q_stay_points,
        "od_gravity": q_od_gravity,
        "knox": q_knox,
        "radius_anti": q_radius_anti,
        "knn_graph": q_knn_graph,
        "link_components": q_link_components,
        "fuzzy_join": q_fuzzy_join,
        "gi_star": q_gi_star,
        "dbscan": q_dbscan,
        "bloom_decontam": q_bloom_decontam,
        "local_hour": q_local_hour,
        "emerging_hotspots": q_emerging_hotspots,
        "lang_frontier": q_lang_frontier,
        "cell_terms": q_cell_terms,
        "quadtree": q_quadtree,
        "k_anonymity": q_k_anonymity,
        "k_anon_generalize": q_k_anon_generalize,
        "geo_composite": q_geo_composite,
        "radius_of_gyration": q_radius_of_gyration,
        "grid_bfs": q_grid_bfs,
        "cell_mixture": q_cell_mixture,
        "user_entropy": q_user_entropy,
        "cell_top_quality": q_cell_top_quality,
        "time_autocorr": q_time_autocorr,
        "convex_hulls": q_convex_hulls,
        "range_join": q_range_join,
        "range_join_big": q_range_join_big,
        "ann_ivf_pruned": q_ann_ivf_pruned,
        "lookup_semi": q_lookup_semi,
        "lookup_anti": q_lookup_anti,
        "areal_interp": q_areal_interp,
        "hits": q_hits,
        "grid_dijkstra": q_grid_dijkstra,
        "bot_scores": q_bot_scores,
        "vocab_drift": q_vocab_drift,
        "mad_outliers": q_mad_outliers,
        "bib_coupling": q_bib_coupling,
        "rolling_median": q_rolling_median,
        "teleports": q_teleports,
        "reciprocity": q_reciprocity,
        "burstiness": q_burstiness,
        "gini": q_gini,
        "ks_test": q_ks_test,
        "attack_tolerance": q_attack_tolerance,
        "join_counts": q_join_counts,
        "ripley": q_ripley,
        "group_split": q_group_split,
        "benford": q_benford,
        "mannwhitney": q_mannwhitney,
        "image_features": q_image_features,
        "near_dedup": q_near_dedup,
        "llm_curation": q_llm_curation,
        "crawl_pipeline": q_crawl_pipeline,
        "similarity_join": q_similarity_join,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "jagged_reduce": q_jagged_reduce,
        "binned_padded": q_binned_padded,
        "quantiles": q_quantiles,
        "pii_redact": q_pii_redact,
        "pii_stats": q_pii_stats,
        "decontam": q_decontam,
        "decontam_clean": q_decontam_clean,
        "bm25": q_bm25,
        "classifier": q_classifier,
        "pack_sequences": q_pack_sequences,
        "pack_summary": q_pack_summary,
        "mixture_sample": q_mixture_sample,
        "train_order": q_train_order,
        "url_dedup": q_url_dedup,
        "url_canon_groups": q_url_canon_groups,
        "robots_rules": q_robots_rules,
        "crawl_budget": q_crawl_budget,
        "near_dedup_quality": q_near_dedup_quality,
        "incremental_dedup": q_incremental_dedup,
        "chunk_dup": q_chunk_dup,
        "dedup_spans": q_dedup_spans,
        "jagged_explode": q_jagged_explode,
        "reduce_cut": q_reduce_cut,
        "polygon_cover": q_polygon_cover,
        "containment_join": q_containment_join,
        "fingerprint": q_fingerprint,
        "repetition": q_repetition,
        "lang_id": q_lang_id,
        "lang_confusion": q_lang_confusion,
        "vocab": q_vocab,
        "top_terms": q_top_terms,
        "pmi": q_pmi,
        "doc_frequency": q_doc_frequency,
        "bigrams": q_bigrams,
        "quantile_bucket": q_quantile_bucket,
        "target_encode": q_target_encode,
        "snap_segments": q_snap_segments,
        "cusum": q_cusum,
        "rollup": q_rollup,
        "cube": q_cube,
        "pivot": q_pivot,
        "collect_set": q_collect_set,
        "profile": q_profile,
        "curation_pipeline": q_curation_pipeline,
        "hash_invariant": q_hash_invariant,
        "cell_encode": q_cell_encode,
        "cell_parent": q_cell_parent,
        "pip_join": q_pip_join,
        "pip_semi": q_pip_semi,
        "pip_anti": q_pip_anti,
        "knn_euclid": q_knn_euclid,
        "knn_haversine": q_knn_haversine,
        "hotspots": q_hotspots,
        "radius_join": q_radius_join,
        "zonal": q_zonal,
        "topk_cells": q_topk_cells,
        "cutflow": q_cutflow,
        "multi_cutflow": q_multi_cutflow,
        "multi_binned": q_multi_binned,
        "select_phasespace": q_select_phasespace,
        "define_events": q_define_events,
        "systematic_weights": q_systematic_weights,
        "binned_lineitem": q_binned_lineitem,
        "skim": q_skim,
        "window_agg": q_window_agg,
        "asof_join": q_asof_join,
        "asof_join_bucketed": q_asof_join_bucketed,
        "funnel": q_funnel,
        "transitions": q_transitions,
        "session_windows": q_session_windows,
        "session_windows_bucketed": q_session_windows_bucketed,
        "window_funcs": q_window_funcs,
        "window_funcs_bucketed": q_window_funcs_bucketed,
        "trajectory": q_trajectory,
        "trajectory_bucketed": q_trajectory_bucketed,
        "zipf": q_zipf,
        "ewma": q_ewma,
        "audience_overlap": q_audience_overlap,
        "winsorize": q_winsorize,
        "latest_by_key": q_latest_by_key,
        "skyline": q_skyline,
        "grouped_mode": q_grouped_mode,
        "kmeans_assign": q_kmeans_assign,
        "term_trends": q_term_trends,
        "redirects": q_redirects,
        "cell_entropy": q_cell_entropy,
        "idw": q_idw,
        "grouped_corr": q_grouped_corr,
        "grouped_ols": q_grouped_ols,
        "weighted_sample": q_weighted_sample,
        "inverted_index": q_inverted_index,
        "dataset_diff": q_dataset_diff,
        "link_graph": q_link_graph,
        "triangles": q_triangles,
        "lookup_join": q_lookup_join,
        "hash_join": q_hash_join,
        "dedup_exact": q_dedup_exact,
        "distinct_lang": q_distinct_lang,
        "token_count": q_token_count,
        "quality": q_quality,
        "ann_cosine": q_ann_cosine,
        "kmeans": q_kmeans,
        "rdp_simplify": q_rdp_simplify,
        "approx_quantiles": q_approx_quantiles,
        "compression_ratio": q_compression_ratio,
        "ann_ivf": q_ann_ivf,
        "embed_neardup": q_embed_neardup,
        "near_dedup_fast": q_near_dedup_fast,
    }

"""Deterministic synthetic geo fixtures (pages / polygons / sites).

``BASELINE.json`` ``input_hint`` fixes the engine's input shape: a Parquet
table of Common-Crawl-style web pages ``(url:string, warc_ts:timestamp,
html:binary, text:string, lang:string)``.  No external data exists in this
sandbox, so the pages table is synthesised *deterministically* from the
driver-generated ``documents`` table (``/root/testdata/sf*/documents.parquet``,
columns doc_id/text/lang): every derived value is a pure integer-arithmetic
function of ``doc_id`` (FIXTURES.md §1 requires derivations be pure functions
of the row, never of partition order).

The lat/lng/weight formulas use only int64 ``*``/``%`` and exact-order
float64 ``+ - * /`` so that a DuckDB SQL oracle reproduces them
bit-for-bit (see ``sql_geo_exprs`` below — the single source of truth used
by ``__ray_entry__.oracle_sql``).

Geo distribution (FIXTURES.md §1): ~20% of rows concentrate in 3 "hot city"
clusters (drives hot-cell skew handling), ~2% have no geo tag (NaN path),
weights are dyadic rationals (k/1024) so any summation order gives exact
sums — float-order-independent aggregate goldens.
"""

from __future__ import annotations

import html as _htmlmod
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from .geo.pip import Polygon

# Hot-city cluster centres (NYC, London, Tokyo).
HOT_LAT = np.asarray([40.71, 51.51, 35.68])
HOT_LNG = np.asarray([-74.0, -0.13, 139.69])

WARC_EPOCH_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds
WARC_STEP_S = 137

N_SITES = 48


def geo_columns(doc_id: np.ndarray) -> Dict[str, np.ndarray]:
    """lat / lng / weight / has_geo as pure functions of doc_id.

    Mirror of the SQL in :func:`sql_geo_exprs`; any change here must change
    there too.
    """
    doc_id = np.asarray(doc_id, dtype=np.int64)
    has_geo = (doc_id % 50) != 7
    hot = (doc_id % 5) == 0
    c = ((doc_id // 5) % 3).astype(np.int64)
    base_lat = ((doc_id * 9973) % 17000) / 100.0 - 85.0
    base_lng = ((doc_id * 7919) % 36000) / 100.0 - 180.0
    hot_lat = HOT_LAT[c] + ((doc_id * 31) % 200) / 1000.0 - 0.1
    hot_lng = HOT_LNG[c] + ((doc_id * 57) % 200) / 1000.0 - 0.1
    lat = np.where(hot, hot_lat, base_lat)
    lng = np.where(hot, hot_lng, base_lng)
    lat = np.where(has_geo, lat, np.nan)
    lng = np.where(has_geo, lng, np.nan)
    weight = ((doc_id * 2654435761) % 1024 + 1) / 1024.0
    return {"lat": lat, "lng": lng, "weight": weight, "has_geo": has_geo}


def sql_geo_exprs(id_col: str = "doc_id") -> Dict[str, str]:
    """DuckDB SQL expressions reproducing :func:`geo_columns` bit-for-bit."""
    hot_lat_case = (
        f"(CASE ({id_col}//5)%3 WHEN 0 THEN 40.71 WHEN 1 THEN 51.51 "
        f"ELSE 35.68 END + (({id_col}*31)%200)/1000.0 - 0.1)"
    )
    hot_lng_case = (
        f"(CASE ({id_col}//5)%3 WHEN 0 THEN -74.0 WHEN 1 THEN -0.13 "
        f"ELSE 139.69 END + (({id_col}*57)%200)/1000.0 - 0.1)"
    )
    lat = (
        f"(CASE WHEN {id_col}%50 = 7 THEN NULL "
        f"WHEN {id_col}%5 = 0 THEN {hot_lat_case} "
        f"ELSE (({id_col}*9973)%17000)/100.0 - 85.0 END)"
    )
    lng = (
        f"(CASE WHEN {id_col}%50 = 7 THEN NULL "
        f"WHEN {id_col}%5 = 0 THEN {hot_lng_case} "
        f"ELSE (({id_col}*7919)%36000)/100.0 - 180.0 END)"
    )
    weight = f"((({id_col}*2654435761)%1024 + 1)/1024.0)"
    return {"lat": lat, "lng": lng, "weight": weight}


# ----------------------------------------------------------------------
# pages table synthesis (map_batches-shaped: documents batch in, pages out)

_HTML_HEAD = (
    '<html><head><meta charset="utf-8"/>'
    '<meta name="generator" content="synthcrawl/1.0"/>{geo}'
    "<title>page {doc_id}</title></head><body>"
    '<nav><a href="/home">home</a><a href="/about">about</a>{links}</nav>'
    "<article>{text}</article>"
    "<footer><span>decoy 12.34;56.78</span>&copy; example</footer>"
    "</body></html>"
)
_GEO_TAG = '<meta name="geo.position" content="{lat:.17g};{lng:.17g}"/>'

#: deterministic cross-site outlinks: page ``d`` links to these three site
#: indices (duplicates and self-links allowed — the SQL mirror in
#: ``pipelines/queries.py`` (_LINK_EDGES_SQL) reproduces them verbatim).
OUTLINK_MULS = ((7, 3), (13, 5), (3, 11))


def outlink_sites(doc_id: int) -> list:
    return [(doc_id * a + b) % 20 for a, b in OUTLINK_MULS]


def make_html(doc_id: int, text: str, lat: float, lng: float, has_geo: bool) -> bytes:
    """One page's html; the <article> body round-trips ``text`` exactly."""
    geo = _GEO_TAG.format(lat=lat, lng=lng) if has_geo else ""
    links = "".join(
        f'<a href="https://site{s}.example/ref/p{doc_id}">r</a>'
        for s in outlink_sites(doc_id))
    page = _HTML_HEAD.format(geo=geo, doc_id=doc_id, links=links,
                             text=_htmlmod.escape(text))
    return page.encode("utf-8")


def synth_pages_batch(batch: pa.Table, id_offset: int = 0) -> pa.Table:
    """documents batch -> pages batch (input_hint schema + doc_id).

    Runs inside ``map_batches(batch_format="pyarrow")``; keeps ``doc_id`` as
    a provenance column alongside the canonical page schema.
    """
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) + id_offset
    text = batch["text"].to_pylist()
    lang = batch["lang"].to_pylist()
    geo = geo_columns(doc_id)
    urls = [
        f"https://site{d % 20}.example/{lg}/p{d}" for d, lg in zip(doc_id.tolist(), lang)
    ]
    htmls = [
        make_html(d, t, la, ln, hg)
        for d, t, la, ln, hg in zip(
            doc_id.tolist(), text, geo["lat"].tolist(), geo["lng"].tolist(),
            geo["has_geo"].tolist(),
        )
    ]
    ts = WARC_EPOCH_US + doc_id * (WARC_STEP_S * 1_000_000)
    import hashlib

    expected = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in text]
    return pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.int64()),
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array([""] * len(urls), type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
            # provenance sidecar: sha256 of the source text, used by the
            # HashCompare invariant stage to verify re-extraction
            "expected_sha256": pa.array(expected, type=pa.string()),
        }
    )


def pages_dataset(sf_dir: str, replicate: int = 1, num_blocks: Optional[int] = None):
    """Lazy Ray Dataset of synthetic pages derived from sf_dir/documents.

    ``replicate`` emits shifted copies (doc_id += r*10_000_000) to scale the
    input up for benchmarking without new data (FIXTURES.md §1 "scaled up on
    the fly by repeating the generator with shifted indices") — generated in
    ONE pass inside the same map task (an 8-way ``union`` of re-reads made
    the physical plan 24 operators deep for no benefit).
    """
    import ray.data as rd

    if num_blocks:
        # A single-file read is ONE task; ``override_num_blocks`` splits
        # its output through the streaming-generator backpressure, which
        # trickles the 128 blocks out over ~6s and caps the downstream
        # fused chain at ~4 concurrent tasks (measured: flagship
        # read+extract 7.1s -> 2.1s with this pre-split).  The base table
        # is a tiny dimension next to the replicated stream, so
        # repartition + materialize it first; the map chain then launches
        # all blocks at once.  (At real 100-TB scale the read has many
        # files/tasks and needs neither knob.)
        ds = (rd.read_parquet(f"{sf_dir}/documents.parquet")
              .repartition(num_blocks).materialize())
    else:
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet")

    def synth_replicated(batch: pa.Table) -> pa.Table:
        tables = [synth_pages_batch(batch, id_offset=r * 10_000_000)
                  for r in range(replicate)]
        return tables[0] if len(tables) == 1 else pa.concat_tables(tables)

    return ds.map_batches(synth_replicated, batch_format="pyarrow")


# ----------------------------------------------------------------------
# polygons

#: Axis-aligned zones used in the DuckDB-oracle-checked PIP query.  Bounds
#: sit at x.xxx5 offsets so no synthetic point (0.001-degree grid) ever lies
#: exactly on a boundary — the half-open convention then matches a plain SQL
#: range predicate regardless of edge handling.
RECT_ZONES: List[tuple] = [
    # (poly_id, lat0, lat1, lng0, lng1)
    (0, 40.6005, 40.8205, -74.1005, -73.8995),   # NYC hot cluster
    (1, 51.4005, 51.6205, -0.2405, -0.0195),     # London hot cluster
    (2, 35.5805, 35.7905, 139.5805, 139.7995),   # Tokyo hot cluster
    (3, -10.0005, 30.0005, -60.0005, -20.0005),  # mid-Atlantic box
    (4, 10.0005, 50.0005, -40.0005, 0.0005),     # overlaps 3 (multi-hit path)
    (5, -80.0005, -40.0005, 60.0005, 120.0005),  # southern box
]


def rect_polygons() -> List[Polygon]:
    out = []
    for pid, lat0, lat1, lng0, lng1 in RECT_ZONES:
        ring = [(lat0, lng0), (lat0, lng1), (lat1, lng1), (lat1, lng0)]
        out.append(Polygon(poly_id=pid, name=f"zone{pid}", ring=ring))
    return out


def extra_polygons() -> List[Polygon]:
    """Non-rectangular shapes for pytest-only goldens (convex, concave,
    shared-edge adjacency) — FIXTURES.md §2."""
    convex = Polygon(100, "convex", [(0.0, 100.0), (5.0, 104.0), (10.0, 102.0),
                                     (8.0, 96.0), (2.0, 95.0)])
    concave = Polygon(101, "concave", [(20.0, 100.0), (30.0, 100.0), (30.0, 110.0),
                                       (25.0, 104.0), (20.0, 110.0)])
    left = Polygon(102, "adj_left", [(-20.0, 40.0), (-20.0, 45.0), (-10.0, 45.0),
                                     (-10.0, 40.0)])
    right = Polygon(103, "adj_right", [(-20.0, 45.0), (-20.0, 50.0), (-10.0, 50.0),
                                       (-10.0, 45.0)])
    return [convex, concave, left, right]


def rect_zones_sql_values() -> str:
    """VALUES list for the DuckDB oracle: (poly_id, lat0, lat1, lng0, lng1)."""
    rows = ", ".join(
        f"({pid}, {lat0!r}, {lat1!r}, {lng0!r}, {lng1!r})"
        for pid, lat0, lat1, lng0, lng1 in RECT_ZONES
    )
    return (
        f"(VALUES {rows}) AS zones(poly_id, lat0, lat1, lng0, lng1)"
    )


# ----------------------------------------------------------------------
# sites (kNN small side)


def sites_table() -> pa.Table:
    """Deterministic site locations; some inside hot clusters."""
    s = np.arange(N_SITES, dtype=np.int64)
    lat = ((s * 5413) % 16000) / 100.0 - 80.0
    lng = ((s * 9241) % 35000) / 100.0 - 175.0
    clustered = (s % 8) == 0
    c = (s % 3).astype(np.int64)
    clat = HOT_LAT[c] + ((s * 13) % 100) / 1000.0 - 0.05
    clng = HOT_LNG[c] + ((s * 17) % 100) / 1000.0 - 0.05
    lat = np.where(clustered, clat, lat)
    lng = np.where(clustered, clng, lng)
    return pa.table({"site_id": s, "lat": lat, "lng": lng})


def sites_sql_values() -> str:
    t = sites_table()
    rows = ", ".join(
        f"({i}, {la!r}, {ln!r})"
        for i, la, ln in zip(
            t["site_id"].to_pylist(), t["lat"].to_pylist(), t["lng"].to_pylist()
        )
    )
    return f"(VALUES {rows}) AS sites(site_id, site_lat, site_lng)"

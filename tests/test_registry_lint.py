"""Registry lint: the queries()/oracle_sql() dict literals must not
contain duplicate keys (Python silently keeps the last one — a
duplicate maps a query name to the wrong callable, which surfaced once
as an oracle mismatch), and every oracle key must have a query."""

import ast
import inspect

from fast_carpenter_ray.pipelines import queries as qmod


def _literal_keys(func) -> list:
    tree = ast.parse(inspect.getsource(func))
    keys = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            for k in node.keys:
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    keys.append(k.value)
    return keys


def test_no_duplicate_query_keys():
    keys = _literal_keys(qmod.build_queries)
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate keys in build_queries: {dupes}"


def test_no_duplicate_oracle_keys():
    keys = _literal_keys(qmod.build_oracles)
    dupes = {k for k in keys if keys.count(k) > 1}
    assert not dupes, f"duplicate keys in build_oracles: {dupes}"


def test_every_oracle_has_a_query():
    q = set(qmod.build_queries().keys())
    o = set(qmod.build_oracles().keys())
    assert o <= q, f"oracles without queries: {o - q}"


def test_function_name_matches_registry():
    """Each registered callable's __name__ is q_<key> — a mismatch means
    a name collision silently rebound the key to another function."""
    for key, fn in qmod.build_queries().items():
        assert fn.__name__ == f"q_{key}", (
            f"queries()['{key}'] is bound to {fn.__name__} — "
            "name collision?")


def test_driver_window_is_oracle_backed():
    """The driver checks the FIRST 50 entries of queries(); window slots
    must never burn on a rows-only (no-oracle) query (round-3 verdict #1:
    kmeans occupied a slot it could never pass)."""
    q = list(qmod.build_queries().keys())
    o = set(qmod.build_oracles().keys())
    window = q[:50]
    assert all(k in o for k in window), (
        f"rows-only queries inside the driver window: "
        f"{[k for k in window if k not in o]}")


_R05_WINDOW = [
    "text_clean", "strip_boilerplate", "winnow_fp", "winnow_pairs",
    "chunk_docs", "rag_retrieve", "bbox_query", "time_range",
    "audio_features", "video_frames", "clustering_coeff", "domain_degrees",
    "pagerank", "retention", "cohort_retention", "od_matrix",
    "od_matrix_bucketed", "compact_cells", "spacetime", "outlier_cells",
    "domain_stats", "domain_footprint", "blocklist", "cluster_cells",
    "site_visits", "uncompact_roundtrip", "tile_pyramid", "lang_quantiles",
    "weighted_median", "crawl_order", "theil_sen", "percentile_rank",
    "distinct_users", "hot_cells", "doc_sample", "stratified_sample",
    "top_docs", "familiarity", "hop_window", "raster_zonal", "focal_mean",
    "spatial_autocorr", "geofence", "hll_users", "cms_users",
    "geofence_dwell", "geofence_bucketed", "zscore_outliers",
    "interval_join", "colocation",
]


def test_round5_rotation_window_pinned():
    """Round-5 driver window = the 50 oracle-backed queries that had no
    green CORRECTNESS row in rounds 1-4 (cumulative record).  Pinning the
    exact list prevents an accidental reorder from silently re-burning
    window slots on already-confirmed queries."""
    q = list(qmod.build_queries().keys())
    assert q[:50] == _R05_WINDOW


def test_rows_only_queries_sit_last():
    """All no-oracle queries are grouped at the END of the registry so
    every future rotation window stays oracle-backed."""
    q = list(qmod.build_queries().keys())
    o = set(qmod.build_oracles().keys())
    flags = [k in o for k in q]
    first_rows_only = flags.index(False)
    assert all(not f for f in flags[first_rows_only:]), (
        "oracle-backed query found after a rows-only one: "
        f"{[k for k, f in zip(q[first_rows_only:], flags[first_rows_only:]) if f]}")

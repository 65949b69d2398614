"""Empty/degenerate inputs through every round-2 operator.

At 100 TB some partition somewhere WILL be empty (a filter that kills a
whole block, a dataset with no rows for one key range); operators must
pass empties through, not crash."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _empty_events():
    return pa.table({
        "k": pa.array([], type=pa.int64()),
        "t": pa.array([], type=pa.int64()),
        "v": pa.array([], type=pa.float64()),
    })


def test_asof_join_empty_sides(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.asof_join import asof_join

    empty = _empty_events()
    full = pa.table({"k": pa.array([1], type=pa.int64()),
                     "t": pa.array([5], type=pa.int64()),
                     "v": [1.0]})
    # empty left -> empty out
    out = asof_join(rd.from_arrow(empty), rd.from_arrow(full),
                    on="t", by="k", how="inner").to_pandas()
    assert len(out) == 0
    # empty right, how=left -> left rows with null payload
    out = asof_join(rd.from_arrow(full), rd.from_arrow(empty),
                    on="t", by="k", how="left").to_pandas()
    assert len(out) == 1
    assert pd.isna(out["v_r"].iloc[0])


def test_session_and_hop_windows_empty(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import (
        hop_windows, session_windows, session_windows_bucketed)

    ds = rd.from_arrow(_empty_events())
    assert session_windows(ds, key="k", ts="t", value="v").count() == 0
    assert session_windows_bucketed(ds, key="k", ts="t", value="v").count() == 0
    assert hop_windows(ds, ts="t", value="v", width_us=20, slide_us=10,
                       mode="hash").count() == 0


def test_range_join_empty_points(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.range_join import (
        range_join, range_join_bucketed)

    pts = pa.table({"x": pa.array([], type=pa.float64())})
    ivl = pa.table({"band": pa.array([0], type=pa.int64()),
                    "lo": [0.0], "hi": [1.0]})
    assert range_join(rd.from_arrow(pts), ivl, "x").count() == 0
    out = range_join_bucketed(rd.from_arrow(pts), rd.from_arrow(ivl), "x",
                              bucket_width=1.0,
                              interval_payload=["band"]).to_pandas()
    assert len(out) == 0


def test_vocab_and_topk_empty(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.sample import group_topk, hash_sample
    from fast_carpenter_ray.stages.text import vocab_count

    docs = pa.table({"text": pa.array([], type=pa.string())})
    assert vocab_count(rd.from_arrow(docs)).count() == 0

    rows = pa.table({"g": pa.array([], type=pa.int64()),
                     "s": pa.array([], type=pa.int64())})
    assert group_topk(rd.from_arrow(rows), group="g", order_by="s",
                      k=3).count() == 0
    assert hash_sample(rd.from_arrow(rows), "g", 0.5).count() == 0


def test_raster_zonal_all_nan(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.raster import make_test_raster, raster_zonal

    tab = pa.table({"lat": pa.array([np.nan, np.nan]),
                    "lng": pa.array([np.nan, np.nan])})
    out = raster_zonal(rd.from_arrow(tab), make_test_raster(8, 8),
                       res=3).to_pandas()
    assert len(out) == 0


def test_heavy_hitters_single_block(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.sketch import heavy_hitters

    tab = pa.table({"x": pa.array([7] * 10, type=pa.int64())})
    out = heavy_hitters(rd.from_arrow(tab), "x", min_frac=0.5)
    assert out["item"].tolist() == [7]
    assert out["n"].tolist() == [10]


def test_checkpoint_rejects_bad_on_stale_up_front(ray_session, tmp_path):
    import ray.data as rd

    from fast_carpenter_ray.state.checkpoint import checkpoint_write

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2], type=pa.int64())}))
    with pytest.raises(ValueError, match="on_stale"):
        checkpoint_write(ds, str(tmp_path / "out"), on_stale="delte")


def test_rollup_cube_empty(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.rollup import cube, rollup

    empty = rd.from_arrow(pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64()),
        "v": pa.array([], type=pa.int64())}))
    r = rollup(empty, keys=["a", "b"], sums=["v"])
    # the grand-total row is always present (count 0); finer levels empty
    assert r.loc[r["_lvl"] == 0, "n"].tolist() == [0]
    c = cube(empty, keys=["a", "b"], sums=["v"])
    assert c.loc[c["_gset"] == 3, "n"].tolist() == [0]


def test_collect_set_empty(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.stats import grouped_collect_set

    empty = rd.from_arrow(pa.table({"g": pa.array([], type=pa.int64()),
                                    "v": pa.array([], type=pa.string())}))
    out = grouped_collect_set(empty, "g", "v")
    assert len(out) == 0


def test_count_triangles_empty_edges(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.linkgraph import count_triangles

    empty = rd.from_arrow(pa.table({
        "src_domain": pa.array([], type=pa.string()),
        "dst_domain": pa.array([], type=pa.string()),
        "n": pa.array([], type=pa.int64())}))
    out = count_triangles(edges=empty)
    assert out.empty


def test_repetition_stats_empty(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.text import RepetitionStats

    empty = rd.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64()),
                                    "text": pa.array([], type=pa.string())}))
    out = RepetitionStats().apply(empty).to_pandas()
    assert len(out) == 0


def _empty_docs():
    import ray.data as rd

    return rd.from_arrow(pa.table({"doc_id": pa.array([], type=pa.int64()),
                                   "text": pa.array([], type=pa.string())}))


def test_text_clean_empty(ray_session):
    from fast_carpenter_ray.stages.text import TextClean

    assert len(TextClean().apply(_empty_docs()).to_pandas()) == 0


def test_chunk_documents_empty(ray_session):
    from fast_carpenter_ray.stages.text import chunk_documents

    out = chunk_documents(_empty_docs()).to_pandas()
    # schema on a fully-empty Dataset is a known Ray to_pandas quirk
    # (see agg.combine_partials) — the contract here is zero rows
    assert len(out) == 0


def test_winnow_empty(ray_session):
    from fast_carpenter_ray.stages.winnow import (winnow_fingerprints,
                                                  winnow_pairs)

    assert winnow_fingerprints(_empty_docs()).count() == 0
    assert winnow_fingerprints(_empty_docs(), hash_mode="fast").count() == 0
    assert len(winnow_pairs(_empty_docs()).to_pandas()) == 0


def test_strip_boilerplate_empty(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.boilerplate import strip_boilerplate

    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "domain": pa.array([], type=pa.string()),
        "text": pa.array([], type=pa.string())}))
    out = strip_boilerplate(empty).to_pandas()
    assert len(out) == 0


def test_minhash_fast_empty_batch():
    from fast_carpenter_ray.stages.dedup import MinHashDedup

    mh = MinHashDedup("e", hash_mode="fast")
    sigs = mh._signatures_fast([])
    assert sigs.shape == (0, mh.num_perm)


def test_hashed_chunk_retrieval_empty(ray_session):
    import pandas as pd

    from fast_carpenter_ray.stages.rag import hashed_chunk_retrieval

    import ray.data as rd

    chunks = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "chunk_id": pa.array([], type=pa.int64()),
        "chunk_text": pa.array([], type=pa.string())}))
    q = pd.DataFrame({"query_id": [1], "query_text": ["anything"]})
    out = hashed_chunk_retrieval(chunks, q)
    assert len(out) == 0

"""Cell-prefix-partitioned layout + read-pruned bbox queries."""

import numpy as np
import pyarrow as pa


def pts():
    lat = np.array([10.0, 20.0, -45.0, 70.0, np.nan])
    lng = np.array([10.0, -30.0, 100.0, -170.0, np.nan])
    return pa.table({
        "doc_id": pa.array(np.arange(5), type=pa.int64()),
        "lat": lat, "lng": lng,
    })


def test_bbox_query_prunes_and_is_exact(ray_session, tmp_path):
    import ray.data as rd

    from fast_carpenter_ray.stages.spatial_index import (
        bbox_query, build_spatial_index)

    d = str(tmp_path / "idx")
    build_spatial_index(rd.from_arrow(pts()).repartition(2), d, prefix_res=2)
    out, stats = bbox_query(d, lat0=0.0, lat1=30.0, lng0=-60.0, lng1=30.0,
                            prefix_res=2)
    got = sorted(out.to_pandas()["doc_id"])
    assert got == [0, 1]
    assert stats["files_read"] < stats["files_total"]
    assert stats["prefixes_read"] < stats["prefixes_total"]
    # no-coord rows live in cell_prefix=-1, never read by a bbox
    assert any("cell_prefix=-1" in p for p in
               __import__("glob").glob(f"{d}/cell_prefix=*"))


def test_bbox_query_empty_box(ray_session, tmp_path):
    import ray.data as rd

    from fast_carpenter_ray.stages.spatial_index import (
        bbox_query, build_spatial_index)

    d = str(tmp_path / "idx")
    build_spatial_index(rd.from_arrow(pts()), d, prefix_res=2)
    out, stats = bbox_query(d, lat0=-89.0, lat1=-80.0, lng0=0.0, lng1=1.0,
                            prefix_res=2)
    # contract: an empty TYPED Dataset (never None) so callers can chain
    assert out.count() == 0
    assert {"doc_id", "lat", "lng"} <= set(out.schema().names)


def test_bbox_query_inverted_ranges_raise(ray_session, tmp_path):
    import pytest
    import ray.data as rd

    from fast_carpenter_ray.stages.spatial_index import (
        bbox_query, build_spatial_index, time_range_query)

    d = str(tmp_path / "idx")
    build_spatial_index(rd.from_arrow(pts()), d, prefix_res=2)
    with pytest.raises(ValueError, match="inverted bbox"):
        bbox_query(d, lat0=30.0, lat1=0.0, lng0=0.0, lng1=1.0)
    with pytest.raises(ValueError, match="inverted bbox"):
        bbox_query(d, lat0=0.0, lat1=30.0, lng0=170.0, lng1=-170.0)
    with pytest.raises(ValueError, match="inverted time range"):
        time_range_query(d, 100, 50)


def test_bbox_boundary_points_covered(ray_session, tmp_path):
    """Points exactly on the bbox edge (and on a prefix-cell edge) must
    be found — the prefix mapping is identical on build and query."""
    import ray.data as rd

    from fast_carpenter_ray.stages.spatial_index import (
        bbox_query, build_spatial_index)

    tab = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "lat": [0.0, 45.0],   # 0.0 and 45.0 sit on res-2 cell edges
        "lng": [0.0, 90.0],
    })
    d = str(tmp_path / "idx")
    build_spatial_index(rd.from_arrow(tab), d, prefix_res=2)
    out, _ = bbox_query(d, lat0=0.0, lat1=45.0, lng0=0.0, lng1=90.0,
                        prefix_res=2)
    assert sorted(out.to_pandas()["doc_id"]) == [0, 1]


def test_time_range_query_prunes_and_is_exact(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.spatial_index import (
        build_time_index, time_range_query)

    day = 86_400_000_000
    ts = pa.array([0, day - 1, day, 2 * day + 5, 9 * day], type=pa.int64())
    tab = pa.table({"event_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
                    "ts": ts})
    d = str(tmp_path / "tidx")
    build_time_index(rd.from_arrow(tab), d)
    # half-open [day, 3*day): events 2 and 3; bucket 0 and 9 never read
    out, stats = time_range_query(d, day, 3 * day,
                                  columns=["event_id", "ts"])
    assert sorted(out.to_pandas()["event_id"]) == [2, 3]
    assert stats["buckets_read"] < stats["buckets_total"]
    # boundary: ts == day-1 excluded, ts == day included (half-open)
    out2, _ = time_range_query(d, 0, day, columns=["event_id", "ts"])
    assert sorted(out2.to_pandas()["event_id"]) == [0, 1]
    # empty range -> empty typed Dataset (never None)
    out3, stats3 = time_range_query(d, 100 * day, 101 * day)
    assert stats3["files_read"] == 0
    assert out3.count() == 0 and "event_id" in out3.schema().names


def test_time_index_normalizes_timestamp_units(ray_session, tmp_path):
    """timestamp[ns] and timestamp[us] columns index and query
    identically — the unit is normalized to microseconds on both the
    build and the query side (a raw int64 cast would bucket ns values
    ~10^3 too fine and silently return nothing)."""
    import ray.data as rd

    from fast_carpenter_ray.stages.spatial_index import (
        build_time_index, time_range_query)

    day = 86_400_000_000
    us = [0, day - 1, day, 2 * day + 5, 9 * day]
    for unit in ("us", "ns"):
        scale = 1000 if unit == "ns" else 1
        tab = pa.table({
            "event_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
            "ts": pa.array([v * scale for v in us],
                           type=pa.timestamp(unit)),
        })
        d = str(tmp_path / f"tidx_{unit}")
        build_time_index(rd.from_arrow(tab), d)
        out, stats = time_range_query(d, day, 3 * day,
                                      columns=["event_id", "ts"])
        assert sorted(out.to_pandas()["event_id"]) == [2, 3], unit
        assert stats["buckets_read"] < stats["buckets_total"]

"""Partition-count invariance (FIXTURES.md §5): the same geo pipeline at
1 partition and at 8 partitions produces identical sorted outputs — block
layout must never leak into results."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.fixtures import rect_polygons, sites_table, synth_pages_batch
from fast_carpenter_ray.stages import (
    CellEncode, CutFlow, ExtractText, ZonalAggregate, pip_join)
from fast_carpenter_ray.stages.knn_join import knn_join


def build(ds):
    import pyarrow.compute as pc

    ds = ExtractText.apply(ds)
    cf = CutFlow("sel", {"All": ["lat > -85.0"]})
    ds = cf.apply(ds)
    ds = CellEncode(res=6).apply(ds)
    ds = ds.map_batches(lambda t: t.filter(pc.greater_equal(t["cell"], 0)),
                        batch_format="pyarrow")
    ds = pip_join(ds, rect_polygons(), res=6, mode="left")
    ds = knn_join(ds, sites_table(), k=2, res=6)
    return ds


@pytest.fixture(scope="module")
def pages(sf_dir):
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet").slice(0, 300)
    return synth_pages_batch(docs)


def rows(ds):
    df = ds.to_pandas()
    cols = ["doc_id", "cell", "poly_id", "site_id", "rank", "dist_m"]
    df = df[cols].sort_values(["doc_id", "rank", "poly_id"],
                              na_position="last").reset_index(drop=True)
    return df


def test_one_vs_eight_partitions(ray_session, pages):
    import ray.data as rd

    one = rows(build(rd.from_arrow(pages).repartition(1)))
    eight = rows(build(rd.from_arrow(pages).repartition(8)))
    pd.testing.assert_frame_equal(one, eight)

    z = ZonalAggregate("z", keys=["cell"])
    za = z.aggregate(build(rd.from_arrow(pages).repartition(1))).to_pandas()
    zb = z.aggregate(build(rd.from_arrow(pages).repartition(8))).to_pandas()
    pd.testing.assert_frame_equal(za, zb)

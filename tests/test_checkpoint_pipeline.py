import json
import os

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.pipelines import load_pipeline
from fast_carpenter_ray.state import checkpoint_write, completed_partitions, write_manifest
from fast_carpenter_ray.state.checkpoint import collect_metrics


def test_checkpoint_write_and_resume(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "sink")
    table = pa.table({"doc_id": pa.array(np.arange(100), type=pa.int64()),
                      "v": np.arange(100) * 1.5})
    ds = rd.from_arrow(table).repartition(4)

    lineage = checkpoint_write(ds, out, id_col="doc_id")
    assert lineage["rows"].sum() == 100
    assert not lineage["skipped"].any()
    parts = completed_partitions(out)
    assert len(parts) == 4

    # resume: identical input -> all partitions skipped, files unchanged
    mtimes = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out) if f.endswith(".parquet")}
    lineage2 = checkpoint_write(ds, out, id_col="doc_id")
    assert lineage2["skipped"].all()
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == m

    # partial resume: delete one partition -> only that one rewritten
    victim = sorted(mtimes)[0]
    os.remove(os.path.join(out, victim))
    lineage3 = checkpoint_write(ds, out, id_col="doc_id")
    assert lineage3["skipped"].sum() == 3

    # outputs identical to a fresh run (sorted row set)
    import pyarrow.parquet as pq
    got = pa.concat_tables(
        [pq.read_table(os.path.join(out, f)) for f in sorted(os.listdir(out))
         if f.endswith(".parquet")]).to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(got["doc_id"], np.arange(100))

    metrics = collect_metrics(out).to_pandas()
    assert metrics["rows"].sum() == 100


def test_manifest(tmp_path):
    path = write_manifest(str(tmp_path), config={"stages": []}, sf="0.01")
    with open(path) as f:
        m = json.load(f)
    assert m["run_args"]["sf"] == "0.01"
    assert "ray" in m["versions"]


PIPELINE_YAML = """
stages:
  - derive: Define
  - sel: CutFlow
  - hist: BinnedDataframe
derive:
  variables:
    - v2: "value * 2"
sel:
  selection: "v2 > 1"
hist:
  binning:
    - {in: event_type}
  weights: {w: value}
"""


def test_yaml_pipeline_end_to_end(ray_session, sf_dir):
    import ray.data as rd

    seq = load_pipeline(PIPELINE_YAML)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet")
    out = seq.apply(ds)
    assert out.count() > 0
    assert "v2" in out.schema().names
    hist = seq["hist"]
    summary = hist.collect(hist.aggregate(out))
    assert summary["n"].sum() == out.count()


def test_yaml_pipeline_bad_config():
    from fast_carpenter_ray.pipelines.config import BadPipelineConfig

    with pytest.raises(BadPipelineConfig):
        load_pipeline({"nope": []})
    with pytest.raises(BadPipelineConfig):
        load_pipeline({"stages": [{"x": "No.Such.Class"}]})

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


def test_checkpoint_key_is_full_content(ray_session, tmp_path):
    """Two DISTINCT blocks sharing (id-min, id-max, count) must get
    distinct partitions — the old key hashed only those three numbers and
    silently dropped the second block."""
    import ray.data as rd

    out = str(tmp_path / "sink")
    # same ids 0..9 in both blocks' min/max/count sense, different payloads
    a = pa.table({"doc_id": pa.array([0, 9], type=pa.int64()), "v": [1.0, 2.0]})
    b = pa.table({"doc_id": pa.array([0, 9], type=pa.int64()), "v": [3.0, 4.0]})
    ds = rd.from_arrow([a, b])
    lineage = checkpoint_write(ds, out, id_col="doc_id")
    assert len(set(lineage["partition"])) == 2
    assert lineage["rows"].sum() == 4


def test_checkpoint_duplicate_blocks_refused(ray_session, tmp_path):
    """Byte-identical input blocks collide by content identity; the sink
    must raise instead of silently dropping rows."""
    import ray.data as rd

    out = str(tmp_path / "sink")
    a = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()), "v": [1.0, 2.0]})
    ds = rd.from_arrow([a, a])
    with pytest.raises(ValueError, match="byte-identical"):
        checkpoint_write(ds, out, id_col="doc_id")


def test_checkpoint_layout_drift_detected(ray_session, tmp_path):
    """Changing block boundaries between runs must not silently leave the
    old layout's files (duplicated rows) in the output directory."""
    import ray.data as rd

    out = str(tmp_path / "sink")
    table = pa.table({"doc_id": pa.array(np.arange(40), type=pa.int64()),
                      "v": np.arange(40) * 0.5})
    checkpoint_write(rd.from_arrow(table).repartition(4), out, id_col="doc_id")
    assert len(completed_partitions(out)) == 4

    # same rows, different block layout -> all keys change -> drift
    drifted = rd.from_arrow(table).repartition(2)
    with pytest.raises(ValueError, match="stale partition"):
        checkpoint_write(drifted, out, id_col="doc_id")

    # explicit replace: old layout removed, output is exactly the new run
    lineage = checkpoint_write(drifted, out, id_col="doc_id", on_stale="delete")
    assert lineage["rows"].sum() == 40
    assert sorted(completed_partitions(out)) == sorted(lineage["partition"])
    import pyarrow.parquet as pq
    got = pa.concat_tables(
        [pq.read_table(os.path.join(out, f)) for f in sorted(os.listdir(out))
         if f.endswith(".parquet")]).to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(got["doc_id"], np.arange(40))
    with open(os.path.join(out, "_manifest.json")) as f:
        m = json.load(f)
    assert sorted(m["partitions"]) == sorted(lineage["partition"])


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


def test_alias_stage(ray_session, sf_dir):
    """Column aliases (reference tree_adapter.py:52-70): user names resolve
    to storage columns, zero-copy; expressions can use the alias."""
    import ray.data as rd

    from fast_carpenter_ray.pipelines import load_pipeline

    yaml_cfg = """
stages:
  - names: Alias
  - derive: Define
names:
  aliases: {ev_value: value}
derive:
  variables:
    - doubled: "ev_value * 2"
"""
    seq = load_pipeline(yaml_cfg)
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "value"])
    out = seq.apply(ds).to_pandas()
    np.testing.assert_allclose(out["doubled"], out["value"] * 2)
    np.testing.assert_allclose(out["ev_value"], out["value"])

    from fast_carpenter_ray.stages import Alias
    ren = Alias("r", {"v": "value"}, keep_original=False)
    t = ren(pa.table({"value": [1.0, 2.0]}))
    assert t.column_names == ["v"]
    with pytest.raises(KeyError):
        Alias("r", {"v": "missing"})(pa.table({"value": [1.0]}))


def test_checkpoint_orphan_sidecar_backfilled(ray_session, tmp_path):
    """ADVICE r2: a crash between the data-file publish and the sidecar
    publish leaves an orphan part-*.parquet.  The resume pass must (a)
    backfill the missing sidecar and (b) keep the partition visible to
    the drift scan (which now reads data files, not sidecars)."""
    import ray.data as rd

    out = str(tmp_path / "ckpt")
    ds = rd.range(100).map_batches(
        lambda t: pa.table({"v": t["id"]}), batch_format="pyarrow")
    lineage = checkpoint_write(ds, out)
    keys = list(lineage["partition"])
    # simulate the crash: remove one sidecar, keep the parquet
    victim = keys[0]
    os.remove(os.path.join(out, "_lineage", f"part-{victim}.json"))
    assert victim not in completed_partitions(out)
    # drift scan still sees the orphan data file
    from fast_carpenter_ray.state.checkpoint import _disk_partitions
    assert victim in _disk_partitions(out)
    # resume: same input -> same keys; the skipped branch backfills
    lineage2 = checkpoint_write(ds, out)
    assert bool(lineage2.loc[lineage2["partition"] == victim,
                             "skipped"].iloc[0])
    assert victim in completed_partitions(out)
    m = collect_metrics(out).to_pandas()
    assert set(m["partition"]) == set(keys)


def test_checkpoint_stale_orphan_deleted(ray_session, tmp_path):
    """An orphan parquet from an OLD layout (no sidecar) must be caught
    by drift detection and removed by on_stale='delete'."""
    import ray.data as rd

    out = str(tmp_path / "ckpt")
    os.makedirs(os.path.join(out, "_lineage"), exist_ok=True)
    # plant an orphan data file with no sidecar
    orphan = os.path.join(out, "part-deadbeefdeadbeef.parquet")
    pa.parquet.write_table(pa.table({"v": [1]}), orphan)
    ds = rd.range(10).map_batches(
        lambda t: pa.table({"v": t["id"]}), batch_format="pyarrow")
    with pytest.raises(ValueError, match="stale"):
        checkpoint_write(ds, out)
    checkpoint_write(ds, out, on_stale="delete")
    assert not os.path.exists(orphan)

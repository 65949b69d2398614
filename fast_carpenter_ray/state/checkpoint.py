"""Resumable, partition-deterministic Parquet sinks with lineage sidecars.

North rule: "Every stage checkpoints per-partition lineage + row/byte
metrics to Parquet so a killed run resumes without recomputing completed
blocks."  The reference has no checkpointing (a killed run restarts from
zero — SURVEY.md §4.1); this is a Ray-native addition.

Design:
  * each output partition is named by a CONTENT-DERIVED key (hash of the
    id-column min/max/count of the block), never by task order — the same
    input produces the same partition files on every run;
  * writes are atomic: tmp file + ``os.replace`` rename;
  * a ``_lineage/part-<key>.json`` sidecar records rows/bytes/columns per
    partition (merged into ``metrics.parquet`` by :func:`collect_metrics`);
  * on resume, a partition whose file already exists is SKIPPED (the write
    stage emits ``skipped=True`` in its lineage row instead of rewriting).

The sink runs inside ``map_batches`` and emits one tiny lineage row per
block — consuming the lineage dataset drives the whole pipeline exactly
once, streaming.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import List, Optional

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["CheckpointSink", "checkpoint_write", "completed_partitions",
           "collect_metrics"]


def _partition_key(batch: pa.Table, id_col: str) -> str:
    """Deterministic partition id from block content, not task order."""
    ids = batch[id_col]
    lo = pa.compute.min(ids).as_py()
    hi = pa.compute.max(ids).as_py()
    return hashlib.blake2b(
        f"{lo}:{hi}:{len(batch)}".encode(), digest_size=8).hexdigest()


class CheckpointSink:
    def __init__(self, out_dir: str, id_col: str):
        self.out_dir = out_dir
        self.id_col = id_col
        os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        key = _partition_key(batch, self.id_col)
        path = os.path.join(self.out_dir, f"part-{key}.parquet")
        lineage_path = os.path.join(self.out_dir, "_lineage", f"part-{key}.json")
        skipped = os.path.exists(path)
        if not skipped:
            tmp = path + f".tmp.{os.getpid()}"
            pq.write_table(batch, tmp)
            os.replace(tmp, path)  # atomic publish
            record = {
                "partition": key,
                "rows": len(batch),
                "bytes": os.path.getsize(path),
                "columns": batch.column_names,
                "written_at": time.time(),
            }
            ltmp = lineage_path + f".tmp.{os.getpid()}"
            with open(ltmp, "w") as f:
                json.dump(record, f)
            os.replace(ltmp, lineage_path)
        return pa.table({
            "partition": [key],
            "rows": pa.array([len(batch)], type=pa.int64()),
            "skipped": [skipped],
        })


def checkpoint_write(ds, out_dir: str, id_col: str):
    """Write ``ds`` to a resumable partitioned layout; returns the (tiny)
    lineage summary as pandas.  Consuming the summary executes the
    pipeline once, streaming (no driver materialization of data rows)."""
    sink = CheckpointSink(out_dir, id_col)
    lineage = ds.map_batches(sink, batch_format="pyarrow")
    return lineage.to_pandas()


def completed_partitions(out_dir: str) -> List[str]:
    lineage_dir = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(lineage_dir):
        return []
    return sorted(
        f[len("part-"):-len(".json")]
        for f in os.listdir(lineage_dir)
        if f.startswith("part-") and f.endswith(".json"))


def collect_metrics(out_dir: str) -> pa.Table:
    """Merge lineage sidecars into one metrics table (-> metrics.parquet)."""
    rows = []
    lineage_dir = os.path.join(out_dir, "_lineage")
    for f in sorted(os.listdir(lineage_dir)) if os.path.isdir(lineage_dir) else []:
        if f.endswith(".json"):
            with open(os.path.join(lineage_dir, f)) as fh:
                rows.append(json.load(fh))
    if not rows:
        return pa.table({"partition": pa.array([], type=pa.string())})
    return pa.table({
        "partition": [r["partition"] for r in rows],
        "rows": pa.array([r["rows"] for r in rows], type=pa.int64()),
        "bytes": pa.array([r["bytes"] for r in rows], type=pa.int64()),
        "written_at": pa.array([r["written_at"] for r in rows], type=pa.float64()),
    })

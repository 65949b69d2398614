"""Resumable, partition-deterministic Parquet sinks with lineage sidecars.

North rule: "Every stage checkpoints per-partition lineage + row/byte
metrics to Parquet so a killed run resumes without recomputing completed
blocks."  The reference has no checkpointing (a killed run restarts from
zero — SURVEY.md §4.1); this is a Ray-native addition.

Design:
  * each output partition is named by a CONTENT-DERIVED key — a hash of
    the block's FULL serialized content (Arrow IPC bytes), never by task
    order — the same input produces the same partition files on every
    run, and two blocks can only collide if they are byte-identical (the
    earlier (id-min, id-max, count) key silently dropped distinct blocks
    that happened to share those three numbers);
  * writes are atomic: tmp file + ``os.replace`` rename;
  * a ``_lineage/part-<key>.json`` sidecar records rows/bytes/columns per
    partition (merged into ``metrics.parquet`` by :func:`collect_metrics`);
  * on resume, a partition whose file already exists is SKIPPED (the write
    stage emits ``skipped=True`` in its lineage row instead of rewriting);
  * after a completed run, ``_manifest.json`` records the expected
    partition set; ``checkpoint_write`` detects LAYOUT DRIFT (files on
    disk that this run's input no longer produces — e.g. the block
    boundaries changed between runs, which would leave duplicated rows in
    the output directory) and, by default, raises instead of silently
    mixing two layouts;
  * byte-identical duplicate blocks WITHIN one run collide by construction
    (content identity); the sink detects this from the lineage (same key
    written + skipped in one run) and raises rather than dropping data.

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


def _partition_key(batch: pa.Table) -> str:
    """Deterministic partition id from the block's FULL content.

    Serializes the (chunk-normalized, metadata-stripped) block to Arrow
    IPC bytes and hashes them — same logical content => same key on every
    run; distinct content => distinct key (no (min,max,count) collisions).
    Cost is one memcpy + a ~GB/s hash per block, far below the parquet
    encode that follows."""
    norm = batch.replace_schema_metadata(None).combine_chunks()
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, norm.schema) as writer:
        writer.write_table(norm)
    return hashlib.blake2b(sink.getvalue(), digest_size=8).hexdigest()


class CheckpointSink:
    def __init__(self, out_dir: str, id_col: Optional[str] = None):
        self.out_dir = out_dir
        self.id_col = id_col  # kept for lineage context; keying is content-based
        os.makedirs(os.path.join(out_dir, "_lineage"), exist_ok=True)

    def _write_lineage(self, lineage_path: str, key: str, batch: pa.Table,
                       path: str) -> None:
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        key = _partition_key(batch)
        path = os.path.join(self.out_dir, f"part-{key}.parquet")
        lineage_path = os.path.join(self.out_dir, "_lineage", f"part-{key}.json")
        skipped = os.path.exists(path)
        if not skipped:
            tmp = path + f".tmp.{os.getpid()}"
            pq.write_table(batch, tmp)
            os.replace(tmp, path)  # atomic publish
            self._write_lineage(lineage_path, key, batch, path)
        elif not os.path.exists(lineage_path):
            # the data file and its sidecar publish in two renames; a crash
            # between them leaves an orphan parquet.  The resume pass lands
            # here (same content => same key) — backfill the sidecar so
            # metrics/manifest see the partition instead of it staying
            # invisible forever.
            self._write_lineage(lineage_path, key, batch, path)
        return pa.table({
            "partition": [key],
            "rows": pa.array([len(batch)], type=pa.int64()),
            "skipped": [skipped],
        })


def checkpoint_write(ds, out_dir: str, id_col: Optional[str] = None,
                     on_stale: str = "error"):
    """Write ``ds`` to a resumable partitioned layout; returns the (tiny)
    lineage summary as pandas.  Consuming the summary executes the
    pipeline once, streaming (no driver materialization of data rows).

    After the run, validates the output directory against this run's
    partition set:

    * duplicate keys within the run (byte-identical input blocks) raise —
      collapsing them would silently drop rows;
    * files on disk this run did not produce = LAYOUT DRIFT (block
      boundaries changed between runs; keeping both layouts duplicates
      rows).  ``on_stale``: "error" (default) raises listing them,
      "delete" removes them, "ignore" leaves them (caller beware).

    The validated partition set is recorded in ``_manifest.json``.
    """
    if on_stale not in ("error", "delete", "ignore"):
        # validate UP FRONT: a typo must fail on the first (clean) run,
        # not on the stale-layout run where the recovery path is needed
        raise ValueError(f"unknown on_stale={on_stale!r}")

    sink = CheckpointSink(out_dir, id_col)
    lineage = ds.map_batches(sink, batch_format="pyarrow").to_pandas()

    dup = lineage["partition"].duplicated(keep=False)
    if dup.any():
        raise ValueError(
            "checkpoint_write: byte-identical input blocks detected "
            f"(partition keys {sorted(set(lineage['partition'][dup]))}); "
            "content-keyed partitions would collapse them and drop rows — "
            "disambiguate the input (e.g. a distinct id column per block)")

    run_keys = set(lineage["partition"])
    # drift scan over the DATA files on disk, not the lineage sidecars:
    # an orphan part-*.parquet without a sidecar (crash between the two
    # publishes under an older layout) must still be visible to drift
    # detection and on_stale='delete'
    disk_keys = set(_disk_partitions(out_dir))
    stale = sorted(disk_keys - run_keys)
    if stale:
        if on_stale == "error":
            raise ValueError(
                f"checkpoint_write: {len(stale)} stale partition(s) in "
                f"{out_dir} not produced by this input/layout "
                f"(e.g. {stale[:3]}): block boundaries changed between "
                "runs. Re-run with on_stale='delete' to replace the old "
                "layout, or 'ignore' to keep both (duplicates rows).")
        if on_stale == "delete":
            for key in stale:
                for p in (os.path.join(out_dir, f"part-{key}.parquet"),
                          os.path.join(out_dir, "_lineage", f"part-{key}.json")):
                    if os.path.exists(p):
                        os.remove(p)
        elif on_stale != "ignore":
            raise ValueError(f"unknown on_stale={on_stale!r}")

    manifest = {
        "partitions": sorted(run_keys),
        "rows": int(lineage["rows"].sum()),
        "written_at": time.time(),
    }
    tmp = os.path.join(out_dir, f"_manifest.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))
    return lineage


def _disk_partitions(out_dir: str) -> List[str]:
    """Partition keys present as part-*.parquet DATA files on disk
    (authoritative for drift detection — sidecars can lag a crash)."""
    if not os.path.isdir(out_dir):
        return []
    return sorted(
        f[len("part-"):-len(".parquet")]
        for f in os.listdir(out_dir)
        if f.startswith("part-") and f.endswith(".parquet"))


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

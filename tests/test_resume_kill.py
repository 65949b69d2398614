"""Kill-after-k-partitions then resume => identical outputs, completed
partitions not recomputed (FIXTURES.md §5; north rule resumability)."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pyarrow.parquet as pq

SCRIPT = """
import ray, sys, time
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, "/root/repo")
import ray.data as rd, pyarrow as pa, numpy as np
from fast_carpenter_ray.state import checkpoint_write

out_dir = sys.argv[1]
slow = len(sys.argv) > 2 and sys.argv[2] == "slow"

ds = rd.range(400, override_num_blocks=8).map_batches(
    lambda b: pa.table({"doc_id": b["id"], "v": b["id"].to_numpy(zero_copy_only=False) * 1.5}),
    batch_format="pyarrow", batch_size=None)
if slow:
    def drag(t: pa.Table) -> pa.Table:
        time.sleep(1.2)
        return t
    ds = ds.map_batches(drag, batch_format="pyarrow", batch_size=None)
lineage = checkpoint_write(ds, out_dir, id_col="doc_id")
print("DONE", len(lineage), int(lineage["skipped"].sum()))
ray.shutdown()
"""


def run(out_dir, slow=False, kill_after=None):
    args = [sys.executable, "-c", SCRIPT, out_dir] + (["slow"] if slow else [])
    proc = subprocess.Popen(args, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                            text=True, cwd="/root/repo")
    if kill_after is None:
        out, err = proc.communicate(timeout=300)
        assert "DONE" in out, f"run failed: {err[-2000:]}"
        return out
    # wait until >=kill_after partitions are published, then SIGKILL
    deadline = time.time() + 240
    lineage_dir = os.path.join(out_dir, "_lineage")
    while time.time() < deadline:
        n = len(os.listdir(lineage_dir)) if os.path.isdir(lineage_dir) else 0
        if n >= kill_after:
            break
        time.sleep(0.3)
    else:
        proc.kill()
        raise AssertionError("never reached kill point")
    proc.send_signal(signal.SIGKILL)
    proc.wait(timeout=60)
    return None


def read_rows(out_dir):
    import pyarrow as pa

    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    table = pa.concat_tables([pq.read_table(os.path.join(out_dir, f)) for f in files])
    return table.to_pandas().sort_values("doc_id").reset_index(drop=True), files


def test_kill_and_resume(tmp_path):
    killed_dir = str(tmp_path / "killed")
    fresh_dir = str(tmp_path / "fresh")

    # run slowly and SIGKILL after >=2 partitions have been published
    run(killed_dir, slow=True, kill_after=2)
    done_before = set(os.listdir(os.path.join(killed_dir, "_lineage")))
    assert len(done_before) >= 2
    mtimes = {f: os.path.getmtime(os.path.join(killed_dir, f))
              for f in os.listdir(killed_dir) if f.endswith(".parquet")}

    # resume: completed partitions skipped (files untouched), rest written
    out = run(killed_dir, slow=False)
    n_parts, n_skipped = (int(x) for x in out.split()[1:3])
    assert n_parts == 8
    assert n_skipped >= len(mtimes)
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(killed_dir, f)) == m

    # identical output to an uninterrupted fresh run
    run(fresh_dir, slow=False)
    resumed, _ = read_rows(killed_dir)
    fresh, _ = read_rows(fresh_dir)
    assert resumed.equals(fresh)
    np.testing.assert_array_equal(resumed["doc_id"], np.arange(400))

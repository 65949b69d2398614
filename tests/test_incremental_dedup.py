"""Incremental dedup lifecycle (stages/dedup.py build_dedup_index +
incremental_dedup)."""

import os

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.dedup import (build_dedup_index,
                                             incremental_dedup)


def _ds(rows):
    """rows: (doc_id, text)"""
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def _ids(ds_out):
    df = ds_out.to_pandas()
    return sorted(df["doc_id"].astype(int)) if len(df) else []


def test_three_run_lifecycle(ray_session, tmp_path):
    idx = str(tmp_path / "index")
    build_dedup_index(_ds([(1, "aaa"), (2, "bbb"), (3, "aaa")]), idx,
                      run_id="base")
    # run 1: one known payload, one new, one internal twin pair
    out1 = incremental_dedup(
        _ds([(10, "aaa"), (11, "ccc"), (12, "ccc"), (13, "ddd")]),
        idx, run_id="r1")
    assert _ids(out1) == [11, 13]
    # run 2: must see run 1's additions AND the base
    out2 = incremental_dedup(
        _ds([(20, "ccc"), (21, "bbb"), (22, "eee")]), idx, run_id="r2")
    assert _ids(out2) == [22]


def test_rerun_same_run_id_is_idempotent(ray_session, tmp_path):
    idx = str(tmp_path / "index")
    build_dedup_index(_ds([(1, "x")]), idx, run_id="base")
    a = incremental_dedup(_ds([(5, "y")]), idx, run_id="r1")
    assert _ids(a) == [5]
    # a resumed/replayed run overwrites its own shard, not a new one
    b = incremental_dedup(_ds([(5, "y")]), idx, run_id="r1")
    assert _ids(b) == [5]
    shards = [p for p in os.listdir(idx) if p.startswith("run-")]
    assert sorted(shards) == ["run-base", "run-r1"]
    # and a later run still sees y exactly once
    c = incremental_dedup(_ds([(9, "y"), (10, "z")]), idx)
    assert _ids(c) == [10]


def test_no_index_dir_dedupes_within_only(ray_session, tmp_path):
    idx = str(tmp_path / "missing")
    out = incremental_dedup(_ds([(3, "p"), (1, "p"), (2, "q")]), idx)
    assert _ids(out) == [1, 2]


def test_join_fallback_equals_broadcast(ray_session, tmp_path):
    rng = np.random.RandomState(43)
    base = [(i, f"doc-{rng.randint(0, 50)}") for i in range(100)]
    inc = [(1000 + i, f"doc-{rng.randint(0, 80)}") for i in range(100)]
    idx_a = str(tmp_path / "a")
    idx_b = str(tmp_path / "b")
    build_dedup_index(_ds(base), idx_a, run_id="base")
    build_dedup_index(_ds(base), idx_b, run_id="base")
    fast = incremental_dedup(_ds(inc), idx_a)
    slow = incremental_dedup(_ds(inc), idx_b, broadcast_budget=0)
    assert _ids(fast) == _ids(slow)

"""Spatial co-location lift (stages/colocation.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.colocation import colocation


def _ds(cells, labels):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "cell": pa.array(cells, type=pa.int64()),
        "label": pa.array(labels, type=pa.string()),
    }))


def _brute(cells, labels):
    by_cell = {}
    for c, l in zip(cells, labels):
        by_cell.setdefault(c, set()).add(l)
    n_cells = len(by_cell)
    n = {}
    n_ab = {}
    for labs in by_cell.values():
        for l in labs:
            n[l] = n.get(l, 0) + 1
        labs = sorted(labs)
        for i in range(len(labs)):
            for j in range(i + 1, len(labs)):
                k = (labs[i], labs[j])
                n_ab[k] = n_ab.get(k, 0) + 1
    rows = []
    for (a, b), ab in sorted(n_ab.items()):
        rows.append((a, b, n[a], n[b], ab,
                     float(n_cells * ab) / (n[a] * n[b])))
    return rows


def test_matches_bruteforce(ray_session):
    rng = np.random.RandomState(8)
    cells = rng.randint(0, 50, 4000).tolist()
    labels = rng.choice(["shop", "cafe", "bank", "park", "gym"],
                        4000).tolist()
    got = colocation(_ds(cells, labels))
    want = _brute(cells, labels)
    assert [tuple(r) for r in got.to_numpy()] == want


def test_duplicate_events_do_not_inflate(ray_session):
    cells = [1, 1, 1, 2, 2]
    labels = ["a", "a", "b", "a", "b"]
    got = colocation(_ds(cells, labels))
    # both cells contain both labels -> n_ab=2, n_a=n_b=2, N=2, lift=1
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["n_a"], r["n_b"], r["n_ab"]) == (2, 2, 2)
    assert r["lift"] == pytest.approx(2 * 2 / 4)


def test_perfect_colocation_lift(ray_session):
    # a and b always together in 2 of 4 cells; c alone elsewhere
    cells = [1, 1, 2, 2, 3, 4]
    labels = ["a", "b", "a", "b", "c", "c"]
    got = colocation(_ds(cells, labels))
    r = got[(got["label_a"] == "a") & (got["label_b"] == "b")].iloc[0]
    assert r["lift"] == pytest.approx(4 * 2 / (2 * 2))  # = 2.0: attraction


def test_no_pairs(ray_session):
    got = colocation(_ds([1, 2], ["a", "b"]))
    assert len(got) == 0

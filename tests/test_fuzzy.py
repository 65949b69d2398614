"""Typo-tolerant fuzzy join (stages/fuzzy.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.fuzzy import fuzzy_pairs_d1, lev_le1


def _lev(a, b):
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = min(d[j] + 1, d[j - 1] + 1,
                      prev + (a[i - 1] != b[j - 1]))
            prev, d[j] = d[j], cur
    return d[lb]


def test_lev_le1_matches_dp():
    rng = np.random.RandomState(41)
    alphabet = "abc"
    words = ["".join(rng.choice(list(alphabet), rng.randint(0, 6)))
             for _ in range(120)]
    for a in words[:40]:
        for b in words[:40]:
            assert lev_le1(a, b) == (_lev(a, b) <= 1), (a, b)


def _ds(names):
    import ray.data as rd
    return rd.from_arrow(pa.table({"name": pa.array(names,
                                                    type=pa.string())}))


def _run(left, right):
    out = fuzzy_pairs_d1(_ds(left), _ds(right)).to_pandas()
    if out.empty:
        return set()
    return set(zip(out["name_a"], out["name_b"],
                   out["dist"].astype(int)))


def test_matches_bruteforce(ray_session):
    rng = np.random.RandomState(42)
    vocab = ["".join(rng.choice(list("abcd"), 4)) for _ in range(60)]
    left = list(dict.fromkeys(vocab[:40]))
    right = list(dict.fromkeys(vocab[20:]))
    got = _run(left, right)
    want = {(a, b, _lev(a, b)) for a in set(left) for b in set(right)
            if _lev(a, b) <= 1}
    assert got == want


def test_transposition_not_matched(ray_session):
    # "ab"/"ba" share a deletion variant but lev = 2: the verify pass
    # must reject it (the FastSS false-positive case)
    assert _run(["ab"], ["ba"]) == set()


def test_insert_delete_substitute(ray_session):
    got = _run(["widget"], ["widgets", "widgt", "wadget", "gadget",
                            "widget"])
    assert got == {("widget", "widgets", 1), ("widget", "widgt", 1),
                   ("widget", "wadget", 1), ("widget", "widget", 0)}


def test_duplicates_collapse_to_distinct_values(ray_session):
    got = _run(["bolt", "bolt", "bolt"], ["bolt", "bolt"])
    assert got == {("bolt", "bolt", 0)}


def test_max_len_guard(ray_session):
    with pytest.raises(Exception):
        fuzzy_pairs_d1(_ds(["x" * 300]), _ds(["y"])).materialize()

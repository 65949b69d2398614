"""Redirect-chain resolution: pointer doubling vs sequential walk."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.redirects import (resolve_map,
                                                 resolve_redirects,
                                                 resolve_stream)


def _walk(ptr: dict, k: int) -> int:
    while k in ptr:
        k = ptr[k]
    return k


def test_resolve_matches_sequential_walk(ray_session):
    import ray.data as rd

    # chains of varying length incl. a 600-hop chain (log2 doubling)
    pairs = [(i, i - 1) for i in range(1, 600)]
    pairs += [(1000 + i, 1000 + i - 10) for i in range(10, 100, 10)]
    ptr = dict(pairs)
    red = rd.from_pandas(pd.DataFrame(pairs, columns=["src", "dst"]))
    keys = pd.DataFrame({"k": np.array(
        [0, 1, 5, 599, 1090, 1005, 2222], dtype=np.int64)})
    got = (resolve_redirects(rd.from_pandas(keys), red, key="k")
           .to_pandas().sort_values("k").reset_index(drop=True))
    exp = sorted((k, _walk(ptr, k)) for k in keys["k"].tolist())
    assert list(zip(got["k"], got["terminal"])) == exp


def test_resolve_map_detects_cycle(ray_session):
    import ray.data as rd

    red = rd.from_pandas(pd.DataFrame({"src": [1, 2], "dst": [2, 1]}))
    with pytest.raises(ValueError, match="cycle|rounds"):
        resolve_map(red)


def test_resolve_map_rejects_duplicate_src(ray_session):
    import ray.data as rd

    red = rd.from_pandas(pd.DataFrame({"src": [1, 1], "dst": [2, 3]}))
    with pytest.raises(ValueError, match="multiple outgoing"):
        resolve_map(red)


def test_resolve_stream_empty_map(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"k": pa.array([7, 8], pa.int64())}))
    empty = pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                          "terminal": pd.Series([], dtype=np.int64)})
    out = resolve_stream(ds, empty, key="k").to_pandas()
    assert out["terminal"].tolist() == [7, 8]

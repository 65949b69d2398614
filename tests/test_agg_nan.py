"""NaN-value semantics of the partial-aggregate combiner.

Arrow group_by kernels propagate a valid (non-null) NaN into
sum/min/max where pandas ``skipna`` ignores it; ``_make_combiner``
masks float NaN to null first so both shrink levels (per-block Arrow,
tree-mode driver pandas) agree — pinned here against a plain pandas
groupby of the same input.
"""

import numpy as np
import pandas as pd
import pyarrow as pa


def _tab():
    return pa.table({
        "k": pa.array([0, 0, 1, 1, 2, 2], type=pa.int64()),
        "v": pa.array([1.0, np.nan, np.nan, np.nan, 3.0, 4.0],
                      type=pa.float64()),
    })


def test_combiner_masks_nan_like_pandas_skipna():
    from fast_carpenter_ray.agg import _make_combiner

    for agg in ("sum", "max", "min"):
        got = _make_combiner(["k"], ["v"], agg=agg)(_tab()).to_pandas()
        got = got.sort_values("k").reset_index(drop=True)
        # group 0: NaN skipped -> 1.0; group 1 all-NaN -> null/NaN;
        # group 2 untouched
        assert got.loc[got["k"] == 0, "v"].iloc[0] == 1.0, agg
        assert np.isnan(got.loc[got["k"] == 1, "v"].iloc[0]), agg
        exp2 = {"sum": 7.0, "max": 4.0, "min": 3.0}[agg]
        assert got.loc[got["k"] == 2, "v"].iloc[0] == exp2, agg


def test_tree_and_hash_modes_agree_with_nan_values(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.agg import combine_partials

    ds = rd.from_arrow(_tab()).repartition(3)
    tree = (combine_partials(ds, keys=["k"], value_cols=["v"], mode="tree",
                             agg="max")
            .to_pandas().sort_values("k").reset_index(drop=True))
    hsh = (combine_partials(ds, keys=["k"], value_cols=["v"], mode="hash",
                            agg="max", num_partitions=2)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # pandas reference: skipna max per group
    ref = (_tab().to_pandas().groupby("k")["v"].max().reset_index())
    for got in (tree, hsh):
        assert got.loc[got["k"] == 0, "v"].iloc[0] == 1.0
        assert got.loc[got["k"] == 2, "v"].iloc[0] == 4.0
        # all-NaN group: pandas max -> NaN; both modes must agree
        assert np.isnan(got.loc[got["k"] == 1, "v"].iloc[0])
    assert np.isnan(ref.loc[ref["k"] == 1, "v"].iloc[0])

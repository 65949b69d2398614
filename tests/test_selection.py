"""Cut-flow counter semantics — unit goldens mirroring the reference's test
strategy (tests/selection/test_filters.py): hand-computed expected counts
for nested All/Any ASTs, including the exact current_mask threading."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.selection import (
    BadCutflowConfig, CutFlow, SelectPhaseSpace, build_selection)


def batch():
    # 10 rows, hand-checkable
    return pa.table({
        "a": np.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 10], dtype=np.float64),
        "b": np.array([1, 1, 0, 0, 1, 1, 0, 0, 1, 1], dtype=np.float64),
        "w": np.full(10, 0.5),
    })


def counters_frame(sel, batch, is_mc=True):
    mask, counters = sel.compute(batch, is_mc)
    idx = [(n.unique_id, n.depth, str(n)) for n in sel.nodes]
    return mask, {i[0]: row for i, row in zip(idx, counters)}, idx


def test_single_cut():
    sel = build_selection("t", "a > 5", weights=["w"])
    mask, rows, idx = counters_frame(sel, batch())
    assert mask.sum() == 5
    # root: passed_only=passed_incl=5, totals=10; weighted halves
    np.testing.assert_array_equal(rows["0"], [5, 2.5, 5, 2.5, 10, 5.0])


def test_all_ordering():
    sel = build_selection("t", {"All": ["a > 3", "b > 0"]}, weights=[])
    mask, rows, idx = counters_frame(sel, batch())
    # a>3: rows 4..10 (7); b>0: rows {5,6,9,10} of those -> 4
    assert mask.sum() == 4
    np.testing.assert_array_equal(rows["0"], [4, 4, 10])      # root All
    np.testing.assert_array_equal(rows["0,0"], [7, 7, 10])    # a>3 first
    # b>0 alone: 6; after: 4; before (mask so far): 7
    np.testing.assert_array_equal(rows["0,1"], [6, 4, 7])


def test_any_counts_against_outer_mask():
    # reference filters.py:176-192: Any children count before=outer mask,
    # after=combine(new_mask, outer)
    sel = build_selection("t", {"All": ["a > 5", {"Any": ["a > 8", "b > 0"]}]},
                          weights=[])
    mask, rows, idx = counters_frame(sel, batch())
    # a>5 -> {6..10} (5); Any(a>8 -> {9,10}, b>0 -> {1,2,5,6,9,10})
    # final = {6,9,10}
    assert mask.sum() == 3
    np.testing.assert_array_equal(rows["0"], [3, 3, 10])
    np.testing.assert_array_equal(rows["0,0"], [5, 5, 10])
    # Any node: excl = {1,2,5,6,9,10} -> 6; after = final 3; before = c1 5
    np.testing.assert_array_equal(rows["0,1"], [6, 3, 5])
    # a>8: excl 2; after = {9,10} & c1 = 2; before = c1 = 5
    np.testing.assert_array_equal(rows["0,1,0"], [2, 2, 5])
    # b>0: excl 6; after = ({9,10}|{b>0}) & c1 = {6,9,10} = 3; before = 5
    np.testing.assert_array_equal(rows["0,1,1"], [6, 3, 5])


def test_data_counts_raw_into_weighted_slots():
    # reference filters.py:48-50
    sel = build_selection("t", "a > 5", weights=["w"])
    _, rows, _ = counters_frame(sel, batch(), is_mc=False)
    np.testing.assert_array_equal(rows["0"], [5, 5, 5, 5, 10, 10])


def test_reduce_cut_on_jagged():
    t = pa.table({
        "jag": pa.array([[1.0, 5.0], [], [0.2], [9.0, 0.1]]),
    })
    # any element > 1 -> rows 0 and 3
    sel = build_selection("t", {"reduce": "any", "formula": "jag > 1.0"})
    mask, _, _ = counters_frame(sel, t)
    np.testing.assert_array_equal(mask, [True, False, False, True])
    # nth-element cut with fill_missing=False: element 0 > 1 -> rows 0, 3
    sel = build_selection("t", {"reduce": 0, "formula": "jag > 1.0"})
    mask, _, _ = counters_frame(sel, t)
    np.testing.assert_array_equal(mask, [False, False, False, True])


def test_merge_algebra_two_batches_equals_double(ray_session):
    import ray.data as rd

    t = batch()
    cf = CutFlow("t", {"All": ["a > 3", "b > 0"]}, weights="w")
    single = cf.cutflow(rd.from_arrow(t)).to_pandas().set_index("unique_id")
    doubled = cf.cutflow(
        rd.from_arrow(pa.concat_tables([t, t])).repartition(4)
    ).to_pandas().set_index("unique_id")
    for c in ("passed_only_cut", "passed_incl", "totals_incl"):
        np.testing.assert_array_equal(
            doubled[c].sort_index(), 2 * single[c].sort_index())


def test_collect_reference_table_shape(ray_session, tmp_path):
    import ray.data as rd

    cf = CutFlow("t", {"All": ["a > 3", "b > 0"]}, weights="w")
    table = cf.collect(cf.cutflow(rd.from_arrow(batch())), dataset_name="d")
    assert table.index.names == ["dataset", "unique_id", "depth", "cut"]
    assert list(table.columns.get_level_values(0)) == [
        "passed_only_cut", "passed_only_cut",
        "passed_incl", "passed_incl", "totals_incl", "totals_incl"]
    assert list(table.columns.get_level_values(1)) == ["unweighted", "w"] * 3
    # %.17g CSV write (stage.py:47 parity)
    path = str(tmp_path / "cuts.csv")
    cf.write_csv(table, path)
    assert "3" in open(path).read()


def test_select_phasespace_appends_column():
    sps = SelectPhaseSpace("t", "a > 5", region_name="region_hi")
    out = sps(batch())
    assert out["region_hi"].to_pylist() == [False] * 5 + [True] * 5
    with pytest.raises(ValueError):
        sps(out)  # column exists


def test_bad_configs():
    with pytest.raises(BadCutflowConfig):
        build_selection("t", {"Nope": ["a > 1"]})
    with pytest.raises(BadCutflowConfig):
        build_selection("t", 42)
    with pytest.raises(BadCutflowConfig):
        build_selection("t", "a > 1", weights={"w": 7})

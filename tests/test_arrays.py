import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.arrays import (
    BadReductionConfig, counts, get_reduction, nth, reduce_list)


JAG = pa.array([[1.0, 2.0, 3.0], [], [5.0], [-1.0, 4.0]])
BOOLS = pa.array([[True, False], [], [False], [True, True]])


def test_counts():
    np.testing.assert_array_equal(counts(JAG), [3, 0, 1, 2])


def test_nth_positive():
    np.testing.assert_array_equal(nth(JAG, 0), [1.0, np.nan, 5.0, -1.0])
    out = nth(JAG, 1)
    assert out[0] == 2.0 and np.isnan(out[1]) and np.isnan(out[2]) and out[3] == 4.0


def test_nth_negative():
    np.testing.assert_array_equal(nth(JAG, -1), [3.0, np.nan, 5.0, 4.0])


def test_nth_fill_and_dtype():
    out = nth(BOOLS, 0, fill_missing=False)
    assert out.dtype == np.bool_
    np.testing.assert_array_equal(out, [True, False, False, True])
    out = nth(JAG, 0, fill_missing=-99)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, [1, -99, 5, -1])


def test_sum_prod():
    np.testing.assert_array_equal(reduce_list(JAG, "sum"), [6.0, 0.0, 5.0, 3.0])
    np.testing.assert_array_equal(reduce_list(JAG, "prod"), [6.0, 1.0, 5.0, -4.0])


def test_any_all():
    np.testing.assert_array_equal(reduce_list(BOOLS, "any"), [True, False, False, True])
    np.testing.assert_array_equal(reduce_list(BOOLS, "all"), [False, True, False, True])


def test_minmax_argminmax_countnonzero():
    np.testing.assert_array_equal(reduce_list(JAG, "max")[[0, 2, 3]], [3.0, 5.0, 4.0])
    assert np.isnan(reduce_list(JAG, "max")[1])
    np.testing.assert_array_equal(reduce_list(JAG, "argmax"), [2, -1, 0, 1])
    np.testing.assert_array_equal(reduce_list(JAG, "argmin"), [0, -1, 0, 0])
    np.testing.assert_array_equal(reduce_list(JAG, "count_nonzero"), [3, 0, 1, 2])


def test_get_reduction_factory():
    red = get_reduction("t", 1)
    out = red(JAG)
    assert out[0] == 2.0 and np.isnan(out[1])
    red = get_reduction("t", "sum")
    np.testing.assert_array_equal(red(JAG), [6.0, 0.0, 5.0, 3.0])
    with pytest.raises(BadReductionConfig):
        get_reduction("t", "nope")
    with pytest.raises(BadReductionConfig):
        get_reduction("t", 1.5)

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.expressions import BadExpression, Expression, evaluate, get_branches


def make_batch():
    return pa.table({
        "a": np.array([1.0, 2.0, 3.0, 4.0]),
        "b": np.array([10.0, 20.0, 30.0, 40.0]),
        "n": np.array([0, 1, 2, 3], dtype=np.int64),
        "s": ["x", "y", "x", "z"],
        "jag": pa.array([[1.0, 2.0], [], [3.0], [4.0, 5.0, 6.0]]),
    })


def test_arithmetic_and_columns():
    e = Expression("sqrt(a**2 + b**2) + pi")
    assert e.columns == ["a", "b"]
    out = evaluate(make_batch(), e)
    np.testing.assert_allclose(out, np.sqrt([101, 404, 909, 1616]) + np.pi)


def test_comparison_and_boolean():
    out = evaluate(make_batch(), "(a > 1) & (b < 40)")
    np.testing.assert_array_equal(out, [False, True, True, False])
    out = evaluate(make_batch(), "(a > 1) | (n == 0)")
    np.testing.assert_array_equal(out, [True, True, True, True])


def test_string_equality():
    out = evaluate(make_batch(), "s == 'x'")
    np.testing.assert_array_equal(out, [True, False, True, False])


def test_constants_and_where():
    out = evaluate(make_batch(), "where(a > 2, 1.0, nan)")
    assert np.isnan(out[0]) and out[2] == 1.0


def test_chained_comparison():
    out = evaluate(make_batch(), "1 < a <= 3")
    np.testing.assert_array_equal(out, [False, True, True, False])


def test_jagged_broadcast():
    # flat column broadcast against jagged (reference expressions.py:90-101)
    out = evaluate(make_batch(), "jag * a")
    assert out.to_pylist() == [[1.0, 2.0], [], [9.0], [16.0, 20.0, 24.0]]


def test_unknown_function_rejected():
    with pytest.raises(BadExpression):
        Expression("__import__('os').system('x')")
    with pytest.raises(BadExpression):
        Expression("open('/etc/passwd')")


def test_get_branches():
    assert get_branches("a + b*2 + nope", ["a", "b"]) == ["a", "b"]


def test_dotted_names():
    batch = pa.table({"Muon.Px": np.array([1.0, 2.0])})
    e = Expression("Muon.Px * 2")
    assert e.columns == ["Muon.Px"]
    np.testing.assert_array_equal(evaluate(batch, e), [2.0, 4.0])

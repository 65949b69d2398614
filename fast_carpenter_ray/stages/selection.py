"""Selection / cut-flow stages (the reference's signature operator).

Reproduces WHAT ``fast_carpenter/selection/filters.py`` and
``selection/stage.py`` compute:

* a nested All/Any AST of string predicates built from YAML-shaped config
  (``filters.py:227-248``), each node identified by a dotted ``unique_id``
  ("0", "0,0", "0,1,0", ...), a depth and its repr;
* per node, three counters — ``passed_only_cut`` (this cut alone),
  ``passed_incl`` (combined so far), ``totals_incl`` (mask before the cut) —
  each unweighted and per weight column (``filters.py:116-119``), with the
  exact threading of ``current_mask``/``combine_op`` through ``All``
  (``filters.py:158-173``: children see ``current_mask & running``) and
  ``Any`` (``filters.py:176-192``: children see the *outer* mask;
  ``after = combine_op(new_mask, current_mask)``);
* the root wrapped so it also counts, with ``before=None`` meaning "all
  rows" (``OuterCounterIncrementer``, ``filters.py:195-208``);
* ``is_mc=False`` data counts raw events into the weighted slots too
  (``filters.py:48-50``);
* ``CutFlow`` drops failing rows; ``SelectPhaseSpace`` appends the mask as a
  named bool column instead (``stage.py:219-250``).

HOW differs: masks are NumPy bool vectors over Arrow batches inside
``map_batches``; counters are *emitted as data* (one small Arrow table per
batch via :meth:`CutFlow.counter_table`) and reduced by
``groupby(unique_id).sum()`` — the Ray-native replacement for the
reference's per-worker stage state + ``merge()`` tree-reduce
(``stage.py:224-225``).  For pipelines that need the filtered stream *and*
the counters in a single pass, an accumulator actor can be attached
(single-run exact, same guarantee as the reference's in-worker counters).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from ..arrays import get_reduction
from ..expressions import Expression, evaluate

__all__ = ["build_selection", "CutFlow", "SelectPhaseSpace", "BadCutflowConfig"]


class BadCutflowConfig(Exception):
    pass


def _safe_and(left, right):
    if left is None:
        return right
    if right is None:
        return left
    return left & right


def _safe_or(left, right):
    if left is None:
        return right
    if right is None:
        return left
    return left | right


class _Node:
    """One AST node; ``sink`` collects (node, excl, before, after) per batch."""

    def __init__(self, depth: int, cut_id: Sequence[int]):
        self.depth = depth
        self.unique_id = ",".join(map(str, cut_id))

    # subclasses: evaluate(batch, sink, current_mask, combine_op) -> mask
    def index_row(self) -> Tuple[str, int, str]:
        return (self.unique_id, self.depth, str(self))

    def walk(self) -> List["_Node"]:
        return [self]


class _SingleCut(_Node):
    def __init__(self, selection: str, depth, cut_id):
        super().__init__(depth, cut_id)
        self.selection = selection
        self.expr = Expression(selection)

    def evaluate(self, batch, sink, current_mask=None, combine_op=_safe_and):
        mask = np.asarray(evaluate(batch, self.expr), dtype=bool)
        return mask

    def __str__(self):
        return self.selection


class _ReduceSingleCut(_Node):
    """Jagged predicate + event-level reduction (``filters.py:129-146``);
    ``fill_missing=False`` so too-short lists fail the cut."""

    def __init__(self, stage_name, depth, cut_id, selection: dict):
        super().__init__(depth, cut_id)
        self._str = str(selection)
        self.reduction = get_reduction(stage_name, selection.get("reduce"), fill_missing=False)
        self.expr = Expression(selection.get("formula"))

    def evaluate(self, batch, sink, current_mask=None, combine_op=_safe_and):
        jagged = evaluate(batch, self.expr)
        if isinstance(jagged, np.ndarray):
            col = pa.array(jagged)
        else:
            col = jagged
        mask = np.asarray(self.reduction(col), dtype=bool)
        return mask

    def __str__(self):
        return self._str


class _Combiner(_Node):
    def __init__(self, children: List[_Node], depth, cut_id):
        super().__init__(depth, cut_id)
        self.children = children

    def walk(self):
        out = [self]
        for c in self.children:
            out.extend(c.walk())
        return out


class _All(_Combiner):
    def evaluate(self, batch, sink, current_mask=None, combine_op=_safe_and):
        mask = np.ones(len(batch), dtype=bool)
        for sel in self.children:
            excl = sel.evaluate(batch, sink,
                                current_mask=combine_op(current_mask, mask),
                                combine_op=_safe_and)
            new_mask = mask & excl
            sink.append((sel, excl, mask, new_mask))
            mask = new_mask
        return mask

    def __str__(self):
        return "All"


class _Any(_Combiner):
    def evaluate(self, batch, sink, current_mask=None, combine_op=_safe_or):
        mask = np.zeros(len(batch), dtype=bool)
        for sel in self.children:
            excl = sel.evaluate(batch, sink,
                                current_mask=current_mask,
                                combine_op=combine_op)
            new_mask = mask | excl
            sink.append((sel, excl, current_mask, combine_op(new_mask, current_mask)))
            mask = new_mask
        return mask

    def __str__(self):
        return "Any"


def _handle_config(stage_name, config, depth=0, cut_id=(0,)) -> _Node:
    if isinstance(config, str):
        return _SingleCut(config, depth, cut_id)
    if not isinstance(config, dict):
        raise BadCutflowConfig(f"{stage_name}: Selection config not a dict")
    if len(config) == 2:
        return _ReduceSingleCut(stage_name, depth, cut_id, config)
    if len(config) != 1:
        raise BadCutflowConfig(f"{stage_name}: Selection config has too many keys")
    method, in_selections = next(iter(config.items()))
    if method not in ("All", "Any"):
        raise BadCutflowConfig(f"{stage_name}: Unknown selection combination method, {method}")
    children = [
        _handle_config(stage_name, sel, depth + 1, tuple(cut_id) + (i,))
        for i, sel in enumerate(in_selections)
    ]
    cls = _All if method == "All" else _Any
    return cls(children, depth, cut_id)


class _Selection:
    """Compiled selection: root node + flat node order + weight exprs."""

    def __init__(self, stage_name, config, weights: Dict[str, str]):
        self.root = _handle_config(stage_name, config)
        self.nodes = self.root.walk()
        # positional index stored ON the node: survives pickling to Ray
        # workers (an id()-keyed dict would not)
        for i, n in enumerate(self.nodes):
            n.pos = i
        self.weights = dict(weights)
        self.weight_exprs = {k: Expression(v) for k, v in self.weights.items()}

    @property
    def columns(self) -> List[str]:
        cols: List[str] = []
        for node in self.nodes:
            expr = getattr(node, "expr", None)
            if expr is not None:
                cols.extend(c for c in expr.columns if c not in cols)
        for e in self.weight_exprs.values():
            cols.extend(c for c in e.columns if c not in cols)
        return cols

    def compute_mask(self, batch: pa.Table) -> np.ndarray:
        """Final selection mask only — no weight evaluation, no counter
        math.  The fast path for filter-only usage (``CutFlow.apply``
        without an accumulator): the counters there were computed and
        thrown away, doubling the cost of the flagship's filter stage."""
        sink: List[tuple] = []
        return self.root.evaluate(batch, sink)

    def compute(self, batch: pa.Table, is_mc: bool):
        """(final_mask, counters ndarray [n_nodes, 3*(1+n_weights)])."""
        sink: List[tuple] = []
        mask = self.root.evaluate(batch, sink)
        # root also counts: excl=after=mask, before=None (filters.py:200-203)
        sink.append((self.root, mask, None, mask))

        wvals = [np.asarray(evaluate(batch, e), dtype=np.float64)
                 for e in self.weight_exprs.values()]
        nw = len(wvals)
        counters = np.zeros((len(self.nodes), 3 * (1 + nw)))
        n_rows = len(batch)

        def unweighted(m):
            return n_rows if m is None else int(np.count_nonzero(m))

        for node, excl, before, after in sink:
            row = node.pos
            for j, m in enumerate((excl, after, before)):  # passed_only, passed_incl, totals
                base = j * (1 + nw)
                u = unweighted(m)
                counters[row, base] += u
                for k, w in enumerate(wvals):
                    if not is_mc:
                        counters[row, base + 1 + k] += u  # data counts raw (filters.py:48-50)
                    else:
                        counters[row, base + 1 + k] += float(w.sum() if m is None else w[m].sum())
        return mask, counters

    def counter_columns(self) -> List[str]:
        names = []
        for kind in ("passed_only_cut", "passed_incl", "totals_incl"):
            names.append(kind)
            names.extend(f"{kind}_{w}" for w in self.weights)
        return names


def _create_weights(stage_name, weights) -> Dict[str, str]:
    """Normalize weight spec (``stage.py:88-103``)."""
    if weights is None:
        return {}
    if isinstance(weights, str):
        return {weights: weights}
    if isinstance(weights, (tuple, list)):
        weights = {w: w for w in weights}
    if isinstance(weights, dict):
        bad = [v for v in weights.values() if not isinstance(v, str)]
        if bad:
            raise BadCutflowConfig(f"{stage_name}: weight not all string, '{bad}'")
        return weights
    raise BadCutflowConfig(f"{stage_name}: Cannot process weight specification")


def build_selection(stage_name: str, config, weights: Optional[Sequence[str]] = None) -> _Selection:
    return _Selection(stage_name, config, _create_weights(stage_name, weights))


class CutFlow:
    """Drop rows failing the selection; count every cut node on the way.

    Parameters mirror the reference stage (``stage.py:187-209``):
    ``selection`` is the nested config, ``weights`` the weight spec,
    ``is_mc`` stands in for the dataset ``eventtype`` switch.
    """

    def __init__(self, name: str, selection, weights=None, is_mc: bool = True,
                 out_dir: Optional[str] = None, accumulator=None):
        self.name = name
        self.out_dir = out_dir
        self.is_mc = is_mc
        self.selection = build_selection(name, selection, weights)
        self._accumulator = accumulator  # optional Ray actor handle

    # -- per-batch callables -------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._accumulator is None:
            # filter-only fast path: skip weight eval + counter math
            return batch.filter(pa.array(self.selection.compute_mask(batch)))
        mask, counters = self.selection.compute(batch, self.is_mc)
        self._accumulator.add.remote(self.name, counters)
        return batch.filter(pa.array(mask))

    def counter_table(self, batch: pa.Table) -> pa.Table:
        """Counters-only batch output (pure; for the cut-flow aggregation)."""
        _, counters = self.selection.compute(batch, self.is_mc)
        return self._counters_to_table(counters)

    def _counters_to_table(self, counters: np.ndarray) -> pa.Table:
        idx = [n.index_row() for n in self.selection.nodes]
        cols: Dict[str, object] = {
            "unique_id": [r[0] for r in idx],
            "depth": pa.array([r[1] for r in idx], type=pa.int32()),
            "cut": [r[2] for r in idx],
        }
        for j, cname in enumerate(self.selection.counter_columns()):
            cols[cname] = counters[:, j]
        return pa.table(cols)

    # -- dataset-level wiring ------------------------------------------
    def apply(self, ds):
        """Filtered dataset (streaming, stateless tasks)."""
        return ds.map_batches(self, batch_format="pyarrow")

    def cutflow(self, ds):
        """Dataset of summed counter rows: one row per cut node.

        A pure two-phase aggregate: per-batch counter partials combined by
        the tree reducer (n_nodes rows per batch — summary-sized, no
        shuffle needed; agg.py).
        """
        from ..agg import combine_partials

        parts = ds.map_batches(self.counter_table, batch_format="pyarrow")
        return combine_partials(parts, ["unique_id", "depth", "cut"],
                                self.selection.counter_columns(), mode="tree")

    def collect(self, cutflow_result, dataset_name: str = "pages") -> pd.DataFrame:
        """Reference-shaped cut-flow table (``filters.py:93-105``):
        MultiIndex (dataset, unique_id, depth, cut), two-level columns
        (passed_only_cut/passed_incl/totals_incl) x (unweighted, w...).
        Sorted by unique_id path = declaration order."""
        df = cutflow_result.to_pandas() if hasattr(cutflow_result, "to_pandas") else cutflow_result
        order = {n.unique_id: i for i, n in enumerate(self.selection.nodes)}
        df = df.sort_values("unique_id", key=lambda s: s.map(order))
        df["dataset"] = dataset_name
        df = df.set_index(["dataset", "unique_id", "depth", "cut"])
        wnames = list(self.selection.weights)
        top = (["passed_only_cut"] * (1 + len(wnames))
               + ["passed_incl"] * (1 + len(wnames))
               + ["totals_incl"] * (1 + len(wnames)))
        sub = (["unweighted"] + wnames) * 3
        df = df[self.selection.counter_columns()]
        df.columns = pd.MultiIndex.from_arrays([top, sub])
        return df

    def write_csv(self, df: pd.DataFrame, path: str) -> None:
        """Golden-diffable CSV, full float precision (``stage.py:47``)."""
        df.to_csv(path, float_format="%.17g")


class SelectPhaseSpace(CutFlow):
    """Append the selection mask as a named bool column (``stage.py:228-250``)
    instead of filtering — enables overlapping "regions"."""

    def __init__(self, name, selection, region_name, **kwargs):
        super().__init__(name, selection, **kwargs)
        self.region_name = region_name

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._accumulator is None:
            mask = self.selection.compute_mask(batch)  # fast path
        else:
            mask, counters = self.selection.compute(batch, self.is_mc)
            self._accumulator.add.remote(self.name, counters)
        if self.region_name in batch.column_names:
            raise ValueError(f"column {self.region_name!r} already exists")
        return batch.append_column(self.region_name, pa.array(mask))

"""Column-creator stages: Define and SystematicWeights.

WHAT (reference): ``Define`` evaluates one expression per entry of a
``variables`` list and appends the result as a new column; entries may carry
``reduce`` (collapse a jagged input to event level), ``mask`` (evaluate only
where a second expression is true) and ``fill_missing``
(``fast_carpenter/define/variables.py:15-76,103-139,142-149``).
``SystematicWeights`` is pure config expansion: a dict of weight variations
becomes k+1 product expressions (weight_nominal, weight_<name>_<dir>)
delegated to an internal Define (``define/systematics.py:61-94``); it only
runs for simulated ("mc") datasets (``systematics.py:69-70``).

HOW: one vectorized ``map_batches(self, batch_format="pyarrow")`` stage;
derived columns are ``append_column`` on the Arrow batch (overwriting an
existing column raises, mirroring ``tree_adapter.py:100-103``).  Schema
grows monotonically through the chain — the Ray analogue of the mutable
data-space.
"""

from __future__ import annotations

from collections import namedtuple
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa

from ..arrays import get_reduction, list_offsets_values
from ..expressions import Expression, evaluate

__all__ = ["Define", "SystematicWeights", "Alias", "BadVariablesConfig"]


class BadVariablesConfig(Exception):
    pass


CalculationCfg = namedtuple("CalculationCfg", "name expression reduction fill_missing mask")


def _build_one_calc(stage_name, name, config):
    """Parse one variable config (``define/variables.py:120-139``)."""
    reduction = None
    mask = None
    fill_missing = np.nan
    if isinstance(config, str):
        return CalculationCfg(name, Expression(config), reduction, fill_missing, mask)
    if not isinstance(config, dict):
        raise BadVariablesConfig(
            f"{stage_name}: To define a new variable need either a string or a dict")
    unknown = [k for k in config if k not in ("reduce", "formula", "fill_missing", "mask")]
    if unknown:
        raise BadVariablesConfig(f"{stage_name}: Unknown parameter defining variable '{name}'")
    fill_missing = config.get("fill_missing", fill_missing)
    if "reduce" in config:
        reduction = get_reduction(stage_name, config["reduce"], fill_missing=fill_missing)
    if "mask" in config:
        mask = Expression(config["mask"])
    return CalculationCfg(name, Expression(config["formula"]), reduction, fill_missing, mask)


class Define:
    """``variables``: list of single-entry dicts {out_name: expr_or_cfg}
    (``define/variables.py:103-114``)."""

    def __init__(self, name: str, variables: List[dict], out_dir: Optional[str] = None):
        self.name = name
        self.out_dir = out_dir
        self._calcs: List[CalculationCfg] = []
        for var in variables:
            if not isinstance(var, dict) or len(var) != 1:
                raise BadVariablesConfig(
                    f"{self.name}: each variable needs a single-entry dictionary")
            out_name, cfg = next(iter(var.items()))
            self._calcs.append(_build_one_calc(self.name, out_name, cfg))

    @property
    def columns(self) -> List[str]:
        """Input columns read (projection pushdown), excluding ones this
        stage itself defines earlier in the list."""
        produced: set = set()
        needed: List[str] = []
        for calc in self._calcs:
            deps = list(calc.expression.columns)
            if calc.mask is not None:
                deps += calc.mask.columns
            for d in deps:
                if d not in produced and d not in needed:
                    needed.append(d)
            produced.add(calc.name)
        return needed

    def __call__(self, batch: pa.Table) -> pa.Table:
        for calc in self._calcs:
            result = evaluate(batch, calc.expression)
            if calc.mask is not None:
                result = self._apply_mask(batch, calc, result)
            if calc.reduction is not None:
                col = result if isinstance(result, (pa.Array, pa.ChunkedArray)) else pa.array(result)
                result = calc.reduction(col)
            if calc.name in batch.column_names:
                raise ValueError(f"Trying to overwrite existing variable: {calc.name}")
            if isinstance(result, (pa.Array, pa.ChunkedArray)):
                batch = batch.append_column(calc.name, result)
            else:
                batch = batch.append_column(calc.name, pa.array(np.asarray(result)))
        return batch

    @staticmethod
    def _apply_mask(batch, calc, result):
        """Jagged mask semantics (``variables.py:144-146``): select entries
        within each list, keeping the event count."""
        mask = evaluate(batch, calc.mask)
        if isinstance(result, (pa.Array, pa.ChunkedArray)) and not isinstance(mask, np.ndarray):
            offsets, values = list_offsets_values(result)
            moffsets, mvalues = list_offsets_values(mask)
            if not np.array_equal(offsets, moffsets):
                raise ValueError("mask and formula have different jaggedness")
            keep = mvalues.astype(bool)
            cs = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
            new_offsets = cs[offsets]  # kept-count prefix sums at list bounds
            return pa.ListArray.from_arrays(
                pa.array(new_offsets, type=pa.int32()), pa.array(values[keep]))
        raise BadVariablesConfig(
            "mask on a flat variable requires a reduce step (reference semantics "
            "only define masking for jagged arrays)")

    def apply(self, ds):
        return ds.map_batches(self, batch_format="pyarrow")


def _normalize_one_variation(stage_name, cfg, name, valid_vars=()):
    if isinstance(cfg, str):
        return dict(nominal=cfg)
    if not isinstance(cfg, dict):
        raise BadVariablesConfig(
            f"{stage_name}: Each systematic weight should be either a dict or just a string")
    if "nominal" not in cfg:
        raise BadVariablesConfig(f"{stage_name}: No nominal weight provided for '{name}'")
    bad = [k for k in cfg if k not in ("nominal", "up", "down") + tuple(valid_vars)]
    if bad:
        raise BadVariablesConfig(f"{stage_name}: Received unknown keys, '{bad}', for '{name}'")
    return cfg


def _build_variations(weights: Dict[str, dict], out_fmt="weight_{}") -> List[dict]:
    """Expansion rule of ``define/systematics.py:82-94``."""
    def combine(ws):
        return "(" + ")*(".join(ws) + ")"

    nominal = {n: w["nominal"] for n, w in weights.items()}
    variations = [{out_fmt.format("nominal"): combine(nominal.values())}]
    to_vary = {(n, var): w[var] for n, w in weights.items() for var in w if var != "nominal"}
    for (name, direction), variable in to_vary.items():
        combo = nominal.copy()
        combo[name] = variable
        variations.append({out_fmt.format(f"{name}_{direction}"): combine(combo.values())})
    return variations


class SystematicWeights:
    """Config-expansion wrapper around Define (``systematics.py:9-71``)."""

    def __init__(self, name, weights: Dict, out_format: str = "weight_{}",
                 extra_variations: List[str] = (), is_mc: bool = True,
                 out_dir: Optional[str] = None):
        self.name = name
        self.is_mc = is_mc
        if not isinstance(weights, dict):
            raise BadVariablesConfig(f"{name}: Didn't receive a dict of weight variations")
        normalized = {
            n: _normalize_one_variation(name, cfg, n, tuple(extra_variations))
            for n, cfg in weights.items()
        }
        self.variations = _build_variations(normalized, out_fmt=out_format)
        self.variable_maker = Define(name + "_builder", self.variations, out_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.is_mc:  # data: no weight variations (systematics.py:69-70)
            return batch
        return self.variable_maker(batch)

    def apply(self, ds):
        if not self.is_mc:
            return ds
        return ds.map_batches(self, batch_format="pyarrow")


class Alias:
    """Column aliases — expose storage columns under user-facing names.

    WHAT (reference ``fast_carpenter/tree_adapter.py:52-70``): an aliases
    mapping lets expressions refer to a branch by a user name that
    resolves to the storage name at access time.

    HOW: Arrow ``append_column`` with a reference to the existing chunked
    array — zero-copy, so aliasing is free; downstream expressions see
    both names.  ``keep_original=False`` drops the storage-name column
    after aliasing (a pure rename).
    """

    def __init__(self, name: str, aliases: "Dict[str, str]",
                 keep_original: bool = True):
        self.name = name
        self.aliases = dict(aliases)
        self.keep_original = keep_original

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import pyarrow as pa  # noqa: F811 (worker-side import)

        for user, storage in self.aliases.items():
            if storage not in batch.column_names:
                raise KeyError(
                    f"{self.name}: alias {user!r} -> missing column {storage!r}")
            if user in batch.column_names:
                raise ValueError(f"{self.name}: column {user!r} already exists")
            batch = batch.append_column(user, batch[storage])
        if not self.keep_original:
            drop = [s for s in self.aliases.values()
                    if s not in self.aliases]  # keep if also a user name
            batch = batch.drop_columns(list(dict.fromkeys(drop)))
        return batch

    def apply(self, ds):
        return ds.map_batches(self, batch_format="pyarrow")

"""Zonal tiling — groupby(cell[, bins]).aggregate summary tables.

North star: "raster<->vector zonal tiling via salted groupby-aggregate
shuffles keyed on cell id with explicit skew splitting for hot cells", and
"BinnedDataframe outputs become groupby(cell, bin).aggregate -> sort
summary tables" — the direct analogue of the reference's histogram merge
(``summary/binned_dataframe.py:250-281``: count / sumw / sumw2 per group).

Skew design (SURVEY.md §4.1): the FIRST line of defense is per-batch
partial aggregation — every batch collapses to at most one row per
(cell[, dims][, salt]) before the shuffle, so a hot cell contributes one
tiny row per batch instead of millions of raw rows.  On top of that,
``salt_buckets`` explicitly splits each cell's partials across S reducer
keys (salt = a deterministic hash of the batch's first row id) and merges
the salts in a second, tiny aggregate — the "explicit skew splitting"
demanded by the north rule, and provably exact because count/sumw/sumw2
are associative+commutative (tested: salted == unsalted).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..expressions import Expression, evaluate

__all__ = ["ZonalAggregate"]


class ZonalAggregate:
    def __init__(self, name: str, keys: List[str] = ("cell",),
                 weights=None, salt_buckets: int = 0):
        self.name = name
        self.keys = list(keys)
        if weights is None:
            weights = {}
        elif isinstance(weights, str):
            weights = {weights: weights}
        elif isinstance(weights, list):
            weights = {str(w): w for w in weights}
        self.weights: Dict[str, Expression] = {k: Expression(v) for k, v in weights.items()}
        self.salt_buckets = int(salt_buckets)

    @property
    def value_columns(self) -> List[str]:
        return (["n"] + [f"sumw_{w}" for w in self.weights]
                + [f"sumw2_{w}" for w in self.weights])

    def partial(self, batch: pa.Table, use_salt: bool = False) -> pa.Table:
        cols = {k: batch[k].to_numpy(zero_copy_only=False) for k in self.keys}
        df = pd.DataFrame(cols)
        for wname, wexpr in self.weights.items():
            w = np.asarray(evaluate(batch, wexpr), dtype=np.float64)
            df[f"sumw_{wname}"] = w
            df[f"sumw2_{wname}"] = w * w
        if use_salt and self.salt_buckets > 1:
            # deterministic per-batch salt: content-derived, never task order
            first_key = int(np.asarray(list(cols.values())[0][:1])[0]) if len(df) else 0
            salt = (first_key * 2654435761 + len(df)) % self.salt_buckets
            df["_salt"] = np.int64(salt)
            group_keys = self.keys + ["_salt"]
        else:
            group_keys = self.keys
        grouped = df.groupby(group_keys, observed=True, sort=False)
        agg = {"n": (group_keys[0], "size")}
        for wname in self.weights:
            agg[f"sumw_{wname}"] = (f"sumw_{wname}", "sum")
            agg[f"sumw2_{wname}"] = (f"sumw2_{wname}", "sum")
        out = grouped.agg(**agg).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def aggregate(self, ds, mode: str = "tree"):
        """partials -> combine -> sort.

        ``mode="tree"`` (default): coarse cell key spaces are summary-sized,
        so the combine tree (agg.py) beats a hash shuffle by orders of
        magnitude in scheduling overhead.  ``mode="hash"``: the true
        shuffle path for fine-resolution cell spaces; with
        ``salt_buckets>1`` the shuffle key is (cell, salt) first, splitting
        any hot cell's partials across reducers, then salts merge in a
        second (tiny) aggregate — exact because count/sumw/sumw2 are
        associative+commutative (tested salted == unsalted).
        """
        import functools

        from ..agg import combine_partials

        # the salt column only changes anything under the hash-shuffle
        # combine (it splits a hot cell's partials across reducer keys);
        # tree mode merges on the driver where salting is dead weight —
        # compute it only where it matters
        use_salt = mode == "hash" and self.salt_buckets > 1
        parts = ds.map_batches(functools.partial(self.partial, use_salt=use_salt),
                               batch_format="pyarrow")
        if mode == "hash":
            if self.salt_buckets > 1:
                salted = combine_partials(parts, self.keys + ["_salt"],
                                          self.value_columns, mode="hash")
                merged = combine_partials(salted, self.keys,
                                          self.value_columns, mode="hash")
            else:
                merged = combine_partials(parts, self.keys,
                                          self.value_columns, mode="hash")
            return merged.sort(self.keys)
        # tree mode returns already sorted (driver-side final merge)
        return combine_partials(parts, self.keys, self.value_columns,
                                mode="tree")

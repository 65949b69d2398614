"""Spatial co-location analysis: which label pairs share cells more
often than independence predicts.

Classic spatial pattern mining (Shekhar & Huang 2001 co-location
patterns, public literature), reduced to its exact counting core: with
``n_a`` = cells where label ``a`` occurs, ``n_ab`` = cells where BOTH
``a`` and ``b`` occur, and ``N`` = occupied cells,

    lift(a, b) = N * n_ab / (n_a * n_b)

— the ratio of observed to expected co-occurrence under independence.
All counts are exact int64 and ``lift`` is ONE IEEE division of exact
ints, so a SQL oracle reproduces every bit.

Scale shape: the event stream shrinks per batch to DISTINCT
``(cell, label)`` pairs (bounded by cells x labels, not rows); ONE
cell-keyed shuffle co-locates each cell's label set; the per-cell
expansion emits one cell marker, one row per label and one row per
label pair (|labels|² per cell — the label space is summary-sized by
assumption), and a tree combine over ``(kind, a, b)`` finishes.
Events never shuffle; the only all-to-all carries distinct-pair rows.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["colocation"]


def colocation(ds, cell: str = "cell", label: str = "label",
               num_partitions: Optional[int] = None) -> pd.DataFrame:
    """Pandas frame ``(label_a, label_b, n_a, n_b, n_ab, lift)`` for
    every unordered label pair (``label_a < label_b``) that co-occurs
    in at least one cell.

    ``n_a``/``n_b`` count cells containing each label, ``n_ab`` cells
    containing both; ``lift = N * n_ab / (n_a * n_b)`` with ``N`` the
    total occupied-cell count (cells with ANY label).
    """
    from ..agg import combine_partials

    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "cell": batch[cell].to_numpy(zero_copy_only=False),
            "label": batch[label].to_pandas(),
        }).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow")

    def cell_expand(g: pd.DataFrame) -> pd.DataFrame:
        labs = np.sort(pd.unique(g["label"]))
        iu = np.triu_indices(len(labs), k=1)
        kind = np.concatenate([["cell"], np.full(len(labs), "label"),
                               np.full(len(iu[0]), "pair")])
        a = np.concatenate([[""], labs, labs[iu[0]]])
        b = np.concatenate([[""], np.full(len(labs), ""), labs[iu[1]]])
        return pd.DataFrame({"kind": kind, "a": a, "b": b,
                             "n": np.ones(len(kind), dtype=np.int64)})

    rows = pairs.groupby("cell", num_partitions=num_partitions).map_groups(
        cell_expand, batch_format="pandas")
    counts = combine_partials(rows, keys=["kind", "a", "b"],
                              value_cols=["n"], mode="tree").to_pandas()

    n_cells = int(counts.loc[counts["kind"] == "cell", "n"].sum())
    lab = counts[counts["kind"] == "label"].set_index("a")["n"]
    pr = counts[counts["kind"] == "pair"]
    if len(pr) == 0:
        return pd.DataFrame({
            "label_a": pd.Series([], dtype="object"),
            "label_b": pd.Series([], dtype="object"),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "n_ab": pd.Series([], dtype="int64"),
            "lift": pd.Series([], dtype="float64"),
        })
    n_a = lab.loc[pr["a"]].to_numpy().astype(np.int64)
    n_b = lab.loc[pr["b"]].to_numpy().astype(np.int64)
    n_ab = pr["n"].to_numpy().astype(np.int64)
    lift = (n_cells * n_ab).astype(np.float64) / (n_a * n_b).astype(
        np.float64)
    return pd.DataFrame({
        "label_a": pr["a"].to_numpy(),
        "label_b": pr["b"].to_numpy(),
        "n_a": n_a, "n_b": n_b, "n_ab": n_ab,
        "lift": lift,
    }).sort_values(["label_a", "label_b"]).reset_index(drop=True)

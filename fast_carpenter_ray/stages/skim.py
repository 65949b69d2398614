"""EventByEventDataframe — per-row "skim" output.

WHAT (reference ``fast_carpenter/summary/event_level_dataframe.py:45-87``):
selected collections (column name lists or expressions) of every event,
optionally masked, concatenated across blocks into one event-level table.

HOW: a plain projection ``map_batches`` stage that streams to sharded
Parquet via ``Dataset.write_parquet`` — the reference's driver-side
``pd.concat`` accumulation (``event_level_dataframe.py:67-71``) is its
scalability ceiling and is deliberately NOT reproduced (SURVEY.md §2.4 A6).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa

from ..expressions import Expression, evaluate

__all__ = ["EventByEventDataframe"]


class EventByEventDataframe:
    def __init__(self, name: str, collections: List[str], mask: Optional[str] = None,
                 out_dir: Optional[str] = None):
        self.name = name
        self.out_dir = out_dir
        self.collections = list(collections)
        self._exprs = {c: Expression(c) for c in self.collections}
        self._mask = Expression(mask) if mask else None

    @property
    def columns(self) -> List[str]:
        cols: List[str] = []
        for e in self._exprs.values():
            cols.extend(c for c in e.columns if c not in cols)
        if self._mask is not None:
            cols.extend(c for c in self._mask.columns if c not in cols)
        return cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._mask is not None:
            mask = np.asarray(evaluate(batch, self._mask), dtype=bool)
            batch = batch.filter(pa.array(mask))
        cols = {}
        for name, expr in self._exprs.items():
            if name in batch.column_names:
                cols[name] = batch[name]
            else:
                result = evaluate(batch, expr)
                cols[name] = result if isinstance(result, (pa.Array, pa.ChunkedArray)) \
                    else pa.array(np.asarray(result))
        return pa.table(cols)

    def apply(self, ds):
        return ds.map_batches(self, batch_format="pyarrow")

    def write(self, ds, path: str):
        """Stream the skim to sharded Parquet (resumable layout)."""
        self.apply(ds).write_parquet(path)

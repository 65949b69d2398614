"""Partial-aggregate combination strategies.

Every summary in this engine is a two-phase aggregate: vectorized per-batch
partials inside ``map_batches`` (one row per key per batch), then a global
combine.  For the combine there are two regimes:

* ``tree`` — the key space is summary-sized (histogram bins, cut-flow
  nodes, zonal cells at coarse resolution): the partials are tiny, so a
  full hash shuffle is pure scheduling overhead (measured: Ray's
  ``groupby().aggregate()`` on 64 partial blocks of 18 rows spent ~57 s
  scheduling ~6 s of work).  Instead, each block is shrunk in place (fused
  with the producing pipeline) and the tiny shrunken partials are merged
  ON THE DRIVER — the reference's Collector architecture
  (``selection/stage.py:61-75``) in Ray Data form.  The driver merge is
  O(#blocks x #keys); ``max_driver_rows`` guards the regime boundary and
  raises with a pointer to ``mode="hash"`` if the key space turns out not
  to be summary-sized after all.

* ``hash`` — the key space grows with the data (per-user windows,
  fine-resolution cells, per-url dedup): ``groupby().aggregate(Sum)``
  hash-partitions keys across the cluster; nothing ever materializes on
  the driver.  Partials still shrink the shuffle by the per-batch dedup
  factor first.

``combine_partials`` picks ``tree`` by default; callers whose key
cardinality scales with the input MUST pass ``mode="hash"``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pandas as pd
import pyarrow as pa

__all__ = ["combine_partials", "default_partitions"]


def default_partitions(divisor: int = 2) -> int:
    """Cluster-sized hash-shuffle partition count.

    Ray 2.49's ``default_hash_shuffle_parallelism`` is 200; aggregator
    actor startup scales with the partition count, not the data (measured:
    13.9 s vs 1.5 s for the same aggregate; MinHash verification 59 s vs
    13 s).  Every engine ``groupby`` therefore passes an explicit
    ``num_partitions`` sized to the cluster; large multi-node runs can
    still override per call to bound reducer memory.
    """
    import ray

    return max(2, int(ray.cluster_resources().get("CPU", 8)) // divisor)

#: tree-mode driver-merge budget: (#blocks x #keys) rows above this raise.
#: ~5M rows of a few numeric columns is < 1 GiB driver heap — generous for
#: any genuinely summary-sized key space, far below any per-key space that
#: scales with a 100 TB input.
MAX_DRIVER_ROWS = 5_000_000


def _make_combiner(keys: Sequence[str], value_cols: Sequence[str],
                   agg: str = "sum"):
    """Per-block shrink as a zero-copy Arrow ``group_by`` (no pandas
    round-trip — this helper runs under every summary in the engine).

    Matches the previous pandas ``groupby`` semantics: rows whose key is
    null or float-NaN are dropped (pandas ``dropna=True``) before the
    Arrow aggregate, which itself ignores nulls.  Float-NaN VALUES are
    masked to null first — Arrow kernels would otherwise propagate a
    valid NaN into sum/min/max where pandas ``skipna`` ignores it, and
    tree mode's driver-side pandas final merge would then disagree with
    the per-block Arrow shrink.
    """
    import pyarrow.compute as pc

    keys = list(keys)
    value_cols = list(value_cols)

    def combine(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([*keys, *value_cols])
        mask = None
        for k in keys:
            col = batch[k]
            valid = pc.is_valid(col)
            if pa.types.is_floating(col.type):
                valid = pc.and_(valid, pc.invert(
                    pc.is_nan(pc.fill_null(col, 0.0))))
            mask = valid if mask is None else pc.and_(mask, valid)
        if not pc.all(mask).as_py():
            batch = batch.filter(mask)
        for c in value_cols:
            col = batch[c]
            if pa.types.is_floating(col.type):
                # NaN -> null so the Arrow aggregate skips it like pandas
                batch = batch.set_column(
                    batch.column_names.index(c), c,
                    pc.if_else(pc.is_nan(col),
                               pa.scalar(None, type=col.type), col))
        res = batch.select([*keys, *value_cols]).group_by(keys).aggregate(
            [(c, agg) for c in value_cols])
        # group_by names aggregates "{col}_{agg}": restore original names
        # and the keys-first column order
        return pa.table(
            [res[k] for k in keys]
            + [res[f"{c}_{agg}"] for c in value_cols],
            names=[*keys, *value_cols])

    return combine


def combine_partials(parts, keys: Sequence[str], value_cols: Sequence[str],
                     mode: str = "tree", agg: str = "sum",
                     max_driver_rows: int = MAX_DRIVER_ROWS,
                     num_partitions: Optional[int] = None):
    """Combine per-batch partial tables into one table per key.

    ``parts``: Dataset of partial rows (keys + value columns).
    ``mode="tree"``: per-block shrink (stays fused with the producing
    pipeline) + driver-side final merge of the shrunken partials; sorted
    by ``keys``.  Raises if the driver merge would exceed
    ``max_driver_rows`` — that is the signal the key space is not
    summary-sized and the caller must use ``mode="hash"``.
    ``mode="hash"``: Ray groupby shuffle (key spaces that scale with the
    data); returns an UNSORTED Dataset, nothing on the driver.
    """
    combine = _make_combiner(keys, value_cols, agg)
    if mode == "hash":
        import ray
        from ray.data.aggregate import Max, Min, Sum

        agg_cls = {"sum": Sum, "min": Min, "max": Max}[agg]
        aggs = [agg_cls(c, alias_name=c) for c in value_cols]
        shrunk = parts.map_batches(combine, batch_format="pyarrow",
                                   batch_size=None)
        if num_partitions is None:
            num_partitions = default_partitions()
        return shrunk.groupby(list(keys), num_partitions=num_partitions).aggregate(*aggs)
    if mode != "tree":
        raise ValueError(f"unknown combine mode {mode!r}")
    # Per-block shrink (stays fused with the producing pipeline), then the
    # final merge of the tiny shrunken partials happens ON THE DRIVER —
    # the reference's Collector architecture (selection/stage.py:61-75).
    # Deliberately NOT a Repartition/Sort AllToAll: Ray 2.49's
    # reservation-based resource allocator strangles an upstream map
    # operator's task budget when AllToAll ops sit downstream (measured:
    # the same 8-CPU pipeline ran 194s with a repartition tail vs 22s
    # consumed directly), and a summary-sized result never needs one.
    import ray.data as rd

    shrunk = parts.map_batches(combine, batch_format="pyarrow", batch_size=None)
    # guard the driver-row budget BEFORE pulling rows onto the driver:
    # materialize the SHRUNKEN summary blocks once (the expensive
    # upstream chain executes exactly once into them; the blocks are
    # per-block-combined partials, tiny by contract), then count is
    # metadata-cheap.  NOT to_pandas(limit=...): Ray implements that as
    # count() + fetch = TWO executions of the whole lazy chain (measured
    # 2x on the flagship).
    shrunk = shrunk.materialize()
    n_partial = shrunk.count()
    if n_partial > max_driver_rows:
        raise ValueError(
            f"combine_partials(mode='tree'): driver merge of {n_partial} "
            f"partial rows exceeds the {max_driver_rows}-row budget — this "
            f"key space is not summary-sized; use mode='hash'")
    local = shrunk.to_pandas()  # bounded: guarded above
    if len(local) == 0:
        # all partials empty: to_pandas() loses the schema — rebuild it so
        # downstream column access still works
        local = pd.DataFrame({c: pd.Series([], dtype="float64")
                              for c in [*keys, *value_cols]})
    final = (local.groupby(list(keys), observed=True, sort=False)[list(value_cols)]
             .agg(agg).reset_index())
    final = final.sort_values(list(keys)).reset_index(drop=True)
    return rd.from_pandas(final)

"""Leave-one-out target encoding — the classic ML categorical encoder.

``target_encode`` replaces (well, annotates) a categorical key column
with the mean of a numeric target over all OTHER rows sharing the key:

    loo_i = (S_key − x_i) / (n_key − 1)

falling back to the global leave-one-out mean for singleton keys.  The
leave-one-out form avoids the self-leakage of a plain per-key mean
(Micci-Barreca 2001, public literature).

Ray shape (hot-key-safe, no per-key ``map_groups``):

1. per-batch partial ``(key, s, n)`` sums inside ``map_batches`` — the
   combiner shrink, so only distinct-key rows shuffle;
2. one hash combine to the per-key stats table (``agg.combine_partials``,
   bounded partitions), materialized ONCE (it is the post-shrink small
   side — the standard stats-table trade);
3. the row stream hash-joins the stats table on the key (projected to
   id/key/target first — shuffle only what the join needs);
4. a final stateless map computes the quotient.

Exactness: when the target takes integer-representable values, every
``S − x`` is an exact float64 integer and the single division is exact
IEEE — a SQL replay hashes bit-identically.  For arbitrary floats the
per-key sums are order-dependent at the ulp level (documented; same
contract as DuckDB itself).

Reference analogue: none (SURVEY §2.6 ML-curation extension, like
stages/classifier.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["target_encode"]


def target_encode(ds, key: str, target: str,
                  id_cols: Optional[Sequence[str]] = None,
                  out: str = "loo_mean", num_partitions: Optional[int] = None,
                  broadcast_budget: int = 2_000_000):
    """Append ``out``: the leave-one-out per-``key`` mean of ``target``.

    Returns a Dataset with ``id_cols + [key, out]`` (all columns when
    ``id_cols`` is None).
    """
    from ..agg import combine_partials, default_partitions
    from .joins import hash_join

    if num_partitions is None:
        num_partitions = default_partitions(4)

    cols = ([*(id_cols or []), key, target]
            if id_cols is not None else None)
    if cols is not None:
        ds = ds.select_columns(list(dict.fromkeys(cols)))

    def partials(batch: pa.Table) -> pa.Table:
        # explicit schema: an empty block would otherwise infer a
        # null-typed key column and break the join's schema unification
        schema = pa.schema([(key, batch.schema.field(key).type),
                            ("_te_s", pa.float64()), ("_te_n", pa.int64())])
        df = pd.DataFrame({
            "k": batch[key].to_pandas(),
            "x": batch[target].to_numpy(zero_copy_only=False).astype(
                np.float64),
        })
        g = df.groupby("k", sort=False, observed=True)["x"].agg(
            ["sum", "size"]).reset_index()
        return pa.table({
            key: pa.array(g["k"], type=schema.field(key).type),
            "_te_s": pa.array(g["sum"].to_numpy(), type=pa.float64()),
            "_te_n": pa.array(g["size"].to_numpy().astype(np.int64)),
        }).cast(schema)

    stats = combine_partials(
        ds.map_batches(partials, batch_format="pyarrow"),
        keys=[key], value_cols=["_te_s", "_te_n"], mode="hash",
        num_partitions=num_partitions).materialize()

    # budget-guarded broadcast (the simjoin contract): the stats table is
    # one row per distinct key — broadcast it under the budget so the row
    # stream never shuffles; above it, a partitioned hash join (dense key
    # spaces fill every partition at that scale; Ray 2.49's join crashes
    # on partitions whose right side got zero blocks, a sparse/toy-input
    # artifact).  The global (sum, n) totals come from whichever copy is
    # cheapest: the pulled broadcast table, or one Ray aggregate.
    if stats.count() <= broadcast_budget:
        import ray

        # drop zero-row blocks: hash partitions that received no keys are
        # schemaless and would break concat
        tbls = [t for t in ray.get(stats.to_arrow_refs()) if t.num_rows]
        if not tbls:  # empty input: nothing to encode
            return ds.map_batches(
                lambda t: t.append_column(
                    out, pa.nulls(len(t), pa.float64())),
                batch_format="pyarrow")
        small = pa.concat_tables(tbls)
        gs = float(np.sum(small["_te_s"].to_numpy(zero_copy_only=False)))
        gn = int(np.sum(small["_te_n"].to_numpy(zero_copy_only=False)))
        from .joins import lookup_join

        joined = lookup_join(ds, small, key, how="inner")
    else:
        from ray.data.aggregate import Sum

        tot = stats.aggregate(Sum("_te_s", alias_name="s"),
                              Sum("_te_n", alias_name="n"))
        gs, gn = float(tot["s"]), int(tot["n"])
        joined = hash_join(ds, stats, key, num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        x = batch[target].to_numpy(zero_copy_only=False).astype(np.float64)
        s = batch["_te_s"].to_numpy(zero_copy_only=False)
        n = batch["_te_n"].to_numpy(zero_copy_only=False)
        batch = batch.drop_columns(["_te_s", "_te_n"])
        if gn > 1:
            fallback = (gs - x) / np.float64(gn - 1)
        else:
            # a 1-row dataset has no leave-one-out information at all:
            # emit NULL, mirrored by the oracle's CASE WHEN t.gn > 1
            # guard (ADVICE r3 — the bare SQL divides by zero here)
            loo = np.where(n > 1, (s - x) / np.maximum(n - 1, 1).astype(
                np.float64), np.nan)
            return batch.append_column(
                out, pa.array(loo, type=pa.float64(),
                              mask=~np.isfinite(loo)))
        loo = np.where(n > 1, (s - x) / np.maximum(n - 1, 1).astype(
            np.float64), fallback)
        return batch.append_column(out, pa.array(loo, type=pa.float64()))

    return joined.map_batches(finish, batch_format="pyarrow")

"""Dataset snapshot diff: classify keys as added / removed / changed
between two versions of a keyed table.

The data-versioning leg of a pipeline that re-crawls / re-ingests: given
``old`` and ``new`` Datasets sharing a key column, report every key whose
row appeared, disappeared, or changed in the compared columns.

Scale shape: each side is shrunk per batch to
``(key, old_cnt, new_cnt, old_h, new_h)`` — counts plus a deterministic
64-bit content hash of the compared columns (``pandas
util.hash_pandas_object``, seed-stable across processes; a collision
falsely reporting "unchanged" has probability ~2^-64 per key,
documented) — the two partial streams are UNIONED (no join!) and ONE
hash combine keyed on the key sums both sides together; a final
vectorized map classifies each key.  Neither input is ever joined,
sorted or materialized: the only shuffle is the summary-per-key combine,
and the classification is a per-batch Arrow filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["dataset_diff", "latest_by_key"]


def _side_partials(ds, key, cols, side):
    oc, nc, oh, nh = "old_cnt", "new_cnt", "old_h", "new_h"

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key, *cols]).to_pandas()
        h = pd.util.hash_pandas_object(
            df[list(cols)], index=False).to_numpy().astype(np.int64)
        out = pd.DataFrame({key: df[key]})
        one = np.ones(len(df), dtype=np.int64)
        zero = np.zeros(len(df), dtype=np.int64)
        out[oc] = one if side == "old" else zero
        out[nc] = zero if side == "old" else one
        out[oh] = h if side == "old" else zero
        out[nh] = zero if side == "old" else h
        shrunk = out.groupby(key, sort=False).sum().reset_index()
        return pa.Table.from_pandas(shrunk, preserve_index=False)

    return ds.map_batches(partial, batch_format="pyarrow")


def dataset_diff(old_ds, new_ds, key: str, cols, mode: str = "hash",
                 include_unchanged: bool = False):
    """Diff two keyed Datasets; see module docstring.

    Assumes the key is unique per side (counts > 1 classify as
    ``changed`` conservatively).  Returns a Dataset of
    ``(key, change)`` with ``change`` in added/removed/changed
    (+ unchanged when requested).
    """
    from ..agg import combine_partials

    cols = list(cols)
    parts = _side_partials(old_ds, key, cols, "old").union(
        _side_partials(new_ds, key, cols, "new"))
    agg = combine_partials(
        parts, keys=[key],
        value_cols=["old_cnt", "new_cnt", "old_h", "new_h"], mode=mode)

    def classify(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        o = df["old_cnt"].to_numpy() > 0
        n = df["new_cnt"].to_numpy() > 0
        same = (df["old_h"].to_numpy() == df["new_h"].to_numpy())
        change = np.where(~o, "added",
                          np.where(~n, "removed",
                                   np.where(same, "unchanged", "changed")))
        out = pd.DataFrame({key: df[key], "change": change})
        if not include_unchanged:
            out = out[out["change"] != "unchanged"]
        return pa.Table.from_pandas(out, preserve_index=False,
                                    schema=pa.schema([
                                        (key, batch.schema.field(key).type),
                                        ("change", pa.string())]))

    return agg.map_batches(classify, batch_format="pyarrow")


def latest_by_key(ds, key: str, version: str, value: str,
                  value_bound: int = 1_000_000_000, mode: str = "hash"):
    """CDC / upsert compaction: the latest ``value`` per key, "latest" =
    highest ``version`` (ties -> the larger value, a deterministic rule
    both sides state explicitly).

    The argmax is made ASSOCIATIVE by packing:
    ``packed = version * value_bound + value`` (requires
    ``0 <= value < value_bound`` and the product in int64 — checked per
    batch).  A packed max IS the latest-wins winner, so compaction is
    per-batch max partials + ONE Max combine — no per-key group task, no
    row materialization, the cheapest possible shuffle shape for
    100 TB CDC streams.  Returns ``(key, version, value)``.
    """
    from ..agg import combine_partials

    bound = int(value_bound)

    def pack(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[version].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch[value].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and (x.min() < 0 or x.max() >= bound):
            raise ValueError(
                f"latest_by_key: value outside [0, {bound}) cannot pack")
        if len(v) and (v.max() > (2**62) // bound
                       or v.min() < -((2**62) // bound)):
            # check BOTH signs: a large-negative version would wrap int64
            # and silently win the packed max
            raise ValueError("latest_by_key: version * value_bound "
                             "overflows int64")
        df = pd.DataFrame({key: k, "_packed": v * bound + x})
        out = df.groupby(key, sort=False)["_packed"].max().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    packed = combine_partials(ds.map_batches(pack, batch_format="pyarrow"),
                              keys=[key], value_cols=["_packed"],
                              mode=mode, agg="max")

    def unpack(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if "_packed" not in df.columns:  # schemaless empty block
            return pa.table({key: pa.array([], pa.int64()),
                             version: pa.array([], pa.int64()),
                             value: pa.array([], pa.int64())})
        p = df["_packed"].to_numpy().astype(np.int64)
        return pa.table({key: pa.array(df[key].to_numpy().astype(np.int64)),
                         version: pa.array(p // bound),
                         value: pa.array(p % bound)})

    return packed.map_batches(unpack, batch_format="pyarrow")

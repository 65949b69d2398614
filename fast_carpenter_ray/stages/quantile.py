"""Exact distributed quantiles over integer columns.

Quantiles drive curation thresholds (length cutoffs, quality-score
percentiles).  For integer-valued columns the exact answer needs no
sketch: per-batch ``value_counts`` shrink each block to its distinct
values, ONE hash combine keyed on the value merges them, and the quantile
is read off the cumulative distribution.

Definition (chosen to be expressible in ANSI SQL for the oracle):
``quantile(q)`` = the smallest value ``v`` with
``count(rows <= v) >= ceil(q * n)``.

Scale note: the combined histogram is DISTINCT-VALUE-sized.  For genuinely
unbounded domains the driver read-off is guarded by ``max_driver_rows``
(same regime-boundary contract as ``agg.combine_partials`` tree mode);
above it, quantize the column upstream (e.g. ``v // scale``) or use
:func:`approx_quantiles` — the deterministic mergeable-summary path for
genuinely continuous domains, with a pinned n/k rank-error bound.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["exact_quantiles", "grouped_quantiles", "percentile_rank",
           "approx_quantiles", "grouped_weighted_median", "quantile_bucket"]


def exact_quantiles(ds, col: str, qs: Sequence[float],
                    max_driver_rows: int = 5_000_000) -> pd.DataFrame:
    """Exact quantiles of integer column ``col`` at fractions ``qs``.

    Returns a DataFrame (q, value) with one row per requested fraction.
    """
    qs = list(qs)
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("exact_quantiles: fractions must be in (0, 1]")

    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        items, counts = np.unique(v, return_counts=True)
        return pa.table({"value": pa.array(items, type=pa.int64()),
                         "n": pa.array(counts, type=pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    hist = combine_partials(parts, keys=["value"], value_cols=["n"],
                            mode="hash").to_pandas()
    if len(hist) > max_driver_rows:
        raise ValueError(
            f"exact_quantiles: {len(hist)} distinct values exceed the "
            f"{max_driver_rows}-row driver budget — quantize the column "
            f"upstream (v // scale) or use a sketch")
    hist = hist.sort_values("value").reset_index(drop=True)
    cum = hist["n"].cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        raise ValueError("exact_quantiles: empty input")
    vals = hist["value"].to_numpy()
    out = []
    for q in qs:
        target = int(np.ceil(q * n))
        idx = int(np.searchsorted(cum, target, side="left"))
        out.append({"q": float(q), "value": int(vals[idx])})
    return pd.DataFrame(out)


def grouped_quantiles(ds, group: str, col: str,
                      qs: Sequence[float]) -> "object":
    """Exact per-group quantiles of integer ``col`` (same definition as
    :func:`exact_quantiles`).  Per-batch (group, value) count partials,
    one hash combine keyed on the pair, then a per-group cumulative
    read-off (group tasks see distinct-values-per-group rows, never raw
    rows).  Returns a Dataset of (group, q, value)."""
    qs = list(qs)
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError("grouped_quantiles: fractions must be in (0, 1]")

    from ..agg import combine_partials, default_partitions

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            group: batch[group].to_numpy(zero_copy_only=False),
            "value": batch[col].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        out = (df.groupby([group, "value"], sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    hist = combine_partials(parts, keys=[group, "value"], value_cols=["n"],
                            mode="hash")

    def read_off(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value")
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = g["value"].to_numpy()
        rows = []
        for q in qs:
            idx = int(np.searchsorted(cum, int(np.ceil(q * n)), side="left"))
            rows.append({group: g[group].iloc[0], "q": float(q),
                         "value": np.int64(vals[idx])})
        out = pd.DataFrame(rows)
        out["value"] = out["value"].astype(np.int64)
        return out

    return hist.groupby(group, num_partitions=default_partitions()).map_groups(
        read_off, batch_format="pandas")


def grouped_weighted_median(ds, group: str, col: str, weight: str):
    """Exact per-group WEIGHTED lower median of integer ``col`` with
    integer weights: the smallest value ``v`` whose cumulative weight
    reaches half the group total (``2 * cumw(v) >= totw`` — pure integer
    comparison, so no float midpoint ambiguity and a clean SQL oracle).

    Scale shape mirrors :func:`grouped_quantiles`: per-batch
    (group, value) weight-sum partials shrink each block to its distinct
    pairs, ONE hash combine merges them, and the per-group cumulative
    read-off sees distinct-values-per-group rows, never raw rows — the
    row stream itself never sorts or shuffles.  Weighted medians drive
    curation thresholds where rows carry replication / importance
    weights (e.g. per-URL duplicate multiplicity).
    """
    from ..agg import combine_partials, default_partitions

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            group: batch[group].to_numpy(zero_copy_only=False),
            "value": batch[col].to_numpy(zero_copy_only=False).astype(np.int64),
            "w": batch[weight].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        out = (df.groupby([group, "value"], sort=False)["w"].sum()
               .reset_index())
        out["w"] = out["w"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    hist = combine_partials(parts, keys=[group, "value"], value_cols=["w"],
                            mode="hash")

    def read_off(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value")
        cum = g["w"].cumsum().to_numpy()
        tot = int(cum[-1])
        idx = int(np.searchsorted(2 * cum, tot, side="left"))
        return pd.DataFrame({group: [g[group].iloc[0]],
                             "wmedian": np.array([g["value"].iloc[idx]],
                                                 dtype=np.int64)})

    return hist.groupby(group, num_partitions=default_partitions()).map_groups(
        read_off, batch_format="pandas")


def percentile_rank(ds, col: str, keep: "Sequence[str]" = ("doc_id",),
                    out: str = "rnk", max_driver_rows: int = 5_000_000):
    """Global rank per row (1 + count of strictly smaller values — SQL
    ``rank() OVER (ORDER BY col)``) WITHOUT a global sort.

    Scale shape: the corpus shrinks to a distinct-value histogram
    (per-batch value counts, tree combine — bounded by the number of
    DISTINCT values, not rows; guarded by ``max_driver_rows``), the
    exclusive cumulative sum is read off on the driver, and the tiny
    (value -> rank) arrays broadcast back inside a fused per-batch
    ``searchsorted`` lookup.  The doc stream itself never shuffles or
    sorts — the pattern that replaces a full AllToAll sort at 100 TB
    whenever the value domain is materially smaller than the row count.
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        v, c = np.unique(
            batch[col].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True)
        return pa.table({col: pa.array(v),
                         "c": pa.array(c.astype(np.int64))})

    hist = combine_partials(ds.map_batches(partial, batch_format="pyarrow"),
                            keys=[col], value_cols=["c"], mode="tree",
                            max_driver_rows=max_driver_rows).to_pandas()
    vals = hist[col].to_numpy(dtype=np.int64)          # sorted by combine
    counts = hist["c"].to_numpy(dtype=np.int64)
    before = np.concatenate(([0], np.cumsum(counts)[:-1]))  # strictly-smaller

    cols = list(keep) + [col]

    def rank_off(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(vals, x)
        arrays = {c: batch[c] for c in cols}
        arrays[out] = pa.array(before[idx] + 1)
        return pa.table(arrays)

    return ds.map_batches(rank_off, batch_format="pyarrow")


def approx_quantiles(ds, col: str, qs: Sequence[float],
                     k_per_block: int = 1024) -> pd.DataFrame:
    """Quantiles of a CONTINUOUS (unbounded-domain) column with a
    deterministic rank-error bound — the scale path the module
    docstring points to when distinct-value shrink cannot work.

    Per block, the values are sorted ONCE and summarized by
    ``k_per_block`` evenly-spaced order statistics, each carrying
    weight ``n_block / k`` (plus the exact min/max at zero weight
    adjustment); the block summaries — ``k`` weighted points per
    block, regardless of block size — merge on the driver by a sorted
    cumulative-weight read-off.  Mergeable-summary error analysis
    (Greenwald-Khanna-style spacing bound, public literature): each
    block contributes rank error <= ``n_block / k``, so the estimate's
    TOTAL rank error is <= ``n / k`` — e.g. k=1024 gives 0.1% rank
    accuracy whatever the data distribution, with no randomness
    anywhere (unlike KLL's coin-flip compactors, reruns and resumes
    reproduce the same answer for the same block layout).

    Returns ``(q, value, rank_error_bound)`` rows; ``value`` is an
    actual data point (never interpolated).  Approximate by nature, so
    its driver oracle is rows-only; the error bound itself is
    pytest-pinned against exact quantiles.
    """
    if not qs:
        raise ValueError("approx_quantiles: qs must be non-empty")
    if k_per_block < 2:
        raise ValueError("approx_quantiles: k_per_block must be >= 2")
    k = int(k_per_block)

    def summarize(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v)]
        n = len(v)
        if n == 0:
            return pa.table({"v": pa.array([], type=pa.float64()),
                             "w": pa.array([], type=pa.float64())})
        v = np.sort(v)
        if n <= k:
            return pa.table({"v": pa.array(v),
                             "w": pa.array(np.ones(n))})
        # evenly spaced order statistics at ranks (i + 0.5) * n / k
        pos = ((np.arange(k) + 0.5) * n / k).astype(np.int64)
        return pa.table({
            "v": pa.array(v[pos]),
            "w": pa.array(np.full(k, n / k, dtype=np.float64)),
        })

    pts = ds.map_batches(summarize, batch_format="pyarrow").to_pandas()
    if len(pts) == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value": pd.Series([np.nan] * len(qs)),
                             "rank_error_bound": pd.Series(
                                 [np.nan] * len(qs))})
    pts = pts.sort_values("v", kind="stable")
    w = pts["w"].to_numpy()
    v = pts["v"].to_numpy()
    cum = np.cumsum(w)
    total = cum[-1]
    out_v = []
    for q in qs:
        target = q * total
        i = int(np.searchsorted(cum, target, side="left"))
        out_v.append(v[min(i, len(v) - 1)])
    err = total / k   # blocks each contribute <= n_b/k; sum = n/k
    return pd.DataFrame({
        "q": pd.Series(list(qs), dtype="float64"),
        "value": pd.Series(out_v, dtype="float64"),
        "rank_error_bound": pd.Series([err] * len(qs), dtype="float64"),
    })


def quantile_bucket(ds, col: str, k: int,
                    keep: Sequence[str] = ("doc_id",), scale: int = 1,
                    out: str = "bucket"):
    """Equal-frequency bucketing (NTILE-style feature discretization):
    assign each row ``1 + #{edges < x}`` where the edges are the exact
    type-1 quantiles of ``floor(col * scale)`` at i/k, i = 1..k-1.

    Unlike SQL NTILE (rank-based, needs a global sort), the edge form
    needs only the value-count shrink :func:`exact_quantiles` already
    does plus one stateless digitize pass — no corpus-wide sort, and
    equal values always land in the same bucket (ties never split).
    Edges broadcast in the task closure.  Exact: values and edges are
    int64, so the bucket assignment replays in SQL bit-for-bit.
    """
    if k < 2:
        raise ValueError("quantile_bucket: k must be >= 2")

    def to_int(batch: pa.Table) -> pa.Table:
        x = np.floor(batch[col].to_numpy(zero_copy_only=False)
                     * scale).astype(np.int64)
        cols = {c: batch[c] for c in keep}
        cols["_x"] = pa.array(x, type=pa.int64())
        return pa.table(cols)

    slim = ds.map_batches(to_int, batch_format="pyarrow")
    qs = [i / k for i in range(1, k)]
    edges = np.sort(exact_quantiles(slim, "_x", qs)["value"].to_numpy()
                    .astype(np.int64))

    def digitize(batch: pa.Table) -> pa.Table:
        x = batch["_x"].to_numpy(zero_copy_only=False)
        b = 1 + np.searchsorted(edges, x, side="left")  # #{edges < x}
        batch = batch.drop_columns(["_x"])
        return batch.append_column(out, pa.array(b.astype(np.int64)))

    return slim.map_batches(digitize, batch_format="pyarrow")

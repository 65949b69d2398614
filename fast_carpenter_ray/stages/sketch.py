"""Heavy-hitter detection via a mergeable Misra-Gries sketch.

Skew is the central scaling hazard of this engine (hot cells, hot LSH
buckets, hot users): every salted/bucketed path needs to KNOW the heavy
keys.  Counting every distinct key to find them is itself a full shuffle;
a Misra-Gries summary finds them in one streaming pass with k counters
per block and no shuffle at all.

Shape (the agg.py tree pattern, sketch-shaped):

1. per-batch exact ``value_counts`` compressed to a k-counter Misra-Gries
   summary (decrement by the (k+1)-th largest count; memory bounded by k
   regardless of batch cardinality);
2. driver merge of the per-block summaries — MG summaries are mergeable
   (add counters, re-compress; Agarwal et al., "Mergeable Summaries",
   PODS 2012): any item with true frequency > n/(k+1) survives;
3. optional EXACT second pass: broadcast the surviving candidates, count
   them exactly per batch (vectorized ``isin``), sum on the driver.

With pass 3 and ``min_frac > 1/(k+1)`` the output is EXACT — every item
with count >= ceil(n*min_frac), with its exact count — which is what the
DuckDB oracle checks; the sketch only bounds the candidate set size.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["mg_compress", "mg_merge", "heavy_hitters",
           "hll_registers", "hll_estimate", "cms_registers", "cms_query"]

#: reserved item key carrying the per-batch row count through the same
#: partial pass (never a valid item: engine item ids are >= -1)
_TOTAL_KEY = np.iinfo(np.int64).min


def mg_compress(counts: Dict[int, int], k: int) -> Dict[int, int]:
    """Compress exact counts to at most ``k`` Misra-Gries counters."""
    if len(counts) <= k:
        return dict(counts)
    vals = np.sort(np.fromiter(counts.values(), dtype=np.int64))[::-1]
    dec = int(vals[k])  # (k+1)-th largest
    return {i: c - dec for i, c in counts.items() if c > dec}


def mg_merge(a: Dict[int, int], b: Dict[int, int], k: int) -> Dict[int, int]:
    """Merge two MG summaries (add counters, re-compress)."""
    out = dict(a)
    for i, c in b.items():
        out[i] = out.get(i, 0) + c
    return mg_compress(out, k)


def heavy_hitters(ds, col: str, min_frac: float, k: Optional[int] = None,
                  exact: bool = True) -> pd.DataFrame:
    """Items of integer column ``col`` with frequency >= ceil(n*min_frac),
    as a pandas DataFrame (item, n) — a driver-sized result by
    construction (at most 1/min_frac rows).

    ``k`` defaults to ``ceil(2/min_frac)`` so the MG guarantee
    (frequency > n/(k+1) survives) covers the threshold with margin.
    ``exact=False`` skips the verification pass and returns lower-bound
    counts filtered at ``thresh - total/(k+1)`` (the MG undercount
    bound): a SUPERSET of the true heavy hitters — it may include
    sub-threshold items but never misses a true one.
    """
    if not (0.0 < min_frac <= 1.0):
        raise ValueError("heavy_hitters: min_frac must be in (0, 1]")
    if k is None:
        k = int(np.ceil(2.0 / min_frac))
    if k + 1 <= 1.0 / min_frac:
        raise ValueError("heavy_hitters: k too small for min_frac "
                         "(need k+1 > 1/min_frac for the MG guarantee)")

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        items, counts = np.unique(v, return_counts=True)
        summary = mg_compress(dict(zip(items.tolist(), counts.tolist())), k)
        out_items = list(summary.keys()) + [_TOTAL_KEY]
        out_counts = list(summary.values()) + [len(v)]
        return pa.table({"item": pa.array(out_items, type=pa.int64()),
                         "n": pa.array(out_counts, type=pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    total = int(parts.loc[parts["item"] == _TOTAL_KEY, "n"].sum())
    merged: Dict[int, int] = {}
    for item, n in zip(parts["item"], parts["n"]):
        if item != _TOTAL_KEY:
            merged[int(item)] = merged.get(int(item), 0) + int(n)
    merged = mg_compress(merged, k)
    thresh = int(np.ceil(total * min_frac))

    if not exact:
        # MG estimates undercount by at most total/(k+1), so filtering at
        # the raw threshold would FALSELY EXCLUDE true heavy hitters whose
        # counter was decremented; filter at thresh - error_bound to keep
        # the promised superset (may include sub-threshold items, never
        # misses a true one)
        err = int(np.ceil(total / (k + 1))) if total else 0
        out = pd.DataFrame({"item": list(merged.keys()),
                            "n": list(merged.values())})
        return (out[out["n"] >= max(1, thresh - err)]
                .sort_values("item").reset_index(drop=True)
                .astype({"item": np.int64, "n": np.int64}))

    cand = np.array(sorted(merged.keys()), dtype=np.int64)

    def count_cand(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = v[np.isin(v, cand)]
        items, counts = np.unique(sel, return_counts=True)
        return pa.table({"item": pa.array(items, type=pa.int64()),
                         "n": pa.array(counts, type=pa.int64())})

    ex = ds.map_batches(count_cand, batch_format="pyarrow",
                        batch_size=None).to_pandas()
    ex = ex.groupby("item", sort=True)["n"].sum().reset_index()
    out = ex[ex["n"] >= thresh].sort_values("item").reset_index(drop=True)
    return out.astype({"item": np.int64, "n": np.int64})


# ----------------------------------------------------------------------
# HyperLogLog distinct-count sketch


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 values (0 -> 0): six
    masked shift passes — no float log2, so values above 2^53 can never
    round across a power of two."""
    x = x.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        x[big] >>= np.uint64(s)
    bl += (x > 0).astype(np.int64)
    return bl


def hll_registers(ds, id_col: str, p: int = 12, seed: int = 0,
                  mode: str = "tree"):
    """HyperLogLog register table for distinct ``id_col`` values
    (Flajolet et al. 2007, public literature): one row per NON-EMPTY
    bucket, ``(bucket, max_rho)``.

    ``bucket`` is the top ``p`` bits of the splitmix64-style
    :func:`~.sample.mix64` hash; ``rho`` is the leading-zero count of
    the remaining ``64-p`` bits plus one.  Registers are exact integer
    functions of the input SET (duplicates cannot change a max), so a
    SQL oracle replays them bit-for-bit — the approximation lives
    ONLY in :func:`hll_estimate`, which is a deterministic driver-side
    formula over the register table.

    Scale shape: per-batch (bucket, rho) max partials — at most 2^p
    rows per block regardless of block size — merged by one ``max``
    combine.  Registers merge associatively (elementwise max), which is
    what makes the sketch usable as a per-partition lineage metric too.
    """
    from ..agg import combine_partials
    from .sample import mix64

    if not (4 <= p <= 18):
        raise ValueError("hll_registers: p must be in [4, 18]")
    w = 64 - p

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        z = mix64(ids, seed)
        bucket = (z >> np.uint64(w)).astype(np.int64)
        rem = z & np.uint64((1 << w) - 1)
        rho = (w + 1) - _bit_length_u64(rem)
        df = pd.DataFrame({"bucket": bucket, "max_rho": rho})
        out = df.groupby("bucket", sort=False)["max_rho"].max().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return combine_partials(parts, keys=["bucket"], value_cols=["max_rho"],
                            mode=mode, agg="max")


def hll_estimate(registers: pd.DataFrame, p: int = 12) -> float:
    """Deterministic HLL cardinality estimate from a register table
    (missing buckets count as zero registers).  Standard bias-corrected
    formula with the small-range linear-counting correction; relative
    error ~1.04/sqrt(2^p)."""
    m = 1 << p
    rho = np.zeros(m, dtype=np.int64)
    b = registers["bucket"].to_numpy().astype(np.int64)
    rho[b] = registers["max_rho"].to_numpy().astype(np.int64)
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.power(2.0, -rho.astype(np.float64)))
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        return float(m * np.log(m / zeros))
    return float(est)


def cms_registers(ds, id_col: str, width: int = 512, depth: int = 3,
                  mode: str = "tree"):
    """Count-Min sketch register table (Cormode & Muthukrishnan 2005,
    public literature): ``(row, col, n)`` counter increments for
    ``depth`` independent splitmix64 hash rows of ``width`` counters.

    Registers are exact integer functions of the input MULTISET and
    sum-mergeable (the whole point of the sketch at 100 TB: per-block
    partial tables are at most depth*width rows regardless of block
    size, and partitions/runs merge by elementwise +), so a SQL oracle
    replays them bit-for-bit.  The approximation lives only in
    :func:`cms_query` — the min-over-rows point estimate, which
    overestimates by at most the usual eps*N bound.
    """
    from ..agg import combine_partials
    from .sample import mix64

    if width < 2 or depth < 1:
        raise ValueError("cms_registers: need width >= 2, depth >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        rows, cols, ns = [], [], []
        for j in range(depth):
            col = (mix64(ids, seed=j + 1) % np.uint64(width)).astype(
                np.int64)
            u, c = np.unique(col, return_counts=True)
            rows.append(np.full(len(u), j, dtype=np.int64))
            cols.append(u)
            ns.append(c.astype(np.int64))
        cat = (lambda xs: np.concatenate(xs) if xs
               else np.array([], dtype=np.int64))
        return pa.table({"row": pa.array(cat(rows)),
                         "col": pa.array(cat(cols)),
                         "n": pa.array(cat(ns))})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return combine_partials(parts, keys=["row", "col"], value_cols=["n"],
                            mode=mode)


def cms_query(registers: pd.DataFrame, ids: np.ndarray,
              width: int = 512, depth: int = 3) -> np.ndarray:
    """Point frequency estimates for ``ids`` from a register table:
    min over rows of the addressed counter (missing counters are 0).
    Never underestimates the true count."""
    from .sample import mix64

    table = np.zeros((depth, width), dtype=np.int64)
    r = registers["row"].to_numpy().astype(np.int64)
    c = registers["col"].to_numpy().astype(np.int64)
    table[r, c] = registers["n"].to_numpy().astype(np.int64)
    ids = np.asarray(ids, dtype=np.int64)
    est = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(depth):
        col = (mix64(ids, seed=j + 1) % np.uint64(width)).astype(np.int64)
        est = np.minimum(est, table[j, col])
    return est

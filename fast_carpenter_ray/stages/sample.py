"""Deterministic sampling + per-group top-k.

Neither exists in the reference (SURVEY.md §2.5: "no sorts, no top-k, no
sampling"); both are staples of a 100-TB training-data pipeline (corpus
subsetting for eval/dev splits; "best k documents per language/domain"
curation).

* :func:`hash_sample` — DETERMINISTIC row sampling keyed on an id column:
  keep rows where ``mix64(id, seed) % M < fraction*M``.  Pure per-batch
  filter — no shuffle, no RNG state, resumable (the same row always makes
  the same decision, so a re-run or a resumed checkpoint samples
  identically).  ``mix64`` is a splitmix64-style avalanche hash (add a
  seed-dependent golden-ratio offset, two xor-shift + odd-multiply
  rounds, one final xor-shift) whose multiply constants are <= 40 bits so
  a SQL engine replays every step exactly with HUGEINT mod-2^64
  arithmetic — unlike the earlier affine ``(id*A + B) % M`` map, ids
  structured mod M (e.g. microsecond timestamps on second boundaries) no
  longer collapse onto one hash value, and different seeds give genuinely
  independent (not shifted) samples.

* :func:`group_topk` — top ``k`` rows per group by a sort column.  Shape:
  per-batch partial top-k (each block contributes at most ``k`` rows per
  group it contains — the shuffle then moves O(groups x k x blocks) rows,
  independent of total row count), then one ``groupby(group)`` shuffle and
  a per-group vectorized final top-k.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["hash_sample", "stratified_sample", "group_topk", "count_distinct",
           "weighted_sample", "train_order", "mixture_sample",
           "mix64", "mix64_sql", "mix_hash", "mix_hash_sql", "group_split"]

_M = 1_000_000
_M64 = 1 << 64
_GAMMA = 0x9E3779B97F4A7C15   # golden-ratio gamma (splitmix64 increment)
_C1 = 0x5851F42D              # 31-bit odd multiplier (PCG LCG low word)
_C2 = 0x14057B7EF7            # 37-bit odd multiplier (PCG LCG 40-bit slice)
# the multiply constants are deliberately <= 40 bits: z * C stays under
# 2^104 < HUGEINT max, so DuckDB replays the mod-2^64 multiplies exactly
# (splitmix64's native 63-bit constants would overflow HUGEINT)


def mix64(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Full-width splitmix64-style avalanche hash of int64 ids (uint64
    out), bit-identical to :func:`mix64_sql`'s DuckDB expression.
    ``seed`` selects the sequence position — different seeds give
    independent streams, not shifted copies."""
    s = np.uint64(((seed + 1) * _GAMMA) % _M64)
    z = ids.astype(np.int64).view(np.uint64) + s
    z ^= z >> np.uint64(30)
    z *= np.uint64(_C1)
    z ^= z >> np.uint64(27)
    z *= np.uint64(_C2)
    z ^= z >> np.uint64(31)
    return z


def mix64_sql(id_col: str, seed: int = 0) -> str:
    """DuckDB UBIGINT expression reproducing :func:`mix64` bit-for-bit:
    UBIGINT xor/shift + HUGEINT mod-2^64 multiplies."""
    s = ((seed + 1) * _GAMMA) % _M64
    z0 = (f"CAST((CAST({id_col} AS HUGEINT) + {s}) % {_M64} AS UBIGINT)")
    z1 = f"xor({z0}, {z0} >> 30)"
    z2 = f"CAST((CAST({z1} AS HUGEINT) * {_C1}) % {_M64} AS UBIGINT)"
    z3 = f"xor({z2}, {z2} >> 27)"
    z4 = f"CAST((CAST({z3} AS HUGEINT) * {_C2}) % {_M64} AS UBIGINT)"
    return f"xor({z4}, {z4} >> 31)"


def mix_hash(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """:func:`mix64` reduced into [0, 1e6) — the sampling decision hash,
    bit-identical to :func:`mix_hash_sql` (cross-checked in tests)."""
    return (mix64(ids, seed) % np.uint64(_M)).astype(np.int64)


def mix_hash_sql(id_col: str, seed: int = 0) -> str:
    """DuckDB expression reproducing :func:`mix_hash` bit-for-bit."""
    return f"CAST({mix64_sql(id_col, seed)} % {_M} AS BIGINT)"


def hash_sample(ds, id_col: str, fraction: float, seed: int = 0):
    """Keep a deterministic ``fraction`` of rows keyed on int ``id_col``.

    ``seed`` selects an independent sample (distinct splitmix64 stream
    position).  Fraction resolution is 1/1e6.
    """
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("hash_sample: fraction must be in [0, 1]")
    thresh = int(round(fraction * _M))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(mix_hash(ids, seed) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_sql(id_col: str, fraction: float, seed: int = 0) -> str:
    """The WHERE predicate reproducing :func:`hash_sample` in DuckDB."""
    thresh = int(round(fraction * _M))
    return f"{mix_hash_sql(id_col, seed)} < {thresh}"


def group_topk(ds, group: str, order_by: str, k: int,
               tie_break: Optional[str] = None, descending: bool = True,
               cols: Optional[Sequence[str]] = None):
    """Top ``k`` rows per ``group`` ordered by ``order_by`` (ties broken
    by ``tie_break`` descending-consistently, so the result is unique when
    (order_by, tie_break) is unique per group).

    Two-phase: per-batch partial top-k (bounds shuffle volume to
    O(groups-per-block x k)), then one hash shuffle + per-group final
    top-k.
    """
    sort_cols: List[str] = [order_by] + ([tie_break] if tie_break else [])
    asc = [not descending] * len(sort_cols)
    if cols:
        keep = list(dict.fromkeys([group, *sort_cols, *cols]))
        ds = ds.select_columns(keep)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (batch.sort_values(sort_cols, ascending=asc, kind="stable")
                .groupby(group, sort=False).head(k))

    parts = ds.map_batches(partial, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(sort_cols, ascending=asc, kind="stable").head(k)
        out = out.copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    from ..agg import default_partitions

    return parts.groupby(group, num_partitions=default_partitions()).map_groups(
        final, batch_format="pandas")


def stratified_sample(ds, id_col: str, group_col: str,
                      fractions: dict, default: float = 0.0, seed: int = 0):
    """Deterministic per-group sampling: group ``g`` keeps
    ``fractions.get(g, default)`` of its rows, by the same id-hash
    predicate as :func:`hash_sample` (partition/resume-invariant; groups
    not listed fall back to ``default``).  Pure per-batch filter — the
    standard rebalancing move for skewed corpora (downsample the dominant
    language/domain without a shuffle)."""
    for g, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(f"stratified_sample: fraction for {g!r} not in [0, 1]")
    if not (0.0 <= default <= 1.0):
        raise ValueError("stratified_sample: default not in [0, 1]")
    thresh = {g: int(round(f * _M)) for g, f in fractions.items()}
    dthresh = int(round(default * _M))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = mix_hash(ids, seed)
        groups = batch[group_col].to_pandas()
        t = groups.map(thresh).fillna(dthresh).to_numpy(dtype=np.int64)
        return batch.filter(pa.array(h < t))

    return ds.map_batches(keep, batch_format="pyarrow")


def count_distinct(ds, group: str, value: str):
    """Exact distinct-value counts per group (``COUNT(DISTINCT value)``):
    per-batch pair dedup shrinks the shuffle to distinct (group, value)
    pairs per block, ONE hash shuffle dedups globally, and a per-group
    count reduces in the same shuffle's output — never a row-level
    shuffle of the raw stream."""
    import pandas as pd

    from ..agg import default_partitions

    def pair_dedup(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[[group, value]].drop_duplicates()

    pairs = ds.map_batches(pair_dedup, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            group: [g[group].iloc[0]],
            "n_distinct": np.array([g[value].nunique()], dtype=np.int64),
        })

    return pairs.groupby(group, num_partitions=default_partitions()).map_groups(
        final, batch_format="pandas")


def weighted_sample(ds, id_col: str, weight_col: str, rate: float,
                    weight_scale: int = 1024, seed: int = 0):
    """Deterministic weighted Bernoulli sampling: keep each row with
    probability ``min(1, rate * weight)`` — the importance-sampling
    primitive (upweight rare/high-quality docs in a curation pipeline).

    Same exact-integer hash-uniform as :func:`hash_sample`: the row's
    uniform draw is ``h(id) / 1e6`` and the keep test is
    ``h < rate * weight * 1e6``, computed entirely in int64 via
    ``weight_q = round(weight * weight_scale)`` (fixture weights are
    dyadic k/1024, so ``weight_q`` is EXACT at the default scale and the
    SQL oracle reproduces the predicate bit-for-bit).  Deterministic on
    any partitioning / resume.
    """
    if rate < 0:
        raise ValueError("weighted_sample: rate must be >= 0")
    # thresh(w) = round(rate * 1e6) * weight_q // weight_scale, capped at 1e6
    r_q = int(round(rate * _M))
    ws = int(weight_scale)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        wq = np.round(w * ws).astype(np.int64)
        thresh = np.minimum(r_q * wq // ws, _M)
        return batch.filter(pa.array(mix_hash(ids, seed) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample_sql(id_col: str, weight_col: str, rate: float,
                        weight_scale: int = 1024, seed: int = 0) -> str:
    """The WHERE predicate reproducing :func:`weighted_sample`."""
    r_q = int(round(rate * _M))
    return (f"{mix_hash_sql(id_col, seed)} < "
            f"least({r_q} * CAST(round({weight_col} * {weight_scale}) "
            f"AS BIGINT) // {weight_scale}, {_M})")


def train_order(ds, id_col: str = "doc_id", seed: int = 0):
    """Deterministic global training-order shuffle: every row gets
    ``shuffle_key = mix_hash(id, seed)`` and the dataset is sorted by
    ``(shuffle_key, id)`` — a reproducible, seed-selectable permutation
    of the corpus (the "shuffle the training data" step, but replayable
    on resume and identical on any partitioning, unlike
    ``random_shuffle``).

    Scale note: the sort is the one genuinely global AllToAll this op
    needs — that IS the shuffle.  mix_hash is uniform, so range
    partitioning of the key space is balanced by construction (no skew,
    no salting needed), and downstream ``write_parquet`` emits the
    permuted corpus as ordered shards a trainer can stream.
    """

    def key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "shuffle_key", pa.array(mix_hash(ids, seed), type=pa.int64()))

    return ds.map_batches(key, batch_format="pyarrow").sort(
        ["shuffle_key", id_col])


def mixture_sample(ds, group_col: str, cap: int, id_col: str,
                   seed: int = 0, max_groups: int = 1_000_000):
    """Domain rebalancing: cap every ``group_col`` group at ~``cap``
    rows by keeping each row with the deterministic per-group rate
    ``min(1, cap / n_group)`` — the "downweight over-represented
    domains to a target mixture" curation step.

    Two phases, no data shuffle: (1) exact group counts — the only
    shuffle, over (group, 1) pairs with per-batch pre-aggregation, its
    result bounded by the number of distinct groups (budget-guarded by
    ``max_groups``); (2) thresholds broadcast into a per-batch filter —
    at 100 TB the corpus streams through once and never moves.

    Exact-integer predicate (SQL-replayable, see
    :func:`mixture_sample_sql`): keep iff
    ``mix_hash(id, seed) < min(1e6, cap * 1e6 // n_group)``.
    """
    from ray.data.aggregate import Count

    from ..agg import default_partitions

    counts = ds.groupby(group_col, num_partitions=default_partitions()) \
        .aggregate(Count(alias_name="n")).materialize()
    n_groups = counts.count()
    if n_groups > max_groups:
        raise ValueError(
            f"mixture_sample: {n_groups} distinct groups exceeds the "
            f"{max_groups} driver budget — group on a coarser key")
    cdf = counts.to_pandas()  # bounded: guarded above
    thr = {g: min(_M, (int(cap) * _M) // int(n))
           for g, n in zip(cdf[group_col], cdf["n"])}

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy().astype(np.int64)
        t = batch[group_col].map(thr).fillna(0).to_numpy().astype(np.int64)
        return batch[mix_hash(ids, seed) < t]

    return ds.map_batches(keep, batch_format="pandas")


def mixture_sample_sql(table: str, group_col: str, cap: int, id_col: str,
                       seed: int = 0) -> str:
    """Full SELECT reproducing :func:`mixture_sample` in DuckDB."""
    return (
        f"WITH n AS (SELECT {group_col}, count(*) AS n FROM {table} "
        f"GROUP BY {group_col}) "
        f"SELECT t.* FROM {table} t JOIN n USING ({group_col}) "
        f"WHERE {mix_hash_sql('t.' + id_col, seed)} < "
        f"least({_M}, {int(cap)} * {_M} // n.n)")


def group_split(ds, group_col: str, fractions=None, seed: int = 0,
                out: str = "split"):
    """Leakage-safe train/val/test assignment by GROUP: every row of a
    group (e.g. a URL domain) lands in the same split, so near-duplicate
    pages from one site can never straddle the train/eval boundary —
    the GroupShuffleSplit discipline of ML evaluation hygiene.

    Deterministic + SQL-replayable: the group key is hashed with the
    sha256-prefix stable hash (the MinHash oracle contract —
    ``('0x' || substring(sha256(g || '#' || seed), 1, 16))::UBIGINT``)
    and reduced mod 1e6; cumulative integer thresholds of ``fractions``
    pick the split.  Pure per-batch map, sha256 evaluated once per
    DISTINCT group per batch; no shuffle.

    Appends ``bucket`` (int64) and ``out`` (string) columns.
    """
    from .dedup import _stable_token_hash

    fractions = dict(fractions or
                     {"train": 0.8, "val": 0.1, "test": 0.1})
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("group_split: fractions must sum to 1")
    names = list(fractions)
    edges = np.cumsum([int(round(f * 1_000_000))
                       for f in fractions.values()])[:-1]

    def assign(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_pandas().to_numpy(dtype=object)
        uniq, inv = np.unique(g, return_inverse=True)
        hb = np.array([_stable_token_hash(f"{u}#{seed}") % 1_000_000
                       for u in uniq], dtype=np.int64)
        bucket = hb[inv]
        split_idx = np.searchsorted(edges, bucket, side="right")
        split = np.array(names, dtype=object)[split_idx]
        return (batch
                .append_column("bucket", pa.array(bucket, type=pa.int64()))
                .append_column(out, pa.array(split, type=pa.string())))

    return ds.map_batches(assign, batch_format="pyarrow")

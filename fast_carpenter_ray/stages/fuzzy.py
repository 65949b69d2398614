"""Typo-tolerant fuzzy value join: pairs of strings at edit distance
<= 1, via deletion-neighborhood blocking.

The record-linkage primitive.  All-pairs edit distance is quadratic;
the deletion-neighborhood trick (FastSS, Bocek et al. 2007 — public
literature) makes the d=1 case an EXACT equi-join problem:

    lev(a, b) <= 1  ==>  D(a) ∩ D(b) != ∅,
    where D(s) = {s} ∪ {s with one character deleted}

(equality shares s itself; a deletion/insertion shares the shorter
string; a substitution at i shares both-minus-position-i).  The
converse does NOT hold (sharing a deletion variant allows lev = 2,
e.g. "ab"/"ba"), so candidates are verified by an exact <=1 check.

Scale shape: each side shrinks per batch to its DISTINCT values, each
value emits ``len+1`` 64-bit variant hashes; ONE variant-keyed
co-location (bounded pair-hash buckets) produces candidates, the
shared ``dedup_pair_stream`` collapses cross-variant duplicates
without ever keying a shuffle on the raw pair, and a final vectorized
verify pass keeps true matches.  Nothing quadratic anywhere; strings
cross the wire only as (hash, value) variant rows.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["fuzzy_pairs_d1", "lev_le1"]


def lev_le1(a: str, b: str) -> bool:
    """Exact ``levenshtein(a, b) <= 1`` in O(len) (no DP matrix)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a plus one inserted char: skip the first mismatch
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _variants(name: str) -> list:
    return [name] + [name[:i] + name[i + 1:] for i in range(len(name))]


def fuzzy_pairs_d1(left, right, col: str = "name",
                   num_partitions: Optional[int] = None,
                   max_len: int = 256):
    """Dataset of ``(name_a, name_b, dist)`` — every pair of a DISTINCT
    left value and a DISTINCT right value with edit distance <= 1
    (``dist`` 0 or 1; both orientations appear once, as (left, right)).
    Values longer than ``max_len`` are rejected (their neighborhoods
    would dominate the row budget — chunk such payloads upstream)."""
    from .dedup import _stable_token_hash, dedup_pair_stream

    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)
    n_buckets = max(64, int(num_partitions) * 8)

    def rows(side_flag: int):
        def fn(batch: pa.Table) -> pa.Table:
            names = pd.unique(batch[col].to_pandas().dropna())
            out_h, out_n = [], []
            for nm in names:
                if len(nm) > max_len:
                    raise ValueError(
                        f"fuzzy_pairs_d1: value longer than {max_len} "
                        "chars — chunk upstream")
                vs = _variants(nm)
                out_h.extend(_stable_token_hash(v) % (1 << 62)
                             for v in vs)
                out_n.extend([nm] * len(vs))
            return pa.table({
                "vhash": pa.array(np.array(out_h, dtype=np.int64)),
                "nm": pa.array(out_n, type=pa.string()),
                "side": pa.array(
                    np.full(len(out_h), side_flag, dtype=np.int8)),
            })
        return fn

    both = left.map_batches(rows(0), batch_format="pyarrow").union(
        right.map_batches(rows(1), batch_format="pyarrow"))

    def add_bucket(b: pa.Table) -> pa.Table:
        h = b["vhash"].to_numpy(zero_copy_only=False) % n_buckets
        return b.append_column("_bkt", pa.array(h, type=pa.int64()))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        la = g[g["side"] == 0].drop_duplicates(["vhash", "nm"])
        rb = g[g["side"] == 1].drop_duplicates(["vhash", "nm"])
        m = la.merge(rb, on="vhash", suffixes=("_a", "_b"))
        m = m.drop_duplicates(["nm_a", "nm_b"])
        if len(m) == 0:
            return pd.DataFrame({
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "name_a": pd.Series([], dtype="object"),
                "name_b": pd.Series([], dtype="object"),
            })
        ha = np.array([_stable_token_hash(x) % (1 << 62)
                       for x in m["nm_a"]], dtype=np.int64)
        hb = np.array([_stable_token_hash(x) % (1 << 62)
                       for x in m["nm_b"]], dtype=np.int64)
        return pd.DataFrame({"id_a": ha, "id_b": hb,
                             "name_a": m["nm_a"].to_numpy(),
                             "name_b": m["nm_b"].to_numpy()})

    cand = both.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "_bkt", num_partitions=num_partitions).map_groups(
        bucket_pairs, batch_format="pandas")
    pairs = dedup_pair_stream(cand, num_partitions,
                              keep_cols=("id_a", "id_b",
                                         "name_a", "name_b"))

    def verify(batch: pa.Table) -> pa.Table:
        na = batch["name_a"].to_pylist()
        nb = batch["name_b"].to_pylist()
        keep = np.fromiter((lev_le1(a, b) for a, b in zip(na, nb)),
                           dtype=bool, count=len(na))
        t = batch.filter(pa.array(keep))
        dist = np.fromiter(
            (0 if a == b else 1
             for a, b in zip(t["name_a"].to_pylist(),
                             t["name_b"].to_pylist())),
            dtype=np.int64, count=len(t))
        return pa.table({
            "name_a": t["name_a"],
            "name_b": t["name_b"],
            "dist": pa.array(dist, type=pa.int64()),
        })

    return pairs.map_batches(verify, batch_format="pyarrow")

"""Relational joins, Ray-Data-first.

The reference has no joins (SURVEY.md §2.5); these are the two join shapes
a distributed engine needs:

* :func:`lookup_join` — small side broadcast: the dimension table is
  shipped once into the probe closure (or ``ray.put`` for actor pools);
  every probe batch does a vectorized pandas merge.  No shuffle; the probe
  side streams.  Use for dimension tables, vocabularies, blocklists.

* :func:`hash_join` — both sides large: Ray Data's native hash-partitioned
  ``Dataset.join`` (available in this Ray version), with ``num_partitions``
  bounding reducer memory (rows of one key always land in one partition).
  For skewed keys, pre-salt the hot keys into sub-keys upstream and merge
  after (same rationale as ZonalAggregate's salt splitting).
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa

__all__ = ["lookup_join", "hash_join"]


def lookup_join(ds, small: pa.Table, key: str, how: str = "inner",
                suffix: str = "_r"):
    """Broadcast join of a streaming Dataset against a small Arrow table.

    Arrow-native: each probe batch stays ``pyarrow`` (zero-copy from the
    object store) and joins through Arrow's vectorized hash-join kernel —
    no per-batch pandas conversion.  The small side ships once in the task
    closure (it is a dimension table by contract)."""
    small = small.combine_chunks()
    arrow_how = {"inner": "inner", "left": "left outer",
                 "semi": "left semi", "anti": "left anti"}[how]

    def probe(batch: pa.Table) -> pa.Table:
        return batch.join(small, keys=[key], join_type=arrow_how,
                          right_suffix=suffix)

    return ds.map_batches(probe, batch_format="pyarrow")


def hash_join(left, right, key: str, num_partitions: int = 32,
              how: str = "inner",
              left_cols: Optional[Sequence[str]] = None,
              right_cols: Optional[Sequence[str]] = None,
              suffix: str = "_r"):
    """Partitioned hash join of two Datasets on ``key`` (large x large).

    Projects both sides first (shuffle only what the join needs), then
    ``Dataset.join`` hash-partitions on the key.
    """
    if left_cols:
        left = left.select_columns(list(dict.fromkeys([key, *left_cols])))
    if right_cols:
        right = right.select_columns(list(dict.fromkeys([key, *right_cols])))
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=(key,),
        right_suffix=suffix,
    )

"""Z-order (Morton) locality keys — the layout half of the tiling
story.

A 100-TB spatial corpus is only prunable if rows that are CLOSE on the
globe are close in the FILE layout.  ``zorder_key`` appends the Morton
interleave of two grid coordinates (bit ``b`` of ``x`` -> bit ``2b``,
bit ``b`` of ``y`` -> bit ``2b+1``), a space-filling curve under which
any axis-aligned box decomposes into a few contiguous key ranges; a
``ds.sort(zkey)`` + sharded ``write_parquet`` then yields files whose
zkey min/max footers are non-overlapping, so a range query prunes
fragments at the READ (the same footer-stats mechanism the IVF layout
in ``stages/ann.py`` uses — tested the same way).

The interleave is pure int64 bit arithmetic (``bits <= 31`` per axis),
vectorized with numpy shift/mask ops, and replayed bit-for-bit by a
generated SQL power-of-two expansion (:func:`zorder_sql`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["zorder_key", "morton", "zorder_sql"]


def morton(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized Morton interleave of two uint arrays (< 2^bits)."""
    x = x.astype(np.uint64)
    y = y.astype(np.uint64)
    z = np.zeros(len(x), dtype=np.uint64)
    for b in range(bits):
        z |= ((x >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b)
        z |= ((y >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b + 1)
    return z.astype(np.int64)


def zorder_key(ds, x: str = "x", y: str = "y", bits: int = 10,
               out: str = "zkey"):
    """Append int64 Morton key ``out`` interleaving ``x`` and ``y``
    (both must be in ``[0, 2^bits)``; ``bits <= 31``).  Pure per-batch
    map — no shuffle; the caller chooses when to ``sort(out)`` for
    layout."""
    if not (1 <= bits <= 31):
        raise ValueError("zorder_key: bits must be in [1, 31]")
    lim = 1 << bits

    def add(batch: pa.Table) -> pa.Table:
        xs = batch[x].to_numpy(zero_copy_only=False).astype(np.int64)
        ys = batch[y].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(xs) and (xs.min() < 0 or xs.max() >= lim
                        or ys.min() < 0 or ys.max() >= lim):
            raise ValueError(
                f"zorder_key: coordinates must be in [0, {lim})")
        return batch.append_column(out, pa.array(morton(xs, ys, bits)))

    return ds.map_batches(add, batch_format="pyarrow")


def zorder_sql(x: str, y: str, bits: int) -> str:
    """DuckDB BIGINT expression reproducing :func:`morton` bit-for-bit
    via a power-of-two expansion (no bit intrinsics needed)."""
    terms = []
    for b in range(bits):
        terms.append(f"(({x} // {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"(({y} // {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"

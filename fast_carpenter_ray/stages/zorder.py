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

__all__ = ["zorder_key", "morton", "zorder_sql", "hilbert_key", "hilbert_d", "hilbert_sql"]


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


def hilbert_d(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized Hilbert curve index of grid points (< 2^bits per axis).

    The classic xy2d bit walk (public domain, e.g. the Wikipedia
    formulation), restated so (x, y) reduce into [0, s) after every
    level — all intermediates stay nonnegative, which is what lets
    :func:`hilbert_sql` replay it with plain ``//``/``%``/CASE
    arithmetic (no two's-complement bit tricks)."""
    x = np.asarray(x).astype(np.int64)
    y = np.asarray(y).astype(np.int64)
    d = np.zeros(len(x), dtype=np.int64)
    for i in range(bits - 1, -1, -1):
        s = np.int64(1) << np.int64(i)
        rx = (x >= s).astype(np.int64)
        ry = (y >= s).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        xl = x - rx * s
        yl = y - ry * s
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, s - 1 - xl, xl)
        yf = np.where(flip, s - 1 - yl, yl)
        swap = ry == 0
        x = np.where(swap, yf, xf)
        y = np.where(swap, xf, yf)
    return d


def hilbert_key(ds, x: str = "x", y: str = "y", bits: int = 10,
                out: str = "hkey"):
    """Append the int64 Hilbert index ``out`` of ``(x, y)`` (both in
    ``[0, 2^bits)``; ``bits <= 31``).  Pure per-batch map, no shuffle —
    the locality-layout companion to :func:`zorder_key`: Hilbert keys
    have strictly better box-locality (no Z-curve diagonal jumps), same
    sort + sharded-write + footer-prune mechanism."""
    if not (1 <= bits <= 31):
        raise ValueError("hilbert_key: bits must be in [1, 31]")
    lim = 1 << bits

    def add(batch: pa.Table) -> pa.Table:
        xs = batch[x].to_numpy(zero_copy_only=False).astype(np.int64)
        ys = batch[y].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(xs) and (xs.min() < 0 or xs.max() >= lim
                        or ys.min() < 0 or ys.max() >= lim):
            raise ValueError(
                f"hilbert_key: coordinates must be in [0, {lim})")
        return batch.append_column(out, pa.array(hilbert_d(xs, ys, bits)))

    return ds.map_batches(add, batch_format="pyarrow")


def hilbert_sql(src: str, keys: str, x: str, y: str, bits: int,
                out: str = "hkey") -> str:
    """Chain of CTEs replaying :func:`hilbert_d` bit-for-bit in DuckDB:
    one CTE per level, each reducing (hx, hy) into [0, s) and
    accumulating the quadrant term — pure CASE + integer arithmetic.
    ``src`` is the producing CTE/table, ``keys`` the passthrough column
    list.  Returns ``"w0 AS (...), ... SELECT ... FROM h0"`` to splice
    after a WITH."""
    parts = [f"h{bits} AS (SELECT {keys}, CAST({x} AS BIGINT) AS hx, "
             f"CAST({y} AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd "
             f"FROM {src})"]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        parts.append(
            f"r{i} AS (SELECT {keys}, hx, hy, hd, "
            f"CASE WHEN hx >= {s} THEN 1 ELSE 0 END AS rx, "
            f"CASE WHEN hy >= {s} THEN 1 ELSE 0 END AS ry FROM h{i + 1})")
        parts.append(
            f"h{i} AS (SELECT {keys}, "
            f"CASE WHEN ry = 1 THEN hx - rx * {s} "
            f"WHEN rx = 0 THEN hy ELSE {s - 1} - hy END AS hx, "
            f"CASE WHEN ry = 1 THEN hy - {s} "
            f"WHEN rx = 0 THEN hx - rx * {s} "
            f"ELSE {s - 1} - (hx - rx * {s}) END AS hy, "
            f"hd + {s * s} * (CASE WHEN rx = 0 AND ry = 0 THEN 0 "
            f"WHEN rx = 0 THEN 1 WHEN ry = 0 THEN 3 ELSE 2 END) AS hd "
            f"FROM r{i})")
    return (", ".join(parts)
            + f" SELECT {keys}, hd AS {out} FROM h0")

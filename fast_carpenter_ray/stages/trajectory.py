"""Per-entity trajectory statistics over an ordered point stream.

The geospatial analytics leg the reference's per-event stages cannot
express (``fast_carpenter/define/variables.py`` is stateless per row):
fold each entity's time-ordered positions into path statistics —
segment-length sum, net displacement, visited bounding box, point count.

Shape (flat): slim per-batch projection, ONE hash shuffle
(``groupby(key)``), per-group vectorized sort + ``np.diff`` folds — no
Python row loop.  Partitioning assumption: one entity's points fit in a
group task; :func:`trajectory_stats_bucketed` removes it via time-bucket
groups whose per-bucket partials (first/last point + partial sums — a
handful of scalars per bucket) merge in a second, summary-sized shuffle.

Exactness: ``path_d2`` is the sum of SQUARED segment lengths
``dx*dx + dy*dy``.  With integer (or exactly-representable) coordinates
every product and sum is exact in int64, making the fold associative —
bucketed == flat bit-for-bit and both == a SQL window oracle.  (Squared
lengths, not Euclidean: sqrt sums are neither associative nor bit-stable
across NumPy/DuckDB — see BASELINE.md FP-parity notes.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["trajectory_stats", "trajectory_stats_bucketed", "radius_of_gyration",
           "impossible_travel"]

_OUT_COLS = ["n_points", "path_d2", "net_dx", "net_dy",
             "min_x", "max_x", "min_y", "max_y"]


def _slim(ds, key, ts, x, y, id_col, extra=None):
    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        cols = {key: batch[key], "_t": t, "_id": batch[id_col],
                "_x": batch[x].cast(pa.int64()),
                "_y": batch[y].cast(pa.int64())}
        if extra:
            tv = t.to_numpy(zero_copy_only=False).astype(np.int64)
            cols[extra[0]] = pa.array(tv // extra[1])
        return pa.table(cols)

    return ds.map_batches(slim, batch_format="pyarrow")


def _fold(g: pd.DataFrame, key):
    """Per-group ordered fold -> one stats row (columns above)."""
    s = g.sort_values(["_t", "_id"], kind="stable")
    xv = s["_x"].to_numpy().astype(np.int64)
    yv = s["_y"].to_numpy().astype(np.int64)
    dx = np.diff(xv)
    dy = np.diff(yv)
    return pd.DataFrame({
        key: [s[key].iloc[0]],
        "n_points": np.array([len(s)], dtype=np.int64),
        "path_d2": np.array([int((dx * dx + dy * dy).sum())], dtype=np.int64),
        "net_dx": np.array([xv[-1] - xv[0]], dtype=np.int64),
        "net_dy": np.array([yv[-1] - yv[0]], dtype=np.int64),
        "min_x": np.array([xv.min()], dtype=np.int64),
        "max_x": np.array([xv.max()], dtype=np.int64),
        "min_y": np.array([yv.min()], dtype=np.int64),
        "max_y": np.array([yv.max()], dtype=np.int64),
    })


def trajectory_stats(ds, key: str = "user_id", ts: str = "ts",
                     x: str = "x", y: str = "y", id_col: str = "event_id"):
    """Per-entity path statistics; see module docstring.

    Returns one row per entity:
    ``(key, n_points, path_d2, net_dx, net_dy, min_x, max_x, min_y, max_y)``.
    """
    from ..agg import default_partitions

    return (_slim(ds, key, ts, x, y, id_col)
            .groupby(key, num_partitions=default_partitions())
            .map_groups(lambda g: _fold(g, key), batch_format="pandas"))


def trajectory_stats_bucketed(ds, key: str = "user_id", ts: str = "ts",
                              x: str = "x", y: str = "y",
                              id_col: str = "event_id",
                              bucket_width: int = 86_400_000_000):
    """Hot-key-safe :func:`trajectory_stats`: group tasks keyed on
    ``(key, ts // bucket_width)`` fold each bucket locally and emit a
    PARTIAL row (stats + the bucket's first/last point); one second
    shuffle per key (span/width rows, independent of point count) merges
    partials in bucket order, adding the boundary segment between each
    bucket's last point and the next bucket's first.  Integer arithmetic
    throughout — bit-identical to the flat operator (pytest pins it).
    """
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("trajectory_stats_bucketed: bucket_width must be > 0")
    _B = "__tj_bucket"

    def local(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(["_t", "_id"], kind="stable")
        out = _fold(s, key)
        out[_B] = np.array([s[_B].iloc[0]], dtype=np.int64)
        out["_fx"] = np.array([s["_x"].iloc[0]], dtype=np.int64)
        out["_fy"] = np.array([s["_y"].iloc[0]], dtype=np.int64)
        out["_lx"] = np.array([s["_x"].iloc[-1]], dtype=np.int64)
        out["_ly"] = np.array([s["_y"].iloc[-1]], dtype=np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        s = g.sort_values(_B, kind="stable")
        # boundary segments: previous bucket's last -> this bucket's first
        bdx = s["_fx"].to_numpy()[1:] - s["_lx"].to_numpy()[:-1]
        bdy = s["_fy"].to_numpy()[1:] - s["_ly"].to_numpy()[:-1]
        return pd.DataFrame({
            key: [s[key].iloc[0]],
            "n_points": np.array([s["n_points"].sum()], dtype=np.int64),
            "path_d2": np.array(
                [int(s["path_d2"].sum() + (bdx * bdx + bdy * bdy).sum())],
                dtype=np.int64),
            "net_dx": np.array([s["_lx"].iloc[-1] - s["_fx"].iloc[0]],
                               dtype=np.int64),
            "net_dy": np.array([s["_ly"].iloc[-1] - s["_fy"].iloc[0]],
                               dtype=np.int64),
            "min_x": np.array([s["min_x"].min()], dtype=np.int64),
            "max_x": np.array([s["max_x"].max()], dtype=np.int64),
            "min_y": np.array([s["min_y"].min()], dtype=np.int64),
            "max_y": np.array([s["max_y"].max()], dtype=np.int64),
        })

    from ..agg import default_partitions

    np_ = default_partitions()
    partial = (_slim(ds, key, ts, x, y, id_col, extra=(_B, w))
               .groupby([key, _B], num_partitions=np_)
               .map_groups(local, batch_format="pandas"))
    return partial.groupby(key, num_partitions=np_).map_groups(
        merge, batch_format="pandas")


def radius_of_gyration(ds, key: str = "user_id", x: str = "x",
                       y: str = "y", mode: str = "hash",
                       num_partitions=None):
    """Per-entity radius of gyration — the classic human-mobility
    statistic (Gonzalez et al. 2008, public literature): RMS distance
    of an entity's points from their centroid.

    Exact-integer formulation: with integer coordinates, ``n`` points,
    ``Sx = Σx``, ``Sy = Σy``, ``Qx = Σx²``, ``Qy = Σy²``,

        rog² = (n·(Qx+Qy) − Sx² − Sy²) / n²

    — the numerator is an exact int64 and ``rog`` is
    ``sqrt(num) / n`` (two fixed float ops), so a SQL oracle matches
    bit-for-bit.  Scale shape: five int moment partials per
    (batch, key) -> ONE key combine; points never shuffle whole.
    Envelope: ``n_per_key * max_coord²`` must stay well under 2^62
    (grid coordinates by design — a 2^10 grid allows ~2^40 points per
    entity before the moments could overflow).
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "k": batch[key].to_numpy(zero_copy_only=False),
            "x": batch[x].to_numpy(zero_copy_only=False).astype(np.int64),
            "y": batch[y].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        df["qx"] = df["x"] * df["x"]
        df["qy"] = df["y"] * df["y"]
        out = df.groupby("k", sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            qx=("qx", "sum"), qy=("qy", "sum")).reset_index()
        out = out.rename(columns={"k": key})
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    kwargs = {} if num_partitions is None else {
        "num_partitions": num_partitions}
    stats = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[key], value_cols=["n", "sx", "sy", "qx", "qy"],
        mode=mode, **kwargs)

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False)
        sx = batch["sx"].to_numpy(zero_copy_only=False)
        sy = batch["sy"].to_numpy(zero_copy_only=False)
        qx = batch["qx"].to_numpy(zero_copy_only=False)
        qy = batch["qy"].to_numpy(zero_copy_only=False)
        num = n * (qx + qy) - sx * sx - sy * sy
        rog = np.sqrt(num.astype(np.float64)) / n.astype(np.float64)
        return pa.table({
            key: batch[key],
            "n": pa.array(n, type=pa.int64()),
            "rog2_num": pa.array(num, type=pa.int64()),
            "rog": pa.array(rog, type=pa.float64()),
        })

    return stats.map_batches(finish, batch_format="pyarrow")


def impossible_travel(ds, key: str = "user_id", ts: str = "ts",
                      x: str = "x", y: str = "y", id_col: str = "event_id",
                      v_num: int = 5, t_den: int = 1):
    """Impossible-travel (teleport) detection: consecutive observations
    of the same entity whose implied speed exceeds ``v_num / t_den``
    distance-units per second — the account-compromise / GPS-glitch
    staple of security analytics.

    Exact integers end to end: squared planar displacement
    ``d2 = Δx² + Δy²`` (int64), whole-second gap, and the speed gate
    cross-multiplied to ``d2 · t_den² > (v_num · gap_s)²`` — a zero-gap
    pair flags on ANY movement.  One slim hash shuffle; the SQL lag
    window replays it bit-exactly.

    Returns one row per flagged transition: ``(key, id_col [arriving
    event], gap_s, d2)``.
    """
    from ..agg import default_partitions

    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        return pa.table({key: batch[key], "_t": t, "_i": batch[id_col],
                         "_x": batch[x], "_y": batch[y]})

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["_t", "_i"], kind="stable")
        t = g["_t"].to_numpy()
        xs = g["_x"].to_numpy().astype(np.int64)
        ys = g["_y"].to_numpy().astype(np.int64)
        if len(t) < 2:
            return pd.DataFrame({key: pd.Series([], dtype=g[key].dtype),
                                 id_col: pd.Series([], dtype=np.int64),
                                 "gap_s": pd.Series([], dtype=np.int64),
                                 "d2": pd.Series([], dtype=np.int64)})
        gap = np.diff(t) // 1_000_000
        d2 = np.diff(xs) ** 2 + np.diff(ys) ** 2
        hit = d2 * (t_den * t_den) > (v_num * gap) ** 2
        return pd.DataFrame({
            key: g[key].to_numpy()[1:][hit],
            id_col: g["_i"].to_numpy()[1:][hit].astype(np.int64),
            "gap_s": gap[hit].astype(np.int64),
            "d2": d2[hit].astype(np.int64),
        })

    return (ds.map_batches(slim, batch_format="pyarrow")
            .groupby(key, num_partitions=default_partitions())
            .map_groups(per_key, batch_format="pandas"))

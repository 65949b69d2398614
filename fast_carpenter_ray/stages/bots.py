"""Bot-likeness scoring from inter-arrival regularity.

Automated clients betray themselves with (a) high request volume and
(b) unnaturally REGULAR timing — the coefficient of variation of their
inter-arrival gaps is far below human browsing (the classic traffic-
analysis signal; e.g. Doran & Gokhale 2011's web-robot detection
survey, public literature).

``bot_scores`` emits one row per entity with exact-integer sufficient
statistics and integer-only verdicts:

* gaps are whole seconds (``(t_{i+1} − t_i) // 1_000_000`` of the µs
  timestamps), so ``sum_gap`` / ``sum_gap2`` stay well inside int64;
* the regularity test ``cv² < c`` is cross-multiplied to integers:
  with ``V = m·Σg² − (Σg)²`` (m = gap count), ``cv² = V / (Σg)²``, so
  ``regular ⇔ V · c_den < (Σg)² · c_num`` — no float anywhere;
* ``is_bot = high_rate AND regular``.

Ray shape: the stream slims to three int columns before ONE hash
shuffle; per-entity series run in group tasks (the crawl_order /
trajectory frontier-fits-one-task assumption).  A SQL window replay is
bit-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bot_scores", "burstiness"]


def _make_slim(key, ts, id_col):
    """(key, _t int64 µs, _i) projection — shared by both operators so
    a timestamp-handling change can never desynchronize them (and their
    SQL oracles)."""
    def slim(batch: pa.Table) -> pa.Table:
        t = batch[ts]
        if pa.types.is_timestamp(t.type):
            t = t.cast(pa.int64())
        return pa.table({key: batch[key], "_t": t, "_i": batch[id_col]})
    return slim


def _gap_moments(group: pd.DataFrame) -> tuple:
    """(n, m, Σg, Σg²) of a key's (ts, id)-ordered whole-second gaps —
    the shared exact-integer sufficient statistics."""
    g = group.sort_values(["_t", "_i"], kind="stable")
    t = g["_t"].to_numpy()
    gaps = np.diff(t) // 1_000_000  # whole seconds
    return (g, np.int64(len(t)), np.int64(len(gaps)),
            np.int64(gaps.sum()), np.int64((gaps * gaps).sum()))


def bot_scores(ds, key: str = "user_id", ts: str = "ts",
               id_col: str = "event_id", rate_threshold: int = 50,
               cv2_num: int = 1, cv2_den: int = 10):
    """One row per ``key``: ``(key, n, sum_gap, sum_gap2, high_rate,
    regular, is_bot)``.

    ``high_rate``: n >= rate_threshold.  ``regular``: at least 3 gaps,
    a positive total gap, and ``cv² < cv2_num / cv2_den`` via the exact
    integer cross-multiplication above.
    """
    from ..agg import default_partitions

    slim = _make_slim(key, ts, id_col)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g, n, m, sg, sg2 = _gap_moments(group)
        high_rate = np.int64(n >= rate_threshold)
        v = m * sg2 - sg * sg
        regular = np.int64(m >= 3 and sg > 0
                           and v * cv2_den < sg * sg * cv2_num)
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "n": np.array([n], dtype=np.int64),
            "sum_gap": np.array([sg], dtype=np.int64),
            "sum_gap2": np.array([sg2], dtype=np.int64),
            "high_rate": np.array([high_rate], dtype=np.int64),
            "regular": np.array([regular], dtype=np.int64),
            "is_bot": np.array([high_rate & regular], dtype=np.int64),
        })

    return (ds.map_batches(slim, batch_format="pyarrow")
            .groupby(key, num_partitions=default_partitions())
            .map_groups(per_key, batch_format="pandas"))


def burstiness(ds, key: str = "user_id", ts: str = "ts",
               id_col: str = "event_id"):
    """Goh-Barabási burstiness of each entity's inter-event gaps
    (Goh & Barabási 2008, public literature): ``B = (σ − μ)/(σ + μ)``
    ∈ [−1, 1] — −1 for a metronome, 0 for Poisson, → 1 for extreme
    bursts.

    With whole-second gaps, m = gap count, ``Σg``/``Σg²`` exact int64
    and ``V = m·Σg² − (Σg)²``, the m's cancel:
    ``B = (sqrt(V) − Σg) / (sqrt(V) + Σg)`` — one correctly-rounded
    IEEE sqrt plus two additions and a division, mirrored verbatim in
    SQL, so the replay is bit-exact.  Entities need m >= 2 gaps and a
    positive total gap.

    Returns ``(key, m, sum_gap, sum_gap2, burstiness)``; same slim
    one-shuffle shape as :func:`bot_scores`.
    """
    from ..agg import default_partitions

    slim = _make_slim(key, ts, id_col)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        g, _n, m, sg, sg2 = _gap_moments(group)
        if m < 2 or sg <= 0:
            return pd.DataFrame({key: pd.Series([], dtype=g[key].dtype),
                                 "m": pd.Series([], dtype=np.int64),
                                 "sum_gap": pd.Series([], dtype=np.int64),
                                 "sum_gap2": pd.Series([], dtype=np.int64),
                                 "burstiness": pd.Series([], dtype=np.float64)})
        v = m * sg2 - sg * sg
        root = np.sqrt(np.float64(v))
        b = (root - np.float64(sg)) / (root + np.float64(sg))
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            "m": np.array([m], dtype=np.int64),
            "sum_gap": np.array([sg], dtype=np.int64),
            "sum_gap2": np.array([sg2], dtype=np.int64),
            "burstiness": np.array([b], dtype=np.float64),
        })

    return (ds.map_batches(slim, batch_format="pyarrow")
            .groupby(key, num_partitions=default_partitions())
            .map_groups(per_key, batch_format="pandas"))

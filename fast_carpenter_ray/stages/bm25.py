"""BM25 ranked retrieval over the document stream.

The retrieval counterpart to ``stages/index.py``'s inverted index: score
every document against a small query-term set with Okapi BM25 and return
the global top-k.  (The reference engine has no text operators at all —
this extends the engine per SURVEY.md §2.5.)

Ray-native shape — retrieval over 100 TB without moving text:

* one streaming ``map_batches`` pass computes per-doc ``(dl, tf_j)``
  rows (token counts vectorized over the Arrow offsets — flatten once,
  ``np.add.reduceat`` per term); text never leaves the map task;
* the corpus statistics BM25 needs (N, Σdl, df_j) are ONE summary-sized
  partial-sum combine (per-batch partials -> driver add) — no shuffle;
* scoring is a second stateless pass with the scalars closure-broadcast,
  and the top-k is per-batch partial top-k + bounded driver merge (the
  ``ann_topk`` pattern — no global sort, no ``repartition(1)``).

Determinism / oracle: tf, dl, N, Σdl, df are exact ints; the score uses
``log`` so sub-ulp NumPy-vs-DuckDB drift is possible — the oracle
compares RANK ONLY (``row_number() OVER (ORDER BY score DESC, id)``),
immune to sub-ulp score noise; exact ties (identical tf-vector and dl)
produce bit-identical scores on both sides and fall to the id
tie-break.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["bm25_topk"]


def _doc_stats(ds, terms: Sequence[str], id_col: str, text_col: str):
    terms = list(terms)

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.split()
        lens = toks.str.len().fillna(0).to_numpy().astype(np.int64)
        out = {id_col: batch[id_col].to_numpy().astype(np.int64),
               "dl": lens}
        # flatten once; per-term membership summed per doc via reduceat.
        # Only NON-EMPTY docs get reduceat segments: their start offsets
        # are strictly increasing and < len(flat), so each segment spans
        # exactly that doc's tokens (an out-of-range clip here would
        # truncate the preceding doc's segment when a batch ends with an
        # empty doc — regression-tested).
        flat = np.array([w for ws in toks for w in ws], dtype=object)
        nz = lens > 0
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[nz]
        for j, t in enumerate(terms):
            tf = np.zeros(len(lens), dtype=np.int64)
            if len(flat) and starts.size:
                hit = (flat == t).astype(np.int64)
                tf[nz] = np.add.reduceat(hit, starts)
            out[f"tf_{j}"] = tf
        return pd.DataFrame(out)

    return ds.map_batches(stats, batch_format="pandas")


def bm25_topk(ds, terms: Sequence[str], k: int = 20, k1: float = 1.2,
              b: float = 0.75, id_col: str = "doc_id",
              text_col: str = "text") -> pd.DataFrame:
    """Top-``k`` documents by BM25 score for ``terms`` (driver-side
    result: ``(rank, id, score)`` — k is small by contract).

    Scoring order of operations is fixed and mirrored by the SQL oracle:
    ``avgdl = sum_dl / N``; per term
    ``idf = ln((N - df + 0.5) / (df + 0.5))`` (floored at 0),
    ``score += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl / avgdl)))``.
    """
    terms = list(terms)
    m = len(terms)
    if m == 0:
        raise ValueError("bm25_topk: need at least one term")
    stats = _doc_stats(ds, terms, id_col, text_col)

    # corpus scalars: per-batch partial sums -> driver add (summary-sized)
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        row = {"n": np.int64(len(batch)),
               "sum_dl": batch["dl"].sum()}
        for j in range(m):
            row[f"df_{j}"] = (batch[f"tf_{j}"] > 0).sum()
        return pd.DataFrame([row], dtype=np.int64)

    parts = stats.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    sum_dl = int(parts["sum_dl"].sum())
    if n == 0 or sum_dl == 0:
        return pd.DataFrame({"rank": pd.Series([], dtype="int64"),
                             id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    df = [int(parts[f"df_{j}"].sum()) for j in range(m)]
    avgdl = sum_dl / n
    idf = np.maximum(
        np.log((n - np.array(df, dtype=np.float64) + 0.5)
               / (np.array(df, dtype=np.float64) + 0.5)), 0.0)

    def score_topk(batch: pd.DataFrame) -> pd.DataFrame:
        dl = batch["dl"].to_numpy().astype(np.float64)
        total = np.zeros(len(batch), dtype=np.float64)
        any_tf = np.zeros(len(batch), dtype=bool)
        norm = k1 * (1.0 - b + b * (dl / avgdl))
        for j in range(m):
            tf = batch[f"tf_{j}"].to_numpy().astype(np.float64)
            total += idf[j] * (tf * (k1 + 1.0)) / (tf + norm)
            any_tf |= tf > 0
        out = pd.DataFrame({id_col: batch[id_col], "score": total})
        out = out[any_tf]
        # partial top-k: bounds what each task ships to the driver
        return out.sort_values(["score", id_col],
                               ascending=[False, True]).head(k)

    tops = stats.map_batches(score_topk, batch_format="pandas").to_pandas()
    tops = tops.sort_values(["score", id_col],
                            ascending=[False, True]).head(k)
    tops = tops.reset_index(drop=True)
    tops.insert(0, "rank", np.arange(1, len(tops) + 1, dtype=np.int64))
    return tops

"""Retrieval over chunked documents: hashed bag-of-words embeddings +
broadcast query matrix + integer-exact dot-product top-k.

The RAG-retrieval archetype in the repo's oracle-friendly form: chunk
vectors are token-count histograms over ``dim`` sha256-hashed buckets
(the LinearTextClassifier feature contract), the query side is a small
broadcast matrix (``ray.put`` once, read per task), and similarity is the
int64 dot product — exact, so the whole retrieval chain sits under a
hash-exact SQL replay (bucket-join + sum(nq*nc)).  Swap the hashed
counts for real dense embeddings on a cluster with a model: the Ray
shape (broadcast queries, per-batch matmul, local top-k, bounded driver
merge) is exactly the ann_topk brute path.

Scale: the chunk stream never shuffles; each batch emits at most
``len(queries) * k`` candidate rows, so the driver merge is bounded by
``blocks x Q x k``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from .classifier import _stable_token_hash_np

__all__ = ["hashed_chunk_retrieval", "bucket_counts"]


def bucket_counts(token_lists, dim: int) -> np.ndarray:
    """[n, dim] int64 token-count histograms over sha256-hashed buckets.

    Vectorized: ONE explode over all rows, one ``_stable_token_hash_np``
    over the concatenated token array, one flat bincount on
    ``row * dim + bucket`` — no per-row Python loop."""
    n = len(token_lists)
    s = pd.Series(list(token_lists), dtype=object)
    ex = s.explode().dropna()
    if len(ex) == 0:
        return np.zeros((n, dim), dtype=np.int64)
    idx = ex.index.to_numpy(np.int64)
    b = (_stable_token_hash_np(ex.to_numpy(dtype=object))
         % np.uint64(dim)).astype(np.int64)
    return (np.bincount(idx * dim + b, minlength=n * dim)
            .astype(np.int64).reshape(n, dim))


def hashed_chunk_retrieval(chunks, queries: pd.DataFrame, dim: int = 64,
                           k: int = 3, text_col: str = "chunk_text",
                           id_cols=("doc_id", "chunk_id"),
                           query_id_col: str = "query_id",
                           query_text_col: str = "query_text"):
    """Top-``k`` chunks per query by int64 hashed-count dot product.

    ``chunks``: Dataset with ``id_cols`` + ``text_col`` (the
    chunk_documents output shape).  ``queries``: small driver-side
    DataFrame (query_id, query_text) — broadcast once.  Chunks with a
    zero dot product never rank.  Ties break on ascending ``id_cols``.
    Returns a driver-side DataFrame ``(query_id, *id_cols, dot, rank)``.
    """
    import ray

    id_cols = list(id_cols)
    qtoks = [t.split() for t in queries[query_text_col]]
    qmat = bucket_counts(qtoks, dim)  # [Q, dim]
    qids = queries[query_id_col].to_numpy()
    qref = ray.put(qmat)

    def local_topk(batch: pd.DataFrame) -> pd.DataFrame:
        qm = ray.get(qref)
        toks = batch[text_col].fillna("").str.split()  # vectorized split
        cm = bucket_counts(toks, dim)           # [n, dim]
        dots = cm @ qm.T                        # [n, Q] exact int64
        idarrs = [batch[c].to_numpy() for c in id_cols]
        outs = []
        for qi in range(qm.shape[0]):           # Q is small by contract
            d = dots[:, qi]
            hit = np.nonzero(d > 0)[0]
            if len(hit) == 0:
                continue
            # lexsort replay of (dot DESC, *id_cols ASC), then head-k
            keys = tuple(a[hit] for a in reversed(idarrs)) + (-d[hit],)
            sel = hit[np.lexsort(keys)[:k]]
            sub = pd.DataFrame({c: a[sel] for c, a in zip(id_cols, idarrs)})
            sub["dot"] = d[sel]
            sub.insert(0, "_q", qi)
            outs.append(sub)
        if not outs:
            return pd.DataFrame({"_q": pd.Series([], dtype="int64"),
                                 **{c: pd.Series([], dtype="int64")
                                    for c in id_cols},
                                 "dot": pd.Series([], dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    cand = chunks.map_batches(local_topk, batch_format="pandas").to_pandas()
    if len(cand) == 0 or "_q" not in cand.columns:
        # fully-empty chunk streams lose the schema (Ray quirk)
        return pd.DataFrame({query_id_col: pd.Series([], dtype="int64"),
                             **{c: pd.Series([], dtype="int64")
                                for c in id_cols},
                             "dot": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64")})
    final = []
    for qi, qid in enumerate(qids):
        sub = cand[cand["_q"] == qi]
        sub = sub.sort_values(["dot", *id_cols],
                              ascending=[False] + [True] * len(id_cols),
                              kind="stable").head(k).copy()
        sub["rank"] = np.arange(1, len(sub) + 1, dtype=np.int64)
        sub[query_id_col] = qid
        final.append(sub[[query_id_col, *id_cols, "dot", "rank"]])
    if not final:
        return pd.DataFrame({query_id_col: pd.Series([], dtype="int64"),
                             **{c: pd.Series([], dtype="int64")
                                for c in id_cols},
                             "dot": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64")})
    out = pd.concat(final, ignore_index=True)
    out["dot"] = out["dot"].astype(np.int64)
    return out

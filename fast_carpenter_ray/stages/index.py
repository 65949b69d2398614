"""Inverted-index construction: token -> document-frequency + the first-k
sorted posting list.

The search-artifact leg of a webtext pipeline (reference has no text
notion at all; this extends ``text.doc_frequency``'s exact-DF shuffle
with the posting payload a retrieval system actually consumes).

Scale shape: per-batch DISTINCT ``(token, doc)`` pair dedup shrinks the
stream before the single token-keyed hash shuffle; each group task folds
one token vectorized (``np.unique`` sort + head-k slice) into exactly one
summary row.  The posting payload is CAPPED at ``k`` ids per token — the
output is bounded by vocab x k, never by the corpus, which is what keeps
the operator viable at 100 TB (an uncapped posting list for a stopword
would be the corpus itself).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["inverted_index"]


def inverted_index(ds, text_col: str = "text", id_col: str = "doc_id",
                   k: int = 10, min_df: int = 1):
    """Token -> ``(token, df, postings)`` where ``df`` is the distinct-doc
    count and ``postings`` the comma-joined first ``k`` doc ids in
    ascending order.  Same whitespace tokenizer as ``text.doc_frequency``
    (RE2-mirrorable)."""
    from ..agg import default_partitions

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        toks = s.str.split(r"[ \t\n\r\f]+", regex=True)
        out = pd.DataFrame({id_col: batch[id_col],
                            "token": toks}).explode("token")
        out = out[(out["token"] != "") & out["token"].notna()]
        return out.drop_duplicates()

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.unique(g[id_col].to_numpy())
        if len(docs) < min_df:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype=np.int64),
                                 "postings": pd.Series([], dtype=object)})
        return pd.DataFrame({
            "token": [g["token"].iloc[0]],
            "df": np.array([len(docs)], dtype=np.int64),
            "postings": [",".join(str(d) for d in docs[:k].tolist())],
        })

    return (ds.map_batches(pairs, batch_format="pandas")
            .groupby("token", num_partitions=default_partitions())
            .map_groups(fold, batch_format="pandas"))

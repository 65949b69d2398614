"""Hashed-feature linear text classifier scoring (fasttext-shaped).

The model-inference archetype of a curation pipeline: every document is
scored by a linear model over hashed bag-of-words features (the way
quality classifiers gate crawl corpora).  The reference has no model
stages — this extends the engine per SURVEY.md §2.5 with the Ray shape
real model scoring uses:

* the stage is a CALLABLE CLASS for ``map_batches`` — the weight table
  is materialized once per actor in ``__init__`` (the "load the model
  once per worker" pattern; here it's derived from a seed, on a real
  cluster it would be read from a checkpoint path), work happens in
  ``__call__`` per batch;
* scoring is one streaming pass, no shuffle: tokens hash into ``dim``
  buckets, weights gather, segment-sum per doc.

Oracle story: weights are INTEGERS (``mix_hash(bucket, seed) % 17 - 8``)
and features are token counts, so the logit is an exact int64 sum —
hash-exact against a DuckDB replay (sha256-prefix token hash % dim for
the bucket, the splitmix-style ``mix_hash`` replay for the weight).  A
float ``sigmoid`` would only decorate the logit; the decision
(``logit >= 0``) is integer-exact, so the oracle checks the full chain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .sample import mix_hash

__all__ = ["LinearTextClassifier"]


def _stable_token_hash_np(tokens: np.ndarray) -> np.ndarray:
    """uint64 big-endian sha256 prefix per token (the dedup-family token
    hash — DuckDB-replayable as ('0x'||substring(sha256(t),1,16))::UBIGINT)."""
    import hashlib

    out = np.empty(len(tokens), dtype=np.uint64)
    cache: dict = {}
    for i, t in enumerate(tokens):
        v = cache.get(t)
        if v is None:
            v = int.from_bytes(
                hashlib.sha256(t.encode("utf-8")).digest()[:8], "big")
            cache[t] = v
        out[i] = v
    return out


class LinearTextClassifier:
    """Score = Σ_tokens weight[sha256_prefix(token) % dim], an int64
    logit; ``label = (logit >= 0)``.  ``dim`` buckets, weights in
    [-8, 8] derived deterministically from ``seed``."""

    def __init__(self, dim: int = 65536, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.dim = int(dim)
        self.seed = int(seed)
        self.text_col = text_col
        self.id_col = id_col
        # per-actor model materialization (once per worker, not per batch)
        self.weights = (mix_hash(np.arange(self.dim, dtype=np.int64),
                                 self.seed) % 17 - 8).astype(np.int64)

    def _logits(self, batch: pd.DataFrame) -> np.ndarray:
        toks = batch[self.text_col].fillna("").str.split()
        lens = toks.str.len().fillna(0).to_numpy().astype(np.int64)
        flat = [w for ws in toks for w in ws]
        logit = np.zeros(len(batch), dtype=np.int64)
        # reduceat segments only for NON-EMPTY docs (start offsets
        # strictly increasing, < len(flat)); clipping an out-of-range
        # trailing-empty-doc offset instead would truncate the previous
        # doc's segment and drop its last token's weight
        nz = lens > 0
        if flat and nz.any():
            buckets = (_stable_token_hash_np(np.array(flat, dtype=object))
                       % np.uint64(self.dim)).astype(np.int64)
            w = self.weights[buckets]
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))[nz]
            logit[nz] = np.add.reduceat(w, starts).astype(np.int64)
        return logit

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        logit = self._logits(batch)
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "logit": logit,
            "label": (logit >= 0).astype(np.int64),
        })

    def filter_positive(self, ds):
        """Classifier-as-gate (the curation shape): keep rows the model
        accepts (``logit >= 0``), schema preserved — one streaming pass,
        score and filter fused in the same task."""

        def keep(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[self._logits(batch) >= 0]

        return ds.map_batches(keep, batch_format="pandas")

    def apply(self, ds, concurrency=None):
        """Actor-pool scoring stage; ``concurrency=None`` falls back to
        task mode (the measured sandbox default — tiny model state ships
        fine in the closure; real checkpoints want ``concurrency=(m,n)``)."""
        kwargs = {"batch_format": "pandas"}
        if concurrency is not None:
            kwargs["concurrency"] = concurrency
            return ds.map_batches(
                LinearTextClassifier,
                fn_constructor_kwargs=dict(
                    dim=self.dim, seed=self.seed,
                    text_col=self.text_col, id_col=self.id_col),
                **kwargs)
        return ds.map_batches(self, **kwargs)

    def weight_sql(self, bucket_expr: str) -> str:
        """DuckDB expression for ``weights[bucket_expr]``."""
        from .sample import mix_hash_sql

        return f"({mix_hash_sql(bucket_expr, self.seed)}) % 17 - 8"

"""MOSS-style winnowing document fingerprints (Schleimer, Wilkerson,
Aiken, SIGMOD 2003 — public literature).

For each document: k-gram rolling hashes over the token stream, a sliding
window of ``w`` consecutive gram hashes, and per window the MINIMUM hash
is selected with the RIGHTMOST tie-break (the paper's robust-winnowing
rule, which guarantees selection density 2/(w+1) and position-independent
overlap detection).  Each selected ``(position, hash)`` is recorded once.

Every primitive matches the repo's dedup-family SQL contract (sha256-
prefix token hashes, FNV-fold gram combine, 63-bit masked output), so the
whole operator sits under a hash-exact DuckDB replay.  A pure map stage:
fingerprinting never shuffles; downstream joins on the gram hash find
plagiarism/citation candidates.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _stable_token_hash, tokenize

__all__ = ["winnow_fingerprints", "winnow_doc"]

_FNV_P = np.uint64(1099511628211)
_MASK63 = np.uint64((1 << 63) - 1)


def _gram_hashes(text: str, k: int, cache: dict) -> np.ndarray:
    """Positional k-gram rolling hashes (the shingle fold WITHOUT the
    dedupe — winnowing needs every position)."""
    toks = tokenize(text)
    if len(toks) < k:
        toks = toks + ["\x00"] * (k - len(toks))
    th = np.fromiter(
        (cache.setdefault(t, _stable_token_hash(t)) for t in toks),
        dtype=np.uint64, count=len(toks))
    out = np.zeros(len(th) - k + 1, dtype=np.uint64)
    for j in range(k):
        out = out * _FNV_P + th[j:len(th) - k + 1 + j]
    return out


def winnow_doc(text: str, k: int = 3, w: int = 4,
               cache: Optional[dict] = None) -> List[tuple]:
    """Selected fingerprints of one document: sorted list of
    ``(pos, hash63)`` — the reference kernel (also used per batch)."""
    g = _gram_hashes(text, k, cache if cache is not None else {})
    n = len(g)
    if n <= w:
        # fewer grams than the window: one window over the whole doc
        j = int(np.flatnonzero(g == g.min())[-1])
        return [(j, int(g[j] & _MASK63))]
    sw = np.lib.stride_tricks.sliding_window_view(g, w)
    # rightmost argmin: leftmost argmin of the reversed window
    j_rev = np.argmin(sw[:, ::-1], axis=1)
    pos = np.arange(n - w + 1) + (w - 1 - j_rev)
    sel = np.unique(pos)
    return [(int(p), int(g[p] & _MASK63)) for p in sel]


def winnow_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, w: int = 4):
    """Dataset of distinct selected fingerprints ``(id_col, pos, gram)``
    per document; ``gram`` is the 63-bit masked k-gram hash."""

    def batch_fn(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        ids_out, pos_out, g_out = [], [], []
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        for i, t in zip(ids, batch[text_col].to_pylist()):
            for p, gh in winnow_doc(t or "", k, w, cache):
                ids_out.append(i)
                pos_out.append(p)
                g_out.append(gh)
        return pa.table({
            id_col: pa.array(np.asarray(ids_out, dtype=np.int64)),
            "pos": pa.array(np.asarray(pos_out, dtype=np.int64)),
            "gram": pa.array(np.asarray(g_out, dtype=np.int64)),
        })

    return ds.map_batches(batch_fn, batch_format="pyarrow")

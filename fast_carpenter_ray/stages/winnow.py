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

__all__ = ["winnow_fingerprints", "winnow_doc", "winnow_pairs"]

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


def _select_positions(g: np.ndarray, w: int) -> np.ndarray:
    """Winnowing selection over one doc's gram array: distinct positions
    of each window's rightmost minimum."""
    n = len(g)
    if n <= w:
        # fewer grams than the window: one window over the whole doc
        return np.array([np.flatnonzero(g == g.min())[-1]], dtype=np.int64)
    sw = np.lib.stride_tricks.sliding_window_view(g, w)
    # rightmost argmin: leftmost argmin of the reversed window
    j_rev = np.argmin(sw[:, ::-1], axis=1)
    return np.unique(np.arange(n - w + 1) + (w - 1 - j_rev))


def winnow_doc(text: str, k: int = 3, w: int = 4,
               cache: Optional[dict] = None) -> List[tuple]:
    """Selected fingerprints of one document: sorted list of
    ``(pos, hash63)`` — the reference kernel (also used per batch)."""
    g = _gram_hashes(text, k, cache if cache is not None else {})
    sel = _select_positions(g, w)
    return [(int(p), int(g[p] & _MASK63)) for p in sel]


def winnow_fingerprints(ds, text_col: str = "text", id_col: str = "doc_id",
                        k: int = 3, w: int = 4, hash_mode: str = "sha256"):
    """Dataset of distinct selected fingerprints ``(id_col, pos, gram)``
    per document; ``gram`` is the 63-bit masked k-gram hash.

    ``hash_mode="sha256"`` (default) is the bit-exact SQL-oracle
    contract; ``"fast"`` swaps the per-token sha256 for the dedup
    family's vectorized siphash (one batch-level fold, no per-token
    Python) — same selection semantics, different hash values, not
    SQL-replayable (the MinHash ``hash_mode`` contract)."""
    if hash_mode not in ("sha256", "fast"):
        raise ValueError("hash_mode must be 'sha256' or 'fast'")

    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        texts = batch[text_col].to_pylist()
        ids_out, pos_out, g_out = [], [], []
        if hash_mode == "fast":
            from .dedup import _shingle_fold_fast

            grams, bounds = _shingle_fold_fast(texts, k)
            for d in range(len(texts)):
                g = grams[bounds[d]:bounds[d + 1]]
                sel = _select_positions(g, w)
                ids_out.append(np.full(len(sel), ids[d], dtype=np.int64))
                pos_out.append(sel)
                g_out.append((g[sel] & _MASK63).view(np.int64))
            return pa.table({
                id_col: pa.array(np.concatenate(ids_out)
                                 if ids_out else
                                 np.empty(0, dtype=np.int64)),
                "pos": pa.array(np.concatenate(pos_out)
                                if pos_out else np.empty(0, dtype=np.int64)),
                "gram": pa.array(np.concatenate(g_out)
                                 if g_out else np.empty(0, dtype=np.int64)),
            })
        cache: dict = {}
        for i, t in zip(ids, texts):
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


def winnow_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                 k: int = 3, w: int = 4, min_shared: int = 2,
                 max_bucket: int = 4096,
                 num_partitions: Optional[int] = None):
    """Plagiarism/overlap candidate pairs: documents sharing at least
    ``min_shared`` DISTINCT selected fingerprints.

    Scale shape (the dedup-family pattern): fingerprints shrink to one
    (doc, gram) row per distinct gram per doc; one ``groupby(gram)``
    emits in-bucket pairs vectorized (bucket capped + logged via
    ``_cap_bucket`` — a gram shared by the whole corpus degrades
    gracefully instead of going quadratic); shared-gram counting happens
    in bounded pair-hash buckets, never a shuffle keyed on the raw pair
    (BASELINE.md lesson 7).  Returns ``(id_a, id_b, n_shared)``.
    """
    from ..agg import default_partitions
    from .dedup import _cap_bucket

    if num_partitions is None:
        num_partitions = default_partitions(4)
    fps = winnow_fingerprints(ds, text_col=text_col, id_col=id_col, k=k, w=w)

    def distinct_grams(batch: pa.Table) -> pa.Table:
        df = batch.select([id_col, "gram"]).to_pandas()
        return pa.Table.from_pandas(
            df.drop_duplicates([id_col, "gram"]), preserve_index=False)

    slim = fps.map_batches(distinct_grams, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        ids = _cap_bucket(np.sort(ids), max_bucket, "winnow_pairs")
        iu = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[iu[0]].astype(np.int64),
                             "id_b": ids[iu[1]].astype(np.int64)})

    cand = slim.groupby("gram", num_partitions=num_partitions).map_groups(
        bucket_pairs, batch_format="pandas")

    # count shared grams per pair in bounded pair-hash buckets
    n_buckets = max(64, int(num_partitions) * 8)

    def add_bucket(b: pa.Table) -> pa.Table:
        h = (b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
             * 1000003
             + b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
             ) % n_buckets
        return b.append_column("_bkt", pa.array(h, type=pa.int64()))

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["id_a", "id_b"], sort=False).size()
               .rename("n_shared").reset_index())
        out = out[out["n_shared"] >= min_shared]
        out["n_shared"] = out["n_shared"].astype(np.int64)
        return out

    return cand.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "_bkt", num_partitions=num_partitions).map_groups(
        count_bucket, batch_format="pandas")

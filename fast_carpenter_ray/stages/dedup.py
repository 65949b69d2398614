"""Deduplication operators: exact, MinHash+LSH, SimHash.

These extend the engine beyond the reference (which has no dedup —
SURVEY.md §2.5) with the operators a large-scale training-data pipeline
needs.  All follow the same Ray-native shape:

  vectorized ``map_batches`` fingerprinting  ->  shuffle on the fingerprint
  ->  per-group resolution (``map_groups`` / aggregate)

Exact dedup shuffles a short content hash, never the content.  MinHash-LSH
emits (band_id, band_key, doc_id) rows — B small rows per doc — and
groupbys the band key, so the shuffle volume is O(B * docs), independent of
document size.  Pair verification uses the MinHash signatures themselves
(estimated Jaccard), avoiding a second pass over text; an exact n-gram
Jaccard verifier is provided for when candidates are few enough to refetch.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "ExactDedup", "MinHashDedup", "SimHashDedup",
    "tokenize", "shingle_hashes", "ngram_jaccard",
]

_MERSENNE = np.uint64((1 << 61) - 1)


def _stable_token_hash(token: str) -> int:
    """Deterministic 64-bit token hash (process-independent, unlike
    Python's salted ``hash``)."""
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(),
                          "little")


def tokenize(text: str) -> List[str]:
    return text.lower().split()


def shingle_hashes(text: str, width: int = 3,
                   _cache: Optional[dict] = None) -> np.ndarray:
    """uint64 hashes of word w-shingles, vectorized over the token array."""
    toks = tokenize(text)
    if len(toks) < width:
        toks = toks + ["\x00"] * (width - len(toks))
    cache = _cache if _cache is not None else {}
    th = np.fromiter(
        (cache.setdefault(t, _stable_token_hash(t)) for t in toks),
        dtype=np.uint64, count=len(toks))
    # polynomial rolling combine over a sliding window (vectorized)
    out = np.zeros(len(th) - width + 1, dtype=np.uint64)
    P = np.uint64(1099511628211)
    for j in range(width):
        out = out * P + th[j:len(th) - width + 1 + j]
    return np.unique(out)


def ngram_jaccard(text_a: str, text_b: str, width: int = 3) -> float:
    """Exact n-gram Jaccard similarity (pair verifier)."""
    a = shingle_hashes(text_a, width)
    b = shingle_hashes(text_b, width)
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True)
    return len(inter) / (len(a) + len(b) - len(inter))


class ExactDedup:
    """Exact content dedup: hash-partition on a content key, keep the row
    with the smallest ``id_col`` per key (deterministic first-wins).

    ``key_expr``: column holding the content to hash (e.g. ``text`` or
    ``url``).  The shuffle moves only (hash, id) — content never reshuffles.
    """

    def __init__(self, name: str, key: str = "text", id_col: str = "doc_id"):
        self.name = name
        self.key = key
        self.id_col = id_col

    def hash_batch(self, batch: pa.Table) -> pa.Table:
        vals = batch[self.key].to_pylist()
        hashes = [hashlib.sha256(
            v if isinstance(v, bytes) else str(v).encode("utf-8")).hexdigest()
            for v in vals]
        return batch.append_column("_content_hash", pa.array(hashes, type=pa.string()))

    def apply(self, ds):
        """Dataset of surviving rows (one per distinct content)."""
        hashed = ds.map_batches(self.hash_batch, batch_format="pyarrow")
        id_col = self.id_col

        def first(group: pd.DataFrame) -> pd.DataFrame:
            return group.nsmallest(1, id_col)

        return hashed.groupby("_content_hash").map_groups(first, batch_format="pandas")

    def survivors(self, ds, num_partitions: Optional[int] = None):
        """Lighter variant: just the surviving ids (min id per hash).

        Per-batch partial min first (shrinks the shuffle to one row per
        distinct hash per batch), then a hash groupby.  ``num_partitions``
        bounds the shuffle task count (Ray's per-block scheduling overhead
        dominates for small inputs)."""
        from ray.data.aggregate import Min

        id_col = self.id_col

        def partial_min(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            out = df.groupby("_content_hash", sort=False)[id_col].min().reset_index()
            return pa.Table.from_pandas(out, preserve_index=False)

        hashed = ds.map_batches(self.hash_batch, batch_format="pyarrow")
        keep = hashed.select_columns(["_content_hash", self.id_col])
        keep = keep.map_batches(partial_min, batch_format="pyarrow")
        if num_partitions:
            keep = keep.repartition(num_partitions)
        return keep.groupby("_content_hash").aggregate(
            Min(self.id_col, alias_name=self.id_col))


class MinHashDedup:
    """MinHash + LSH near-duplicate detection.

    Pipeline: per-batch signatures (P permutations over word-shingle
    hashes) -> explode to (band_id, band_key, doc_id, sig) rows ->
    ``groupby(band_id, band_key)`` -> candidate pairs within buckets ->
    estimated-Jaccard verification from the signatures.
    """

    def __init__(self, name: str, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 128, bands: int = 16, shingle_width: int = 3,
                 threshold: float = 0.7, seed: int = 42):
        assert num_perm % bands == 0
        self.name = name
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_width = shingle_width
        self.threshold = threshold
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)

    def signature(self, text: str, cache: Optional[dict] = None) -> np.ndarray:
        sh = shingle_hashes(text, self.shingle_width, cache)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (a*x + b) mod p for each permutation; vectorized outer product
        vals = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def band_rows(self, batch: pa.Table) -> pa.Table:
        """Emit (band_id, band_key, doc_id, sig) rows; B rows per doc."""
        texts = batch[self.text_col].to_pylist()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        cache: dict = {}
        band_ids, band_keys, doc_ids, sigs = [], [], [], []
        for i, t in enumerate(texts):
            sig = self.signature(t, cache)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                key = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                band_ids.append(b)
                band_keys.append(key)
                doc_ids.append(int(ids[i]))
                sigs.append(sig.astype(np.int64))
        return pa.table({
            "band_id": pa.array(band_ids, type=pa.int32()),
            "band_key": pa.array(band_keys, type=pa.string()),
            self.id_col: pa.array(doc_ids, type=pa.int64()),
            "sig": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.int64())),
        })

    def candidate_pairs(self, ds):
        """Dataset of verified near-dup pairs (id_a < id_b, est_jaccard)."""
        id_col = self.id_col
        threshold = self.threshold
        num_perm = self.num_perm

        rows = ds.map_batches(self.band_rows, batch_format="pyarrow")

        def pairs(group: pd.DataFrame) -> pd.DataFrame:
            if len(group) < 2:
                return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                     "id_b": pd.Series([], dtype="int64"),
                                     "est_jaccard": pd.Series([], dtype="float64")})
            g = group.sort_values(id_col)
            ids = g[id_col].to_numpy()
            sigs = np.stack(g["sig"].to_numpy())
            out_a, out_b, out_j = [], [], []
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    est = float((sigs[i] == sigs[j]).sum()) / num_perm
                    if est >= threshold:
                        out_a.append(int(ids[i]))
                        out_b.append(int(ids[j]))
                        out_j.append(est)
            return pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": out_j})

        cand = rows.groupby(["band_id", "band_key"]).map_groups(
            pairs, batch_format="pandas")

        # a pair can surface from several bands: dedupe, keep max estimate
        from ray.data.aggregate import Max

        return cand.groupby(["id_a", "id_b"]).aggregate(
            Max("est_jaccard", alias_name="est_jaccard"))


class SimHashDedup:
    """64-bit SimHash near-dup detection.

    Bucket by 4 x 16-bit banks (any pair within Hamming distance 3 shares
    at least one identical bank — pigeonhole), verify Hamming distance in
    the bucket.
    """

    def __init__(self, name: str, text_col: str = "text", id_col: str = "doc_id",
                 max_hamming: int = 3):
        self.name = name
        self.text_col = text_col
        self.id_col = id_col
        self.max_hamming = max_hamming
        self.n_banks = 4

    @staticmethod
    def simhash(text: str, cache: Optional[dict] = None) -> int:
        toks = tokenize(text)
        if not toks:
            return 0
        cache = cache if cache is not None else {}
        th = np.fromiter((cache.setdefault(t, _stable_token_hash(t)) for t in toks),
                         dtype=np.uint64, count=len(toks))
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        return int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2)

    def fingerprint_batch(self, batch: pa.Table) -> pa.Table:
        cache: dict = {}
        hashes = [self.simhash(t, cache) for t in batch[self.text_col].to_pylist()]
        signed = np.asarray(hashes, dtype=np.uint64).view(np.int64)
        return pa.table({
            self.id_col: batch[self.id_col],
            "simhash": pa.array(signed, type=pa.int64()),
        })

    def bank_rows(self, batch: pa.Table) -> pa.Table:
        fp = self.fingerprint_batch(batch)
        sh = fp["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = fp[self.id_col].to_numpy(zero_copy_only=False)
        bank_id, bank_key, out_ids, out_sh = [], [], [], []
        for b in range(self.n_banks):
            bank = ((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
            bank_id.extend([b] * len(ids))
            bank_key.extend(bank.tolist())
            out_ids.extend(ids.tolist())
            out_sh.extend(sh.view(np.int64).tolist())
        return pa.table({
            "bank_id": pa.array(bank_id, type=pa.int32()),
            "bank_key": pa.array(bank_key, type=pa.int64()),
            self.id_col: pa.array(out_ids, type=pa.int64()),
            "simhash": pa.array(out_sh, type=pa.int64()),
        })

    def candidate_pairs(self, ds):
        id_col = self.id_col
        max_h = self.max_hamming

        rows = ds.map_batches(self.bank_rows, batch_format="pyarrow")

        def pairs(group: pd.DataFrame) -> pd.DataFrame:
            if len(group) < 2:
                return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                     "id_b": pd.Series([], dtype="int64"),
                                     "hamming": pd.Series([], dtype="int64")})
            g = group.drop_duplicates(id_col).sort_values(id_col)
            ids = g[id_col].to_numpy()
            sh = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
            out_a, out_b, out_h = [], [], []
            for i in range(len(ids)):
                x = sh[i] ^ sh[i + 1:]
                ham = np.array([bin(v).count("1") for v in x.tolist()])
                hits = np.nonzero(ham <= max_h)[0]
                for j in hits:
                    out_a.append(int(ids[i]))
                    out_b.append(int(ids[i + 1 + j]))
                    out_h.append(int(ham[j]))
            return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": out_h})

        cand = rows.groupby(["bank_id", "bank_key"]).map_groups(
            pairs, batch_format="pandas")

        from ray.data.aggregate import Min

        return cand.groupby(["id_a", "id_b"]).aggregate(
            Min("hamming", alias_name="hamming"))

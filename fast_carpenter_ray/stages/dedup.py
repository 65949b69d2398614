"""Deduplication operators: exact, MinHash+LSH, SimHash.

These extend the engine beyond the reference (which has no dedup —
SURVEY.md §2.5) with the operators a large-scale training-data pipeline
needs.  All follow the same Ray-native shape:

  vectorized ``map_batches`` fingerprinting  ->  shuffle on the fingerprint
  ->  per-group resolution (``map_groups`` / aggregate)

Exact dedup shuffles a short content hash, never the content.  MinHash-LSH
emits (band_id, band_key, doc_id) rows — B rows of THREE SMALL INTS per
doc, never the signature — and groupbys the band key, so the shuffle
volume really is O(B * docs) independent of document AND signature size.
Candidate pairs are deduped across bands first, then verified by a
signature lookup join (two bounded-partition hash joins against the
(doc_id, sig) table: ~1 KB/doc shuffled once per side, only for the
verification stage).  In-bucket pairing is fully vectorized and bucket
size is CAPPED with a logged drop count — a hot bucket (empty/boilerplate
docs hashing identically) degrades gracefully instead of going quadratic.
An exact n-gram Jaccard verifier is provided for when candidates are few
enough to refetch text.
"""

from __future__ import annotations

import hashlib
import logging
from typing import Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "ExactDedup", "MinHashDedup", "SimHashDedup",
    "tokenize", "shingle_hashes", "ngram_jaccard", "chunk_dup_stats",
    "dedup_pair_stream", "cluster_pairs", "distributed_components",
    "build_dedup_index", "incremental_dedup",
    "near_dedup", "remove_dup_spans",
]

logger = logging.getLogger("fast_carpenter_ray.dedup")

#: universal-hash modulus: the Mersenne prime 2^31-1.  Inputs are reduced
#: mod p and coefficients drawn from [1, p), so a*x+b < 2^62 fits exactly
#: in uint64 and the mod-p reduction is exact — a PROPER universal family
#: over GF(p) (the earlier 2^61-1 variant silently wrapped a*x mod 2^64
#: before reducing, voiding the universality guarantee).
_MERSENNE31 = np.uint64((1 << 31) - 1)


def _stable_token_hash(token: str) -> int:
    """Deterministic 64-bit token hash (process-independent, unlike
    Python's salted ``hash``): the big-endian first 8 bytes of sha256.
    sha256 (rather than blake2b) so an independent SQL engine can
    recompute it — DuckDB: ``('0x' || substring(sha256(t),1,16))::UBIGINT``
    — which is what puts the MinHash/SimHash pipelines under a bit-exact
    oracle."""
    return int.from_bytes(hashlib.sha256(token.encode("utf-8")).digest()[:8], "big")


def tokenize(text: str) -> List[str]:
    return text.lower().split()


def _explode_tokens(texts: List[Optional[str]]):
    """Vectorized per-batch tokenization: lowercase + whitespace split for
    every doc at once.  Returns ``(doc_idx, flat_tokens, lens)`` where
    ``flat_tokens`` is doc-major (every doc's tokens contiguous, in order)
    and ``lens[i]`` is doc i's token count."""
    toks = pd.Series(texts, dtype=object).fillna("").str.lower().str.split()
    lens = toks.str.len().to_numpy(np.int64)
    ex = toks.explode().dropna()
    return (ex.index.to_numpy(np.int64), ex.to_numpy(dtype=object), lens)


def _hash_tokens_fast(flat_tokens: np.ndarray) -> np.ndarray:
    """Vectorized deterministic uint64 token hash: pandas' keyed siphash
    (``hash_array`` with its fixed default key) — process- and
    platform-stable like the sha256 path, ~40x faster, but NOT replayable
    in SQL.  Used only under ``hash_mode="fast"``; the sha256 path stays
    the oracle-mode default."""
    if len(flat_tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(flat_tokens, categorize=True)


def _shingle_fold_fast(texts: List[Optional[str]], width: int):
    """Per-batch word-shingle hashes with the fast token hash: one explode,
    one vectorized hash, one rolling polynomial fold — no per-doc Python.

    Returns ``(shingles uint64, offsets int64)`` where doc i's shingles are
    ``shingles[offsets[i]:offsets[i+1]]``; docs shorter than ``width`` are
    padded with the same ``"\\x00"`` sentinel as :func:`shingle_hashes`, so
    every doc has >= 1 shingle."""
    doc_idx, flat, lens = _explode_tokens(texts)
    short = np.nonzero(lens < width)[0]
    if len(short):
        pad_counts = (width - lens[short]).astype(np.int64)
        pad_idx = np.repeat(short, pad_counts)
        doc_idx = np.concatenate([doc_idx, pad_idx])
        flat = np.concatenate(
            [flat, np.full(len(pad_idx), "\x00", dtype=object)])
        # stable sort: original tokens stay before their doc's pads,
        # matching shingle_hashes' toks + pads ordering
        order = np.argsort(doc_idx, kind="stable")
        flat = flat[order]
        lens = np.maximum(lens, width)
    th = _hash_tokens_fast(flat)
    n_sh = lens - width + 1
    total = int(n_sh.sum())
    sh_bounds = np.concatenate([[0], np.cumsum(n_sh)])
    if total == 0:
        return np.empty(0, dtype=np.uint64), sh_bounds.astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    within = (np.arange(total, dtype=np.int64)
              - np.repeat(sh_bounds[:-1], n_sh))
    pos = np.repeat(starts, n_sh) + within
    out = np.zeros(total, dtype=np.uint64)
    P = np.uint64(1099511628211)
    for j in range(width):
        out = out * P + th[pos + j]
    return out, sh_bounds.astype(np.int64)


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

        from ..agg import default_partitions

        return hashed.groupby(
            "_content_hash", num_partitions=default_partitions()).map_groups(
            first, batch_format="pandas")

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

        if num_partitions is None:
            # never fall through to Ray's 200-partition default: aggregator
            # startup scales with the partition count (agg.default_partitions)
            from ..agg import default_partitions

            num_partitions = default_partitions()
        hashed = ds.map_batches(self.hash_batch, batch_format="pyarrow")
        keep = hashed.select_columns(["_content_hash", self.id_col])
        keep = keep.map_batches(partial_min, batch_format="pyarrow")
        return keep.groupby("_content_hash",
                            num_partitions=num_partitions).aggregate(
            Min(self.id_col, alias_name=self.id_col))


def _empty_pairs(value_col: str, dtype: str = "float64") -> pd.DataFrame:
    return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                         "id_b": pd.Series([], dtype="int64"),
                         value_col: pd.Series([], dtype=dtype)})


def dedup_pair_stream(cand, num_partitions: int,
                      keep_cols: Tuple[str, ...] = ("id_a", "id_b")):
    """Dedupe an (id_a, id_b, ...) candidate-pair Dataset across LSH
    bands / posting lists WITHOUT keying the shuffle on the raw pair.

    A ``groupby(["id_a", "id_b"])`` has group count == candidate count —
    the exact degradation BASELINE.md lesson 7 measured at 291 s -> 0.5 s
    on Ray 2.49's hash aggregator.  Instead the pairs are bucketed by a
    bounded pair hash (group count <= ``8 * num_partitions`` regardless
    of candidate volume) and each bucket is deduped with one vectorized
    ``drop_duplicates``.  Extra value columns listed in ``keep_cols``
    survive with their first occurrence's value — callers must only pass
    columns that are deterministic functions of the pair (e.g. SimHash
    Hamming distance), never band-dependent ones.
    """
    n_buckets = max(64, int(num_partitions) * 8)
    cols = list(keep_cols)

    def add_bucket(b: pa.Table) -> pa.Table:
        h = (b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
             * 1000003
             + b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
             ) % n_buckets
        return b.append_column("_bkt", pa.array(h, type=pa.int64()))

    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[cols]

    return cand.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "_bkt", num_partitions=num_partitions).map_groups(
        dedup_bucket, batch_format="pandas")


def _cap_bucket(ids: np.ndarray, max_bucket: int, what: str) -> np.ndarray:
    """Cap an LSH bucket at ``max_bucket`` ids (smallest ids kept, so the
    cap is deterministic).  NEVER silent: the drop is logged with the pair
    count it forfeits."""
    if len(ids) <= max_bucket:
        return ids
    dropped = len(ids) - max_bucket
    lost_pairs = len(ids) * (len(ids) - 1) // 2 - max_bucket * (max_bucket - 1) // 2
    logger.warning(
        "%s: hot LSH bucket capped at %d ids (%d ids dropped, forfeiting "
        "up to %d candidate pairs) — likely boilerplate/empty near-identical "
        "content; raise max_bucket or pre-filter such docs",
        what, max_bucket, dropped, lost_pairs)
    return ids[:max_bucket]


class MinHashDedup:
    """MinHash + LSH near-duplicate detection.

    Pipeline (each stage a streaming Ray Data op):

    1. ``signature_batch``: per-batch signatures (P universal-hash
       permutations over word-shingle hashes) -> (doc_id, sig) rows.
    2. ``band_rows``: (band_id, band_key, doc_id) rows — THREE ints per
       band, the signature never enters the LSH shuffle.
    3. ``groupby(band_id, band_key)`` -> vectorized all-pairs inside each
       bucket, capped at ``max_bucket`` with a logged drop.
    4. pair dedupe across bands (``groupby(id_a, id_b)``).
    5. verification: two bounded-partition hash joins fetch each side's
       signature, then one vectorized equality-fraction kernel filters by
       ``threshold``.
    """

    def __init__(self, name: str, text_col: str = "text", id_col: str = "doc_id",
                 num_perm: int = 128, bands: int = 16, shingle_width: int = 3,
                 threshold: float = 0.7, seed: int = 42,
                 max_bucket: int = 512, num_partitions: Optional[int] = None,
                 hash_mode: str = "sha256"):
        assert num_perm % bands == 0
        if hash_mode not in ("sha256", "fast"):
            raise ValueError("hash_mode must be 'sha256' (bit-exact SQL "
                             "oracle contract) or 'fast' (vectorized "
                             "siphash token hashing — the corpus-scale "
                             "throughput path; same LSH guarantees, not "
                             "SQL-replayable)")
        self.hash_mode = hash_mode
        self.name = name
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_width = shingle_width
        self.threshold = threshold
        self.max_bucket = int(max_bucket)
        #: None -> sized to the cluster at run time.  Ray's hash-shuffle
        #: join spawns aggregator actors per partition; two chained joins
        #: with partitions >> CPUs deadlock a small cluster (measured: 16
        #: partitions hang a 4-CPU local cluster, 4 partitions run fine).
        self.num_partitions = None if num_partitions is None else int(num_partitions)
        rng = np.random.default_rng(seed)
        p = int(_MERSENNE31)
        self.a = rng.integers(1, p, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, p, size=num_perm, dtype=np.uint64)

    def signature(self, text: str, cache: Optional[dict] = None) -> np.ndarray:
        sh = shingle_hashes(text, self.shingle_width, cache)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # exact universal hash over GF(2^31-1): x < p and a < p, so
        # a*x + b < 2^62 never wraps in uint64 and the mod is exact
        x = sh % _MERSENNE31
        vals = (np.outer(self.a, x) + self.b[:, None]) % _MERSENNE31
        return vals.min(axis=1)

    def _signatures_fast(self, texts: List[Optional[str]]) -> np.ndarray:
        """[n, num_perm] int64 signatures for a whole batch with ZERO
        per-doc Python: one vectorized shingle fold
        (:func:`_shingle_fold_fast`), then the same exact universal-hash
        family as :meth:`signature` applied to the flat shingle array in
        permutation chunks, with per-doc mins via ``minimum.reduceat``.
        Duplicate shingles within a doc don't change the min, so the
        sha256 path's ``np.unique`` is skipped."""
        n = len(texts)
        if n == 0:
            return np.empty((0, self.num_perm), dtype=np.int64)
        shingles, bounds = _shingle_fold_fast(texts, self.shingle_width)
        x = shingles % _MERSENNE31
        offsets = bounds[:-1]
        sigs = np.empty((self.num_perm, n), dtype=np.uint64)
        # CHUNK=16 + preallocated out= buffers: the perm math is memory-
        # bandwidth bound; 16 x #shingles x 8 B stays cache-friendly and
        # avoiding per-chunk temporaries measured 1.7x faster than the
        # naive chunk=32 expression (uint64 '%' beats a shift-add Mersenne
        # fold here — the fold's three temporaries cost more than the div)
        CHUNK = 16
        y = np.empty((CHUNK, len(x)), dtype=np.uint64)
        for c0 in range(0, self.num_perm, CHUNK):
            a = self.a[c0:c0 + CHUNK, None]
            b = self.b[c0:c0 + CHUNK, None]
            yc = y[:len(a)]
            np.multiply(a, x[None, :], out=yc)  # < 2^62: exact in uint64
            np.add(yc, b, out=yc)
            np.mod(yc, _MERSENNE31, out=yc)
            np.minimum.reduceat(yc, offsets, axis=1,
                                out=sigs[c0:c0 + len(a)])
        return np.ascontiguousarray(sigs.T).astype(np.int64)

    def signature_batch(self, batch: pa.Table) -> pa.Table:
        """(doc_id, sig) rows; one per doc.  ``sig`` is fixed-size BINARY
        (num_perm little-endian int64s): Arrow's join kernel rejects
        (fixed-size-)list payload columns, and fixed-width binary decodes
        back to a [n, num_perm] matrix zero-copy."""
        texts = batch[self.text_col].to_pylist()
        if self.hash_mode == "fast":
            sigs = self._signatures_fast(texts)
        else:
            cache: dict = {}
            sigs = np.empty((len(texts), self.num_perm), dtype=np.int64)
            for i, t in enumerate(texts):
                sigs[i] = self.signature(t, cache).astype(np.int64)
        width = 8 * self.num_perm
        return pa.table({
            self.id_col: batch[self.id_col],
            "sig": pa.Array.from_buffers(
                pa.binary(width), len(texts),
                [None, pa.py_buffer(sigs.tobytes())]),
        })

    def _sig_matrix(self, col) -> np.ndarray:
        """[n, num_perm] int64 view of a fixed-size-binary sig column."""
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = np.frombuffer(arr.buffers()[1], dtype=np.int64)
        start = arr.offset * self.num_perm
        return flat[start:start + len(arr) * self.num_perm].reshape(
            len(arr), self.num_perm)

    def band_rows(self, batch: pa.Table) -> pa.Table:
        """(band_id, band_key, doc_id) rows from a signature batch — B rows
        of three small ints per doc.  The band key is a vectorized FNV-1a
        fold of the band's signature chunk (collisions only ADD candidate
        pairs, which verification removes)."""
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        sig = self._sig_matrix(batch["sig"]).view(np.uint64)
        band_id = np.repeat(np.arange(self.bands, dtype=np.int32), n)
        keys = np.empty((self.bands, n), dtype=np.uint64)
        FNV_OFF = np.uint64(14695981039346656037)
        FNV_P = np.uint64(1099511628211)
        for b in range(self.bands):
            chunk = sig[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
            h = np.full(n, FNV_OFF, dtype=np.uint64)
            for j in range(self.rows_per_band):
                h = (h ^ chunk[:, j]) * FNV_P
            keys[b] = h
        return pa.table({
            "band_id": pa.array(band_id, type=pa.int32()),
            "band_key": pa.array(keys.ravel().view(np.int64), type=pa.int64()),
            self.id_col: pa.array(np.tile(ids, self.bands), type=pa.int64()),
        })

    def _bucket_pairs(self, group: pd.DataFrame) -> pd.DataFrame:
        """All candidate pairs within one (band_id, band_key) bucket —
        vectorized triu indexing, bucket capped with a logged drop."""
        ids = np.unique(group[self.id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        ids = _cap_bucket(np.sort(ids), self.max_bucket, f"MinHashDedup[{self.name}]")
        iu = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[iu[0]].astype(np.int64),
                             "id_b": ids[iu[1]].astype(np.int64)})

    def candidate_pairs(self, ds, broadcast_pairs_budget: int = 200_000):
        """Dataset of verified near-dup pairs (id_a < id_b, est_jaccard).

        Verification fetches each pair's two signatures.  Two paths:

        * pair count <= ``broadcast_pairs_budget`` (the normal case — LSH
          candidates are a tiny fraction of the corpus): ONE streaming
          filter pass over the signature table collects only the needed
          signatures (bounded by 2 x pairs), which verify as a broadcast
          lookup — no hash join, no extra shuffle.
        * above the budget (adversarial corpora where candidates are
          corpus-sized): two bounded-partition hash joins, the honest
          shuffle path; the signature table crosses the shuffle once per
          side (~1 KB/doc), only here.
        """
        import ray
        import ray.data as rd

        id_col = self.id_col
        threshold = self.threshold
        num_partitions = self.num_partitions
        if num_partitions is None:
            # hash-shuffle joins spawn aggregator actors per partition;
            # partitions >> data blocks is pure startup cost (see
            # agg.combine_partials for the measurement)
            from ..agg import default_partitions

            num_partitions = default_partitions(4)

        sigs = ds.map_batches(self.signature_batch, batch_format="pyarrow")
        rows = sigs.map_batches(self.band_rows, batch_format="pyarrow")
        cand = rows.groupby(["band_id", "band_key"],
                            num_partitions=num_partitions).map_groups(
            self._bucket_pairs, batch_format="pandas").materialize()
        # dedupe pairs across bands BEFORE fetching signatures.  Within
        # the broadcast budget (the normal case) the RAW candidate rows
        # are already driver-sized, so the dedupe is one vectorized
        # drop_duplicates on the driver — no extra shuffle.  Above it,
        # bounded pair-hash buckets, NOT a groupby on the raw pair
        # (lesson-7 shuffle degradation — see dedup_pair_stream).
        n_cand = cand.count()
        if n_cand > broadcast_pairs_budget:
            pairs = dedup_pair_stream(cand, num_partitions).materialize()
        else:
            pairs = rd.from_pandas(
                cand.to_pandas().drop_duplicates(["id_a", "id_b"])
                .reset_index(drop=True)).materialize()

        def verify_arrays(ids_a, ids_b, sa: np.ndarray, sb: np.ndarray):
            est = (sa == sb).mean(axis=1)
            keep = est >= threshold
            return pa.table({
                "id_a": pa.array(np.asarray(ids_a)[keep], type=pa.int64()),
                "id_b": pa.array(np.asarray(ids_b)[keep], type=pa.int64()),
                "est_jaccard": pa.array(est[keep], type=pa.float64()),
            })

        n_pairs = pairs.count()
        if n_pairs <= broadcast_pairs_budget:
            pair_df = pairs.to_pandas()
            if len(pair_df) == 0:
                return rd.from_arrow(pa.table({
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                    "est_jaccard": pa.array([], type=pa.float64())}))
            need = np.unique(np.concatenate(
                [pair_df["id_a"].to_numpy(), pair_df["id_b"].to_numpy()]))
            need_ref = ray.put(need)

            def keep_needed(batch: pa.Table) -> pa.Table:
                ids = batch[id_col].to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(np.isin(ids, ray.get(need_ref))))

            looked = sigs.map_batches(keep_needed,
                                      batch_format="pyarrow").to_pandas()
            # id -> row index into the collected signature matrix
            got_ids = looked[id_col].to_numpy()
            sig_m = np.stack([np.frombuffer(b, dtype=np.int64)
                              for b in looked["sig"]])
            pos = {int(i): j for j, i in enumerate(got_ids)}
            ia = pair_df["id_a"].to_numpy()
            ib = pair_df["id_b"].to_numpy()
            ra = np.fromiter((pos[int(i)] for i in ia), dtype=np.int64,
                             count=len(ia))
            rb = np.fromiter((pos[int(i)] for i in ib), dtype=np.int64,
                             count=len(ib))
            return rd.from_arrow(verify_arrays(ia, ib, sig_m[ra], sig_m[rb]))

        logger.warning(
            "MinHashDedup[%s]: %d candidate pairs exceed the %d broadcast "
            "budget — falling back to hash-join verification",
            self.name, n_pairs, broadcast_pairs_budget)

        def _as(side: str):
            return sigs.map_batches(
                lambda t, s=side: t.rename_columns([f"id_{s}", f"sig_{s}"]),
                batch_format="pyarrow")

        j = pairs.join(_as("a"), join_type="inner",
                       num_partitions=num_partitions, on=("id_a",))
        j = j.join(_as("b"), join_type="inner",
                   num_partitions=num_partitions, on=("id_b",))

        def verify(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({"id_a": pa.array([], type=pa.int64()),
                                 "id_b": pa.array([], type=pa.int64()),
                                 "est_jaccard": pa.array([], type=pa.float64())})
            sa = self._sig_matrix(batch["sig_a"])
            sb = self._sig_matrix(batch["sig_b"])
            return verify_arrays(batch["id_a"].to_numpy(zero_copy_only=False),
                                 batch["id_b"].to_numpy(zero_copy_only=False),
                                 sa, sb)

        return j.map_batches(verify, batch_format="pyarrow")


class SimHashDedup:
    """64-bit SimHash near-dup detection.

    Bucket by 4 x 16-bit banks (any pair within Hamming distance 3 shares
    at least one identical bank — pigeonhole), verify Hamming distance in
    the bucket.
    """

    def __init__(self, name: str, text_col: str = "text", id_col: str = "doc_id",
                 max_hamming: int = 3, max_bucket: int = 4096,
                 hash_mode: str = "sha256"):
        if hash_mode not in ("sha256", "fast"):
            raise ValueError("hash_mode must be 'sha256' or 'fast' "
                             "(see MinHashDedup)")
        self.name = name
        self.text_col = text_col
        self.id_col = id_col
        self.max_hamming = max_hamming
        self.n_banks = 4
        self.max_bucket = int(max_bucket)
        self.hash_mode = hash_mode

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
        # vectorized bit pack: bit i of the fingerprint = (votes[i] > 0)
        return int(((votes > 0).astype(np.uint64)
                    << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))

    @staticmethod
    def _simhash_fast(texts: List[Optional[str]]) -> np.ndarray:
        """uint64 fingerprints for a whole batch with zero per-doc Python:
        one explode + vectorized token hash, per-bit vote counts via
        ``add.reduceat`` over doc offsets, branch-free bit pack."""
        n = len(texts)
        out = np.zeros(n, dtype=np.uint64)
        if n == 0:
            return out
        _, flat, lens = _explode_tokens(texts)
        if len(flat) == 0:
            return out
        th = _hash_tokens_fast(flat)
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((th[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32)
        nonempty = np.nonzero(lens > 0)[0]
        starts = np.concatenate([[0], np.cumsum(lens)])[:-1][nonempty]
        ones = np.add.reduceat(bits, starts, axis=0)  # [n_nonempty, 64]
        votes = 2 * ones - lens[nonempty, None]
        out[nonempty] = ((votes > 0).astype(np.uint64) << shifts).sum(
            axis=1, dtype=np.uint64)
        return out

    def fingerprint_batch(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if self.hash_mode == "fast":
            signed = self._simhash_fast(texts).view(np.int64)
        else:
            cache: dict = {}
            hashes = [self.simhash(t, cache) for t in texts]
            signed = np.asarray(hashes, dtype=np.uint64).view(np.int64)
        return pa.table({
            self.id_col: batch[self.id_col],
            "simhash": pa.array(signed, type=pa.int64()),
        })

    def bank_rows(self, batch: pa.Table) -> pa.Table:
        fp = self.fingerprint_batch(batch)
        sh = fp["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = fp[self.id_col].to_numpy(zero_copy_only=False)
        n = len(ids)
        # [n_banks, n] 16-bit bank keys in one shift — no per-bank lists
        shifts = np.uint64(16) * np.arange(self.n_banks, dtype=np.uint64)
        keys = ((sh[None, :] >> shifts[:, None])
                & np.uint64(0xFFFF)).astype(np.int64)
        return pa.table({
            "bank_id": pa.array(
                np.repeat(np.arange(self.n_banks, dtype=np.int32), n),
                type=pa.int32()),
            "bank_key": pa.array(keys.ravel(), type=pa.int64()),
            self.id_col: pa.array(np.tile(ids, self.n_banks),
                                  type=pa.int64()),
            "simhash": pa.array(np.tile(sh.view(np.int64), self.n_banks),
                                type=pa.int64()),
        })

    def _bucket_pairs(self, group: pd.DataFrame) -> pd.DataFrame:
        """Vectorized in-bucket Hamming verification: triu pair indexing,
        XOR, and a branch-free unpackbits popcount — no Python pair loop.
        Bucket capped with a logged drop (hot banks, e.g. near-zero hashes
        of empty docs, degrade gracefully instead of going quadratic)."""
        g = group.drop_duplicates(self.id_col).sort_values(self.id_col)
        if len(g) < 2:
            # AFTER the dedup: a bucket whose rows collapse to one doc_id
            # must return empty here, not fall through to an empty
            # np.concatenate (mirrors MinHashDedup._bucket_pairs)
            return _empty_pairs("hamming", "int64")
        ids = g[self.id_col].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        if len(ids) > self.max_bucket:
            _cap_bucket(ids, self.max_bucket, f"SimHashDedup[{self.name}]")
            ids, sh = ids[:self.max_bucket], sh[:self.max_bucket]  # already id-sorted
        iu = np.triu_indices(len(ids), k=1)
        # chunk the pair axis: a full max_bucket=4096 bucket has 8.4M
        # pairs, and unpackbits scratch is 64 bytes/pair (~540 MB in one
        # shot) — bound peak memory to ~64 MB per group task instead
        CHUNK = 1_000_000
        out_a, out_b, out_h = [], [], []
        for s0 in range(0, len(iu[0]), CHUNK):
            a = iu[0][s0:s0 + CHUNK]
            b = iu[1][s0:s0 + CHUNK]
            x = sh[a] ^ sh[b]
            ham = np.unpackbits(x.view(np.uint8)).reshape(
                len(x), 8 * x.itemsize).sum(axis=1)
            hit = ham <= self.max_hamming
            out_a.append(ids[a[hit]])
            out_b.append(ids[b[hit]])
            out_h.append(ham[hit])
        return pd.DataFrame({
            "id_a": np.concatenate(out_a).astype(np.int64),
            "id_b": np.concatenate(out_b).astype(np.int64),
            "hamming": np.concatenate(out_h).astype(np.int64),
        })

    def candidate_pairs(self, ds, num_partitions: Optional[int] = None,
                        driver_dedupe_budget: int = 500_000):
        import ray.data as rd

        if num_partitions is None:
            # same sizing rationale as MinHashDedup: aggregator startup
            # scales with partition count, not data
            from ..agg import default_partitions

            num_partitions = default_partitions(4)
        rows = ds.map_batches(self.bank_rows, batch_format="pyarrow")
        cand = rows.groupby(["bank_id", "bank_key"],
                            num_partitions=num_partitions).map_groups(
            self._bucket_pairs, batch_format="pandas").materialize()
        # cross-bank dedupe: driver drop_duplicates when the raw candidate
        # rows are driver-sized (saves a whole shuffle), else bounded
        # pair-hash buckets (never a groupby keyed on the raw pair).
        # ``hamming`` is a deterministic function of the pair's two
        # fingerprints, so keeping the first occurrence is exactly the
        # old Min("hamming") result.
        if cand.count() > driver_dedupe_budget:
            return dedup_pair_stream(cand, num_partitions,
                                     keep_cols=("id_a", "id_b", "hamming"))
        df = cand.to_pandas().drop_duplicates(["id_a", "id_b"])
        if len(df) == 0:
            df = _empty_pairs("hamming", "int64")
        return rd.from_pandas(df.reset_index(drop=True))


def cluster_pairs(pairs: pd.DataFrame, id_a: str = "id_a",
                  id_b: str = "id_b") -> pd.DataFrame:
    """Connected components over a near-dup pair list (union-find):
    (doc_id, cluster_id) with ``cluster_id`` = min doc_id in the component.

    Driver-side by design: the pair list is the VERIFIED near-dup set —
    tiny relative to the corpus (and the LSH stages bound it via
    ``max_bucket``/``broadcast_pairs_budget``).  Path-halving union-find,
    O(pairs * α)."""
    a = pairs[id_a].to_numpy().astype(np.int64)
    b = pairs[id_b].to_numpy().astype(np.int64)
    ids = np.unique(np.concatenate([a, b]))
    index = {int(i): j for j, i in enumerate(ids)}
    parent = np.arange(len(ids))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(index[int(x)]), find(index[int(y)])
        if rx != ry:
            # union by id order so the root is always the smallest id
            if ids[rx] < ids[ry]:
                parent[ry] = rx
            else:
                parent[rx] = ry
    roots = np.array([find(i) for i in range(len(ids))])
    return pd.DataFrame({"doc_id": ids,
                         "cluster_id": ids[roots]}).astype(np.int64)


def _nonempty_blocks(ds_in):
    """Rebuild a Dataset from only its non-empty blocks (block REFS move,
    data stays in the object store).  Ray 2.49's shuffle aggregators emit
    zero-row blocks with an EMPTY schema for key-less partitions; a
    downstream ``Dataset.join`` then fails with ``ArrowInvalid: no match
    for key field`` when such a block poisons a join partition's schema.
    Returns None when every block is empty."""
    import ray
    import ray.data as rd

    refs = []
    for bundle in ds_in.materialize().iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return None
    return rd.from_arrow_refs(refs)


def distributed_components(pairs, num_partitions: Optional[int] = None,
                           max_rounds: int = 10_000):
    """Distributed connected components over an (id_a, id_b) edge-list
    Dataset: returns a ``(doc_id, cluster_id)`` Dataset with
    ``cluster_id`` = min doc_id in the component — the same semantics as
    the driver-side :func:`cluster_pairs`, computed without ever pulling
    the edge list to one machine.

    Min-label propagation: per round the current labels hash-join onto
    the (static) edge list, each edge pushes ``min(label_a, label_b)`` to
    both endpoints, and a hash combine keeps each node's min.  Labels
    only ever decrease, so an unchanged label sum is a fixpoint; rounds
    are bounded by the component diameter (near-dup clusters are
    small-diameter in practice — a chain of r rounds covers diameter
    2^0+..: linear here, diameter rounds worst case).  Shuffle inventory
    per round: two bounded-partition hash joins + one hash combine, all
    keyed on node id — never on the pair.
    """
    from ..agg import combine_partials, default_partitions

    if num_partitions is None:
        num_partitions = default_partitions(4)
    edges = pairs.select_columns(["id_a", "id_b"]).materialize()

    def node_rows(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t["id_a"].to_numpy(zero_copy_only=False),
            t["id_b"].to_numpy(zero_copy_only=False)]).astype(np.int64))
        return pa.table({"doc_id": pa.array(u, type=pa.int64()),
                         "label": pa.array(u, type=pa.int64())})

    labels = combine_partials(
        edges.map_batches(node_rows, batch_format="pyarrow"),
        keys=["doc_id"], value_cols=["label"], mode="hash", agg="min",
        num_partitions=num_partitions).materialize()

    def label_sum(st) -> int:
        return int(st.map_batches(
            lambda t: pa.table({"s": pa.array(
                [t["label"].to_numpy(zero_copy_only=False).sum()])}),
            batch_format="pyarrow").sum("s"))

    def scatter(t: pa.Table) -> pa.Table:
        la = t["la"].to_numpy(zero_copy_only=False).astype(np.int64)
        lb = t["lb"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.minimum(la, lb)
        return pa.table({
            "doc_id": pa.array(np.concatenate([
                t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64),
                t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)])),
            "label": pa.array(np.concatenate([m, m])),
        })

    prev = label_sum(labels)
    for _ in range(max_rounds):
        a = labels.map_batches(
            lambda t: t.rename_columns(["id_a", "la"]),
            batch_format="pyarrow")
        b = labels.map_batches(
            lambda t: t.rename_columns(["id_b", "lb"]),
            batch_format="pyarrow")
        j = edges.join(a, join_type="inner", on=("id_a",),
                       num_partitions=num_partitions)
        j = j.join(b, join_type="inner", on=("id_b",),
                   num_partitions=num_partitions)
        msgs = j.map_batches(scatter, batch_format="pyarrow")
        labels = combine_partials(
            labels.union(msgs), keys=["doc_id"], value_cols=["label"],
            mode="hash", agg="min",
            num_partitions=num_partitions).materialize()
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                            "cluster_id": t["label"].cast(pa.int64())}),
        batch_format="pyarrow")


def _best_score_drop(ds, clusters: pd.DataFrame, id_col: str,
                     score_col: str) -> np.ndarray:
    """Drop set for quality-based survivor selection (driver path):
    fetch scores for the CLUSTERED ids only (bounded by 2x the pair
    budget that admitted this path — one broadcast-filtered streaming
    projection, no shuffle), then keep each cluster's (score DESC,
    id ASC) winner."""
    import ray

    ids_ref = ray.put(np.sort(clusters["doc_id"].to_numpy()))

    def project(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = np.isin(ids, ray.get(ids_ref))
        sc = batch[score_col].to_numpy(zero_copy_only=False)[m]
        return pa.table({"doc_id": pa.array(ids[m].astype(np.int64)),
                         "_score": pa.array(sc)})

    scores = ds.map_batches(project, batch_format="pyarrow").to_pandas()
    merged = clusters.merge(scores, on="doc_id", how="inner")
    merged = merged.sort_values(["cluster_id", "_score", "doc_id"],
                                ascending=[True, False, True],
                                kind="mergesort")
    surv = merged.drop_duplicates("cluster_id")["doc_id"].to_numpy()
    all_ids = clusters["doc_id"].to_numpy()
    return all_ids[~np.isin(all_ids, surv)]


def near_dedup(ds, dedup: "MinHashDedup", exact_first: bool = True,
               pair_budget: int = 2_000_000,
               exact_broadcast_budget: int = 2_000_000,
               score_col: Optional[str] = None):
    """End-to-end near-duplicate removal: LSH candidate pairs -> verified
    pairs -> connected components -> drop every doc that is not its
    cluster's survivor.  The survivor is the minimum id by default; with
    ``score_col`` it is the cluster's BEST-QUALITY doc (max score, ties
    to the smallest id) — what production curation actually keeps (the
    longest / highest-scoring copy), cf. the representative-selection
    step of large-scale dedup pipelines.  ``score_col`` must be
    content-derived (identical texts must score identically) for
    ``exact_first`` to preserve semantics: exact twins collapse to their
    min id first, which IS their (score DESC, id ASC) winner when scores
    are equal.  Returns the SURVIVOR Dataset (same schema as the
    input).  The LSH leg never shuffles anything row-shaped (band
    rows are three small ints; the drop set ships as a broadcast numpy
    array); ``exact_first`` adds ONE content-hash row exchange up front
    (the standard exact-dedup shuffle — rows co-locate by content hash
    once), avoidable with ``exact_first=False`` when the corpus is known
    exact-dup-free.

    ``exact_first`` (default, the standard curation order) collapses
    byte-identical content with :class:`ExactDedup` BEFORE the LSH
    chain.  Semantics are IDENTICAL: identical docs share every band key
    (same signature) so they always land in one LSH cluster, and each
    exact group's min id is its survivor, so the combined cluster's min
    is unchanged.  What changes is scale robustness — a corpus of
    near-identical copies (mirrors, boilerplate) otherwise pushes
    O(copies^2) candidate pairs per band into the shuffle (measured: the
    920k-doc x200-replicated stress corpus exceeded 20 min without this
    and runs in seconds with it).

    ``pair_budget`` guards the driver: up to the budget the verified
    pairs collapse through the O(pairs·α) driver union-find and the drop
    set broadcasts; above it (templated near-identical content that
    survives exact_first) clustering runs as
    :func:`distributed_components` and the drop set applies as a
    distributed left-anti hash join — nothing corpus-scale ever lands on
    the driver, at the cost of one id-keyed shuffle of the survivor
    stream."""
    import ray

    id_col = dedup.id_col
    if exact_first:
        ex = ExactDedup("near_dedup_exact", key=dedup.text_col,
                        id_col=id_col)
        # survivors() shuffles only (hash, id); when the survivor id set
        # is broadcastable the full-row co-location shuffle of apply()
        # is skipped entirely (the row stream stays unshuffled — one
        # isin filter).  Above the budget, apply()'s hash-partitioned
        # first-wins is the honest path.
        surv = ex.survivors(ds).materialize()
        if surv.count() <= exact_broadcast_budget:
            keep_ids = np.sort(surv.to_pandas()[id_col].to_numpy())
            keep_ref = ray.put(keep_ids)

            def keep_exact(batch: pa.Table) -> pa.Table:
                ids = batch[id_col].to_numpy(zero_copy_only=False)
                return batch.filter(pa.array(np.isin(ids, ray.get(keep_ref))))

            ds = ds.map_batches(keep_exact, batch_format="pyarrow")
        else:
            ds = ex.apply(ds).drop_columns(["_content_hash"])
    pairs_ds = dedup.candidate_pairs(ds).materialize()
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return ds

    if n_pairs <= pair_budget:
        clusters = cluster_pairs(pairs_ds.to_pandas())
        if score_col is None:
            drop = clusters.loc[clusters["doc_id"] != clusters["cluster_id"],
                                "doc_id"].to_numpy()
        else:
            drop = _best_score_drop(ds, clusters, id_col, score_col)
        drop_ref = ray.put(np.sort(drop))

        def keep(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(~np.isin(ids, ray.get(drop_ref))))

        return ds.map_batches(keep, batch_format="pyarrow")

    logger.warning(
        "near_dedup: %d verified pairs exceed the %d driver budget — "
        "running distributed connected components + anti-join removal",
        n_pairs, pair_budget)
    from ..agg import default_partitions

    num_partitions = default_partitions(4)
    clusters_ds = distributed_components(pairs_ds, num_partitions)

    def drop_rows(t: pa.Table) -> pa.Table:
        f = t.filter(pa.compute.not_equal(t["doc_id"], t["cluster_id"]))
        return pa.table({id_col: f["doc_id"],
                         "_drop": pa.array(np.ones(len(f), dtype=np.int8))})

    if score_col is not None:
        # per-cluster best-quality survivor: join scores onto the
        # component labels (id-keyed, small ints), then one map_groups
        # argmax — never corpus rows, never the driver
        def project_score(t: pa.Table) -> pa.Table:
            return pa.table({"doc_id": t[id_col].cast(pa.int64()),
                             "_score": t[score_col]})

        score_ds = ds.map_batches(project_score, batch_format="pyarrow")
        with_scores = clusters_ds.join(
            score_ds, join_type="inner", on=("doc_id",),
            num_partitions=num_partitions)

        def nonbest(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["_score", "doc_id"],
                              ascending=[False, True], kind="mergesort")
            return pd.DataFrame({
                id_col: g["doc_id"].iloc[1:].to_numpy(),
                "_drop": np.ones(max(len(g) - 1, 0), dtype=np.int8)})

        drop_src = with_scores.groupby("cluster_id").map_groups(
            nonbest, batch_format="pandas")
    else:
        drop_src = clusters_ds.map_batches(drop_rows, batch_format="pyarrow")

    drop_ds = _nonempty_blocks(drop_src)
    if drop_ds is None:
        return ds
    joined = ds.join(drop_ds, join_type="left_outer", on=(id_col,),
                     num_partitions=num_partitions)
    return joined.map_batches(
        lambda t: t.filter(pa.compute.is_null(t["_drop"]))
        .drop_columns(["_drop"]),
        batch_format="pyarrow")


def chunk_dup_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                    chunk_tokens: int = 8, num_partitions: Optional[int] = None):
    """Cross-document duplicated-chunk fraction — the corpus-level
    repetition signal (which spans of a doc also appear verbatim in
    OTHER docs; cf. "Deduplicating Training Data Makes Language Models
    Better", Lee et al. 2022 — public literature).

    Per doc: NON-OVERLAPPING ``chunk_tokens``-token windows, each hashed
    with the same sha256-prefix + rolling-fold math as
    :func:`shingle_hashes` (so a SQL engine replays it); the incomplete
    tail window is dropped.  A chunk is "duplicated" when its hash
    occurs in more than one DISTINCT document — a chunk repeated twice
    within a single doc does not count (that is within-doc repetition,
    covered by ``text.RepetitionStats``); ``n_chunks`` still counts
    chunk POSITIONS per doc, so a dup chunk appearing at two positions
    in a doc contributes 2 to ``n_dup_chunks``.

    Shuffle inventory: one chunk-keyed hash combine over per-batch
    DISTINCT (doc, chunk) pairs for the doc counts and one chunk-keyed
    hash join back onto the (doc, chunk) rows — both move only (hash,
    small ints), never text.  Returns a Dataset
    ``(doc_id, n_chunks, n_dup_chunks, dup_chunk_frac)``; the fraction
    is one exact-int f64 division.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..agg import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions(4)
    w = int(chunk_tokens)
    P = np.uint64(1099511628211)

    def chunk_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        cache: dict = {}
        out_id, out_h = [], []
        for i, t in zip(ids, batch[text_col].to_pylist()):
            toks = tokenize(t or "")
            k = len(toks) // w
            if k == 0:
                continue
            th = np.fromiter(
                (cache.setdefault(x, _stable_token_hash(x))
                 for x in toks[:k * w]), dtype=np.uint64, count=k * w
            ).reshape(k, w)
            h = np.zeros(k, dtype=np.uint64)
            for j in range(w):
                h = h * P + th[:, j]
            out_id.append(np.full(k, i, dtype=np.int64))
            out_h.append(h.view(np.int64))
        if not out_id:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.int64()),
                             "nc": pa.array([], pa.int64())})
        return pa.table({
            id_col: pa.array(np.concatenate(out_id), type=pa.int64()),
            "chunk": pa.array(np.concatenate(out_h), type=pa.int64()),
            "nc": pa.array(np.ones(sum(len(x) for x in out_id),
                                   dtype=np.int64)),
        })

    rows = ds.map_batches(chunk_rows, batch_format="pyarrow").materialize()
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "n_chunks": pa.array([], pa.int64()),
                      "n_dup_chunks": pa.array([], pa.int64()),
                      "dup_chunk_frac": pa.array([], pa.float64())})
    if rows.count() == 0:
        return rd.from_arrow(empty)

    def pair_distinct(batch: pa.Table) -> pa.Table:
        # distinct (doc, chunk) per batch; docs never span batches and
        # doc_ids are globally unique, so summing these gives the exact
        # distinct-DOC count per chunk
        df = batch.to_pandas()[[id_col, "chunk"]].drop_duplicates()
        return pa.table({
            "chunk": pa.array(df["chunk"].to_numpy(), type=pa.int64()),
            "nc": pa.array(np.ones(len(df), dtype=np.int64)),
        })

    counts = rows.map_batches(pair_distinct, batch_format="pyarrow").groupby(
        "chunk", num_partitions=num_partitions).aggregate(
        Sum("nc", alias_name="total"))
    joined = rows.join(counts, join_type="inner", on=("chunk",),
                       num_partitions=num_partitions)

    def per_doc(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["dup"] = (df["total"] > 1).astype(np.int64)
        out = df.groupby(id_col, sort=False).agg(
            n_chunks=("chunk", "size"), n_dup_chunks=("dup", "sum")
        ).reset_index()
        for c in ("n_chunks", "n_dup_chunks"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    # per-doc partial counts shrink inside the map; one id-keyed combine
    from ..agg import combine_partials

    agg = combine_partials(
        joined.map_batches(per_doc, batch_format="pyarrow"),
        keys=[id_col], value_cols=["n_chunks", "n_dup_chunks"], mode="hash",
        num_partitions=num_partitions)

    def finish(batch: pa.Table) -> pa.Table:
        nc = batch["n_chunks"].to_numpy(zero_copy_only=False).astype(np.int64)
        nd = batch["n_dup_chunks"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "n_chunks": pa.array(nc, type=pa.int64()),
            "n_dup_chunks": pa.array(nd, type=pa.int64()),
            "dup_chunk_frac": pa.array(nd / nc, type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def _doc_chunk_hashes(toks: List[str], width: int,
                      cache: dict) -> np.ndarray:
    """uint64 rolling hashes of the NON-OVERLAPPING ``width``-token
    windows of ``toks`` (incomplete tail window dropped) — the exact
    math of :func:`chunk_dup_stats` (sha256-prefix token hash + FNV
    fold from zero), shared so removal and stats agree bit-for-bit."""
    k = len(toks) // width
    if k == 0:
        return np.array([], dtype=np.uint64)
    th = np.fromiter(
        (cache.setdefault(x, _stable_token_hash(x))
         for x in toks[:k * width]), dtype=np.uint64, count=k * width
    ).reshape(k, width)
    P = np.uint64(1099511628211)
    h = np.zeros(k, dtype=np.uint64)
    for j in range(width):
        h = h * P + th[:, j]
    return h


def remove_dup_spans(ds, text_col: str = "text", id_col: str = "doc_id",
                     chunk_tokens: int = 8, min_count: int = 2,
                     common_budget: int = 5_000_000,
                     num_partitions: Optional[int] = None):
    """Duplicated-span REMOVAL: drop every non-overlapping
    ``chunk_tokens``-token window whose hash occurs in at least
    ``min_count`` DISTINCT documents, and rebuild each document's text
    from the surviving tokens (cf. the duplicated-substring removal of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022, and C4's repeated-line rule — public literature; the
    reference engine has no equivalent, this extends the dedup family
    the way SURVEY.md §2.5 extends selection).

    Semantics (SQL-replayable, shared with :func:`chunk_dup_stats`):
    tokens are ``text.lower().split()``; chunk hashes are the
    sha256-prefix + FNV-fold math of :func:`_doc_chunk_hashes`; the
    incomplete tail window is never removed; a chunk repeated only
    WITHIN one document is not "common" (within-doc repetition belongs
    to ``text.RepetitionStats``) but once a chunk is common, every one
    of its positions is removed from every document.  ``clean_text`` is
    the ``" ".join`` of the surviving lowercased tokens — whitespace is
    normalized even for untouched documents (one deterministic rule on
    both sides of the oracle).

    Shuffle inventory: ONE chunk-keyed hash combine over per-batch
    DISTINCT (doc, chunk) pairs — small ints only, text never moves.
    The common-chunk set (bounded by cross-document boilerplate, not by
    corpus size) is collected on the driver under ``common_budget`` and
    broadcast with ``ray.put``; the corpus side then streams through one
    ``map_batches`` rebuild pass with no shuffle.  Over budget the stage
    raises loudly (raise ``chunk_tokens``/``min_count`` or pre-split the
    corpus) instead of silently OOMing the driver — the
    ``Decontaminate.eval_budget`` contract.

    Returns a Dataset ``(doc_id, clean_text, n_chunks, n_removed)``
    covering EVERY input document (short docs pass through with
    ``n_chunks=0``).
    """
    import ray
    from ray.data.aggregate import Sum

    from ..agg import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions(4)
    w = int(chunk_tokens)

    def pair_distinct(batch: pa.Table) -> pa.Table:
        # distinct (doc, chunk) per batch -> (chunk, 1) rows; a row (doc)
        # lives in exactly one batch and doc_ids are globally unique, so
        # summing gives the exact distinct-document count per chunk
        cache: dict = {}
        parts = [np.unique(_doc_chunk_hashes(tokenize(t or ""), w, cache))
                 for t in batch[text_col].to_pylist()]
        parts = [p for p in parts if p.size]
        if not parts:
            return pa.table({"chunk": pa.array([], pa.int64()),
                             "nd": pa.array([], pa.int64())})
        h = np.concatenate(parts)
        return pa.table({
            "chunk": pa.array(h.view(np.int64), type=pa.int64()),
            "nd": pa.array(np.ones(h.size, dtype=np.int64)),
        })

    counts = ds.map_batches(pair_distinct, batch_format="pyarrow").groupby(
        "chunk", num_partitions=num_partitions).aggregate(
        Sum("nd", alias_name="ndocs"))

    def only_common(batch: pa.Table) -> pa.Table:
        mask = pa.compute.greater_equal(batch["ndocs"], min_count)
        return batch.filter(mask).select(["chunk"])

    common_ds = counts.map_batches(
        only_common, batch_format="pyarrow").materialize()
    n_common = common_ds.count()
    if n_common > common_budget:
        raise ValueError(
            f"remove_dup_spans: {n_common} common chunks exceed the "
            f"{common_budget} driver broadcast budget — raise chunk_tokens/"
            "min_count or process the corpus in shards")
    if n_common:
        common = np.sort(
            common_ds.to_pandas()["chunk"].to_numpy().view(np.uint64))
    else:
        common = np.array([], dtype=np.uint64)
    ref = ray.put(common)

    def rebuild(batch: pa.Table) -> pa.Table:
        com = ray.get(ref)  # zero-copy plasma read
        cache: dict = {}
        out_text, out_nc, out_nr = [], [], []
        for t in batch[text_col].to_pylist():
            toks = tokenize(t or "")
            h = _doc_chunk_hashes(toks, w, cache)
            k = h.size
            out_nc.append(k)
            if k == 0 or com.size == 0:
                out_nr.append(0)
                out_text.append(" ".join(toks))
                continue
            pos = np.searchsorted(com, h)
            dup = (pos < com.size) & (
                com[np.minimum(pos, com.size - 1)] == h)
            nr = int(np.count_nonzero(dup))
            out_nr.append(nr)
            if nr == 0:
                out_text.append(" ".join(toks))
            else:
                keep = np.ones(len(toks), dtype=bool)
                keep[:k * w] = ~np.repeat(dup, w)
                out_text.append(
                    " ".join(x for x, m in zip(toks, keep) if m))
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "clean_text": pa.array(out_text, type=pa.string()),
            "n_chunks": pa.array(np.asarray(out_nc, dtype=np.int64)),
            "n_removed": pa.array(np.asarray(out_nr, dtype=np.int64)),
        })

    return ds.map_batches(rebuild, batch_format="pyarrow")


def build_dedup_index(ds, index_dir: str, key: str = "text",
                      id_col: str = "doc_id", run_id: str = "base",
                      num_partitions: Optional[int] = None):
    """Write (or overwrite) one run's content-hash index shard:
    ``index_dir/run-<run_id>/`` parquet of ``(_content_hash, id)`` —
    one row per DISTINCT content in ``ds`` (min id).  Re-running the
    same ``run_id`` overwrites its own shard only, so a killed index
    build resumes idempotently; other runs' shards are untouched."""
    import os

    dd = ExactDedup("index_build", key=key, id_col=id_col)
    surv = dd.survivors(ds, num_partitions=num_partitions)
    path = os.path.join(index_dir, f"run-{run_id}")
    surv.write_parquet(path, mode="overwrite")
    return path


def incremental_dedup(ds, index_dir: str, key: str = "text",
                      id_col: str = "doc_id",
                      run_id: Optional[str] = None,
                      broadcast_budget: int = 2_000_000,
                      num_partitions: Optional[int] = None):
    """Dedup an INCREMENT against all previously indexed runs — the
    daily-crawl lifecycle: rows survive iff their content hash is new
    both within the increment (min ``id_col`` wins) and against every
    ``run-*`` shard already in ``index_dir``.

    Scale shape: within-increment dedupe is the ExactDedup shuffle
    ((hash, id) rows only); the index check broadcasts the sorted hash
    array when the index is ``<= broadcast_budget`` hashes (one
    ``ray.put``, per-batch ``np.isin``) and otherwise left-outer hash
    joins against the index Dataset with a null-marker filter — the
    same honest fallback pair as everywhere else in this module.  With
    ``run_id`` set, the survivors' hashes are appended as a new index
    shard (idempotent per run_id), so the NEXT increment sees them.
    """
    import os

    import ray
    import ray.data as rd

    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)
    dd = ExactDedup("incremental", key=key, id_col=id_col)
    within = dd.apply(ds).materialize()

    # expand run dirs to files: Ray's read_parquet only walks
    # directories when given a single path, not a list.  The CURRENT
    # run_id's own shard is excluded — a replayed/resumed run must not
    # see its earlier attempt's hashes (it would filter everything out
    # and then overwrite its shard with nothing: data loss on retry).
    shards = sorted(
        os.path.join(index_dir, p, f) for p in
        (os.listdir(index_dir) if os.path.isdir(index_dir) else [])
        if p.startswith("run-") and p != f"run-{run_id}"
        for f in os.listdir(os.path.join(index_dir, p))
        if f.endswith(".parquet"))
    if shards:
        index = rd.read_parquet(shards, columns=["_content_hash"])
        n_idx = index.count()
        if n_idx <= broadcast_budget:
            known = np.sort(np.asarray(
                index.to_pandas()["_content_hash"], dtype=object))
            ref = ray.put(known)

            def drop_known(batch: pa.Table) -> pa.Table:
                h = np.asarray(batch["_content_hash"].to_pylist(),
                               dtype=object)
                return batch.filter(pa.array(
                    ~np.isin(h, ray.get(ref))))

            within = within.map_batches(drop_known, batch_format="pyarrow")
        else:
            logger.warning(
                "incremental_dedup: %d indexed hashes exceed the %d "
                "broadcast budget — joining against the index", n_idx,
                broadcast_budget)
            marked = index.map_batches(
                lambda t: t.append_column(
                    "_known", pa.array(np.ones(len(t), dtype=np.int8))),
                batch_format="pyarrow")
            joined = within.join(marked, join_type="left_outer",
                                 on=("_content_hash",),
                                 num_partitions=num_partitions)
            within = joined.map_batches(
                lambda t: t.drop_columns(["_known"]).filter(
                    pa.compute.is_null(t["_known"])),
                batch_format="pyarrow")

    if run_id is not None:
        surv = within.select_columns(["_content_hash", id_col])
        surv.write_parquet(os.path.join(index_dir, f"run-{run_id}"),
                           mode="overwrite")
    return within

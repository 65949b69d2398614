"""Bloom-prefilter benchmark decontamination: exact results without ever
materializing the eval-side shingle set on the driver.

:class:`.decontam.Decontaminate` broadcasts the eval set's DISTINCT
shingle hashes as one sorted array — the right shape while benchmarks are
small, but it hard-caps the eval side at the driver budget (20M hashes ≈
160 MB).  Decontaminating against a large held-out corpus (every test
split of every benchmark, or a whole eval SUITE) breaks that cap.  This
stage removes it with the classic two-pass Bloom shape:

1. **Bloom build** — one streaming pass over the eval set folds each
   block's shingle hashes into an ``m``-bit Bloom bitmap (``k`` double-
   hashed probes per key); block bitmaps are OR-merged on the driver at
   a fixed ``m/8`` bytes of memory REGARDLESS of eval cardinality.
2. **Corpus scan** — one ``map_batches`` pass tests every document's
   shingles against the broadcast bitmap (``ray.put`` once, zero-copy
   plasma reads).  Bloom has no false negatives, so a doc whose
   bloom-hit fraction is below the threshold is DEFINITIVELY clean and
   never leaves its task; only the rare bloom-flagged candidates emit
   their bloom-hit shingles (budget-guarded — candidates are the
   contamination rate plus the documented false-positive rate).
3. **Exact verify** — the small candidate shingle set broadcasts and the
   EVAL set streams once more against it, emitting only matched hashes
   (bounded by the candidate set, not the eval set).  Exact per-doc hit
   counts follow on the driver over candidate-sized arrays.

The output on contaminated docs is bit-identical to
``Decontaminate.stats`` (same sha256-prefix + FNV-roll shingles from
``dedup.shingle_hashes``), so it sits under the same hash-exact DuckDB
oracle.  False positives only ever cost verify work, never correctness.

Reference analogue: none (SURVEY.md §2.5 extension, like the dedup
family).  Partitioning assumption: none — no shuffle anywhere; both big
sides only stream.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from .dedup import shingle_hashes

__all__ = ["BloomDecontaminate", "bloom_build", "bloom_test"]


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain constant set), wrapping uint64."""
    x = np.asarray(x, dtype=np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _probe_indices(h: np.ndarray, i: int, m_bits: int) -> np.ndarray:
    """i-th double-hashing probe index for each key (Kirsch–Mitzenmacher:
    idx_i = h1 + i*h2 mod m, h2 forced odd so probes cycle the full ring)."""
    h1 = np.asarray(h, dtype=np.uint64)
    h2 = _mix64(h1) | np.uint64(1)
    return (h1 + np.uint64(i) * h2) & np.uint64(m_bits - 1)


def bloom_build(hashes: np.ndarray, m_bits: int, k: int,
                out: Optional[np.ndarray] = None) -> np.ndarray:
    """Set the k probe bits of every hash into an ``m_bits`` bitmap
    (uint8 array of m_bits/8 bytes); ``out`` accumulates across calls."""
    bloom = out if out is not None else np.zeros(m_bits // 8, dtype=np.uint8)
    h = np.asarray(hashes, dtype=np.uint64)
    for i in range(k):
        idx = _probe_indices(h, i, m_bits)
        np.bitwise_or.at(bloom, (idx >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)))
    return bloom


def bloom_test(hashes: np.ndarray, bloom: np.ndarray, k: int) -> np.ndarray:
    """Boolean membership-possible mask (no false negatives)."""
    h = np.asarray(hashes, dtype=np.uint64)
    m_bits = len(bloom) * 8
    member = np.ones(len(h), dtype=bool)
    for i in range(k):
        idx = _probe_indices(h, i, m_bits)
        bits = bloom[(idx >> np.uint64(3)).astype(np.int64)]
        member &= ((bits >> (idx & np.uint64(7)).astype(np.uint8))
                   & np.uint8(1)).astype(bool)
    return member


class BloomDecontaminate:
    """Exact decontamination stats for contaminated docs via a Bloom
    prefilter; the eval side streams (twice) and never hits the driver.

    Parameters
    ----------
    m_bits : Bloom size in bits (power of two).  ~10 bits per distinct
        eval shingle gives <1% false positives at k=4.
    k : probes per key.
    cand_budget : max bloom-flagged candidate (doc, shingle) rows pulled
        to the driver for the verify pass — contamination is rare by
        construction, so a blowout here means m_bits is undersized for
        the eval cardinality; fail loudly with that diagnosis.
    """

    def __init__(self, name: str, width: int = 3, threshold: float = 0.5,
                 text_col: str = "text", id_col: str = "doc_id",
                 m_bits: int = 1 << 23, k: int = 4,
                 cand_budget: int = 5_000_000):
        if m_bits & (m_bits - 1):
            raise ValueError("BloomDecontaminate: m_bits must be a power "
                             "of two")
        self.name = name
        self.width = width
        self.threshold = threshold
        self.text_col = text_col
        self.id_col = id_col
        self.m_bits = m_bits
        self.k = k
        self.cand_budget = cand_budget

    # -- pass 1: eval -> bitmap ---------------------------------------------
    def build_bloom(self, eval_ds) -> np.ndarray:
        """OR-fold the eval set's shingle hashes into one bitmap.  Driver
        memory is m_bits/8 bytes, independent of eval cardinality."""
        text_col, width = self.text_col, self.width
        m_bits, k = self.m_bits, self.k

        def block_bloom(batch: pa.Table) -> pa.Table:
            cache: dict = {}
            bm = np.zeros(m_bits // 8, dtype=np.uint8)
            for t in batch[text_col].to_pylist():
                bloom_build(shingle_hashes(t or "", width, cache),
                            m_bits, k, out=bm)
            return pa.table({"bloom": pa.array([bm.tobytes()],
                                               type=pa.large_binary())})

        acc = np.zeros(m_bits // 8, dtype=np.uint8)
        per_block = eval_ds.map_batches(block_bloom, batch_format="pyarrow")
        for b in per_block.iter_batches(batch_format="pyarrow"):
            for buf in b["bloom"].to_pylist():
                np.bitwise_or(acc, np.frombuffer(buf, dtype=np.uint8),
                              out=acc)
        return acc

    # -- pass 2: corpus scan -> candidates -----------------------------------
    def candidates(self, corpus_ds, bloom):
        """Bloom-flagged docs' bloom-hit shingles:
        ``(id_col, shingle, n_shingles)`` rows.  Docs below the threshold
        on the bloom (superset) fraction are definitively clean and emit
        nothing — the 100 TB side never shuffles, only candidates leave.
        """
        import ray

        ref = (bloom if isinstance(bloom, ray.ObjectRef)
               else ray.put(np.asarray(bloom, dtype=np.uint8)))
        text_col, id_col, width = self.text_col, self.id_col, self.width
        k, thr = self.k, self.threshold

        def scan(batch: pa.Table) -> pa.Table:
            bm = ray.get(ref)  # zero-copy plasma read
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            texts = batch[text_col].to_pylist()
            cache: dict = {}
            out_id, out_sh, out_n = [], [], []
            for i, t in zip(ids, texts):
                sh = shingle_hashes(t or "", width, cache)
                hit = bloom_test(sh, bm, k)
                nh = int(np.count_nonzero(hit))
                if nh and nh / sh.size >= thr:     # no-FN bound
                    out_id.append(np.full(nh, i, dtype=np.int64))
                    out_sh.append(sh[hit])
                    out_n.append(np.full(nh, sh.size, dtype=np.int64))
            if not out_id:
                return pa.table({id_col: pa.array([], type=pa.int64()),
                                 "shingle": pa.array([], type=pa.uint64()),
                                 "n_shingles": pa.array([],
                                                        type=pa.int64())})
            return pa.table({
                id_col: pa.array(np.concatenate(out_id)),
                "shingle": pa.array(np.concatenate(out_sh),
                                    type=pa.uint64()),
                "n_shingles": pa.array(np.concatenate(out_n))})

        return corpus_ds.map_batches(scan, batch_format="pyarrow")

    # -- pass 3: exact verify -------------------------------------------------
    def stats(self, corpus_ds, eval_ds):
        """Exact ``(id_col, n_shingles, n_hit, overlap_frac)`` for every
        contaminated doc (bit-identical to ``Decontaminate.stats`` rows
        with ``contaminated = 1``).  Returns a pandas DataFrame — the
        result is contamination-sized by definition."""
        import pandas as pd
        import ray

        bloom = self.build_bloom(eval_ds)
        cand = self.candidates(corpus_ds, bloom).materialize()
        n_cand = cand.count()
        if n_cand > self.cand_budget:
            raise ValueError(
                f"BloomDecontaminate: {n_cand} candidate shingle rows "
                f"exceed the {self.cand_budget} driver budget — either "
                "contamination is corpus-scale or m_bits is undersized "
                "for the eval cardinality (raise m_bits)")
        local = cand.to_pandas()  # bounded: guarded above
        if not len(local):
            return pd.DataFrame({
                self.id_col: pd.Series([], dtype=np.int64),
                "n_shingles": pd.Series([], dtype=np.int64),
                "n_hit": pd.Series([], dtype=np.int64),
                "overlap_frac": pd.Series([], dtype=np.float64)})

        cand_sh = np.unique(local["shingle"].to_numpy().astype(np.uint64))
        ref = ray.put(cand_sh)
        text_col, width = self.text_col, self.width

        def matched(batch: pa.Table) -> pa.Table:
            # eval streams AGAINST the small candidate set; emits only
            # intersections, bounded by the candidate set size
            cs = ray.get(ref)
            cache: dict = {}
            hits = []
            for t in batch[text_col].to_pylist():
                sh = shingle_hashes(t or "", width, cache)
                pos = np.searchsorted(cs, sh)
                inb = pos < cs.size
                hits.append(sh[inb & (cs[np.minimum(pos, cs.size - 1)]
                                      == sh)])
            u = (np.unique(np.concatenate(hits)) if hits
                 else np.array([], dtype=np.uint64))
            return pa.table({"shingle": pa.array(u, type=pa.uint64())})

        got = eval_ds.map_batches(matched, batch_format="pyarrow").to_pandas()
        in_eval = np.unique(got["shingle"].to_numpy().astype(np.uint64)) \
            if len(got) else np.array([], dtype=np.uint64)

        # exact per-doc hit counts over candidate-sized arrays
        sh = local["shingle"].to_numpy().astype(np.uint64)
        pos = np.searchsorted(in_eval, sh)
        inb = pos < in_eval.size
        is_hit = inb.copy()
        if in_eval.size:
            is_hit[inb] = in_eval[pos[inb]] == sh[inb]
        per = (pd.DataFrame({self.id_col: local[self.id_col],
                             "n_shingles": local["n_shingles"],
                             "hit": is_hit.astype(np.int64)})
               .groupby([self.id_col, "n_shingles"], as_index=False)["hit"]
               .sum())
        frac = per["hit"].to_numpy() / per["n_shingles"].to_numpy()
        keep = frac >= self.threshold   # drop bloom false-positive docs
        out = pd.DataFrame({
            self.id_col: per[self.id_col].to_numpy()[keep],
            "n_shingles": per["n_shingles"].to_numpy()[keep],
            "n_hit": per["hit"].to_numpy()[keep],
            "overlap_frac": frac[keep]})
        return out.sort_values(self.id_col).reset_index(drop=True)

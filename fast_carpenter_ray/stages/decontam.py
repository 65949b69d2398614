"""Benchmark decontamination: flag corpus documents whose word n-grams
overlap an evaluation/benchmark set.

The standard LLM-training hygiene step (the reference has no equivalent —
this extends the engine the same way the dedup family does, SURVEY.md
§2.5): before training, every document whose n-gram overlap with a held
-out benchmark exceeds a threshold must be dropped, or the benchmark is
compromised.

Ray-native shape — the one decontamination wants at 100 TB:

* the EVAL side is small by definition (benchmarks are a few thousand
  documents), so its distinct shingle-hash set is collected once on the
  driver under an explicit row budget and broadcast with ``ray.put``
  (one object-store copy per node, zero-copy numpy reads in every task);
* the CORPUS side then streams through ONE ``map_batches`` pass — a
  sorted-array membership test (``np.searchsorted``) per document — with
  no shuffle at all: the 100 TB side never moves, only per-doc counters
  come out.

Shingle hashes reuse :func:`..dedup.shingle_hashes` — the sha256-prefix
token hash + FNV rolling combine that the MinHash oracles already replay
bit-exactly in SQL — so decontamination sits under the same hash-exact
DuckDB oracle as the dedup family.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
import pyarrow as pa

from .dedup import shingle_hashes

__all__ = ["Decontaminate"]


class Decontaminate:
    """Eval-set n-gram overlap scoring and filtering.

    Parameters
    ----------
    width : word-shingle width (13 in Brown et al.-style decontamination;
        small widths for the short synthetic test docs).
    threshold : a document with ``n_hit / n_shingles >= threshold`` is
        contaminated.
    eval_budget : max distinct eval shingles collected on the driver —
        the honest-scale guard.  Benchmarks are small; a corpus
        mistakenly passed as the eval side should fail loudly, not OOM
        the driver.
    """

    def __init__(self, name: str, width: int = 3, threshold: float = 0.5,
                 text_col: str = "text", id_col: str = "doc_id",
                 eval_budget: int = 20_000_000):
        self.name = name
        self.width = width
        self.threshold = threshold
        self.text_col = text_col
        self.id_col = id_col
        self.eval_budget = eval_budget

    # -- eval side ---------------------------------------------------------
    def eval_ngrams(self, eval_ds) -> "np.ndarray":
        """Distinct shingle hashes of the eval set as a sorted uint64
        array (driver-side, budget-guarded).

        Per-batch ``np.unique`` shrinks before anything leaves the task;
        the materialize-then-count guard is the ``agg.combine_partials``
        pattern (count after materialize is metadata-cheap and the chain
        runs once).
        """
        text_col, width = self.text_col, self.width

        def batch_unique(batch: pa.Table) -> pa.Table:
            cache: dict = {}
            texts = batch[text_col].to_pylist()
            if not texts:
                return pa.table({"shingle": pa.array([], type=pa.uint64())})
            parts = [shingle_hashes(t or "", width, cache) for t in texts]
            uniq = np.unique(np.concatenate(parts))
            return pa.table({"shingle": pa.array(uniq, type=pa.uint64())})

        shrunk = eval_ds.map_batches(batch_unique, batch_format="pyarrow").materialize()
        n = shrunk.count()
        if n > self.eval_budget:
            raise ValueError(
                f"Decontaminate: eval set produced {n} per-block-distinct "
                f"shingles, over the {self.eval_budget} driver budget — "
                "the eval side must be the small side")
        local = shrunk.to_pandas()  # bounded: guarded above
        if len(local) == 0:
            return np.array([], dtype=np.uint64)
        return np.unique(local["shingle"].to_numpy().astype(np.uint64))

    # -- corpus side -------------------------------------------------------
    def stats(self, corpus_ds, eval_set: Union["np.ndarray", object]):
        """Per-document overlap stats: ``(id_col, n_shingles, n_hit,
        overlap_frac, contaminated)``.

        ``eval_set`` is the sorted array from :meth:`eval_ngrams` or an
        ``ObjectRef`` to it (pass a ref when calling repeatedly so the
        array ships to the object store once).  Small broadcast state is
        closure-captured into a task fn, not an actor class — actor ctor
        args land in the object store anyway and trip the ray#53727
        restart hazard.
        """
        import ray

        ref = (eval_set if isinstance(eval_set, ray.ObjectRef)
               else ray.put(np.sort(np.asarray(eval_set, dtype=np.uint64))))
        text_col, id_col, width = self.text_col, self.id_col, self.width
        thr = self.threshold

        def score(batch: pa.Table) -> pa.Table:
            ev = ray.get(ref)  # zero-copy plasma read
            texts = batch[text_col].to_pylist()
            n = len(texts)
            n_sh = np.zeros(n, dtype=np.int64)
            n_hit = np.zeros(n, dtype=np.int64)
            cache: dict = {}
            for i, t in enumerate(texts):
                sh = shingle_hashes(t or "", width, cache)
                n_sh[i] = sh.size
                if ev.size and sh.size:
                    pos = np.searchsorted(ev, sh)
                    inb = pos < ev.size
                    n_hit[i] = np.count_nonzero(
                        inb & (ev[np.minimum(pos, ev.size - 1)] == sh))
            # n_shingles >= 1 always: shingle_hashes pads short docs to
            # one window, so the division is safe and SQL-replayable as
            # n_hit::DOUBLE / n_shingles (one IEEE op on exact ints).
            frac = n_hit / n_sh
            return pa.table({
                id_col: batch[id_col],
                "n_shingles": pa.array(n_sh),
                "n_hit": pa.array(n_hit),
                "overlap_frac": pa.array(frac),
                "contaminated": pa.array((frac >= thr).astype(np.int64)),
            })

        return corpus_ds.map_batches(score, batch_format="pyarrow")

    def clean(self, corpus_ds, eval_set) -> "object":
        """Corpus rows that survive decontamination (overlap below the
        threshold), original schema — one streaming pass, no shuffle."""
        import ray

        ref = (eval_set if isinstance(eval_set, ray.ObjectRef)
               else ray.put(np.sort(np.asarray(eval_set, dtype=np.uint64))))
        text_col, width, thr = self.text_col, self.width, self.threshold

        def keep(batch: pa.Table) -> pa.Table:
            ev = ray.get(ref)
            texts = batch[text_col].to_pylist()
            mask = np.ones(len(texts), dtype=bool)
            cache: dict = {}
            for i, t in enumerate(texts):
                sh = shingle_hashes(t or "", width, cache)
                if ev.size and sh.size:
                    pos = np.searchsorted(ev, sh)
                    inb = pos < ev.size
                    hits = np.count_nonzero(
                        inb & (ev[np.minimum(pos, ev.size - 1)] == sh))
                    mask[i] = (hits / sh.size) < thr
            return batch.filter(pa.array(mask))

        return corpus_ds.map_batches(keep, batch_format="pyarrow")

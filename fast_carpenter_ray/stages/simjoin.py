"""Exact set-similarity (token-Jaccard) self-join via prefix filtering.

The classic all-pairs similarity join (Bayardo et al., WWW'07 "Scaling Up
All Pairs Similarity Search" — public literature), recast Ray-Data-first:

1. **token rows** — per-batch vectorized tokenization to flat
   ``(doc_id, tok, size)`` rows, ``tok`` a 64-bit sha256-prefix hash
   (the same process-independent hash the dedup stages use) and ``size``
   the doc's DISTINCT-token count.
2. **document frequency** — one hash ``groupby(tok).count()`` (the
   vocabulary is sublinear in the corpus, so this aggregate is small
   relative to the data but still computed distributed, never on the
   driver).
3. **prefix selection** — df joins back onto the token rows (hash join,
   token-keyed), then a ``groupby(doc_id)`` sorts each doc's tokens by
   (df ASC, tok) — rarest first — and keeps only the PREFIX of length
   ``n - ceil(t*n) + 1``.  Prefix-filter completeness (standard result):
   for any pair with J >= t, the globally-smallest shared token is in
   BOTH prefixes, so grouping prefix rows by token loses no qualifying
   pair.  Everything after this step works on the prefix rows — a
   (1-t)-fraction of the token stream.
4. **candidate pairs** — ``groupby(tok)`` over prefix rows, vectorized
   triu pairing per posting list, capped at ``max_list`` with a logged
   drop (hot tokens degrade gracefully, never quadratically).
5. **verification** — pair-deduped candidates fetch both docs' distinct
   token-hash arrays via the same bounded broadcast-lookup pattern as
   ``MinHashDedup.candidate_pairs`` (one streaming filter pass; no extra
   shuffle) and an ``np.intersect1d`` kernel computes the EXACT Jaccard;
   ``inter``/``sz_a``/``sz_b`` are integers and ``jaccard`` is a single
   f64 division of exact ints, so an independent SQL engine reproduces
   every output bit.

Shuffle inventory (scale audit): df groupby (token-keyed), df join
(token-keyed), prefix groupby (doc-keyed), candidate groupby
(token-keyed, prefix rows only), pair dedupe (pair-keyed, candidate
rows only).  No stage materializes the corpus; the text column never
leaves the first map.
"""

from __future__ import annotations

import logging
import math
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _cap_bucket, _stable_token_hash, dedup_pair_stream, tokenize

__all__ = ["similarity_join", "containment_join"]

logger = logging.getLogger("fast_carpenter_ray.simjoin")


def _token_rows(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    """(doc_id, tok, size) rows — one per DISTINCT token per doc."""
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    cache: dict = {}
    out_id, out_tok, out_sz = [], [], []
    for i, t in zip(ids, batch[text_col].to_pylist()):
        toks = np.unique(np.fromiter(
            (cache.setdefault(w, _stable_token_hash(w))
             for w in tokenize(t or "")),
            dtype=np.uint64))
        out_id.append(np.full(len(toks), i, dtype=np.int64))
        out_tok.append(toks.view(np.int64))
        out_sz.append(np.full(len(toks), len(toks), dtype=np.int64))
    cat = (lambda xs: np.concatenate(xs) if xs else np.array([], dtype=np.int64))
    return pa.table({
        "doc_id": pa.array(cat(out_id), type=pa.int64()),
        "tok": pa.array(cat(out_tok), type=pa.int64()),
        "size": pa.array(cat(out_sz), type=pa.int64()),
    })


def _prefix_len(n: np.ndarray, threshold: float) -> np.ndarray:
    """n - ceil(t*n) + 1, with a 1e-9 slack that can only LENGTHEN the
    prefix (float fuzz must never shorten it — completeness over speed)."""
    return n - np.ceil(threshold * n - 1e-9).astype(np.int64) + 1


def similarity_join(ds, threshold: float, id_col: str = "doc_id",
                    text_col: str = "text", max_list: Optional[int] = 4096,
                    num_partitions: Optional[int] = None,
                    broadcast_pairs_budget: int = 500_000):
    """Dataset of (id_a, id_b, inter, sz_a, sz_b, jaccard) for every pair
    with EXACT distinct-token Jaccard >= ``threshold`` (id_a < id_b).

    Prefix filtering is lossless and verification is an exact set
    intersection, so the result is exact UP TO the ``max_list`` posting
    cap: a list longer than ``max_list`` is truncated with a logged
    forfeited-pair count (hot boilerplate tokens degrade gracefully
    instead of going quadratic).  Pass ``max_list=None`` for strict
    exactness (unbounded lists) — the mode the bit-exact SQL oracle in
    ``pipelines/queries.py::q_similarity_join`` runs in effect, since
    its fixture never reaches the default cap.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)

    tokens = ds.map_batches(
        lambda b: _token_rows(b, id_col, text_col), batch_format="pyarrow")
    tokens = tokens.materialize()  # reused by df-join AND verification

    empty = pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "inter": pa.array([], type=pa.int64()),
        "sz_a": pa.array([], type=pa.int64()),
        "sz_b": pa.array([], type=pa.int64()),
        "jaccard": pa.array([], type=pa.float64()),
    })
    if tokens.count() == 0:
        # Ray 2.49's hash-shuffle aggregator rejects schemaless empties
        return rd.from_arrow(empty)

    df = tokens.groupby("tok", num_partitions=num_partitions).aggregate(
        Count(alias_name="df"))
    with_df = tokens.join(df, join_type="inner", on=("tok",),
                          num_partitions=num_partitions)

    thr = float(threshold)

    def prefix_rows(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["df", "tok"], kind="stable")
        n = int(g["size"].iloc[0])
        p = int(_prefix_len(np.array([n]), thr)[0])
        return g.head(p)[["doc_id", "tok"]]

    pref = with_df.groupby("doc_id", num_partitions=num_partitions).map_groups(
        prefix_rows, batch_format="pandas")

    max_l = None if max_list is None else int(max_list)

    def posting_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        ids = np.sort(ids)
        if max_l is not None:
            ids = _cap_bucket(ids, max_l, "similarity_join")
        iu = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[iu[0]].astype(np.int64),
                             "id_b": ids[iu[1]].astype(np.int64)})

    cand = pref.groupby("tok", num_partitions=num_partitions).map_groups(
        posting_pairs, batch_format="pandas")

    # pair dedupe across posting lists: a raw groupby(id_a, id_b) keys the
    # shuffle on the PAIR (group count = candidate count — measured 40x
    # slower on Ray 2.49's hash aggregator); the shared bounded-bucket
    # helper dedupes each pair-hash bucket with one vectorized
    # drop_duplicates instead
    pairs = dedup_pair_stream(cand, num_partitions).materialize()

    n_pairs = pairs.count()
    if n_pairs > broadcast_pairs_budget:
        # adversarial corpora: fall back to joining token rows per side.
        # Bounded-partition hash joins, the honest shuffle path.
        logger.warning(
            "similarity_join: %d candidate pairs exceed the %d broadcast "
            "budget — falling back to join verification", n_pairs,
            broadcast_pairs_budget)
        a = tokens.map_batches(
            lambda t: t.rename_columns(["id_a", "tok", "sz_a"]),
            batch_format="pyarrow")
        j = pairs.join(a, join_type="inner", on=("id_a",),
                       num_partitions=num_partitions)
        b = tokens.map_batches(
            lambda t: t.rename_columns(["id_b", "tok_b", "sz_b"]),
            batch_format="pyarrow")
        j = j.join(b, join_type="inner", on=("id_b", "tok"),
                   right_on=("id_b", "tok_b"), num_partitions=num_partitions)
        inter = j.groupby(["id_a", "id_b"],
                          num_partitions=num_partitions).aggregate(
            Count(alias_name="inter"))
        szs = tokens.groupby("doc_id", num_partitions=num_partitions).aggregate(
            Max("size", alias_name="size"))
        inter = inter.join(
            szs.map_batches(lambda t: t.rename_columns(["id_a", "sz_a"]),
                            batch_format="pyarrow"),
            join_type="inner", on=("id_a",), num_partitions=num_partitions)
        inter = inter.join(
            szs.map_batches(lambda t: t.rename_columns(["id_b", "sz_b"]),
                            batch_format="pyarrow"),
            join_type="inner", on=("id_b",), num_partitions=num_partitions)

        def finish(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return empty
            it = batch["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
            sa = batch["sz_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            sb = batch["sz_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            jac = it / (sa + sb - it)
            keep = jac >= thr
            return pa.table({
                "id_a": pa.array(batch["id_a"].to_numpy(
                    zero_copy_only=False)[keep], type=pa.int64()),
                "id_b": pa.array(batch["id_b"].to_numpy(
                    zero_copy_only=False)[keep], type=pa.int64()),
                "inter": pa.array(it[keep], type=pa.int64()),
                "sz_a": pa.array(sa[keep], type=pa.int64()),
                "sz_b": pa.array(sb[keep], type=pa.int64()),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            })

        return inter.map_batches(finish, batch_format="pyarrow")

    pair_df = pairs.to_pandas()
    if len(pair_df) == 0:
        return rd.from_arrow(empty)
    need = np.unique(np.concatenate(
        [pair_df["id_a"].to_numpy(), pair_df["id_b"].to_numpy()]))
    need_ref = ray.put(need)

    def keep_needed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, ray.get(need_ref))))

    looked = tokens.map_batches(keep_needed, batch_format="pyarrow").to_pandas()
    sets = {int(i): np.sort(g["tok"].to_numpy().view(np.uint64))
            for i, g in looked.groupby("doc_id", sort=False)}
    ia = pair_df["id_a"].to_numpy()
    ib = pair_df["id_b"].to_numpy()
    inter = np.empty(len(ia), dtype=np.int64)
    sa = np.empty(len(ia), dtype=np.int64)
    sb = np.empty(len(ia), dtype=np.int64)
    for j in range(len(ia)):
        A, B = sets[int(ia[j])], sets[int(ib[j])]
        inter[j] = len(np.intersect1d(A, B, assume_unique=True))
        sa[j], sb[j] = len(A), len(B)
    jac = inter / (sa + sb - inter)
    keep = jac >= thr
    return rd.from_arrow(pa.table({
        "id_a": pa.array(ia[keep], type=pa.int64()),
        "id_b": pa.array(ib[keep], type=pa.int64()),
        "inter": pa.array(inter[keep], type=pa.int64()),
        "sz_a": pa.array(sa[keep], type=pa.int64()),
        "sz_b": pa.array(sb[keep], type=pa.int64()),
        "jaccard": pa.array(jac[keep], type=pa.float64()),
    }))


def containment_join(ds, threshold: float, id_col: str = "doc_id",
                     text_col: str = "text",
                     max_list: Optional[int] = 4096,
                     num_partitions: Optional[int] = None,
                     broadcast_pairs_budget: int = 500_000):
    """Exact set-CONTAINMENT self-join: ordered pairs ``(id_a, id_b)``,
    ``a != b``, with ``|S_a & S_b| / |S_a| >= threshold`` — the
    asymmetric inclusion signal (quotes, boilerplate wrappers, doc-in-doc
    duplication) that Jaccard misses when ``|S_b| >> |S_a|``.

    Probe-prefix filtering (the containment/overlap variant of Bayardo's
    prefix filter, public literature): containment >= t needs overlap
    ``o = ceil(t * |S_a|)``, so if NONE of a's first ``|S_a| - o + 1``
    tokens (rarest-first order) is in ``S_b``, at most ``o - 1`` can be
    shared — pigeonhole, for ANY fixed token order.  The probe side
    therefore emits only its prefix rows, but the INDEX side must post
    ALL tokens (containment puts no constraint on b).  Candidates are
    probe x index per token, capped at ``max_list`` per side with logged
    drops; verification is an exact set intersection, so results are
    exact up to the cap (``max_list=None`` for strict exactness).

    Output: ``(id_a, id_b, inter, sz_a, sz_b, containment)`` —
    ``containment`` one f64 division of exact ints (SQL-replayable).
    Shuffle inventory: df groupby, df join, prefix groupby (all
    token-/doc-keyed as in :func:`similarity_join`), candidate groupby
    (token-keyed), bounded pair-hash dedupe.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    if num_partitions is None:
        from ..agg import default_partitions

        num_partitions = default_partitions(4)

    tokens = ds.map_batches(
        lambda b: _token_rows(b, id_col, text_col), batch_format="pyarrow")
    tokens = tokens.materialize()  # reused by df-join, index, verification

    empty = pa.table({
        "id_a": pa.array([], type=pa.int64()),
        "id_b": pa.array([], type=pa.int64()),
        "inter": pa.array([], type=pa.int64()),
        "sz_a": pa.array([], type=pa.int64()),
        "sz_b": pa.array([], type=pa.int64()),
        "containment": pa.array([], type=pa.float64()),
    })
    if tokens.count() == 0:
        return rd.from_arrow(empty)

    df = tokens.groupby("tok", num_partitions=num_partitions).aggregate(
        Count(alias_name="df"))
    with_df = tokens.join(df, join_type="inner", on=("tok",),
                          num_partitions=num_partitions)

    thr = float(threshold)

    def prefix_rows(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["df", "tok"], kind="stable")
        n = int(g["size"].iloc[0])
        p = int(_prefix_len(np.array([n]), thr)[0])
        return g.head(p)[["doc_id", "tok"]]

    pref = with_df.groupby("doc_id", num_partitions=num_partitions).map_groups(
        prefix_rows, batch_format="pandas")

    probe_t = pref.map_batches(
        lambda t: t.append_column(
            "probe", pa.array(np.ones(len(t), dtype=np.int64))),
        batch_format="pyarrow")
    index_t = tokens.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "tok": t["tok"],
                            "probe": pa.array(
                                np.zeros(len(t), dtype=np.int64))}),
        batch_format="pyarrow")

    max_l = None if max_list is None else int(max_list)

    def posting_pairs(group: pd.DataFrame) -> pd.DataFrame:
        d = group["doc_id"].to_numpy()
        pr = np.unique(d[group["probe"].to_numpy() == 1])
        ix = np.unique(d[group["probe"].to_numpy() == 0])
        if len(pr) == 0 or len(ix) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        if max_l is not None:
            pr = _cap_bucket(pr, max_l, "containment_join.probe")
            ix = _cap_bucket(ix, max_l, "containment_join.index")
        a = np.repeat(pr, len(ix))
        b = np.tile(ix, len(pr))
        keep = a != b
        return pd.DataFrame({"id_a": a[keep].astype(np.int64),
                             "id_b": b[keep].astype(np.int64)})

    cand = probe_t.union(index_t).groupby(
        "tok", num_partitions=num_partitions).map_groups(
        posting_pairs, batch_format="pandas")

    # ordered pairs: the bounded bucket hash distinguishes (a,b) from
    # (b,a), so the dedupe keeps both directions as distinct candidates
    pairs = dedup_pair_stream(cand, num_partitions).materialize()

    n_pairs = pairs.count()
    if n_pairs > broadcast_pairs_budget:
        logger.warning(
            "containment_join: %d candidate pairs exceed the %d broadcast "
            "budget — falling back to join verification", n_pairs,
            broadcast_pairs_budget)
        a = tokens.map_batches(
            lambda t: t.rename_columns(["id_a", "tok", "sz_a"]),
            batch_format="pyarrow")
        j = pairs.join(a, join_type="inner", on=("id_a",),
                       num_partitions=num_partitions)
        b = tokens.map_batches(
            lambda t: t.rename_columns(["id_b", "tok_b", "sz_b"]),
            batch_format="pyarrow")
        j = j.join(b, join_type="inner", on=("id_b", "tok"),
                   right_on=("id_b", "tok_b"), num_partitions=num_partitions)
        inter = j.groupby(["id_a", "id_b"],
                          num_partitions=num_partitions).aggregate(
            Count(alias_name="inter"))
        szs = tokens.groupby("doc_id", num_partitions=num_partitions).aggregate(
            Max("size", alias_name="size"))
        inter = inter.join(
            szs.map_batches(lambda t: t.rename_columns(["id_a", "sz_a"]),
                            batch_format="pyarrow"),
            join_type="inner", on=("id_a",), num_partitions=num_partitions)
        inter = inter.join(
            szs.map_batches(lambda t: t.rename_columns(["id_b", "sz_b"]),
                            batch_format="pyarrow"),
            join_type="inner", on=("id_b",), num_partitions=num_partitions)

        def finish(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return empty
            it = batch["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
            sa = batch["sz_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            sb = batch["sz_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            cont = it / sa
            keep = cont >= thr
            return pa.table({
                "id_a": pa.array(batch["id_a"].to_numpy(
                    zero_copy_only=False)[keep], type=pa.int64()),
                "id_b": pa.array(batch["id_b"].to_numpy(
                    zero_copy_only=False)[keep], type=pa.int64()),
                "inter": pa.array(it[keep], type=pa.int64()),
                "sz_a": pa.array(sa[keep], type=pa.int64()),
                "sz_b": pa.array(sb[keep], type=pa.int64()),
                "containment": pa.array(cont[keep], type=pa.float64()),
            })

        return inter.map_batches(finish, batch_format="pyarrow")

    pair_df = pairs.to_pandas()
    if len(pair_df) == 0:
        return rd.from_arrow(empty)
    need = np.unique(np.concatenate(
        [pair_df["id_a"].to_numpy(), pair_df["id_b"].to_numpy()]))
    need_ref = ray.put(need)

    def keep_needed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(ids, ray.get(need_ref))))

    looked = tokens.map_batches(keep_needed, batch_format="pyarrow").to_pandas()
    sets = {int(i): np.sort(g["tok"].to_numpy().view(np.uint64))
            for i, g in looked.groupby("doc_id", sort=False)}
    ia = pair_df["id_a"].to_numpy()
    ib = pair_df["id_b"].to_numpy()
    inter = np.empty(len(ia), dtype=np.int64)
    sa = np.empty(len(ia), dtype=np.int64)
    sb = np.empty(len(ia), dtype=np.int64)
    for j in range(len(ia)):
        A, B = sets[int(ia[j])], sets[int(ib[j])]
        inter[j] = len(np.intersect1d(A, B, assume_unique=True))
        sa[j], sb[j] = len(A), len(B)
    cont = inter / sa
    keep = cont >= thr
    return rd.from_arrow(pa.table({
        "id_a": pa.array(ia[keep], type=pa.int64()),
        "id_b": pa.array(ib[keep], type=pa.int64()),
        "inter": pa.array(inter[keep], type=pa.int64()),
        "sz_a": pa.array(sa[keep], type=pa.int64()),
        "sz_b": pa.array(sb[keep], type=pa.int64()),
        "containment": pa.array(cont[keep], type=pa.float64()),
    }))

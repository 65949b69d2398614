"""Per-domain boilerplate line removal (CCNet / Dolma-style curation).

A line is boilerplate within a domain when it appears in at least
``max(min_docs, ceil(min_frac * domain_doc_count))`` DISTINCT documents of
that domain (navigation bars, cookie banners, copyright footers).  The
engine extension has no reference analogue (SURVEY.md §2.5) and follows
the repo's standard scale shape:

1. per-batch partial: explode lines, dedupe per doc, shrink to one
   ``(domain, line, n)`` row per distinct line per batch — the shuffle
   moves distinct lines, never documents;
2. one hash combine keyed on ``(domain, line)`` (line space scales with
   the corpus) + one tree combine for the summary-sized per-domain doc
   counts (broadcast as thresholds);
3. the frequent set is budget-guarded: under ``broadcast_budget`` it
   ships once via ``ray.put`` and every batch cleans itself with one
   vectorized ``isin`` — the document stream never shuffles; above the
   budget, the honest distributed path explodes docs to line rows,
   left-outer hash-joins the frequent set on a NUL-escaped concatenated
   key, reassembles VECTORIZED per hash bucket (one pandas pass over each
   bucket's complete doc groups — never one task per doc), and joins the
   slim cleaned rows back onto the full document stream so both paths
   emit the identical full schema (pytest pins them equal).

Cleaning preserves line order; a doc whose every line is boilerplate
keeps an empty ``text_clean``.  Deterministic end to end, so the whole
operator sits under a hash-exact SQL replay (string_split + string_agg).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["strip_boilerplate", "frequent_lines"]

#: joins (domain, line) into one key.  \x1f (ASCII unit separator) rather
#: than \x00: Ray's hash-join key partitioning mishandles embedded NULs
#: (measured: left_outer matches silently dropped), and \x1f never occurs
#: in domain names.
_SEP = "\x1f"


def _nulsafe(s: pd.Series) -> pd.Series:
    """Injective escape making join-key content NUL-free: line TEXT may
    embed \\x00, which hits the Ray ``Dataset.join`` bug (left_outer
    matches silently dropped on keys with embedded NULs) — such lines
    would survive stripping on the distributed path only.  \\x1e escapes
    itself so no two inputs collide; \\x1f (the separator) stays raw."""
    return (s.str.replace("\x1e", "\x1e\x1e", regex=False)
             .str.replace("\x00", "\x1e0", regex=False))


def frequent_lines(ds, text_col: str = "text", id_col: str = "doc_id",
                   domain_col: str = "domain", min_docs: int = 3,
                   min_frac: float = 0.5,
                   num_partitions: Optional[int] = None):
    """Dataset of ``(domain, line, n)`` boilerplate lines (the frequent
    set); ``n`` = distinct docs of the domain containing the line."""
    import ray

    from ..agg import combine_partials, default_partitions

    if num_partitions is None:
        num_partitions = default_partitions(4)

    def line_partial(batch: pd.DataFrame) -> pd.DataFrame:
        ex = pd.DataFrame({
            "domain": batch[domain_col].to_numpy(),
            "line": batch[text_col].fillna("").str.split("\n").to_numpy(),
            "_doc": batch[id_col].to_numpy(),
        }).explode("line")
        ex = ex.drop_duplicates(["_doc", "domain", "line"])
        out = (ex.groupby(["domain", "line"], sort=False).size()
               .rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = combine_partials(
        ds.map_batches(line_partial, batch_format="pandas"),
        keys=["domain", "line"], value_cols=["n"], mode="hash",
        num_partitions=num_partitions)

    def doc_partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = (batch.groupby(domain_col, sort=False)[id_col].size()
               .rename("nd").reset_index())
        out["nd"] = out["nd"].astype(np.int64)
        return out

    # domain space is summary-sized by contract (the hits/pagerank
    # max_domains argument) -> tree combine + broadcast thresholds
    dd = combine_partials(
        ds.map_batches(doc_partial, batch_format="pandas"),
        keys=[domain_col], value_cols=["nd"], mode="tree").to_pandas()
    if len(dd) == 0 or domain_col not in dd.columns:
        thr = {}  # empty input: Ray's empty to_pandas loses the schema
    else:
        thr = {d: max(int(min_docs), int(np.ceil(min_frac * int(n))))
               for d, n in zip(dd[domain_col], dd["nd"])}
    thr_ref = ray.put(thr)

    def keep_frequent(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "domain" not in batch.column_names:
            # fully-empty inputs lose the combine's schema (Ray quirk,
            # see agg.combine_partials): rebuild the typed empty table
            return pa.table({"domain": pa.array([], type=pa.string()),
                             "line": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        t = ray.get(thr_ref)
        doms = batch["domain"].to_pandas()
        need = doms.map(t).fillna(np.inf).to_numpy(dtype=np.float64)
        n = batch["n"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(n >= need))

    return counts.map_batches(keep_frequent, batch_format="pyarrow")


def strip_boilerplate(ds, text_col: str = "text", id_col: str = "doc_id",
                      domain_col: str = "domain", min_docs: int = 3,
                      min_frac: float = 0.5,
                      broadcast_budget: int = 2_000_000,
                      num_partitions: Optional[int] = None):
    """Remove per-domain boilerplate lines from every document.

    Returns a Dataset with ``text_clean`` (order-preserving remaining
    lines), ``n_lines`` and ``n_removed`` appended; ``text_col`` itself is
    left untouched for downstream auditing (drop it for slim streams).
    """
    import ray

    from ..agg import default_partitions

    if num_partitions is None:
        num_partitions = default_partitions(4)
    freq = frequent_lines(ds, text_col=text_col, id_col=id_col,
                          domain_col=domain_col, min_docs=min_docs,
                          min_frac=min_frac,
                          num_partitions=num_partitions).materialize()

    if freq.count() <= broadcast_budget:
        fdf = freq.to_pandas()
        keys = (fdf["domain"].to_numpy(dtype=object) + _SEP
                + fdf["line"].to_numpy(dtype=object)) if len(fdf) else \
            np.array([], dtype=object)
        freq_ref = ray.put(set(keys.tolist()))

        def clean(batch: pd.DataFrame) -> pd.DataFrame:
            fset = ray.get(freq_ref)
            lines = batch[text_col].fillna("").str.split("\n")
            dom = batch[domain_col].to_numpy(dtype=object)
            ex = pd.Series(lines.to_numpy(), copy=False).explode()
            idx = ex.index.to_numpy(np.int64)
            lv = ex.to_numpy(dtype=object)
            bad = pd.Series(dom[idx] + _SEP + lv).isin(fset).to_numpy()
            n_lines = np.bincount(idx, minlength=len(batch)).astype(np.int64)
            n_removed = np.bincount(idx[bad],
                                    minlength=len(batch)).astype(np.int64)
            joined = (pd.Series(lv[~bad]).groupby(idx[~bad]).agg("\n".join)
                      .reindex(range(len(batch)), fill_value=""))
            out = batch.reset_index(drop=True)
            out["text_clean"] = joined.to_numpy(dtype=object)
            out["n_lines"] = n_lines
            out["n_removed"] = n_removed
            return out

        return ds.map_batches(clean, batch_format="pandas")

    # honest distributed path: explode docs to line rows, mark frequent
    # lines via one left-outer hash join on the (NUL-escaped) concatenated
    # key, then reassemble vectorized per HASH BUCKET — one pandas pass
    # over each bucket's complete doc groups, not one task per doc —
    # and finally join the slim cleaned rows back onto the full document
    # stream so the output schema matches the broadcast path exactly
    # (all original columns + text_clean/n_lines/n_removed).
    from .joins import hash_join

    def explode_rows(batch: pd.DataFrame) -> pd.DataFrame:
        lines = batch[text_col].fillna("").str.split("\n")
        dom = batch[domain_col].to_numpy(dtype=object)
        ids = batch[id_col].to_numpy()
        ex = pd.Series(lines.to_numpy(), copy=False).explode()
        idx = ex.index.to_numpy(np.int64)
        lv = ex.to_numpy(dtype=object)
        within = np.arange(len(lv), dtype=np.int64)
        # line index within each doc: positions are doc-major
        starts = np.concatenate([[0], np.cumsum(np.bincount(
            idx, minlength=len(batch)))])[:-1]
        return pd.DataFrame({
            id_col: ids[idx],
            "_bk": (_nulsafe(pd.Series(dom[idx])) + _SEP
                    + _nulsafe(pd.Series(lv))).to_numpy(dtype=object),
            "_line": lv, "_idx": within - starts[idx]})

    rows = ds.map_batches(explode_rows, batch_format="pandas")

    def freq_key(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "_bk": (_nulsafe(batch["domain"].fillna("")) + _SEP
                    + _nulsafe(batch["line"].fillna(""))),
            "_hit": np.ones(len(batch), dtype=np.int8)})

    fkey = freq.map_batches(freq_key, batch_format="pandas")
    marked = hash_join(rows, fkey, "_bk", num_partitions=num_partitions,
                       how="left_outer")

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[id_col, "_line", "_idx", "_hit"]].copy()
        out["_part"] = pd.util.hash_pandas_object(
            batch[id_col], index=False).to_numpy() % num_partitions
        return out

    def reassemble_bucket(part: pd.DataFrame) -> pd.DataFrame:
        if len(part) == 0:
            return pd.DataFrame({
                id_col: pd.Series([], dtype="int64"),
                "text_clean": pd.Series([], dtype=object),
                "n_lines": pd.Series([], dtype="int64"),
                "n_removed": pd.Series([], dtype="int64")})
        ids = part[id_col].to_numpy()
        order = np.lexsort((part["_idx"].to_numpy(np.int64), ids))
        ids = ids[order]
        keep = part["_hit"].isna().to_numpy()[order]
        lines = part["_line"].to_numpy(dtype=object)[order]
        uid, counts = np.unique(ids, return_counts=True)
        joined = (pd.Series(lines[keep]).groupby(ids[keep], sort=True)
                  .agg("\n".join).reindex(uid, fill_value=""))
        rem = pd.Series(np.zeros(len(uid), dtype=np.int64), index=uid)
        ruid, rcnt = np.unique(ids[~keep], return_counts=True)
        rem.loc[ruid] = rcnt
        return pd.DataFrame({
            id_col: uid,
            "text_clean": joined.to_numpy(dtype=object),
            "n_lines": counts.astype(np.int64),
            "n_removed": rem.to_numpy(),
        })

    cleaned = (marked.map_batches(bucketize, batch_format="pandas")
               .groupby("_part", num_partitions=num_partitions)
               .map_groups(reassemble_bucket, batch_format="pandas"))
    return hash_join(ds, cleaned, id_col,
                     num_partitions=num_partitions, how="inner")

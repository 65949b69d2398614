"""Sequence packing: lay documents out into fixed-length training
sequences (the "pack the corpus into context windows" step every
LLM training pipeline runs after curation).

Semantics (deterministic, partition-invariant, SQL-replayable):
documents are assigned to ``n_buckets`` hash buckets
(``mix_hash(id, seed) % n_buckets``), concatenated within each bucket
in ascending id order, and the token stream is cut into consecutive
``seq_len``-token windows — GPT-style packing where a document may span
a window boundary.  The output is the *placement map*: for every doc,
its bucket, its start offset in the bucket's token stream, and the
first/last sequence index it lands in.  ``bucket_summary`` gives the
per-bucket sequence counts (``ceil(total_tokens / seq_len)``).

Ray-native shape: token lengths are computed in a stateless
``map_batches`` pass and only ``(id, bucket, n_tokens)`` int rows enter
the per-bucket shuffle — the text itself NEVER moves.  Each bucket's
placement is a sorted cumulative sum over its (tiny) length rows via
``groupby(bucket).map_groups``; buckets are hash-uniform so the
shuffle is balanced by construction.  At 100 TB: pick ``n_buckets``
~ cluster cores so each group's int rows fit a worker comfortably
(1e12 docs / 1e4 buckets = 1e8 16-byte rows ≈ 1.6 GB worst case —
raise ``n_buckets`` with corpus size; it only changes the layout, not
the semantics' determinism).

Tokenization is the whitespace split shared with ``stages.text``
(DuckDB-replayable as ``regexp_split_to_array(text, '\\s+')`` with
empties filtered).  Zero-token docs are excluded from the layout (they
occupy no window); counts are exact ints throughout, so the DuckDB
window-cumsum oracle hashes bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sample import mix_hash

__all__ = ["pack_sequences", "bucket_summary"]


def _length_rows(ds, seq_len: int, n_buckets: int, id_col: str,
                 text_col: str, seed: int):
    if seq_len <= 0 or n_buckets <= 0:
        raise ValueError("pack_sequences: seq_len and n_buckets must be > 0")

    def lengths(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy().astype(np.int64)
        n = (batch[text_col].fillna("").str.split().str.len()
             .fillna(0).to_numpy().astype(np.int64))
        keep = n > 0
        return pd.DataFrame({
            id_col: ids[keep],
            "bucket": mix_hash(ids[keep], seed) % n_buckets,
            "n_tokens": n[keep],
        })

    return ds.map_batches(lengths, batch_format="pandas")


def pack_sequences(ds, seq_len: int, n_buckets: int = 64,
                   id_col: str = "doc_id", text_col: str = "text",
                   seed: int = 0):
    """Per-document placement map ``(id, bucket, n_tokens, start_tok,
    first_seq, last_seq)`` — all int64."""
    lens = _length_rows(ds, seq_len, n_buckets, id_col, text_col, seed)

    def place(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable").reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        start = np.concatenate(([0], np.cumsum(n)[:-1])).astype(np.int64)
        g["start_tok"] = start
        g["first_seq"] = start // seq_len
        g["last_seq"] = (start + n - 1) // seq_len
        return g

    from ..agg import default_partitions

    return lens.groupby("bucket", num_partitions=default_partitions()) \
               .map_groups(place, batch_format="pandas")


def bucket_summary(ds, seq_len: int, n_buckets: int = 64,
                   id_col: str = "doc_id", text_col: str = "text",
                   seed: int = 0):
    """Per-bucket layout summary ``(bucket, n_docs, total_tokens,
    n_seqs)`` with ``n_seqs = ceil(total_tokens / seq_len)`` — the
    shard manifest a trainer reads to schedule epochs."""
    from ray.data.aggregate import Count, Sum

    from ..agg import default_partitions

    lens = _length_rows(ds, seq_len, n_buckets, id_col, text_col, seed)
    agg = lens.groupby("bucket", num_partitions=default_partitions()) \
        .aggregate(Count(alias_name="n_docs"),
                   Sum("n_tokens", alias_name="total_tokens"))

    def finish(batch: pa.Table) -> pa.Table:
        tot = batch["total_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": batch["bucket"],
            "n_docs": pa.array(
                batch["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)),
            "total_tokens": pa.array(tot),
            "n_seqs": pa.array((tot + seq_len - 1) // seq_len),
        })

    return agg.map_batches(finish, batch_format="pyarrow")

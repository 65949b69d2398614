"""Redirect-chain resolution: map every key through a chain of
``src -> dst`` pointers to its terminal target.

The URL-canonicalization leg of a crawl pipeline (301 chains, alias
maps, merged-entity ids).  Two-sided shape:

* the POINTER table is the small side — shrunk per batch, combined
  once, then resolved on the driver by **pointer doubling**
  (``f = f∘f`` each round, so a chain of length L collapses in
  ``ceil(log2 L)`` rounds, not L) with an explicit cycle check and a
  row budget guarding the driver residency;
* the KEY stream is the big side — resolved by ONE broadcast
  ``searchsorted`` lookup per batch, zero shuffles, exactly the
  broadcast-small-side discipline of ``stages/joins.lookup_join``.

For pointer tables too large for one machine the same doubling runs as
``ceil(log2 L)`` distributed self-join rounds (each a hash shuffle of the
pointer table only, never the key stream); that variant is intentionally
not built until a use case needs it — the budget guard makes the
assumption loud instead of silent.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["resolve_map", "resolve_stream", "resolve_redirects",
           "normalize_urls"]


def resolve_map(redirects, src: str = "src", dst: str = "dst",
                max_rounds: int = 64, max_driver_rows: int = 5_000_000):
    """Collapse a Dataset of ``(src, dst)`` int64 pointers to a pandas
    frame ``(src, terminal)`` via driver-side pointer doubling.

    Raises on cycles (a pointer map with a cycle has no terminal) and on
    pointer tables exceeding ``max_driver_rows``.
    """
    from ..agg import combine_partials

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({src: batch[src].cast(pa.int64()),
                         "dst": batch[dst].cast(pa.int64()),
                         "_n": pa.array(np.ones(batch.num_rows,
                                                dtype=np.int64))})

    table = combine_partials(redirects.map_batches(slim,
                                                   batch_format="pyarrow"),
                             keys=[src, "dst"], value_cols=["_n"],
                             mode="tree",
                             max_driver_rows=max_driver_rows).to_pandas()
    if table.empty or src not in table.columns:
        return pd.DataFrame({src: pd.Series([], dtype=np.int64),
                             "terminal": pd.Series([], dtype=np.int64)})
    srcs = table[src].to_numpy().astype(np.int64)
    if len(np.unique(srcs)) != len(srcs):
        raise ValueError("resolve_map: a src has multiple outgoing pointers")
    cur = table["dst"].to_numpy().astype(np.int64)  # srcs sorted by combine
    for _ in range(max_rounds):
        idx = np.searchsorted(srcs, cur)
        idx[idx >= len(srcs)] = 0
        hop = srcs[idx] == cur           # cur is itself a src -> follow
        if not hop.any():
            break
        cur = np.where(hop, cur[idx], cur)
    else:
        raise ValueError(
            f"resolve_map: chains not resolved after {max_rounds} doubling "
            f"rounds — pointer cycle or pathological depth")
    return pd.DataFrame({src: srcs, "terminal": cur})


def resolve_stream(ds, mapping: pd.DataFrame, key: str,
                   src: str = "src", out: str = "terminal"):
    """Resolve ``ds[key]`` through a :func:`resolve_map` result: keys
    with no pointer resolve to themselves.  One broadcast lookup per
    batch, fused, no shuffle."""
    srcs = mapping[src].to_numpy().astype(np.int64)
    terms = mapping["terminal"].to_numpy().astype(np.int64)

    def lookup(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(srcs):
            idx = np.searchsorted(srcs, k)
            idx[idx >= len(srcs)] = 0
            hit = srcs[idx] == k
            resolved = np.where(hit, terms[idx], k)
        else:
            resolved = k
        return batch.append_column(out, pa.array(resolved))

    return ds.map_batches(lookup, batch_format="pyarrow")


def resolve_redirects(ds, redirects, key: str, src: str = "src",
                      dst: str = "dst", out: str = "terminal",
                      max_rounds: int = 64):
    """End-to-end: build the terminal map from ``redirects`` and resolve
    ``ds[key]`` through it."""
    mapping = resolve_map(redirects, src=src, dst=dst,
                          max_rounds=max_rounds)
    return resolve_stream(ds, mapping, key=key, src=src, out=out)


def normalize_urls(ds, url_col: str = "url", out: str = "canon_url"):
    """Syntactic URL canonicalization — the crawl-curation companion to
    the redirect-chain resolution above: collapse trivially-distinct
    spellings of the same resource BEFORE exact dedup (fragments,
    tracking params, scheme/www/host-case noise, trailing slashes).

    Rules, applied IN ORDER (each a vectorized pandas str kernel; every
    pattern is an alternation-free RE2-compatible regex, so Python
    ``re`` and DuckDB ``regexp_replace`` replay the chain bit-exactly —
    the PII-pattern contract):

    1. strip the ``#fragment``;
    2. strip ``utm_*`` tracking params (globally);
    3. ``http://`` -> ``https://``;
    4. strip one leading ``www.``;
    5. lowercase the HOST only (path case is significant);
    6. strip one trailing slash.

    Appends ``out`` and streams — no shuffle.
    """

    def canon(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[url_col].fillna("")
        s = s.str.replace(r"#.*$", "", regex=True)
        s = s.str.replace(r"[?&]utm_[^&#]*", "", regex=True)
        s = s.str.replace(r"^http://", "https://", regex=True)
        s = s.str.replace(r"^https://www\.", "https://", regex=True)
        ext = s.str.extract(r"^https://([^/]*)(.*)$", expand=True)
        ok = ext[0].notna()
        rebuilt = "https://" + ext[0].str.lower().fillna("") + ext[1].fillna("")
        s = pd.Series(np.where(ok, rebuilt, s), index=s.index)
        s = s.str.replace(r"/$", "", regex=True)
        batch = batch.copy()
        batch[out] = s
        return batch

    return ds.map_batches(canon, batch_format="pandas")

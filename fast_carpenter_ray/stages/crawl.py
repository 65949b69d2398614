"""Politeness-aware crawl scheduling: round-robin interleave by domain.

A crawl frontier must never hammer one host: the canonical discipline is
one fetch per domain per "wave" — wave 1 takes each domain's best page,
wave 2 the second-best, and so on (per-host politeness delay maps to the
wave axis).  ``crawl_order`` materializes the first ``k`` entries of that
global schedule deterministically:

* ``wave``  = dense rank of the page WITHIN its domain, ordered by
  (priority DESC, id ASC) — the per-host fetch sequence;
* schedule = rows ordered by (wave ASC, domain ASC, id ASC), positions
  1..k.

Scale shape (100 TB frontier):

* The stream is slimmed to (domain, id, priority) before any shuffle —
  three narrow columns.
* Per-domain ranking runs in ``groupby(domain).map_groups`` group tasks
  (assumption: one domain's frontier fits one task — crawl frontiers are
  at most millions of URLs per host; the bucketed per-key window
  machinery in ``stages/windows.py`` is the fallback for pathological
  hosts).
* The global sort is EXACTLY pruned first: a row with ``wave w`` has at
  least ``w - 1`` predecessors in schedule order (its own domain supplies
  a row at every earlier wave, and rank is dense), so its position is
  >= w and ``wave > k`` can never reach the top ``k``.  The filter drops
  the frontier to at most ``k * n_domains`` rows before the only sort,
  whose input is therefore schedule-sized, not corpus-sized.

No counterpart in the reference (fast-carpenter has no ordering
operators); this is a web-crawl-native extension of the engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["crawl_order", "RobotsRules", "crawl_budget"]


def crawl_order(ds, domain: str = "source", id_col: str = "doc_id",
                priority: str = "n_chars", k: int = 100) -> pd.DataFrame:
    """First ``k`` entries of the politeness round-robin crawl schedule.

    Returns a pandas DataFrame (schedule_pos, wave, domain, id) — the
    driver-sized head of the global schedule (``k`` rows, bounded by
    construction).
    """
    if k < 1:
        raise ValueError("crawl_order: k must be >= 1")

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            domain: batch[domain],
            id_col: batch[id_col],
            priority: pa.array(batch[priority].to_numpy(
                zero_copy_only=False).astype(np.int64)),
        })

    from ..agg import default_partitions

    slimmed = ds.map_batches(slim, batch_format="pyarrow", batch_size=None)

    def rank_domain(group: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((group[id_col].to_numpy(),
                            -group[priority].to_numpy()))
        wave = np.empty(len(group), dtype=np.int64)
        wave[order] = np.arange(1, len(group) + 1)
        out = group[[domain, id_col]].copy()
        out["wave"] = wave
        # exact prune: position >= wave, so wave > k never schedules
        return out[out["wave"] <= k]

    ranked = slimmed.groupby(domain,
                             num_partitions=default_partitions()).map_groups(
        rank_domain, batch_format="pandas")
    head = (ranked.sort(["wave", domain, id_col]).limit(k).to_pandas())
    head["schedule_pos"] = np.arange(1, len(head) + 1, dtype=np.int64)
    return head[["schedule_pos", "wave", domain, id_col]]


class RobotsRules:
    """Longest-prefix-wins path rules per host — robots.txt semantics
    (RFC 9309 §2.2.2: "the most specific match found MUST be used").

    ``rules`` is a list of ``(host, path_prefix, allow)`` triples; a page
    whose host has no matching prefix is allowed by default.  Appends
    ``rule_prefix`` (matched prefix, '' when none) and ``allowed``
    (int64 0/1).

    Ray shape: the rule set is small broadcast state captured at plan
    time (the BlocklistFilter pattern).  The kernel loops over RULES,
    not rows — each rule is one vectorized host-equality + prefix test
    over the whole batch with a running longest-match update, so the
    per-batch cost is ``n_rules`` Arrow/NumPy kernels.  Streams, no
    shuffle, fuses into the read chain.
    """

    def __init__(self, rules, host_col: str = "host",
                 path_col: str = "path"):
        seen = set()
        for h, p, _ in rules:
            if (h, p) in seen:
                raise ValueError(f"duplicate rule for ({h!r}, {p!r})")
            seen.add((h, p))
        # longest-first evaluation order is not required (we track max
        # length), but sorting makes the captured state deterministic
        self.rules = sorted(rules, key=lambda r: (r[0], -len(r[1]), r[1]))
        self.host_col = host_col
        self.path_col = path_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        host = batch[self.host_col].to_pandas().to_numpy(dtype=object)
        path = batch[self.path_col].to_pandas().to_numpy(dtype=object)
        n = len(host)
        best_len = np.full(n, -1, dtype=np.int64)
        allowed = np.ones(n, dtype=np.int64)       # default allow
        prefix = np.full(n, "", dtype=object)
        path_s = pd.Series(path, dtype=object)
        for h, p, allow in self.rules:
            hit = ((host == h)
                   & path_s.str.startswith(p).fillna(False).to_numpy()
                   & (len(p) > best_len))
            if hit.any():
                best_len[hit] = len(p)
                allowed[hit] = int(bool(allow))
                prefix[hit] = p
        return (batch
                .append_column("rule_prefix",
                               pa.array(prefix, type=pa.string()))
                .append_column("allowed", pa.array(allowed,
                                                   type=pa.int64())))

    def apply(self, ds, **kw):
        return ds.map_batches(self, batch_format="pyarrow", **kw)


def crawl_budget(ds, key: str = "source", slots: int = 1000,
                 mode: str = "tree"):
    """Proportional-fair crawl-budget apportionment: split ``slots``
    fetch slots across domains proportional to their page counts using
    Hamilton's largest-remainder method (public literature; the US-
    census apportionment scheme) — exactly ``slots`` allocated, every
    domain within one slot of its exact share.

    Pure integers: quotas are ``slots·c_i`` over ``total``; floors get
    assigned first and the leftover slots go to the largest remainders
    (ties to the lexicographically smaller key, a total order).  One
    summary-sized count combine; the apportionment itself is a
    driver-side O(k log k) pass over per-key counts.  Returns
    ``(key, n_pages, alloc)``; a SQL window replay is bit-exact.
    """
    from ..agg import combine_partials

    if slots < 0:
        raise ValueError("crawl_budget: slots must be >= 0")

    def partial(batch: pa.Table) -> pa.Table:
        s = batch[key].to_pandas()
        out = s.value_counts().rename_axis(key).reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False, schema=pa.schema(
            [(key, batch.schema.field(key).type), ("n", pa.int64())]))

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[key], value_cols=["n"], mode=mode).to_pandas()
    if key not in counts.columns or not len(counts):
        return pd.DataFrame({key: pd.Series([], dtype=object),
                             "n_pages": pd.Series([], dtype=np.int64),
                             "alloc": pd.Series([], dtype=np.int64)})
    counts = counts.sort_values(key).reset_index(drop=True)
    n = counts["n"].to_numpy().astype(np.int64)
    total = int(n.sum())
    base = (slots * n) // total
    rem = (slots * n) % total
    give = slots - int(base.sum())
    # largest remainders first, ties to the smaller key (already key-
    # sorted, so a stable sort on -rem realizes the tie-break)
    order = np.argsort(-rem, kind="stable")
    alloc = base.copy()
    alloc[order[:give]] += 1
    return pd.DataFrame({key: counts[key],
                         "n_pages": n,
                         "alloc": alloc.astype(np.int64)})

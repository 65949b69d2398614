"""URL decomposition and domain blocklist filtering.

Two curation staples for Common-Crawl-style page streams:

* :class:`ParseURL` — one RE2 pass (``pyarrow.compute.extract_regex``,
  the same regex engine DuckDB uses, so the SQL oracle is bit-identical)
  splits ``url`` into ``scheme``/``host``/``path`` columns.  Zero-copy
  Arrow in and out; no Python per-row loop.
* :class:`BlocklistFilter` — drops rows whose ``host`` is on a blocked
  set.  The blocklist is closure-captured small broadcast state (shipped
  once per task with the serialized fn, never per batch); the membership
  test is a single vectorized ``pyarrow.compute.is_in``.

Reference analogue: none (the reference has no URL columns); this is a
SURVEY §2.6 LLM-curation extension like TokenCount/QualityScore
(``stages/text.py``).  At 100 TB both stages fuse into the read's map
chain — no shuffle, no state, linear scans.
"""

from __future__ import annotations

from typing import Iterable, Optional

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["ParseURL", "BlocklistFilter", "URL_REGEX"]

#: one capture per component; identical semantics in DuckDB's
#: regexp_extract (both are RE2)
URL_REGEX = r"^(?P<scheme>[a-z][a-z0-9+.\-]*)://(?P<host>[^/]+)(?P<path>/.*)?$"


class ParseURL:
    """Add ``scheme``/``host``/``path`` string columns parsed from ``col``.

    Unparseable URLs yield empty strings (DuckDB ``regexp_extract``
    convention), so downstream group-bys see one well-defined '' bucket
    rather than nulls.
    """

    def __init__(self, col: str = "url", *, keep: Iterable[str] = ("scheme", "host", "path")):
        self.col = col
        self.keep = tuple(keep)

    def __call__(self, batch: pa.Table) -> pa.Table:
        parts = pc.extract_regex(batch[self.col], pattern=URL_REGEX)
        empty = pa.scalar("", type=pa.string())
        for name in self.keep:
            col = pc.if_else(pc.is_valid(parts), pc.struct_field(parts, name), empty)
            # a missing optional group (url with no path) is null inside a
            # valid struct; normalise to '' as well
            batch = batch.append_column(name, pc.fill_null(col, empty))
        return batch

    def apply(self, ds, **kw):
        return ds.map_batches(self, batch_format="pyarrow", **kw)


class BlocklistFilter:
    """Drop rows whose ``col`` value is in ``blocked`` (anti-semi-join
    against a broadcast set).  ``mode="keep"`` inverts it into an
    allowlist filter."""

    def __init__(self, blocked: Iterable[str], col: str = "host", mode: str = "drop"):
        if mode not in ("drop", "keep"):
            raise ValueError(f"BlocklistFilter: unknown mode={mode!r}")
        self.col = col
        self.mode = mode
        # materialise ONCE at plan time; pickled with the fn to each task
        self.blocked = pa.array(sorted(set(blocked)), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        hit = pc.is_in(batch[self.col], value_set=self.blocked)
        mask = hit if self.mode == "keep" else pc.invert(hit)
        return batch.filter(pc.fill_null(mask, self.mode == "drop"))

    def apply(self, ds, **kw):
        return ds.map_batches(self, batch_format="pyarrow", **kw)

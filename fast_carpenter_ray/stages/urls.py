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

__all__ = ["ParseURL", "BlocklistFilter", "CanonicalizeURL", "URL_REGEX"]

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


#: tracking query parameters removed by canonicalization
TRACKING_PARAMS = r"(?:utm_[a-z]+|fbclid|gclid)"


class CanonicalizeURL:
    """Add a ``canon_url`` column: the canonical form of ``col``.

    Canonicalization rules (the classic crawl-dedup normalization set —
    e.g. RFC 3986 §6 syntax-based normalization, public knowledge):

    1. strip the fragment (``#...``);
    2. lowercase scheme and host;
    3. strip the scheme's default port (``:443`` for https, ``:80`` for
       http);
    4. remove tracking query parameters (``utm_*``, ``fbclid``,
       ``gclid``), preserving the relative order of the rest;
    5. strip a trailing slash (``.../?q`` -> ``...?q``, ``.../`` -> ...).

    Every transform is a fixed chain of RE2 ``replace_substring_regex`` /
    ``extract_regex`` passes over the whole column — zero-copy Arrow in
    and out, no Python per row, and the same regex engine DuckDB uses so
    a SQL ``regexp_replace`` replay is bit-identical.  Limitation
    (documented): two tracking parameters that are immediately adjacent
    need a second application of the chain; real-world URLs with at most
    one tracker per position are handled in one pass.

    Reference analogue: none (SURVEY §2.6 LLM-curation extension, like
    ParseURL/BlocklistFilter above).
    """

    PARTS_REGEX = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
                   r"(?P<hostport>[^/?#]+)(?P<rest>.*)$")

    def __init__(self, col: str = "url", out: str = "canon_url"):
        self.col = col
        self.out = out

    def canonicalize(self, urls: pa.ChunkedArray) -> pa.Array:
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        # 1. fragment
        u = pc.replace_substring_regex(urls, pattern="#.*$", replacement="")
        # 2-3. lowercase scheme/host, strip default port, rebuild
        parts = pc.extract_regex(u, pattern=self.PARTS_REGEX)
        scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
        host = pc.utf8_lower(pc.struct_field(parts, "hostport"))
        rest = pc.fill_null(pc.struct_field(parts, "rest"), "")
        host = pc.if_else(
            pc.equal(scheme, "https"),
            pc.replace_substring_regex(host, pattern=":443$", replacement=""),
            host)
        host = pc.if_else(
            pc.equal(scheme, "http"),
            pc.replace_substring_regex(host, pattern=":80$", replacement=""),
            host)
        rebuilt = pc.binary_join_element_wise(scheme, "://", host, rest, "")
        # unparseable URLs pass through the remaining passes untouched
        u = pc.if_else(pc.is_valid(parts), rebuilt, u)
        # 4. tracking params: leading (others follow), then lone/trailing,
        #    then repair a lost '?' separator
        u = pc.replace_substring_regex(
            u, pattern=r"\?" + TRACKING_PARAMS + r"=[^&]*&", replacement="?")
        u = pc.replace_substring_regex(
            u, pattern=r"[?&]" + TRACKING_PARAMS + r"=[^&]*", replacement="")
        u = pc.replace_substring_regex(
            u, pattern=r"^([^?]*)&", replacement=r"\1?", max_replacements=1)
        # 5. trailing slash (before a query, or at the end of the path).
        # Only the FIRST '?' is the path/query boundary — the anchored
        # [^?]* prefix guarantees the matched '/?' is that boundary, so
        # a '/?' inside a query VALUE survives untouched.
        u = pc.replace_substring_regex(u, pattern=r"^([^?]*)/\?",
                                       replacement=r"\1?",
                                       max_replacements=1)
        u = pc.replace_substring_regex(
            u, pattern=r"([^:/])/$", replacement=r"\1", max_replacements=1)
        return u

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column(self.out, self.canonicalize(batch[self.col]))

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

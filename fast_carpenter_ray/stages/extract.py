"""HTML -> text + geo extraction and the per-row hash invariant.

The north-star input is Common-Crawl-style pages ``(url, warc_ts,
html:binary, text, lang)``; the engine recomputes ``text`` from ``html`` and
the per-row invariant is *byte-identical extracted text per url* versus the
reference extractor, enforced by a hash-compare stage (BASELINE.json
``input_hint``).

``extract_one`` IS the reference extractor (single-row, pure); the batched
actor-pool stage applies the same compiled regexes per batch — one shared
definition so the invariant is meaningful (FIXTURES.md §4).

This plays the role fast-carpenter's Define stage plays for derived columns
(``define/variables.py:15-76``): a column-creator ``map_batches`` stage, but
stateful (compiled patterns) -> callable class run as an actor pool.
"""

from __future__ import annotations

import hashlib
import html as _htmlmod
import re
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

__all__ = ["extract_one", "ExtractText", "HashCompare", "sha256_hex"]

_ARTICLE_RE = re.compile(rb"<article>(.*?)</article>", re.DOTALL)
_GEO_RE = re.compile(
    rb'<meta name="geo.position" content="([^";]+);([^"]+)"'
)


def extract_one(html: bytes) -> Tuple[str, float, float]:
    """Reference extractor: (text, lat, lng); NaN coords when no geo tag.

    Text is the html-unescaped <article> body — byte-identical to the
    original document text by construction of the fixture generator.
    (``unescape`` is skipped when no entity marker is present — pure
    fast-path, same output.)
    """
    m = _ARTICLE_RE.search(html)
    if m:
        raw = m.group(1)
        text = raw.decode("utf-8")
        if "&" in text:
            text = _htmlmod.unescape(text)
    else:
        text = ""
    g = _GEO_RE.search(html)
    if g:
        lat, lng = float(g.group(1)), float(g.group(2))
    else:
        lat, lng = float("nan"), float("nan")
    return text, lat, lng


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


class ExtractText:
    """Actor-pool stage: html -> text / lat / lng (+ optional html drop).

    Patterns are compiled once per actor in ``__init__``; ``__call__`` runs
    per batch.  Parsing is inherently per-document, but the loop body is a
    pair of pre-compiled regex searches — the batch boundary stays Arrow.

    ``drop_html=True`` removes the wide binary column immediately after
    extraction so downstream blocks stay slim (SURVEY.md §7.4 "keep html
    out of every stage after extraction").
    """

    def __init__(self, drop_html: bool = True):
        self.drop_html = drop_html
        # compiled once per actor (module-level patterns are already
        # compiled; binding them locally documents the actor contract)
        self.article_re = _ARTICLE_RE
        self.geo_re = _GEO_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch["html"].to_pylist()
        texts: list = [None] * len(htmls)
        lats = np.full(len(htmls), np.nan)
        lngs = np.full(len(htmls), np.nan)
        for i, h in enumerate(htmls):
            t, la, ln = extract_one(h)
            texts[i] = t
            lats[i] = la
            lngs[i] = ln
        if "text" in batch.column_names:
            batch = batch.drop_columns(["text"])
        batch = batch.append_column("text", pa.array(texts, type=pa.string()))
        batch = batch.append_column("lat", pa.array(lats))
        batch = batch.append_column("lng", pa.array(lngs))
        if self.drop_html:
            batch = batch.drop_columns(["html"])
        return batch

    @classmethod
    def apply(cls, ds, concurrency=None, batch_size=None, drop_html: bool = True):
        """Default: stateless task pool (the compiled patterns are
        module-level, so there is no per-actor state to amortize and tasks
        scale elastically with zero pool-startup lag).  Pass
        ``concurrency=(min,max)`` to run as an actor pool instead — the
        right shape once a real model/codec loads in ``__init__``."""
        if concurrency is None:
            return ds.map_batches(
                cls(drop_html=drop_html), batch_format="pyarrow",
                batch_size=batch_size)
        return ds.map_batches(
            cls,
            fn_constructor_kwargs={"drop_html": drop_html},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )


class HashCompare:
    """Per-row invariant enforcement: sha256(text) per url.

    Appends ``text_sha256``; if the batch carries an ``expected_sha256``
    column (or ``expected`` values are derivable), any mismatch raises with
    the offending urls — failing the run loudly rather than silently
    shipping corrupt extractions (north star: "enforced by a hash-compare
    stage").
    """

    def __init__(self, expected_column: Optional[str] = "expected_sha256",
                 strict: bool = True):
        self.expected_column = expected_column
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        hashes = [sha256_hex(t) for t in texts]
        batch = batch.append_column("text_sha256", pa.array(hashes, type=pa.string()))
        if self.expected_column and self.expected_column in batch.column_names:
            expected = batch[self.expected_column].to_pylist()
            bad = [i for i, (h, e) in enumerate(zip(hashes, expected)) if e is not None and h != e]
            if bad and self.strict:
                urls = batch["url"].to_pylist() if "url" in batch.column_names else bad
                raise ValueError(
                    f"hash-compare failed for {len(bad)} rows, e.g. "
                    f"{[urls[i] for i in bad[:3]]}")
            batch = batch.append_column(
                "hash_ok",
                pa.array([e is None or h == e for h, e in zip(hashes, expected)]))
        return batch

    @classmethod
    def apply(cls, ds, concurrency=None, batch_size=None, **kwargs):
        if concurrency is None:
            return ds.map_batches(cls(**kwargs), batch_format="pyarrow",
                                  batch_size=batch_size)
        return ds.map_batches(
            cls,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

"""PII detection and redaction over web text.

A core curation step for crawl-derived training corpora (the reference
has no equivalent — this extends the engine the same way the dedup and
decontamination families do, SURVEY.md §2.5): count / flag documents
containing personally identifiable strings, and rewrite them with typed
placeholder tokens before the corpus is shipped.

Ray-native shape: both passes are single stateless ``map_batches``
stages over the text column — vectorized pandas ``str`` kernels with
patterns compiled once at plan time, no shuffle, no state.  At 100 TB
the corpus streams through; only small per-doc counters (or the
rewritten text) come out.

Oracle story: every pattern below was chosen for *bit-exact* agreement
between Python ``re`` (backtracking, leftmost-first) and DuckDB's RE2
(leftmost-longest) — greedy, alternation-free character-class patterns
where the two disciplines coincide (match lists AND ``sub`` vs
``regexp_replace(..., 'g')`` verified identical on adversarial inputs
in ``tests/test_pii.py``).  ``PII_PATTERNS`` is the single source of
truth shared by the engine stage and the SQL oracle builder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["PII_PATTERNS", "PIIStats", "redact"]

#: kind -> (regex, placeholder).  Order matters for redaction (emails
#: are replaced before phones/IPs so a later pattern never matches
#: inside an earlier placeholder).  Keep RE2-compatible: no lookaround,
#: no backreferences.
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\+\d{1,3}-\d{3}-\d{4}", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IPV4]"),
}


class PIIStats:
    """Per-document PII counts: one int64 ``n_<kind>`` column per
    pattern plus a ``has_pii`` flag — non-overlapping match counts,
    the ``len(regexp_extract_all(...))`` semantics."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        out = {self.id_col: batch[self.id_col].to_numpy()}
        total = np.zeros(len(s), dtype=np.int64)
        for kind, (pat, _) in PII_PATTERNS.items():
            n = s.str.count(pat).to_numpy().astype(np.int64)
            out[f"n_{kind}"] = n
            total += n
        out["has_pii"] = (total > 0).astype(np.int64)
        return pd.DataFrame(out)

    def apply(self, ds):
        return ds.map_batches(self, batch_format="pandas")


def redact(ds, text_col: str = "text"):
    """Rewrite ``text_col`` with the typed placeholders, patterns applied
    in ``PII_PATTERNS`` order (global replace).  Schema is preserved —
    downstream stages see the redacted text under the same column name."""

    def rewrite(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        for pat, repl in PII_PATTERNS.values():
            s = s.str.replace(pat, repl, regex=True)
        batch[text_col] = s
        return batch

    return ds.map_batches(rewrite, batch_format="pandas")

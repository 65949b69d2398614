"""Text-analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

Engine extensions for training-data pipelines (no reference analogue —
SURVEY.md §2.5); each is a vectorized/actor-pool ``map_batches`` column
creator in the Define mold.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["TokenCount", "QualityScore", "LangId", "Fingerprint",
           "TextClean", "chunk_documents",
           "vocab_count", "doc_frequency", "ngram_count", "top_terms",
           "pmi_bigrams", "term_trends", "RepetitionStats",
           "token_familiarity",
           "compression_ratio"]

# a small multilingual stopword table for the n-gram/stopword language
# heuristic (public common-word lists)
_STOPWORDS: Dict[str, frozenset] = {
    "en": frozenset("the and of to a in is it you that he was for on are".split()),
    "de": frozenset("der die das und ist ich nicht sie mit ein auf für den".split()),
    "fr": frozenset("le la les et de un une est je pas pour dans sur que".split()),
    "es": frozenset("el la los las y de un una es en no que por para con".split()),
    "pt": frozenset("o a os as e de um uma é em não que por para com".split()),
}


class TokenCount:
    """Whitespace tokenization + a BPE-ish sub-word estimate.

    ``n_tokens`` = whitespace tokens; ``n_subwords`` = a deterministic
    regex-based sub-word count (letters runs split every 4 chars — a cheap
    stand-in for BPE vocab lookup, stable across runs).
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        toks = s.str.split()
        batch["n_tokens"] = toks.str.len().fillna(0).astype(np.int64)
        batch["n_chars"] = s.str.len().astype(np.int64)
        # ceil(len(word)/4) summed ~ subword count: explode once, bincount
        # back by positional row index (no per-row Python)
        ex = pd.Series(toks.to_numpy(), copy=False).explode().dropna()
        out = np.zeros(len(batch), dtype=np.int64)
        if len(ex):
            sub = (ex.str.len().to_numpy(np.int64) + 3) // 4
            out = np.bincount(ex.index.to_numpy(np.int64), weights=sub,
                              minlength=len(batch)).astype(np.int64)
        batch["n_subwords"] = out
        return batch

    def apply(self, ds):
        return ds.map_batches(self, batch_format="pandas")


class QualityScore:
    """Length / punctuation / stopword-ratio quality heuristics.

    Emits ``mean_word_len``, ``stopword_ratio``, ``alpha_ratio`` and a
    combined ``quality`` in [0, 1].
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop_all = frozenset().union(*_STOPWORDS.values())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        toks = s.str.lower().str.split()
        n_tok = toks.str.len().fillna(0).astype(np.int64)
        n_chars = s.str.len().astype(np.int64)
        n_spaces = s.str.count(" ").astype(np.int64)
        # stopword hits: explode once, isin against the frozen set, bincount
        # back by positional row index (no per-row Python)
        ex = pd.Series(toks.to_numpy(), copy=False).explode().dropna()
        n_stop = np.zeros(len(batch), dtype=np.int64)
        if len(ex):
            hits = ex.isin(self.stop_all).to_numpy(np.float64)
            n_stop = np.bincount(ex.index.to_numpy(np.int64), weights=hits,
                                 minlength=len(batch)).astype(np.int64)
        n_stop = pd.Series(n_stop, index=batch.index)
        n_alpha = s.str.count(r"[A-Za-z]").astype(np.int64)
        denom_tok = np.maximum(n_tok, 1)
        batch["mean_word_len"] = (n_chars - n_spaces) / denom_tok
        batch["stopword_ratio"] = n_stop / denom_tok
        batch["alpha_ratio"] = n_alpha / np.maximum(n_chars, 1)
        wl = batch["mean_word_len"]
        batch["quality"] = (
            0.4 * np.clip(batch["alpha_ratio"], 0, 1)
            + 0.3 * np.clip(batch["stopword_ratio"] * 4.0, 0, 1)
            + 0.3 * np.clip(1.0 - np.abs(wl - 5.0) / 5.0, 0, 1)
        )
        return batch

    def apply(self, ds):
        return ds.map_batches(self, batch_format="pandas")


class LangId:
    """Stopword-overlap language heuristic: argmax over per-language
    stopword hit COUNTS (every occurrence counts), 'und' (undetermined)
    when nothing scores.  Deterministic ties broken by language code
    order.  Tokenization is the RE2 ``[ \\t\\n\\r\\f]+`` class so the
    DuckDB oracle (stopword VALUES join + argmax window) reproduces the
    token stream exactly."""

    def __init__(self, text_col: str = "text", out: str = "lang_pred"):
        self.text_col = text_col
        self.out = out
        self.langs = sorted(_STOPWORDS)
        self.tables = [_STOPWORDS[lang] for lang in self.langs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = (batch[self.text_col].fillna("").str.lower()
                .str.split(r"[ \t\n\r\f]+", regex=True))
        # one explode for all languages, then per-language isin + bincount:
        # scores[(lang, row)] = stopword-occurrence count, argmax over the
        # sorted-lang axis reproduces the original first-max tie-break
        n = len(batch)
        ex = pd.Series(toks.to_numpy(), copy=False).explode().dropna()
        if len(ex):
            idx = ex.index.to_numpy(np.int64)
            scores = np.stack([
                np.bincount(idx, weights=ex.isin(t).to_numpy(np.float64),
                            minlength=n).astype(np.int64)
                for t in self.tables])
            m = scores.max(axis=0)
            pred = np.where(m > 0, np.asarray(self.langs, dtype=object)[
                scores.argmax(axis=0)], "und")
        else:
            pred = np.full(n, "und", dtype=object)
        batch[self.out] = pred
        return batch

    def apply(self, ds, concurrency=None):
        # Default: a TASK pool (state is a handful of frozensets — zero
        # setup cost, so an actor-pool ceiling would only starve the
        # stage behind a big cluster; the earlier (1, 4) cap measurably
        # bottlenecked lang_confusion at 32 CPUs).  Pass an int/tuple to
        # opt into an actor pool when embedding real models here.
        if concurrency is None:
            return ds.map_batches(self, batch_format="pandas")
        return ds.map_batches(
            LangId, fn_constructor_kwargs={"text_col": self.text_col, "out": self.out},
            batch_format="pandas", concurrency=concurrency)


class TextClean:
    """Unicode text normalization for curation pipelines: NFC normalize,
    strip C0/DEL control characters (keeping ``\\t \\n \\r \\f``, which the
    whitespace collapse then folds), collapse whitespace runs to single
    spaces, trim.  Every primitive is chosen for bit-exact SQL replay:
    DuckDB ``nfc_normalize`` implements the same Unicode NFC as Python's
    ``unicodedata`` (both standard-conformant), and the two regex classes
    are plain char classes identical under Python re and RE2.

    Vectorized per batch (``Series.str`` kernels, compiled patterns on the
    class); no shuffle — a pure map stage in the Define mold.
    """

    CTRL = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
    WS = r"[ \t\r\n\f]+"

    def __init__(self, text_col: str = "text", out: str = "text_clean"):
        self.text_col = text_col
        self.out = out
        self._ctrl = re.compile(self.CTRL)
        self._ws = re.compile(self.WS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        c = s.str.normalize("NFC").str.replace(self._ctrl, "", regex=True)
        c = c.str.replace(self._ws, " ", regex=True).str.strip(" ")
        batch[self.out] = c
        return batch

    def apply(self, ds):
        return ds.map_batches(self, batch_format="pandas")


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    chunk_tokens: int = 64, stride: int = 48):
    """RAG-style document chunking: fixed token windows with overlap.

    Tokens are the RE2 ``[ \\t\\n\\r\\f]+`` split (the vocab contract, so a
    DuckDB ``regexp_split_to_array(text, '\\s+')`` oracle reproduces the
    stream); chunk ``c`` covers tokens ``[c*stride, c*stride +
    chunk_tokens)`` and chunks are emitted while ``c*stride < n_tokens``
    (zero-token docs emit no chunks).  ``chunk_text`` rejoins with single
    spaces — whitespace-normalized by construction.

    A pure flat_map-shaped expansion done batch-wise: no shuffle; the
    bookkeeping (starts, lengths) is vectorized, only the final string
    join is per chunk (inherent to string assembly).
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")

    def expand(batch: pd.DataFrame) -> pd.DataFrame:
        # strip edges first: the '+'-quantified split never yields empty
        # tokens mid-string, so no per-row filtering is needed
        s = batch[text_col].fillna("").str.strip(" \t\n\r\f")
        toks = s.str.split(r"[ \t\n\r\f]+", regex=True)
        tok_arr = toks.to_numpy()
        n = toks.str.len().to_numpy(np.int64)
        n = np.where(s.str.len().to_numpy(np.int64) == 0, 0, n)
        n_chunks = np.where(n > 0, (n + stride - 1) // stride, 0)
        doc_pos = np.repeat(np.arange(len(batch), dtype=np.int64), n_chunks)
        chunk_id = (np.arange(int(n_chunks.sum()), dtype=np.int64)
                    - np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks))
        starts = chunk_id * stride
        lens = np.minimum(chunk_tokens, n[doc_pos] - starts)
        texts = [" ".join(tok_arr[d][s:s + chunk_tokens])
                 for d, s in zip(doc_pos.tolist(), starts.tolist())]
        ids = batch[id_col].to_numpy()
        return pd.DataFrame({
            id_col: ids[doc_pos],
            "chunk_id": chunk_id,
            "chunk_start": starts,
            "n_tokens": lens.astype(np.int64),
            "chunk_text": pd.Series(texts, dtype=object),
        })

    return ds.map_batches(expand, batch_format="pandas")


class Fingerprint:
    """Order-sensitive 63-bit rolling-hash document fingerprint
    (deterministic across processes; int64-positive for SQL friendliness).

    Every primitive is chosen to be reproducible in ANSI-ish SQL so the
    driver's DuckDB oracle can recompute it exactly: tokens are the RE2
    ``[ \\t\\n\\r\\f]+`` split (matching ``regexp_split_to_array(.,'\\s+')``),
    the per-token hash is the first 60 bits of sha256 (DuckDB:
    ``('0x' || substring(sha256(t), 1, 15))::BIGINT``), and the roll is
    ``(h * P + th) mod 2**64`` in 128-bit arithmetic (``HUGEINT`` /
    Python int), masked to 63 bits at the end.

    Vectorized per batch: the sequential fold ``h = h*P + th`` closes to
    ``FNV0*P^n + sum(th_i * P^(n-1-i)) mod 2**64``, which one explode +
    one uint64 power table + one wrapping ``np.add.at`` computes with no
    per-row Python (uint64 overflow IS the mod-2^64).  Per-token sha256
    runs only over each batch's UNIQUE tokens, memoized per actor.
    ``hash_mode="fast"`` swaps sha256 for the dedup family's vectorized
    keyed siphash (``_hash_tokens_fast``) — same fold, ~40x cheaper, not
    SQL-replayable (the MinHash/winnow ``hash_mode`` contract); sha256
    stays the oracle-mode default."""

    MASK = (1 << 63) - 1
    P = 1099511628211
    FNV0 = 14695981039346656037
    _CACHE_MAX = 2_000_000  # bound the per-actor sha256 memo

    def __init__(self, text_col: str = "text", out: str = "fingerprint",
                 hash_mode: str = "sha256"):
        if hash_mode not in ("sha256", "fast"):
            raise ValueError("hash_mode must be 'sha256' or 'fast'")
        self.text_col = text_col
        self.out = out
        self.hash_mode = hash_mode
        self._cache: Dict[str, int] = {}

    @classmethod
    def fingerprint(cls, text: str) -> int:
        """Per-row reference fold (the SQL spec; pytest pins the
        vectorized batch path bit-equal to this)."""
        h = cls.FNV0
        for tok in re.split(r"[ \t\n\r\f]+", text.lower()):
            if not tok:
                continue
            th = int(hashlib.sha256(tok.encode("utf-8")).hexdigest()[:15], 16)
            h = (h * cls.P + th) & ((1 << 64) - 1)
        return h & cls.MASK

    def _token_hashes(self, flat: np.ndarray) -> np.ndarray:
        if self.hash_mode == "fast":
            from .dedup import _hash_tokens_fast

            return _hash_tokens_fast(flat)
        uniq, inv = np.unique(flat, return_inverse=True)
        cache = self._cache
        if len(cache) > self._CACHE_MAX:
            cache.clear()
        uh = np.empty(len(uniq), dtype=np.uint64)
        for i, t in enumerate(uniq):
            v = cache.get(t)
            if v is None:
                v = int(hashlib.sha256(
                    t.encode("utf-8")).hexdigest()[:15], 16)
                cache[t] = v
            uh[i] = v
        return uh[inv]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        toks = (pd.Series(texts, dtype=object).fillna("").str.lower()
                .str.split(r"[ \t\n\r\f]+", regex=True))
        ex = pd.Series(toks.to_numpy(), copy=False).explode().dropna()
        ex = ex[ex != ""]
        n_rows = len(batch)
        idx = ex.index.to_numpy(np.int64)
        n = np.bincount(idx, minlength=n_rows).astype(np.int64)
        with np.errstate(over="ignore"):
            # uint64 power table P^0..P^max(n): wraparound == mod 2^64
            pw = np.empty(int(n.max()) + 1 if n_rows else 1,
                          dtype=np.uint64)
            pw[0] = 1
            for k in range(1, len(pw)):
                pw[k] = pw[k - 1] * np.uint64(self.P)
            starts = np.concatenate(
                [[0], np.cumsum(n)])[:-1] if n_rows else np.empty(0, np.int64)
            within = np.arange(len(idx), dtype=np.int64) - starts[idx]
            contrib = self._token_hashes(ex.to_numpy(dtype=object)) \
                * pw[n[idx] - 1 - within]
            acc = np.full(n_rows, 0, dtype=np.uint64)
            np.add.at(acc, idx, contrib)
            h = np.uint64(self.FNV0) * pw[n] + acc
        fps = (h & np.uint64(self.MASK)).astype(np.int64)
        return batch.append_column(self.out, pa.array(fps, type=pa.int64()))

    def apply(self, ds):
        return ds.map_batches(self, batch_format="pyarrow")


def vocab_count(ds, text_col: str = "text", min_count: int = 1,
                mode: str = "hash"):
    """Corpus-wide token frequency table (vocabulary building).

    Per-batch tokenize + local ``value_counts`` partial (so the shuffle
    moves one row per DISTINCT token per block, not one per token
    occurrence), then one hash combine keyed on the token — the vocabulary
    grows with the corpus, so the combine defaults to ``mode="hash"``
    (distributed; never a driver merge).  Returns ``token, n`` with
    ``n >= min_count``.

    Tokenization is the explicit class ``[ \\t\\n\\r\\f]+`` — exactly RE2's
    ``\\s`` (which, unlike Python's, excludes ``\\v`` and unicode spaces) —
    so a DuckDB ``regexp_split_to_array(text, '\\s+')`` oracle produces
    the identical token stream.
    """
    from ..agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        toks = s.str.split(r"[ \t\n\r\f]+", regex=True).explode()
        toks = toks[(toks != "") & toks.notna()]
        out = toks.value_counts().rename_axis("token").rename("n").reset_index()
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = ds.map_batches(partial, batch_format="pandas")
    combined = combine_partials(parts, keys=["token"], value_cols=["n"],
                                mode=mode)

    if min_count > 1:
        def thresh(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.greater_equal(batch["n"], min_count))

        combined = combined.map_batches(thresh, batch_format="pyarrow")
    return combined


def doc_frequency(ds, text_col: str = "text", id_col: str = "doc_id",
                  min_df: int = 1):
    """Document frequency per token (the exact DF leg of TF-IDF): the
    number of DISTINCT documents containing each token.

    Per-batch (token, doc) pair dedup (a doc's repeated token counts
    once), shrunk in-batch to ``(token, df)`` partial counts, then ONE
    hash combine keyed on the token.  Each document's text lives in
    exactly one input row, so the per-batch-deduped pairs are globally
    unique and the distinct-doc count is a plain sum — no per-token
    group tasks (the earlier ``map_groups`` spawned one Python call per
    vocabulary entry).  Assumes ``id_col`` is unique per row (the
    documents-table contract); pre-dedup upstream if it is not.
    Same RE2-compatible tokenizer as :func:`vocab_count`.  Returns
    ``token, df`` with ``df >= min_df``.
    """
    from ..agg import combine_partials

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        toks = s.str.split(r"[ \t\n\r\f]+", regex=True)
        out = pd.DataFrame({id_col: batch[id_col], "token": toks}).explode("token")
        out = out[(out["token"] != "") & out["token"].notna()]
        out = (out.drop_duplicates()["token"].value_counts()
               .rename_axis("token").rename("df").reset_index())
        out["df"] = out["df"].astype(np.int64)
        return out

    out = combine_partials(ds.map_batches(pairs, batch_format="pandas"),
                           keys=["token"], value_cols=["df"], mode="hash")
    if min_df > 1:
        def thresh(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.greater_equal(batch["df"], min_df))

        out = out.map_batches(thresh, batch_format="pyarrow")
    return out


def ngram_count(ds, text_col: str = "text", n: int = 2, min_count: int = 1,
                mode: str = "hash"):
    """Corpus-wide word n-gram frequency table (the LM-counts leg of a
    training-data pipeline; unigram case == :func:`vocab_count`).

    Per-batch: tokenize (same RE2-compatible ``[ \\t\\n\\r\\f]+`` class as
    vocab_count), drop empties, then form n-grams VECTORIZED — n shifted
    views of the flat token array joined where all n tokens share a
    document — and shrink to a local ``value_counts`` partial.  One hash
    combine keyed on the n-gram (the n-gram space grows with the corpus:
    never a driver merge).  Returns ``ngram, n`` rows with
    ``n >= min_count``.
    """
    if n < 1:
        raise ValueError("ngram_count: n must be >= 1")
    from ..agg import combine_partials

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        ex = s.str.split(r"[ \t\n\r\f]+", regex=True).explode()
        ex = ex[(ex != "") & ex.notna()]
        tok = ex.to_numpy(dtype=object)
        doc = ex.index.to_numpy()
        m = len(tok) - n + 1
        if m <= 0:
            return pd.DataFrame({"ngram": pd.Series([], dtype=str),
                                 "n": pd.Series([], dtype=np.int64)})
        grams = pd.Series(tok[:m])
        for i in range(1, n):
            grams = grams + " " + pd.Series(tok[i:m + i])
        same = doc[:m] == doc[n - 1:]
        out = (grams[same].value_counts()
               .rename_axis("ngram").rename("n").reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    combined = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["ngram"], value_cols=["n"], mode=mode)

    if min_count > 1:
        import pyarrow.compute as pc

        combined = combined.map_batches(
            lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
            batch_format="pyarrow")
    return combined


def top_terms(ds, text_col: str = "text", id_col: str = "doc_id",
              mode: str = "tree"):
    """Most distinctive term per document — the integer-exact TF-IDF
    argmax: per doc, the token maximising ``(tf DESC, df ASC, token ASC)``
    (highest term frequency; rare-in-corpus breaks ties; lexicographic
    last).  All keys are integers/strings, so the ranking is bit-exact
    against a SQL ``row_number()`` oracle — no float idf involved.

    Two passes: (1) a document-frequency table (per-batch distinct
    (doc, token) shrink -> ``combine_partials``; token space is the
    vocabulary, summary-sized next to the docs), broadcast to pass (2)
    as closure state on a fused per-batch argmax — no shuffle touches
    the doc-sized stream.  For an unbounded vocabulary, build the DF
    side with :func:`doc_frequency` (hash shuffle) and swap the closure
    map for a ``lookup_join``.
    """
    from ..agg import combine_partials

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        ex = s.str.split(r"[ \t\n\r\f]+", regex=True).explode()
        ex = ex[(ex != "") & ex.notna()]
        d = pd.DataFrame({"row": ex.index, "token": ex.to_numpy()})
        out = (d.drop_duplicates()["token"].value_counts()
               .rename_axis("token").rename("df").reset_index())
        out["df"] = out["df"].astype(np.int64)
        return out

    df_tab = combine_partials(
        ds.map_batches(df_partial, batch_format="pandas"),
        keys=["token"], value_cols=["df"], mode=mode).to_pandas()
    df_map = dict(zip(df_tab["token"], df_tab["df"].astype(np.int64)))

    def best(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        ex = s.str.split(r"[ \t\n\r\f]+", regex=True).explode()
        ex = ex[(ex != "") & ex.notna()]
        if not len(ex):
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "token": pd.Series([], dtype=str),
                                 "tf": pd.Series([], dtype=np.int64),
                                 "df": pd.Series([], dtype=np.int64)})
        tf = (pd.DataFrame({"row": ex.index, "token": ex.to_numpy()})
              .groupby(["row", "token"], sort=False).size()
              .rename("tf").reset_index())
        tf["df"] = tf["token"].map(df_map).astype(np.int64)
        tf = tf.sort_values(["row", "tf", "df", "token"],
                            ascending=[True, False, True, True],
                            kind="mergesort")
        top = tf.drop_duplicates("row", keep="first")
        ids = batch[id_col].to_numpy()
        return pd.DataFrame({
            id_col: ids[top["row"].to_numpy()],
            "token": top["token"].to_numpy(),
            "tf": top["tf"].to_numpy().astype(np.int64),
            "df": top["df"].to_numpy(),
        })

    return ds.map_batches(best, batch_format="pandas")


def pmi_bigrams(ds, text_col: str = "text", min_count: int = 5,
                mode: str = "tree"):
    """Adjacent-bigram association strength: for each bigram (a, b) with
    ``c_ab >= min_count``, the PMI *ratio* ``N * c_ab / (c_a * c_b)``
    (N = total bigram occurrences).  The ratio is emitted instead of its
    log: one IEEE division of exactly-representable int64s is
    bit-identical in NumPy and SQL, and log is monotone so every
    downstream ranking is unchanged.

    Shape: the corpus shrinks to bigram + unigram count tables (existing
    ``ngram_count``/``vocab_count`` partial+combine machinery); the final
    join + division runs on the driver over the vocabulary-sized tables
    (vocab**2 worst case — summary-sized next to the corpus; for a truly
    unbounded bigram space run both counts in ``mode="hash"`` and do the
    division in a ``lookup_join``-style broadcast of the unigram side).
    Returns ``ngram, n, ratio`` rows.
    """
    big = ngram_count(ds, text_col=text_col, n=2, min_count=1,
                      mode=mode).to_pandas()
    uni = vocab_count(ds, text_col=text_col, min_count=1,
                      mode=mode).to_pandas()
    n_total = np.int64(big["n"].sum())
    big = big[big["n"] >= min_count].copy()
    toks = big["ngram"].str.split(" ", n=1, expand=True)
    uni_map = dict(zip(uni["token"], uni["n"].astype(np.int64)))
    c_a = toks[0].map(uni_map).to_numpy(dtype=np.int64)
    c_b = toks[1].map(uni_map).to_numpy(dtype=np.int64)
    c_ab = big["n"].to_numpy(dtype=np.int64)
    ratio = (n_total * c_ab).astype(np.float64) / (c_a * c_b).astype(
        np.float64)
    return pd.DataFrame({"ngram": big["ngram"].to_numpy(),
                         "n": c_ab, "ratio": ratio})


def term_trends(ds, text_col: str = "text", day_col: str = "day",
                mode: str = "hash"):
    """Day-over-day term-frequency trend: for each token and day with a
    previous-day observation, the count and the ratio to the previous
    observed day's count.

    The trending-topics leg of a crawl pipeline.  Shape: per-batch
    (day, token) occurrence-count partials (explode + groupby — no
    dedup, term FREQUENCY not document frequency) -> ONE hash combine
    keyed (token, day) -> a token-keyed ordered lag pass (group size =
    days per token, span-bounded).  ``ratio`` is a single IEEE division
    of two exact int64 counts — bit-equal to the SQL lag window, no
    rounding needed.  Returns ``token, day, n, ratio``.
    """
    from ..agg import combine_partials, default_partitions

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        toks = s.str.split(r"[ \t\n\r\f]+", regex=True)
        out = pd.DataFrame({"day": batch[day_col].astype(np.int64),
                            "token": toks}).explode("token")
        out = out[(out["token"] != "") & out["token"].notna()]
        out = (out.groupby(["token", "day"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["token", "day"], value_cols=["n"], mode=mode)

    # lag within token, vectorized per HASH BUCKET: one sorted pandas
    # pass over each bucket's complete token groups instead of one
    # Python call per vocabulary entry (the group count here IS the
    # vocabulary — per-group dispatch would dominate at corpus scale)
    num_partitions = default_partitions()

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "token" not in batch.columns:
            # empty blocks can lose the combine's schema (Ray quirk)
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "day": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.uint64)})
        out = batch[["token", "day", "n"]].copy()
        out["_part"] = pd.util.hash_pandas_object(
            batch["token"], index=False).to_numpy() % num_partitions
        return out

    def lag_bucket(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"token": pd.Series([], dtype=object),
                              "day": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64),
                              "ratio": pd.Series([], dtype=np.float64)})
        if len(part) == 0:
            return empty
        g = part.sort_values(["token", "day"], kind="mergesort")
        tok = g["token"].to_numpy(dtype=object)
        day = g["day"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        keep = np.zeros(len(g), dtype=bool)
        keep[1:] = tok[1:] == tok[:-1]  # has a previous day of same token
        if not keep.any():
            return empty
        prev = np.empty(len(g), dtype=np.int64)
        prev[1:] = n[:-1]
        return pd.DataFrame({
            "token": tok[keep], "day": day[keep], "n": n[keep],
            "ratio": n[keep].astype(np.float64)
            / prev[keep].astype(np.float64)})

    return (counts.map_batches(bucketize, batch_format="pandas")
            .groupby("_part", num_partitions=num_partitions)
            .map_groups(lag_bucket, batch_format="pandas"))


class RepetitionStats:
    """Within-document repetition signals (Gopher-style web-text quality
    filters, public literature: Rae et al. 2021 §A1.1): duplicate-token
    and duplicate-bigram fractions plus the top-token frequency ratio.

    All counts are exact integers and every ratio is ONE f64 division of
    exact ints, so an independent SQL engine reproduces each output bit.
    Vectorized: one pandas explode + two groupbys per batch — no Python
    loop over rows.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy()
        toks = batch[self.text_col].fillna("").str.lower().str.split()
        n_tok = toks.str.len().fillna(0).astype(np.int64).to_numpy()
        long = pd.DataFrame({
            "i": np.repeat(np.arange(len(batch)), n_tok),
            "w": [w for ws in toks for w in ws],
        })
        n_distinct = np.zeros(len(batch), dtype=np.int64)
        top_n = np.zeros(len(batch), dtype=np.int64)
        n_big = np.maximum(n_tok - 1, 0)
        n_distinct_big = np.zeros(len(batch), dtype=np.int64)
        if len(long):
            per = long.groupby(["i", "w"], sort=False).size()
            agg = per.groupby(level=0).agg(["size", "max"])
            n_distinct[agg.index.to_numpy()] = agg["size"].to_numpy()
            top_n[agg.index.to_numpy()] = agg["max"].to_numpy()
            nxt = long.groupby("i", sort=False)["w"].shift(-1)
            ok = nxt.notna()
            big = pd.DataFrame({"i": long["i"][ok],
                                "b": long["w"][ok] + " " + nxt[ok]})
            if len(big):
                db = big.groupby("i", sort=False)["b"].nunique()
                n_distinct_big[db.index.to_numpy()] = db.to_numpy()
        d_tok = np.maximum(n_tok, 1).astype(np.float64)
        d_big = np.maximum(n_big, 1).astype(np.float64)
        return pd.DataFrame({
            self.id_col: ids,
            "n_tok": n_tok,
            "n_distinct": n_distinct,
            "top_n": top_n,
            "n_bigrams": n_big,
            "n_distinct_bigrams": n_distinct_big,
            "dup_token_ratio": (n_tok - n_distinct) / d_tok,
            "top_token_ratio": top_n / d_tok,
            "dup_bigram_ratio": (n_big - n_distinct_big) / d_big,
        })

    def apply(self, ds):
        return ds.map_batches(self, batch_format="pandas")


def token_familiarity(ds, text_col: str = "text", id_col: str = "doc_id",
                      vocab_budget: int = 20_000_000,
                      tail_factor: float = 0.9, mode: str = "hash"):
    """CCNet-style corpus-familiarity scoring with a head/middle/tail
    split (cf. CCNet's perplexity bucketing, Wenzek et al. 2020 — public
    literature): each document's ``familiarity`` is the mean corpus
    frequency of its tokens, a self-trained unigram stand-in for an LM
    score, and documents bucket as head (0, ``familiarity >= m``),
    middle (1) or tail (2, ``familiarity < tail_factor*m``) around the
    corpus occurrence-weighted mean ``m = sum(c^2)/sum(c)``.

    Exactness: token hashes are the sha256 prefix (SQL-replayable),
    counts are exact ints, ``m`` is one float division of exact integer
    sums (summed driver-side in arbitrary-precision Python ints), and
    ``familiarity`` one IEEE division — so the whole chain sits under a
    hash-exact DuckDB oracle.  Tokens are the RE2-compatible
    ``[ \\t\\n\\r\\f]+`` split of :func:`vocab_count` (no lowercasing).

    Scale shape: ONE token-hash-keyed combine over per-batch distinct
    counts (ints only, text never shuffles); the vocabulary table is
    collected under ``vocab_budget`` (loud raise above — the
    ``Decontaminate`` contract) and broadcast once via ``ray.put``; the
    corpus then streams through one scoring pass with no shuffle.
    Tokens absent from the broadcast (possible only when scoring a
    corpus different from the one counted) floor to count 1.  Documents
    with zero tokens are omitted (mirrors the SQL group-by).

    Returns ``(doc_id, n_tokens, sum_tf, familiarity, bucket)``.
    """
    import ray

    from ..agg import combine_partials
    from .dedup import _stable_token_hash

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        toks = s.str.split(r"[ \t\n\r\f]+", regex=True).explode()
        toks = toks[(toks != "") & toks.notna()]
        vc = toks.value_counts()
        h = np.fromiter((_stable_token_hash(t) for t in vc.index),
                        dtype=np.uint64, count=len(vc))
        return pd.DataFrame({"h": h.view(np.int64),
                             "c": vc.to_numpy().astype(np.int64)})

    counts_ds = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["h"], value_cols=["c"], mode=mode).materialize()
    n_vocab = counts_ds.count()
    if n_vocab > vocab_budget:
        raise ValueError(
            f"token_familiarity: {n_vocab} distinct tokens exceed the "
            f"{vocab_budget} driver broadcast budget")
    counts = counts_ds.to_pandas()
    hs = counts["h"].to_numpy().view(np.uint64)
    cs = counts["c"].to_numpy().astype(np.int64)
    order = np.argsort(hs)
    hs, cs = hs[order], cs[order]
    # exact integer sums (arbitrary precision; vocab-bounded loop)
    t1 = int(np.sum(cs, dtype=np.int64))
    t2 = sum(int(x) * int(x) for x in cs)
    m = float(t2) / float(t1) if t1 else 0.0
    tail_t = tail_factor * m
    ref = ray.put((hs, cs))

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        vh, vc = ray.get(ref)
        s = batch[text_col].fillna("")
        toks = s.str.split(r"[ \t\n\r\f]+", regex=True)
        df = pd.DataFrame({id_col: batch[id_col], "tok": toks}).explode("tok")
        df = df[(df["tok"] != "") & df["tok"].notna()]
        if not len(df):
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "n_tokens": pd.Series([], dtype=np.int64),
                                 "sum_tf": pd.Series([], dtype=np.int64),
                                 "familiarity": pd.Series([], dtype=np.float64),
                                 "bucket": pd.Series([], dtype=np.int64)})
        uniq, inv = np.unique(df["tok"].to_numpy(), return_inverse=True)
        uh = np.fromiter((_stable_token_hash(t) for t in uniq),
                         dtype=np.uint64, count=len(uniq))
        pos = np.searchsorted(vh, uh)
        inb = pos < vh.size
        found = inb & (vh[np.minimum(pos, vh.size - 1)] == uh)
        ucnt = np.where(found, vc[np.minimum(pos, vh.size - 1)], 1)
        df["tf"] = ucnt[inv]
        g = df.groupby(id_col, sort=False).agg(
            n_tokens=("tf", "size"), sum_tf=("tf", "sum")).reset_index()
        n = g["n_tokens"].to_numpy().astype(np.int64)
        st = g["sum_tf"].to_numpy().astype(np.int64)
        fam = st / n
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "n_tokens": n, "sum_tf": st, "familiarity": fam,
            "bucket": np.where(fam >= m, 0,
                               np.where(fam < tail_t, 2, 1)).astype(np.int64),
        })

    return ds.map_batches(score, batch_format="pandas")


def compression_ratio(ds, text_col: str = "text", id_col: str = "doc_id",
                      level: int = 6):
    """Per-document zlib compression ratio — the classic repetitiveness
    / quality signal (low ratio = highly templated or repeated content;
    ratios near 1 = high-entropy text), used by Gopher-style quality
    pipelines (public literature).

    Pure per-batch map, zero shuffles; the compressor is stdlib zlib
    (DEFLATE — deterministic for a fixed level and library, so reruns
    reproduce bit-identical output, but no SQL engine exposes it: the
    driver oracle is rows-only and pytest pins a direct recompute).
    Returns ``(id, raw_len, comp_len, ratio)`` with ``raw_len`` the
    UTF-8 byte length and ``ratio`` one IEEE division; empty docs emit
    ratio NaN.
    """
    import zlib

    lvl = int(level)

    def score(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        raw = np.empty(len(texts), dtype=np.int64)
        comp = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            b = (t or "").encode("utf-8")
            raw[i] = len(b)
            comp[i] = len(zlib.compress(b, lvl))
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = np.where(raw > 0, comp / raw, np.nan)
        return pa.table({
            id_col: batch[id_col],
            "raw_len": pa.array(raw, type=pa.int64()),
            "comp_len": pa.array(comp, type=pa.int64()),
            "ratio": pa.array(ratio, type=pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def cell_terms(ds, cell_col: str = "cell", text_col: str = "text",
               k: int = 3):
    """Top-``k`` terms per grid cell by count, ties broken token
    ascending — the per-tile vocabulary signature (geo x text
    crossover; reference analogue: none, SURVEY §2.5 extension).

    Shape: per-batch vectorized explode shrinks to (cell, tok, n)
    partial counts before anything leaves the task; ONE (cell, tok)
    hash combine; then the group_topk two-phase pattern — per-batch
    partial top-k bounds the final shuffle to O(cells x k per block)
    before the per-cell head-k (mixed sort direction, so the native-Max
    encoding trick from language_frontiers does not apply).

    Output: ``(cell, tok, n, rank)`` with rank 1..k.
    """
    from ..agg import combine_partials, default_partitions

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = (batch[text_col].fillna("").str.lower()
                .str.split(r"[ \t\n\r\f]+", regex=True))
        df = pd.DataFrame({"cell": batch[cell_col].to_numpy(),
                           "tok": toks}).explode("tok")
        df = df[(df["cell"] >= 0) & df["tok"].notna() & (df["tok"] != "")]
        out = (df.groupby(["cell", "tok"], as_index=False).size()
               .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["cell", "tok"], value_cols=["n"], mode="hash")

    num_partitions = default_partitions()

    def partial_topk(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "cell" not in batch.columns:
            return pd.DataFrame({"cell": pd.Series([], dtype=np.int64),
                                 "tok": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.uint64)})
        out = (batch.sort_values(["n", "tok"], ascending=[False, True],
                                 kind="stable")
               .groupby("cell", sort=False).head(k).copy())
        out["_part"] = pd.util.hash_pandas_object(
            out["cell"], index=False).to_numpy() % num_partitions
        return out

    def final_topk_bucket(part: pd.DataFrame) -> pd.DataFrame:
        # head-k per cell, vectorized over the whole bucket: one sorted
        # pass + groupby head instead of one Python call per cell
        g = (part.drop(columns=["_part"])
             .sort_values(["cell", "n", "tok"],
                          ascending=[True, False, True], kind="mergesort"))
        out = g.groupby("cell", sort=False).head(k).copy()
        out["rank"] = out.groupby("cell", sort=False).cumcount() + 1
        out["rank"] = out["rank"].astype(np.int64)
        return out

    return (counts.map_batches(partial_topk, batch_format="pandas")
            .groupby("_part", num_partitions=num_partitions)
            .map_groups(final_topk_bucket, batch_format="pandas"))


def vocab_drift(ds, text_col: str = "text", period_col: str = "period",
                min_support: int = 5, mode: str = "hash"):
    """Per-token chi-squared drift between two corpus periods — the
    vocabulary-shift diagnostic of a rolling crawl (Kilgarriff 2001
    corpus-comparison chi², public literature).

    For token counts ``a`` (period 0) and ``b`` (period 1) with period
    totals ``Na``/``Nb``, the 2x2 chi² statistic is

        chi2 = N * (a*(Nb-b) - b*(Na-a))² / (Na*Nb*(a+b)*(N-a-b))

    The signed numerator root ``a*(Nb-b) - b*(Na-a)`` is exact int64;
    the remaining chain is a FIXED float64 op order mirrored in the SQL
    oracle, so results hash bit-identically.  Tokens with
    ``a + b < min_support`` are dropped (chi² is meaningless there).

    Shape: per-batch (token, period) occurrence partials -> ONE hash
    combine -> per-token pivot in token-keyed group tasks; the period
    totals are a two-row aggregate broadcast in the closure.
    Returns ``token, a, b, chi2``.
    """
    from ..agg import combine_partials, default_partitions

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].fillna("")
        toks = s.str.split(r"[ \t\n\r\f]+", regex=True)
        out = pd.DataFrame({"period": batch[period_col].astype(np.int64),
                            "token": toks}).explode("token")
        out = out[(out["token"] != "") & out["token"].notna()]
        out = (out.groupby(["token", "period"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["token", "period"], value_cols=["n"], mode=mode).materialize()

    from ray.data.aggregate import Sum

    def period_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        na = np.int64(df.loc[df["period"] == 0, "n"].sum())
        nb = np.int64(df.loc[df["period"] == 1, "n"].sum())
        return pa.table({"na": pa.array([na]), "nb": pa.array([nb])})

    tot = counts.map_batches(period_partial, batch_format="pyarrow") \
        .aggregate(Sum("na", alias_name="na"), Sum("nb", alias_name="nb"))
    na, nb = np.int64(tot["na"]), np.int64(tot["nb"])
    n_total = na + nb

    # per-token pivot + chi2, vectorized per HASH BUCKET (one pandas
    # groupby-sum per bucket instead of one Python call per vocabulary
    # entry); the elementwise float chain evaluates in the exact same
    # left-to-right order as the previous scalar code, so outputs stay
    # bit-identical under the SQL oracle
    num_partitions = default_partitions()

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "token" not in batch.columns:
            # empty blocks can lose the combine's schema (Ray quirk)
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "period": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64),
                                 "_part": pd.Series([], dtype=np.uint64)})
        out = batch[["token", "period", "n"]].copy()
        out["_part"] = pd.util.hash_pandas_object(
            batch["token"], index=False).to_numpy() % num_partitions
        return out

    def chi2_bucket(part: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"token": pd.Series([], dtype=object),
                              "a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64),
                              "chi2": pd.Series([], dtype=np.float64)})
        if len(part) == 0:
            return empty
        piv = (part.assign(
            a=np.where(part["period"] == 0, part["n"], 0),
            b=np.where(part["period"] == 1, part["n"], 0))
            .groupby("token", sort=False)[["a", "b"]].sum())
        a = piv["a"].to_numpy(np.int64)
        b = piv["b"].to_numpy(np.int64)
        keep = (a + b >= min_support) & (n_total - a - b > 0)
        if not keep.any():
            return empty
        a, b = a[keep], b[keep]
        num = a * (nb - b) - b * (na - a)  # exact int64
        c = (np.float64(n_total) * num.astype(np.float64)
             * num.astype(np.float64)
             / (np.float64(na) * np.float64(nb)
                * (a + b).astype(np.float64)
                * (n_total - a - b).astype(np.float64)))
        return pd.DataFrame({
            "token": piv.index.to_numpy(dtype=object)[keep],
            "a": a, "b": b, "chi2": c})

    return (counts.map_batches(bucketize, batch_format="pandas")
            .groupby("_part", num_partitions=num_partitions)
            .map_groups(chi2_bucket, batch_format="pandas"))

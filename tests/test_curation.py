"""Curation operators: PII detect/redact, deterministic train-order
shuffle, domain-mixture sampling, sequence packing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.pii import PII_PATTERNS, PIIStats, redact
from fast_carpenter_ray.stages.sample import (
    mix_hash, mixture_sample, train_order)
from fast_carpenter_ray.stages.packing import bucket_summary, pack_sequences


def _ds(rows, cols=("doc_id", "text")):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        c: pa.array([r[i] for r in rows],
                    type=pa.int64() if c.endswith("_id") else None)
        for i, c in enumerate(cols)}))


# -- PII ---------------------------------------------------------------------

PII_ROWS = [
    (1, "contact user5@example.com or admin.x+tag@sub.domain.org now"),
    (2, "call +1-555-0192 from 10.0.0.1 and 192.168.255.255."),
    (3, "no pii here at all"),
    (4, "glued email@domain.com.email2@domain2.net and +44-201-7777"),
    (5, ""),
]


def test_pii_stats(ray_session):
    out = (PIIStats().apply(_ds(PII_ROWS)).to_pandas()
           .set_index("doc_id").sort_index())
    assert out.loc[1, "n_email"] == 2 and out.loc[1, "has_pii"] == 1
    assert out.loc[2, "n_phone"] == 1 and out.loc[2, "n_ipv4"] == 2
    assert out.loc[3].sum() == 0
    # the glue splits into two matches ("...com.email" + "2@domain2.net")
    # — identically in Python re and DuckDB RE2 (test_pii_duckdb_parity)
    assert out.loc[4, "n_email"] == 2
    assert out.loc[4, "n_phone"] == 1
    assert out.loc[5].sum() == 0
    assert set(out.dtypes) == {np.dtype("int64")}


def test_pii_redact_matches_python_re(ray_session):
    import re

    got = (redact(_ds(PII_ROWS)).to_pandas()
           .set_index("doc_id").sort_index()["text"])
    for did, text in PII_ROWS:
        want = text
        for pat, repl in PII_PATTERNS.values():
            want = re.sub(pat, repl, want)
        assert got.loc[did] == want
    assert "[EMAIL]" in got.loc[1] and "[IPV4]" in got.loc[2]


def test_pii_duckdb_parity(ray_session):
    """The engine regex kernels agree with DuckDB RE2 on counts AND
    global replacement — the property the oracle queries rely on."""
    import duckdb

    con = duckdb.connect()
    for _, text in PII_ROWS:
        red = text
        for pat, repl in PII_PATTERNS.values():
            n_sql = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [red, pat]
            ).fetchone()[0]
            n_py = pd.Series([red]).str.count(pat).iloc[0]
            assert n_sql == n_py
            red_sql = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [red, pat, repl]
            ).fetchone()[0]
            red = pd.Series([red]).str.replace(pat, repl, regex=True).iloc[0]
            assert red == red_sql


# -- train_order -------------------------------------------------------------

def test_train_order_is_seeded_permutation(ray_session):
    rows = [(i, f"doc {i}") for i in range(100)]
    out0 = train_order(_ds(rows), seed=0).to_pandas()
    # a permutation of the input ids, ordered by the hash key
    assert sorted(out0["doc_id"]) == list(range(100))
    keys = mix_hash(np.arange(100, dtype=np.int64), 0)
    want = [i for _, i in sorted(zip(keys, range(100)))]
    assert out0["doc_id"].tolist() == want
    # a different seed gives a different permutation; same seed repeats
    out1 = train_order(_ds(rows), seed=1).to_pandas()
    assert out1["doc_id"].tolist() != out0["doc_id"].tolist()
    again = train_order(_ds(rows), seed=0).to_pandas()
    assert again["doc_id"].tolist() == out0["doc_id"].tolist()


# -- mixture_sample ----------------------------------------------------------

def test_mixture_sample_caps_hot_groups(ray_session):
    import ray.data as rd

    # group A: 1000 rows (hot), group B: 20 rows (rare)
    n_a, n_b, cap = 1000, 20, 50
    t = pa.table({
        "doc_id": pa.array(range(n_a + n_b), type=pa.int64()),
        "grp": pa.array(["A"] * n_a + ["B"] * n_b),
    })
    out = mixture_sample(rd.from_arrow(t), "grp", cap=cap,
                         id_col="doc_id").to_pandas()
    by = out.groupby("grp").size()
    # rare group kept whole (rate 1); hot group near the cap
    assert by.get("B", 0) == n_b
    assert 20 <= by["A"] <= 90  # hash-binomial around 50
    # exact predicate replay
    thr = min(1_000_000, cap * 1_000_000 // n_a)
    ids = np.arange(n_a, dtype=np.int64)
    assert by["A"] == int((mix_hash(ids, 0) < thr).sum())


def test_mixture_sample_group_budget(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(range(100), type=pa.int64()),
                  "grp": pa.array([str(i) for i in range(100)])})
    with pytest.raises(ValueError, match="driver budget"):
        mixture_sample(rd.from_arrow(t), "grp", cap=5, id_col="doc_id",
                       max_groups=10)


# -- sequence packing --------------------------------------------------------

def test_pack_sequences_layout(ray_session):
    rows = [(i, " ".join(["w"] * (3 + i % 5))) for i in range(40)]
    rows.append((99, ""))  # zero-token doc: excluded
    L, B = 8, 4
    out = pack_sequences(_ds(rows), seq_len=L, n_buckets=B).to_pandas()
    assert 99 not in set(out["doc_id"])
    assert len(out) == 40
    # replay the layout per bucket
    for b, g in out.groupby("bucket"):
        g = g.sort_values("doc_id").reset_index(drop=True)
        start = np.concatenate(([0], np.cumsum(g["n_tokens"])[:-1]))
        assert (g["start_tok"].to_numpy() == start).all()
        assert (g["first_seq"] == g["start_tok"] // L).all()
        assert (g["last_seq"] ==
                (g["start_tok"] + g["n_tokens"] - 1) // L).all()
    # bucket assignment is the documented hash
    ids = out["doc_id"].to_numpy().astype(np.int64)
    assert (out["bucket"].to_numpy() == mix_hash(ids, 0) % B).all()


def test_bucket_summary(ray_session):
    rows = [(i, " ".join(["w"] * (3 + i % 5))) for i in range(40)]
    L, B = 8, 4
    summ = (bucket_summary(_ds(rows), seq_len=L, n_buckets=B).to_pandas()
            .set_index("bucket").sort_index())
    placed = pack_sequences(_ds(rows), seq_len=L, n_buckets=B).to_pandas()
    for b, g in placed.groupby("bucket"):
        assert summ.loc[b, "n_docs"] == len(g)
        tot = int(g["n_tokens"].sum())
        assert summ.loc[b, "total_tokens"] == tot
        assert summ.loc[b, "n_seqs"] == (tot + L - 1) // L
        # the summary's n_seqs equals the placement map's max seq + 1
        assert summ.loc[b, "n_seqs"] == int(g["last_seq"].max()) + 1
    assert int(summ["n_docs"].sum()) == 40

"""Exact token-Jaccard similarity join (stages/simjoin.py)."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.dedup import tokenize
from fast_carpenter_ray.stages.simjoin import _prefix_len, similarity_join


def _brute(texts, ids, threshold):
    """Reference: exact Jaccard over distinct-token sets, all pairs."""
    sets = {i: set(tokenize(t)) for i, t in zip(ids, texts)}
    out = []
    for a, b in itertools.combinations(sorted(ids), 2):
        A, B = sets[a], sets[b]
        inter = len(A & B)
        if inter == 0:
            continue
        jac = inter / (len(A) + len(B) - inter)
        if jac >= threshold:
            out.append((a, b, inter, len(A), len(B), jac))
    return sorted(out)


def _corpus():
    """Deterministic corpus with planted highly-similar pairs and noise."""
    rng = np.random.default_rng(7)
    vocab = [f"w{j}" for j in range(40)]
    texts, ids = [], []
    for i in range(60):
        n = int(rng.integers(5, 20))
        toks = list(rng.choice(vocab, size=n))
        texts.append(" ".join(toks))
        ids.append(i)
        if i % 7 == 0:  # planted near-identical copy (one token appended)
            texts.append(" ".join(toks + ["w0"]))
            ids.append(1000 + i)
    return texts, ids


def test_similarity_join_matches_bruteforce(ray_session):
    import ray.data as rd

    texts, ids = _corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()), "text": texts})).repartition(4)
    got = similarity_join(ds, threshold=0.8).to_pandas()
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    want = _brute(texts, ids, 0.8)
    assert len(got) == len(want) > 0
    for row, w in zip(got.itertuples(index=False), want):
        assert (row.id_a, row.id_b, row.inter, row.sz_a, row.sz_b) == w[:5]
        assert row.jaccard == w[5]  # single int-ratio division: bit-exact


def test_similarity_join_threshold_one_exact_sets(ray_session):
    import ray.data as rd

    texts = ["a b c", "c b a", "a b c d", "x y"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()), "text": texts}))
    got = similarity_join(ds, threshold=1.0).to_pandas()
    assert [(r.id_a, r.id_b) for r in got.itertuples(index=False)] == [(0, 1)]
    assert got["jaccard"].tolist() == [1.0]


def test_prefix_len_never_shortened_by_float_fuzz():
    # t*n exactly integral: ceil must not round UP past the true value
    n = np.arange(1, 200, dtype=np.int64)
    for t in (0.5, 0.75, 0.9, 1.0):
        p = _prefix_len(n, t)
        true_p = n - np.array([int(np.ceil(round(t * int(x), 9))) for x in n]) + 1
        assert (p >= true_p).all() and (p >= 1).all()


def test_hot_posting_cap_drops_and_strict_mode_restores(ray_session):
    """All 40 docs share an identical 10-token set, so every prefix
    token's posting list holds all 40 docs; max_list=8 caps the list
    (pairs forfeited — deterministically the smallest ids survive) and
    max_list=None restores strict exactness (all C(40,2) pairs)."""
    import ray.data as rd

    toks = " ".join(f"t{j}" for j in range(10))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(40), type=pa.int64()),
        "text": [toks] * 40}))
    capped = similarity_join(ds, threshold=0.9, max_list=8).to_pandas()
    assert len(capped) == 8 * 7 // 2  # pairs among the 8 smallest ids only
    assert capped["id_a"].max() <= 7 and capped["id_b"].max() <= 7
    strict = similarity_join(ds, threshold=0.9, max_list=None).to_pandas()
    assert len(strict) == 40 * 39 // 2
    assert (strict["jaccard"] == 1.0).all()


def test_cap_bucket_logs_not_silent(caplog):
    import logging

    from fast_carpenter_ray.stages.dedup import _cap_bucket

    with caplog.at_level(logging.WARNING, "fast_carpenter_ray.dedup"):
        out = _cap_bucket(np.arange(20), 8, "unit")
    assert len(out) == 8
    assert any("capped at 8" in r.message for r in caplog.records)


def test_empty_input(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "text": pa.array([], type=pa.string())}))
    out = similarity_join(ds, threshold=0.9)
    assert out.count() == 0
    # Ray's to_pandas drops columns on zero rows; the Dataset schema is
    # the engine contract
    assert out.schema().names == ["id_a", "id_b", "inter", "sz_a", "sz_b",
                                  "jaccard"]


def test_join_fallback_path_matches_broadcast(ray_session):
    """Force the above-budget join verification path; results identical."""
    import ray.data as rd

    texts, ids = _corpus()
    tab = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})
    ds = rd.from_arrow(tab).repartition(4)
    a = similarity_join(ds, threshold=0.8).to_pandas()
    b = similarity_join(ds, threshold=0.8,
                        broadcast_pairs_budget=0).to_pandas()
    a = a.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = b.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert a.equals(b)

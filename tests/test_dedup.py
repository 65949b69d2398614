import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.dedup import (
    ExactDedup, MinHashDedup, SimHashDedup, ngram_jaccard, shingle_hashes)


def docs_with_dups():
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest to find some food for the winter")
    near = base.replace("quick", "swift").replace("winter", "cold season")
    other = ("completely different content about database engines and "
             "vectorized execution with arrow batches in a streaming pipeline")
    texts = [base, base, near, other, other, "tiny", base + " extended tail"]
    ids = list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})


def test_ngram_jaccard_basic():
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0
    j = ngram_jaccard("a b c d e f", "a b c d e g")
    assert 0.3 < j < 0.9


def test_shingles_deterministic():
    a = shingle_hashes("one two three four")
    b = shingle_hashes("one two three four")
    np.testing.assert_array_equal(a, b)
    assert len(a) == 2


def test_exact_dedup(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(docs_with_dups()).repartition(3)
    out = ExactDedup("d").apply(ds).to_pandas()
    # duplicates: (0,1) identical, (3,4) identical -> 5 survivors, min ids win
    assert sorted(out["doc_id"]) == [0, 2, 3, 5, 6]
    ids = ExactDedup("d").survivors(ds).to_pandas()
    assert sorted(ids["doc_id"]) == [0, 2, 3, 5, 6]


def test_minhash_estimates_jaccard():
    mh = MinHashDedup("m", num_perm=256, bands=32)
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    true = ngram_jaccard(a, b)
    assert abs(est - true) < 0.2


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(docs_with_dups()).repartition(3)
    mh = MinHashDedup("m", threshold=0.5)
    pairs = mh.candidate_pairs(ds).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in found          # identical pair
    assert (3, 4) in found          # identical pair
    assert (0, 2) in found or (1, 2) in found   # near pair
    assert not any({a, b} == {3, 5} for a, b in found)  # unrelated stay apart


def test_simhash_deterministic_and_close():
    s = SimHashDedup("s")
    a = s.simhash("the quick brown fox jumps over the lazy dog " * 3)
    b = s.simhash("the quick brown fox jumps over the lazy dog " * 3)
    assert a == b
    c = s.simhash("the quick brown fox jumps over the lazy cat " * 3)
    ham = bin(a ^ c).count("1")
    assert ham < 20  # similar docs have close fingerprints


def test_simhash_lsh_pairs(ray_session):
    import ray.data as rd

    texts = ["alpha beta gamma delta epsilon zeta eta theta " * 4] * 2
    texts += ["totally different words entirely unrelated content here now " * 4]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()), "text": texts}))
    pairs = SimHashDedup("s").candidate_pairs(ds).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in found
    assert (0, 2) not in found and (1, 2) not in found

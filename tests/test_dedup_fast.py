"""hash_mode="fast" (vectorized siphash) parity with the sha256 oracle
mode: same LSH structure, identical near-dup survivors on corpora where the
near-dup relation is unambiguous, deterministic across calls."""

import numpy as np
import pandas as pd
import pyarrow as pa

from fast_carpenter_ray.stages.dedup import (
    MinHashDedup, SimHashDedup, _shingle_fold_fast, near_dedup)
from tests.test_dedup import docs_with_dups


def test_fast_shingle_fold_layout():
    texts = ["one two three four", "a b", "", None, "x y z"]
    sh, bounds = _shingle_fold_fast(texts, 3)
    # padded lens: 4, 3, 3, 3, 3 -> shingle counts 2, 1, 1, 1, 1
    assert bounds.tolist() == [0, 2, 3, 4, 5, 6]
    assert len(sh) == 6
    # identical empty docs get identical (pad-only) shingles
    assert sh[bounds[2]] == sh[bounds[3]]
    # deterministic across calls
    sh2, bounds2 = _shingle_fold_fast(texts, 3)
    np.testing.assert_array_equal(sh, sh2)
    np.testing.assert_array_equal(bounds, bounds2)


def test_fast_signatures_shape_and_identity():
    mh = MinHashDedup("f", hash_mode="fast")
    texts = ["the quick brown fox jumps over the lazy dog today",
             "the quick brown fox jumps over the lazy dog today",
             "completely different words about arrow batches"]
    sigs = mh._signatures_fast(texts)
    assert sigs.shape == (3, mh.num_perm) and sigs.dtype == np.int64
    # identical docs -> identical signatures; different docs differ
    np.testing.assert_array_equal(sigs[0], sigs[1])
    assert (sigs[0] != sigs[2]).any()
    # matches per-doc evaluation of the same universal-hash family over
    # the same (fast-hashed) shingles
    sh, bounds = _shingle_fold_fast(texts, mh.shingle_width)
    p = (1 << 31) - 1
    for d in range(3):
        x = sh[bounds[d]:bounds[d + 1]] % np.uint64(p)
        want = ((np.outer(mh.a, x) + mh.b[:, None]) % np.uint64(p)).min(axis=1)
        np.testing.assert_array_equal(sigs[d], want.astype(np.int64))


def test_fast_minhash_estimates_jaccard():
    mh = MinHashDedup("f", num_perm=256, bands=32, hash_mode="fast")
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    tab = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                    "text": [a, b]})
    sigs = mh._sig_matrix(mh.signature_batch(tab)["sig"])
    est = (sigs[0] == sigs[1]).mean()
    from fast_carpenter_ray.stages.dedup import ngram_jaccard

    assert abs(est - ngram_jaccard(a, b)) < 0.2


def test_fast_simhash_matches_slow_structure():
    """Fast SimHash uses a different token hash, so fingerprints differ
    from sha256 mode — but identical texts must agree and similar texts
    must stay within a small Hamming distance, just like slow mode."""
    sh = SimHashDedup("f", hash_mode="fast")
    a3 = "the quick brown fox jumps over the lazy dog " * 3
    c3 = "the quick brown fox jumps over the lazy cat " * 3
    fps = sh._simhash_fast([a3, a3, c3, "", None])
    assert fps[0] == fps[1]
    assert bin(int(fps[0]) ^ int(fps[2])).count("1") < 20
    assert fps[3] == 0 and fps[4] == 0
    # deterministic across calls
    np.testing.assert_array_equal(fps, sh._simhash_fast([a3, a3, c3, "", None]))


def test_fast_simhash_batch_vs_slow_bank_structure(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(docs_with_dups()).repartition(3)
    fast = SimHashDedup("f", hash_mode="fast")
    pairs = fast.candidate_pairs(ds).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in found and (3, 4) in found  # identical pairs always hit


def test_near_dedup_fast_same_survivors(ray_session):
    """The headline pin: near_dedup under hash_mode='fast' keeps exactly
    the same survivor set as the sha256 oracle mode on the test corpus."""
    import ray.data as rd

    docs = docs_with_dups()
    slow = sorted(near_dedup(rd.from_arrow(docs).repartition(3),
                             MinHashDedup("nd", threshold=0.5))
                  .to_pandas()["doc_id"])
    fast = sorted(near_dedup(rd.from_arrow(docs).repartition(3),
                             MinHashDedup("nd", threshold=0.5,
                                          hash_mode="fast"))
                  .to_pandas()["doc_id"])
    assert fast == slow and len(fast) > 0


def test_fast_candidate_pairs_match_slow(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(docs_with_dups()).repartition(3)
    slow = MinHashDedup("m", threshold=0.5)
    fast = MinHashDedup("m", threshold=0.5, hash_mode="fast")
    ps = slow.candidate_pairs(ds).to_pandas()
    pf = fast.candidate_pairs(ds).to_pandas()
    # identical-content pairs are found by construction in both modes
    for want in [(0, 1), (3, 4)]:
        assert want in set(zip(ps["id_a"], ps["id_b"]))
        assert want in set(zip(pf["id_a"], pf["id_b"]))


def test_hash_mode_validation():
    import pytest

    with pytest.raises(ValueError):
        MinHashDedup("x", hash_mode="bogus")
    with pytest.raises(ValueError):
        SimHashDedup("x", hash_mode="bogus")

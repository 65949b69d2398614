"""Bloom-prefilter decontamination (stages/bloom.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.bloom import (BloomDecontaminate, bloom_build,
                                             bloom_test)
from fast_carpenter_ray.stages.decontam import Decontaminate


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 2**63, size=5000).astype(np.uint64)
    bm = bloom_build(keys, m_bits=1 << 16, k=4)
    assert bloom_test(keys, bm, k=4).all()


def test_bloom_false_positive_rate_sane():
    rng = np.random.default_rng(4)
    keys = rng.integers(0, 2**63, size=1000).astype(np.uint64)
    other = rng.integers(0, 2**63, size=20000).astype(np.uint64)
    other = np.setdiff1d(other, keys)
    bm = bloom_build(keys, m_bits=1 << 14, k=4)  # ~16 bits/key
    fp = bloom_test(other, bm, k=4).mean()
    assert fp < 0.05


def _docs(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


CORPUS = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "one two three four five six seven"),
    (3, "alpha beta gamma delta epsilon zeta"),      # clone of eval doc 1
    (4, "alpha beta gamma delta nine ten eleven"),   # partial overlap
    (5, "totally different words entirely here now"),
    (6, "one two three four five six seven eight"),  # superset of doc 2
]
EVAL = [CORPUS[0], CORPUS[1]]


def test_matches_exact_stage_contaminated_rows(ray_session):
    corpus, ev = _docs(CORPUS), _docs(EVAL)
    exact = Decontaminate("d", width=3, threshold=0.5)
    exp = exact.stats(corpus, exact.eval_ngrams(ev)).to_pandas()
    exp = (exp.loc[exp["contaminated"] == 1,
                   ["doc_id", "n_shingles", "n_hit", "overlap_frac"]]
           .sort_values("doc_id").reset_index(drop=True))

    bl = BloomDecontaminate("b", width=3, threshold=0.5, m_bits=1 << 12)
    got = bl.stats(corpus, ev).astype(exp.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, exp)
    assert 1 in set(got["doc_id"])      # eval doc itself scores 1.0
    assert 3 in set(got["doc_id"])      # its clone too


def test_tiny_bloom_false_positives_are_verified_away(ray_session):
    # m_bits=64 saturates the bitmap -> every shingle bloom-hits, every
    # doc becomes a candidate; the exact verify pass must still produce
    # only the truly contaminated rows
    corpus, ev = _docs(CORPUS), _docs(EVAL)
    exact = Decontaminate("d", width=3, threshold=0.5)
    exp = exact.stats(corpus, exact.eval_ngrams(ev)).to_pandas()
    exp = (exp.loc[exp["contaminated"] == 1,
                   ["doc_id", "n_shingles", "n_hit", "overlap_frac"]]
           .sort_values("doc_id").reset_index(drop=True))

    bl = BloomDecontaminate("b", width=3, threshold=0.5, m_bits=64, k=2)
    got = bl.stats(corpus, ev).astype(exp.dtypes.to_dict())
    pd.testing.assert_frame_equal(got, exp)


def test_candidate_budget_guard(ray_session):
    corpus, ev = _docs(CORPUS), _docs(EVAL)
    bl = BloomDecontaminate("b", width=3, threshold=0.1, m_bits=64, k=1,
                            cand_budget=2)
    with pytest.raises(ValueError, match="budget"):
        bl.stats(corpus, ev)


def test_empty_eval_set(ray_session):
    corpus = _docs(CORPUS)
    ev = _docs([])
    bl = BloomDecontaminate("b", width=3, threshold=0.5, m_bits=1 << 10)
    got = bl.stats(corpus, ev)
    assert len(got) == 0


def test_m_bits_power_of_two():
    with pytest.raises(ValueError):
        BloomDecontaminate("b", m_bits=1000)

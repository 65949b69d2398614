"""Exact set-containment self-join (stages/simjoin.py containment_join)."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.dedup import tokenize
from fast_carpenter_ray.stages.simjoin import containment_join


def _docs(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def _brute(rows, thr):
    sets = {i: set(tokenize(t or "")) for i, t in rows}
    out = {}
    for a, A in sets.items():
        for b, B in sets.items():
            if a == b or not A:
                continue
            inter = len(A & B)
            c = inter / len(A)
            if c >= thr:
                out[(a, b)] = (inter, len(A), len(B), c)
    return out


def _as_dict(df):
    return {(int(r.id_a), int(r.id_b)): (int(r.inter), int(r.sz_a),
                                         int(r.sz_b), float(r.containment))
            for r in df.itertuples()}


CORPUS = [
    (1, "quick brown fox jumps"),
    (2, "the quick brown fox jumps over the lazy dog tonight"),  # 1 in 2
    (3, "lorem ipsum dolor sit amet consectetur"),
    (4, "quick brown fox"),                                      # 4 in 1, 2
    (5, "dog lazy the"),                                         # 5 in 2
    (6, "completely unrelated vocabulary entirely different"),
]


def test_matches_brute_force(ray_session):
    got = _as_dict(containment_join(_docs(CORPUS), threshold=0.8)
                   .to_pandas())
    exp = _brute(CORPUS, 0.8)
    assert got == exp
    assert (4, 1) in got and (4, 2) in got and (1, 2) in got
    assert (2, 1) not in got          # asymmetric: big doc not in small


def test_threshold_one_is_subset(ray_session):
    got = _as_dict(containment_join(_docs(CORPUS), threshold=1.0)
                   .to_pandas())
    exp = _brute(CORPUS, 1.0)
    assert got == exp
    assert all(v[3] == 1.0 for v in got.values())


def test_join_fallback_matches_broadcast(ray_session):
    docs = _docs(CORPUS)
    a = _as_dict(containment_join(docs, threshold=0.8).to_pandas())
    b = _as_dict(containment_join(docs, threshold=0.8,
                                  broadcast_pairs_budget=0).to_pandas())
    assert a == b and len(a) > 0


def test_random_corpus_matches_brute(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab, size=rng.integers(3, 12))))
            for i in range(40)]
    got = _as_dict(containment_join(_docs(rows), threshold=0.7,
                                    max_list=None).to_pandas())
    assert got == _brute(rows, 0.7)


def test_invalid_threshold(ray_session):
    with pytest.raises(ValueError):
        containment_join(_docs(CORPUS), threshold=0.0)

"""Decontamination: eval-set n-gram overlap scoring and filtering."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.decontam import Decontaminate
from fast_carpenter_ray.stages.dedup import shingle_hashes


def _docs(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def test_planted_contamination(ray_session):
    eval_rows = [(100, "alpha beta gamma delta epsilon zeta")]
    corpus = [
        # verbatim copy of the eval doc -> overlap 1.0
        (1, "alpha beta gamma delta epsilon zeta"),
        # contains the eval text plus extra -> high but < 1.0
        (2, "prefix words alpha beta gamma delta epsilon zeta suffix"),
        # disjoint vocabulary -> overlap 0.0
        (3, "one two three four five six seven"),
    ]
    d = Decontaminate("d", width=3, threshold=0.5)
    ev = d.eval_ngrams(_docs(eval_rows))
    assert ev.dtype == np.uint64 and np.all(np.diff(ev.astype(object)) > 0)
    st = d.stats(_docs(corpus), ev).to_pandas().set_index("doc_id").sort_index()
    assert st.loc[1, "overlap_frac"] == 1.0 and st.loc[1, "contaminated"] == 1
    assert 0.0 < st.loc[2, "overlap_frac"] < 1.0
    assert st.loc[3, "n_hit"] == 0 and st.loc[3, "contaminated"] == 0
    # n_shingles matches the direct kernel
    for did, text in corpus:
        assert st.loc[did, "n_shingles"] == shingle_hashes(text, 3).size

    clean = d.clean(_docs(corpus), ev).to_pandas()
    assert sorted(clean["doc_id"]) == [2, 3] if st.loc[2, "overlap_frac"] < 0.5 \
        else sorted(clean["doc_id"]) == [3]
    # schema preserved
    assert list(clean.columns) == ["doc_id", "text"]


def test_short_and_empty_docs(ray_session):
    # shorter than the shingle width: padding gives exactly one shingle,
    # so the division is defined; empty eval set -> nothing contaminated
    d = Decontaminate("d", width=3, threshold=0.1)
    corpus = _docs([(1, "single"), (2, ""), (3, "two words")])
    st = d.stats(corpus, np.array([], dtype=np.uint64)).to_pandas()
    assert (st["n_shingles"] >= 1).all()
    assert (st["n_hit"] == 0).all() and (st["contaminated"] == 0).all()


def test_eval_budget_guard(ray_session):
    d = Decontaminate("d", width=3, eval_budget=2)
    big = _docs([(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(20)])
    with pytest.raises(ValueError, match="driver budget"):
        d.eval_ngrams(big)


def test_objectref_reuse(ray_session):
    import ray
    d = Decontaminate("d", width=3, threshold=0.9)
    ev = d.eval_ngrams(_docs([(9, "a b c d e")]))
    ref = ray.put(np.sort(ev))
    corpus = _docs([(1, "a b c d e"), (2, "x y z w v")])
    st = d.stats(corpus, ref).to_pandas().set_index("doc_id")
    assert st.loc[1, "contaminated"] == 1
    assert st.loc[2, "contaminated"] == 0

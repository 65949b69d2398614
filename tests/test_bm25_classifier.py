"""BM25 ranked retrieval and hashed-feature linear classifier scoring."""

import hashlib
import math

import numpy as np
import pyarrow as pa

from fast_carpenter_ray.stages.bm25 import bm25_topk
from fast_carpenter_ray.stages.classifier import LinearTextClassifier
from fast_carpenter_ray.stages.sample import mix_hash


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


CORPUS = [
    (1, "spark spark spark data"),
    (2, "spark data window"),
    (3, "window window hash table"),
    (4, "no relevant terms here at all whatsoever truly"),
    (5, ""),
    (6, "hash"),
]


def _ref_bm25(terms, k1=1.2, b=0.75):
    docs = {i: (t.split() if t else []) for i, t in CORPUS}
    n = len(docs)
    sum_dl = sum(len(w) for w in docs.values())
    avgdl = sum_dl / n
    df = {t: sum(1 for w in docs.values() if t in w) for t in terms}
    scores = {}
    for i, ws in docs.items():
        s = 0.0
        hit = False
        for t in terms:
            tf = ws.count(t)
            hit = hit or tf > 0
            idf = max(math.log((n - df[t] + 0.5) / (df[t] + 0.5)), 0.0)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(ws) / avgdl)))
        if hit:
            scores[i] = s
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))


def test_bm25_matches_reference(ray_session):
    terms = ["spark", "window", "hash"]
    got = bm25_topk(_ds(CORPUS), terms, k=10)
    want = _ref_bm25(terms)
    assert got["doc_id"].tolist() == [i for i, _ in want]
    np.testing.assert_allclose(got["score"].to_numpy(),
                               [s for _, s in want], rtol=1e-12)
    assert got["rank"].tolist() == list(range(1, len(want) + 1))
    # docs with no query term (4) and the empty doc (5) are excluded
    assert 4 not in set(got["doc_id"]) and 5 not in set(got["doc_id"])


def test_bm25_k_cap_and_partial_topk(ray_session):
    got = bm25_topk(_ds(CORPUS), ["spark", "window", "hash"], k=2)
    want = _ref_bm25(["spark", "window", "hash"])[:2]
    assert got["doc_id"].tolist() == [i for i, _ in want]
    assert len(got) == 2


def test_classifier_manual_logit(ray_session):
    clf = LinearTextClassifier(dim=64, seed=3)
    out = (clf.apply(_ds(CORPUS)).to_pandas()
           .set_index("doc_id").sort_index())
    w = (mix_hash(np.arange(64, dtype=np.int64), 3) % 17 - 8)
    for did, text in CORPUS:
        logit = 0
        for t in (text.split() if text else []):
            h = int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "big")
            logit += int(w[h % 64])
        assert out.loc[did, "logit"] == logit
        assert out.loc[did, "label"] == int(logit >= 0)
    assert out.loc[5, "logit"] == 0 and out.loc[5, "label"] == 1


def test_classifier_actor_pool_equals_task_mode(ray_session):
    clf = LinearTextClassifier(dim=128, seed=9)
    task = (clf.apply(_ds(CORPUS)).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    actor = (clf.apply(_ds(CORPUS), concurrency=(1, 2)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert task.equals(actor)


def test_classifier_filter_positive_matches_labels(ray_session):
    clf = LinearTextClassifier(dim=64, seed=3)
    scored = (clf.apply(_ds(CORPUS)).to_pandas()
              .set_index("doc_id").sort_index())
    kept = clf.filter_positive(_ds(CORPUS)).to_pandas()
    want = sorted(scored.index[scored["label"] == 1])
    assert sorted(kept["doc_id"]) == want
    # schema preserved by the gate
    assert kept.columns.tolist() == ["doc_id", "text"]


def test_trailing_empty_doc_regression(ray_session):
    """A batch whose LAST doc is empty must not truncate the preceding
    doc's reduceat segment (the offset-clip bug dropped its last
    token)."""
    rows = [(1, "x spark"), (2, "")]
    got = bm25_topk(_ds(rows), ["spark"], k=5)
    assert got["doc_id"].tolist() == [1]  # doc 1 HAS the term (tf=1)

    clf = LinearTextClassifier(dim=64, seed=3)
    out = clf.apply(_ds([(1, "alpha beta"), (2, "")])).to_pandas() \
        .set_index("doc_id")
    w = (mix_hash(np.arange(64, dtype=np.int64), 3) % 17 - 8)
    want = sum(int(w[int.from_bytes(
        hashlib.sha256(t.encode()).digest()[:8], "big") % 64])
        for t in ["alpha", "beta"])
    assert out.loc[1, "logit"] == want
    assert out.loc[2, "logit"] == 0

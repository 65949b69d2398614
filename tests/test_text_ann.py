import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.ann import ann_topk, near_dup_cosine
from fast_carpenter_ray.stages.multimodal import FrameSample, ImageDecode
from fast_carpenter_ray.stages.text import Fingerprint, LangId, QualityScore, TokenCount


def text_df():
    return pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "the cat and the dog sat on a mat",
            "der hund ist nicht auf der katze und die maus",
            "",
            "word " * 50,
        ],
    })


def test_token_count():
    out = TokenCount()(text_df())
    assert out["n_tokens"].tolist() == [9, 10, 0, 50]
    assert out["n_chars"].tolist()[2] == 0
    assert out["n_subwords"].tolist()[0] >= 9


def test_quality_score():
    out = QualityScore()(text_df())
    assert (out["quality"] >= 0).all() and (out["quality"] <= 1).all()
    assert out["stopword_ratio"][0] > out["stopword_ratio"][3]
    assert out["mean_word_len"][3] == pytest.approx(4.0)


def test_lang_id():
    out = LangId()(text_df())
    assert out["lang_pred"].tolist()[0] == "en"
    assert out["lang_pred"].tolist()[1] == "de"
    assert out["lang_pred"].tolist()[2] == "und"


def test_fingerprint_deterministic_and_order_sensitive():
    fp = Fingerprint.fingerprint
    assert fp("a b c") == fp("a b c")
    assert fp("a b c") != fp("c b a")
    assert 0 <= fp("anything") < (1 << 63)


def test_fingerprint_vectorized_matches_reference_fold():
    """The batch path (uint64 power-table fold) must be bit-equal to the
    per-row sequential reference for every edge shape: empty doc,
    whitespace-only, single token, repeated tokens, mixed case, long."""
    texts = ["", "   ", "\t\n", "one", "a b c", "c b a", "A  B\tC",
             "tok " * 200, "the cat and the dog", None]
    tab = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    got = Fingerprint()(tab)["fingerprint"].to_pylist()
    want = [Fingerprint.fingerprint((t or "").lower()) for t in texts]
    assert got == want
    # zero-row batch survives
    assert Fingerprint()(tab.slice(0, 0)).num_rows == 0


def test_fingerprint_fast_mode_self_consistent():
    """hash_mode='fast' (vectorized siphash) is deterministic across
    calls, order-sensitive, 63-bit positive, and distinguishes the same
    cases as the sha256 fold."""
    texts = ["a b c", "c b a", "a b c", "", "single"]
    tab = pa.table({"text": pa.array(texts, type=pa.string())})
    f1 = Fingerprint(hash_mode="fast")(tab)["fingerprint"].to_pylist()
    f2 = Fingerprint(hash_mode="fast")(tab)["fingerprint"].to_pylist()
    assert f1 == f2
    assert f1[0] == f1[2] and f1[0] != f1[1]
    assert all(0 <= v < (1 << 63) for v in f1)
    with pytest.raises(ValueError):
        Fingerprint(hash_mode="nope")


def embeddings_table(n=40, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    m[1] = m[0] + 0.01 * rng.standard_normal(dim)  # planted near-dup
    return pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array([row.tolist() for row in m],
                              type=pa.list_(pa.float32())),
    }), m


def test_ann_topk_matches_numpy_oracle(ray_session):
    import ray.data as rd

    table, m = embeddings_table()
    ds = rd.from_arrow(table).repartition(4)
    q = {"id": np.array([0, 5]), "matrix": m[[0, 5]].astype(np.float32)}
    out = ann_topk(ds, q, k=3, exclude_self=True).to_pandas()

    mm = m.astype(np.float32).astype(np.float64)
    mm = mm / np.linalg.norm(mm, axis=1, keepdims=True)
    for qid in (0, 5):
        sims = mm @ mm[qid]
        sims[qid] = -np.inf
        expect = np.argsort(-sims, kind="stable")[:3]
        got = out[out.query_id == qid].sort_values("rank")["neighbor_id"].to_numpy()
        np.testing.assert_array_equal(got, expect)
    # planted near-dup must be rank 1 for query 0
    assert out[(out.query_id == 0) & (out["rank"] == 1)]["neighbor_id"].iloc[0] == 1


def test_near_dup_cosine(ray_session):
    import ray.data as rd

    table, m = embeddings_table()
    ds = rd.from_arrow(table).repartition(2)
    pairs = near_dup_cosine(ds, threshold=0.95, dim=8).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in found


def media_batch(n=6):
    return pa.table({
        "media_id": pa.array(np.arange(n), type=pa.int64()),
        "payload": pa.array([bytes([i]) * 64 for i in range(n)], type=pa.binary()),
    })


def test_image_decode_stub():
    # real (non-fake) construction succeeds now (PPM/BMP codecs are real);
    # unsupported payload magics raise at decode time instead
    with pytest.raises(NotImplementedError):
        ImageDecode(fake=False)(media_batch())
    stage = ImageDecode(fake=True)
    out = stage(media_batch())
    assert "payload" not in out.column_names
    feats = out["features"].to_pylist()
    assert len(feats[0]) == ImageDecode.FEATURE_DIM
    # deterministic: same payload -> same features
    out2 = ImageDecode(fake=True)(media_batch())
    assert feats == out2["features"].to_pylist()


def test_frame_sample_stub():
    out = FrameSample(n_frames=3, fake=True)(media_batch(2))
    assert len(out) == 6
    assert out["frame_idx"].to_pylist() == [0, 1, 2, 0, 1, 2]
    # frame signatures differ across frames of the same video
    sigs = out["frame_sig"].to_pylist()
    assert len(set(sigs[:3])) == 3


def test_ngram_count_matches_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fast_carpenter_ray.stages.text import ngram_count

    docs = pd.DataFrame({"text": [
        "a b  c", "b c", "", "x", "a b a b", None, "\tc  b\n a"]})
    got = (ngram_count(rd.from_pandas(docs).repartition(3), n=2)
           .to_pandas().sort_values("ngram").reset_index(drop=True))
    from collections import Counter
    cnt = Counter()
    for t in docs["text"]:
        toks = [w for w in __import__("re").split(r"[ \t\n\r\f]+", t or "")
                if w]
        cnt.update(" ".join(p) for p in zip(toks, toks[1:]))
    exp = (pd.DataFrame(sorted(cnt.items()), columns=["ngram", "n"]))
    assert got["ngram"].tolist() == exp["ngram"].tolist()
    np.testing.assert_array_equal(got["n"].to_numpy().astype(np.int64),
                                  exp["n"].to_numpy())
    # trigrams + unigram degenerate case
    tri = (ngram_count(rd.from_pandas(docs), n=3).to_pandas()
           .sort_values("ngram").reset_index(drop=True))
    cnt3 = Counter()
    for t in docs["text"]:
        toks = [w for w in __import__("re").split(r"[ \t\n\r\f]+", t or "")
                if w]
        cnt3.update(" ".join(p) for p in zip(toks, toks[1:], toks[2:]))
    assert dict(zip(tri["ngram"], tri["n"])) == dict(cnt3)
    import pytest as _pt
    with _pt.raises(ValueError, match="n must be"):
        ngram_count(rd.from_pandas(docs), n=0)

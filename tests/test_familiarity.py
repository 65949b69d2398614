"""CCNet-style corpus-familiarity bucketing (stages/text.py)."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.text import token_familiarity


def _docs(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def test_hand_computed_familiarity(ray_session):
    # counts: the=3, cat=2, sat=1, dog=1, ran=1  (t1=8, t2=9+4+1+1+1=16)
    rows = [(1, "the cat sat"), (2, "the cat ran"), (3, "the dog")]
    out = token_familiarity(_docs(rows)).to_pandas().set_index("doc_id")
    m = 16.0 / 8.0  # occurrence-weighted mean = 2.0
    assert out.loc[1, "n_tokens"] == 3 and out.loc[1, "sum_tf"] == 3 + 2 + 1
    assert out.loc[2, "sum_tf"] == 6 and out.loc[3, "sum_tf"] == 4
    assert out.loc[1, "familiarity"] == 2.0  # == m -> head
    assert out.loc[1, "bucket"] == 0
    assert out.loc[3, "familiarity"] == 2.0 and out.loc[3, "bucket"] == 0
    # doc 2: 6/3 = 2.0 too — vary the corpus for a middle/tail doc
    rows2 = rows + [(4, "unique singleton words only here")]
    out2 = token_familiarity(_docs(rows2), tail_factor=0.9
                             ).to_pandas().set_index("doc_id")
    # doc 4 is all count-1 tokens -> familiarity 1.0, far below the mean
    assert out2.loc[4, "familiarity"] == 1.0
    assert out2.loc[4, "bucket"] == 2


def test_zero_token_docs_omitted_and_counts_exact(ray_session):
    rows = [(1, "a a a"), (2, ""), (3, "   "), (4, "b")]
    out = token_familiarity(_docs(rows)).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [1, 4]
    assert out.loc[1, "sum_tf"] == 9 and out.loc[1, "familiarity"] == 3.0
    assert out.loc[4, "sum_tf"] == 1


def test_case_sensitive_re2_tokenizer(ray_session):
    # vocab_count's tokenizer: no lowercasing, RE2 \s class
    rows = [(1, "The the"), (2, "the")]
    out = token_familiarity(_docs(rows)).to_pandas().set_index("doc_id")
    # "The" (1) and "the" (2) are distinct tokens
    assert out.loc[1, "sum_tf"] == 1 + 2
    assert out.loc[2, "sum_tf"] == 2


def test_vocab_budget_guard(ray_session):
    rows = [(1, "many distinct tokens in this document")]
    with pytest.raises(ValueError, match="broadcast budget"):
        token_familiarity(_docs(rows), vocab_budget=2).to_pandas()


def test_bucket_thresholds(ray_session):
    # engineered: token x appears 8 times, y..z once each
    rows = [(1, "x x x x"), (2, "x x x x"), (3, "p q r s")]
    out = token_familiarity(_docs(rows), tail_factor=0.5
                            ).to_pandas().set_index("doc_id")
    # counts: x=8, p=q=r=s=1; t1=12, t2=64+4=68; m=68/12
    m = 68.0 / 12.0
    assert out.loc[1, "familiarity"] == 8.0 and out.loc[1, "bucket"] == 0
    fam3 = out.loc[3, "familiarity"]
    assert fam3 == 1.0 and fam3 < 0.5 * m and out.loc[3, "bucket"] == 2


def test_compression_ratio_matches_recompute(ray_session):
    import zlib

    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.text import compression_ratio

    texts = ["spam " * 200, "The quick brown fox jumps over the lazy dog.",
             "", "aaaaAAAAaaaa", "unicode: 地理空間データ 🌍" * 3]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    out = compression_ratio(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, txt in enumerate(texts):
        b = txt.encode("utf-8")
        assert int(out["raw_len"][i]) == len(b)
        assert int(out["comp_len"][i]) == len(zlib.compress(b, 6))
        if b:
            assert out["ratio"][i] == len(zlib.compress(b, 6)) / len(b)
        else:
            assert np.isnan(out["ratio"][i])
    # repetitive text compresses far better than natural text
    assert out["ratio"][0] < 0.1 < out["ratio"][1]

import numpy as np
import pandas as pd

from fast_carpenter_ray.stages.text import pmi_bigrams, top_terms


def _ds(texts):
    import ray.data as rd

    return rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts}))


def test_top_terms_tiebreaks(ray_session):
    out = (top_terms(_ds([
        "apple apple banana",      # tf wins: apple (2)
        "cherry banana",           # tf tie -> rarer df wins: cherry (df 1 < 2)
        "dog cat",                 # tf+df tie -> lexicographic: cat
        "",                        # tokenless doc drops
    ])).to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["token"].tolist() == ["apple", "cherry", "cat"]
    assert out["tf"].tolist() == [2, 1, 1]
    # banana appears in docs 0 and 1 -> df 2; chosen terms are df 1
    assert out["df"].tolist() == [1, 1, 1]


def test_pmi_bigrams_exact(ray_session):
    # corpus: "a b" x5 and "a c" x5  ->  N = 10 bigram occurrences
    out = pmi_bigrams(_ds(["a b"] * 5 + ["a c"] * 5), min_count=5)
    out = out.sort_values("ngram").reset_index(drop=True)
    assert out["ngram"].tolist() == ["a b", "a c"]
    assert out["n"].tolist() == [5, 5]
    # c_a=10, c_b=5: ratio = 10*5/(10*5) = 1.0 exactly
    np.testing.assert_array_equal(out["ratio"].to_numpy(), [1.0, 1.0])


def test_pmi_min_count_filters_but_totals_keep(ray_session):
    # "x y" once; below min_count -> dropped, but its occurrence still
    # counts toward N (PMI totals are corpus-wide, not survivor-wide)
    out = pmi_bigrams(_ds(["a b"] * 5 + ["x y"]), min_count=5)
    assert out["ngram"].tolist() == ["a b"]
    # N=6, c_ab=5, c_a=c_b=5 -> 6*5/25
    np.testing.assert_allclose(out["ratio"].to_numpy(), [30.0 / 25.0])


def test_term_trends_lag_ratio(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.text import term_trends

    df = pd.DataFrame({
        "text": ["a b", "a", "a a b", "b b"],
        "day": np.array([0, 1, 1, 2], dtype=np.int64),
    })
    got = (term_trends(rd.from_pandas(df).repartition(2), day_col="day")
           .to_pandas().sort_values(["token", "day"]).reset_index(drop=True))
    # a: day0=1, day1=3 -> ratio 3; b: day0=1, day1=1 -> 1, day2=2 -> 2
    rows = list(zip(got["token"], got["day"], got["n"], got["ratio"]))
    assert rows == [("a", 1, 3, 3.0), ("b", 1, 1, 1.0), ("b", 2, 2, 2.0)]


def test_term_trends_skips_single_day_tokens(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.text import term_trends

    df = pd.DataFrame({"text": ["only"], "day": np.array([5], dtype=np.int64)})
    assert term_trends(rd.from_pandas(df), day_col="day").to_pandas().empty


def test_repetition_stats(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.text import RepetitionStats

    df = pd.DataFrame({"doc_id": np.array([0, 1, 2, 3], dtype=np.int64),
                       "text": ["a a a b", "x y z", "", "q q"]})
    out = (RepetitionStats().apply(rd.from_pandas(df).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_tok"].tolist() == [4, 3, 0, 2]
    assert out["n_distinct"].tolist() == [2, 3, 0, 1]
    assert out["top_n"].tolist() == [3, 1, 0, 2]
    assert out["n_bigrams"].tolist() == [3, 2, 0, 1]
    # doc 0 bigrams: "a a","a a","a b" -> 2 distinct; doc 3: "q q" -> 1
    assert out["n_distinct_bigrams"].tolist() == [2, 2, 0, 1]
    assert out["dup_token_ratio"].tolist() == [0.5, 0.0, 0.0, 0.5]
    assert out["top_token_ratio"].tolist() == [0.75, 1/3, 0.0, 1.0]
    assert out["dup_bigram_ratio"].tolist() == [1/3, 0.0, 0.0, 0.0]


def test_vocab_drift_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.text import vocab_drift

    # 'stable'/'filler' appear 10x in each period; 'burst' only in
    # period 1 (the filler keeps the two tables from being complements)
    docs = (["stable " * 10 + "filler " * 10]
            + ["stable " * 10 + "filler " * 10 + "burst " * 8])
    t = pa.table({"text": pa.array(docs),
                  "period": pa.array([0, 1], type=pa.int64())})
    out = vocab_drift(rd.from_arrow(t), min_support=5).to_pandas()
    out = out.set_index("token")
    # totals: na=20, nb=28, N=48
    na, nb = 20, 28
    for tok, a, b in [("stable", 10, 10), ("burst", 0, 8)]:
        num = a * (nb - b) - b * (na - a)
        want = (float(na + nb) * num * num
                / (float(na) * nb * (a + b) * (na + nb - a - b)))
        assert out.loc[tok, "a"] == a and out.loc[tok, "b"] == b
        assert out.loc[tok, "chi2"] == want
    # a balanced token drifts less than the bursting one
    assert out.loc["burst", "chi2"] > out.loc["stable", "chi2"]


def test_vocab_drift_min_support(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.text import vocab_drift

    t = pa.table({"text": pa.array(["rare word word word word word",
                                    "word word word word word"]),
                  "period": pa.array([0, 1], type=pa.int64())})
    out = vocab_drift(rd.from_arrow(t), min_support=5).to_pandas()
    assert "rare" not in set(out["token"])
    assert "word" in set(out["token"])


def test_text_clean(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.text import TextClean

    tab = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": ["  hello \t\t world \n",
                 "e" + chr(769) + "clair\x00\x08ok",  # NFC + control strip
                 None],
    })
    out = (TextClean().apply(rd.from_arrow(tab)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["text_clean"][0] == "hello world"
    assert out["text_clean"][1] == "éclairok"  # composed é, controls gone
    assert out["text_clean"][2] == ""


def test_chunk_documents(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.text import chunk_documents

    toks = " ".join(f"w{i}" for i in range(10))
    tab = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": [toks, "  single ", ""],  # 10 tokens / 1 token / empty
    })
    out = (chunk_documents(rd.from_arrow(tab), chunk_tokens=4, stride=3)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    d0 = out[out["doc_id"] == 0]
    # starts 0,3,6,9 -> 4 chunks; last has 1 token
    assert d0["chunk_start"].tolist() == [0, 3, 6, 9]
    assert d0["n_tokens"].tolist() == [4, 4, 4, 1]
    assert d0["chunk_text"].iloc[0] == "w0 w1 w2 w3"
    assert d0["chunk_text"].iloc[3] == "w9"
    d1 = out[out["doc_id"] == 1]
    assert len(d1) == 1 and d1["chunk_text"].iloc[0] == "single"
    assert (out["doc_id"] == 2).sum() == 0  # empty doc -> no chunks


def test_hashed_chunk_retrieval(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.rag import hashed_chunk_retrieval

    chunks = pa.table({
        "doc_id": pa.array([0, 0, 1], type=pa.int64()),
        "chunk_id": pa.array([0, 1, 0], type=pa.int64()),
        "chunk_text": ["apple banana cherry", "dog emu fox",
                       "apple apple banana"],
    })
    q = pd.DataFrame({"query_id": [7, 8],
                      "query_text": ["apple banana", "zebra"]})
    out = hashed_chunk_retrieval(rd.from_arrow(chunks), q, dim=64, k=2)
    q7 = out[out["query_id"] == 7]
    # doc1 chunk0 has apple x2 + banana -> dot 3; doc0 chunk0 -> dot 2
    assert list(zip(q7["doc_id"], q7["chunk_id"], q7["dot"], q7["rank"])) == [
        (1, 0, 3, 1), (0, 0, 2, 2)]
    # zero-match query emits no rows
    assert (out["query_id"] == 8).sum() == 0

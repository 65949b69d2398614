"""Duplicated-span removal (stages/dedup.py remove_dup_spans)."""

import numpy as np
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.dedup import (
    _doc_chunk_hashes, chunk_dup_stats, remove_dup_spans, tokenize)


def _docs(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


SHARED = "alpha beta gamma delta"  # one full 4-token chunk


def test_shared_span_removed_from_both(ray_session):
    rows = [
        (1, SHARED + " unique one tail"),
        (2, SHARED + " other suffix here extra"),
        (3, "totally different words entirely four five six seven"),
    ]
    out = remove_dup_spans(_docs(rows), chunk_tokens=4, min_count=2
                           ).to_pandas().set_index("doc_id").sort_index()
    # the shared leading chunk vanishes from BOTH docs; tails survive
    assert out.loc[1, "clean_text"] == "unique one tail"
    assert out.loc[2, "clean_text"] == "other suffix here extra"
    assert out.loc[1, "n_removed"] == 1 and out.loc[2, "n_removed"] == 1
    # untouched doc: whitespace-normalized tokens, nothing removed
    assert out.loc[3, "clean_text"] == rows[2][1]
    assert out.loc[3, "n_removed"] == 0 and out.loc[3, "n_chunks"] == 2


def test_short_doc_passthrough_and_counts(ray_session):
    rows = [(1, "only three tokens"), (2, ""), (3, "Mixed CASE   Words x")]
    out = remove_dup_spans(_docs(rows), chunk_tokens=4, min_count=2
                           ).to_pandas().set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1, "clean_text"] == "only three tokens"
    assert out.loc[2, "clean_text"] == "" and out.loc[2, "n_chunks"] == 0
    # lowercased + single-space normalization is the documented contract
    assert out.loc[3, "clean_text"] == "mixed case words x"
    assert out.loc[1, "n_chunks"] == 0 and out.loc[3, "n_chunks"] == 1


def test_within_doc_repeat_is_not_common(ray_session):
    # the same chunk twice in ONE doc is within-doc repetition, not a
    # cross-document duplicate -> kept (distinct-doc count == 1)
    rows = [(1, SHARED + " " + SHARED), (2, "other words here now")]
    out = remove_dup_spans(_docs(rows), chunk_tokens=4, min_count=2
                           ).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_removed"] == 0
    assert out.loc[1, "clean_text"] == "alpha beta gamma delta alpha beta gamma delta"


def test_min_count_three(ray_session):
    rows = [(1, SHARED + " a b c d"), (2, SHARED + " e f g h"),
            (3, SHARED + " i j k l")]
    two = remove_dup_spans(_docs(rows[:2]), chunk_tokens=4, min_count=3
                           ).to_pandas()
    assert (two["n_removed"] == 0).all()
    three = remove_dup_spans(_docs(rows), chunk_tokens=4, min_count=3
                             ).to_pandas()
    assert (three["n_removed"] == 1).all()


def test_every_position_of_common_chunk_removed(ray_session):
    # once a chunk is common, every position goes - including both
    # repeats inside one doc
    rows = [(1, SHARED + " " + SHARED + " tail"), (2, SHARED + " x y z w")]
    out = remove_dup_spans(_docs(rows), chunk_tokens=4, min_count=2
                           ).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_removed"] == 2
    assert out.loc[1, "clean_text"] == "tail"


def test_budget_guard_raises(ray_session):
    rows = [(1, SHARED + " a b"), (2, SHARED + " c d")]
    with pytest.raises(ValueError, match="broadcast budget"):
        remove_dup_spans(_docs(rows), chunk_tokens=4, min_count=2,
                         common_budget=0).to_pandas()


def test_agrees_with_chunk_dup_stats(ray_session):
    # n_removed per doc == n_dup_chunks from chunk_dup_stats at
    # min_count=2 (both count positions of cross-document chunks)
    rows = [(i, f"{SHARED} doc{i} specific suffix tokens here") for i in range(6)]
    rows.append((99, "lonely document with nothing shared at all eight"))
    removed = remove_dup_spans(_docs(rows), chunk_tokens=4, min_count=2
                               ).to_pandas().set_index("doc_id").sort_index()
    stats = chunk_dup_stats(_docs(rows), chunk_tokens=4
                            ).to_pandas().set_index("doc_id").sort_index()
    both = removed[["n_removed", "n_chunks"]].join(
        stats[["n_dup_chunks", "n_chunks"]], how="inner", rsuffix="_s")
    assert len(both) == len(rows)
    assert (both["n_removed"] == both["n_dup_chunks"]).all()
    assert (both["n_chunks"] == both["n_chunks_s"]).all()


def test_chunk_hash_matches_stats_kernel():
    toks = tokenize("the quick brown fox jumps over the lazy dog")
    h = _doc_chunk_hashes(toks, 4, {})
    assert h.dtype == np.uint64 and h.size == len(toks) // 4
    # deterministic across calls / caches
    assert np.array_equal(h, _doc_chunk_hashes(toks, 4, {}))


def _corpus_with_scores(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "score": pa.array([r[2] for r in rows], type=pa.int64()),
    }))


BASE = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon")


def test_near_dedup_quality_survivor(ray_session):
    from fast_carpenter_ray.stages.dedup import MinHashDedup, near_dedup
    rows = [
        (1, BASE, 5),
        (2, BASE + " extended with more tokens", 9),   # best quality
        (3, BASE + " slightly different tail", 7),
        (10, "a completely unrelated document about other things entirely", 1),
    ]
    mh = MinHashDedup("t", threshold=0.5)
    out = near_dedup(_corpus_with_scores(rows), mh, score_col="score"
                     ).to_pandas()
    kept = set(out["doc_id"])
    assert 2 in kept and 10 in kept
    assert 1 not in kept and 3 not in kept
    # default keeps the min id instead
    out_min = near_dedup(_corpus_with_scores(rows), mh).to_pandas()
    assert 1 in set(out_min["doc_id"]) and 2 not in set(out_min["doc_id"])


def test_near_dedup_quality_tie_breaks_to_min_id(ray_session):
    from fast_carpenter_ray.stages.dedup import MinHashDedup, near_dedup
    rows = [(4, BASE, 7), (7, BASE + " x", 7),
            (9, "different words everywhere nothing shared at all", 3)]
    mh = MinHashDedup("t", threshold=0.5)
    out = near_dedup(_corpus_with_scores(rows), mh, score_col="score"
                     ).to_pandas()
    kept = set(out["doc_id"])
    assert 4 in kept and 7 not in kept and 9 in kept


def test_near_dedup_quality_overbudget_path_matches(ray_session):
    from fast_carpenter_ray.stages.dedup import MinHashDedup, near_dedup
    rows = [
        (1, BASE, 5), (2, BASE + " extended with more tokens", 9),
        (3, BASE + " slightly different tail", 7),
        (10, "a completely unrelated document about other things entirely", 1),
    ]
    mh = MinHashDedup("t", threshold=0.5)
    a = sorted(near_dedup(_corpus_with_scores(rows), mh, score_col="score"
                          ).to_pandas()["doc_id"])
    b = sorted(near_dedup(_corpus_with_scores(rows), mh, score_col="score",
                          pair_budget=0).to_pandas()["doc_id"])
    assert a == b == [2, 10]

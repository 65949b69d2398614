"""Per-cell top-k terms (stages/text.py cell_terms)."""

import pandas as pd
import pyarrow as pa

from fast_carpenter_ray.stages.text import cell_terms


def _ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "cell": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


def _as_tuples(df):
    return sorted((int(r.cell), r.tok, int(r.n), int(r.rank))
                  for r in df.itertuples())


def test_topk_counts_and_tie_break(ray_session):
    rows = [
        (1, "apple apple banana cherry"),
        (1, "banana apple"),
        (2, "zebra zebra yak"),
        (-1, "dropped words here"),          # invalid cell ignored
        (3, "solo"),
    ]
    got = _as_tuples(cell_terms(_ds(rows), k=2).to_pandas())
    # cell 1: apple x3, banana x2; cell 2: zebra x2, yak x1; cell 3: solo
    assert got == sorted([
        (1, "apple", 3, 1), (1, "banana", 2, 2),
        (2, "zebra", 2, 1), (2, "yak", 1, 2),
        (3, "solo", 1, 1)])


def test_ties_break_token_ascending(ray_session):
    rows = [(7, "delta alpha charlie bravo")]
    got = (cell_terms(_ds(rows), k=3).to_pandas()
           .sort_values("rank"))
    assert got["tok"].tolist() == ["alpha", "bravo", "charlie"]


def test_case_folding_and_empty(ray_session):
    rows = [(4, "Word word WORD"), (5, "   ")]
    got = _as_tuples(cell_terms(_ds(rows), k=1).to_pandas())
    assert got == [(4, "word", 3, 1)]

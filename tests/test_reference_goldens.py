"""Reference golden values transliterated onto the synthetic fixture.

BASELINE.md carries the reference's golden test values (289/1486/8/144/
2225 passing events, 2 enumerated survivors, n=4616, sumw~231.91339,
binned mean ~44.32584 — from tests/selection/test_stage.py:66-68,
test_filters.py:72,118,140,152, test_stage.py:179-181,
tests/summary/test_binned_dataframe.py:72-77,217).  The reference computes
them over its 4,580-event ROOT file, which does not exist here; each row
below is the SAME assertion shape pinned to the deterministic synthetic
pages fixture (500 docs at sf0.001), so any regression in selection/
binning semantics moves a pinned number.

Mapping (BASELINE.md golden -> named test):
  single cut                -> test_golden_single_cut
  Any[...] of 3 cuts        -> test_golden_any_of_three
  nested All[cut, Any[...]] -> test_golden_nested_all_any
  jagged {reduce: 1}/any    -> test_golden_jagged_reduce
  full nested cut-flow,
    survivors enumerated    -> test_golden_cutflow_survivors_enumerated
  histogram totals          -> test_golden_histogram_totals
  binned mean (expr dim)    -> test_golden_binned_mean_expression_dim
  merge algebra doubling    -> test_merge_algebra_doubles
                               (tests/test_binned_dataframe.py) and
                               test_merge_algebra_two_batches_equals_double
                               (tests/test_selection.py)
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fast_carpenter_ray.stages import BinnedDataframe
from fast_carpenter_ray.stages.selection import build_selection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_batch(ray_session):
    from fast_carpenter_ray.pipelines.queries import _pages_geo

    df = _pages_geo(SF).to_pandas()
    assert len(df) == 500
    return pa.Table.from_pandas(df, preserve_index=False)


def test_golden_single_cut(pages_batch):
    """Reference: 289/4,580 pass `NMuon > 1` (test_stage.py:66-68)."""
    s = build_selection("g", "lang == 'en'", None)
    assert int(s.compute_mask(pages_batch).sum()) == 193


def test_golden_any_of_three(pages_batch):
    """Reference: 1,486 pass an Any of 3 cuts (test_filters.py:72)."""
    s = build_selection(
        "g", {"Any": ["lat > 60.0", "lng < -150.0", "lang == 'de'"]}, None)
    assert int(s.compute_mask(pages_batch).sum()) == 147


def test_golden_nested_all_any(pages_batch):
    """Reference: 8 pass nested All[cut, Any[...]] (test_filters.py:118)."""
    s = build_selection(
        "g", {"All": ["lang == 'en'",
                      {"Any": ["lat > 60.0", "lng < -150.0"]}]}, None)
    assert int(s.compute_mask(pages_batch).sum()) == 32


def test_golden_jagged_reduce():
    """Reference: 144 pass `{reduce: 1}`, 2,225 pass `{reduce: any}` on a
    jagged predicate (test_filters.py:140,152)."""
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toklens = [[len(w) for w in t.split()] for t in docs["text"].to_pylist()]
    batch = pa.table({"doc_id": docs["doc_id"],
                      "toklen": pa.array(toklens, type=pa.list_(pa.int64()))})
    nth1 = build_selection("g", {"formula": "toklen > 4", "reduce": 1}, None)
    assert int(nth1.compute_mask(batch).sum()) == 254
    anyr = build_selection("g", {"formula": "toklen > 6", "reduce": "any"}, None)
    assert int(anyr.compute_mask(batch).sum()) == 396


def test_golden_cutflow_survivors_enumerated(pages_batch):
    """Reference: 2 events survive the full nested cut-flow and their
    values are enumerated (test_stage.py:179-181)."""
    s = build_selection(
        "g", {"All": ["lang == 'fr'",
                      {"Any": ["lat > 70.0", "lng < -170.0"]}]}, None)
    mask = np.asarray(s.compute_mask(pages_batch))
    ids = sorted(pages_batch["doc_id"].to_numpy(zero_copy_only=False)[mask].tolist())
    assert ids == [41, 242, 351, 363, 391, 421]


def test_golden_histogram_totals(ray_session, pages_batch):
    """Reference: n=4,616 and EventWeight:sumw~231.91339
    (test_binned_dataframe.py:72-77).  The synthetic weight is dyadic
    (k/1024) so the pinned sumw is EXACT, not approximate."""
    import ray.data as rd

    h = BinnedDataframe(
        "h", [{"in": "abs(lat)", "out": "alat",
               "bins": {"nbins": 6, "low": 0.0, "high": 90.0}}],
        weights={"weight": "weight"})
    hp = h.aggregate(rd.from_arrow(pages_batch)).to_pandas()
    assert int(hp["n"].sum()) == 490  # 10 no-geo docs drop (NaN lat)
    assert float(hp["sumw_weight"].sum()) == 245.1953125


def test_golden_binned_mean_expression_dim(ray_session, pages_batch):
    """Reference: mean of an expression-binned quantity ~44.32584
    (test_binned_dataframe.py:217)."""
    import ray.data as rd

    h = BinnedDataframe(
        "h", [{"in": "abs(lat)", "out": "alat",
               "bins": {"nbins": 6, "low": 0.0, "high": 90.0}}],
        weights={"weight": "weight"})
    hp = h.aggregate(rd.from_arrow(pages_batch)).to_pandas()
    first = hp.iloc[0]
    assert int(first["n"]) == 71
    assert float(first["sumw_weight"] / first["n"]) == pytest.approx(
        0.5092292033450704, rel=1e-12)

"""Property-based tests (hypothesis) for the pure kernels.

The reference pins its kernels with hand-picked goldens plus ROOT
cross-checks (SURVEY.md §5); these properties add randomized coverage of
the same kernels against independent numpy/python references — no Ray
session needed, every subject is a pure function.
"""

import math

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from fast_carpenter_ray.arrays import reduce_list
from fast_carpenter_ray.expressions import Expression, evaluate
from fast_carpenter_ray.stages.dedup import cluster_pairs, tokenize
from fast_carpenter_ray.stages.simjoin import _prefix_len

# ---------------------------------------------------------------- arrays

_jagged = st.lists(
    st.lists(st.integers(-1000, 1000), min_size=0, max_size=6),
    min_size=1, max_size=40)


@settings(max_examples=60, deadline=None)
@given(_jagged, st.sampled_from(["sum", "max", "min", "any", "all",
                                 "count_nonzero", "argmax", "argmin"]))
def test_jagged_reductions_match_per_list_numpy(lists, method):
    col = pa.array([[float(x) for x in row] for row in lists],
                   type=pa.list_(pa.float64()))
    got = reduce_list(col, method)
    ref_fns = {
        "sum": lambda r: np.sum(r),
        "max": lambda r: np.max(r),
        "min": lambda r: np.min(r),
        "any": lambda r: bool(np.any(r)),
        "all": lambda r: bool(np.all(r)),
        "count_nonzero": lambda r: np.count_nonzero(r),
        "argmax": lambda r: int(np.argmax(r)),
        "argmin": lambda r: int(np.argmin(r)),
    }
    for i, row in enumerate(lists):
        r = np.asarray(row, dtype=np.float64)
        if len(row) == 0:
            if method in ("sum", "count_nonzero"):
                assert got[i] == 0
            elif method == "any":
                assert got[i] == False  # noqa: E712
            elif method == "all":
                assert got[i] == True  # noqa: E712
            else:
                assert np.isnan(got[i]) or got[i] in (-1,)
        else:
            want = ref_fns[method](r)
            if isinstance(want, float) and math.isnan(want):
                assert math.isnan(got[i])
            else:
                assert got[i] == want, (i, row, method)


# ----------------------------------------------------------- expressions

_colvals = st.lists(st.integers(-50, 50), min_size=1, max_size=30)


@settings(max_examples=60, deadline=None)
@given(_colvals, st.integers(-5, 5), st.sampled_from(["+", "-", "*"]))
def test_expression_arithmetic_matches_numpy(vals, k, op):
    batch = pa.table({"x": pa.array(vals, type=pa.int64())})
    got = evaluate(batch, f"x {op} {k} + 2 * x")
    x = np.asarray(vals, dtype=np.int64)
    want = {"+": x + k, "-": x - k, "*": x * k}[op] + 2 * x
    np.testing.assert_array_equal(np.asarray(got), want)


@settings(max_examples=60, deadline=None)
@given(_colvals, st.integers(-50, 50))
def test_expression_comparison_and_logic(vals, thr):
    batch = pa.table({"x": pa.array(vals, type=pa.int64())})
    got = np.asarray(evaluate(batch, f"(x > {thr}) | (x == {thr})"))
    x = np.asarray(vals)
    np.testing.assert_array_equal(got, x >= thr)


def test_expression_dependency_extraction():
    e = Expression("a + b * abs(c) - a")
    assert set(e.columns) == {"a", "b", "c"}


# ------------------------------------------------------- prefix filtering

@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(0, 25), min_size=1, max_size=20),
       st.lists(st.integers(0, 25), min_size=1, max_size=20),
       st.sampled_from([0.5, 0.7, 0.8, 0.9, 1.0]))
def test_prefix_filter_completeness(a_toks, b_toks, t):
    """THE prefix-filter theorem similarity_join relies on: if
    J(A, B) >= t then the globally-smallest shared token sits inside
    both prefixes of length n - ceil(t*n) + 1 (any global total order;
    here plain integer order)."""
    A = sorted(set(a_toks))
    B = sorted(set(b_toks))
    inter = set(A) & set(B)
    if not inter:
        return
    jac = len(inter) / (len(A) + len(B) - len(inter))
    if jac < t:
        return
    pa_len = int(_prefix_len(np.array([len(A)]), t)[0])
    pb_len = int(_prefix_len(np.array([len(B)]), t)[0])
    x = min(inter)
    assert x in A[:pa_len] and x in B[:pb_len]


# ------------------------------------------------------------ union-find

@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=1, max_size=60))
def test_cluster_pairs_matches_bfs(edges):
    import collections

    import pandas as pd

    pairs = pd.DataFrame({"id_a": [a for a, _ in edges],
                          "id_b": [b for _, b in edges]})
    got = cluster_pairs(pairs)
    # reference: BFS connected components, root = min id
    adj = collections.defaultdict(set)
    nodes = set()
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
        nodes |= {a, b}
    want = {}
    for start in sorted(nodes):
        if start in want:
            continue
        comp, queue = {start}, [start]
        while queue:
            u = queue.pop()
            for v in adj[u]:
                if v not in comp:
                    comp.add(v)
                    queue.append(v)
        root = min(comp)
        for u in comp:
            want[u] = root
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want


# ------------------------------------------------------------- tokenize

@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs")),
               max_size=80))
def test_tokenize_is_lower_split(text):
    assert tokenize(text) == text.lower().split()

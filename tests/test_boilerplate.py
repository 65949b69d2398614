"""Per-domain boilerplate line removal."""

import numpy as np
import pandas as pd
import pyarrow as pa


def pages():
    rows = []
    for d in range(2):
        dom = f"d{d}"
        for i in range(5):
            doc = d * 100 + i
            rows.append((doc, dom,
                         f"NAV {dom}\ncontent {doc} unique\nCOPY {dom}"))
    # one doc that is ALL boilerplate
    rows.append((999, "d0", "NAV d0\nCOPY d0"))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "domain": [r[1] for r in rows],
        "text": [r[2] for r in rows],
    })


def test_strip_boilerplate_broadcast(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.boilerplate import strip_boilerplate

    out = (strip_boilerplate(rd.from_arrow(pages()).repartition(3),
                             min_docs=3, min_frac=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == 11
    doc0 = out[out["doc_id"] == 0].iloc[0]
    assert doc0["text_clean"] == "content 0 unique"
    assert doc0["n_lines"] == 3 and doc0["n_removed"] == 2
    gone = out[out["doc_id"] == 999].iloc[0]
    assert gone["text_clean"] == "" and gone["n_removed"] == 2
    # unique content lines never stripped
    assert all(f"content {i}" in t for i, t in
               zip(out["doc_id"], out["text_clean"]) if i != 999)


def test_strip_boilerplate_paths_identical(ray_session):
    """budget=0 forces the distributed explode+join+reassemble path; the
    result must be identical to the broadcast path INCLUDING the full
    schema — the distributed path must keep every input column (text,
    domain, ...), not just the cleaned slim rows."""
    import ray.data as rd

    from fast_carpenter_ray.stages.boilerplate import strip_boilerplate

    a = (strip_boilerplate(rd.from_arrow(pages()).repartition(3))
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b = (strip_boilerplate(rd.from_arrow(pages()).repartition(3),
                           broadcast_budget=0)
         .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert set(a.columns) == set(b.columns) == {
        "doc_id", "domain", "text", "text_clean", "n_lines", "n_removed"}
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_strip_boilerplate_nul_lines_both_paths(ray_session):
    """A boilerplate line with an embedded NUL must be stripped on BOTH
    paths — the distributed join escapes NULs out of its key to dodge the
    Ray Dataset.join dropped-match bug (and \\x1e content is escaped
    injectively so it can't alias)."""
    import ray.data as rd

    from fast_carpenter_ray.stages.boilerplate import strip_boilerplate

    nav = "NAV\x00d0"          # embedded NUL in the frequent line
    esc = "tricky\x1e0line"     # raw text that matches NUL's escape form
    rows = [(i, "d0", f"{nav}\ncontent {i}\n{esc}") for i in range(5)]
    tab = pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "domain": [r[1] for r in rows],
        "text": [r[2] for r in rows],
    })
    outs = []
    for budget in (10**6, 0):
        out = (strip_boilerplate(rd.from_arrow(tab).repartition(2),
                                 min_docs=3, min_frac=0.5,
                                 broadcast_budget=budget)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert list(out["text_clean"]) == [f"content {i}" for i in range(5)]
        assert all(out["n_removed"] == 2)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1][outs[0].columns])


def test_frequent_lines_threshold(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.boilerplate import frequent_lines

    f = (frequent_lines(rd.from_arrow(pages()), min_docs=3, min_frac=0.5)
         .to_pandas())
    got = set(zip(f["domain"], f["line"]))
    # d0 has 6 docs (threshold 3), d1 has 5 (threshold 3)
    assert ("d0", "NAV d0") in got and ("d1", "COPY d1") in got
    assert not any(line.startswith("content") for _, line in got)

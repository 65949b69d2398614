"""MOSS winnowing fingerprints (Schleimer et al. 2003)."""

import numpy as np
import pytest


def test_winnow_doc_reference():
    """Brute-force reference: every window's rightmost-min position must
    be selected, nothing else."""
    from fast_carpenter_ray.stages.winnow import _gram_hashes, winnow_doc

    text = ("the quick brown fox jumps over the lazy dog and then the "
            "quick brown fox returns home")
    k, w = 3, 4
    g = _gram_hashes(text, k, {})
    want = set()
    for s in range(len(g) - w + 1):
        window = g[s:s + w]
        m = window.min()
        j = s + int(np.flatnonzero(window == m)[-1])  # rightmost min
        want.add((j, int(g[j]) & ((1 << 63) - 1)))
    got = set(winnow_doc(text, k, w))
    assert got == want
    # winnowing density guarantee: ~2/(w+1) of grams selected, never 0
    assert 0 < len(got) <= len(g)


def test_winnow_doc_short_and_tie():
    from fast_carpenter_ray.stages.winnow import winnow_doc

    # fewer grams than the window: exactly one fingerprint
    fp = winnow_doc("only two", k=3, w=4)
    assert len(fp) == 1
    # identical repeated text -> identical gram everywhere; rightmost
    # tie-break picks the window's last position each time
    fp2 = winnow_doc("a a a a a a a a", k=3, w=4)
    poss = [p for p, _ in fp2]
    assert poss == sorted(set(poss))
    # determinism
    assert winnow_doc("only two", 3, 4) == winnow_doc("only two", 3, 4)


def test_winnow_shared_fingerprints_detect_overlap(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.winnow import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog again today"
    tab = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": [shared + " alpha beta gamma delta",
                 "unrelated prefix words here " + shared,
                 "completely different content about arrow engines"],
    })
    fp = winnow_fingerprints(rd.from_arrow(tab)).to_pandas()
    by_doc = {d: set(g["gram"]) for d, g in fp.groupby("doc_id")}
    # docs 0 and 1 share the long passage -> many shared fingerprints;
    # doc 2 shares (almost) none
    assert len(by_doc[0] & by_doc[1]) >= 3
    assert len(by_doc[0] & by_doc[2]) == 0


def test_winnow_pairs_finds_copies(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.winnow import winnow_pairs

    body = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest looking for winter food")
    tab = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": [body,
                 "totally different preamble here " + body,
                 "unrelated words about vectorized arrow engines only"],
    })
    out = winnow_pairs(rd.from_arrow(tab), min_shared=2).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs
    assert not any(2 in p for p in pairs)
    n = int(out.set_index(["id_a", "id_b"]).loc[(0, 1), "n_shared"])
    assert n >= 2


def test_winnow_fast_mode_same_structure(ray_session):
    """hash_mode='fast': different hash values, identical selection
    structure — copies still pair, density comparable, deterministic."""
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.winnow import winnow_fingerprints

    body = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep dark forest looking for winter food")
    tab = pa.table({
        "doc_id": pa.array([0, 1], type=pa.int64()),
        "text": [body, "different intro words " + body],
    })
    fp = winnow_fingerprints(rd.from_arrow(tab), hash_mode="fast").to_pandas()
    by_doc = {d: set(g["gram"]) for d, g in fp.groupby("doc_id")}
    assert len(by_doc[0] & by_doc[1]) >= 2
    fp2 = winnow_fingerprints(rd.from_arrow(tab),
                              hash_mode="fast").to_pandas()
    assert fp.sort_values(["doc_id", "pos"]).reset_index(drop=True).equals(
        fp2.sort_values(["doc_id", "pos"]).reset_index(drop=True))
    import pytest

    with pytest.raises(ValueError):
        winnow_fingerprints(rd.from_arrow(tab), hash_mode="bogus")

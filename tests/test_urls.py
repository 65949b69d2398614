import numpy as np
import pyarrow as pa

from fast_carpenter_ray.stages.urls import BlocklistFilter, ParseURL


def _batch(urls):
    return pa.table({"doc_id": pa.array(range(len(urls)), type=pa.int64()),
                     "url": pa.array(urls, type=pa.string())})


def test_parse_url_components():
    out = ParseURL()(_batch([
        "https://site6.example/es/p126",
        "http://a.b/x/y?q=1",
        "https://nopath.example",          # optional path group missing
        "not a url at all",                # unparseable -> '' everywhere
    ]))
    assert out["scheme"].to_pylist() == ["https", "http", "https", ""]
    assert out["host"].to_pylist() == [
        "site6.example", "a.b", "nopath.example", ""]
    assert out["path"].to_pylist() == ["/es/p126", "/x/y?q=1", "", ""]


def test_parse_url_null_and_empty():
    batch = pa.table({"url": pa.array([None, ""], type=pa.string())})
    out = ParseURL(keep=("host",))(batch)
    assert out["host"].to_pylist() == ["", ""]


def test_blocklist_drop_and_keep():
    batch = _batch(["https://bad.example/a", "https://ok.example/b",
                    "https://bad.example/c"])
    batch = ParseURL(keep=("host",))(batch)
    dropped = BlocklistFilter(["bad.example"])(batch)
    assert dropped["doc_id"].to_pylist() == [1]
    kept = BlocklistFilter(["bad.example"], mode="keep")(batch)
    assert kept["doc_id"].to_pylist() == [0, 2]


def test_blocklist_in_dataset(ray_session):
    import ray.data as rd

    urls = [f"https://site{i % 4}.example/p{i}" for i in range(50)]
    ds = rd.from_arrow(_batch(urls))
    out = (BlocklistFilter(["site1.example"]).apply(
        ParseURL(keep=("host",)).apply(ds))).to_pandas()
    assert len(out) == 50 - sum(1 for i in range(50) if i % 4 == 1)
    assert not (out["host"] == "site1.example").any()
    assert np.array_equal(np.sort(out["doc_id"].to_numpy()),
                          np.array(sorted(i for i in range(50)
                                          if i % 4 != 1)))


def test_canonicalize_url_rules():
    from fast_carpenter_ray.stages.urls import CanonicalizeURL

    cases = {
        # scheme/host lowering + default ports (scheme-matched only)
        "https://SITE3.EXAMPLE:443/en/p1": "https://site3.example/en/p1",
        "HTTP://Host.Example:80/a?x=1": "http://host.example/a?x=1",
        "https://h.example:8080/a": "https://h.example:8080/a",
        "http://h.example:443/a": "http://h.example:443/a",
        # fragment
        "https://h.example/a#frag": "https://h.example/a",
        # tracking params in every position
        "https://h.example/a?utm_source=f&b=2": "https://h.example/a?b=2",
        "https://h.example/a?b=2&gclid=g": "https://h.example/a?b=2",
        "https://h.example/a?a=1&utm_x=2&b=3": "https://h.example/a?a=1&b=3",
        "https://h.example/a?fbclid=x": "https://h.example/a",
        # trailing slash, incl. before a query
        "https://h.example/a/": "https://h.example/a",
        "https://h.example/a/?b=1": "https://h.example/a?b=1",
        "https://h.example/": "https://h.example",
        # '/?' inside a query VALUE is NOT the path boundary and survives
        "https://h.example/a?next=/path/?x=1":
            "https://h.example/a?next=/path/?x=1",
        "https://h.example/a/?next=/p/?x=1":
            "https://h.example/a?next=/p/?x=1",
        # unparseable passes through
        "not-a-url": "not-a-url",
    }
    got = CanonicalizeURL().canonicalize(
        pa.chunked_array([pa.array(list(cases))])).to_pylist()
    assert got == list(cases.values())


def test_canonicalize_url_in_dataset(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.urls import CanonicalizeURL

    urls = [f"https://SITE{i % 3}.EXAMPLE:443/p{i % 4}?utm_c=x"
            for i in range(24)]
    out = CanonicalizeURL().apply(rd.from_arrow(_batch(urls))).to_pandas()
    assert set(out["canon_url"]) == {
        f"https://site{i % 3}.example/p{i % 4}" for i in range(24)}
    # 3x4 = 12 canonical forms, each hit twice
    assert out["canon_url"].nunique() == 12


def test_robots_rules_longest_prefix_wins():
    from fast_carpenter_ray.stages.crawl import RobotsRules

    rules = [("h.example", "/", True),
             ("h.example", "/private", False),
             ("h.example", "/private/pub", True)]
    batch = pa.table({
        "host": pa.array(["h.example", "h.example", "h.example",
                          "h.example", "other.example"]),
        "path": pa.array(["/a", "/private/x", "/private/pub/y",
                          "/privateer", "/private/x"]),
    })
    out = RobotsRules(rules)(batch)
    assert out["rule_prefix"].to_pylist() == [
        "/", "/private", "/private/pub", "/private", ""]
    assert out["allowed"].to_pylist() == [1, 0, 1, 0, 1]


def test_robots_rules_duplicate_raises(ray_session):
    import pytest as _pt

    from fast_carpenter_ray.stages.crawl import RobotsRules

    with _pt.raises(ValueError):
        RobotsRules([("h", "/", True), ("h", "/", False)])


def test_crawl_pipeline_structure(ray_session):
    from fast_carpenter_ray.pipelines.queries import (
        BLOCKED_HOSTS, q_crawl_pipeline)

    out = q_crawl_pipeline("/root/testdata/sf0.001")
    assert len(out) == 50
    assert list(out.columns) == ["schedule_pos", "wave", "host", "keeper"]
    # blocked domains never scheduled
    assert not out["host"].isin(BLOCKED_HOSTS).any()
    # politeness: within a wave each host appears at most once
    assert (out.groupby(["wave", "host"]).size() <= 1).all()
    # dedupe kept originals over the +10M shifted spellings
    assert (out["keeper"] < 10_000_000).all()
    # schedule positions are 1..50 in order
    assert out["schedule_pos"].tolist() == list(range(1, 51))


def test_crawl_budget_apportionment(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.crawl import crawl_budget

    # counts 5, 3, 2 over 10 slots -> exact shares 5, 3, 2
    t = pa.table({"source": pa.array(
        ["a"] * 5 + ["b"] * 3 + ["c"] * 2)})
    out = crawl_budget(rd.from_arrow(t).repartition(2), slots=10)
    assert dict(zip(out["source"], out["alloc"])) == {"a": 5, "b": 3, "c": 2}

    # counts 1,1,1 over 10 slots: base 3 each + 1 leftover to the
    # lexicographically smallest (equal remainders)
    t = pa.table({"source": pa.array(["x", "y", "z"])})
    out = crawl_budget(rd.from_arrow(t), slots=10)
    assert dict(zip(out["source"], out["alloc"])) == {"x": 4, "y": 3, "z": 3}
    assert out["alloc"].sum() == 10


def test_crawl_budget_always_sums_to_slots(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(33)
    from fast_carpenter_ray.stages.crawl import crawl_budget

    t = pa.table({"source": pa.array(
        [f"s{int(i)}" for i in rng.integers(0, 23, 500)])})
    for slots in (1, 7, 100, 999):
        out = crawl_budget(rd.from_arrow(t).repartition(3), slots=slots)
        assert out["alloc"].sum() == slots
        # within one slot of the exact share
        share = slots * out["n_pages"].to_numpy() / 500.0
        assert (np.abs(out["alloc"].to_numpy() - share) < 1.0 + 1e-9).all()

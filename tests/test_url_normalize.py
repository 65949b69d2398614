"""Syntactic URL canonicalization (stages/redirects.py normalize_urls)."""

import pyarrow as pa

from fast_carpenter_ray.stages.redirects import normalize_urls


def _urls(urls):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(urls))), type=pa.int64()),
        "url": pa.array(urls, type=pa.string()),
    }))


def _canon(urls, ray_session=None):
    out = normalize_urls(_urls(urls)).to_pandas().sort_values("doc_id")
    return list(out["canon_url"])


def test_rule_vectors(ray_session):
    cases = {
        # fragment
        "https://a.example/p#sec": "https://a.example/p",
        # utm params (global, mid-query too)
        "https://a.example/p?utm_source=x": "https://a.example/p",
        "https://a.example/p?id=1&utm_medium=m": "https://a.example/p?id=1",
        # scheme upgrade + www strip + host lowercase
        "http://www.A.EXAMPLE/Path": "https://a.example/Path",
        # path case preserved
        "https://a.example/CaseSensitive": "https://a.example/CaseSensitive",
        # trailing slash (one)
        "https://a.example/p/": "https://a.example/p",
        # combined
        "http://www.SITE4.EXAMPLE/en/p8#x": "https://site4.example/en/p8",
        # non-https scheme left alone by the host rule
        "ftp://A.example/p": "ftp://A.example/p",
    }
    got = _canon(list(cases.keys()))
    assert got == list(cases.values())


def test_python_re_matches_pandas_chain(ray_session):
    # the documented contract: plain re.sub replays the kernel
    import re
    urls = ["http://www.X.EXAMPLE/A/b?utm_c=1&id=2#f",
            "https://y.example/q/", "https://www.z.example"]
    got = _canon(urls)
    for u, g in zip(urls, got):
        s = re.sub(r"#.*$", "", u)
        s = re.sub(r"[?&]utm_[^&#]*", "", s)
        s = re.sub(r"^http://", "https://", s)
        s = re.sub(r"^https://www\.", "https://", s)
        m = re.match(r"^https://([^/]*)(.*)$", s)
        if m:
            s = "https://" + m.group(1).lower() + m.group(2)
        s = re.sub(r"/$", "", s)
        assert g == s


def test_canonical_dedup_collapses_variants(ray_session):
    from fast_carpenter_ray.stages.dedup import ExactDedup
    urls = ["https://a.example/p",
            "https://a.example/p#frag",
            "http://www.A.EXAMPLE/p",
            "https://a.example/p/",
            "https://b.example/q"]
    ds = normalize_urls(_urls(urls))
    out = ExactDedup("t", key="canon_url").apply(ds).to_pandas()
    assert sorted(out["doc_id"]) == [0, 4]

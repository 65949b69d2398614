"""Link-graph operators: regex extraction vs fixture arithmetic,
PageRank vs a local NumPy reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fast_carpenter_ray.fixtures import outlink_sites, synth_pages_batch
from fast_carpenter_ray.stages.linkgraph import (domain_degrees,
                                                 extract_links, pagerank)


def _pages_ds(sf_dir, n=200):
    import ray.data as rd

    docs = pq.read_table(f"{sf_dir}/documents.parquet").slice(0, n)
    return rd.from_arrow(synth_pages_batch(docs)).repartition(5)


def _expected_edges(sf_dir, n=200):
    doc_id = (pq.read_table(f"{sf_dir}/documents.parquet").slice(0, n)
              ["doc_id"].to_numpy())
    rows = []
    for d in doc_id.tolist():
        src = f"site{d % 20}.example"
        for s in outlink_sites(d):
            rows.append((src, f"site{s}.example"))
    return (pd.DataFrame(rows, columns=["src_domain", "dst_domain"])
            .groupby(["src_domain", "dst_domain"]).size().rename("n")
            .reset_index().sort_values(["src_domain", "dst_domain"])
            .reset_index(drop=True))


def test_extract_links_matches_fixture_arithmetic(ray_session, sf_dir):
    got = (extract_links(_pages_ds(sf_dir)).to_pandas()
           .sort_values(["src_domain", "dst_domain"]).reset_index(drop=True))
    exp = _expected_edges(sf_dir)
    assert got["src_domain"].tolist() == exp["src_domain"].tolist()
    assert got["dst_domain"].tolist() == exp["dst_domain"].tolist()
    np.testing.assert_array_equal(got["n"].to_numpy().astype(np.int64),
                                  exp["n"].to_numpy())


def test_domain_degrees(ray_session, sf_dir):
    e = _expected_edges(sf_dir)
    out = (e.groupby("src_domain")
           .agg(out_degree=("n", "size"), out_links=("n", "sum")))
    got = domain_degrees(_pages_ds(sf_dir))
    row = got[got["domain"] == out.index[0]].iloc[0]
    assert row["out_degree"] == out["out_degree"].iloc[0]
    assert row["out_links"] == out["out_links"].iloc[0]
    # conservation: total out-links == total in-links == 3 * pages
    assert got["out_links"].sum() == got["in_links"].sum() == 3 * 200


def test_pagerank_matches_local_power_iteration(ray_session, sf_dir):
    e = _expected_edges(sf_dir)
    doms = np.union1d(e["src_domain"].unique(), e["dst_domain"].unique())
    n = len(doms)
    si = np.searchsorted(doms, e["src_domain"].to_numpy())
    di = np.searchsorted(doms, e["dst_domain"].to_numpy())
    w = e["n"].to_numpy().astype(np.float64)
    ol = np.bincount(si, weights=w, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        contrib = np.bincount(di, weights=r[si] * w / ol[si], minlength=n)
        r = (1.0 - 0.85) / n + 0.85 * contrib
    got = (pagerank(_pages_ds(sf_dir), damping=0.85, iters=3)
           .sort_values("domain").reset_index(drop=True))
    assert got["domain"].tolist() == doms.tolist()
    np.testing.assert_allclose(got["rank"].to_numpy(), r, rtol=0, atol=1e-12)
    # ranks stay a (sub-)distribution
    assert got["rank"].sum() == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty(ray_session):
    import ray.data as rd

    empty = rd.from_arrow(pa.table({"url": pa.array([], pa.string()),
                                    "html": pa.array([], pa.binary())}))
    out = pagerank(empty)
    assert out.empty

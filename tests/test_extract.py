import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fast_carpenter_ray.fixtures import geo_columns, make_html, synth_pages_batch
from fast_carpenter_ray.stages.extract import ExtractText, HashCompare, extract_one, sha256_hex


def test_extract_roundtrip_byte_identical():
    text = "hello <world> & \"friends\" éè"
    html = make_html(7, text, 40.5, -73.9, True)
    out_text, lat, lng = extract_one(html)
    assert out_text == text
    assert lat == 40.5 and lng == -73.9


def test_extract_float_roundtrip_is_exact():
    # %.17g formatting must round-trip float64 exactly
    lat = 40.71 + 137 / 1000.0 - 0.1
    lng = -74.0 + 29 / 1000.0 - 0.1
    html = make_html(1, "x", lat, lng, True)
    _, plat, plng = extract_one(html)
    assert plat == lat and plng == lng


def test_extract_no_geo():
    html = make_html(7, "x", float("nan"), float("nan"), False)
    _, lat, lng = extract_one(html)
    assert np.isnan(lat) and np.isnan(lng)


def test_batched_extract_matches_reference(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").slice(0, 100)
    pages = synth_pages_batch(docs)
    stage = ExtractText(drop_html=True)
    out = stage(pages)
    assert "html" not in out.column_names
    # per-row invariant: byte-identical text per url vs the documents source
    expected = docs["text"].to_pylist()
    got = out["text"].to_pylist()
    assert got == expected
    # geo parity with the arithmetic formulas
    g = geo_columns(docs["doc_id"].to_numpy())
    np.testing.assert_array_equal(
        np.isnan(out["lat"].to_numpy(zero_copy_only=False)), np.isnan(g["lat"]))
    ok = ~np.isnan(g["lat"])
    np.testing.assert_array_equal(
        out["lat"].to_numpy(zero_copy_only=False)[ok], g["lat"][ok])


def test_hash_compare_pass_and_fail():
    batch = pa.table({
        "url": ["u1", "u2"],
        "text": ["aaa", "bbb"],
        "expected_sha256": [sha256_hex("aaa"), sha256_hex("bbb")],
    })
    out = HashCompare()(batch)
    assert out["hash_ok"].to_pylist() == [True, True]

    bad = pa.table({
        "url": ["u1"],
        "text": ["aaa"],
        "expected_sha256": [sha256_hex("ZZZ")],
    })
    with pytest.raises(ValueError, match="hash-compare failed"):
        HashCompare()(bad)
    out = HashCompare(strict=False)(bad)
    assert out["hash_ok"].to_pylist() == [False]


def test_sha256_matches_hashlib():
    assert sha256_hex("x") == hashlib.sha256(b"x").hexdigest()

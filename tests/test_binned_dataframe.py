"""BinnedDataframe goldens mirroring the reference's test coverage
(tests/summary/test_binned_dataframe.py): expression dims, closed-left
binning with +-inf guards, jagged explode, pad_missing densify, merge
algebra."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.binned_dataframe import (
    BadBinnedDataframeConfig, BinnedDataframe, bin_edges)


def batch():
    return pa.table({
        "x": np.array([-5.0, 0.0, 1.0, 5.0, 9.99, 10.0, 25.0, 100.0]),
        "cat": ["a", "a", "b", "b", "a", "b", "a", "a"],
        "w": np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]),
    })


def test_bin_edges_reference_semantics():
    edges = bin_edges(nbins=2, low=0, high=10)
    np.testing.assert_array_equal(edges, [-np.inf, 0, 5, 10, np.inf])
    edges = bin_edges(edges=[0, 200.0, 900])
    np.testing.assert_array_equal(edges, [-np.inf, 0, 200, 900, np.inf])
    edges = bin_edges(edges=[0, 1], underflow=False, overflow=False)
    np.testing.assert_array_equal(edges, [0, 1])
    assert bin_edges() is None


def test_closed_left_binning():
    h = BinnedDataframe("h", [{"in": "x", "bins": {"edges": [0.0, 10.0]}}])
    out = h.partial(batch()).to_pandas().set_index("x")["n"]
    # codes: 0=[-inf,0), 1=[0,10), 2=[10,inf)
    assert out[0] == 1          # -5
    assert out[1] == 4          # 0 (closed left!), 1, 5, 9.99
    assert out[2] == 3          # 10 (left edge of overflow interval), 25, 100


def test_expression_dimension_and_weights():
    h = BinnedDataframe("h", [{"in": "x * 2.0", "out": "x2",
                               "bins": {"edges": [0.0, 20.0]}}],
                        weights={"w": "w"})
    out = h.partial(batch()).to_pandas()
    assert set(out.columns) == {"x2", "n", "sumw_w", "sumw2_w"}
    mid = out.set_index("x2").loc[1]
    assert mid["n"] == 4 and mid["sumw_w"] == 2 + 3 + 4 + 5


def test_jagged_explode():
    t = pa.table({
        "jag": pa.array([[1.0, 2.0], [3.0], []]),
        "flat": np.array([10.0, 20.0, 30.0]),
    })
    h = BinnedDataframe("h", [{"in": "jag", "bins": {"edges": [0.0, 2.5]}},
                              {"in": "flat", "bins": {"edges": [0.0, 15.0]}}])
    out = h.partial(t).to_pandas()
    # 3 exploded rows: (1,10), (2,10), (3,20)
    assert out["n"].sum() == 3


def test_mismatched_jaggedness_raises():
    t = pa.table({
        "j1": pa.array([[1.0, 2.0], [3.0]]),
        "j2": pa.array([[1.0], [2.0, 3.0]]),
    })
    h = BinnedDataframe("h", [{"in": "j1", "bins": None},
                              {"in": "j2", "bins": None}])
    with pytest.raises(ValueError, match="different jaggedness"):
        h.partial(t)


def test_aggregate_and_collect(ray_session):
    import ray.data as rd

    h = BinnedDataframe("h", [{"in": "cat"},
                              {"in": "x", "bins": {"edges": [0.0, 10.0]}}],
                        weights={"w": "w"})
    ds = rd.from_arrow(batch()).repartition(3)
    result = h.aggregate(ds)
    table = h.collect(result, dataset_name="d")
    assert table.index.names == ["dataset", "cat", "x"]
    assert list(table.columns) == ["n", "w:sumw", "w:sumw2"]
    assert table["n"].sum() == 8
    # interval labels closed left
    assert str(table.index.get_level_values("x")[0]).startswith("[")


def test_pad_missing_densify(ray_session):
    import ray.data as rd

    h = BinnedDataframe("h", [{"in": "x", "bins": {"edges": [0.0, 10.0, 20.0]}}],
                        pad_missing=True)
    small = pa.table({"x": np.array([5.0])})
    out = h.collect(h.aggregate(rd.from_arrow(small)))
    # full bin product present: 4 intervals incl. +-inf guards
    assert len(out) == 4
    assert out["n"].fillna(0).sum() == 1


def test_merge_algebra_doubles(ray_session):
    import ray.data as rd

    h = BinnedDataframe("h", [{"in": "cat"}], weights={"w": "w"})
    single = h.aggregate(rd.from_arrow(batch())).to_pandas()
    doubled = h.aggregate(
        rd.from_arrow(pa.concat_tables([batch(), batch()])).repartition(4)
    ).to_pandas()
    merged = single.merge(doubled, on="cat", suffixes=("_1", "_2"))
    assert (merged["n_2"] == 2 * merged["n_1"]).all()
    np.testing.assert_allclose(merged["sumw_w_2"], 2 * merged["sumw_w_1"])


def test_bad_configs():
    with pytest.raises(BadBinnedDataframeConfig):
        BinnedDataframe("h", "not-a-list")
    with pytest.raises(BadBinnedDataframeConfig):
        BinnedDataframe("h", [{"in": "x", "bins": {"nbins": 3}}])  # missing low/high
    with pytest.raises(BadBinnedDataframeConfig):
        BinnedDataframe("h", [{"in": "x", "bins": 42}])


def test_write_summary_formats(ray_session, tmp_path):
    """Extension-dispatched writer (reference summary/binned_dataframe.py:
    33-43): csv/parquet/pkl/json round-trip; optional engines raise a
    clear error; unknown extensions are refused."""
    import pandas as pd
    import ray.data as rd

    from fast_carpenter_ray.stages.binned_dataframe import write_summary

    h = BinnedDataframe("h", [{"in": "x", "bins": {"edges": [0.0, 1.0, 2.0]}}],
                        weights={"w": "w"})
    df = h.collect(h.aggregate(rd.from_arrow(batch())))

    csv_path = str(tmp_path / "s.csv")
    write_summary(df, csv_path)
    text = open(csv_path).read()
    assert "n" in text and "w:sumw" in text

    pkl_path = str(tmp_path / "s.pkl")
    write_summary(df, pkl_path)
    back = pd.read_pickle(pkl_path)
    pd.testing.assert_frame_equal(back, df)

    pq_path = str(tmp_path / "s.parquet")
    write_summary(df, pq_path)
    back = pd.read_parquet(pq_path)
    assert back["n"].sum() == df["n"].sum()
    assert back["x"].dtype == object  # interval labels stringified

    json_path = str(tmp_path / "s.json")
    write_summary(df, json_path)
    assert pd.read_json(json_path)["n"].sum() == df["n"].sum()

    with pytest.raises(ValueError, match="unsupported"):
        write_summary(df, str(tmp_path / "s.nope"))
    try:
        write_summary(df, str(tmp_path / "s.h5"))
    except NotImplementedError as err:
        assert "optional" in str(err)  # pytables absent in this sandbox

    # xlsx: self-contained OOXML writer, no optional engine needed —
    # round-trip by parsing the zip's sheet XML with the stdlib
    xlsx_path = str(tmp_path / "s.xlsx")
    write_summary(df, xlsx_path)
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(xlsx_path) as z:
        assert set(z.namelist()) >= {"[Content_Types].xml",
                                     "xl/workbook.xml",
                                     "xl/worksheets/sheet1.xml"}
        sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    rows = sheet.findall(".//m:row", ns)
    assert len(rows) == len(df) + 1  # header + data
    header = ["".join(t.text or "" for t in c.findall(".//m:t", ns))
              for c in rows[0].findall("m:c", ns)]
    assert "n" in header and "w:sumw" in header
    n_col = header.index("n")
    got_n = [int(float(r.findall("m:c", ns)[n_col].find("m:v", ns).text))
             for r in rows[1:]]
    assert got_n == df["n"].tolist()

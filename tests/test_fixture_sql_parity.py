"""Bit-exact parity between the NumPy fixture formulas and their DuckDB SQL
mirrors — the foundation of the oracle strategy (fixtures.py docstring)."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from fast_carpenter_ray.fixtures import geo_columns, sql_geo_exprs
from fast_carpenter_ray.geo import cell_id


def test_geo_columns_match_sql_bitexact(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    doc_id = docs["doc_id"].to_numpy()
    py = geo_columns(doc_id)

    exprs = sql_geo_exprs("doc_id")
    con = duckdb.connect()
    sql = (
        f"SELECT doc_id, {exprs['lat']} AS lat, {exprs['lng']} AS lng, "
        f"{exprs['weight']} AS weight "
        f"FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    )
    got = con.sql(sql).fetchnumpy()

    order = np.argsort(doc_id)
    for col in ("lat", "lng", "weight"):
        mine = py[col][order]
        theirs = np.ma.filled(got[col], np.nan).astype(np.float64)
        both_nan = np.isnan(mine) & np.isnan(theirs)
        exact = (mine == theirs) | both_nan
        assert exact.all(), f"{col}: {np.nonzero(~exact)[0][:5]}"


def test_cell_id_matches_sql_bitexact(sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    doc_id = np.sort(docs["doc_id"].to_numpy())
    py = geo_columns(doc_id)
    cells = cell_id(py["lat"], py["lng"], 6)

    exprs = sql_geo_exprs("doc_id")
    n = 64
    cell_sql = (
        f"CASE WHEN {exprs['lat']} IS NULL THEN -1 ELSE "
        f"CAST(least(greatest(floor(({exprs['lat']} + 90.0) / 180.0 * {n}), 0), {n-1}) AS BIGINT) * {n} "
        f"+ CAST(least(greatest(floor(({exprs['lng']} + 180.0) / 360.0 * {n}), 0), {n-1}) AS BIGINT) END"
    )
    con = duckdb.connect()
    got = con.sql(
        f"SELECT {cell_sql} AS cell FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchnumpy()["cell"]
    np.testing.assert_array_equal(cells, got)

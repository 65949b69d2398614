"""Z-order locality keys + sorted-layout prunability (stages/zorder.py)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fast_carpenter_ray.stages.zorder import morton, zorder_key, zorder_sql


def _interleave_ref(x, y, bits):
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_morton_matches_reference():
    rng = np.random.RandomState(2)
    x = rng.randint(0, 1024, 500)
    y = rng.randint(0, 1024, 500)
    got = morton(x, y, 10)
    want = [_interleave_ref(int(a), int(b), 10) for a, b in zip(x, y)]
    assert got.tolist() == want


def test_sql_expansion_matches_numpy():
    import duckdb
    rng = np.random.RandomState(3)
    x = rng.randint(0, 1024, 300)
    y = rng.randint(0, 1024, 300)
    con = duckdb.connect()
    con.register("t", pa.table({"x": x, "y": y}))
    sql = f"SELECT {zorder_sql('x', 'y', 10)} AS z FROM t"
    got = [r[0] for r in con.execute(sql).fetchall()]
    assert got == morton(x, y, 10).tolist()


def test_range_validation(ray_session):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({"x": [1024], "y": [0]}))
    with pytest.raises(Exception):
        zorder_key(ds, bits=10).materialize()
    with pytest.raises(ValueError):
        zorder_key(ds, bits=0)


def test_locality_box_decomposes_into_few_ranges():
    # all cells of an aligned 128x128 box form ONE contiguous key range —
    # the property that turns spatial boxes into file-range pruning
    xs, ys = np.meshgrid(np.arange(128, 256), np.arange(128, 256),
                         indexing="ij")
    z = np.sort(morton(xs.ravel(), ys.ravel(), 10))
    assert z[-1] - z[0] + 1 == len(z)


def test_sorted_layout_prunes_fragments(ray_session, tmp_path):
    """sort(zkey) -> sharded write -> per-file footer min/max are
    non-overlapping -> a box query's key ranges touch few files."""
    import ray.data as rd
    rng = np.random.RandomState(7)
    n = 20_000
    t = pa.table({
        "x": rng.randint(0, 1024, n),
        "y": rng.randint(0, 1024, n),
    })
    ds = zorder_key(rd.from_arrow(t), bits=10)
    out = os.path.join(str(tmp_path), "zsorted")
    ds.sort("zkey").repartition(16).write_parquet(out)

    files = sorted(os.path.join(out, f) for f in os.listdir(out)
                   if f.endswith(".parquet"))
    spans = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(md.row_group(rg).column(i)
                       for i in range(md.num_columns)
                       if md.row_group(rg).column(i).path_in_schema
                       == "zkey")
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    spans.sort()
    # files hold disjoint key ranges (sorted layout)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi <= b_lo
    # an aligned 128x128 box is one key range -> prunes to few files
    lo = int(morton(np.array([128]), np.array([128]), 10)[0])
    hi = int(morton(np.array([255]), np.array([255]), 10)[0])
    touched = sum(1 for s_lo, s_hi in spans if s_lo <= hi and lo <= s_hi)
    assert touched < len(spans) / 2


# ---------------------------------------------------------------------------
# Hilbert curve keys


def _d2xy(n, d):
    """Independent classic inverse (public Wikipedia formulation)."""
    x = y = 0
    t = d
    s = 1
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def test_hilbert_roundtrips_classic_inverse():
    from fast_carpenter_ray.stages.zorder import hilbert_d

    bits = 4
    n = 1 << bits
    xs, ys = [], []
    for d in range(n * n):
        x, y = _d2xy(n, d)
        xs.append(x)
        ys.append(y)
    got = hilbert_d(np.array(xs), np.array(ys), bits)
    assert got.tolist() == list(range(n * n))


def test_hilbert_consecutive_cells_are_adjacent():
    from fast_carpenter_ray.stages.zorder import hilbert_d

    bits = 5
    n = 1 << bits
    gx, gy = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_d(gx.ravel(), gy.ravel(), bits)
    order = np.argsort(d)
    x, y = gx.ravel()[order], gy.ravel()[order]
    steps = np.abs(np.diff(x)) + np.abs(np.diff(y))
    assert (steps == 1).all()      # the defining Hilbert property


def test_hilbert_sql_matches_numpy():
    import duckdb

    from fast_carpenter_ray.stages.zorder import hilbert_d, hilbert_sql

    rng = np.random.default_rng(9)
    bits = 10
    xs = rng.integers(0, 1 << bits, 500).astype(np.int64)
    ys = rng.integers(0, 1 << bits, 500).astype(np.int64)
    exp = hilbert_d(xs, ys, bits)
    con = duckdb.connect()
    con.execute("CREATE TABLE p AS SELECT * FROM (SELECT "
                "unnest(?) AS i, unnest(?) AS x, unnest(?) AS y)",
                [list(range(500)), xs.tolist(), ys.tolist()])
    q = "WITH " + hilbert_sql("p", "i, x, y", "x", "y", bits)
    got = con.execute(q + " ORDER BY i").df()
    assert got["hkey"].to_numpy().tolist() == exp.tolist()


def test_hilbert_better_box_locality_than_morton():
    from fast_carpenter_ray.stages.zorder import hilbert_d, morton

    bits = 6

    def ranges(keys):
        k = np.sort(keys)
        return 1 + int(np.count_nonzero(np.diff(k) > 1))

    # average contiguous-range count over shifted 8x8 boxes: Hilbert
    # must not fragment more than Morton (its whole selling point)
    tot_h = tot_m = 0
    for ox, oy in [(0, 0), (3, 5), (17, 9), (40, 22), (11, 33)]:
        gx, gy = np.meshgrid(np.arange(ox, ox + 8), np.arange(oy, oy + 8))
        tot_h += ranges(hilbert_d(gx.ravel(), gy.ravel(), bits))
        tot_m += ranges(morton(gx.ravel(), gy.ravel(), bits))
    assert tot_h <= tot_m


def test_hilbert_range_validation(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.zorder import hilbert_key

    ds = rd.from_arrow(pa.table({"x": pa.array([5], type=pa.int64()),
                                 "y": pa.array([99], type=pa.int64())}))
    with pytest.raises(Exception):
        hilbert_key(ds, bits=3).materialize()
    with pytest.raises(ValueError):
        hilbert_key(ds, bits=0)

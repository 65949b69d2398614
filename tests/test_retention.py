"""Retention / cohort / origin-destination operators vs brute force."""

import numpy as np
import pandas as pd
import pytest

from fast_carpenter_ray.stages.retention import (cohort_retention, od_matrix,
                                                 od_matrix_bucketed,
                                                 retention)

DAY = 86_400_000_000


def _events(seed=31, n=2500, keys=40, days=14):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": rng.integers(0, keys, n).astype(np.int64),
        "ts": rng.integers(0, days * DAY, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "cell": rng.integers(0, 9, n).astype(np.int64),
    })


def _brute_pairs(df):
    d = df.copy()
    d["day"] = d["ts"] // DAY
    return d[["user_id", "day"]].drop_duplicates()


def test_retention_matches_brute(ray_session):
    import ray.data as rd

    df = _events()
    a = _brute_pairs(df)
    nxt = a.copy()
    nxt["day"] -= 1
    ret = (a.merge(nxt, on=["user_id", "day"]).groupby("day")
           .size().rename("retained"))
    exp = (a.groupby("day").size().rename("active").to_frame()
           .join(ret).fillna(0).astype(np.int64).reset_index()
           .sort_values("day").reset_index(drop=True))

    got = (retention(rd.from_pandas(df).repartition(5))
           .to_pandas().sort_values("day").reset_index(drop=True))
    for c in ["day", "active", "retained"]:
        np.testing.assert_array_equal(
            got[c].to_numpy().astype(np.int64), exp[c].to_numpy(), err_msg=c)


def test_cohort_retention_matches_brute(ray_session):
    import ray.data as rd

    df = _events(seed=7)
    a = _brute_pairs(df)
    first = a.groupby("user_id")["day"].min().rename("cohort")
    j = a.join(first, on="user_id")
    j["day_offset"] = j["day"] - j["cohort"]
    exp = (j.groupby(["cohort", "day_offset"]).size().rename("n_users")
           .reset_index().sort_values(["cohort", "day_offset"])
           .reset_index(drop=True))

    got = (cohort_retention(rd.from_pandas(df).repartition(4))
           .to_pandas().sort_values(["cohort", "day_offset"])
           .reset_index(drop=True))
    for c in ["cohort", "day_offset", "n_users"]:
        np.testing.assert_array_equal(
            got[c].to_numpy().astype(np.int64), exp[c].to_numpy(), err_msg=c)
    # day_offset 0 rows are the cohort sizes
    sizes = first.value_counts().sort_index()
    z = got[got["day_offset"] == 0]
    np.testing.assert_array_equal(z["n_users"].to_numpy().astype(np.int64),
                                  sizes.to_numpy())


def _brute_od(df):
    rows = []
    for _, g in df.sort_values(["ts", "event_id"],
                               kind="stable").groupby("user_id"):
        c = g["cell"].to_numpy()
        for a, b in zip(c[:-1], c[1:]):
            if a != b:
                rows.append((a, b))
    return (pd.DataFrame(rows, columns=["cell_from", "cell_to"])
            .groupby(["cell_from", "cell_to"]).size().rename("n")
            .reset_index().sort_values(["cell_from", "cell_to"])
            .reset_index(drop=True))


def test_od_matrix_matches_brute(ray_session):
    import ray.data as rd

    df = _events(seed=19, n=1200, keys=8)
    exp = _brute_od(df)
    got = (od_matrix(rd.from_pandas(df).repartition(5))
           .to_pandas().sort_values(["cell_from", "cell_to"])
           .reset_index(drop=True))
    for c in ["cell_from", "cell_to", "n"]:
        np.testing.assert_array_equal(
            got[c].to_numpy().astype(np.int64), exp[c].to_numpy(), err_msg=c)


@pytest.mark.parametrize("bucket_width", [3 * DAY, DAY // 24, 1])
def test_od_bucketed_equals_flat(ray_session, bucket_width):
    """Width 1 puts every event in its own bucket: every transition flows
    through the boundary-merge pass."""
    import ray.data as rd

    df = _events(seed=23, n=600, keys=5)
    ds = rd.from_pandas(df).repartition(4)
    flat = (od_matrix(ds).to_pandas()
            .sort_values(["cell_from", "cell_to"]).reset_index(drop=True))
    buck = (od_matrix_bucketed(ds, bucket_width=bucket_width).to_pandas()
            .sort_values(["cell_from", "cell_to"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        flat.astype(np.int64), buck.astype(np.int64))


def test_retention_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.int64()),
        "event_id": pa.array([], pa.int64()),
        "cell": pa.array([], pa.int64())}))
    assert retention(empty).to_pandas().empty
    assert od_matrix(empty).to_pandas().empty


def test_audience_overlap_matches_brute(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.retention import audience_overlap

    rng = np.random.default_rng(61)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 50, 800).astype(np.int64),
        "event_type": rng.choice(["v", "c", "p", "s"], 800),
    })
    got = (audience_overlap(rd.from_pandas(df).repartition(4))
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    p = df.drop_duplicates()
    exp = (p.merge(p, on="user_id")
           .query("event_type_x < event_type_y")
           .groupby(["event_type_x", "event_type_y"]).size()
           .rename("n_users").reset_index()
           .sort_values(["event_type_x", "event_type_y"])
           .reset_index(drop=True))
    assert got["a"].tolist() == exp["event_type_x"].tolist()
    assert got["b"].tolist() == exp["event_type_y"].tolist()
    np.testing.assert_array_equal(got["n_users"].to_numpy().astype(np.int64),
                                  exp["n_users"].to_numpy())


def test_od_gravity_matches_brute(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from fast_carpenter_ray.stages.retention import od_gravity

    rng = np.random.RandomState(19)
    n = 2000
    t = pa.table({
        "user_id": pa.array(rng.randint(0, 15, n), type=pa.int64()),
        "ts": pa.array(rng.randint(0, 10**6, n), type=pa.int64()),
        "event_id": pa.array(np.arange(1, n + 1), type=pa.int64()),
        "cell": pa.array(rng.randint(0, 10, n), type=pa.int64()),
    })
    got = od_gravity(rd.from_arrow(t))

    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    trans = {}
    for _, g in df.groupby("user_id"):
        cells = g["cell"].tolist()
        for a, b in zip(cells, cells[1:]):
            if a != b:
                trans[(a, b)] = trans.get((a, b), 0) + 1
    total = sum(trans.values())
    row = {}
    col = {}
    for (a, b), v in trans.items():
        row[a] = row.get(a, 0) + v
        col[b] = col.get(b, 0) + v
    assert len(got) == len(trans)
    for r in got.itertuples():
        k = (int(r.cell_from), int(r.cell_to))
        assert int(r.n) == trans[k]
        assert int(r.row_n) == row[k[0]]
        assert int(r.col_n) == col[k[1]]
        assert r.ratio == float(trans[k] * total) / float(
            row[k[0]] * col[k[1]])
    # margins are conserved: sum over ratios weighted by expectation == total
    assert int(got["n"].sum()) == total

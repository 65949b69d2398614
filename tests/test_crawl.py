import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _reference_schedule(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Independent row-at-a-time reference: full rank + full sort."""
    df = df.copy()
    df["wave"] = (df.sort_values(["priority", "id"],
                                 ascending=[False, True])
                  .groupby("domain").cumcount() + 1)
    # pandas cumcount follows the frame's row order, not the sort above —
    # recompute properly per group
    waves = []
    for _, g in df.groupby("domain"):
        order = np.lexsort((g["id"].to_numpy(), -g["priority"].to_numpy()))
        w = np.empty(len(g), dtype=np.int64)
        w[order] = np.arange(1, len(g) + 1)
        waves.append(pd.Series(w, index=g.index))
    df["wave"] = pd.concat(waves)
    df = df.sort_values(["wave", "domain", "id"]).head(k).reset_index(drop=True)
    df["schedule_pos"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["schedule_pos", "wave", "domain", "id"]]


def test_crawl_order_matches_reference(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.crawl import crawl_order

    rng = np.random.default_rng(17)
    n = 3000
    df = pd.DataFrame({
        "domain": [f"d{i}" for i in rng.integers(0, 40, n)],
        "id": np.arange(n, dtype=np.int64),
        "priority": rng.integers(0, 50, n).astype(np.int64),  # heavy ties
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(7)
    got = crawl_order(ds, domain="domain", id_col="id",
                      priority="priority", k=137)
    expect = _reference_schedule(df, 137)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), expect)


def test_crawl_order_round_robin_property(ray_session):
    """Within the first n_domains positions every domain appears at most
    once (the politeness property)."""
    import ray.data as rd

    from fast_carpenter_ray.stages.crawl import crawl_order

    rng = np.random.default_rng(29)
    n = 500
    nd = 10
    df = pd.DataFrame({
        "domain": [f"h{i}" for i in rng.integers(0, nd, n)],
        "id": np.arange(n, dtype=np.int64),
        "priority": rng.integers(0, 1000, n).astype(np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    got = crawl_order(ds, domain="domain", id_col="id",
                      priority="priority", k=nd)
    assert got["domain"].nunique() == nd  # wave 1 = one page per domain
    assert (got["wave"] == 1).all()


def test_crawl_order_validates(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.crawl import crawl_order

    ds = rd.from_arrow(pa.table({"domain": ["a"], "id": [1], "priority": [1]}))
    with pytest.raises(ValueError):
        crawl_order(ds, domain="domain", id_col="id", priority="priority", k=0)

"""As-of join, session windows, IVF ANN — custom-operator correctness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages import asof_join, ivf_topk, session_windows
from fast_carpenter_ray.stages.ann import ann_topk, train_centroids


def _streams():
    """Deterministic two-stream fixture: keys with interleaved, missing
    and empty right sides."""
    rng = np.random.default_rng(7)
    n_l, n_r = 300, 200
    left = pa.table({
        "k": pa.array(rng.integers(0, 12, n_l), type=pa.int64()),
        "t": pa.array(np.sort(rng.integers(0, 10_000, n_l)), type=pa.int64()),
        "lv": rng.standard_normal(n_l),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 10, n_r), type=pa.int64()),  # keys 10,11 unmatched
        "t": pa.array(np.sort(rng.integers(0, 10_000, n_r)), type=pa.int64()),
        "rv": rng.standard_normal(n_r),
    })
    return left, right


def _pandas_asof(left, right, how):
    l = left.to_pandas().sort_values("t", kind="stable")
    r = right.to_pandas().sort_values("t", kind="stable")
    out = pd.merge_asof(l, r, on="t", by="k", direction="backward",
                        suffixes=("", "_r"))
    # pd.merge_asof keeps right's t implicit; reconstruct t_r via a second asof
    rr = r.rename(columns={"t": "t_r_src"})
    out2 = pd.merge_asof(l, rr.assign(t=rr["t_r_src"]), on="t", by="k",
                         direction="backward")
    out["t_r"] = out2["t_r_src"]
    if how == "inner":
        out = out[out["rv"].notna()]
    return out


@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_join_matches_pandas(ray_session, how):
    import ray.data as rd

    left, right = _streams()
    got = asof_join(rd.from_arrow(left).repartition(4),
                    rd.from_arrow(right).repartition(3),
                    on="t", by="k", how=how).to_pandas()
    exp = _pandas_asof(left, right, how)
    g = got.sort_values(["k", "t", "lv"]).reset_index(drop=True)
    e = exp.sort_values(["k", "t", "lv"]).reset_index(drop=True)
    assert len(g) == len(e)
    np.testing.assert_array_equal(g["k"], e["k"])
    np.testing.assert_array_equal(g["t"], e["t"])
    np.testing.assert_allclose(g["lv"], e["lv"])
    np.testing.assert_allclose(g["rv_r"].astype(float), e["rv"].astype(float))
    np.testing.assert_allclose(g["t_r"].astype(float), e["t_r"].astype(float))


def test_asof_join_rejects_bad_how(ray_session):
    import ray.data as rd

    left, right = _streams()
    with pytest.raises(ValueError, match="unknown how"):
        asof_join(rd.from_arrow(left), rd.from_arrow(right),
                  on="t", by="k", how="outer")


def _sessions_pandas(df, gap):
    out = []
    for k, g in df.sort_values("t").groupby("k"):
        t = g["t"].to_numpy()
        new = np.ones(len(t), dtype=int)
        new[1:] = (np.diff(t) > gap).astype(int)
        sid = np.cumsum(new)
        for s in np.unique(sid):
            sel = sid == s
            out.append({"k": k, "session_start": int(t[sel].min()),
                        "n": int(sel.sum()),
                        "sum_v": float(g["v"].to_numpy()[sel].sum())})
    return pd.DataFrame(out).sort_values(["k", "session_start"]).reset_index(drop=True)


def test_session_windows_match_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 8, n).astype(np.int64),
        "t": rng.integers(0, 100_000, n).astype(np.int64),
        "v": rng.standard_normal(n),
    }).drop_duplicates(["k", "t"])
    ds = rd.from_pandas(df.rename(columns={"t": "ts", "v": "value", "k": "user_id"})).repartition(4)
    got = session_windows(ds, key="user_id", ts="ts", gap_us=5_000,
                          value="value").to_pandas()
    got = got.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    exp = _sessions_pandas(df, 5_000)
    np.testing.assert_array_equal(got["user_id"], exp["k"])
    np.testing.assert_array_equal(got["session_start"], exp["session_start"])
    np.testing.assert_array_equal(got["n"], exp["n"])
    np.testing.assert_allclose(got["sum_value"], exp["sum_v"])


def _emb_queries(sf_dir):
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qtab = emb.filter(pa.compute.less(emb["vec_id"], 10))
    return {
        "id": qtab["vec_id"].to_numpy(zero_copy_only=False),
        "matrix": np.stack([np.asarray(v, dtype=np.float64)
                            for v in qtab["embedding"].to_pylist()]),
    }


def test_ivf_full_probe_equals_bruteforce(ray_session, sf_dir):
    """nprobe == n_centroids scans every list — the IVF machinery must
    then reproduce the exact brute-force ranking bit-for-bit."""
    import ray.data as rd

    queries = _emb_queries(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = ann_topk(ds, queries, k=5).to_pandas()
    ivf = ivf_topk(ds, queries, k=5, n_centroids=8, nprobe=8).to_pandas()
    e = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    g = ivf.sort_values(["query_id", "rank"]).reset_index(drop=True)
    np.testing.assert_array_equal(g["neighbor_id"], e["neighbor_id"])
    np.testing.assert_allclose(g["cosine"], e["cosine"], rtol=1e-12)


def test_ivf_partial_probe_recall(ray_session, sf_dir):
    """nprobe < n_centroids is approximate by construction; recall@5 must
    stay useful (pinned conservative bound on the fixture)."""
    import ray.data as rd

    queries = _emb_queries(sf_dir)
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = ann_topk(ds, queries, k=5).to_pandas()
    ivf = ivf_topk(ds, queries, k=5, n_centroids=16, nprobe=8).to_pandas()
    hits = 0
    for qid in np.unique(exact["query_id"]):
        truth = set(exact[exact["query_id"] == qid]["neighbor_id"])
        got = set(ivf[ivf["query_id"] == qid]["neighbor_id"])
        hits += len(truth & got)
    recall = hits / len(exact)
    assert recall >= 0.5, f"recall@5 {recall:.2f} below bound"


def test_train_centroids_deterministic():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((256, 16))
    a = train_centroids(m, 8, seed=1)
    b = train_centroids(m, 8, seed=1)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (8, 16)
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-9)


def _hops_brute(t, v, width, slide):
    rows = {}
    for ti, vi in zip(t, v):
        hi = ti // slide
        lo = (ti - width) // slide + 1
        for w in range(lo, hi + 1):
            n, s = rows.get(w, (0, 0.0))
            rows[w] = (n + 1, s + vi)
    return rows


def test_hop_windows_match_brute(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import hop_windows

    rng = np.random.default_rng(13)
    n = 400
    t = rng.integers(0, 100_000, n).astype(np.int64)
    v = rng.standard_normal(n)
    ds = rd.from_arrow(pa.table({"ts": t, "value": v})).repartition(4)
    got = hop_windows(ds, ts="ts", width_us=30_000, slide_us=10_000,
                      mode="hash").to_pandas()
    got = got.sort_values("win").reset_index(drop=True)
    exp = _hops_brute(t, v, 30_000, 10_000)
    assert got["win"].tolist() == sorted(exp)
    for _, r in got.iterrows():
        en, es = exp[r["win"]]
        assert r["n"] == en
        np.testing.assert_allclose(r["sum_value"], es)
        assert r["window_start"] == r["win"] * 10_000


def test_hop_windows_rejects_bad_width(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import hop_windows

    ds = rd.from_arrow(pa.table({"ts": [1], "value": [1.0]}))
    with pytest.raises(ValueError, match="multiple"):
        hop_windows(ds, width_us=25_000, slide_us=10_000)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_join_bucketed_equals_flat(ray_session, how):
    """The bucketed (hot-key-safe) as-of join must reproduce the flat
    one-task-per-key result exactly — including across-bucket matches
    (bucket width chosen so most matches cross bucket boundaries)."""
    import ray.data as rd

    from fast_carpenter_ray.stages.asof_join import asof_join_bucketed

    left, right = _streams()
    flat = asof_join(rd.from_arrow(left).repartition(4),
                     rd.from_arrow(right).repartition(3),
                     on="t", by="k", how=how).to_pandas()
    buck = asof_join_bucketed(rd.from_arrow(left).repartition(4),
                              rd.from_arrow(right).repartition(3),
                              on="t", by="k", bucket_width=500,
                              how=how).to_pandas()
    f = flat.sort_values(["k", "t", "lv"]).reset_index(drop=True)
    b = buck.sort_values(["k", "t", "lv"]).reset_index(drop=True)
    assert len(f) == len(b)
    np.testing.assert_array_equal(b["k"], f["k"])
    np.testing.assert_array_equal(b["t"], f["t"])
    np.testing.assert_allclose(b["lv"], f["lv"])
    np.testing.assert_allclose(b["t_r"].astype(float), f["t_r"].astype(float))
    np.testing.assert_allclose(b["rv_r"].astype(float), f["rv_r"].astype(float))


def test_asof_join_bucketed_tiny_buckets(ray_session):
    """Degenerate bucket width (1 unit: every row its own bucket) forces
    every match through the carry path."""
    import ray.data as rd

    from fast_carpenter_ray.stages.asof_join import asof_join_bucketed

    left = pa.table({"k": pa.array([1, 1, 2], type=pa.int64()),
                     "t": pa.array([10, 50, 10], type=pa.int64()),
                     "lv": [1.0, 2.0, 3.0]})
    right = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                      "t": pa.array([5, 40], type=pa.int64()),
                      "rv": [0.5, 0.9]})
    got = asof_join_bucketed(rd.from_arrow(left), rd.from_arrow(right),
                             on="t", by="k", bucket_width=1,
                             how="left").to_pandas()
    got = got.sort_values(["k", "t"]).reset_index(drop=True)
    assert got["t_r"].tolist()[:2] == [5, 40]
    assert bool(pd.isna(got["t_r"].iloc[2]))
    with pytest.raises(ValueError, match="bucket_width"):
        asof_join_bucketed(rd.from_arrow(left), rd.from_arrow(right),
                           on="t", by="k", bucket_width=0)


@pytest.mark.parametrize("bucket_width", [7_000, 1_000])
def test_session_windows_bucketed_equals_flat(ray_session, bucket_width):
    """Bucketed sessionization (local sessions + summary merge) must equal
    the flat one-task-per-key result, including sessions spanning many
    buckets (width 1000 < gap 5000 forces heavy cross-bucket merging)."""
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import session_windows_bucketed

    rng = np.random.default_rng(29)
    n = 600
    df = pd.DataFrame({
        "user_id": rng.integers(0, 6, n).astype(np.int64),
        "ts": rng.integers(0, 80_000, n).astype(np.int64),
        "value": rng.standard_normal(n),
    }).drop_duplicates(["user_id", "ts"])
    ds = rd.from_pandas(df).repartition(4)
    flat = session_windows(ds, gap_us=5_000).to_pandas()
    buck = session_windows_bucketed(ds, gap_us=5_000,
                                    bucket_width=bucket_width).to_pandas()
    f = flat.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    b = buck.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(f) == len(b)
    np.testing.assert_array_equal(b["user_id"], f["user_id"])
    np.testing.assert_array_equal(b["session_start"], f["session_start"])
    np.testing.assert_array_equal(b["n"], f["n"])
    np.testing.assert_allclose(b["sum_value"], f["sum_value"])


def test_funnel_matches_brute(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import funnel

    rng = np.random.default_rng(59)
    n = 1200
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": rng.integers(0, 100_000, n).astype(np.int64),
        "event_type": rng.choice(["view", "click", "purchase", "other"], n),
    })
    steps = ["view", "click", "purchase"]
    got = funnel(rd.from_pandas(df).repartition(4), steps)

    exp = [0, 0, 0]
    for _, g in df.groupby("user_id"):
        cutoff = -np.inf
        for i, s in enumerate(steps):
            t = g.loc[(g["event_type"] == s) & (g["ts"] > cutoff), "ts"]
            if t.empty:
                break
            cutoff = t.min()
            exp[i] += 1
    assert got["n_keys"].tolist() == exp
    assert got["step_name"].tolist() == steps
    with pytest.raises(ValueError, match="steps"):
        funnel(rd.from_pandas(df), ["view"])


def _wf_events(seed=83, n=800, keys=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "user_id": rng.integers(0, keys, n).astype(np.int64),
        "ts": rng.integers(0, 90_000, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.standard_normal(n) * 5,
    })


def _wf_brute(df):
    g = df.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
    g["_v"] = np.floor(g["value"].to_numpy() * 64).astype(np.int64)
    grp = g.groupby("user_id", sort=False)
    g["rn"] = grp.cumcount().to_numpy() + 1
    g["running_v"] = grp["_v"].cumsum().to_numpy()
    g["gap_us"] = grp["ts"].diff().fillna(-1).astype(np.int64).to_numpy()
    return g[["user_id", "event_id", "rn", "running_v", "gap_us"]]


def test_window_funcs_match_pandas(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import window_funcs

    df = _wf_events()
    got = (window_funcs(rd.from_pandas(df).repartition(5), key="user_id",
                        ts="ts", id_col="event_id", value="value")
           .to_pandas().sort_values(["user_id", "rn"]).reset_index(drop=True))
    exp = _wf_brute(df).sort_values(["user_id", "rn"]).reset_index(drop=True)
    assert len(got) == len(df)
    for c in ["user_id", "event_id", "rn", "running_v", "gap_us"]:
        np.testing.assert_array_equal(got[c].to_numpy().astype(np.int64),
                                      exp[c].to_numpy(), err_msg=c)


@pytest.mark.parametrize("bucket_width", [30_000, 1_000, 1])
def test_window_funcs_bucketed_equals_flat(ray_session, bucket_width):
    """Bucketed rank/cumsum/gap must equal the flat operator bit-for-bit,
    including width 1 (every event its own bucket: every rank, running
    sum and gap flows through the offsets carry)."""
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import (window_funcs,
                                                   window_funcs_bucketed)

    df = _wf_events(seed=101, n=500, keys=5)
    # make (user_id, ts) unique so the (ts, event_id) order is unambiguous
    # across bucket boundaries for the gap check
    ds = rd.from_pandas(df).repartition(4)
    flat = (window_funcs(ds, key="user_id", ts="ts", id_col="event_id",
                         value="value")
            .to_pandas().sort_values(["user_id", "rn"]).reset_index(drop=True))
    buck = (window_funcs_bucketed(ds, key="user_id", ts="ts",
                                  id_col="event_id", value="value",
                                  bucket_width=bucket_width)
            .to_pandas().sort_values(["user_id", "rn"]).reset_index(drop=True))
    assert len(flat) == len(buck)
    for c in ["user_id", "event_id", "rn", "running_v", "gap_us"]:
        np.testing.assert_array_equal(buck[c].to_numpy().astype(np.int64),
                                      flat[c].to_numpy().astype(np.int64),
                                      err_msg=c)


def test_window_funcs_rejects_bad_scale(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import window_funcs

    with pytest.raises(ValueError, match="power of two"):
        window_funcs(rd.from_pandas(_wf_events(n=10)), scale=48)


def test_ewma_matches_sequential_scan(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import ewma

    rng = np.random.default_rng(71)
    n = 900
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "ts": rng.integers(0, 10**7, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "value": rng.normal(50, 10, n),
    })
    got = (ewma(rd.from_pandas(df).repartition(5), alpha=0.3)
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    for _, row in got.iterrows():
        g = df[df["user_id"] == row["user_id"]].sort_values(
            ["ts", "event_id"], kind="stable")
        e = None
        for x in g["value"]:
            e = x if e is None else 0.3 * x + 0.7 * e
        assert row["ewma"] == pytest.approx(e, abs=1e-9)
        assert row["n"] == len(g)


def test_window_funcs_bucketed_negative_ts_gap(ray_session):
    """A negative timestamp in an earlier bucket must carry as the true
    previous-event time, not the 'no earlier bucket' sentinel (the old
    -1 sentinel conflated the two when ts < 0)."""
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import (window_funcs,
                                                   window_funcs_bucketed)

    tab = pa.table({
        "user_id": pa.array([1, 1, 2], type=pa.int64()),
        "event_id": pa.array([10, 11, 12], type=pa.int64()),
        "ts": pa.array([-5, 100, 7], type=pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0]),
    })
    ds = rd.from_arrow(tab).repartition(2)
    flat = (window_funcs(ds).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    buck = (window_funcs_bucketed(ds, bucket_width=10).to_pandas()
            .sort_values("event_id").reset_index(drop=True))
    assert flat["gap_us"].tolist() == [-1, 105, -1]
    for c in ["user_id", "event_id", "rn", "running_v", "gap_us"]:
        np.testing.assert_array_equal(buck[c].to_numpy().astype(np.int64),
                                      flat[c].to_numpy().astype(np.int64))


def test_asof_join_tied_right_rows_deterministic(ray_session):
    """ADVICE r2: multiple right rows sharing one 'on' value within a key
    must resolve to a data-determined row (the payload-max of the tied
    set) on BOTH the flat and the bucketed path, on any partitioning."""
    import ray.data as rd

    from fast_carpenter_ray.stages.asof_join import asof_join_bucketed

    left = pa.table({"k": pa.array([1, 1, 2], type=pa.int64()),
                     "t": pa.array([10, 20, 10], type=pa.int64()),
                     "lv": pa.array([100, 200, 300], type=pa.int64())})
    # key 1 has THREE right rows tied at t=5; payload-max is pv=9
    right = pa.table({"k": pa.array([1, 1, 1, 2], type=pa.int64()),
                      "t": pa.array([5, 5, 5, 4], type=pa.int64()),
                      "pv": pa.array([7, 9, 3, 1], type=pa.int64())})
    for rep in (1, 3, 5):
        got = (asof_join(rd.from_arrow(left).repartition(rep),
                         rd.from_arrow(right).repartition(rep),
                         on="t", by="k", how="inner").to_pandas()
               .sort_values(["k", "t"]).reset_index(drop=True))
        assert got["pv_r"].tolist() == [9, 9, 1]
        gotb = (asof_join_bucketed(rd.from_arrow(left).repartition(rep),
                                   rd.from_arrow(right).repartition(rep),
                                   on="t", by="k", bucket_width=7,
                                   how="inner").to_pandas()
                .sort_values(["k", "t"]).reset_index(drop=True))
        assert gotb["pv_r"].tolist() == [9, 9, 1]


def test_ivf_index_prunes_blocks_and_full_probe_exact(ray_session, sf_dir, tmp_path):
    """build_ivf_index writes a centroid-partitioned layout; ivf_search
    reads strictly fewer files at partial probe and reproduces the exact
    brute-force ranking at full probe (round-2 verdict #4)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from fast_carpenter_ray.stages.ann import (ann_topk, build_ivf_index,
                                               ivf_search)

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    qtab = emb.filter(pa.compute.less(emb["vec_id"], 5))
    queries = {"id": qtab["vec_id"].to_numpy(zero_copy_only=False),
               "matrix": np.stack([np.asarray(v, dtype=np.float64)
                                   for v in qtab["embedding"].to_pylist()])}
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, n_centroids=8)
    part, pstats = ivf_search(idx, queries, k=5, nprobe=2)
    assert pstats["files_read"] < pstats["files_total"]
    assert pstats["cells_probed"] < pstats["cells_total"]
    full, fstats = ivf_search(idx, queries, k=5, nprobe=8)
    assert fstats["files_read"] == fstats["files_total"]
    bf = (ann_topk(ds, queries, k=5).to_pandas()
          .sort_values(["query_id", "rank"]).reset_index(drop=True))
    fu = (full.to_pandas()
          .sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        fu[["query_id", "neighbor_id", "rank"]],
        bf[["query_id", "neighbor_id", "rank"]])


def _events_tbl(rows):
    import pyarrow as pa
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.int64()),
        "event_id": pa.array(list(range(len(rows))), type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows], type=pa.string()),
    }))


def test_transitions_counts(ray_session):
    from fast_carpenter_ray.stages.windows import transitions
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 10, "view"), (2, 20, "click"),
        (3, 5, "view"),            # single event: no transition
    ]
    out = transitions(_events_tbl(rows)).set_index(["prev_type", "next_type"])
    assert out.loc[("view", "click"), "n"] == 2
    assert out.loc[("click", "purchase"), "n"] == 1
    assert len(out) == 2


def test_transitions_tie_breaks_by_order_col(ray_session):
    from fast_carpenter_ray.stages.windows import transitions
    # two events at the SAME timestamp: event_id orders them
    rows = [(1, 10, "a"), (1, 10, "b"), (1, 20, "c")]
    out = transitions(_events_tbl(rows)).set_index(["prev_type", "next_type"])
    assert out.loc[("a", "b"), "n"] == 1
    assert out.loc[("b", "c"), "n"] == 1


def test_transitions_users_do_not_bridge(ray_session):
    from fast_carpenter_ray.stages.windows import transitions
    rows = [(1, 10, "a"), (2, 20, "b"), (1, 30, "c"), (2, 40, "d")]
    out = transitions(_events_tbl(rows))
    got = set(zip(out["prev_type"], out["next_type"]))
    assert got == {("a", "c"), ("b", "d")}


def test_cusum_changepoint_planted(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import cusum_changepoints

    # user 1: level shift 0 -> 10 after position 6 of 10; CUSUM peaks
    # exactly at the shift boundary
    vals = [0.0] * 6 + [10.0] * 4
    n = len(vals)
    t = pa.table({
        "user_id": pa.array([1] * n + [2] * 3, type=pa.int64()),
        "ts": pa.array(np.arange(n + 3), type=pa.int64()),
        "event_id": pa.array(np.arange(n + 3), type=pa.int64()),
        "value": pa.array(vals + [5.0, 5.0, 5.0], type=pa.float64()),
    })
    out = cusum_changepoints(rd.from_arrow(t).repartition(2)).to_pandas()
    out = out.set_index("user_id")
    assert out.loc[1, "change_idx"] == 6
    # D_6 = n*cs_6 - 6*total = 10*0 - 6*(4*640) = 15360
    assert out.loc[1, "d_max"] == 6 * 4 * 640
    # constant series: every deviation is exactly 0, earliest index wins
    assert out.loc[2, "d_max"] == 0 and out.loc[2, "change_idx"] == 1


def test_cusum_matches_brute(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import cusum_changepoints

    rng = np.random.default_rng(3)
    n = 200
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 7, n), type=pa.int64()),
        "ts": pa.array(rng.integers(0, 10**6, n), type=pa.int64()),
        "event_id": pa.array(np.arange(n), type=pa.int64()),
        "value": pa.array(rng.uniform(-50, 50, n), type=pa.float64()),
    })
    out = cusum_changepoints(rd.from_arrow(t).repartition(3)).to_pandas()
    df = t.to_pandas()
    df["x"] = np.floor(df["value"] * 64).astype(np.int64)
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        cs = g["x"].cumsum().to_numpy()
        m = len(cs)
        d = np.abs(m * cs - np.arange(1, m + 1) * cs[-1])
        row = out[out["user_id"] == uid].iloc[0]
        assert row["n"] == m
        assert row["d_max"] == d.max()
        assert row["change_idx"] == int(np.argmax(d)) + 1


def test_rolling_median_counts_planted(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import rolling_median_counts

    # type 'a': one event in bucket 0, three in bucket 1, one in 2,
    # nine in 3 — counts [1, 3, 1, 9]
    buckets = [0] + [1] * 3 + [2] + [3] * 9
    t = pa.table({
        "event_type": pa.array(["a"] * len(buckets)),
        "ts": pa.array(np.array(buckets, dtype=np.int64) * 100 + 5),
    })
    out = rolling_median_counts(rd.from_arrow(t).repartition(2),
                                bucket_us=100, window=4).to_pandas()
    out = out.sort_values("bucket")
    assert out["n"].tolist() == [1, 3, 1, 9]
    # trailing window medians: [1], [1,3]->2.0, [1,3,1]->1, [1,3,1,9]->2.0
    assert out["med"].tolist() == [1.0, 2.0, 1.0, 2.0]


def test_rolling_median_counts_partial_windows(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.windows import rolling_median_counts

    rng = np.random.default_rng(14)
    n = 500
    t = pa.table({
        "event_type": pa.array(rng.choice(["x", "y"], n)),
        "ts": pa.array(rng.integers(0, 40, n) * 1000 + 1),
    })
    out = rolling_median_counts(rd.from_arrow(t).repartition(3),
                                bucket_us=1000, window=4).to_pandas()
    import pandas as pd

    df = t.to_pandas()
    df["bucket"] = df["ts"] // 1000
    for k, g in df.groupby("event_type"):
        cnt = g.groupby("bucket").size().sort_index()
        want = cnt.rolling(4, min_periods=1).median().to_numpy()
        got = out[out["event_type"] == k].sort_values("bucket")
        np.testing.assert_array_equal(got["n"].to_numpy(), cnt.to_numpy())
        np.testing.assert_array_equal(got["med"].to_numpy(), want)

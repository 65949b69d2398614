import numpy as np
import pyarrow as pa

from fast_carpenter_ray.stages.bots import bot_scores


def _events(uid_ts):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "user_id": pa.array([u for u, _ in uid_ts], type=pa.int64()),
        "ts": pa.array([t for _, t in uid_ts], type=pa.int64()),
        "event_id": pa.array(np.arange(len(uid_ts)), type=pa.int64()),
    })).repartition(3)


def test_bot_scores_planted(ray_session):
    us = 1_000_000
    rows = []
    # user 1: a metronome bot — 60 events exactly 10 s apart
    rows += [(1, i * 10 * us) for i in range(60)]
    # user 2: high volume but human-irregular gaps (1s..2000s spread)
    rng = np.random.default_rng(4)
    t = np.cumsum(rng.integers(1, 2000, 60)) * us
    rows += [(2, int(x)) for x in t]
    # user 3: regular but low volume
    rows += [(3, i * 5 * us) for i in range(10)]
    out = bot_scores(_events(rows), rate_threshold=50).to_pandas()
    out = out.set_index("user_id")
    assert out.loc[1, "is_bot"] == 1
    assert out.loc[1, "high_rate"] == 1 and out.loc[1, "regular"] == 1
    # perfectly regular: variance numerator exactly 0
    m, sg, sg2 = 59, 59 * 10, 59 * 100
    assert out.loc[1, "sum_gap"] == sg and out.loc[1, "sum_gap2"] == sg2
    assert m * sg2 - sg * sg == 0
    assert out.loc[2, "high_rate"] == 1 and out.loc[2, "is_bot"] == 0
    assert out.loc[3, "regular"] == 1 and out.loc[3, "is_bot"] == 0


def test_bot_scores_single_event_user(ray_session):
    out = bot_scores(_events([(7, 123_000_000)])).to_pandas()
    row = out.iloc[0]
    assert row["n"] == 1 and row["sum_gap"] == 0
    assert row["regular"] == 0 and row["is_bot"] == 0


def test_bot_scores_matches_brute(ray_session):
    rng = np.random.default_rng(6)
    n = 300
    rows = [(int(u), int(t)) for u, t in zip(
        rng.integers(0, 8, n), rng.integers(0, 10**9, n) * 1000)]
    out = bot_scores(_events(rows), rate_threshold=30).to_pandas()
    import pandas as pd

    df = pd.DataFrame(rows, columns=["u", "t"])
    df["eid"] = np.arange(n)
    for uid, g in df.groupby("u"):
        g = g.sort_values(["t", "eid"])
        gaps = np.diff(g["t"].to_numpy()) // 1_000_000
        m, sg, sg2 = len(gaps), gaps.sum(), (gaps * gaps).sum()
        row = out[out["user_id"] == uid].iloc[0]
        assert row["n"] == len(g)
        assert row["sum_gap"] == sg and row["sum_gap2"] == sg2
        want_reg = int(m >= 3 and sg > 0 and (m * sg2 - sg * sg) * 10 < sg * sg)
        assert row["regular"] == want_reg
        assert row["is_bot"] == int(want_reg and len(g) >= 30)


def test_burstiness_metronome_and_bursty(ray_session):
    from fast_carpenter_ray.stages.bots import burstiness

    us = 1_000_000
    rows = [(1, i * 10 * us) for i in range(20)]          # metronome
    rows += [(2, 0), (2, 1 * us), (2, 2 * us), (2, 3600 * us)]  # bursty
    out = burstiness(_events(rows)).to_pandas().set_index("user_id")
    # metronome: V = 0 -> B = (0 - sg)/(0 + sg) = -1 exactly
    assert out.loc[1, "burstiness"] == -1.0
    # bursty user: B > 0 (σ exceeds μ)
    assert out.loc[2, "burstiness"] > 0.0
    # hand-check user 2: gaps [1, 1, 3598]
    m, sg, sg2 = 3, 3600, 1 + 1 + 3598 * 3598
    v = m * sg2 - sg * sg
    want = (np.sqrt(float(v)) - sg) / (np.sqrt(float(v)) + sg)
    assert out.loc[2, "burstiness"] == want


def test_burstiness_skips_degenerate(ray_session):
    from fast_carpenter_ray.stages.bots import burstiness

    # one gap only, and a zero-total-gap user: both dropped
    rows = [(1, 0), (1, 5_000_000), (2, 7), (2, 7), (2, 7)]
    out = burstiness(_events(rows)).to_pandas()
    assert len(out) == 0

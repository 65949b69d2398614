"""hash_sample, group_topk, vocab_count — correctness vs local compute."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.sample import group_topk, hash_sample, sample_sql
from fast_carpenter_ray.stages.text import vocab_count


def test_hash_sample_deterministic_and_fractional(ray_session):
    import ray.data as rd

    ids = np.arange(10_000, dtype=np.int64)
    tab = pa.table({"doc_id": ids})
    ds = rd.from_arrow(tab).repartition(4)
    a = hash_sample(ds, "doc_id", 0.25).to_pandas()
    b = hash_sample(rd.from_arrow(tab).repartition(7), "doc_id", 0.25).to_pandas()
    # identical row set regardless of partitioning (determinism / resume)
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    assert abs(len(a) / len(ids) - 0.25) < 0.02
    # different seed -> different sample
    c = hash_sample(ds, "doc_id", 0.25, seed=99).to_pandas()
    assert sorted(c["doc_id"]) != sorted(a["doc_id"])
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(ds, "doc_id", 1.5)


def test_hash_sample_matches_sql_predicate(ray_session):
    import duckdb
    import ray.data as rd

    ids = np.arange(5_000, dtype=np.int64)
    got = hash_sample(rd.from_arrow(pa.table({"doc_id": ids})), "doc_id",
                      0.1).to_pandas()
    exp = duckdb.sql(
        f"SELECT i AS doc_id FROM range(5000) t(i) WHERE {sample_sql('i', 0.1)}"
    ).fetchdf()
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])


def test_group_topk_matches_pandas(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    n = 2_000
    df = pd.DataFrame({
        "g": rng.integers(0, 12, n).astype(np.int64),
        "score": rng.integers(0, 500, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
        "payload": rng.standard_normal(n),
    })
    ds = rd.from_pandas(df).repartition(6)
    got = group_topk(ds, group="g", order_by="score", k=4,
                     tie_break="id").to_pandas()
    got = got.sort_values(["g", "rank"]).reset_index(drop=True)

    exp_rows = []
    for g, sub in df.groupby("g"):
        top = sub.sort_values(["score", "id"], ascending=False).head(4)
        top = top.copy()
        top["rank"] = np.arange(1, len(top) + 1)
        exp_rows.append(top)
    exp = (pd.concat(exp_rows).sort_values(["g", "rank"])
           .reset_index(drop=True))
    np.testing.assert_array_equal(got["g"], exp["g"])
    np.testing.assert_array_equal(got["id"], exp["id"])
    np.testing.assert_array_equal(got["score"], exp["score"])
    np.testing.assert_array_equal(got["rank"], exp["rank"])


def test_group_topk_partial_bounds_rows(ray_session):
    """The partial stage emits at most k rows per group per block."""
    import ray.data as rd

    df = pd.DataFrame({"g": np.zeros(1000, dtype=np.int64),
                       "score": np.arange(1000, dtype=np.int64)})
    ds = rd.from_pandas(df).repartition(1)
    got = group_topk(ds, group="g", order_by="score", k=3).to_pandas()
    assert len(got) == 3
    assert got["score"].tolist() == [999, 998, 997]


def test_vocab_count_matches_local(ray_session):
    import ray.data as rd

    texts = ["the cat sat", "the dog\tsat  down", "", "cat cat dog", None]
    tab = pa.table({"text": pa.array(texts, type=pa.string())})
    got = vocab_count(rd.from_arrow(tab).repartition(3)).to_pandas()
    got = got.sort_values("token").reset_index(drop=True)
    exp = {"the": 2, "cat": 3, "sat": 2, "dog": 2, "down": 1}
    assert dict(zip(got["token"], got["n"])) == exp

    got2 = vocab_count(rd.from_arrow(tab), min_count=2).to_pandas()
    assert set(got2["token"]) == {"the", "cat", "sat", "dog"}


def test_profile_columns_matches_local(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.profile import profile_columns

    rng = np.random.default_rng(23)
    v = rng.standard_normal(500)
    v[::7] = np.nan
    tab = pa.table({"a": pa.array(np.arange(500), type=pa.int64()), "b": v})
    got = profile_columns(rd.from_arrow(tab).repartition(5)).to_pandas()
    got = got.set_index("column")
    assert got.loc["a", "n"] == 500 and got.loc["a", "n_null"] == 0
    assert got.loc["a", "min"] == 0.0 and got.loc["a", "max"] == 499.0
    assert got.loc["a", "sum"] == float(np.arange(500).sum())
    ok = ~np.isnan(v)
    assert got.loc["b", "n_null"] == int((~ok).sum())
    np.testing.assert_allclose(got.loc["b", "min"], v[ok].min())
    np.testing.assert_allclose(got.loc["b", "max"], v[ok].max())
    np.testing.assert_allclose(got.loc["b", "sum"], v[ok].sum())


def test_profile_columns_rejects_non_numeric(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.profile import profile_columns

    tab = pa.table({"s": ["x", "y"]})
    with pytest.raises(ValueError, match="not numeric"):
        profile_columns(rd.from_arrow(tab))


def test_stratified_sample_per_group_fractions(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.sample import stratified_sample

    n = 30_000
    ids = np.arange(n, dtype=np.int64)
    groups = np.where(ids % 3 == 0, "a", np.where(ids % 3 == 1, "b", "c"))
    tab = pa.table({"id": ids, "g": groups})
    out = stratified_sample(rd.from_arrow(tab).repartition(5), "id", "g",
                            {"a": 0.5, "b": 0.1}, default=0.0).to_pandas()
    by = out.groupby("g").size()
    assert abs(by.get("a", 0) / 10_000 - 0.5) < 0.03
    assert abs(by.get("b", 0) / 10_000 - 0.1) < 0.03
    assert by.get("c", 0) == 0
    # deterministic across partitionings
    out2 = stratified_sample(rd.from_arrow(tab).repartition(11), "id", "g",
                             {"a": 0.5, "b": 0.1}, default=0.0).to_pandas()
    assert sorted(out["id"]) == sorted(out2["id"])
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(rd.from_arrow(tab), "id", "g", {"a": 2.0})


def test_count_distinct_matches_pandas(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.sample import count_distinct

    rng = np.random.default_rng(47)
    n = 5000
    df = pd.DataFrame({"g": rng.integers(0, 6, n).astype(np.int64),
                       "v": rng.integers(0, 200, n).astype(np.int64)})
    got = count_distinct(rd.from_pandas(df).repartition(5), "g", "v").to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    exp = df.groupby("g")["v"].nunique().reset_index(name="n_distinct")
    np.testing.assert_array_equal(got["g"], exp["g"])
    np.testing.assert_array_equal(got["n_distinct"], exp["n_distinct"])


def test_doc_frequency_matches_local(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.text import doc_frequency

    texts = ["cat cat dog", "dog bird", "cat", None, ""]
    tab = pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    got = doc_frequency(rd.from_arrow(tab).repartition(3)).to_pandas()
    exp = {"cat": 2, "dog": 2, "bird": 1}
    assert dict(zip(got["token"], got["df"])) == exp
    got2 = doc_frequency(rd.from_arrow(tab), min_df=2).to_pandas()
    assert set(got2["token"]) == {"cat", "dog"}


def test_hash_sample_no_overflow_for_huge_ids(ray_session):
    """ids above ~3.5e9 would wrap id*A in int64; the reduced-multiply
    hash must stay exact and match the SQL predicate."""
    import duckdb
    import ray.data as rd

    ids = np.array([4_000_000_000, 2**62, 2**62 + 123457], dtype=np.int64)
    got = hash_sample(rd.from_arrow(pa.table({"doc_id": ids})), "doc_id",
                      0.5).to_pandas()
    exp = duckdb.sql(
        "SELECT doc_id FROM (VALUES (CAST(4000000000 AS BIGINT)), "
        f"(CAST({2**62} AS BIGINT)), (CAST({2**62+123457} AS BIGINT))) "
        f"t(doc_id) WHERE {sample_sql('doc_id', 0.5)}").fetchdf()
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])


def test_weighted_sample_probability_scales_with_weight(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.sample import weighted_sample

    n = 200_000
    ids = np.arange(n, dtype=np.int64)
    # half the rows weight 1/4, half weight 1: keep rates should differ 4x
    w = np.where(ids % 2 == 0, 0.25, 1.0)
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids),
                                 "weight": pa.array(w)})).repartition(4)
    out = weighted_sample(ds, "doc_id", "weight", rate=0.5).to_pandas()
    lo = (out["doc_id"] % 2 == 0).sum()
    hi = (out["doc_id"] % 2 == 1).sum()
    assert abs(lo / (n / 2) - 0.125) < 0.01
    assert abs(hi / (n / 2) - 0.5) < 0.01
    # deterministic: same rows on a different partitioning
    out2 = weighted_sample(ds.repartition(7), "doc_id", "weight",
                           rate=0.5).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_weighted_sample_rate_caps_at_one(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.sample import weighted_sample

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(1000, dtype=np.int64)),
        "weight": pa.array(np.full(1000, 8.0))}))
    out = weighted_sample(ds, "doc_id", "weight", rate=1.0).to_pandas()
    assert len(out) == 1000  # min(1, 8) = always kept


def test_mix_hash_structured_ids_and_seed_independence():
    """ADVICE r2: ids structured mod 1e6 (e.g. microsecond timestamps on
    second boundaries) must NOT collapse onto one hash value, and
    different seeds must give near-independent samples."""
    import duckdb

    from fast_carpenter_ray.stages.sample import mix_hash, mix_hash_sql

    ids = (np.arange(5000, dtype=np.int64) * 1_000_000)  # all ≡ 0 mod 1e6
    h = mix_hash(ids)
    assert len(np.unique(h)) > 4900          # old affine hash: exactly 1
    frac = (h < 370_000).mean()
    assert 0.33 < frac < 0.41                # ~37% kept, not all-or-none
    # seeds decorrelate: overlap of two 37% samples ≈ 13.7%, not 37%
    h2 = mix_hash(ids, seed=1)
    both = ((h < 370_000) & (h2 < 370_000)).mean()
    assert 0.09 < both < 0.19
    # bit-exact vs the DuckDB replay
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS id",
                [[int(x) for x in ids[:500]]])
    got = [r[0] for r in con.execute(
        f"SELECT {mix_hash_sql('id', seed=3)} FROM t").fetchall()]
    np.testing.assert_array_equal(np.array(got), mix_hash(ids[:500], seed=3))

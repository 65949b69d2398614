import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.stages.dedup import (
    ExactDedup, MinHashDedup, SimHashDedup, ngram_jaccard, shingle_hashes)


def docs_with_dups():
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest to find some food for the winter")
    near = base.replace("quick", "swift").replace("winter", "cold season")
    other = ("completely different content about database engines and "
             "vectorized execution with arrow batches in a streaming pipeline")
    texts = [base, base, near, other, other, "tiny", base + " extended tail"]
    ids = list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})


def test_ngram_jaccard_basic():
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0
    j = ngram_jaccard("a b c d e f", "a b c d e g")
    assert 0.3 < j < 0.9


def test_shingles_deterministic():
    a = shingle_hashes("one two three four")
    b = shingle_hashes("one two three four")
    np.testing.assert_array_equal(a, b)
    assert len(a) == 2


def test_exact_dedup(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(docs_with_dups()).repartition(3)
    out = ExactDedup("d").apply(ds).to_pandas()
    # duplicates: (0,1) identical, (3,4) identical -> 5 survivors, min ids win
    assert sorted(out["doc_id"]) == [0, 2, 3, 5, 6]
    ids = ExactDedup("d").survivors(ds).to_pandas()
    assert sorted(ids["doc_id"]) == [0, 2, 3, 5, 6]


def test_minhash_estimates_jaccard():
    mh = MinHashDedup("m", num_perm=256, bands=32)
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    sa, sb = mh.signature(a), mh.signature(b)
    est = (sa == sb).mean()
    true = ngram_jaccard(a, b)
    assert abs(est - true) < 0.2


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(docs_with_dups()).repartition(3)
    mh = MinHashDedup("m", threshold=0.5)
    pairs = mh.candidate_pairs(ds).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in found          # identical pair
    assert (3, 4) in found          # identical pair
    assert (0, 2) in found or (1, 2) in found   # near pair
    assert not any({a, b} == {3, 5} for a, b in found)  # unrelated stay apart


def test_simhash_deterministic_and_close():
    s = SimHashDedup("s")
    a = s.simhash("the quick brown fox jumps over the lazy dog " * 3)
    b = s.simhash("the quick brown fox jumps over the lazy dog " * 3)
    assert a == b
    c = s.simhash("the quick brown fox jumps over the lazy cat " * 3)
    ham = bin(a ^ c).count("1")
    assert ham < 20  # similar docs have close fingerprints


def test_minhash_band_rows_are_slim():
    """The LSH shuffle rows must be (band_id, band_key, doc_id) — three
    small ints; the 128-element signature must NEVER enter the band
    shuffle (round-1 verdict: ~16 KB/doc shuffled across 16 bands)."""
    mh = MinHashDedup("m")
    batch = docs_with_dups()
    sigs = mh.signature_batch(batch)
    rows = mh.band_rows(sigs)
    assert set(rows.column_names) == {"band_id", "band_key", "doc_id"}
    assert rows.num_rows == len(batch) * mh.bands
    # every column fixed-width scalar: row cost is 4+8+8 bytes
    assert rows["band_id"].type == pa.int32()
    assert rows["band_key"].type == pa.int64()
    assert rows["doc_id"].type == pa.int64()
    # same text -> same band keys on every band (determinism across batches)
    rows2 = mh.band_rows(mh.signature_batch(batch))
    assert rows.equals(rows2)


def test_minhash_signature_universal_hash_exact():
    """(a*x + b) mod p must be computed exactly (no uint64 wrap before the
    reduction): cross-check the vectorized kernel against Python big-int
    arithmetic for every permutation."""
    mh = MinHashDedup("m", num_perm=16, bands=4)
    sh = shingle_hashes("the quick brown fox jumps over the lazy dog")
    sig = mh.signature("the quick brown fox jumps over the lazy dog")
    p = (1 << 31) - 1
    for i in range(16):
        expect = min(((int(a) * (int(x) % p) + int(b)) % p)
                     for x in sh for a, b in [(mh.a[i], mh.b[i])])
        assert int(sig[i]) == expect


def test_lsh_hot_bucket_capped_and_logged(caplog):
    """A hot bucket (many identical docs) must stay sub-quadratic: pairs
    are capped at max_bucket choose 2 and the drop is LOGGED, never
    silent."""
    import logging

    mh = MinHashDedup("m", max_bucket=10)
    n = 200
    group = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)})
    with caplog.at_level(logging.WARNING, logger="fast_carpenter_ray.dedup"):
        out = mh._bucket_pairs(group)
    assert len(out) == 10 * 9 // 2  # not n*(n-1)/2 = 19900
    assert any("capped" in r.message for r in caplog.records)

    sh = SimHashDedup("s", max_bucket=10)
    group = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "simhash": np.zeros(n, dtype=np.int64),
    })
    with caplog.at_level(logging.WARNING, logger="fast_carpenter_ray.dedup"):
        out = sh._bucket_pairs(group)
    assert len(out) == 10 * 9 // 2
    # kept ids are the smallest (deterministic cap)
    assert out["id_a"].max() <= 9 and out["id_b"].max() <= 9


def test_simhash_bucket_pairs_vectorized_hamming():
    """Popcount kernel agrees with bin().count('1')."""
    s = SimHashDedup("s", max_hamming=64)
    vals = np.array([0, 1, 3, (1 << 64) - 1, 0x8000000000000001], dtype=np.uint64)
    group = pd.DataFrame({"doc_id": np.arange(len(vals), dtype=np.int64),
                          "simhash": vals.view(np.int64)})
    out = s._bucket_pairs(group)
    got = {(a, b): h for a, b, h in zip(out["id_a"], out["id_b"], out["hamming"])}
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            assert got[(i, j)] == bin(int(vals[i]) ^ int(vals[j])).count("1")


def test_simhash_lsh_pairs(ray_session):
    import ray.data as rd

    texts = ["alpha beta gamma delta epsilon zeta eta theta " * 4] * 2
    texts += ["totally different words entirely unrelated content here now " * 4]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()), "text": texts}))
    pairs = SimHashDedup("s").candidate_pairs(ds).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (0, 1) in found
    assert (0, 2) not in found and (1, 2) not in found


def test_cluster_pairs_union_find():
    from fast_carpenter_ray.stages.dedup import cluster_pairs

    pairs = pd.DataFrame({"id_a": [1, 2, 10, 20], "id_b": [2, 3, 11, 10]})
    c = cluster_pairs(pairs).set_index("doc_id")["cluster_id"]
    assert c[1] == c[2] == c[3] == 1        # chain 1-2-3
    assert c[10] == c[11] == c[20] == 10    # chain 10-11, 20-10
    assert set(c.index) == {1, 2, 3, 10, 11, 20}


def test_near_dedup_end_to_end(ray_session):
    """Planted dup groups: near_dedup keeps exactly one (min-id) survivor
    per cluster plus all singletons, streaming side unshuffled."""
    import ray.data as rd

    from fast_carpenter_ray.stages.dedup import near_dedup

    docs = docs_with_dups()
    ds = rd.from_arrow(docs).repartition(3)
    mh = MinHashDedup("nd", threshold=0.5)
    survivors = near_dedup(ds, mh).to_pandas()
    kept = set(survivors["doc_id"])
    # docs 0,1 identical; 2 near-dup of them; 6 = base + tail overlaps
    pairs = mh.candidate_pairs(rd.from_arrow(docs)).to_pandas()
    from fast_carpenter_ray.stages.dedup import cluster_pairs

    clusters = cluster_pairs(pairs)
    expected_dropped = set(
        clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"])
    assert kept == set(docs["doc_id"].to_pylist()) - expected_dropped
    assert 0 in kept  # min id of the base cluster survives
    assert 1 not in kept  # identical twin dropped


def test_near_dedup_exact_first_same_survivors(ray_session):
    """exact_first is a pure optimization: identical docs share every
    band key, so the survivor set is provably identical either way."""
    import ray.data as rd

    from fast_carpenter_ray.stages.dedup import near_dedup

    base = docs_with_dups().to_pandas()
    # add more exact copies to make the collapse meaningful
    copies = base.assign(doc_id=base["doc_id"] + 100)
    tab = pa.Table.from_pandas(
        pd.concat([base, copies], ignore_index=True), preserve_index=False)
    ds = rd.from_arrow(tab).repartition(3)
    mh = MinHashDedup("nd", threshold=0.5)
    a = sorted(near_dedup(ds, mh, exact_first=True).to_pandas()["doc_id"])
    b = sorted(near_dedup(ds, mh, exact_first=False).to_pandas()["doc_id"])
    assert a == b and len(a) > 0


def test_chunk_dup_stats(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.dedup import chunk_dup_stats

    # doc 0: 16 tokens -> 2 chunks; doc 1 repeats doc 0's first 8 tokens
    # (1 shared chunk) + 8 unique; doc 2 all unique; doc 3 too short
    w8 = [f"a{j}" for j in range(8)]
    texts = [" ".join(w8 + [f"b{j}" for j in range(8)]),
             " ".join(w8 + [f"c{j}" for j in range(8)]),
             " ".join(f"d{j}" for j in range(16)),
             "tiny doc"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": texts})).repartition(2)
    out = (chunk_dup_stats(ds, chunk_tokens=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # doc 3 has no full chunk -> absent
    assert out["doc_id"].tolist() == [0, 1, 2]
    assert out["n_chunks"].tolist() == [2, 2, 2]
    assert out["n_dup_chunks"].tolist() == [1, 1, 0]
    assert out["dup_chunk_frac"].tolist() == [0.5, 0.5, 0.0]


def test_simhash_bucket_single_id_after_dedup():
    """ADVICE r2: a bucket whose rows collapse to ONE doc_id after
    drop_duplicates must return empty, not crash in np.concatenate."""
    s = SimHashDedup("s")
    group = pd.DataFrame({"doc_id": np.array([7, 7, 7], dtype=np.int64),
                          "simhash": np.array([1, 1, 1], dtype=np.int64)})
    out = s._bucket_pairs(group)
    assert len(out) == 0
    assert list(out.columns) == ["id_a", "id_b", "hamming"]


def test_dedup_pair_stream_no_pair_keyed_groupby(ray_session):
    """The cross-band pair dedupe must bucket by a bounded pair hash,
    never groupby the raw (id_a, id_b) pair (BASELINE.md lesson 7)."""
    import ray.data as rd

    from fast_carpenter_ray.stages.dedup import dedup_pair_stream

    cand = rd.from_arrow(pa.table({
        "id_a": pa.array([1, 1, 2, 1], type=pa.int64()),
        "id_b": pa.array([2, 2, 3, 2], type=pa.int64()),
    }))
    out = dedup_pair_stream(cand, num_partitions=2)
    # unique pairs survive exactly once
    df = out.to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert list(zip(df["id_a"], df["id_b"])) == [(1, 2), (2, 3)]
    # the plan groups on the bounded bucket key, not the raw pair
    plan = str(out._plan._logical_plan.dag)
    assert "id_a" not in plan or "MapGroups" not in plan.replace("_bkt", "")


def test_distributed_components_matches_union_find(ray_session):
    import ray.data as rd

    from fast_carpenter_ray.stages.dedup import (cluster_pairs,
                                                 distributed_components)

    pairs = pd.DataFrame({
        "id_a": np.array([1, 2, 10, 20, 30], dtype=np.int64),
        "id_b": np.array([2, 3, 11, 10, 31], dtype=np.int64)})
    want = cluster_pairs(pairs).sort_values("doc_id").reset_index(drop=True)
    got = (distributed_components(rd.from_pandas(pairs).repartition(3))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_near_dedup_over_budget_identical_survivors(ray_session):
    """pair_budget=0 forces the distributed CC + anti-join path; the
    survivor set must be identical to the driver union-find path."""
    import ray.data as rd

    from fast_carpenter_ray.stages.dedup import near_dedup

    docs = docs_with_dups()
    mh = MinHashDedup("nd", threshold=0.5)
    a = sorted(near_dedup(rd.from_arrow(docs).repartition(3), mh)
               .to_pandas()["doc_id"])
    b = sorted(near_dedup(rd.from_arrow(docs).repartition(3), mh,
                          pair_budget=0).to_pandas()["doc_id"])
    assert a == b and len(a) > 0


def test_chunk_dup_stats_is_cross_document(ray_session):
    """ADVICE r2: a chunk repeated twice WITHIN one doc (no other doc has
    it) is not duplicated; a chunk shared across docs counts at every
    position it occupies."""
    import ray.data as rd

    from fast_carpenter_ray.stages.dedup import chunk_dup_stats

    w8 = [f"a{j}" for j in range(8)]
    texts = [" ".join(w8 + w8),                       # doc 0: same chunk twice (within-doc)
             " ".join(w8 + [f"b{j}" for j in range(8)]),  # doc 1 shares chunk w8
             " ".join(f"c{j}" for j in range(16))]    # doc 2 unique
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()), "text": texts}))
    out = (chunk_dup_stats(ds, chunk_tokens=8).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_chunks"].tolist() == [2, 2, 2]
    # doc 0's w8 chunk IS in another doc (doc 1) -> both its positions dup
    assert out["n_dup_chunks"].tolist() == [2, 1, 0]

    # and the pure within-doc case: drop doc 1 -> doc 0 has NO dup chunks
    ds2 = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 2], type=pa.int64()),
        "text": [texts[0], texts[2]]}))
    out2 = (chunk_dup_stats(ds2, chunk_tokens=8).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    assert out2["n_dup_chunks"].tolist() == [0, 0]

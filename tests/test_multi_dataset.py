"""Multi-dataset layer (reference A4): per-dataset eventtype switching and
concat-vs-sum summary collection (fast_carpenter/__main__.py:66-80,
summary/binned_dataframe.py:69-100)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fast_carpenter_ray.pipelines import DatasetSpec, MultiDatasetRun
from fast_carpenter_ray.stages import BinnedDataframe


def _events_split(sf_dir, parity):
    def build():
        import ray.data as rd

        ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "event_type", "value"])
        return ds.map_batches(
            lambda t, p=parity: t.filter(pa.compute.equal(
                pa.compute.bit_wise_and(t["event_id"], 1), p)),
            batch_format="pyarrow")
    return build


def _specs(sf_dir):
    return [DatasetSpec("mc_even", "mc", build=_events_split(sf_dir, 0)),
            DatasetSpec("data_odd", "data", build=_events_split(sf_dir, 1))]


def test_binned_sum_equals_single_run(ray_session, sf_dir):
    """collect='sum' must reproduce the single-run histogram over the
    union (the reference's merge-by-addition algebra)."""
    import ray.data as rd

    hist = BinnedDataframe("h", [{"in": "event_type"}], weights={"w": "value"})
    run = MultiDatasetRun(_specs(sf_dir))
    summed = run.binned(hist, collect="sum")

    whole = rd.read_parquet(f"{sf_dir}/events.parquet",
                            columns=["event_id", "event_type", "value"])
    single = hist.aggregate(whole).to_pandas().sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        summed[single.columns].reset_index(drop=True), single)


def test_binned_concat_has_dataset_level(ray_session, sf_dir):
    hist = BinnedDataframe("h", [{"in": "event_type"}], weights={"w": "value"})
    run = MultiDatasetRun(_specs(sf_dir))
    concat = run.binned(hist, collect="concat")
    assert list(concat["dataset"].unique()) == ["data_odd", "mc_even"]
    # concat partitions the union exactly: summing it gives the sum mode
    summed = run.binned(hist, collect="sum")
    regrouped = (concat.groupby("event_type", observed=True)[hist.value_columns]
                 .sum().reset_index().sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(regrouped, summed)


def test_cutflow_data_counts_raw_into_weighted_slots(ray_session, sf_dir):
    """eventtype='data' must fill the weighted counter slots with RAW
    event counts (filters.py:48-50), while mc uses the weight sums."""
    run = MultiDatasetRun(_specs(sf_dir))
    out = run.cutflow("value > 0.0", weights="value")
    mc = out[out["dataset"] == "mc_even"]
    dd = out[out["dataset"] == "data_odd"]
    # data: weighted == raw counts, exactly
    np.testing.assert_array_equal(dd["passed_incl_value"].to_numpy(),
                                  dd["passed_incl"].to_numpy().astype(float))
    # mc: weighted differs from raw counts (value is a non-0/1 weight)
    assert not np.allclose(mc["passed_incl_value"].to_numpy(),
                           mc["passed_incl"].to_numpy().astype(float))


def test_duplicate_dataset_names_refused():
    with pytest.raises(ValueError, match="duplicate"):
        MultiDatasetRun([DatasetSpec("a"), DatasetSpec("a")])


def test_spec_requires_source():
    with pytest.raises(ValueError, match="no paths"):
        DatasetSpec("a").load()


def test_cli_datasets_yaml_end_to_end(ray_session, tmp_path):
    """Round-2 verdict #5: the reference's first entry point —
    `fast_carpenter datasets.yml sequence.yml` — through our CLI:
    2 datasets (mc + data) drive the eventtype switch, summaries combine
    under a dataset level, rows checkpoint per dataset."""
    import pyarrow.parquet as pq

    from fast_carpenter_ray.__main__ import main

    # two tiny parquet datasets: identical rows, different eventtype
    rows = pa.table({
        "doc_id": pa.array(range(20), type=pa.int64()),
        "x": pa.array([float(i % 5) for i in range(20)]),
        "w": pa.array([0.5] * 20),
    })
    mc_p = str(tmp_path / "mc.parquet")
    data_p = str(tmp_path / "data.parquet")
    pq.write_table(rows, mc_p)
    pq.write_table(rows, data_p)

    pipeline = tmp_path / "pipeline.yml"
    pipeline.write_text(
        "stages:\n"
        "  - sel: CutFlow\n"
        "  - hist: BinnedDataframe\n"
        "sel:\n"
        "  selection: \"x < 3\"\n"
        "  weights: {w: w}\n"
        "hist:\n"
        "  binning:\n"
        "    - {in: x, out: xbin, bins: {edges: [0, 1, 2, 3]}}\n"
        "  weights: {w: w}\n")
    datasets = tmp_path / "datasets.yml"
    datasets.write_text(
        "defaults: {eventtype: mc}\n"
        "datasets:\n"
        f"  - {{name: sim, files: ['{mc_p}']}}\n"
        f"  - {{name: real, eventtype: data, files: ['{data_p}']}}\n")
    outdir = tmp_path / "out"
    rc = main([str(pipeline), "--datasets", str(datasets),
               "--outdir", str(outdir)])
    assert rc == 0

    # the reference golden CSV shape: MultiIndex (dataset, unique_id,
    # depth, cut) x (counter, weight)
    cuts = pd.read_csv(outdir / "cuts_sel.csv", header=[0, 1],
                       index_col=[0, 1, 2, 3])
    ds_level = cuts.index.get_level_values("dataset")
    assert set(ds_level) == {"sim", "real"}
    sim = cuts[ds_level == "sim"].iloc[0]
    real = cuts[ds_level == "real"].iloc[0]
    # data counts RAW events into the weighted slots (filters.py:48-50)
    assert sim[("totals_incl", "unweighted")] == 20
    assert real[("totals_incl", "unweighted")] == 20
    assert sim[("totals_incl", "w")] == 10.0      # 20 * 0.5
    assert real[("totals_incl", "w")] == 20.0     # raw count

    tbl = pd.read_csv(outdir / "tbl_hist.csv")
    assert set(tbl["dataset"]) == {"sim", "real"}
    # 12 rows pass x<3 per dataset
    assert tbl[tbl["dataset"] == "sim"]["n"].sum() == 12
    # per-dataset resumable row output
    assert (outdir / "rows" / "sim" / "_manifest.json").exists()
    assert (outdir / "rows" / "real" / "_manifest.json").exists()
    # multi_cutflow/multi_binned programmatic layer untouched: rerun main
    # is resumable (skipped partitions)
    rc2 = main([str(pipeline), "--datasets", str(datasets),
                "--outdir", str(outdir)])
    assert rc2 == 0


def test_cli_profile_and_nblocks(ray_session, tmp_path):
    """--nblocks-per-dataset caps each dataset at its first N parquet
    files (reference quick-test mode, fast_carpenter/__main__.py:36-39);
    --profile writes <outdir>/profile.txt."""
    import pyarrow.parquet as pq

    from fast_carpenter_ray.__main__ import main

    # one dataset split across 3 files of 10 rows each
    files = []
    for j in range(3):
        t = pa.table({
            "doc_id": pa.array(range(j * 10, j * 10 + 10), type=pa.int64()),
            "x": pa.array([float(i % 5) for i in range(10)]),
            "w": pa.array([1.0] * 10),
        })
        p = str(tmp_path / f"part{j}.parquet")
        pq.write_table(t, p)
        files.append(p)

    pipeline = tmp_path / "pipeline.yml"
    pipeline.write_text(
        "stages:\n"
        "  - sel: CutFlow\n"
        "sel:\n"
        "  selection: \"x < 3\"\n"
        "  weights: {w: w}\n")
    datasets = tmp_path / "datasets.yml"
    datasets.write_text(
        "datasets:\n"
        f"  - {{name: d, eventtype: mc, files: ['{tmp_path}/part*.parquet']}}\n")

    outdir = tmp_path / "out_capped"
    rc = main([str(pipeline), "--datasets", str(datasets),
               "--outdir", str(outdir), "--nblocks-per-dataset", "1",
               "--profile"])
    assert rc == 0
    cuts = pd.read_csv(outdir / "cuts_sel.csv", header=[0, 1],
                       index_col=[0, 1, 2, 3])
    # only the first file's 10 rows were read
    assert cuts.iloc[0][("totals_incl", "unweighted")] == 10
    prof = (outdir / "profile.txt").read_text()
    assert "cumulative" in prof


def test_nblocks_cap_raises_on_empty_resolution(tmp_path):
    """--nblocks-per-dataset must fail loudly when the glob/dir resolves
    to no parquet files instead of silently reading the full dataset."""
    from fast_carpenter_ray.__main__ import _truncate_paths

    with pytest.raises(ValueError, match="no parquet files"):
        _truncate_paths([str(tmp_path / "nope*.parquet")], 1)

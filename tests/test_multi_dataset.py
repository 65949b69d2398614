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

"""The shipped examples/ pipelines run end-to-end through the CLI."""

import glob
import os

import pandas as pd
import pytest

from fast_carpenter_ray.__main__ import main

EX = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_selection_hist_example(ray_session, sf_dir, tmp_path):
    rc = main([os.path.join(EX, "selection_hist.yml"),
               "--input", f"{sf_dir}/events.parquet",
               "--outdir", str(tmp_path)])
    assert rc == 0
    # a cut-flow csv and a histogram summary land in outdir
    files = os.listdir(tmp_path)
    assert any("cuts" in f for f in files), files
    assert any(f.startswith("hist") or "summary" in f for f in files) or \
        glob.glob(str(tmp_path / "*hist*")), files


def test_crawl_curation_example(ray_session, sf_dir, tmp_path):
    rc = main([os.path.join(EX, "crawl_curation.yml"),
               "--input", sf_dir,
               "--source", "pages",
               "--outdir", str(tmp_path)])
    assert rc == 0
    parts = glob.glob(str(tmp_path / "**" / "*.parquet"), recursive=True)
    assert parts, os.listdir(tmp_path)
    out = pd.concat([pd.read_parquet(p) for p in parts])
    # blocked domains never survive the gate
    assert not out["host"].isin(["site3.example", "site7.example"]).any()
    # robots gate columns present
    assert {"rule_prefix", "allowed"} <= set(out.columns)


def test_datasets_example(ray_session, tmp_path):
    rc = main([os.path.join(EX, "selection_hist.yml"),
               "--datasets", os.path.join(EX, "datasets.yml"),
               "--outdir", str(tmp_path)])
    assert rc == 0
    assert os.listdir(tmp_path)

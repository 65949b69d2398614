"""Multi-dataset layer — N named datasets through one stage sequence.

WHAT (reference): the processing run loops a *dataset config* — entries
with a name, file paths and an ``eventtype`` (mc / data) — through the
same stage sequence (``fast_carpenter/__main__.py:66-80``); the dataset's
eventtype drives the weighted/raw counter switch inside the selection
stages (``fast_carpenter/backends/coffea.py:106``,
``selection/filters.py:48-50``: data counts raw events into the weighted
slots), and summary collectors either CONCAT the per-dataset frames under
a ``dataset`` index level or SUM them
(``fast_carpenter/summary/binned_dataframe.py:69-100``).

HOW (Ray-native): each dataset stays its own streaming
``ray.data.Dataset`` pipeline — per-dataset cut-flow/summary partials are
tiny, so running N dataset pipelines and combining their summary frames on
the driver mirrors the reference's collector exactly while every heavy
stage remains distributed.  Nothing here materializes data rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import pandas as pd

__all__ = ["DatasetSpec", "MultiDatasetRun", "load_datasets_yaml"]


def load_datasets_yaml(config) -> "List[DatasetSpec]":
    """Parse a dataset-config YAML into :class:`DatasetSpec` entries — the
    fast-curator analogue (reference entry point:
    ``fast_carpenter datasets.yml sequence.yml``,
    ``fast_carpenter/__main__.py:66-73``).

    .. code-block:: yaml

        defaults:
          eventtype: mc
        datasets:
          - name: ttbar
            files: ["/data/ttbar/*.parquet"]
          - name: data_2012
            eventtype: data
            files: ["/data/run2012/*.parquet"]

    ``files`` / ``paths`` are interchangeable; ``defaults`` fills missing
    per-dataset keys (fast-curator's defaults block).
    """
    if isinstance(config, str):
        import yaml

        if "\n" not in config and config.endswith((".yml", ".yaml")):
            with open(config) as f:
                config = yaml.safe_load(f)
        else:
            config = yaml.safe_load(config)
    if not isinstance(config, dict) or "datasets" not in config:
        raise ValueError("dataset config needs a 'datasets' list")
    defaults = dict(config.get("defaults", {}))
    specs = []
    for entry in config["datasets"]:
        if not isinstance(entry, dict) or "name" not in entry:
            raise ValueError(f"each dataset entry needs a 'name': {entry!r}")
        merged = {**defaults, **entry}
        paths = merged.get("files", merged.get("paths"))
        if isinstance(paths, str):
            paths = [paths]
        specs.append(DatasetSpec(
            name=merged["name"],
            eventtype=merged.get("eventtype", "mc"),
            paths=list(paths) if paths else None))
    return specs


@dataclass
class DatasetSpec:
    """One entry of the dataset config (reference: datasets YAML).

    ``paths``: parquet files/dirs for ``ray.data.read_parquet``.
    ``eventtype``: "mc" (weighted counters) or "data" (raw counts fill the
    weighted slots too — ``filters.py:48-50``).
    ``build``: alternative to ``paths`` — a callable returning the
    dataset's ``ray.data.Dataset`` (derived/filtered inputs).
    """

    name: str
    eventtype: str = "mc"
    paths: Optional[List[str]] = None
    build: Optional[Callable] = None

    @property
    def is_mc(self) -> bool:
        return self.eventtype != "data"

    def load(self, columns: Optional[Sequence[str]] = None):
        import ray.data as rd

        if self.build is not None:
            return self.build()
        if not self.paths:
            raise ValueError(f"dataset {self.name!r}: no paths and no build fn")
        return rd.read_parquet(self.paths,
                               columns=list(columns) if columns else None)


class MultiDatasetRun:
    """Run stage pipelines over a dataset config and combine summaries.

    The reference analogue of looping ``__main__.py:71`` over datasets:
    per-dataset streaming pipelines, driver-side combination of the
    (summary-sized) results.
    """

    def __init__(self, specs: Sequence[DatasetSpec],
                 columns: Optional[Sequence[str]] = None):
        self.specs = list(specs)
        names = [s.name for s in self.specs]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate dataset names: {names}")
        self._columns = columns

    def datasets(self) -> Dict[str, object]:
        return {s.name: s.load(self._columns) for s in self.specs}

    # -- cut-flow ---------------------------------------------------------
    def cutflow(self, selection, weights=None,
                transform: Optional[Callable] = None) -> pd.DataFrame:
        """Per-dataset cut-flow counter tables concatenated under a leading
        ``dataset`` column.  ``is_mc`` switches per dataset eventtype: data
        datasets count RAW events into the weighted slots
        (``filters.py:48-50``).  ``transform``: optional fn(ds) applied to
        each dataset before the selection (shared Define chain etc.)."""
        from ..stages.selection import CutFlow

        frames = []
        for spec in self.specs:
            ds = spec.load(self._columns)
            if transform is not None:
                ds = transform(ds)
            cf = CutFlow(f"cutflow_{spec.name}", selection, weights=weights,
                         is_mc=spec.is_mc)
            df = cf.cutflow(ds).to_pandas()
            df.insert(0, "dataset", spec.name)
            frames.append(df)
        return pd.concat(frames, ignore_index=True)

    # -- binned summaries --------------------------------------------------
    def binned(self, stage, collect: str = "concat",
               transform: Optional[Callable] = None) -> pd.DataFrame:
        """Run one ``BinnedDataframe`` stage over every dataset.

        ``collect="concat"``: per-dataset frames stacked under a leading
        ``dataset`` column (reference Collector with dataset readers —
        ``summary/binned_dataframe.py:69-88``).
        ``collect="sum"``: bins summed across datasets with fill_value=0
        (the reference's merge-by-addition, ``binned_dataframe.py:89-100``).
        """
        per = []
        for spec in self.specs:
            ds = spec.load(self._columns)
            if transform is not None:
                ds = transform(ds)
            df = stage.aggregate(ds).to_pandas()
            df.insert(0, "dataset", spec.name)
            per.append(df)
        out = pd.concat(per, ignore_index=True)
        if collect == "concat":
            return out.sort_values(["dataset"] + stage.out_dims).reset_index(drop=True)
        if collect == "sum":
            summed = (out.groupby(stage.out_dims, observed=True, sort=False)
                      [stage.value_columns].sum().reset_index())
            return summed.sort_values(stage.out_dims).reset_index(drop=True)
        raise ValueError(f"unknown collect mode {collect!r}")

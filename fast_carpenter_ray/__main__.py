"""CLI: run a YAML-declared pipeline over Parquet input.

Reference analogue: ``fast_carpenter dataset_cfg.yml sequence_cfg.yml
--outdir out`` (``fast_carpenter/__main__.py:66-83``).  Ours takes the
input parquet path(s) directly (Ray Data handles sharding natively —
no --blocksize / --ncores: ``override_num_blocks`` and ``ray.init``
num_cpus cover them) and writes each terminal stage's summary plus the
run manifest into --outdir.

    python -m fast_carpenter_ray pipeline.yml --input /data/pages.parquet \
        --outdir /tmp/out [--num-blocks 256] [--help-stages]
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="fast_carpenter_ray")
    parser.add_argument("pipeline", nargs="?", help="processing config YAML")
    parser.add_argument("--input", help="input parquet path/glob")
    parser.add_argument("--datasets",
                        help="dataset-config YAML (name/eventtype/files per "
                             "dataset) — the reference's "
                             "'fast_carpenter datasets.yml sequence.yml' "
                             "entry point; mutually exclusive with --input")
    parser.add_argument("--source", default="parquet",
                        help="registered source name (parquet/csv/json/pages)")
    parser.add_argument("--outdir", default="output")
    parser.add_argument("--num-blocks", type=int, default=None)
    parser.add_argument("--columns", nargs="*", default=None,
                        help="projection pushdown at the read")
    parser.add_argument("--help-stages", action="store_true",
                        help="list known stage names and exit")
    parser.add_argument("--profile", action="store_true",
                        help="profile the driver process (cProfile) and "
                             "write <outdir>/profile.txt — reference "
                             "fast_carpenter --profile "
                             "(fast_carpenter/__main__.py:40-43)")
    parser.add_argument("--nblocks-per-dataset", type=int, default=None,
                        help="quick-test mode: read only the first N "
                             "parquet files of each dataset — reference "
                             "--nblocks-per-dataset "
                             "(fast_carpenter/__main__.py:36-39)")
    args = parser.parse_args(argv)

    if args.help_stages:
        from .pipelines.config import STAGE_REGISTRY

        for name, path in sorted(STAGE_REGISTRY.items()):
            print(f"{name:24s} {path}")
        return 0

    if args.input and args.datasets:
        parser.error("--input and --datasets are mutually exclusive")
    if not args.pipeline or not (args.input or args.datasets):
        parser.error("pipeline YAML and --input (or --datasets) are required")

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    if args.profile:
        import cProfile
        import pstats

        os.makedirs(args.outdir, exist_ok=True)
        prof = cProfile.Profile()
        prof.enable()
        try:
            rc = _run_datasets(args) if args.datasets else _run_single(args)
        finally:
            prof.disable()
            path = os.path.join(args.outdir, "profile.txt")
            with open(path, "w") as fh:
                pstats.Stats(prof, stream=fh).sort_stats(
                    "cumulative").print_stats(60)
            print(f"wrote {path}")
        return rc

    if args.datasets:
        return _run_datasets(args)
    return _run_single(args)


def _truncate_paths(paths, nblocks):
    """Quick-test block cap: resolve globs/dirs to concrete parquet files
    and keep the first ``nblocks`` (sorted, deterministic)."""
    import glob as _glob

    files = []
    for p in paths:
        if any(c in p for c in "*?["):
            files.extend(sorted(_glob.glob(p)))
        elif os.path.isdir(p):
            files.extend(sorted(
                os.path.join(p, f) for f in os.listdir(p)
                if f.endswith(".parquet")))
        else:
            files.append(p)
    if not files:
        raise ValueError(
            f"--nblocks-per-dataset: no parquet files resolved from "
            f"{paths!r} — check the glob/directory")
    return files[:nblocks]


def _run_single(args) -> int:
    from .pipelines.config import load_pipeline
    from .sources import get_source
    from .state.bookkeeping import write_manifest
    from .state.checkpoint import checkpoint_write

    seq = load_pipeline(args.pipeline)
    read_kwargs = {}
    if args.num_blocks:
        read_kwargs["override_num_blocks"] = args.num_blocks
    input_path = args.input
    if args.nblocks_per_dataset:
        input_path = _truncate_paths([args.input], args.nblocks_per_dataset)
    ds = get_source(args.source)(input_path, columns=args.columns, **read_kwargs)

    os.makedirs(args.outdir, exist_ok=True)
    write_manifest(args.outdir, config={"pipeline": args.pipeline},
                   input=args.input, source=args.source)

    # walk the sequence cumulatively: each terminal sees the dataset as it
    # exists AT ITS POSITION in the pipeline (a CutFlow both counts its
    # input and filters the stream for downstream stages)
    out = ds
    summaries = []
    for name, stage in seq:
        if hasattr(stage, "cutflow"):
            summaries.append(("cuts", name, stage,
                              stage.collect(stage.cutflow(out), dataset_name="input")))
        if hasattr(stage, "apply"):
            out = stage.apply(out)
        if hasattr(stage, "aggregate"):
            result = stage.aggregate(out)
            table = stage.collect(result) if hasattr(stage, "collect") \
                else result.to_pandas()
            summaries.append(("tbl", name, stage, table))

    for kind, name, stage, table in summaries:
        path = os.path.join(args.outdir, f"{kind}_{name}.csv")
        if hasattr(stage, "write_csv"):
            stage.write_csv(table, path)
        else:
            table.to_csv(path, float_format="%.17g")
        print(f"wrote {path}")

    # row-level output: resumable partitioned parquet keyed by the first
    # column of the final schema
    id_col = out.schema().names[0]
    lineage = checkpoint_write(out, os.path.join(args.outdir, "rows"), id_col)
    print(f"wrote {len(lineage)} row partitions "
          f"({int(lineage['rows'].sum())} rows, "
          f"{int(lineage['skipped'].sum())} skipped)")
    return 0


def _run_datasets(args) -> int:
    """Multi-dataset run: loop the dataset config through the stage
    sequence (reference ``__main__.py:66-80`` semantics) — per-dataset
    streaming pipelines with the dataset's ``eventtype`` driving the
    weighted/raw counter switch, summaries combined on the driver
    (cut-flow tables concatenated; binned tables stacked under a leading
    ``dataset`` index level, the reference's ``dataset_col=True``)."""
    import os

    import pandas as pd

    from .pipelines.config import load_pipeline
    from .pipelines.datasets import load_datasets_yaml
    from .state.bookkeeping import write_manifest
    from .state.checkpoint import checkpoint_write

    specs = load_datasets_yaml(args.datasets)
    if args.nblocks_per_dataset:
        for spec in specs:
            if spec.paths:
                spec.paths = _truncate_paths(spec.paths,
                                             args.nblocks_per_dataset)
    os.makedirs(args.outdir, exist_ok=True)
    write_manifest(args.outdir, config={"pipeline": args.pipeline,
                                        "datasets": args.datasets},
                   input=[s.name for s in specs], source="parquet")

    # which stages take the eventtype switch (CutFlow/SelectPhaseSpace)
    probe = load_pipeline(args.pipeline)
    mc_stages = [n for n, s in probe if hasattr(s, "is_mc")]

    cuts: dict = {}
    tbls: dict = {}
    writers: dict = {}
    total_rows = 0
    for spec in specs:
        # rebuild the sequence per dataset so eventtype reaches the
        # counter stages (reference: backends/coffea.py:106)
        seq = load_pipeline(args.pipeline, extra_kwargs={
            n: {"is_mc": spec.is_mc} for n in mc_stages})
        out = spec.load(args.columns)
        for name, stage in seq:
            writers[name] = stage
            if hasattr(stage, "cutflow"):
                cuts.setdefault(name, []).append(
                    stage.collect(stage.cutflow(out), dataset_name=spec.name))
            if hasattr(stage, "apply"):
                out = stage.apply(out)
            if hasattr(stage, "aggregate"):
                t = (stage.collect(stage.aggregate(out))
                     if hasattr(stage, "collect")
                     else stage.aggregate(out).to_pandas())
                tbls.setdefault(name, []).append((spec.name, t))
        lineage = checkpoint_write(
            out, os.path.join(args.outdir, "rows", spec.name),
            out.schema().names[0])
        total_rows += int(lineage["rows"].sum())

    for name, frames in cuts.items():
        path = os.path.join(args.outdir, f"cuts_{name}.csv")
        combined = pd.concat(frames)
        stage = writers[name]
        if hasattr(stage, "write_csv"):
            stage.write_csv(combined, path)
        else:
            combined.to_csv(path, float_format="%.17g")
        print(f"wrote {path}")
    for name, entries in tbls.items():
        path = os.path.join(args.outdir, f"tbl_{name}.csv")
        combined = pd.concat([t for _, t in entries],
                             keys=[n for n, _ in entries], names=["dataset"])
        stage = writers[name]
        if hasattr(stage, "write_csv"):
            stage.write_csv(combined, path)
        else:
            combined.to_csv(path, float_format="%.17g")
        print(f"wrote {path}")
    print(f"wrote {total_rows} rows across {len(specs)} dataset(s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""BinnedDataframe — N-dimensional weighted histogram summaries.

WHAT (reference ``fast_carpenter/summary/binned_dataframe.py:117-281`` +
``binning_config.py:10-81``): per block, project the needed columns, explode
equal-jagged list columns to object level, bin each dimension (``nbins/low/
high`` -> ``np.linspace``, or explicit ``edges``; always with -inf/+inf
under/overflow bins; intervals closed on the LEFT, ``right=False``), then
group by all dimensions and produce ``n`` (count), ``<w>:sumw`` and
``<w>:sumw2`` per weight column; partial tables merge by addition with
``fill_value=0``.

HOW: the wide step of the engine.  A per-batch *partial* histogram inside
``map_batches`` (vectorized ``np.searchsorted`` binning + pandas groupby on
the tiny per-batch table) followed by ``groupby(dims).aggregate(Sum(...))``
over the much smaller partials — the canonical partial-aggregate + small
shuffle pattern (SURVEY.md §7.3).  The final summary is tiny, so the
interval-labelled pandas rendering (for %.17g golden CSVs) happens on the
driver in :meth:`collect`.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

from ..arrays import list_offsets_values
from ..expressions import Expression, evaluate

__all__ = ["BinnedDataframe", "BadBinnedDataframeConfig", "bin_edges",
           "write_summary"]

COUNT_LABEL = "n"


class BadBinnedDataframeConfig(Exception):
    pass


def bin_edges(low=None, high=None, nbins=None, edges=None,
              overflow=True, underflow=True) -> Optional[np.ndarray]:
    """Edge list incl. +-inf guards (``binning_config.py:63-81``)."""
    if all(x is not None for x in (nbins, low, high)):
        out = np.linspace(float(low), float(high), int(nbins) + 1)
    elif edges is not None:
        out = np.asarray(edges, dtype=np.float64)
    else:
        return None
    if underflow:
        out = np.insert(out, 0, -np.inf)
    if overflow:
        out = np.append(out, np.inf)
    return out


class _Dimension:
    def __init__(self, stage_name: str, cfg: dict):
        if not isinstance(cfg, dict):
            raise BadBinnedDataframeConfig(f"{stage_name}: binning item is not a dictionary")
        if "in" not in cfg or not isinstance(cfg["in"], str):
            raise BadBinnedDataframeConfig(f"{stage_name}: binning needs string 'in'")
        self.expr = Expression(cfg["in"])
        self.out = cfg.get("out", cfg["in"])
        bins = cfg.get("bins")
        if bins is None:
            self.edges = None  # categorical / already discrete
        elif isinstance(bins, dict):
            self.edges = bin_edges(**bins)
            if self.edges is None:
                raise BadBinnedDataframeConfig(
                    f"{stage_name}: No way to infer binning edges for in={cfg['in']}")
        else:
            raise BadBinnedDataframeConfig(
                f"{stage_name}: bins is neither None nor a dictionary for in={cfg['in']}")

    def code(self, values: np.ndarray) -> np.ndarray:
        """Closed-left bin index; NaN and +inf -> -1 (dropped).

        Mirrors the reference's ``pd.cut(..., right=False)`` exactly:
        closed-left intervals ``[a, b)`` never contain +inf (even the
        overflow bin ``[high, inf)`` excludes its right edge), while -inf
        IS contained in the underflow bin ``[-inf, low)``.  Verified
        against pd.cut: +inf -> code -1 (dropped), -inf -> underflow."""
        if self.edges is None:
            return values
        values = np.asarray(values, dtype=np.float64)
        idx = np.searchsorted(self.edges, values, side="right") - 1
        idx = np.clip(idx, 0, len(self.edges) - 2)
        idx = np.where(np.isnan(values) | np.isposinf(values), -1, idx)
        return idx.astype(np.int64)

    def interval(self, codes: np.ndarray):
        """Bin codes -> pandas Interval labels (closed='left'), index-
        compatible with the IntervalIndex used by pad_missing densify."""
        iv = pd.IntervalIndex.from_breaks(self.edges, closed="left")
        return iv[np.asarray(codes, dtype=np.int64)]


def _explode(arrays: Dict[str, object], n_rows: int) -> Dict[str, np.ndarray]:
    """Equal-jagged explode (reference ``explode``,
    binned_dataframe.py:287-320): list results must share offsets; flat
    results are repeated."""
    offsets = None
    for v in arrays.values():
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            o, _ = list_offsets_values(v)
            if offsets is None:
                offsets = o
            elif not np.array_equal(offsets, o):
                raise ValueError("Cannot bin multiple arrays with different jaggedness")
    if offsets is None:
        return {k: np.asarray(v) for k, v in arrays.items()}
    counts = np.diff(offsets)
    out = {}
    for k, v in arrays.items():
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            _, vals = list_offsets_values(v)
            out[k] = vals
        else:
            out[k] = np.repeat(np.asarray(v), counts)
    return out


class BinnedDataframe:
    def __init__(self, name: str, binning: List[dict], weights=None,
                 pad_missing: bool = False, observed: bool = True,
                 out_dir: Optional[str] = None):
        self.name = name
        self.out_dir = out_dir
        if not isinstance(binning, list):
            raise BadBinnedDataframeConfig(f"{name}: binning section not a list")
        self.dims = [_Dimension(name, cfg) for cfg in binning]
        outs = [d.out for d in self.dims]
        if len(set(outs)) != len(outs):
            raise BadBinnedDataframeConfig(f"{name}: some binning dimensions repeat `out` names")
        if weights is None:
            weights = {}
        elif isinstance(weights, str):
            weights = {weights: weights}
        elif isinstance(weights, list):
            weights = {str(w): w for w in weights}
        self.weights: Dict[str, Expression] = {k: Expression(v) for k, v in weights.items()}
        self.pad_missing = pad_missing
        self.observed = observed

    @property
    def out_dims(self) -> List[str]:
        return [d.out for d in self.dims]

    @property
    def value_columns(self) -> List[str]:
        cols = [COUNT_LABEL]
        cols += [f"sumw_{w}" for w in self.weights]
        cols += [f"sumw2_{w}" for w in self.weights]
        return cols

    @property
    def columns(self) -> List[str]:
        """Input columns (projection pushdown)."""
        cols: List[str] = []
        for d in self.dims:
            cols.extend(c for c in d.expr.columns if c not in cols)
        for e in self.weights.values():
            cols.extend(c for c in e.columns if c not in cols)
        return cols

    # -- per-batch partial histogram -----------------------------------
    def partial(self, batch: pa.Table) -> pa.Table:
        raw: Dict[str, object] = {}
        for d in self.dims:
            raw[f"__dim_{d.out}"] = evaluate(batch, d.expr)
        for wname, wexpr in self.weights.items():
            raw[f"__w_{wname}"] = evaluate(batch, wexpr)
        flat = _explode(raw, len(batch))

        frame: Dict[str, np.ndarray] = {}
        valid = None
        for d in self.dims:
            codes = d.code(flat[f"__dim_{d.out}"])
            if d.edges is not None:
                bad = codes == -1
                if bad.any():
                    valid = ~bad if valid is None else (valid & ~bad)
            frame[d.out] = codes
        df = pd.DataFrame(frame)
        for wname in self.weights:
            w = np.asarray(flat[f"__w_{wname}"], dtype=np.float64)
            df[f"sumw_{wname}"] = w
            df[f"sumw2_{wname}"] = w * w
        if valid is not None:
            df = df[valid]

        grouped = df.groupby(self.out_dims, observed=True, sort=False)
        agg = {COUNT_LABEL: (self.out_dims[0], "size")}
        for wname in self.weights:
            agg[f"sumw_{wname}"] = (f"sumw_{wname}", "sum")
            agg[f"sumw2_{wname}"] = (f"sumw2_{wname}", "sum")
        out = grouped.agg(**agg).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    # -- dataset-level aggregate ---------------------------------------
    def aggregate(self, ds, mode: str = "tree"):
        """partials -> combine (tree by default: histogram key spaces are
        summary-sized, so a hash shuffle is pure overhead — agg.py) ->
        sorted summary Dataset."""
        from ..agg import combine_partials

        parts = ds.map_batches(self.partial, batch_format="pyarrow")
        out = combine_partials(parts, self.out_dims, self.value_columns, mode=mode)
        # tree mode returns already sorted; hash mode sorts the (small) summary
        return out.sort(self.out_dims) if mode == "hash" else out

    # -- driver-side rendering -----------------------------------------
    def collect(self, result, dataset_name: Optional[str] = None) -> pd.DataFrame:
        """Reference-shaped summary: MultiIndex of interval/categorical bins,
        columns ``n``, ``<w>:sumw``, ``<w>:sumw2``
        (binned_dataframe.py:241-247); optionally reindexed to the full bin
        product (``pad_missing``/densify, binned_dataframe.py:103-114)."""
        df = result.to_pandas() if hasattr(result, "to_pandas") else result.copy()
        rename = {f"sumw_{w}": f"{w}:sumw" for w in self.weights}
        rename.update({f"sumw2_{w}": f"{w}:sumw2" for w in self.weights})
        df = df.rename(columns=rename)
        labels = {}
        for d in self.dims:
            labels[d.out] = d.interval(df[d.out].to_numpy()) if d.edges is not None else df[d.out]
        for k, v in labels.items():
            df[k] = v
        value_cols = [COUNT_LABEL] + list(rename.values())
        df = df.set_index(self.out_dims)[value_cols]
        if self.pad_missing:
            index_values = []
            for d in self.dims:
                if d.edges is not None:
                    index_values.append(pd.IntervalIndex.from_breaks(d.edges, closed="left"))
                else:
                    index_values.append(df.index.get_level_values(d.out).unique())
            if len(index_values) == 1:
                full = index_values[0].rename(self.out_dims[0])
            else:
                full = pd.MultiIndex.from_product(index_values, names=self.out_dims)
            df = df.reindex(index=full)
        if dataset_name is not None:
            df = pd.concat([df], keys=[dataset_name], names=["dataset"])
        return df

    def write_csv(self, df: pd.DataFrame, path: str) -> None:
        df.to_csv(path, float_format="%.17g")

    def write(self, df: pd.DataFrame, path: str) -> None:
        """Extension-dispatched summary writer (reference
        ``summary/binned_dataframe.py:33-43``: the output filename picks
        the pandas writer)."""
        write_summary(df, path)


#: extension -> writer, mirroring the reference's dispatch table
#: (summary/binned_dataframe.py:33-43).  xlsx/h5 are gated on their
#: optional engines (openpyxl / pytables) with a clear error; the
#: reference's msgpack target is dead upstream (removed from pandas) and
#: deliberately not reproduced.
def _write_parquet(df: pd.DataFrame, path: str) -> None:
    # Interval/categorical index levels are not parquet-representable:
    # flatten to columns and stringify interval labels (lossless for
    # golden-diff purposes; the csv writer does the same textually).
    flat = df.reset_index()
    for c in flat.columns:
        if isinstance(flat[c].dtype, pd.IntervalDtype) or flat[c].dtype == object:
            if len(flat[c]) and isinstance(flat[c].iloc[0], pd.Interval):
                flat[c] = flat[c].astype(str)
    flat.to_parquet(path)


def _gated(module: str, fn):
    def write(df, path):
        try:
            __import__(module)
        except ImportError as err:
            raise NotImplementedError(
                f"writing {path!r} needs the optional {module!r} engine "
                f"(not installed in this environment): {err}")
        fn(df, path)
    return write


def _write_xlsx(df: pd.DataFrame, path: str) -> None:
    """Self-contained xlsx writer (stdlib zipfile + XML — an .xlsx is a
    zip of OOXML parts), so the reference's xlsx summary target
    (summary/binned_dataframe.py:15) works without the optional openpyxl
    engine.  Uses pandas ``to_excel`` when openpyxl IS available;
    otherwise writes one sheet with a header row, numeric cells typed
    numeric and everything else as inline strings."""
    try:
        import openpyxl  # noqa: F401

        df.to_excel(path)
        return
    except ImportError:
        pass
    import numbers
    import zipfile
    from xml.sax.saxutils import escape

    flat = df.reset_index()
    for c in flat.columns:
        if len(flat[c]) and isinstance(flat[c].iloc[0], pd.Interval):
            flat[c] = flat[c].astype(str)

    def col_name(j: int) -> str:
        s = ""
        j += 1
        while j:
            j, r = divmod(j - 1, 26)
            s = chr(65 + r) + s
        return s

    def cell(j: int, i: int, v) -> str:
        ref = f"{col_name(j)}{i + 1}"
        if isinstance(v, numbers.Number) and not isinstance(v, bool) \
                and v == v:  # finite check for the numeric cell type
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t>'
                f"{escape(str(v))}</t></is></c>")

    rows = ['<row r="1">'
            + "".join(cell(j, 0, c) for j, c in enumerate(flat.columns))
            + "</row>"]
    for i, (_, row) in enumerate(flat.iterrows(), start=1):
        rows.append(f'<row r="{i + 1}">'
                    + "".join(cell(j, i, v) for j, v in enumerate(row))
                    + "</row>")
    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>'
             + "".join(rows) + "</sheetData></worksheet>")
    workbook = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<workbook xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main" xmlns:r="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships">'
                '<sheets><sheet name="summary" sheetId="1" r:id="rId1"/>'
                "</sheets></workbook>")
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               '<Relationships xmlns="http://schemas.openxmlformats.org/'
               'package/2006/relationships"><Relationship Id="rId1" '
               'Type="http://schemas.openxmlformats.org/officeDocument/'
               '2006/relationships/worksheet" '
               'Target="worksheets/sheet1.xml"/></Relationships>')
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships"><Relationship Id="rId1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
            'relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>")
    types = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<Types xmlns="http://schemas.openxmlformats.org/package/'
             '2006/content-types">'
             '<Default Extension="rels" ContentType="application/vnd.'
             'openxmlformats-package.relationships+xml"/>'
             '<Default Extension="xml" ContentType="application/xml"/>'
             '<Override PartName="/xl/workbook.xml" ContentType='
             '"application/vnd.openxmlformats-officedocument.'
             'spreadsheetml.sheet.main+xml"/>'
             '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
             '"application/vnd.openxmlformats-officedocument.'
             'spreadsheetml.worksheet+xml"/></Types>')
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", types)
        z.writestr("_rels/.rels", rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


_WRITERS = {
    ".csv": lambda df, path: df.to_csv(path, float_format="%.17g"),
    ".txt": lambda df, path: df.to_csv(path, float_format="%.17g"),
    ".parquet": _write_parquet,
    ".pkl": lambda df, path: df.to_pickle(path),
    ".json": lambda df, path: df.reset_index().to_json(path, orient="records"),
    ".xlsx": _write_xlsx,
    ".h5": _gated("tables", lambda df, path: df.to_hdf(path, key="summary")),
}


def write_summary(df: pd.DataFrame, path: str) -> None:
    """Write a summary dataframe, format chosen by file extension."""
    import os

    ext = os.path.splitext(path)[1].lower()
    writer = _WRITERS.get(ext)
    if writer is None:
        raise ValueError(
            f"unsupported summary output extension {ext!r} "
            f"(supported: {sorted(_WRITERS)})")
    writer(df, path)

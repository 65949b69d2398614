"""Exact distributed bivariate statistics: per-group Pearson correlation
(and the covariance/regression sums it is built from).

The summary-statistics leg the reference's BinnedDataframe cannot
express (``fast_carpenter/summary/binned_dataframe.py`` aggregates one
column at a time; correlation needs joint moments).

Scale shape: ONE pass of per-batch integer moment partials
``(n, Sx, Sy, Sxy, Sxx, Syy)`` per group — six int64 scalars, exact, so
the partial sum is associative and bit-stable in any combine order —
then a summary-sized tree combine and a driver-side closed-form
``corr = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))``.
Because every input to the float expression is an exactly-summed int64,
the engine and a SQL oracle computing the SAME expression agree
bit-for-bit (see BASELINE.md FP-parity notes; rounded to 6 decimals for
the driver hash anyway).  Nothing row-shaped ever shuffles: the stream
shrinks to ``groups x 6`` integers in the map stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["grouped_corr", "grouped_entropy", "grouped_mode",
           "zipf_slope", "grouped_collect_set", "pivot_counts", "grouped_ols",
           "zscore_outliers", "grouped_theil_sen", "mad_outliers", "gini",
           "ks_two_sample", "benford", "mannwhitney_u"]


def grouped_theil_sen(ds, group: str, t: str, v: str,
                      max_group_rows: int = 20_000):
    """Per-group Theil-Sen ROBUST trend: the lower median of all pairwise
    slopes ``(v_j - v_i) / (t_j - t_i)`` over pairs with ``t_j > t_i``
    (up to 29% outlier breakdown vs OLS's zero — the robust counterpart
    of :func:`grouped_ols` for noisy per-entity series).

    Deterministic + oracle-exact: the lower median is a pure SELECTION
    (sorted slope at rank ``ceil(m/2)``), never an interpolated midpoint,
    so engine and SQL agree bit-for-bit; each slope is one double
    subtraction + one division computed identically in both engines.

    Scale shape: the stream slims to (group, t, v) and each entity's
    series is ranked inside ONE ``map_groups`` task (pairs are O(n^2)
    per entity — guarded by ``max_group_rows``; per-entity event series
    are conversation/visit-sized, not corpus-sized).  Only int64/double
    triples shuffle, once.
    """

    def slim(batch: pa.Table) -> pa.Table:
        tv = batch[t]
        if pa.types.is_timestamp(tv.type):
            tv = tv.cast(pa.int64())
        return pa.table({
            group: batch[group],
            "t": tv.cast(pa.int64()) if not pa.types.is_int64(tv.type) else tv,
            "v": pa.array(batch[v].to_numpy(zero_copy_only=False).astype(
                np.float64)),
        })

    from ..agg import default_partitions

    slimmed = ds.map_batches(slim, batch_format="pyarrow", batch_size=None)

    def theil(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        if n > max_group_rows:
            raise ValueError(
                f"grouped_theil_sen: group {g[group].iloc[0]!r} has {n} rows "
                f"(> {max_group_rows}); pairwise slopes are O(n^2) — "
                f"pre-aggregate the series (e.g. per-hour means) upstream")
        tt = g["t"].to_numpy(dtype=np.int64)
        vv = g["v"].to_numpy(dtype=np.float64)
        i, j = np.triu_indices(n, k=1)
        dt = tt[j] - tt[i]
        keep = dt != 0
        if not keep.any():
            return pd.DataFrame({group: g[group].iloc[:1],
                                 "theil_sen": [np.nan],
                                 "n_pairs": np.array([0], dtype=np.int64)})
        # later-minus-earlier orientation, matching the SQL b.t > a.t join
        sgn = np.sign(dt[keep])
        slopes = (sgn * (vv[j][keep] - vv[i][keep])) / (
            sgn * dt[keep]).astype(np.float64)
        m = len(slopes)
        med = np.sort(slopes, kind="stable")[(m + 1) // 2 - 1]
        return pd.DataFrame({group: g[group].iloc[:1],
                             "theil_sen": [med],
                             "n_pairs": np.array([m], dtype=np.int64)})

    return slimmed.groupby(group,
                           num_partitions=default_partitions()).map_groups(
        theil, batch_format="pandas")


def grouped_corr(ds, group: str, x: str, y: str, mode: str = "tree"):
    """Pearson correlation of integer columns ``x``, ``y`` per ``group``.

    Returns a pandas frame ``(group, n, corr)`` sorted by group;
    ``corr`` is NaN-free: groups with zero variance in either column are
    dropped (mirroring SQL where the denominator would be 0).
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            group: batch[group].to_pandas(),
            "_x": batch[x].to_numpy(zero_copy_only=False).astype(np.int64),
            "_y": batch[y].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        df["_xy"] = df["_x"] * df["_y"]
        df["_xx"] = df["_x"] * df["_x"]
        df["_yy"] = df["_y"] * df["_y"]
        df["_n"] = np.int64(1)
        out = (df.groupby(group, sort=False)
               [["_n", "_x", "_y", "_xy", "_xx", "_yy"]].sum().reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    sums = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[group], value_cols=["_n", "_x", "_y", "_xy", "_xx", "_yy"],
        mode=mode).to_pandas()

    n = sums["_n"].to_numpy().astype(np.int64)
    sx = sums["_x"].to_numpy().astype(np.int64)
    sy = sums["_y"].to_numpy().astype(np.int64)
    sxy = sums["_xy"].to_numpy().astype(np.int64)
    sxx = sums["_xx"].to_numpy().astype(np.int64)
    syy = sums["_yy"].to_numpy().astype(np.int64)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    ok = (vx > 0) & (vy > 0)
    corr = ((n * sxy - sx * sy).astype(np.float64)[ok]
            / (np.sqrt(vx.astype(np.float64)[ok])
               * np.sqrt(vy.astype(np.float64)[ok])))
    out = pd.DataFrame({group: sums[group][ok],
                        "n": n[ok], "corr": corr})
    return out.sort_values(group).reset_index(drop=True)


def grouped_entropy(ds, group: str, label: str, mode: str = "tree"):
    """Shannon entropy (natural log) of the ``label`` distribution per
    ``group`` — e.g. language diversity per spatial cell.

    Shape: per-batch ``(group, label)`` count partials -> ONE combine
    (the (group x label) key space must be summary-sized for the default
    tree route — guarded by ``agg.MAX_DRIVER_ROWS``; pass ``mode="hash"``
    plus a downstream group-keyed combine for fine-grained grids) -> a
    vectorized entropy finish from exact integer counts.  Returns
    ``(group, n, entropy)`` sorted by group.
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({group: batch[group].to_pandas(),
                           label: batch[label].to_pandas()})
        out = (df.groupby([group, label], sort=False)
               .size().reset_index(name="c"))
        out["c"] = out["c"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[group, label], value_cols=["c"], mode=mode).to_pandas()
    if counts.empty:
        return pd.DataFrame({group: pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "entropy": pd.Series([], dtype=np.float64)})
    n = counts.groupby(group)["c"].transform("sum")
    p = counts["c"].to_numpy().astype(np.float64) / n.to_numpy()
    counts["_t"] = p * np.log(p)
    out = (counts.groupby(group)
           .agg(n=("c", "sum"), entropy=("_t", "sum")).reset_index())
    out["n"] = out["n"].astype(np.int64)
    # 0.0 - x (not -x): keeps single-label groups at +0.0, never -0.0,
    # matching SQL ``0.0 - sum(...)`` bit-for-bit in the value hash
    out["entropy"] = 0.0 - out["entropy"]
    return out.sort_values(group).reset_index(drop=True)


def grouped_mode(ds, group: str, col: str, mode: str = "tree"):
    """Most frequent ``col`` value per ``group`` (ties -> smallest
    value — the deterministic SQL ``ORDER BY count DESC, value`` rule).

    Shape: per-batch (group, value) count partials -> one combine ->
    vectorized per-group argmax.  Returns ``(group, value, n)`` sorted
    by group; the (group x distinct-value) key space must fit the
    chosen combine route (tree guarded by ``agg.MAX_DRIVER_ROWS``).
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({group: batch[group].to_pandas(),
                           "value": batch[col].to_pandas()})
        out = df.groupby([group, "value"], sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[group, "value"], value_cols=["n"], mode=mode).to_pandas()
    if counts.empty:
        return counts
    # explicit (group, value) sort first: tree mode arrives sorted but
    # HASH mode does not, and the tie rule below relies on it — without
    # this, tied modes were nondeterministic under mode="hash"
    counts = counts.sort_values([group, "value"], kind="stable")
    # stable sort by count desc keeps the smallest value first within
    # equal counts
    s = counts.sort_values("n", ascending=False, kind="stable")
    out = s.drop_duplicates(group, keep="first")
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(group).reset_index(drop=True)[[group, "value", "n"]]


def zipf_slope(ds, text_col: str = "text"):
    """Zipf's-law fit: the least-squares slope of ln(frequency) against
    ln(rank) over the corpus vocabulary (rank by count desc, token asc —
    the deterministic tie rule).

    Shape: the corpus shrinks to the vocabulary via
    ``text.vocab_count``'s hash combine (the only shuffle); the
    vocabulary-sized (token, n) table ranks and fits on the driver with
    the exact closed form ``(k*Sxy - Sx*Sy) / (k*Sxx - Sx^2)``.  Returns
    a one-row frame ``(n_tokens, slope)``; round before hashing (ln()
    ulp + sum order).
    """
    from .text import vocab_count

    v = vocab_count(ds, text_col=text_col).to_pandas()
    if v.empty or len(v) < 2:
        return pd.DataFrame({"n_tokens": pd.Series([], dtype=np.int64),
                             "slope": pd.Series([], dtype=np.float64)})
    v = v.sort_values(["n", "token"], ascending=[False, True],
                      kind="stable").reset_index(drop=True)
    lr = np.log(np.arange(1, len(v) + 1, dtype=np.float64))
    lf = np.log(v["n"].to_numpy().astype(np.float64))
    k = float(len(v))
    sx, sy = lr.sum(), lf.sum()
    sxy, sxx = (lr * lf).sum(), (lr * lr).sum()
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    return pd.DataFrame({"n_tokens": np.array([len(v)], dtype=np.int64),
                         "slope": [slope]})


def grouped_collect_set(ds, group: str, col: str, sep: str = ",",
                        mode: str = "tree"):
    """Sorted distinct-value list per group, joined with ``sep`` —
    the ``collect_set`` / ``string_agg(DISTINCT .. ORDER BY ..)``
    primitive.

    Values are joined in LEXICOGRAPHIC (string) order in every mode —
    the order ``string_agg(DISTINCT CAST(v AS VARCHAR), sep ORDER BY
    CAST(v AS VARCHAR))`` produces.

    Shape: per-batch DISTINCT (group, value) pairs (the shrink: the
    value stream never reshuffles, only distinct pairs) -> one combine
    keyed on the pair -> per-group sorted join.  The (group x distinct
    value) key space must fit the chosen combine route, same contract
    as ``grouped_mode``.  Returns ``(group, values, n_distinct)``.
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({group: batch[group].to_pandas(),
                           "value": batch[col].to_pandas()})
        out = df.drop_duplicates([group, "value"])
        out["one"] = np.int64(1)
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[group, "value"], value_cols=["one"], mode=mode,
        agg="max")

    if mode == "hash":
        # group space scales with the data: join distributed, NOTHING on
        # the driver.  Keyed on a BOUNDED group-hash bucket (all of a
        # group's pairs share a bucket), not per-group — map_groups with
        # one task invocation per key is the measured-slow many-tiny-
        # groups pattern (BASELINE.md lesson 7)
        from ..agg import default_partitions

        np_ = default_partitions()
        n_buckets = max(64, np_ * 8)

        def add_bucket(t: pa.Table) -> pa.Table:
            h = (pd.util.hash_pandas_object(
                t[group].to_pandas(), index=False).to_numpy()
                % n_buckets).astype(np.int64)
            return t.append_column("_bkt", pa.array(h, type=pa.int64()))

        def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
            g = g.assign(_vs=g["value"].astype(str)).sort_values(
                [group, "_vs"], kind="stable")
            out = g.groupby(group, sort=True)["_vs"].agg(
                [lambda v: sep.join(v), "size"]).reset_index()
            out.columns = [group, "values", "n_distinct"]
            out["n_distinct"] = out["n_distinct"].astype(np.int64)
            return out

        return pairs.map_batches(add_bucket, batch_format="pyarrow").groupby(
            "_bkt", num_partitions=np_).map_groups(
            join_bucket, batch_format="pandas")

    pairs = pairs if isinstance(pairs, pd.DataFrame) else pairs.to_pandas()
    if pairs.empty:
        return pd.DataFrame({group: pd.Series([], dtype=object),
                             "values": pd.Series([], dtype=object),
                             "n_distinct": pd.Series([], dtype=np.int64)})
    pairs = pairs.assign(_vs=pairs["value"].astype(str)).sort_values(
        [group, "_vs"])
    out = pairs.groupby(group, sort=True)["_vs"].agg(
        [lambda v: sep.join(v), "size"]).reset_index()
    out.columns = [group, "values", "n_distinct"]
    out["n_distinct"] = out["n_distinct"].astype(np.int64)
    return out.reset_index(drop=True)


def pivot_counts(ds, row_key: str, col_key: str, mode: str = "tree"):
    """Pivot: one output row per ``row_key``, one int64 count column per
    distinct ``col_key`` value (lexicographic column order, 0 fill).

    Shape: per-batch (row, col) count partials -> ONE combine.  The
    distinct ``col_key`` set must be small (it becomes the SCHEMA — the
    one driver-resident piece in every mode).  ``mode="tree"``: the
    summary-sized long table pivots on the driver (pandas frame).
    ``mode="hash"`` (row spaces that scale with the data): the column
    set comes from its own tiny combine, the long table regroups by a
    BOUNDED row-key-hash bucket (all of a row's entries share a bucket)
    and each bucket widens with one vectorized ``pivot_table`` against
    the broadcast column list — a Dataset, nothing row-shaped on the
    driver, no per-key task overhead (BASELINE.md lesson 7).
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({row_key: batch[row_key].to_pandas(),
                           col_key: batch[col_key].to_pandas()})
        out = df.groupby([row_key, col_key], sort=False).size().reset_index(
            name="n")
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    long = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[row_key, col_key], value_cols=["n"], mode=mode)

    if mode == "hash":
        from ..agg import default_partitions

        long = long.materialize()
        # the schema: distinct col values via a combine over the long
        # table's already-shrunken (row, col) rows
        cols = combine_partials(
            long.map_batches(
                lambda t: pa.table({col_key: t[col_key],
                                    "_one": pa.array(
                                        np.ones(len(t), dtype=np.int64))}),
                batch_format="pyarrow"),
            keys=[col_key], value_cols=["_one"], mode="tree").to_pandas()
        col_names = sorted(str(c) for c in cols[col_key])

        np_ = default_partitions()
        n_buckets = max(64, np_ * 8)

        def add_bucket(t: pa.Table) -> pa.Table:
            h = (pd.util.hash_pandas_object(
                t[row_key].to_pandas(), index=False).to_numpy()
                % n_buckets).astype(np.int64)
            return t.append_column("_bkt", pa.array(h, type=pa.int64()))

        def widen_bucket(g: pd.DataFrame) -> pd.DataFrame:
            g = g.assign(_cs=g[col_key].astype(str))
            wide = g.pivot_table(index=row_key, columns="_cs", values="n",
                                 aggfunc="sum", fill_value=0)
            wide = wide.reindex(columns=col_names, fill_value=0).astype(
                np.int64)
            return wide.reset_index()

        return long.map_batches(add_bucket, batch_format="pyarrow").groupby(
            "_bkt", num_partitions=np_).map_groups(
            widen_bucket, batch_format="pandas")

    long = long if isinstance(long, pd.DataFrame) else long.to_pandas()
    if long.empty:
        return pd.DataFrame({row_key: pd.Series([], dtype=object)})
    wide = long.pivot_table(index=row_key, columns=col_key, values="n",
                            aggfunc="sum", fill_value=0)
    wide.columns = [str(c) for c in wide.columns]
    wide = wide[sorted(wide.columns)].astype(np.int64)
    return wide.reset_index().sort_values(row_key).reset_index(drop=True)


def grouped_ols(ds, group: str, x: str, y: str, mode: str = "tree"):
    """Per-group ordinary-least-squares fit of ``y`` on ``x`` (both
    integer columns): ``slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)`` and
    ``intercept = (Sy - slope*Sx) / n`` — the regression leg sharing
    :func:`grouped_corr`'s exact integer-moment shape (one pass of five
    int64 partials per group, one combine, closed-form driver finish;
    every float op a fixed-order expression over exactly-summed ints, so
    a SQL oracle computing the same expression agrees bit-for-bit).

    Returns ``(group, n, slope, intercept)``; zero-variance-x groups are
    dropped (the SQL WHERE denominator > 0 rule).
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            group: batch[group].to_pandas(),
            "_x": batch[x].to_numpy(zero_copy_only=False).astype(np.int64),
            "_y": batch[y].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        df["_xy"] = df["_x"] * df["_y"]
        df["_xx"] = df["_x"] * df["_x"]
        df["_n"] = np.int64(1)
        out = (df.groupby(group, sort=False)
               [["_n", "_x", "_y", "_xy", "_xx"]].sum().reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    sums = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[group], value_cols=["_n", "_x", "_y", "_xy", "_xx"],
        mode=mode).to_pandas()
    n = sums["_n"].to_numpy().astype(np.int64)
    sx = sums["_x"].to_numpy().astype(np.int64)
    sy = sums["_y"].to_numpy().astype(np.int64)
    sxy = sums["_xy"].to_numpy().astype(np.int64)
    sxx = sums["_xx"].to_numpy().astype(np.int64)
    vx = n * sxx - sx * sx
    ok = vx > 0
    slope = (n * sxy - sx * sy).astype(np.float64)[ok] / vx.astype(
        np.float64)[ok]
    intercept = (sy.astype(np.float64)[ok]
                 - slope * sx.astype(np.float64)[ok]) / n.astype(
        np.float64)[ok]
    out = pd.DataFrame({group: sums[group][ok], "n": n[ok],
                        "slope": slope, "intercept": intercept})
    return out.sort_values(group).reset_index(drop=True)


def zscore_outliers(ds, group: str, value: str, k: float = 2.0,
                    mode: str = "tree"):
    """Per-group z-score anomaly filter: rows whose integer ``value``
    deviates more than ``k`` population standard deviations from their
    group's mean.

    Two streaming passes, zero row shuffles: (1) per-batch integer
    moment partials ``(group, n, s, q)`` + summary-sized combine;
    (2) the per-group ``(mu, k^2 * var)`` scalars broadcast via
    ``ray.put`` and a vectorized per-batch filter
    ``(x - mu)^2 > k^2 * var``.  All float ops ((s/n), (q/n - mu*mu),
    the squared difference, one compare) are evaluated in the SAME IEEE
    order as the SQL oracle, so the row set matches bit-for-bit; the
    emitted ``zscore`` is likewise a fixed op chain
    ``(x - mu) / sqrt(var)``.  Groups with zero variance can never emit
    (all values equal their mean).
    """
    import ray

    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": batch[group].to_pandas(),
            "x": batch[value].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        df["q"] = df["x"] * df["x"]
        out = df.groupby("g", sort=False).agg(
            n=("x", "size"), s=("x", "sum"), q=("q", "sum")).reset_index()
        out = out.rename(columns={"g": group})
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    stats = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=[group], value_cols=["n", "s", "q"], mode=mode).to_pandas()
    n = stats["n"].to_numpy().astype(np.float64)
    s = stats["s"].to_numpy().astype(np.float64)
    q = stats["q"].to_numpy().astype(np.float64)
    mu = s / n
    var = q / n - mu * mu
    table = {g: (float(m), float(v))
             for g, m, v in zip(stats[group], mu, var)}
    ref = ray.put(table)
    kk = float(k) * float(k)

    def flag(batch: pa.Table) -> pa.Table:
        t = ray.get(ref)
        gs = batch[group].to_numpy(zero_copy_only=False)
        x = batch[value].to_numpy(zero_copy_only=False).astype(np.float64)
        # dict lookups only on the UNIQUE groups in the batch (the group
        # space is summary-sized); rows gather by inverse index
        uniq, inv = np.unique(gs, return_inverse=True)
        mus = np.array([t[g][0] for g in uniq], dtype=np.float64)[inv]
        vs = np.array([t[g][1] for g in uniq], dtype=np.float64)[inv]
        d = x - mus
        keep = d * d > kk * vs
        sub = batch.filter(pa.array(keep))
        z = (x[keep] - mus[keep]) / np.sqrt(vs[keep])
        return sub.append_column("zscore", pa.array(z, type=pa.float64()))

    return ds.map_batches(flag, batch_format="pyarrow")


def mad_outliers(ds, group: str = "event_type", value_col: str = "value",
                 id_col: str = "event_id", scale: int = 64,
                 k_num: int = 3, k_den: int = 1):
    """Robust per-group outlier flags via the median absolute deviation
    (Hampel's MAD rule, public literature) — the heavy-tail-safe cousin
    of :func:`zscore_outliers`.

    All-integer formulation: on ``x = floor(value * scale)`` int64,
    ``med`` is the exact type-1 per-group median (the grouped_quantiles
    definition), ``mad`` the same median of ``|x − med|``, and a row is
    an outlier iff ``|x − med| * k_den > k_num * mad`` — pure integer
    comparisons, no float anywhere, so a SQL replay is bit-exact.
    (When mad == 0, any deviation flags — the documented degenerate-MAD
    convention.)

    Shape: two (group, value)-count combines (the quantile shrink —
    raw rows never shuffle for the statistics), both medians broadcast
    as a per-group dict, one final stateless flag pass over the stream.
    Returns ``id_col, group, x, med, mad, is_out`` per row.
    """
    from .quantile import grouped_quantiles

    import ray

    def to_int(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        # drop non-finite rows BEFORE the int cast (a NaN casts to a
        # platform-defined garbage int64); matches the SQL oracle, whose
        # NULL rows fall out of the aggregate (ADVICE r3)
        fin = np.isfinite(v)
        if not fin.all():
            batch, v = batch.filter(pa.array(fin)), v[fin]
        x = np.floor(v * scale).astype(np.int64)
        return pa.table({id_col: batch[id_col], group: batch[group],
                         "_x": pa.array(x, type=pa.int64())})

    # materialize the 3-int-column slim stream ONCE: three consumers
    # (median pass, MAD pass, flag pass) would otherwise re-run the
    # parquet scan + floor map three times
    slim = ds.map_batches(to_int, batch_format="pyarrow").materialize()

    med_df = grouped_quantiles(slim, group, "_x", [0.5]).to_pandas()
    med = dict(zip(med_df[group], med_df["value"].astype(np.int64)))
    # object-store broadcast (the zscore_outliers pattern): ship the
    # per-group dicts once, not with every task's function payload
    med_ref = ray.put(med)

    def add_dev(batch: pa.Table) -> pa.Table:
        m = batch[group].to_pandas().map(
            ray.get(med_ref)).to_numpy(dtype=np.int64)
        d = np.abs(batch["_x"].to_numpy(zero_copy_only=False) - m)
        return batch.append_column("_d", pa.array(d, type=pa.int64()))

    dev = slim.map_batches(add_dev, batch_format="pyarrow")
    mad_df = grouped_quantiles(dev, group, "_d", [0.5]).to_pandas()
    mad = dict(zip(mad_df[group], mad_df["value"].astype(np.int64)))
    mad_ref = ray.put(mad)

    def flag(batch: pa.Table) -> pa.Table:
        g = batch[group].to_pandas()
        m = g.map(ray.get(med_ref)).to_numpy(dtype=np.int64)
        md = g.map(ray.get(mad_ref)).to_numpy(dtype=np.int64)
        x = batch["_x"].to_numpy(zero_copy_only=False)
        d = np.abs(x - m)
        is_out = (d * k_den > k_num * md).astype(np.int64)
        return pa.table({
            id_col: batch[id_col], group: batch[group],
            "x": pa.array(x, type=pa.int64()),
            "med": pa.array(m, type=pa.int64()),
            "mad": pa.array(md, type=pa.int64()),
            "is_out": pa.array(is_out, type=pa.int64()),
        })

    return slim.map_batches(flag, batch_format="pyarrow")


def gini(ds, key: str = "source", weight: Optional[str] = None):
    """Gini coefficient of concentration over per-key masses — how
    unequally traffic / page volume distributes across domains (the
    standard inequality index; Gini 1912, public literature).

    Exact rational formulation on the sorted per-key counts
    ``c_1 <= ... <= c_n``:

        G = (2 * Σ i·c_i − (n + 1) · Σc) / (n · Σc)

    Numerator and denominator are exact int64 (one summary-sized
    combine shrinks rows to per-key counts first; the sort touches only
    n keys), and ``G`` is their single IEEE quotient — bit-equal to a
    row_number window replay in SQL.

    Returns a one-row DataFrame ``(n_keys, total, num, gini)``.
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"k": batch[key].to_pandas()})
        if weight is not None:
            df["w"] = batch[weight].to_numpy(
                zero_copy_only=False).astype(np.int64)
        else:
            df["w"] = np.int64(1)
        out = df.groupby("k", sort=False)["w"].sum().reset_index(name="c")
        out["c"] = out["c"].astype(np.int64)
        return pa.Table.from_pandas(
            out, preserve_index=False,
            schema=pa.schema([("k", batch.schema.field(key).type),
                              ("c", pa.int64())]))

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["k"], value_cols=["c"], mode="hash").to_pandas()
    if "k" not in counts.columns or not len(counts):
        return pd.DataFrame({"n_keys": pd.Series([], dtype=np.int64),
                             "total": pd.Series([], dtype=np.int64),
                             "num": pd.Series([], dtype=np.int64),
                             "gini": pd.Series([], dtype=np.float64)})
    # ties broken by key so the rank assignment is deterministic (any
    # tie order yields the same Σ i·c_i when the tied c are equal, but
    # the SQL row_number needs a total order)
    c = counts.sort_values(["c", "k"], kind="stable")["c"].to_numpy() \
        .astype(np.int64)
    n = np.int64(len(c))
    tot = np.int64(c.sum())
    i = np.arange(1, len(c) + 1, dtype=np.int64)
    num = np.int64(2 * np.int64((i * c).sum()) - (n + 1) * tot)
    g = np.float64(num) / np.float64(n * tot) if tot > 0 else np.float64(0)
    return pd.DataFrame({"n_keys": np.array([n]), "total": np.array([tot]),
                         "num": np.array([num]),
                         "gini": np.array([g], dtype=np.float64)})


def ks_two_sample(ds, group: str, value_col: str, a, b, scale: int = 64,
                  max_driver_rows: int = 5_000_000):
    """Two-sample Kolmogorov-Smirnov distance between the ``value``
    distributions of groups ``a`` and ``b`` — the classic drift test
    between cohorts.

    Exact rational formulation on ``x = floor(value * scale)`` int64:
    with per-value cumulative counts ``A_v``/``B_v`` and totals
    ``n1``/``n2``, ``D = max_v |A_v·n2 − B_v·n1| / (n1·n2)`` — the
    numerator is an exact int64 max and ``D`` one IEEE quotient, so the
    cumulative-window SQL replay is bit-exact.

    Shape: rows shrink to per-value count pairs in one hash combine
    (distinct-value space, the exact_quantiles budget); the read-off is
    a driver cumsum over that shrunken table.  Returns one row
    ``(n1, n2, num, d)``.
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group].to_pandas().to_numpy(dtype=object)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        x = np.floor(np.where(np.isfinite(v), v, 0.0)
                     * scale).astype(np.int64)
        # non-finite rows are excluded (the oracle's NULL rows fall out
        # of the aggregate; a NaN would cast to garbage int64, ADVICE r3)
        in_a, in_b = g == a, g == b
        keep = (in_a | in_b) & np.isfinite(v)
        df = pd.DataFrame({"v": x[keep],
                           "ca": in_a[keep].astype(np.int64),
                           "cb": in_b[keep].astype(np.int64)})
        out = df.groupby("v", sort=False).sum().reset_index()
        for c in ("ca", "cb"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["v"], value_cols=["ca", "cb"], mode="hash").to_pandas()
    if len(counts) > max_driver_rows:
        raise ValueError(
            f"ks_two_sample: {len(counts)} distinct values exceed the "
            f"{max_driver_rows}-row driver budget — coarsen scale")
    empty = pd.DataFrame({"n1": pd.Series([], dtype=np.int64),
                          "n2": pd.Series([], dtype=np.int64),
                          "num": pd.Series([], dtype=np.int64),
                          "d": pd.Series([], dtype=np.float64)})
    if "v" not in counts.columns or not len(counts):
        return empty
    counts = counts.sort_values("v")
    cuma = counts["ca"].cumsum().to_numpy().astype(np.int64)
    cumb = counts["cb"].cumsum().to_numpy().astype(np.int64)
    n1, n2 = int(cuma[-1]), int(cumb[-1])
    if n1 == 0 or n2 == 0:
        return empty
    if n1 * n2 < 2**62:  # |cum*n| <= n1*n2: int64-safe fast path
        num = int(np.abs(cuma * np.int64(n2) - cumb * np.int64(n1)).max())
    else:
        # arbitrary-precision slow path (matches the oracle's HUGEINT):
        # cohorts past ~2^31 rows each would silently wrap int64
        num = max(abs(int(a) * n2 - int(b) * n1)
                  for a, b in zip(cuma.tolist(), cumb.tolist()))
    num = np.int64(num)
    d = np.float64(num) / np.float64(n1 * n2)
    return pd.DataFrame({"n1": np.array([n1]), "n2": np.array([n2]),
                         "num": np.array([num]),
                         "d": np.array([d], dtype=np.float64)})


def benford(ds, value_col: str, scale: int = 100):
    """First-significant-digit distribution vs Benford's law (Newcomb
    1881 / Benford 1938, public literature) — the classic forensic
    screen for fabricated numeric data.

    Exact digit extraction: values become integers ``c = floor(v *
    scale)`` and the first digit is the leading character of the
    decimal string — no float log10 anywhere near the counts.  Counts
    are exact int64 from one tiny combine (9 keys); ``frac`` is one
    IEEE division and ``benford`` the round-6 ``log10(1 + 1/d)``
    expectation (the zipf float contract).  Non-positive values are
    excluded.

    Returns 9 rows ``(digit, n, frac, benford)``.
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        c = np.floor(v * scale).astype(np.int64)
        c = c[c > 0]
        first = pd.Series(c).astype(str).str[0].astype(np.int64)
        out = first.value_counts().rename_axis("digit").reset_index(name="n")
        out["digit"] = out["digit"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False, schema=pa.schema(
            [("digit", pa.int64()), ("n", pa.int64())]))

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["digit"], value_cols=["n"], mode="tree").to_pandas()
    full = pd.DataFrame({"digit": np.arange(1, 10, dtype=np.int64)})
    out = full.merge(counts, on="digit", how="left")
    out["n"] = out["n"].fillna(0).astype(np.int64)
    total = int(out["n"].sum())
    out["frac"] = (out["n"].to_numpy().astype(np.float64)
                   / np.float64(total)) if total else np.float64(0)
    d = out["digit"].to_numpy().astype(np.float64)
    out["benford"] = np.round(np.log10(1.0 + 1.0 / d), 6)
    return out.sort_values("digit").reset_index(drop=True)


def mannwhitney_u(ds, group: str, value_col: str, a, b, scale: int = 64):
    """Mann-Whitney U (Wilcoxon rank-sum) between two cohorts — the
    rank-based companion of :func:`ks_two_sample`, and its ``auc``
    output is the common-language effect size P(X_a > X_b) + ½P(=).

    Exact doubled-midrank formulation on ``x = floor(value * scale)``
    int64: for each distinct value with cohort counts ``ca``/``cb`` and
    exclusive merged cumulative ``cum``, the doubled midrank is
    ``2·cum + (ca + cb) + 1`` (an integer — doubling absorbs the tie
    half-ranks), so ``2·U1 = Σ ca·(2·cum + ct + 1) − n1·(n1 + 1)`` is
    exact int64 and ``auc = 2U1 / (2·n1·n2)`` one IEEE quotient —
    bit-exact under the SQL window replay.  (int64-safe to ~2·10⁹ rows
    per cohort, the ks_two_sample bound.)

    Same shape as the KS test: one per-value count combine, driver
    read-off over the distinct-value shrink.  Returns one row
    ``(n1, n2, u2, auc)``.
    """
    from ..agg import combine_partials

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[group].to_pandas().to_numpy(dtype=object)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        x = np.floor(np.where(np.isfinite(v), v, 0.0)
                     * scale).astype(np.int64)
        # non-finite rows are excluded (the oracle's NULL rows fall out
        # of the aggregate; a NaN would cast to garbage int64, ADVICE r3)
        in_a, in_b = g == a, g == b
        keep = (in_a | in_b) & np.isfinite(v)
        df = pd.DataFrame({"v": x[keep],
                           "ca": in_a[keep].astype(np.int64),
                           "cb": in_b[keep].astype(np.int64)})
        out = df.groupby("v", sort=False).sum().reset_index()
        for c in ("ca", "cb"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["v"], value_cols=["ca", "cb"], mode="hash").to_pandas()
    empty = pd.DataFrame({"n1": pd.Series([], dtype=np.int64),
                          "n2": pd.Series([], dtype=np.int64),
                          "u2": pd.Series([], dtype=np.int64),
                          "auc": pd.Series([], dtype=np.float64)})
    if "v" not in counts.columns or not len(counts):
        return empty
    counts = counts.sort_values("v")
    ca = counts["ca"].to_numpy().astype(np.int64)
    cb = counts["cb"].to_numpy().astype(np.int64)
    ct = ca + cb
    cum_excl = np.concatenate([[0], np.cumsum(ct)[:-1]]).astype(np.int64)
    n1, n2 = int(ca.sum()), int(cb.sum())
    if n1 == 0 or n2 == 0:
        return empty
    r1d = int((ca * (2 * cum_excl + ct + 1)).sum())
    u2 = np.int64(r1d - n1 * (n1 + 1))
    auc = np.float64(u2) / np.float64(2 * n1 * n2)
    return pd.DataFrame({"n1": np.array([n1], dtype=np.int64),
                         "n2": np.array([n2], dtype=np.int64),
                         "u2": np.array([u2]),
                         "auc": np.array([auc], dtype=np.float64)})

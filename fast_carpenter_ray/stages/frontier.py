"""Language-frontier cells: grid cells whose dominant page language
differs from their neighborhood's dominant language — geographic
language boundaries in the crawl (reference analogue: none; a SURVEY
§2.5 geospatial-x-webtext extension like hotspot / colocation).

Per occupied cell the DOMINANT language is the per-cell count argmax
(ties broken by language code ascending); the NEIGHBORHOOD dominant is
the same argmax over counts summed across the (2*ring+1)^2 wrap/clamp
Chebyshev neighborhood (self included).  A cell is a frontier cell when
the two differ.

Shape (no per-row or per-group Python anywhere):

1. per-batch ``(cell, lang, n)`` count partials -> ONE hash combine
   (key space = occupied cells x langs);
2. the distinct language vocabulary tree-combines (langs are a handful)
   and broadcasts as a code map;
3. the symmetric ring scatter (as in :mod:`hotspot`) carries tagged
   own/neighborhood counts so ONE ``groupby(cell, lang)`` sums both;
4. per-cell argmax WITHOUT map_groups: each (cell, lang) row encodes
   ``score = n * K + (K - 1 - code)`` (K = vocabulary size), so a
   native ``Max`` per cell decodes to (max count, then smallest
   language) — the exact SQL ``ORDER BY n DESC, lang`` tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.cells import cell_id, k_ring

__all__ = ["language_frontiers"]


def language_frontiers(ds, res: int = 6, ring: int = 1,
                       lat: str = "lat", lng: str = "lng",
                       lang: str = "lang"):
    """``(cell, own_lang, nbhd_lang, frontier)`` rows for every occupied
    cell (frontier = 1 when the dominants differ)."""
    from ray.data.aggregate import Max

    from ..agg import combine_partials, default_partitions

    def partial(batch: pa.Table) -> pa.Table:
        c = cell_id(batch[lat].to_numpy(zero_copy_only=False),
                    batch[lng].to_numpy(zero_copy_only=False), res)
        lg = np.asarray(batch[lang].to_pylist(), dtype=object)
        ok = c >= 0
        df = pd.DataFrame({"cell": c[ok], "lang": lg[ok]})
        out = (df.groupby(["cell", "lang"], as_index=False).size()
               .rename(columns={"size": "n"}))
        out["n"] = out["n"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = combine_partials(
        ds.map_batches(partial, batch_format="pyarrow"),
        keys=["cell", "lang"], value_cols=["n"], mode="hash").materialize()

    # language vocabulary: summary-sized, tree combine then broadcast
    def lang_partial(batch: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(batch["lang"].to_pylist(), dtype=object))
        return pa.table({"lang": pa.array(u, type=pa.string()),
                         "one": pa.array(np.ones(len(u), dtype=np.int64))})

    vocab = combine_partials(
        counts.map_batches(lang_partial, batch_format="pyarrow"),
        keys=["lang"], value_cols=["one"], mode="tree").to_pandas()
    langs = sorted(vocab["lang"].tolist())
    if not langs:
        return pd.DataFrame({
            "cell": pd.Series([], dtype="int64"),
            "own_lang": pd.Series([], dtype="object"),
            "nbhd_lang": pd.Series([], dtype="object"),
            "frontier": pd.Series([], dtype="int64")})
    code = {l: i for i, l in enumerate(langs)}
    k_langs = len(langs)

    def scatter(batch: pa.Table) -> pa.Table:
        cells = batch["cell"].to_numpy(zero_copy_only=False)
        lg = np.asarray(batch["lang"].to_pylist(), dtype=object)
        n = batch["n"].to_numpy(zero_copy_only=False)
        cd = np.fromiter((code[x] for x in lg), dtype=np.int64,
                         count=len(lg))
        out_cell = [cells]
        out_code = [cd]
        out_own = [n]
        out_nb = [n]
        for c, co, cn in zip(cells.tolist(), cd.tolist(), n.tolist()):
            nbrs = k_ring(int(c), res, ring)
            nbrs = nbrs[nbrs != c]
            out_cell.append(nbrs)
            out_code.append(np.full(len(nbrs), co, dtype=np.int64))
            out_own.append(np.zeros(len(nbrs), dtype=np.int64))
            out_nb.append(np.full(len(nbrs), cn, dtype=np.int64))
        return pa.table({
            "cell": pa.array(np.concatenate(out_cell), type=pa.int64()),
            "code": pa.array(np.concatenate(out_code), type=pa.int64()),
            "own": pa.array(np.concatenate(out_own), type=pa.int64()),
            "nb": pa.array(np.concatenate(out_nb), type=pa.int64()),
        })

    from ray.data.aggregate import Sum

    per_cl = (counts.map_batches(scatter, batch_format="pyarrow")
              .groupby(["cell", "code"],
                       num_partitions=default_partitions())
              .aggregate(Sum("own", alias_name="own_n"),
                         Sum("nb", alias_name="nbhd_n")))

    def encode(t: pa.Table) -> pa.Table:
        cd = t["code"].to_numpy(zero_copy_only=False).astype(np.int64)
        own = t["own_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = t["nbhd_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tie = k_langs - 1 - cd
        own_score = np.where(own > 0, own * k_langs + tie, -1)
        nb_score = nb * k_langs + tie        # nb > 0 always on these rows
        return pa.table({"cell": t["cell"].cast(pa.int64()),
                         "own_score": pa.array(own_score),
                         "nb_score": pa.array(nb_score)})

    per_cell = (per_cl.map_batches(encode, batch_format="pyarrow")
                .groupby("cell", num_partitions=default_partitions())
                .aggregate(Max("own_score", alias_name="own_best"),
                           Max("nb_score", alias_name="nb_best")))

    inv = np.array(langs, dtype=object)

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        occ = t.filter(pc.greater_equal(t["own_best"], 0))
        ob = occ["own_best"].to_numpy(zero_copy_only=False)
        nb = occ["nb_best"].to_numpy(zero_copy_only=False)
        own_code = k_langs - 1 - (ob % k_langs)
        nb_code = k_langs - 1 - (nb % k_langs)
        return pa.table({
            "cell": occ["cell"].cast(pa.int64()),
            "own_lang": pa.array(inv[own_code], type=pa.string()),
            "nbhd_lang": pa.array(inv[nb_code], type=pa.string()),
            "frontier": pa.array((own_code != nb_code).astype(np.int64)),
        })

    return per_cell.map_batches(decode, batch_format="pyarrow")

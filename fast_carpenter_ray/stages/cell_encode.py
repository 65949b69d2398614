"""Vectorized lat/lng -> cell-id stage (Define-shaped).

North star: "a vectorized H3/S2 cell-encode stage (batched lat/lng-to-cell
via h3 int API on geolocated page records)".  The cell function lives in
``fast_carpenter_ray.geo.cells`` (swappable for the real h3 int API); this
stage is the Define-shaped column creator wiring it into the batch chain
(reference analogue: ``define/variables.py:70-75`` appending one computed
column per event block).
"""

from __future__ import annotations

import pyarrow as pa

from ..geo.cells import cell_id, parent, RESOLUTION_DEFAULT

__all__ = ["CellEncode"]


class CellEncode:
    def __init__(self, res: int = RESOLUTION_DEFAULT, out: str = "cell",
                 lat: str = "lat", lng: str = "lng", parent_res: int | None = None):
        self.res = res
        self.out = out
        self.lat = lat
        self.lng = lng
        self.parent_res = parent_res

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch[self.lat].to_numpy(zero_copy_only=False)
        lng = batch[self.lng].to_numpy(zero_copy_only=False)
        cells = cell_id(lat, lng, self.res)
        batch = batch.append_column(self.out, pa.array(cells, type=pa.int64()))
        if self.parent_res is not None:
            batch = batch.append_column(
                f"{self.out}_r{self.parent_res}",
                pa.array(parent(cells, self.res, self.parent_res), type=pa.int64()))
        return batch

    def apply(self, ds):
        return ds.map_batches(self, batch_format="pyarrow")

"""Great-circle distance kernels (vectorized NumPy)."""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_008.8  # IUGG mean earth radius


def haversine_m(lat1, lng1, lat2, lng2) -> np.ndarray:
    """Haversine distance in metres; broadcasts like numpy.

    Used by the kNN join's distance-refinement step (north star: "kNN via
    k-ring expansion with distance refinement").
    """
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    dlat = lat2 - lat1
    dlng = np.radians(np.asarray(lng2, dtype=np.float64)) - np.radians(
        np.asarray(lng1, dtype=np.float64)
    )
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlng / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))

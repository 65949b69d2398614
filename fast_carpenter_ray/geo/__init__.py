from .cells import cell_id, cell_xy, parent, k_ring, cell_bounds, RESOLUTION_DEFAULT  # noqa: F401
from .distance import haversine_m, EARTH_RADIUS_M  # noqa: F401
from .pip import Polygon, points_in_polygon, PolygonIndex  # noqa: F401

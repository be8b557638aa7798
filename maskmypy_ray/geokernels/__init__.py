"""Pure-numpy geometry kernels (no Ray, no shapely/geopandas — SURVEY.md §7.1)."""

from .geometry import latlon_to_xy, xy_to_latlon, planar_distance  # noqa: F401
from .cells import cell_of_latlon, cell_of_xy, cover_circle_xy, neighbors_xy  # noqa: F401
from .pip import PolygonSet  # noqa: F401

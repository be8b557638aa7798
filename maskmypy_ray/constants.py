"""Engine-wide constants.

The engine operates on lat/lon (EPSG:4326-style) coordinates geoparsed from
web-page text and converts them to planar meters via a fixed local
equirectangular projection so that distance math matches the reference's
meter-based CRS semantics (reference fixtures use EPSG:26910 meters,
``/root/reference/tests/conftest.py:31-33``).

Every constant here is mirrored verbatim (via ``repr``) into the DuckDB
oracle SQL emitted by :mod:`maskmypy_ray.oracle`, so engine and oracle do
bit-identical float arithmetic.
"""

from __future__ import annotations

import math

# Default seed used by deterministic fixtures / queries (driver testdata seed).
DEFAULT_SEED = 42

# Local projection origin — center of the Vancouver-ish fixture bbox
# (FIXTURES.md F1: lon in [-123.19, -123.07], lat in [49.21, 49.27]).
LAT0 = 49.24
LON0 = -123.13

# Meters per degree at the projection origin (equirectangular).
METERS_PER_DEG_LAT = 111320.0
METERS_PER_DEG_LON = 111320.0 * math.cos(math.radians(LAT0))

# Fixture bbox in micro-degrees (6-decimal fixed point) used by the
# deterministic web-page derivation (sources/webpages.py and oracle.py).
LAT_BASE_MICRO = 49_210_000  # 49.210000
LAT_SPAN_MICRO = 60_000  # -> lat < 49.270000
LON_FRAC_BASE_MICRO = 70_000  # fraction digits of -123.070000
LON_SPAN_MICRO = 120_000  # -> lon > -123.190000
COORD_PROB = 0.9  # fraction of pages embedding a coordinate pair

# Containment grid (regular rectangular census-tract-style tiling of the
# fixture bbox, in planar meters). 6 x 4 = 24 polygons; the engine treats
# them as arbitrary polygons (general PIP kernel), while the oracle can
# locate them arithmetically.
GRID_NX = 6
GRID_NY = 4

# Planar bbox of the fixture in meters (derived; small slack added).
X_MIN = (-123.19 - LON0) * METERS_PER_DEG_LON
X_MAX = (-123.07 - LON0) * METERS_PER_DEG_LON
Y_MIN = (49.21 - LAT0) * METERS_PER_DEG_LAT
Y_MAX = (49.27 - LAT0) * METERS_PER_DEG_LAT

# Max rejection-sampling rounds for containment (reference loops forever:
# /root/reference/maskmypy/masks/donut.py:163-168; we cap + mark UNMASKED).
MAX_CONTAIN_ROUNDS = 16

# Addresses synthesized per document row (FIXTURES.md F2).
ADDRESSES_PER_DOC = 4

# Global equal-angle cell resolution for the partitioning tile key
# (H3/S2 role per north_star; 2^15 x 2^15 grid, ~1.2 km cells).
GLOBAL_CELL_RES = 15

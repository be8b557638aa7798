"""Planar projection + distance kernels (vectorized numpy).

Replaces the reference's pyproj CRS handling (`/root/reference/maskmypy/
tools.py:172-180`, meter-based test CRS EPSG:26910): a fixed local
equirectangular projection maps fixture lat/lon to planar meters. Constants
live in :mod:`maskmypy_ray.constants` and are mirrored into the oracle SQL.
"""

from __future__ import annotations

import numpy as np

from ..constants import LAT0, LON0, METERS_PER_DEG_LAT, METERS_PER_DEG_LON


def latlon_to_xy(lat: np.ndarray, lon: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Project lat/lon degrees to local planar meters (equirectangular)."""
    x = (np.asarray(lon, dtype=np.float64) - LON0) * METERS_PER_DEG_LON
    y = (np.asarray(lat, dtype=np.float64) - LAT0) * METERS_PER_DEG_LAT
    return x, y


def xy_to_latlon(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lat = np.asarray(y, dtype=np.float64) / METERS_PER_DEG_LAT + LAT0
    lon = np.asarray(x, dtype=np.float64) / METERS_PER_DEG_LON + LON0
    return lat, lon


def planar_distance(x1, y1, x2, y2) -> np.ndarray:
    """Euclidean distance in meters; mirrors GeoSeries.distance on a
    projected CRS (`/root/reference/maskmypy/analysis.py:104`)."""
    dx = np.asarray(x2, dtype=np.float64) - np.asarray(x1, dtype=np.float64)
    dy = np.asarray(y2, dtype=np.float64) - np.asarray(y1, dtype=np.float64)
    return np.sqrt(dx * dx + dy * dy)


def nearest_point_on_segments(
    px: float, py: float, ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For one point and N segments (a->b), the nearest point on each
    segment and its squared distance. Used by the voronoi mask
    (nearest-point-on-edge semantics, `/root/reference/maskmypy/masks/
    voronoi.py:67-68`)."""
    dx = bx - ax
    dy = by - ay
    seg_len2 = dx * dx + dy * dy
    # t = clamp(((p-a).(b-a)) / |b-a|^2, 0, 1); guard zero-length segments
    t = ((px - ax) * dx + (py - ay) * dy) / np.where(seg_len2 > 0, seg_len2, 1.0)
    t = np.clip(t, 0.0, 1.0)
    qx = ax + t * dx
    qy = ay + t * dy
    d2 = (px - qx) ** 2 + (py - qy) ** 2
    return qx, qy, d2

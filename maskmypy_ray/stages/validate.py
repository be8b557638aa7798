"""Validation + bbox tools (T5/T6/T7).

Reference `/root/reference/maskmypy/tools.py:150-180`: bbox pad/crop and
geometry/CRS validation. The engine's CRS is a fixed metadata contract
(lat/lon degrees + the local planar projection in constants.py), so CRS
validation reduces to a coordinate-domain check at pipeline build; the
geometry-type check becomes a schema + finite/bounds assertion over lat,
lon columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pad_bbox(bbox: tuple[float, float, float, float], padding: float):
    """Expand (minx, miny, maxx, maxy) by ``padding`` fraction per side
    (mirror of tools._pad, `tools.py:155-162`)."""
    minx, miny, maxx, maxy = bbox
    px = (maxx - minx) * padding
    py = (maxy - miny) * padding
    return (minx - px, miny - py, maxx + px, maxy + py)


def crop(ds, bbox: tuple[float, float, float, float], padding: float = 0.0,
         x_col: str = "x", y_col: str = "y"):
    """Keep rows inside the padded bbox (mirror of tools._crop,
    `tools.py:150-152`) — a vectorized batch filter, no shuffle."""
    minx, miny, maxx, maxy = pad_bbox(bbox, padding) if padding else bbox

    def f(b: pa.Table) -> pa.Table:
        x = b.column(x_col)
        y = b.column(y_col)
        keep = pc.and_(
            pc.and_(pc.greater_equal(x, minx), pc.less_equal(x, maxx)),
            pc.and_(pc.greater_equal(y, miny), pc.less_equal(y, maxy)))
        return b.filter(keep)

    return ds.map_batches(f, batch_format="pyarrow")


def dataset_bbox(ds, x_col: str = "x", y_col: str = "y"):
    """(minx, miny, maxx, maxy) via streaming aggregates."""
    from ray.data.aggregate import Max, Min

    a = ds.aggregate(Min(x_col), Min(y_col), Max(x_col), Max(y_col))
    return (a[f"min({x_col})"], a[f"min({y_col})"], a[f"max({x_col})"], a[f"max({y_col})"])


def validate_points_batch(batch: pa.Table) -> pa.Table:
    """Assert the point contract: finite lat/lon in domain, no
    null-island (0, 0) artifacts (mirror of _validate_geom_type's role,
    `tools.py:165-169`). Raises ValueError on violation."""
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    if not np.isfinite(lat).all() or not np.isfinite(lon).all():
        raise ValueError("Point layer contains non-finite coordinates.")
    if ((lat < -90) | (lat > 90)).any() or ((lon < -180) | (lon > 180)).any():
        raise ValueError("Point layer contains out-of-domain lat/lon.")
    if ((lat == 0.0) & (lon == 0.0)).any():
        raise ValueError("Point layer contains null-island (0, 0) points.")
    return batch


def validate_points(ds):
    return ds.map_batches(validate_points_batch, batch_format="pyarrow")


def validate_schema(ds, required: dict[str, pa.DataType]) -> None:
    """Build-time schema check (cheap; raises before execution starts)."""
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    for col, typ in required.items():
        if col not in types:
            raise ValueError(f"Missing required column {col!r}.")
        if typ is not None and types[col] != typ:
            raise ValueError(f"Column {col!r} has type {types[col]}, expected {typ}.")

"""Geoparse stage: extract lat/lon from web-page text (graft-mandated
stateless map over the input_hint table; no reference counterpart —
SURVEY.md §2.5 "Per-record maps").

Vectorized with ``pyarrow.compute.extract_regex`` (RE2, first match), the
same regex DuckDB's ``regexp_extract`` uses in the oracle. ``text`` passes
through untouched (byte-identity invariant).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..constants import GLOBAL_CELL_RES
from ..geokernels.cells import cell_of_latlon
from ..geokernels.geometry import latlon_to_xy

# First "<±d{1,3}.dddddd>, <±d{1,3}.dddddd>" pair in the page text.
COORD_PATTERN = r"(?P<glat>-?[0-9]{1,3}\.[0-9]{6}), (?P<glon>-?[0-9]{1,3}\.[0-9]{6})"


def geoparse_batch(batch: pa.Table, drop_unparsed: bool = True) -> pa.Table:
    """Add ``lat``, ``lon`` (degrees) and ``x``, ``y`` (planar meters).

    Rows without a coordinate pair are dropped when ``drop_unparsed``
    (reference masks operate on all-point layers; pages without
    coordinates have no point to mask).
    """
    text = batch.column("text")
    ext = pc.extract_regex(text, COORD_PATTERN)
    valid = ext.is_valid()
    if drop_unparsed:
        batch = batch.filter(valid)
        ext = ext.filter(valid)
    lat = pc.cast(pc.struct_field(ext, "glat"), pa.float64())
    lon = pc.cast(pc.struct_field(ext, "glon"), pa.float64())
    lat_np = lat.to_numpy(zero_copy_only=False)
    lon_np = lon.to_numpy(zero_copy_only=False)
    x, y = latlon_to_xy(lat_np, lon_np)
    batch = batch.append_column("lat", lat)
    batch = batch.append_column("lon", lon)
    batch = batch.append_column("x", pa.array(x, type=pa.float64()))
    batch = batch.append_column("y", pa.array(y, type=pa.float64()))
    # Global partitioning tile (H3/S2 role): equal-angle quadkey cell.
    cell = cell_of_latlon(lat_np, lon_np, GLOBAL_CELL_RES)
    batch = batch.append_column("cell", pa.array(cell, type=pa.int64()))
    return batch


def geoparse(ds, drop_unparsed: bool = True):
    """Apply the geoparse stage to a webpages Dataset."""
    return ds.map_batches(
        lambda b: geoparse_batch(b, drop_unparsed=drop_unparsed),
        batch_format="pyarrow",
    )


def parse_points_arrays(batch: pa.Table, dtype=None):
    """Bandwidth-lean parse for the fused flagship: returns numpy
    ``(doc_id, x, y)`` for rows with a coordinate pair, skipping the
    lat/lon/cell columns and (optionally) narrowing coords to ``dtype``
    (float32 halves the per-point memory traffic through the fused
    mask→k chain; the driver-facing queries stay on the float64
    :func:`geoparse_batch` path)."""
    import numpy as np

    ext = pc.extract_regex(batch.column("text"), COORD_PATTERN)
    valid = ext.is_valid()
    ext = ext.filter(valid)
    doc = batch.column("doc_id").filter(valid).to_numpy(zero_copy_only=False)
    lat = pc.cast(pc.struct_field(ext, "glat"), pa.float64()).to_numpy(
        zero_copy_only=False)
    lon = pc.cast(pc.struct_field(ext, "glon"), pa.float64()).to_numpy(
        zero_copy_only=False)
    x, y = latlon_to_xy(lat, lon)
    if dtype is not None:
        x = x.astype(dtype)
        y = y.astype(dtype)
    return doc, x, y


def geo_scrub_batch(batch: pa.Table, token: str = "<GEO>") -> pa.Table:
    """Scrub coordinate mentions from page TEXT — the string-space twin
    of the geometry masks: after donut/street/voronoi displace the
    point, the verbatim "lat, lon" span left in the prose still leaks
    the original location, so it is replaced with a typed token.
    (Deliberately breaks the byte-identity invariant — this is the one
    stage whose JOB is to edit text; pipelines choose it explicitly.)

    One RE2 replace + one RE2 count per batch; DuckDB shares the RE2
    engine so the oracle is byte-exact."""
    pat = r"(-?[0-9]{1,3}\.[0-9]{6}), (-?[0-9]{1,3}\.[0-9]{6})"
    text = batch.column("text")
    return pa.table({
        "url": batch.column("url"),
        "text": pc.replace_substring_regex(text, pat, token),
        "n_scrubbed": pc.cast(pc.count_substring_regex(text, pat), pa.int64()),
    })


def geo_scrub(ds, token: str = "<GEO>"):
    """(url, scrubbed text, n_scrubbed) over a webpages Dataset."""
    return ds.map_batches(lambda b: geo_scrub_batch(b, token),
                          batch_format="pyarrow")

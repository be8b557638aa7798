"""Container / census-tract polygon fixture (FIXTURES.md F3).

A regular ``GRID_NX x GRID_NY`` rectangular tiling of the fixture bbox in
planar meters, mirroring the reference's 22 non-overlapping boundary
polygons (`/root/reference/tests/data/boundary.geojson`, used via
`maskmypy/masks/donut.py:152-168`). Rectangles keep the DuckDB oracle
arithmetic (cell lookup = floor division) while the engine still runs its
general point-in-polygon kernel over them as ordinary rings.

Each polygon carries a deterministic ``pop`` count so the same table
serves as the polygon population layer for areal k-anonymity
(`maskmypy/analysis.py:563-579`; column name contract ``"pop"`` from
`analysis.py:19,112`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import rng
from ..constants import GRID_NX, GRID_NY, X_MAX, X_MIN, Y_MAX, Y_MIN
from ..geokernels.pip import PolygonSet


def grid_geometry() -> tuple[float, float, float, float]:
    """(x0, y0, cell_w, cell_h) of the containment grid."""
    return X_MIN, Y_MIN, (X_MAX - X_MIN) / GRID_NX, (Y_MAX - Y_MIN) / GRID_NY


def boundary_polygon_set(seed: int = 42) -> PolygonSet:
    """Compiled PolygonSet of the grid (poly_id = gy * GRID_NX + gx)."""
    x0, y0, w, h = grid_geometry()
    rings, ids, pops = [], [], []
    for gy in range(GRID_NY):
        for gx in range(GRID_NX):
            ax, ay = x0 + gx * w, y0 + gy * h
            rings.append((
                np.array([ax, ax + w, ax + w, ax]),
                np.array([ay, ay, ay + h, ay + h]),
            ))
            pid = gy * GRID_NX + gx
            ids.append(pid)
            pops.append(float(50 + int(rng.mix32((seed * 131 + pid) & 0xFFFFFFFF)) % 500))
    return PolygonSet(rings, poly_ids=ids, pops=pops)


def boundary_table(seed: int = 42) -> pa.Table:
    """Arrow encoding (poly_id, pop, ring_x, ring_y) — the engine's polygon
    side-table schema per SURVEY.md §1.2."""
    ps = boundary_polygon_set(seed)
    ring_x, ring_y = [], []
    for i in range(ps.n):
        s, e = ps.starts[i], ps.starts[i + 1]
        ring_x.append(ps.vx[s:e].tolist())
        ring_y.append(ps.vy[s:e].tolist())
    return pa.table({
        "poly_id": pa.array(ps.poly_ids, type=pa.int64()),
        "pop": pa.array(ps.pops, type=pa.float64()),
        "ring_x": pa.array(ring_x, type=pa.list_(pa.float64())),
        "ring_y": pa.array(ring_y, type=pa.list_(pa.float64())),
    })


def polygon_set_from_table(t: pa.Table) -> PolygonSet:
    """Compile an Arrow polygon table back into a PolygonSet (used when the
    polygon side arrives as a Dataset/parquet rather than driver-built)."""
    rings = [
        (np.asarray(rx, dtype=np.float64), np.asarray(ry, dtype=np.float64))
        for rx, ry in zip(t.column("ring_x").to_pylist(), t.column("ring_y").to_pylist())
    ]
    pops = t.column("pop").to_pylist() if "pop" in t.column_names else None
    return PolygonSet(rings, poly_ids=t.column("poly_id").to_pylist(), pops=pops)

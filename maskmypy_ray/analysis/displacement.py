"""Displacement (A1) + displacement summary (A7).

Reference: `/root/reference/maskmypy/analysis.py:82-105` computes the
index-aligned distance between original and masked geometry. Our masked
Dataset carries BOTH original (x, y) and masked (mx, my) planar
coordinates per row, so displacement is a stateless vectorized
``map_batches`` — no join, no shuffle (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .aggregates import summarize_column


def displacement_batch(batch: pa.Table, col: str = "_distance") -> pa.Table:
    x = batch.column("x").to_numpy(zero_copy_only=False)
    y = batch.column("y").to_numpy(zero_copy_only=False)
    mx = batch.column("mx").to_numpy(zero_copy_only=False)
    my = batch.column("my").to_numpy(zero_copy_only=False)
    dx = mx - x
    dy = my - y
    d = np.sqrt(dx * dx + dy * dy)
    return batch.append_column(col, pa.array(d, type=pa.float64()))


def displacement(ds, col: str = "_distance"):
    """Add per-row displacement distance to a masked Dataset."""
    return ds.map_batches(lambda b: displacement_batch(b, col), batch_format="pyarrow")


def summarize_displacement(ds, col: str = "_distance") -> dict:
    """min/max/median/mean displacement, rounded to 6 dp like the
    reference (`analysis.py:215-218`)."""
    s = summarize_column(ds, col)
    return {
        "displacement_min": round(s["min"], 6),
        "displacement_max": round(s["max"], 6),
        "displacement_med": round(s["median"], 6),
        "displacement_mean": round(s["mean"], 6),
    }

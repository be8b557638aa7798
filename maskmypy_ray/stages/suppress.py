"""Suppression (T1) + unmasked marking (T4).

Reference `/root/reference/maskmypy/tools.py:16-43`: points with
``k_anonymity < min_k`` move to the global mean center of the masked
pattern; a ``SUPPRESSED`` column gets string values "TRUE"/"FALSE"
(string values are the reference's quirk, kept for parity).

Shape: one global mean aggregate (two scalars), broadcast into a
stateless conditional-overwrite ``map_batches`` — no shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis.aggregates import mean_center


def suppress(ds, min_k: int, col: str = "k_anonymity", label: bool = True):
    """Suppress sub-k points. ``ds`` needs mx, my and the k column."""
    cx, cy = mean_center(ds, "mx", "my")

    def apply(batch: pa.Table) -> pa.Table:
        k = batch.column(col).to_numpy(zero_copy_only=False)
        mx = batch.column("mx").to_numpy(zero_copy_only=False).copy()
        my = batch.column("my").to_numpy(zero_copy_only=False).copy()
        low = k < min_k
        mx[low] = cx
        my[low] = cy
        batch = batch.set_column(batch.schema.get_field_index("mx"), "mx",
                                 pa.array(mx, type=pa.float64()))
        batch = batch.set_column(batch.schema.get_field_index("my"), "my",
                                 pa.array(my, type=pa.float64()))
        if label:
            batch = batch.append_column(
                "SUPPRESSED",
                pa.array(np.where(low, "TRUE", "FALSE"), type=pa.string()))
        return batch

    return ds.map_batches(apply, batch_format="pyarrow")


def mark_unmasked(ds) -> tuple:
    """Add UNMASKED=1 where masked == original (`tools.py:136-147`);
    returns (ds, count) — count drives the reference's warning."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def apply(batch: pa.Table) -> pa.Table:
        same = pc.and_(pc.equal(batch.column("mx"), batch.column("x")),
                       pc.equal(batch.column("my"), batch.column("y")))
        col = pc.cast(same, pa.int64())
        if "UNMASKED" in batch.column_names:
            batch = batch.set_column(batch.schema.get_field_index("UNMASKED"),
                                     "UNMASKED", col)
        else:
            batch = batch.append_column("UNMASKED", col)
        return batch

    out = ds.map_batches(apply, batch_format="pyarrow")
    return out, int(out.aggregate(Sum("UNMASKED"))["sum(UNMASKED)"])

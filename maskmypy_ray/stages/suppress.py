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


def _warn_unmasked_count(count: int) -> None:
    """Reference's warning, verbatim format (`tools.py:142-146`)."""
    if count > 0:
        import warnings

        warnings.warn(
            f"{count} points could not be masked. Adding 'UNMASKED' column "
            "to mark unmasked points.")


def mark_unmasked(ds) -> tuple:
    """Add UNMASKED=1 where masked == original (`tools.py:136-147`);
    returns (ds, count) and emits the reference's ``UserWarning`` when
    any point went unmasked (VERDICT r02 #8)."""
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
    count = int(out.aggregate(Sum("UNMASKED"))["sum(UNMASKED)"])
    _warn_unmasked_count(count)
    return out, count


def warn_if_unmasked(ds):
    """Aggregate an existing ``UNMASKED`` column and emit the reference's
    warning with the count (`tools.py:136-147`). Forces execution of the
    upstream pipeline (one Sum aggregate) — opt-in from the mask entry
    points via ``warn_unmasked=True``; returns the (materialized)
    Dataset so the pipeline doesn't run twice."""
    from ray.data.aggregate import Sum

    ds = ds.materialize()
    _warn_unmasked_count(int(ds.aggregate(Sum("UNMASKED"))["sum(UNMASKED)"] or 0))
    return ds

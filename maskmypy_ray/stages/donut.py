"""Donut mask (M1) + containment (M2) as Ray Data stages.

Reimplements the offset algebra of `/root/reference/maskmypy/masks/
donut.py:113-145` exactly:

* distance ``hyp`` drawn from the chosen distribution,
* ``x ~ U(0, hyp)``, ``y = sqrt(hyp^2 - x^2)``,
* a uniformly drawn quadrant sign-flip (so the angle is arcsine-biased
  toward the axes, NOT uniform — a quirk the reference's tests rely on
  distributionally).

Distributions (`donut.py:114-129`):

* ``uniform``  — ``hyp ~ U(low, high)``.
* ``gaussian`` — ``hyp = abs(N(mid, (high-low)/5))`` with
  ``mid = (high-low)/2 + low``; may exceed [low, high) (docstring
  `donut.py:55-58`). Sampled via Box–Muller here.
* ``areal``    — the reference rejection-samples "draw r1, r2; keep r1 if
  r1 > r2" (`donut.py:122-129`), i.e. the distribution of
  ``max(U1, U2)``; we use the closed form
  ``hyp = low + (high-low)*sqrt(u)`` — identical distribution, no loop,
  and exactly reproducible in the DuckDB oracle.

RNG: per-row counter streams keyed on ``doc_id`` (see
:mod:`maskmypy_ray.rng`) instead of the reference's single sequential
stream (`donut.py:110-111`) — output is independent of row order,
partitioning, and retries. The uniform and areal paths are mirrored
bit-for-bit by :mod:`maskmypy_ray.oracle`; gaussian uses transcendentals
(log/cos) and gets a rows-only oracle.

Containment (M2, `donut.py:152-168`): the masked point must fall in the
same container polygon as the original (or likewise in none — the
reference crashes on uncovered points, see SURVEY.md §2.1 M2). The
reference loops forever; we draw up to ``MAX_CONTAIN_ROUNDS`` vectorized
rounds and fall back to the original point with ``UNMASKED=1``
(`tools.py:136-147` semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import rng
from ..constants import MAX_CONTAIN_ROUNDS
from ..geokernels.pip import PolygonSet

_DISTRIBUTIONS = ("uniform", "gaussian", "areal")


def _offsets(keys: np.ndarray, seed: int, low: float, high: float,
             distribution: str, streams: tuple[int, int, int, int]) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized offset draw; streams = (hyp/u, x-frac, direction, bm-v)."""
    s_hyp, s_x, s_dir, s_bmv = streams
    if distribution == "uniform":
        u = rng.uniform01(keys, seed, s_hyp)
        hyp = low + (high - low) * u
    elif distribution == "areal":
        u = rng.uniform01(keys, seed, s_hyp)
        hyp = low + (high - low) * np.sqrt(u)
    elif distribution == "gaussian":
        mean = ((high - low) / 2.0) + low
        sigma = ((high - low) / 2.0) / 2.5
        u = rng.uniform01(keys, seed, s_hyp)
        v = rng.uniform01(keys, seed, s_bmv)
        n = np.sqrt(-2.0 * np.log1p(-u)) * np.cos(2.0 * np.pi * v)
        hyp = np.abs(mean + sigma * n)
    else:
        raise ValueError(f"Unknown distribution: {distribution!r}")
    x = hyp * rng.uniform01(keys, seed, s_x)
    y = np.sqrt(hyp * hyp - x * x)
    d = rng.uniform01(keys, seed, s_dir)
    sx = np.where(d < 0.25, -1.0, np.where((d >= 0.5) & (d < 0.75), -1.0, 1.0))
    sy = np.where((d >= 0.25) & (d < 0.75), -1.0, 1.0)
    return x * sx, y * sy


def donut_mask_batch(batch: pa.Table, low: float, high: float, seed: int,
                     distribution: str = "uniform", key_col: str = "doc_id") -> pa.Table:
    """Stateless per-batch donut mask: adds ``mx``, ``my`` (masked planar
    meters). Original columns (incl. byte-identical ``text``) pass through."""
    keys = batch.column(key_col).to_numpy(zero_copy_only=False) & 0xFFFFFFFF
    x = batch.column("x").to_numpy(zero_copy_only=False)
    y = batch.column("y").to_numpy(zero_copy_only=False)
    xoff, yoff = _offsets(keys, seed, low, high, distribution, (3, 4, 5, 7))
    batch = batch.append_column("mx", pa.array(x + xoff, type=pa.float64()))
    batch = batch.append_column("my", pa.array(y + yoff, type=pa.float64()))
    return batch


def _validate(low: float, high: float, distribution: str) -> None:
    # Mirrors _validate_donut (`donut.py:88-98`).
    if low >= high:
        raise ValueError("Minimum displacement distance is greater than or equal to maximum.")
    if distribution not in _DISTRIBUTIONS:
        raise ValueError(f"Unknown distribution: {distribution!r}")


def _maybe_snap(masked, snap_to_streets: bool, graph):
    """Optional snap-to-streets post-pass (reference `donut.py:82-83`,
    `locationswap.py:73-74`, `voronoi.py:49-50`). The reference fetches
    OSM live; this engine requires an explicit ``graph``
    (:class:`~maskmypy_ray.sources.roadgraph.RoadGraph`)."""
    if not snap_to_streets:
        return masked
    if graph is None:
        raise ValueError(
            "snap_to_streets=True requires a RoadGraph (`graph=` kwarg); "
            "live OSM fetch is not available in this engine")
    from .street import snap_to_streets as snap_stage

    return snap_stage(masked, graph)


def donut(ds, low: float, high: float, seed: int | None = None,
          distribution: str = "uniform", key_col: str = "doc_id",
          snap_to_streets: bool = False, graph=None):
    """Donut-mask a geoparsed Dataset (stateless ``map_batches``).
    ``seed=None`` auto-generates a 16-digit seed like the reference
    (`tools.py:85-95`). ``snap_to_streets=True`` snaps the masked
    coordinates to the nearest ``graph`` node as a post-pass
    (`donut.py:82-83`)."""
    _validate(low, high, distribution)
    if seed is None:
        seed = rng.gen_seed()
    masked = ds.map_batches(
        lambda b: donut_mask_batch(b, low, high, seed, distribution, key_col),
        batch_format="pyarrow",
    )
    return _maybe_snap(masked, snap_to_streets, graph)


def contained_mask_arrays(ps: PolygonSet, keys: np.ndarray, x: np.ndarray,
                          y: np.ndarray, low: float, high: float, seed: int,
                          distribution: str = "uniform",
                          max_rounds: int = MAX_CONTAIN_ROUNDS):
    """Vectorized containment rejection-resampling kernel (M2 core).

    Returns ``(mx, my, retries, pending)`` where ``pending`` indexes the
    points that exhausted ``max_rounds`` (kept at their original coords —
    callers mark them UNMASKED). Output coord dtype follows the input
    ``x``/``y`` dtype, so the fused float32 bench path stays narrow while
    the float64 driver queries are bit-identical to round 2.
    """
    n = len(x)
    orig_pid = ps.locate(x, y)
    mx = x.copy()
    my = y.copy()
    retries = np.zeros(n, dtype=np.int32)
    pending = np.arange(n)
    for r in range(max_rounds):
        if not len(pending):
            break
        streams = (3, 4, 5, 7) if r == 0 else (64 + 4 * r, 65 + 4 * r, 66 + 4 * r, 67 + 4 * r)
        xoff, yoff = _offsets(keys[pending], seed, low, high, distribution, streams)
        cx = (x[pending] + xoff).astype(x.dtype, copy=False)
        cy = (y[pending] + yoff).astype(y.dtype, copy=False)
        ok = ps.locate(cx, cy) == orig_pid[pending]
        acc = pending[ok]
        mx[acc] = cx[ok]
        my[acc] = cy[ok]
        retries[acc] = r
        pending = pending[~ok]
    if len(pending):
        retries[pending] = max_rounds
    return mx, my, retries, pending


class DonutContainedMasker:
    """Actor-pool stage for contained donut masking (M2).

    The compiled :class:`PolygonSet` is fetched from the object store once
    per actor (``__init__``), not per batch — broadcast join pattern.
    Emits ``mx``, ``my``, ``retries`` (rounds used) and ``UNMASKED``.
    """

    def __init__(self, polygons_ref, low: float, high: float, seed: int,
                 distribution: str = "uniform", key_col: str = "doc_id",
                 max_rounds: int = MAX_CONTAIN_ROUNDS):
        import ray

        self.ps: PolygonSet = (
            ray.get(polygons_ref) if not isinstance(polygons_ref, PolygonSet) else polygons_ref
        )
        self.low, self.high, self.seed = low, high, seed
        self.distribution = distribution
        self.key_col = key_col
        self.max_rounds = max_rounds

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False) & 0xFFFFFFFF
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        mx, my, retries, pending = contained_mask_arrays(
            self.ps, keys, x, y, self.low, self.high, self.seed,
            self.distribution, self.max_rounds)
        unmasked = np.zeros(len(x), dtype=np.int64)
        if len(pending):
            # Cap reached: keep original point, mark UNMASKED (tools.py:136-147).
            unmasked[pending] = 1
        batch = batch.append_column("mx", pa.array(mx, type=pa.float64()))
        batch = batch.append_column("my", pa.array(my, type=pa.float64()))
        batch = batch.append_column("retries", pa.array(retries, type=pa.int32()))
        batch = batch.append_column("UNMASKED", pa.array(unmasked, type=pa.int64()))
        return batch


def donut_contained(ds, polygons: PolygonSet, low: float, high: float,
                    seed: int | None = None, distribution: str = "uniform",
                    key_col: str = "doc_id", snap_to_streets: bool = False,
                    graph=None, warn_unmasked: bool = False):
    """Contained donut mask: broadcast polygons + vectorized rejection
    resampling in an actor pool.

    ``warn_unmasked=True`` reproduces the reference's eager
    ``UserWarning`` with the count of points that exhausted the
    rejection cap (`tools.py:136-147`) — it forces one materialization
    (a Sum aggregate), so the default keeps the pipeline lazy.
    """
    import ray

    _validate(low, high, distribution)
    # Reference parity (`donut.py:158-161`): overlapping containment
    # polygons are a hard error, checked ONCE at pipeline build instead
    # of per point (VERDICT r02 #6).
    polygons.validate_nonoverlap()
    if seed is None:
        seed = rng.gen_seed()
    ref = ray.put(polygons)

    # Stateless tasks over a broadcast PolygonSet: ray.get per task is a
    # zero-copy object-store read, and task pools reach full parallelism
    # instantly (an autoscaling actor pool spends seconds starting actor
    # processes, which dominated fresh-run wall time).
    def mask(batch: pa.Table) -> pa.Table:
        return DonutContainedMasker(ref, low=low, high=high, seed=seed,
                                    distribution=distribution, key_col=key_col)(batch)

    # batch_size deliberately unset: the upstream derive stage EXPANDS
    # small input blocks (replicate fan-out), and a row-count batch_size
    # makes Ray bundle many input blocks into one task (input rows are
    # counted pre-expansion), serializing the pipeline.
    masked = ds.map_batches(mask, batch_format="pyarrow")
    if warn_unmasked:
        from .suppress import warn_if_unmasked

        masked = warn_if_unmasked(masked)
    return _maybe_snap(masked, snap_to_streets, graph)

"""evaluate (A13): orchestrate the analysis suite into one stats dict.

Reference `/root/reference/maskmypy/analysis.py:15-79`: central_drift,
displacement summary, nnd deltas, (ripley rmse unless skip_slow), and with
a population layer: k summary + k_satisfaction at 5/25/50. All stats are
scalars collected into the run manifest; each underlying computation is a
Ray pipeline with streaming aggregates.
"""

from __future__ import annotations

from .aggregates import central_drift, k_satisfaction, summarize_k
from .displacement import displacement, summarize_displacement
from .k_anonymity import calculate_k, estimate_k
from .nnd import nnd_delta
from .ripley import ripley_rmse, ripleys_k


def evaluate(masked_ds, population=None, population_column: str = "pop",
             skip_slow: bool = True, key_col: str = "doc_id",
             seed: int = 42) -> dict:
    """``masked_ds`` carries original (x, y) and masked (mx, my) per row.
    ``population`` is either an addresses Dataset (points) or a
    :class:`~maskmypy_ray.geokernels.pip.PolygonSet` with pops."""
    from ..geokernels.pip import PolygonSet

    masked_ds = displacement(masked_ds).materialize()
    stats: dict = {}
    stats["central_drift"] = central_drift(masked_ds)
    stats.update(summarize_displacement(masked_ds))
    stats.update(nnd_delta(masked_ds, key_col=key_col))
    if not skip_slow:
        # distributed cell+halo k_test on both patterns (no x/y collect);
        # 19 simulations like the driver query (ref default 99 is marked
        # slow and skipped by default)
        before = ripleys_k(masked_ds, x_col="x", y_col="y", simulations=19,
                           seed=seed, key_col=key_col)
        after = ripleys_k(masked_ds, x_col="mx", y_col="my", simulations=19,
                          seed=seed, key_col=key_col)
        stats["ripley_rmse"] = ripley_rmse(before, after)
    if population is not None:
        if isinstance(population, PolygonSet):
            k = estimate_k(masked_ds, population, key_col=key_col)
        else:
            k = calculate_k(masked_ds, population, key_col=key_col)
        k = k.materialize()
        stats.update(summarize_k(k))
        stats["k_satisfaction_5"] = k_satisfaction(k, 5)
        stats["k_satisfaction_25"] = k_satisfaction(k, 25)
        stats["k_satisfaction_50"] = k_satisfaction(k, 50)
    return stats

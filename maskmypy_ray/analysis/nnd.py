"""Nearest-neighbor distance stats (A8/A9).

Reference (`/root/reference/maskmypy/analysis.py:222-263`) uses pointpats'
PointPattern min/max/mean nearest-neighbor distance. Distributed shape
(SURVEY.md §2.2 A8): points are bucketed into planar cells; each point is
replicated into its 3x3 neighborhood as "halo" rows; a ``groupby(cell)``
co-locates core+halo; a vectorized per-group kernel finds each core
point's nearest neighbor. A neighbor within ``cell_m`` of the point is
guaranteed to be inside the halo, so any result <= cell_m is exact; the
(rare) unresolved points are finished exactly in a second broadcast
brute-force pass over the full dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geokernels.cells import cell_of_xy, neighbors_xy

DEFAULT_NND_CELL_M = 1000.0


def _halo_batch(batch: pa.Table, cell_m: float, x_col: str, y_col: str,
                key_col: str) -> pa.Table:
    x = batch.column(x_col).to_numpy(zero_copy_only=False)
    y = batch.column(y_col).to_numpy(zero_copy_only=False)
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    own = cell_of_xy(x, y, cell_m)
    nb = neighbors_xy(own, ring=1)  # (n, 9) incl. self
    n, k = nb.shape
    rep = np.repeat(np.arange(n), k)
    is_core = (nb == own[:, None]).ravel()
    return pa.table({
        "cell": pa.array(nb.ravel(), type=pa.int64()),
        "key": pa.array(keys[rep], type=pa.int64()),
        "px": pa.array(x[rep], type=pa.float64()),
        "py": pa.array(y[rep], type=pa.float64()),
        "core": pa.array(is_core),
    })


def _nn_group(g: pd.DataFrame) -> pd.DataFrame:
    core = g[g["core"]]
    if not len(core):
        return pd.DataFrame({"key": pd.array([], dtype="int64"),
                             "nnd": pd.array([], dtype="float64")})
    px = g["px"].to_numpy()
    py = g["py"].to_numpy()
    cx = core["px"].to_numpy()
    cy = core["py"].to_numpy()
    ckey = core["key"].to_numpy()
    gkey = g["key"].to_numpy()
    out = np.empty(len(cx))
    chunk = max(1, int(4_000_000 / max(1, len(px))))
    for i in range(0, len(cx), chunk):
        sl = slice(i, min(i + chunk, len(cx)))
        d2 = (cx[sl, None] - px[None, :]) ** 2 + (cy[sl, None] - py[None, :]) ** 2
        d2[gkey[None, :] == ckey[sl, None]] = np.inf  # exclude self (by key)
        out[sl] = np.sqrt(d2.min(axis=1))
    return pd.DataFrame({"key": ckey, "nnd": out})


def nnd_per_point(ds, cell_m: float = DEFAULT_NND_CELL_M, x_col: str = "x",
                  y_col: str = "y", key_col: str = "doc_id"):
    """Dataset[(key, nnd)] of exact nearest-neighbor distances."""
    halo = ds.map_batches(
        lambda b: _halo_batch(b, cell_m, x_col, y_col, key_col),
        batch_format="pyarrow")
    nn = halo.groupby("cell").map_groups(_nn_group, batch_format="pandas")
    nn = nn.materialize()
    # Exactness check: results > cell_m may have a true NN outside the halo.
    unresolved = nn.filter(expr=f"nnd > {cell_m!r}").to_pandas()
    if len(unresolved):
        resolved = _brute_force_nn(ds, unresolved, x_col, y_col, key_col)
        fix = dict(zip(resolved["key"], resolved["nnd"]))

        def patch(b: pa.Table) -> pa.Table:
            keys = b.column("key").to_numpy(zero_copy_only=False)
            vals = b.column("nnd").to_numpy(zero_copy_only=False).copy()
            for i, kk in enumerate(keys):
                if kk in fix:
                    vals[i] = fix[kk]
            return pa.table({"key": b.column("key"),
                             "nnd": pa.array(vals, type=pa.float64())})

        nn = nn.map_batches(patch, batch_format="pyarrow")
    return nn


def _brute_force_nn(ds, unresolved: pd.DataFrame, x_col: str, y_col: str,
                    key_col: str) -> pd.DataFrame:
    """Exact fallback: broadcast the (small) unresolved point set and scan
    the full dataset once, reducing per-unresolved minima on the driver."""
    ux = unresolved["px"].to_numpy() if "px" in unresolved else None
    # unresolved came from the nn result (key, nnd) — need coordinates:
    keys = set(unresolved["key"].tolist())
    coords = ds.map_batches(
        lambda b: b.filter(
            pa.array(np.isin(b.column(key_col).to_numpy(zero_copy_only=False),
                             list(keys)))),
        batch_format="pyarrow").select_columns([key_col, x_col, y_col]).to_pandas()
    ukeys = coords[key_col].to_numpy()
    ux = coords[x_col].to_numpy()
    uy = coords[y_col].to_numpy()

    def scan(b: pa.Table) -> pa.Table:
        x = b.column(x_col).to_numpy(zero_copy_only=False)
        y = b.column(y_col).to_numpy(zero_copy_only=False)
        kk = b.column(key_col).to_numpy(zero_copy_only=False)
        d2 = (ux[:, None] - x[None, :]) ** 2 + (uy[:, None] - y[None, :]) ** 2
        d2[kk[None, :] == ukeys[:, None]] = np.inf
        return pa.table({"key": pa.array(ukeys, type=pa.int64()),
                         "m": pa.array(np.sqrt(d2.min(axis=1)), type=pa.float64())})

    partial = ds.map_batches(scan, batch_format="pyarrow").to_pandas()
    return partial.groupby("key")["m"].min().rename("nnd").reset_index()


def nnd(ds, cell_m: float = DEFAULT_NND_CELL_M, x_col: str = "x",
        y_col: str = "y", key_col: str = "doc_id") -> dict:
    """{nnd_min, nnd_max, nnd_mean} — `analysis.py:222-237`."""
    from ray.data.aggregate import Max, Mean, Min

    nn = nnd_per_point(ds, cell_m, x_col, y_col, key_col)
    agg = nn.aggregate(Min("nnd"), Max("nnd"), Mean("nnd"))
    return {
        "nnd_min": float(agg["min(nnd)"]),
        "nnd_max": float(agg["max(nnd)"]),
        "nnd_mean": float(agg["mean(nnd)"]),
    }


def nnd_delta(ds, cell_m: float = DEFAULT_NND_CELL_M, key_col: str = "doc_id") -> dict:
    """after - before for each nnd stat, round 6 (`analysis.py:240-263`).
    ``ds`` must carry both original (x, y) and masked (mx, my)."""
    before = nnd(ds, cell_m, "x", "y", key_col)
    after = nnd(ds, cell_m, "mx", "my", key_col)
    return {f"{k}_delta": round(after[k] - before[k], 6) for k in before}

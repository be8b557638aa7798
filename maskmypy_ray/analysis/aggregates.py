"""Global scalar aggregates (A5, A6, A7, A10 kernels).

All are algebraic (min/max/mean/count) and run as Ray Dataset aggregates
— streaming partial aggregation per block, tiny final combine. The exact
median follows the reference's exact semantics (`analysis.py:192,217`)
at EVERY scale: below ``MEDIAN_COLLECT_LIMIT`` rows the single float
column is collected (bounded, cheap); above it the iterative-histogram
:func:`exact_median_distributed` kernel computes the same order
statistics without the column ever leaving the cluster (SURVEY.md
§7.5.7; VERDICT r01 #3).
"""

from __future__ import annotations

import numpy as np

# Above this row count the exact median switches to the distributed
# histogram-refinement kernel; below it a bounded single-column collect
# is both exact and cheaper (no extra full-dataset passes).
MEDIAN_COLLECT_LIMIT = 262_144


def summarize_column(ds, col: str, approx: bool = False) -> dict:
    """{min, max, mean, median, count} of one numeric column.

    NaN policy (ADVICE r02): pandas semantics throughout — the reference
    is `gdf[col].min()/.max()/.mean()/.median()` which all skip NaN — so
    every stat here is computed over the finite values only, via one
    NaN-aware map_batches partial + scalar aggregate (Ray's Mean returns
    None when a float batch contains NaN)."""
    import pyarrow as pa
    from ray.data.aggregate import Max, Min, Sum

    def part(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False)
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        return pa.table({
            "vmin": pa.array([float(v.min()) if len(v) else np.inf]),
            "vmax": pa.array([float(v.max()) if len(v) else -np.inf]),
            "vsum": pa.array([float(v.sum(dtype=np.float64)) if len(v) else 0.0]),
            "n": pa.array([len(v)], type=pa.int64()),
        })

    agg = ds.map_batches(part, batch_format="pyarrow").aggregate(
        Min("vmin"), Max("vmax"), Sum("vsum"), Sum("n"))
    n = int(agg["sum(n)"] or 0)
    out = {
        "min": float(agg["min(vmin)"]),
        "max": float(agg["max(vmax)"]),
        "mean": float(agg["sum(vsum)"]) / n if n else float("nan"),
        "count": n,
    }
    # NaN policy (ADVICE r02): both median paths skip NaNs, matching the
    # reference's pandas ``.median()`` (skipna=True) — the distributed
    # kernel already drops NaNs via its range comparisons, so the collect
    # paths must use nanmedian for row-count-independent results.
    if approx:
        # Optional cheap path: 1% sample median — flagged approximate.
        vals = ds.select_columns([col]).random_sample(0.01, seed=7).to_pandas()[col].to_numpy()
        out["median"] = _nanmedian(vals)
    elif out["count"] > MEDIAN_COLLECT_LIMIT:
        out["median"] = exact_median_distributed(ds, col)
    else:
        vals = ds.select_columns([col]).to_pandas()[col].to_numpy()
        out["median"] = _nanmedian(vals)
    return out


def _nanmedian(vals: np.ndarray) -> float:
    vals = vals[~np.isnan(vals)] if vals.dtype.kind == "f" else vals
    return float(np.median(vals)) if len(vals) else float("nan")


def k_satisfaction(ds, min_k: int, col: str = "k_anonymity") -> float:
    """round(count(k >= min_k) / count(k), 3) — `analysis.py:150-169`."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def flag(batch: pa.Table) -> pa.Table:
        sat = pc.cast(pc.greater_equal(batch.column(col), min_k), pa.int64())
        return pa.table({"sat": sat})

    agg = ds.map_batches(flag, batch_format="pyarrow").aggregate(Sum("sat"), Count("sat"))
    return round(float(agg["sum(sat)"]) / float(agg["count(sat)"]), 3)


def summarize_k(ds, col: str = "k_anonymity") -> dict:
    """{k_min:int, k_max:int, k_med, k_mean} — `analysis.py:172-194`."""
    s = summarize_column(ds, col)
    return {
        "k_min": int(s["min"]),
        "k_max": int(s["max"]),
        "k_med": round(s["median"], 2),
        "k_mean": round(s["mean"], 2),
    }


def mean_center(ds, x_col: str = "x", y_col: str = "y") -> tuple[float, float]:
    """Mean center of a point Dataset (dissolve().centroid of a MultiPoint
    is the coordinate mean — `analysis.py:283-284`)."""
    from ray.data.aggregate import Mean

    agg = ds.aggregate(Mean(x_col), Mean(y_col))
    return float(agg[f"mean({x_col})"]), float(agg[f"mean({y_col})"])


def central_drift(ds, round_to: int = 6) -> float:
    """Distance between the original and masked mean centers, round 6
    (`analysis.py:266-285`). One pass: four Mean aggregates."""
    from ray.data.aggregate import Mean

    agg = ds.aggregate(Mean("x"), Mean("y"), Mean("mx"), Mean("my"))
    dx = agg["mean(mx)"] - agg["mean(x)"]
    dy = agg["mean(my)"] - agg["mean(y)"]
    return round(float(np.hypot(dx, dy)), round_to)


def exact_median_distributed(ds, col: str, max_collect: int = 1_000_000) -> float:
    """Exact median without collecting the column (SURVEY.md §7.5.7).

    Iterative histogram refinement: one Min/Max/Count pass, then per-pass
    1024-bin counting over a shrinking value range until the bin(s)
    holding the median rank(s) contain few enough values to collect
    exactly. O(passes * scan) with passes ~ log_1024(range/precision);
    2-3 passes in practice. Result equals ``numpy.median`` bit-for-bit
    (it returns the exact order statistics).
    """
    import pyarrow as pa
    from ray.data.aggregate import Max, Min, Sum

    # NaN-aware first pass (ADVICE r02): Ray's Count counts NaN floats as
    # valid but the histogram below drops them, which would shift ranks —
    # so min/max/n are computed over the finite values only, in one
    # map_batches + scalar aggregate (same cost as the plain aggregate).
    def stats_part(b: pa.Table) -> pa.Table:
        v = b.column(col).to_numpy(zero_copy_only=False)
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        return pa.table({
            "vmin": pa.array([float(v.min()) if len(v) else np.inf]),
            "vmax": pa.array([float(v.max()) if len(v) else -np.inf]),
            "n": pa.array([len(v)], type=pa.int64()),
        })

    a = ds.map_batches(stats_part, batch_format="pyarrow").aggregate(
        Min("vmin"), Max("vmax"), Sum("n"))
    n = int(a["sum(n)"] or 0)
    if n == 0:
        return float("nan")
    lo_rank = (n - 1) // 2
    hi_rank = n // 2

    def kth_value(rank: int) -> float:
        lo, hi = float(a["min(vmin)"]), float(a["max(vmax)"])
        below = 0  # values strictly below current [lo, hi] window
        while True:
            # count values in [lo, hi] bucketed into 1024 bins
            edges = np.linspace(lo, hi, 1025)

            def hist(b: pa.Table) -> pa.Table:
                v = b.column(col).to_numpy(zero_copy_only=False)
                v = v[(v >= lo) & (v <= hi)]
                c, _ = np.histogram(v, bins=edges)
                return pa.table({"bin": pa.array(np.arange(1024, dtype=np.int64)),
                                 "c": pa.array(c.astype(np.int64))})

            from ray.data.aggregate import Sum

            counts = ds.map_batches(hist, batch_format="pyarrow") \
                .groupby("bin").aggregate(Sum("c", alias_name="n")).to_pandas() \
                .set_index("bin")["n"].reindex(range(1024), fill_value=0).to_numpy()
            cum = np.cumsum(counts)
            target = rank - below
            b = int(np.searchsorted(cum, target + 1))
            in_bin = int(counts[b])
            if in_bin <= max_collect or edges[b + 1] - edges[b] <= 0:
                blo, bhi = edges[b], edges[b + 1]
                is_last = b == 1023

                def collect(t: pa.Table) -> pa.Table:
                    v = t.column(col).to_numpy(zero_copy_only=False)
                    sel = (v >= blo) & ((v <= bhi) if is_last else (v < bhi))
                    return pa.table({col: pa.array(v[sel])})

                vals = np.sort(ds.map_batches(collect, batch_format="pyarrow")
                               .to_pandas()[col].to_numpy())
                offset = target - (int(cum[b - 1]) if b else 0)
                return float(vals[offset])
            below += int(cum[b - 1]) if b else 0
            lo, hi = edges[b], edges[b + 1]

    v_lo = kth_value(lo_rank)
    v_hi = v_lo if hi_rank == lo_rank else kth_value(hi_rank)
    return float((v_lo + v_hi) / 2.0)

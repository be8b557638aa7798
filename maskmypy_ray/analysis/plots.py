"""Plotting surface (A14 graph_ripleyresult(s), A15 map_displacement,
X5 Atlas.scatter helper).

Reference: `/root/reference/maskmypy/analysis.py:371-465` (Ripley K
figures: observed statistic vs support with the simulation envelope),
`analysis.py:468-521` (map of original->masked displacement lines), and
`maskmypy/atlas.py:383-393` (candidate stat scatter).

matplotlib is NOT installed in this sandbox, so each plot function is
split in two: a pure data-preparation function (tested, no plotting
dependency) and a thin render wrapper gated behind an import-try that
raises a clear ImportError when matplotlib is absent — the same honest
stub pattern as the media decode stage (multimodal/media.py).

The displacement map samples rows with a deterministic per-row hash
filter (never a full collect): at 10^12 rows the driver only ever sees
~``sample`` line segments.
"""

from __future__ import annotations

import numpy as np

from .. import rng
from .ripley import KtestResult


def _require_matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except ImportError as e:  # pragma: no cover - matplotlib absent in CI
        raise ImportError(
            "matplotlib is required for plotting but is not installed in "
            "this environment; use the *_data() functions for the "
            "plot-ready arrays instead") from e


def ripley_plot_data(result: KtestResult) -> dict:
    """Plot-ready arrays for one K result: observed statistic plus the
    simulation envelope (per-band min/max across kept simulations),
    mirroring what the reference draws (`analysis.py:371-465`)."""
    sims = np.asarray(result.simulations)
    has_sims = sims.size > 0
    return {
        "support": np.asarray(result.support),
        "statistic": np.asarray(result.statistic),
        "env_lo": sims.min(axis=0) if has_sims else None,
        "env_hi": sims.max(axis=0) if has_sims else None,
    }


def graph_ripleyresult(result: KtestResult, subtitle: str | None = None):
    """Figure of one K result with its CSR envelope (A14)."""
    plt = _require_matplotlib()
    d = ripley_plot_data(result)
    fig, ax = plt.subplots()
    if d["env_lo"] is not None:
        ax.fill_between(d["support"], d["env_lo"], d["env_hi"],
                        alpha=0.25, label="CSR envelope")
    ax.plot(d["support"], d["statistic"], marker="o", label="observed K")
    ax.set_xlabel("distance")
    ax.set_ylabel("K(d)")
    if subtitle:
        ax.set_title(subtitle)
    ax.legend()
    return fig


def graph_ripleyresults(results: list[tuple[str, KtestResult]],
                        subtitle: str | None = None):
    """One figure overlaying several labeled K results (A14)."""
    plt = _require_matplotlib()
    fig, ax = plt.subplots()
    for label, result in results:
        d = ripley_plot_data(result)
        ax.plot(d["support"], d["statistic"], marker="o", label=str(label))
    ax.set_xlabel("distance")
    ax.set_ylabel("K(d)")
    if subtitle:
        ax.set_title(subtitle)
    ax.legend()
    return fig


def displacement_map_data(ds, sample: int = 1000, seed: int = 0) -> dict:
    """Deterministically sampled displacement segments for the A15 map.

    One Count aggregate sizes the keep-fraction; a per-row counter-RNG
    filter (stream 900, keyed on doc_id) keeps ~``sample`` rows
    independent of partitioning; only those rows reach the driver.
    """
    import pyarrow as pa

    n = ds.count()
    frac = 1.0 if n <= sample else sample / n

    def keep(b: pa.Table) -> pa.Table:
        keys = b.column("doc_id").to_numpy(zero_copy_only=False) & 0xFFFFFFFF
        u = rng.uniform01(keys, seed, 900)
        return b.filter(pa.array(u < frac))

    cols = ["doc_id", "x", "y", "mx", "my"]
    df = ds.select_columns(cols).map_batches(keep, batch_format="pyarrow").to_pandas()
    # block arrival order is nondeterministic under load — the sampled
    # SET is deterministic, so pin the row order too
    df = df.sort_values("doc_id").reset_index(drop=True)
    segs = np.stack([df["x"], df["y"], df["mx"], df["my"]], axis=1)
    return {
        "segments": segs,  # (m, 4): x0, y0, x1, y1
        "n_total": n,
        "n_sampled": len(df),
    }


def map_displacement(ds, sample: int = 1000, seed: int = 0):
    """Map of original->masked displacement lines over the sampled rows
    (A15, `analysis.py:468-521`; the reference's contextily basemap is
    network-dependent and out of scope)."""
    plt = _require_matplotlib()
    d = displacement_map_data(ds, sample=sample, seed=seed)
    fig, ax = plt.subplots()
    for x0, y0, x1, y1 in d["segments"]:
        ax.plot([x0, x1], [y0, y1], color="tab:red", linewidth=0.5)
    ax.scatter(d["segments"][:, 0], d["segments"][:, 1], s=3, color="black",
               label="original")
    ax.scatter(d["segments"][:, 2], d["segments"][:, 3], s=3, color="tab:blue",
               label="masked")
    ax.set_aspect("equal")
    ax.legend()
    return fig

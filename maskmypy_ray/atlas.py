"""Atlas — experiment manager / user-extension surface (X1-X6).

Mirrors `/root/reference/maskmypy/atlas.py`:

* ``mask(mask_func, **kwargs)`` runs ANY mask callable (the extension
  contract: ``(Dataset, seed=..., **kwargs) -> Dataset``; a ``seed`` kwarg
  is auto-injected when accepted, `atlas.py:137-138`), times it
  (`atlas.py:140-148`), checksums the result, dehydrates Dataset/layer
  kwargs to ``"context_<checksum>"`` strings (`atlas.py:412-420`), runs
  ``evaluate``, and appends a candidate record ``{mask, kwargs, checksum,
  stats}`` (`atlas.py:132-135`).
* ``gen_dataset`` replays a candidate from its recorded recipe and
  validates the checksum (`atlas.py:182-240`) — the reference's
  reproducibility/lineage contract.
* ``add_layers`` registers context layers keyed by content checksum for
  dedup + integrity (`atlas.py:66-85`).
* ``sort`` / ``prune`` / ``as_df`` / ``to_json`` / ``from_json`` manage the
  candidate list (`atlas.py:242-363`).

Candidates hold stats + recipes only — never data; layers are re-supplied
on restore exactly like the reference (`atlas.py:320-363`).
"""

from __future__ import annotations

import inspect
import json
import time
from pathlib import Path

from .checksum import checksum


class Atlas:
    def __init__(self, sensitive_ds, candidates: list | None = None):
        self.sensitive = sensitive_ds
        self.candidates: list[dict] = list(candidates or [])
        self.layers: dict[str, object] = {}

    # ---- X6: layer store -------------------------------------------------
    def add_layers(self, *layers) -> list[str]:
        """Register context layers (pyarrow Tables / Datasets / PolygonSet)
        keyed by content checksum."""
        keys = []
        for layer in layers:
            key = self._layer_checksum(layer)
            self.layers[key] = layer
            keys.append(key)
        return keys

    @staticmethod
    def _layer_checksum(layer) -> str:
        from .geokernels.pip import PolygonSet
        from .sources.roadgraph import RoadGraph

        if isinstance(layer, PolygonSet):
            import pandas as pd

            df = pd.DataFrame({"vx": layer.vx, "vy": layer.vy})
            return checksum(df)
        if isinstance(layer, RoadGraph):
            # content = node coords + CSR adjacency (recipes recording a
            # donut+snap mask dehydrate the graph kwarg like any layer)
            import pandas as pd

            df = pd.DataFrame({"x": layer.node_x, "y": layer.node_y})
            return checksum(df)
        return checksum(layer)

    def _dehydrate(self, kwargs: dict) -> dict:
        out = {}
        for k, v in kwargs.items():
            if isinstance(v, (int, float, str, bool, type(None))):
                out[k] = v
            else:
                key = self._layer_checksum(v)
                self.layers.setdefault(key, v)
                out[k] = f"context_{key}"
        return out

    def _hydrate(self, kwargs: dict) -> dict:
        out = {}
        for k, v in kwargs.items():
            if isinstance(v, str) and v.startswith("context_"):
                key = v[len("context_"):]
                if key not in self.layers:
                    # mirrors atlas.py:402-409 hydration error
                    raise ValueError(
                        f"Could not locate layer matching checksum {key}. "
                        "Add it with Atlas.add_layers().")
                out[k] = self.layers[key]
            else:
                out[k] = v
        return out

    # ---- X1: run a mask --------------------------------------------------
    def mask(self, mask_func, seed: int | None = None, keep_dataset: bool = False,
             population=None, skip_slow_evaluators: bool = True,
             measure_execution_time: bool = True,
             measure_peak_memory: bool = False, **kwargs) -> dict:
        """Run ``mask_func(sensitive_ds, **kwargs)`` and record a candidate.

        The callable contract mirrors the reference's custom-mask surface
        (docs/atlas.md "Using Custom Masks"): first positional arg is the
        Dataset; a ``seed`` kwarg is injected if accepted.

        ``measure_peak_memory`` profiles DRIVER-side peak allocation via
        tracemalloc (the Ray workers' footprint shows up in Dataset
        stats, not here) and is mutually exclusive with
        ``measure_execution_time`` exactly like the reference
        (`atlas.py:127-152`; tracemalloc skews timing).
        """
        if measure_execution_time and measure_peak_memory:
            raise ValueError(
                "measure_execution_time and measure_peak_memory may not "
                "both be enabled; tracemalloc distorts timings.")
        call_kwargs = dict(self._hydrate(kwargs))
        sig = inspect.signature(mask_func)
        seed_injected = "seed" in sig.parameters and seed is not None
        if seed_injected:
            call_kwargs["seed"] = seed
        if measure_peak_memory:
            import tracemalloc

            tracemalloc.start()
        t0 = time.perf_counter()
        masked = mask_func(self.sensitive, **call_kwargs)
        masked = masked.materialize()
        elapsed = time.perf_counter() - t0
        peak_mb = None
        if measure_peak_memory:
            import tracemalloc

            _, peak = tracemalloc.get_traced_memory()
            tracemalloc.stop()
            peak_mb = round(peak / 1024 / 1024, 3)
        chk = checksum(masked, columns=["mx", "my"])
        from .analysis.evaluate import evaluate

        stats = evaluate(masked, population=population,
                         skip_slow=skip_slow_evaluators)
        if measure_execution_time:
            stats["execution_time"] = round(elapsed, 3)
        if peak_mb is not None:
            stats["memory_peak_mb"] = peak_mb
        candidate = {
            "mask": getattr(mask_func, "__name__", str(mask_func)),
            # record seed only when it was actually injected into the call:
            # replaying a seedless mask (e.g. voronoi) with a recorded seed
            # kwarg would raise TypeError (ADVICE r01)
            "kwargs": self._dehydrate({**kwargs, **({"seed": seed} if seed_injected else {})}),
            "checksum": chk,
            "stats": stats,
        }
        if keep_dataset:
            candidate["dataset"] = masked
        self.candidates.append(candidate)
        return candidate

    # ---- X2: replay ------------------------------------------------------
    def gen_dataset(self, idx_or_checksum, mask_registry: dict | None = None):
        """Re-run a candidate's recorded mask + kwargs; validate checksum
        (`atlas.py:210-240`)."""
        cand = (self.candidates[idx_or_checksum]
                if isinstance(idx_or_checksum, int)
                else next(c for c in self.candidates
                          if c["checksum"] == idx_or_checksum))
        registry = mask_registry or MASK_REGISTRY
        fn = registry[cand["mask"]]
        kwargs = self._hydrate(dict(cand["kwargs"]))
        masked = fn(self.sensitive, **kwargs).materialize()
        chk = checksum(masked, columns=["mx", "my"])
        if chk != cand["checksum"]:
            raise ValueError(
                f"Checksum of regenerated dataset ({chk}) does not match "
                f"recorded candidate ({cand['checksum']}).")
        return masked

    # ---- X3: sort / prune ------------------------------------------------
    def sort(self, by: str, desc: bool = False) -> None:
        self.candidates.sort(key=lambda c: c["stats"].get(by, float("nan")),
                             reverse=desc)

    def prune(self, by: str, min_value=None, max_value=None) -> None:
        def keep(c):
            v = c["stats"].get(by)
            if v is None:
                return False
            if min_value is not None and v < min_value:
                return False
            if max_value is not None and v > max_value:
                return False
            return True

        self.candidates = [c for c in self.candidates if keep(c)]

    # ---- X5: flatten -----------------------------------------------------
    def as_df(self):
        import pandas as pd

        rows = []
        for i, c in enumerate(self.candidates):
            row = {"idx": i, "mask": c["mask"], "checksum": c["checksum"]}
            row.update({f"kwarg_{k}": v for k, v in c["kwargs"].items()})
            row.update(c["stats"])
            rows.append(row)
        return pd.DataFrame(rows)

    def scatter_data(self, x_stat: str, y_stat: str):
        """Plot-ready (idx, mask, x, y) frame for :meth:`scatter`."""
        df = self.as_df()
        return df[["idx", "mask", x_stat, y_stat]]

    def scatter(self, x_stat: str, y_stat: str):
        """Scatter two candidate stats, annotated by candidate index
        (ref `atlas.py:383-393`). Needs matplotlib (absent in this
        sandbox — scatter_data() gives the same arrays)."""
        from .analysis.plots import _require_matplotlib

        plt = _require_matplotlib()
        df = self.scatter_data(x_stat, y_stat)
        fig, ax = plt.subplots()
        ax.scatter(df[x_stat], df[y_stat])
        for _, r in df.iterrows():
            ax.annotate(str(int(r["idx"])), (r[x_stat], r[y_stat]))
        ax.set_xlabel(x_stat)
        ax.set_ylabel(y_stat)
        return fig

    # ---- X4: persistence -------------------------------------------------
    def to_json(self, path: str) -> None:
        recs = [{k: v for k, v in c.items() if k != "dataset"}
                for c in self.candidates]
        Path(path).write_text(json.dumps(recs, indent=1))

    @classmethod
    def from_json(cls, sensitive_ds, path: str) -> "Atlas":
        return cls(sensitive_ds, candidates=json.loads(Path(path).read_text()))


def _registry() -> dict:
    from .stages.donut import donut, donut_contained
    from .stages.locationswap import locationswap
    from .stages.street import snap_to_streets, street
    from .stages.voronoi import voronoi

    return {
        "donut": donut,
        "donut_contained": donut_contained,
        "street": street,
        "locationswap": locationswap,
        "voronoi": voronoi,
        "snap_to_streets": snap_to_streets,
    }


MASK_REGISTRY = _registry()

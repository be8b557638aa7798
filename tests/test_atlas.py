"""Atlas run manager + checksum: ports of tests/test_atlas.py round-trip,
sort/prune, timing, custom-mask contract, hydration errors."""

import numpy as np
import pytest

from maskmypy_ray.atlas import Atlas
from maskmypy_ray.checksum import checksum


@pytest.fixture(scope="module")
def sensitive(ray_session, sf_dir):
    from maskmypy_ray.pipelines import points_ds

    return points_ds(sf_dir).materialize()


def test_checksum_order_insensitive(points_table):
    import pandas as pd

    df = points_table.select(["doc_id", "x", "y"]).to_pandas()
    shuffled = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    assert checksum(df) == checksum(shuffled)
    df2 = df.copy()
    df2.loc[0, "x"] += 1e-9
    assert checksum(df) != checksum(df2)


def test_atlas_mask_records_candidate(sensitive):
    from maskmypy_ray.stages.donut import donut

    atlas = Atlas(sensitive)
    cand = atlas.mask(donut, seed=42, low=100.0, high=500.0)
    assert cand["mask"] == "donut"
    assert cand["kwargs"]["low"] == 100.0 and cand["kwargs"]["seed"] == 42
    assert len(cand["checksum"]) == 8
    st = cand["stats"]
    assert 100.0 <= st["displacement_min"] <= st["displacement_max"] <= 500.0
    assert st["execution_time"] > 0
    assert len(atlas.candidates) == 1


def test_atlas_replay_checksum(sensitive):
    """gen_dataset re-runs the recipe and validates the checksum
    (atlas.py:210-240)."""
    from maskmypy_ray.stages.donut import donut

    atlas = Atlas(sensitive)
    cand = atlas.mask(donut, seed=7, low=50.0, high=100.0)
    replayed = atlas.gen_dataset(0)
    assert checksum(replayed, columns=["mx", "my"]) == cand["checksum"]
    # tampering with the recorded checksum must fail the replay
    atlas.candidates[0]["checksum"] = "00000000"
    with pytest.raises(ValueError):
        atlas.gen_dataset(0)


def test_atlas_sort_prune_as_df(sensitive):
    from maskmypy_ray.stages.donut import donut

    atlas = Atlas(sensitive)
    atlas.mask(donut, seed=1, low=10.0, high=50.0)
    atlas.mask(donut, seed=1, low=500.0, high=1000.0)
    atlas.sort(by="displacement_mean", desc=True)
    assert (atlas.candidates[0]["stats"]["displacement_mean"]
            > atlas.candidates[1]["stats"]["displacement_mean"])
    df = atlas.as_df()
    assert len(df) == 2 and "displacement_mean" in df.columns
    atlas.prune(by="displacement_mean", max_value=100.0)
    assert len(atlas.candidates) == 1


def test_atlas_json_roundtrip(tmp_path, sensitive):
    from maskmypy_ray.stages.donut import donut

    atlas = Atlas(sensitive)
    atlas.mask(donut, seed=3, low=100.0, high=200.0)
    path = tmp_path / "atlas.json"
    atlas.to_json(str(path))
    restored = Atlas.from_json(sensitive, str(path))
    assert restored.candidates[0]["checksum"] == atlas.candidates[0]["checksum"]
    # replay works from the restored recipe
    replayed = restored.gen_dataset(0)
    assert checksum(replayed, columns=["mx", "my"]) == atlas.candidates[0]["checksum"]


def test_atlas_layer_hydration_error(sensitive):
    """Missing context layer -> ValueError (atlas.py:402-409)."""
    from maskmypy_ray.sources.boundary import boundary_polygon_set
    from maskmypy_ray.stages.donut import donut_contained

    atlas = Atlas(sensitive)
    ps = boundary_polygon_set()
    cand = atlas.mask(donut_contained, seed=42, low=100.0, high=500.0, polygons=ps)
    assert cand["kwargs"]["polygons"].startswith("context_")
    fresh = Atlas(sensitive, candidates=atlas.candidates)
    with pytest.raises(ValueError, match="Could not locate layer"):
        fresh.gen_dataset(0)
    fresh.add_layers(ps)
    replayed = fresh.gen_dataset(0)
    assert checksum(replayed, columns=["mx", "my"]) == cand["checksum"]


def test_atlas_custom_mask_contract(sensitive):
    """Any (Dataset, seed, **kwargs) -> Dataset callable works
    (docs/atlas.md custom-mask surface; tests/test_atlas.py:176-203)."""
    import pyarrow as pa

    def null_mask(ds, seed=None, shift=0.0):
        def f(b: pa.Table) -> pa.Table:
            x = b.column("x").to_numpy(zero_copy_only=False)
            y = b.column("y").to_numpy(zero_copy_only=False)
            b = b.append_column("mx", pa.array(x + shift))
            return b.append_column("my", pa.array(y))
        return ds.map_batches(f, batch_format="pyarrow")

    atlas = Atlas(sensitive)
    cand = atlas.mask(null_mask, seed=9, shift=50.0)
    assert cand["stats"]["displacement_mean"] == 50.0
    assert cand["stats"]["central_drift"] == 50.0

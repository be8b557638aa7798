"""Checkpointed runs: atomic per-shard output, resume skips valid shards,
param changes invalidate, outputs equal the unsharded run."""

import json
import shutil
from pathlib import Path

import pytest

from maskmypy_ray.checkpoint import read_checkpointed, run_checkpointed


def _pipeline(ds):
    from maskmypy_ray.analysis.displacement import displacement
    from maskmypy_ray.stages.donut import donut
    from maskmypy_ray.stages.geoparse import geoparse

    return displacement(donut(geoparse(ds), 100.0, 500.0, 42))


PARAMS = {"mask": "donut", "low": 100.0, "high": 500.0}


def test_checkpoint_run_and_resume(ray_session, sf_dir, tmp_path):
    out = str(tmp_path / "run1")
    r1 = run_checkpointed(sf_dir, _pipeline, out, PARAMS, num_shards=4)
    assert r1["computed"] == 4 and r1["skipped"] == 0
    total = r1["rows"]
    assert total > 0
    # all shards have manifests with lineage metrics
    for p in sorted(Path(out).glob("part=*")):
        man = json.loads((p / "_MANIFEST.json").read_text())
        assert man["rows"] >= 0 and "displacement_mean" in man["metrics"]

    # resume: everything skipped
    r2 = run_checkpointed(sf_dir, _pipeline, out, PARAMS, num_shards=4)
    assert r2["computed"] == 0 and r2["skipped"] == 4 and r2["rows"] == total

    # delete one shard -> only it recomputes
    shutil.rmtree(Path(out) / "part=0002")
    r3 = run_checkpointed(sf_dir, _pipeline, out, PARAMS, num_shards=4)
    assert r3["computed"] == 1 and r3["skipped"] == 3 and r3["rows"] == total

    # shards partition the input: union equals the direct pipeline
    from maskmypy_ray.pipelines import points_ds

    direct = points_ds(sf_dir).count()
    assert read_checkpointed(out).count() == direct == total


def test_checkpoint_param_change_invalidates(ray_session, sf_dir, tmp_path):
    out = str(tmp_path / "run2")
    run_checkpointed(sf_dir, _pipeline, out, PARAMS, num_shards=2)
    r = run_checkpointed(sf_dir, _pipeline, out, {**PARAMS, "high": 900.0},
                         num_shards=2)
    assert r["computed"] == 2 and r["skipped"] == 0

"""street_k loop, mark_unmasked, validators, evaluate(skip_slow=False)."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def sensitive(ray_session, sf_dir):
    from maskmypy_ray.pipelines import points_ds

    return points_ds(sf_dir).materialize()


def test_street_k_stop_raises(sensitive):
    """start > stop -> RuntimeError (reference street.py:167-171)."""
    from maskmypy_ray.sources.roadgraph import synth_road_graph
    from maskmypy_ray.sources.webpages import read_addresses
    from maskmypy_ray.stages.street import street_k

    with pytest.raises(RuntimeError, match="maximum network depth"):
        street_k(sensitive, synth_road_graph(),
                 read_addresses("/root/testdata/sf0.001"),
                 min_k=10_000, start=5, stop=4, suppression=0.99)


def test_street_k_converges_and_suppresses(sensitive, sf_dir):
    """street_k reaches the k-satisfaction target and labels SUPPRESSED
    (reference test_street.py:68-81)."""
    from maskmypy_ray.analysis.aggregates import k_satisfaction
    from maskmypy_ray.sources.roadgraph import synth_road_graph
    from maskmypy_ray.sources.webpages import read_addresses
    from maskmypy_ray.stages.street import street_k

    target_k, suppression = 5, 0.8
    masked = street_k(sensitive, synth_road_graph(), read_addresses(sf_dir),
                      min_k=target_k, start=3, spread=4, increment=4,
                      stop=40, suppression=suppression, seed=12345)
    assert masked is not None
    df = masked.to_pandas()
    assert "SUPPRESSED" in df.columns
    assert set(df["SUPPRESSED"]) <= {"TRUE", "FALSE"}
    sat = (df["k_anonymity"] >= target_k).mean()
    assert sat >= suppression


def test_mark_unmasked(ray_session, sensitive):
    import ray.data

    from maskmypy_ray.stages.suppress import mark_unmasked

    df = sensitive.limit(20).to_pandas()
    df["mx"] = df["x"]
    df["my"] = df["y"]
    df.loc[df.index[:5], "mx"] = df["x"][:5] + 10.0  # 5 moved, 15 unmasked
    ds = ray.data.from_pandas(df)
    out, count = mark_unmasked(ds)
    assert count == 15
    odf = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert odf["UNMASKED"].sum() == 15


def test_validators(ray_session):
    import ray.data

    from maskmypy_ray.stages.validate import (
        crop,
        dataset_bbox,
        pad_bbox,
        validate_points,
        validate_schema,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "lat": pa.array([49.25, 49.26, 49.22]),
        "lon": pa.array([-123.1, -123.12, -123.18]),
        "x": pa.array([0.0, 100.0, 5000.0]),
        "y": pa.array([0.0, 100.0, 5000.0]),
    })
    ds = ray.data.from_arrow(t)
    assert validate_points(ds).count() == 3
    validate_schema(ds, {"lat": pa.float64(), "doc_id": pa.int64()})
    with pytest.raises(ValueError, match="Missing required column"):
        validate_schema(ds, {"nope": None})
    assert pad_bbox((0, 0, 10, 10), 0.2) == (-2, -2, 12, 12)
    assert crop(ds, (-50, -50, 200, 200)).count() == 2
    bb = dataset_bbox(ds)
    assert bb == (0.0, 0.0, 5000.0, 5000.0)

    bad = ray.data.from_arrow(pa.table({
        "lat": pa.array([0.0]), "lon": pa.array([0.0])}))
    with pytest.raises(Exception, match="null-island"):
        validate_points(bad).count()


def test_evaluate_full_with_slow(ray_session, sensitive, sf_dir):
    """evaluate() end-to-end incl. ripley_rmse and k stats
    (reference test_analysis.py:187-197: translate-by-50 ->
    drift=50, displacement_min=50, nnd deltas 0, rmse 0)."""
    from maskmypy_ray.analysis.evaluate import evaluate
    from maskmypy_ray.sources.webpages import read_addresses

    def translate(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False)
        y = b.column("y").to_numpy(zero_copy_only=False)
        b = b.append_column("mx", pa.array(x + 50.0))
        return b.append_column("my", pa.array(y))

    masked = sensitive.map_batches(translate, batch_format="pyarrow")
    stats = evaluate(masked, population=read_addresses(sf_dir), skip_slow=False)
    assert stats["central_drift"] == 50.0
    assert stats["displacement_min"] == 50.0
    assert stats["nnd_min_delta"] == 0.0
    assert stats["ripley_rmse"] == 0.0
    assert stats["k_max"] > stats["k_min"]
    assert 0.0 <= stats["k_satisfaction_50"] <= 1.0

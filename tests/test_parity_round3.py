"""Round-3 reference-parity closures: overlap validation (VERDICT r02
#6), snap_to_streets mask kwarg + Atlas replay (#7), UNMASKED warning
(#8)."""

import numpy as np
import pyarrow as pa
import pytest

from maskmypy_ray.geokernels.pip import PolygonSet
from maskmypy_ray.sources.roadgraph import synth_road_graph

SEED = 42


# ---- #6: validate_nonoverlap ---------------------------------------------


def _rect(x0, y0, x1, y1):
    return (np.array([x0, x1, x1, x0]), np.array([y0, y0, y1, y1]))


def test_overlapping_containers_raise():
    ps = PolygonSet([_rect(0, 0, 10, 10), _rect(5, 5, 15, 15)])
    with pytest.raises(ValueError, match="must not overlap"):
        ps.validate_nonoverlap()


def test_nested_containers_raise():
    # containment without any edge crossing
    ps = PolygonSet([_rect(0, 0, 20, 20), _rect(5, 5, 10, 10)])
    with pytest.raises(ValueError, match="must not overlap"):
        ps.validate_nonoverlap()


def test_shared_border_grid_passes():
    # adjacent cells share edges — interiors are disjoint, no error
    ps = PolygonSet([_rect(0, 0, 10, 10), _rect(10, 0, 20, 10),
                     _rect(0, 10, 10, 20)])
    ps.validate_nonoverlap()


def test_donut_contained_rejects_overlap(ray_session, sf_dir):
    import ray.data

    from maskmypy_ray.stages.donut import donut_contained

    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "x": [1.0], "y": [1.0]}))
    bad = PolygonSet([_rect(0, 0, 10, 10), _rect(5, 5, 15, 15)])
    with pytest.raises(ValueError, match="must not overlap"):
        donut_contained(ds, bad, 1.0, 2.0, SEED)


# ---- #7: snap_to_streets kwarg -------------------------------------------


def test_donut_snap_kwarg_lands_on_nodes(ray_session, sf_dir):
    import ray.data

    from maskmypy_ray.pipelines import points_ds
    from maskmypy_ray.stages.donut import donut

    g = synth_road_graph()
    out = donut(points_ds(sf_dir), 100.0, 500.0, SEED,
                snap_to_streets=True, graph=g).to_pandas()
    nodes = set(zip(g.node_x.tolist(), g.node_y.tolist()))
    assert all((mx, my) in nodes for mx, my in zip(out["mx"], out["my"]))


def test_snap_kwarg_requires_graph(ray_session, sf_dir):
    from maskmypy_ray.pipelines import points_ds
    from maskmypy_ray.stages.donut import donut

    with pytest.raises(ValueError, match="RoadGraph"):
        donut(points_ds(sf_dir), 100.0, 500.0, SEED, snap_to_streets=True)


def test_atlas_replays_donut_snap_recipe(ray_session, sf_dir):
    """A donut+snap candidate round-trips: the graph dehydrates to a
    context layer and replay reproduces the checksum (VERDICT r02 #7)."""
    from maskmypy_ray.atlas import Atlas
    from maskmypy_ray.pipelines import points_ds
    from maskmypy_ray.stages.donut import donut

    g = synth_road_graph()
    atlas = Atlas(points_ds(sf_dir).materialize())
    cand = atlas.mask(donut, seed=SEED, low=100.0, high=500.0,
                      snap_to_streets=True, graph=g)
    assert str(cand["kwargs"]["graph"]).startswith("context_")
    assert cand["kwargs"]["snap_to_streets"] is True
    replayed = atlas.gen_dataset(0)
    assert replayed.count() > 0  # checksum validated inside gen_dataset


# ---- #8: UNMASKED UserWarning --------------------------------------------


def test_locationswap_warns_on_unmasked(ray_session):
    import ray.data

    from maskmypy_ray.stages.locationswap import locationswap

    # one point, addresses all far outside the annulus -> unmasked
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "x": [0.0], "y": [0.0]}))
    addr = pa.table({"addr_id": pa.array([1], type=pa.int64()),
                     "ax": [1.0e6], "ay": [1.0e6]})
    with pytest.warns(UserWarning, match="1 points could not be masked"):
        locationswap(ds, addr, 10.0, 20.0, SEED, warn_unmasked=True)


def test_mark_unmasked_warns(ray_session):
    import ray.data

    from maskmypy_ray.stages.suppress import mark_unmasked

    ds = ray.data.from_arrow(pa.table({
        "x": [0.0, 1.0], "y": [0.0, 1.0],
        "mx": [0.0, 5.0], "my": [0.0, 5.0]}))
    with pytest.warns(UserWarning, match="1 points could not be masked"):
        _, count = mark_unmasked(ds)
    assert count == 1

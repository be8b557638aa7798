"""Street mask: ported reference assertions (tests/masks/test_street.py)
over the synthetic road graph."""

import numpy as np
import pytest

from maskmypy_ray.sources.roadgraph import synth_road_graph
from maskmypy_ray.stages.street import StreetMasker, valid_snap_nodes


@pytest.fixture(scope="module")
def graph():
    return synth_road_graph(seed=42)


def _mask(points_table, graph, low, high, seed=42, max_length=1000.0):
    return StreetMasker(graph, low, high, max_length, seed)(points_table)


def _displacement(m):
    return np.hypot(np.asarray(m.column("mx")) - np.asarray(m.column("x")),
                    np.asarray(m.column("my")) - np.asarray(m.column("y")))


def test_graph_is_connected_and_sized(graph):
    assert graph.n_nodes > 500
    # all nodes have at least one edge after construction? not required;
    # but valid snap set at 1000m must be nearly everything (grid pitch 200m)
    valid = valid_snap_nodes(graph, 1000.0)
    assert valid.mean() > 0.95


def test_street_output_on_network(points_table, graph):
    """Masked points coincide with graph nodes (hermetic version of the
    reference's OSM-intersection test, test_street.py:41-58)."""
    m = _mask(points_table, graph, 5, 10)
    mx = np.asarray(m.column("mx"))
    my = np.asarray(m.column("my"))
    node_set = set(zip(graph.node_x.tolist(), graph.node_y.tolist()))
    hits = sum((a, b) in node_set for a, b in zip(mx.tolist(), my.tolist()))
    assert hits == len(mx)


def test_street_displacement_bound(points_table, graph):
    """max displacement <= high * max_length (test_street.py:9-14)."""
    m = _mask(points_table, graph, 1, 5, max_length=1000.0)
    d = _displacement(m)
    assert d.max() <= 5 * 1000.0


def test_street_determinism(points_table, graph):
    a = _mask(points_table, graph, 5, 10, seed=12345)
    b = _mask(points_table, graph, 5, 10, seed=12345)
    c = _mask(points_table, graph, 5, 10, seed=98765)
    assert a.equals(b)
    assert not a.column("mx").equals(c.column("mx"))


def test_street_monotonic_depth(points_table, graph):
    """Larger node depths displace further on average (test_street.py:61-65)."""
    small = _displacement(_mask(points_table, graph, 1, 3))
    large = _displacement(_mask(points_table, graph, 10, 15))
    assert small.mean() < large.mean()


def test_street_validation(points_table, graph, ray_session):
    from maskmypy_ray.stages.street import street

    with pytest.raises(ValueError):
        street(None, graph, low=5, high=1)


def test_valid_snap_excludes_long_only_nodes(graph):
    """Nodes whose every edge exceeds max_length are peeled."""
    valid_short = valid_snap_nodes(graph, 50.0)  # pitch ~200m -> most invalid
    assert valid_short.mean() < 0.2


def test_oracle_road_grid_assumptions(graph):
    """Pins the two structural facts the street SQL oracles rely on:
    np.arange node coordinates equal X_MIN + i*pitch bit-for-bit, and
    the valid-snap peel converges in ONE round at max_length=1000."""
    from maskmypy_ray.constants import X_MAX, X_MIN, Y_MAX, Y_MIN
    from maskmypy_ray.oracle import _road_grid_shape

    nx, ny, n = _road_grid_shape()
    xs = np.arange(X_MIN, X_MAX + 200.0, 200.0)
    ys = np.arange(Y_MIN, Y_MAX + 200.0, 200.0)
    assert (len(xs), len(ys), graph.n_nodes) == (nx, ny, n)
    assert np.array_equal(xs, X_MIN + np.arange(nx) * 200.0)
    assert np.array_equal(ys, Y_MIN + np.arange(ny) * 200.0)
    # one-round fixpoint: nothing is peeled after the first pass
    one_round = np.zeros(n, dtype=bool)
    short = graph.edge_len <= 1000.0
    cs = np.concatenate([[0], np.cumsum(short.astype(np.int64))])
    one_round = (cs[graph.indptr[1:]] - cs[graph.indptr[:-1]]) > 0
    assert np.array_equal(one_round, valid_snap_nodes(graph, 1000.0))


def test_small_component_terminates():
    """A snap node in a 3-node component with target_node_count > 3 must
    terminate (clamped target), not hang in the cutoff-doubling loop
    (ADVICE r01: dijkstra_ball can never outgrow the component)."""
    import pyarrow as pa

    from maskmypy_ray.sources.roadgraph import RoadGraph

    # tiny island of 3 nodes far from a 2-node mainland
    node_x = np.array([0.0, 100.0, 200.0, 50_000.0, 50_100.0])
    node_y = np.zeros(5)
    edges = np.array([[0, 1], [1, 2], [3, 4]])
    lengths = np.array([100.0, 100.0, 100.0])
    g = RoadGraph(node_x, node_y, edges, lengths)
    pts = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "x": pa.array([10.0]),
        "y": pa.array([5.0]),
    })
    # low/high force target_node_count in [20, 30) >> component size 3
    m = StreetMasker(g, 20, 30, 1000.0, 42)(pts)
    mx, my = m.column("mx")[0].as_py(), m.column("my")[0].as_py()
    assert (mx, my) in set(zip(node_x.tolist(), node_y.tolist()))


def test_street_sharded_single_shard_identity(ray_session, points_table):
    """One shard covering the whole fixture bbox == the broadcast path,
    bit for bit (mx, my, snap_node) — the sharded loader is a pure
    routing layer (VERDICT r03 #7)."""
    import ray.data

    from maskmypy_ray.constants import X_MAX, X_MIN, Y_MAX, Y_MIN
    from maskmypy_ray.stages.street import make_street_shards, street, street_sharded

    ds = ray.data.from_arrow(points_table.select(["doc_id", "x", "y"]))
    shards = make_street_shards([(X_MIN, X_MAX, Y_MIN, Y_MAX)],
                                max_length=1000.0, seed=42)
    a = street_sharded(ds, shards, low=5, high=10, seed=7).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = street(ds, synth_road_graph(seed=42), low=5, high=10, seed=7) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    for col in ("mx", "my", "snap_node"):
        assert (a[col] == b[col]).all(), col


def test_street_sharded_two_regions(ray_session):
    """Two disjoint region shards: every point masks onto a node of ITS
    OWN region's graph (global snap ids disjoint by shard offset), and
    each region's output equals the broadcast path run on that region's
    graph alone."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.constants import X_MAX, X_MIN, Y_MAX, Y_MIN
    from maskmypy_ray.stages.street import (StreetMasker, make_street_shards,
                                            street_sharded, valid_snap_nodes)

    shift = (X_MAX - X_MIN) + 20_000.0  # disjoint second region
    regions = [(X_MIN, X_MAX, Y_MIN, Y_MAX),
               (X_MIN + shift, X_MAX + shift, Y_MIN, Y_MAX)]
    rng_ = np.random.default_rng(3)
    n = 200
    xa = rng_.uniform(X_MIN, X_MAX, n)
    xb = rng_.uniform(X_MIN + shift, X_MAX + shift, n)
    ya = rng_.uniform(Y_MIN, Y_MAX, n)
    yb = rng_.uniform(Y_MIN, Y_MAX, n)
    pts = pa.table({
        "doc_id": pa.array(np.arange(2 * n, dtype=np.int64)),
        "x": pa.array(np.concatenate([xa, xb])),
        "y": pa.array(np.concatenate([ya, yb])),
    })
    shards = make_street_shards(regions, max_length=1000.0, seed=42)
    out = street_sharded(ray.data.from_arrow(pts), shards, low=5, high=10,
                         seed=7).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    off_b = shards[1].id_offset
    assert (out.loc[:n - 1, "snap_node"] < off_b).all()
    assert (out.loc[n:, "snap_node"] >= off_b).all()
    # per-region equality against the broadcast path on the shard graph
    import ray as _ray

    for i, sl in ((0, slice(0, n)), (1, slice(n, 2 * n))):
        g = _ray.get(shards[i].graph_ref)
        masker = StreetMasker(g, 5, 10, 1000.0, seed=7,
                              valid_ref=valid_snap_nodes(g, 1000.0))
        ref = masker(pts.slice(sl.start, n))
        got = out.iloc[sl]
        assert np.array_equal(got["mx"].to_numpy(),
                              np.asarray(ref.column("mx")))
        assert np.array_equal(got["my"].to_numpy(),
                              np.asarray(ref.column("my")))
        assert np.array_equal(got["snap_node"].to_numpy(),
                              np.asarray(ref.column("snap_node"))
                              + shards[i].id_offset)
        # masked coordinates are nodes of this region's own graph
        node_set = set(zip(g.node_x.tolist(), g.node_y.tolist()))
        assert all((a, b) in node_set
                   for a, b in zip(got["mx"], got["my"]))

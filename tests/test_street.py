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

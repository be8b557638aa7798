import numpy as np
import pytest

from maskmypy_ray.analysis.k_anonymity import circle_polygon_area_exact
from maskmypy_ray.geokernels.cells import (
    cell_of_xy,
    cell_xy_components,
    cover_circle_xy,
    neighbors_xy,
)
from maskmypy_ray.geokernels.geometry import (
    latlon_to_xy,
    nearest_point_on_segments,
    planar_distance,
    xy_to_latlon,
)
from maskmypy_ray.geokernels.pip import PolygonSet


def test_projection_roundtrip():
    lat = np.array([49.21, 49.24, 49.269999])
    lon = np.array([-123.19, -123.13, -123.070001])
    x, y = latlon_to_xy(lat, lon)
    lat2, lon2 = xy_to_latlon(x, y)
    assert np.allclose(lat, lat2) and np.allclose(lon, lon2)
    # ~1 degree lat ~ 111 km
    x0, y0 = latlon_to_xy(np.array([49.24]), np.array([-123.13]))
    assert x0[0] == 0.0 and y0[0] == 0.0


def test_planar_distance():
    assert planar_distance(0, 0, 3, 4) == 5.0


def test_pip_rectangle_and_concave():
    # unit square
    ps = PolygonSet([(np.array([0, 1, 1, 0.]), np.array([0, 0, 1, 1.]))])
    x = np.array([0.5, 1.5, -0.1, 0.0, 0.999])
    y = np.array([0.5, 0.5, 0.5, 0.5, 0.999])
    got = ps.contains(0, x, y)
    assert list(got) == [True, False, False, True, True]
    # concave L-shape: [0,2]x[0,2] minus [1,2]x[1,2]
    L = PolygonSet([(np.array([0, 2, 2, 1, 1, 0.]), np.array([0, 0, 1, 1, 2, 2.]))])
    x = np.array([0.5, 1.5, 1.5, 0.5])
    y = np.array([0.5, 0.5, 1.5, 1.5])
    assert list(L.contains(0, x, y)) == [True, True, False, True]


def test_pip_locate_nonoverlapping():
    ps = PolygonSet([
        (np.array([0, 1, 1, 0.]), np.array([0, 0, 1, 1.])),
        (np.array([1, 2, 2, 1.]), np.array([0, 0, 1, 1.])),
    ], poly_ids=[10, 20])
    x = np.array([0.5, 1.5, 5.0])
    y = np.array([0.5, 0.5, 0.5])
    assert list(ps.locate(x, y)) == [10, 20, -1]


def test_polygon_area():
    ps = PolygonSet([(np.array([0, 2, 2, 0.]), np.array([0, 0, 3, 3.]))])
    assert ps.area(0) == 6.0


def test_circle_polygon_area_exact_cases():
    big = (np.array([-10, 10, 10, -10.]), np.array([-10, -10, 10, 10.]))
    assert np.isclose(circle_polygon_area_exact(0, 0, 1, *big), np.pi)
    unit = (np.array([0, 1, 1, 0.]), np.array([0, 0, 1, 1.]))
    assert np.isclose(circle_polygon_area_exact(0, 0, 1, *unit), np.pi / 4)
    # circle entirely outside
    assert circle_polygon_area_exact(5, 5, 0.5, *unit) == 0.0
    # polygon entirely inside circle
    assert np.isclose(circle_polygon_area_exact(0.5, 0.5, 10, *unit), 1.0)


def test_edge_contrib_matches_scalar_kernel():
    """The vectorized edge-array kernel equals the scalar reference
    implementation on randomized circle/polygon configurations covering
    every branch (in-in, sector, entry, exit, chord-through)."""
    from maskmypy_ray.analysis.k_anonymity import _edge_contrib

    rng = np.random.default_rng(11)
    for _ in range(200):
        nv = int(rng.integers(3, 9))
        ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
        rad = rng.uniform(0.5, 3.0, nv)
        rx = rad * np.cos(ang)
        ry = rad * np.sin(ang)
        cx, cy = rng.uniform(-2, 2, 2)
        r = float(rng.uniform(0.1, 3.0))
        expect = circle_polygon_area_exact(cx, cy, r, rx, ry)
        px, py = rx - cx, ry - cy
        qx, qy = np.roll(rx, -1) - cx, np.roll(ry, -1) - cy
        got = abs(_edge_contrib(px, py, qx, qy, np.full(nv, r)).sum())
        assert np.isclose(got, expect, rtol=1e-9, atol=1e-12), (got, expect)


def test_cells_roundtrip_and_cover():
    x = np.array([0.0, 499.9, 500.0, -0.1])
    y = np.array([0.0, 0.0, 0.0, 0.0])
    c = cell_of_xy(x, y, 500.0)
    gx, gy = cell_xy_components(c)
    assert list(gx) == [0, 0, 1, -1]
    nb = neighbors_xy(c[:1], ring=1)
    assert nb.shape == (1, 9)
    assert c[0] in nb[0]
    # circle cover contains the point's own cell and all overlapping ones
    row, cells = cover_circle_xy(np.array([250.0]), np.array([250.0]),
                                 np.array([300.0]), 500.0)
    assert set(row) == {0}
    assert c[0] in set(cells)
    assert len(cells) == 9  # bbox [-50,550]^2 covers 3x3 cells
    row2, cells2 = cover_circle_xy(np.array([250.0]), np.array([250.0]),
                                   np.array([100.0]), 500.0)
    assert len(cells2) == 1  # bbox [150,350]^2 stays in one cell


def test_nearest_point_on_segments():
    qx, qy, d2 = nearest_point_on_segments(
        0.0, 1.0, np.array([-1.0]), np.array([0.0]), np.array([1.0]), np.array([0.0]))
    assert qx[0] == 0.0 and qy[0] == 0.0 and d2[0] == 1.0


def test_segmented_pair_indices_matches_bruteforce():
    from itertools import combinations

    from maskmypy_ray.util import segmented_pair_indices

    rng = np.random.default_rng(7)
    for trial in range(20):
        n_runs = int(rng.integers(1, 12))
        lens = rng.integers(1, 9, size=n_runs)
        new = np.zeros(int(lens.sum()), dtype=bool)
        new[np.concatenate([[0], np.cumsum(lens)[:-1]])] = True
        ia, ib = segmented_pair_indices(new)
        want = []
        start = 0
        for ln in lens:
            want.extend(combinations(range(start, start + int(ln)), 2))
            start += int(ln)
        got = sorted(zip(ia.tolist(), ib.tolist()))
        assert got == sorted(want)
        assert (ia < ib).all() if len(ia) else True
    # empty input
    ia, ib = segmented_pair_indices(np.zeros(0, dtype=bool))
    assert len(ia) == 0 and len(ib) == 0


def test_sorted_member_mask_matches_isin():
    from maskmypy_ray.util import sorted_member_mask

    rng = np.random.default_rng(11)
    for trial in range(10):
        members = np.unique(rng.integers(0, 50, size=rng.integers(0, 20)))
        probe = rng.integers(-5, 60, size=rng.integers(0, 40)).astype(np.int64)
        got = sorted_member_mask(members.astype(np.int64), probe)
        want = np.isin(probe, members)
        assert (got == want).all()


def test_pair_ids_ref_distinct_sorted(ray_session):
    import ray
    import ray.data as rd

    from maskmypy_ray.util import pair_ids_ref

    pairs = rd.from_items([
        {"doc_a": 3, "doc_b": 7}, {"doc_a": 7, "doc_b": 9},
        {"doc_a": 3, "doc_b": 9}, {"doc_a": 1, "doc_b": 3},
    ]).materialize()
    ids = ray.get(pair_ids_ref(pairs, "doc_a", "doc_b"))
    assert ids.tolist() == [1, 3, 7, 9]
    # empty pair set -> empty member array
    empty = rd.from_items([{"doc_a": 1, "doc_b": 2}]) \
        .filter(lambda r: False).materialize()
    assert len(ray.get(pair_ids_ref(empty, "doc_a", "doc_b"))) == 0

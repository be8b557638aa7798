"""Voronoi mask: reference assertions + kernel exactness checks."""

import numpy as np

from maskmypy_ray.stages.voronoi import VoronoiMasker, voronoi_cell_nearest


def _mask_table(points_table):
    x = points_table.column("x").to_numpy()
    y = points_table.column("y").to_numpy()
    k = points_table.column("doc_id").to_numpy()
    return VoronoiMasker((x, y, k))(points_table)


def test_two_points_midpoint():
    """With one neighbor the nearest diagram point is the bisector foot =
    the midpoint."""
    qx, qy, d = voronoi_cell_nearest(0.0, 0.0, np.array([2.0]), np.array([0.0]), 100.0)
    assert np.isclose(qx, 1.0) and np.isclose(qy, 0.0) and np.isclose(d, 1.0)


def test_kernel_matches_all_neighbors_bruteforce():
    """K-limited kNN result equals the full half-plane clip with ALL other
    sites (exactness certificate check)."""
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1000, size=(60, 2))
    keys = np.arange(60)
    import pyarrow as pa

    t = pa.table({"doc_id": keys, "x": pts[:, 0], "y": pts[:, 1]})
    masked = VoronoiMasker((pts[:, 0], pts[:, 1], keys))(t)
    for i in range(60):
        others = np.delete(np.arange(60), i)
        qx, qy, d = voronoi_cell_nearest(pts[i, 0], pts[i, 1],
                                         pts[others, 0], pts[others, 1], 1.0e5)
        assert np.isclose(masked.column("mx")[i].as_py(), qx, atol=1e-6)
        assert np.isclose(masked.column("my")[i].as_py(), qy, atol=1e-6)


def test_voronoi_displacement_positive(points_table):
    """_distance > 0 for every point (reference test_voronoi.py:4-8)."""
    m = _mask_table(points_table)
    d = np.hypot(np.asarray(m.column("mx")) - np.asarray(m.column("x")),
                 np.asarray(m.column("my")) - np.asarray(m.column("y")))
    assert d.min() > 0


def test_voronoi_deterministic(points_table):
    """No RNG: two runs identical (reference has no seed kwarg,
    tests/test_atlas.py:206-210)."""
    a = _mask_table(points_table)
    b = _mask_table(points_table)
    assert a.equals(b)


def test_voronoi_masked_point_equidistant(points_table):
    """Each masked point lies on a bisector: its distances to the two
    nearest sites are equal (within float tolerance), and no site is
    closer."""
    m = _mask_table(points_table)
    x = np.asarray(m.column("x"))
    y = np.asarray(m.column("y"))
    mx = np.asarray(m.column("mx"))
    my = np.asarray(m.column("my"))
    for i in range(0, len(x), 25):
        d = np.hypot(x - mx[i], y - my[i])
        d.sort()
        assert d[0] <= d[1] * (1 + 1e-9)
        own = np.hypot(x[i] - mx[i], y[i] - my[i])
        # own site is among the closest (it's p's own cell boundary)
        assert own <= d[1] * (1 + 1e-9)


def test_voronoi_celled_fallback_reshuffle(ray_session):
    """A tiny cell size leaves every point uncertified in pass 0, forcing
    the doubling-cell halo fallback (VERDICT r02 #9 — no driver collect);
    the result must still equal the broadcast kernel exactly."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.stages.voronoi import VoronoiMasker, voronoi_celled

    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 20_000, size=(40, 2))
    keys = np.arange(40, dtype=np.int64)
    t = pa.table({"doc_id": keys, "x": pts[:, 0], "y": pts[:, 1]})
    ds = ray.data.from_arrow(t)
    cc = voronoi_celled(ds, cell_m=100.0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    bc = VoronoiMasker((pts[:, 0], pts[:, 1], keys))(t)
    assert len(cc) == 40
    assert np.allclose(bc.column("mx").to_numpy(), cc["mx"].to_numpy(), atol=1e-6)
    assert np.allclose(bc.column("my").to_numpy(), cc["my"].to_numpy(), atol=1e-6)


def test_voronoi_celled_matches_broadcast(ray_session, sf_dir):
    """Per-cell + halo voronoi equals the broadcast kernel per point."""
    import ray.data

    from maskmypy_ray.pipelines import points_ds
    from maskmypy_ray.stages.voronoi import voronoi, voronoi_celled

    ds = points_ds(sf_dir).materialize()
    bc = voronoi(ds).select_columns(["doc_id", "mx", "my"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    cc = voronoi_celled(ds, cell_m=1000.0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(bc) == len(cc)
    assert np.allclose(bc["mx"].to_numpy(), cc["mx"].to_numpy(), atol=1e-6)
    assert np.allclose(bc["my"].to_numpy(), cc["my"].to_numpy(), atol=1e-6)

"""Donut mask: ported reference assertions (tests/masks/test_donut.py) +
oracle parity + containment semantics."""

import numpy as np
import pytest

from maskmypy_ray import oracle
from maskmypy_ray.sources.boundary import boundary_polygon_set
from maskmypy_ray.stages.donut import DonutContainedMasker, donut_mask_batch, _validate


def _displacement(m):
    return np.hypot(np.asarray(m.column("mx")) - np.asarray(m.column("x")),
                    np.asarray(m.column("my")) - np.asarray(m.column("y")))


def test_uniform_bounds(points_table):
    """low <= distance <= high (reference test_donut.py:9-16)."""
    for seed in range(10):
        m = donut_mask_batch(points_table, 10.0, 100.0, seed, "uniform")
        d = _displacement(m)
        assert d.min() >= 10.0 and d.max() <= 100.0


def test_areal_bounds(points_table):
    for seed in range(10):
        m = donut_mask_batch(points_table, 10.0, 100.0, seed, "areal")
        d = _displacement(m)
        assert d.min() >= 10.0 and d.max() <= 100.0
    # areal favors larger distances than uniform (max-of-two-uniforms:
    # mean = low + 2/3 span vs low + 1/2 span)
    du = _displacement(donut_mask_batch(points_table, 10.0, 100.0, 1, "uniform"))
    da = _displacement(donut_mask_batch(points_table, 10.0, 100.0, 1, "areal"))
    assert da.mean() > du.mean()


def test_gaussian_mean(points_table):
    """Gaussian: mean near midpoint, relaxed bounds (test_donut.py:18-25)."""
    low, high = 10.0, 100.0
    mid = (high - low) / 2 + low
    m = donut_mask_batch(points_table, low, high, 7, "gaussian")
    d = _displacement(m)
    assert abs(d.mean() - mid) / mid < 0.1


def test_determinism(points_table):
    """Same seed => identical output; different seed => different
    (reference test_donut.py:34-38)."""
    a = donut_mask_batch(points_table, 100.0, 500.0, 42)
    b = donut_mask_batch(points_table, 100.0, 500.0, 42)
    assert a.equals(b)
    c = donut_mask_batch(points_table, 100.0, 500.0, 43)
    assert not a.column("mx").equals(c.column("mx"))


def test_order_independence(points_table):
    """Per-row keyed RNG: masking a shuffled table gives the same result
    per row (impossible in the reference's sequential-RNG design)."""
    perm = np.random.default_rng(0).permutation(points_table.num_rows)
    shuffled = points_table.take(perm)
    a = donut_mask_batch(points_table, 100.0, 500.0, 42).sort_by("doc_id")
    b = donut_mask_batch(shuffled, 100.0, 500.0, 42).sort_by("doc_id")
    assert a.equals(b)


def test_validate_low_ge_high():
    with pytest.raises(ValueError):
        _validate(500.0, 100.0, "uniform")
    with pytest.raises(ValueError):
        _validate(1.0, 2.0, "nope")


def test_donut_oracle_parity(points_table, duck):
    for dist in ("uniform", "areal"):
        m = donut_mask_batch(points_table, 100.0, 500.0, 42, dist).sort_by("doc_id")
        sql = f"WITH {oracle.donut_cte(42, 100.0, 500.0, dist)} SELECT doc_id, mx, my FROM masked ORDER BY doc_id"
        o = duck.execute(sql).arrow()
        assert np.array_equal(np.asarray(m.column("mx")), np.asarray(o.column("mx")))
        assert np.array_equal(np.asarray(m.column("my")), np.asarray(o.column("my")))


def test_containment(points_table):
    """Masked point stays in its original polygon (test_donut.py:41-47)."""
    ps = boundary_polygon_set()
    m = DonutContainedMasker(ps, 100.0, 500.0, 42)(points_table)
    unm = m.column("UNMASKED").to_numpy().astype(bool)
    pid_o = ps.locate(np.asarray(m.column("x")), np.asarray(m.column("y")))
    pid_m = ps.locate(np.asarray(m.column("mx")), np.asarray(m.column("my")))
    assert np.array_equal(pid_o[~unm], pid_m[~unm])
    assert unm.mean() < 0.01  # rejection cap rarely hit at these params
    d = _displacement(m)[~unm]
    assert d.min() >= 100.0 and d.max() <= 500.0


def test_containment_oracle_parity(points_table, duck):
    ps = boundary_polygon_set()
    m = DonutContainedMasker(ps, 100.0, 500.0, 42)(points_table).sort_by("doc_id")
    sql = (f"WITH {oracle.donut_contained_cte(42, 100.0, 500.0)} "
           f"SELECT doc_id, mx, my, UNMASKED FROM masked ORDER BY doc_id")
    o = duck.execute(sql).arrow()
    for col in ("mx", "my", "UNMASKED"):
        assert np.array_equal(np.asarray(m.column(col)), np.asarray(o.column(col))), col

"""Locationswap: ported reference assertions + oracle parity."""

import numpy as np
import pytest

from maskmypy_ray import oracle
from maskmypy_ray.geokernels.geometry import latlon_to_xy
from maskmypy_ray.sources.webpages import synth_addresses_batch
from maskmypy_ray.stages.locationswap import AddressIndex, LocationSwapper


@pytest.fixture(scope="module")
def addr_index(docs_table):
    addr = synth_addresses_batch(docs_table, seed=42)
    ax, ay = latlon_to_xy(addr.column("lat").to_numpy(), addr.column("lon").to_numpy())
    return AddressIndex(addr.column("addr_id").to_numpy(), ax, ay)


def _swap(points_table, idx, low, high, seed=42):
    return LocationSwapper(idx, low, high, seed)(points_table)


def _displacement(m):
    return np.hypot(np.asarray(m.column("mx")) - np.asarray(m.column("x")),
                    np.asarray(m.column("my")) - np.asarray(m.column("y")))


def test_swap_bounds(points_table, addr_index):
    """low <= distance <= high for swapped points
    (test_locationswap.py:8-17, exact-circle annulus)."""
    m = _swap(points_table, addr_index, 100.0, 200.0)
    um = np.asarray(m.column("UNMASKED")).astype(bool)
    d = _displacement(m)[~um]
    assert len(d) and d.min() > 100.0 and d.max() <= 200.0


def test_swap_membership(points_table, addr_index):
    """Every swapped output is an address point (test_locationswap.py:39-45)."""
    m = _swap(points_table, addr_index, 100.0, 500.0)
    um = np.asarray(m.column("UNMASKED")).astype(bool)
    addr_set = set(zip(addr_index.ax.tolist(), addr_index.ay.tolist()))
    for a, b, u in zip(np.asarray(m.column("mx")).tolist(),
                       np.asarray(m.column("my")).tolist(), um):
        if not u:
            assert (a, b) in addr_set


def test_swap_determinism(points_table, addr_index):
    a = _swap(points_table, addr_index, 100.0, 500.0, seed=12345)
    b = _swap(points_table, addr_index, 100.0, 500.0, seed=12345)
    c = _swap(points_table, addr_index, 100.0, 500.0, seed=98765)
    assert a.equals(b)
    assert not a.column("mx").equals(c.column("mx"))


def test_swap_impossible_points_marked(points_table, addr_index):
    """No addresses in a tiny annulus -> keep original + UNMASKED=1
    (test_locationswap.py:62-70)."""
    m = _swap(points_table, addr_index, 1.0, 2.0)
    um = np.asarray(m.column("UNMASKED"))
    assert um.mean() > 0.9
    keep = um.astype(bool)
    assert np.array_equal(np.asarray(m.column("mx"))[keep],
                          np.asarray(m.column("x"))[keep])


def test_swap_validation(ray_session, points_table):
    import pyarrow as pa

    from maskmypy_ray.stages.locationswap import locationswap

    addr = pa.table({"addr_id": [1], "lat": [49.25], "lon": [-123.1]})
    with pytest.raises(ValueError):
        locationswap(None, addr, 100.0, 10.0, 42)


def test_swap_oracle_parity(points_table, docs_table, duck, addr_index):
    m = _swap(points_table, addr_index, 100.0, 500.0).sort_by("doc_id")
    sql = (f"WITH {oracle.locationswap_cte(42, 100.0, 500.0)} "
           "SELECT doc_id, mx, my, UNMASKED FROM swapped ORDER BY doc_id")
    o = duck.execute(sql).arrow()
    for col in ("mx", "my", "UNMASKED"):
        assert np.array_equal(np.asarray(m.column(col)), np.asarray(o.column(col))), col

"""Skew handling: hot-cell salting of the k-anonymity shuffle join.

The address fixture clusters ~30% of points in a small downtown box
(sources/webpages.py), creating hot cells. Salting splits each cell's
POINTS into ``salt`` subgroups and replicates the (halo'd) addresses per
subgroup — more, smaller groups through the shuffle. Results must be
identical at any salt (and to the zero-shuffle broadcast plan).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def masked(ray_session, sf_dir):
    from maskmypy_ray.pipelines import flagship

    return flagship(sf_dir).materialize()


def _k(masked, sf_dir, **kwargs):
    from maskmypy_ray.analysis.k_anonymity import calculate_k
    from maskmypy_ray.sources.webpages import read_addresses

    return calculate_k(masked, read_addresses(sf_dir), **kwargs) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_salted_shuffle_matches_unsalted(masked, sf_dir):
    base = _k(masked, sf_dir, mode="shuffle", salt=1)
    salted = _k(masked, sf_dir, mode="shuffle", salt=4)
    assert base.equals(salted)


def test_salted_matches_broadcast(masked, sf_dir):
    bc = _k(masked, sf_dir, mode="broadcast")
    salted = _k(masked, sf_dir, mode="shuffle", salt=3)
    assert bc.equals(salted)


def test_hot_cells_exist(sf_dir, points_table):
    """The fixture really is skewed: max cell load >> median cell load."""
    from maskmypy_ray.geokernels.cells import cell_of_xy
    from maskmypy_ray.geokernels.geometry import latlon_to_xy
    from maskmypy_ray.sources.webpages import addresses_table

    addr = addresses_table(sf_dir)
    ax, ay = latlon_to_xy(addr.column("lat").to_numpy(), addr.column("lon").to_numpy())
    cells = cell_of_xy(ax, ay, 500.0)
    _, counts = np.unique(cells, return_counts=True)
    assert counts.max() > 5 * np.median(counts)

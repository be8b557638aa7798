"""Fused single-pass flagship (maskmypy_ray.flagship) vs the composed
float64 stage chain — same scalars, one streaming pass."""

import numpy as np
import pytest

from maskmypy_ray.analysis.aggregates import k_satisfaction
from maskmypy_ray.analysis.displacement import displacement
from maskmypy_ray.analysis.k_anonymity import calculate_k
from maskmypy_ray.flagship import fused_mask_k_stats
from maskmypy_ray.sources.boundary import boundary_polygon_set
from maskmypy_ray.sources.webpages import addresses_table, read_webpages
from maskmypy_ray.stages.donut import donut_contained
from maskmypy_ray.stages.geoparse import geoparse

SF = "/root/testdata/sf0.001"
SEED = 42
LOW, HIGH = 100.0, 500.0


@pytest.fixture(scope="module")
def composed(ray_session):
    pts = geoparse(read_webpages(SF, seed=SEED, include_html=False)) \
        .select_columns(["doc_id", "x", "y"])
    k = calculate_k(
        displacement(donut_contained(pts, boundary_polygon_set(), LOW, HIGH, SEED)),
        addresses_table(SF, seed=SEED), cell_m=HIGH, mode="broadcast").materialize()
    return {"rows": k.count(), "k_sat": k_satisfaction(k, 5)}


def _fused(dtype):
    return fused_mask_k_stats(
        read_webpages(SF, seed=SEED, include_html=False), boundary_polygon_set(),
        addresses_table(SF, seed=SEED), LOW, HIGH, SEED, min_k=5, cell_m=HIGH,
        dtype=dtype)


def test_fused_float64_matches_composed_exactly(composed):
    s = _fused(dtype=None)
    assert s["rows"] == composed["rows"]
    assert s["k_sat"] == composed["k_sat"]


def test_fused_float32_within_boundary_tolerance(composed):
    # float32 coords can flip exact-circle boundary cases (measure-zero-ish
    # at ~1e5 m magnitudes); the satisfaction scalar must stay within 1%.
    s = _fused(dtype=np.float32)
    assert s["rows"] == composed["rows"]
    assert abs(s["k_sat"] - composed["k_sat"]) <= 0.01

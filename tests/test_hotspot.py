"""Getis-Ord Gi* hotspot cells (`stages/raster.py:hotspot_cells`)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _brute_gi(grid: np.ndarray) -> np.ndarray:
    """Straightforward per-cell Gi* (3x3 self-inclusive weights) with
    the same quantization rule, written independently of the engine's
    padded-slice kernel."""
    h, w = grid.shape
    N = h * w
    T = int(grid.sum())
    S2 = int((grid.astype(np.int64) ** 2).sum())
    mean = np.float64(T) / N
    S = np.sqrt(np.float64(S2) / N - mean * mean)
    out = np.zeros((h, w), dtype=np.int64)
    for r in range(h):
        for c in range(w):
            rs = slice(max(0, r - 1), min(h, r + 2))
            cs = slice(max(0, c - 1), min(w, c + 2))
            nbr = int(grid[rs, cs].sum())
            wn = grid[rs, cs].size
            num = np.float64(nbr) - mean * np.float64(wn)
            var = np.float64(N * wn - wn * wn) / np.float64(N - 1)
            den = S * np.sqrt(var)
            out[r, c] = 0 if den == 0 else np.floor(1e6 * (num / den))
    return out


def test_hotspot_matches_brute_force(ray_session):
    from maskmypy_ray.stages.raster import RASTER_H, RASTER_W, hotspot_cells

    rng = np.random.default_rng(3)
    rows = rng.integers(0, RASTER_H, 400)
    cols = rng.integers(0, RASTER_W, 400)
    # a deliberate hot blob
    rows = np.concatenate([rows, np.full(200, 10)])
    cols = np.concatenate([cols, np.full(200, 20)])
    grid = np.zeros((RASTER_H, RASTER_W), dtype=np.int64)
    np.add.at(grid, (rows, cols), 1)
    nz = np.nonzero(grid)
    raster = ray_session.data.from_arrow(pa.table({
        "cell_row": pa.array(nz[0].astype(np.int64)),
        "cell_col": pa.array(nz[1].astype(np.int64)),
        "n": pa.array(grid[nz].astype(np.int64)),
    }))
    got = hotspot_cells(raster).to_pandas() \
        .sort_values(["cell_row", "cell_col"]).reset_index(drop=True)
    exp = _brute_gi(grid)
    assert len(got) == RASTER_H * RASTER_W
    g = got["gi_micro"].to_numpy().reshape(RASTER_H, RASTER_W)
    assert (g == exp).all()
    # the planted blob is a significant hotspot
    assert g[10, 20] > 1_960_000
    # neighbor bookkeeping: interior cells see 9 neighbors, corners 4
    wn = got["w_nbrs"].to_numpy().reshape(RASTER_H, RASTER_W)
    assert wn[5, 5] == 9 and wn[0, 0] == 4 and wn[0, 5] == 6


def test_hotspot_constant_raster_is_flat(ray_session):
    """S == 0 (constant field) => every z quantizes to 0 on both
    sides' guard path."""
    from maskmypy_ray.stages.raster import RASTER_H, RASTER_W, hotspot_cells

    rr, cc = np.meshgrid(np.arange(RASTER_H), np.arange(RASTER_W),
                         indexing="ij")
    raster = ray_session.data.from_arrow(pa.table({
        "cell_row": pa.array(rr.ravel().astype(np.int64)),
        "cell_col": pa.array(cc.ravel().astype(np.int64)),
        "n": pa.array(np.full(rr.size, 7, dtype=np.int64)),
    }))
    got = hotspot_cells(raster).to_pandas()
    assert (got["gi_micro"] == 0).all()


def test_hotspot_fixture_parity_with_sql(ray_session, sf_dir):
    duckdb = pytest.importorskip("duckdb")
    from maskmypy_ray import pipelines

    res = pipelines.FULL_QUERIES["hotspot_cells"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    ora = con.execute(
        pipelines.full_oracle_queries()["hotspot_cells"]).fetchdf()
    a = res.sort_values(["cell_row", "cell_col"]).reset_index(drop=True)
    b = ora.sort_values(["cell_row", "cell_col"]) \
        .reset_index(drop=True)[list(a.columns)]
    assert (a.values == b.values).all()

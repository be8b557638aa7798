import duckdb
import numpy as np

from maskmypy_ray import rng


def test_mix32_range_and_determinism():
    keys = np.arange(10000, dtype=np.int64)
    a = rng.substream(keys, 42, 3)
    b = rng.substream(keys, 42, 3)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() <= 0xFFFFFFFF
    # different seed / stream give different values
    assert not np.array_equal(a, rng.substream(keys, 43, 3))
    assert not np.array_equal(a, rng.substream(keys, 42, 4))


def test_uniform01_distribution():
    u = rng.uniform01(np.arange(200000), 42, 7)
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(np.corrcoef(u[:-1], u[1:])[0, 1]) < 0.01


def test_sql_parity():
    keys = np.arange(500, dtype=np.int64)
    for seed in (42, 9999999999999999):
        for stream in (0, 5, 66):
            py = rng.uniform01(keys, seed, stream)
            sql = rng.sql_uniform01("k", seed, stream)
            got = duckdb.sql(
                f"select {sql} as u from (select unnest(range(0,500)) as k) order by k"
            ).fetchnumpy()["u"]
            assert np.array_equal(py, got)


def test_mix32_inplace_bit_identical():
    """mix32_inplace is the allocation-free twin of mix32 — identical
    output on the full 32-bit domain sample, including the 2D slab
    shape the MinHash signature kernel feeds it."""
    r = np.random.default_rng(7)
    x = r.integers(0, 2**32, size=(1000, 64)).astype(np.int64)
    x[0, :4] = [0, 1, 2**32 - 1, 0x9E3779B9]
    out = rng.mix32_inplace(x.copy(), np.empty_like(x))
    assert np.array_equal(out, rng.mix32(x))

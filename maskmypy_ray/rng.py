"""Counter-based per-row RNG.

The reference draws from ONE sequential ``numpy.default_rng`` stream
(``/root/reference/maskmypy/masks/donut.py:110-111``), which makes output
depend on row order — impossible to reproduce under parallel execution.
This engine instead derives an independent 32-bit hash stream per
``(seed, row_key, stream_index)`` triple, so results are byte-identical at
any parallelism / partitioning / retry (SURVEY.md §7.6).

The mixer is the classic ``h = ((h >> 16) ^ h) * 0x45d9f3b`` integer-hash
(public domain, widely published as "lowbias" / triple32-style avalanche).
All products fit in a signed 64-bit integer (operand < 2^32, constant
< 2^27), so the exact same arithmetic is expressible in DuckDB SQL —
see :func:`sql_mix32` — letting the driver's DuckDB oracle reproduce even
the *randomized* masks bit-for-bit.

Stream index registry (keep in sync with oracle.py):

====  =======================================================
 idx  purpose
====  =======================================================
  0   webpage has-coordinate draw
  1   webpage latitude offset
  2   webpage longitude offset
  3   donut hypotenuse uniform draw
  4   donut x-fraction draw
  5   donut direction (quadrant) draw
  6   donut areal draw (max-of-two-uniforms closed form)
  7   donut gaussian Box-Muller u
  8   donut gaussian Box-Muller v
  9   locationswap candidate choice
 10   street target-node-count draw
 32+  addresses: per-doc address j uses 32+4j (downtown), 33+4j (lat), 34+4j (lon)
 64+  containment rejection round r uses 64+4r .. 67+4r
      (hyp, x-frac, direction, Box-Muller v)
 200  road-graph node x-jitter; 201 y-jitter; 202 edge drop
 900  displacement-map plot sampling (analysis/plots.py)
 910  stratified data-mix sampling (text/corpus.py)
 911  fixed-k uniform sampling (text/corpus.py)
 912  per-host page cap rank (text/corpus.py)
 913  weighted Bernoulli sampling (text/corpus.py)
 914  shard-shuffle permutation key (text/corpus.py shuffle_shards)
 300+ Ripley CSR simulation s uses 300+2s / 301+2s (s < ~300; streams
      900+ are reserved above that, i.e. simulations <= 299)
10000 ANN random hyperplanes u; 10001 v (kept clear of the Ripley range)
====  =======================================================
"""

from __future__ import annotations

import numpy as np

_M32 = 0xFFFFFFFF
_C = 0x45D9F3B  # < 2^27 so (2^32-1) * C < 2^59 fits in int64
_STREAM_STEP = 1013904223  # Knuth LCG increment, coprime with 2^32


def gen_seed() -> int:
    """16-digit seed from SystemRandom, like the reference's auto-seed
    (`/root/reference/maskmypy/tools.py:85-95`). Deviation (documented):
    the reference treats ANY falsy seed as "no seed" (`donut.py:74`), so
    an explicit 0 silently reseeds; this engine auto-generates only on
    ``seed=None`` — 0 is a legal explicit seed here."""
    from random import SystemRandom

    return SystemRandom().randint(10 ** 15, 10 ** 16 - 1)


def mix32(x: np.ndarray | int) -> np.ndarray | int:
    """Avalanche a 32-bit value. Vectorized over int64 numpy arrays.

    Mirrors the SQL emitted by :func:`sql_mix32` exactly.
    """
    x = np.asarray(x, dtype=np.int64) & _M32
    x = x ^ (x >> 16)
    x = (x * _C) & _M32
    x = x ^ (x >> 16)
    x = (x * _C) & _M32
    x = x ^ (x >> 16)
    return x


def mix32_inplace(x: np.ndarray, tmp: np.ndarray) -> np.ndarray:
    """:func:`mix32` computed IN PLACE over int64 array ``x`` using
    ``tmp`` (same shape) as scratch — bit-identical output, zero
    allocations. The expression form allocates ~9 slab-sized
    temporaries per call; on hosts where first-touch page faults are
    slow that dominates slab-sized kernels (the MinHash signature
    matrix), so the hot path passes preallocated buffers instead."""
    x &= _M32
    np.right_shift(x, 16, out=tmp)
    x ^= tmp
    x *= _C
    x &= _M32
    np.right_shift(x, 16, out=tmp)
    x ^= tmp
    x *= _C
    x &= _M32
    np.right_shift(x, 16, out=tmp)
    x ^= tmp
    return x


def substream(key: np.ndarray | int, seed: int, stream: int) -> np.ndarray:
    """32-bit hash for (row key, seed, stream index)."""
    s = (int(seed) % (1 << 32) + stream * _STREAM_STEP) & _M32
    k = np.asarray(key, dtype=np.int64) & _M32
    return mix32(np.bitwise_xor(k, mix32(s)))


def uniform01(key: np.ndarray | int, seed: int, stream: int) -> np.ndarray:
    """U[0, 1) double derived from the substream: h / 2^32."""
    return substream(key, seed, stream) / 4294967296.0


# ---------------------------------------------------------------------------
# SQL emitters — produce DuckDB expressions computing the identical values.
# ---------------------------------------------------------------------------


def sql_mix32(expr: str) -> str:
    """DuckDB SQL expression equal to ``mix32(expr)`` for 0 <= expr < 2^32."""
    a = f"xor({expr}, ({expr}) >> 16)"
    b = f"(({a}) * {_C}) & {_M32}"
    c = f"xor({b}, ({b}) >> 16)"
    d = f"(({c}) * {_C}) & {_M32}"
    return f"xor({d}, ({d}) >> 16)"


def sql_substream(key_expr: str, seed: int, stream: int) -> str:
    """DuckDB SQL expression equal to ``substream(key_expr, seed, stream)``."""
    s = (int(seed) % (1 << 32) + stream * _STREAM_STEP) & _M32
    smix = mix32(s)  # constant-fold the seed side in Python
    return sql_mix32(f"xor(({key_expr}) & {_M32}, {int(smix)})")


def sql_uniform01(key_expr: str, seed: int, stream: int) -> str:
    """DuckDB SQL expression equal to ``uniform01(key_expr, seed, stream)``."""
    return f"(({sql_substream(key_expr, seed, stream)}) / 4294967296.0)"

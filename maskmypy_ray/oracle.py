"""DuckDB oracle SQL emitters.

The driver's correctness gate runs each ``queries()[name](sf_dir)`` Ray
pipeline AND the matching ``oracle_sql()[name]`` DuckDB statement over the
same parquet tables, then compares row-count + schema + order-insensitive
value-hash. Because the engine's per-row RNG (:mod:`maskmypy_ray.rng`) and
all float math are expressible as plain 64-bit arithmetic, these emitters
reproduce the engine bit-for-bit — including the *randomized* donut masks
and the containment rejection loop.

Every CTE here mirrors a function in :mod:`maskmypy_ray.sources.webpages`,
:mod:`maskmypy_ray.stages.geoparse` or :mod:`maskmypy_ray.stages.donut`;
keep them in lockstep.
"""

from __future__ import annotations

from . import constants as C
from .rng import sql_uniform01
from .sources.webpages import (
    DOWNTOWN_PROB,
    DT_LAT_BASE_MICRO,
    DT_LAT_SPAN_MICRO,
    DT_LON_FRAC_BASE_MICRO,
    DT_LON_SPAN_MICRO,
)

_KEY = "doc_id"  # doc_ids are < 2^32 in all testdata scales

COORD_RE = r"(-?[0-9]{1,3}\.[0-9]{6}), (-?[0-9]{1,3}\.[0-9]{6})"


def _u(seed: int, stream: int, key: str = _KEY) -> str:
    return sql_uniform01(key, seed, stream)


def pages_cte(seed: int) -> str:
    """Mirror of sources.webpages.derive_webpages_batch (sans html)."""
    lat_micro = f"({C.LAT_BASE_MICRO} + CAST(floor({_u(seed, 1)} * {C.LAT_SPAN_MICRO}) AS BIGINT))"
    lon_frac = f"({C.LON_FRAC_BASE_MICRO} + CAST(floor({_u(seed, 2)} * {C.LON_SPAN_MICRO}) AS BIGINT))"
    return f"""pages AS (
  SELECT doc_id,
    'https://' || source || '.example.org/page/' || CAST(doc_id AS VARCHAR) AS url,
    TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id) AS warc_ts,
    CASE WHEN {_u(seed, 0)} < {C.COORD_PROB!r}
      THEN text || ' Located at 49.' || lpad(CAST({lat_micro} % 1000000 AS VARCHAR), 6, '0')
           || ', -123.' || lpad(CAST({lon_frac} AS VARCHAR), 6, '0') || '.'
      ELSE text END AS text,
    lang
  FROM documents
)"""


def points_cte(seed: int) -> str:
    """pages -> geoparsed points with planar x/y (mirror of stages.geoparse)."""
    return f"""{pages_cte(seed)},
geoparsed AS (
  SELECT doc_id, url, warc_ts, text, lang,
    CAST(regexp_extract(text, '{COORD_RE}', 1) AS DOUBLE) AS lat,
    CAST(regexp_extract(text, '{COORD_RE}', 2) AS DOUBLE) AS lon
  FROM pages
  WHERE regexp_extract(text, '{COORD_RE}') <> ''
),
points AS (
  SELECT *,
    (lon - ({C.LON0!r})) * {C.METERS_PER_DEG_LON!r} AS x,
    (lat - {C.LAT0!r}) * {C.METERS_PER_DEG_LAT!r} AS y,
    least(greatest(CAST(floor((lat + 90.0) / 180.0 * {1 << C.GLOBAL_CELL_RES}) AS BIGINT), 0), {(1 << C.GLOBAL_CELL_RES) - 1})
      * {1 << C.GLOBAL_CELL_RES}
      + least(greatest(CAST(floor((lon + 180.0) / 360.0 * {1 << C.GLOBAL_CELL_RES}) AS BIGINT), 0), {(1 << C.GLOBAL_CELL_RES) - 1}) AS cell
  FROM geoparsed
)"""


def _offset_exprs(seed: int, low: float, high: float, distribution: str,
                  streams: tuple[int, int, int], key: str = _KEY) -> tuple[str, str]:
    """SQL (xoff, yoff) mirroring stages.donut._offsets (uniform/areal)."""
    s_hyp, s_x, s_dir = streams
    if distribution == "uniform":
        hyp = f"({low!r} + ({high!r} - {low!r}) * {_u(seed, s_hyp, key)})"
    elif distribution == "areal":
        hyp = f"({low!r} + ({high!r} - {low!r}) * sqrt({_u(seed, s_hyp, key)}))"
    else:
        raise ValueError("only uniform/areal are SQL-expressible (gaussian uses log/cos)")
    xraw = f"({hyp} * {_u(seed, s_x, key)})"
    yraw = f"sqrt({hyp} * {hyp} - {xraw} * {xraw})"
    d = _u(seed, s_dir, key)
    sx = f"(CASE WHEN {d} < 0.25 THEN -1.0 WHEN {d} >= 0.5 AND {d} < 0.75 THEN -1.0 ELSE 1.0 END)"
    sy = f"(CASE WHEN {d} >= 0.25 AND {d} < 0.75 THEN -1.0 ELSE 1.0 END)"
    return f"({xraw} * {sx})", f"({yraw} * {sy})"


def donut_cte(seed: int, low: float, high: float, distribution: str = "uniform") -> str:
    """points -> masked (mx, my) via the plain donut mask (M1)."""
    xoff, yoff = _offset_exprs(seed, low, high, distribution, (3, 4, 5))
    return f"""{points_cte(seed)},
masked AS (
  SELECT *, x + {xoff} AS mx, y + {yoff} AS my FROM points
)"""


def grid_pid(x: str, y: str) -> str:
    """Arithmetic polygon-id of the rectangular containment grid; -1 when
    outside. Mirrors PolygonSet.locate over sources.boundary's grid
    (half-open [min, max) edges match the crossing-number kernel)."""
    x0, y0 = C.X_MIN, C.Y_MIN
    w = (C.X_MAX - C.X_MIN) / C.GRID_NX
    h = (C.Y_MAX - C.Y_MIN) / C.GRID_NY
    return (
        f"(CASE WHEN {x} >= {x0!r} AND {x} < {C.X_MAX!r} AND {y} >= {y0!r} AND {y} < {C.Y_MAX!r} "
        f"THEN CAST(floor(({y} - {y0!r}) / {h!r}) AS BIGINT) * {C.GRID_NX} "
        f"+ CAST(floor(({x} - {x0!r}) / {w!r}) AS BIGINT) ELSE -1 END)"
    )


def donut_contained_cte(seed: int, low: float, high: float,
                        distribution: str = "uniform",
                        max_rounds: int = C.MAX_CONTAIN_ROUNDS) -> str:
    """points -> contained-masked via unrolled rejection rounds (M2 mirror
    of stages.donut.DonutContainedMasker over the boundary grid).

    Emitted as a CHAIN of CTEs carrying (mx, my, done) accumulator columns
    — one pair of CTEs per round — so each expression references only
    materialized columns of the previous CTE. A single flat SELECT with
    lateral aliases makes DuckDB's binder re-expand the (large) RNG
    expression trees combinatorially and OOM.
    """
    parts = [points_cte(seed)]
    parts.append(
        f"""r0 AS (
  SELECT *, {grid_pid('x', 'y')} AS pid0, x AS mx, y AS my, FALSE AS done
  FROM points
)"""
    )
    prev = "r0"
    for r in range(max_rounds):
        streams = (3, 4, 5) if r == 0 else (64 + 4 * r, 65 + 4 * r, 66 + 4 * r)
        xoff, yoff = _offset_exprs(seed, low, high, distribution, streams)
        parts.append(
            f"""c{r} AS (
  SELECT *, x + {xoff} AS cx, y + {yoff} AS cy FROM {prev}
)"""
        )
        parts.append(
            f"""s{r} AS (
  SELECT * EXCLUDE (cx, cy, mx, my, done),
    CASE WHEN NOT done AND {grid_pid('cx', 'cy')} = pid0 THEN cx ELSE mx END AS mx,
    CASE WHEN NOT done AND {grid_pid('cx', 'cy')} = pid0 THEN cy ELSE my END AS my,
    (done OR {grid_pid('cx', 'cy')} = pid0) AS done
  FROM c{r}
)"""
        )
        prev = f"s{r}"
    parts.append(
        f"""masked AS (
  SELECT doc_id, url, warc_ts, text, lang, lat, lon, x, y, pid0, mx, my,
         CAST(CASE WHEN done THEN 0 ELSE 1 END AS BIGINT) AS UNMASKED
  FROM {prev}
)"""
    )
    return ",\n".join(parts)


def addresses_cte(seed: int) -> str:
    """Mirror of sources.webpages.synth_addresses_batch (4-way UNION ALL so
    per-address stream constants fold)."""
    parts = []
    for j in range(C.ADDRESSES_PER_DOC):
        ub = _u(seed, 32 + 4 * j)
        ul = _u(seed, 33 + 4 * j)
        uo = _u(seed, 34 + 4 * j)
        lat_micro = (
            f"CASE WHEN {ub} < {DOWNTOWN_PROB!r} "
            f"THEN ({DT_LAT_BASE_MICRO} + CAST(floor({ul} * {DT_LAT_SPAN_MICRO}) AS BIGINT)) "
            f"ELSE ({C.LAT_BASE_MICRO} + CAST(floor({ul} * {C.LAT_SPAN_MICRO}) AS BIGINT)) END"
        )
        lon_frac = (
            f"CASE WHEN {ub} < {DOWNTOWN_PROB!r} "
            f"THEN ({DT_LON_FRAC_BASE_MICRO} + CAST(floor({uo} * {DT_LON_SPAN_MICRO}) AS BIGINT)) "
            f"ELSE ({C.LON_FRAC_BASE_MICRO} + CAST(floor({uo} * {C.LON_SPAN_MICRO}) AS BIGINT)) END"
        )
        parts.append(
            f"SELECT doc_id * {C.ADDRESSES_PER_DOC} + {j} AS addr_id, "
            f"({lat_micro}) / 1000000.0 AS lat, "
            f"-(123.0 + ({lon_frac}) / 1000000.0) AS lon FROM documents"
        )
    body = "\n  UNION ALL\n  ".join(parts)
    return f"""addresses AS (
  {body}
),
addr_xy AS (
  SELECT addr_id,
    (lon - ({C.LON0!r})) * {C.METERS_PER_DEG_LON!r} AS ax,
    (lat - {C.LAT0!r}) * {C.METERS_PER_DEG_LAT!r} AS ay
  FROM addresses
)"""


def locationswap_cte(seed: int, low: float, high: float) -> str:
    """points + addresses -> swapped (mx, my, UNMASKED). Mirror of
    stages.locationswap.LocationSwapper: exact-circle annulus
    (low^2 < d^2 <= high^2), uniform pick = index floor(u9 * n) over
    candidates sorted by addr_id, keep-original + UNMASKED when none."""
    u9 = _u(seed, 9, "p.doc_id")
    return f"""{points_cte(seed)},
{addresses_cte(seed)},
cand AS (
  SELECT p.doc_id, a.addr_id, a.ax, a.ay,
         row_number() OVER (PARTITION BY p.doc_id ORDER BY a.addr_id) - 1 AS rk,
         count(*) OVER (PARTITION BY p.doc_id) AS n
  FROM points p JOIN addr_xy a
    ON (a.ax - p.x)*(a.ax - p.x) + (a.ay - p.y)*(a.ay - p.y) > {low!r} * {low!r}
   AND (a.ax - p.x)*(a.ax - p.x) + (a.ay - p.y)*(a.ay - p.y) <= {high!r} * {high!r}
),
chosen AS (
  SELECT c.doc_id, c.ax, c.ay FROM cand c
  WHERE c.rk = CAST(floor({sql_uniform01('c.doc_id', seed, 9)} * c.n) AS BIGINT)
),
swapped AS (
  SELECT p.doc_id, p.url, p.warc_ts, p.text, p.lang, p.x, p.y,
         COALESCE(ch.ax, p.x) AS mx, COALESCE(ch.ay, p.y) AS my,
         CAST(CASE WHEN ch.doc_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS UNMASKED
  FROM points p LEFT JOIN chosen ch ON p.doc_id = ch.doc_id
)"""

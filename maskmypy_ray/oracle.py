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
                  streams: tuple[int, int, int], key: str = _KEY,
                  s_bmv: int = 7) -> tuple[str, str]:
    """SQL (xoff, yoff) mirroring stages.donut._offsets.

    uniform/areal are pure 64-bit arithmetic — bit-exact vs the engine.
    gaussian emits the same Box–Muller expression with DuckDB's
    ln/cos/sqrt; those libm calls drift from numpy by <= 1 ulp on ~10%
    of draws (measured), so gaussian comparisons must round (the
    donut_gaussian oracle compares mx/my at 4 dp — sub-millimeter on
    meter-scale coordinates; drift is ~1e-13 m, flip probability ~1e-9
    per value)."""
    s_hyp, s_x, s_dir = streams
    if distribution == "uniform":
        hyp = f"({low!r} + ({high!r} - {low!r}) * {_u(seed, s_hyp, key)})"
    elif distribution == "areal":
        hyp = f"({low!r} + ({high!r} - {low!r}) * sqrt({_u(seed, s_hyp, key)}))"
    elif distribution == "gaussian":
        mean = ((high - low) / 2.0) + low
        sigma = ((high - low) / 2.0) / 2.5
        u = _u(seed, s_hyp, key)
        v = _u(seed, s_bmv, key)
        hyp = (f"abs({mean!r} + {sigma!r} * (sqrt(-2.0 * ln(1.0 - {u})) "
               f"* cos(2.0 * pi() * {v})))")
    else:
        raise ValueError(f"unknown distribution {distribution!r}")
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


def areal_k_cte(seed: int) -> str:
    """Boundary-grid polygons + vectorized circle∩polygon edge kernel as
    SQL, mirroring ``analysis.k_anonymity._edge_contrib`` case-for-case
    over the rectangles of ``sources.boundary.boundary_polygon_set``.
    Expects a CTE ``flag`` with (doc_id, mx, my, _distance) upstream;
    emits ``areal`` with (doc_id, k_anonymity).

    Float caveat (documented): the engine sums edge contributions and
    polygon shoelace terms in numpy evaluation order, SQL in SUM order —
    last-ulp differences can only flip k at an exact floor boundary,
    which is measure-zero for the randomized masks."""
    from .rng import sql_mix32

    x0, y0 = C.X_MIN, C.Y_MIN
    w = (C.X_MAX - C.X_MIN) / C.GRID_NX
    h = (C.Y_MAX - C.Y_MIN) / C.GRID_NY
    npoly = C.GRID_NX * C.GRID_NY
    pop = sql_mix32(f"({seed * 131} + pid) & {0xFFFFFFFF}")
    # sequential-order shoelace of ring [ax,x2,x2,ax] x [ay,ay,y2,y2]
    shoelace = ("0.5 * abs((((x1*y1 + x2*y2) + x2*y2) + x1*y1) "
                "- (((y1*x2 + y1*x2) + y2*x1) + y2*x1))")
    # ::DOUBLE casts: DuckDB parses long float literals as DECIMAL, and
    # BIGINT * DECIMAL chains overflow the DECIMAL scale.
    xw = f"{x0!r}::DOUBLE + (i % {C.GRID_NX}) * {w!r}::DOUBLE"
    yh = f"{y0!r}::DOUBLE + (i // {C.GRID_NX}) * {h!r}::DOUBLE"
    return f"""pg AS (
  SELECT CAST(i AS BIGINT) AS pid,
         {xw} AS x1,
         {yh} AS y1,
         ({xw}) + {w!r}::DOUBLE AS x2,
         ({yh}) + {h!r}::DOUBLE AS y2,
         CAST(50 + ({pop}) % 500 AS DOUBLE) AS pop
  FROM range({npoly}) t(i)
),
pg2 AS (
  SELECT *, {shoelace} AS parea FROM pg
),
edges AS (
  SELECT pid, x1 AS ex, y1 AS ey, x2 AS fx, y1 AS fy FROM pg2
  UNION ALL SELECT pid, x2, y1, x2, y2 FROM pg2
  UNION ALL SELECT pid, x2, y2, x1, y2 FROM pg2
  UNION ALL SELECT pid, x1, y2, x1, y1 FROM pg2
),
fl AS MATERIALIZED (
  -- MATERIALIZED: stops the optimizer inlining the 16-round mask
  -- expression tree into the inequality join below (plan-time blow-up)
  SELECT doc_id, mx, my, _distance FROM flag
),
prs AS (
  SELECT f.doc_id, p.pid, f.mx, f.my, f._distance AS r, p.pop, p.parea
  FROM fl f JOIN pg2 p
    ON p.x1 <= f.mx + f._distance AND p.x2 >= f.mx - f._distance
   AND p.y1 <= f.my + f._distance AND p.y2 >= f.my - f._distance
   AND f._distance > 0 AND p.parea > 0
),
pe0 AS (
  SELECT pr.doc_id, pr.pid, pr.pop, pr.parea, pr.r,
         e.ex - pr.mx AS px, e.ey - pr.my AS py,
         e.fx - pr.mx AS qx, e.fy - pr.my AS qy
  FROM prs pr JOIN edges e ON e.pid = pr.pid
),
pe1 AS (SELECT *, qx - px AS dx, qy - py AS dy, r * r AS r2 FROM pe0),
pe2 AS (SELECT *, dx*dx + dy*dy AS a, 2.0*(px*dx + py*dy) AS b,
               px*px + py*py - r2 AS c, qx*qx + qy*qy - r2 AS qc FROM pe1),
pe3 AS (SELECT *, b*b - 4*a*c AS disc FROM pe2),
pe4 AS (SELECT *, sqrt(greatest(disc, 0.0)) AS sq FROM pe3),
pe5 AS (SELECT *, (-b - sq)/(2*a) AS t1, (-b + sq)/(2*a) AS t2 FROM pe4),
pe6 AS (SELECT *, least(greatest(t2, 0.0), 1.0) AS tt3,
               least(greatest(t1, 0.0), 1.0) AS tt4 FROM pe5),
pe7 AS (SELECT *, px + tt3*dx AS m3x, py + tt3*dy AS m3y,
               px + tt4*dx AS m4x, py + tt4*dy AS m4y,
               px + t1*dx AS m1x, py + t1*dy AS m1y,
               px + t2*dx AS m2x, py + t2*dy AS m2y FROM pe6),
pcontrib AS (
  SELECT doc_id, pid, pop, parea,
    CASE
      WHEN c <= 0 AND qc <= 0 THEN 0.5*(px*qy - py*qx)
      WHEN disc <= 0 THEN 0.5*r2*atan2(px*qy - py*qx, px*qx + py*qy)
      WHEN c <= 0 AND qc > 0 THEN 0.5*(px*m3y - py*m3x)
           + 0.5*r2*atan2(m3x*qy - m3y*qx, m3x*qx + m3y*qy)
      WHEN c > 0 AND qc <= 0 THEN 0.5*r2*atan2(px*m4y - py*m4x, px*m4x + py*m4y)
           + 0.5*(m4x*qy - m4y*qx)
      WHEN t1 > 0 AND t1 < 1 AND t2 > 0 AND t2 < 1 AND t1 < t2 THEN
           0.5*r2*atan2(px*m1y - py*m1x, px*m1x + py*m1y)
           + 0.5*(m1x*m2y - m1y*m2x)
           + 0.5*r2*atan2(m2x*qy - m2y*qx, m2x*qx + m2y*qy)
      ELSE 0.5*r2*atan2(px*qy - py*qx, px*qx + py*qy)
    END AS contrib
  FROM pe7
),
pair_area AS (
  SELECT doc_id, pid, pop, parea, abs(sum(contrib)) AS pa
  FROM pcontrib GROUP BY doc_id, pid, pop, parea
),
areal_acc AS (
  SELECT doc_id, sum(pop * (pa / parea)) AS acc FROM pair_area GROUP BY doc_id
),
areal AS (
  SELECT f.doc_id, CAST(floor(COALESCE(a.acc, 0.0)) AS BIGINT) AS k_anonymity
  FROM fl f LEFT JOIN areal_acc a ON f.doc_id = a.doc_id
)"""


def _road_grid_shape() -> tuple[int, int, int]:
    """(nx, ny, n) of the synthetic road grid — the same arithmetic as
    sources.roadgraph.synth_road_graph's np.arange (bit-equal to
    X_MIN + i*pitch, verified in tests)."""
    import math

    # np.arange length = ceil((stop - start) / step)
    pitch = 200.0
    nx = int(math.ceil((C.X_MAX + pitch - C.X_MIN) / pitch))
    ny = int(math.ceil((C.Y_MAX + pitch - C.Y_MIN) / pitch))
    return nx, ny, nx * ny


def road_nodes_cte(seed: int) -> str:
    """Mirror of sources.roadgraph.synth_road_graph's node coordinates:
    perturbed 200 m grid, jitter from RNG streams 200/201. np.arange
    values equal X_MIN + i*200.0 bit-for-bit (tests pin this)."""
    nx, ny, n = _road_grid_shape()
    jx = f"((({sql_uniform01('i', seed, 200)} - 0.5) * 2) * 0.3) * 200.0"
    jy = f"((({sql_uniform01('i', seed, 201)} - 0.5) * 2) * 0.3) * 200.0"
    return f"""nodes AS (
  SELECT CAST(i AS BIGINT) AS node_id,
         ({C.X_MIN!r}::DOUBLE + (i % {nx}) * 200.0) + ({jx}) AS x,
         ({C.Y_MIN!r}::DOUBLE + (i // {nx}) * 200.0) + ({jy}) AS y
  FROM range({n}) t(i)
)"""


def _assert_one_round_peel(seed: int, max_length: float) -> None:
    """The SQL below unrolls the engine's valid-node peel fixpoint
    (stages.street.valid_snap_nodes) to ONE round. That is exact only
    when the second peel pass removes nothing; assert it at SQL-generation
    time for the actual (seed, max_length) so a changed fixture can never
    silently diverge (ADVICE r02 #3). Cost: one in-memory pass over the
    fixed-size synthetic grid."""
    from .sources.roadgraph import synth_road_graph
    from .stages.street import valid_snap_nodes

    g = synth_road_graph(seed=seed)
    fixpoint = valid_snap_nodes(g, max_length)
    # one SQL round = nodes with >= 1 incident edge <= max_length,
    # counting ALL nodes as live
    import numpy as np

    short = (g.edge_len <= max_length).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(short)])
    one_round = (cs[g.indptr[1:]] - cs[g.indptr[:-1]]) > 0
    if not np.array_equal(one_round, fixpoint):
        raise ValueError(
            "street_snap_cte: peel fixpoint needs more than one round for "
            f"seed={seed}, max_length={max_length} — the one-round SQL "
            "unroll would diverge from the engine; extend the CTE peel.")


def street_snap_cte(seed: int, max_length: float = 1000.0) -> str:
    """Valid-snap-node assignment in SQL, mirroring
    stages.street.valid_snap_nodes + RoadGraph.nearest_node:

    * edges = 4-connected grid minus the seeded ~10% drop (stream 202)
      plus the highway edges (index arithmetic constant-folded here);
    * validity = the peel fixpoint, unrolled to ONE round because the
      fixture graph converges in one (measured; tests pin it);
    * snap = argmin squared distance over valid nodes, node_id
      tie-break (ties are measure-zero for jittered float coords).

    Expects a CTE ``points`` (url, x, y) upstream; emits ``street_snap``
    (url, snap_node)."""
    _assert_one_round_peel(seed, max_length)
    nx, ny, n = _road_grid_shape()
    # highway edges: same arithmetic as synth_road_graph (structural
    # constants, not engine output)
    import numpy as np

    hsrc = np.arange(0, n - 1, n // 8, dtype=np.int64)[:8]
    hdst = np.clip(hsrc + nx * 7 + 11, 0, n - 1)
    hmask = hsrc != hdst
    hvals = ", ".join(f"({int(a)}, {int(b)})" for a, b in zip(hsrc[hmask], hdst[hmask]))
    ekey = f"((a * 100003 + b) & {0xFFFFFFFF})"
    return f"""pts AS MATERIALIZED (
  SELECT url, x, y FROM points
),
ge AS (
  SELECT i AS a, i + 1 AS b FROM range({n}) t(i) WHERE (i % {nx}) < {nx - 1}
  UNION ALL
  SELECT i AS a, i + {nx} AS b FROM range({n}) t(i) WHERE (i // {nx}) < {ny - 1}
),
ge_kept AS (
  SELECT a, b FROM ge WHERE {sql_uniform01(ekey, seed, 202)} >= 0.10
  UNION ALL
  SELECT * FROM (VALUES {hvals}) hw(a, b)
),
el AS (
  SELECT e.a, e.b,
         sqrt((na.x - nb.x)*(na.x - nb.x) + (na.y - nb.y)*(na.y - nb.y)) AS len
  FROM ge_kept e JOIN nodes na ON na.node_id = e.a JOIN nodes nb ON nb.node_id = e.b
),
valid_nodes AS (
  SELECT DISTINCT a AS node_id FROM el WHERE len <= {max_length!r}
  UNION
  SELECT DISTINCT b AS node_id FROM el WHERE len <= {max_length!r}
),
vsnap AS (
  SELECT p.url, n.node_id,
         row_number() OVER (
           PARTITION BY p.url
           ORDER BY (n.x - p.x)*(n.x - p.x) + (n.y - p.y)*(n.y - p.y), n.node_id
         ) AS rk
  FROM pts p CROSS JOIN (
    SELECT n.* FROM nodes n JOIN valid_nodes v ON n.node_id = v.node_id) n
),
street_snap AS (
  SELECT url, node_id AS snap_node FROM vsnap WHERE rk = 1
)"""


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


# ---------------------------------------------------------------------------
# Training-data dedup + Ripley oracles (round 3: flip rows-only queries to
# value-checked). All reproduce the engine bit-for-bit via DuckDB's
# md5_number_upper (= little-endian int of the md5 digest's FIRST 8 bytes,
# matching ``int.from_bytes(md5(...).digest()[:8], "little")``).
# ---------------------------------------------------------------------------

_TOKEN_SQL = "[a-z0-9]+"  # mirror of text.dedup.TOKEN_RE


def _mutated_docs_cte(every: int = 10, id_offset: int = 1_000_000) -> str:
    """Mirror of text.dedup.with_mutated_copies over the documents view."""
    return (
        "docs AS (SELECT doc_id, text FROM documents UNION ALL "
        f"SELECT doc_id + {id_offset} AS doc_id, text || ' zz9' AS text "
        f"FROM documents WHERE doc_id % {every} = 0)")


def simhash_pairs_sql(max_hamming: int = 3) -> str:
    """Mirror of text.dedup.simhash_pairs over corpus + mutated copies.

    The engine's 4x16-bit band blocking is pigeonhole-complete for
    ``max_hamming <= 3`` (3 differing bits cannot touch all 4 bands), so
    the result set is EXACTLY all pairs with hamming <= max_hamming —
    which is what this SQL computes directly via ``bit_count(xor(...))``.
    SimHash bit j is sign(sum over distinct tokens of +-1 from token md5
    bit j), empty-token docs hash to 0 (text.dedup.simhash64_many).
    """
    assert max_hamming <= 3, "band blocking only complete for hamming <= 3"
    return f"""WITH {_mutated_docs_cte()},
tok AS (
  SELECT doc_id,
         unnest(list_distinct(regexp_extract_all(lower(text), '{_TOKEN_SQL}'))) AS t
  FROM docs),
th AS (SELECT doc_id, md5_number_upper(t) AS uh FROM tok),
bits AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (uh >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b
  GROUP BY 1, 2),
shraw AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0 THEN CAST(1 AS UBIGINT) << bit
                       ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS h
  FROM bits GROUP BY 1),
sh AS (
  SELECT d.doc_id, coalesce(s.h, CAST(0 AS UBIGINT)) AS h
  FROM docs d LEFT JOIN shraw s ON s.doc_id = d.doc_id)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.h, b.h)) <= {max_hamming}"""


def _minhash_band_ctes(ngram: int = 5) -> str:
    """CTE chain (appended after a ``docs`` CTE) ending in relation
    ``bands(doc_id, band, bkey)`` — each doc's 16 LSH bucket keys as
    the band's minima TUPLE (the engine's folded int64 band_key is a
    shuffle proxy for exactly this tuple). Shared by the pair oracles
    and the cross-corpus decontamination oracle."""
    from .rng import mix32, sql_mix32
    from .text.dedup import _SALT, N_PERM, ROWS_PER_BAND

    import numpy as np

    perms = mix32(np.arange(N_PERM, dtype=np.int64) + _SALT)
    perm_rows = ", ".join(f"({j}, {int(perms[j])})" for j in range(N_PERM))
    mix = sql_mix32("xor(s.sh, p.p)")
    n_bands = N_PERM // ROWS_PER_BAND
    empty_key = ",".join(["4294967295"] * ROWS_PER_BAND)
    return f"""{_shingle_ctes(ngram)},
perms(j, p) AS (SELECT * FROM (VALUES {perm_rows})),
pv AS (
  SELECT s.doc_id, p.j, min({mix}) AS mn
  FROM shd s CROSS JOIN perms p GROUP BY 1, 2),
bands AS (
  SELECT doc_id, j // {ROWS_PER_BAND} AS band,
         string_agg(CAST(mn AS VARCHAR), ',' ORDER BY j) AS bkey
  FROM pv GROUP BY 1, 2
  UNION ALL
  SELECT tl.doc_id, b.band, '{empty_key}' AS bkey
  FROM tl CROSS JOIN (SELECT unnest(generate_series(0, {n_bands - 1})) AS band) b
  WHERE len(tl.l) = 0)"""


def _minhash_edge_ctes(threshold: float = 0.8, ngram: int = 5) -> str:
    """CTE chain (appended after a ``docs`` CTE) ending in relation
    ``mh_edges(doc_a, doc_b, sim)`` — the banded-LSH candidate pairs
    verified at exact shingle-Jaccard >= ``threshold``. Shared by
    :func:`minhash_pairs_sql` and the LSH edge source of
    :func:`dup_clusters_sql` so the pair list and the cluster closure
    are provably the same relation."""
    return f"""{_minhash_band_ctes(ngram)},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c JOIN shd x ON x.doc_id = c.doc_a
  JOIN shd y ON y.doc_id = c.doc_b AND y.sh = x.sh GROUP BY 1, 2),
jac AS (
  SELECT c.doc_a, c.doc_b, coalesce(i.i, 0) AS i, sa.sz AS la, sb.sz AS lb
  FROM cand c LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a JOIN sizes sb ON sb.doc_id = c.doc_b),
mh_edges AS (
  SELECT doc_a, doc_b, i / CAST(la + lb - i AS DOUBLE) AS sim FROM jac
  WHERE i / CAST(la + lb - i AS DOUBLE) >= {threshold})"""


def minhash_pairs_sql(threshold: float = 0.8, ngram: int = 5) -> str:
    """Mirror of text.dedup.minhash_lsh_pairs over corpus + mutated copies.

    Word-``ngram`` shingles -> 32-bit md5 shingle hashes -> 64
    mix32-permutation minima -> 16 bands of 4. LSH bucket equality is
    equality of a band's 4 minima, so candidates are generated by joining
    on (band, minima-tuple) — the md5 *band-hash string* the engine uses
    as its shuffle key is just a proxy for that same tuple. Candidates
    are then verified with exact shingle-set Jaccard (an integer ratio —
    bit-exact in SQL). Empty-token docs get the all-0xFFFFFFFF signature.
    """
    return f"""WITH {_mutated_docs_cte()},
{_minhash_edge_ctes(threshold, ngram)}
SELECT doc_a, doc_b, sim FROM mh_edges"""


def ripley_sql(seed: int, simulations: int = 19, steps: int = 10) -> str:
    """Mirror of analysis.ripley.ripleys_k_distributed over the geoparsed
    point pattern: per-band K-hat for the observed pattern plus
    ``simulations`` CSR draws (streams 300+2s / 301+2s of the counter
    RNG, constant-folded per simulation), normalized by the observed
    bbox area, with pointpats-style two-sided pseudo p-values. Support
    is np.linspace(maxd/steps, maxd, steps) with the exact-endpoint rule.
    Output matches pipelines.q_ripley: (band, support, k_stat, pvalue)
    rounded to 6 dp.
    """
    from .rng import _STREAM_STEP, mix32, sql_mix32

    m32 = 4294967295
    rows = []
    for s in range(1, simulations + 1):
        c1 = int(mix32((seed % (1 << 32) + (300 + 2 * (s - 1)) * _STREAM_STEP) & m32))
        c2 = int(mix32((seed % (1 << 32) + (301 + 2 * (s - 1)) * _STREAM_STEP) & m32))
        rows.append(f"({s}, {c1}, {c2})")
    streams = ", ".join(rows)
    u1 = sql_mix32(f"xor(p.doc_id & {m32}, st.c1)")
    u2 = sql_mix32(f"xor((p.doc_id + 131071 * st.s) & {m32}, st.c2)")
    return f"""WITH {points_cte(seed)},
pz AS (SELECT doc_id, x, y FROM points),
agg AS (SELECT min(x) AS x0, max(x) AS x1, min(y) AS y0, max(y) AS y1,
               CAST(count(*) AS BIGINT) AS n FROM pz),
par AS (SELECT x0, x1, y0, y1, n, 0.25 * least(x1 - x0, y1 - y0) AS maxd FROM agg),
sup AS (
  SELECT i + 1 AS band,
         CASE WHEN i = {steps - 1} THEN maxd
              ELSE (maxd / {steps}.0)
                   + i * ((maxd - maxd / {steps}.0) / {steps - 1}.0) END AS r
  FROM par, (SELECT unnest(generate_series(0, {steps - 1})) AS i) t),
streams(s, c1, c2) AS (SELECT * FROM (VALUES {streams})),
simpts AS (
  SELECT 0 AS sim, doc_id, x, y FROM pz
  UNION ALL
  SELECT st.s AS sim, p.doc_id,
         par.x0 + (par.x1 - par.x0) * (({u1}) / 4294967296.0) AS x,
         par.y0 + (par.y1 - par.y0) * (({u2}) / 4294967296.0) AS y
  FROM pz p CROSS JOIN par CROSS JOIN streams st),
pairs AS (
  SELECT a.sim, (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
  FROM simpts a JOIN simpts b ON a.sim = b.sim AND a.doc_id <> b.doc_id),
cnts AS (
  SELECT sup.band, sup.r, p.sim,
         CAST(count(*) FILTER (WHERE p.d2 <= sup.r * sup.r) AS DOUBLE) AS c
  FROM sup CROSS JOIN pairs p GROUP BY 1, 2, 3),
khat AS (
  SELECT c.band, c.r, c.sim,
         ((par.x1 - par.x0) * (par.y1 - par.y0)) * c.c / (par.n * (par.n - 1)) AS k
  FROM cnts c CROSS JOIN par),
st0 AS (SELECT band, r, k AS stat FROM khat WHERE sim = 0),
pv AS (
  SELECT k.band,
         sum(CASE WHEN k.k >= s.stat THEN 1 ELSE 0 END) AS ge,
         sum(CASE WHEN k.k <= s.stat THEN 1 ELSE 0 END) AS le
  FROM khat k JOIN st0 s ON s.band = k.band WHERE k.sim > 0 GROUP BY 1)
SELECT CAST(s.band AS BIGINT) AS band, round(s.r, 6) AS support,
       round(s.stat, 6) AS k_stat,
       round(CAST(least(pv.ge, pv.le) + 1 AS DOUBLE) / {simulations + 1}.0, 6) AS pvalue
FROM st0 s JOIN pv ON pv.band = s.band"""


SQL_TOKEN_CODES = ("list_transform(l, t -> "
                   "CAST(md5_number_upper(t) & 4294967295 AS BIGINT))")


def sql_gram_list_expr(n: int, short_doc: str = "single",
                       codes: str = "c") -> str:
    """DuckDB expression computing, over a BIGINT[] token-code list
    ``codes``, the positional n-gram hash list bit-identical to
    ``text.grams.gram_hashes_batch``: gram i = XOR over its tokens of
    ``mix32(code XOR POS[j])`` (j = position within the gram).
    ``short_doc="single"``: docs with 0 < tokens < n yield one whole-doc
    gram; ``"skip"``: they yield none."""
    from .rng import sql_mix32
    from .text.grams import POS

    pos = "[" + ",".join(str(int(POS[j])) for j in range(n)) + "]::BIGINT[]"
    term = sql_mix32(f"xor({codes}[j], list_extract({pos}, j - i + 1))")
    win = (f"i -> list_reduce(list_transform("
           f"generate_series(i, least(i + {n - 1}, len({codes}))), "
           f"j -> {term}), (a, b) -> xor(a, b))")
    if short_doc == "single":
        return (f"CASE WHEN len({codes}) = 0 THEN CAST([] AS BIGINT[]) "
                f"ELSE list_transform(generate_series(1, "
                f"greatest(len({codes}) - {n - 1}, 1)), {win}) END")
    return (f"CASE WHEN len({codes}) < {n} THEN CAST([] AS BIGINT[]) "
            f"ELSE list_transform(generate_series(1, "
            f"len({codes}) - {n - 1}), {win}) END")


def _shingle_ctes(ngram: int = 5) -> str:
    """tl/tc/sg/shd chain (token list -> 32-bit md5 token codes ->
    word-ngram mix32-fold gram hashes -> distinct per doc) over a
    preceding ``docs`` CTE — shared by the minhash, exact-ngram-Jaccard
    and winnow oracles. Mirrors text.grams bit-for-bit."""
    return f"""tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_SQL}') AS l FROM docs),
tc AS (SELECT doc_id, {SQL_TOKEN_CODES} AS c FROM tl),
sg AS (SELECT doc_id, unnest({sql_gram_list_expr(ngram, "single")}) AS sh FROM tc),
shd AS (SELECT DISTINCT doc_id, sh FROM sg)"""


def jaccard_ngram_sql(threshold: float = 0.8, ngram: int = 5) -> str:
    """Mirror of text.dedup.jaccard_pairs_exact(use_shingles=True) over
    corpus + mutated copies: exact all-pairs word-``ngram``-shingle
    Jaccard >= threshold (integer ratio — bit-exact in SQL). The
    superset twin of minhash_pairs_sql's LSH result (recall pytest
    compares the two)."""
    return f"""WITH {_mutated_docs_cte()},
{_shingle_ctes(ngram)},
sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
  FROM shd x JOIN shd y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
jac AS (
  SELECT i.doc_a, i.doc_b, i.i, sa.sz AS la, sb.sz AS lb
  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b)
SELECT doc_a, doc_b, i / CAST(la + lb - i AS DOUBLE) AS sim FROM jac
WHERE i / CAST(la + lb - i AS DOUBLE) >= {threshold}"""


def winnow_sql(k: int = 5, w: int = 4) -> str:
    """Mirror of text.quality.winnow_batch over the documents table:
    positional k-gram hashes, sliding-window-of-``w`` minima, distinct
    selected hashes per doc. Docs with fewer than ``w`` grams contribute
    their single whole-list min (the window frame truncates at the
    partition end, which is exactly that min)."""
    return f"""WITH docs AS (SELECT doc_id, text FROM documents),
tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_SQL}') AS l FROM docs),
tc AS (SELECT doc_id, {SQL_TOKEN_CODES} AS c FROM tl),
gs AS (SELECT doc_id, {sql_gram_list_expr(k, "single")} AS garr FROM tc),
gr AS (
  SELECT gs.doc_id, t.i, garr[t.i] AS gh
  FROM gs, unnest(generate_series(1, len(garr))) AS t(i)),
wm AS (
  SELECT doc_id, i,
         min(gh) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS minh,
         count(*) OVER (PARTITION BY doc_id) AS m
  FROM gr)
SELECT DISTINCT doc_id, minh AS gram_hash FROM wm
WHERE i <= greatest(m - {w} + 1, 1)"""


# ---------------------------------------------------------------------------
# PII detection / redaction (mirror of text.pii — both sides are RE2,
# so counts and replacements are byte-identical).
# ---------------------------------------------------------------------------

PII_EMAIL_SQL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4_SQL = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_SQL = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_docs_cte(every: int = 5) -> str:
    """Mirror of text.pii.with_pii over the documents view."""
    return (
        "docs AS (SELECT doc_id, CASE WHEN doc_id % " + str(every) + " = 0 "
        "THEN text || ' contact user' || doc_id || '@example.com at 10.' || "
        "(doc_id % 256) || '.' || (doc_id * 7 % 256) || '.' || "
        "(doc_id * 13 % 256) || ' or 555-' || "
        "lpad(CAST(doc_id % 900 AS VARCHAR), 3, '0') || '-' || "
        "lpad(CAST(doc_id % 9000 AS VARCHAR), 4, '0') "
        "ELSE text END AS text FROM documents)")


def pii_stats_sql(every: int = 5) -> str:
    return f"""WITH {pii_docs_cte(every)}
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{PII_EMAIL_SQL}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '{PII_IPV4_SQL}')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '{PII_PHONE_SQL}')) AS BIGINT) AS n_phone
FROM docs"""


def pii_redact_sql(every: int = 5) -> str:
    return f"""WITH {pii_docs_cte(every)}
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '{PII_EMAIL_SQL}', '<EMAIL>', 'g'),
    '{PII_IPV4_SQL}', '<IP>', 'g'),
    '{PII_PHONE_SQL}', '<PHONE>', 'g') AS text,
  CAST(len(regexp_extract_all(text, '{PII_EMAIL_SQL}'))
     + len(regexp_extract_all(text, '{PII_IPV4_SQL}'))
     + len(regexp_extract_all(text, '{PII_PHONE_SQL}')) AS BIGINT) AS n_redacted
FROM docs"""


# ---------------------------------------------------------------------------
# Chunk-level dedup (mirror of text.chunks.chunk_dedup over corpus +
# mutated copies): first (doc_id, chunk_idx) occurrence of each exact
# size-token chunk survives; docs reassemble from survivors.
# ---------------------------------------------------------------------------


def chunk_dedup_sql(size: int = 16) -> str:
    return f"""WITH {_mutated_docs_cte()},
tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_SQL}') AS l FROM docs),
ch AS (
  SELECT tl.doc_id, t.i AS chunk_idx,
         array_to_string(l[(t.i*{size}+1):((t.i+1)*{size})], ' ') AS ctext
  FROM tl, unnest(generate_series(0, CAST(ceil(len(l)/{size}.0) AS BIGINT) - 1)) AS t(i)
  WHERE len(l) > 0),
win AS (
  SELECT doc_id, chunk_idx, ctext,
         row_number() OVER (PARTITION BY md5(ctext)
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM ch),
agg AS (
  SELECT doc_id,
         coalesce(string_agg(CASE WHEN rn = 1 THEN ctext END, ' '
                             ORDER BY chunk_idx), '') AS clean_text,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(count(*) - count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_dropped
  FROM win GROUP BY doc_id)
SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
       coalesce(a.n_chunks, 0) AS n_chunks,
       coalesce(a.n_dropped, 0) AS n_dropped
FROM docs d LEFT JOIN agg a ON d.doc_id = a.doc_id"""


# ---------------------------------------------------------------------------
# Duplicate-cluster connected components (mirror of
# text.clusters.duplicate_clusters): transitive closure over the
# near-dup pair edges via a recursive CTE, cluster id = min reachable
# doc_id. Edge source mirrors the engine's: banded MinHash-LSH pairs by
# default (the scale path — VERDICT r03 #1), exact all-pairs
# ngram-Jaccard as the validation variant.
# ---------------------------------------------------------------------------


def dup_clusters_sql(threshold: float = 0.8, ngram: int = 5,
                     edge_source: str = "minhash") -> str:
    if edge_source == "minhash":
        edges = f"""{_minhash_edge_ctes(threshold, ngram)},
e AS (SELECT doc_a AS a, doc_b AS b FROM mh_edges)"""
    elif edge_source == "jaccard":
        edges = f"""{_shingle_ctes(ngram)},
sizes AS (SELECT doc_id, count(*) AS sz FROM shd GROUP BY 1),
inter AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
  FROM shd x JOIN shd y ON x.sh = y.sh AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
jac AS (
  SELECT i.doc_a, i.doc_b, i.i, sa.sz AS la, sb.sz AS lb
  FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b),
e AS (SELECT doc_a AS a, doc_b AS b FROM jac
      WHERE i / CAST(la + lb - i AS DOUBLE) >= {threshold})"""
    else:
        raise ValueError(f"unknown edge_source {edge_source!r}")
    return f"""WITH RECURSIVE {_mutated_docs_cte()},
{edges},
sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node)
SELECT node, min(label) AS cluster_id FROM reach GROUP BY node"""


def cross_corpus_sql(every: int = 97, ngram: int = 5) -> str:
    """Mirror of text.dedup.cross_corpus_flags over corpus + mutated
    copies: a non-benchmark doc is contaminated iff it shares an LSH
    band bucket (equal minima tuple) with any benchmark doc
    (doc_id % ``every`` == 0). The engine probes a broadcast folded-key
    set; this twin joins the tuple itself."""
    return f"""WITH {_mutated_docs_cte()},
{_minhash_band_ctes(ngram)},
hit AS (
  SELECT DISTINCT a.doc_id FROM bands a JOIN bands e
    ON a.band = e.band AND a.bkey = e.bkey
   AND e.doc_id % {every} = 0
  WHERE a.doc_id % {every} <> 0)
SELECT d.doc_id,
       CAST(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM docs d LEFT JOIN hit h ON h.doc_id = d.doc_id
WHERE d.doc_id % {every} <> 0"""


def decontaminate_bloom_sql(n: int = 5, mod: int = 97,
                            m_bits: int = 1 << 18, k: int = 4) -> str:
    """Mirror of text.corpus.decontaminate_bloom over the documents
    table: bit positions ``mix32(gram XOR salt_i) & (m_bits-1)`` per
    dedup-side positional gram hash (text/grams.py, full windows only),
    a gram hits iff all ``k`` probe bits are set by some benchmark
    gram — so the oracle reproduces the engine's Bloom FALSE POSITIVES
    exactly, not just its true hits."""
    from .rng import sql_mix32
    from .text.corpus import _bloom_salts

    salts = "[" + ",".join(str(int(s)) for s in _bloom_salts()[:k]) \
        + "]::BIGINT[]"
    pos = sql_mix32("xor(sh, s.salt)") + f" & {m_bits - 1}"
    return f"""WITH docs AS (SELECT doc_id, text FROM documents),
tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_SQL}') AS l FROM docs),
tc AS (SELECT doc_id, {SQL_TOKEN_CODES} AS c FROM tl),
sg AS (SELECT doc_id, unnest({sql_gram_list_expr(n, "skip")}) AS sh FROM tc),
shd AS (SELECT DISTINCT doc_id, sh FROM sg),
salts AS (SELECT unnest({salts}) AS salt),
bits AS (
  SELECT DISTINCT {pos} AS p
  FROM shd, salts s WHERE doc_id % {mod} = 0),
probe AS (
  SELECT shd.doc_id, shd.sh, s.salt, {pos} AS p
  FROM shd, salts s WHERE doc_id % {mod} <> 0),
hitg AS (
  SELECT doc_id, sh FROM probe JOIN bits USING (p)
  GROUP BY doc_id, sh HAVING count(DISTINCT salt) = {k}),
nh AS (SELECT doc_id, count(*) AS nh FROM hitg GROUP BY 1)
SELECT d.doc_id, CAST(COALESCE(nh.nh, 0) AS BIGINT) AS n_hit_grams,
       CAST(CASE WHEN COALESCE(nh.nh, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM docs d LEFT JOIN nh ON nh.doc_id = d.doc_id
WHERE d.doc_id % {mod} <> 0"""


def host_rank_sql(seed: int, iters: int = 10, links: int = 3) -> str:
    """Mirror of text.rank.host_rank over the pages derivation:
    deterministic link rule (doc_id*31 + 7*j + 1) % n_docs projected to
    hosts, then ``iters`` unrolled rounds of the integer PageRank
    update r' = (15*INIT)//100 + (85 * Σ (r(src)//outdeg(src))*w)//100
    — every operation is int64, so the engine matches bit-for-bit."""
    rounds = []
    prev = "r0"
    for t in range(1, iters + 1):
        rounds.append(f"""r{t} AS (
  SELECT h.host,
         (15 * (SELECT i FROM init)) // 100
         + (85 * COALESCE(s.c, 0)) // 100 AS r
  FROM hl h LEFT JOIN (
    SELECT ew2.dst, sum((p.r // ew2.ow) * ew2.w) AS c
    FROM ew2 JOIN {prev} p ON p.host = ew2.src GROUP BY ew2.dst) s
  ON s.dst = h.host)""")
        prev = f"r{t}"
    rounds_sql = ",\n".join(rounds)
    return f"""WITH {pages_cte(seed)},
hosts AS (SELECT doc_id,
          regexp_extract(url, '^https?://([^/]+)', 1) AS host FROM pages),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pages),
links AS (
  SELECT p.doc_id AS src_doc,
         (((p.doc_id % nn.n) * (p.doc_id % nn.n)) % nn.n * 7
          + p.doc_id * 31 + 97 * j.i + 1) % nn.n AS dst_doc
  FROM pages p, n nn, unnest(generate_series(0, {links - 1})) AS j(i)
  WHERE (((p.doc_id % nn.n) * (p.doc_id % nn.n)) % nn.n * 7
         + p.doc_id * 31 + 97 * j.i + 1) % nn.n <> p.doc_id),
e AS (
  SELECT hs.host AS src, hd.host AS dst
  FROM links l JOIN hosts hs ON hs.doc_id = l.src_doc
               JOIN hosts hd ON hd.doc_id = l.dst_doc),
ew AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM e GROUP BY 1, 2),
outd AS (SELECT src, sum(w) AS ow FROM ew GROUP BY 1),
ew2 AS (SELECT ew.src, ew.dst, ew.w, o.ow FROM ew JOIN outd o USING (src)),
hl AS (SELECT DISTINCT host FROM hosts),
init AS (SELECT CAST(1000000000000 // count(*) AS BIGINT) AS i FROM hl),
r0 AS (SELECT host, (SELECT i FROM init) AS r FROM hl),
{rounds_sql}
SELECT host, r AS rank_micro FROM r{iters}"""


def source_similarity_sql(ngram: int = 5) -> str:
    """Mirror of text.dedup.source_minhash_similarity over the
    documents view: per-source MinHash signatures (64 permutation
    minima over the union of the source's word-ngram shingle hashes)
    compared pairwise; jaccard_est = matching minima / 64 (an exact
    dyadic, so the float compare is bit-exact)."""
    from .rng import mix32, sql_mix32
    from .text.dedup import _SALT, N_PERM

    import numpy as np

    perms = mix32(np.arange(N_PERM, dtype=np.int64) + _SALT)
    perm_rows = ", ".join(f"({j}, {int(perms[j])})" for j in range(N_PERM))
    mix = sql_mix32("xor(s.sh, p.p)")
    return f"""WITH docs AS (SELECT doc_id, source, text FROM documents),
{_shingle_ctes(ngram)},
ss AS (SELECT d.source, s.sh FROM sg s JOIN docs d USING (doc_id)),
perms(j, p) AS (SELECT * FROM (VALUES {perm_rows})),
sig AS (
  SELECT s.source, p.j, min({mix}) AS m
  FROM ss s CROSS JOIN perms p GROUP BY 1, 2),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) FILTER (WHERE a.m = b.m) AS BIGINT) AS n_match
  FROM sig a JOIN sig b ON a.j = b.j AND a.source < b.source
  GROUP BY 1, 2)
SELECT source_a, source_b, n_match,
       CAST(n_match AS DOUBLE) / {N_PERM} AS jaccard_est FROM pairs"""


def host_components_sql(seed: int, links: int = 3) -> str:
    """Mirror of text.rank.host_components: the same deterministic
    link rule as host_rank_sql projected to hosts, then min-63-bit-hash
    label propagation via a recursive CTE (component = min
    ``md5_number_upper(host) & (2^63 - 1)`` reachable)."""
    return f"""WITH RECURSIVE {pages_cte(seed)},
hosts AS (SELECT doc_id,
          regexp_extract(url, '^https?://([^/]+)', 1) AS host FROM pages),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pages),
links AS (
  SELECT p.doc_id AS src_doc,
         (((p.doc_id % nn.n) * (p.doc_id % nn.n)) % nn.n * 7
          + p.doc_id * 31 + 97 * j.i + 1) % nn.n AS dst_doc
  FROM pages p, n nn, unnest(generate_series(0, {links - 1})) AS j(i)
  WHERE (((p.doc_id % nn.n) * (p.doc_id % nn.n)) % nn.n * 7
         + p.doc_id * 31 + 97 * j.i + 1) % nn.n <> p.doc_id),
e AS (
  SELECT hs.host AS src, hd.host AS dst
  FROM links l JOIN hosts hs ON hs.doc_id = l.src_doc
               JOIN hosts hd ON hd.doc_id = l.dst_doc),
hh AS (SELECT DISTINCT host FROM hosts),
hid AS (SELECT host,
        CAST(md5_number_upper(host) & 9223372036854775807 AS BIGINT)
          AS node FROM hh),
ed AS (SELECT DISTINCT s.node AS a, d.node AS b
       FROM e JOIN hid s ON s.host = e.src
              JOIN hid d ON d.host = e.dst),
sym AS (SELECT a, b FROM ed UNION ALL SELECT b AS a, a AS b FROM ed),
reach(node, label) AS (
  SELECT node, node FROM hid
  UNION
  SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node)
SELECT h.host, min(r.label) AS component
FROM reach r JOIN hid h USING (node) GROUP BY h.host"""


def dup_gram_fraction_sql(k: int = 8) -> str:
    """Mirror of text.dedup.dup_gram_fraction over the documents view
    (distinct per-doc word-k-grams via the shared SQL-mirrored kernel;
    a gram is duplicated iff it appears in >= 2 docs)."""
    return f"""WITH docs AS (SELECT doc_id, text FROM documents),
tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_SQL}') AS l
       FROM docs),
tc AS (SELECT doc_id, {SQL_TOKEN_CODES} AS c FROM tl),
sg AS (SELECT DISTINCT doc_id, unnest({sql_gram_list_expr(k, "skip")}) AS gh
       FROM tc),
nd AS (SELECT gh, CAST(count(*) AS BIGINT) AS n FROM sg GROUP BY gh),
per AS (
  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(*) FILTER (WHERE nd.n >= 2) AS BIGINT) AS n_dup
  FROM sg s JOIN nd USING (gh) GROUP BY 1)
SELECT d.doc_id, coalesce(p.n_grams, 0) AS n_grams,
       coalesce(p.n_dup, 0) AS n_dup,
       round(CASE WHEN coalesce(p.n_grams, 0) > 0
                  THEN CAST(p.n_dup AS DOUBLE) / p.n_grams
                  ELSE 0.0 END, 6) AS dup_frac
FROM docs d LEFT JOIN per p ON p.doc_id = d.doc_id"""


def novel_gram_fraction_sql(k: int = 8) -> str:
    """Mirror of text.dedup.novel_gram_fraction (a gram is NOVEL for
    the doc holding its global min doc_id)."""
    return f"""WITH docs AS (SELECT doc_id, text FROM documents),
tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{_TOKEN_SQL}') AS l
       FROM docs),
tc AS (SELECT doc_id, {SQL_TOKEN_CODES} AS c FROM tl),
sg AS (SELECT DISTINCT doc_id, unnest({sql_gram_list_expr(k, "skip")}) AS gh
       FROM tc),
mn AS (SELECT gh, min(doc_id) AS m FROM sg GROUP BY gh),
per AS (
  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(*) FILTER (WHERE mn.m = s.doc_id) AS BIGINT) AS n_new
  FROM sg s JOIN mn USING (gh) GROUP BY 1)
SELECT d.doc_id, coalesce(p.n_grams, 0) AS n_grams,
       coalesce(p.n_new, 0) AS n_new,
       round(CASE WHEN coalesce(p.n_grams, 0) > 0
                  THEN CAST(p.n_new AS DOUBLE) / p.n_grams
                  ELSE 0.0 END, 6) AS novel_frac
FROM docs d LEFT JOIN per p ON p.doc_id = d.doc_id"""

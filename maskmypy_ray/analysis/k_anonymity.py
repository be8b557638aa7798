"""k-anonymity (A2/A3/A4).

A3 — address-based ``calculate_k`` (`/root/reference/maskmypy/analysis.py:
582-596`): each masked point is buffered by its own displacement distance;
k = (# addresses inside the buffer) + 1; no addresses -> k = 1.

Deviation from the reference (documented): the reference's "buffer" is
shapely's inscribed 32-gon circle approximation, whose float artifacts
decide boundary cases (its own golden tests rely on ``sin(pi)=1.2e-16``
excluding the due-west boundary address). This engine uses the
mathematically exact circle predicate ``dist <= d``; the ported golden
tests carry exact-circle expectations and the DuckDB oracle uses the
identical predicate, so engine/oracle agree bit-for-bit.

Distributed shape (SURVEY.md §2.2 A3): both sides keyed by a planar grid
cell; each point's circle is expanded to its covering cells (``flat_map``
fan-out), addresses stay in their single cell, a ``groupby(cell)`` shuffle
co-locates them, a vectorized per-group kernel counts within-radius pairs,
and a second small ``groupby(doc_id)`` sums partial counts across cells.
Each (point, address) pair coexists in exactly one group (the address's
cell), so no dedup is needed. Optional address salting splits every cell
into ``salt`` subgroups to cap skew from hot (downtown) cells.

A4 — polygon/areal ``estimate_k`` (`analysis.py:524-539,563-579`):
k = floor(sum over polygons of pop * area(circle ∩ polygon)/area(polygon)).
Small polygon side is broadcast (``ray.put``) into an actor pool; the
circle∩polygon area uses an exact Green's-theorem kernel (not the
reference's 32-gon approximation — same deviation note as above).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geokernels.cells import cell_of_xy, cover_circle_xy
from ..geokernels.pip import PolygonSet

DEFAULT_CELL_M = 500.0


def _point_cover_batch(batch: pa.Table, cell_m: float, salt: int,
                       key_col: str) -> pa.Table:
    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    mx = batch.column("mx").to_numpy(zero_copy_only=False)
    my = batch.column("my").to_numpy(zero_copy_only=False)
    d = batch.column("_distance").to_numpy(zero_copy_only=False)
    row, cell = cover_circle_xy(mx, my, d, cell_m)
    n = len(row)
    tables = []
    for s in range(salt):
        tables.append(pa.table({
            "cell": pa.array(cell * salt + s, type=pa.int64()),
            "is_addr": pa.array(np.zeros(n, dtype=np.int8)),
            "key": pa.array(keys[row], type=pa.int64()),
            "px": pa.array(mx[row], type=pa.float64()),
            "py": pa.array(my[row], type=pa.float64()),
            "d": pa.array(d[row], type=pa.float64()),
        }))
    return pa.concat_tables(tables)


def _addr_cell_batch(batch: pa.Table, cell_m: float, salt: int) -> pa.Table:
    if "ax" in batch.column_names:
        ax = batch.column("ax").to_numpy(zero_copy_only=False)
        ay = batch.column("ay").to_numpy(zero_copy_only=False)
    else:
        from ..geokernels.geometry import latlon_to_xy

        ax, ay = latlon_to_xy(batch.column("lat").to_numpy(zero_copy_only=False),
                              batch.column("lon").to_numpy(zero_copy_only=False))
    aid = batch.column("addr_id").to_numpy(zero_copy_only=False)
    cell = cell_of_xy(ax, ay, cell_m)
    return pa.table({
        "cell": pa.array(cell * salt + (aid % salt), type=pa.int64()),
        "is_addr": pa.array(np.ones(len(ax), dtype=np.int8)),
        "key": pa.array(aid, type=pa.int64()),
        "px": pa.array(ax, type=pa.float64()),
        "py": pa.array(ay, type=pa.float64()),
        "d": pa.array(np.zeros(len(ax)), type=pa.float64()),
    })


def _count_group(g: pd.DataFrame) -> pd.DataFrame:
    pts = g[g["is_addr"] == 0]
    if not len(pts):
        return pd.DataFrame({"key": [], "cnt": []}).astype({"key": "int64", "cnt": "int64"})
    addrs = g[g["is_addr"] == 1]
    px = pts["px"].to_numpy()
    py = pts["py"].to_numpy()
    d = pts["d"].to_numpy()
    if len(addrs):
        ax = addrs["px"].to_numpy()
        ay = addrs["py"].to_numpy()
        # P x A pairwise distances, chunked over points to bound memory.
        cnt = np.empty(len(px), dtype=np.int64)
        chunk = max(1, int(4_000_000 / max(1, len(ax))))
        for i in range(0, len(px), chunk):
            sl = slice(i, i + chunk)
            dx = px[sl, None] - ax[None, :]
            dy = py[sl, None] - ay[None, :]
            cnt[sl] = (dx * dx + dy * dy <= (d[sl, None]) ** 2).sum(axis=1)
    else:
        cnt = np.zeros(len(px), dtype=np.int64)
    return pd.DataFrame({"key": pts["key"].to_numpy(), "cnt": cnt})


def calculate_k(masked_ds, addresses_ds, cell_m: float = DEFAULT_CELL_M,
                salt: int = 1, key_col: str = "doc_id"):
    """Address-based k-anonymity -> Dataset[(doc_id, k_anonymity)].

    ``masked_ds`` must carry mx, my, _distance (run displacement() first).
    """
    from ray.data.aggregate import Sum

    pts = masked_ds.map_batches(
        lambda b: _point_cover_batch(b, cell_m, salt, key_col), batch_format="pyarrow")
    adr = addresses_ds.map_batches(
        lambda b: _addr_cell_batch(b, cell_m, salt), batch_format="pyarrow")
    unioned = pts.union(adr)
    counts = unioned.groupby("cell").map_groups(_count_group, batch_format="pandas")
    k = counts.groupby("key").aggregate(Sum("cnt", alias_name="cnt_sum"))
    return k.map_batches(
        lambda b: pa.table({
            key_col: b.column("key"),
            "k_anonymity": pa.array(
                b.column("cnt_sum").to_numpy(zero_copy_only=False) + 1, type=pa.int64()),
        }),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# A4: areal (polygon population) estimate
# ---------------------------------------------------------------------------


def circle_polygon_area_exact(cx: float, cy: float, r: float,
                              rx: np.ndarray, ry: np.ndarray) -> float:
    """Exact area of circle((cx,cy), r) ∩ simple polygon (Green's theorem).

    Each directed polygon edge contributes either a triangle term (portion
    inside the circle) or a circular-sector term (portion outside); the
    signed sum is the intersection area. Classic computational-geometry
    identity; exact up to float rounding.
    """
    if r <= 0:
        return 0.0
    ax = np.asarray(rx, dtype=np.float64) - cx
    ay = np.asarray(ry, dtype=np.float64) - cy
    n = len(ax)
    if n < 3:
        return 0.0
    total = 0.0
    r2 = r * r

    def sector(p, q):
        # signed angle sector contribution r^2/2 * atan2(cross, dot)
        cr = p[0] * q[1] - p[1] * q[0]
        dt = p[0] * q[0] + p[1] * q[1]
        return 0.5 * r2 * np.arctan2(cr, dt)

    def triangle(p, q):
        return 0.5 * (p[0] * q[1] - p[1] * q[0])

    for i in range(n):
        p = (ax[i], ay[i])
        q = (ax[(i + 1) % n], ay[(i + 1) % n])
        dx, dy = q[0] - p[0], q[1] - p[1]
        a = dx * dx + dy * dy
        if a == 0:
            continue
        b = 2.0 * (p[0] * dx + p[1] * dy)
        c = p[0] * p[0] + p[1] * p[1] - r2
        disc = b * b - 4 * a * c
        pin = c <= 0
        q_c = q[0] * q[0] + q[1] * q[1] - r2
        qin = q_c <= 0
        if pin and qin:
            total += triangle(p, q)
        elif disc <= 0:
            total += sector(p, q)
        else:
            sq = np.sqrt(disc)
            t1 = (-b - sq) / (2 * a)
            t2 = (-b + sq) / (2 * a)
            pieces = []  # (point, is_arc_entry)
            m1 = (p[0] + t1 * dx, p[1] + t1 * dy)
            m2 = (p[0] + t2 * dx, p[1] + t2 * dy)
            if pin and not qin:
                # leaves the circle at t2
                tt = min(max(t2, 0.0), 1.0)
                m = (p[0] + tt * dx, p[1] + tt * dy)
                total += triangle(p, m) + sector(m, q)
            elif not pin and qin:
                tt = min(max(t1, 0.0), 1.0)
                m = (p[0] + tt * dx, p[1] + tt * dy)
                total += sector(p, m) + triangle(m, q)
            else:
                # both outside; may pass through the circle
                if 0.0 < t1 < 1.0 and 0.0 < t2 < 1.0 and t1 < t2:
                    total += sector(p, m1) + triangle(m1, m2) + sector(m2, q)
                else:
                    total += sector(p, q)
    return abs(total)


class ArealKEstimator:
    """Actor-pool stage: broadcast population polygons; per point compute
    k = floor(sum pop_i * area(circle ∩ poly_i) / area(poly_i))."""

    def __init__(self, polygons_ref, key_col: str = "doc_id"):
        import ray

        self.ps: PolygonSet = (
            ray.get(polygons_ref) if not isinstance(polygons_ref, PolygonSet) else polygons_ref
        )
        self.key_col = key_col
        self.areas = np.array([self.ps.area(i) for i in range(self.ps.n)])
        self.rings = [self.ps._ring(i) for i in range(self.ps.n)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False)
        mx = batch.column("mx").to_numpy(zero_copy_only=False)
        my = batch.column("my").to_numpy(zero_copy_only=False)
        d = batch.column("_distance").to_numpy(zero_copy_only=False)
        k = np.empty(len(mx), dtype=np.int64)
        bb = self.ps.bbox
        for j in range(len(mx)):
            acc = 0.0
            # bbox prefilter: only polygons whose bbox intersects the circle's
            cand = np.nonzero(
                (bb[:, 0] <= mx[j] + d[j]) & (bb[:, 2] >= mx[j] - d[j])
                & (bb[:, 1] <= my[j] + d[j]) & (bb[:, 3] >= my[j] - d[j])
            )[0]
            for i in cand:
                if self.areas[i] <= 0 or self.ps.pops is None:
                    continue
                a = circle_polygon_area_exact(mx[j], my[j], d[j], *self.rings[i])
                if a > 0:
                    acc += self.ps.pops[i] * (a / self.areas[i])
            k[j] = int(np.floor(acc))
        return pa.table({
            self.key_col: pa.array(keys, type=pa.int64()),
            "k_anonymity": pa.array(k, type=pa.int64()),
        })


def estimate_k(masked_ds, polygons: PolygonSet, key_col: str = "doc_id",
               concurrency: int | tuple[int, int] | None = None, batch_size: int = 4096):
    """Areal k-anonymity -> Dataset[(doc_id, k_anonymity)] (broadcast side,
    no shuffle)."""
    import ray

    if concurrency is None:
        from ..util import auto_concurrency

        concurrency = auto_concurrency()
    ref = ray.put(polygons)
    return masked_ds.map_batches(
        ArealKEstimator,
        fn_constructor_kwargs=dict(polygons_ref=ref, key_col=key_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def k_anonymity(masked_ds, population, population_column: str = "pop",
                key_col: str = "doc_id", **kwargs):
    """Dispatch like the reference (`analysis.py:108-147`): address points
    -> calculate_k; PolygonSet -> estimate_k."""
    if isinstance(population, PolygonSet):
        if population.pops is None:
            raise ValueError(
                f"Cannot find population column {population_column} in population polygons")
        return estimate_k(masked_ds, population, key_col=key_col, **kwargs)
    return calculate_k(masked_ds, population, key_col=key_col, **kwargs)

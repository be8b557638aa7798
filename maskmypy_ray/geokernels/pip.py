"""Point-in-polygon over flat numpy ring arrays.

From-scratch replacement for shapely's ``intersects`` as used by the donut
containment loop (`/root/reference/maskmypy/masks/donut.py:152-168`) and the
areal k-anonymity kernel. A :class:`PolygonSet` is compiled once (driver
side), broadcast via ``ray.put``, and queried inside ``map_batches`` actors.

Algorithm: bbox prefilter + even-odd crossing number per ring. Points on an
edge follow the half-open crossing rule (deterministic, matches the oracle's
arithmetic containment for the rectangular fixture grid as long as points
don't land exactly on grid lines — fixture draws make that measure-zero).
"""

from __future__ import annotations

import numpy as np


class PolygonSet:
    """Immutable compiled set of simple polygons (single outer ring each).

    Parameters
    ----------
    rings : list of (ring_x, ring_y) float64 array pairs, one per polygon,
        in vertex order, not closed (first vertex != last required).
    poly_ids : optional int64 ids (default 0..n-1).
    pops : optional per-polygon population counts (for areal k-anonymity).
    """

    def __init__(self, rings, poly_ids=None, pops=None):
        self.n = len(rings)
        self.poly_ids = (
            np.asarray(poly_ids, dtype=np.int64)
            if poly_ids is not None
            else np.arange(self.n, dtype=np.int64)
        )
        self.pops = np.asarray(pops, dtype=np.float64) if pops is not None else None
        xs, ys, starts = [], [], [0]
        for rx, ry in rings:
            rx = np.asarray(rx, dtype=np.float64)
            ry = np.asarray(ry, dtype=np.float64)
            if len(rx) >= 2 and rx[0] == rx[-1] and ry[0] == ry[-1]:
                rx, ry = rx[:-1], ry[:-1]
            xs.append(rx)
            ys.append(ry)
            starts.append(starts[-1] + len(rx))
        self.vx = np.concatenate(xs) if xs else np.empty(0)
        self.vy = np.concatenate(ys) if ys else np.empty(0)
        self.starts = np.asarray(starts, dtype=np.int64)
        self.bbox = np.empty((self.n, 4), dtype=np.float64)
        for i in range(self.n):
            s, e = self.starts[i], self.starts[i + 1]
            self.bbox[i] = (
                self.vx[s:e].min(),
                self.vy[s:e].min(),
                self.vx[s:e].max(),
                self.vy[s:e].max(),
            )

    def _ring(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        s, e = self.starts[i], self.starts[i + 1]
        return self.vx[s:e], self.vy[s:e]

    def contains(self, i: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Vectorized crossing-number test of N points against polygon i."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        rx, ry = self._ring(i)
        x1, y1 = rx, ry
        x2, y2 = np.roll(rx, -1), np.roll(ry, -1)
        inside = np.zeros(len(x), dtype=bool)
        # For each edge: does a rightward ray from (x, y) cross it?
        for j in range(len(rx)):
            ax, ay, bx, by = x1[j], y1[j], x2[j], y2[j]
            cond = (ay > y) != (by > y)
            if not cond.any():
                continue
            t = (y - ay) / (by - ay) if by != ay else 0.0
            xint = ax + t * (bx - ax)
            inside ^= cond & (x < xint)
        return inside

    def locate(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Polygon id containing each point; -1 if none.

        The reference requires containers to be non-overlapping
        (`donut.py:158-161`); with overlap the lowest poly id wins here —
        call :meth:`validate_nonoverlap` at build time to enforce.
        """
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        out = np.full(len(x), -1, dtype=np.int64)
        for i in range(self.n):
            bb = self.bbox[i]
            cand = (
                (out == -1)
                & (x >= bb[0])
                & (x <= bb[2])
                & (y >= bb[1])
                & (y <= bb[3])
            )
            if not cand.any():
                continue
            idx = np.nonzero(cand)[0]
            hit = self.contains(i, x[idx], y[idx])
            out[idx[hit]] = self.poly_ids[i]
        return out

    def area(self, i: int) -> float:
        """Shoelace area of polygon i (for areal k disaggregation)."""
        rx, ry = self._ring(i)
        return 0.5 * abs(np.dot(rx, np.roll(ry, -1)) - np.dot(ry, np.roll(rx, -1)))

    def _interior_point(self, i: int) -> tuple[float, float] | None:
        """A point strictly inside polygon i: try the vertex centroid,
        then inward-nudged edge midpoints (handles nonconvex rings)."""
        rx, ry = self._ring(i)
        bb = self.bbox[i]
        eps = 1e-9 * max(bb[2] - bb[0], bb[3] - bb[1], 1.0)
        cx, cy = float(rx.mean()), float(ry.mean())
        if self.contains(i, np.array([cx]), np.array([cy]))[0]:
            return cx, cy
        qx, qy = np.roll(rx, -1), np.roll(ry, -1)
        for j in range(len(rx)):
            mx, my = (rx[j] + qx[j]) / 2.0, (ry[j] + qy[j]) / 2.0
            ex, ey = qx[j] - rx[j], qy[j] - ry[j]
            ln = float(np.hypot(ex, ey))
            if ln == 0:
                continue
            for s in (1.0, -1.0):
                px = mx + s * (-ey / ln) * eps
                py = my + s * (ex / ln) * eps
                if self.contains(i, np.array([px]), np.array([py]))[0]:
                    return float(px), float(py)
        return None

    def _edges_properly_cross(self, i: int, j: int) -> bool:
        """True if any edge of i strictly crosses any edge of j
        (vectorized orientation tests; collinear touches and shared
        endpoints do NOT count — adjacent polygons may share borders)."""
        ax, ay = self._ring(i)
        bx, by = self._ring(j)
        a2x, a2y = np.roll(ax, -1), np.roll(ay, -1)
        b2x, b2y = np.roll(bx, -1), np.roll(by, -1)
        # orientation of (p, q, r) for all (edge_i, endpoint_j) pairs
        dix = (a2x - ax)[:, None]
        diy = (a2y - ay)[:, None]
        o1 = dix * (by[None, :] - ay[:, None]) - diy * (bx[None, :] - ax[:, None])
        o2 = dix * (b2y[None, :] - ay[:, None]) - diy * (b2x[None, :] - ax[:, None])
        djx = (b2x - bx)[None, :]
        djy = (b2y - by)[None, :]
        o3 = djx * (ay[:, None] - by[None, :]) - djy * (ax[:, None] - bx[None, :])
        o4 = djx * (a2y[:, None] - by[None, :]) - djy * (a2x[:, None] - bx[None, :])
        return bool(((o1 * o2 < 0) & (o3 * o4 < 0)).any())

    def validate_nonoverlap(self) -> None:
        """Raise ``ValueError`` if any two polygons' INTERIORS overlap —
        the compile-time analog of the reference's per-point check
        (`/root/reference/maskmypy/masks/donut.py:158-161`), promised by
        :meth:`locate`'s docstring.

        Pairwise strict-bbox prefilter (touching bboxes cannot yield
        interior overlap, so shared-border grids pass without edge
        tests), then per candidate pair: any properly-crossing edge
        pair, or one polygon's interior point inside the other (the
        containment-without-crossing case). O(P^2) bbox prefilter —
        container sets are the small broadcast side by design; swap in a
        sweep-line if P ever grows past ~10^4.
        """
        bb = self.bbox
        for i in range(self.n):
            ov = ((bb[i, 0] < bb[i + 1:, 2]) & (bb[i, 2] > bb[i + 1:, 0])
                  & (bb[i, 1] < bb[i + 1:, 3]) & (bb[i, 3] > bb[i + 1:, 1]))
            for j in (np.nonzero(ov)[0] + i + 1):
                j = int(j)
                overlap = self._edges_properly_cross(i, j)
                if not overlap:
                    for a, b in ((i, j), (j, i)):
                        pt = self._interior_point(a)
                        if pt is not None and self.contains(
                                b, np.array([pt[0]]), np.array([pt[1]]))[0]:
                            overlap = True
                            break
                if overlap:
                    raise ValueError(
                        f"Container polygons {int(self.poly_ids[i])} and "
                        f"{int(self.poly_ids[j])} overlap. Container polygons "
                        "must not overlap.")

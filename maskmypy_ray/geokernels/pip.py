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

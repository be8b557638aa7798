"""Street mask (M3), snap-to-streets (M7), street_k (M4).

Reference: `/root/reference/maskmypy/masks/street.py`. Semantics per point:

1. snap to the nearest node that has >= 1 neighbor within ``max_length``
   meters (`street.py:236-249`). The reference lazily deletes offending
   nodes from a shared temp graph while iterating points — making snapping
   order-dependent; we precompute the equivalent fixpoint (iterative peel
   of nodes with no short edge to a remaining node) ONCE, so snapping is a
   pure per-point lookup (SURVEY.md §7.5.2, documented divergence).
2. draw ``target_node_count ~ randint[low, high)`` (`street.py:253`) from
   the per-row counter RNG (stream 10).
3. grow a Dijkstra ball from the snap node, doubling the cutoff from
   ``max_length`` until >= target nodes found (`street.py:257-262`).
4. target_distance = mean network distance of the first ``target`` nodes
   in distance order (`street.py:264-278`).
5. masked point = the node among those whose distance is closest to
   target_distance, first-in-distance-order on ties (`street.py:280-286`).

The graph (synthetic, :mod:`maskmypy_ray.sources.roadgraph` — osmnx is
unavailable) is compiled once and broadcast; each actor holds it read-only.
At web scale the design shards one graph per coarse cell routed by
``groupby(coarse_cell)``; the single-region fixture uses one shard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import rng
from ..sources.roadgraph import RoadGraph


def valid_snap_nodes(graph: RoadGraph, max_length: float) -> np.ndarray:
    """Boolean mask of nodes remaining after iteratively peeling nodes
    with no edge <= max_length to a remaining node.

    Vectorized synchronous peel: per pass, one segment-sum over the CSR
    arrays marks nodes with >= 1 short edge to a live neighbor. The
    greatest fixpoint is unique (removal only cascades), so this equals
    the reference's sequential lazy-deletion result (`street.py:247-248`).
    Computed ONCE driver-side and shipped with the graph broadcast — not
    per actor (VERDICT r01 'what's wrong' #8)."""
    alive = np.ones(graph.n_nodes, dtype=bool)
    short = graph.edge_len <= max_length
    indptr = graph.indptr
    idx = graph.indices
    while True:
        contrib = (short & alive[idx]).astype(np.int64)
        cs = np.concatenate([[0], np.cumsum(contrib)])
        has_short_live_edge = (cs[indptr[1:]] - cs[indptr[:-1]]) > 0
        new_alive = alive & has_short_live_edge
        if new_alive.sum() == alive.sum():
            return new_alive
        alive = new_alive


class StreetMasker:
    """Actor-pool stage: graph loaded once per actor in __init__."""

    def __init__(self, graph_ref, low: int, high: int, max_length: float,
                 seed: int, key_col: str = "doc_id", valid_ref=None):
        import ray

        self.g: RoadGraph = (
            ray.get(graph_ref) if not isinstance(graph_ref, RoadGraph) else graph_ref)
        self.low, self.high = int(low), int(high)
        self.max_length = float(max_length)
        self.seed = seed
        self.key_col = key_col
        if valid_ref is None:  # direct construction (unit tests)
            self.valid = valid_snap_nodes(self.g, self.max_length)
        else:
            self.valid = (ray.get(valid_ref)
                          if not isinstance(valid_ref, np.ndarray) else valid_ref)
        self._ball_cache: dict[int, tuple] = {}

    def _ball(self, node: int, target: int):
        """Dijkstra ball from ``node`` with >= target entries, memoized:
        thousands of points snap to the same node, and the ball depends
        only on (node, cutoff) — cache the widest ball seen per node.

        Bounded (unlike the reference's `street.py:257-262` doubling
        loop): once a doubled cutoff stops growing the ball, the snap
        node's connected component is exhausted and the ball is as big as
        it will ever get — callers clamp target to its size instead of
        hanging (UNMASKED-fallback pattern, mirrors donut containment's
        MAX_CONTAIN_ROUNDS cap)."""
        cached = self._ball_cache.get(node)
        if cached is None or (len(cached[0]) < target and not cached[2]):
            cutoff = self.max_length
            nodes, dists = self.g.dijkstra_ball(node, cutoff)
            exhausted = False
            while len(nodes) < target:
                cutoff *= 2
                grown, gdists = self.g.dijkstra_ball(node, cutoff)
                if len(grown) == len(nodes):
                    exhausted = True  # component smaller than target
                    break
                nodes, dists = grown, gdists
            cached = (nodes, dists, exhausted)
            self._ball_cache[node] = cached
        return cached

    def _walk_one(self, x: float, y: float, node: int, target: int) -> tuple[float, float]:
        if node < 0:  # no valid node anywhere: keep original
            return x, y
        nodes, dists, _ = self._ball(node, target)
        target = min(target, len(nodes))
        nodes, dists = nodes[:target], dists[:target]
        target_distance = dists.sum() / target
        pick = int(np.argmin(np.abs(dists - target_distance)))
        t = nodes[pick]
        return float(self.g.node_x[t]), float(self.g.node_y[t])

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False) & 0xFFFFFFFF
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        u = rng.uniform01(keys, self.seed, 10)
        targets = (self.low + np.floor(u * (self.high - self.low))).astype(np.int64)
        mx = np.empty(len(x))
        my = np.empty(len(x))
        # snap is one vectorized batch pass; only the (ball-memoized)
        # Dijkstra walk is genuinely per point
        snap = self.g.nearest_nodes(x, y, allowed=self.valid)
        for i in range(len(x)):
            mx[i], my[i] = self._walk_one(x[i], y[i], int(snap[i]), int(targets[i]))
        batch = batch.append_column("mx", pa.array(mx, type=pa.float64()))
        batch = batch.append_column("my", pa.array(my, type=pa.float64()))
        # snap_node: the valid-node the point snapped to — oracle-checkable
        # in SQL (argmin over the deterministic node table), unlike the
        # Dijkstra walk that picks the final output node
        batch = batch.append_column("snap_node", pa.array(snap, type=pa.int64()))
        return batch


def street(ds, graph: RoadGraph, low: int, high: int, max_length: float = 1000.0,
           seed: int | None = 42, key_col: str = "doc_id",
           concurrency: int | tuple[int, int] | None = None, batch_size: int = 2048):
    """Street-mask a geoparsed Dataset (actor pool, broadcast graph)."""
    import ray

    if low >= high:
        raise ValueError("Low value must be less than high value.")
    if seed is None:
        seed = rng.gen_seed()
    if concurrency is None:
        from ..util import auto_concurrency

        concurrency = auto_concurrency()
    ref = ray.put(graph)
    # valid-snap fixpoint computed once on the driver, broadcast alongside
    # the graph (was recomputed in every actor __init__)
    valid_ref = ray.put(valid_snap_nodes(graph, max_length))
    return ds.map_batches(
        StreetMasker,
        fn_constructor_kwargs=dict(graph_ref=ref, low=low, high=high,
                                   max_length=max_length, seed=seed, key_col=key_col,
                                   valid_ref=valid_ref),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


from collections import OrderedDict, namedtuple

#: One graph shard: region bbox, global-node-id offset, and the object
#: refs of its RoadGraph + valid-snap fixpoint (built off-driver).
StreetShard = namedtuple(
    "StreetShard", "x0 x1 y0 y1 id_offset graph_ref valid_ref")


def make_street_shards(regions, max_length: float = 1000.0, seed: int = 42,
                       halo_m: float = 0.0, pitch_m: float = 200.0,
                       jitter: float = 0.3) -> list[StreetShard]:
    """Build one road-graph shard per region bbox (x0, x1, y0, y1) — the
    graph-exceeds-object-store regime of SURVEY §2.1 M3 (VERDICT r03 #7:
    the reference fetches one OSM network per bbox,
    `street.py:217-230`; at web scale the planet graph cannot be ONE
    broadcast). Each shard's graph covers its region expanded by
    ``halo_m`` and is built in a Ray task (the driver holds only refs);
    its valid-snap fixpoint is computed in the same task. Global node
    ids are ``shard.id_offset + local id`` (offsets from the grid-shape
    formula, no build needed driver-side)."""
    import ray

    from ..sources.roadgraph import synth_road_graph

    @ray.remote(num_cpus=1, num_returns=2)
    def build(bbox):
        g = synth_road_graph(seed=seed, pitch_m=pitch_m, jitter=jitter,
                             bbox=bbox)
        return g, valid_snap_nodes(g, max_length)

    shards = []
    offset = 0
    for (x0, x1, y0, y1) in regions:
        bbox = (x0 - halo_m, x1 + halo_m, y0 - halo_m, y1 + halo_m)
        gref, vref = build.remote(bbox)
        shards.append(StreetShard(x0, x1, y0, y1, offset, gref, vref))
        nx = len(np.arange(bbox[0], bbox[1] + pitch_m, pitch_m))
        ny = len(np.arange(bbox[2], bbox[3] + pitch_m, pitch_m))
        offset += nx * ny
    return shards


class ShardedStreetMasker:
    """Actor-pool street mask over SHARDED graphs: each batch routes its
    points to their region shard by vectorized bbox containment (points
    outside every region go to the nearest region by clamped distance),
    and the actor lazily fetches + LRU-caches the shards it touches —
    a zero-copy plasma read per shard, NO shuffle. With spatially
    partitioned input an actor holds O(1) shards regardless of how far
    the planet graph outgrows any single broadcast.

    Partitioning assumption (documented per the task brief): regions
    must be cut with ``halo_m`` >= the maximum snap + Dijkstra-walk
    radius, so no walk ever needs an edge outside its point's shard
    graph. Output ``snap_node`` is the GLOBAL id (shard offset + local);
    masked coordinates are exact node coordinates as in the broadcast
    path."""

    def __init__(self, shards: list[StreetShard], low: int, high: int,
                 max_length: float, seed: int, key_col: str = "doc_id",
                 max_cached: int = 4):
        self.shards = shards
        self.low, self.high = int(low), int(high)
        self.max_length = float(max_length)
        self.seed = seed
        self.key_col = key_col
        self.max_cached = max_cached
        self._cache: OrderedDict[int, StreetMasker] = OrderedDict()

    def _masker(self, sid: int) -> StreetMasker:
        m = self._cache.get(sid)
        if m is None:
            import ray

            s = self.shards[sid]
            m = StreetMasker(ray.get(s.graph_ref), self.low, self.high,
                             self.max_length, self.seed, self.key_col,
                             valid_ref=ray.get(s.valid_ref))
            self._cache[sid] = m
            if len(self._cache) > self.max_cached:
                self._cache.popitem(last=False)
        else:
            self._cache.move_to_end(sid)
        return m

    def _assign(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        sid = np.full(len(x), -1, dtype=np.int64)
        for i, s in enumerate(self.shards):
            hit = (sid < 0) & (x >= s.x0) & (x < s.x1) & (y >= s.y0) & (y < s.y1)
            sid[hit] = i
        out = np.nonzero(sid < 0)[0]
        if len(out):
            ox, oy = x[out], y[out]
            d2 = np.full(len(out), np.inf)
            best = np.zeros(len(out), dtype=np.int64)
            for i, s in enumerate(self.shards):
                di = (ox - np.clip(ox, s.x0, s.x1)) ** 2 \
                    + (oy - np.clip(oy, s.y0, s.y1)) ** 2
                upd = di < d2
                d2[upd] = di[upd]
                best[upd] = i
            sid[out] = best
        return sid

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_col).to_numpy(zero_copy_only=False) \
            & 0xFFFFFFFF
        x = batch.column("x").to_numpy(zero_copy_only=False)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        u = rng.uniform01(keys, self.seed, 10)
        targets = (self.low
                   + np.floor(u * (self.high - self.low))).astype(np.int64)
        sid = self._assign(x, y)
        mx = np.empty(len(x))
        my = np.empty(len(x))
        snap = np.empty(len(x), dtype=np.int64)
        for s in np.unique(sid):
            m = self._masker(int(s))
            idx = np.nonzero(sid == s)[0]
            sn = m.g.nearest_nodes(x[idx], y[idx], allowed=m.valid)
            for j, p in enumerate(idx):
                mx[p], my[p] = m._walk_one(x[p], y[p], int(sn[j]),
                                           int(targets[p]))
            snap[idx] = np.where(
                sn >= 0, sn + self.shards[int(s)].id_offset, sn)
        batch = batch.append_column("mx", pa.array(mx, type=pa.float64()))
        batch = batch.append_column("my", pa.array(my, type=pa.float64()))
        batch = batch.append_column("snap_node", pa.array(snap, type=pa.int64()))
        return batch


def street_sharded(ds, shards: list[StreetShard], low: int, high: int,
                   max_length: float = 1000.0, seed: int | None = 42,
                   key_col: str = "doc_id",
                   concurrency: int | tuple[int, int] | None = None,
                   batch_size: int = 2048):
    """Street-mask with one graph shard per region (see
    :class:`ShardedStreetMasker` for the routing + halo contract). For a
    single shard covering the whole domain this is bit-identical to
    :func:`street` on the same graph."""
    if low >= high:
        raise ValueError("Low value must be less than high value.")
    if seed is None:
        seed = rng.gen_seed()
    if concurrency is None:
        from ..util import auto_concurrency

        concurrency = auto_concurrency()
    return ds.map_batches(
        ShardedStreetMasker,
        fn_constructor_kwargs=dict(shards=shards, low=low, high=high,
                                   max_length=max_length, seed=seed,
                                   key_col=key_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class StreetSnapper:
    """Snap-to-nearest-node post-pass (M7, `tools.py:98-133`): plain
    nearest node on the full graph, no validity filter."""

    def __init__(self, graph_ref, x_col: str = "mx", y_col: str = "my"):
        import ray

        self.g: RoadGraph = (
            ray.get(graph_ref) if not isinstance(graph_ref, RoadGraph) else graph_ref)
        self.x_col, self.y_col = x_col, y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = batch.column(self.x_col).to_numpy(zero_copy_only=False)
        y = batch.column(self.y_col).to_numpy(zero_copy_only=False)
        # one vectorized grid argmin per batch (VERDICT r02 #5)
        nodes = self.g.nearest_nodes(x, y)
        sx = self.g.node_x[nodes]
        sy = self.g.node_y[nodes]
        batch = batch.set_column(batch.schema.get_field_index(self.x_col),
                                 self.x_col, pa.array(sx, type=pa.float64()))
        batch = batch.set_column(batch.schema.get_field_index(self.y_col),
                                 self.y_col, pa.array(sy, type=pa.float64()))
        return batch


def snap_to_streets(ds, graph: RoadGraph, x_col: str = "mx", y_col: str = "my",
                    concurrency: int | tuple[int, int] | None = None, batch_size: int = 4096):
    import ray

    if concurrency is None:
        from ..util import auto_concurrency

        concurrency = auto_concurrency()
    ref = ray.put(graph)
    return ds.map_batches(
        StreetSnapper,
        fn_constructor_kwargs=dict(graph_ref=ref, x_col=x_col, y_col=y_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def street_k(ds, graph: RoadGraph, addresses_ds, min_k: int = 30, start: int = 10,
             stop: int = 60, spread: int = 2, increment: int = 2,
             suppression: float = 0.99, max_length: float = 1000.0,
             seed: int = 42, key_col: str = "doc_id"):
    """Iterative street masking until k-satisfaction (M4,
    `street.py:165-192`): driver-level loop over full Ray pipelines with a
    scalar k-satisfaction barrier per iteration; the same seed is reused
    each retry exactly like the reference (`street.py:178`)."""
    from ..analysis.aggregates import k_satisfaction
    from ..analysis.displacement import displacement
    from ..analysis.k_anonymity import calculate_k
    from .suppress import suppress

    if hasattr(addresses_ds, "materialize"):
        addresses_ds = addresses_ds.materialize()
    ds = ds.materialize()
    k_sat = 0.0
    while k_sat < suppression:
        if start > stop:
            raise RuntimeError(
                "Reached maximum network depth (stop value). Unable to achieve min_k.")
        # Mask once per iteration (materialized: calculate_k's auto cell_m
        # Max aggregate would otherwise re-run the expensive street stage),
        # then the broadcast k plan appends ``k_anonymity`` per batch — no
        # driver-side (key, k) re-join (VERDICT r01 #1); k_satisfaction and
        # suppress both aggregate over the same materialized result.
        masked = displacement(street(ds, graph, low=start, high=start + spread,
                                     max_length=max_length, seed=seed,
                                     key_col=key_col)).materialize()
        with_k = calculate_k(masked, addresses_ds, key_col=key_col,
                             mode="broadcast", append=True).materialize()
        k_sat = k_satisfaction(with_k, min_k=min_k)
        if k_sat >= suppression:
            return suppress(with_k, min_k=min_k)
        start += increment

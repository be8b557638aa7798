"""k-nearest-neighbors join: masked points -> the k closest addresses.

The engine already had kNN(1) (nnd, street snapping) and within-radius
counts (k-anonymity); this is the general spatial kNN JOIN from the
north_rule's operator list. Reference counterpart: none directly —
pointpats' knn machinery underlies `maskmypy/analysis.py:222-237`, but
the reference never exposes a point→context-layer kNN.

Plan (broadcast, zero shuffle, EXACT): the address side compiles into
the same sorted cell-bucketed index as the broadcast k-anonymity path
(`analysis/k_anonymity.py:196`); each point batch runs an iterative
ring expansion — gather candidates from the (2r+1)^2 cell block, take
the k best by (dist2, addr_id), and accept once the k-th distance is
strictly inside the ring's guarantee radius ``r * index_cell`` (an
address outside the block is farther than that) or the block already
covers every address. Unresolved points re-run with the ring doubled;
every step is vectorized across the batch (range-expansion via
repeat/cumsum, per-point top-k via one lexsort + segment rank — the
``_head_k_per_host`` idiom).

Scale note: this is the small-context-side plan (guarded by the same
BROADCAST_ADDR_LIMIT as calculate_k). For address sides too large to
broadcast, the shape is the nnd halo-shuffle plan (replicate addresses
into 3x3 halos sized by an upper-bound k-th distance, doubling for
unresolved points) — the count-based variant of which ships in
calculate_k(mode="shuffle").

dist2 is a single fused ``dx*dx + dy*dy`` in float64 on both the
engine and SQL sides — bit-exact given the bit-exact mask/address
coordinates, so the oracle value-checks distances, not just ids.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geokernels.cells import cell_of_xy, neighbors_xy
from .k_anonymity import BROADCAST_ADDR_LIMIT, _TableDS

DEFAULT_KNN_CELL_M = 500.0


def _compile_knn_index(addresses_ds, cell_m: float):
    """Ray task -> (cells_sorted, ax, ay, addr_id (all in sorted cell
    order), index_cell). Same off-driver compile shape as
    k_anonymity._compile_index_remote, plus the addr_id payload."""
    import ray

    from ..geokernels.geometry import latlon_to_xy

    @ray.remote(num_cpus=1)
    def compile_task(*blocks):
        tbl = pa.concat_tables(
            [b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
             for b in blocks])
        ax, ay = latlon_to_xy(
            tbl.column("lat").to_numpy(zero_copy_only=False),
            tbl.column("lon").to_numpy(zero_copy_only=False))
        aid = tbl.column("addr_id").to_numpy(zero_copy_only=False)
        index_cell = max(cell_m, 50.0)
        cells = cell_of_xy(ax, ay, index_cell)
        order = np.argsort(cells, kind="stable")
        return (cells[order], ax[order], ay[order],
                aid[order].astype(np.int64), index_cell)

    if isinstance(addresses_ds, _TableDS):
        return compile_task.remote(ray.put(addresses_ds.table))
    return compile_task.remote(*addresses_ds.to_arrow_refs())


def _knn_batch(idx, mx, my, keys, k: int):
    cells, ax, ay, aid, icell = idx
    n_addr = len(ax)
    n = len(mx)
    out_key = np.empty(min(k, n_addr) * n, dtype=np.int64)
    out_rank = np.empty_like(out_key)
    out_aid = np.empty_like(out_key)
    out_d2 = np.empty(len(out_key), dtype=np.float64)
    filled = 0
    unres = np.arange(n)
    ring = 1
    while len(unres):
        px, py = mx[unres], my[unres]
        nb = neighbors_xy(cell_of_xy(px, py, icell), ring=ring)
        lo = np.searchsorted(cells, nb.ravel(), side="left")
        hi = np.searchsorted(cells, nb.ravel(), side="right")
        cnt = hi - lo
        b = nb.shape[1]
        pidx_block = np.repeat(np.arange(len(unres)), b)
        sel = cnt > 0
        reps, starts = cnt[sel], lo[sel]
        pts = np.repeat(pidx_block[sel], reps)
        # flat candidate positions: per-block ranges starts..starts+reps
        off = np.concatenate(([0], np.cumsum(reps)))[:-1]
        cand = np.repeat(starts - off, reps) + np.arange(reps.sum())
        dx = px[pts] - ax[cand]
        dy = py[pts] - ay[cand]
        d2 = dx * dx + dy * dy
        order = np.lexsort((aid[cand], d2, pts))
        spt = pts[order]
        firsts = np.ones(len(spt), dtype=bool)
        firsts[1:] = spt[1:] != spt[:-1]
        seg_start = np.maximum.accumulate(
            np.where(firsts, np.arange(len(spt)), 0))
        rank = np.arange(len(spt)) - seg_start
        top = rank < k
        # per-point found count + k-th (= worst kept) distance
        n_cand = np.bincount(pts, minlength=len(unres))
        found = np.minimum(n_cand, k)
        worst = np.zeros(len(unres), dtype=np.float64)
        kept_pts = spt[top]
        np.maximum.at(worst, kept_pts, d2[order][top])
        guarantee = (ring * icell) ** 2
        done = ((found >= min(k, n_addr)) & (worst < guarantee)) \
            | (n_cand >= n_addr)
        if done.any():
            emit = top & done[spt]
            m = int(emit.sum())
            sl = slice(filled, filled + m)
            out_key[sl] = keys[unres][spt[emit]]
            out_rank[sl] = rank[emit] + 1
            out_aid[sl] = aid[cand][order][emit]
            out_d2[sl] = d2[order][emit]
            filled += m
        unres = unres[~done]
        ring *= 2
    return (out_key[:filled], out_rank[:filled], out_aid[:filled],
            out_d2[:filled])


def knn_join(points_ds, addresses_ds, k: int = 3,
             cell_m: float = DEFAULT_KNN_CELL_M, x_col: str = "mx",
             y_col: str = "my", key_col: str = "doc_id"):
    """Dataset[(doc_id, rank, addr_id, dist2)] — the k nearest
    addresses per point, rank 1..k by (dist2, addr_id)."""
    import ray

    if isinstance(addresses_ds, pa.Table):
        addresses_ds = _TableDS(addresses_ds)
    if not isinstance(addresses_ds, _TableDS):
        n_addr = addresses_ds.count()
        assert n_addr <= BROADCAST_ADDR_LIMIT, (
            f"{n_addr} addresses exceed the broadcast bound; use the "
            "halo-shuffle plan (see module docstring)")
    ref = _compile_knn_index(addresses_ds, cell_m)

    def fn(batch: pa.Table) -> pa.Table:
        idx = ray.get(ref)  # zero-copy plasma read per task
        keys, rank, aids, d2 = _knn_batch(
            idx,
            batch.column(x_col).to_numpy(zero_copy_only=False),
            batch.column(y_col).to_numpy(zero_copy_only=False),
            batch.column(key_col).to_numpy(zero_copy_only=False), k)
        return pa.table({
            "doc_id": pa.array(keys, type=pa.int64()),
            "rank": pa.array(rank, type=pa.int64()),
            "addr_id": pa.array(aids, type=pa.int64()),
            "dist2": pa.array(d2, type=pa.float64()),
        })

    return points_ds.select_columns([key_col, x_col, y_col]) \
        .map_batches(fn, batch_format="pyarrow")

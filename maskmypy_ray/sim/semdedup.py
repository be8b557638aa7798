"""Semantic deduplication over the embeddings table (SemDeDup, Abbas et
al. 2023, arXiv:2303.09540): cluster embeddings with spherical k-means,
then within each cluster greedily drop every vector whose cosine
similarity to an already-kept (lower ``vec_id``) vector meets the
threshold.

Ray-Data shape: centroid training reuses :func:`ann._train_centroids_ref`
(off-driver task over a bounded sample), cluster assignment is one
``(n, nlist)`` matmul per batch, and the within-cluster dedup runs in
``groupby(cluster).map_groups`` — the all-to-all moves each vector once,
and the O(c^2) similarity work is sharded per cluster. The partitioning
assumption (documented per the custom-operator rule): ``nlist`` must
scale with the corpus so cluster sizes stay bounded (the paper uses
~1e5 clusters at 1e9 docs); a hot cluster is a skew problem like any
groupby key and can be salted by splitting on a second hash level.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .ann import _embeddings_matrix, _normalize, _train_centroids_ref


class ClusterAssigner:
    """Actor-pool stage: nearest-centroid assignment, one matmul/batch.
    Carries the normalized embedding forward so the per-cluster dedup
    never re-reads the table."""

    def __init__(self, centroids_ref):
        import ray

        self.c = (ray.get(centroids_ref)
                  if not isinstance(centroids_ref, np.ndarray) else centroids_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, emb = _embeddings_matrix(batch)
        m = _normalize(emb)
        assign = np.argmax(m @ self.c.T, axis=1).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "cluster": pa.array(assign, type=pa.int64()),
            "nemb": pa.array(list(m.astype(np.float32)),
                             type=pa.list_(pa.float32())),
        })


def greedy_dedup_group(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Greedy keep-first over one cluster, in ascending ``vec_id`` order:
    a vector is kept iff its max cosine against all already-kept vectors
    is below ``threshold``. O(c^2) matmul once, then one boolean pass."""
    order = np.argsort(g["vec_id"].to_numpy(), kind="stable")
    ids = g["vec_id"].to_numpy()[order]
    m = np.stack(g["nemb"].to_numpy()[order]).astype(np.float64)
    sims = m @ m.T
    kept_mask = np.zeros(len(ids), dtype=bool)
    for i in range(len(ids)):
        kept_mask[i] = not (sims[i, :i][kept_mask[:i]] >= threshold).any()
    return pd.DataFrame({
        "vec_id": ids,
        "cluster": g["cluster"].to_numpy()[order],
        "kept": kept_mask.astype(np.int64),
    })


def semantic_dedup(ds, threshold: float = 0.9, nlist: int = 16):
    """Dataset[(vec_id, cluster, kept)] — kept=1 rows are the surviving
    representatives; a dropped row always has cosine >= threshold to some
    kept, lower-id vector in its cluster (invariant pinned by pytest)."""
    from ..util import auto_concurrency

    cref = _train_centroids_ref(ds, nlist=nlist)
    assigned = ds.map_batches(ClusterAssigner, batch_format="pyarrow",
                              concurrency=auto_concurrency(),
                              fn_constructor_args=(cref,))
    return assigned.groupby("cluster").map_groups(
        lambda g: greedy_dedup_group(g, threshold), batch_format="pandas")

"""Distributed PCA over the embedding column.

Two stages, both Ray-Data-native:

* :func:`embedding_gram` — the exact integer Gram matrix of the
  1e-6-quantized embeddings: per-batch ``Q^T Q`` partials (one numpy
  matmul per batch, d(d+1)/2 upper-triangle rows emitted) combined by
  one tiny ``groupby((i, j)).sum`` — the shuffle carries d(d+1)/2 rows
  per block regardless of corpus size. All-integer, so the DuckDB twin
  (unnest + self-join per vec_id) matches bit-for-bit.
* :func:`embedding_pca` — eigendecomposition of the mean-centered
  covariance assembled from that Gram on the driver (d x d scalars
  only), deterministic component signs, then one stateless broadcast
  projection pass. The eigensolve itself is LAPACK float — the
  projection is rows-only for the driver panel and pinned against an
  in-memory numpy PCA by pytest.

100-TB audit: nothing but d x d partials ever leaves a worker; the
quantization scale must satisfy ``n_rows * (Q * max|x|)^2 < 2^63``
(Q=1e6 holds to ~1e5 B rows for unit-normalized embeddings; drop Q one
decade per 100x rows beyond that).

Reference analog: none (graft addition for the embedding-column
toolchain alongside sim/ann.py and sim/semdedup.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

QUANT = 1_000_000


def _matrix(b: pa.Table, col: str) -> np.ndarray:
    emb = b.column(col)
    if emb.num_chunks > 0:
        flat = np.concatenate([
            c.flatten().to_numpy(zero_copy_only=False)
            for c in emb.chunks])
        d = len(emb.chunk(0)[0]) if len(emb.chunk(0)) else 0
    else:  # pragma: no cover — empty batch
        flat, d = np.empty(0), 1
    return flat.astype(np.float64).reshape(-1, d)


def embedding_gram(ds, col: str = "embedding"):
    """Exact upper-triangle Gram matrix ``(i, j, v)`` of the quantized
    embedding column: ``v = sum over rows of q_i * q_j`` with
    ``q = floor(QUANT * x)`` int64 (floor matches SQL ``floor``; the
    cast to float64 before quantizing matches the SQL DOUBLE cast)."""
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        m = _matrix(b, col)
        q = np.floor(QUANT * m).astype(np.int64)
        g = q.T @ q
        iu, ju = np.triu_indices(g.shape[0])
        return pa.table({
            "i": pa.array(iu.astype(np.int64)),
            "j": pa.array(ju.astype(np.int64)),
            "v": pa.array(g[iu, ju]),
        })

    return ds.map_batches(part, batch_format="pyarrow") \
        .groupby(["i", "j"]).aggregate(Sum("v", alias_name="v"))


def embedding_pca(ds, k: int = 2, col: str = "embedding",
                  id_col: str = "vec_id"):
    """Project every embedding onto the top-``k`` principal components
    of the corpus (mean-centered). Returns ``(vec_id, pc)`` with ``pc``
    a length-k float list.

    The covariance is assembled from ONE distributed pass (the exact
    integer Gram plus integer coordinate sums ride in the same partial
    batch output), eigensolved on the driver (d x d), and the
    projection is a stateless ``map_batches`` with the component matrix
    captured in the closure. Component signs are made deterministic by
    forcing the largest-|coordinate| entry of each component positive
    (ties: lowest index wins).
    """
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        m = _matrix(b, col)
        q = np.floor(QUANT * m).astype(np.int64)
        g = q.T @ q
        d = g.shape[0]
        iu, ju = np.triu_indices(d)
        # coordinate sums + row count ride as sentinel rows (i = -1, -2)
        return pa.table({
            "i": pa.array(np.concatenate([
                iu, np.full(d, -1), np.array([-2])]).astype(np.int64)),
            "j": pa.array(np.concatenate([
                ju, np.arange(d), np.array([0])]).astype(np.int64)),
            "v": pa.array(np.concatenate([
                g[iu, ju], q.sum(axis=0), np.array([len(m)])])
                .astype(np.int64)),
        })

    rows = ds.map_batches(part, batch_format="pyarrow") \
        .groupby(["i", "j"]).aggregate(Sum("v", alias_name="v")) \
        .to_pandas()
    n = int(rows.loc[rows["i"] == -2, "v"].iloc[0])
    sums = rows[rows["i"] == -1].sort_values("j")["v"].to_numpy()
    d = len(sums)
    gram = np.zeros((d, d), dtype=np.float64)
    tri = rows[rows["i"] >= 0]
    gram[tri["i"].to_numpy(), tri["j"].to_numpy()] = tri["v"].to_numpy()
    gram = gram + np.triu(gram, 1).T
    mu = sums / (QUANT * n)
    cov = gram / (QUANT * QUANT * n) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    comp = vecs[:, np.argsort(vals)[::-1][:k]]  # d x k, descending var
    # deterministic signs: largest-|coordinate| entry positive
    piv = np.argmax(np.abs(comp), axis=0)
    comp = comp * np.where(comp[piv, np.arange(comp.shape[1])] < 0, -1, 1)

    def project(b: pa.Table, comp=comp, mu=mu) -> pa.Table:
        m = _matrix(b, col)
        pc = (m - mu) @ comp
        return pa.table({
            id_col: b.column(id_col),
            "pc": pa.array(list(pc.astype(np.float32))),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def label_centroid_sim(ds, col: str = "embedding",
                       label_col: str = "label"):
    """Pairwise cosine similarity between per-label embedding
    centroids — the embedding-space drift matrix between groups
    (mix balancing / domain-clustering diagnostic; the embedding twin
    of text/dedup.py:source_minhash_similarity).

    The distributed part is ONE pass of per-batch per-label quantized
    coordinate sums (labels x d int64 rows leave each worker) combined
    by a tiny ``groupby((label, idx)).sum``; the cosine matrix itself
    is labels^2 driver scalars computed in exact Python ints (the dot
    of coordinate SUMS equals n_a*n_b times the centroid dot, so the
    cosine of sums IS the cosine of centroids), then one
    correctly-rounded float division quantized to ``cos_micro =
    floor(1e6 * dot / sqrt(aa * bb))`` — the same int-then-one-IEEE-op
    recipe as source_kl, so the DuckDB HUGEINT twin matches exactly.

    Returns ``(label_a, label_b, cos_micro)`` for label_a <= label_b.
    """
    import math

    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        m = _matrix(b, col)
        q = np.floor(QUANT * m).astype(np.int64)
        labs = b.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(labs, return_inverse=True)
        s = np.zeros((len(uniq), q.shape[1]), dtype=np.int64)
        np.add.at(s, inv, q)
        k, d = s.shape
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "idx": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "s": pa.array(s.reshape(-1)),
        })

    rows = ds.map_batches(part, batch_format="pyarrow") \
        .groupby(["label", "idx"]).aggregate(Sum("s", alias_name="s")) \
        .to_pandas()
    piv = rows.pivot(index="label", columns="idx", values="s") \
        .sort_index()
    labels = piv.index.to_numpy()
    # exact python-int dot products (sums can overflow int64 squared)
    vecs = [[int(x) for x in piv.loc[l].to_numpy()] for l in labels]
    norms = [sum(c * c for c in v) for v in vecs]
    la, lb, cm = [], [], []
    for i in range(len(labels)):
        for j in range(i, len(labels)):
            dot = sum(a * b for a, b in zip(vecs[i], vecs[j]))
            sim = float(dot) / math.sqrt(float(norms[i]) * float(norms[j]))
            la.append(int(labels[i]))
            lb.append(int(labels[j]))
            cm.append(int(math.floor(1_000_000 * sim)))
    return pa.table({
        "label_a": pa.array(la, type=pa.int64()),
        "label_b": pa.array(lb, type=pa.int64()),
        "cos_micro": pa.array(cm, type=pa.int64()),
    })


def embedding_outliers(ds, col: str = "embedding",
                       id_col: str = "vec_id",
                       q_num: int = 95, q_den: int = 100):
    """Centroid-distance outlier flags: flag vectors whose exact
    integer squared distance to the (floored) corpus centroid exceeds
    the corpus p95 order statistic — the embedding-space analog of the
    per-source Tukey fences in text/quality.py:source_outlier_flags.

    All-integer end to end: the centroid is the TRUNCATING integer
    division of quantized coordinate sums (matching DuckDB's ``//``,
    which truncates toward zero — Python's ``//`` floors, so the driver
    mirrors the SQL semantics explicitly), ``dist2`` is an int64 sum of
    squared deviations (< 2^53, so the quantile descent over its float
    view is exact), and the threshold is the exact lower order
    statistic at rank floor((q_num/q_den)*(n-1)) from
    ``exact_quantiles_distributed``. Two distributed passes + one
    stateless flag pass; driver state is d + 2 scalars.

    Returns ``(vec_id, dist2, outlier)`` for every vector.
    """
    from ray.data.aggregate import Sum

    from ..analysis.aggregates import exact_quantiles_distributed

    def sums(b: pa.Table) -> pa.Table:
        m = _matrix(b, col)
        q = np.floor(QUANT * m).astype(np.int64)
        d = q.shape[1]
        return pa.table({
            "idx": pa.array(np.concatenate([
                np.arange(d, dtype=np.int64), np.array([-1])])),
            "s": pa.array(np.concatenate([
                q.sum(axis=0), np.array([len(m)])]).astype(np.int64)),
        })

    rows = ds.map_batches(sums, batch_format="pyarrow") \
        .groupby("idx").aggregate(Sum("s", alias_name="s")).to_pandas() \
        .sort_values("idx")
    n = int(rows.loc[rows["idx"] == -1, "s"].iloc[0])
    svec = rows.loc[rows["idx"] >= 0, "s"].to_numpy().astype(np.int64)
    # truncating division (DuckDB // semantics; np int division floors)
    mean_q = (np.abs(svec) // n) * np.sign(svec)

    def dist(b: pa.Table, mean_q=mean_q) -> pa.Table:
        m = _matrix(b, col)
        q = np.floor(QUANT * m).astype(np.int64)
        dv = q - mean_q
        return pa.table({
            id_col: b.column(id_col),
            "dist2": pa.array((dv * dv).sum(axis=1).astype(np.int64)),
        })

    dd = ds.map_batches(dist, batch_format="pyarrow").materialize()
    thr = exact_quantiles_distributed(dd, "dist2", [q_num / q_den],
                                      max_collect=1_000_000)[0]
    thr = int(thr)

    def flag(b: pa.Table, thr=thr) -> pa.Table:
        d2 = b.column("dist2").to_numpy(zero_copy_only=False)
        return b.append_column(
            "outlier", pa.array((d2 > thr).astype(np.int64)))

    return dd.map_batches(flag, batch_format="pyarrow")

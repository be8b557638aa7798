"""Distributed Lloyd's k-means over the embedding column, all-integer.

The clustering primitive under SemDeDup-style semantic dedup and
cluster-balanced data selection — here as a first-class operator whose
every compare is exact int64, so a DuckDB twin reproduces it
bit-for-bit (same recipe as `sim/pca.py:embedding_outliers`: quantize
``floor(1e6 * x)``, truncating ``//`` centroid division, integer
squared distances).

Scale shape: the quantized matrix dataset is materialized ONCE (same
volume as the input, compact int64; Ray spills it) and streamed
``iters + 1`` times; each iteration ships only ``k * (d + 1)`` partial
int64 rows per block through one tiny groupby, and the driver holds
``k * d`` centroid ints between passes — nothing else is global.
Init = the k quantized vectors with the smallest ids (deterministic
and SQL-expressible; k-means++ would add one seeded scan per pick
without changing the iteration shape).

Determinism: assignment = argmin int64 dist2 with ties to the LOWER
cluster id; new centroid = truncating division sum // count (DuckDB
``//`` semantics, sign handled explicitly); an empty cluster keeps its
previous centroid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .pca import QUANT, _matrix


def _imat(b: pa.Table) -> np.ndarray:
    """(n, d) int64 matrix from the fixed-size-list ``qv`` column."""
    col = b.column("qv")
    d = b.schema.field("qv").type.list_size
    if col.num_chunks == 0:  # pragma: no cover — empty batch
        return np.empty((0, d), dtype=np.int64)
    flat = np.concatenate([
        c.flatten().to_numpy(zero_copy_only=False) for c in col.chunks])
    return flat.reshape(-1, d).astype(np.int64)


def kmeans(ds, k: int = 8, iters: int = 3, col: str = "embedding",
           id_col: str = "vec_id"):
    """Lloyd's k-means, ``iters`` update rounds -> final assignment.

    Returns ``(vec_id, cluster, dist2)`` under the final centroids.
    dist2 bounds: |q| <= QUANT * max|x|, diffs <= 2 * QUANT, squared
    4e12, summed over d=64 dims ~ 2.6e14 — comfortably int64-exact.
    """
    from ray.data.aggregate import Sum

    def quant(b: pa.Table) -> pa.Table:
        m = _matrix(b, col)
        q = np.floor(QUANT * m).astype(np.int64)
        n, d = q.shape
        return pa.table({
            id_col: b.column(id_col),
            "qv": pa.FixedSizeListArray.from_arrays(
                pa.array(q.reshape(-1)), d),
        })

    # materialized once: consumed iters+1 times (dual-consumer rule)
    qds = ds.map_batches(quant, batch_format="pyarrow").materialize()

    init_rows = qds.sort(id_col).limit(k).take_all()
    cent = np.array([r["qv"] for r in init_rows], dtype=np.int64)
    kk, d = cent.shape

    def assign_of(cent):
        def fn(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
            q = _imat(b)
            d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)  # np argmin: ties -> lower index
            return q, a, d2
        return fn

    for _ in range(iters):
        fn = assign_of(cent)

        def partial(b: pa.Table, fn=fn) -> pa.Table:
            q, a, _ = fn(b)
            s = np.zeros((kk, d), dtype=np.int64)
            np.add.at(s, a, q)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            # encode (cluster, idx) into one int key: idx -1 == count
            key = (np.repeat(np.arange(kk, dtype=np.int64), d + 1)
                   * (d + 2)
                   + np.tile(np.concatenate([np.arange(d), [-1]]) + 1, kk))
            val = np.concatenate(
                [np.concatenate([s[j], [cnt[j]]]) for j in range(kk)])
            return pa.table({"key": pa.array(key),
                             "s": pa.array(val.astype(np.int64))})

        rows = qds.map_batches(partial, batch_format="pyarrow") \
            .groupby("key").aggregate(Sum("s", alias_name="s")).to_pandas()
        keys = rows["key"].to_numpy(np.int64)
        vals = rows["s"].to_numpy(np.int64)
        new = cent.copy()
        cl = keys // (d + 2)
        ix = keys % (d + 2) - 1
        cnts = {int(c): int(v) for c, v in zip(cl[ix == -1], vals[ix == -1])}
        for j in range(kk):
            cj = cnts.get(j, 0)
            if cj > 0:
                m = cl == j
                mi = m & (ix >= 0)
                order = np.argsort(ix[mi])
                sv = vals[mi][order]
                new[j] = (np.abs(sv) // cj) * np.sign(sv)
        cent = new

    fn = assign_of(cent)

    def final(b: pa.Table, fn=fn) -> pa.Table:
        _, a, d2 = fn(b)
        return pa.table({
            id_col: b.column(id_col),
            "cluster": pa.array(a.astype(np.int64)),
            "dist2": pa.array(
                d2[np.arange(len(a)), a].astype(np.int64)),
        })

    return qds.map_batches(final, batch_format="pyarrow")


def kmeans_sql(k: int = 8, iters: int = 3,
               table: str = "embeddings") -> str:
    """Unrolled relational DuckDB twin of :func:`kmeans` — one
    assignment + centroid-update CTE pair per iteration, then the
    final assignment. All-integer (HUGEINT-free: every sum < 2^63)."""
    parts = [
        f"WITH u AS (SELECT vec_id, "
        f"generate_subscripts(embedding, 1) - 1 AS idx, "
        f"CAST(floor({QUANT} * CAST(unnest(embedding) AS DOUBLE)) "
        f"AS BIGINT) AS q FROM {table}), "
        f"ids AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 "
        f"AS j FROM (SELECT DISTINCT vec_id FROM u) "
        f"ORDER BY vec_id LIMIT {k}), "
        f"c0 AS (SELECT ids.j, u.idx, u.q AS c FROM u "
        f"JOIN ids USING (vec_id))"]
    for i in range(1, iters + 2):
        parts.append(
            f"a{i} AS (SELECT vec_id, j, dist2, row_number() OVER "
            f"(PARTITION BY vec_id ORDER BY dist2, j) AS rn "
            f"FROM (SELECT u.vec_id, c.j, "
            f"CAST(sum((u.q - c.c) * (u.q - c.c)) AS BIGINT) AS dist2 "
            f"FROM u JOIN c{i - 1} c ON c.idx = u.idx "
            f"GROUP BY u.vec_id, c.j))")
        if i == iters + 1:
            break
        parts.append(
            f"s{i} AS (SELECT a.j, u.idx, CAST(sum(u.q) AS BIGINT) AS s, "
            f"CAST(count(*) AS BIGINT) AS n FROM u JOIN "
            f"(SELECT vec_id, j FROM a{i} WHERE rn = 1) a USING (vec_id) "
            f"GROUP BY a.j, u.idx)")
        parts.append(
            f"c{i} AS (SELECT p.j, p.idx, coalesce("
            f"(abs(s.s) // s.n) * (CASE WHEN s.s < 0 THEN -1 "
            f"WHEN s.s > 0 THEN 1 ELSE 0 END), p.c) AS c "
            f"FROM c{i - 1} p LEFT JOIN s{i} s "
            f"ON s.j = p.j AND s.idx = p.idx)")
    return (", ".join(parts)
            + f" SELECT vec_id, j AS cluster, dist2 "
              f"FROM a{iters + 1} WHERE rn = 1")

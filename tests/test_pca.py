"""Distributed PCA: exact integer Gram + projection vs in-memory numpy."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ref(sf_dir, k=2):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    m = np.stack([np.asarray(x, dtype=np.float64)
                  for x in t.column("embedding").to_pylist()])
    ids = t.column("vec_id").to_numpy()
    q = np.floor(1e6 * m).astype(np.int64)
    n = len(m)
    gram = q.T @ q
    mu = q.sum(0) / (1e6 * n)
    cov = gram.astype(np.float64) / (1e12 * n) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    comp = vecs[:, np.argsort(vals)[::-1][:k]]
    piv = np.argmax(np.abs(comp), axis=0)
    comp = comp * np.where(comp[piv, np.arange(k)] < 0, -1, 1)
    return ids, m, gram, mu, comp


def test_embedding_gram_exact(ray_session, sf_dir):
    import ray.data

    from maskmypy_ray.sim.pca import embedding_gram

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"]) \
        .repartition(5)
    got = embedding_gram(ds).to_pandas().sort_values(["i", "j"])
    ids, m, gram, mu, comp = _ref(sf_dir)
    iu, ju = np.triu_indices(gram.shape[0])
    assert (got["i"].to_numpy() == iu).all()
    assert (got["j"].to_numpy() == ju).all()
    assert (got["v"].to_numpy() == gram[iu, ju]).all()


def test_embedding_pca_matches_numpy(ray_session, sf_dir):
    import ray.data

    from maskmypy_ray.sim.pca import embedding_pca

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"]) \
        .repartition(5)
    df = embedding_pca(ds, k=2).to_pandas().sort_values("vec_id")
    ids, m, gram, mu, comp = _ref(sf_dir)
    order = np.argsort(ids)
    ref = (m - mu) @ comp
    got = np.stack(df["pc"].to_numpy())
    assert got.shape == (len(m), 2)
    assert np.allclose(got, ref[order], atol=1e-5)
    # top component carries the most variance
    assert got[:, 0].var() >= got[:, 1].var()


def test_label_centroid_sim_diag_and_symmetry(ray_session, sf_dir):
    import ray.data

    from maskmypy_ray.sim.pca import label_centroid_sim

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding", "label"]) \
        .repartition(4)
    df = label_centroid_sim(ds).to_pandas()
    diag = df[df["label_a"] == df["label_b"]]
    assert (diag["cos_micro"].to_numpy() >= 999_999).all()
    off = df[df["label_a"] != df["label_b"]]
    assert (off["cos_micro"].abs().to_numpy() <= 1_000_000).all()
    # partition-count independence (exact integer partials)
    df2 = label_centroid_sim(ds.repartition(11)).to_pandas()
    a = df.sort_values(["label_a", "label_b"]).reset_index(drop=True)
    b = df2.sort_values(["label_a", "label_b"]).reset_index(drop=True)
    assert a.equals(b)


def test_embedding_outliers_exact_rate_and_partition_independence(
        ray_session, sf_dir):
    import ray.data

    from maskmypy_ray.sim.pca import embedding_outliers

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"]) \
        .repartition(4)
    df = embedding_outliers(ds).to_pandas()
    n = len(df)
    # strictly-above-p95 rule flags at most 5% and at least one point
    # unless the top is one big tie run
    assert 0 < int(df["outlier"].sum()) <= n - (19 * (n - 1) // 20 + 1) + 1
    df2 = embedding_outliers(ds.repartition(9)).to_pandas()
    a = df.sort_values("vec_id").reset_index(drop=True)
    b = df2.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)

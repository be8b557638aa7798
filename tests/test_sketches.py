"""HyperLogLog sketch: accuracy, merge/partition invariance, register
arithmetic."""

import numpy as np
import pyarrow as pa


def test_hll_rank_arithmetic():
    from maskmypy_ray.sketches import HLL_MAX_RHO, hll_partial_batch

    b = pa.table({
        "k": pa.array(np.arange(1000), type=pa.int64()),
        "g": pa.array(["x"] * 1000),
    })
    t = hll_partial_batch(b, "k", "g").to_pandas()
    assert t["reg"].between(1, HLL_MAX_RHO).all()
    assert t["bucket"].between(0, 255).all()
    # partial is pre-reduced: at most one row per (group, bucket)
    assert not t.duplicated(["grp", "bucket"]).any()


def test_hll_accuracy_and_partition_invariance(ray_session):
    import ray.data

    from maskmypy_ray.sketches import hll_distinct

    rng = np.random.default_rng(3)
    n, true = 20000, 5000
    t = pa.table({
        "k": pa.array(rng.integers(0, true, n), type=pa.int64()),
        "g": pa.array(np.where(np.arange(n) % 2 == 0, "a", "b")),
    })
    ds = ray.data.from_arrow(t)
    out1 = hll_distinct(ds, "k", "g").to_pandas() \
        .sort_values("grp").reset_index(drop=True)
    out2 = hll_distinct(ds.repartition(13), "k", "g").to_pandas() \
        .sort_values("grp").reset_index(drop=True)
    # sketches merge associatively: identical registers at any split
    assert out1.equals(out2)
    k = t.column("k").to_numpy()
    g = t.column("g").to_numpy(zero_copy_only=False)
    for grp in ("a", "b"):
        exact = len(np.unique(k[g == grp]))
        est = float(out1.set_index("grp").loc[grp, "estimate"])
        # HLL-256 std error is 1.04/sqrt(256) = 6.5%; allow 3 sigma
        assert abs(est - exact) / exact < 0.2


def test_cms_upper_bound_and_partition_invariance(ray_session):
    import ray.data

    from maskmypy_ray.sketches import cms_token_counts

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)] + ["heavy"] * 0
    docs = []
    for i in range(200):
        words = list(rng.choice(vocab, 30)) + ["heavy"] * 5
        docs.append(" ".join(words))
    t = pa.table({
        "doc_id": pa.array(np.arange(len(docs)), type=pa.int64()),
        "text": pa.array(docs),
    })
    ds = ray.data.from_arrow(t)
    probes = ["heavy", "w0", "w1", "absent"]
    out = cms_token_counts(ds, probes).to_pandas().set_index("token")
    exact = {p: sum(d.split().count(p) for d in docs) for p in probes}
    for p in probes:
        est = int(out.loc[p, "est_count"])
        # CMS never underestimates ...
        assert est >= exact[p]
        # ... and overestimates by at most n_tokens/w per row (loose 3x)
        n_tokens = sum(len(d.split()) for d in docs)
        assert est <= exact[p] + 3 * n_tokens / 1024
    # the heavy hitter is estimated exactly-ish and dominates
    assert int(out.loc["heavy", "est_count"]) >= 1000
    out2 = cms_token_counts(ds.repartition(7), probes).to_pandas() \
        .set_index("token")
    assert out2.sort_index().equals(out.sort_index())


def test_source_token_hll_parity_and_accuracy(ray_session, sf_dir):
    """Keyed token HLL equals the DuckDB twin register-for-register,
    and the estimates land near the true per-source vocab sizes."""
    import duckdb
    import ray.data

    from maskmypy_ray.sketches import source_token_hll, source_token_hll_sql

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "text"],
                               override_num_blocks=5)
    eng = source_token_hll(ds).to_pandas() \
        .sort_values("grp").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(source_token_hll_sql()).df() \
        .sort_values("grp").reset_index(drop=True)
    assert eng.equals(orc)
    true = con.execute(
        "SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS d FROM "
        "(SELECT source, unnest(regexp_extract_all(lower(text), "
        "'[a-z0-9]+')) AS tok FROM documents) GROUP BY 1 ORDER BY 1").df()
    rel = (eng["estimate"].to_numpy() - true["d"].to_numpy()) \
        / true["d"].to_numpy()
    assert (abs(rel) < 0.15).all()  # HLL-256 ~ 6.5% standard error


def test_int_histogram_partition_independent_and_total(ray_session, sf_dir):
    import numpy as np
    import ray.data

    from maskmypy_ray.sketches import int_histogram

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["n_chars"])
    a = int_histogram(ds.repartition(3), "n_chars").to_pandas()
    b = int_histogram(ds.repartition(13), "n_chars").to_pandas()
    assert a.equals(b)
    assert int(a["count"].sum()) == ds.count()
    # lo_edge is the smallest value mapping into each bin
    lo = int(a["lo_edge"].iloc[0])
    hi_edge = a["lo_edge"].to_numpy()
    width = None
    import pyarrow.parquet as pq
    v = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["n_chars"]).column("n_chars").to_numpy()
    w = int(v.max()) - int(v.min()) + 1
    for bi in range(1, 64):
        e = int(hi_edge[bi])
        assert (e - int(v.min())) * 64 // w == bi
        assert (e - 1 - int(v.min())) * 64 // w == bi - 1

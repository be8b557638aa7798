"""Round-5: weighted-crossing descent + token-budget corpus cut."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute_crossing(v, w, target):
    """First value (ascending) whose inclusive cumulative weight > target."""
    order = np.argsort(v, kind="stable")
    cum = np.cumsum(w[order])
    hit = np.nonzero(cum > target)[0]
    if len(hit) == 0:
        return None, int(w.sum())
    j = hit[0]
    val = v[order][j]
    before = int(np.sum(w[v < val]))
    return float(val), before


@pytest.mark.parametrize("case", ["uniform", "ties", "zeros", "skew"])
def test_weighted_crossing_matches_brute(ray_session, case):
    import ray.data

    from maskmypy_ray.analysis.aggregates import weighted_crossing_distributed

    rng = np.random.default_rng(5)
    n = 4000
    if case == "uniform":
        v = rng.normal(size=n)
        w = rng.integers(0, 50, size=n)
    elif case == "ties":
        v = rng.integers(0, 7, size=n).astype(np.float64)  # heavy tie runs
        w = rng.integers(0, 9, size=n)
    elif case == "zeros":
        v = rng.normal(size=n)
        w = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 5, size=n))
    else:  # skew: one value holds ~90% of the weight
        v = np.where(rng.random(n) < 0.9, 3.25, rng.normal(size=n))
        w = rng.integers(1, 20, size=n)
    w = w.astype(np.int64)
    total = int(w.sum())
    ds = ray.data.from_arrow(pa.table({"val": v, "w": w})) \
        .repartition(8)
    for target in [0, total // 7, total // 2, total - 1, total, total + 5]:
        got = weighted_crossing_distributed(ds, "val", "w", target,
                                            max_collect=64)
        assert got == _brute_crossing(v, w, target), (case, target)


def test_weighted_crossing_eq_filter(ray_session):
    """The eq= restriction scopes every pass (tie-break second key)."""
    import ray.data

    from maskmypy_ray.analysis.aggregates import weighted_crossing_distributed

    rng = np.random.default_rng(11)
    n = 2000
    grp = rng.integers(0, 3, size=n).astype(np.float64)
    ids = np.arange(n, dtype=np.float64)
    w = rng.integers(0, 6, size=n).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"grp": grp, "doc_id": ids, "w": w})).repartition(4)
    m = grp == 1.0
    target = int(w[m].sum()) // 3
    got = weighted_crossing_distributed(ds, "doc_id", "w", target,
                                        eq=("grp", 1.0), max_collect=32)
    assert got == _brute_crossing(ids[m], w[m], target)


def test_token_budget_cut_matches_window_sql(ray_session, sf_dir):
    """keep == (cumulative n_tokens over ORDER BY score DESC, doc_id
    stays <= total//2) — brute-forced in pandas."""
    import ray.data

    from maskmypy_ray.text.corpus import token_budget_cut

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    out = token_budget_cut(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    ref = out.sort_values(["quality_score", "doc_id"],
                          ascending=[False, True]).copy()
    budget = int(ref["n_tokens"].sum()) // 2
    ref["keep_ref"] = (ref["n_tokens"].cumsum() <= budget).astype(np.int64)
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert out["keep"].tolist() == ref["keep_ref"].tolist()
    assert 0 < out["keep"].sum() < len(out)  # non-vacuous cut


def test_token_budget_cut_tie_boundary(ray_session):
    """Docs tied at the boundary score keep in doc_id order; zero-token
    docs inside the kept prefix stay kept (the SQL prefix rule)."""
    import ray.data

    from maskmypy_ray.text.corpus import token_budget_cut

    # 30 docs with identical text -> identical score and n_tokens=4;
    # plus interleaved empty docs (n_tokens=0, different score).
    ids = list(range(60))
    texts = ["alpha beta gamma delta" if i % 2 == 0 else "" for i in ids]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })).repartition(5)
    out = token_budget_cut(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    ref = out.sort_values(["quality_score", "doc_id"],
                          ascending=[False, True]).copy()
    budget = int(ref["n_tokens"].sum()) // 2
    ref["keep_ref"] = (ref["n_tokens"].cumsum() <= budget).astype(np.int64)
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert out["keep"].tolist() == ref["keep_ref"].tolist()
    # the tie run is genuinely split (some same-score docs kept, some not)
    tied = out[out["n_tokens"] == 4]
    assert 0 < tied["keep"].sum() < len(tied)


@pytest.mark.parametrize("case", ["uniform", "ties", "zeros"])
def test_weighted_quantiles_match_brute(ray_session, case):
    import ray.data

    from maskmypy_ray.analysis.aggregates import (
        weighted_quantiles_distributed,
    )

    rng = np.random.default_rng(11)
    n = 3000
    if case == "uniform":
        v = rng.normal(size=n)
        w = rng.integers(1, 40, size=n)
    elif case == "ties":
        v = rng.integers(0, 5, size=n).astype(np.float64)
        w = rng.integers(1, 9, size=n)
    else:
        v = rng.normal(size=n)
        w = np.where(rng.random(n) < 0.4, 0, rng.integers(1, 6, size=n))
    w = w.astype(np.int64)
    qs = [(0, 1), (1, 10), (1, 2), (3, 4), (99, 100), (1, 1)]
    ds = ray.data.from_arrow(pa.table({"val": v, "w": w})).repartition(7)
    got = weighted_quantiles_distributed(ds, "val", "w", qs, max_collect=48)
    expanded = np.sort(np.repeat(v, w))
    W = int(w.sum())
    want = [float(expanded[(W - 1) * num // den]) for num, den in qs]
    assert got == want, case


def test_perplexity_buckets_terciles(ray_session, sf_dir):
    import ray.data

    from maskmypy_ray.text.lm import perplexity_buckets

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    df = perplexity_buckets(docs).to_pandas().sort_values("nll")
    assert set(df["bucket"].unique()) <= {0, 1, 2}
    # bucket is monotone in nll and each tercile holds >= floor(n/3)
    assert (np.diff(df["bucket"].to_numpy()) >= 0).all()
    n = len(df)
    counts = df["bucket"].value_counts()
    assert int(counts.get(0, 0)) >= n // 3
    assert int(counts.get(0, 0)) + int(counts.get(1, 0)) >= 2 * n // 3


def test_train_split_stability_and_rates(ray_session, sf_dir):
    import ray.data

    from maskmypy_ray.text.corpus import train_split

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    df = train_split(ds, seed=42).to_pandas().sort_values("doc_id")
    assert set(df["split"].unique()) <= {"train", "val", "test"}
    assert (df["bucket"].to_numpy() >= 0).all()
    assert (df["bucket"].to_numpy() < 1000).all()
    # growth stability: the assignment of a doc is independent of which
    # other docs are present (pure per-row hash)
    import pyarrow.compute as pc

    def even_only(b):
        return b.filter(pc.equal(pc.bit_wise_and(b.column("doc_id"), 1), 0))

    half = ds.map_batches(even_only, batch_format="pyarrow")
    dh = train_split(half, seed=42).to_pandas().sort_values("doc_id")
    sub = df[df["doc_id"] % 2 == 0].reset_index(drop=True)
    assert sub.equals(dh.reset_index(drop=True))
    # different seed reshuffles
    d2 = train_split(ds, seed=43).to_pandas().sort_values("doc_id")
    assert (d2["bucket"].to_numpy() != df["bucket"].to_numpy()).any()

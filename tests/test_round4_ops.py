"""Round-4 operators: URL canonicalization/dedup, TF-IDF keywords,
per-source Tukey outlier flags. Brute-force / property twins of the
driver's SQL oracles."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest


def test_canonical_url_rules():
    from maskmypy_ray.text.corpus import canonical_url_batch

    raw = pa.table({"raw_url": pa.array([
        "HTTPS://Src0.Example.ORG/page/1?utm_source=feed&utm_medium=rss",
        "https://a.example.org/page/2#top",
        "https://a.example.org/page/3/",
        "https://a.example.org/page/4///",
        "https://a.example.org/Page/5",          # path case preserved
        "http://b.example.org/page/6?x=1#y",
    ])})
    out = canonical_url_batch(raw).column("canonical_url").to_pylist()
    assert out == [
        "https://src0.example.org/page/1",
        "https://a.example.org/page/2",
        "https://a.example.org/page/3",
        "https://a.example.org/page/4",
        "https://a.example.org/Page/5",
        "http://b.example.org/page/6",
    ]


def test_url_fetches_refetch_rule():
    from maskmypy_ray.text.corpus import url_fetches_batch

    ids = list(range(12))
    pages = pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "url": pa.array([f"https://s.example.org/page/{i}" for i in ids]),
    })
    out = url_fetches_batch(pages)
    fid = out.column("fetch_id").to_pylist()
    # one fetch per doc plus a refetch for every doc_id % 5 == 0
    assert len(fid) == 12 + 3
    assert sorted(f for f in fid if f % 2 == 1) == [1, 11, 21]


def test_url_dedup_keeps_first_fetch(ray_session, sf_dir):
    from maskmypy_ray.sources.webpages import read_webpages
    from maskmypy_ray.text.corpus import url_dedup

    res = url_dedup(read_webpages(sf_dir, seed=42, include_html=False)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # every canonical URL is unique per page here, so survivors == pages
    assert res["canonical_url"].is_unique
    # the winner is always the FIRST fetch (even fetch_id)
    assert (res["kept_fetch_id"] % 2 == 0).all()
    # refetched pages collapse 2 -> 1
    refetched = res["doc_id"] % 5 == 0
    assert (res.loc[refetched, "n_fetches"] == 2).all()
    assert (res.loc[~refetched, "n_fetches"] == 1).all()


def test_tfidf_topk_matches_bruteforce(ray_session):
    import ray.data

    from maskmypy_ray.text.dedup import TOKEN_RE
    from maskmypy_ray.text.lm import tfidf_topk

    docs = ["the cat sat on the mat", "the dog ate the cat food dog dog",
            "parquet shuffle merge sort", "", "cat cat cat"]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(5), type=pa.int64()),
        "text": pa.array(docs)}))
    res = tfidf_topk(ds, k=2).to_pandas()

    # brute force
    toks = [TOKEN_RE.findall(t.lower()) for t in docs]
    df: dict[str, int] = {}
    for ts in toks:
        for w in set(ts):
            df[w] = df.get(w, 0) + 1
    n = len(docs)
    expected = {}
    for i, ts in enumerate(toks):
        scores = {}
        for w in set(ts):
            idf = math.floor(1e6 * math.log(n / df[w]))
            scores[w] = ts.count(w) * idf
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
        for r, (w, s) in enumerate(top, 1):
            expected[(i, r)] = (w, s)
    got = {(int(r.doc_id), int(r.rank)): (r.token, int(r.score_micro))
           for r in res.itertuples()}
    assert got == expected


def test_outlier_flags_bruteforce(ray_session):
    import ray.data

    from maskmypy_ray.text.quality import source_outlier_flags

    rng = np.random.default_rng(7)
    n = 400
    src = np.array(["a", "b", "c"])[rng.integers(0, 3, n)]
    x = rng.integers(10, 1000, n).astype(np.int64)
    x[::97] = 100_000  # inject high outliers
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "source": pa.array(src), "n_chars": pa.array(x)}))
    res = source_outlier_flags(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    for s in ["a", "b", "c"]:
        v = np.sort(x[src == s])
        q25 = int(v[int(np.floor(0.25 * (len(v) - 1)))])
        q75 = int(v[int(np.floor(0.75 * (len(v) - 1)))])
        sub = res[res["source"] == s]
        exp = np.zeros(len(sub), dtype=np.int64)
        xs = sub["n_chars"].to_numpy()
        exp[2 * xs < 5 * q25 - 3 * q75] = -1
        exp[2 * xs > 5 * q75 - 3 * q25] = 1
        assert (sub["flag"].to_numpy() == exp).all()
    assert (res["flag"] == 1).sum() >= 4  # injected outliers flagged


def test_bm25_length_normalization(ray_session):
    """Two docs with the same tf of a rare term: the shorter doc must
    score it higher (the document-length normalization TF-IDF lacks)."""
    import ray.data

    from maskmypy_ray.text.lm import bm25_topk

    filler = " ".join(f"common{i % 7}" for i in range(200))
    rows = [
        {"doc_id": 1, "text": "zebra quick brown"},
        {"doc_id": 2, "text": "zebra " + filler},
        {"doc_id": 3, "text": filler},
    ]
    res = bm25_topk(ray.data.from_items(rows), k=10).to_pandas()
    z = res[res["token"] == "zebra"].set_index("doc_id")["score_micro"]
    assert z.loc[1] > z.loc[2] > 0


def test_bm25_partition_independent(ray_session, sf_dir):
    """Scores identical at 1 and 5 blocks (global S/N/df are exact
    aggregates; the per-batch kernel is stateless)."""
    import ray.data

    from maskmypy_ray.text.lm import bm25_topk

    def run(nb):
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"],
                                   override_num_blocks=nb)
        return bm25_topk(ds).to_pandas() \
            .sort_values(["doc_id", "rank"]).reset_index(drop=True)

    assert run(1).equals(run(5))


def test_bm25_oracle_parity(ray_session, sf_dir):
    """Engine equals the DuckDB integer-rational twin bit-for-bit."""
    import duckdb
    import ray.data

    from maskmypy_ray.pipelines import _bm25_sql
    from maskmypy_ray.text.lm import bm25_topk

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    eng = bm25_topk(ds).to_pandas() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(_bm25_sql()).df() \
        .sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert eng["doc_id"].tolist() == orc["doc_id"].tolist()
    assert eng["token"].tolist() == orc["token"].tolist()
    assert eng["score_micro"].tolist() == orc["score_micro"].tolist()

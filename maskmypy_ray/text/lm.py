"""Unigram language-model quality scoring (KenLM-style filter shape).

The standard model-based curation filter scores each doc by its mean
negative log-probability under a corpus-level language model; docs far
from the corpus distribution (gibberish, boilerplate, wrong language)
score high and get dropped. This is the unigram instance: two passes,

1. **Train**: token counts via per-batch partial aggregation + one
   ``groupby(token).sum``; the vocabulary = top-``top_v`` tokens by
   (count desc, token asc) via a distributed sort + limit. N = total
   token count (all tokens, not just the vocab).
2. **Score**: the vocab (≤ ``top_v`` rows) is broadcast; each batch
   maps its tokens through it vectorized (pandas factorize + numpy
   take) — out-of-vocabulary tokens get count 1 (floor).

Exactness trick: per-token contributions are quantized to int64 as
``floor(1e6 * ln(c / N))`` BEFORE the per-doc sum, so the sum is
order-independent integer arithmetic and the final score
``-sum / (1e6 * n)`` is one exact float division — the DuckDB oracle
reproduces it bit-for-bit (both sides call the same libm ``ln``; the
1e-6 quantization absorbs any sub-ulp disagreement except on exact
boundaries, which the fixture corpus does not hit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import TOKEN_RE

TOP_V = 4096
_Q = 1_000_000  # log quantization (1e-6 nats)


def token_counts(ds, text_col: str = "text"):
    """(tok, c) global token counts — partial per batch, one groupby."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in b.column(text_col).to_pylist():
            toks.extend(TOKEN_RE.findall(t.lower()))
        if not toks:
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        u, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table({"tok": pa.array(u, type=pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("c", alias_name="c"))


def unigram_logprob(ds, top_v: int = TOP_V, text_col: str = "text"):
    """Per-doc unigram NLL: ``(doc_id, n_tokens, nll)`` with
    nll = -mean over tokens of quantized ln(count/N) (0.0 for empty
    docs). OOV tokens score as count 1."""
    import ray
    from ray.data.aggregate import Sum

    counts = token_counts(ds, text_col).materialize()
    total = int(counts.aggregate(Sum("c"))["sum(c)"] or 0)
    vocab_rows = counts.sort(["c", "tok"], descending=[True, False]) \
        .limit(top_v).take_all()
    vocab = {r["tok"]: int(r["c"]) for r in vocab_rows}
    vocab_ref = ray.put(vocab)
    n_total = max(total, 1)

    def score(b: pa.Table) -> pa.Table:
        v: dict = ray.get(vocab_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        flat: list[str] = []
        bounds = [0]
        for t in b.column(text_col).to_pylist():
            flat.extend(TOKEN_RE.findall(t.lower()))
            bounds.append(len(flat))
        bounds = np.asarray(bounds, dtype=np.int64)
        n_out = np.diff(bounds)
        s_out = np.zeros(len(ids), dtype=np.int64)
        if flat:
            # vocab lookups once per DISTINCT token in the batch, then a
            # vectorized gather + segment sum
            codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
            cu = np.array([v.get(u, 1) for u in uniq], dtype=np.float64)
            lu = np.floor(_Q * np.log(cu / n_total)).astype(np.int64)
            li = lu[codes]
            nz = n_out > 0
            s_out[nz] = np.add.reduceat(li, bounds[:-1][nz])
        nll = np.where(n_out > 0, -s_out / (_Q * np.maximum(n_out, 1)), 0.0)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n_out),
            "nll": pa.array(nll, type=pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def filter_by_nll(ds, q: float = 0.9, top_v: int = TOP_V,
                  text_col: str = "text"):
    """Quality-filter by LM score: keep docs whose unigram NLL is at or
    below the corpus q-quantile (drop the worst (1-q) tail — the
    standard perplexity-percentile cut). The threshold is the exact
    lower order statistic from the distributed quantile kernel, so the
    cut is reproducible in SQL bit-for-bit.

    Returns (doc_id, n_tokens, nll) of the kept docs."""
    from ..analysis.aggregates import exact_quantiles_distributed

    scored = unigram_logprob(ds, top_v=top_v, text_col=text_col) \
        .materialize()
    thr = exact_quantiles_distributed(scored, "nll", [q],
                                      max_collect=1_000_000)[0]
    return scored.filter(expr=f"nll <= {thr!r}")


def perplexity_buckets(ds, top_v: int = TOP_V, text_col: str = "text"):
    """CCNet-style perplexity bucketing: assign every doc to the
    head (0) / middle (1) / tail (2) tercile of the corpus unigram-NLL
    distribution (the standard "keep head, maybe middle, drop tail"
    LM-quality partition — unlike :func:`filter_by_nll` all docs are
    kept and labeled, so downstream mixes can weight buckets).

    Thresholds are the exact lower order statistics at 1/3 and 2/3
    from the distributed quantile kernel (both descend together in
    shared histogram passes); the labeling itself is one stateless
    broadcast-scalar pass. Returns (doc_id, n_tokens, nll, bucket).
    """
    import pyarrow as pa

    from ..analysis.aggregates import exact_quantiles_distributed

    scored = unigram_logprob(ds, top_v=top_v, text_col=text_col) \
        .materialize()
    t1, t2 = exact_quantiles_distributed(scored, "nll", [1 / 3, 2 / 3],
                                         max_collect=1_000_000)

    def label(b: pa.Table, t1=t1, t2=t2) -> pa.Table:
        nll = b.column("nll").to_numpy(zero_copy_only=False)
        bucket = np.where(nll <= t1, 0, np.where(nll <= t2, 1, 2))
        return b.append_column("bucket",
                               pa.array(bucket.astype(np.int64)))

    return scored.map_batches(label, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (feature-extraction twin of the unigram LM)
# ---------------------------------------------------------------------------


def doc_freqs(ds, text_col: str = "text"):
    """(tok, df) corpus document frequencies — distinct tokens per doc
    inside each batch (a doc lives in exactly one block, so per-batch
    distinct is exact), partial counts, one ``groupby(token).sum``."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        for t in b.column(text_col).to_pylist():
            toks.extend(set(TOKEN_RE.findall(t.lower())))
        if not toks:
            return pa.table({"tok": pa.array([], type=pa.string()),
                             "df": pa.array([], type=pa.int64())})
        u, cnt = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        return pa.table({"tok": pa.array(u, type=pa.string()),
                         "df": pa.array(cnt.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("df", alias_name="df"))


def tfidf_topk(ds, k: int = 3, top_v: int = TOP_V, text_col: str = "text"):
    """Top-``k`` TF-IDF keywords per doc: ``(doc_id, rank, token,
    score_micro)``, rank 1..k by (score desc, token asc), docs with
    fewer distinct tokens emit fewer rows.

    Scores are exact int64: ``tf * floor(1e6 * ln(n_docs / df))`` with
    the idf quantized per distinct token BEFORE the multiply (the same
    order-independence trick as the unigram LM). The df vocabulary is
    the top-``top_v`` tokens by (df desc, token asc), broadcast once;
    out-of-vocabulary tokens take df = 1 (max idf) — the bounded-state
    cap that keeps the broadcast side O(top_v) at 100 TB."""
    import ray

    dfs = doc_freqs(ds, text_col).materialize()
    n_docs = ds.count()
    vocab_rows = dfs.sort(["df", "tok"], descending=[True, False]) \
        .limit(top_v).take_all()
    vocab = {r["tok"]: int(r["df"]) for r in vocab_rows}
    vocab_ref = ray.put(vocab)
    n = max(int(n_docs), 1)

    def score(b: pa.Table) -> pa.Table:
        v: dict = ray.get(vocab_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        flat: list[str] = []
        bounds = [0]
        for t in b.column(text_col).to_pylist():
            flat.extend(TOKEN_RE.findall(t.lower()))
            bounds.append(len(flat))
        if not flat:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "rank": pa.array([], type=pa.int64()),
                             "token": pa.array([], type=pa.string()),
                             "score_micro": pa.array([], type=pa.int64())})
        bounds = np.asarray(bounds, dtype=np.int64)
        seg = np.repeat(np.arange(len(ids), dtype=np.int64),
                        np.diff(bounds))
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        dfu = np.array([v.get(u, 1) for u in uniq], dtype=np.float64)
        idf = np.floor(_Q * np.log(n / dfu)).astype(np.int64)
        # tf per (doc, token): composite-key unique (codes < len(uniq))
        V = len(uniq)
        uk, tf = np.unique(seg * np.int64(V) + codes, return_counts=True)
        d = uk // V
        c = (uk % V).astype(np.int64)
        sc = tf.astype(np.int64) * idf[c]
        g = pd.DataFrame({"d": d, "token": uniq[c], "score_micro": sc})
        g = g.sort_values(["d", "score_micro", "token"],
                          ascending=[True, False, True], kind="mergesort")
        g["rank"] = g.groupby("d", sort=False).cumcount() + 1
        g = g[g["rank"] <= k]
        return pa.table({
            "doc_id": pa.array(ids[g["d"].to_numpy()], type=pa.int64()),
            "rank": pa.array(g["rank"].to_numpy().astype(np.int64)),
            "token": pa.array(g["token"].to_numpy(), type=pa.string()),
            "score_micro": pa.array(g["score_micro"].to_numpy()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25 keyword extraction (retrieval-grade twin of TF-IDF)
# ---------------------------------------------------------------------------

# Okapi BM25 constants as exact rationals: k1 = 12/10, b = 75/100.
BM25_K1_X10 = 12
BM25_B_X100 = 75


def _total_tokens(ds, text_col: str = "text") -> int:
    """Global token count S — per-batch partial scalar, one tiny sum."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        n = sum(len(TOKEN_RE.findall(t.lower()))
                for t in b.column(text_col).to_pylist())
        return pa.table({"s": pa.array([n], type=pa.int64())})

    out = ds.map_batches(partial, batch_format="pyarrow").aggregate(Sum("s"))
    return int(out["sum(s)"] or 0)


# Sentinel df-key for the fused global token count: real tokens match
# TOKEN_RE ([a-z0-9]+ lowercase), so a tab-prefixed key cannot collide.
_TOTAL_KEY = "\ttotal"


def _doc_freqs_and_total(ds, text_col: str = "text"):
    """(df table materialized, S): document frequencies AND the global
    token count from ONE tokenize pass — each batch's partial rows
    carry a ``_TOTAL_KEY`` sentinel row whose df column holds the
    batch's total token count, summed by the same ``groupby(token)``.
    At corpus scale this halves the train-side read+tokenize cost vs
    running :func:`doc_freqs` and :func:`_total_tokens` separately."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        toks: list[str] = []
        total = 0
        for t in b.column(text_col).to_pylist():
            tt = TOKEN_RE.findall(t.lower())
            total += len(tt)
            toks.extend(set(tt))
        u, cnt = (np.unique(np.asarray(toks, dtype=object),
                            return_counts=True)
                  if toks else (np.array([], dtype=object),
                                np.array([], dtype=np.int64)))
        return pa.table({
            "tok": pa.array(np.concatenate([u, [_TOTAL_KEY]]),
                            type=pa.string()),
            "df": pa.array(np.concatenate(
                [cnt.astype(np.int64), [total]]).astype(np.int64)),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("tok").aggregate(Sum("df", alias_name="df")).materialize()
    total_row = agg.filter(expr=f"tok == {_TOTAL_KEY!r}").take_all()
    s_tot = int(total_row[0]["df"]) if total_row else 0
    return agg.filter(expr=f"tok != {_TOTAL_KEY!r}"), s_tot


def bm25_topk(ds, k: int = 3, top_v: int = TOP_V, text_col: str = "text"):
    """Top-``k`` Okapi-BM25 keywords per doc: ``(doc_id, rank, token,
    score_micro)`` — TF-IDF's retrieval-grade sibling with document-
    length normalization (long docs stop winning on raw tf).

    Exactness: with k1=1.2, b=0.75 the whole score is one integer
    rational. Let S = total corpus tokens, N = doc count, dl = this
    doc's token count; then

        tfnorm = tf*(k1+1) / (tf + k1*(1 - b + b*dl*N/S))
               = 22*tf*S / (10*tf*S + 3*S + 9*dl*N)      (exact int64)
        score_micro = (idf_micro * 22*tf*S) // (10*tf*S + 3*S + 9*dl*N)

    with ``idf_micro = floor(1e6 * ln(1 + (N-df+0.5)/(df+0.5)))``
    quantized per distinct token (the same order-independence recipe
    as TF-IDF), so the DuckDB oracle is bit-exact. int64 headroom:
    idf_micro*22*tf*S < 2^63 holds through ~1e8-token corpora at this
    fixture's tf range; beyond that the quantized products need a
    wider accumulator (asserted below, not silently wrapped).

    Scale shape mirrors :func:`tfidf_topk`: df vocabulary capped at
    ``top_v`` rows broadcast once (OOV df = 1 -> max idf), one
    stateless vectorized scoring pass, no shuffle."""
    import ray

    dfs, s_tot = _doc_freqs_and_total(ds, text_col)
    s_tot = max(s_tot, 1)
    n_docs = ds.count()
    vocab_rows = dfs.sort(["df", "tok"], descending=[True, False]) \
        .limit(top_v).take_all()
    vocab = {r["tok"]: int(r["df"]) for r in vocab_rows}
    vocab_ref = ray.put(vocab)
    n = max(int(n_docs), 1)

    def score(b: pa.Table) -> pa.Table:
        v: dict = ray.get(vocab_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        flat: list[str] = []
        bounds = [0]
        for t in b.column(text_col).to_pylist():
            flat.extend(TOKEN_RE.findall(t.lower()))
            bounds.append(len(flat))
        empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                          "rank": pa.array([], type=pa.int64()),
                          "token": pa.array([], type=pa.string()),
                          "score_micro": pa.array([], type=pa.int64())})
        if not flat:
            return empty
        bounds = np.asarray(bounds, dtype=np.int64)
        dl_per_doc = np.diff(bounds)
        seg = np.repeat(np.arange(len(ids), dtype=np.int64), dl_per_doc)
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        dfu = np.array([v.get(u, 1) for u in uniq], dtype=np.float64)
        idf = np.floor(_Q * np.log(1.0 + (n - dfu + 0.5) / (dfu + 0.5))) \
            .astype(np.int64)
        V = len(uniq)
        uk, tf = np.unique(seg * np.int64(V) + codes, return_counts=True)
        d = uk // V
        c = (uk % V).astype(np.int64)
        tf = tf.astype(np.int64)
        dl = dl_per_doc[d]
        num = idf[c] * 22 * tf * s_tot
        assert num.size == 0 or num.max() < (1 << 62), \
            "bm25 int64 headroom exceeded; widen the accumulator"
        den = 10 * tf * s_tot + 3 * s_tot + 9 * dl * n
        sc = num // den
        g = pd.DataFrame({"d": d, "token": uniq[c], "score_micro": sc})
        g = g.sort_values(["d", "score_micro", "token"],
                          ascending=[True, False, True], kind="mergesort")
        g["rank"] = g.groupby("d", sort=False).cumcount() + 1
        g = g[g["rank"] <= k]
        return pa.table({
            "doc_id": pa.array(ids[g["d"].to_numpy()], type=pa.int64()),
            "rank": pa.array(g["rank"].to_numpy().astype(np.int64)),
            "token": pa.array(g["token"].to_numpy(), type=pa.string()),
            "score_micro": pa.array(g["score_micro"].to_numpy()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Bigram LM scoring with stupid backoff (KenLM-shaped upgrade of the
# unigram filter: context-aware perplexity is the CCNet-style signal)
# ---------------------------------------------------------------------------

# floor(1e6 * ln(0.4)) — the stupid-backoff penalty as a quantized
# constant, mirrored verbatim into the SQL twin.
BACKOFF_MICRO = int(np.floor(_Q * np.log(0.4)))


def bigram_counts(ds, text_col: str = "text"):
    """(bg, c) global adjacent-bigram counts (key = ``w1 || ' ' || w2``;
    tokens contain no spaces, so the join is bijective) — partial per
    batch, one ``groupby(bg)``."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        bgs: list[str] = []
        for t in b.column(text_col).to_pylist():
            toks = TOKEN_RE.findall(t.lower())
            bgs.extend(a + " " + bb for a, bb in zip(toks, toks[1:]))
        if not bgs:
            return pa.table({"bg": pa.array([], type=pa.string()),
                             "c": pa.array([], type=pa.int64())})
        u, cnt = np.unique(np.asarray(bgs, dtype=object), return_counts=True)
        return pa.table({"bg": pa.array(u, type=pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bg").aggregate(Sum("c", alias_name="c"))


def bigram_logprob(ds, top_v: int = TOP_V, text_col: str = "text"):
    """Per-doc bigram-LM NLL with stupid backoff: ``(doc_id, n_tokens,
    nll)`` where n_tokens counts the doc's ADJACENT BIGRAMS and

        term(w1, w2) = floor(Q·ln(c_bi / c_uni(w1)))      (bigram in vocab)
                     = BACKOFF_MICRO
                       + floor(Q·ln(c_uni(w2) / N))       (backoff)

    with both vocabularies capped at ``top_v`` rows (OOV count = 1) and
    every term quantized per DISTINCT bigram/token before the per-doc
    integer sum — the unigram filter's order-independence recipe, so
    the DuckDB twin is bit-exact. Docs with < 2 tokens score 0.0.

    Scale shape: two count passes (unigram reuses :func:`token_counts`)
    each ending in one bounded ``groupby``; the two top-``top_v``
    vocabularies broadcast once; one stateless scoring pass."""
    import ray
    from ray.data.aggregate import Sum

    uni = token_counts(ds, text_col).materialize()
    total = int(uni.aggregate(Sum("c"))["sum(c)"] or 0)
    n_total = max(total, 1)
    uni_rows = uni.sort(["c", "tok"], descending=[True, False]) \
        .limit(top_v).take_all()
    bi_rows = bigram_counts(ds, text_col) \
        .sort(["c", "bg"], descending=[True, False]).limit(top_v).take_all()
    vocab_ref = ray.put((
        {r["tok"]: int(r["c"]) for r in uni_rows},
        {r["bg"]: int(r["c"]) for r in bi_rows}))

    def score(b: pa.Table) -> pa.Table:
        v_uni, v_bi = ray.get(vocab_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        flat: list[str] = []
        bounds = [0]
        for t in b.column(text_col).to_pylist():
            flat.extend(TOKEN_RE.findall(t.lower()))
            bounds.append(len(flat))
        bounds = np.asarray(bounds, dtype=np.int64)
        n_tok = np.diff(bounds)
        n_bg = np.maximum(n_tok - 1, 0)
        sums = np.zeros(len(ids), dtype=np.int64)
        if len(flat) >= 2:
            doc_of = np.repeat(np.arange(len(ids), dtype=np.int64), n_tok)
            valid = doc_of[:-1] == doc_of[1:]
            w1 = np.asarray(flat[:-1], dtype=object)[valid]
            w2 = np.asarray(flat[1:], dtype=object)[valid]
            seg = doc_of[:-1][valid]
            bgs = np.asarray([a + " " + bb for a, bb in zip(w1, w2)],
                             dtype=object)
            # quantize per DISTINCT bigram, then gather
            codes, uniq = pd.factorize(bgs)
            u1 = np.asarray([u.split(" ", 1)[0] for u in uniq], dtype=object)
            u2 = np.asarray([u.split(" ", 1)[1] for u in uniq], dtype=object)
            cb = np.array([v_bi.get(u, 0) for u in uniq], dtype=np.int64)
            c1 = np.array([v_uni.get(u, 1) for u in u1], dtype=np.float64)
            c2 = np.array([v_uni.get(u, 1) for u in u2], dtype=np.float64)
            in_bi = cb > 0
            term = np.empty(len(uniq), dtype=np.int64)
            if in_bi.any():
                term[in_bi] = np.floor(_Q * np.log(
                    cb[in_bi].astype(np.float64) / c1[in_bi])) \
                    .astype(np.int64)
            if (~in_bi).any():
                term[~in_bi] = BACKOFF_MICRO + np.floor(_Q * np.log(
                    c2[~in_bi] / n_total)).astype(np.int64)
            np.add.at(sums, seg, term[codes])
        nll = np.where(n_bg > 0, -sums / (_Q * np.maximum(n_bg, 1)), 0.0)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n_bg),
            "nll": pa.array(nll, type=pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25 retrieval (query-set search over the corpus — the serving twin of
# the bm25_topk keyword extractor)
# ---------------------------------------------------------------------------

#: deterministic default query set over the fixture vocabulary
DEFAULT_SEARCH_QUERIES = (
    "spark join order",
    "window batch stream",
    "hash merge sort table",
    "slow query filter",
    "vector data row column",
)


def bm25_search(ds, queries: tuple = DEFAULT_SEARCH_QUERIES, k: int = 10,
                top_v: int = TOP_V, text_col: str = "text"):
    """Top-``k`` docs per query by Okapi BM25: ``(query_id, rank,
    doc_id, score_micro)``, rank 1..k by (score desc, doc_id asc);
    only docs containing at least one query term participate.

    A doc's score for a query is the integer-rational BM25 sum over
    the query's DISTINCT terms (query tf ignored, the standard Okapi
    form), bit-exact in SQL via the :func:`bm25_topk` recipe.

    Scale shape: the query-term table and the capped df vocabulary are
    broadcast once; each batch scores its docs against every query
    vectorized and emits only its PARTIAL top-k per query (shuffle
    capped at k rows x queries x batches); the final per-query head-k
    is a tiny ``groupby(query_id).map_groups`` (few, small groups)."""
    import ray

    dfs, s_tot = _doc_freqs_and_total(ds, text_col)
    s_tot = max(s_tot, 1)
    n = max(int(ds.count()), 1)
    vocab_rows = dfs.sort(["df", "tok"], descending=[True, False]) \
        .limit(top_v).take_all()
    vocab = {r["tok"]: int(r["df"]) for r in vocab_rows}
    qterms = [sorted(set(TOKEN_RE.findall(q.lower()))) for q in queries]
    # term -> query ids that contain it (the tiny broadcast side)
    term_qids: dict[str, list[int]] = {}
    for qi, ts in enumerate(qterms):
        for t in ts:
            term_qids.setdefault(t, []).append(qi)
    state_ref = ray.put((vocab, term_qids))

    empty = pa.table({"query_id": pa.array([], type=pa.int64()),
                      "doc_id": pa.array([], type=pa.int64()),
                      "score_micro": pa.array([], type=pa.int64())})

    def score(b: pa.Table) -> pa.Table:
        v, tq = ray.get(state_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        flat: list[str] = []
        bounds = [0]
        for t in b.column(text_col).to_pylist():
            flat.extend(TOKEN_RE.findall(t.lower()))
            bounds.append(len(flat))
        if not flat:
            return empty
        bounds = np.asarray(bounds, dtype=np.int64)
        dl_per_doc = np.diff(bounds)
        seg = np.repeat(np.arange(len(ids), dtype=np.int64), dl_per_doc)
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        in_q = np.array([u in tq for u in uniq], dtype=bool)
        if not in_q.any():
            return empty
        keep = in_q[codes]
        seg_k, codes_k = seg[keep], codes[keep]
        V = len(uniq)
        uk, tf = np.unique(seg_k * np.int64(V) + codes_k, return_counts=True)
        d = uk // V
        c = (uk % V).astype(np.int64)
        tf = tf.astype(np.int64)
        dfu = np.array([v.get(u, 1) for u in uniq], dtype=np.float64)
        idf = np.floor(_Q * np.log(1.0 + (n - dfu + 0.5) / (dfu + 0.5))) \
            .astype(np.int64)
        num = idf[c] * 22 * tf * s_tot
        assert num.size == 0 or num.max() < (1 << 62), \
            "bm25 int64 headroom exceeded; widen the accumulator"
        den = 10 * tf * s_tot + 3 * s_tot + 9 * dl_per_doc[d] * n
        sc = num // den
        # fan each (doc, term) score out to the term's queries, then
        # sum per (query, doc) — both sides tiny (terms ~ tens)
        q_out, d_out, s_out = [], [], []
        for qi_list, di, si in zip((tq[uniq[j]] for j in c), d, sc):
            for qi in qi_list:
                q_out.append(qi)
                d_out.append(int(ids[di]))
                s_out.append(int(si))
        if not q_out:
            return empty
        g = pd.DataFrame({"query_id": q_out, "doc_id": d_out,
                          "score_micro": s_out})
        g = g.groupby(["query_id", "doc_id"], as_index=False,
                      sort=False)["score_micro"].sum()
        # partial top-k per query inside the batch
        g = g.sort_values(["query_id", "score_micro", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        g = g[g.groupby("query_id", sort=False).cumcount() < k]
        return pa.table({
            "query_id": pa.array(g["query_id"].to_numpy().astype(np.int64)),
            "doc_id": pa.array(g["doc_id"].to_numpy().astype(np.int64)),
            "score_micro": pa.array(
                g["score_micro"].to_numpy().astype(np.int64)),
        })

    def head_k(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score_micro", "doc_id"],
                          ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "doc_id", "score_micro"]]

    return ds.map_batches(score, batch_format="pyarrow") \
        .groupby("query_id").map_groups(head_k, batch_format="pandas")


def bm25_search_sql(queries: tuple = DEFAULT_SEARCH_QUERIES, k: int = 10,
                    top_v: int = TOP_V) -> str:
    """DuckDB twin of :func:`bm25_search` over the documents view."""
    qrows = ", ".join(
        f"({i}, '{q}')" for i, q in enumerate(queries))
    return f"""WITH qs(query_id, qtext) AS (SELECT * FROM (VALUES {qrows})),
qt AS (SELECT query_id,
              unnest(list_distinct(regexp_extract_all(lower(qtext),
                                                      '[a-z0-9]+'))) AS tok
       FROM qs),
tl AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
       FROM documents),
tot AS (SELECT CAST(sum(len(l)) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n FROM tl),
tok AS (SELECT doc_id, unnest(l) AS tok FROM tl),
df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
       FROM tok GROUP BY tok),
vocab AS (SELECT tok, df FROM df ORDER BY df DESC, tok LIMIT {top_v}),
tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
       FROM tok WHERE tok IN (SELECT tok FROM qt) GROUP BY doc_id, tok),
dl AS (SELECT doc_id, CAST(len(l) AS BIGINT) AS dl FROM tl),
sc AS (
  SELECT t.doc_id, t.tok,
    (CAST(floor(1000000 * ln(1 + (tot.n - COALESCE(v.df, 1) + 0.5)
                                 / (COALESCE(v.df, 1) + 0.5))) AS BIGINT)
     * 22 * t.tf * tot.s)
    // (10 * t.tf * tot.s + 3 * tot.s + 9 * d.dl * tot.n) AS score_micro
  FROM tf t JOIN dl d USING (doc_id) CROSS JOIN tot
  LEFT JOIN vocab v ON t.tok = v.tok),
qd AS (
  SELECT q.query_id, s.doc_id,
         CAST(sum(s.score_micro) AS BIGINT) AS score_micro
  FROM sc s JOIN qt q USING (tok) GROUP BY 1, 2),
rk AS (SELECT *, row_number() OVER
         (PARTITION BY query_id ORDER BY score_micro DESC, doc_id) AS rank
       FROM qd)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       doc_id, score_micro
FROM rk WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# Zipf fit (corpus-health diagnostic over the token frequency curve)
# ---------------------------------------------------------------------------


def zipf_fit(ds, top_v: int = TOP_V, text_col: str = "text"):
    """Least-squares slope of log(count) vs log(rank) over the top-V
    token frequencies — the Zipf exponent, a standard corpus-health
    diagnostic (natural text ~ -1; boilerplate-heavy or synthetic
    corpora drift off). Returns one row ``(n_tokens_fit, slope,
    intercept)`` (slope/intercept in nats, rounded 6 dp).

    Exactness: x = floor(1e6 ln(rank)), y = floor(1e6 ln(count)) are
    quantized per point BEFORE the sums, so Sx/Sy/Sxx/Sxy are
    order-independent int64 arithmetic and the closed-form division is
    one exact float op — bit-reproducible in SQL. int64 headroom:
    V * (1e6 * ln(2^63))^2 < 2^63 holds for V <= ~4700 at this
    quantization (asserted).

    Scale shape: reuses the distributed token-count pass (partials +
    one groupby) and the sort+limit vocabulary; the regression itself
    touches top_v rows."""
    counts = token_counts(ds, text_col)
    rows = counts.sort(["c", "tok"], descending=[True, False]) \
        .limit(top_v).take_all()
    c = np.array([int(r["c"]) for r in rows], dtype=np.int64)
    v = len(c)
    if v < 2:
        return pa.table({
            "n_tokens_fit": pa.array([v], type=pa.int64()),
            "slope": pa.array([0.0], type=pa.float64()),
            "intercept": pa.array([0.0], type=pa.float64()),
        })
    rank = np.arange(1, v + 1, dtype=np.float64)
    x = np.floor(_Q * np.log(rank)).astype(np.int64)
    y = np.floor(_Q * np.log(c.astype(np.float64))).astype(np.int64)
    assert int(np.abs(x * y).max()) < (1 << 62) // max(v, 1), \
        "zipf int64 headroom exceeded; lower top_v"
    sx, sy = int(x.sum()), int(y.sum())
    sxx, sxy = int((x * x).sum()), int((x * y).sum())
    den = v * sxx - sx * sx
    slope = (v * sxy - sx * sy) / den if den else 0.0
    intercept = (sy - slope * sx) / v / _Q
    return pa.table({
        "n_tokens_fit": pa.array([v], type=pa.int64()),
        "slope": pa.array([round(slope, 6)], type=pa.float64()),
        "intercept": pa.array([round(intercept, 6)], type=pa.float64()),
    })


def zipf_fit_sql(top_v: int = TOP_V) -> str:
    """DuckDB twin of :func:`zipf_fit` over the documents view — same
    quantized sums, same closed form, same rounding."""
    return f"""WITH tl AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS l
  FROM documents),
tok AS (SELECT unnest(l) AS tok FROM tl),
tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY tok),
top AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rank
        FROM tc ORDER BY c DESC, tok LIMIT {top_v}),
q AS (SELECT CAST(floor(1000000 * ln(CAST(rank AS DOUBLE))) AS BIGINT) AS x,
             CAST(floor(1000000 * ln(CAST(c AS DOUBLE))) AS BIGINT) AS y
      FROM top),
s AS (SELECT CAST(count(*) AS BIGINT) AS v, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy FROM q)
SELECT v AS n_tokens_fit,
       round(CASE WHEN v * sxx - sx * sx != 0
                  THEN CAST(v * sxy - sx * sy AS DOUBLE)
                       / (v * sxx - sx * sx) ELSE 0.0 END, 6) AS slope,
       round((CAST(sy AS DOUBLE)
              - (CASE WHEN v * sxx - sx * sx != 0
                      THEN CAST(v * sxy - sx * sy AS DOUBLE)
                           / (v * sxx - sx * sx) ELSE 0.0 END)
                * CAST(sx AS DOUBLE)) / v / 1000000, 6) AS intercept
FROM s"""


def source_kl(ds, top_v: int = TOP_V, text_col: str = "text",
              source_col: str = "source"):
    """Per-source unigram KL divergence from the corpus distribution —
    the standard domain-shift / source-skew diagnostic (which sources
    look least like the overall training mix). Distributions are over
    the global top-``top_v`` vocabulary plus ONE out-of-vocabulary
    bucket, so the support is bounded and shared by every source:

        KL_s = sum_t (c_st / n_s) * ln( (c_st / n_s) / (C_t / N) )

    Exactness trick (same as :func:`unigram_logprob`): each term's log
    ratio is quantized to int64 as floor(1e6 * ln((c_st*N)/(n_s*C_t)))
    with ONE IEEE mul per side of the division, the per-source sum
    sum(c_st * l_st) is order-independent integer arithmetic (returned
    as ``s_q``), and ``kl`` is one exact float division — the DuckDB
    twin reproduces all three columns bit-for-bit.

    Scale shape: vocab train = the existing token_counts groupby +
    top-V sort/limit; the per-(source, bucket) counts pre-aggregate
    inside map_batches (<= sources x (V+1) rows leave each batch), and
    the finish is a few-big-groups ``groupby(source).map_groups`` over
    <= (V+1) x blocks tiny partial rows per source."""
    import ray
    from ray.data.aggregate import Sum

    counts = token_counts(ds, text_col).materialize()
    total = int(counts.aggregate(Sum("c"))["sum(c)"] or 0)
    vocab_rows = counts.sort(["c", "tok"], descending=[True, False]) \
        .limit(top_v).take_all()
    v_idx = {r["tok"]: i for i, r in enumerate(vocab_rows)}
    n_v = len(vocab_rows)
    gl = np.zeros(n_v + 1, dtype=np.int64)
    for i, r in enumerate(vocab_rows):
        gl[i] = int(r["c"])
    gl[n_v] = total - int(gl[:n_v].sum())  # the OOV bucket mass
    idx_ref = ray.put(v_idx)
    n_total = max(total, 1)

    def partial(b: pa.Table) -> pa.Table:
        vm: dict = ray.get(idx_ref)
        flat: list[str] = []
        srcs: list[str] = []
        for s, t in zip(b.column(source_col).to_pylist(),
                        b.column(text_col).to_pylist()):
            toks = TOKEN_RE.findall(t.lower())
            flat.extend(toks)
            srcs.extend([s] * len(toks))
        if not flat:
            return pa.table({source_col: pa.array([], type=pa.string()),
                             "idx": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
        tok_idx = np.array([vm.get(u, n_v) for u in uniq],
                           dtype=np.int64)[codes]
        s_codes, s_uniq = pd.factorize(np.asarray(srcs, dtype=object))
        key = s_codes * np.int64(n_v + 1) + tok_idx
        cnt = np.bincount(key, minlength=len(s_uniq) * (n_v + 1))
        nz = np.flatnonzero(cnt)
        return pa.table({
            source_col: pa.array(s_uniq[nz // (n_v + 1)],
                                 type=pa.string()),
            "idx": pa.array(nz % (n_v + 1), type=pa.int64()),
            "c": pa.array(cnt[nz], type=pa.int64()),
        })

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        c = np.bincount(g["idx"].to_numpy(), weights=g["c"].to_numpy(),
                        minlength=n_v + 1).astype(np.int64)
        n_s = int(c.sum())
        nz = np.flatnonzero(c)
        # one IEEE mul per side of the division, mirroring the SQL
        ratio = (c[nz].astype(np.float64) * float(n_total)) / \
            (float(n_s) * gl[nz].astype(np.float64))
        l_q = np.floor(1_000_000.0 * np.log(ratio)).astype(np.int64)
        s_q = int((c[nz] * l_q).sum())
        return pd.DataFrame({
            source_col: [g[source_col].iloc[0]],
            "n_tokens": np.array([n_s], dtype=np.int64),
            "s_q": np.array([s_q], dtype=np.int64),
            "kl": [s_q / (1_000_000.0 * n_s)],
        })

    def to_arrow(d: pd.DataFrame) -> pa.Table:
        return pa.table({
            source_col: pa.array(d[source_col].to_numpy(dtype=object),
                                 type=pa.string()),
            "n_tokens": pa.array(d["n_tokens"].to_numpy(), type=pa.int64()),
            "s_q": pa.array(d["s_q"].to_numpy(), type=pa.int64()),
            "kl": pa.array(d["kl"].to_numpy(), type=pa.float64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(source_col).map_groups(finish, batch_format="pandas") \
        .map_batches(to_arrow, batch_format="pandas")

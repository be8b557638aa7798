"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169).

The standard pretraining-data selection recipe: represent each document
as hashed n-gram (unigram + bigram) counts over ``N_BUCKETS`` buckets,
fit bag-of-words distributions for a small TARGET corpus (here: the
``lang == target_lang`` slice) and for the RAW pool (all docs), weight
each raw doc by its log importance ratio, and resample with Gumbel
top-k (equivalent to sampling without replacement proportionally to the
importance weights).

Distributed shape (the 100-TB path):

1. **Histogram pass** — per-batch partial bucket counts (target and
   raw side by side) -> one ``groupby(bucket).sum`` over at most
   ``N_BUCKETS`` distinct keys (pre-combined partials with a small
   fixed key space — the cheap kind of shuffle).
2. The per-bucket log-ratio table (``N_BUCKETS`` int64s, 32 KB) is
   built in one bounded driver collect and broadcast via ``ray.put``.
3. **Score pass** — stateless ``map_batches``: bucket each doc's grams,
   gather the broadcast table, segment-sum per doc. Zero shuffles.
4. ``dsir_sample`` picks the top-k of ``logw + gumbel`` by a
   distributed sort + limit (k rows ever materialize).

Exactness: per-bucket log-ratios are quantized to int64 as
``floor(1e6 * ln(.)) - floor(1e6 * ln(.))`` BEFORE the per-doc sum
(the :mod:`maskmypy_ray.text.lm` trick), so doc scores are
order-independent integer sums and the DuckDB oracle
(:func:`dsir_sql`) reproduces them bit-for-bit. The Gumbel noise uses
the engine's counter RNG with ``u = (h + 0.5) / 2^32`` (strictly inside
(0, 1), so ``-ln(-ln(u))`` is always finite) and is quantized the same
way. Tokenization + gram hashing reuse the SQL-mirrored kernels of
:mod:`maskmypy_ray.text.grams`.

No reference counterpart (MaskMyPy is geospatial-only); this is part of
the engine's LLM-curation surface alongside sample_mix / quality_filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..rng import mix32, sql_substream, substream
from .grams import gram_hashes_batch, token_codes_batch

N_BUCKETS = 4096
DSIR_STREAM = 915  # rng stream registry: DSIR Gumbel resampling
_Q = 1_000_000  # log quantization (1e-6 nats)


def _doc_bucket_ids(texts: list[str]):
    """(buckets, gbounds): hashed unigram+bigram feature buckets per doc
    (unigrams first, then bigrams, each in position order)."""
    codes, bounds = token_codes_batch(texts)
    g1, b1 = gram_hashes_batch(codes, bounds, 1, "skip")
    g2, b2 = gram_hashes_batch(codes, bounds, 2, "skip")
    n1, n2 = np.diff(b1), np.diff(b2)
    gbounds = np.concatenate([np.zeros(1, dtype=np.int64),
                              np.cumsum(n1 + n2)])
    out = np.empty(int(gbounds[-1]), dtype=np.int64)
    # interleave per doc: doc d's unigrams then its bigrams
    for_src = np.repeat(np.arange(len(n1), dtype=np.int64), n1)
    out_pos1 = gbounds[for_src] + (np.arange(len(g1)) - b1[for_src])
    out[out_pos1] = g1
    for_src2 = np.repeat(np.arange(len(n2), dtype=np.int64), n2)
    out_pos2 = gbounds[for_src2] + n1[for_src2] + (np.arange(len(g2))
                                                   - b2[for_src2])
    out[out_pos2] = g2
    return out % N_BUCKETS, gbounds


def bucket_histogram(ds, target_lang: str = "en", text_col: str = "text",
                     lang_col: str = "lang"):
    """(bucket, ct, cr) Dataset: target-slice and raw-pool feature
    counts per hash bucket (<= N_BUCKETS rows after the aggregate)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        buckets, gbounds = _doc_bucket_ids(b.column(text_col).to_pylist())
        if not len(buckets):
            e = pa.array([], type=pa.int64())
            return pa.table({"bucket": e, "ct": e, "cr": e})
        is_t = (b.column(lang_col).to_numpy(zero_copy_only=False)
                == target_lang)
        per_gram_t = np.repeat(is_t, np.diff(gbounds))
        u, inv = np.unique(buckets, return_inverse=True)
        cr = np.bincount(inv, minlength=len(u)).astype(np.int64)
        ct = np.bincount(inv, weights=per_gram_t.astype(np.float64),
                         minlength=len(u)).astype(np.int64)
        return pa.table({"bucket": pa.array(u), "ct": pa.array(ct),
                         "cr": pa.array(cr)})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("ct", alias_name="ct"),
                                     Sum("cr", alias_name="cr"))


def _lambda_table(hist_rows) -> np.ndarray:
    """Quantized per-bucket log importance ratios as a dense int64
    N_BUCKETS array (Laplace-smoothed; unseen buckets get the all-zero
    smoothing ratio, though the score pass never probes them — every
    scored gram was counted on the raw side)."""
    ct = np.zeros(N_BUCKETS, dtype=np.int64)
    cr = np.zeros(N_BUCKETS, dtype=np.int64)
    for r in hist_rows:
        ct[int(r["bucket"])] = int(r["ct"])
        cr[int(r["bucket"])] = int(r["cr"])
    nt = float(ct.sum() + N_BUCKETS)
    nr = float(cr.sum() + N_BUCKETS)
    lt = np.floor(_Q * np.log((ct + 1).astype(np.float64) / nt))
    lr = np.floor(_Q * np.log((cr + 1).astype(np.float64) / nr))
    return lt.astype(np.int64) - lr.astype(np.int64)


def dsir_weights(ds, target_lang: str = "en", seed: int = 0,
                 text_col: str = "text", lang_col: str = "lang"):
    """Per-doc DSIR log importance weights + Gumbel resampling keys:
    ``(doc_id, n_feats, logw_micro, key_micro)`` with
    ``key_micro = logw_micro + floor(1e6 * gumbel(doc_id))``.
    Deterministic; bit-reproducible in SQL (:func:`dsir_sql`)."""
    import ray

    hist = bucket_histogram(ds, target_lang, text_col, lang_col)
    lam_ref = ray.put(_lambda_table(hist.take_all()))

    def score(b: pa.Table) -> pa.Table:
        lam: np.ndarray = ray.get(lam_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        buckets, gbounds = _doc_bucket_ids(b.column(text_col).to_pylist())
        n_feats = np.diff(gbounds)
        logw = np.zeros(len(ids), dtype=np.int64)
        if len(buckets):
            contrib = lam[buckets]
            nz = n_feats > 0
            logw[nz] = np.add.reduceat(contrib, gbounds[:-1][nz])
        h = substream(ids, seed, DSIR_STREAM)
        u = (h + 0.5) / 4294967296.0  # strictly inside (0, 1)
        g = np.floor(_Q * -np.log(-np.log(u))).astype(np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_feats": pa.array(n_feats),
            "logw_micro": pa.array(logw),
            "key_micro": pa.array(logw + g),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_sample(ds, k: int = 100, target_lang: str = "en", seed: int = 0,
                text_col: str = "text", lang_col: str = "lang"):
    """Gumbel top-k importance resample: the k docs with the largest
    ``logw + gumbel`` key (ties broken by doc_id asc) — a without-
    replacement sample proportional to the DSIR importance weights.
    Distributed sort + limit: only k rows ever reach the driver side."""
    scored = dsir_weights(ds, target_lang, seed, text_col, lang_col)
    return scored.sort(["key_micro", "doc_id"],
                       descending=[True, False]).limit(k)


def dsir_sql(target_lang: str = "en", seed: int = 0,
             docs_cte: str = "docs AS (SELECT doc_id, lang, text FROM documents)",
             k: int | None = None) -> str:
    """DuckDB twin of :func:`dsir_weights` (or, with ``k``, of
    :func:`dsir_sample`) — bit-exact including the Gumbel keys."""
    from ..oracle import SQL_TOKEN_CODES, _TOKEN_SQL, sql_gram_list_expr

    sub = sql_substream("d.doc_id", seed, DSIR_STREAM)
    body = f"""WITH {docs_cte},
tl AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '{_TOKEN_SQL}') AS l FROM docs),
tc AS (SELECT doc_id, lang, {SQL_TOKEN_CODES} AS c FROM tl),
g AS (
  SELECT doc_id, lang, unnest({sql_gram_list_expr(1, "skip")}) AS gh FROM tc
  UNION ALL
  SELECT doc_id, lang, unnest({sql_gram_list_expr(2, "skip")}) AS gh FROM tc),
gb AS (SELECT doc_id, lang, gh % {N_BUCKETS} AS bucket FROM g),
hist AS (
  SELECT bucket,
         CAST(count(*) FILTER (WHERE lang = '{target_lang}') AS BIGINT) AS ct,
         CAST(count(*) AS BIGINT) AS cr
  FROM gb GROUP BY 1),
tot AS (SELECT CAST(sum(ct) + {N_BUCKETS} AS DOUBLE) AS nt,
               CAST(sum(cr) + {N_BUCKETS} AS DOUBLE) AS nr FROM hist),
lam AS (
  SELECT bucket,
         CAST(floor({_Q} * ln(CAST(ct + 1 AS DOUBLE) / nt)) AS BIGINT)
       - CAST(floor({_Q} * ln(CAST(cr + 1 AS DOUBLE) / nr)) AS BIGINT) AS lam
  FROM hist, tot),
sc AS (
  SELECT gb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         CAST(sum(lam.lam) AS BIGINT) AS logw_micro
  FROM gb JOIN lam USING (bucket) GROUP BY 1),
dsir AS (
  SELECT d.doc_id,
         coalesce(sc.n_feats, 0) AS n_feats,
         coalesce(sc.logw_micro, 0) AS logw_micro,
         coalesce(sc.logw_micro, 0)
         + CAST(floor({_Q} * -ln(-ln((({sub}) + 0.5) / 4294967296.0)))
                AS BIGINT) AS key_micro
  FROM docs d LEFT JOIN sc ON sc.doc_id = d.doc_id)
SELECT doc_id, n_feats, logw_micro, key_micro FROM dsir"""
    if k is not None:
        body += f"\nORDER BY key_micro DESC, doc_id ASC LIMIT {k}"
    return body

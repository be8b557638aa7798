"""Text analysis: token stats, language id, quality score, fingerprint.

Core training-data operators over the ``documents`` table, all stateless
vectorized ``map_batches`` stages (pyarrow compute / RE2 kernels — the
same regex engine DuckDB uses, so counts are oracle-exact).
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"[a-z0-9]+"
STOPWORD_RE = r"\b(the|a|and|of|to)\b"

# marker-word patterns per language; prediction = first max in this order
LANG_MARKERS = [
    ("de", r"\b(der|die|das|und|nicht)\b"),
    ("en", r"\b(the|a|and|of|to)\b"),
    ("es", r"\b(el|la|los|las|y)\b"),
    ("fr", r"\b(le|les|des|et|est)\b"),
    ("zh", r"[一-鿿]"),
]


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_stopwords, stop_ratio) — vectorized RE2 counts."""
    lower = pc.utf8_lower(batch.column("text"))
    n_tok = pc.count_substring_regex(lower, TOKEN_RE)
    n_stop = pc.count_substring_regex(lower, STOPWORD_RE)
    tok = n_tok.to_numpy(zero_copy_only=False).astype(np.int64)
    stp = n_stop.to_numpy(zero_copy_only=False).astype(np.int64)
    ratio = np.where(tok > 0, stp / np.maximum(tok, 1), 0.0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(tok, type=pa.int64()),
        "n_stopwords": pa.array(stp, type=pa.int64()),
        "stop_ratio": pa.array(ratio, type=pa.float64()),
    })


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Composite quality score in [0, 1]: length term + stopword term
    (the classic Gopher/C4-style heuristics, simplified to oracle-exact
    arithmetic)."""
    stats = token_stats_batch(batch)
    tok = stats.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    ratio = stats.column("stop_ratio").to_numpy(zero_copy_only=False)
    # no rounding: both engine and oracle produce the identical raw double
    score = np.minimum(tok / 50.0, 1.0) * 0.5 + np.minimum(ratio * 5.0, 1.0) * 0.5
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "quality_score": pa.array(score, type=pa.float64()),
    })


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Marker-word language id; ties broken by LANG_MARKERS order, zero
    matches everywhere -> 'und'."""
    lower = pc.utf8_lower(batch.column("text"))
    counts = np.stack([
        pc.count_substring_regex(lower, pat).to_numpy(zero_copy_only=False)
        for _, pat in LANG_MARKERS
    ])
    best = counts.argmax(axis=0)  # first max wins (argmax tie -> lowest index)
    any_hit = counts.max(axis=0) > 0
    langs = np.array([code for code, _ in LANG_MARKERS], dtype=object)
    pred = np.where(any_hit, langs[best], "und")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "lang_pred": pa.array(pred, type=pa.string()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint: md5 of the sorted distinct lowercase tokens
    joined by spaces (content-defined identity; robust to word order).

    Tokenization is one vectorized RE2 split over the whole batch
    (splitting on non-token runs yields exactly the ``[a-z0-9]+`` token
    multiset, plus empty strings at the edges which are dropped); only
    the md5 digest runs per row (no Arrow kernel exists for it)."""
    lower = pc.utf8_lower(batch.column("text"))
    tok_lists = pc.split_pattern_regex(lower, "[^a-z0-9]+").to_pylist()
    fps = [
        md5(" ".join(sorted({tok for tok in toks if tok})).encode()).hexdigest()
        for toks in tok_lists
    ]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fps, type=pa.string()),
    })


def normalize_text_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Canonical text normalization: lowercase, collapse every
    non-alphanumeric run to one space, trim — the usual pre-dedup /
    pre-tokenize cleanup pass. Three RE2/Arrow kernel calls per batch,
    no Python rows; DuckDB mirrors byte-for-byte."""
    t = pc.utf8_lower(batch.column(text_col))
    t = pc.replace_substring_regex(t, "[^a-z0-9]+", " ")
    t = pc.utf8_trim(t, " ")
    changed = pc.cast(pc.not_equal(t, batch.column(text_col)), pa.int64())
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "text": t,
        "changed": changed,
    })


def normalize_text(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: normalize_text_batch(b, text_col),
                          batch_format="pyarrow")


def top_per_source_partial(batch: pa.Table, k: int) -> pa.Table:
    """Per-batch partial top-k per source: score the batch, keep only
    each source's k best rows — caps the shuffle at k rows per
    (source, batch) like the ANN partial top-k."""
    import pandas as pd

    scores = quality_score_batch(batch)
    df = pd.DataFrame({
        "source": batch.column("source").to_numpy(zero_copy_only=False),
        "doc_id": batch.column("doc_id").to_numpy(zero_copy_only=False),
        "quality_score": scores.column("quality_score").to_numpy(
            zero_copy_only=False),
    })
    df = df.sort_values(["source", "quality_score", "doc_id"],
                        ascending=[True, False, True], kind="mergesort")
    out = df.groupby("source", sort=False).head(k)
    return pa.Table.from_pandas(out, preserve_index=False)


def top_quality_per_source(ds, k: int = 3):
    """Top-k docs per source by quality score (ties -> lower doc_id):
    (source, doc_id, quality_score, rank 1..k).

    Per-batch partial top-k then one tiny ``groupby(source)`` final —
    the shuffle carries at most k rows per (source, batch)."""
    import pandas as pd

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["quality_score", "doc_id"],
                          ascending=[False, True], kind="mergesort").head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        return g[["source", "doc_id", "quality_score", "rank"]]

    partial = ds.map_batches(lambda b: top_per_source_partial(b, k),
                             batch_format="pyarrow")
    return partial.groupby("source").map_groups(final, batch_format="pandas")


def token_stats(ds):
    return ds.map_batches(token_stats_batch, batch_format="pyarrow")


def quality_score(ds):
    return ds.map_batches(quality_score_batch, batch_format="pyarrow")


def lang_id(ds):
    return ds.map_batches(lang_id_batch, batch_format="pyarrow")


def fingerprint(ds):
    return ds.map_batches(fingerprint_batch, batch_format="pyarrow")


def winnow_batch(batch: pa.Table, k: int = 5, w: int = 4,
                 text_col: str = "text") -> pa.Table:
    """Winnowing document sketch (Schleimer et al., SIGMOD 2003): the
    distinct set of sliding-window minima over positional k-gram hashes.

    Unlike :func:`fingerprint_batch` (whole-document identity) this is
    the plagiarism/near-dup *sketch*: any shared substring of length
    >= k + w - 1 tokens guarantees a shared selected hash. Gram hashing
    is the shared batch kernel of the near-dup family (per-token md5
    codes folded by position-salted mix32 — the paper permits any strong
    hash in place of Karp-Rabin rolling hashes; this one IS rolling).

    Output: exploded (doc_id, gram_hash) rows, one per distinct selected
    hash. Fully vectorized: one global sliding-window min with
    doc-boundary masking; docs with fewer than ``w`` grams (rare)
    contribute their single whole-list min.
    """
    from .grams import gram_hashes_batch, token_codes_batch

    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column(text_col).to_pylist()
    codes, tbounds = token_codes_batch(texts)
    g, bounds = gram_hashes_batch(codes, tbounds, k, "single")
    lens = np.diff(bounds)
    out_doc: list[np.ndarray] = []
    out_hash: list[np.ndarray] = []
    # long docs (>= w grams): global sliding min, windows that stay inside
    # one segment are valid
    if len(g) >= w:
        win = np.lib.stride_tricks.sliding_window_view(g, w).min(axis=1)
        seg_of = np.repeat(np.arange(len(lens)), lens)
        valid = seg_of[: len(win)] == seg_of[w - 1:]
        vdoc = doc_ids[seg_of[: len(win)][valid]]
        pairs = np.unique(np.stack([vdoc, win[valid]]), axis=1)
        out_doc.append(pairs[0])
        out_hash.append(pairs[1])
    # short docs (0 < grams < w, i.e. < k + w - 1 tokens — rare): one
    # window = the whole gram list; segment spans are non-contiguous so a
    # tiny explicit slice-min per short doc beats a reduceat index dance
    short = np.nonzero((lens > 0) & (lens < w))[0]
    if len(short):
        mins = np.array([g[bounds[s]:bounds[s + 1]].min() for s in short],
                        dtype=np.int64)
        out_doc.append(doc_ids[short])
        out_hash.append(mins)
    if not out_doc:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "gram_hash": pa.array([], type=pa.int64())})
    return pa.table({
        "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
        "gram_hash": pa.array(np.concatenate(out_hash), type=pa.int64()),
    })


def winnow_fingerprint(ds, k: int = 5, w: int = 4, text_col: str = "text"):
    """Dataset[(doc_id, gram_hash)] winnowing sketch (see winnow_batch)."""
    return ds.map_batches(lambda b: winnow_batch(b, k, w, text_col),
                          batch_format="pyarrow")


# GPT-2-style pre-tokenizer pattern, minus the `\s+(?!\S)` alternative
# (RE2 — used by BOTH Arrow and DuckDB — has no lookahead; dropping it
# only merges trailing-space runs, keeping counts deterministic and
# oracle-exact across engines).
BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
WS_RE = r"\S+"


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_ws_tokens, n_bpe_tokens): whitespace token count plus a
    BPE-ish pre-tokenizer count (the two standard corpus-size estimators
    for training-data budgeting). Pure vectorized RE2 counts over the raw
    (non-lowercased) text."""
    text = batch.column("text")
    ws = pc.count_substring_regex(text, WS_RE).to_numpy(zero_copy_only=False)
    bpe = pc.count_substring_regex(text, BPE_RE).to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_ws_tokens": pa.array(ws.astype(np.int64), type=pa.int64()),
        "n_bpe_tokens": pa.array(bpe.astype(np.int64), type=pa.int64()),
    })


def token_count(ds):
    return ds.map_batches(token_count_batch, batch_format="pyarrow")


def _flat_tokens(batch: pa.Table, text_col: str = "text"):
    """Vectorized batch tokenization: one RE2 split over the whole batch,
    one C++ dictionary-encode to map tokens -> int ids.

    Returns (seg, tok_id, vocab, n_docs): position-ordered segment id
    (row index in the batch) and token id per non-empty token; ``vocab``
    is the dictionary (pa.Array of distinct token strings, indexable by
    tok_id).
    """
    lower = pc.utf8_lower(batch.column(text_col))
    lists = pc.split_pattern_regex(lower, "[^a-z0-9]+")
    lens = pc.list_value_length(lists).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    seg = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    tok = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return seg[keep], tok[keep], enc.dictionary, len(batch)


def repetition_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021, §A1.1, adapted to
    unstructured text): per doc the duplicate-word fraction, the fraction
    of word occurrences taken by the most frequent word, and the fraction
    of word-bigram occurrences taken by the most frequent bigram.

    Fully vectorized: one batch-wide RE2 split + dictionary encode, then
    np.unique over (doc, token) / (doc, bigram) composite keys with
    bincount / maximum.at segment reductions — no per-row Python.
    """
    seg, tok, vocab, n = _flat_tokens(batch)
    V = max(len(vocab), 1)
    n_tok = np.bincount(seg, minlength=n).astype(np.int64)

    # words: composite key = seg * V + tok  (tok < V, so keys decode
    # exactly; seg*V fits int64 for any batch this engine produces)
    uk, cnt = np.unique(seg * np.int64(V) + tok, return_counts=True)
    seg_of = uk // V
    distinct = np.bincount(seg_of, minlength=n).astype(np.int64)
    mx_word = np.zeros(n, dtype=np.int64)
    np.maximum.at(mx_word, seg_of, cnt)

    # bigrams: adjacent positions within one doc; two-level encode (pair
    # id first, then seg composite) keeps every key < seg_max * V^2
    adj = seg[:-1] == seg[1:] if len(seg) else np.zeros(0, dtype=bool)
    a, b, bseg = tok[:-1][adj], tok[1:][adj], seg[:-1][adj]
    n_bg = np.bincount(bseg, minlength=n).astype(np.int64)
    _, pid = np.unique(a * np.int64(V) + b, return_inverse=True)
    B = max(int(pid.max()) + 1 if len(pid) else 1, 1)
    ubk, bcnt = np.unique(bseg * np.int64(B) + pid, return_counts=True)
    mx_bg = np.zeros(n, dtype=np.int64)
    np.maximum.at(mx_bg, ubk // B, bcnt)

    safe = np.maximum(n_tok, 1)
    safe_bg = np.maximum(n_bg, 1)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "dup_word_frac": pa.array(
            np.where(n_tok > 0, (n_tok - distinct) / safe, 0.0), type=pa.float64()),
        "top_word_frac": pa.array(
            np.where(n_tok > 0, mx_word / safe, 0.0), type=pa.float64()),
        "top_bigram_frac": pa.array(
            np.where(n_bg > 0, mx_bg / safe_bg, 0.0), type=pa.float64()),
    })


def repetition(ds):
    return ds.map_batches(repetition_batch, batch_format="pyarrow")


def source_stats_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregate for per-source corpus stats: one row
    per source seen in the batch with (n_docs, n_tokens, n_chars) sums.
    The combine-before-shuffle half of the pre-aggregated groupby."""
    enc = pc.dictionary_encode(batch.column("source"))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    srcs = enc.dictionary.to_pylist()
    lower = pc.utf8_lower(batch.column("text"))
    n_tok = pc.count_substring_regex(lower, TOKEN_RE).to_numpy(
        zero_copy_only=False).astype(np.int64)
    n_chr = pc.utf8_length(batch.column("text")).to_numpy(
        zero_copy_only=False).astype(np.int64)
    k = len(srcs)
    return pa.table({
        "source": pa.array(srcs, type=pa.string()),
        "n_docs": pa.array(np.bincount(idx, minlength=k), type=pa.int64()),
        "n_tokens": pa.array(
            np.bincount(idx, weights=n_tok, minlength=k).astype(np.int64),
            type=pa.int64()),
        "n_chars": pa.array(
            np.bincount(idx, weights=n_chr, minlength=k).astype(np.int64),
            type=pa.int64()),
    })


def bigram_counts_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial word-bigram counts: one row per DISTINCT bigram
    in the batch (the combine-before-shuffle half of the corpus n-gram
    count; shuffle volume = distinct grams per block, not occurrences)."""
    seg, tok, vocab, _ = _flat_tokens(batch)
    adj = seg[:-1] == seg[1:] if len(seg) else np.zeros(0, dtype=bool)
    a, b = tok[:-1][adj], tok[1:][adj]
    if not len(a):
        return pa.table({"gram": pa.array([], type=pa.string()),
                         "n": pa.array([], type=pa.int64())})
    V = max(len(vocab), 1)
    up, cnt = np.unique(a * np.int64(V) + b, return_counts=True)
    wa = pc.take(vocab, pa.array(up // V, type=pa.int64()))
    wb = pc.take(vocab, pa.array(up % V, type=pa.int64()))
    return pa.table({
        "gram": pc.binary_join_element_wise(wa, wb, " "),
        "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
    })


def ngram_topk(ds, k: int = 20, partitions: int = 64):
    """Corpus-wide top-k word bigrams by total count (the classic
    n-gram-statistics job): per-batch partial counts -> coarse
    ``hash(gram) % P`` partition (each gram's WHOLE mass lands in one
    partition, so a per-partition vectorized sum + head-k is exact:
    every global top-k gram is also in its own partition's top k) ->
    global sort over the <= P*k survivors -> limit k. The webtext
    bigram vocabulary is corpus-sized, so a per-distinct-gram
    ``groupby(gram).aggregate`` pays Ray's per-key machinery on
    billions of keys (round-5 fine-key rule); the coarse shape's
    all-to-all carries only per-block distinct partials and its final
    sort only P*k rows. Ties at the k boundary break on the gram
    string, so the result set is deterministic at any parallelism and
    any partition count."""
    def partial(b: pa.Table) -> pa.Table:
        t = bigram_counts_partial_batch(b)
        g = t.column("gram").to_numpy(zero_copy_only=False)
        # routing hash only — the result is invariant to the partition
        # assignment; pd.util.hash_array is vectorized over the strings
        pb = pd.util.hash_array(g.astype(object)) % partitions
        return t.append_column("pb", pa.array(pb.astype(np.int64)))

    part = ds.map_batches(partial, batch_format="pyarrow")

    def topk_part(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("gram", sort=False)["n"].sum().reset_index()
        s = s.sort_values(["n", "gram"], ascending=[False, True],
                          kind="mergesort").head(k)
        return s[["gram", "n"]]

    cand = part.groupby("pb").map_groups(topk_part, batch_format="pandas")
    return cand.sort(["n", "gram"], descending=[True, False]).limit(k)


def pmi_topk(ds, k: int = 20, min_count: int = 5, top_v: int = 4096,
             partitions: int = 64):
    """Top-k bigram COLLOCATIONS by pointwise mutual information —
    PMI(a,b) = ln( c_ab * N_uni^2 / (N_bi * c_a * c_b) ) — restricted
    to bigrams seen >= ``min_count`` times whose both tokens sit in the
    top-``top_v`` unigram vocabulary (the classic collocation-mining
    job; raw count ranking surfaces "of the", PMI surfaces the pairs
    that co-occur far above chance).

    Scale shape: the unigram vocab is a bounded broadcast (``top_v``
    rows via distributed sort+limit, the ``lm.py`` pattern); bigram
    partials pre-combine per batch; each candidate's whole mass lands
    in one coarse ``hash(gram) % P`` partition where the count gate,
    the quantized PMI and a head-k run vectorized; the final sort sees
    <= P*k rows. N_uni / N_bi are two driver scalars (N_bi summed from
    per-batch sentinel rows riding the same partials — no extra corpus
    pass).

    Exactness: ``pmi_micro = floor(1e6 * ln(num/den))`` with num/den
    exact int64 products (< 2^62 asserted; the int->double conversions
    and the single IEEE division are correctly rounded on both sides)
    — the DuckDB twin computes the identical expression with HUGEINT
    products. Returns (gram, n, pmi_micro) by (pmi_micro desc, gram).
    """
    import ray
    from ray.data.aggregate import Sum

    from .lm import token_counts

    counts = token_counts(ds).materialize()
    n_uni = int(counts.aggregate(Sum("c"))["sum(c)"] or 0)
    vocab_rows = counts.sort(["c", "tok"], descending=[True, False]) \
        .limit(top_v).take_all()
    vocab = {r["tok"]: int(r["c"]) for r in vocab_rows}
    vocab_ref = ray.put(vocab)

    def partial(b: pa.Table) -> pa.Table:
        t = bigram_counts_partial_batch(b)
        g = t.column("gram").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        pb = ((pd.util.hash_array(g.astype(object)) % partitions)
              .astype(np.int64)) if len(g) else np.zeros(0, np.int64)
        out = pa.table({"gram": t.column("gram"), "n": t.column("n"),
                        "pb": pa.array(pb)})
        # sentinel row (pb = -1): this batch's TOTAL bigram mass, summed
        # on the driver into the N_bi scalar — no second corpus pass
        sent = pa.table({"gram": pa.array(["\t"], type=pa.string()),
                         "n": pa.array([int(n.sum())], type=pa.int64()),
                         "pb": pa.array([-1], type=pa.int64())})
        return pa.concat_tables([out, sent])

    # combiner output (distinct bigrams per block + 1 sentinel/block):
    # materialized because two consumers need it (the N_bi scalar and
    # the candidate shuffle) — far smaller than the corpus
    partials = ds.map_batches(partial, batch_format="pyarrow").materialize()
    n_bi = int(partials.filter(expr="pb == -1")
               .aggregate(Sum("n"))["sum(n)"] or 0)
    nb = max(n_bi, 1)
    nu = max(n_uni, 1)

    def score_part(g: pd.DataFrame) -> pd.DataFrame:
        v: dict = ray.get(vocab_ref)
        s = g.groupby("gram", sort=False)["n"].sum().reset_index()
        s = s[s["n"].to_numpy() >= min_count]
        empty = pd.DataFrame({
            "gram": pd.Series([], dtype=object),
            "n": pd.Series([], dtype=np.int64),
            "pmi_micro": pd.Series([], dtype=np.int64)})
        if not len(s):
            return empty
        # vocab lookups once per DISTINCT token (unigram_logprob idiom)
        sp = s["gram"].str.split(" ", n=1, expand=True)
        ca = np.empty(len(s), dtype=np.int64)
        cb = np.empty(len(s), dtype=np.int64)
        ok = np.ones(len(s), dtype=bool)
        for col, arr in ((0, ca), (1, cb)):
            codes, uniq = pd.factorize(sp[col].to_numpy())
            cu = np.array([v.get(u, -1) for u in uniq], dtype=np.int64)
            arr[:] = cu[codes]
            ok &= arr > 0
        s, ca, cb = s[ok], ca[ok], cb[ok]
        if not len(s):
            return empty
        cab = s["n"].to_numpy(np.int64)
        assert int(cab.max()) * nu * nu < (1 << 62), "pmi int64 overflow"
        assert nb * int(ca.max()) * int(cb.max()) < (1 << 62), \
            "pmi int64 overflow"
        num = cab * (nu * nu)
        den = (ca * nb) * cb
        micro = np.floor(1e6 * np.log(num.astype(np.float64)
                                      / den.astype(np.float64))) \
            .astype(np.int64)
        out = pd.DataFrame({"gram": s["gram"].to_numpy(), "n": cab,
                            "pmi_micro": micro})
        return out.sort_values(["pmi_micro", "gram"],
                               ascending=[False, True],
                               kind="mergesort").head(k)

    cand = partials.filter(expr="pb >= 0") \
        .groupby("pb").map_groups(score_part, batch_format="pandas")
    return cand.sort(["pmi_micro", "gram"], descending=[True, False]) \
        .limit(k)


def quality_filter_batch(batch: pa.Table, min_tokens: int = 10,
                         max_top_word_frac: float = 0.5,
                         min_stop_ratio: float = 0.05) -> pa.Table:
    """Single-pass C4/Gopher-style curation decision: keep a doc iff it
    has >= min_tokens tokens, its most frequent word takes < 50% of the
    token stream (repetition gate), and its stopword ratio is >=
    min_stop_ratio (natural-language gate). One fused batch pass over
    the token-stats and repetition kernels — the decision a 100-TB
    curation pipeline applies before anything expensive runs."""
    stats = token_stats_batch(batch)
    rep = repetition_batch(batch)
    n = stats.column("n_tokens").to_numpy(zero_copy_only=False)
    ratio = stats.column("stop_ratio").to_numpy(zero_copy_only=False)
    topw = rep.column("top_word_frac").to_numpy(zero_copy_only=False)
    keep = ((n >= min_tokens) & (topw < max_top_word_frac)
            & (ratio >= min_stop_ratio))
    reason = np.select(
        [n < min_tokens, topw >= max_top_word_frac, ratio < min_stop_ratio],
        ["too_short", "repetitive", "unnatural"], default="kept")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "keep": pa.array(keep.astype(np.int64), type=pa.int64()),
        "reason": pa.array(reason.astype(object), type=pa.string()),
    })


def quality_filter(ds, min_tokens: int = 10, max_top_word_frac: float = 0.5,
                   min_stop_ratio: float = 0.05):
    return ds.map_batches(
        lambda b: quality_filter_batch(b, min_tokens, max_top_word_frac,
                                       min_stop_ratio),
        batch_format="pyarrow")


def text_signals_batch(batch: pa.Table, min_tokens: int = 10,
                       max_top_word_frac: float = 0.5,
                       min_stop_ratio: float = 0.05) -> pa.Table:
    """ALL stateless per-doc text signals in ONE fused batch pass:
    token stats, quality score, language id, fingerprint, token counts,
    repetition fractions, the quality-filter decision, and the
    normalized text — each bit-identical to its standalone kernel
    (shared sub-kernels run once instead of once per operator). This is
    the single-scan shape a 100-TB curation pipeline actually runs:
    one read, one map stage, every per-doc column out."""
    ts = token_stats_batch(batch)
    rep = repetition_batch(batch)
    lang = lang_id_batch(batch)
    fp = fingerprint_batch(batch)
    tc = token_count_batch(batch)
    nt = normalize_text_batch(batch)
    n = ts.column("n_tokens").to_numpy(zero_copy_only=False)
    ratio = ts.column("stop_ratio").to_numpy(zero_copy_only=False)
    topw = rep.column("top_word_frac").to_numpy(zero_copy_only=False)
    score = (np.minimum(n / 50.0, 1.0) * 0.5
             + np.minimum(ratio * 5.0, 1.0) * 0.5)
    keep = ((n >= min_tokens) & (topw < max_top_word_frac)
            & (ratio >= min_stop_ratio))
    reason = np.select(
        [n < min_tokens, topw >= max_top_word_frac, ratio < min_stop_ratio],
        ["too_short", "repetitive", "unnatural"], default="kept")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": ts.column("n_tokens"),
        "n_stopwords": ts.column("n_stopwords"),
        "stop_ratio": ts.column("stop_ratio"),
        "quality_score": pa.array(score, type=pa.float64()),
        "lang_pred": lang.column("lang_pred"),
        "fingerprint": fp.column("fingerprint"),
        "n_ws_tokens": tc.column("n_ws_tokens"),
        "n_bpe_tokens": tc.column("n_bpe_tokens"),
        "dup_word_frac": rep.column("dup_word_frac"),
        "top_word_frac": rep.column("top_word_frac"),
        "top_bigram_frac": rep.column("top_bigram_frac"),
        "keep": pa.array(keep.astype(np.int64), type=pa.int64()),
        "reason": pa.array(reason.astype(object), type=pa.string()),
        "norm_text": nt.column("text"),
        "changed": nt.column("changed"),
    })


def text_signals(ds):
    return ds.map_batches(text_signals_batch, batch_format="pyarrow")


def source_stats(ds):
    """Per-source (n_docs, n_tokens, n_chars, avg_chars): the standard
    domain-level corpus curation summary. Partial sums are combined
    inside map_batches so the groupby shuffles one row per (source,
    batch), not one per document — the pre-aggregate-before-shuffle
    shape that holds at 100 TB (shuffle volume = n_sources x n_blocks)."""
    from ray.data.aggregate import Sum

    part = ds.map_batches(source_stats_partial_batch, batch_format="pyarrow")
    agg = part.groupby("source").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"),
        Sum("n_chars", alias_name="n_chars"),
    )

    def finish(b: pa.Table) -> pa.Table:
        docs = b.column("n_docs").to_numpy(zero_copy_only=False).astype(np.int64)
        chars = b.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "avg_chars", pa.array(chars / np.maximum(docs, 1), type=pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def source_quantiles(ds, qs: tuple = (0.25, 0.5, 0.75),
                     val_col: str = "n_chars"):
    """Per-source exact quantiles (lower order statistic) of a numeric
    column: (source, q25, q50, q75).

    Runs on the keyed histogram-refinement kernel
    (:func:`maskmypy_ray.analysis.aggregates.keyed_quantiles_distributed`,
    VERDICT r04 #2): every source's ranks descend together through
    shared ``(source, window, bin)`` histogram passes, so NO source
    group is ever materialized in one task — the previous
    ``groupby(source).map_groups`` sort OOMs when one source holds a
    double-digit share of a 100-TB corpus."""
    import pyarrow as pa

    from ..analysis.aggregates import keyed_quantiles_distributed

    per_key = keyed_quantiles_distributed(ds, "source", val_col, list(qs))
    srcs = sorted(per_key)
    cols: dict = {"source": pa.array(srcs, type=pa.string())}
    for qi, q in enumerate(qs):
        cols[f"q{int(q * 100)}"] = pa.array(
            [per_key[s][qi] for s in srcs], type=pa.float64())
    return pa.table(cols)


def source_outlier_flags(ds, val_col: str = "n_chars"):
    """Tukey-fence outlier flags per source: flag = -1 if the doc's
    value is below q25 - 1.5*IQR, +1 if above q75 + 1.5*IQR, else 0.

    (doc_id, source, <val>, flag). The fences compare in EXACT integer
    arithmetic — ``2x < 5*q25 - 3*q75`` / ``2x > 5*q75 - 3*q25`` — so
    the SQL twin is bit-identical (no float quantile interpolation).
    Quartiles are per-source lower order statistics (rank
    floor(q*(n-1))) from the keyed histogram-refinement kernel
    (no per-source group materialization, VERDICT r04 #2), collected
    bounded (n_sources rows) and broadcast; the flag pass is a
    stateless vectorized filter."""
    import ray

    from ..analysis.aggregates import keyed_quantiles_distributed

    per_key = keyed_quantiles_distributed(
        ds.select_columns(["source", val_col]), "source", val_col,
        [0.25, 0.75])
    fences = {s: (5 * int(v[0]) - 3 * int(v[1]),
                  5 * int(v[1]) - 3 * int(v[0]))
              for s, v in per_key.items()}
    fences_ref = ray.put(fences)

    def flag(b: pa.Table) -> pa.Table:
        f: dict = ray.get(fences_ref)
        src = b.column("source").to_pylist()
        x = b.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.array([f[s][0] for s in src], dtype=np.int64)
        hi = np.array([f[s][1] for s in src], dtype=np.int64)
        out = np.zeros(len(x), dtype=np.int64)
        out[2 * x < lo] = -1
        out[2 * x > hi] = 1
        return pa.table({
            "doc_id": b.column("doc_id"),
            "source": b.column("source"),
            val_col: b.column(val_col),
            "flag": pa.array(out),
        })

    return ds.map_batches(flag, batch_format="pyarrow")


def trimmed_source_stats(ds, lo_q: float = 0.1, hi_q: float = 0.9,
                         val_col: str = "n_chars"):
    """Robust (trimmed) per-source mean: drop each source's values
    outside its exact [q10, q90] order statistics, then average what
    remains -> ``(source, n_kept, trimmed_mean)`` (mean rounded 6 dp).
    The boilerplate-resistant length profile: a source's handful of
    giant concatenation pages or empty stubs no longer move its mean.

    Scale shape: the trim bounds come from the keyed
    histogram-refinement kernel (no source group ever materializes in
    one task); the bounded (n_sources x 2) bound map broadcasts and the
    kept-sum pass is stateless per-batch integer partials before one
    tiny ``groupby(source)`` — all exact int64 until the single final
    division, so the SQL twin is bit-identical."""
    import ray
    from ray.data.aggregate import Sum

    from ..analysis.aggregates import keyed_quantiles_distributed

    per_key = keyed_quantiles_distributed(ds, "source", val_col,
                                          [lo_q, hi_q])
    bounds = {k: (v[0], v[1]) for k, v in per_key.items()}
    b_ref = ray.put(bounds)

    def partial(b: pa.Table) -> pa.Table:
        bd: dict = ray.get(b_ref)
        src = b.column("source").to_numpy(zero_copy_only=False)
        v = b.column(val_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        lo = np.array([bd[s][0] for s in src])
        hi = np.array([bd[s][1] for s in src])
        keep = (v >= lo) & (v <= hi)
        df = pd.DataFrame({"source": src[keep], "v": v[keep]})
        g = df.groupby("source", sort=False).agg(
            n_kept=("v", "size"), s=("v", "sum")).reset_index()
        return pa.table({
            "source": pa.array(g["source"].to_numpy(dtype=object),
                               type=pa.string()),
            "n_kept": pa.array(g["n_kept"].to_numpy(dtype=np.int64)),
            "s": pa.array(g["s"].to_numpy(dtype=np.int64)),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n_kept", alias_name="n_kept"),
                                     Sum("s", alias_name="s"))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_kept").to_numpy(zero_copy_only=False)
        s = b.column("s").to_numpy(zero_copy_only=False)
        return pa.table({
            "source": b.column("source"),
            "n_kept": b.column("n_kept"),
            "trimmed_mean": pa.array(
                np.round(np.where(n > 0, s / np.maximum(n, 1), 0.0), 6),
                type=pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def trimmed_source_stats_sql(lo_q: float = 0.1, hi_q: float = 0.9) -> str:
    """DuckDB twin of :func:`trimmed_source_stats` — same lower-order-
    statistic bounds (rank floor(q*(n-1))), same integer sums, one
    final float division."""
    return f"""WITH s AS (
  SELECT source, CAST(n_chars AS BIGINT) AS v,
         row_number() OVER (PARTITION BY source ORDER BY n_chars) - 1 AS r,
         count(*) OVER (PARTITION BY source) AS n
  FROM documents),
b AS (
  SELECT source,
         min(CASE WHEN r = CAST(floor({lo_q} * (n - 1)) AS BIGINT)
                  THEN v END) AS lo,
         min(CASE WHEN r = CAST(floor({hi_q} * (n - 1)) AS BIGINT)
                  THEN v END) AS hi
  FROM s GROUP BY source),
k AS (
  SELECT s.source, CAST(count(*) AS BIGINT) AS n_kept,
         CAST(sum(s.v) AS BIGINT) AS sv
  FROM s JOIN b USING (source)
  WHERE s.v >= b.lo AND s.v <= b.hi GROUP BY s.source)
SELECT source, n_kept,
       round(CAST(sv AS DOUBLE) / n_kept, 6) AS trimmed_mean FROM k"""

"""Training-data text operators: dedup recall, simhash correctness,
quality/langid unit behavior."""

import numpy as np
import pyarrow as pa
import pytest

from maskmypy_ray.text.dedup import (
    _shingle_hashes,
    jaccard,
    minhash_signature,
    simhash64,
)
from maskmypy_ray.text.quality import (
    lang_id_batch,
    quality_score_batch,
    token_stats_batch,
)


def _docs(**texts):
    ids = list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(list(texts.values()), type=pa.string())})


def test_token_stats_unit():
    t = _docs(a="The cat and the dog.", b="")
    s = token_stats_batch(t).to_pandas()
    assert s.loc[0, "n_tokens"] == 5
    assert s.loc[0, "n_stopwords"] == 3  # the, and, the
    assert s.loc[1, "n_tokens"] == 0 and s.loc[1, "stop_ratio"] == 0.0


def test_token_count_unit():
    from maskmypy_ray.text.quality import token_count_batch

    t = _docs(a="I can't stop, won't stop: 42 times!",
              b="hello world", c="")
    s = token_count_batch(t).to_pandas()
    # whitespace tokens: ["I", "can't", "stop,", "won't", "stop:", "42", "times!"]
    assert s.loc[0, "n_ws_tokens"] == 7
    # BPE-ish pre-tokens: I | can | 't | _stop | , | _won | 't | _stop | : |
    # _42 | _times | ! | (no trailing-space run)
    assert s.loc[0, "n_bpe_tokens"] == 12
    assert s.loc[1, "n_ws_tokens"] == 2 and s.loc[1, "n_bpe_tokens"] == 2
    assert s.loc[2, "n_ws_tokens"] == 0 and s.loc[2, "n_bpe_tokens"] == 0
    assert s["n_ws_tokens"].dtype == np.int64


def test_repetition_unit():
    from maskmypy_ray.text.quality import repetition_batch

    t = _docs(a="the cat the cat the", b="a b c d", c="", d="x x x x")
    r = repetition_batch(t).to_pandas()
    # a: 5 tokens, 2 distinct -> dup 3/5, top "the" 3/5; bigrams
    #    {the-cat:2, cat-the:2} -> top 2/4
    assert r.loc[0, "dup_word_frac"] == 0.6
    assert r.loc[0, "top_word_frac"] == 0.6
    assert r.loc[0, "top_bigram_frac"] == 0.5
    assert r.loc[1, "dup_word_frac"] == 0.0 and r.loc[1, "top_word_frac"] == 0.25
    assert (r.loc[2, ["dup_word_frac", "top_word_frac", "top_bigram_frac"]] == 0).all()
    assert r.loc[3, "top_word_frac"] == 1.0 and r.loc[3, "top_bigram_frac"] == 1.0


def test_quality_filter_unit():
    from maskmypy_ray.text.quality import quality_filter_batch

    t = _docs(
        kept="the cat and the dog went to the park and sat of to a and the",
        short="tiny doc",
        repetitive=" ".join(["spam"] * 12 + ["the and of to a"]),
        unnatural="alpha beta gamma delta epsilon zeta eta theta iota kappa",
    )
    r = quality_filter_batch(t).to_pandas().set_index("doc_id")
    assert r.loc[0, "keep"] == 1 and r.loc[0, "reason"] == "kept"
    assert r.loc[1, "keep"] == 0 and r.loc[1, "reason"] == "too_short"
    assert r.loc[2, "keep"] == 0 and r.loc[2, "reason"] == "repetitive"
    assert r.loc[3, "keep"] == 0 and r.loc[3, "reason"] == "unnatural"


def test_source_stats_partial_unit():
    from maskmypy_ray.text.quality import source_stats_partial_batch

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["one two", "three", "four five six"]),
        "source": pa.array(["s0", "s1", "s0"]),
    })
    s = source_stats_partial_batch(t).to_pandas().set_index("source")
    assert s.loc["s0", "n_docs"] == 2 and s.loc["s0", "n_tokens"] == 5
    assert s.loc["s1", "n_docs"] == 1 and s.loc["s1", "n_chars"] == 5


def test_duplicated_spans_unit(ray_session):
    import ray.data

    from maskmypy_ray.text.dedup import duplicated_spans

    shared = "one two three four five six seven eight nine ten"
    rows = [
        {"doc_id": 0, "text": shared + " alpha beta"},
        {"doc_id": 1, "text": "prefix words here " + shared},
        {"doc_id": 2, "text": "completely different content with many words "
                              "that do not repeat anything at all truly"},
        {"doc_id": 3, "text": "short"},
    ]
    out = duplicated_spans(ray.data.from_items(rows), k=10).to_pandas()
    # exactly the shared 10-gram (one positional window in each doc)
    assert len(out) == 1
    assert out.iloc[0]["n_docs"] == 2 and out.iloc[0]["first_doc"] == 0


def test_bigram_counts_partial_unit():
    from maskmypy_ray.text.quality import bigram_counts_partial_batch

    t = _docs(a="x y x y z", b="x y", c="")
    out = bigram_counts_partial_batch(t).to_pandas().set_index("gram")["n"]
    # batch-wide partials: "x y" appears 2x in a + 1x in b
    assert out["x y"] == 3 and out["y x"] == 1 and out["y z"] == 1


def test_stratified_sample_matches_rng(ray_session, sf_dir):
    import pyarrow.parquet as pq
    import ray.data

    from maskmypy_ray.rng import uniform01
    from maskmypy_ray.text.corpus import SAMPLE_STREAM, _source_frac, \
        stratified_sample

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source"])
    got = stratified_sample(ds, seed=7).to_pandas().sort_values("doc_id")
    ref = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "source"]).to_pandas()
    nums = ref["source"].str.extract(r"(\d+)")[0].astype(int).to_numpy()
    keep = uniform01(ref["doc_id"].to_numpy(), 7, SAMPLE_STREAM) \
        < _source_frac(nums)
    expected = ref[keep].sort_values("doc_id")
    assert got["doc_id"].tolist() == expected["doc_id"].tolist()
    assert 0 < len(got) < len(ref)


def test_decontaminate_flags_benchmark_overlap(ray_session):
    import ray.data

    from maskmypy_ray.text.corpus import BENCH_MOD, decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        {"doc_id": 0, "text": bench_text},                      # benchmark (0 % 97 == 0)
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon somethingelse"},  # shares 5-gram
        {"doc_id": 2, "text": "totally unrelated words here none shared"},
        {"doc_id": 3, "text": "short doc"},                     # < 5 tokens: no grams
    ]
    assert 0 % BENCH_MOD == 0 and all(r["doc_id"] % BENCH_MOD != 0 for r in rows[1:])
    out = decontaminate(ray.data.from_items(rows), n=5).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2, 3]  # benchmark doc excluded
    assert out.loc[1, "contaminated"] == 1 and out.loc[1, "n_hit_grams"] == 1
    assert out.loc[2, "contaminated"] == 0
    assert out.loc[3, "n_hit_grams"] == 0


def test_lang_id_unit():
    t = _docs(en="the cat and the dog", de="der hund und die katze",
              zh="这是中文文本", none="xyzzy qwerty")
    p = lang_id_batch(t).to_pandas()["lang_pred"].tolist()
    assert p == ["en", "de", "zh", "und"]


def test_quality_monotone_in_length():
    t = _docs(short="the cat", long="the cat and the dog " * 20)
    q = quality_score_batch(t).to_pandas()["quality_score"]
    assert q[1] > q[0]


def test_minhash_similarity_estimate():
    """MinHash collision rate approximates Jaccard."""
    base = "the quick brown fox jumps over the lazy dog " * 10
    a = _shingle_hashes(base)
    b = _shingle_hashes(base + " extra tail words here now")
    true_j = jaccard(set(a.tolist()), set(b.tolist()))
    sa, sb = minhash_signature(a), minhash_signature(b)
    est = (sa == sb).mean()
    assert abs(est - true_j) < 0.25


def test_simhash_close_for_near_dups():
    a = simhash64("the quick brown fox jumps over the lazy dog")
    b = simhash64("the quick brown fox jumps over the lazy cat")
    c = simhash64("completely different words entirely unrelated text")
    ham_ab = bin(a ^ b).count("1")
    ham_ac = bin(a ^ c).count("1")
    assert ham_ab < ham_ac


def test_minhash_lsh_finds_injected_dups(ray_session, sf_dir):
    """Every injected mutated copy (J ~ 0.97) must be recovered."""
    from maskmypy_ray.pipelines import q_dedup_minhash

    pairs = q_dedup_minhash(sf_dir).to_pandas()
    expected = set()
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]) \
        .column("doc_id").to_numpy()
    for d in ids[ids % 10 == 0]:
        expected.add((int(d), int(d) + 1_000_000))
    got = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    missing = expected - got
    assert not missing, f"LSH missed injected near-dups: {sorted(missing)[:5]}"


def test_simhash_pairs_vs_bruteforce(ray_session, sf_dir):
    """Band-blocked pairs == brute-force hamming<=3 pairs (pigeonhole
    completeness)."""
    import pyarrow.parquet as pq

    from maskmypy_ray.pipelines import q_dedup_simhash

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(docs.column("doc_id").to_pylist(), docs.column("text").to_pylist()))
    # brute force over corpus + mutated copies
    full = dict(texts)
    for d, t in texts.items():
        if d % 10 == 0:
            full[d + 1_000_000] = t + " zz9"
    ids = sorted(full)
    hs = {d: simhash64(full[d]) for d in ids}
    expected = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin(hs[ids[i]] ^ hs[ids[j]]).count("1") <= 3:
                expected.add((ids[i], ids[j]))
    pairs = q_dedup_simhash(sf_dir).to_pandas()
    got = set(zip(pairs["doc_a"].astype(int), pairs["doc_b"].astype(int)))
    assert got == expected


def test_exact_dedup_survivors(ray_session, sf_dir):
    """exact_dedup keeps exactly one row per distinct text."""
    import ray.data

    from maskmypy_ray.text.dedup import exact_dedup, with_mutated_copies

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    # duplicate the whole corpus with shifted ids: survivors = originals
    dup = docs.map_batches(
        lambda b: pa.table({
            "doc_id": pa.array(
                b.column("doc_id").to_numpy(zero_copy_only=False) + 500_000,
                type=pa.int64()),
            "text": b.column("text")}),
        batch_format="pyarrow")
    out = exact_dedup(docs.union(dup)).to_pandas()
    n_texts = len(set(docs.to_pandas()["text"]))
    assert len(out) == n_texts
    assert (out["doc_id"] < 500_000).all()  # min doc_id survives


def test_winnow_matches_bruteforce():
    """winnow_batch == the obvious per-doc loop (k-gram hashes, sliding
    window min, distinct) on handcrafted short/long/empty docs."""
    from hashlib import md5 as _md5

    from maskmypy_ray.text.dedup import TOKEN_RE
    from maskmypy_ray.text.quality import winnow_batch

    k, w = 3, 2
    texts = [
        "a b c d e f g a b c d",          # long: several windows
        "x y",                            # fewer tokens than k: one gram
        "",                               # empty: no rows
        "m n o p",                        # grams == w exactly
        "a b c d e f g a b c d",          # duplicate of doc 0
    ]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": pa.array(texts, type=pa.string())})
    out = winnow_batch(batch, k=k, w=w)
    got = {(d, h) for d, h in zip(out.column("doc_id").to_pylist(),
                                  out.column("gram_hash").to_pylist())}

    from maskmypy_ray.rng import mix32
    from maskmypy_ray.text.grams import POS

    def gram_hash(words):
        # independent scalar reimplementation of the batched kernel:
        # XOR over tokens of mix32(md5_code XOR POS[position])
        h = 0
        for j, wd in enumerate(words):
            code = int.from_bytes(_md5(wd.encode()).digest()[:4], "little")
            h ^= int(mix32(code ^ int(POS[j])))
        return h

    expect = set()
    for did, t in enumerate(texts):
        toks = TOKEN_RE.findall(t.lower())
        if not toks:
            continue
        if len(toks) < k:
            grams = [toks]
        else:
            grams = [toks[i:i + k] for i in range(len(toks) - k + 1)]
        hs = [gram_hash(g) for g in grams]
        if len(hs) < w:
            expect.add((did, min(hs)))
        else:
            for i in range(len(hs) - w + 1):
                expect.add((did, min(hs[i:i + w])))
    assert got == expect
    # identical docs -> identical sketches (the near-dup property)
    s0 = {h for d, h in got if d == 0}
    s4 = {h for d, h in got if d == 4}
    assert s0 == s4


def test_cross_corpus_flags_near_dups(ray_session):
    import ray.data

    from maskmypy_ray.text.dedup import cross_corpus_flags

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep dark forest to hide from hunters")
    # doc 0 is the eval slice (0 % 97 == 0); doc 97*3=291 too
    rows = {
        0: base,                                  # eval
        291: "completely different words entirely unrelated content here "
             "nothing shared with anything else in this corpus at all",  # eval
        5: base + " extra tail words",            # near-dup of eval doc 0
        7: "an unrelated document about ray data pipelines and arrow "
           "batches streaming through the object store with backpressure",
        13: base,                                 # exact dup of eval doc 0
    }
    t = pa.table({
        "doc_id": pa.array(list(rows), type=pa.int64()),
        "text": pa.array(list(rows.values())),
    })
    out = cross_corpus_flags(ray.data.from_arrow(t)).to_pandas() \
        .set_index("doc_id")["contaminated"]
    assert set(out.index) == {5, 7, 13}  # eval docs excluded from output
    assert out[13] == 1                  # exact copy always collides
    assert out[5] == 1                   # near-dup shares >= 1 band
    assert out[7] == 0
    # partition independence
    out2 = cross_corpus_flags(ray.data.from_arrow(t).repartition(4)) \
        .to_pandas().set_index("doc_id")["contaminated"]
    assert out2.sort_index().equals(out.sort_index())


def test_cross_corpus_flags_exact_tuple_bruteforce(ray_session):
    """The operator's band-membership probe equals a brute-force
    minima-TUPLE comparison (round 5: the probe ships the 128-bit
    packed tuple itself, not a folded key — the SQL twin's join,
    reproduced exactly)."""
    import ray.data

    from maskmypy_ray.text.dedup import (N_BANDS, ROWS_PER_BAND,
                                         cross_corpus_flags,
                                         minhash_sig_batch)

    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(60)]
    n, every = 120, 10
    texts = [" ".join(rng.choice(vocab, size=rng.integers(8, 30)))
             for _ in range(n)]
    # plant near-dups of eval docs at non-eval ids
    texts[13] = texts[0] + " tail"
    texts[27] = texts[20]
    t = pa.table({
        "doc_id": pa.array(np.arange(n), type=pa.int64()),
        "text": pa.array(texts),
    })
    got = cross_corpus_flags(ray.data.from_arrow(t).repartition(5),
                             every=every).to_pandas() \
        .set_index("doc_id")["contaminated"].sort_index()
    ids, sig = minhash_sig_batch(t)
    per = sig.reshape(n, N_BANDS, ROWS_PER_BAND)
    is_eval = ids % every == 0
    want = {}
    for i in range(n):
        if is_eval[i]:
            continue
        hit = any(
            (per[i, b] == per[j, b]).all()
            for j in np.nonzero(is_eval)[0] for b in range(N_BANDS))
        want[int(ids[i])] = int(hit)
    assert got.to_dict() == want
    assert got.sum() >= 2  # the planted dup and near-dup are caught


def test_shuffle_shards_matches_bruteforce_and_partitioning(ray_session):
    import pandas as pd
    import ray

    from maskmypy_ray.rng import substream
    from maskmypy_ray.text.corpus import shuffle_shards

    ids = np.arange(977, dtype=np.int64) * 3 + 11  # sparse, non-contiguous
    t = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
    got = shuffle_shards(ray.data.from_arrow(t), n_shards=4, seed=123,
                         buckets=32).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    key = substream(ids, 123, 914)
    df = pd.DataFrame({"doc_id": ids, "key": key, "shard": key % 4})
    df = df.sort_values(["shard", "key", "doc_id"])
    df["pos"] = df.groupby("shard").cumcount()
    want = df.sort_values("doc_id").reset_index(drop=True)
    assert (got["shard"].to_numpy() == want["shard"].to_numpy()).all()
    assert (got["pos"].to_numpy() == want["pos"].to_numpy()).all()
    # every shard is a contiguous 0..n-1 rank range (a valid dataloader
    # order), and the result is independent of input partitioning
    sizes = want.groupby("shard")["pos"].agg(["max", "size"])
    assert (sizes["max"] + 1 == sizes["size"]).all()
    got2 = shuffle_shards(ray.data.from_arrow(t).repartition(7), n_shards=4,
                          seed=123, buckets=32).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got2.equals(got)


def test_shuffle_shards_rejects_non_pow2_buckets(ray_session):
    import ray

    from maskmypy_ray.text.corpus import shuffle_shards

    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64())})
    with pytest.raises(ValueError):
        shuffle_shards(ray.data.from_arrow(t), buckets=48)


def test_decontaminate_bloom_no_false_negatives(ray_session):
    """Bloom flags are a superset of exact gram-membership hits under
    the dedup-side gram scheme, and agree on the fixture (the FP rate
    at the default 256-Kbit geometry is ~0 for a handful of grams)."""
    import ray.data

    from maskmypy_ray.text.corpus import decontaminate_bloom

    bench_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        {"doc_id": 0, "text": bench_text},  # benchmark (0 % 97 == 0)
        {"doc_id": 1,
         "text": "alpha beta gamma delta epsilon somethingelse"},
        {"doc_id": 2, "text": "totally unrelated words here none shared"},
        {"doc_id": 3, "text": "short doc"},  # < 5 tokens: no grams
    ]
    out = decontaminate_bloom(ray.data.from_items(rows), n=5).to_pandas()
    out = out.set_index("doc_id").sort_index()
    assert list(out.index) == [1, 2, 3]
    assert out.loc[1, "contaminated"] == 1 and out.loc[1, "n_hit_grams"] == 1
    assert out.loc[2, "contaminated"] == 0
    assert out.loc[3, "n_hit_grams"] == 0


def test_decontaminate_bloom_partition_independent(ray_session, sf_dir):
    """Flags are identical at 1 block and 7 blocks (broadcast bitset +
    stateless probe — no partition coupling anywhere)."""
    import ray.data

    from maskmypy_ray.text.corpus import decontaminate_bloom

    def run(nb):
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"],
                                   override_num_blocks=nb)
        return decontaminate_bloom(ds).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    a, b = run(1), run(7)
    assert a.equals(b)


def test_decontaminate_bloom_oracle_parity(ray_session, sf_dir):
    """Engine output equals the DuckDB twin bit-for-bit — including any
    Bloom false positives (both sides derive positions from mix32)."""
    import duckdb
    import ray.data

    from maskmypy_ray import oracle
    from maskmypy_ray.text.corpus import decontaminate_bloom

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    eng = decontaminate_bloom(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(oracle.decontaminate_bloom_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert eng["doc_id"].tolist() == orc["doc_id"].tolist()
    assert eng["n_hit_grams"].tolist() == orc["n_hit_grams"].tolist()
    assert eng["contaminated"].tolist() == orc["contaminated"].tolist()


def test_minhash_verify_paths_agree(ray_session, sf_dir, monkeypatch):
    """The broadcast-verify fast path (small candidate sets) and the
    2-shuffle attach/verify plan return bit-identical pair sets."""
    import ray.data

    from maskmypy_ray.text import dedup as dedup_mod

    def run():
        ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "text"])
        return dedup_mod.minhash_lsh_pairs(
            dedup_mod.with_mutated_copies(ds), threshold=0.8).to_pandas() \
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    fast = run()
    monkeypatch.setattr(dedup_mod, "LSH_BROADCAST_VERIFY_MAX_PAIRS", 0)
    slow = run()
    assert len(fast) > 0 and fast.equals(slow)


# ---------------------------------------------------------------------------
# DSIR importance resampling (round-5 extension)
# ---------------------------------------------------------------------------


def _dsir_docs(sf_dir, nb=4):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"],
                                 override_num_blocks=nb)


def test_dsir_oracle_parity(ray_session, sf_dir):
    """dsir_weights equals the DuckDB twin bit-for-bit: quantized
    log-ratio sums AND the Gumbel resampling keys."""
    import duckdb

    from maskmypy_ray.text.dsir import dsir_sql, dsir_weights

    eng = dsir_weights(_dsir_docs(sf_dir), target_lang="en", seed=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(dsir_sql(target_lang="en", seed=0)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_feats", "logw_micro", "key_micro"):
        assert eng[c].tolist() == orc[c].tolist(), c


def test_dsir_partition_independence(ray_session, sf_dir):
    """Weights are identical regardless of block split (the histogram
    pass pre-aggregates per batch; sums are order-independent int64)."""
    from maskmypy_ray.text.dsir import dsir_weights

    def run(nb):
        return dsir_weights(_dsir_docs(sf_dir, nb)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    assert run(1).equals(run(7))


def test_dsir_sample_enriches_target(ray_session, sf_dir):
    """The Gumbel top-k resample is biased toward the target slice:
    the kept fraction of target-language docs exceeds the pool's."""
    from maskmypy_ray.text.dsir import dsir_sample

    docs = _dsir_docs(sf_dir).to_pandas()
    kept = dsir_sample(_dsir_docs(sf_dir), k=50).to_pandas()
    kept_lang = docs[docs.doc_id.isin(kept.doc_id)]["lang"]
    pool_frac = (docs["lang"] == "en").mean()
    assert (kept_lang == "en").mean() > pool_frac
    assert len(kept) == 50
    # keys are returned sorted descending, ties by doc_id
    k = kept["key_micro"].to_numpy()
    assert (k[:-1] >= k[1:]).all()


def test_dsir_empty_and_short_docs(ray_session):
    """Empty docs score 0 with 0 features; 1-token docs contribute a
    unigram but no bigram (short_doc='skip')."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.text.dsir import dsir_weights

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["", "word", "two words here"]),
        "lang": pa.array(["en", "en", "de"]),
    })
    out = dsir_weights(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["n_feats"].tolist() == [0, 1, 5]  # 0; 1 uni; 3 uni + 2 bi
    assert out.loc[0, "logw_micro"] == 0


def test_source_similarity_oracle_parity(ray_session, sf_dir):
    """Per-source MinHash signatures and pairwise match counts equal
    the DuckDB twin bit-for-bit (including the dyadic jaccard_est)."""
    import duckdb
    import ray.data

    from maskmypy_ray import oracle
    from maskmypy_ray.text.dedup import source_minhash_similarity

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "source"],
                               override_num_blocks=5)
    eng = source_minhash_similarity(ds).to_pandas() \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(oracle.source_similarity_sql()).df() \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)
    for c in ("source_a", "source_b", "n_match", "jaccard_est"):
        assert eng[c].tolist() == orc[c].tolist(), c


def test_source_similarity_estimates_true_jaccard(ray_session, sf_dir):
    """On two constructed sources sharing half their docs, the MinHash
    estimate lands near the TRUE shingle-set Jaccard (the union-min
    identity makes the source signature a real MinHash, so the usual
    ~1/sqrt(64) error bound applies)."""
    import pyarrow.parquet as pq
    import ray.data

    from maskmypy_ray.text.dedup import (_shingle_hashes,
                                         source_minhash_similarity)

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    docs = t.to_pandas().head(60)
    # A = docs 0..39, B = docs 20..59 -> true overlap on shingle sets
    rows = []
    for i, r in docs.iterrows():
        if i < 40:
            rows.append((int(r.doc_id), r.text, "A"))
        if i >= 20:
            rows.append((int(r.doc_id) + 100000, r.text, "B"))
    import pyarrow as pa

    tbl = pa.table({"doc_id": pa.array([x[0] for x in rows], type=pa.int64()),
                    "text": pa.array([x[1] for x in rows]),
                    "source": pa.array([x[2] for x in rows])})
    out = source_minhash_similarity(
        ray.data.from_arrow(tbl)).to_pandas()
    est = float(out.loc[0, "jaccard_est"])
    sa = set().union(*(set(_shingle_hashes(t)) for t in docs.text[:40]))
    sb = set().union(*(set(_shingle_hashes(t)) for t in docs.text[20:60]))
    true_j = len(sa & sb) / len(sa | sb)
    assert abs(est - true_j) < 0.2
    assert est > 0.2  # the overlap is real and detected


def test_line_filter_oracle_parity(ray_session, sf_dir):
    """line_filter(with_lines(.)) equals the DuckDB twin byte-for-byte,
    including the reassembled cleaned text."""
    import duckdb
    import ray.data

    from maskmypy_ray.text.lines import line_filter, line_filter_sql, with_lines

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=5)
    eng = line_filter(with_lines(ds, seed=0)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(line_filter_sql(seed=0)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_lines", "n_kept", "text"):
        assert eng[c].tolist() == orc[c].tolist(), c
    # the filter does real work on the fixture: some lines dropped,
    # some kept, boilerplate never survives
    assert 0 < eng["n_kept"].sum() < eng["n_lines"].sum()
    assert not eng["text"].str.contains("javascript").any()


def test_line_filter_rules():
    """Unit rules: terminal punctuation, min words, boilerplate."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.text.lines import line_filter

    t = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array([
            "good line with words.\nno punct here\nok.\n"
            "please enable javascript and cookies.\naccept our cookie policy.",
            "",
        ]),
    })
    out = line_filter(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "n_lines"] == 5
    assert out.loc[0, "n_kept"] == 1  # 'ok.' fails min-words
    assert out.loc[0, "text"] == "good line with words."
    assert out.loc[1, "n_lines"] == 0 and out.loc[1, "text"] == ""


def test_bm25_search_oracle_parity(ray_session, sf_dir):
    """bm25_search equals the DuckDB twin bit-for-bit (integer-rational
    scores, rank 1..k by score desc / doc_id asc)."""
    import duckdb
    import ray.data

    from maskmypy_ray.text.lm import bm25_search, bm25_search_sql

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=5)
    eng = bm25_search(ds, k=5).to_pandas() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(bm25_search_sql(k=5)).df() \
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    for c in ("query_id", "rank", "doc_id", "score_micro"):
        assert eng[c].tolist() == orc[c].tolist(), c


def test_bm25_search_only_matching_docs(ray_session):
    """Docs with no query term never appear; scores sum the per-term
    BM25 over DISTINCT query terms (query tf ignored)."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.text.lm import bm25_search

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["apple banana cherry", "apple apple apple",
                          "durian elderberry fig"]),
    })
    out = bm25_search(ray.data.from_arrow(t),
                      queries=("apple apple banana",), k=10).to_pandas()
    assert set(out["doc_id"]) == {1, 2}  # doc 3 matches nothing
    assert (out["query_id"] == 0).all()
    # doc 1 matches both terms, doc 2 only 'apple' (higher tf) — both
    # present with positive scores
    assert (out["score_micro"] > 0).all()


def test_snapshot_delta_oracle_parity(ray_session, sf_dir):
    """snapshot_delta + stats equal the DuckDB twin bit-for-bit."""
    import duckdb

    from maskmypy_ray import oracle
    from maskmypy_ray.sources.webpages import read_webpages
    from maskmypy_ray.text.snapshots import (snapshot_delta,
                                             snapshot_delta_sql,
                                             snapshot_delta_stats)

    pages = read_webpages(sf_dir, seed=42, include_html=False)
    eng = snapshot_delta(pages).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(snapshot_delta_sql(oracle.pages_cte(42))).df() \
        .sort_values("url").reset_index(drop=True)
    assert eng["url"].tolist() == orc["url"].tolist()
    assert eng["status"].tolist() == orc["status"].tolist()
    st = snapshot_delta_stats(
        read_webpages(sf_dir, seed=42, include_html=False)).to_pandas() \
        .sort_values(["host", "status"]).reset_index(drop=True)
    orc_h = con.execute(
        snapshot_delta_sql(oracle.pages_cte(42), per_host=True)).df() \
        .sort_values(["host", "status"]).reset_index(drop=True)
    for c in ("host", "status", "n"):
        assert st[c].tolist() == orc_h[c].tolist(), c


def test_snapshot_delta_statuses():
    """Unit semantics on a constructed pair of snapshots: the doc_id
    rules produce each of the four statuses."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.text.snapshots import snapshot_delta

    # doc_ids chosen to hit each rule: 13 -> removed, 7 -> changed,
    # 11 -> added (plus unchanged), 1 -> unchanged
    t = pa.table({
        "doc_id": pa.array([1, 7, 11, 13], type=pa.int64()),
        "url": pa.array([f"https://h{i}.org/p" for i in (1, 7, 11, 13)]),
        "text": pa.array(["a b c", "d e f", "g h i", "j k l"]),
    })
    out = snapshot_delta(ray.data.from_arrow(t)).to_pandas() \
        .set_index("url")["status"]
    assert out["https://h1.org/p"] == 0   # unchanged
    assert out["https://h7.org/p"] == 1   # changed
    assert out["https://h11.org/p"] == 0  # original unchanged...
    assert out["https://h11.org/p?v=2"] == 2  # ...copy added
    assert out["https://h13.org/p"] == 3  # removed


def test_new_ops_partition_independence(ray_session, sf_dir):
    """Round-5 extension ops are block-split independent: partial
    aggregation / per-partition kernels never depend on batch
    boundaries (nb=1 vs nb=7 bit-identical)."""
    import ray.data

    from maskmypy_ray.sources.webpages import read_webpages
    from maskmypy_ray.text.dedup import source_minhash_similarity
    from maskmypy_ray.text.lines import line_filter, with_lines
    from maskmypy_ray.text.lm import bm25_search
    from maskmypy_ray.text.snapshots import snapshot_delta

    def run(nb):
        def docs(cols):
            return ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                         columns=cols,
                                         override_num_blocks=nb)

        return {
            "srcsim": source_minhash_similarity(
                docs(["doc_id", "text", "source"])).to_pandas()
                .sort_values(["source_a", "source_b"])
                .reset_index(drop=True),
            "lines": line_filter(with_lines(docs(["doc_id", "text"]),
                                            seed=0)).to_pandas()
                .sort_values("doc_id").reset_index(drop=True),
            "bm25s": bm25_search(docs(["doc_id", "text"]), k=5)
                .to_pandas().sort_values(["query_id", "rank"])
                .reset_index(drop=True),
            "delta": snapshot_delta(
                read_webpages(sf_dir, seed=42, include_html=False)
                .repartition(nb)).to_pandas()
                .sort_values("url").reset_index(drop=True),
        }

    a, b = run(1), run(7)
    for name in a:
        assert a[name].equals(b[name]), name


def test_zipf_fit_oracle_parity(ray_session, sf_dir):
    import duckdb
    import ray.data

    from maskmypy_ray.text.lm import zipf_fit, zipf_fit_sql

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=5)
    eng = zipf_fit(ds).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(zipf_fit_sql()).df()
    assert eng.equals(orc)


def test_zipf_fit_recovers_known_slope(ray_session):
    """A corpus constructed with count(rank) ~ rank^-1 recovers slope
    ~ -1 (the natural-text signature the diagnostic detects)."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.text.lm import zipf_fit

    words = [f"w{i}" for i in range(50)]
    text = " ".join(w for r, w in enumerate(words, 1)
                    for _ in range(max(1, 1000 // r)))
    t = pa.table({"doc_id": pa.array([1], type=pa.int64()),
                  "text": pa.array([text])})
    out = zipf_fit(ray.data.from_arrow(t)).to_pandas()
    assert abs(out.loc[0, "slope"] + 1.0) < 0.1


def test_trimmed_source_stats_oracle_parity(ray_session, sf_dir):
    import duckdb
    import ray.data

    from maskmypy_ray.text.quality import (trimmed_source_stats,
                                           trimmed_source_stats_sql)

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "n_chars"],
                               override_num_blocks=5)
    eng = trimmed_source_stats(ds).to_pandas() \
        .sort_values("source").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(trimmed_source_stats_sql()).df() \
        .sort_values("source").reset_index(drop=True)
    assert eng.equals(orc)


def test_trimmed_mean_resists_outliers(ray_session):
    """One giant page must not move a source's trimmed mean."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.text.quality import trimmed_source_stats

    vals = [100] * 19 + [10_000_000]  # one absurd outlier
    t = pa.table({"source": pa.array(["s"] * 20),
                  "n_chars": pa.array(vals, type=pa.int64())})
    out = trimmed_source_stats(ray.data.from_arrow(t)).to_pandas()
    assert out.loc[0, "trimmed_mean"] == 100.0
    assert out.loc[0, "n_kept"] == 19


def test_dup_gram_fraction_oracle_parity(ray_session, sf_dir):
    import duckdb

    from maskmypy_ray.oracle import dup_gram_fraction_sql
    from maskmypy_ray.text.dedup import dup_gram_fraction

    eng = dup_gram_fraction(_dsir_docs(sf_dir).select_columns(
        ["doc_id", "text"]), k=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(dup_gram_fraction_sql(k=8)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert eng.equals(orc)


def test_dup_gram_fraction_semantics(ray_session):
    """A doc sharing half its 3-grams with another scores 0.5-ish;
    a unique doc scores 0; short docs have 0 grams."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.text.dedup import dup_gram_fraction

    shared = "one two three four five"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            shared,                               # 3 grams, all shared
            shared + " six seven eight",          # 6 grams, 3 shared
            "nine ten eleven twelve thirteen",    # unique
            "hi",                                 # < k tokens
        ]),
    })
    out = dup_gram_fraction(ray.data.from_arrow(t), k=3).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "dup_frac"] == 1.0
    assert out.loc[2, "dup_frac"] == 0.5
    assert out.loc[3, "dup_frac"] == 0.0 and out.loc[3, "n_grams"] == 3
    assert out.loc[4, "n_grams"] == 0 and out.loc[4, "dup_frac"] == 0.0


def test_curate_corpus_oracle_parity(ray_session, sf_dir):
    """The end-to-end curation pipeline (quality -> exact dedup ->
    near-dup clusters -> decontamination) matches its self-contained
    SQL twin verdict-for-verdict, with every stage doing real work on
    the enriched fixture."""
    import duckdb

    from maskmypy_ray.text.curate import curate_corpus, curate_corpus_sql

    eng = curate_corpus(_dsir_docs(sf_dir).select_columns(
        ["doc_id", "text"])).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(curate_corpus_sql()).df() \
        .sort_values("doc_id").reset_index(drop=True)
    assert eng["doc_id"].tolist() == orc["doc_id"].tolist()
    assert eng["status"].tolist() == orc["status"].tolist()
    counts = eng["status"].value_counts()
    # one verdict per enriched-corpus doc; dedup stages really fire
    assert eng["doc_id"].is_unique
    assert counts.get("exact_dup", 0) > 0
    assert counts.get("near_dup", 0) > 0
    assert counts.get("kept", 0) > 0


def test_novel_gram_fraction_vs_brute(ray_session, sf_dir):
    import numpy as np
    import pandas as pd

    from maskmypy_ray.text.dedup import novel_gram_fraction

    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    got = novel_gram_fraction(docs, k=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # novelty sums: every gram is novel for exactly one doc, so
    # sum(n_new) == number of distinct grams in the corpus
    from maskmypy_ray.text.dedup import span_hashes_batch
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    g = span_hashes_batch(t, 8, "text").to_pandas()
    assert int(got["n_new"].sum()) == g["gram_hash"].nunique()
    # brute per-doc check
    first = g.groupby("gram_hash")["doc_id"].min()
    g["novel"] = g["gram_hash"].map(first) == g["doc_id"]
    brute = g.groupby("doc_id")["novel"].agg(["size", "sum"])
    merged = got.set_index("doc_id").join(brute, how="left")
    nz = merged["size"].notna()
    assert (merged.loc[nz, "n_grams"] == merged.loc[nz, "size"]).all()
    assert (merged.loc[nz, "n_new"] == merged.loc[nz, "sum"]).all()
    assert (merged.loc[~nz, "n_grams"] == 0).all()


def test_dedup_lines_oracle_parity(ray_session, sf_dir):
    """dedup_lines(with_lines(.)) equals the DuckDB twin byte-for-byte,
    including the reassembled deduped text."""
    import duckdb
    import ray.data

    from maskmypy_ray.text.lines import dedup_lines, dedup_lines_sql, with_lines

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=5)
    eng = dedup_lines(with_lines(ds, seed=0)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(dedup_lines_sql(seed=0)).df() \
        .sort_values("doc_id").reset_index(drop=True)
    for c in ("doc_id", "n_lines", "n_kept", "text"):
        assert eng[c].tolist() == orc[c].tolist(), c
    # real work: duplicate lines exist (boilerplate) and drop
    assert 0 < eng["n_kept"].sum() < eng["n_lines"].sum()
    # the boilerplate line survives in exactly ONE doc corpus-wide
    n_boiler = eng["text"].str.count("please enable javascript").sum()
    assert n_boiler == 1


def test_dedup_lines_semantics(ray_session):
    """First occurrence wins globally; within-doc repeats collapse;
    empty docs reassemble to (0, 0, '')."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.text.lines import dedup_lines

    t = pa.table({
        "doc_id": pa.array([3, 1, 7], type=pa.int64()),
        "text": pa.array([
            "shared line.\nunique to three.",
            "first line.\nshared line.\nshared line.\nfirst line.",
            "",
        ]),
    })
    out = dedup_lines(ray.data.from_arrow(t).repartition(3)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 3, 7]
    assert out["n_lines"].tolist() == [4, 2, 0]
    assert out["n_kept"].tolist() == [2, 1, 0]
    # doc 1 keeps its first 'first line.' and 'shared line.' (min doc
    # wins the cross-doc tie; within-doc repeats collapse)
    assert out.loc[0, "text"] == "first line.\nshared line."
    assert out.loc[1, "text"] == "unique to three."
    assert out.loc[2, "text"] == ""


def test_pmi_topk_oracle_parity(ray_session, sf_dir):
    """pmi_topk equals the HUGEINT-product DuckDB twin exactly,
    including the quantized PMI values and the (pmi desc, gram) order."""
    import duckdb
    import ray.data

    from maskmypy_ray import pipelines as p

    eng = p.FULL_QUERIES["pmi_topk"](sf_dir).to_pandas() \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(p.full_oracle_queries()["pmi_topk"]).df()
    assert len(eng) == 20
    for c in ("gram", "n", "pmi_micro"):
        assert eng[c].tolist() == orc[c].tolist(), c
    # PMI does real reranking: the top PMI pair is NOT the top count
    # pair on this corpus, and every candidate clears the count floor
    assert (eng["n"] >= 5).all()


def test_pmi_topk_known_corpus(ray_session):
    """Hand-checkable PMI: a pair that always co-occurs beats a pair
    of frequent-but-independent tokens."""
    import pyarrow as pa
    import ray.data

    from maskmypy_ray.text.quality import pmi_topk

    # 'zig zag' appears 5x and its tokens appear nowhere else;
    # 'the cat' appears 5x but 'the' is everywhere
    docs = ["zig zag . the cat sat", "zig zag . the cat ran",
            "zig zag . the dog sat", "zig zag . the cow ran",
            "zig zag . the cat hid the bone the end"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs)})
    out = pmi_topk(ray.data.from_arrow(t).repartition(2),
                   k=5, min_count=3).to_pandas()
    assert out.loc[0, "gram"] == "zig zag"
    assert out.loc[0, "n"] == 5
    ranks = {g: i for i, g in enumerate(out["gram"])}
    assert ranks["zig zag"] < ranks.get("the cat", 99)

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

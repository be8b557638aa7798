"""Corpus curation: benchmark decontamination over the documents table.

The standard training-data hygiene step (remove training documents that
share long n-grams with an evaluation benchmark — e.g. GPT-3 appendix C,
PaLM §B.4): the benchmark side is always small and fixed, so the 100-TB
shape is a broadcast hash-set membership test inside ``map_batches`` —
never a shuffle join. The benchmark gram set is compiled in a Ray task
from the filtered dataset's block refs (driver never holds the text) and
shipped once via the object store.

Gram hashing is fully vectorized: one batch-wide RE2 split +
dictionary-encode, md5 only per DISTINCT token (content-based, so hashes
agree across batches and across the compile/flag stages), then one
fixed-position uint64 mix over sliding windows — no per-gram Python.
Collision probability over a ``|corpus grams| x |benchmark grams|``
membership test is ~1e-8 at billions of grams; the oracle compares exact
strings, so any collision would surface as a hash mismatch in
CORRECTNESS.
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pyarrow as pa

BENCH_MOD = 97  # doc_id % BENCH_MOD == 0 -> benchmark member (fixture rule)

# odd 64-bit position multipliers + splitmix64 finalizer constants
_POS_MULT = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5,
                      0x9E3779B97F4A7C55], dtype=np.uint64)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche finalizer (vectorized, wraps mod 2^64)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _batch_gram_hashes(batch: pa.Table, n: int,
                       text_col: str = "text"):
    """(seg, gram_hash) for every full word n-gram in the batch, position
    ordered, duplicates included. Vectorized: tokens are dictionary-
    encoded once, md5 runs per DISTINCT token, and each window hash is a
    position-weighted uint64 mix of its token hashes."""
    from .quality import _flat_tokens

    assert n <= len(_POS_MULT), f"n > {len(_POS_MULT)} needs more multipliers"
    seg, tok, vocab, nrows = _flat_tokens(batch, text_col)
    if len(tok) < n:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64),
                nrows)
    # content-based hash per DISTINCT token (md5 runs |vocab| times, not
    # |tokens| times; hashes agree across batches because they depend
    # only on the token string)
    words = vocab.to_pylist()
    th_vocab = np.frombuffer(
        b"".join(md5(w.encode()).digest()[:8] for w in words),
        dtype=np.uint64)
    th = th_vocab[tok]
    # sliding windows: h = mix64(xor_i(th[pos+i] * POS_MULT[i]))
    m = len(th) - n + 1
    acc = th[:m] * _POS_MULT[0]
    for i in range(1, n):
        acc = acc ^ (th[i:m + i] * _POS_MULT[i])
    g = _mix64(acc)
    valid = seg[:m] == seg[n - 1:]
    return seg[:m][valid], g[valid], nrows


def _distinct_per_seg(seg: np.ndarray, g: np.ndarray):
    """Drop duplicate (seg, gram) pairs; returns (seg, gram) sorted."""
    if not len(seg):
        return seg, g
    order = np.lexsort((g, seg))
    ss, gs = seg[order], g[order]
    first = np.ones(len(ss), dtype=bool)
    first[1:] = (gs[1:] != gs[:-1]) | (ss[1:] != ss[:-1])
    return ss[first], gs[first]


def _benchmark_grams_ref(ds, n: int):
    """Union of the benchmark docs' gram hashes. The heavy part (filter +
    tokenize + hash) runs as a parallel Dataset stage; only the tiny
    per-block distinct hash arrays reach the single union task, whose
    result stays in the object store (driver never holds the text)."""
    import ray

    def bench_hashes(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        mask = ids % BENCH_MOD == 0
        if not mask.any():
            return pa.table({"g": pa.array([], type=pa.uint64())})
        _, g, _ = _batch_gram_hashes(b.filter(pa.array(mask)), n)
        return pa.table({"g": pa.array(np.unique(g), type=pa.uint64())})

    hashed = ds.select_columns(["doc_id", "text"]).map_batches(
        bench_hashes, batch_format="pyarrow")

    @ray.remote(num_cpus=1)
    def union(*blocks):
        arrs = [
            (b if isinstance(b, pa.Table) else pa.Table.from_pandas(b))
            .column("g").to_numpy(zero_copy_only=False)
            for b in blocks]
        arrs = [a for a in arrs if len(a)]
        if not arrs:
            return np.empty(0, dtype=np.uint64)
        return np.unique(np.concatenate(arrs))

    return union.remote(*hashed.to_arrow_refs())


SAMPLE_STREAM = 910  # rng stream registry: stratified data-mix sampling


def _source_frac(num: np.ndarray) -> np.ndarray:
    """Per-source keep fraction from the source's numeric suffix:
    (1 + num % 4) / 5 -> 0.2 / 0.4 / 0.6 / 0.8 (a fixed data-mixing
    recipe, mirrored exactly in the SQL oracle)."""
    return (1 + num % 4) / 5.0


def stratified_sample_batch(batch: pa.Table, seed: int) -> pa.Table:
    """Keep each row iff its counter-RNG draw (keyed on doc_id, stream
    910) falls below its source's mix fraction — deterministic at any
    parallelism, no coordination, the standard hash-sampling shape for
    training-data mixing."""
    import pyarrow.compute as pc

    from ..rng import uniform01

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    enc = pc.dictionary_encode(batch.column("source"))
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nums = np.array([int("".join(ch for ch in s if ch.isdigit()) or 0)
                     for s in enc.dictionary.to_pylist()], dtype=np.int64)
    frac = _source_frac(nums)[idx]
    u = uniform01(ids, seed, SAMPLE_STREAM)
    return batch.filter(pa.array(u < frac))


def stratified_sample(ds, seed: int = 42):
    """Dataset of the kept (doc_id, source) rows under the per-source
    mix fractions."""
    return ds.map_batches(lambda b: stratified_sample_batch(b, seed),
                          batch_format="pyarrow") \
        .select_columns(["doc_id", "source"])


def flag_batch(batch: pa.Table, bench: np.ndarray, n: int) -> pa.Table:
    """Per-batch contamination flags: one vectorized gram-hash pass, one
    ``np.isin`` against the broadcast benchmark set, one bincount."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    seg, g, nrows = _batch_gram_hashes(batch, n)
    dseg, dg = _distinct_per_seg(seg, g)
    hit = np.isin(dg, bench, assume_unique=False)
    hits_per_row = np.bincount(dseg[hit], minlength=nrows).astype(np.int64)
    keep = ids % BENCH_MOD != 0
    hits = hits_per_row[keep]
    return pa.table({
        "doc_id": pa.array(ids[keep], type=pa.int64()),
        "n_hit_grams": pa.array(hits, type=pa.int64()),
        "contaminated": pa.array((hits > 0).astype(np.int64), type=pa.int64()),
    })


def decontaminate(ds, n: int = 5):
    """(doc_id, n_hit_grams, contaminated) for every NON-benchmark doc:
    the count of its distinct word n-grams that also occur anywhere in
    the benchmark slice (doc_id % 97 == 0).

    Task-pool stage, not an actor pool: the only per-task state is one
    ``ray.get`` of the broadcast hash array — a zero-copy shared-memory
    read — so plain tasks reach full parallelism instantly instead of
    paying actor-pool ramp-up (measured 2x on a 2 s job)."""
    import ray

    bench_ref = _benchmark_grams_ref(ds, n)

    def flag(batch: pa.Table) -> pa.Table:
        return flag_batch(batch, ray.get(bench_ref), n)

    return ds.map_batches(flag, batch_format="pyarrow")


HOST_RE = r"^https?://(?P<host>[^/]+)"


def domain_stats_partial_batch(batch: pa.Table) -> pa.Table:
    """Per-batch partial aggregate of per-HOST page stats over the web
    corpus (url column): (host, n_pages, n_chars) sums — the domain-level
    twin of source_stats (domain blocklists / per-site caps are standard
    web-curation steps)."""
    import pyarrow.compute as pc

    ex = pc.extract_regex(batch.column("url"), HOST_RE)
    host = pc.struct_field(ex, "host")
    enc = pc.dictionary_encode(host)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    hosts = enc.dictionary.to_pylist()
    n_chr = pc.utf8_length(batch.column("text")).to_numpy(
        zero_copy_only=False).astype(np.int64)
    k = len(hosts)
    return pa.table({
        "host": pa.array(hosts, type=pa.string()),
        "n_pages": pa.array(np.bincount(idx, minlength=k), type=pa.int64()),
        "n_chars": pa.array(
            np.bincount(idx, weights=n_chr, minlength=k).astype(np.int64),
            type=pa.int64()),
    })


def domain_stats(ds):
    """(host, n_pages, n_chars) per URL host, pre-aggregated before the
    one tiny groupby (shuffle = hosts x blocks)."""
    from ray.data.aggregate import Sum

    part = ds.map_batches(domain_stats_partial_batch, batch_format="pyarrow")
    return part.groupby("host").aggregate(
        Sum("n_pages", alias_name="n_pages"),
        Sum("n_chars", alias_name="n_chars"),
    ).map_batches(lambda b: pa.table({
        "host": b.column("host"),
        "n_pages": b.column("n_pages"),
        "n_chars": b.column("n_chars"),
    }), batch_format="pyarrow")


SAMPLE_K_STREAM = 911  # rng stream registry: fixed-k uniform sampling


def sample_fixed_k_partial(batch: pa.Table, k: int, seed: int,
                           key_col: str) -> pa.Table:
    """Per-batch partial: keep the batch's k smallest (u, key) rows —
    caps the sort input at k rows per batch."""
    from ..rng import uniform01

    ids = batch.column(key_col).to_numpy(zero_copy_only=False)
    u = uniform01(ids, seed, SAMPLE_K_STREAM)
    order = np.lexsort((ids, u))[:k]
    order = np.sort(order)
    return pa.table({
        key_col: pa.array(ids[order], type=pa.int64()),
        "u": pa.array(u[order], type=pa.float64()),
    })


def sample_fixed_k(ds, k: int = 100, seed: int = 42, key_col: str = "doc_id"):
    """Deterministic uniform k-sample of a table of ANY size: rank every
    row by its counter-RNG draw u(key) and keep the k smallest
    (ties -> smaller key). Order-, partition- and retry-independent;
    the RNG mirrors into SQL so the selected set is bit-reproducible.

    Scale shape: per-batch partial top-k (k rows leave each batch) then
    one distributed sort + limit over ~k x blocks rows — the standard
    way to cut a fixed eval/debug sample from an arbitrarily large
    corpus without a full shuffle."""
    part = ds.map_batches(
        lambda b: sample_fixed_k_partial(b, k, seed, key_col),
        batch_format="pyarrow")
    return part.sort(["u", key_col]).limit(k)

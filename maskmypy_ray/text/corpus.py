"""Corpus curation: benchmark decontamination over the documents table.

The standard training-data hygiene step (remove training documents that
share long n-grams with an evaluation benchmark — e.g. GPT-3 appendix C,
PaLM §B.4): the benchmark side is always small and fixed, so the 100-TB
shape is a broadcast hash-set membership test inside ``map_batches`` —
never a shuffle join. The benchmark gram set is compiled in a Ray task
from the filtered dataset's block refs (driver never holds the text) and
shipped once via the object store.

Gram hashing uses 64-bit truncated md5 (collision probability over a
``|corpus grams| x |benchmark grams|`` membership test is ~1e-8 at
billions of grams — the oracle compares exact strings, so any collision
would surface as a hash mismatch in CORRECTNESS).
"""

from __future__ import annotations

from hashlib import md5

import numpy as np
import pyarrow as pa

from .dedup import TOKEN_RE

BENCH_MOD = 97  # doc_id % BENCH_MOD == 0 -> benchmark member (fixture rule)


def _gram_hashes64(text: str, n: int) -> np.ndarray:
    """Distinct 64-bit hashes of the full word n-grams of ``text``
    (strict: documents shorter than ``n`` tokens contribute none —
    mirrors the SQL oracle's zip-based gram generation)."""
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    grams = (" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
    return np.unique(np.frombuffer(
        b"".join(md5(g.encode()).digest()[:8] for g in grams), dtype=np.uint64))


def _benchmark_grams_ref(ds, n: int):
    """Union of the benchmark docs' gram hashes, compiled off-driver
    (same block-refs-into-a-task pattern as sim.ann's broadcast matrix)."""
    import ray

    @ray.remote(num_cpus=1)
    def compile_task(*blocks):
        sets = []
        for b in blocks:
            tbl = b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
            ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
            texts = tbl.column("text").to_pylist()
            for d, t in zip(ids, texts):
                if d % BENCH_MOD == 0:
                    sets.append(_gram_hashes64(t, n))
        if not sets:
            return np.empty(0, dtype=np.uint64)
        return np.unique(np.concatenate(sets))

    refs = ds.select_columns(["doc_id", "text"]).to_arrow_refs()
    return compile_task.remote(*refs)


class Decontaminator:
    """Actor-pool stage: flags non-benchmark docs sharing any full word
    n-gram with the broadcast benchmark set. The (sorted) benchmark hash
    array is fetched once per actor in ``__init__``; each batch is one
    vectorized ``np.isin`` against it."""

    def __init__(self, bench_ref, n: int):
        import ray

        self.bench = ray.get(bench_ref)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        keep = ids % BENCH_MOD != 0
        out_id, out_hits = [], []
        for d, t in zip(ids[keep], [x for x, k in zip(texts, keep) if k]):
            g = _gram_hashes64(t, self.n)
            out_id.append(d)
            out_hits.append(int(np.isin(g, self.bench, assume_unique=True).sum())
                            if len(g) else 0)
        hits = np.asarray(out_hits, dtype=np.int64)
        return pa.table({
            "doc_id": pa.array(np.asarray(out_id, dtype=np.int64), type=pa.int64()),
            "n_hit_grams": pa.array(hits, type=pa.int64()),
            "contaminated": pa.array((hits > 0).astype(np.int64), type=pa.int64()),
        })


def decontaminate(ds, n: int = 5):
    """(doc_id, n_hit_grams, contaminated) for every NON-benchmark doc:
    the count of its distinct word n-grams that also occur anywhere in
    the benchmark slice (doc_id % 97 == 0)."""
    from ..util import auto_concurrency

    bench_ref = _benchmark_grams_ref(ds, n)
    return ds.map_batches(Decontaminator, batch_format="pyarrow",
                          concurrency=auto_concurrency(),
                          fn_constructor_args=(bench_ref, n))

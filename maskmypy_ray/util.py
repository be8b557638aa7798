"""Small Ray helpers."""

from __future__ import annotations


def auto_concurrency(cap: int = 64) -> tuple[int, int]:
    """Autoscaling actor-pool bounds (min 1, max = CPUs - 2 capped).

    A FIXED pool equal to the CPU count reserves every slot and starves
    the upstream read stage (deadlock on small ray.init sessions); an
    autoscaling (1, N) pool starts at 1 actor and grows only while CPUs
    are free.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return (1, max(1, min(cap, cpus - 2)))


def run_local_ranks(new):
    """0-based rank of each row WITHIN its run, given run-start
    indicator ``new`` over rows already sorted so each run is
    contiguous — one vectorized arange-minus-starts, no per-run loop.
    The segmented building block shared by the LSH pair kernels
    (:func:`segmented_pair_indices`) and the keyed-prefix-sum rank
    assignment in ``text.corpus.shuffle_shards``."""
    import numpy as np

    if not len(new):
        return np.array([], dtype=np.int64)
    starts = np.nonzero(new)[0]
    run = np.cumsum(new) - 1
    return np.arange(len(new), dtype=np.int64) - starts[run]


def segmented_pair_indices(new):
    """Row positions ``(ia, ib)`` of every within-run pair (``ia < ib``,
    same run) given run-start indicator ``new`` over rows already sorted
    so each bucket is a contiguous run — ONE segmented arange, no
    per-bucket Python loop. Shared by the MinHash-, SimHash- and
    sign-LSH bucket→candidate-pair kernels: at web scale one coarse
    partition holds millions of colliding buckets, so a per-bucket
    pandas groupby loop (~70 us each) is the path's real hot spot
    (measured 55x on 200k buckets)."""
    import numpy as np

    if not len(new):
        z = np.array([], dtype=np.int64)
        return z, z
    starts = np.nonzero(new)[0]
    run = np.cumsum(new) - 1
    local = run_local_ranks(new)
    M = int(local.sum())
    if not M:
        z = np.array([], dtype=np.int64)
        return z, z
    ib = np.repeat(np.arange(len(new), dtype=np.int64), local)
    csum = np.cumsum(local)
    inner = np.arange(M) - np.repeat(csum - local, local)
    ia = np.repeat(starts[run], local) + inner
    return ia, ib


def pair_ids_ref(pairs_ds, col_a: str, col_b: str):
    """Sorted distinct ids appearing in either side column of a
    (materialized) candidate-pair Dataset, compiled in a single Ray task
    from the pair blocks — the driver holds only the ObjectRef, so
    candidates never visit the driver. Size is bounded by the candidate
    count (the mass the verify stage holds anyway); each block is
    deduped as it is consumed so the task's peak stays at the per-block
    distinct sum. Used by the LSH verify semi-joins
    (text.dedup.minhash_lsh_pairs, sim.ann.cosine_pairs_lsh) to filter
    the big payload table (shingles / embeddings) to candidate members
    BEFORE its tokenize/cast stage and its partition all-to-all."""
    import numpy as np
    import pyarrow as pa
    import ray

    @ray.remote(num_cpus=1)
    def union(*blocks):
        arrs = []
        for b in blocks:
            t = b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
            # empty map_groups partitions yield schema-less blocks
            if not t.num_rows or col_a not in t.column_names:
                continue
            ab = np.concatenate([
                t.column(col_a).to_numpy(zero_copy_only=False),
                t.column(col_b).to_numpy(zero_copy_only=False)])
            arrs.append(np.unique(ab.astype(np.int64)))
        if not arrs:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(arrs))

    return union.remote(*pairs_ds.to_arrow_refs())


def sorted_member_mask(sorted_ids, ids):
    """Boolean membership of ``ids`` in the broadcast sorted array —
    one searchsorted probe, no Python sets."""
    import numpy as np

    if not len(sorted_ids):
        return np.zeros(len(ids), dtype=bool)
    pos = np.searchsorted(sorted_ids, ids)
    return (pos < len(sorted_ids)) & \
        (sorted_ids[np.minimum(pos, len(sorted_ids) - 1)] == ids)

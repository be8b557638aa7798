"""Per-partition checkpointed, resumable pipeline runs.

The reference's only resume story is replay-by-recipe with checksum
validation (`/root/reference/maskmypy/atlas.py:302-318,229-233`). At
10^12-row scale a run must instead be resumable mid-way: output is laid
out as one directory per input shard —

    out_dir/part=0007/ *.parquet + _MANIFEST.json

— each written ATOMICALLY (write to a hidden tmp dir, fsync-free rename)
with a manifest carrying rows, content checksum, the params fingerprint,
and lineage metrics (unmasked counts, displacement partials). A rerun
with identical params skips every shard whose manifest validates; a
partial/crashed shard leaves only a tmp dir, which is discarded.

Sharding: with a many-file input each shard is a file subset (column
pruning + row-group pushdown keep reads cheap); the single-file driver
testdata falls back to hash-bucketing ``doc_id % num_shards`` at the read
(documented scale caveat: re-reads the file per shard — irrelevant once
the input is sharded on storage, as any 100 TB crawl is).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from hashlib import sha256
from pathlib import Path

from .checksum import checksum


def _params_fingerprint(params: dict) -> str:
    return sha256(json.dumps(params, sort_keys=True, default=str).encode()).hexdigest()[:16]


def _shard_ds(sf_dir: str, shard: int, num_shards: int, seed: int):
    import pyarrow.compute as pc
    import ray.data

    from .sources.webpages import derive_webpages_batch

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang", "source"])
    ds = ds.map_batches(
        lambda b: derive_webpages_batch(
            b.filter(pc.equal(pc.bit_wise_and(b.column("doc_id"), num_shards - 1), shard)),
            seed=seed, include_html=False),
        batch_format="pyarrow")
    return ds


def run_checkpointed(sf_dir: str, pipeline_fn, out_dir: str, params: dict,
                     num_shards: int = 8, seed: int = 42) -> dict:
    """Run ``pipeline_fn(webpages_shard_ds) -> Dataset`` per shard with
    skip-if-done semantics. ``num_shards`` must be a power of two.

    Returns a run report: per-shard status + aggregated lineage metrics.
    """
    assert num_shards & (num_shards - 1) == 0, "num_shards must be a power of two"
    fp = _params_fingerprint({**params, "num_shards": num_shards, "seed": seed})
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    report = {"params_fingerprint": fp, "shards": [], "rows": 0,
              "skipped": 0, "computed": 0}
    for shard in range(num_shards):
        part = out / f"part={shard:04d}"
        manifest_path = part / "_MANIFEST.json"
        if manifest_path.exists():
            try:
                man = json.loads(manifest_path.read_text())
            except json.JSONDecodeError:
                man = None
            if man and man.get("params_fingerprint") == fp:
                report["shards"].append({"shard": shard, "status": "skipped",
                                         "rows": man["rows"]})
                report["rows"] += man["rows"]
                report["skipped"] += 1
                continue
        if part.exists():
            shutil.rmtree(part)
        tmp = out / f".tmp-part={shard:04d}-{os.getpid()}"
        if tmp.exists():
            shutil.rmtree(tmp)
        t0 = time.perf_counter()
        result = pipeline_fn(_shard_ds(sf_dir, shard, num_shards, seed)).materialize()
        rows = result.count()
        result.write_parquet(str(tmp))
        chk = checksum(result, columns=["url", "mx", "my"]) if rows else "empty"
        metrics = {"rows": rows}
        cols = result.schema().names if rows else []
        if "UNMASKED" in cols:
            from ray.data.aggregate import Sum

            metrics["unmasked"] = int(result.aggregate(Sum("UNMASKED"))["sum(UNMASKED)"])
        if "_distance" in cols and rows:
            from ray.data.aggregate import Max, Mean, Min

            agg = result.aggregate(Min("_distance"), Max("_distance"), Mean("_distance"))
            metrics["displacement_min"] = float(agg["min(_distance)"])
            metrics["displacement_max"] = float(agg["max(_distance)"])
            metrics["displacement_mean"] = float(agg["mean(_distance)"])
        man = {
            "shard": shard,
            "params_fingerprint": fp,
            "params": {k: v for k, v in params.items()},
            "rows": rows,
            "checksum": chk,
            "metrics": metrics,
            "elapsed_sec": round(time.perf_counter() - t0, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        (tmp / "_MANIFEST.json").write_text(json.dumps(man, indent=1))
        os.rename(tmp, part)
        report["shards"].append({"shard": shard, "status": "computed", "rows": rows,
                                 **{k: v for k, v in metrics.items() if k != "rows"}})
        report["rows"] += rows
        report["computed"] += 1
    (out / "_RUN.json").write_text(json.dumps(report, indent=1))
    return report


def read_checkpointed(out_dir: str):
    """Dataset over all completed partitions (ignores tmp dirs)."""
    import ray.data

    files = sorted(str(f) for p in Path(out_dir).glob("part=*") if p.is_dir()
                   for f in p.glob("*.parquet"))
    return ray.data.read_parquet(files)

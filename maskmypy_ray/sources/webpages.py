"""Deterministic Common-Crawl-style web-page table (BASELINE.json input_hint).

The driver testdata ships a ``documents`` table with columns
``(doc_id, text, lang, source, n_chars)`` but no coordinates. Per
FIXTURES.md F1, this module derives the input_hint shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
from it **deterministically**: ~90% of pages get exactly one geoparseable
``"Located at <lat>, <lon>."`` sentence appended (6-dp fixed-point decimals
drawn from the counter RNG keyed on ``doc_id``), clustered in the
Vancouver-ish fixture bbox mirroring the reference's point fixture
(`/root/reference/tests/conftest.py:31-44`).

The identical derivation is emitted as a DuckDB CTE by
:mod:`maskmypy_ray.oracle`, so the driver's oracle sees byte-identical
``text`` per ``url`` — the graft's core invariant.

``doc_id`` is retained as the engine-internal row key (1:1 with ``url``);
all per-row randomness is keyed on it.
"""

from __future__ import annotations

import os
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import rng
from ..constants import (
    ADDRESSES_PER_DOC,
    COORD_PROB,
    DEFAULT_SEED,
    LAT_BASE_MICRO,
    LAT_SPAN_MICRO,
    LON_FRAC_BASE_MICRO,
    LON_SPAN_MICRO,
)

# Address synthesis (FIXTURES.md F2): 30% of addresses cluster "downtown"
# (hot-cell skew), the rest spread over the full bbox.
DOWNTOWN_PROB = 0.3
DT_LAT_BASE_MICRO = 49_250_000
DT_LAT_SPAN_MICRO = 10_000
DT_LON_FRAC_BASE_MICRO = 100_000
DT_LON_SPAN_MICRO = 20_000

WARC_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def _coord_string_arrays(keys: np.ndarray, seed: int):
    """(has_coord bool array, lat_str, lon_str pyarrow string arrays).

    Fully vectorized: fixed-point micro-degree integers -> zero-padded
    decimal strings via Arrow kernels (no per-row Python)."""
    u0 = rng.uniform01(keys, seed, 0)
    u1 = rng.uniform01(keys, seed, 1)
    u2 = rng.uniform01(keys, seed, 2)
    has = u0 < COORD_PROB
    lat_micro = LAT_BASE_MICRO + np.floor(u1 * LAT_SPAN_MICRO).astype(np.int64)
    lon_frac = LON_FRAC_BASE_MICRO + np.floor(u2 * LON_SPAN_MICRO).astype(np.int64)
    lat_frac_s = pc.utf8_lpad(pc.cast(pa.array(lat_micro % 1_000_000), pa.string()),
                              6, "0")
    lon_frac_s = pc.utf8_lpad(pc.cast(pa.array(lon_frac), pa.string()), 6, "0")
    # constant pieces as SCALARS (Arrow kernels broadcast them) — building
    # pa.array(["..."] * n) per call was pure allocation churn
    lat_str = pc.binary_join_element_wise(pa.scalar("49."), lat_frac_s, "")
    lon_str = pc.binary_join_element_wise(pa.scalar("-123."), lon_frac_s, "")
    return has, lat_str, lon_str


def derive_webpages_batch(batch: pa.Table, seed: int = DEFAULT_SEED,
                          include_html: bool = True) -> pa.Table:
    """documents batch -> input_hint-shaped webpages batch (plus doc_id key).

    All column builds are Arrow compute kernels (zero-copy batch in,
    vectorized string concat out) — this stage runs for every page at
    10^12-row scale and must not loop in Python.
    """
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    keys = doc_id & 0xFFFFFFFF
    has, lat_str, lon_str = _coord_string_arrays(keys, seed)
    text = batch.column("text")
    with_coord = pc.binary_join_element_wise(
        text, pa.scalar(" Located at "), lat_str,
        pa.scalar(", "), lon_str, pa.scalar("."), "")
    out_text = pc.if_else(pa.array(has), with_coord, text)
    url = pc.binary_join_element_wise(
        pa.scalar("https://"), batch.column("source"),
        pa.scalar(".example.org/page/"),
        pc.cast(batch.column("doc_id"), pa.string()), "")
    warc_ts = pa.array(WARC_EPOCH_US + doc_id * 1_000_000, type=pa.timestamp("us"))
    cols = {
        "doc_id": batch.column("doc_id"),
        "url": url,
        "warc_ts": warc_ts,
        "text": out_text,
        "lang": batch.column("lang"),
    }
    if include_html:
        html = pc.binary_join_element_wise(
            pa.scalar("<html><body>"), out_text,
            pa.scalar("</body></html>"), "")
        cols["html"] = pc.cast(html, pa.binary())
    return pa.table(cols)


def read_webpages(sf_dir: str, seed: int = DEFAULT_SEED, include_html: bool = True,
                  replicate: int = 1):
    """Ray Dataset of input_hint-shaped webpages derived from documents.

    Column-pruned read (html is derived, n_chars never loaded); stateless
    vectorized ``map_batches``. ``replicate`` fans each document out into
    that many pages with distinct doc_ids (+= r * 10^6) and therefore
    distinct coordinates — the deterministic bench-scale corpus
    (FIXTURES.md F6; the driver's documents table tops out at 5k rows).
    """
    import ray
    import ray.data

    # One small parquet file would otherwise become ~1 block and serialize
    # the whole derive/geoparse/mask chain. A FIXED split (not CPU-derived)
    # keeps per-task work identical across parallelism levels, so workers
    # amortize their one-time allocation warm-up the same way at N and 4N.
    # 32 (= 2 waves at 16 CPUs, 8 at 4) measured best this round: this
    # sandbox charges each task ~2s of allocation/page-fault fixed cost,
    # so fewer, larger tasks beat fine-grained ones until stragglers
    # dominate (64 -> 28.4s, 32 -> 18.1s, 16 -> 23.5s at 16 CPUs, rep2000).
    nblocks = int(os.environ.get("GRAFT_NBLOCKS", "32"))
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=nblocks,
    )

    def derive(b: pa.Table) -> pa.Table:
        if replicate == 1:
            return derive_webpages_batch(b, seed=seed, include_html=include_html)
        # Replicate in ~64k-row chunks via one take() per chunk, so the
        # Arrow kernels in derive_webpages_batch run over big arrays —
        # calling the derive kernel per-replication (tiny 100-row calls)
        # was dominated by kernel dispatch overhead. Row order and
        # doc_ids are unchanged (r-major, doc_id + r*10^6).
        n = b.num_rows
        doc_id = b.column("doc_id").to_numpy(zero_copy_only=False)
        reps_per_chunk = max(1, 65536 // max(n, 1))
        outs = []
        base = np.arange(n, dtype=np.int64)
        for r0 in range(0, replicate, reps_per_chunk):
            reps = min(reps_per_chunk, replicate - r0)
            rb = b.take(pa.array(np.tile(base, reps)))
            new_ids = (np.tile(doc_id, reps)
                       + np.repeat((np.arange(r0, r0 + reps, dtype=np.int64))
                                   * 1_000_000, n))
            rb = rb.set_column(rb.schema.get_field_index("doc_id"), "doc_id",
                               pa.array(new_ids, type=pa.int64()))
            outs.append(derive_webpages_batch(rb, seed=seed,
                                              include_html=include_html))
        return pa.concat_tables(outs)

    return ds.map_batches(derive, batch_format="pyarrow")


def synth_addresses_batch(batch: pa.Table, seed: int = DEFAULT_SEED) -> pa.Table:
    """documents batch -> 4 address points per doc (FIXTURES.md F2).

    Address j of doc uses RNG streams 32+4j (downtown draw), 33+4j (lat),
    34+4j (lon). 30% cluster downtown -> hot-cell skew for the shuffle
    joins. Mirrored exactly by oracle.addresses_cte().
    """
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    keys = doc_id & 0xFFFFFFFF
    outs = []
    for j in range(ADDRESSES_PER_DOC):
        ub = rng.uniform01(keys, seed, 32 + 4 * j)
        ul = rng.uniform01(keys, seed, 33 + 4 * j)
        uo = rng.uniform01(keys, seed, 34 + 4 * j)
        dt = ub < DOWNTOWN_PROB
        lat_micro = np.where(
            dt,
            DT_LAT_BASE_MICRO + np.floor(ul * DT_LAT_SPAN_MICRO).astype(np.int64),
            LAT_BASE_MICRO + np.floor(ul * LAT_SPAN_MICRO).astype(np.int64),
        )
        lon_frac = np.where(
            dt,
            DT_LON_FRAC_BASE_MICRO + np.floor(uo * DT_LON_SPAN_MICRO).astype(np.int64),
            LON_FRAC_BASE_MICRO + np.floor(uo * LON_SPAN_MICRO).astype(np.int64),
        )
        lat = lat_micro / 1_000_000.0
        lon = -(123.0 + lon_frac / 1_000_000.0)
        outs.append(
            pa.table(
                {
                    "addr_id": pa.array(doc_id * ADDRESSES_PER_DOC + j, type=pa.int64()),
                    "lat": pa.array(lat, type=pa.float64()),
                    "lon": pa.array(lon, type=pa.float64()),
                }
            )
        )
    return pa.concat_tables(outs)


def read_addresses(sf_dir: str, seed: int = DEFAULT_SEED):
    """Ray Dataset of synthetic address points (broadcast or shuffle side)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return ds.map_batches(lambda b: synth_addresses_batch(b, seed=seed),
                         batch_format="pyarrow")


def addresses_table(sf_dir: str, seed: int = DEFAULT_SEED) -> pa.Table:
    """Driver-side (small) address table via pyarrow, for broadcast sides."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return synth_addresses_batch(docs, seed=seed)

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


def _coord_strings(keys: np.ndarray, seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(has_coord, lat_str, lon_str) for each doc key. Streams 0/1/2."""
    u0 = rng.uniform01(keys, seed, 0)
    u1 = rng.uniform01(keys, seed, 1)
    u2 = rng.uniform01(keys, seed, 2)
    has = u0 < COORD_PROB
    lat_micro = LAT_BASE_MICRO + np.floor(u1 * LAT_SPAN_MICRO).astype(np.int64)
    lon_frac = LON_FRAC_BASE_MICRO + np.floor(u2 * LON_SPAN_MICRO).astype(np.int64)
    lat_str = np.array([f"49.{m % 1_000_000:06d}" for m in lat_micro], dtype=object)
    lon_str = np.array([f"-123.{f:06d}" for f in lon_frac], dtype=object)
    return has, lat_str, lon_str


def derive_webpages_batch(batch: pa.Table, seed: int = DEFAULT_SEED,
                          include_html: bool = True) -> pa.Table:
    """documents batch -> input_hint-shaped webpages batch (plus doc_id key)."""
    doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
    keys = doc_id & 0xFFFFFFFF
    has, lat_str, lon_str = _coord_strings(keys, seed)
    text = batch.column("text").to_pylist()
    out_text = [
        (t + " Located at " + la + ", " + lo + ".") if h else t
        for t, h, la, lo in zip(text, has, lat_str, lon_str)
    ]
    url = [f"https://{s}.example.org/page/{d}" for s, d in
           zip(batch.column("source").to_pylist(), doc_id)]
    warc_ts = pa.array(WARC_EPOCH_US + doc_id * 1_000_000, type=pa.timestamp("us"))
    cols = {
        "doc_id": batch.column("doc_id"),
        "url": pa.array(url, type=pa.string()),
        "warc_ts": warc_ts,
        "text": pa.array(out_text, type=pa.string()),
        "lang": batch.column("lang"),
    }
    if include_html:
        cols["html"] = pa.array(
            [("<html><body>" + t + "</body></html>").encode("utf-8") for t in out_text],
            type=pa.binary(),
        )
    return pa.table(cols)


def read_webpages(sf_dir: str, seed: int = DEFAULT_SEED, include_html: bool = True):
    """Ray Dataset of input_hint-shaped webpages derived from documents.

    Column-pruned read (html is derived, n_chars never loaded); stateless
    vectorized ``map_batches``.
    """
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    return ds.map_batches(
        lambda b: derive_webpages_batch(b, seed=seed, include_html=include_html),
        batch_format="pyarrow",
    )


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

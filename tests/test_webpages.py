"""Web-page derivation + geoparse: determinism, byte-identity, oracle parity."""

import numpy as np
import pyarrow as pa

from maskmypy_ray import oracle
from maskmypy_ray.sources.webpages import derive_webpages_batch, synth_addresses_batch
from maskmypy_ray.stages.geoparse import geoparse_batch
from maskmypy_ray.stages.donut import donut_mask_batch


def test_derivation_deterministic(docs_table):
    a = derive_webpages_batch(docs_table, seed=42)
    b = derive_webpages_batch(docs_table, seed=42)
    assert a.equals(b)
    c = derive_webpages_batch(docs_table, seed=43)
    assert not a.column("text").equals(c.column("text"))


def test_input_hint_schema(docs_table):
    t = derive_webpages_batch(docs_table, seed=42)
    assert t.schema.field("url").type == pa.string()
    assert t.schema.field("warc_ts").type == pa.timestamp("us")
    assert t.schema.field("html").type == pa.binary()
    assert t.schema.field("text").type == pa.string()
    assert t.schema.field("lang").type == pa.string()
    # url is a unique key
    assert len(set(t.column("url").to_pylist())) == t.num_rows


def test_coord_embedding_rate(docs_table):
    t = derive_webpages_batch(docs_table, seed=42, include_html=False)
    pts = geoparse_batch(t)
    frac = pts.num_rows / t.num_rows
    assert 0.8 < frac < 1.0  # ~90% embed coordinates
    lat = pts.column("lat").to_numpy()
    lon = pts.column("lon").to_numpy()
    assert lat.min() >= 49.21 and lat.max() < 49.27
    assert lon.min() >= -123.19 and lon.max() <= -123.07


def test_text_byte_identity_through_mask(docs_table):
    """Core invariant: text bytes per url unchanged by geoparse + mask."""
    pages = derive_webpages_batch(docs_table, seed=42, include_html=False)
    pts = geoparse_batch(pages)
    masked = donut_mask_batch(pts, 100.0, 500.0, 42)
    orig = dict(zip(pages.column("url").to_pylist(), pages.column("text").to_pylist()))
    for url, text in zip(masked.column("url").to_pylist(), masked.column("text").to_pylist()):
        assert orig[url] == text


def test_pages_oracle_parity(docs_table, duck):
    pages = derive_webpages_batch(docs_table, seed=42, include_html=False)
    sql = f"WITH {oracle.pages_cte(42)} SELECT doc_id, url, warc_ts, text, lang FROM pages ORDER BY doc_id"
    o = duck.execute(sql).arrow()
    e = pages.select(["doc_id", "url", "warc_ts", "text", "lang"]).sort_by("doc_id")
    assert e.equals(o.cast(e.schema))


def test_points_oracle_parity(points_table, duck):
    sql = f"WITH {oracle.points_cte(42)} SELECT doc_id, lat, lon, x, y FROM points ORDER BY doc_id"
    o = duck.execute(sql).arrow()
    e = points_table.select(["doc_id", "lat", "lon", "x", "y"]).sort_by("doc_id")
    for col in e.column_names:
        assert np.array_equal(np.asarray(e.column(col)), np.asarray(o.column(col))), col


def test_addresses_oracle_parity(docs_table, duck):
    addr = synth_addresses_batch(docs_table, seed=42)
    sql = f"WITH {oracle.addresses_cte(42)} SELECT addr_id, lat, lon FROM addresses ORDER BY addr_id"
    o = duck.execute(sql).arrow()
    e = addr.sort_by("addr_id")
    for col in e.column_names:
        assert np.array_equal(np.asarray(e.column(col)), np.asarray(o.column(col))), col
    # hot-cell skew exists: downtown box denser than elsewhere
    lat = addr.column("lat").to_numpy()
    lon = addr.column("lon").to_numpy()
    dt = (lat >= 49.25) & (lat < 49.26) & (lon >= -123.12) & (lon < -123.10)
    # downtown box is 1/36 of bbox area but holds ~30%+ of addresses
    assert dt.mean() > 0.25

"""GeoJSON/CSV point IO round-trips."""

import json

import numpy as np
import pytest


def test_geojson_roundtrip(ray_session, tmp_path, points_table):
    from maskmypy_ray.sources.io import read_points_geojson, write_points_geojson

    import ray.data

    ds = ray.data.from_arrow(points_table.select(["doc_id", "x", "y"]))
    path = str(tmp_path / "pts.geojson")
    n = write_points_geojson(ds, path, x_col="x", y_col="y", limit=50)
    assert n == 50
    back = read_points_geojson(path, id_field="doc_id")
    df = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = points_table.select(["doc_id", "x", "y"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True).head(50)
    # round-trips through 4326 lat/lon: sub-millimeter in planar meters
    assert np.allclose(df["x"].to_numpy(), orig["x"].to_numpy(), atol=1e-3)
    assert np.allclose(df["y"].to_numpy(), orig["y"].to_numpy(), atol=1e-3)


def test_geojson_rejects_non_points(tmp_path):
    from maskmypy_ray.sources.io import geojson_points_to_table

    path = tmp_path / "poly.geojson"
    path.write_text(json.dumps({
        "type": "FeatureCollection",
        "features": [{"type": "Feature", "properties": {},
                      "geometry": {"type": "Polygon",
                                   "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}}],
    }))
    with pytest.raises(ValueError, match="Points required"):
        geojson_points_to_table(str(path))


def test_csv_points(ray_session, tmp_path):
    from maskmypy_ray.sources.io import read_points_csv

    path = tmp_path / "pts.csv"
    path.write_text("id,lat,lon\n1,49.25,-123.1\n2,49.22,-123.15\n")
    ds = read_points_csv(str(path), id_col="id")
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(df) == 2
    assert set(df.columns) == {"doc_id", "lat", "lon", "x", "y"}
    assert df["lat"].tolist() == [49.25, 49.22]


def test_jsonl_roundtrip_byte_identical(ray_session, sf_dir, tmp_path):
    """documents -> JSONL -> Dataset round trip preserves text bytes
    and row count (source-format breadth: SURVEY §2.5 sources/sinks)."""
    import ray.data

    from maskmypy_ray.sources.io import (
        read_documents_jsonl,
        write_documents_jsonl,
    )

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    out = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, out)
    back = read_documents_jsonl(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    orig = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(back) == len(orig)
    assert back["text"].tolist() == orig["text"].tolist()
    assert back["lang"].tolist() == orig["lang"].tolist()

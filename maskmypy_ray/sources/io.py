"""Point-layer sources/sinks beyond Parquet (SURVEY.md §2.5 sources/sinks).

The reference's only file I/O is GeoJSON fixtures via geopandas
(`/root/reference/tests/conftest.py:31-33`) and candidate JSON
(`atlas.py:302-318`). Engine equivalents: a from-scratch GeoJSON
Point-layer reader (geopandas is unavailable), CSV point reader, and the
standard Ray Data sinks. Parquet (read_parquet/write_parquet with column
pruning + partitioned layout) remains the primary path; these exist for
interchange with reference-style inputs.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..geokernels.geometry import latlon_to_xy


def geojson_points_to_table(path: str, id_field: str | None = None) -> pa.Table:
    """Parse a GeoJSON FeatureCollection of Points into an Arrow table
    (doc_id, lat, lon, x, y + string properties)."""
    doc = json.loads(open(path).read())
    feats = doc.get("features", [])
    lons, lats, ids, props_cols = [], [], [], {}
    for i, f in enumerate(feats):
        geom = f.get("geometry") or {}
        if geom.get("type") != "Point":
            raise ValueError(f"Feature {i} is {geom.get('type')}; Points required "
                             "(mirrors tools._validate_geom_type).")
        lon, lat = geom["coordinates"][:2]
        lons.append(float(lon))
        lats.append(float(lat))
        p = f.get("properties") or {}
        ids.append(int(p[id_field]) if id_field and id_field in p else i)
        for k, v in p.items():
            props_cols.setdefault(k, {})[i] = v
    lats_np = np.asarray(lats)
    lons_np = np.asarray(lons)
    x, y = latlon_to_xy(lats_np, lons_np)
    cols = {
        "doc_id": pa.array(ids, type=pa.int64()),
        "lat": pa.array(lats_np, type=pa.float64()),
        "lon": pa.array(lons_np, type=pa.float64()),
        "x": pa.array(x, type=pa.float64()),
        "y": pa.array(y, type=pa.float64()),
    }
    for k, vals in props_cols.items():
        if k == id_field:
            continue
        cols[f"prop_{k}"] = pa.array([str(vals.get(i)) if vals.get(i) is not None
                                      else None for i in range(len(feats))],
                                     type=pa.string())
    return pa.table(cols)


def read_points_geojson(path: str, id_field: str | None = None):
    """Ray Dataset from a GeoJSON Point FeatureCollection."""
    import ray.data

    return ray.data.from_arrow(geojson_points_to_table(path, id_field))


def write_points_geojson(ds, path: str, x_col: str = "mx", y_col: str = "my",
                         id_col: str = "doc_id", limit: int | None = None) -> int:
    """Write a (small / sampled) point Dataset as GeoJSON — the
    interchange sink; large outputs belong in partitioned parquet."""
    from ..geokernels.geometry import xy_to_latlon

    if limit:
        ds = ds.limit(limit)
    df = ds.select_columns([id_col, x_col, y_col]).to_pandas()
    lat, lon = xy_to_latlon(df[x_col].to_numpy(), df[y_col].to_numpy())
    feats = [
        {"type": "Feature",
         "geometry": {"type": "Point", "coordinates": [float(lo), float(la)]},
         "properties": {id_col: int(i)}}
        for i, la, lo in zip(df[id_col], lat, lon)
    ]
    open(path, "w").write(json.dumps({"type": "FeatureCollection", "features": feats}))
    return len(feats)


def read_points_csv(path: str, lat_col: str = "lat", lon_col: str = "lon",
                    id_col: str | None = None):
    """Ray Dataset of points from a CSV with lat/lon columns."""
    import pyarrow as pa
    import ray.data

    ds = ray.data.read_csv(path)

    def project(b: pa.Table) -> pa.Table:
        lat = b.column(lat_col).to_numpy(zero_copy_only=False).astype(np.float64)
        lon = b.column(lon_col).to_numpy(zero_copy_only=False).astype(np.float64)
        x, y = latlon_to_xy(lat, lon)
        if id_col and id_col in b.column_names:
            ids = b.column(id_col)
        else:
            ids = pa.array(np.arange(len(lat)), type=pa.int64())
        return pa.table({
            "doc_id": ids,
            "lat": pa.array(lat), "lon": pa.array(lon),
            "x": pa.array(x), "y": pa.array(y),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def read_documents_jsonl(path: str):
    """Ray Dataset of documents from JSON-Lines (one object per line,
    keys = the documents schema) — the interchange format most text
    corpora ship in (Common Crawl derivatives, HF dumps). Uses Ray's
    arrow-native JSON reader (pyarrow.json under the hood), so the
    parse is vectorized and streams per block like the parquet path."""
    import ray.data

    return ray.data.read_json(path)


def write_documents_jsonl(ds, out_dir: str):
    """Write a Dataset as partitioned JSON-Lines (one file per block —
    the resumable-output layout, same rule as the parquet sinks)."""
    ds.write_json(out_dir)

"""End-to-end pipelines + the driver-facing query registry.

Each ``q_*`` function takes ``sf_dir`` and returns a Ray Dataset (or a
small pyarrow/pandas result). The matching DuckDB oracle SQL lives in
:func:`oracle_queries`. Column names match between both sides — the
driver sorts columns by name before value-hashing.

Ray is assumed to be initialised by the caller (driver/test fixture);
nothing here calls ``ray.init``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import oracle
from .analysis.aggregates import k_satisfaction, summarize_k
from .analysis.displacement import displacement, summarize_displacement
from .analysis.k_anonymity import calculate_k
from .analysis.nnd import nnd
from .constants import DEFAULT_SEED
from .sources.boundary import boundary_polygon_set
from .sources.webpages import read_addresses, read_webpages
from .stages.donut import donut, donut_contained
from .stages.geoparse import geoparse
from .stages.suppress import suppress

SEED = DEFAULT_SEED
LOW, HIGH = 100.0, 500.0


def points_ds(sf_dir: str, include_html: bool = False):
    return geoparse(read_webpages(sf_dir, seed=SEED, include_html=include_html))


def masked_ds(sf_dir: str, distribution: str = "uniform"):
    return donut(points_ds(sf_dir), LOW, HIGH, SEED, distribution)


def contained_ds(sf_dir: str):
    return donut_contained(points_ds(sf_dir), boundary_polygon_set(), LOW, HIGH, SEED)


def flagship(sf_dir: str):
    """read -> derive webpages -> geoparse -> contained donut ->
    displacement; the headline mask->verify pipeline (BASELINE.md §3)."""
    return displacement(contained_ds(sf_dir))


def k_ds(sf_dir: str):
    return calculate_k(flagship(sf_dir), read_addresses(sf_dir, seed=SEED))


# ---------------------------------------------------------------------------
# Driver queries (each: sf_dir -> Dataset | pandas | pyarrow)
# ---------------------------------------------------------------------------


def q_webpages(sf_dir: str):
    return read_webpages(sf_dir, seed=SEED, include_html=False).select_columns(
        ["url", "warc_ts", "text", "lang"])


def q_geoparse(sf_dir: str):
    return points_ds(sf_dir).select_columns(["url", "lat", "lon", "x", "y"])


def q_text_byte_identity(sf_dir: str):
    """text per url AFTER the full mask pipeline — must equal the pages
    derivation byte-for-byte (core invariant)."""
    return flagship(sf_dir).select_columns(["url", "text"])


def q_donut_uniform(sf_dir: str):
    return masked_ds(sf_dir, "uniform").select_columns(["url", "mx", "my"])


def q_donut_areal(sf_dir: str):
    return masked_ds(sf_dir, "areal").select_columns(["url", "mx", "my"])


def q_donut_gaussian(sf_dir: str):
    return masked_ds(sf_dir, "gaussian").select_columns(["url", "mx", "my"])


def q_donut_contained(sf_dir: str):
    return contained_ds(sf_dir).select_columns(["url", "mx", "my", "UNMASKED"])


def q_displacement(sf_dir: str):
    return displacement(masked_ds(sf_dir)).select_columns(["url", "_distance"])


def q_displacement_summary(sf_dir: str):
    s = summarize_displacement(flagship(sf_dir))
    return pa.table({k: pa.array([v], type=pa.float64()) for k, v in s.items()})


def q_central_drift(sf_dir: str):
    from .analysis.aggregates import central_drift

    return pa.table({"central_drift": pa.array([central_drift(masked_ds(sf_dir))],
                                               type=pa.float64())})


def q_k_anonymity(sf_dir: str):
    import pyarrow.compute as pc

    k = k_ds(sf_dir)
    # attach url for the driver compare (doc_id is engine-internal)
    return k.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "k_anonymity": b.column("k_anonymity"),
        }), batch_format="pyarrow")


def q_k_satisfaction(sf_dir: str):
    k = k_ds(sf_dir)
    k = k.materialize()
    vals = {f"k_sat_{m}": k_satisfaction(k, m) for m in (5, 25, 50)}
    return pa.table({kk: pa.array([v], type=pa.float64()) for kk, v in vals.items()})


def q_k_summary(sf_dir: str):
    s = summarize_k(k_ds(sf_dir))
    return pa.table({
        "k_min": pa.array([s["k_min"]], type=pa.int64()),
        "k_max": pa.array([s["k_max"]], type=pa.int64()),
        "k_med": pa.array([s["k_med"]], type=pa.float64()),
        "k_mean": pa.array([s["k_mean"]], type=pa.float64()),
    })


def q_nnd(sf_dir: str):
    s = nnd(points_ds(sf_dir))
    return pa.table({
        "nnd_min": pa.array([round(s["nnd_min"], 6)], type=pa.float64()),
        "nnd_max": pa.array([round(s["nnd_max"], 6)], type=pa.float64()),
        "nnd_mean": pa.array([round(s["nnd_mean"], 6)], type=pa.float64()),
    })


def q_addresses(sf_dir: str):
    return read_addresses(sf_dir, seed=SEED)


def q_suppress(sf_dir: str):
    """Suppression flags at min_k=50 over the flagship + address-k join."""
    masked = flagship(sf_dir).materialize()
    k = calculate_k(masked, read_addresses(sf_dir, seed=SEED))
    # join k back by doc_id (hash join on the small k side via pandas merge)
    kdf = k.to_pandas()
    import ray

    kref = ray.put(dict(zip(kdf["doc_id"], kdf["k_anonymity"])))

    def attach(b: pa.Table) -> pa.Table:
        kmap = ray.get(kref)
        ks = np.array([kmap.get(d, 1) for d in
                       b.column("doc_id").to_numpy(zero_copy_only=False)])
        return b.append_column("k_anonymity", pa.array(ks, type=pa.int64()))

    with_k = masked.map_batches(attach, batch_format="pyarrow")
    sup = suppress(with_k, min_k=50)
    return sup.select_columns(["url", "SUPPRESSED"])


def q_locationswap(sf_dir: str):
    from .sources.webpages import addresses_table
    from .stages.locationswap import locationswap

    addr = addresses_table(sf_dir, seed=SEED)
    return locationswap(points_ds(sf_dir), addr, LOW, HIGH, SEED).select_columns(
        ["url", "mx", "my", "UNMASKED"])


def q_street(sf_dir: str):
    """Street mask (rows-only oracle: bounded Dijkstra isn't SQL)."""
    from .sources.roadgraph import synth_road_graph
    from .stages.street import street

    return street(points_ds(sf_dir), synth_road_graph(), low=5, high=10,
                  seed=SEED).select_columns(["url", "mx", "my"])


def q_snap_to_streets(sf_dir: str):
    """Donut mask + snap-to-streets post-pass (rows-only oracle)."""
    from .sources.roadgraph import synth_road_graph
    from .stages.street import snap_to_streets

    return snap_to_streets(masked_ds(sf_dir), synth_road_graph()).select_columns(
        ["url", "mx", "my"])


def q_voronoi(sf_dir: str):
    """Voronoi mask (rows-only oracle: global geometric operator)."""
    from .stages.voronoi import voronoi

    return voronoi(points_ds(sf_dir)).select_columns(["url", "mx", "my"])


QUERIES = {
    "webpages": q_webpages,
    "geoparse": q_geoparse,
    "text_byte_identity": q_text_byte_identity,
    "donut_uniform": q_donut_uniform,
    "donut_areal": q_donut_areal,
    "donut_gaussian": q_donut_gaussian,
    "donut_contained": q_donut_contained,
    "displacement": q_displacement,
    "displacement_summary": q_displacement_summary,
    "central_drift": q_central_drift,
    "k_anonymity": q_k_anonymity,
    "k_satisfaction": q_k_satisfaction,
    "k_summary": q_k_summary,
    "nnd": q_nnd,
    "addresses": q_addresses,
    "suppress": q_suppress,
    "locationswap": q_locationswap,
    "street_mask": q_street,
    "snap_to_streets": q_snap_to_streets,
    "voronoi": q_voronoi,
}


def _masked_sql(dist: str = "uniform") -> str:
    return oracle.donut_cte(SEED, LOW, HIGH, dist)


def _contained_with_distance() -> str:
    """Contained-mask CTE + _distance (the flagship's verify columns)."""
    return (f"{oracle.donut_contained_cte(SEED, LOW, HIGH)},\n"
            "flag AS (\n"
            "  SELECT *, sqrt((mx - x)*(mx - x) + (my - y)*(my - y)) AS _distance\n"
            "  FROM masked\n)")


def _k_sql() -> str:
    """k-anonymity CTE chain: flagship mask + addresses + exact-circle
    count join (predicate identical to the engine's)."""
    return (f"{_contained_with_distance()},\n"
            f"{oracle.addresses_cte(SEED)},\n"
            "kvals AS (\n"
            "  SELECT f.doc_id,\n"
            "         CAST(count(a.addr_id) + 1 AS BIGINT) AS k_anonymity\n"
            "  FROM flag f LEFT JOIN addr_xy a\n"
            "    ON (a.ax - f.mx)*(a.ax - f.mx) + (a.ay - f.my)*(a.ay - f.my)\n"
            "       <= f._distance * f._distance\n"
            "  GROUP BY f.doc_id\n)")


def oracle_queries() -> dict[str, str]:
    return {
        "webpages": f"WITH {oracle.pages_cte(SEED)} SELECT url, warc_ts, text, lang FROM pages",
        "geoparse": f"WITH {oracle.points_cte(SEED)} SELECT url, lat, lon, x, y FROM points",
        "text_byte_identity": (
            f"WITH {oracle.points_cte(SEED)} SELECT url, text FROM points"),
        "donut_uniform": f"WITH {_masked_sql('uniform')} SELECT url, mx, my FROM masked",
        "donut_areal": f"WITH {_masked_sql('areal')} SELECT url, mx, my FROM masked",
        # gaussian: Box-Muller (log/cos) is not bit-reproducible in SQL ->
        # no oracle entry (driver records rows-only).
        "donut_contained": (
            f"WITH {oracle.donut_contained_cte(SEED, LOW, HIGH)} "
            "SELECT url, mx, my, UNMASKED FROM masked"),
        "displacement": (
            f"WITH {_masked_sql('uniform')} SELECT url, "
            "sqrt((mx - x)*(mx - x) + (my - y)*(my - y)) AS _distance FROM masked"),
        "displacement_summary": (
            f"WITH {_contained_with_distance()} SELECT "
            "round(min(_distance), 6) AS displacement_min, "
            "round(max(_distance), 6) AS displacement_max, "
            "round(median(_distance), 6) AS displacement_med, "
            "round(avg(_distance), 6) AS displacement_mean FROM flag"),
        "central_drift": (
            f"WITH {_masked_sql('uniform')} SELECT "
            "round(sqrt((avg(mx) - avg(x))*(avg(mx) - avg(x)) "
            "+ (avg(my) - avg(y))*(avg(my) - avg(y))), 6) AS central_drift FROM masked"),
        "k_anonymity": f"WITH {_k_sql()} SELECT doc_id, k_anonymity FROM kvals",
        "k_satisfaction": (
            f"WITH {_k_sql()} SELECT "
            "round(count(CASE WHEN k_anonymity >= 5 THEN 1 END) / CAST(count(*) AS DOUBLE), 3) AS k_sat_5, "
            "round(count(CASE WHEN k_anonymity >= 25 THEN 1 END) / CAST(count(*) AS DOUBLE), 3) AS k_sat_25, "
            "round(count(CASE WHEN k_anonymity >= 50 THEN 1 END) / CAST(count(*) AS DOUBLE), 3) AS k_sat_50 "
            "FROM kvals"),
        "k_summary": (
            f"WITH {_k_sql()} SELECT "
            "CAST(min(k_anonymity) AS BIGINT) AS k_min, "
            "CAST(max(k_anonymity) AS BIGINT) AS k_max, "
            "round(median(k_anonymity), 2) AS k_med, "
            "round(avg(k_anonymity), 2) AS k_mean FROM kvals"),
        "nnd": (
            f"WITH {oracle.points_cte(SEED)}, nn AS (\n"
            "  SELECT p.doc_id, min(sqrt((p.x - q.x)*(p.x - q.x) + (p.y - q.y)*(p.y - q.y))) AS nnd\n"
            "  FROM points p JOIN points q ON p.doc_id <> q.doc_id GROUP BY p.doc_id\n)"
            " SELECT round(min(nnd), 6) AS nnd_min, round(max(nnd), 6) AS nnd_max, "
            "round(avg(nnd), 6) AS nnd_mean FROM nn"),
        "addresses": (
            f"WITH {oracle.addresses_cte(SEED)} SELECT addr_id, lat, lon FROM addresses"),
        "locationswap": (
            f"WITH {oracle.locationswap_cte(SEED, LOW, HIGH)} "
            "SELECT url, mx, my, UNMASKED FROM swapped"),
        "suppress": (
            f"WITH {_k_sql()} SELECT f.url, "
            "CASE WHEN k.k_anonymity < 50 THEN 'TRUE' ELSE 'FALSE' END AS SUPPRESSED "
            "FROM flag f JOIN kvals k ON f.doc_id = k.doc_id"),
    }

"""Session-scoped Ray fixture — Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def docs_table(sf_dir):
    import pyarrow.parquet as pq

    return pq.read_table(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="session")
def points_table(docs_table):
    """Geoparsed fixture points as a plain pyarrow table (no Ray)."""
    from maskmypy_ray.sources.webpages import derive_webpages_batch
    from maskmypy_ray.stages.geoparse import geoparse_batch

    return geoparse_batch(derive_webpages_batch(docs_table, seed=42, include_html=False))


@pytest.fixture()
def duck(docs_table):
    import duckdb

    con = duckdb.connect()
    con.register("documents", docs_table)
    yield con
    con.close()

"""Host-level PageRank (text/rank.py): oracle parity, partition
independence, and fast-path/distributed-path agreement."""

from __future__ import annotations

import numpy as np
import pytest


def _pages(sf_dir, nb=None):
    from maskmypy_ray.sources.webpages import read_webpages

    return read_webpages(sf_dir, seed=42)


def test_host_rank_oracle_parity(ray_session, sf_dir):
    import duckdb

    from maskmypy_ray import oracle
    from maskmypy_ray.text.rank import host_rank

    eng = host_rank(_pages(sf_dir)).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    orc = con.execute(oracle.host_rank_sql(42)).df() \
        .sort_values("host").reset_index(drop=True)
    assert eng["host"].tolist() == orc["host"].tolist()
    assert eng["rank_micro"].tolist() == orc["rank_micro"].tolist()
    # the quadratic link rule must actually skew the ranks
    r = eng["rank_micro"].to_numpy()
    assert r.max() > 2 * r.min()


def test_host_rank_partition_independent(ray_session, sf_dir):
    """Identical ranks with a different partition count (all joins are
    hash-routed; the iteration arithmetic is partition-free)."""
    from maskmypy_ray.text.rank import host_rank

    a = host_rank(_pages(sf_dir), partitions=64).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    b = host_rank(_pages(sf_dir), partitions=7).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    assert a.equals(b)


def test_host_rank_paths_agree(ray_session, sf_dir, monkeypatch):
    """The driver-local small-graph loop and the distributed
    edge-streaming rounds compute the identical int64 ranks."""
    from maskmypy_ray.text import rank as rank_mod

    fast = rank_mod.host_rank(_pages(sf_dir)).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    monkeypatch.setattr(rank_mod, "SMALL_EDGES", 0)
    dist = rank_mod.host_rank(_pages(sf_dir)).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    assert fast.equals(dist)


def test_host_rank_mass_bounded(ray_session, sf_dir):
    """Truncating integer division only LOSES mass: total rank stays
    at or below the initial total, and every rank >= the teleport
    floor (15% of the initial share)."""
    from maskmypy_ray.text.rank import RANK_SCALE, host_rank

    r = host_rank(_pages(sf_dir)).to_pandas()["rank_micro"].to_numpy()
    H = len(r)
    init = RANK_SCALE // H
    assert r.sum() <= H * init
    assert (r >= (15 * init) // 100).all()

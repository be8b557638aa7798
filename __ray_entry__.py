"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself, then ``entry()`` (smoke, sf0.001),
then runs each ``queries()[name](sf_dir)`` at sf=0.01 against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Nothing here calls ``ray.init``/``ray.shutdown``.

Engine: :mod:`maskmypy_ray` (see SURVEY.md). The engine's per-row counter
RNG and pure-arithmetic float math let even the randomized donut masks be
reproduced bit-for-bit by the DuckDB oracle (maskmypy_ray/oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: read documents ->
    derive input_hint webpages -> geoparse -> contained donut mask ->
    displacement. Returns the masked Dataset."""
    from maskmypy_ray.pipelines import flagship

    return flagship("/root/testdata/sf0.001").select_columns(
        ["url", "warc_ts", "text", "lang", "lat", "lon", "x", "y", "mx", "my",
         "UNMASKED", "_distance"])


def queries() -> dict[str, Callable[[str], Any]]:
    from maskmypy_ray.pipelines import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from maskmypy_ray.pipelines import oracle_queries

    return oracle_queries()

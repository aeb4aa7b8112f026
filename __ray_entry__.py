"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in sgp_sketch) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: the full sketch build
    (HLL + CMS + KLL + t-digest + Bloom, global + per-source scopes,
    greedy salted partition plan). Returns the estimates table."""
    from sgp_sketch.pipeline import build_sketches
    from sgp_sketch.schema import tokens_dataset

    ds = tokens_dataset("/root/testdata/sf0.001")
    res = build_sketches(ds, k=4, batch_size=2048)
    return res.estimates_table()


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from sgp_sketch.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every exact query (same column names and
    rounding as the Ray implementations). Sketch / greedy / approximate
    queries are intentionally absent (rows-only check)."""
    from sgp_sketch.queries import all_oracles

    return all_oracles()

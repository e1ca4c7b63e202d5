"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: deterministic interleaved corpus (t1-smoke
    scale) through the full extraction + scoring plan (SURVEY.md §7.2);
    returns the lazy Dataset (driver checks rows ≥ 0 + stable schema)."""
    from file_analyzer_ray.pipelines.extract import corpus_path, extract_pipeline

    src = corpus_path(1000)
    return extract_pipeline(src, score=True)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from file_analyzer_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    from file_analyzer_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)

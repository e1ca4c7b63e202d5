"""Driver-facing query registry (stub — populated operator by operator).

Each entry: name → callable(sf_dir) returning a Dataset / DataFrame /
Arrow table; ORACLE_SQL holds the DuckDB-equivalent SQL for the
SQL-expressible subset (same column names, rounded floats).
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE_SQL: dict[str, str] = {}

"""Unified document sources/sinks (SURVEY.md §2.1 S1-S10).

One interface over the storage formats this engine reads and writes:

- ``parquet`` — always available, the default interchange format
- ``lance`` — the north-rule storage format; Ray 2.49 ships
  ``read_lance``/``write_lance`` but the ``pylance`` package is not in
  this sandbox, so the Lance path is gated behind an import-try and
  exercised automatically wherever the package exists (identical Arrow
  schema either way)
- ``json`` (newline-delimited) / ``csv`` — ingest formats for tabular
  side inputs

The reference's directory walker + fnmatch include/exclude filters
(src/core/analyzer.py:126-163) map to partition-pruned reads plus a
vectorized path-pattern filter on a column.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

try:  # north-rule format; package absent in this sandbox
    import lance  # type: ignore  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".lance": "lance",
    ".json": "json",
    ".jsonl": "json",
    ".csv": "csv",
}


def detect_format(path: str) -> str:
    for ext, fmt in _EXT_FORMAT.items():
        if path.rstrip("/").endswith(ext):
            return fmt
    return "parquet"


def read_docs(
    path: str,
    format: str = "auto",
    columns: list[str] | None = None,
    **kwargs,
) -> "ray.data.Dataset":
    """Format-dispatched read. Column pruning is pushed into the read
    for parquet/lance (only requested columns leave storage)."""
    fmt = detect_format(path) if format == "auto" else format
    if fmt == "parquet":
        from ..query_utils import read_parquet_clean

        return read_parquet_clean(
            path, columns=columns, file_extensions=["parquet"], **kwargs
        )
    if fmt == "lance":
        if not HAVE_LANCE:
            raise NotImplementedError(
                "lance format requires the 'pylance' package (not in this "
                "environment); the parquet path is schema-identical"
            )
        return ray.data.read_lance(path, columns=columns, **kwargs)
    if fmt == "json":
        ds = ray.data.read_json(path, **kwargs)
    elif fmt == "csv":
        ds = ray.data.read_csv(path, **kwargs)
    else:
        raise ValueError(f"unknown format {fmt!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_docs(ds: "ray.data.Dataset", path: str, format: str = "auto", **kwargs):
    """Format-dispatched write (parquet always; lance when available)."""
    fmt = detect_format(path) if format == "auto" else format
    if fmt == "parquet":
        return ds.write_parquet(path, **kwargs)
    if fmt == "lance":
        if not HAVE_LANCE:
            raise NotImplementedError(
                "lance format requires the 'pylance' package"
            )
        return ds.write_lance(path, **kwargs)
    if fmt == "json":
        return ds.write_json(path, **kwargs)
    if fmt == "csv":
        return ds.write_csv(path, **kwargs)
    raise ValueError(f"unknown format {fmt!r}")


def glob_filter(
    ds: "ray.data.Dataset",
    column: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> "ray.data.Dataset":
    """Include/exclude glob filtering on a path-like column — the
    reference's fnmatch walker filter (src/core/analyzer.py:126-138) as
    ONE vectorized regex match per batch (globs are compiled once into
    an alternation; no per-row fnmatch calls)."""
    def _glob_to_re2(glob: str) -> str:
        # fnmatch.translate emits \Z and atomic groups (?>...), both
        # rejected by RE2 (pyarrow's engine) — translate directly.
        out = []
        for ch in glob:
            if ch == "*":
                out.append(".*")
            elif ch == "?":
                out.append(".")
            else:
                out.append(re.escape(ch))
        return "^" + "".join(out) + "$"

    def _compile(globs: list[str]) -> str:
        return "|".join(f"(?:{_glob_to_re2(g)})" for g in globs)

    inc_re = _compile(include) if include else None
    exc_re = _compile(exclude) if exclude else None

    def fn(t: pa.Table) -> pa.Table:
        mask = pa.array([True] * t.num_rows)
        if inc_re is not None:
            mask = pc.and_(mask, pc.match_substring_regex(t[column], inc_re))
        if exc_re is not None:
            mask = pc.and_(
                mask, pc.invert(pc.match_substring_regex(t[column], exc_re))
            )
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")

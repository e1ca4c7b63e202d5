"""Range-partitioned parquet layout (zone-map pruning): assign rows to
fixed-width key ranges ONCE at write time, then serve range queries by
reading ONLY the overlapping partitions.

The sort-based complement of the hash-bucketed layout
(state/bucketed.py): bucketing makes KEYED work exchange-free; range
partitioning makes RANGE predicates I/O-proportional to the selected
window instead of the whole table. At 100 TB the difference is reading
the ~7 day-partitions a dashboard window touches instead of all 30 —
min-max pruning decided from directory names alone, before any byte of
payload is read. The reference's closest analog is the include/exclude
glob pushdown at collection time (src/core/analyzer.py:126-138):
filtering decided BEFORE payloads are opened.

Layout contract: hive-style ``r=<id>/`` directories where partition
``id`` covers the half-open key range ``[id·width, (id+1)·width)``.
Partition files do NOT store the range column twice — ``write_parquet``
lifts it into the directory name; the payload keeps the original
columns, so a pruned read returns the source schema unchanged. The
edge partitions of a query window carry rows outside ``[lo, hi)``; the
pruned read applies the exact residual filter so results equal a full
scan with the same predicate.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .guard import validate_sink_dir
from ..query_utils import read_parquet_clean

RANGE_COL = "r"

#: one day in microseconds — the natural width for timestamp[us] keys
DAY_US = 86_400_000_000


def range_ids(keys_i64: np.ndarray, width: int) -> np.ndarray:
    """Partition id per key: ``floor(key / width)`` (floor division —
    correct for negative keys too)."""
    return np.floor_divide(keys_i64.astype(np.int64), width)


def write_range_partitioned(
    ds: "ray.data.Dataset", out_dir: str, col: str, width: int = DAY_US
) -> str:
    """Write ``ds`` into ``out_dir/r=<id>/`` partitions by the int64
    view of ``col`` (timestamps partition by their epoch-us value).
    One streaming pass, no shuffle: every task routes its own rows, so
    a partition may hold files from many tasks (resume unit = file,
    like the bucketed layout). Returns the validated output dir."""
    out_dir = validate_sink_dir(out_dir)

    def add_r(t: pa.Table) -> pa.Table:
        keys = t.column(col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return t.append_column(RANGE_COL, pa.array(range_ids(keys, width)))

    ds.map_batches(add_r, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=[RANGE_COL]
    )
    return out_dir


def list_partitions(dir_: str) -> list[int]:
    """All partition ids present in a layout (directory listing only)."""
    ids = []
    for name in os.listdir(dir_):
        if name.startswith(f"{RANGE_COL}="):
            ids.append(int(name.split("=", 1)[1]))
    return sorted(ids)


def overlapping_partitions(
    dir_: str, lo: int, hi: int, width: int = DAY_US
) -> list[str]:
    """Paths of the partitions whose covered range intersects the
    half-open window ``[lo, hi)`` — the zone-map prune: decided from
    directory names alone, no file is opened."""
    out = []
    for rid in list_partitions(dir_):
        if rid * width < hi and (rid + 1) * width > lo:
            out.append(os.path.join(dir_, f"{RANGE_COL}={rid}"))
    return out


def read_range(
    dir_: str,
    col: str,
    lo: int,
    hi: int,
    width: int = DAY_US,
    columns: "list[str] | None" = None,
) -> "ray.data.Dataset | None":
    """Pruned range read: only partitions overlapping ``[lo, hi)`` are
    opened, then the exact residual predicate trims the two edge
    partitions. Returns ``None`` when no partition overlaps (caller
    supplies the empty-result schema — the layout cannot know it
    without opening a file)."""
    parts = overlapping_partitions(dir_, lo, hi, width)
    if not parts:
        return None
    # expand to concrete files: read_parquet over a LIST of directories
    # trips pyarrow's is-a-file assumption on some path layouts, and the
    # explicit list is also the resume-friendly unit (one file = one
    # write task's atomic output)
    files = [
        os.path.join(p, f)
        for p in parts
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    if not files:
        return None
    ds = read_parquet_clean(files, columns=columns)

    def exact(t: pa.Table) -> pa.Table:
        keys = t.column(col).cast(pa.int64())
        mask = pc.and_(pc.greater_equal(keys, lo), pc.less(keys, hi))
        return t.filter(mask)

    return ds.map_batches(exact, batch_format="pyarrow")

"""Z-order (Morton) multi-column layout — 2-D range pruning.

The multi-dimensional complement of the 1-D range layout
(state/ranged.py): interleaving the bits of two quantized key columns
gives every parquet partition a small bounding RECTANGLE in
(x, y)-space, so a 2-D range query ("these users in this week") opens
only the cells its rectangle overlaps — the Delta/Iceberg `ZORDER BY`
trick. A 1-D layout prunes one predicate and scans everything for the
other; Z-ordering makes I/O proportional to the query rectangle's
area in BOTH dimensions.

Layout contract: hive-style ``z=<morton>/`` directories, ``bits`` bits
per dimension (default 4 → ≤256 cells). Quantizer params (per-column
min/max, taken FREE from the parquet footer statistics at write time)
live in ``zorder_params.json`` beside the cells; values outside the
written range clamp to the edge cells, so the layout stays correct for
appends that respect the residual filter. Payload columns are stored
unchanged — the pruned read re-applies the EXACT predicate, so results
equal a full scan (pinned by the DuckDB oracle and pytest).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

import ray.data

from .guard import validate_sink_dir
from ..query_utils import read_parquet_clean

Z_COL = "z"


def _interleave2(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Morton code of two ``bits``-bit integer arrays: x in even bit
    positions, y in odd."""
    out = np.zeros(len(x), dtype=np.int64)
    for b in range(bits):
        out |= ((x >> b) & 1) << (2 * b)
        out |= ((y >> b) & 1) << (2 * b + 1)
    return out


def _quantize(v: np.ndarray, lo: int, hi: int, bits: int) -> np.ndarray:
    """Map int64 values in [lo, hi] onto [0, 2^bits); out-of-range
    clamps to the edge cells."""
    cells = 1 << bits
    width = max((hi - lo + 1 + cells - 1) // cells, 1)
    q = (v.astype(np.int64) - lo) // width
    return np.clip(q, 0, cells - 1)


def _footer_min_max(path: str, col: str) -> "tuple[int, int]":
    """Column min/max from parquet row-group statistics — free, no
    data read."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    idx = md.schema.to_arrow_schema().get_field_index(col)
    los, his = [], []
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        los.append(st.min)
        his.append(st.max)
    to_i = lambda x: int(x.value) if hasattr(x, "value") else int(x)
    return min(to_i(x) for x in los), max(to_i(x) for x in his)


def write_zorder(
    ds: "ray.data.Dataset",
    out_dir: str,
    xcol: str,
    ycol: str,
    x_range: "tuple[int, int]",
    y_range: "tuple[int, int]",
    bits: int = 4,
) -> str:
    """Materialize ``ds`` as ``z=<morton>/`` parquet cells. ``xcol`` /
    ``ycol`` must be integer-valued (cast timestamps to epoch integers
    first); ranges are inclusive [lo, hi] — pass footer stats
    (:func:`_footer_min_max`)."""
    out_dir = validate_sink_dir(out_dir)

    def add_z(t: pa.Table) -> pa.Table:
        x = _quantize(
            t.column(xcol).to_numpy(zero_copy_only=False), *x_range, bits
        )
        y = _quantize(
            t.column(ycol).to_numpy(zero_copy_only=False), *y_range, bits
        )
        return t.append_column(Z_COL, pa.array(_interleave2(x, y, bits)))

    ds.map_batches(add_z, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=[Z_COL]
    )
    with open(os.path.join(out_dir, "zorder_params.json"), "w") as f:
        json.dump(
            {"x": list(x_range), "y": list(y_range), "bits": bits,
             "xcol": xcol, "ycol": ycol},
            f,
        )
    return out_dir


def overlapping_cells(
    layout_dir: str, x_lo: int, x_hi: int, y_lo: int, y_hi: int
) -> "list[int]":
    """Morton ids of the cells a half-open query rectangle
    [x_lo, x_hi) × [y_lo, y_hi) overlaps — enumerated from the
    quantized rectangle (≤ 2^bits per side, driver-trivial)."""
    with open(os.path.join(layout_dir, "zorder_params.json")) as f:
        p = json.load(f)
    bits = p["bits"]
    qx = _quantize(np.array([x_lo, x_hi - 1]), *p["x"], bits)
    qy = _quantize(np.array([y_lo, y_hi - 1]), *p["y"], bits)
    xs = np.arange(qx[0], qx[1] + 1, dtype=np.int64)
    ys = np.arange(qy[0], qy[1] + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return sorted(int(z) for z in _interleave2(gx.ravel(), gy.ravel(), bits))


def read_rect(
    layout_dir: str, x_lo: int, x_hi: int, y_lo: int, y_hi: int
) -> "ray.data.Dataset":
    """Rows with ``xcol`` in [x_lo, x_hi) and ``ycol`` in [y_lo, y_hi):
    reads ONLY the overlapping ``z=`` cells, then applies the exact
    residual filter (edge cells carry out-of-rectangle rows)."""
    with open(os.path.join(layout_dir, "zorder_params.json")) as f:
        p = json.load(f)
    xcol, ycol = p["xcol"], p["ycol"]
    cells = overlapping_cells(layout_dir, x_lo, x_hi, y_lo, y_hi)
    paths = [
        os.path.join(layout_dir, f"{Z_COL}={c}")
        for c in cells
        if os.path.isdir(os.path.join(layout_dir, f"{Z_COL}={c}"))
    ]
    if not paths:
        raise FileNotFoundError("query rectangle overlaps no written cell")
    ds = read_parquet_clean(paths, file_extensions=["parquet"])

    def residual(t: pa.Table) -> pa.Table:
        x = t.column(xcol).to_numpy(zero_copy_only=False)
        y = t.column(ycol).to_numpy(zero_copy_only=False)
        return t.filter(
            pa.array((x >= x_lo) & (x < x_hi) & (y >= y_lo) & (y < y_hi))
        )

    return ds.map_batches(residual, batch_format="pyarrow")

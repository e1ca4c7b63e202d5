"""Distributed interval (range) join: points ⋈ intervals on
``point.ts ∈ [interval.start, interval.end)``.

A range join has NO equality key, so a naive distributed plan is a
cross join. The scalable shape is the bin-overlap join: pick a bin
width ``w``, tag every point with ``bin = ts // w``, explode every
interval into the bins it overlaps, hash-join on ``bin`` (an ordinary
equi-join — Ray's hash exchange does the heavy lifting), then apply
the exact range predicate as a residual filter. With ``w`` chosen near
the typical interval length each interval lands in O(1) bins and each
point meets only the intervals sharing its bin — join fan-out is
``points × (intervals-per-bin)``, not ``points × intervals``.

This is the custom-operator pattern SURVEY.md §2's "operators Ray Data
lacks" clause calls for: composed entirely from ``map_batches`` + one
equi-join + the engine's sort+run-scan sum — no driver state, no
per-row Python. Partitioning assumption (document per the survey): bin
ids inherit the point time distribution, so a time-skewed workload
salts hot bins the same way the join's ``num_partitions`` spreads any
hot key; intervals MUCH longer than ``w`` should raise ``w`` (or be
split upstream) to bound their bin fan-out.

The reference has no relational joins at all (SURVEY.md §2.4) — this
generalizes its per-file "merge results by path" accumulation to the
time-range lookups an events pipeline needs (maintenance windows,
promo attribution, incident blame)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def interval_join_count(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    *,
    ts_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
    width: int,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Count points falling inside each half-open interval
    ``[start, end)``. Timestamps/bounds are taken via their int64 view
    (timestamp[us] keys bin by epoch-microseconds). Intervals that
    contain no point are kept with ``n_points = 0`` (left-outer
    semantics). Returns ``(id_col, n_points)``."""

    def tag_points(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [pa.array(np.floor_divide(ts, width)), pa.array(ts)],
            names=["_bin", "_ts"],
        )

    pts = points.map_batches(tag_points, batch_format="pyarrow")

    def explode_intervals(t: pa.Table) -> pa.Table:
        lo = t.column(start_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        hi = t.column(end_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64())] * 4, names=["_bin", "_iid", "_lo", "_hi"]
            )
        b0 = np.floor_divide(lo, width)
        # last bin overlapped by the half-open interval; an empty
        # interval (hi <= lo) still lands in its start bin so the
        # zero-fill below can see it
        b1 = np.floor_divide(np.maximum(hi, lo + 1) - 1, width)
        n = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ids)), n)
        offs = np.zeros(len(ids), dtype=np.int64)
        np.cumsum(n[:-1], out=offs[1:])
        bins = b0[idx] + (np.arange(len(idx), dtype=np.int64) - offs[idx])
        return pa.Table.from_arrays(
            [pa.array(bins), pa.array(ids[idx]), pa.array(lo[idx]), pa.array(hi[idx])],
            names=["_bin", "_iid", "_lo", "_hi"],
        )

    ivs = intervals.map_batches(explode_intervals, batch_format="pyarrow")

    joined = pts.join(
        ivs, join_type="inner", num_partitions=num_partitions, on=("_bin",)
    )

    def residual_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=["_iid", "n"],
            )
        ts = t.column("_ts")
        mask = pc.and_(
            pc.greater_equal(ts, t.column("_lo")), pc.less(ts, t.column("_hi"))
        )
        kept = t.filter(mask)
        agg = kept.select(["_iid"]).group_by(["_iid"]).aggregate([("_iid", "count")])
        return agg.rename_columns(["_iid", "n"])

    from .graph import _sum_by_key

    counts = joined.map_batches(residual_partial, batch_format="pyarrow")

    # Zero-fill by union, not left-outer join: every interval contributes
    # an (id, 0) row alongside the join-side partial counts, so the ONE
    # sum-by-key sort both totals and zero-fills. This also sidesteps a
    # Ray 2.49 hash-join edge: an inner join with more partitions than
    # rows emits empty ZERO-COLUMN blocks which survive map_batches and
    # break a downstream join's key-field resolution on the right side.
    def zeros(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).cast(pa.int64())
        return pa.Table.from_arrays(
            [ids, pa.array(np.zeros(len(ids), dtype=np.int64))],
            names=["_iid", "n"],
        )

    counts = counts.union(intervals.map_batches(zeros, batch_format="pyarrow"))
    out = _sum_by_key(counts, "_iid", "n", "n_points")

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.int64()), pa.array([], pa.int64())],
                names=[id_col, "n_points"],
            )
        return t.rename_columns([id_col, "n_points"])

    return out.map_batches(finalize, batch_format="pyarrow")

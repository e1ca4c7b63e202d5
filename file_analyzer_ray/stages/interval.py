"""Distributed interval (range) join: points ⋈ intervals on
``point.ts ∈ [interval.start, interval.end)``.

A range join has NO equality key, so a naive distributed plan is a
cross join. Two scalable shapes, auto-selected by interval-side size
(the engine's broadcast-vs-join doctrine, same as pagerank / dup-span
grams):

- **broadcast** (interval side ≤ ``BROADCAST_INTERVALS_MAX``): ship
  the (id, lo, hi) vectors once via ``ray.put``; each point batch
  sorts its timestamps and answers EVERY interval with two
  ``searchsorted`` ranks — count in [lo, hi) = rank(hi) − rank(lo).
  Zero shuffle; the only exchange is the bounded per-batch partial
  counts feeding one sum-by-key.
- **bins** (corpus-sized interval side): pick a bin width ``w``, tag
  every point with ``bin = ts // w``, explode every interval into the
  bins it overlaps, hash-join on ``bin`` (an ordinary equi-join —
  Ray's hash exchange does the heavy lifting), then apply the exact
  range predicate as a residual filter. With ``w`` chosen near the
  typical interval length each interval lands in O(1) bins and each
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


#: interval-count bound for the broadcast path: three int64 vectors
#: (id, lo, hi) ride the object store once — 2M intervals ≈ 48 MB —
#: and every point batch answers ALL intervals with two vectorized
#: searchsorted calls (count in [lo, hi) = rank(hi) - rank(lo) in the
#: batch's sorted timestamps). Zero shuffle, one streaming pass over
#: the points. Above the bound the bin-overlap equi-join runs instead
#: (equality-tested against this path).
BROADCAST_INTERVALS_MAX = 2_000_000


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
    mode: str = "auto",
) -> "ray.data.Dataset":
    """Count points falling inside each half-open interval
    ``[start, end)``. Timestamps/bounds are taken via their int64 view
    (timestamp[us] keys bin by epoch-microseconds). Intervals that
    contain no point are kept with ``n_points = 0`` (left-outer
    semantics). Returns ``(id_col, n_points)``.

    ``mode``: ``"broadcast"`` (small interval side, no shuffle),
    ``"bins"`` (bin-overlap equi-join, any interval cardinality), or
    ``"auto"`` — materialize + count the interval side and pick by
    ``BROADCAST_INTERVALS_MAX``. A caller whose interval set is itself
    corpus-sized should pass ``mode="bins"`` to skip auto's
    materialize of that side."""
    import ray

    if mode == "auto":
        intervals = intervals.materialize()
        mode = (
            "broadcast"
            if intervals.count() <= BROADCAST_INTERVALS_MAX
            else "bins"
        )
    if mode == "broadcast":
        return _broadcast_count(
            points, intervals, ts_col=ts_col, id_col=id_col,
            start_col=start_col, end_col=end_col,
        )

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


def _broadcast_count(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    *,
    ts_col: str,
    id_col: str,
    start_col: str,
    end_col: str,
) -> "ray.data.Dataset":
    """Small-interval-side path: broadcast (id, lo, hi) once via
    ``ray.put``; each point batch sorts its timestamps and answers
    every interval with two ``searchsorted`` ranks. Per-batch output is
    only the intervals the batch actually hit; one sum-by-key over the
    union with (id, 0) zero-fill rows totals across batches."""
    import ray

    from .graph import _sum_by_key

    rows = intervals.take_all()
    ids = np.fromiter((r[id_col] for r in rows), dtype=np.int64,
                      count=len(rows))
    lo = np.fromiter((_as_i64(r[start_col]) for r in rows), dtype=np.int64,
                     count=len(rows))
    hi = np.fromiter((_as_i64(r[end_col]) for r in rows), dtype=np.int64,
                     count=len(rows))
    ref = ray.put((ids, lo, hi))

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.Table.from_arrays(
            [pa.array([], pa.int64()), pa.array([], pa.int64())],
            names=["_iid", "n"],
        )
        if t.num_rows == 0 or t.num_columns == 0:
            return empty
        i, l, h = ray.get(ref)
        if len(i) == 0:
            return empty
        ts = np.sort(
            t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        cnt = np.searchsorted(ts, h, side="left") - np.searchsorted(
            ts, l, side="left"
        )
        nz = cnt > 0
        return pa.Table.from_arrays(
            [pa.array(i[nz]), pa.array(cnt[nz].astype(np.int64))],
            names=["_iid", "n"],
        )

    counts = points.map_batches(partial, batch_format="pyarrow")

    def zeros(t: pa.Table) -> pa.Table:
        iv = t.column(id_col).cast(pa.int64())
        return pa.Table.from_arrays(
            [iv, pa.array(np.zeros(len(iv), dtype=np.int64))],
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


def _as_i64(v) -> int:
    """int64 view of an int or a datetime-like bound (epoch-us)."""
    if isinstance(v, (int, np.integer)):
        return int(v)
    return int(pa.scalar(v).cast(pa.timestamp("us")).cast(pa.int64()).as_py())

"""Crawl-snapshot diff — classify every document across two crawls.

A recurring web crawl produces snapshot N and snapshot N+1; the
training-data question is the delta: which documents were ADDED,
REMOVED, CHANGED (same id, different content fingerprint) or
UNCHANGED. Downstream, only `added | changed` re-enter the extraction
/ dedup pipeline (see stages/incremental.py for the fingerprint-index
variant that probes a persisted index instead of a second snapshot).
The reference's re-analysis trigger is mtime/size change detection on
re-walked files (src/cli/main.py walk + analyzer re-run surface); this
is that semantics over two immutable snapshot tables.

Engine shape — ZERO joins: tag each side (0 = old, 1 = new), union,
ONE sort by (doc_id, side), then a vectorized run-scan classifies each
doc_id group from its run length + side/fingerprint layout:

- run length 1, side 0  -> removed
- run length 1, side 1  -> added
- run length 2, fp equal -> unchanged, else changed

A hash full-outer join would move exactly the same bytes through an
exchange but adds the join build/probe memory on top; the sort-merge
form reuses the repo's `_window_by_key_arrow` machinery and inherits
its boundary handling. At 100 TB both snapshots stream from parquet;
nothing is pinned.

Determinism contract for the oracle: the classification is a pure
function of (doc_id, fingerprint) pairs, so a DuckDB FULL OUTER JOIN
over the same two (deterministically derived) snapshot relations
states the expected answer in closed form.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..query_utils import _window_by_key_arrow

_DIFF_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("status", pa.string()),
        ("old_fp", pa.string()),
        ("new_fp", pa.string()),
    ]
)


def _tag(side: int, id_col: str, fp_col: str):
    def f(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [
                t.column(id_col).cast(pa.int64()),
                pa.array(np.full(t.num_rows, side, dtype=np.int64)),
                t.column(fp_col).cast(pa.string()),
            ],
            names=["doc_id", "side", "fp"],
        )

    return f


def snapshot_diff(
    old_ds: "object",
    new_ds: "object",
    id_col: str = "doc_id",
    fp_col: str = "fingerprint",
) -> "object":
    """``(doc_id, status in {added, removed, changed, unchanged},
    old_fp, new_fp)`` — one row per doc_id present in either snapshot.
    Each snapshot must hold at most one row per id (crawl snapshots
    are keyed); violations surface as runs longer than 2 and raise."""
    old_t = old_ds.map_batches(
        _tag(0, id_col, fp_col), batch_format="pyarrow", batch_size=65536
    )
    new_t = new_ds.map_batches(
        _tag(1, id_col, fp_col), batch_format="pyarrow", batch_size=65536
    )

    def classify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _DIFF_SCHEMA.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        fps = t.column("fp")
        new_run = np.empty(len(ids), dtype=bool)
        new_run[0] = True
        np.not_equal(ids[1:], ids[:-1], out=new_run[1:])
        starts = np.flatnonzero(new_run)
        lengths = np.diff(np.append(starts, len(ids)))
        if lengths.max() > 2:
            raise ValueError("snapshot is not keyed: duplicate id within a side")
        one = lengths == 1
        s1, s2 = starts[one], starts[~one]
        # singletons: side decides added vs removed
        single_new = side[s1] == 1
        # pairs: sorted by (doc_id, side) -> row s2 is old, s2+1 is new
        pair_eq = pc.equal(fps.take(pa.array(s2)), fps.take(pa.array(s2 + 1)))
        pair_eq = pair_eq.to_numpy(zero_copy_only=False)
        null_str = pa.nulls(len(s1), pa.string())
        t_single = pa.Table.from_arrays(
            [
                pa.array(ids[s1], pa.int64()),
                pa.array(np.where(single_new, "added", "removed").tolist(), pa.string()),
                pc.if_else(pa.array(~single_new), fps.take(pa.array(s1)).cast(pa.string()), null_str),
                pc.if_else(pa.array(single_new), fps.take(pa.array(s1)).cast(pa.string()), null_str),
            ],
            names=["doc_id", "status", "old_fp", "new_fp"],
        )
        t_pair = pa.Table.from_arrays(
            [
                pa.array(ids[s2], pa.int64()),
                pa.array(np.where(pair_eq, "unchanged", "changed").tolist(), pa.string()),
                fps.take(pa.array(s2)).cast(pa.string()),
                fps.take(pa.array(s2 + 1)).cast(pa.string()),
            ],
            names=["doc_id", "status", "old_fp", "new_fp"],
        )
        return pa.concat_tables([t_single, t_pair])

    return _window_by_key_arrow(
        old_t.union(new_t), ["doc_id"], ["doc_id", "side"], classify
    )

"""Last-writer-wins compaction: ONE row per logical key, the newest.

A recurring ingest (crawl revisits, CDC change streams, re-scored
documents) observes the same logical key across many batches; every
consumer downstream wants the compacted view — the single newest row
per key. This is the lakehouse MERGE/upsert kernel, and it generalizes
the reference's content-hash "duplicate groups" accumulation
(SURVEY.md §2 D1, reference ``src/core/analyzer.py`` hash-keyed result
merge) from first-by-insertion to newest-by-declared-order.

Scalable shape: the engine's grouped-window primitive — ONE global
sort by ``(*keys, *order_cols)`` and a vectorized run-scan keeping each
complete key run's LAST row. No per-group dispatch, no driver state,
any key cardinality (boundary key groups ride the window engine's
small repartition(1) side-channel, bounded at 2 runs per block). At
100 TB the sort is the one unavoidable exchange; everything else is
row-local, so the operator streams.

``order_cols`` must make the sort a total order per key (append a
unique id as the final tiebreaker) — the window engine's boundary
re-sort is not stable, so without a total order the "last" row of a
tied run would be nondeterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def latest_per_key(
    ds: "object", keys: "list[str]", order_cols: "list[str]"
) -> "object":
    """Keep the single last row per key group under the ascending
    ``(*keys, *order_cols)`` sort — i.e. the row with the MAX order
    tuple per key. Schema passes through unchanged."""
    from ..query_utils import _run_starts_mask_arrow, _window_by_key_arrow

    def keep_last(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        starts = _run_starts_mask_arrow(t, keys)
        ends = np.empty(len(starts), dtype=bool)
        # a run ends where the next row starts a new run; the block's
        # final row always ends its run (blocks hold COMPLETE runs —
        # the window engine guarantees it)
        ends[:-1] = starts[1:]
        ends[-1] = True
        return t.filter(pa.array(ends))

    return _window_by_key_arrow(ds, keys, [*keys, *order_cols], keep_last)

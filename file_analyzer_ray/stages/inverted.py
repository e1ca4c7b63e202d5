"""Distributed inverted-index build — the search-engine half of an
extraction pipeline (the reference greps documents with ripgrep-style
scans, `src/core/analyzer.py`; an index inverts that access path so a
10^12-doc corpus answers term lookups without a full scan).

Plan shape (all scale primitives this engine already ships):

    read (pruned: doc_id, text)
      → per-batch (doc_id, term, tf) rollup       Arrow C++ tokenize +
                                                  group_by combiner
                                                  (tfidf's `_tf_rows`)
      → ONE sort by (term, doc_id)                the only exchange
      → run-scan merge per term                   df / total_tf / argmax
                                                  / bounded postings head,
                                                  all numpy reduceat —
                                                  no per-term dispatch

Per term the index row is (df, total_tf, top_doc, postings_head):
`top_doc` is the highest-tf document (ties → lowest doc_id) — the
"best hit" a ranked lookup returns first — and `postings_head` is the
first `head` doc_ids ascending, comma-joined. The FULL posting list
is deliberately not collected into one row: at web scale a stopword's
postings are larger than a block, so the bounded head + exact df is
what the index row carries (the complete postings remain the sorted
(term, doc_id, tf) run itself, which a production sink would write
partitioned by term range — same layout `state/bucketed.py` uses).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..query_utils import _run_starts_mask_arrow, _window_by_key_arrow
from .tfidf import _tf_rows


def inverted_index(docs: "object", head: int = 8) -> "object":
    """docs(doc_id:int64, text) → (term, df, total_tf, top_doc,
    postings_head) — one row per distinct term, term-ascending order
    guaranteed within each output block.

    Every (doc_id, term) pair appears in exactly one tf row (a doc
    lives in one input row, so the per-batch combiner is globally
    exact); the merge is therefore a pure run-scan over the single
    (term, doc_id) sort."""
    tf = docs.map_batches(_tf_rows, batch_format="pyarrow", batch_size=4096)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_arrays(
                [pa.array([], pa.string()), pa.array([], pa.int64()),
                 pa.array([], pa.int64()), pa.array([], pa.int64()),
                 pa.array([], pa.string())],
                names=["term", "df", "total_tf", "top_doc", "postings_head"],
            )
        tfv = t.column("tf").to_numpy()
        doc = t.column("doc_id").to_numpy()
        n = len(tfv)
        starts = np.flatnonzero(_run_starts_mask_arrow(t, ["term"]))
        lens = np.diff(np.r_[starts, n])
        run_of = np.repeat(np.arange(len(starts)), lens)

        df = lens.astype(np.int64)
        total_tf = np.add.reduceat(tfv, starts).astype(np.int64)
        # argmax tf per run, ties → first (lowest doc_id, the sort order):
        # rows matching their run max keep their index, others sentinel n,
        # minimum.reduceat picks the earliest.
        max_tf = np.maximum.reduceat(tfv, starts)
        cand = np.where(tfv == max_tf[run_of], np.arange(n), n)
        top_doc = doc[np.minimum.reduceat(cand, starts)]

        # bounded postings head: first `head` doc_ids of each run,
        # gathered with one repeat/arange index (no per-term loop),
        # joined in Arrow C++.
        m = np.minimum(lens, head)
        offs = np.arange(int(m.sum())) - np.repeat(np.cumsum(m) - m, m)
        idx = np.repeat(starts, m) + offs
        doc_str = pa.compute.cast(t.column("doc_id").take(pa.array(idx)), pa.string())
        heads = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(m)], pa.int32()), doc_str.combine_chunks()
            if isinstance(doc_str, pa.ChunkedArray) else doc_str,
        )
        joined = pa.compute.binary_join(heads, ",")

        return pa.Table.from_arrays(
            [
                t.column("term").take(pa.array(starts)),
                pa.array(df),
                pa.array(total_tf),
                pa.array(top_doc.astype(np.int64)),
                joined,
            ],
            names=["term", "df", "total_tf", "top_doc", "postings_head"],
        )

    return _window_by_key_arrow(tf, ["term"], ["term", "doc_id"], merge)

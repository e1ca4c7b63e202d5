"""Incremental dedup against a persisted fingerprint index.

The 100 TB operational pattern: an already-deduped corpus is too big to
rescan every time a new crawl shard arrives. Persist the corpus's
content fingerprints ONCE as a hash-bucketed parquet index
(``state/bucketed.py`` layout — ``bucket=N/`` per fingerprint-hash
bucket), then dedup each incoming shard by probing ONLY the index cells
its own fingerprints hash to:

- :func:`write_dedup_index` — one streaming pass over the corpus
  (fingerprint per row, vectorized) + the single bucketing exchange the
  layout doctrine pays once at write time.
- :func:`probe_index` — NO exchange over the existing corpus at all:
  the shard (tiny next to the corpus) is sorted by bucket so each index
  cell is read by ~one task, and membership is a bucket-local sorted
  ``searchsorted`` against that cell's fingerprints. Cells without
  shard fingerprints are never read — probe I/O is proportional to the
  SHARD, not the corpus.
- :func:`append_to_index` — survivors append as new files inside the
  same bucket directories (atomic per file, no rewrite), so the index
  grows incrementally: dedup(shard C) automatically sees A ∪ B.

Fingerprint = md5 of the whitespace-normalized lowered text — the same
rule as ``queries.q_docs_fingerprint`` / training_prep's oracle, so the
index composes with the rest of the dedup family.

A straddled bucket (shard rows for one bucket split across two blocks)
is CORRECT here — membership is row-local given the cell — it merely
reads that cell twice; the sort exists to bound reads, not for
correctness, so no boundary side-channel is needed.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..state.bucketed import buckets_of, read_bucket, write_bucketed

# explicit class = RE2 \s, so the DuckDB oracle normalizes identically
# (same rule as queries.q_docs_fingerprint)
_WS = re.compile(r"[\t\n\f\r ]+")


def _fingerprints(texts: list) -> list:
    return [
        hashlib.md5(_WS.sub(" ", t or "").strip().lower().encode("utf-8")).hexdigest()
        for t in texts
    ]


def _with_fingerprint(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    def add(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "fingerprint": _fingerprints(t.column("text").to_pylist()),
            }
        )

    return docs.map_batches(add, batch_format="pyarrow")


def write_dedup_index(
    docs: "ray.data.Dataset", index_dir: str, num_buckets: int = 32
) -> str:
    """Persist (doc_id, fingerprint) of ``docs(doc_id, text)`` bucketed
    by fingerprint hash into ``index_dir/bucket=N/``."""
    return write_bucketed(
        _with_fingerprint(docs), index_dir, key="fingerprint",
        num_buckets=num_buckets,
    )


def append_to_index(
    docs: "ray.data.Dataset", index_dir: str, num_buckets: int = 32
) -> str:
    """Append ``docs``' fingerprints into an EXISTING index layout —
    new parquet files land inside the same bucket directories (unique
    file names per execution), no rewrite of prior cells."""
    return write_bucketed(
        _with_fingerprint(docs), index_dir, key="fingerprint",
        num_buckets=num_buckets,
    )


def probe_index(
    new_docs: "ray.data.Dataset",
    index_dir: str,
    num_buckets: int = 32,
    cluster: bool = True,
) -> "ray.data.Dataset":
    """new_docs(doc_id, text) → (doc_id, fingerprint, in_corpus): one
    row per shard doc, flagged True when its fingerprint already exists
    in the index. ``cluster=True`` (default) sorts the shard by bucket
    first so each index cell is read by ~one task; correctness does not
    depend on it."""

    def add_bucket(t: pa.Table) -> pa.Table:
        fps = _fingerprints(t.column("text").to_pylist())
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "fingerprint": fps,
                "bucket": buckets_of(fps, num_buckets),
            }
        )

    shard = new_docs.map_batches(add_bucket, batch_format="pyarrow")
    if cluster:
        shard = shard.sort("bucket")

    def probe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.Table.from_pydict(
                {"doc_id": pa.array([], pa.int64()),
                 "fingerprint": pa.array([], pa.string()),
                 "in_corpus": pa.array([], pa.bool_())}
            )
        fps = np.asarray(t.column("fingerprint").to_pylist(), dtype=object)
        bks = t.column("bucket").to_numpy(zero_copy_only=False)
        hit = np.zeros(len(fps), dtype=bool)
        for b in np.unique(bks):
            cell = read_bucket(index_dir, int(b), columns=["fingerprint"])
            rows = bks == b
            if cell.num_rows == 0:
                continue
            have = np.sort(
                np.asarray(cell.column("fingerprint").to_pylist(), dtype=object)
            )
            probe_fps = fps[rows]
            idx = np.searchsorted(have, probe_fps)
            idx_c = np.minimum(idx, len(have) - 1)
            hit[rows] = (idx < len(have)) & (have[idx_c] == probe_fps)
        return pa.Table.from_pydict(
            {
                "doc_id": t.column("doc_id"),
                "fingerprint": t.column("fingerprint"),
                "in_corpus": hit,
            }
        )

    return shard.map_batches(probe, batch_format="pyarrow")

"""Content-defined chunking (CDC) dedup — block-level dedup of the
document stream, the sub-file sibling of the whole-file rdfind analog
(reference src/core/analyzer.py:315-364 hashes whole normalized docs;
CDC finds shared *regions* across docs that whole-doc hashing misses,
the storage-dedup / LBFS / FastCDC family of public algorithms).

Gear rolling hash, vectorized exactly:

    h_i = (h_{i-1} << 1) + GEAR[b_i]   (mod 2^64)

The left shift discards bits past 63, so ``h_i`` depends on ONLY the
trailing 64 bytes:

    h_i = sum_{j=0..63} GEAR[b_{i-j}] << j   (mod 2^64)

which means the entire batch's boundary positions are computed with 64
shifted vector adds over the concatenated utf-8 byte buffer — no
per-byte Python, no sequential scan, and (unlike the classic rolling
recurrence) no cross-byte dependency at all. A position ``i`` is a cut
candidate when ``h_i & MASK == 0`` (MASK with ``b`` low bits set gives
expected chunk size ``2^b``).

Chunk-size bounds are enforced on the *candidate list* per doc, not per
byte: a greedy left-to-right sweep keeps a candidate only if it lies
``>= min_size`` after the previous kept cut, then oversize runs are
split at ``max_size``. The sweep touches a few positions per KB — the
hot path stays the 64-add kernel.

Each chunk is identified by sha256 of its bytes (functions/hashing
convention); duplicate detection is the exact-dedup machinery — one
sort by (chunk_hash, doc_id, offset) + run-scan first-wins, so the
canonical copy of every chunk is deterministic and the whole operator
is two linear passes + one shuffle, the 100 TB shape. Per-doc output:
how many of the doc's chunks (and bytes) are redundant copies of
chunks canonically owned elsewhere.

Serial oracle: tests/test_cdc.py recomputes boundaries with the plain
per-byte rolling loop and dedup with a dict — byte-for-byte equality
on chunk boundaries, hashes, canonical owners, and per-doc stats.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _gear_table(seed: int = 0x5FA0) -> np.ndarray:
    """Deterministic 256-entry uint64 gear table via splitmix64 (the
    repo-wide mixing convention — stages/sampling.py, text_dedup)."""
    out = np.empty(256, dtype=np.uint64)
    x = np.uint64(seed)
    golden = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        for i in range(256):
            x = x + golden
            z = x
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            out[i] = z ^ (z >> np.uint64(31))
    return out


GEAR = _gear_table()

#: 6 low bits → expected content-defined gap of 64 bytes (test-scale
#: docs are a few hundred bytes; at web scale raise to 12–13 bits for
#: 4–8 KB chunks — the kernel cost is independent of the mask).
DEFAULT_MASK_BITS = 6
DEFAULT_MIN_SIZE = 16
DEFAULT_MAX_SIZE = 256


def gear_hashes(buf: np.ndarray) -> np.ndarray:
    """uint64 gear hash at every position of ``buf`` (uint8 array):
    h[i] = sum_{j=0..min(i,63)} GEAR[buf[i-j]] << j, i.e. the exact
    rolling-gear value with the <<64-expired terms dropped. 64 shifted
    vector adds, no scan."""
    g = GEAR[buf]
    h = g.copy()
    n = len(buf)
    with np.errstate(over="ignore"):
        for j in range(1, 64):
            if j >= n:
                break
            h[j:] += g[: n - j] << np.uint64(j)
    return h


def chunk_doc(data: bytes, mask_bits: int = DEFAULT_MASK_BITS,
              min_size: int = DEFAULT_MIN_SIZE,
              max_size: int = DEFAULT_MAX_SIZE) -> list[tuple[int, int]]:
    """(offset, length) chunk list for one byte string — candidate cuts
    from the vectorized gear kernel, then the greedy min/max sweep.
    Used by the serial oracle test directly; the batch kernel below
    inlines the same sweep over per-doc slices of one shared buffer."""
    n = len(data)
    if n == 0:
        return []
    buf = np.frombuffer(data, dtype=np.uint8)
    cand = candidate_cuts(gear_hashes(buf), mask_bits)
    return sweep_cuts(cand, n, min_size, max_size)


def candidate_cuts(h: np.ndarray, mask_bits: int) -> np.ndarray:
    """Cut positions: a cut AFTER byte i (exclusive end i+1) where the
    gear hash has its low ``mask_bits`` bits zero."""
    mask = np.uint64((1 << mask_bits) - 1)
    return (np.nonzero((h & mask) == np.uint64(0))[0] + 1).astype(np.int64)


def sweep_cuts(cand: np.ndarray, n: int, min_size: int, max_size: int) -> list[tuple[int, int]]:
    """Greedy bounds sweep over the candidate ends → (offset, len)."""
    chunks: list[tuple[int, int]] = []
    start = 0
    for c in cand.tolist():
        if c - start < min_size:
            continue
        while c - start > max_size:  # backfill forced max-size cuts
            chunks.append((start, max_size))
            start += max_size
        if c - start >= min_size:
            chunks.append((start, c - start))
            start = c
    while n - start > max_size:
        chunks.append((start, max_size))
        start += max_size
    if n - start > 0:
        chunks.append((start, n - start))
    return chunks


_CHUNK_SCHEMA = pa.schema(
    [
        ("chunk_hash", pa.string()),
        ("doc_id", pa.int64()),
        ("offset", pa.int64()),
        ("length", pa.int64()),
    ]
)


def _chunk_batch(t: pa.Table, mask_bits: int, min_size: int,
                 max_size: int) -> pa.Table:
    """(doc_id, text) batch → one row per chunk. The gear kernel runs
    per doc (64 shifted vector adds over that doc's byte array): the
    64-byte rolling window must NOT cross doc boundaries, so a single
    concatenated-buffer kernel would contaminate each doc's first 63
    positions with its neighbour's bytes. Test-scale docs are a few
    hundred bytes so the per-doc numpy dispatch is visible there; at
    the KB–MB documents this operator exists for, the 64-add kernel
    dominates and the dispatch amortizes to noise."""
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    txt = t.column("text").combine_chunks() if isinstance(
        t.column("text"), pa.ChunkedArray) else t.column("text")
    texts = txt.to_pylist()

    out_hash: list[str] = []
    out_doc: list[int] = []
    out_off: list[int] = []
    out_len: list[int] = []
    for did, s in zip(ids, texts):
        data = (s or "").encode("utf-8", "surrogatepass")
        if not data:
            continue
        for off, ln in chunk_doc(data, mask_bits, min_size, max_size):
            out_hash.append(hashlib.sha256(data[off:off + ln]).hexdigest())
            out_doc.append(int(did))
            out_off.append(off)
            out_len.append(ln)
    return pa.Table.from_arrays(
        [
            pa.array(out_hash, pa.string()),
            pa.array(out_doc, pa.int64()),
            pa.array(out_off, pa.int64()),
            pa.array(out_len, pa.int64()),
        ],
        names=[f.name for f in _CHUNK_SCHEMA],
    )


def cdc_chunks(docs: "ray.data.Dataset", mask_bits: int = DEFAULT_MASK_BITS,
               min_size: int = DEFAULT_MIN_SIZE,
               max_size: int = DEFAULT_MAX_SIZE) -> "ray.data.Dataset":
    """docs(doc_id, text) → (chunk_hash, doc_id, offset, length)."""
    return docs.map_batches(
        lambda t: _chunk_batch(t, mask_bits, min_size, max_size),
        batch_format="pyarrow",
    )


def cdc_dedup_stats(docs: "ray.data.Dataset",
                    mask_bits: int = DEFAULT_MASK_BITS,
                    min_size: int = DEFAULT_MIN_SIZE,
                    max_size: int = DEFAULT_MAX_SIZE) -> "ray.data.Dataset":
    """Per-doc CDC dedup accounting:

    (doc_id, n_chunks, n_bytes, dup_chunks, dup_bytes) where a chunk
    occurrence is ``dup`` unless it is the canonical first occurrence
    of its hash under (doc_id, offset) ascending — the same first-wins
    contract as exact doc dedup (stages/dedup.py), one sort + run-scan,
    so re-running never flips owners. ``dup_bytes`` is the storage a
    chunk store would save for that doc."""
    from ..query_utils import _window_by_key_arrow

    chunks = cdc_chunks(docs, mask_bits, min_size, max_size)

    def mark_first(t: pa.Table) -> pa.Table:
        # rows arrive sorted by (chunk_hash, doc_id, offset); run starts
        # are the canonical owners.
        n = t.num_rows
        if n == 0:
            return t.append_column("is_dup", pa.array([], pa.bool_()))
        import pyarrow.compute as pc

        h = t.column("chunk_hash").combine_chunks()
        same = pc.equal(h.slice(1, n - 1), h.slice(0, n - 1))
        is_dup = pa.concat_arrays(
            [pa.array([False]), same.combine_chunks() if isinstance(
                same, pa.ChunkedArray) else same]
        )
        return t.append_column("is_dup", is_dup)

    marked = _window_by_key_arrow(
        chunks,
        ["chunk_hash"],
        ["chunk_hash", "doc_id", "offset"],
        mark_first,
    )

    def per_doc(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dup_len = pc.if_else(t.column("is_dup"), t.column("length"),
                             pa.scalar(0, pa.int64()))
        g = pa.Table.from_arrays(
            [
                t.column("doc_id"),
                t.column("length"),
                t.column("is_dup").cast(pa.int64()),
                dup_len,
            ],
            names=["doc_id", "length", "dup", "dup_len"],
        ).group_by(["doc_id"]).aggregate(
            [("length", "count"), ("length", "sum"), ("dup", "sum"),
             ("dup_len", "sum")]
        )
        return g.rename_columns(
            ["doc_id", "n_chunks", "n_bytes", "dup_chunks", "dup_bytes"]
        )

    # per-batch combiner then one bounded merge per doc_id: a doc's
    # chunks can straddle the shuffle's block boundaries, so finish
    # with a groupby-sum keyed on doc_id (narrow int rows only).
    part = marked.map_batches(per_doc, batch_format="pyarrow")
    return part.groupby("doc_id").aggregate(
        ray.data.aggregate.Sum("n_chunks", alias_name="n_chunks"),
        ray.data.aggregate.Sum("n_bytes", alias_name="n_bytes"),
        ray.data.aggregate.Sum("dup_chunks", alias_name="dup_chunks"),
        ray.data.aggregate.Sum("dup_bytes", alias_name="dup_bytes"),
    )

"""Explicit skew handling: explode pathological documents into bounded
chunks, carve them in parallel, reassemble per doc.

The corpus plants ~2% pathological documents with ×100-size payloads
(FIXTURES.md F1). At cluster scale a single multi-GB document inside a
block serializes one task; the fix (SURVEY.md §4 "large-row handling")
is to explode oversized payloads into overlapping fixed-size chunk ROWS
before the scan so the work spreads across tasks, then reassemble hits
with a ``groupby(doc_id)``. Payload bytes are chunk-local; only narrow
hit rows go through the shuffle.

This module is the stand-alone demonstration of that pattern (tested
against the serial oracle's magic hits); the flagship pipeline uses the
in-actor bounded-window scan for the same semantics in one pass.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..corpus import parse_frames
from ..functions.signatures import MAGIC_SIGNATURES

_MAX_MAGIC = max(len(m) for _, m in MAGIC_SIGNATURES)

CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("payload_idx", pa.int32()),
        ("base", pa.int64()),
        ("chunk", pa.large_binary()),
    ]
)

HIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("payload_idx", pa.int32()),
        ("offset", pa.int64()),
        ("sig", pa.int32()),
        ("name", pa.string()),
    ]
)

CARVE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("hits", pa.list_(pa.struct([("payload_idx", pa.int32()),
                                     ("offset", pa.int64()),
                                     ("name", pa.string())]))),
    ]
)


def explode_chunks(batch: pa.Table, chunk_size: int = 1 << 20) -> pa.Table:
    """docs(doc_id, binary) → overlapping chunk rows. Overlap is
    max-signature-length−1 so no boundary hit is lost; hits in the
    overlap are attributed to the earlier chunk only (offset < base+size)."""
    rows = []
    overlap = _MAX_MAGIC - 1
    for doc_id, binary in zip(
        batch.column("doc_id").to_pylist(), batch.column("binary").to_pylist()
    ):
        for pi, body in enumerate(parse_frames(binary or b"")):
            pos = 0
            while pos == 0 or pos < len(body):
                rows.append(
                    {
                        "doc_id": doc_id,
                        "payload_idx": pi,
                        "base": pos,
                        "chunk": body[pos : pos + chunk_size + overlap],
                    }
                )
                pos += chunk_size
                if pos >= len(body):
                    break
    return pa.Table.from_pylist(rows, schema=CHUNK_SCHEMA)


def scan_chunks(batch: pa.Table, chunk_size: int = 1 << 20) -> pa.Table:
    """chunk rows → narrow hit rows (payload bytes do NOT pass through)."""
    rows = []
    for doc_id, pi, base, chunk in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("payload_idx").to_pylist(),
        batch.column("base").to_pylist(),
        batch.column("chunk").to_pylist(),
    ):
        for si, (name, magic) in enumerate(MAGIC_SIGNATURES):
            start = 0
            while True:
                pos = chunk.find(magic, start)
                if pos < 0:
                    break
                if pos < chunk_size:  # overlap hits belong to the earlier chunk
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "payload_idx": pi,
                            "offset": base + pos,
                            "sig": si,
                            "name": name,
                        }
                    )
                start = pos + len(magic)
    return pa.Table.from_pylist(rows, schema=HIT_SCHEMA)


def _assemble_runs(t: pa.Table) -> pa.Table:
    """Complete doc runs (sorted by doc_id, payload_idx, offset, sig) →
    one row per doc with its ordered hit list. Vectorized run-boundary
    assembly, Arrow end to end — the string doc_id/name columns never
    become Python objects; the hit struct children are the input
    columns re-wrapped behind list offsets (zero-copy)."""
    import numpy as np

    if t.num_rows == 0:
        return pa.Table.from_pylist([], schema=CARVE_SCHEMA)
    from ..query_utils import _run_starts_mask_arrow

    starts = np.flatnonzero(_run_starts_mask_arrow(t, ["doc_id"]))
    hit_struct = pa.StructArray.from_arrays(
        [
            t.column("payload_idx").combine_chunks(),
            t.column("offset").combine_chunks(),
            t.column("name").combine_chunks(),
        ],
        fields=list(CARVE_SCHEMA.field("hits").type.value_type),
    )
    offsets = pa.array(np.r_[starts, t.num_rows].astype("int32"))
    return pa.Table.from_arrays(
        [t.column("doc_id").take(pa.array(starts)),
         pa.ListArray.from_arrays(offsets, hit_struct)],
        schema=CARVE_SCHEMA,
    )


def carve_exploded(
    docs: "ray.data.Dataset", chunk_size: int = 1 << 20
) -> "ray.data.Dataset":
    """Full explode → scan → reassemble carve over (doc_id, binary).
    Reassembly is the sort + run-boundary pattern
    (``_window_by_key_arrow``) — per-doc ``map_groups`` would pay Ray's
    per-group dispatch at O(corpus) group count."""
    from ..query_utils import _window_by_key_arrow

    chunks = docs.select_columns(["doc_id", "binary"]).map_batches(
        lambda b: explode_chunks(b, chunk_size), batch_format="pyarrow"
    )
    hits = chunks.map_batches(
        lambda b: scan_chunks(b, chunk_size), batch_format="pyarrow"
    )
    return _window_by_key_arrow(
        hits, ["doc_id"], ["doc_id", "payload_idx", "offset", "sig"], _assemble_runs
    )

"""Training-sequence packing: concatenate documents into fixed-length
token sequences (GPT-style concat-and-cut), the last batch-assembly
stage of a pre-training data pipeline.

Semantics (standard public practice, e.g. GPT-2/3 data loading): docs
are concatenated in order with one EOS separator token each, and the
stream is cut into sequences of exactly ``seq_len`` tokens; a document
may straddle a cut (attention is reset via the recorded boundaries).
The operator emits the PACKING PLAN — per sequence: the member doc ids,
each member's (start, end) token window within the sequence, and the
pad count of the final partial sequence. Materializing token ids from
the plan is a trivial per-worker lookup and deliberately out of scope
(this container has no real tokenizer; counts use the BPE-style
pre-tokenizer regex of functions.text).

Ray-Data shape: packing is PARTITION-LOCAL (one ``map_batches`` with
``batch_size=None`` → one packing plan per block, seq ids namespaced by
a content-derived block tag). Cross-block packing would impose a serial
dependency chain across the whole corpus for zero training benefit —
every published pipeline packs within a shard; the only global effect
is ≤ one partial sequence per block, i.e. ≤ num_blocks × seq_len wasted
pad tokens, negligible at 10^12 scale and exactly what per-shard
packing costs everywhere else.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.text import bpe_token_count

PACKED_SCHEMA = pa.schema(
    [
        ("seq_id", pa.string()),
        ("seq_index", pa.int64()),
        ("doc_ids", pa.list_(pa.int64())),
        ("starts", pa.list_(pa.int64())),
        ("ends", pa.list_(pa.int64())),
        ("n_tokens", pa.int64()),
        ("n_pad", pa.int64()),
    ]
)


def pack_plan_kernel(
    doc_ids: np.ndarray, n_tokens: np.ndarray, seq_len: int, block_tag: str
) -> pa.Table:
    """Concat-and-cut packing plan for one block (vectorized cuts via
    cumsum + searchsorted; the per-sequence member assembly walks
    SEQUENCES, not tokens). Each doc occupies [cum[i], cum[i]+n_i+1)
    in the concatenated stream (+1 = its EOS separator)."""
    n = len(doc_ids)
    if n == 0:
        return pa.Table.from_pylist([], schema=PACKED_SCHEMA)
    tok = n_tokens.astype(np.int64) + 1  # +1 EOS per doc
    cum = np.concatenate(([0], np.cumsum(tok)))  # doc i at [cum[i], cum[i+1])
    total = int(cum[-1])
    n_seqs = (total + seq_len - 1) // seq_len
    # member docs of sequence s = docs overlapping [s*seq_len, (s+1)*seq_len)
    seq_starts = np.arange(n_seqs, dtype=np.int64) * seq_len
    first_doc = np.searchsorted(cum, seq_starts, side="right") - 1
    last_doc = np.minimum(
        np.searchsorted(cum, seq_starts + seq_len, side="left") - 1, n - 1
    )
    counts = last_doc - first_doc + 1
    # flat member index: for each sequence, docs first_doc..last_doc
    member_doc = np.concatenate(
        [np.arange(f, l + 1) for f, l in zip(first_doc, last_doc)]
    ) if n_seqs else np.empty(0, dtype=np.int64)
    seq_of = np.repeat(np.arange(n_seqs), counts)
    # member token window CLIPPED to its sequence, in sequence-local coords
    g_start = np.maximum(cum[member_doc], seq_of * seq_len)
    g_end = np.minimum(cum[member_doc + 1], (seq_of + 1) * seq_len)
    starts = g_start - seq_of * seq_len
    ends = g_end - seq_of * seq_len
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    n_tok_seq = np.full(n_seqs, seq_len, dtype=np.int64)
    n_pad = np.zeros(n_seqs, dtype=np.int64)
    if total % seq_len:
        n_tok_seq[-1] = total % seq_len
        n_pad[-1] = seq_len - n_tok_seq[-1]
    return pa.Table.from_arrays(
        [
            pa.array([f"{block_tag}-{s:08d}" for s in range(n_seqs)]),
            pa.array(np.arange(n_seqs, dtype=np.int64)),
            pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(doc_ids[member_doc].astype(np.int64))
            ),
            pa.ListArray.from_arrays(pa.array(offsets), pa.array(starts)),
            pa.ListArray.from_arrays(pa.array(offsets), pa.array(ends)),
            pa.array(n_tok_seq),
            pa.array(n_pad),
        ],
        schema=PACKED_SCHEMA,
    )


def pack_sequences(
    docs: "object", seq_len: int = 2048
) -> "object":
    """docs(doc_id:int64, text) → packing plan (PACKED_SCHEMA), one
    independent plan per block. Deterministic for a given block split:
    seq ids are namespaced by a tag derived from the block's doc ids,
    so resume/retry of a block reproduces identical rows."""

    def plan(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return pa.Table.from_pylist([], schema=PACKED_SCHEMA)
        counts = np.fromiter(
            (bpe_token_count(x) for x in t.column("text").to_pylist()),
            dtype=np.int64,
            count=len(ids),
        )
        tag = hashlib.md5(ids.tobytes()).hexdigest()[:8]
        return pack_plan_kernel(ids, counts, seq_len, tag)

    return docs.map_batches(plan, batch_format="pyarrow", batch_size=None)


CHUNK_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("chunk_id", pa.int64()),
        ("start_tok", pa.int64()),
        ("n_tok", pa.int64()),
        ("chunk_text", pa.string()),
    ]
)


def chunk_documents(
    ds: "ray.data.Dataset", window: int = 64, stride: int = 48
) -> "ray.data.Dataset":
    """RAG-style chunking: ``(doc_id, text)`` → overlapping token
    windows ``(doc_id, chunk_id, start_tok, n_tok, chunk_text)`` —
    packing's retrieval-side sibling (pack_sequences concatenates for
    TRAINING; this slices for INDEXING). Row-local flat-map, no
    shuffle, no state: chunk starts are ``0, stride, 2·stride, …`` and
    the last window is the short tail (never duplicated — a start is
    emitted only while it is < n_tokens, and a full-coverage final
    window already covers the tail). ``stride < window`` gives the
    standard overlap."""
    from ..functions.text import TOKEN_RE

    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def explode(t: pa.Table) -> pa.Table:
        ids, cids, starts, ntoks, texts = [], [], [], [], []
        for did, txt in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            toks = TOKEN_RE.findall((txt or "").lower())
            n = len(toks)
            for cid, s in enumerate(range(0, max(n, 1), stride)):
                piece = toks[s : s + window]
                ids.append(did)
                cids.append(cid)
                starts.append(s)
                ntoks.append(len(piece))
                texts.append(" ".join(piece))
                if s + window >= n:  # this window reaches the end
                    break
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(cids, pa.int64()),
                pa.array(starts, pa.int64()),
                pa.array(ntoks, pa.int64()),
                pa.array(texts, pa.string()),
            ],
            names=[f.name for f in CHUNK_SCHEMA],
        )

    return ds.map_batches(explode, batch_format="pyarrow")

"""DSIR-style data selection: hashed n-gram importance scores.

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") select pretraining data by the log importance ratio of a
TARGET distribution (clean reference corpus) to the RAW pool, both
estimated over hashed n-gram features — the hashing trick keeps the
estimator a fixed-size array no matter the vocabulary. This module
reproduces the scoring shape deterministically:

- features: word BIGRAMS of the lowercased alphanumeric token stream
  (the repo-wide tokenizer rule), bucketed by the first 8 hex digits
  of ``md5("w1 w2")`` mod ``dim`` — the same md5 bucket convention as
  the hashed classifier (stages/classifier.py), so the DuckDB oracle
  recomputes it exactly;
- distributions: add-one-smoothed bucket frequencies over a
  deterministic TARGET slice (``doc_id % target_mod == 0``) and a
  deterministic RAW slice (``doc_id % raw_mod == 1``) — at 100 TB both
  passes touch fixed fractions and the estimator stays a dim-sized
  array (the CCNet/k-means partial shape: per-batch bincount partials,
  driver reduce, never a shuffle);
- score(doc) = round(Σ over the doc's bigrams of
  ``log((t_b+1)/(T+dim)) − log((r_b+1)/(R+dim))``, 6); docs with no
  bigram score 0.0 and are kept; ``kept = score ≥ threshold``.

Reference analog: none in the reference repo — beyond-reference
training-data surface, beside the perplexity filter (stages/lm.py)
and the hashed quality classifier.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.text import tokenize

DEFAULT_DIM = 4096
SCORE_DECIMALS = 6


def bigram_bucket(w1: str, w2: str, dim: int = DEFAULT_DIM) -> int:
    """First 8 md5 hex digits of ``"w1 w2"`` mod dim (DuckDB twin:
    ``CAST(('0x'||substr(md5(w1||' '||w2),1,8)) AS UBIGINT) % dim``)."""
    return int(
        hashlib.md5(f"{w1} {w2}".encode("utf-8")).hexdigest()[:8], 16
    ) % dim


#: per-process bigram→bucket memo (zipfian bigram distribution: the md5
#: per DISTINCT bigram amortizes to ~zero across batches). BOUNDED
#: (ADVICE r3): long-lived Ray workers serve many queries; past the cap
#: new bigrams are hashed without being remembered — the hot head of the
#: zipf curve is already resident, so the amortization survives.
_BUCKET_MEMO: "dict[tuple[int, str], int]" = {}
_BUCKET_MEMO_MAX = 1_000_000


def _doc_buckets(text: str, dim: int) -> np.ndarray:
    toks = [t.lower() for t in tokenize(text or "")]
    out = np.empty(max(len(toks) - 1, 0), dtype=np.int64)
    for i in range(len(toks) - 1):
        key = (dim, toks[i] + " " + toks[i + 1])
        b = _BUCKET_MEMO.get(key)
        if b is None:
            b = bigram_bucket(toks[i], toks[i + 1], dim)
            if len(_BUCKET_MEMO) < _BUCKET_MEMO_MAX:
                _BUCKET_MEMO[key] = b
        out[i] = b
    return out


@dataclass
class DsirWeights:
    """Broadcastable per-bucket log importance ratios."""

    w: np.ndarray  # (dim,) float64
    dim: int


def dsir_weights(
    docs: "ray.data.Dataset",
    dim: int = DEFAULT_DIM,
    target_mod: int = 7,
    raw_mod: int = 3,
) -> DsirWeights:
    """Estimate the hashed-bigram log ratio from ONE streaming pass:
    each batch emits two dim-bounded partial count vectors (target
    slice: ``doc_id % target_mod == 0``; raw slice:
    ``doc_id % raw_mod == 1``); the driver reduces dim-sized arrays."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        tgt = np.zeros(dim, dtype=np.int64)
        raw = np.zeros(dim, dtype=np.int64)
        for d, x in zip(ids.tolist(), texts):
            in_t = d % target_mod == 0
            in_r = d % raw_mod == 1
            if not (in_t or in_r):
                continue
            b = _doc_buckets(x, dim)
            if not len(b):
                continue
            c = np.bincount(b, minlength=dim)
            if in_t:
                tgt += c
            if in_r:
                raw += c
        return pa.Table.from_arrays(
            [pa.array(tgt), pa.array(raw)], names=["tgt", "raw"]
        )

    tgt = np.zeros(dim, dtype=np.int64)
    raw = np.zeros(dim, dtype=np.int64)
    # batch_size=dim (NOT None): each partial is a dim-row table and
    # the total row count is a multiple of dim, so dim-sized batches
    # are always whole partials — block boundaries may split a partial
    # when the block size is small (tiny-block sweep regression)
    for b in docs.map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    ).iter_batches(batch_size=dim, batch_format="pyarrow"):
        n = b.num_rows // dim
        assert n * dim == b.num_rows, (n, dim, b.num_rows)
        tgt += b.column("tgt").to_numpy(zero_copy_only=False).reshape(n, dim).sum(axis=0)
        raw += b.column("raw").to_numpy(zero_copy_only=False).reshape(n, dim).sum(axis=0)
    t_total, r_total = int(tgt.sum()), int(raw.sum())
    w = np.log((tgt + 1.0) / (t_total + dim)) - np.log(
        (raw + 1.0) / (r_total + dim)
    )
    return DsirWeights(w=w, dim=dim)


def dsir_score(
    docs: "ray.data.Dataset",
    weights: DsirWeights,
    threshold: float = 0.0,
) -> "ray.data.Dataset":
    """docs(doc_id, text) → (doc_id, n_bigrams, score, kept). The
    weight vector broadcasts once via ``ray.put``; scoring is one
    gather + per-doc bincount fold per batch."""
    ref = ray.put(weights)
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_bigrams", pa.int64()),
         ("score", pa.float64()), ("kept", pa.bool_())]
    )

    def score(t: pa.Table) -> pa.Table:
        wts: DsirWeights = ray.get(ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t.column("text").to_pylist()
        bucket_lists = [_doc_buckets(x, wts.dim) for x in texts]
        n_big = np.fromiter((len(b) for b in bucket_lists), dtype=np.int64,
                            count=len(bucket_lists))
        flat = (np.concatenate([b for b in bucket_lists if len(b)])
                if n_big.sum() else np.empty(0, dtype=np.int64))
        vals = wts.w[flat]
        doc_idx = np.repeat(np.arange(len(n_big)), n_big)
        sums = np.bincount(doc_idx, weights=vals, minlength=len(n_big))
        scores = np.round(sums, SCORE_DECIMALS)
        return pa.Table.from_arrays(
            [pa.array(ids), pa.array(n_big), pa.array(scores),
             pa.array(scores >= threshold)],
            schema=out_schema,
        )

    return docs.map_batches(score, batch_format="pyarrow")


def dsir_serial(
    doc_ids: "list[int]", texts: "list[str]",
    dim: int = DEFAULT_DIM, target_mod: int = 7, raw_mod: int = 3,
    threshold: float = 0.0,
) -> "list[tuple[int, int, float, bool]]":
    """Single-process oracle (tests): same contract, plain loops."""
    tgt = np.zeros(dim, dtype=np.int64)
    raw = np.zeros(dim, dtype=np.int64)
    per_doc: "list[np.ndarray]" = []
    for d, x in zip(doc_ids, texts):
        b = _doc_buckets(x, dim)
        per_doc.append(b)
        if len(b):
            c = np.bincount(b, minlength=dim)
            if d % target_mod == 0:
                tgt += c
            if d % raw_mod == 1:
                raw += c
    w = np.log((tgt + 1.0) / (int(tgt.sum()) + dim)) - np.log(
        (raw + 1.0) / (int(raw.sum()) + dim)
    )
    out = []
    for d, b in zip(doc_ids, per_doc):
        s = round(float(w[b].sum()), SCORE_DECIMALS) if len(b) else 0.0
        out.append((int(d), len(b), s, s >= threshold))
    return out

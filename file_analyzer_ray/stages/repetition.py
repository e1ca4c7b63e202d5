"""Repetition-based quality filtering — the Gopher-style "repetitious
document" signals (Rae et al. 2021, appendix A1.1) over the documents
table:

- ``dup_word_frac``      1 − distinct/total tokens
- ``top_bigram_frac``    share of word 2-grams taken by the single
                         most frequent 2-gram
- ``dup_trigram_frac``   1 − distinct/total word 3-grams
- ``flagged``            any signal above its threshold

Everything is ROW-LOCAL (one ``map_batches``, no shuffle, no state):
the operator streams at any corpus size by construction — repetition
filtering is the cheapest gate in a training-data pipeline and should
run before anything that shuffles. Tokenization matches
``functions.text.tokenize`` (lowered ``[A-Za-z0-9]+`` runs) and every
fraction is rounded to 6 decimals so the DuckDB oracle
(tests/test_repetition.py) compares exactly.

Default thresholds are calibrated to the synthetic corpus (see the
distribution table in the test); real deployments tune them per Rae
et al. (0.2 / 0.18 / 0.30 for lines-aware variants).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

import ray.data

from ..functions.text import tokenize

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("dup_word_frac", pa.float64()),
        ("top_bigram_frac", pa.float64()),
        ("dup_trigram_frac", pa.float64()),
        ("flagged", pa.bool_()),
    ]
)


def repetition_metrics(text: str) -> tuple[int, float, float, float]:
    toks = [t.lower() for t in tokenize(text)]
    n = len(toks)
    if n == 0:
        return 0, 0.0, 0.0, 0.0
    dup_word = round(1.0 - len(set(toks)) / n, 6)
    top_bi = 0.0
    if n >= 2:
        c = Counter(zip(toks, toks[1:]))
        top_bi = round(max(c.values()) / (n - 1), 6)
    dup_tri = 0.0
    if n >= 3:
        tris = list(zip(toks, toks[1:], toks[2:]))
        dup_tri = round(1.0 - len(set(tris)) / len(tris), 6)
    return n, dup_word, top_bi, dup_tri


def repetition_filter(
    docs: "ray.data.Dataset",
    max_dup_word: float = 0.65,
    max_top_bigram: float = 0.10,
    max_dup_trigram: float = 0.01,
) -> "ray.data.Dataset":
    """docs(doc_id:int64, text) → per-doc repetition signals + flag.
    A doc is ``flagged`` when ANY signal exceeds its threshold
    (thresholds compare the 6-decimal-rounded values, matching the
    SQL oracle exactly)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        rows = [repetition_metrics(t) for t in batch.column("text").to_pylist()]
        n_tok = [r[0] for r in rows]
        dw = [r[1] for r in rows]
        tb = [r[2] for r in rows]
        dt = [r[3] for r in rows]
        fl = [
            a > max_dup_word or b > max_top_bigram or c > max_dup_trigram
            for a, b, c in zip(dw, tb, dt)
        ]
        return pa.Table.from_arrays(
            [
                pa.array(ids.astype("int64")),
                pa.array(n_tok, pa.int64()),
                pa.array(dw, pa.float64()),
                pa.array(tb, pa.float64()),
                pa.array(dt, pa.float64()),
                pa.array(fl, pa.bool_()),
            ],
            schema=_OUT_SCHEMA,
        )

    return docs.map_batches(fn, batch_format="pyarrow")

"""Gopher-style document quality rules (Rae et al. '21, table A1) —
the rule-based gate that precedes model-based quality scoring in a
web-scale training-data pipeline. Entirely row-local (embarrassingly
parallel — no exchange at any corpus size): one Arrow C++ tokenize per
batch, then numpy bincount folds keyed by the token's parent row.

Emitted per document: word count, mean word length, distinct-word
ratio, stop-word fraction, and the combined `keep` verdict. The
reference applies fixed accept/reject predicates per file before its
expensive model stage (src/core/analyzer.py gating); this is the text
analog with published-rule semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: fixed stop-word list (bounded, broadcast-free: it ships in the
#: function closure). Published Gopher uses a must-contain-2 stop-word
#: rule; over this engine's synthetic vocabulary the informative form
#: is the stop-word FRACTION cap.
STOPWORDS = ("a", "the", "and", "of", "to", "in", "with", "for")

_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_words", pa.int64()),
        ("mean_word_len", pa.float64()),
        ("distinct_ratio", pa.float64()),
        ("stop_frac", pa.float64()),
        ("keep", pa.bool_()),
    ]
)


def gopher_rules(
    docs: "object",
    min_words: int = 30,
    max_words: int = 10_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 5.0,
    min_distinct_ratio: float = 0.3,
    max_stop_frac: float = 0.10,
) -> "object":
    """docs(doc_id:int64, text) → per-doc rule features + keep flag.

    All ratios are exact int/int doubles, so the DuckDB oracle lands
    bit-identical (the docs_quality convention)."""

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _SCHEMA.empty_table()
        txt = t.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        toks = pc.split_pattern_regex(pc.utf8_lower(txt), "[^a-z0-9]+")
        flat = pc.list_flatten(toks)
        parents = pc.list_parent_indices(toks)
        mask = pc.not_equal(flat, "")
        flat = flat.filter(mask)
        par = parents.filter(mask).to_numpy().astype(np.int64)

        n_words = np.bincount(par, minlength=n).astype(np.int64)
        char_sum = np.bincount(
            par, weights=pc.utf8_length(flat).to_numpy().astype(np.float64),
            minlength=n,
        )
        stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(
            zero_copy_only=False
        )
        n_stop = np.bincount(par, weights=stop.astype(np.float64), minlength=n)
        # distinct words per doc: one Arrow group_by over (row, term) —
        # distinct keys out, then a row-keyed bincount.
        uniq = (
            pa.Table.from_arrays([pa.array(par), flat], names=["p", "t"])
            .group_by(["p", "t"])
            .aggregate([])
        )
        n_distinct = np.bincount(
            uniq.column("p").to_numpy().astype(np.int64), minlength=n
        ).astype(np.int64)

        nw = n_words.astype(np.float64)
        safe = np.where(n_words > 0, nw, 1.0)
        mwl = np.where(n_words > 0, char_sum / safe, 0.0)
        dr = np.where(n_words > 0, n_distinct / safe, 0.0)
        sf = np.where(n_words > 0, n_stop / safe, 0.0)
        keep = (
            (n_words >= min_words)
            & (n_words <= max_words)
            & (mwl >= min_mean_word_len)
            & (mwl <= max_mean_word_len)
            & (dr >= min_distinct_ratio)
            & (sf <= max_stop_frac)
        )
        ids = t.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.Table.from_arrays(
            [
                ids.cast(pa.int64()),
                pa.array(n_words),
                pa.array(mwl),
                pa.array(dr),
                pa.array(sf),
                pa.array(keep),
            ],
            schema=_SCHEMA,
        )

    return docs.map_batches(fn, batch_format="pyarrow")

"""Leakage-free train/validation split — content-addressed, so exact
duplicates NEVER straddle the split.

The standard pitfall this prevents: splitting by doc id (or by random
coin per row) puts byte-identical duplicates on both sides and the
eval set leaks into training (the failure mode benchmark-decontam
papers measure; see also stages/decontaminate.py for the cross-corpus
version). The fix is to key the coin on the CONTENT fingerprint, not
the row: every copy of a text flips the same coin.

Determinism contract (the DuckDB oracle recomputes it exactly):

- fingerprint = md5 of the whitespace-normalized lowercased text (the
  repo-wide fingerprint rule, q_docs_fingerprint);
- coin = first 8 hex digits of ``md5(fingerprint)`` as uint32;
  ``split = 'val' iff coin < val_frac * 2^32`` — salting with a seed
  string re-rolls the assignment.

Engine shape: row-local ``map_batches`` — no shuffle, no state; the
leakage guarantee is algebraic (equal text ⇒ equal fingerprint ⇒
equal coin), not enforced by a join.
"""

from __future__ import annotations

import hashlib
import math
import re

import numpy as np
import pyarrow as pa

_WS = re.compile(r"[\t\n\f\r ]+")


def text_fingerprint(text: str) -> str:
    """md5 hex of the whitespace-normalized lowercased text — the
    repo-wide fingerprint rule (DuckDB twin:
    ``md5(lower(trim(regexp_replace(text,'[\\t\\n\\f\\r ]+',' ','g'))))``)."""
    return hashlib.md5(
        _WS.sub(" ", text or "").strip().lower().encode("utf-8")
    ).hexdigest()


def _coin_u32(fp: str, seed: str) -> int:
    return int(hashlib.md5((seed + fp).encode()).hexdigest()[:8], 16)


def leakage_free_split(
    ds: "object", val_frac: float, seed: str = "", text_col: str = "text"
) -> "object":
    """``(doc_id, text, ...)`` → same rows + ``fingerprint`` +
    ``split`` ('train' | 'val'). Expected val share = ``val_frac`` of
    DISTINCT contents; all copies of a text land on one side."""
    # ceil, not floor: the DuckDB twin compares coin < val_frac * 2^32
    # as a FLOAT, and for integer coins that is exactly coin < ceil(x)
    # when x is non-integer (ADVICE r3: the floored threshold made a
    # coin equal to floor(x) 'train' in Python but 'val' in SQL).
    threshold = math.ceil(val_frac * (1 << 32))

    def tag(t: pa.Table) -> pa.Table:
        texts = t.column(text_col).to_pylist()
        fps = [text_fingerprint(x) for x in texts]
        coins = np.fromiter(
            (_coin_u32(fp, seed) for fp in fps), dtype=np.uint64,
            count=len(fps),
        )
        split = np.where(coins < threshold, "val", "train")
        return t.append_column(
            "fingerprint", pa.array(fps, pa.string())
        ).append_column("split", pa.array(split.tolist(), pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")

"""Mock-VLM scorer actor stage.

Actor-pool analog of the reference's model layer (T1-T5 in SURVEY.md
§2.3): the reference reloads a 1.5B FastVLM in a subprocess per image
(src/models/fastvlm/adapter.py:441-546, ~17 s/image); here the "model"
is loaded once per actor in ``__init__`` and scores whole Arrow batches.
Retries happen INSIDE the call via the extract→validate→repair→fallback
chain; per-row outcome lands in ``model_status``/``attempts`` columns
(never an exception). Deterministic: emissions are seeded from the
document's content hash (see functions/scoring.py).

The batch kernel is the same flat-Arrow shape as the fused
``ExtractStage`` (stages/extract.py ``__call__``): the nested spans
column is read via its list offsets + flattened struct children — one
primitive ``to_pylist`` per child, never per-span dict objects.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.scoring import score_doc
from ..functions.text import TOKEN_RE


class ScorerStage:
    """pyarrow batch in → same batch + scoring columns out."""

    def __init__(self, max_words: int = 16):
        self.max_words = max_words
        # Model-load stand-in: compiled tokenizer regex + template banks
        # are module-level; a real VLM checkpoint load would happen here.
        self._tok = TOKEN_RE
        # Per-actor memo: clone-heavy corpora re-score each content hash
        # once per actor (the fused stage keeps the same bound).
        self._memo: dict[str, dict] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .extract import OBJECTS_TYPE

        hashes = batch.column("content_hash").to_pylist()
        spans_col = batch.column("spans")
        spans_arr = (
            spans_col.combine_chunks()
            if isinstance(spans_col, pa.ChunkedArray)
            else spans_col
        )
        loff = spans_arr.offsets.to_pylist()
        sv = spans_arr.values
        f_kind = sv.field("kind").to_pylist()
        f_text = sv.field("text").to_pylist()
        valid = (
            spans_arr.is_valid().to_pylist() if spans_arr.null_count > 0 else None
        )

        modes, descs, tags, objs, names, statuses, attempts = [], [], [], [], [], [], []
        for i in range(batch.num_rows):
            # empty hash = error-channel row: words may differ per row,
            # so those never hit the content-addressed memo
            h = hashes[i] or "0" * 12
            res = self._memo.get(h) if hashes[i] else None
            if res is None:
                lo, hi = loff[i], loff[i + 1]
                if valid is not None and not valid[i]:
                    lo = hi
                words: list[str] = []
                for j in range(lo, hi):
                    if f_kind[j] in ("text", "ocr"):
                        words.extend(self._tok.findall(f_text[j]))
                        if len(words) >= self.max_words:
                            break
                res = score_doc(h, words[: self.max_words])
                if hashes[i] and len(self._memo) < 100_000:
                    self._memo[h] = res
            modes.append(res["mode"])
            descs.append(res["description"])
            tags.append(res["tags"])
            objs.append(res["objects"])
            names.append(res["recommended_filename"])
            statuses.append(res["model_status"])
            attempts.append(res["attempts"])
        return (
            batch.append_column("mode", pa.array(modes, pa.string()))
            .append_column("description", pa.array(descs, pa.string()))
            .append_column("tags", pa.array(tags, pa.list_(pa.string())))
            .append_column("objects", pa.array(objs, OBJECTS_TYPE))
            .append_column("recommended_filename", pa.array(names, pa.string()))
            .append_column("model_status", pa.array(statuses, pa.string()))
            .append_column("attempts", pa.array(attempts, pa.int32()))
        )

"""Mock-VLM scorer actor stage.

Actor-pool analog of the reference's model layer (T1-T5 in SURVEY.md
§2.3): the reference reloads a 1.5B FastVLM in a subprocess per image
(src/models/fastvlm/adapter.py:441-546, ~17 s/image); here the "model"
is loaded once per actor in ``__init__`` and scores whole Arrow batches.
Retries happen INSIDE the call via the extract→validate→repair→fallback
chain; per-row outcome lands in ``model_status``/``attempts`` columns
(never an exception). Deterministic: emissions are seeded from the
document's content hash (see functions/scoring.py).
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

    def _doc_words(self, spans: list[dict]) -> list[str]:
        words: list[str] = []
        for s in spans:
            if s["kind"] in ("text", "ocr"):
                words.extend(self._tok.findall(s["text"]))
                if len(words) >= self.max_words:
                    break
        return words[: self.max_words]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .extract import OBJECTS_TYPE

        hashes = batch.column("content_hash").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        modes, descs, tags, objs, names, statuses, attempts = [], [], [], [], [], [], []
        for h, spans in zip(hashes, spans_col):
            res = score_doc(h or "0" * 12, self._doc_words(spans or []))
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

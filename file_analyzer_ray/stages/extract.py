"""Fused extraction stage: normalize → sniff → meta → OCR parse → carve →
pattern match, per Arrow batch.

This is the hot path of the flagship pipeline. It is a callable CLASS so
``map_batches(ExtractStage, concurrency=N)`` runs it as an actor pool:
the multi-pattern automata (compiled alternation regexes over str and
bytes — the in-process ClamAV/ripgrep/binwalk analog, reference
src/core/analyzer.py:478-723) are built ONCE per actor in ``__init__``
and reused for every batch.

Scale/skew notes:
- batches arrive as zero-copy ``pyarrow.Table``; the per-row work
  (regex scans over KB..MB payloads) dominates, so the per-row Python
  dispatch is amortized; all scanning is C-speed ``re`` / ``bytes.find``.
- pathological large payloads are scanned in bounded overlapping
  windows (``chunk_size`` + overlap of max-signature-length−1), so actor
  heap usage is O(chunk), not O(payload); whole-payload materialization
  is avoided for the scan itself.
- output rows carry ``status`` instead of raising (error-channel
  semantics of reference src/core/analyzer.py:296-313) so one poisoned
  document never fails a block.

Semantics must equal :mod:`file_analyzer_ray.oracle` (serial golden
implementation) under span-sequence equality — enforced by
tests/test_pipeline.py.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..corpus import parse_frames
from ..functions.hashing import content_hash as _content_hash
from ..functions.signatures import (
    EXIF_BEGIN,
    EXIF_END,
    MAGIC_SIGNATURES,
    OCR_BEGIN,
    OCR_END,
    PATTERN_SIGNATURES,
)
from ..functions.text import WS_RE

OUT_SPANS_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", OUT_SPANS_TYPE),
        ("content_hash", pa.string()),
        ("n_spans", pa.int32()),
        ("status", pa.string()),
    ]
)

SCORED_SCHEMA = pa.schema(
    list(EXTRACTED_SCHEMA)
    + [
        ("mode", pa.string()),
        ("description", pa.string()),
        ("tags", pa.list_(pa.string())),
        ("recommended_filename", pa.string()),
        ("model_status", pa.string()),
        ("attempts", pa.int32()),
    ]
)

_EMPTY_SCORE = {
    "mode": "",
    "description": "",
    "tags": [],
    "recommended_filename": "",
    "model_status": "skipped",
    "attempts": 0,
}


class ExtractStage:
    """Actor-pool batch extractor (pyarrow Table in → pyarrow Table out).

    With ``score=True`` the mock-VLM scoring chain (stages/scorer.py
    semantics) runs FUSED in the same pass: the span lists are already
    Python objects here, so fusing avoids a second actor pool and a
    full object-store round trip of the heavy ``spans`` column — the
    dominant inter-stage cost at 100k+ docs."""

    def __init__(self, chunk_size: int = 1 << 20, score: bool = False,
                 max_words: int = 16):
        self.score = score
        self.max_words = max_words
        # Multi-pattern text automaton: one alternation regex (prefix-free
        # pattern set ⇒ equivalent to per-pattern scans); hit order is
        # recovered as (position, pattern priority).
        self._pat_index = {p: i for i, p in enumerate(PATTERN_SIGNATURES)}
        self._pat_re = re.compile(
            "|".join(re.escape(p) for p in sorted(PATTERN_SIGNATURES, key=len, reverse=True))
        )
        self._magic_res = [
            (name, re.compile(re.escape(magic)), len(magic))
            for name, magic in MAGIC_SIGNATURES
        ]
        self._max_magic = max(len(m) for _, m in MAGIC_SIGNATURES)
        self._chunk = max(chunk_size, 4 * self._max_magic)

    # -- scanning helpers -------------------------------------------------
    def _text_hits(self, text: str) -> list[tuple[int, int, str]]:
        hits = [
            (m.start(), self._pat_index[m.group()], m.group())
            for m in self._pat_re.finditer(text)
        ]
        hits.sort(key=lambda h: (h[0], h[1]))
        return hits

    def _magic_hits(self, body: bytes) -> list[tuple[int, int, str]]:
        """All container-magic occurrences; bounded-window scan with
        overlap so memory stays O(chunk) on pathological payloads."""
        hits: list[tuple[int, int, str]] = []
        n = len(body)
        step = self._chunk
        overlap = self._max_magic - 1
        seen: set[tuple[int, int]] = set()
        pos = 0
        while pos < n:
            window = body[pos : pos + step + overlap]
            for si, (name, rx, _mlen) in enumerate(self._magic_res):
                for m in rx.finditer(window):
                    key = (pos + m.start(), si)
                    if key not in seen:
                        seen.add(key)
                        hits.append((pos + m.start(), si, name))
            pos += step
        hits.sort(key=lambda h: (h[0], h[1]))
        return hits

    def _sniff(self, body: bytes) -> str:
        for name, magic in MAGIC_SIGNATURES:
            if body.startswith(magic):
                return name
        return "data"

    # -- per-document extraction -----------------------------------------
    def _extract_one(self, doc_id: str, spans: list[dict], binary: bytes) -> dict:
        payloads = parse_frames(binary or b"")
        pay_for: dict[int, bytes] = {}
        k = 0
        for idx, s in enumerate(spans):
            if s["kind"] in ("media", "binary"):
                if k < len(payloads):
                    pay_for[idx] = payloads[k]
                k += 1
        order = sorted(range(len(spans)), key=lambda i: (spans[i]["offset"], i))
        out_k: list[str] = []
        out_t: list[str] = []
        out_r: list[str] = []
        norm_pairs: list[tuple[str, str]] = []
        hash_payloads: list[bytes] = []
        for i in order:
            s = spans[i]
            kind = s["kind"]
            if kind == "text":
                text = WS_RE.sub(" ", s["text"] or "").strip()
                if not text:
                    continue
                norm_pairs.append(("text", text))
                out_k.append("text"); out_t.append(text); out_r.append("")
                for _pos, _pi, pat in self._text_hits(text):
                    out_k.append("match"); out_t.append(pat); out_r.append("")
                continue
            ref = s["media_ref"] or ""
            norm_pairs.append((kind, ""))
            body = pay_for.get(i)
            if body is None:
                out_k.append("meta"); out_t.append("SniffedType: empty"); out_r.append(ref)
                continue
            hash_payloads.append(body)
            out_k.append("meta"); out_t.append(f"SniffedType: {self._sniff(body)}"); out_r.append(ref)
            e0 = body.find(EXIF_BEGIN)
            if e0 >= 0:
                e1 = body.find(EXIF_END, e0 + len(EXIF_BEGIN))
                if e1 >= 0:
                    block = body[e0 + len(EXIF_BEGIN) : e1].decode("utf-8", "replace")
                    for line in block.split("\n"):
                        if ": " in line:
                            out_k.append("meta"); out_t.append(line); out_r.append(ref)
            o0 = body.find(OCR_BEGIN)
            if o0 >= 0:
                o1 = body.find(OCR_END, o0 + len(OCR_BEGIN))
                if o1 >= 0:
                    ocr = body[o0 + len(OCR_BEGIN) : o1].decode("utf-8", "replace")
                    out_k.append("ocr"); out_t.append(ocr); out_r.append(ref)
                    for _pos, _pi, pat in self._text_hits(ocr):
                        out_k.append("match"); out_t.append(pat); out_r.append(ref)
            for pos, _si, name in self._magic_hits(body):
                out_k.append("embedded"); out_t.append(f"{name}@{pos}"); out_r.append(ref)
        n = len(out_k)
        chash = _content_hash(norm_pairs, hash_payloads)
        row = {
            "doc_id": doc_id,
            "spans": [
                {"kind": out_k[j], "text": out_t[j], "media_ref": out_r[j], "offset": j}
                for j in range(n)
            ],
            "content_hash": chash,
            "n_spans": n,
            "status": "success",
        }
        if self.score:
            from ..functions.scoring import score_doc
            from ..functions.text import TOKEN_RE

            words: list[str] = []
            for j in range(n):
                if out_k[j] in ("text", "ocr"):
                    words.extend(TOKEN_RE.findall(out_t[j]))
                    if len(words) >= self.max_words:
                        break
            row.update(score_doc(chash or "0" * 12, words[: self.max_words]))
        return row

    # -- batch entry ------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        spans_col = batch.column("spans").to_pylist()
        bin_col = batch.column("binary").to_pylist()
        rows = []
        for doc_id, spans, binary in zip(doc_ids, spans_col, bin_col):
            try:
                rows.append(self._extract_one(doc_id, spans or [], binary))
            except Exception as exc:  # error-channel row, never a failed block
                err = {
                    "doc_id": doc_id,
                    "spans": [],
                    "content_hash": "",
                    "n_spans": 0,
                    "status": f"error: {type(exc).__name__}: {exc}"[:200],
                }
                if self.score:
                    err.update(_EMPTY_SCORE)
                rows.append(err)
        return pa.Table.from_pylist(
            rows, schema=SCORED_SCHEMA if self.score else EXTRACTED_SCHEMA
        )

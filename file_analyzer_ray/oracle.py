"""Serial, single-process oracle for the extraction pipeline.

Computes the *expected* ordered span sequence per document — the golden
output the Ray pipeline must equal under the span-sequence-equality
invariant ``(kind, text, media_ref, order)`` (BASELINE.json north_rule).

This is a deliberately straightforward per-doc implementation (plain
``str.find`` / line splits, no Arrow, no Ray, no batching) so that the
distributed pipeline in :mod:`file_analyzer_ray.pipelines.extract` —
which uses fused Arrow batch stages, compiled multi-pattern automata in
actor pools, a skew-split branch and re-indexing — is checked against an
independent expression of the same semantics, mirroring how the
reference validates tool wrappers against golden per-tool outputs
(reference tests/test_fastvlm_json_parsing.py:24-50, SURVEY.md §5).

Extraction semantics (per document):

1. Normalize: spans stably sorted by input ``offset``; text spans whose
   whitespace-normalized text is empty are dropped; payload frames
   associate with media/binary spans in original span order.
2. Per text span: emit ``(text, normalized_text, '')`` then one
   ``(match, pattern, '')`` per signature occurrence, ordered by
   (position, pattern priority).
3. Per media/binary span with payload body:
   - ``(meta, 'SniffedType: <t>', ref)`` — magic-byte sniff at body
     start, else ``data`` (``empty`` for a missing frame)
   - one ``(meta, 'Key: Value', ref)`` per EXIF-block line, in order
   - ``(ocr, sentence, ref)`` for the OCR text layer, then its
     ``(match, pattern, ref)`` hits
   - one ``(embedded, '<name>@<byte_off>', ref)`` per container magic
     occurrence anywhere in the body, ordered by (offset, priority)
4. Re-index: output ``offset`` = position 0..n-1 in the final sequence.
"""

from __future__ import annotations

from .corpus import parse_frames
from .functions.hashing import content_hash as _content_hash
from .functions.signatures import (
    EXIF_BEGIN,
    EXIF_END,
    MAGIC_SIGNATURES,
    OCR_BEGIN,
    OCR_END,
    PATTERN_SIGNATURES,
)
from .functions.text import normalize_ws


def _pattern_hits(text: str) -> list[tuple[int, int]]:
    """(position, pattern_index) for every non-overlapping occurrence of
    each signature pattern, sorted by (position, pattern_index)."""
    hits: list[tuple[int, int]] = []
    for pi, pat in enumerate(PATTERN_SIGNATURES):
        start = 0
        while True:
            pos = text.find(pat, start)
            if pos < 0:
                break
            hits.append((pos, pi))
            start = pos + len(pat)
    hits.sort()
    return hits


def _magic_hits(body: bytes) -> list[tuple[int, int]]:
    """(byte_offset, signature_index) for every container-magic
    occurrence in the body, sorted by (offset, signature priority)."""
    hits: list[tuple[int, int]] = []
    for si, (_name, magic) in enumerate(MAGIC_SIGNATURES):
        start = 0
        while True:
            pos = body.find(magic, start)
            if pos < 0:
                break
            hits.append((pos, si))
            start = pos + len(magic)
    hits.sort()
    return hits


def _sniff(body: bytes) -> str:
    for name, magic in MAGIC_SIGNATURES:
        if body.startswith(magic):
            return name
    return "data"


def _exif_lines(body: bytes) -> list[str]:
    start = body.find(EXIF_BEGIN)
    if start < 0:
        return []
    start += len(EXIF_BEGIN)
    end = body.find(EXIF_END, start)
    if end < 0:
        return []
    block = body[start:end].decode("utf-8", errors="replace")
    return [ln for ln in block.split("\n") if ": " in ln]


def _ocr_text(body: bytes) -> str | None:
    start = body.find(OCR_BEGIN)
    if start < 0:
        return None
    start += len(OCR_BEGIN)
    end = body.find(OCR_END, start)
    if end < 0:
        return None
    return body[start:end].decode("utf-8", errors="replace")


def extract_doc(doc: dict) -> dict:
    """Oracle extraction of one raw document dict
    ``{doc_id, spans: [...], binary: bytes}`` → output row dict
    ``{doc_id, spans, content_hash, n_spans}``."""
    doc_id = doc["doc_id"]
    raw_spans = list(doc["spans"] or [])
    payloads = parse_frames(doc.get("binary") or b"")

    # Associate payloads with media/binary spans in original order.
    pay_for: dict[int, bytes] = {}
    k = 0
    for idx, s in enumerate(raw_spans):
        if s["kind"] in ("media", "binary"):
            if k < len(payloads):
                pay_for[idx] = payloads[k]
            k += 1

    order = sorted(range(len(raw_spans)), key=lambda i: (raw_spans[i]["offset"], i))

    out: list[dict] = []
    norm_pairs: list[tuple[str, str]] = []
    hash_payloads: list[bytes] = []

    for i in order:
        s = raw_spans[i]
        kind = s["kind"]
        if kind == "text":
            text = normalize_ws(s["text"])
            if not text:
                continue
            norm_pairs.append(("text", text))
            out.append({"kind": "text", "text": text, "media_ref": ""})
            for _pos, pi in _pattern_hits(text):
                out.append(
                    {"kind": "match", "text": PATTERN_SIGNATURES[pi], "media_ref": ""}
                )
        else:
            ref = s["media_ref"]
            norm_pairs.append((kind, ""))
            body = pay_for.get(i)
            if body is None:
                out.append({"kind": "meta", "text": "SniffedType: empty", "media_ref": ref})
                continue
            hash_payloads.append(body)
            out.append(
                {"kind": "meta", "text": f"SniffedType: {_sniff(body)}", "media_ref": ref}
            )
            for line in _exif_lines(body):
                out.append({"kind": "meta", "text": line, "media_ref": ref})
            ocr = _ocr_text(body)
            if ocr is not None:
                out.append({"kind": "ocr", "text": ocr, "media_ref": ref})
                for _pos, pi in _pattern_hits(ocr):
                    out.append(
                        {"kind": "match", "text": PATTERN_SIGNATURES[pi], "media_ref": ref}
                    )
            for pos, si in _magic_hits(body):
                name = MAGIC_SIGNATURES[si][0]
                out.append(
                    {"kind": "embedded", "text": f"{name}@{pos}", "media_ref": ref}
                )

    for rank, span in enumerate(out):
        span["offset"] = rank

    return {
        "doc_id": doc_id,
        "spans": out,
        "content_hash": _content_hash(norm_pairs, hash_payloads),
        "n_spans": len(out),
    }


def extract_docs(docs: list[dict]) -> list[dict]:
    return [extract_doc(d) for d in docs]


def dedup_clusters(extracted: list[dict]) -> dict[str, dict]:
    """Expected exact-dedup clusters: content_hash →
    {canonical_doc_id (min), cluster_size, member_ids (sorted)}."""
    groups: dict[str, list[str]] = {}
    for row in extracted:
        groups.setdefault(row["content_hash"], []).append(row["doc_id"])
    return {
        h: {
            "canonical_doc_id": min(ids),
            "cluster_size": len(ids),
            "member_ids": sorted(ids),
        }
        for h, ids in groups.items()
    }

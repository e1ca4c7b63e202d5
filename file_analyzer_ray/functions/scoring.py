"""Deterministic mock-VLM scoring (content-hash seeded).

Replaces the reference's FastVLM subprocess adapter chain
(src/models/fastvlm/adapter.py:101-546, mock adapter
src/models/mock_adapter.py:31-305) with a pure function: the "model
output" is a deterministic template chosen by the document's content
hash — including deliberately malformed / truncated / plain-text outputs
at the reference-observed failure rates — and is then pushed through the
real extract→validate→repair→fallback chain
(:mod:`file_analyzer_ray.functions.json_extract`), so the parsing code
paths are exercised for real. Seeding from content (not wall clock /
``random``) follows the reference's own deterministic sample-cache
pattern (src/cli/benchmark/samples.py:131-200) and the determinism
requirement in SURVEY.md §4.
"""

from __future__ import annotations

import json

from .json_extract import process_model_output
from .tags import clean_tags, suggest_filename

MODES = ["describe", "detect", "document"]

CATEGORIES = [
    "landscape",
    "portrait",
    "diagram",
    "screenshot",
    "document scan",
    "chart",
    "logo",
    "map",
]

_OBJECT_BANK = ["duck", "car", "tree", "house", "sign", "book", "phone", "cat"]


def _mode_and_style(h: int) -> tuple[str, int]:
    return MODES[h % 3], (h // 3) % 100


# Escalating prompt ladder (reference src/models/fastvlm/json.py:118-253:
# the model is re-asked up to 3x, each time with a stricter JSON-only
# instruction). The prompt TEXT feeds the deterministic emission below —
# a stricter prompt makes a non-compliant "model" comply with a fixed
# per-document probability, so the escalation path (different prompt →
# different emission → retry success) is exercised for real.
PROMPTS_BY_MODE = {
    "describe": "Describe this image. Return JSON with description and tags.",
    "detect": "Detect objects. Return JSON with description and objects.",
    "document": "Transcribe this document. Return JSON with text and document_type.",
}
_STRICT_SUFFIXES = [
    "",  # attempt 1: the mode prompt as-is
    " Respond with ONLY the JSON object, no prose.",  # attempt 2
    " OUTPUT EXACTLY ONE JSON OBJECT AND NOTHING ELSE.",  # attempt 3
]


def prompt_for(mode: str, attempt: int = 1) -> str:
    """Prompt-by-mode with escalation (attempt is 1-based, capped at 3)."""
    i = min(max(attempt, 1), len(_STRICT_SUFFIXES)) - 1
    return PROMPTS_BY_MODE[mode] + _STRICT_SUFFIXES[i]


def raw_model_output(
    content_hash: str, words: list[str], attempt: int = 1
) -> tuple[str, str]:
    """(mode, raw_text): the deterministic 'model' emission for a doc.

    Style buckets (per 100): <80 valid JSON, <90 malformed truncated JSON
    with a repeated tag run (the 512-token failure mode from reference
    tests/test_fastvlm_json_parsing.py:30-32), <97 JSON embedded in
    chatter, else plain text (no JSON at all).

    ``attempt`` models the re-ask: a plain-text emitter complies with
    the stricter attempt-2 prompt iff bit 7 of the doc hash is 0, and
    with the strictest attempt-3 prompt iff bit 8 is 0 — deterministic
    per document, so roughly half the initial failures recover per
    escalation level and the rest fall back after 3 attempts (the
    reference's max_retries behavior).
    """
    h = int(content_hash[:12], 16)
    mode, style = _mode_and_style(h)
    cat = CATEGORIES[h % len(CATEGORIES)]
    obj = _OBJECT_BANK[(h >> 4) % len(_OBJECT_BANK)]
    toks = [w for w in words[:4] if w] or ["scene"]
    desc = f"A {cat} showing a {obj} with {' and '.join(toks[:2])}"
    # The JSON emissions are built with f-strings, NOT json.dumps: the
    # interpolated values come from [A-Za-z0-9 ]-only alphabets (tokens
    # are TOKEN_RE matches, categories/objects are fixed ASCII words),
    # so no JSON escaping can ever trigger and the strings are
    # byte-identical to json.dumps output (pinned by a unit test) —
    # dumps was 13% of the extraction kernel's profile.
    if mode == "describe":
        tag_list = ", ".join(
            f'"{t}"' for t in ("image", cat.split()[0], obj, *toks[:3])
        )
        valid = f'{{"description": "{desc}", "tags": [{tag_list}]}}'
    elif mode == "detect":
        valid = (
            f'{{"description": "{desc}", "objects": '
            f'[{{"name": "{obj}", "location": "center", "confidence": 0.9}}, '
            f'{{"name": "{toks[0]}", "location": "left", "confidence": 0.7}}]}}'
        )
    else:
        text = " ".join(words[:16]) or desc
        valid = f'{{"text": "{text}", "document_type": "{cat}"}}'
    if style < 80:
        return mode, valid
    if style < 90:
        # Truncated mid-array with a repeated tag run.
        rep = ", ".join([f'"{obj}"'] * 12)
        broken = (
            '{"description": "' + desc + '", "tags": [' + rep + ', "' + cat[:4]
        )
        if mode == "detect":
            broken = (
                '{"description": "' + desc + '", "objects": [{"name": "'
                + obj + '", "location": "center"}, {"name": "' + obj
            )
        if mode == "document":
            broken = (
                '{"text": "' + (" ".join(words[:8]) or desc)
                + '", "document_type": "' + cat
            )
        return mode, broken
    if style < 97:
        return mode, f"Sure! Here is the JSON you asked for:\n{valid}\nHope this helps."
    # Plain-text emitter: complies only under a stricter re-ask prompt.
    if (attempt >= 2 and (h >> 7) & 1 == 0) or (attempt >= 3 and (h >> 8) & 1 == 0):
        return mode, valid
    return mode, f"# Analysis\nThis {cat} appears to show a {obj}. No JSON available."


def score_doc(content_hash: str, words: list[str]) -> dict:
    """Full scorer result for one document: run the deterministic model
    emission through the robust parsing chain, clean tags, derive the
    recommended filename (reference flow §3.1 steps 4-7, fused into one
    pass instead of a second model call)."""
    mode = MODES[int(content_hash[:12], 16) % 3]
    max_retries = 3
    for attempt in range(1, max_retries + 1):
        _mode, raw = raw_model_output(content_hash, words, attempt=attempt)
        result = process_model_output(raw, mode)
        if result.get("extracted"):
            break
    result["attempts"] = attempt  # model re-asks, reference T2 semantics
    description = str(result.get("description") or result.get("text") or "")
    tags = clean_tags(result.get("tags") or [])
    filename = suggest_filename(None, description, "")
    return {
        "mode": mode,
        "description": description,
        "tags": tags,
        "objects": clean_objects(result.get("objects")),
        "recommended_filename": filename,
        "model_status": "extracted" if result.get("extracted") else "fallback",
        "attempts": int(result.get("attempts", 1)),
    }


def clean_objects(raw) -> list[dict]:
    """Sanitize detect-mode ``objects`` to the reference's typed shape
    ``[{name, location, confidence}]`` (reference
    src/models/mock_adapter.py:190-218 emission, schema
    src/utils/json_utils.py:190-196). Non-detect modes and fallback
    rows yield []; a repaired emission truncated before ``confidence``
    keeps the object with confidence=None (nullable in the Arrow
    schema) rather than dropping detection evidence."""
    if not isinstance(raw, list):
        return []
    out = []
    for o in raw:
        if not isinstance(o, dict) or "name" not in o:
            continue
        conf = o.get("confidence")
        out.append(
            {
                "name": str(o.get("name") or ""),
                "location": str(o.get("location") or ""),
                "confidence": float(conf) if isinstance(conf, (int, float)) else None,
            }
        )
    return out

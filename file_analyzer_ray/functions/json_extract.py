"""Robust JSON extraction from model text output.

Re-expresses the semantics of the reference's extraction chain
(src/utils/json_utils.py:39-348 and src/models/fastvlm/adapter.py:515-534)
as pure functions:

1. ``extract_json_from_text`` — whole-text parse, then balanced-brace
   scan (string/escape aware) preferring objects with expected vision
   fields, else the largest object; regex fallback on truncated text.
2. ``validate_json_structure`` — mode-dependent required fields
   (describe→{description,tags}, detect→{objects,description},
   document→{text,document_type}).
3. ``repair_json`` — close unterminated strings/brackets, drop trailing
   commas (json_repair analog used at adapter.py:515-526).
4. ``fallback_response`` — wrap unparseable text
   (src/utils/json_utils.py:233-256).
5. ``process_model_output`` — extract→validate→(repair)→fallback with an
   ``extracted`` flag and ``attempts`` count (src/utils/json_utils.py:288-348).

All functions are deterministic and side-effect free.
"""

from __future__ import annotations

import json
import re
from typing import Any

EXPECTED_FIELDS = ["description", "tags", "objects", "text", "document_type"]

MODE_REQUIRED_FIELDS: dict[str, list[str]] = {
    "describe": ["description", "tags"],
    "detect": ["objects", "description"],
    "document": ["text", "document_type"],
}

_MAX_REGEX_TEXT = 10_000  # truncation guard, mirrors reference json_utils.py:128

# Flat (non-nested) object candidates only — linear-time by construction.
# The quote-aware nested variant the reference uses backtracks
# catastrophically on truncated JSON; nesting is already handled by the
# balanced-brace scan in strategy 2, so the last-ditch regex stays simple.
_FLAT_JSON_RE = re.compile(r"\{[^{}]*\}", re.DOTALL)


def _balanced_objects(text: str) -> list[Any]:
    """Scan every '{' and return each first complete balanced JSON object
    parsed from it, tracking string/escape state so braces inside strings
    don't count."""
    found: list[Any] = []
    n = len(text)
    for start in range(n):
        if text[start] != "{":
            continue
        depth = 0
        in_str = False
        esc = False
        for i in range(start, n):
            ch = text[i]
            if in_str:
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
            elif ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    candidate = text[start : i + 1]
                    try:
                        found.append(json.loads(candidate))
                    except json.JSONDecodeError:
                        pass
                    break
                if depth < 0:
                    break
    return found


def extract_json_from_text(text: str | None) -> dict | None:
    """Extract the most relevant JSON object from free-form model text."""
    if not text:
        return None
    # Strategy 1: the whole text is a JSON object. A bare scalar/array
    # parse is NOT a result — fall through to the object scan (contract
    # is dict-or-None, mirroring the reference's expected-fields flow).
    try:
        obj = json.loads(text)
        if isinstance(obj, dict):
            return obj
    except json.JSONDecodeError:
        pass
    # Strategy 2: balanced-brace scan.
    objs = _balanced_objects(text)
    dicts = [o for o in objs if isinstance(o, dict)]
    if dicts:
        for o in dicts:
            if "description" in o and "tags" in o:
                return o
        for o in dicts:
            if any(f in o for f in EXPECTED_FIELDS):
                return o
        return max(dicts, key=lambda o: len(json.dumps(o, sort_keys=True)))
    # Strategy 3: regex over (truncated) text for flat JSON-ish chunks.
    clipped = text[:_MAX_REGEX_TEXT]
    for m in _FLAT_JSON_RE.finditer(clipped):
        chunk = m.group(0)
        if any(f'"{f}"' in chunk for f in EXPECTED_FIELDS):
            try:
                return json.loads(chunk)
            except json.JSONDecodeError:
                try:
                    return json.loads(chunk.replace("\\'", "'"))
                except json.JSONDecodeError:
                    continue
    return None


def validate_json_structure(
    data: Any, mode: str = "describe", expected_fields: list[str] | None = None
) -> bool:
    """True iff ``data`` is a dict containing every field the mode requires."""
    if not isinstance(data, dict) or not data:
        return False
    required = expected_fields or MODE_REQUIRED_FIELDS.get(mode, ["description", "tags"])
    return all(f in data for f in required)


def repair_json(text: str) -> dict | None:
    """Best-effort repair of truncated/malformed JSON: trim to the last
    complete value, close open strings and brackets, drop trailing commas.

    Deterministic stand-in for the ``json_repair`` library used by the
    reference (src/models/fastvlm/adapter.py:515-526): handles the
    repetition-truncated outputs its golden tests cover
    (tests/test_fastvlm_json_parsing.py:30-32,69-93).
    """
    if not text:
        return None
    start = text.find("{")
    if start < 0:
        return None
    s = text[start:]
    # Walk the string tracking bracket stack + string state; remember the
    # longest prefix that ends at a "safe" point (just after a value).
    stack: list[str] = []
    in_str = False
    esc = False
    last_safe = 0
    for i, ch in enumerate(s):
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
                last_safe = i + 1
            continue
        if ch == '"':
            in_str = True
        elif ch in "{[":
            stack.append(ch)
        elif ch in "}]":
            if stack:
                stack.pop()
            last_safe = i + 1
        elif ch in "0123456789eE.+-truefalsnl":
            last_safe = i + 1
    prefix = s[:last_safe] if last_safe else s
    if in_str:
        # The truncation happened inside a string: keep it and close it.
        prefix = s.rstrip("\\") + '"'
        # Recompute the open-bracket stack for the extended prefix.
        stack = []
        st_in = False
        st_esc = False
        for ch in prefix:
            if st_in:
                if st_esc:
                    st_esc = False
                elif ch == "\\":
                    st_esc = True
                elif ch == '"':
                    st_in = False
                continue
            if ch == '"':
                st_in = True
            elif ch in "{[":
                stack.append(ch)
            elif ch in "}]":
                if stack:
                    stack.pop()
    prefix = re.sub(r",\s*$", "", prefix)
    closing = "".join("}" if ch == "{" else "]" for ch in reversed(stack))
    for candidate in (prefix + closing, re.sub(r",\s*([}\]])", r"\1", prefix + closing)):
        try:
            obj = json.loads(candidate)
            if isinstance(obj, dict):
                return obj
        except json.JSONDecodeError:
            continue
    return None


def fallback_response(text: str) -> dict:
    """Wrap unparseable model text (reference src/utils/json_utils.py:233-256)."""
    return {
        "text": (text or "").strip(),
        "metadata": {"json_parsing_failed": True},
    }


def dedup_adjacent(values: list) -> list:
    """Collapse exact repeats while preserving first-seen order — used to
    tame repetition-truncated tag lists after repair (golden behavior in
    reference tests/test_fastvlm_json_parsing.py:69-93)."""
    seen: set = set()
    out = []
    for v in values:
        key = json.dumps(v, sort_keys=True) if isinstance(v, (dict, list)) else v
        if key not in seen:
            seen.add(key)
            out.append(v)
    return out


def process_model_output(raw: str, mode: str = "describe") -> dict:
    """Full extract→validate→repair→fallback chain.

    Returns the parsed dict augmented with ``extracted: bool`` and
    ``attempts: int`` (reference src/utils/json_utils.py:288-348; repair
    ordering per src/models/fastvlm/adapter.py:515-534).
    """
    attempts = 1
    obj = extract_json_from_text(raw)
    if obj is not None and validate_json_structure(obj, mode):
        out = dict(obj)
        out["extracted"] = True
        out["attempts"] = attempts
        return out
    attempts += 1
    repaired = repair_json(raw or "")
    if repaired is not None and validate_json_structure(repaired, mode):
        out = dict(repaired)
        if isinstance(out.get("tags"), list):
            out["tags"] = dedup_adjacent(out["tags"])
        out["extracted"] = True
        out["attempts"] = attempts
        return out
    out = fallback_response(raw or "")
    out["extracted"] = False
    out["attempts"] = attempts
    return out

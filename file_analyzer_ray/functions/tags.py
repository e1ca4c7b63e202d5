"""Tag cleaning + intelligent filename generation (pure functions).

Semantics from reference src/cli/utils/render.py:13-166 (tag
frequency/generic-term filtering, top-10 cap; filename fallback regex
extraction) — reimplemented, with the constant lists copied as data for
output equality (SURVEY.md §7.5).
"""

from __future__ import annotations

import re
from collections import Counter

from .signatures import GENERIC_TAGS

_CONTENT_PATTERNS: list[tuple[str, str]] = [
    (r"\bletter\s+['\"]?([A-Za-z])['\"]?", "letter"),
    (r"\bnumber\s+['\"]?(\d+)['\"]?", "number"),
    (r"\bicon\s+of\s+a?\s*(\w+)", "icon"),
    (r"\bsymbol\s+([A-Za-z])\b", "symbol"),
]

_KEY_OBJECTS_RE = re.compile(
    r"\b(?:duck|penguin|cat|dog|car|house|tree|book|phone|icon|symbol|letter|number|logo|sign)\b"
)
_PROPER_NOUN_RE = re.compile(r"\b[A-Z][a-z]+\b")
_NOISE_WORDS = {"the", "of", "in", "at", "on", "a", "an"}


def clean_tags(tags: list[str] | None, top_k: int = 10) -> list[str]:
    """Lowercase+strip, drop generic tags and tags of length ≤2, count,
    sort by (-frequency, alpha), keep top ``top_k``
    (reference src/cli/utils/render.py:13-38)."""
    if not tags:
        return []
    counts = Counter(t.lower().strip() for t in tags if t and t.strip())
    kept = {t: c for t, c in counts.items() if t not in GENERIC_TAGS and len(t) > 2}
    ordered = sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))
    return [t for t, _ in ordered[:top_k]]


def sanitize_filename_fragment(text: str) -> str:
    """Model-suggested-name cleanup: keep word chars/hyphens, hyphen-join
    (reference src/cli/utils/render.py:99-102)."""
    s = re.sub(r"[^\w\s-]", "", (text or "").lower())
    s = re.sub(r"\s+", "-", s)
    s = re.sub(r"-+", "-", s)
    return s.strip("-")


def filename_from_description(description: str, file_ext: str = "") -> str:
    """Regex-fallback filename derivation
    (reference src/cli/utils/render.py:118-166): content patterns
    (letter/number/icon/symbol), then key-object nouns, then proper
    nouns, else ``unknown-content``."""
    description = description or ""
    for pattern, prefix in _CONTENT_PATTERNS:
        m = re.search(pattern, description, re.IGNORECASE)
        if m:
            return f"{prefix}-{m.group(1).lower()}{file_ext}"
    objects = _KEY_OBJECTS_RE.findall(description.lower())
    if objects:
        return "-".join(objects[:2]) + file_ext
    nouns = [n for n in _PROPER_NOUN_RE.findall(description) if n.lower() not in _NOISE_WORDS]
    if nouns:
        name = re.sub(r"[^\w-]", "", "-".join(nouns[:3]).lower())
        if len(name) > 3:
            return name + file_ext
    return f"unknown-content{file_ext}"


def suggest_filename(model_suggestion: str | None, description: str, file_ext: str = "") -> str:
    """Prefer a sanitized model suggestion of plausible length, else fall
    back to description-derived extraction
    (reference src/cli/utils/render.py:41-115)."""
    if model_suggestion:
        s = sanitize_filename_fragment(model_suggestion)
        if s and 3 <= len(s) <= 50:
            return s + file_ext
    return filename_from_description(description, file_ext)

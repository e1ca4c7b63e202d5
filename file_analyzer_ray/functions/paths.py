"""Path/“file”-shaped scalar helpers.

Re-expressions of: dot-path nested getter (reference
src/utils/json_parser.py:26-56), include/exclude glob filtering
(src/core/analyzer.py:126-138), search-output filename sanitizer
(src/core/analyzer.py:581).
"""

from __future__ import annotations

import fnmatch
import re
from typing import Any

_SANITIZE_RE = re.compile(r'[\\/*?:"<>|]')


def get_path(data: Any, dotted: str, default: Any = None) -> Any:
    """Nested dict/list access by ``a.b.0.c`` path with a default."""
    cur = data
    for part in (dotted or "").split("."):
        if isinstance(cur, dict):
            if part not in cur:
                return default
            cur = cur[part]
        elif isinstance(cur, list):
            try:
                cur = cur[int(part)]
            except (ValueError, IndexError):
                return default
        else:
            return default
    return cur


def matches_patterns(
    name: str,
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> bool:
    """fnmatch include-then-exclude filtering: kept iff it matches some
    include pattern (or include is empty) and no exclude pattern."""
    if include and not any(fnmatch.fnmatch(name, p) for p in include):
        return False
    if exclude and any(fnmatch.fnmatch(name, p) for p in exclude):
        return False
    return True


def sanitize_name(text: str) -> str:
    """Replace filesystem-hostile characters with underscores."""
    return _SANITIZE_RE.sub("_", text or "")

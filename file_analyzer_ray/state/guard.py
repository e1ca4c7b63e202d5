"""Sink path discipline — the PathGuard analog.

The reference hard-gates every artifact write into a sanctioned
directory tree and rejects system/temp roots outright
(src/core/artifact_guard.py:188-278: canonical-root check, prohibited
root-file patterns, `^/tmp(/|$)`-style system-temp rejection, plus the
monkey-patched `open` in :280-420). This engine keeps the same
discipline at SINK CONSTRUCTION time instead of patching builtins: the
checkpointed sinks (state/shards.py, state/lineage.py) validate their
output directory before creating anything, so a mis-templated output
URI (``/etc/...``, the read-only reference/testdata trees, a bare temp
root) fails fast on the driver rather than 30 actors deep into a run.

Divergence from the reference, documented: the reference rejects ALL
of /tmp because its artifact root lives in the repo; this sandbox's
sanctioned scratch IS /tmp, so named subdirectories of /tmp are
allowed and only the BARE temp roots (no artifact identity — exactly
the anti-pattern the reference's artifact discipline exists to stop)
are rejected.
"""

from __future__ import annotations

import os

# Write-protected system trees (reference artifact_guard.py:236-258).
PROTECTED_PREFIXES = (
    "/etc",
    "/usr",
    "/bin",
    "/sbin",
    "/lib",
    "/lib64",
    "/boot",
    "/dev",
    "/proc",
    "/sys",
    "/run",
    "/var/run",
)

# Read-only inputs of THIS environment: never sinks.
READONLY_PREFIXES = (
    "/root/reference",
    "/root/testdata",
)

# Bare temp roots: artifacts need a named directory, not a dumping
# ground (reference artifact_guard.py:229-262 rejects `^/tmp(/|$)`).
BARE_TEMP_ROOTS = ("/tmp", "/var/tmp", "/private/tmp")


class SinkPathError(ValueError):
    """Raised when a sink directory violates path discipline."""


def validate_sink_dir(path: str) -> str:
    """Validate (and normalize) a sink output directory. Returns the
    absolute path or raises :class:`SinkPathError`."""
    if not path:
        raise SinkPathError("empty sink path")
    p = os.path.abspath(path)
    if p == "/":
        raise SinkPathError("filesystem root is not a sink")
    for pre in PROTECTED_PREFIXES:
        if p == pre or p.startswith(pre + os.sep):
            raise SinkPathError(f"sink {p!r} is inside protected system tree {pre!r}")
    for pre in READONLY_PREFIXES:
        if p == pre or p.startswith(pre + os.sep):
            raise SinkPathError(f"sink {p!r} is inside read-only input tree {pre!r}")
    if p in BARE_TEMP_ROOTS:
        raise SinkPathError(
            f"sink {p!r} is a bare temp root — use a named subdirectory"
        )
    return p

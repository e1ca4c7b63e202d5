"""Signature tables — the spec shared by generator, stages and oracle.

These constants define the planted/detectable structure of the synthetic
interleaved corpus (FIXTURES.md F1) and the detection semantics of the
extraction stages:

- ``MAGIC_SIGNATURES``: embedded-container magics (binwalk analog,
  reference src/core/analyzer.py:657-723 shells out to ``binwalk``; we
  scan Arrow binary buffers in-process).
- ``PATTERN_SIGNATURES``: the fixed signature/pattern set (ripgrep /
  ClamAV analog, reference src/core/analyzer.py:478-655).
- ``GENERIC_TAGS``: verbatim generic-tag drop list from the reference
  (src/cli/utils/render.py:30) — copied as data for output equality.
- payload frame markers for the synthetic media payload format.
"""

from __future__ import annotations

# (name, magic bytes) — order is detection priority for ties at the same
# offset. binwalk-style container signatures.
MAGIC_SIGNATURES: list[tuple[str, bytes]] = [
    ("zip", b"PK\x03\x04"),
    ("gzip", b"\x1f\x8b\x08\x00"),
    ("png", b"\x89PNG\r\n\x1a\n"),
    ("elf", b"\x7fELF\x01"),
]

# Fixed multi-pattern signature set (ClamAV/ripgrep analog). Scanned over
# text spans and OCR-extracted text. Chosen to be prefix-free.
PATTERN_SIGNATURES: list[str] = [
    "EICAR-TEST",
    "password",
    "BEGIN RSA PRIVATE KEY",
    "API_KEY",
    "ssh-rsa AAAA",
]

# Verbatim from reference src/cli/utils/render.py:30 (data, not code).
GENERIC_TAGS: frozenset[str] = frozenset(
    {"image", "picture", "photo", "shooting", "sh", "shock", "shockingly"}
)

# Synthetic media-payload frame format (generator-defined, self-describing):
#   frame   := FRAME_MAGIC u32le(len(body)) body
#   binary  := frame*   (one frame per media/binary span, in span order)
# body may contain an EXIF block, an OCR block, embedded container magics
# and filler bytes.
FRAME_MAGIC = b"FASG"
EXIF_BEGIN = b"EXIF\n"
EXIF_END = b"ENDEXIF\n"
OCR_BEGIN = b"OCR\n"
OCR_END = b"\nENDOCR\n"

# EXIF-style keys planted by the generator / extracted by the meta stage
# (ExifTool analog, reference src/core/analyzer.py:165-294).
EXIF_KEYS: list[str] = ["Make", "Model", "DateTime", "ImageWidth", "ImageHeight"]

# Output span kinds, in tie-break priority order at equal source offset.
KIND_PRIORITY: dict[str, int] = {
    "text": 0,
    "meta": 1,
    "ocr": 2,
    "embedded": 3,
    "match": 4,
}

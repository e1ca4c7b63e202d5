"""Deterministic extraction-harness wraps (golden-output doctrine).

The flagship extraction family's production input is the hash-seeded
synthetic corpus (corpus.py), whose planted structure is a PCG64 stream
— real, but not expressible in SQL, so the driver could only row-count
the extraction queries (CORRECTNESS r03: 4 of the 6 ``no_oracle`` rows
were this family). These wraps apply the proven ``docs_layout_parse`` /
``docs_pii_scrub`` doctrine to the SAME production stages: render the
sf ``documents`` table into the interleaved docs schema where every
planted artifact — EXIF key/values, OCR text, pattern signatures,
container magics at byte offsets, clone identities, media payload
dimensions/waveforms — is a CLOSED FORM of ``doc_id``. A DuckDB oracle
can then state the expected span sequence / carve hits / dedup clusters
/ media features without running any extraction itself, and the driver
hash-checks the REAL pipeline (ExtractStage → spans, carve_exploded,
exact_dedup_clusters, FusedMediaStage) end to end.

Reference parity: the span-sequence invariant is the reference's core
output (src/core/analyzer.py:66-124, schemas/analyzer/v1.0); the wrap
plants exactly the artifact classes its seven analyzers detect.

Planted structure, all pure functions of ``d = doc_id``:

- text span: the document's own text, with ``PATTERN_SIGNATURES[d%5]``
  inserted after token 2 when ``d % 4 == 0`` (→ one ``match`` span);
- a whitespace-only text span when ``d % 11 == 0`` (dropped by
  normalization — pins the skip rule);
- span ORDER: the text span's source offset sorts it after the media
  spans when ``d % 5 == 0`` (pins the offset sort);
- media span when ``d % 3 != 2``: EXIF block (5 closed-form KVs) + OCR
  sentence (pattern-planted when ``d % 6 == 0``);
- binary span when ``d % 2 == 0``: filler with one container magic at
  offset ``1 + d%37`` (two magics when ``d % 5 == 0``);
- clone wrap: doc ``d % 20 == 7`` carries byte-identical content to doc
  ``d - 4`` → arithmetic exact-dup clusters;
- media wrap: self-describing payload (dims header + square-wave PCM)
  → closed-form decode dims, frame counts and sample counts.
"""

from __future__ import annotations

import re
import struct

import numpy as np
import pyarrow as pa

from ..corpus import DOCS_SCHEMA
from ..functions.signatures import (
    EXIF_BEGIN,
    EXIF_END,
    FRAME_MAGIC,
    MAGIC_SIGNATURES,
    OCR_BEGIN,
    OCR_END,
    PATTERN_SIGNATURES,
)

_TOK = re.compile(r"\S+")

#: EXIF make bank (harness-local so the SQL builder and the wrap share
#: one literal list; the corpus has its own copy for the RNG path)
HARNESS_MAKES = ["Canon", "Nikon", "Sony", "Fujifilm", "Leica"]


def _exif_kvs(d: int) -> list[tuple[str, str]]:
    """Closed-form EXIF key/values for doc ``d`` (EXIF_KEYS order)."""
    return [
        ("Make", HARNESS_MAKES[d % 5]),
        ("Model", f"X{d % 97}"),
        (
            "DateTime",
            f"2024:{1 + d % 12:02d}:{1 + d % 28:02d} "
            f"{d % 24:02d}:{d % 60:02d}:{(d * 7) % 60:02d}",
        ),
        ("ImageWidth", str(640 + (d % 16) * 64)),
        ("ImageHeight", str(480 + (d % 9) * 32)),
    ]


def _ocr_text(d: int) -> str:
    base = f"ocr scan page {d % 7} of {d % 3}"
    if d % 6 == 0:
        return PATTERN_SIGNATURES[(d // 6) % 5] + " " + base
    return base


def _frame(payloads: list[bytes]) -> bytes:
    return b"".join(FRAME_MAGIC + struct.pack("<I", len(p)) + p for p in payloads)


def wrap_documents_docs(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → interleaved docs rows for the span/carve oracles."""
    rows = []
    for d, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        d = int(d)
        toks = _TOK.findall(text or "")
        if d % 4 == 0 and len(toks) >= 3:
            wtext = " ".join(toks[:2] + [PATTERN_SIGNATURES[d % 5]] + toks[2:])
        else:
            wtext = " ".join(toks)
        spans: list[dict] = []
        payloads: list[bytes] = []
        if d % 11 == 0:
            spans.append({"kind": "text", "text": "   ", "media_ref": "", "offset": 2})
        spans.append(
            {
                "kind": "text",
                "text": wtext,
                "media_ref": "",
                # d % 5 == 0 → the text span sorts AFTER the media spans
                "offset": 40 if d % 5 == 0 else 5,
            }
        )
        if d % 3 != 2:
            spans.append(
                {"kind": "media", "text": "", "media_ref": f"m/{d}/1", "offset": 15}
            )
            body = (
                EXIF_BEGIN
                + b"".join(f"{k}: {v}\n".encode() for k, v in _exif_kvs(d))
                + EXIF_END
                + OCR_BEGIN
                + _ocr_text(d).encode()
                + OCR_END
            )
            payloads.append(body)
        if d % 2 == 0:
            spans.append(
                {"kind": "binary", "text": "", "media_ref": f"m/{d}/2", "offset": 25}
            )
            name1, magic1 = MAGIC_SIGNATURES[d % 4]
            body = b"\xaa" * (1 + d % 37) + magic1 + b"\xaa" * (1 + d % 23)
            if d % 5 == 0:
                body += MAGIC_SIGNATURES[(d + 1) % 4][1] + b"\xaa" * 5
            payloads.append(body)
        rows.append(
            {"doc_id": str(d), "spans": spans, "binary": _frame(payloads)}
        )
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def wrap_documents_clone_docs(batch: pa.Table) -> pa.Table:
    """(doc_id) → docs rows whose CONTENT identity is arithmetic: doc
    ``d % 20 == 7`` is a byte-identical clone of doc ``d - 4`` (same
    20-block, offset 3), everything else is unique. Content derives
    from the canonical id only, so the clone pair collides under the
    content hash by construction (the rdfind rule: hash content, not
    identifiers). doc_ids are zero-padded so lexicographic member order
    equals numeric order."""
    rows = []
    for d in batch.column("doc_id").to_pylist():
        d = int(d)
        c = d - 4 if d % 20 == 7 else d
        rows.append(
            {
                "doc_id": f"{d:08d}",
                "spans": [
                    {
                        "kind": "text",
                        "text": f"sig {c}",
                        "media_ref": "",
                        "offset": 1,
                    }
                ],
                "binary": b"",
            }
        )
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


#: self-describing media payload header: 3 sentinel int16 samples
#: (1, 2, 3 — deliberately valid, small-amplitude PCM so the audio
#: descriptors stay closed-form) followed by <u16 height><u16 width>.
DIM_HEADER = b"\x01\x00\x02\x00\x03\x00"

#: constant-color codec header: sentinel + <u16 side><u8 r><u8 g><u8 b>
#: decodes to a side×side constant RGB image. Constant squares survive
#: the letterbox EXACTLY (nearest-neighbor of a constant is the
#: constant; a square fills the canvas), so SSIM and the pixelmatch YIQ
#: test become CLOSED FORMS of the two planted colors — the pairwise
#: compare oracle's whole trick.
CONST_HEADER = b"\x04\x00\x05\x00\x06\x00"


def const_color(d: int) -> tuple[int, int, int]:
    """Planted RGB for doc ``d``: ``d % 10 == 1`` clones ``d-1`` (an
    identical pair), ``d % 10 == 3`` is ``d-1``'s color +1 per channel
    (below the YIQ mismatch threshold: non-identical bytes, zero
    mismatching pixels), everything else is its own base color. Base
    channels are mod 251 so the +1 never wraps uint8."""
    c = d - 1 if d % 10 in (1, 3) else d
    r, g, b = c % 251, (3 * c + 7) % 251, (7 * c + 13) % 251
    if d % 10 == 3:
        r, g, b = r + 1, g + 1, b + 1
    return r, g, b


def const_payload(d: int) -> bytes:
    side = 16 + d % 17
    r, g, b = const_color(d)
    return CONST_HEADER + struct.pack("<HBBB", side, r, g, b)


def wrap_documents_const_images(batch: pa.Table) -> pa.Table:
    """(doc_id) → docs rows with ONE media span carrying a
    constant-color square payload (see :func:`const_color`)."""
    rows = []
    for d in batch.column("doc_id").to_pylist():
        d = int(d)
        rows.append(
            {
                "doc_id": str(d),
                "spans": [
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": f"m/{d}/0",
                        "offset": 1,
                    }
                ],
                "binary": _frame([const_payload(d)]),
            }
        )
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def media_dims(d: int) -> tuple[int, int]:
    return 32 + d % 61, 32 + (d * 3) % 97


def media_wave_params(d: int) -> tuple[int, int, int]:
    """(period_samples, amplitude, n_wave_samples) for doc ``d``."""
    return 8 + 2 * (d % 5), 1000 + (d % 7) * 100, 2048 * (1 + d % 19)


def media_payload(d: int) -> bytes:
    """Dims header + square-wave PCM: every FusedMediaStage projection
    of this payload is a closed form of ``d`` (image dims from the
    header, frame counts from the byte length, audio sample count from
    the byte length, dominant rFFT bin ≈ n_samples / period)."""
    h, w = media_dims(d)
    period, amp, n = media_wave_params(d)
    idx = np.arange(n)
    wave = np.where((idx % period) < period // 2, amp, -amp).astype("<i2")
    return DIM_HEADER + struct.pack("<HH", h, w) + wave.tobytes()


def wrap_documents_media(batch: pa.Table) -> pa.Table:
    """(doc_id) → docs rows with ONE media span carrying the
    self-describing payload (see :func:`media_payload`)."""
    rows = []
    for d in batch.column("doc_id").to_pylist():
        d = int(d)
        rows.append(
            {
                "doc_id": str(d),
                "spans": [
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": f"m/{d}/0",
                        "offset": 1,
                    }
                ],
                "binary": _frame([media_payload(d)]),
            }
        )
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)

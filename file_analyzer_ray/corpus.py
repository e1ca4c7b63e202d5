"""Deterministic synthetic interleaved-document corpus (FIXTURES.md F1).

Generates the primary input table

    docs(doc_id: string,
         spans: list<struct<kind, text, media_ref, offset:int32>>,
         binary: large_binary)

entirely from content hashes (sha256-seeded numpy PCG64 per document) —
no wall clock, no global RNG, no external data. The same doc index always
yields byte-identical content on any machine, which is what makes the
serial oracle, the Ray pipeline, resume tests, and the two-parallelism
bench runs comparable.

Planted structure (each detectable by the extraction stages and computed
independently by the serial oracle in :mod:`file_analyzer_ray.oracle`):

- EXIF-style ``Key: Value`` metadata blocks in media payloads
- OCR text layers (word-bank sentences) in media payloads
- embedded container magic signatures at known payload offsets
- multi-pattern signatures planted in text spans / OCR sentences
- exact-duplicate clusters (~10%: byte-identical span/payload content,
  distinct doc_ids), near-duplicates (≤2 perturbed payload bytes) and
  pathological ×100-size payloads (~2%) to exercise dedup, phash banding
  and skew handling.

Content identity layout (blocks of 50 docs):
    off 45..49 → exact clone of root off {45:0, 46:1, 47:2, 48:0, 49:1}
    off 44     → near-dup of off 3 (2 perturbed filler bytes)
    off 43     → pathological (×100 filler)

Replaces the reference's ad-hoc test corpus (downloaded sample images,
src/cli/benchmark/main.py:81-160) with the deterministic-hash pattern its
own sample cache uses (src/cli/benchmark/samples.py:131-200).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from .functions.hashing import stable_u64
from .functions.signatures import (
    EXIF_BEGIN,
    EXIF_END,
    EXIF_KEYS,
    FRAME_MAGIC,
    MAGIC_SIGNATURES,
    OCR_BEGIN,
    OCR_END,
    PATTERN_SIGNATURES,
)

CORPUS_VERSION = "fa-corpus-v1"
BLOCK = 50

WORD_BANK = (
    "amber basalt cedar delta ember fjord garnet harbor indigo juniper "
    "krypton lumen marble nectar onyx prairie quartz russet sierra timber "
    "umber velvet willow xenon yonder zephyr cobalt dune ivory jade kelp lotus"
).split()

_MAKES = ["Canon", "Nikon", "Sony", "Fujifilm", "Leica"]
_DIMS = [640, 800, 1024, 1280, 2048]

SPANS_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

DOCS_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", SPANS_TYPE), ("binary", pa.large_binary())]
)


def doc_id_for(index: int) -> str:
    return f"doc{index:08d}"


def content_key(index: int) -> tuple[int, int, str]:
    """(block, source_off, variant) — docs sharing (block, source_off)
    with variant == 'exact' have byte-identical content."""
    block, off = divmod(index, BLOCK)
    if off >= 45:
        return block, {45: 0, 46: 1, 47: 2, 48: 0, 49: 1}[off], "exact"
    if off == 44:
        return block, 3, "near"
    return block, off, "exact"


def _sentence(rng: np.random.Generator, n_lo: int = 4, n_hi: int = 12) -> str:
    n = int(rng.integers(n_lo, n_hi + 1))
    idx = rng.integers(0, len(WORD_BANK), size=n)
    return " ".join(WORD_BANK[i] for i in idx) + "."


def _build_payload(rng: np.random.Generator, is_media: bool, patho: bool) -> bytes:
    """One frame *body*: [EXIF block][OCR block][filler w/ planted magics]."""
    parts: list[bytes] = []
    if is_media and rng.random() < 0.6:
        lines = [EXIF_BEGIN]
        vals = {
            "Make": _MAKES[int(rng.integers(0, len(_MAKES)))],
            "Model": f"X{int(rng.integers(1, 100))}",
            "DateTime": (
                f"2024:{int(rng.integers(1, 13)):02d}:{int(rng.integers(1, 29)):02d} "
                f"{int(rng.integers(0, 24)):02d}:{int(rng.integers(0, 60)):02d}:"
                f"{int(rng.integers(0, 60)):02d}"
            ),
            "ImageWidth": str(_DIMS[int(rng.integers(0, len(_DIMS)))]),
            "ImageHeight": str(_DIMS[int(rng.integers(0, len(_DIMS)))]),
        }
        for k in EXIF_KEYS:
            lines.append(f"{k}: {vals[k]}\n".encode())
        lines.append(EXIF_END)
        parts.append(b"".join(lines))
    if is_media and rng.random() < 0.5:
        sent = _sentence(rng)
        if rng.random() < 0.10:
            pat = PATTERN_SIGNATURES[int(rng.integers(0, len(PATTERN_SIGNATURES)))]
            words = sent.split(" ")
            pos = int(rng.integers(0, len(words)))
            words.insert(pos, pat)
            sent = " ".join(words)
        parts.append(OCR_BEGIN + sent.encode() + OCR_END)
    filler_len = int(rng.integers(200, 1200)) * (100 if patho else 1)
    filler = bytearray(rng.integers(0, 256, size=filler_len, dtype=np.uint8).tobytes())
    if rng.random() < 0.3 and filler_len > 64:
        n_sig = int(rng.integers(1, 4))
        for _ in range(n_sig):
            name, magic = MAGIC_SIGNATURES[int(rng.integers(0, len(MAGIC_SIGNATURES)))]
            pos = int(rng.integers(0, max(1, filler_len - len(magic) - 8)))
            filler[pos : pos + len(magic)] = magic
    parts.append(bytes(filler))
    return b"".join(parts)


def _build_content(block: int, source_off: int) -> tuple[list[dict], list[bytes]]:
    """Deterministic content for a (block, source_off) identity: spans
    (without doc-specific media_refs) + payload bodies for media/binary
    spans, in span order."""
    seed = stable_u64(f"{CORPUS_VERSION}:{block}:{source_off}".encode())
    rng = np.random.default_rng(seed)
    patho = source_off == 43
    n_spans = 1 + int(rng.integers(0, 12))
    spans: list[dict] = []
    payloads: list[bytes] = []
    offset = 0
    for j in range(n_spans):
        offset += 1 + int(rng.integers(0, 1000))
        r = rng.random()
        if r < 0.55:
            if rng.random() < 0.05:
                text = "   " if rng.random() < 0.5 else ""
            else:
                text = _sentence(rng)
                if rng.random() < 0.08:
                    pat = PATTERN_SIGNATURES[int(rng.integers(0, len(PATTERN_SIGNATURES)))]
                    words = text.split(" ")
                    pos = int(rng.integers(0, len(words)))
                    words.insert(pos, pat)
                    text = " ".join(words)
            spans.append({"kind": "text", "text": text, "offset": offset})
        else:
            kind = "media" if r < 0.85 else "binary"
            spans.append({"kind": kind, "text": "", "offset": offset})
            payloads.append(_build_payload(rng, kind == "media", patho))
    return spans, payloads


def build_doc(index: int) -> dict:
    """Materialize document ``index``: fill media_refs, apply near-dup
    perturbation, frame payloads into the binary column."""
    block, source_off, variant = content_key(index)
    spans, payloads = _build_content(block, source_off)
    doc_id = doc_id_for(index)
    if variant == "near" and payloads:
        p = bytearray(payloads[0])
        if len(p) >= 8:
            # Perturb the last two filler bytes — never part of a planted
            # block or magic (magics are placed ≥8 bytes from the end).
            p[-1] = (p[-1] + 1) % 256
            p[-2] = (p[-2] + 1) % 256
        payloads = [bytes(p)] + payloads[1:]
    out_spans = []
    pay_idx = 0
    for j, s in enumerate(spans):
        media_ref = ""
        if s["kind"] in ("media", "binary"):
            media_ref = f"m/{doc_id}/{j}"
            pay_idx += 1
        out_spans.append(
            {
                "kind": s["kind"],
                "text": s["text"],
                "media_ref": media_ref,
                "offset": s["offset"],
            }
        )
    binary = b"".join(
        FRAME_MAGIC + struct.pack("<I", len(p)) + p for p in payloads
    )
    return {"doc_id": doc_id, "spans": out_spans, "binary": binary}


def parse_frames(binary: bytes) -> list[bytes]:
    """Split the binary column back into per-span payload bodies."""
    out = []
    pos = 0
    n = len(binary)
    while pos + 8 <= n:
        if binary[pos : pos + 4] != FRAME_MAGIC:
            break
        (length,) = struct.unpack("<I", binary[pos + 4 : pos + 8])
        out.append(binary[pos + 8 : pos + 8 + length])
        pos += 8 + length
    return out


def docs_table(indices) -> pa.Table:
    """Arrow table of documents for the given indices."""
    rows = [build_doc(int(i)) for i in indices]
    return pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)


def generate_parquet(n_docs: int, out_dir: str, docs_per_file: int = 2000) -> str:
    """Write the corpus as partitioned parquet via a Ray pipeline
    (generation itself scales out: range → map_batches → write)."""
    import ray.data

    def gen(batch: dict) -> pa.Table:
        return docs_table(batch["id"])

    (
        ray.data.range(n_docs, override_num_blocks=max(1, n_docs // docs_per_file))
        .map_batches(gen, batch_format="numpy", batch_size=docs_per_file)
        .write_parquet(out_dir)
    )
    return out_dir

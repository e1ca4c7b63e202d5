"""Corpus generator + serial oracle invariants (no Ray)."""

from __future__ import annotations

import pyarrow as pa

from file_analyzer_ray.corpus import (
    BLOCK,
    DOCS_SCHEMA,
    build_doc,
    content_key,
    docs_table,
    parse_frames,
)
from file_analyzer_ray.functions.signatures import KIND_PRIORITY
from file_analyzer_ray.oracle import dedup_clusters, extract_doc, extract_docs


def test_determinism():
    assert build_doc(123) == build_doc(123)
    t1, t2 = docs_table(range(20)), docs_table(range(20))
    assert t1.equals(t2)
    assert t1.schema.equals(DOCS_SCHEMA)


def test_exact_clone_layout():
    # off 45..49 clone roots 0,1,2,0,1 within each block.
    for block in (0, 3):
        base = block * BLOCK
        for off, root in ((45, 0), (46, 1), (47, 2), (48, 0), (49, 1)):
            clone, orig = build_doc(base + off), build_doc(base + root)
            assert clone["binary"] == orig["binary"]
            assert [s["kind"] for s in clone["spans"]] == [s["kind"] for s in orig["spans"]]
            assert [s["text"] for s in clone["spans"]] == [s["text"] for s in orig["spans"]]
            assert clone["doc_id"] != orig["doc_id"]


def test_dedup_cluster_oracle():
    ex = extract_docs([build_doc(i) for i in range(2 * BLOCK)])
    clusters = dedup_clusters(ex)
    sizes = sorted((c["cluster_size"] for c in clusters.values()), reverse=True)
    assert sizes[:6] == [3, 3, 3, 3, 2, 2]  # per-block [3,3,2] × 2 blocks
    # canonical id is the minimum member id
    for c in clusters.values():
        assert c["canonical_doc_id"] == min(c["member_ids"])


def test_near_dup_differs_from_root():
    # off 44 perturbs ≤2 payload bytes of the off-3 content (when it has payloads).
    d44, d3 = build_doc(44), build_doc(3)
    p44, p3 = parse_frames(d44["binary"]), parse_frames(d3["binary"])
    if p3:
        diffs = sum(a != b for a, b in zip(p44[0], p3[0]))
        assert 1 <= diffs <= 2
        assert p44[1:] == p3[1:]


def test_oracle_output_shape():
    out = extract_doc(build_doc(0))
    assert out["doc_id"] == "doc00000000"
    assert out["n_spans"] == len(out["spans"]) > 0
    assert len(out["content_hash"]) == 64
    for rank, s in enumerate(out["spans"]):
        assert s["offset"] == rank  # re-indexed order
        assert s["kind"] in KIND_PRIORITY
    # media-derived spans carry the span's media_ref
    for s in out["spans"]:
        if s["kind"] in ("meta", "ocr", "embedded"):
            assert s["media_ref"].startswith("m/doc00000000/")


def test_oracle_drops_empty_text_spans():
    doc = {
        "doc_id": "d",
        "spans": [
            {"kind": "text", "text": "   ", "media_ref": "", "offset": 1},
            {"kind": "text", "text": "keep  me ", "media_ref": "", "offset": 2},
            {"kind": "text", "text": "", "media_ref": "", "offset": 3},
        ],
        "binary": b"",
    }
    out = extract_doc(doc)
    assert [s["text"] for s in out["spans"]] == ["keep me"]


def test_oracle_finds_planted_structures():
    from collections import Counter

    ex = extract_docs([build_doc(i) for i in range(200)])
    kinds = Counter(s["kind"] for r in ex for s in r["spans"])
    for k in ("text", "meta", "ocr", "embedded", "match"):
        assert kinds[k] > 0, f"no {k} spans found in 200 docs"
    # embedded spans carry byte offsets and valid container names
    for r in ex:
        for s in r["spans"]:
            if s["kind"] == "embedded":
                name, off = s["text"].split("@")
                assert name in ("zip", "gzip", "png", "elf")
                assert int(off) >= 0


def test_content_hash_excludes_identifiers():
    ex0 = extract_doc(build_doc(0))
    ex45 = extract_doc(build_doc(45))
    assert ex0["content_hash"] == ex45["content_hash"]
    # but spans differ in media_ref (doc-specific), same (kind, text, order)
    assert [(s["kind"], s["text"]) for s in ex0["spans"]] == [
        (s["kind"], s["text"]) for s in ex45["spans"]
    ]


def test_frame_roundtrip():
    d = build_doc(1)
    frames = parse_frames(d["binary"])
    n_payload_spans = sum(1 for s in d["spans"] if s["kind"] in ("media", "binary"))
    assert len(frames) == n_payload_spans
    assert parse_frames(b"") == []
    assert parse_frames(b"garbage") == []


def test_pathological_docs_exist():
    sizes = [len(build_doc(i)["binary"]) for i in range(BLOCK)]
    patho = len(build_doc(43)["binary"])
    med = sorted(sizes)[len(sizes) // 2]
    assert content_key(43)[1] == 43
    assert patho > 10 * max(1, med)

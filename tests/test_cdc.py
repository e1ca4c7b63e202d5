"""CDC (content-defined chunking) dedup vs the per-byte serial
reference: the vectorized windowed gear kernel (64 shifted adds) must
reproduce the classic rolling recurrence h = (h<<1) + GEAR[b] exactly,
and the distributed first-wins chunk dedup must match a dict-based
serial replay over the same corpus."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from file_analyzer_ray.stages.cdc import (
    DEFAULT_MASK_BITS,
    DEFAULT_MAX_SIZE,
    DEFAULT_MIN_SIZE,
    GEAR,
    candidate_cuts,
    chunk_doc,
    gear_hashes,
)

_M64 = (1 << 64) - 1
_GEAR_PY = [int(x) for x in GEAR]

SF_DIR = "/root/testdata/sf0.001"


def _serial_candidates(data: bytes, mask_bits: int) -> list[int]:
    """The textbook per-byte rolling gear loop — the independent
    reimplementation of the vectorized windowed-sum kernel."""
    mask = (1 << mask_bits) - 1
    h = 0
    out = []
    for i, b in enumerate(data):
        h = ((h << 1) + _GEAR_PY[b]) & _M64
        if h & mask == 0:
            out.append(i + 1)
    return out


def _serial_chunks(data: bytes, mask_bits=DEFAULT_MASK_BITS,
                   min_size=DEFAULT_MIN_SIZE, max_size=DEFAULT_MAX_SIZE):
    cands = _serial_candidates(data, mask_bits)
    chunks = []
    start = 0
    for c in cands:
        if c - start < min_size:
            continue
        while c - start > max_size:
            chunks.append((start, max_size))
            start += max_size
        if c - start >= min_size:
            chunks.append((start, c - start))
            start = c
    n = len(data)
    while n - start > max_size:
        chunks.append((start, max_size))
        start += max_size
    if n - start > 0:
        chunks.append((start, n - start))
    return chunks


@pytest.mark.parametrize("n", [0, 1, 17, 63, 64, 65, 300, 5000])
def test_gear_kernel_equals_rolling_recurrence(n):
    rng = np.random.RandomState(7 + n)
    data = rng.randint(0, 256, size=n, dtype=np.uint8).tobytes()
    buf = np.frombuffer(data, dtype=np.uint8)
    if n == 0:
        assert chunk_doc(data) == []
        return
    got = gear_hashes(buf)
    h = 0
    exp = np.empty(n, dtype=np.uint64)
    for i, b in enumerate(data):
        h = ((h << 1) + _GEAR_PY[b]) & _M64
        exp[i] = h
    assert (got == exp).all()
    assert candidate_cuts(got, DEFAULT_MASK_BITS).tolist() == \
        _serial_candidates(data, DEFAULT_MASK_BITS)


@pytest.mark.parametrize("case", [
    b"",
    b"a" * 1000,                       # constant bytes: max-size splits only
    b"hello world " * 50,
    "héllo wörld ünïcode ” 文字 " .encode("utf-8") * 40,
    bytes(range(256)) * 8,
])
def test_chunk_doc_matches_serial(case):
    assert chunk_doc(case) == _serial_chunks(case)
    # chunks tile the input exactly: contiguous, full coverage
    chunks = chunk_doc(case)
    pos = 0
    for off, ln in chunks:
        assert off == pos and ln > 0 and ln <= DEFAULT_MAX_SIZE
        pos = off + ln
    assert pos == len(case)


def test_cdc_dedup_stats_vs_serial(ray_session):
    """Distributed first-wins chunk dedup over the sf0.001 documents
    table == a dict-based serial replay (hash → first (doc_id, offset)
    owner under ascending order)."""
    import pyarrow.parquet as pq

    from file_analyzer_ray.queries import q_docs_cdc_dedup

    t = pq.read_table(f"{SF_DIR}/documents.parquet",
                      columns=["doc_id", "text"])
    rows = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    owner: dict[str, tuple[int, int]] = {}
    per_doc: dict[int, list] = {}
    occ = []
    for did, text in rows:
        data = (text or "").encode("utf-8", "surrogatepass")
        for off, ln in _serial_chunks(data):
            h = hashlib.sha256(data[off:off + ln]).hexdigest()
            occ.append((h, did, off, ln))
            if h not in owner or (did, off) < owner[h]:
                owner[h] = (did, off)
    for h, did, off, ln in occ:
        st = per_doc.setdefault(did, [0, 0, 0, 0])
        st[0] += 1
        st[1] += ln
        if owner[h] != (did, off):
            st[2] += 1
            st[3] += ln
    got = q_docs_cdc_dedup(SF_DIR).to_pandas()
    assert len(got) == len(per_doc)
    for r in got.itertuples(index=False):
        exp = per_doc[r.doc_id]
        assert [r.n_chunks, r.n_bytes, r.dup_chunks, r.dup_bytes] == exp, \
            f"doc {r.doc_id}"
    assert got["dup_chunks"].sum() > 0  # the corpus really has shared blocks

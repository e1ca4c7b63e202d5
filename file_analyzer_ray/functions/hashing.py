"""Deterministic hashing primitives: content hash, perceptual hash,
SimHash, MinHash.

- ``content_hash``: sha256 over normalized span content + media payload
  bytes (rdfind analog — hashes *content*, not identifiers; reference
  src/core/analyzer.py:315-364). ``media_ref``/``doc_id`` are excluded so
  byte-identical clones collide by construction.
- ``phash64``: 64-bit robust payload hash — bucketed byte-mass bits, so
  flipping a couple of payload bytes flips ≤ a couple of bits
  (perceptual-hash analog of reference src/cli/validate/main.py:326-367).
- ``simhash64`` / ``minhash_signature``: standard near-dup sketches over
  token/shingle sets (public algorithms; new capability beyond the
  reference, required for the large-scale dedup surface).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_U64 = (1 << 64) - 1
_MERSENNE31 = (1 << 31) - 1


def sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def stable_u64(data: bytes, salt: bytes = b"") -> int:
    """First 8 bytes of sha256(salt+data) as an unsigned 64-bit int."""
    return struct.unpack("<Q", hashlib.sha256(salt + data).digest()[:8])[0]


def content_hash(norm_spans: list[tuple[str, str]], payloads: list[bytes]) -> str:
    """sha256 over the normalized (kind, text) span sequence and the raw
    media payload bodies, in order. Identifier fields are excluded."""
    h = hashlib.sha256()
    for kind, text in norm_spans:
        h.update(kind.encode())
        h.update(b"\x00")
        h.update(text.encode())
        h.update(b"\x01")
    h.update(b"\x02")
    for p in payloads:
        h.update(struct.pack("<Q", len(p)))
        h.update(p)
    return h.hexdigest()


def phash64(payload: bytes, buckets: int = 64) -> int:
    """Robust 64-bit hash of a byte payload.

    Split the payload into 64 contiguous buckets; bit i is set when
    bucket i's mean byte value exceeds the overall mean. Perturbing ≤2
    bytes moves at most 2 bucket means slightly → small Hamming
    distance, which is what the near-dup banding needs.
    """
    if not payload:
        return 0
    arr = np.frombuffer(payload, dtype=np.uint8)
    n = len(arr)
    # Pad so the reshape is exact; padding with the global mean is neutral.
    per = -(-n // buckets)
    mean = float(arr.mean())
    padded = np.full(per * buckets, mean, dtype=np.float64)
    padded[:n] = arr
    means = padded.reshape(buckets, per).mean(axis=1)
    bits = means > mean
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _U64).count("1")


def phash_bands(h: int, n_bands: int = 4, band_bits: int = 16) -> list[int]:
    """Split a 64-bit hash into LSH bands. Two hashes within Hamming
    distance ``n_bands - 1`` are guaranteed to share at least one band."""
    mask = (1 << band_bits) - 1
    return [(h >> (i * band_bits)) & mask for i in range(n_bands)]


def simhash64(tokens: list[str]) -> int:
    """Classic SimHash over token strings (Charikar 2002), vectorized:
    token hashes → bit matrix via unpackbits → signed column sums."""
    if not tokens:
        return 0
    hvs = np.fromiter(
        (stable_u64(t.encode(), b"simhash:") for t in tokens), dtype=np.uint64
    )
    bits = np.unpackbits(hvs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    acc = bits.astype(np.int32).sum(axis=0) * 2 - len(tokens)  # (+1/-1 sums)
    out_bits = (acc > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(out_bits, bitorder="little").tobytes(), "little")


class MinHasher:
    """Vectorized MinHash over shingle sets.

    ``num_perm`` universal-hash permutations h_i(x) = (a_i*x + b_i) mod p
    with p = 2^31-1 (so a*x fits in uint64 and the whole signature is one
    numpy broadcast), seeded deterministically. ``signature`` maps a set
    of shingle strings → uint64[num_perm] of 31-bit values.
    """

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.num_perm = num_perm
        self.a = rng.integers(1, _MERSENNE31, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE31, size=num_perm, dtype=np.uint64)

    def signature(self, shingles: list[str]) -> np.ndarray:
        if not shingles:
            return np.full(self.num_perm, _U64, dtype=np.uint64)
        base = np.fromiter(
            (stable_u64(s.encode(), b"minhash:") % _MERSENNE31 for s in set(shingles)),
            dtype=np.uint64,
        )
        # (num_perm, n): 31-bit * 31-bit + 31-bit fits in uint64.
        vals = (self.a[:, None] * base[None, :] + self.b[:, None]) % np.uint64(_MERSENNE31)
        return vals.min(axis=1)

    def band_keys(self, sig: np.ndarray, n_bands: int) -> list[tuple[int, int]]:
        """(band_index, band_hash) keys for LSH bucketing."""
        rows = self.num_perm // n_bands
        keys = []
        for b in range(n_bands):
            chunk = sig[b * rows : (b + 1) * rows]
            keys.append((b, stable_u64(chunk.tobytes(), b"band:")))
        return keys


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0

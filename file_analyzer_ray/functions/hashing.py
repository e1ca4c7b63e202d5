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
    media payload bodies, in order. Identifier fields are excluded.
    One join + one update — per-part ``h.update`` calls measured ~30 ms
    per 2000-doc shard in the extract hot path; byte stream unchanged."""
    parts = []
    for kind, text in norm_spans:
        parts += (kind.encode(), b"\x00", text.encode(), b"\x01")
    parts.append(b"\x02")
    for p in payloads:
        parts += (struct.pack("<Q", len(p)), p)
    return hashlib.sha256(b"".join(parts)).hexdigest()


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


def phash_bands(h: int, n_bands: int = 4, band_bits: int | None = None) -> list[int]:
    """Split a 64-bit hash into ``n_bands`` contiguous LSH bands (sizes
    differing by ≤1 bit when 64 doesn't divide evenly). Pigeonhole: two
    hashes within Hamming distance ``n_bands - 1`` are guaranteed to
    share at least one identical band — so candidate recall is exactly
    1.0 when ``n_bands = max_hamming + 1``. ``band_bits`` forces a
    fixed width (legacy 4×16 layout) and is otherwise derived."""
    if band_bits is not None:
        mask = (1 << band_bits) - 1
        return [(h >> (i * band_bits)) & mask for i in range(n_bands)]
    base, extra = divmod(64, n_bands)
    out = []
    shift = 0
    for i in range(n_bands):
        width = base + (1 if i < extra else 0)
        out.append((h >> shift) & ((1 << width) - 1))
        shift += width
    return out


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
        return self.signature_from_hashes(base)

    def signature_from_hashes(self, base: np.ndarray) -> np.ndarray:
        """Signature from pre-hashed (31-bit) shingle values — the hot
        path: shingle hashing is vectorized upstream
        (:func:`char_shingle_hashes`), no per-shingle Python."""
        if len(base) == 0:
            return np.full(self.num_perm, _U64, dtype=np.uint64)
        base = np.unique(base.astype(np.uint64))
        # (num_perm, n): 31-bit * 31-bit + 31-bit fits in uint64.
        vals = (self.a[:, None] * base[None, :] + self.b[:, None]) % np.uint64(_MERSENNE31)
        return vals.min(axis=1)

    def signatures_from_flat(
        self, flat: np.ndarray, counts: np.ndarray
    ) -> np.ndarray:
        """Batched :meth:`signature_from_hashes`: one ``(num_perm, S)``
        broadcast + per-doc ``minimum.reduceat`` instead of per-doc
        numpy dispatch. ``flat`` concatenates every doc's 31-bit
        shingle hashes, ``counts`` gives per-doc lengths; rows of docs
        with zero shingles are the empty-signature sentinel. Duplicate
        shingles need no dedup — min is idempotent over them."""
        n = len(counts)
        out = np.full((n, self.num_perm), _U64, dtype=np.uint64)
        nz = counts > 0
        if not nz.any():
            return out
        offs = np.zeros(int(nz.sum()), dtype=np.int64)
        np.cumsum(counts[nz][:-1], out=offs[1:])
        flat = flat.astype(np.uint64, copy=False)
        p = np.uint64(_MERSENNE31)
        mins = np.empty((self.num_perm, len(offs)), dtype=np.uint64)
        # one permutation at a time: the (S,) work array streams
        # through cache; the full (num_perm, S) broadcast is 10x
        # slower, DRAM-bound (measured)
        for i in range(self.num_perm):
            v = (self.a[i] * flat + self.b[i]) % p
            mins[i] = np.minimum.reduceat(v, offs)
        out[nz] = mins.T
        return out

    def band_keys(self, sig: np.ndarray, n_bands: int) -> list[tuple[int, int]]:
        """(band_index, band_hash) keys for LSH bucketing."""
        rows = self.num_perm // n_bands
        keys = []
        for b in range(n_bands):
            chunk = sig[b * rows : (b + 1) * rows]
            keys.append((b, stable_u64(chunk.tobytes(), b"band:")))
        return keys


_POLY_BASE = 1_000_003


def _poly_window_hashes(vals: np.ndarray, k: int) -> np.ndarray:
    """Polynomial hash of every length-``k`` sliding window of ``vals``
    (Karp–Rabin, mod 2^31−1), fully vectorized. Each val must be
    < 2^31; per-term products stay < 2^62 so the windowed dot fits in
    uint64 when reduced mod p after each power-multiply."""
    if len(vals) < k:
        if len(vals) == 0:
            return np.empty(0, dtype=np.uint64)
        k = len(vals)
    powers = np.empty(k, dtype=np.uint64)
    p = np.uint64(_MERSENNE31)
    acc = np.uint64(1)
    for i in range(k - 1, -1, -1):
        powers[i] = acc
        acc = (acc * np.uint64(_POLY_BASE)) % p
    win = np.lib.stride_tricks.sliding_window_view(vals.astype(np.uint64), k)
    out = np.zeros(len(win), dtype=np.uint64)
    for j in range(k):  # k tiny (5 for shingles, 3 for n-grams)
        out = (out + (win[:, j] % p) * powers[j]) % p
    return out


def char_shingle_hashes_batch(
    texts: "list[str]", k: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Batched :func:`char_shingle_hashes`: ``(flat_hashes, counts)``
    where ``flat_hashes`` concatenates every doc's window hashes and
    ``counts[i]`` is doc i's window count. The Karp–Rabin window hash
    is position-independent, so all long docs hash in ONE
    sliding-window pass over their padded concatenation (windows that
    cross a doc boundary are sliced out by index); docs shorter than
    ``k`` shrink the window per-doc and fall back individually
    (identical values to the per-doc function — pinned by test)."""
    from .text import normalize_ws

    arrs, short = [], {}
    for i, t in enumerate(texts):
        s = normalize_ws(t or "").lower()
        a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        if 0 < len(a) < k:
            short[i] = _poly_window_hashes(a, len(a))
        arrs.append(a)
    counts = np.zeros(len(texts), dtype=np.int64)
    pieces: "list[np.ndarray]" = []
    long_idx = [i for i, a in enumerate(arrs) if len(a) >= k]
    if long_idx:
        pad = np.zeros(k - 1, dtype=np.uint32)
        cat: "list[np.ndarray]" = []
        offs = np.empty(len(long_idx), dtype=np.int64)
        pos = 0
        for j, i in enumerate(long_idx):
            cat.append(arrs[i])
            cat.append(pad)
            offs[j] = pos
            pos += len(arrs[i]) + k - 1
        allh = _poly_window_hashes(np.concatenate(cat), k)
        for j, i in enumerate(long_idx):
            n = len(arrs[i]) - k + 1
            counts[i] = n
            pieces.append((i, allh[offs[j] : offs[j] + n]))
    for i, h in short.items():
        counts[i] = len(h)
        pieces.append((i, h))
    pieces.sort(key=lambda x: x[0])
    flat = (
        np.concatenate([h for _, h in pieces])
        if pieces
        else np.empty(0, dtype=np.uint64)
    )
    return flat, counts


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """31-bit hashes of the character k-shingles of the normalized
    lowercased text — equivalent candidate universe to
    ``char_shingles`` but with NO per-shingle Python strings or sha256
    calls (the MinHash hot path)."""
    from .text import normalize_ws

    s = normalize_ws(text).lower()
    if not s:
        return np.empty(0, dtype=np.uint64)
    # utf-32-le → exactly one uint32 per CHARACTER (codepoints < 2^31),
    # so hash shingles correspond 1:1 to the char_shingles string
    # universe even for non-ASCII text.
    arr = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return _poly_window_hashes(arr, min(k, len(arr)))


def word_ngram_hashes(text: str, n: int = 3) -> np.ndarray:
    """31-bit hashes of word n-grams: per-token 31-bit hashes (few per
    doc) combined by a vectorized window polynomial."""
    from .text import tokenize

    toks = [t.lower() for t in tokenize(text)]
    if not toks:
        return np.empty(0, dtype=np.uint64)
    tok_h = np.fromiter(
        (stable_u64(t.encode(), b"tok:") % _MERSENNE31 for t in toks),
        dtype=np.uint64,
        count=len(toks),
    )
    return _poly_window_hashes(tok_h, min(n, len(tok_h)))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0

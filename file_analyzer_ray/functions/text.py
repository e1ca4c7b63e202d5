"""Text-analysis primitives for the documents pipeline.

New first-class capabilities for a training-data pipeline (beyond the
reference's inventory, per the build brief): token counting, n-gram
language ID, quality scoring, document fingerprinting, shingling.
All pure + deterministic; regexes are module-level compiled constants so
actor/stage setup cost is zero.
"""

from __future__ import annotations

import re

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
WS_RE = re.compile(r"\s+")
ALPHA_RE = re.compile(r"[A-Za-z]")
DIGIT_RE = re.compile(r"[0-9]")
PUNCT_RE = re.compile(r"[.,;:!?'\"()\[\]{}-]")
# BPE-ish word/number/punct splitter (GPT-2-style contraction handling).
BPE_RE = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language identifier. Deterministic, dependency-free.
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for was on are as with his they at be this".split()),
    "de": frozenset("der die und das ist nicht ich sie mit ein eine den dem zu auf für von".split()),
    "fr": frozenset("le la les et de un une est pas que pour dans sur avec ce il elle au".split()),
    "es": frozenset("el la los las y de un una es no que por para en con se su al lo".split()),
    "it": frozenset("il la le e di un una è non che per in con si su del alla".split()),
}

STOPWORDS_EN = LANG_PROFILES["en"]


def tokenize(text: str) -> list[str]:
    """Alphanumeric-run tokens (matches the DuckDB oracle
    ``regexp_extract_all(text, '[A-Za-z0-9]+')``)."""
    return TOKEN_RE.findall(text or "")


def token_count(text: str) -> int:
    return len(TOKEN_RE.findall(text or ""))


def bpe_token_count(text: str) -> int:
    """Approximate BPE token count via a GPT-2-style pre-tokenizer regex."""
    return sum(1 for m in BPE_RE.finditer(text or "") if not m.group().isspace())


def normalize_ws(text: str) -> str:
    """Collapse whitespace runs to single spaces and strip — the text-span
    normalization rule (boilerplate-strip analog) and the fingerprint
    canonical form."""
    return WS_RE.sub(" ", text or "").strip()


def fingerprint_rolling(text: str, window: int = 8, mod: int = 1 << 61) -> int:
    """Deterministic polynomial rolling-hash fingerprint over the
    whitespace-normalized, lowercased text (Karp–Rabin)."""
    s = normalize_ws(text).lower()
    h = 0
    base = 1_000_003
    for ch in s:
        h = (h * base + ord(ch)) % mod
    return h


def detect_language(text: str) -> str:
    """Stopword-profile language ID: tokenize lowercased text, score each
    profile by stopword-hit fraction; ties broken alphabetically; 'und'
    (undetermined) when nothing matches."""
    toks = [t.lower() for t in tokenize(text)]
    if not toks:
        return "und"
    best_lang, best_score = "und", 0.0
    for lang in sorted(LANG_PROFILES):
        prof = LANG_PROFILES[lang]
        score = sum(1 for t in toks if t in prof) / len(toks)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang if best_score > 0.02 else "und"


def quality_metrics(text: str) -> dict[str, float]:
    """Heuristic quality signals: ratios of alpha/digit/punct characters,
    stopword fraction, mean token length. All rounded to 6 decimals for
    cross-engine comparability."""
    text = text or ""
    n = len(text)
    toks = tokenize(text)
    low = [t.lower() for t in toks]
    n_tok = len(toks)
    return {
        "n_chars": float(n),
        "n_tokens": float(n_tok),
        "alpha_ratio": round(len(ALPHA_RE.findall(text)) / n, 6) if n else 0.0,
        "digit_ratio": round(len(DIGIT_RE.findall(text)) / n, 6) if n else 0.0,
        "punct_ratio": round(len(PUNCT_RE.findall(text)) / n, 6) if n else 0.0,
        "stopword_ratio": round(sum(1 for t in low if t in STOPWORDS_EN) / n_tok, 6)
        if n_tok
        else 0.0,
        "mean_token_len": round(sum(len(t) for t in toks) / n_tok, 6) if n_tok else 0.0,
    }


def char_shingles(text: str, k: int = 5) -> list[str]:
    """Character k-shingles of the normalized lowercased text."""
    s = normalize_ws(text).lower()
    if len(s) < k:
        return [s] if s else []
    return [s[i : i + k] for i in range(len(s) - k + 1)]


def word_ngrams(text: str, n: int = 3) -> list[str]:
    toks = [t.lower() for t in tokenize(text)]
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

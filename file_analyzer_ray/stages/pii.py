"""PII scrubbing: detect and mask emails / phone numbers / IPv4
addresses in document text.

The standard pre-training curation step (CCNet / Dolma / FineWeb all
run a PII pass). The detector is generic compiled-regex logic; the
synthetic corpus carries no PII, so the driver query exercises it
through a deterministic INJECTION harness (:func:`inject_pii` — same
golden-output doctrine as stages/maincontent.py's HTML wrap): the
oracle states the known scrubbed text without running any regex.

Engine shape: row-local ``map_batches`` actor pool, regexes compiled
once per process at import, one pass per pattern per batch via
``re.subn`` (C regex time dominates, the payload-scan doctrine).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
PHONE_RE = re.compile(r"\+?\d{1,3}[-.\s]\d{3}[-.\s]?\d{3,4}(?:[-.\s]\d{3,4})?")
IPV4_RE = re.compile(
    r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}"
    r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b"
)

EMAIL_TOKEN, PHONE_TOKEN, IP_TOKEN = "[EMAIL]", "[PHONE]", "[IP]"


def scrub_text(text: str) -> tuple[str, int, int, int]:
    """``(clean_text, n_emails, n_phones, n_ips)`` — emails first (an
    address would otherwise leave digit runs a phone pattern could
    half-match), then IPs (dotted digits), then phones."""
    t = text or ""
    t, n_email = EMAIL_RE.subn(EMAIL_TOKEN, t)
    t, n_ip = IPV4_RE.subn(IP_TOKEN, t)
    t, n_phone = PHONE_RE.subn(PHONE_TOKEN, t)
    return t, n_email, n_phone, n_ip


class PiiScrubStage:
    """Batch stage ``(doc_id, text)`` → ``(doc_id, clean_text,
    n_emails, n_phones, n_ips)``. Stateless — default plans run it as
    plain tasks; the class shape also fits the registry's actor form."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts = t.column("text").to_pylist()
        out_t, ne, np_, ni = [], np.zeros(len(texts), np.int64), np.zeros(
            len(texts), np.int64), np.zeros(len(texts), np.int64)
        for i, x in enumerate(texts):
            c, a, b, d = scrub_text(x)
            out_t.append(c)
            ne[i], np_[i], ni[i] = a, b, d
        return pa.Table.from_arrays(
            [
                pa.array(ids.astype(np.int64)),
                pa.array(out_t, pa.string()),
                pa.array(ne), pa.array(np_), pa.array(ni),
            ],
            names=["doc_id", "clean_text", "n_emails", "n_phones", "n_ips"],
        )


#: injection rule (mirrored literally by the SQL oracle): docs with
#: ≥ MIN_TOKENS tokens get one email after token 2 and one phone
#: appended; shorter docs are left untouched.
MIN_TOKENS = 4


def inject_pii(t: pa.Table) -> pa.Table:
    """Deterministic PII injection over ``(doc_id, text)`` — the
    golden-output harness. Inserted values are pure functions of
    doc_id, so the oracle knows exactly what the scrubber must mask."""
    ids = t.column("doc_id").to_pylist()
    out = []
    for did, txt in zip(ids, t.column("text").to_pylist()):
        toks = (txt or "").split()
        if len(toks) >= MIN_TOKENS:
            toks = (
                toks[:2]
                + [f"user{did}@example.com"]
                + toks[2:]
                + [f"+1-555-{did % 10000:04d}"]
            )
        out.append(" ".join(toks))
    return pa.Table.from_arrays(
        [t.column("doc_id"), pa.array(out, pa.string())],
        names=["doc_id", "text"],
    )


def pii_scrub_from_docs(ds) -> "object":
    """documents → deterministic PII injection → scrub, fused into ONE
    stateless task stage (regexes are module compiled-once; an actor
    pool would only add spin-up cost)."""
    def inject_and_scrub(t):
        return PiiScrubStage()(inject_pii(t))

    return ds.map_batches(inject_and_scrub, batch_format="pyarrow")

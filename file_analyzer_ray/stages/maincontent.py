"""Main-content extraction: HTML boilerplate strip via DOM heuristics.

The north-star pipeline's first stage (readability / boilerpipe /
trafilatura family): given raw HTML, segment it into text blocks,
drop chrome (nav / header / footer / aside / script / style / head)
by CONTAINER CONTEXT and link-farm blocks by LINK DENSITY, and emit
the concatenated main text. Reference parity note: the reference
pipeline starts from already-extracted media files, so this operator
is part of the beyond-reference web-corpus surface the north rule
names ("HTML boilerplate strip, DOM heuristics").

Heuristics (deterministic, entity-unaware — the synthetic corpus is
ASCII word salad; a production deployment would add an unescape pass):

1. ``<script>``/``<style>`` elements are removed with their content.
2. A depth counter tracks semantic chrome containers
   (``head nav header footer aside``): any text block that finalizes
   while inside one is boilerplate.
3. Text is segmented into blocks at block-level tag boundaries
   (``p div h1..h6 li ul ol table tr td section article main body``).
4. Per block, link density = anchor-text chars / total chars; blocks
   above ``max_link_density`` (default 1/3, the boilerpipe constant)
   are link farms and dropped even outside chrome containers.
5. Kept blocks are whitespace-normalized and joined with single
   spaces.

Engine shape: one compiled tag-regex pass per document (C regex time
dominates, same doctrine as the payload signature-scan actors), run as
an actor pool with the regexes compiled once in ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol table tr td section article main body html".split()
)
DROP_CONTAINERS = frozenset("head nav header footer aside".split())
DEFAULT_MAX_LINK_DENSITY = 1.0 / 3.0

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)(?:\s[^>]*)?>")
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)(?:\s[^>]*)?>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_WS_RE = re.compile(r"\s+")


def extract_main(
    html: str, max_link_density: float = DEFAULT_MAX_LINK_DENSITY
) -> tuple[str, int]:
    """``(main_text, n_kept_blocks)`` for one HTML document."""
    html = _SCRIPT_STYLE_RE.sub(" ", html or "")
    blocks: list[str] = []
    buf: list[str] = []
    link_chars = 0
    drop_depth = 0
    a_depth = 0
    pos = 0

    def finalize() -> None:
        nonlocal buf, link_chars
        text = _WS_RE.sub(" ", "".join(buf)).strip()
        if text and drop_depth == 0:
            if link_chars / len("".join(buf)) <= max_link_density:
                blocks.append(text)
        buf = []
        link_chars = 0

    for m in _TAG_RE.finditer(html):
        chunk = html[pos : m.start()]
        if chunk:
            buf.append(chunk)
            if a_depth > 0:
                link_chars += len(chunk)
        pos = m.end()
        closing, tag = m.group(1) == "/", m.group(2).lower()
        if tag in BLOCK_TAGS or tag in DROP_CONTAINERS:
            finalize()
        if tag in DROP_CONTAINERS:
            drop_depth = max(0, drop_depth - 1) if closing else drop_depth + 1
        elif tag == "a":
            a_depth = max(0, a_depth - 1) if closing else a_depth + 1
    tail = html[pos:]
    if tail:
        buf.append(tail)
        if a_depth > 0:
            link_chars += len(tail)
    finalize()
    return " ".join(blocks), len(blocks)


class MainContentStage:
    """Batch stage ``(doc_id, html) -> (doc_id, main_text, n_blocks)``.
    STATELESS (regexes are module-compiled): the default plans run it
    as plain tasks; the class shape exists so it also slots into the
    registry's actor form and carries per-instance options."""

    def __init__(self, max_link_density: float = DEFAULT_MAX_LINK_DENSITY):
        self.max_link_density = max_link_density

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        texts, counts = [], np.empty(t.num_rows, dtype=np.int64)
        for i, h in enumerate(t.column("html").to_pylist()):
            main, n = extract_main(h, self.max_link_density)
            texts.append(main)
            counts[i] = n
        return pa.Table.from_arrays(
            [pa.array(ids.astype(np.int64)), pa.array(texts, pa.string()),
             pa.array(counts)],
            names=["doc_id", "main_text", "n_blocks"],
        )


#: tokens per synthetic <p> block in :func:`wrap_documents_html`
WRAP_CHUNK_TOKENS = 10


def wrap_documents_html(t: pa.Table) -> pa.Table:
    """Deterministic HTML rendering of a ``(doc_id, source, text)``
    batch — the golden-output harness for the extractor (the reference
    verifies its tools against known-answer inputs the same way,
    tests/test_exiftool_integration.py style). The true main content is
    the whitespace-normalized document text by construction: chrome is
    a header+nav, a sponsored aside, a link-farm div (dropped only by
    the DENSITY rule — it lives outside every chrome container) and a
    footer; the text is split into 10-token ``<p>`` blocks."""
    ids = t.column("doc_id").to_pylist()
    sources = t.column("source").to_pylist()
    texts = t.column("text").to_pylist()
    out = []
    for did, src, txt in zip(ids, sources, texts):
        toks = (txt or "").split()
        paras = "".join(
            "<p>" + " ".join(toks[i : i + WRAP_CHUNK_TOKENS]) + "</p>"
            for i in range(0, len(toks), WRAP_CHUNK_TOKENS)
        )
        out.append(
            f'<html><head><title>Doc {did}</title><style>.x{{color:red}}</style>'
            f"<script>var t={did};</script></head><body>"
            f"<header><h1>{src} portal</h1>"
            '<nav><a href="/">Home</a> <a href="/s">Search</a> '
            '<a href="/t">Trends</a></nav></header>'
            '<aside><p>Sponsored <a href="/buy">buy</a> '
            '<a href="/now">now</a></p></aside>'
            f'<div id="main">{paras}</div>'
            '<div class="rel"><p><a href="/1">related fast key</a> '
            '<a href="/2">more join batch</a></p></div>'
            f"<footer><p>© 2026 {src}.example <a href=\"/terms\">terms</a>"
            "</p></footer></body></html>"
        )
    return pa.Table.from_arrays(
        [t.column("doc_id"), pa.array(out, pa.string())],
        names=["doc_id", "html"],
    )


def main_content_from_docs(ds) -> "object":
    """documents → deterministic HTML wrap → boilerplate strip, fused
    into ONE task stage. The stage is STATELESS (regexes are module
    compiled-once), so plain tasks beat an actor pool: no per-run actor
    spin-up (~1 s of the 2 s sf0.1 wall was pool startup), and the
    streaming executor sizes task parallelism itself."""
    def wrap_and_strip(t):
        return MainContentStage()(wrap_documents_html(t))

    return ds.map_batches(wrap_and_strip, batch_format="pyarrow")


_HREF_RE = re.compile(r"""\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
                      re.IGNORECASE)


def extract_links(html: str) -> "list[tuple[str, str]]":
    """``(href, anchor_text)`` pairs in document order — the outlink
    harvest (web-graph construction, the crawl frontier's input).
    Anchor text is whitespace-normalized; anchors without an href are
    skipped; an unclosed ``<a>`` closes at end of input. Nested markup
    inside the anchor contributes its text."""
    html = _SCRIPT_STYLE_RE.sub(" ", html or "")
    out: list[tuple[str, str]] = []
    cur_href: "str | None" = None
    buf: list[str] = []
    pos = 0

    def close() -> None:
        nonlocal cur_href, buf
        if cur_href is not None:
            out.append((cur_href, _WS_RE.sub(" ", "".join(buf)).strip()))
        cur_href, buf = None, []

    for m in _TAG_RE.finditer(html):
        if cur_href is not None:
            buf.append(html[pos : m.start()])
        pos = m.end()
        closing, tag = m.group(1) == "/", m.group(2).lower()
        if tag != "a":
            continue
        if closing:
            close()
        else:
            close()  # a new <a> implicitly closes a dangling one
            hm = _HREF_RE.search(m.group(0))
            if hm:
                cur_href = hm.group(2) or hm.group(3) or hm.group(4) or ""
    if cur_href is not None:
        buf.append(html[pos:])
        close()
    return out


class LinkExtractStage:
    """Actor-pool stage: ``(doc_id, html)`` → exploded
    ``(doc_id, position, href, anchor)`` rows (flat-map shape)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, poss, hrefs, anchors = [], [], [], []
        for did, h in zip(
            t.column("doc_id").to_pylist(), t.column("html").to_pylist()
        ):
            for j, (href, anchor) in enumerate(extract_links(h)):
                ids.append(did)
                poss.append(j)
                hrefs.append(href)
                anchors.append(anchor)
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(poss, pa.int64()),
                pa.array(hrefs, pa.string()),
                pa.array(anchors, pa.string()),
            ],
            names=["doc_id", "position", "href", "anchor"],
        )

"""URL canonicalization + crawl-frontier dedup — the web pipeline's
step ZERO.

Before any content-level dedup, crawl pipelines (CommonCrawl / FineWeb
/ Dolma lineage) dedup by NORMALIZED URL and enforce per-host budgets:
the same page is fetched under utm-tagged, fragment-bearing,
case-varying, default-port-carrying aliases, and a handful of hosts
would otherwise dominate the corpus. Reference parity note: the
reference engine has no URL surface (its inputs are local files,
``src/cli/main.py``); this module is part of the beyond-reference
web-corpus surface beside stages/maincontent.py.

Canonicalization contract (deterministic, documented over RFC 3986):

- scheme and host lowercased; a ``www.`` host prefix is kept (site
  identity, not an alias we can prove);
- default ports stripped (``:80`` for http, ``:443`` for https);
- fragment dropped;
- query: ``utm_*`` / ``gclid`` / ``fbclid`` / ``ref`` tracking params
  dropped, the rest sorted by (key, value) byte order, ``?`` dropped
  when nothing survives;
- path: empty path becomes ``/``; a trailing slash on a non-root path
  is stripped.

Engine shape: canonicalization is row-local ``map_batches`` (string
ops, no state); URL-level first-wins dedup is the engine's exact-dedup
shape (ONE sort by (canon_url, doc_id) + run-boundary keep-first —
no per-key dispatch at unbounded URL cardinality); the per-host cap
reuses :func:`stages.sampling.sample_k_per_group` (ONE sort +
run-boundary arange). The synthetic corpus carries no URLs, so the
driver-facing query exercises the stage through a deterministic
INJECTION harness (:func:`wrap_documents_urls` — same golden-output
doctrine as stages/maincontent.py's HTML wrap and stages/pii.py's
injection): the oracle states the canonical URL as a closed form of
``doc_id`` without parsing anything.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: query params that identify a tracking campaign, not a resource
TRACKING_PARAMS = ("gclid", "fbclid", "ref")
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_url(url: str) -> str:
    """Normalize one URL per the module contract. Total function:
    inputs without a ``://`` are treated as scheme-less host+path and
    get ``http://``."""
    u = (url or "").strip()
    if not u:
        return ""
    # fragment first — everything after '#' is client-side
    u = u.split("#", 1)[0]
    if "://" in u:
        scheme, rest = u.split("://", 1)
    else:
        scheme, rest = "http", u
    scheme = scheme.lower()
    # query BEFORE the host/path split: a no-slash URL ("x.com?a=1")
    # would otherwise leak its query into the host (hypothesis-caught)
    if "?" in rest:
        rest, query = rest.split("?", 1)
    else:
        query = ""
    if "/" in rest:
        hostport, path = rest.split("/", 1)
        path = "/" + path
    else:
        hostport, path = rest, "/"
    hostport = hostport.lower()
    dflt = _DEFAULT_PORTS.get(scheme)
    if dflt and hostport.endswith(dflt):
        hostport = hostport[: -len(dflt)]
    if len(path) > 1 and path.endswith("/"):
        path = path.rstrip("/") or "/"
    kept = []
    for part in query.split("&"):
        if not part:
            continue
        key = part.split("=", 1)[0].lower()
        if key.startswith("utm_") or key in TRACKING_PARAMS:
            continue
        kept.append(part)
    kept.sort()
    out = f"{scheme}://{hostport}{path}"
    if kept:
        out += "?" + "&".join(kept)
    return out


def url_host(canon_url: str) -> str:
    """Host (with port, if non-default) of a canonicalized URL."""
    if "://" not in canon_url:
        return ""
    rest = canon_url.split("://", 1)[1]
    return rest.split("/", 1)[0]


class CanonicalizeStage:
    """Batch stage ``(doc_id, url)`` → ``(doc_id, canon_url, host)``.
    Stateless string ops — default plans run it as plain tasks."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        urls = t.column("url").to_pylist()
        canon = [canonicalize_url(u) for u in urls]
        hosts = [url_host(c) for c in canon]
        return pa.Table.from_arrays(
            [
                pa.array(ids.astype(np.int64)),
                pa.array(canon, pa.string()),
                pa.array(hosts, pa.string()),
            ],
            names=["doc_id", "canon_url", "host"],
        )


def url_dedup(ds: "object") -> "object":
    """First-wins dedup by canonical URL over a ``(doc_id, canon_url,
    host)`` dataset: ONE sort by (canon_url, doc_id), keep the run
    head — the exact-dedup engine shape, no per-URL dispatch."""
    from ..query_utils import _run_starts_mask_arrow, _window_by_key_arrow

    def keep_first(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        starts = _run_starts_mask_arrow(t, ["canon_url"])
        return t.filter(pa.array(starts))

    return _window_by_key_arrow(
        ds, ["canon_url"], ["canon_url", "doc_id"], keep_first
    )


def crawl_frontier_prep(
    ds: "object", per_host_cap: int = 100
) -> "object":
    """Canonicalize → URL-dedup → per-host budget cap over a
    ``(doc_id, url)`` dataset — the standard crawl-frontier prep
    composition. Output: ``(doc_id, canon_url, host)``, ≤
    ``per_host_cap`` rows per host (deterministic hash-order draw)."""
    from .sampling import sample_k_per_group

    canon = ds.map_batches(CanonicalizeStage(), batch_format="pyarrow")
    deduped = url_dedup(canon)
    return sample_k_per_group(deduped, "host", "doc_id", per_host_cap)


# ---------------------------------------------------------------- #
# deterministic injection harness (golden-output doctrine)          #
# ---------------------------------------------------------------- #

#: harness constants — the oracle states canonical URLs from these
N_HOSTS = 20
PAGES_PER_HOST = 40


def wrap_documents_urls(t: pa.Table) -> pa.Table:
    """``(doc_id, ...)`` → ``(doc_id, url)`` with deterministic messy
    aliases: doc_id maps to page ``(doc_id % N_HOSTS,
    (doc_id // N_HOSTS) % PAGES_PER_HOST)`` and the alias noise is
    selected by ``doc_id % 5`` — tracking params, default port,
    mixed-case host, fragment, unsorted query, trailing slash. The
    canonical form is therefore the closed form

        http://site{h}.example.com/p/{g}?id={g % 3}&v=2

    which the SQL oracle states directly from doc_id."""
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    urls = []
    for d in ids.tolist():
        h = d % N_HOSTS
        g = (d // N_HOSTS) % PAGES_PER_HOST
        base = f"site{h}.example.com"
        q = f"id={g % 3}&v=2"
        variant = d % 5
        if variant == 0:
            u = f"http://{base}/p/{g}?{q}"
        elif variant == 1:
            u = f"HTTP://{base.upper()}:80/p/{g}?utm_source=feed&{q}#frag"
        elif variant == 2:
            u = f"http://{base}/p/{g}/?v=2&id={g % 3}&gclid=XyZ"
        elif variant == 3:
            u = f"http://{base}:80/p/{g}?{q}&utm_campaign=x"
        else:
            u = f"http://{base}/p/{g}?ref=tw&v=2&id={g % 3}#top"
        urls.append(u)
    return pa.Table.from_arrays(
        [pa.array(ids), pa.array(urls, pa.string())],
        names=["doc_id", "url"],
    )


def crawl_frontier_serial(
    doc_ids: "list[int]", per_host_cap: int = 100
) -> "list[tuple[int, str, str]]":
    """Single-process oracle (tests): same harness + contract, plain
    dicts. Returns rows sorted by doc_id."""
    from .sampling import _hash_frac_u32

    wrapped = wrap_documents_urls(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64())})
    )
    by_canon: "dict[str, int]" = {}
    for d, u in zip(doc_ids, wrapped.column("url").to_pylist()):
        c = canonicalize_url(u)
        if c not in by_canon or d < by_canon[c]:
            by_canon[c] = d
    per_host: "dict[str, list[tuple[int, int]]]" = {}
    for c, d in by_canon.items():
        h = url_host(c)
        hv = int(_hash_frac_u32(np.array([d], dtype=np.int64))[0])
        per_host.setdefault(h, []).append((hv, d))
    out = []
    for h, rows in per_host.items():
        rows.sort()
        for _, d in rows[:per_host_cap]:
            c = canonicalize_url(
                wrap_documents_urls(
                    pa.table({"doc_id": pa.array([d], pa.int64())})
                ).column("url")[0].as_py()
            )
            out.append((d, c, h))
    return sorted(out)

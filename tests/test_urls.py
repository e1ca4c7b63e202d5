"""URL canonicalization + crawl-frontier prep vs hand cases, the
serial oracle, and a closed-form DuckDB oracle (golden-output
doctrine: the harness makes the canonical URL a pure function of
doc_id, so the SQL states it without parsing — same oracle-grade
evidence as the driver's ✓SQL rows, run in-repo because the driver
registry is capped at 50 entries)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from file_analyzer_ray.stages.urls import (
    N_HOSTS,
    PAGES_PER_HOST,
    canonicalize_url,
    crawl_frontier_serial,
    url_host,
)

SF = "/root/testdata/sf0.001"

CAP = 5

ORACLE = f"""
WITH base AS (
  SELECT doc_id, doc_id % {N_HOSTS} AS h,
         (doc_id // {N_HOSTS}) % {PAGES_PER_HOST} AS g
  FROM documents
), canon AS (
  SELECT doc_id,
         'http://site' || h || '.example.com/p/' || g ||
         '?id=' || (g % 3) || '&v=2' AS canon_url,
         'site' || h || '.example.com' AS host
  FROM base
), first_wins AS (
  SELECT canon_url, host, min(doc_id) AS doc_id FROM canon GROUP BY 1, 2
), ranked AS (
  SELECT doc_id, canon_url, host,
         row_number() OVER (
           PARTITION BY host ORDER BY
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS UBIGINT),
             doc_id
         ) AS rk
  FROM first_wins
)
SELECT doc_id, canon_url, host FROM ranked WHERE rk <= {CAP}
"""


class TestCanonicalize:
    def test_hand_cases(self):
        assert (
            canonicalize_url("HTTPS://Example.COM:443/A/B/?b=2&a=1&utm_source=x#f")
            == "https://example.com/A/B?a=1&b=2"
        )
        assert canonicalize_url("example.com") == "http://example.com/"
        assert canonicalize_url("http://x.com/?gclid=1") == "http://x.com/"
        assert canonicalize_url("http://x.com:80/p") == "http://x.com/p"
        # non-default port survives; https keeps :8443
        assert canonicalize_url("https://x.com:8443/p") == "https://x.com:8443/p"
        assert canonicalize_url("") == ""
        assert canonicalize_url(None) == ""

    def test_idempotent(self):
        for u in [
            "HTTP://A.com:80/x/?utm_a=1&z=2&b=3#frag",
            "a.com/x",
            "https://h.io/p?k=v",
        ]:
            c = canonicalize_url(u)
            assert canonicalize_url(c) == c

    def test_host(self):
        assert url_host("http://a.b.com/p?x=1") == "a.b.com"
        assert url_host("https://a.com:8443/p") == "a.com:8443"
        assert url_host("") == ""


def _doc_ids():
    import pyarrow.parquet as pq

    return (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
        .column("doc_id")
        .to_pylist()
    )


def test_crawl_frontier_matches_duckdb_oracle(ray_session):
    import ray.data

    from file_analyzer_ray.stages.urls import (
        crawl_frontier_prep,
        wrap_documents_urls,
    )

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"], override_num_blocks=4
    ).map_batches(wrap_documents_urls, batch_format="pyarrow")
    got = (
        crawl_frontier_prep(docs, per_host_cap=CAP)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    exp = con.execute(ORACLE).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "canon_url", "host"]].astype({"doc_id": "int64"}),
        exp[["doc_id", "canon_url", "host"]].astype({"doc_id": "int64"}),
    )


def test_distributed_equals_serial(ray_session):
    import ray.data

    from file_analyzer_ray.stages.urls import (
        crawl_frontier_prep,
        wrap_documents_urls,
    )

    ids = _doc_ids()
    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"], override_num_blocks=4
    ).map_batches(wrap_documents_urls, batch_format="pyarrow")
    got = sorted(
        (int(r["doc_id"]), r["canon_url"], r["host"])
        for r in crawl_frontier_prep(docs, per_host_cap=CAP).take_all()
    )
    assert got == crawl_frontier_serial(ids, per_host_cap=CAP)


def test_dedup_is_first_wins(ray_session):
    """Aliases of the same page collapse to the smallest doc_id."""
    import ray.data

    from file_analyzer_ray.stages.urls import (
        CanonicalizeStage,
        url_dedup,
        wrap_documents_urls,
    )

    import pyarrow as pa

    # doc_ids 0, N_HOSTS*PAGES_PER_HOST, 2*N_HOSTS*PAGES_PER_HOST all
    # map to host 0 / page 0 under different alias variants
    period = N_HOSTS * PAGES_PER_HOST
    ids = [0, period, 2 * period, 1]
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    ds = ray.data.from_arrow(wrap_documents_urls(t))
    out = url_dedup(
        ds.map_batches(CanonicalizeStage(), batch_format="pyarrow")
    ).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1]

#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(num_cpus=$RAY_GRAFT_CPUS``
(default 32)) and print ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "docs": N, "docs_per_sec": N}

Headline = end-to-end extraction throughput (BASELINE.json metric):
deterministic interleaved corpus (cached, generated once, sized to the
sf documents table) → full extraction+scoring plan → resumable
partitioned parquet sink.

``--scaling``: run the identical job in FRESH processes at num_cpus=8
and num_cpus=32 on the same cached input (page cache warmed by an
untimed read) and report both throughputs + per-core scaling
efficiency = (t_8/t_32)/(32/8).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "lineitem_pricing_summary",
    "customer_order_revenue",
    "events_hourly_rollup",
    "docs_exact_dedup",
    "docs_minhash_near_dup",
    "embeddings_knn",
]


def _consume(res) -> int:
    if hasattr(res, "iter_batches"):  # ray Dataset: stream it through
        n = 0
        for b in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += b.num_rows
        return n
    return len(res)


def _corpus_docs(sf_dir: str) -> int:
    # lineitem is the only table that scales linearly across all sf
    # tiers (6k/60k/600k) → 1k/10k/100k docs (FIXTURES.md F6).
    import pyarrow.parquet as pq

    n_li = pq.read_metadata(f"{sf_dir}/lineitem.parquet").num_rows
    return max(1000, n_li // 6)


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NCPU,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from file_analyzer_ray.pipelines.extract import corpus_path, extract_pipeline
    from file_analyzer_ray.queries import QUERIES
    from file_analyzer_ray.state.lineage import write_partitioned

    n_docs = _corpus_docs(SF_DIR)
    src = corpus_path(n_docs)  # untimed: generate-or-reuse cache
    # Warm the OS page cache so we measure compute+shuffle, not cold disk.
    ray.data.read_parquet(src).count()

    out = f"/tmp/fa_bench_out_{NCPU}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.monotonic()
    manifests = write_partitioned(
        extract_pipeline(src, score=True),
        out,
        num_partitions=64,
        resume=False,
        run_meta={"bench": True},
    )
    t_extract = time.monotonic() - t0
    rows = sum(m["row_count"] for m in manifests)

    q_times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.monotonic()
        _consume(QUERIES[name](SF_DIR))
        q_times[name] = round(time.monotonic() - t0, 3)

    result = {
        "metric": "end_to_end_extraction_sec",
        "value": round(t_extract, 3),
        "unit": "sec",
        "queries": q_times,
        "sf": SF_DIR,
        "num_cpus": NCPU,
        "docs": rows,
        "docs_per_sec": round(rows / t_extract, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    one(8)  # warm-up pass: corpus generation + page cache, untimed
    lo, hi = one(8), one(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "docs_per_sec_8": lo["docs_per_sec"],
        "docs_per_sec_32": hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "docs": lo["docs"],
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))

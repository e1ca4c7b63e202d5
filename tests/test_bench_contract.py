"""bench.py is driver-facing infrastructure: its stdout JSON line is
recorded as BENCH_r{N}.json every round. Run it small and validate the
contract so a refactor can't silently break the round's bench score."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_contract_json():
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="4",
        GRAFT_BENCH_DOCS="1000",
        GRAFT_BENCH_NO_QUERIES="1",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf", "num_cpus",
                "docs", "docs_per_sec"):
        assert key in rec, f"missing {key}"
    assert rec["unit"] == "sec"
    assert rec["docs"] == 1000
    assert rec["value"] > 0 and rec["docs_per_sec"] > 0
    assert rec["num_cpus"] == 4


def test_bench_query_names_are_registered():
    """Every name the bench times must exist in the live registry —
    retiring a query without updating BENCH_QUERIES broke the bench
    mid-round once; this pins it."""
    import bench

    from file_analyzer_ray.queries import QUERIES

    missing = [n for n in bench.BENCH_QUERIES if n not in QUERIES]
    assert not missing, missing

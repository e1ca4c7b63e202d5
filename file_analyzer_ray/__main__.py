"""CLI entry point: ``python -m file_analyzer_ray <command>``.

Ray-native replacement for the reference's ``fa`` CLI surface
(src/cli/main.py:285-368): the analyze-everything flow is the sharded
extraction run; analyses map to registered stages / queries.

The CLI owns its Ray session (guarded init — the only places allowed
to init Ray are here, bench.py and the pytest fixture; library code
and the driver contract never do).
"""

from __future__ import annotations

import argparse
import json
import sys


class _RaySession:
    """Init Ray only if nobody else owns it; shut down only what we
    started (an embedding host — tests, a driver — keeps its session)."""

    def __enter__(self):
        import ray

        self._owned = not ray.is_initialized()
        if self._owned:
            ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        import ray.data

        ray.data.DataContext.get_current().enable_progress_bars = False
        self._ray = ray
        return ray

    def __exit__(self, *exc):
        if self._owned:
            self._ray.shutdown()
        return False


def cmd_extract(args) -> int:
    with _RaySession():
        from .pipelines.extract import corpus_path
        from .state.shards import run_sharded

        src = args.src or corpus_path(args.docs)
        metrics = run_sharded(
            src,
            args.out,
            score=not args.no_score,
            resume=not args.no_resume,
            run_meta={"cli": True},
        )
        print(json.dumps(metrics))
    return 0


def cmd_job(args) -> int:
    """Cluster job entry — the target of ``ray job submit`` on a real
    multi-node cluster (north rule: "run via ray job submit"):

        ray job submit --working-dir . -- \\
            python -m file_analyzer_ray job --src <in> --out <out>

    Unlike the local ``extract`` command this connects to the cluster
    the job runner provides (``RAY_ADDRESS``, else ``auto``; the
    sandbox presets ``RAY_ADDRESS=local`` so the same entry runs
    single-node), runs the shard-checkpointed extraction with resume ON
    (a re-submitted job skips fenced shards — the per-partition lineage
    makes restarts exact), and prints one metrics JSON line: rows,
    wall, docs/sec, shards total/skipped, cluster CPU count."""
    import os
    import time

    import ray

    owned = not ray.is_initialized()
    if owned:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "auto"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    try:
        from .pipelines.extract import corpus_path
        from .state.shards import run_sharded

        src = args.src or corpus_path(args.docs)
        t0 = time.monotonic()
        metrics = run_sharded(
            src,
            args.out,
            score=not args.no_score,
            resume=True,
            run_meta={"job": True},
        )
        wall = time.monotonic() - t0
        metrics = dict(metrics)
        metrics.update(
            wall_sec=round(wall, 3),
            docs_per_sec=round(metrics.get("rows", 0) / wall, 1) if wall else None,
            cluster_cpus=int(ray.cluster_resources().get("CPU", 0)),
            nodes=len([n for n in ray.nodes() if n.get("Alive")]),
        )
        print(json.dumps(metrics))
    finally:
        if owned:
            ray.shutdown()
    return 0


def cmd_query(args) -> int:
    # retired-from-driver-registry queries stay runnable here — the
    # 50-entry driver cap must never shrink the USER surface
    from .queries import (
        ORACLE_SQL,
        QUERIES,
        RETIRED_ORACLE_SQL,
        RETIRED_QUERIES,
    )

    queries = {**RETIRED_QUERIES, **QUERIES}
    oracles = {**RETIRED_ORACLE_SQL, **ORACLE_SQL}
    if args.name not in queries:
        print(f"unknown query {args.name!r}; see `queries`", file=sys.stderr)
        return 2
    with _RaySession():
        res = queries[args.name](args.sf_dir)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if args.limit:
            df = df.head(args.limit)
        print(df.to_string(index=False))
        if getattr(args, "stats", False) and hasattr(res, "stats"):
            # per-stage wall/CPU breakdown — the measure-don't-guess loop
            print("\n-- ds.stats() --\n" + res.stats())
    if args.show_sql and args.name in oracles:
        print("\n-- DuckDB oracle --" + oracles[args.name])
    return 0


def cmd_queries(args) -> int:
    from .queries import ORACLE_SQL, QUERIES, RETIRED_ORACLE_SQL, RETIRED_QUERIES

    for name in sorted(QUERIES):
        mark = "sql-oracle" if name in ORACLE_SQL else "rows-only"
        print(f"{name:32s} {mark}")
    for name in sorted(RETIRED_QUERIES):
        mark = "sql-oracle" if name in RETIRED_ORACLE_SQL else "rows-only"
        print(f"{name:32s} {mark} (retired from driver registry)")
    return 0


def cmd_stages(args) -> int:
    from .registry import list_stages

    for name in list_stages():
        print(name)
    return 0


def cmd_validate(args) -> int:
    """``fa validate`` analog (reference src/cli/validate/main.py:43-185):
    check every row of an extracted-output directory against the
    versioned JSON-Schema contract. Exit 1 on the first violating row."""
    import glob
    import os

    import jsonschema
    import pyarrow.parquet as pq

    schema_path = os.path.join(
        os.path.dirname(__file__), "..", "schemas", "extracted", "v1.0", "schema.json"
    )
    with open(schema_path) as f:
        schema = json.load(f)
    validator = jsonschema.Draft7Validator(schema)
    files = sorted(glob.glob(os.path.join(args.dir, "*.parquet")))
    if not files:
        print(f"no parquet files under {args.dir}", file=sys.stderr)
        return 2
    n = 0
    for fp in files:
        for row in pq.read_table(fp).to_pylist():
            row["tags"] = [str(t) for t in (row.get("tags") or [])]
            row["spans"] = [dict(s) for s in (row.get("spans") or [])]
            errors = list(validator.iter_errors(row))
            if errors:
                print(f"INVALID {row.get('doc_id')} in {fp}: {errors[0].message}",
                      file=sys.stderr)
                return 1
            n += 1
    print(json.dumps({"validated_rows": n, "files": len(files), "schema": "extracted/v1.0"}))
    return 0


def main(argv: list[str] | None = None) -> int:
    from .registry import load_plugins

    load_plugins()  # entry_points-discovered third-party stages
    p = argparse.ArgumentParser(prog="file_analyzer_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="shard-checkpointed extraction run")
    pe.add_argument("--src", help="input parquet dir (default: synthetic corpus)")
    pe.add_argument("--docs", type=int, default=1000,
                    help="synthetic corpus size when --src omitted")
    pe.add_argument("--out", required=True, help="output dir (fenced shards)")
    pe.add_argument("--no-score", action="store_true")
    pe.add_argument("--no-resume", action="store_true")
    pe.set_defaults(fn=cmd_extract)

    pj = sub.add_parser(
        "job", help="cluster job entry (target of `ray job submit`)"
    )
    pj.add_argument("--src", help="input parquet dir (default: synthetic corpus)")
    pj.add_argument("--docs", type=int, default=1000,
                    help="synthetic corpus size when --src omitted")
    pj.add_argument("--out", required=True, help="output dir (fenced shards)")
    pj.add_argument("--no-score", action="store_true")
    pj.set_defaults(fn=cmd_job)

    pq_ = sub.add_parser("query", help="run a registered query")
    pq_.add_argument("name")
    pq_.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pq_.add_argument("--limit", type=int, default=20)
    pq_.add_argument("--show-sql", action="store_true")
    pq_.add_argument(
        "--stats", action="store_true",
        help="print Ray Data per-stage execution stats after the result",
    )
    pq_.set_defaults(fn=cmd_query)

    pl = sub.add_parser("queries", help="list registered queries")
    pl.set_defaults(fn=cmd_queries)

    ps = sub.add_parser("stages", help="list registered pipeline stages")
    ps.set_defaults(fn=cmd_stages)

    pv = sub.add_parser(
        "validate", help="validate extracted output rows against the JSON-Schema contract"
    )
    pv.add_argument("dir", help="directory of extracted parquet shards")
    pv.set_defaults(fn=cmd_validate)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except BrokenPipeError:  # downstream `head` closed the pipe
        return 0


if __name__ == "__main__":
    raise SystemExit(main())

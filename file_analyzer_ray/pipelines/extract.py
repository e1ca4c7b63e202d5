"""Flagship extraction pipeline — the Ray-Data-native re-expression of
``fa analyze all <dir>`` (reference src/cli/analyze/main.py:124-231,
traced in SURVEY.md §3.2).

Shape (one streaming plan, no disk IR between stages, no full
materialization):

    read_parquet(docs)
      -> map_batches(ExtractStage(score=True), concurrency=(8,N))
            # ONE fused actor pool: normalize+sniff+meta+OCR+carve+
            # match + deterministic mock-VLM scoring with the JSON
            # parse/repair chain; automata compiled in __init__,
            # bounded-window scan for pathological payloads
      -> write_partitioned(...)  # atomic per-partition parquet +
            # lineage manifests (keyed resume), OR state/shards.py
            # run_sharded for the shuffle-free shard-fenced path

The seven sequential per-file analyses + per-call subprocess reloads of
the reference collapse into one actor-pool batch stage; dedup is a
separate keyed query over the narrow (doc_id, content_hash) projection
(see stages/dedup.py).
"""

from __future__ import annotations

import os

import ray
import ray.data

from ..corpus import generate_parquet
from ..query_utils import read_parquet_clean
from ..stages.extract import ExtractStage

_CORPUS_CACHE_ROOT = "/tmp/fa_ray_corpus"


def corpus_path(n_docs: int) -> str:
    """Deterministic on-disk corpus cache (generated once per size)."""
    # v2: 2000-doc shards (finer units for shard-level checkpointing)
    path = os.path.join(_CORPUS_CACHE_ROOT, f"v2_{n_docs}")
    marker = os.path.join(path, "_COMPLETE")
    if not os.path.exists(marker):
        tmp = path + ".building"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        generate_parquet(n_docs, tmp)
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        shutil.rmtree(path, ignore_errors=True)
        os.replace(tmp, path)
        with open(marker, "w") as f:
            f.write("ok")
    return path


def _default_concurrency() -> int:
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus - 2)  # leave headroom for read/write stages


def extract_pipeline(
    source: "str | ray.data.Dataset",
    *,
    score: bool = True,
    concurrency: int | None = None,
    batch_size: int = 256,
) -> "ray.data.Dataset":
    """Lazy Dataset of extracted (+ scored) documents."""
    ds = read_parquet_clean(source) if isinstance(source, str) else source
    n = concurrency or _default_concurrency()
    # Extraction + scoring run FUSED in one actor pool: the scorer
    # consumes the span lists the extractor just built, so a second
    # actor pool would only add an object-store round trip of the heavy
    # spans column (measured ~2x wall at 100k docs). ScorerStage remains
    # available as a standalone stage for pipelines that score
    # pre-extracted tables.
    # Pool minimum must leave at least one CPU for upstream ops: when a
    # source stage prevents read->pool fusion, a minimum that pins every
    # core starves ReadParquet and the plan deadlocks (seen at
    # num_cpus=4 with min=4).
    cpus = int(ray.cluster_resources().get("CPU", n)) if ray.is_initialized() else n
    lo = max(1, min(8, n, cpus - 1))
    return ds.map_batches(
        ExtractStage,
        fn_constructor_kwargs={"score": score},
        batch_format="pyarrow",
        batch_size=batch_size,
        # min ramps the pool immediately on a busy cluster; max n
        # leaves headroom for the read and sink stages.
        concurrency=(lo, n),
        num_cpus=1,
    )


def run_flagship(
    n_docs: int,
    out_dir: str | None = None,
    *,
    score: bool = True,
    concurrency: int | None = None,
    num_partitions: int = 32,
) -> dict:
    """Generate-or-reuse the deterministic corpus, run the flagship plan,
    write resumable partitioned output. Returns run metrics."""
    from ..state.lineage import write_partitioned

    src = corpus_path(n_docs)
    ds = extract_pipeline(src, score=score, concurrency=concurrency)
    if out_dir is None:
        rows = ds.count()
        return {"n_docs": n_docs, "rows": rows, "out_dir": None}
    manifests = write_partitioned(
        ds, out_dir, num_partitions=num_partitions, run_meta={"n_docs": n_docs}
    )
    return {
        "n_docs": n_docs,
        "rows": sum(m["row_count"] for m in manifests),
        "span_count": sum(m["span_count"] for m in manifests),
        "partitions": len(manifests),
        "out_dir": out_dir,
    }

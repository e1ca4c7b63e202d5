"""Incremental dedup index (stages/incremental.py): DuckDB oracle
equality, append-grows-the-index, and probe-locality invariants."""

from __future__ import annotations

import os
import shutil

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_incremental_dedup_matches_duckdb_oracle(ray_session):
    from file_analyzer_ray.queries import (
        SQL_DOCS_INCREMENTAL_DEDUP,
        q_docs_incremental_dedup,
    )

    got = (
        q_docs_incremental_dedup(SF).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    exp = (
        con.execute(SQL_DOCS_INCREMENTAL_DEDUP).df()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got.columns) == ["doc_id", "fingerprint", "in_corpus"]
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # the synthetic corpus plants exact dups, so some shard docs hit
    assert 0 < got["in_corpus"].sum() < len(got)


def test_append_grows_index(ray_session):
    import ray.data

    from file_analyzer_ray.stages.incremental import (
        append_to_index,
        probe_index,
        write_dedup_index,
    )

    base = "/tmp/fa_test_incr_idx"
    shutil.rmtree(base, ignore_errors=True)
    a = pd.DataFrame({"doc_id": [1, 2], "text": ["alpha beta", "gamma delta"]})
    b = pd.DataFrame({"doc_id": [3], "text": ["epsilon zeta"]})
    probe = pd.DataFrame(
        {"doc_id": [10, 11, 12],
         "text": ["alpha  beta", "epsilon zeta", "never seen"]}
    )
    write_dedup_index(ray.data.from_pandas(a), base, num_buckets=4)
    p1 = (probe_index(ray.data.from_pandas(probe), base, num_buckets=4)
          .to_pandas().set_index("doc_id").sort_index())
    # whitespace-normalized: "alpha  beta" == "alpha beta"
    assert p1["in_corpus"].tolist() == [True, False, False]
    append_to_index(ray.data.from_pandas(b), base, num_buckets=4)
    p2 = (probe_index(ray.data.from_pandas(probe), base, num_buckets=4)
          .to_pandas().set_index("doc_id").sort_index())
    assert p2["in_corpus"].tolist() == [True, True, False]
    shutil.rmtree(base, ignore_errors=True)


def test_probe_reads_only_probed_cells(ray_session):
    """Probe I/O proportionality: a one-doc shard touches exactly the
    cells its fingerprint hashes to — verified by poisoning every other
    bucket directory with an unreadable file."""
    import ray.data

    from file_analyzer_ray.stages.incremental import (
        probe_index,
        write_dedup_index,
    )
    from file_analyzer_ray.state.bucketed import bucket_of

    base = "/tmp/fa_test_incr_locality"
    shutil.rmtree(base, ignore_errors=True)
    corpus = pd.DataFrame(
        {"doc_id": range(1, 21), "text": [f"doc number {i}" for i in range(1, 21)]}
    )
    write_dedup_index(ray.data.from_pandas(corpus), base, num_buckets=8)
    import hashlib as _h
    import re as _re

    fp = _h.md5(
        _re.sub(r"[\t\n\f\r ]+", " ", "doc number 7").strip().lower().encode()
    ).hexdigest()
    target = bucket_of(fp, 8)
    for bk in range(8):
        d = os.path.join(base, f"bucket={bk}")
        if bk != target and os.path.isdir(d):
            # poison: a corrupt parquet file that errors if read
            with open(os.path.join(d, "poison.parquet"), "w") as f:
                f.write("not parquet")
    probe = pd.DataFrame({"doc_id": [99], "text": ["doc number 7"]})
    out = (probe_index(ray.data.from_pandas(probe), base, num_buckets=8)
           .to_pandas())
    assert out["in_corpus"].tolist() == [True]
    shutil.rmtree(base, ignore_errors=True)

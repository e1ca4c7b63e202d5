"""Deterministic mixing + epoch shuffle vs DuckDB oracles (in-repo
oracle: the driver registry is at its 50-entry cap). The membership
coin and the permutation key are both md5-based so SQL recomputes them
exactly."""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

SQL_MIX = """
SELECT doc_id, 'docs_a' AS source FROM documents
WHERE CAST(('0x' || substr(md5('7:docs_a:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UINT32)
      < 0.3 * 4294967296.0
UNION ALL
SELECT doc_id, 'docs_b' AS source FROM documents
WHERE CAST(('0x' || substr(md5('7:docs_b:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UINT32)
      < 0.8 * 4294967296.0
"""

SQL_ORDER = """
SELECT doc_id FROM documents
ORDER BY md5('0:2:' || CAST(doc_id AS VARCHAR)), doc_id
"""


def _docs():
    import ray.data

    return ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id"], override_num_blocks=4
    )


def test_mix_sources_matches_duckdb(ray_session):
    from file_analyzer_ray.stages.mixture import mix_sources

    got = (
        mix_sources({"docs_a": _docs(), "docs_b": _docs()},
                    {"docs_a": 0.3, "docs_b": 0.8}, seed=7)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = (
        con.execute(SQL_MIX).df()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64"}), exp.astype({"doc_id": "int64"})
    )
    # weights actually bite: b keeps more than a, neither keeps all
    counts = got["source"].value_counts()
    assert counts["docs_b"] > counts["docs_a"] > 0
    assert counts["docs_b"] < 500


def test_epoch_shuffle_matches_duckdb_and_decorrelates(ray_session):
    from file_analyzer_ray.stages.mixture import epoch_shuffle

    got = epoch_shuffle(_docs(), epoch=2).to_pandas()["doc_id"].tolist()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    exp = con.execute(SQL_ORDER).df()["doc_id"].tolist()
    assert got == exp

    # replay-determinism and cross-epoch decorrelation
    again = epoch_shuffle(_docs(), epoch=2).to_pandas()["doc_id"].tolist()
    assert again == got
    other = epoch_shuffle(_docs(), epoch=3).to_pandas()["doc_id"].tolist()
    assert sorted(other) == sorted(got) and other != got

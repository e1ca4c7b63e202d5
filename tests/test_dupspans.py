"""Duplicated n-gram span masking (stages/dupspans.py): DuckDB oracle
equality, broadcast↔join path equality, and a hand-checked fixture."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _oracle(sf_dir: str) -> pd.DataFrame:
    from file_analyzer_ray.queries import SQL_DOCS_DUP_SPANS

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.execute(SQL_DOCS_DUP_SPANS).df()


def test_dup_spans_matches_duckdb_oracle(ray_session):
    from file_analyzer_ray.queries import q_docs_dup_spans

    got = (
        q_docs_dup_spans(SF).to_pandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    exp = _oracle(SF).sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "n_tokens", "n_dup_grams",
                                 "n_masked"]
    for c in got.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # non-vacuous: the corpus plants shared spans
    assert got["n_dup_grams"].sum() > 0
    assert (got["n_masked"] <= got["n_tokens"]).all()


def test_dup_spans_join_path_equals_broadcast(ray_session):
    import ray.data

    from file_analyzer_ray.stages.dupspans import dup_span_mask

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=4,
    )
    bc = (dup_span_mask(docs, n=5, mode="broadcast").to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    jn = (dup_span_mask(docs, n=5, mode="join").to_pandas()
          .sort_values("doc_id").reset_index(drop=True))
    assert bc.equals(jn)


def test_dup_spans_hand_checked(ray_session):
    import ray.data

    from file_analyzer_ray.stages.dupspans import dup_span_mask

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                # docs 1+2 share the 5-gram "a b c d e" (and only it)
                "a b c d e x y z w v",
                "q q a b c d e q q",
                "totally different words here now",
            ],
        }
    )
    ds = ray.data.from_pandas(df)
    for mode in ("broadcast", "join"):
        out = (dup_span_mask(ds, n=5, mode=mode).to_pandas()
               .set_index("doc_id").sort_index())
        assert out.loc[1, "n_dup_grams"] == 1
        assert out.loc[1, "n_masked"] == 5  # tokens 0..4
        assert out.loc[2, "n_dup_grams"] == 1
        assert out.loc[2, "n_masked"] == 5  # tokens 2..6
        assert out.loc[3, "n_dup_grams"] == 0
        assert out.loc[3, "n_masked"] == 0
        assert (out["n_tokens"].to_numpy() == [10, 9, 5]).all()


def test_dup_spans_overlapping_windows(ray_session):
    import ray.data

    from file_analyzer_ray.stages.dupspans import dup_span_mask

    # docs share a 6-token span → two overlapping dup 5-grams whose
    # interval union is 6 tokens, not 10
    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["a b c d e f x y", "z a b c d e f w"],
        }
    )
    ds = ray.data.from_pandas(df)
    for mode in ("broadcast", "join"):
        out = (dup_span_mask(ds, n=5, mode=mode).to_pandas()
               .set_index("doc_id"))
        assert (out["n_dup_grams"].to_numpy() == [2, 2]).all()
        assert (out["n_masked"].to_numpy() == [6, 6]).all()

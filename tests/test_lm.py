"""Perplexity filter (stages/lm.py) vs its DuckDB oracle plus edge
cases the driver data never exercises (short docs, empty reference,
OOV-only docs)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sf_dir: str, threshold: float) -> pd.DataFrame:
    from file_analyzer_ray.queries import SQL_DOCS_PERPLEXITY

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    assert "36.0" in SQL_DOCS_PERPLEXITY
    sql = SQL_DOCS_PERPLEXITY.replace("36.0", str(threshold))
    return con.execute(sql).df()


def test_perplexity_matches_duckdb_oracle(ray_session):
    from file_analyzer_ray.queries import q_docs_perplexity

    got = (
        q_docs_perplexity(SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = _oracle(SF, 36.0).sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == ["doc_id", "n_bigrams", "ppl", "kept"]
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (got["n_bigrams"].to_numpy() == exp["n_bigrams"].to_numpy()).all()
    g, e = got["ppl"].to_numpy(), exp["ppl"].to_numpy()
    assert ((g == e) | (np.isnan(g) & np.isnan(e))).all()
    assert (got["kept"].to_numpy() == exp["kept"].to_numpy()).all()
    # the filter is non-vacuous on the synthetic corpus: some docs drop
    assert 0 < got["kept"].sum() < len(got)


def test_perplexity_edge_cases(ray_session):
    import ray.data

    from file_analyzer_ray.stages.lm import bigram_lm, perplexity_score

    df = pd.DataFrame(
        {
            # doc 0 is the reference slice (0 % 11 == 0); doc 3 is a
            # single-token doc (no bigrams); doc 5 is fully OOV.
            "doc_id": [0, 1, 3, 5],
            "text": [
                "a b a b c",
                "a b c",
                "solo",
                "zz yy zz",
            ],
        }
    )
    ds = ray.data.from_pandas(df)
    lm = bigram_lm(ds, sample_mod=11)
    assert lm.v == 3  # a, b, c
    out = (
        perplexity_score(ds, lm, ppl_threshold=4.0)
        .to_pandas()
        .set_index("doc_id")
    )
    # no-bigram doc: null ppl, kept
    assert out.loc[3, "n_bigrams"] == 0
    assert np.isnan(out.loc[3, "ppl"]) and bool(out.loc[3, "kept"])
    # fully-OOV doc: every bigram falls back to P = 1/V = 1/3
    assert out.loc[5, "ppl"] == pytest.approx(3.0, abs=1e-4)
    # reference slice bigrams (a,b),(b,a),(a,b),(b,c): c(a,b)=2 →
    # P(b|a)=(2+1)/(2+3)=3/5 twice; c(b,a)=c(b,c)=1 → 2/5 each
    p = (3 / 5) * (2 / 5) * (3 / 5) * (2 / 5)
    assert out.loc[0, "ppl"] == pytest.approx(p ** (-1 / 4), abs=1e-4)


def test_perplexity_empty_reference(ray_session):
    import ray.data

    from file_analyzer_ray.stages.lm import bigram_lm, perplexity_score

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["a b c", "c b a"]})
    ds = ray.data.from_pandas(df)
    lm = bigram_lm(ds, sample_mod=11)  # no doc_id % 11 == 0 → empty
    assert lm.v == 0
    out = perplexity_score(ds, lm, ppl_threshold=2.0).to_pandas()
    # V clamps to 1: every bigram scores P = 1 → ppl = 1, all kept
    assert (out["ppl"].to_numpy() == 1.0).all()
    assert out["kept"].all()


def test_perplexity_broadcast_guard(ray_session):
    import ray.data

    from file_analyzer_ray.stages.lm import bigram_lm

    df = pd.DataFrame({"doc_id": [0], "text": ["a b c d e f g h"]})
    ds = ray.data.from_pandas(df)
    with pytest.raises(ValueError, match="broadcast bound"):
        bigram_lm(ds, sample_mod=1, max_broadcast_entries=3)

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


def test_token_budget_mixture(ray_session):
    """Totals match a serial count; realized kept-token mass lands near
    each source's budget (deterministic coin, law-of-large-numbers
    tolerance); oversized budgets pass the source through whole."""
    from collections import Counter

    import pyarrow.parquet as pq

    import ray.data

    from file_analyzer_ray.functions.text import tokenize
    from file_analyzer_ray.stages.mixture import (
        mix_to_token_budget,
        source_token_totals,
        weights_for_token_budget,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "source", "text"])
    exp = Counter()
    for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        exp[s] += len(tokenize(txt.lower()))
    ds = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "source", "text"]
    ).repartition(4)
    totals = source_token_totals(ds)
    assert totals == dict(exp)

    names = sorted(totals)[:3]
    budgets = {
        names[0]: totals[names[0]] // 2,       # downsample to half
        names[1]: totals[names[1]] * 10,       # oversized -> rate 1.0
        names[2]: 0,                           # excluded
    }
    w = weights_for_token_budget(totals, budgets)
    assert w[names[1]] == 1.0 and w[names[2]] == 0.0

    def one_source(name):
        # mix_sources tags the stream itself, so the per-source inputs
        # must not already carry a source column
        return ds.filter(expr=f"source == '{name}'").select_columns(
            ["doc_id", "text"]
        )

    mixed = mix_to_token_budget(
        {n: one_source(n) for n in names}, budgets, totals
    ).take_all()
    got = Counter()
    for r in mixed:
        got[r["source"]] += len(tokenize(r["text"].lower()))
    assert got.get(names[2], 0) == 0
    assert got[names[1]] == totals[names[1]]
    assert abs(got[names[0]] - budgets[names[0]]) / budgets[names[0]] < 0.45
    # determinism: identical rerun
    again = mix_to_token_budget(
        {n: one_source(n) for n in names}, budgets, totals
    ).take_all()
    key = lambda rows: sorted(r["doc_id"] for r in rows)
    assert key(mixed) == key(again)


def test_temperature_mixture(ray_session):
    """α-sampling invariants: α=1 recovers proportional rates (equal
    rate for every source when the budget is a fraction of the whole);
    α→0 equalizes target token mass, up-weighting small sources; rates
    cap at 1.0; the realized deterministic mix follows the rates."""
    from collections import Counter

    import ray.data

    from file_analyzer_ray.functions.text import tokenize
    from file_analyzer_ray.stages.mixture import (
        mix_by_temperature,
        source_token_totals,
        weights_for_temperature,
    )

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "source", "text"]
    ).repartition(4)
    totals = source_token_totals(ds)
    grand = sum(totals.values())

    # α = 1: share_i = n_i / N, rate_i = budget/N for every source
    w1 = weights_for_temperature(totals, alpha=1.0, budget_tokens=grand // 2)
    for s in totals:
        assert abs(w1[s] - 0.5) < 1e-4  # grand//2 floors the budget
    # α = 0: equal target mass per source -> the smallest source gets
    # the HIGHEST rate (capped at 1.0)
    w0 = weights_for_temperature(totals, alpha=0.0, budget_tokens=grand // 2)
    smallest = min(totals, key=totals.get)
    largest = max(totals, key=totals.get)
    assert w0[smallest] >= w0[largest]
    assert all(0.0 <= v <= 1.0 for v in w0.values())
    # degenerate budgets
    assert all(v == 0.0 for v in weights_for_temperature(totals, 0.5, 0).values())

    names = sorted(totals)[:2]

    def one_source(name):
        return ds.filter(expr=f"source == '{name}'").select_columns(
            ["doc_id", "text"]
        )

    mixed = mix_by_temperature(
        {n: one_source(n) for n in names},
        {n: totals[n] for n in names},
        alpha=0.5,
        budget_tokens=sum(totals[n] for n in names) // 2,
    ).take_all()
    got = Counter()
    for r in mixed:
        got[r["source"]] += len(tokenize(r["text"].lower()))
    w = weights_for_temperature(
        {n: totals[n] for n in names}, 0.5,
        sum(totals[n] for n in names) // 2,
    )
    for n in names:  # realized mass within LLN tolerance of the target
        assert abs(got[n] - w[n] * totals[n]) < 0.25 * totals[n] + 50

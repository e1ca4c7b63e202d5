"""Crawl-snapshot diff: adversarial shapes the oracle query doesn't
exercise — one-sided snapshots, boundary-spanning runs, and the keyed-
snapshot contract. DuckDB oracle equality runs in test_queries.py
(SQL_CHECKED: docs_crawl_diff)."""

from __future__ import annotations

import pandas as pd
import pytest

import ray.data

from file_analyzer_ray.stages.snapshot import snapshot_diff


def _df(rows):
    return ray.data.from_items(
        [{"doc_id": i, "fingerprint": f} for i, f in rows]
    )


def _diff_map(old_rows, new_rows, parts=3):
    out = (
        snapshot_diff(
            _df(old_rows).repartition(parts), _df(new_rows).repartition(parts)
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    return dict(zip(out["doc_id"], out["status"]))


def test_all_four_statuses(ray_session):
    got = _diff_map(
        [(1, "a"), (2, "b"), (3, "c")],
        [(2, "b"), (3, "x"), (4, "d")],
    )
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_one_sided_snapshots(ray_session):
    assert _diff_map([], [(1, "a"), (2, "b")]) == {1: "added", 2: "added"}
    assert _diff_map([(1, "a")], []) == {1: "removed"}


def test_fingerprint_columns_carry_sides(ray_session):
    out = (
        snapshot_diff(_df([(1, "a"), (2, "b")]), _df([(2, "bb"), (3, "c")]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "old_fp"] == "a" and pd.isna(out.loc[0, "new_fp"])
    assert (out.loc[1, "old_fp"], out.loc[1, "new_fp"]) == ("b", "bb")
    assert pd.isna(out.loc[2, "old_fp"]) and out.loc[2, "new_fp"] == "c"


def test_duplicate_id_within_a_side_raises(ray_session):
    with pytest.raises(Exception, match="not keyed"):
        snapshot_diff(
            _df([(1, "a"), (1, "a2")]), _df([(1, "b")])
        ).to_pandas()


def test_many_ids_across_partitions(ray_session):
    # ids interleave across 5 input partitions; every id lands in
    # exactly one output row with the right status
    old = [(i, f"f{i}") for i in range(200) if i % 4 != 0]
    new = [
        (i, f"f{i}" if i % 3 else f"g{i}")
        for i in range(200)
        if i % 4 != 1
    ]
    got = _diff_map(old, new, parts=5)
    assert len(got) == 200
    for i in range(200):
        if i % 4 == 0:
            assert got[i] == "added"
        elif i % 4 == 1:
            assert got[i] == "removed"
        elif i % 3 == 0:
            assert got[i] == "changed"
        else:
            assert got[i] == "unchanged"

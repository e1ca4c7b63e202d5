"""Distributed prefix scan: serial-oracle equality for both ops across
multi-block inputs, block-boundary carry correctness, identity row.
DuckDB oracle equality for the late-data audit runs in test_queries.py
(SQL_CHECKED: events_late_arrivals)."""

from __future__ import annotations

import numpy as np
import pytest

import ray.data

from file_analyzer_ray.stages.scan import prefix_scan


def _run(vals, op, parts):
    ds = ray.data.from_items(
        [{"k": i, "v": int(v)} for i, v in enumerate(vals)]
    ).repartition(parts)
    out = (
        prefix_scan(ds, ["k"], "v", op=op, out_col="s")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    return out["s"].to_numpy()


@pytest.mark.parametrize("parts", [1, 4, 7])
def test_prefix_sum_matches_serial(ray_session, parts):
    rng = np.random.default_rng(3)
    vals = rng.integers(-50, 50, size=101)
    got = _run(vals, "sum", parts)
    exp = np.concatenate(([0], np.cumsum(vals)[:-1]))
    assert (got == exp).all()


@pytest.mark.parametrize("parts", [1, 4, 7])
def test_prefix_max_matches_serial(ray_session, parts):
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 1_000_000, size=101)
    got = _run(vals, "max", parts)
    exp = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(vals)[:-1])
    )
    assert (got == exp).all()


def test_first_row_gets_identity(ray_session):
    assert _run([7, 1], "max", 2)[0] == np.iinfo(np.int64).min
    assert _run([7, 1], "sum", 2)[0] == 0


def test_unknown_op_rejected(ray_session):
    with pytest.raises(ValueError, match="op must be"):
        prefix_scan(ray.data.from_items([{"k": 1, "v": 1}]), ["k"], "v", op="min")

"""Bin-overlap interval join (stages/interval.py): brute-force
equality, zero-fill, bin-boundary and fan-out edge cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from file_analyzer_ray.stages.interval import interval_join_count


def _run(points, intervals, width, mode="bins"):
    pts = pa.table({"ts": pa.array(points, pa.int64())})
    ivs = pa.table(
        {
            "iid": pa.array([i for i, _, _ in intervals], pa.int64()),
            "lo": pa.array([lo for _, lo, _ in intervals], pa.int64()),
            "hi": pa.array([hi for _, _, hi in intervals], pa.int64()),
        }
    )
    out = interval_join_count(
        ray.data.from_arrow(pts), ray.data.from_arrow(ivs),
        ts_col="ts", id_col="iid", start_col="lo", end_col="hi", width=width,
        mode=mode,
    )
    return {r["iid"]: r["n_points"] for r in out.take_all()}


def _brute(points, intervals):
    return {
        i: sum(1 for p in points if lo <= p < hi) for i, lo, hi in intervals
    }


def test_hand_case(ray_session):
    points = [0, 5, 10, 15, 20, 99, 100]
    intervals = [(1, 0, 10), (2, 10, 20), (3, 95, 105)]
    assert _run(points, intervals, width=10) == _brute(points, intervals)


def test_zero_fill_and_empty_interval(ray_session):
    points = [50]
    intervals = [(1, 0, 10), (2, 30, 30), (3, 40, 60)]  # 2 is empty (hi<=lo)
    assert _run(points, intervals, width=7) == {1: 0, 2: 0, 3: 1}


def test_interval_spanning_many_bins(ray_session):
    points = list(range(0, 100, 3))
    intervals = [(7, 5, 95)]  # spans ~13 bins at width 7
    assert _run(points, intervals, width=7) == _brute(points, intervals)


def test_half_open_bounds_at_bin_edges(ray_session):
    # start inclusive, end exclusive, exactly on bin boundaries
    points = [10, 20]
    intervals = [(1, 10, 20)]
    assert _run(points, intervals, width=10) == {1: 1}


@pytest.mark.parametrize("mode", ["bins", "broadcast", "auto"])
@pytest.mark.parametrize("width", [3, 16, 1000])
def test_random_brute_force_equality(ray_session, width, mode):
    rng = np.random.RandomState(7)
    points = rng.randint(0, 500, size=300).tolist()
    intervals = []
    for i in range(40):
        lo = int(rng.randint(0, 480))
        intervals.append((i, lo, lo + int(rng.randint(0, 60))))
    assert _run(points, intervals, width, mode) == _brute(points, intervals)


def test_broadcast_zero_fill_and_empty_interval(ray_session):
    points = [50]
    intervals = [(1, 0, 10), (2, 30, 30), (3, 40, 60)]
    assert _run(points, intervals, 7, "broadcast") == {1: 0, 2: 0, 3: 1}


def test_overlapping_intervals_count_independently(ray_session):
    points = [5, 6, 7]
    intervals = [(1, 0, 10), (2, 5, 7)]
    assert _run(points, intervals, width=4) == {1: 3, 2: 2}

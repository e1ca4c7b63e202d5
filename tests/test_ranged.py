"""Range-partitioned zone-map layout (state/ranged.py): pruning
actually skips partitions, and a pruned read equals a full-scan filter."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from file_analyzer_ray.state.ranged import (
    DAY_US,
    list_partitions,
    overlapping_partitions,
    range_ids,
    read_range,
    write_range_partitioned,
)

WIDTH = 100  # small int key width for unit-level checks


@pytest.fixture(scope="module")
def layout(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ranged") / "t")
    t = pa.table(
        {
            "k": pa.array(list(range(0, 1000, 7)), pa.int64()),
            "v": pa.array([i % 13 for i in range(0, 1000, 7)], pa.int64()),
        }
    )
    write_range_partitioned(ray.data.from_arrow(t), out, "k", WIDTH)
    return out, t


def test_partitions_cover_key_space(layout):
    out, t = layout
    ids = list_partitions(out)
    keys = t.column("k").to_numpy()
    assert ids == sorted(set(range_ids(keys, WIDTH).tolist()))


def test_prune_skips_non_overlapping(layout):
    out, _ = layout
    # [250, 450) overlaps partitions 2, 3, 4 only
    parts = overlapping_partitions(out, 250, 450, WIDTH)
    assert [os.path.basename(p) for p in parts] == ["r=2", "r=3", "r=4"]
    # empty window → no partitions, read_range reports None
    assert overlapping_partitions(out, 5000, 6000, WIDTH) == []
    assert read_range(out, "k", 5000, 6000, WIDTH) is None


@pytest.mark.parametrize("lo,hi", [(250, 450), (0, 1000), (99, 101), (300, 301)])
def test_pruned_read_equals_full_filter(layout, lo, hi):
    out, t = layout
    got = read_range(out, "k", lo, hi, WIDTH)
    keys = t.column("k").to_numpy()
    mask = (keys >= lo) & (keys < hi)
    exp = sorted(zip(keys[mask].tolist(), t.column("v").to_numpy()[mask].tolist()))
    rows = sorted((r["k"], r["v"]) for r in got.take_all())
    assert rows == exp


def test_residual_filter_trims_edge_partitions(layout):
    out, _ = layout
    # window strictly inside one partition: the partition holds keys
    # 200..299 but only 210..259 must survive
    got = [r["k"] for r in read_range(out, "k", 210, 260, WIDTH).take_all()]
    assert got and all(210 <= k < 260 for k in got)


def test_timestamp_day_partitioning(ray_session, tmp_path):
    out = str(tmp_path / "ts")
    base = 1_704_067_200_000_000  # 2024-01-01T00:00:00 epoch-us
    ts = pa.array(
        np.array([base + i * (DAY_US // 4) for i in range(40)], dtype="int64"),
        pa.timestamp("us"),
    )
    t = pa.table({"ts": ts, "x": pa.array(range(40), pa.int64())})
    write_range_partitioned(ray.data.from_arrow(t), out, "ts", DAY_US)
    assert len(list_partitions(out)) == 10  # 40 quarter-days = 10 days
    # days 3..5 (half-open) → 8 rows/day × 2 days... window [d3, d5)
    lo, hi = base + 3 * DAY_US, base + 5 * DAY_US
    got = read_range(out, "ts", lo, hi, DAY_US)
    assert len(overlapping_partitions(out, lo, hi, DAY_US)) == 2
    assert got.count() == 8

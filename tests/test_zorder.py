"""Z-order layout: pruned-read equality with a full-scan filter on
random rectangles, actual cell pruning, edge clamping. The DuckDB
oracle equality runs in test_queries.py (SQL_CHECKED:
events_zorder_pruned)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

import ray.data

from file_analyzer_ray.state.zorder import (
    overlapping_cells,
    read_rect,
    write_zorder,
)


@pytest.fixture(scope="module")
def layout(ray_session, tmp_path_factory):
    rng = np.random.default_rng(11)
    n = 5000
    rows = {
        "x": rng.integers(0, 1000, size=n),
        "y": rng.integers(0, 1000, size=n),
        "v": rng.integers(0, 100, size=n),
    }
    import pandas as pd

    df = pd.DataFrame(rows)
    out = str(tmp_path_factory.mktemp("z") / "cells")
    write_zorder(
        ray.data.from_pandas(df).repartition(4),
        out, "x", "y", x_range=(0, 999), y_range=(0, 999), bits=4,
    )
    return out, df


@pytest.mark.parametrize(
    "rect", [(100, 400, 200, 500), (0, 1000, 0, 1000), (950, 1000, 0, 60)]
)
def test_rect_read_equals_full_filter(layout, rect):
    out, df = layout
    x0, x1, y0, y1 = rect
    got = (
        read_rect(out, x0, x1, y0, y1)
        .to_pandas()
        .sort_values(["x", "y", "v"])
        .reset_index(drop=True)
    )
    exp = (
        df[(df.x >= x0) & (df.x < x1) & (df.y >= y0) & (df.y < y1)]
        .sort_values(["x", "y", "v"])
        .reset_index(drop=True)
    )
    assert got[["x", "y", "v"]].astype("int64").equals(exp.astype("int64"))


def test_small_rectangle_actually_prunes(layout):
    out, _ = layout
    total = len(glob.glob(os.path.join(out, "z=*")))
    touched = [
        c
        for c in overlapping_cells(out, 100, 200, 100, 200)
        if os.path.isdir(os.path.join(out, f"z={c}"))
    ]
    # a ~1/10 x ~1/10 rectangle must touch a small corner of the grid
    assert total > 100 and len(touched) <= 9


def test_out_of_range_values_clamp_not_crash(layout):
    out, df = layout
    # rectangle extending past the written key space still answers
    got = read_rect(out, 900, 5000, 900, 5000).to_pandas()
    exp = df[(df.x >= 900) & (df.y >= 900)]
    assert len(got) == len(exp)

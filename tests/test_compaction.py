"""Last-writer-wins compaction (stages/compaction.py) and the
deterministic shuffle-export layout (stages/shuffle_layout.py):
brute-force equality, tie-breaks, and split-invariance."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from file_analyzer_ray.stages.compaction import latest_per_key
from file_analyzer_ray.stages.shuffle_layout import shuffle_export_layout


def _events(rows):
    return pa.table(
        {
            "eid": pa.array([r[0] for r in rows], pa.int64()),
            "key": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.int64()),
            "val": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def _latest(rows, override_num_blocks=None):
    ds = ray.data.from_arrow(_events(rows))
    if override_num_blocks:
        ds = ds.repartition(override_num_blocks)
    out = latest_per_key(ds, ["key"], ["ts", "eid"]).take_all()
    return {r["key"]: (r["eid"], r["ts"], r["val"]) for r in out}


def test_latest_wins(ray_session):
    rows = [(1, 7, 100, "a"), (2, 7, 300, "b"), (3, 7, 200, "c"),
            (4, 8, 50, "d")]
    assert _latest(rows) == {7: (2, 300, "b"), 8: (4, 50, "d")}


def test_ts_tie_breaks_on_id(ray_session):
    rows = [(5, 1, 100, "lo"), (9, 1, 100, "hi"), (7, 1, 100, "mid")]
    assert _latest(rows) == {1: (9, 100, "hi")}


def test_split_invariant(ray_session):
    rng = np.random.RandomState(3)
    rows = [
        (i, int(rng.randint(0, 12)), int(rng.randint(0, 40)), str(i))
        for i in range(200)
    ]
    assert _latest(rows) == _latest(rows, override_num_blocks=13)


def test_latest_brute_force(ray_session):
    rng = np.random.RandomState(11)
    rows = [
        (i, int(rng.randint(0, 25)), int(rng.randint(0, 10)), f"v{i}")
        for i in range(400)
    ]
    expect = {}
    for eid, key, ts, val in rows:
        cur = expect.get(key)
        if cur is None or (ts, eid) > (cur[1], cur[0]):
            expect[key] = (eid, ts, val)
    assert _latest(rows) == expect


def _h32(i: int) -> int:
    return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)


def _layout(ids, n_blocks=None):
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    if n_blocks:
        ds = ds.repartition(n_blocks)
    out = shuffle_export_layout(ds, "doc_id", n_shards=16, n_bands=16)
    return sorted(
        (r["doc_id"], r["shard"], r["band"], r["pos"]) for r in out.take_all()
    )


def test_layout_matches_hash_arithmetic(ray_session):
    ids = list(range(300))
    got = _layout(ids)
    # brute force: group by (shard, band), order by (h, id), dense rank
    coords = sorted((_h32(i) % 16, _h32(i) >> 28, _h32(i), i) for i in ids)
    pos, seen = {}, {}
    for shard, band, h, i in coords:
        k = (shard, band)
        pos[i] = seen.get(k, 0)
        seen[k] = pos[i] + 1
    expect = sorted((i, _h32(i) % 16, _h32(i) >> 28, pos[i]) for i in ids)
    assert got == expect


def test_layout_is_split_and_order_invariant(ray_session):
    ids = list(range(257))
    shuffled = list(reversed(ids))
    assert _layout(ids) == _layout(shuffled, n_blocks=9)


def test_layout_positions_dense_per_group(ray_session):
    rows = _layout(list(range(500)))
    groups = {}
    for _, shard, band, pos in rows:
        groups.setdefault((shard, band), []).append(pos)
    for k, ps in groups.items():
        assert sorted(ps) == list(range(len(ps))), k


def test_bad_band_count_rejected(ray_session):
    with pytest.raises(ValueError):
        shuffle_export_layout(
            ray.data.from_arrow(pa.table({"doc_id": [1]})), "doc_id",
            n_bands=12,
        )

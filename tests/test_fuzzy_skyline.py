"""Unit tests for the round-4 kernels: the vectorized-across-pairs
Levenshtein DP (stages/fuzzy.py) and the vectorized skyline mask
(stages/skyline.py), each against a tiny trusted brute force."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from file_analyzer_ray.stages.fuzzy import _lev_batch
from file_analyzer_ray.stages.skyline import _skyline_mask


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(min_size=1, max_size=8), st.text(min_size=1, max_size=8)),
        min_size=1,
        max_size=12,
    )
)
def test_lev_batch_matches_scalar_dp(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = _lev_batch(a, b)
    exp = np.array([_lev_ref(x, y) for x, y in pairs], dtype=np.int64)
    assert (got == exp).all()


def _skyline_ref(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    n = len(x)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (
                x[j] <= x[i]
                and y[j] <= y[i]
                and (x[j] < x[i] or y[j] < y[i])
            ):
                keep[i] = False
                break
    return keep


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)),
        min_size=1,
        max_size=40,
    )
)
def test_skyline_mask_matches_bruteforce(pts):
    x = np.array([p[0] for p in pts], dtype=np.float64)
    y = np.array([p[1] for p in pts], dtype=np.float64)
    got = _skyline_mask(x, y)
    assert (got == _skyline_ref(x, y)).all()


def test_skyline_combiner_is_lossless():
    """Global skyline == skyline of the union of partition skylines,
    for any partitioning — the property the distributed plan relies
    on."""
    rng = np.random.default_rng(7)
    x = rng.integers(0, 100, 500).astype(np.float64)
    y = rng.integers(0, 100, 500).astype(np.float64)
    full = _skyline_mask(x, y)
    idx = np.arange(500)
    cand = []
    for part in np.array_split(idx, 7):
        m = _skyline_mask(x[part], y[part])
        cand.append(part[m])
    cand = np.concatenate(cand)
    m2 = _skyline_mask(x[cand], y[cand])
    got = np.zeros(500, dtype=bool)
    got[cand[m2]] = True
    assert (got == full).all()

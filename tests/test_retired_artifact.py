"""retired_correctness.py — the per-round artifact script for the
retired query surface — must keep working between rounds: its compare
semantics (sorted-by-name columns, canonical dtypes, float-tolerant
hash) and its CLI entry are smoke-tested here so drift surfaces as a
test failure, not a missing artifact at round end."""

from __future__ import annotations

import importlib.util
import os
import sys

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def rc():
    spec = importlib.util.spec_from_file_location(
        "retired_correctness", os.path.join(REPO, "retired_correctness.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_compare_green_on_equal_frames(rc):
    a = pd.DataFrame({"x": [1, 2], "name": ["b", "a"], "v": [0.1, 0.2]})
    b = pd.DataFrame({"v": [0.2, 0.1], "name": ["a", "b"], "x": [2, 1]})
    rec = rc.compare(a, b)
    assert rec["rows_match"] and rec["schema_match"] and rec["hash_match"]


def test_compare_flags_value_mismatch(rc):
    a = pd.DataFrame({"x": [1, 2]})
    b = pd.DataFrame({"x": [1, 3]})
    rec = rc.compare(a, b)
    assert rec["rows_match"] and rec["schema_match"] and not rec["hash_match"]


def test_compare_date_vs_midnight_timestamp(rc):
    a = pd.DataFrame({"d": ["2024-01-01", "2024-01-02"]})
    b = pd.DataFrame({"d": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    rec = rc.compare(a, b)
    assert rec["hash_match"]


def test_compare_float_tolerance(rc):
    a = pd.DataFrame({"v": [0.1 + 1e-12]})
    b = pd.DataFrame({"v": [0.1]})
    assert rc.compare(a, b)["hash_match"]
    assert not rc.compare(
        pd.DataFrame({"v": [0.1 + 1e-6]}), pd.DataFrame({"v": [0.1]})
    )["hash_match"]


def test_cli_runs_one_query(rc, ray_session):
    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata absent")
    out = "/tmp/fa_retired_smoke.json"
    rcode = rc.main(
        ["--sf-dir", sf, "--out", out, "--only", "orders_topk", "--round", "0"]
    )
    assert rcode == 0
    import json

    d = json.load(open(out))
    assert d["n_green"] == 1 and d["n_queries"] == 1

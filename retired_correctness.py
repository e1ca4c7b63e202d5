#!/usr/bin/env python
"""Round-stamped correctness artifact for the retired query surface.

The driver's registry is capped at 50 entries; every query rotated out
of it keeps its Ray implementation + DuckDB oracle in
``RETIRED_QUERIES`` / ``RETIRED_ORACLE_SQL`` (queries.py). This script
is the driver-style evidence for that surface: it runs EVERY retired
entry and its oracle side-by-side over the same parquet tables and
writes ``RETIRED_CORRECTNESS_r{N}.json`` with the same shape as the
driver's ``CORRECTNESS_r{N}.json`` rows — ``rows_match`` /
``schema_match`` / ``hash_match`` / row counts / error — so the 55% of
the query surface outside the driver cap has a diffable per-round
record instead of only "pytest was green today".

Comparison semantics mirror the driver's: columns sorted by NAME before
hashing, rows sorted by all columns, values hashed canonically (floats
rounded to 9 decimals so bit-level noise between Arrow and DuckDB
kernels doesn't flap the artifact; everything else exact).

Usage:  python retired_correctness.py [--sf-dir DIR] [--round N]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()  # ray Dataset or pyarrow Table


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    """Sorted-by-name columns, canonical dtypes, rows sorted by every
    column — the driver's pre-hash normalization."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # a date-typed result and a timestamp-at-midnight result are
            # the same VALUE; render both as the bare date string
            df[c] = (
                s.astype("datetime64[us]").astype(str)
                .str.replace(r"^(\d{4}-\d{2}-\d{2}) 00:00:00$", r"\1", regex=True)
            )
        elif pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 9) + 0.0  # -0.0 -> 0.0
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    sort_cols = [c for c in df.columns if not df[c].map(lambda v: isinstance(v, (list, dict, np.ndarray))).any()]
    if sort_cols:
        df = df.sort_values(sort_cols, kind="mergesort")
    return df.reset_index(drop=True)


def _cell_repr(v) -> str:
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, float):
        if v != v:  # NaN
            return "NaN"
        return repr(round(v, 9) + 0.0)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell_repr(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_cell_repr(v[k])}" for k in sorted(v)) + "}"
    if v is None or v is pd.NaT:
        return "NULL"
    return str(v)


def _value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(b"\x00")
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            vals = np.round(col.astype("float64").to_numpy(), 9) + 0.0
            h.update(np.where(np.isnan(vals), np.float64(0), vals).tobytes())
            h.update(np.isnan(vals).tobytes())
        else:
            for v in col:
                h.update(_cell_repr(v).encode())
                h.update(b"\x01")
    return h.hexdigest()


def _floats_close(g: pd.Series, e: pd.Series) -> bool:
    gv, ev = g.astype(float).to_numpy(), e.astype(float).to_numpy()
    return bool(np.allclose(gv, ev, rtol=0, atol=1e-9, equal_nan=True))


def compare(got: pd.DataFrame, exp: pd.DataFrame) -> dict:
    rec: dict = {
        "rows_match": len(got) == len(exp),
        "schema_match": sorted(got.columns) == sorted(exp.columns),
        "hash_match": False,
        "ray_rows": int(len(got)),
        "oracle_rows": int(len(exp)),
        "err": None,
    }
    if not (rec["rows_match"] and rec["schema_match"]):
        return rec
    g, e = _canonical(got), _canonical(exp)
    # float columns compared with 1e-9 tolerance (post-round hashes can
    # still differ exactly at a rounding boundary); others by hash
    ok = True
    for c in g.columns:
        if pd.api.types.is_float_dtype(e[c]) or pd.api.types.is_float_dtype(g[c]):
            ok &= _floats_close(g[c], e[c])
    gh, eh = _value_hash(g), _value_hash(e)
    rec["ray_hash"], rec["oracle_hash"] = gh, eh
    rec["hash_match"] = bool(ok and (gh == eh or _all_close(g, e)))
    return rec


def _all_close(g: pd.DataFrame, e: pd.DataFrame) -> bool:
    """Fallback when hashes differ only by float rounding boundaries:
    exact per-cell comparison with float tolerance."""
    for c in g.columns:
        if pd.api.types.is_float_dtype(e[c]) or pd.api.types.is_float_dtype(g[c]):
            if not _floats_close(g[c], e[c]):
                return False
        else:
            if [_cell_repr(v) for v in g[c]] != [_cell_repr(v) for v in e[c]]:
                return False
    return True


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_RETIRED_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None, help="comma-separated subset")
    args = ap.parse_args(argv)
    out = args.out or f"RETIRED_CORRECTNESS_r{args.round:02d}.json"

    import duckdb
    import ray

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from file_analyzer_ray.queries import RETIRED_ORACLE_SQL, RETIRED_QUERIES

    owned = not ray.is_initialized()
    if owned:
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            ignore_reinit_error=True,
        )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    names = sorted(RETIRED_QUERIES)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    results: dict = {}
    n_green = 0
    t_all = time.monotonic()
    for name in names:
        t0 = time.monotonic()
        try:
            got = _to_pandas(RETIRED_QUERIES[name](args.sf_dir))
            exp = con.execute(RETIRED_ORACLE_SQL[name]).fetchdf()
            rec = compare(got, exp)
        except Exception as ex:  # noqa: BLE001 — artifact records the error
            rec = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "ray_rows": None, "oracle_rows": None,
                "err": f"{type(ex).__name__}: {ex}",
            }
        rec["sec"] = round(time.monotonic() - t0, 3)
        results[name] = rec
        green = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
        n_green += green
        print(f"{'PASS' if green else 'FAIL'} {name} ({rec['sec']}s)"
              + ("" if green else f"  {rec}"), flush=True)

    artifact = {
        "round": args.round,
        "sf_dir": args.sf_dir,
        "n_queries": len(names),
        "n_green": n_green,
        "wall_sec": round(time.monotonic() - t_all, 1),
        "results": results,
    }
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({"out": out, "green": n_green, "total": len(names)}))
    if owned:
        ray.shutdown()
    return 0 if n_green == len(names) else 1


if __name__ == "__main__":
    raise SystemExit(main())
